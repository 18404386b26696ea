"""Build the N× replicated scale corpus behind SCALE.md's measurements.

Replicates the fact tables of a fixture directory N times with shifted
keys (disjoint per-replica key spaces: users/orders/docs never collide
across replicas, so per-key semantics — sessions, funnels, dedup
clusters — replicate cleanly) and copies the small dims as-is. Events
keep their timestamp column untouched, whatever unit the fixture
carries (the unit-drift rule: CLAUDE.md).

Two modes:

- default (fact mode, the r6-r8 harness): supplier/nation/region are
  copied as-is and FK columns are NOT remapped, so every replica's
  lineitems reference replica-0 suppliers/parts and orders reference
  replica-0 customers. Group-key COUNTS on those axes stay
  fixture-sized under replication (group SIZES grow instead) — the
  artifact SCALE.md flags on dim-driven keys.
- ``--dims`` (dim-scale mode, r9): supplier is replicated too
  (s_suppkey shifted) and every FK is shifted by the SAME per-replica
  stride as the PK it references (l_suppkey/l_partkey/o_custkey), so
  each replica is a fully self-contained copy: join fan-outs and
  per-key group sizes are PRESERVED while key-space cardinality grows
  N× — the axis the r8 verdict said the harness could not exercise
  (supplier is 10k×SF, part 200k×SF: "dims" that grow with the corpus).
  nation/region stay copied as-is — they are genuinely design-bounded
  (25/5 rows at every TPC-H SF).

Usage:
    python tools/replicate_corpus.py [SRC] [DST] [N] [--dims]
defaults: /root/testdata/sf0.1  .scratch/sf1  10

DuckDB does the replication (columnar read → cross join with a replica
index → columnar write): ~seconds for the sf0.1 corpus.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

STRIDE = 10_000_000

#: table -> (key columns to shift, shift stride per replica)
FACTS = {
    "lineitem": (["l_orderkey"], STRIDE),
    "orders": (["o_orderkey"], STRIDE),
    "customer": (["c_custkey"], STRIDE),
    "part": (["p_partkey"], STRIDE),
    "documents": (["doc_id"], STRIDE),
    "embeddings": (["vec_id"], STRIDE),
    "events": (["event_id", "user_id"], None),  # per-column strides below
}
EVENT_STRIDES = {"event_id": 1_000_000_000, "user_id": 1_000_000}
DIMS = ("supplier", "nation", "region")

#: --dims mode: FK columns shifted with the SAME stride as the PK they
#: reference, so replica r's facts point at replica r's dim copies.
DIM_FKS = {
    "lineitem": ["l_suppkey", "l_partkey"],
    "orders": ["o_custkey"],
}
#: --dims mode: supplier joins the replicated set (s_nationkey stays —
#: nation is genuinely bounded). nation/region remain copy-as-is.
DIM_FACTS = {"supplier": (["s_suppkey"], STRIDE)}


def replicate(src: str, dst: str, n: int, dims: bool = False) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    reps = f"(SELECT unnest(range({n})) AS rep)"
    tables = dict(FACTS)
    if dims:
        tables.update(DIM_FACTS)
    for table, (keys, stride) in tables.items():
        shift_cols = set(keys) | (set(DIM_FKS.get(table, [])) if dims else set())
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{table}.parquet')"
            ).fetchall()
        ]
        exprs = []
        for c in cols:
            if c in shift_cols:
                s = EVENT_STRIDES.get(c, stride or STRIDE)
                exprs.append(f"{c} + rep * {s} AS {c}")
            else:
                exprs.append(c)
        con.execute(
            f"COPY (SELECT {', '.join(exprs)}"
            f" FROM read_parquet('{src}/{table}.parquet'), {reps})"
            f" TO '{dst}/{table}.parquet' (FORMAT PARQUET)"
        )
        rows = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {rows} rows ({n}x{' +FK remap' if dims and table in DIM_FKS else ''})")
    for t in DIMS:
        if dims and t in DIM_FACTS:
            continue
        shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
        print(f"{t}: copied as-is (dim)")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--dims"]
    dims = "--dims" in sys.argv[1:]
    src = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
    dst = args[1] if len(args) > 1 else "/root/repo/.scratch/sf1"
    n = int(args[2]) if len(args) > 2 else 10
    replicate(src, dst, n, dims)
