"""Build the N× replicated scale corpus behind SCALE.md's measurements.

Replicates the fact tables of a fixture directory N times with shifted
keys (disjoint per-replica key spaces: users/orders/docs never collide
across replicas, so per-key semantics — sessions, funnels, dedup
clusters — replicate cleanly) and copies the small dims as-is. Events
keep their timestamp column untouched, whatever unit the fixture
carries (the unit-drift rule: CLAUDE.md).

Usage:
    python tools/replicate_corpus.py [SRC] [DST] [N]
defaults: /root/testdata/sf0.1  .scratch/sf1  10

DuckDB does the replication (columnar read → cross join with a replica
index → columnar write): ~seconds for the sf0.1 corpus.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

#: table -> (key columns to shift, shift stride per replica)
FACTS = {
    "lineitem": (["l_orderkey"], 10_000_000),
    "orders": (["o_orderkey"], 10_000_000),
    "customer": (["c_custkey"], 10_000_000),
    "part": (["p_partkey"], 10_000_000),
    "documents": (["doc_id"], 10_000_000),
    "embeddings": (["vec_id"], 10_000_000),
    "events": (["event_id", "user_id"], None),  # per-column strides below
}
EVENT_STRIDES = {"event_id": 1_000_000_000, "user_id": 1_000_000}
DIMS = ("supplier", "nation", "region")


def replicate(src: str, dst: str, n: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    reps = f"(SELECT unnest(range({n})) AS rep)"
    for table, (keys, stride) in FACTS.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{table}.parquet')"
            ).fetchall()
        ]
        exprs = []
        for c in cols:
            if c in keys:
                s = EVENT_STRIDES.get(c, stride)
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
        print(f"{table}: {rows} rows ({n}x)")
    for t in DIMS:
        shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
        print(f"{t}: copied as-is (dim)")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sf1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    replicate(src, dst, n)
