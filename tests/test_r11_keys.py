"""r11: probe-cache pinning + derived cap-guard coefficients.

The r10-verdict "sample the dedup probe" item was built, measured
strictly worse at the 100x replica (0.58 s sampled vs 0.43 s exact
min-of-2 — both scan-bound since the content hash must read every text
value), and reverted (SCALE.md r11 negative result). What remains from
that item is the cache pin below.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ls_hadoop_3_0_spark.llm import dedup
from ls_hadoop_3_0_spark.tables import load

from .conftest import SF_DIR


def test_probe_cache_hits_on_repeated_plan(spark):
    """r10 verdict item 8: a repeated probe of the SAME analyzed plan
    must run ZERO Spark jobs (semanticHash cache hit) — so a PySpark
    upgrade that breaks the private `_jdf.queryExecution()` API surfaces
    here as a failure instead of silently degrading every probe to a
    re-scan. A fresh-but-identical plan object must also hit."""
    dedup._DUP_PROBE_CACHE.clear()
    sc = spark.sparkContext
    # Build BOTH plan objects before the counted window: load() itself
    # runs a footer-probe job at construction time that would otherwise
    # land in the job group and mask the cache verdict.
    docs = load(spark, SF_DIR, "documents")
    docs_fresh = load(spark, SF_DIR, "documents")
    agg = F.approx_count_distinct("text", 0.02)

    sc.setJobGroup("r11_probe_cache", "probe cache pin")
    try:
        dedup._probe_material(docs, agg)
        jobs_first = len(sc.statusTracker().getJobIdsForGroup("r11_probe_cache"))
        assert jobs_first >= 1, "first probe must actually scan"
        dedup._probe_material(docs, agg)
        # A semantically identical plan built fresh must hit the cache too.
        dedup._probe_material(docs_fresh, agg)
        jobs_after = len(sc.statusTracker().getJobIdsForGroup("r11_probe_cache"))
        assert jobs_after == jobs_first, "repeated probe must be a cache hit"
    finally:
        sc.setJobGroup("", "")


def test_cross_source_flow_class_derivation_equivalence(spark):
    """r10 verdict item 3: the class-level flow matrix must equal the
    r10 formulation (aggregate the EXPANDED minhash_pairs stream with
    endpoint source joins) on a duplicate-heavy corpus where the
    collapsed path fires — values identical, the expanded pair stream
    just never materializes."""
    base = load(spark, SF_DIR, "documents").select("doc_id", "text", "source")
    docs = base.unionAll(
        base.select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text", "source")
    )
    dedup._DUP_PROBE_CACHE.clear()
    member, rep_pairs, valid_reps = dedup._minhash_structure(
        docs, dedup.MINHASH_JACCARD_T
    )
    assert member is not None, "probe must pick collapse on the dup corpus"
    src = docs.select("doc_id", "source")
    got = {
        (r["source_x"], r["source_y"]): (r["n_pairs"], r["n_docs_touched"])
        for r in dedup._cross_source_flow_from_classes(
            member, rep_pairs, valid_reps, src
        ).collect()
    }

    pairs = dedup.minhash_pairs(docs)  # expanded stream (cache makes it collapse)
    lab = (
        pairs.join(src.withColumnsRenamed({"doc_id": "doc_a", "source": "sa"}), "doc_a")
        .join(src.withColumnsRenamed({"doc_id": "doc_b", "source": "sb"}), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.least("sa", "sb").alias("source_x"),
            F.greatest("sa", "sb").alias("source_y"),
        )
    )
    want = {
        (r["source_x"], r["source_y"]): (r["n_pairs"], r["n_docs_touched"])
        for r in lab.groupBy("source_x", "source_y")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            (F.count_distinct("doc_a") + F.count_distinct("doc_b")).alias(
                "n_docs_touched"
            ),
        )
        .collect()
    }
    assert got == want and len(got) > 0


def test_v2_manifest_collapse_equivalence(spark):
    """The class-collapsed v2 plan must produce EXACTLY the direct
    plan's manifest on a duplicate-heavy corpus (every doc duplicated
    once) — text gates are functions of text alone, so running them per
    distinct-content class cannot change any value."""
    from ls_hadoop_3_0_spark.llm.pipeline import _v2_manifest

    base = load(spark, SF_DIR, "documents").select("doc_id", "source", "text")
    docs = base.unionAll(
        base.select((F.col("doc_id") + 10_000_000).alias("doc_id"), "source", "text")
    )
    cols = ("doc_id", "source", "n_tokens", "pack_start", "content_hash")
    direct = {tuple(r[c] for c in cols) for r in _v2_manifest(spark, docs, False).collect()}
    collapsed = {
        tuple(r[c] for c in cols) for r in _v2_manifest(spark, docs, True).collect()
    }
    assert collapsed == direct and len(direct) > 0


def test_arrow_reader_digest_identical_to_row_sibling(spark):
    """r10 verdict item 5 'Done' clause: the Arrow-native reader must be
    digest-identical to the row-based sibling on the shared columns, and
    its batch-evidence columns must show the ragged tail only genuine
    RecordBatch construction produces (3×512 + 464 per 2000-row
    partition — a row-at-a-time reader has no batch boundary to stamp)."""
    import ls_hadoop_3_0_spark as engine
    from ls_hadoop_3_0_spark.sources.io import _PYDS_ARROW_BATCH, _PYDS_PARTS, _PYDS_ROWS

    arrow = {
        r["part"]: r
        for r in engine.QUERIES["scan_python_datasource_arrow"](spark, SF_DIR).collect()
    }
    row = {
        r["part"]: r
        for r in engine.QUERIES["scan_python_datasource"](spark, SF_DIR).collect()
    }
    assert set(arrow) == set(row) == set(range(_PYDS_PARTS))
    tail = _PYDS_ROWS % _PYDS_ARROW_BATCH
    n_full = _PYDS_ROWS // _PYDS_ARROW_BATCH
    for p in row:
        for c in ("n_rows", "sum_ids", "payload_u24"):
            assert arrow[p][c] == row[p][c], (p, c)
        assert arrow[p]["min_batch_rows"] == tail
        assert arrow[p]["max_batch_rows"] == _PYDS_ARROW_BATCH
        assert (
            arrow[p]["batch_rows_sum"]
            == n_full * _PYDS_ARROW_BATCH**2 + tail**2
        )


def test_arrow_reader_is_partition_parallel(spark):
    """The Arrow reader must plan one task per declared partition, like
    its row sibling (the connector-parallelism contract)."""
    from pyspark.sql import functions as F

    from ls_hadoop_3_0_spark.sources.io import _PYDS_PARTS

    import ls_hadoop_3_0_spark as engine

    engine.QUERIES["scan_python_datasource_arrow"](spark, SF_DIR)  # registers
    scan = (
        spark.read.format("synthlog_arrow").option("parts", str(_PYDS_PARTS)).load()
    )
    assert scan.rdd.getNumPartitions() == _PYDS_PARTS
    # Batch grain is visible per row: exactly two distinct batch sizes.
    sizes = {
        r["batch_rows"] for r in scan.select("batch_rows").distinct().collect()
    }
    assert sizes == {512, 464}


@pytest.mark.extended  # heavy leg (VERDICT r16 #1): >8 s behavioral pin
def test_text_gate_collapse_oracle_parity_on_dup_fixture(spark, tmp_path):
    """quality_repetition / quality_crossdup r11 class collapse: on a
    duplicate-heavy fixture (every sf0.001 doc duplicated once) the
    probe picks the collapsed path; the UNCHANGED full-formulation
    DuckDB oracle must still hash-match — the strongest possible
    equivalence pin (independent engine, independent formulation)."""
    import duckdb

    from ls_hadoop_3_0_spark.llm import dedup
    from tests.compare import assert_equivalent

    import ls_hadoop_3_0_spark as engine
    from ls_hadoop_3_0_spark.registry import ORACLES

    con = duckdb.connect()
    dup_dir = str(tmp_path)
    # HALF-duplicated (even doc_ids copied): the probe still fires
    # (ratio 2/3) but singleton classes survive, so v3's crossdup gate
    # doesn't trivially flag the whole corpus into an empty manifest.
    con.execute(
        f"""
        COPY (
            SELECT doc_id, source, lang, text, n_chars
            FROM read_parquet('{SF_DIR}/documents.parquet')
            UNION ALL
            SELECT doc_id + 10000000, source, lang, text, n_chars
            FROM read_parquet('{SF_DIR}/documents.parquet')
            WHERE doc_id % 2 = 0
        ) TO '{dup_dir}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"CREATE VIEW documents AS"
        f" SELECT * FROM read_parquet('{dup_dir}/documents.parquet')"
    )
    dedup._DUP_PROBE_CACHE.clear()
    docs = load(spark, dup_dir, "documents").select("doc_id", "text")
    assert dedup._dup_ratio_material(docs), "probe must fire on the dup fixture"
    for key in (
        "quality_repetition",
        "quality_crossdup",
        "pipeline_curation_v2",
        "pipeline_curation_v3",
        "dedup_substrings",  # r13: class-weighted gram totals + islands
        "lm_bigram_score",  # r13: class-weighted bigram counts + inherit
    ):
        spdf = engine.QUERIES[key](spark, dup_dir).toPandas()
        odf = con.execute(ORACLES[key]).fetchdf()
        assert_equivalent(spdf, odf, key)
        assert len(spdf) > 0


def test_v3_manifest_collapse_equivalence(spark):
    """The class-collapsed v3 plan must produce EXACTLY the direct
    plan's manifest on a duplicate-heavy corpus — the crossdup gate's
    class-structure exclusivity and the LM gate's m-weighted vocabulary
    counts are exact integer identities, not approximations."""
    from ls_hadoop_3_0_spark.llm.pipeline import _v3_manifest

    base = load(spark, SF_DIR, "documents").select(
        "doc_id", "source", "text", "n_chars"
    )
    # Half-duplicated: singleton classes must survive the crossdup gate
    # or the manifest is trivially empty on both paths.
    docs = base.unionAll(
        base.filter(F.col("doc_id") % 2 == 0).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            "source",
            "text",
            "n_chars",
        )
    )
    cols = ("doc_id", "source", "n_tokens", "avg_nll", "content_hash")
    direct = {tuple(r[c] for c in cols) for r in _v3_manifest(spark, docs, False).collect()}
    collapsed = {
        tuple(r[c] for c in cols) for r in _v3_manifest(spark, docs, True).collect()
    }
    assert collapsed == direct and len(direct) > 0


def test_numpy_fold_bit_identical_to_sql_fold(spark):
    """The vectorized nearest-centroid assignment's exactness claim,
    pinned adversarially: for random doubles (including near-tie
    centroid pairs), the numpy per-dimension accumulation
    ``acc = acc + (x_d−y_d)²`` must be BIT-identical to Spark's
    sequential aggregate/zip_with fold — same accumulation order per
    row, so IEEE guarantees equality, and this test fails the moment a
    rewrite reassociates (e.g. np.sum's pairwise algorithm would)."""
    import numpy as np

    rng = np.random.default_rng(7)
    dim, rows, cands = 17, 64, 5
    V = rng.normal(0, 1, (rows, dim))
    C = rng.normal(0, 1, (cands, dim))
    C[1] = C[0] + rng.normal(0, 1e-13, dim)  # near-tie candidate pair

    # numpy path: the exact loop knn_centroid_classify ships.
    def np_fold(c):
        t = V[:, 0] - c[0]
        acc = t * t
        for d in range(1, dim):
            t = V[:, d] - c[d]
            acc = acc + t * t
        return acc

    np_dists = np.stack([np_fold(c) for c in C])  # cands × rows

    # SQL path: the same fold through Catalyst on the same bits.
    df = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(rows)],
        "i int, v array<double>",
    )
    for j in range(cands):
        arr = "array(" + ",".join(repr(float(x)) + "D" for x in C[j]) + ")"
        got = {
            r["i"]: r["d2"]
            for r in df.select(
                "i",
                F.expr(
                    f"aggregate(zip_with(v, {arr}, (x, y) -> (x - y) * (x - y)),"
                    " 0D, (acc, p) -> acc + p)"
                ).alias("d2"),
            ).collect()
        }
        for i in range(rows):
            assert got[i] == np_dists[j][i], (j, i)


def test_cap_guard_coefficients_track_threshold():
    """ADVICE r10: the cap-guard integer coefficients are DERIVED from
    MINHASH_JACCARD_T (J >= p/q iff (p+q)*ns >= p*(np+nd)) — at the
    current T=2/5 they must be the proven 7/2 pair."""
    from fractions import Fraction

    frac = Fraction(dedup.MINHASH_JACCARD_T).limit_denominator(1000)
    assert dedup.CAP_GUARD_NS_COEF == frac.numerator + frac.denominator
    assert dedup.CAP_GUARD_SZ_COEF == frac.numerator
    assert (dedup.CAP_GUARD_NS_COEF, dedup.CAP_GUARD_SZ_COEF) == (7, 2)
