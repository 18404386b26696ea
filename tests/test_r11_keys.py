"""r11: probe-cache pinning + derived cap-guard coefficients.

The r10-verdict "sample the dedup probe" item was built, measured
strictly worse at the 100x replica (0.58 s sampled vs 0.43 s exact
min-of-2 — both scan-bound since the content hash must read every text
value), and reverted (SCALE.md r11 negative result). What remains from
that item is the cache pin below.
"""

from __future__ import annotations

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


def test_cap_guard_coefficients_track_threshold():
    """ADVICE r10: the cap-guard integer coefficients are DERIVED from
    MINHASH_JACCARD_T (J >= p/q iff (p+q)*ns >= p*(np+nd)) — at the
    current T=2/5 they must be the proven 7/2 pair."""
    from fractions import Fraction

    frac = Fraction(dedup.MINHASH_JACCARD_T).limit_denominator(1000)
    assert dedup.CAP_GUARD_NS_COEF == frac.numerator + frac.denominator
    assert dedup.CAP_GUARD_SZ_COEF == frac.numerator
    assert (dedup.CAP_GUARD_NS_COEF, dedup.CAP_GUARD_SZ_COEF) == (7, 2)
