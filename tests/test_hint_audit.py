"""Registry-wide static-broadcast-hint audit.

The repo rule (CLAUDE.md, r8 lesson 1): a hand-placed ``F.broadcast``
hint is a STATIC claim that a join side is DESIGN-bounded — its row
count must not grow with the corpus/SF. Legitimate classes:

- nation/region dims (fixed 25/5 rows at every TPC-H SF),
- 1-row global scalars (max/total/threshold aggregates),
- partition-offset metadata (bounded by partition COUNT, not rows),
- fixed-size panels / top-K sets (LIMIT K, fixed-id ranges, query
  vocabularies, k centroids — bounded by a constant in the key design).

Everything else (supplier = 10k×SF, part = 200k×SF, customer, corpus
tables, vocabularies, per-part/per-doc aggregates) must be left to
size-based planning/AQE, which CAN demote a broadcast when the runtime
size is large — a hand hint cannot, so it is a forced corpus-scale
broadcast (driver+executor OOM) at 100 TB.

This test walks EVERY registered key and asserts its analyzed plan
carries at most the audited number of broadcast-strategy hints. A new
key with a static hint fails until its bounded side is audited into the
allowance table below — the allowlist is the audit trail.
"""

from __future__ import annotations

import pytest

import ls_hadoop_3_0_spark as engine
from ls_hadoop_3_0_spark.plans.checks import count_static_broadcast_hints

from .conftest import SF_DIR

# key -> (max broadcast hints, the audited bounded side).
# Counts can exceed the number of F.broadcast() call sites when a hinted
# relation is referenced by several plan branches (each reference prints
# its own ResolvedHint node).
HINT_ALLOWANCE: dict[str, tuple[int, str]] = {
    "agg_approx_quantile_audit": (1, "per-returnflag exact quantiles (3 rows)"),
    "agg_heavy_hitters": (1, "1-row global mean-frequency threshold"),
    "analytics_excess_inventory": (2, "nation + region dims"),
    "analytics_idle_customers": (1, "1-row percentile cut"),
    "analytics_important_stock": (3, "nation x2 branches + 1-row grand total"),
    "analytics_lorenz": (1, "1-row grand total"),
    "analytics_market_share": (3, "nation x2 roles + region"),
    "analytics_min_cost_supplier": (4, "nation + region x2 plan branches"),
    "analytics_nation_volume": (2, "nation x2 roles"),
    "analytics_product_profit": (1, "nation dim"),
    "analytics_regional_revenue": (2, "nation + region dims"),
    "analytics_returned_customers": (1, "nation dim"),
    "analytics_rfm": (4, "1-row max-date + 27-row R/F/M cut grid branches"),
    "analytics_top_supplier": (1, "1-row max-revenue scalar"),
    "analytics_trend": (1, "1-row global min-hour"),
    "analytics_waiting_orders": (1, "nation dim"),
    "analytics_yoy": (1, "nation dim"),
    "anomaly_zscore": (1, "per-event-type stats (type vocabulary)"),
    "bm25_topk": (1, "doc frequencies of the fixed query terms"),
    "contamination_by_source": (1, "inherited: v2's authored eval-set grams"),
    "contamination_check_v2": (1, "benchmark eval-set grams (design-bounded)"),
    "contamination_tokens": (1, "benchmark eval-set id-grams (design-bounded: authored EVAL_SET encoded under the learned vocab)"),
    "dedup_recall_v2": (
        5,
        "fixed-id panel grams/sizes/band-signatures; the r10 cap-guard "
        "arm re-references the panel-sizes broadcast (same design-"
        "bounded side, counted once per plan branch)",
    ),
    "doc_pack": (1, "per-partition prefix-sum offsets (metadata)"),
    "doc_pack_bpe": (1, "per-partition prefix-sum offsets (metadata)"),
    "doc_pack_sequences": (1, "per-partition prefix-sum offsets (metadata)"),
    "pipeline_curation_v4": (1, "per-partition prefix-sum offsets (metadata, via doc_pack_bpe's packing stage)"),
    "pipeline_curation_v5": (
        2,
        "per-partition prefix-sum offsets (metadata) + benchmark eval-set "
        "id-grams (design-bounded: authored EVAL_SET encoded under the "
        "learned vocab — contamination_tokens' audited side)",
    ),
    "embedding_norm_outliers": (1, "1-row norm stats"),
    "eval_confusion": (2, "k centroids + label stats (label vocabulary)"),
    "join_broadcast": (1, "nation dim (supplier is AQE-planned)"),
    "join_range": (1, "4-row literal band table"),
    # knn_cosine / knn_lsh / knn_ivf carry NO allowance: their r12 numpy
    # rewrite removed the panel broadcast hints entirely (panels are
    # driver-collected), so a reappearing hint must fail this audit
    # until re-audited (ADVICE r12).
    "knn_centroid_classify": (1, "k centroids"),
    "knn_recall_v2": (1, "1-row exact-arm count scalars (panel broadcasts gone in the r12 numpy-arm rewrite)"),
    "knn_recall_pq": (1, "1-row exact-arm count scalars (n_exact, n_queries)"),
    "knn_recall_rerank": (1, "1-row exact-arm count scalars (n_exact, n_queries)"),
    "knn_recall_filtered": (1, "1-row exact-arm count scalars (n_exact, n_queries)"),
    "mix_temperature": (1, "per-source temperature table (source vocabulary)"),
    "pipeline_curation_v2": (1, "benchmark eval-set grams"),
    "pipeline_curation_v3": (2, "benchmark grams + 1-row max"),
    "quantile_bucketize": (2, "partition offsets + bucket boundaries"),
    "sample_weighted": (1, "1-row max-weight scalar"),
    "shuffle_deterministic": (1, "partition offsets (metadata)"),
    "sort_global": (1, "partition offsets (metadata)"),
    "text_collocations": (1, "1-row pair-total"),
    "timeseries_resample": (1, "event-type vocabulary grid"),
    "vocab_oov_rate": (1, "top-K vocabulary (LIMIT K)"),
    "vocab_zipf": (1, "1-row total"),
}


def test_allowance_table_is_not_stale():
    stale = set(HINT_ALLOWANCE) - set(engine.QUERIES)
    assert not stale, f"allowance rows for retired keys: {sorted(stale)}"


@pytest.mark.parametrize("key", sorted(engine.QUERIES))
def test_no_static_broadcast_on_growing_sides(key, spark):
    df = engine.QUERIES[key](spark, SF_DIR)
    n = count_static_broadcast_hints(df)
    allowed, reason = HINT_ALLOWANCE.get(key, (0, "no hint audited"))
    assert n <= allowed, (
        f"{key}: {n} static broadcast hint(s) in the analyzed plan, "
        f"allowance {allowed} ({reason}). A static hint is only legal on a "
        "DESIGN-bounded side — audit it into HINT_ALLOWANCE or drop it and "
        "let AQE decide."
    )
