"""Regenerate PLANS.md — the physical-plan audit for headline queries.

Usage: python tools/dump_plans.py  (writes /root/repo/PLANS.md)

The charter's discipline is "explain('formatted') every operator and
iterate until it's the plan you'd want"; this artifact records the plans
actually produced, with the property each one is expected to exhibit
(the same properties tests/test_plans.py asserts).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ls_hadoop_3_0_spark as engine  # noqa: E402
from ls_hadoop_3_0_spark.plans.checks import formatted_plan
from ls_hadoop_3_0_spark.session import get_spark

SF = "/root/testdata/sf0.001"

HEADLINERS = [
    ("pricing_summary", "partial→final HashAggregate around one exchange; pushed shipdate filter; 7-column ReadSchema"),
    ("predicate_pushdown", "PushedFilters on l_shipdate+l_quantity; 4-of-11-column ReadSchema; zero exchanges"),
    ("join_broadcast", "two BroadcastHashJoins (supplier, nation); the only exchange is the final aggregation's"),
    ("topk", "TakeOrderedAndProject — per-partition heaps, no global sort"),
    ("analytics_regional_revenue", "6-way star join: 3 broadcast dims + shuffled fact joins + partial/final agg"),
    ("dedup_minhash", "exploded shingles → 12 partial-min aggregates (map-side combine) → band equi-join"),
    ("knn_cosine", "driver-collected bounded panel; map-only mapInPandas numpy-fold scoring emitting per-batch top-k supersets; ONE superset-small window shuffle (r12 rewrite — the BNLJ/HOF form DNF'd at 100×)"),
    ("stream_tumbling", "window() generation + partial/final agg — the plan Structured Streaming incrementalizes"),
    ("pipeline_curation", "filters → exact-dedup semi-join → minhash band join → anti-join, ONE lazy plan (the reference's 4-5-job DAG)"),
    ("jdbc_roundtrip", "JDBCRelation scan with 4 key-range partitions (DataDrivenDBInputFormat's split strategy)"),
    ("knn_ivf", "map-only numpy cell assignment + in-batch probed-cell-only scoring (no checkpoint barrier, no broadcast join since r12); ONE superset-small top-k window"),
    ("stream_interval_join", "ONE equi-join on user_id (BHJ at this scale, SMJ on a cluster) with the 1h band as join-condition residual — no BNLJ/cartesian anywhere"),
    ("sink_upsert", "full-outer SMJ on the key over base + read-back changeset — the copy-on-write MERGE shape"),
    ("analytics_bracket_revenue", "OR-hull PushedFilters on l_quantity; residual bracket OR post-join; part join left to AQE (scaling dim)"),
    ("profile_table", "melt → two-level aggregation: ONE fact scan, first shuffle bounded by Σ distinct cardinalities (4.5× faster than Catalyst's multi-distinct Expand rewrite)"),
    ("scd2_history", "lag → running-sum run ids → per-run agg → lead, all on ONE (user_id) exchange (partitioning reuse across the window/agg chain)"),
    ("graph_pagerank", "5 unrolled rounds over a localCheckpointed edge list — per round one src join + one dst agg; no per-round checkpoint barriers"),
    ("doc_chunk", "zero-exchange map-only: tokenize → sequence of starts → explode → slice, all in one codegen stage"),
    ("contamination_check", "corpus grams map-side distinct → BroadcastHashJoin against the bounded benchmark gram set → per-doc distinct counts"),
    ("join_bucketed", "zero-exchange SortMergeJoin over persisted co-bucketed tables (bucket hash = co-partitioning); the only exchange is the final aggregation's"),
    ("quality_repetition", "4 gram sizes in ONE tagged explode + ONE scan; 2 exchanges total ((doc,n,gram) count → (doc) conditional-agg pivot) — no per-gram-size pipelines"),
    ("pipeline_curation_v2", "six curation stages (quality, repetition, decontamination, exact dedup, mixture, packing) in ONE lazy plan; only broadcasts: the authored eval-gram set + the prefix-sum's partition offsets — never a corpus-scale side"),
    ("analytics_trend", "per-series OLS from exact moments: one scan, a 1-row global-MIN broadcast, one map-combined moment aggregation — two shuffles carrying 6 numbers per (type x partition)"),
    ("bm25_topk", "explode filtered to query-term hits before any shuffle; query-sized df broadcast; TakeOrderedAndProject top-k — never a global sort"),
    ("stream_late_drop", "chunked watermark: per-hour running max inside chunk partitions + metadata-scale cross-chunk prefix; NO global single-partition window over the fact, NO static broadcast of the time-span chunk table"),
    ("quality_crossdup", "ONE gram explode, ONE gram-keyed min/max/count aggregation; shared counts derived as total-minus-exclusive — the gram stream is never joined back (62 s → 43 s at 100×)"),
    ("quantile_bucketize", "global_rank (range partition → local rank → offsets) for the cutpoint positions — no single-task row_number window; 1-row cut set broadcast; one keyed aggregation"),
    ("pipeline_curation_v3", "statistical stack in ONE lazy plan: gram and token branches overlap in one DAG; content_hash computed map-side so doc-keyed joins never shuffle full text (87.7 s → 52.0 s at 100×)"),
    ("analytics_market_share", "7-way star join: broadcast dims (nation x2/region/supplier) around the orders⋈lineitem⋈customer shuffle spine; share = ratio of two scaled-long sums in the final agg"),
    ("analytics_waiting_orders", "two keyed aggregations over the same (orderkey[,suppkey]) grain reusing one exchange + co-partitioned self-join — the NOT EXISTS of Q21 as one max-equality pass"),
    ("timeseries_ohlc", "two row_numbers over ONE (series,bucket) window partitioning (one physical sort) + grouped agg on the same keys — a single exchange end-to-end"),
    ("graph_triangles", "oriented edge list built once (localCheckpoint) feeding 3 equi-join legs + degree agg; enumeration is output-bound — cost scales with triangle count, not a cross join"),
    ("agg_skewkurt", "one map-side quantization + one partial/final agg carrying 4 decimal power sums; the moment algebra runs on the 5-row result"),
    ("vocab_oov_rate", "TakeOrderedAndProject heap top-K vocab → K-bounded broadcast probe (design-constant side) → source-keyed reduce"),
    ("udf_cogrouped", "FlatMapCoGroupsInPandas: both sides exchanged once on user_id, merged in Arrow batches per key"),
    ("attribution_last_touch", "banded LEFT join keyed on user_id (band as residual), MAX-per-purchase collapse — no per-row ORDER BY/LIMIT subplans"),
    ("knn_pq_rerank", "ONE corpus pass (encode + ADC + pairwise exact fold on the kept top-R superset only — never a (P,n) dot table); two panel-small windows (adist shortlist, cosine re-rank)"),
    ("dedup_substrings", "gram stream shuffled ONCE (window-sum totals on gram hash — no flag join-back); islands/coverage on the duplicated subset; additive u24 digest makes retained text total−covered, no span assembly"),
    ("analytics_supplier_diversity", "map-side partial distinct over (partkey, suppkey) BEFORE the shuffle; blacklist anti-join + pushed brand/size part filters; two-phase COUNT(DISTINCT) — no static broadcast (both join sides grow with SF)"),
    ("analytics_excess_inventory", "Q20 nested-agg threshold from ONE fact shuffle: conditional (1996) and total quantity dsums in the same (part,supp) groupBy, compared without a second pass; dim joins on the aggregate, AQE-planned"),
    ("analytics_revenue_forecast", "the pushdown/codegen probe: all three predicates as PushedFilters, 2-column ReadSchema, one WholeStageCodegen span into partial+final agg"),
    ("text_collocations", "ONE corpus shuffle (map-combined bigram groupBy); margins re-aggregate the vocab-bounded pair table; 1-row total broadcast; top-100 = TakeOrderedAndProject"),
    ("token_bpe_pairs", "corpus collapses to word-type counts first; char-pair explode runs over the VOCABULARY weighted by counts — the real BPE counting shape"),
]


def main() -> None:
    spark = get_spark("plan_dump")
    out = [
        "# PLANS.md — physical-plan audit (generated by tools/dump_plans.py)",
        "",
        "Plans at sf0.001 (plan SHAPE is scale-invariant; AQE adjusts",
        "partitioning at runtime). Each section states the property the plan",
        "must exhibit — tests/test_plans.py asserts the load-bearing ones.",
        "",
    ]
    for key, expectation in HEADLINERS:
        df = engine.QUERIES[key](spark, SF)
        out += [
            f"## {key}",
            "",
            f"**Expected property:** {expectation}",
            "",
            "```",
            formatted_plan(df).strip(),
            "```",
            "",
        ]
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(HEADLINERS)} plans)")


if __name__ == "__main__":
    main()
