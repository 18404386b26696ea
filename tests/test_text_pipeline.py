"""Invariants for the round-6 text-pipeline keys (wordstats, vocab_build,
bm25_topk, quality_repetition, mix_domains, text_redact_pii) — semantics
the oracle hash can't state directly: agreement with independent local
recomputation, ranking monotonicity, rate geometry, redaction behavior on
handcrafted inputs."""

from __future__ import annotations

import hashlib
import re
import statistics

import pyspark.sql.functions as F

from ls_hadoop_3_0_spark.functions.text import (
    BM25_QUERY,
    BM25_TOPK,
    VOCAB_MAX,
    bm25_topk,
    vocab_build,
    wordstats,
)
from ls_hadoop_3_0_spark.llm.curation import (
    PII_EMAIL_RE,
    PII_PHONE_RE,
    mix_domains,
    quality_repetition,
    text_redact_pii,
)
from ls_hadoop_3_0_spark.plans import checks
from ls_hadoop_3_0_spark.tables import load

from .conftest import SF_DIR


def _token_lengths(spark):
    return [
        r["ln"]
        for r in load(spark, SF_DIR, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .select(F.length("w").alias("ln"))
        .collect()
    ]


def test_wordstats_matches_local_recomputation(spark):
    """The fused MR-examples aggregate == python statistics on the same
    multiset of word lengths (mean/median/pstdev, one row)."""
    row = wordstats(spark, SF_DIR).collect()[0]
    lens = _token_lengths(spark)
    assert row["n_words"] == len(lens)
    assert abs(row["mean_len"] - statistics.fmean(lens)) < 1e-9
    assert abs(row["median_len"] - statistics.median(lens)) < 1e-6
    assert abs(row["stddev_len"] - statistics.pstdev(lens)) < 1e-6


def test_wordstats_single_aggregation_pass(spark):
    """All four statistics from ONE scan + one (map-combined) shuffle —
    the point of fusing three Hadoop example jobs."""
    plan = checks.formatted_plan(wordstats(spark, SF_DIR))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan


def test_vocab_build_ids_ranks_and_coverage(spark):
    rows = sorted(vocab_build(spark, SF_DIR).collect(), key=lambda r: r["vocab_id"])
    assert rows, "empty vocabulary"
    assert len(rows) <= VOCAB_MAX
    # Dense IDs from 0; counts non-increasing; asc word within equal count.
    for i, r in enumerate(rows):
        assert r["vocab_id"] == i
    for a, b in zip(rows, rows[1:]):
        assert a["n"] > b["n"] or (a["n"] == b["n"] and a["word"] < b["word"])
    # cum_frac strictly increasing, ends at exactly 1.0 when the whole
    # vocabulary fits under the cap (it does on the fixture corpus).
    fracs = [r["cum_frac"] for r in rows]
    assert all(x < y for x, y in zip(fracs, fracs[1:]))
    total_words = wordstats(spark, SF_DIR).collect()[0]["n_words"]
    assert sum(r["n"] for r in rows) == total_words
    assert fracs[-1] == 1.0


def test_bm25_ranking_is_sound(spark):
    rows = bm25_topk(spark, SF_DIR).collect()
    assert 0 < len(rows) <= BM25_TOPK
    # Descending score, doc_id tie-break; every hit matches >=1 query term.
    key = [(-r["score"], r["doc_id"]) for r in rows]
    assert key == sorted(key)
    assert all(1 <= r["n_terms"] <= len(BM25_QUERY) for r in rows)
    assert all(r["score"] > 0 for r in rows)
    hit_ids = [r["doc_id"] for r in rows]
    texts = {
        r["doc_id"]: r["text"]
        for r in load(spark, SF_DIR, "documents")
        .filter(F.col("doc_id").isin(hit_ids))
        .collect()
    }
    for r in rows:
        toks = set(texts[r["doc_id"]].split(" "))
        assert toks & set(BM25_QUERY), r


def test_bm25_scores_match_local_okapi(spark):
    """Spark's distributed BM25 == a literal local Okapi implementation
    (same quantization) over the collected corpus."""
    import math

    from ls_hadoop_3_0_spark.functions.text import BM25_B, BM25_K1

    docs = {
        r["doc_id"]: [t for t in r["text"].split(" ") if t]
        for r in load(spark, SF_DIR, "documents").collect()
    }
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    df = {
        q: sum(1 for t in docs.values() if q in t) for q in BM25_QUERY
    }
    scores = {}
    for d, toks in docs.items():
        sq = 0
        for q in BM25_QUERY:
            tf = toks.count(q)
            if not tf:
                continue
            idf = math.log(1.0 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s = idf * (tf * (BM25_K1 + 1.0)) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * len(toks) / avgdl)
            )
            sq += int(round(s * 1_000_000))
        if sq:
            scores[d] = sq / 1_000_000.0
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:BM25_TOPK]
    got = [(r["doc_id"], r["score"]) for r in bm25_topk(spark, SF_DIR).collect()]
    assert got == want


def test_repetition_flags_handcrafted_docs(spark, tmp_path):
    """A phrase-looping doc must flag; a max-diversity doc must not."""
    looped = "spam ham " * 30
    diverse = " ".join(f"w{i}" for i in range(60))
    rows = [
        (0, looped.strip(), "en", "src0", len(looped)),
        (1, diverse, "en", "src1", len(diverse)),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {r["doc_id"]: r for r in quality_repetition(spark, str(tmp_path)).collect()}
    assert out[0]["is_repetitive"] and not out[1]["is_repetitive"]
    # "spam ham spam ham ...": every bigram occurrence is a duplicate and
    # the top bigram ("spam ham" x30) holds 30/59 of occurrences.
    assert out[0]["dup2_frac"] == 1.0
    assert abs(out[0]["top2_frac"] - 30 / 59) < 1e-12
    assert out[0]["dup5_frac"] == 1.0
    # All-distinct tokens: top n-gram fraction is 1/total, no duplicates.
    assert out[1]["dup2_frac"] == 0.0 and out[1]["dup5_frac"] == 0.0
    assert abs(out[1]["top2_frac"] - 1 / 59) < 1e-12


def test_repetition_metrics_bounded_and_two_shuffles(spark):
    # Count on a fresh plan: after .collect() AQE's final plan re-prints
    # exchanges (AQEShuffleRead wrappers) and double-counts.
    # 2 doc-keyed shuffles + at most 1 spread() round-robin of the raw
    # docs when the fixture scan under-splits (a no-op on a real
    # many-split corpus — see tables.spread).
    assert checks.shuffle_count(quality_repetition(spark, SF_DIR)) <= 3
    df = quality_repetition(spark, SF_DIR)
    rows = df.collect()
    n_docs = load(spark, SF_DIR, "documents").filter(F.length("text") > 0).count()
    assert len(rows) == n_docs
    for r in rows:
        for c in ("top2_frac", "top3_frac", "top4_frac", "dup2_frac", "dup5_frac"):
            if r[c] is not None:
                assert 0.0 <= r[c] <= 1.0, (c, r)


def test_mix_domains_rate_geometry(spark):
    rows = mix_domains(spark, SF_DIR).collect()
    srcs = {
        r["source"]
        for r in load(spark, SF_DIR, "documents").select("source").distinct().collect()
    }
    assert {r["source"] for r in rows} == srcs
    for r in rows:
        num = int(r["source"][3:])
        want_rate = {0: 26 / 256, 1: 64 / 256, 2: 128 / 256, 3: 1.0}[num % 4]
        assert r["rate"] == want_rate, r
        assert 0 <= r["n_kept"] <= r["n_docs"]
        if r["rate"] == 1.0:
            assert r["n_kept"] == r["n_docs"] and r["kept_chars"] > 0
        else:
            # 500-doc fixture strata are small; just demand the sampler
            # actually drops something at sub-1.0 rates.
            assert r["n_kept"] < r["n_docs"]


def test_redaction_matches_python_re(spark):
    """Spark's Java-regex redaction == python re on the same synthesized
    strings (the patterns are common-subset by construction)."""
    out = {r["c_custkey"]: r for r in text_redact_pii(spark, SF_DIR).collect()}
    cust = load(spark, SF_DIR, "customer").limit(25).collect()
    assert len(out) >= len(cust)
    for c in cust:
        k = c["c_custkey"]
        raw = (
            f"contact {c['c_name']} at cust{k}@example.com "
            f"or +1-555-{k % 10000:04d}"
        )
        red = re.sub(PII_PHONE_RE, "<PHONE>", re.sub(PII_EMAIL_RE, "<EMAIL>", raw))
        assert out[k]["n_emails"] == len(re.findall(PII_EMAIL_RE, raw)) == 1
        assert out[k]["n_phones"] == len(re.findall(PII_PHONE_RE, raw)) == 1
        assert out[k]["red_len"] == len(red)
        assert out[k]["red_md5"] == hashlib.md5(red.encode()).hexdigest()
        assert "@" not in red and "+1-555-" not in red


def test_redaction_is_map_only(spark):
    assert checks.shuffle_count(text_redact_pii(spark, SF_DIR)) == 0


def test_pipeline_v2_agrees_with_its_stage_keys(spark):
    """Every manifest row must be independently approved by each stage
    key it claims to compose, and pack offsets must tile in doc_id
    order — the pipeline can't drift from its stages."""
    import ls_hadoop_3_0_spark as engine
    from ls_hadoop_3_0_spark.llm.curation import EVAL_SET  # noqa: F401 (authored set exists)

    rows = sorted(
        engine.QUERIES["pipeline_curation_v2"](spark, SF_DIR).collect(),
        key=lambda r: r["doc_id"],
    )
    assert rows, "pipeline produced an empty corpus — gates not discriminating"
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))
    acc = 0
    for r in rows:
        assert r["pack_start"] == acc, (r, acc)
        acc += r["n_tokens"]
    quality = {
        r["doc_id"]: r["keep"]
        for r in engine.QUERIES["text_quality"](spark, SF_DIR).collect()
    }
    repet = {
        r["doc_id"]: r["is_repetitive"]
        for r in engine.QUERIES["quality_repetition"](spark, SF_DIR).collect()
    }
    contaminated = {
        r["doc_id"]
        for r in engine.QUERIES["contamination_check_v2"](spark, SF_DIR).collect()
    }
    kept_ids = set(ids)
    for d in ids:
        assert quality[d], d
        assert not repet[d], d
        assert d not in contaminated, d
    # Dedup: no two kept docs share a content hash.
    hashes = [r["content_hash"] for r in rows]
    assert len(hashes) == len(set(hashes))
    # Mixture: kept docs respect the per-source md5 threshold rule.
    import hashlib

    srcs = {
        r["doc_id"]: r["source"]
        for r in load(spark, SF_DIR, "documents").select("doc_id", "source").collect()
    }
    thr = {0: "1a", 1: "40", 2: "80", 3: "zz"}
    for d in kept_ids:
        b = int(srcs[d][3:]) % 4
        assert hashlib.md5(str(d).encode()).hexdigest()[:2] < thr[b], d


def test_lm_unigram_score_bounds(spark):
    """Every scored doc has positive finite avg_nll; a doc made of the
    corpus's most frequent token would score -ln(max p) — the minimum —
    so the per-doc mean lies in [-ln(p_max), -ln(p_min)] + quantization."""
    import math

    from ls_hadoop_3_0_spark.functions.text import lm_unigram_score

    rows = lm_unigram_score(spark, SF_DIR).collect()
    docs = load(spark, SF_DIR, "documents")
    tok = docs.select(F.explode(F.split("text", " ")).alias("w")).filter(
        F.col("w") != ""
    )
    total = tok.count()
    cnts = [r.c for r in tok.groupBy("w").agg(F.count("*").alias("c")).collect()]
    lo = -math.log(max(cnts) / total) - 1e-5
    hi = -math.log(min(cnts) / total) + 1e-5
    n_docs_with_tokens = docs.filter(F.trim("text") != "").count()
    assert len(rows) == n_docs_with_tokens
    for r in rows:
        assert lo <= r.avg_nll <= hi, (r.doc_id, r.avg_nll)
        assert r.n_tokens > 0


def test_feature_hash_matches_python_recompute(spark):
    """Vocabulary-free determinism: an independent Python recompute of
    the md5 bucket assignment reproduces every per-doc digest."""
    import hashlib
    from collections import Counter, defaultdict

    from ls_hadoop_3_0_spark.functions.text import FEATURE_DIM, feature_hash

    got = {r.doc_id: r for r in feature_hash(spark, SF_DIR).collect()}
    docs = load(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    for d in docs:
        toks = [w for w in d.text.split(" ") if w]
        if not toks:
            assert d.doc_id not in got
            continue
        counts = Counter(
            int(hashlib.md5(w.encode()).hexdigest()[:6], 16) % FEATURE_DIM
            for w in toks
        )
        digest = hashlib.md5(
            ",".join(f"{b}:{c}" for b, c in sorted(counts.items())).encode()
        ).hexdigest()
        r = got[d.doc_id]
        assert (r.n_buckets, r.max_count, r.features_md5) == (
            len(counts),
            max(counts.values()),
            digest,
        ), d.doc_id


def test_zipf_fit_matches_numpy_ols(spark):
    """Independent recompute: numpy OLS on the same quantized log points
    agrees to quantization precision, and the flat word-soup fixture is
    correctly reported as non-Zipfian (|slope| well under 1)."""
    import math
    from collections import Counter

    import numpy as np

    from ls_hadoop_3_0_spark.functions.text import vocab_zipf

    row = vocab_zipf(spark, SF_DIR).collect()[0]
    docs = load(spark, SF_DIR, "documents").select("text").collect()
    counts = Counter(w for d in docs for w in d.text.split(" ") if w)
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    x = np.array(
        [round(math.log(i + 1) * 1e6) / 1e6 for i in range(len(ranked))]
    )
    y = np.array([round(math.log(c) * 1e6) / 1e6 for _, c in ranked])
    slope = np.polyfit(x, y, 1)[0]
    assert row.n_types == len(ranked)
    assert abs(row.zipf_slope - slope) < 1e-6
    assert 0.0 <= row.r2 <= 1.0 + 1e-12
    assert abs(row.zipf_slope) < 0.9  # word-soup fixture: not Zipfian
