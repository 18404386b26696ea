"""Round-15 keys and pins.

Covers the r14 VERDICT items as they land: the ANN index epoch roll
(prior files untouched, increment-only writes, serve pruning), the
incremental embedding dedup (bucketed prior probes, constructed-dup
semantics), the streaming quality gate, token-grain decontamination,
packed-sequence assembly invariants, sampled BPE training, and the
classifier v2 feature families.
"""

from __future__ import annotations

import os

import pytest

from ls_hadoop_3_0_spark import ORACLES, QUERIES

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# knn_index_compact — the epoch roll must be metadata + increment only.


def test_index_compact_prior_files_untouched(spark):
    """The roll's contract: prior index data files are NEVER read,
    rewritten, or removed — the next epoch references them by hardlink
    (same inode) and adds only the new slice's files."""
    from ls_hadoop_3_0_spark.llm import similarity as S

    S._ivf_compact_prior(spark, SF_DIR)
    tag = os.path.basename(os.path.normpath(SF_DIR)) or "default"
    prior_path, _ = S._IVF_COMPACT_PRIOR[tag]

    def listing(root):
        out = {}
        for r, _d, files in os.walk(root):
            for f in files:
                if f.startswith(("_", ".")):
                    continue
                p = os.path.join(r, f)
                st = os.stat(p)
                out[os.path.relpath(p, root)] = (st.st_ino, st.st_size)
        return out

    before = listing(prior_path)
    assert before, "prior index must have data files"
    QUERIES["knn_index_compact"](spark, SF_DIR).collect()
    after = listing(prior_path)
    assert before == after, "prior files must be byte-untouched by the roll"

    next_path = S._IVF_COMPACT_LAST[tag]
    rolled = listing(next_path)
    # every prior file appears in the rolled epoch as the SAME inode
    # (hardlink — zero bytes copied)
    rolled_inodes = {ino for ino, _ in rolled.values()}
    for rel, (ino, _sz) in before.items():
        assert ino in rolled_inodes, f"prior file {rel} not linked into epoch"
    # the appended files are exactly the non-linked ones, live only in
    # cell= partition dirs, and hold exactly the new slice's rows
    appended = [
        rel
        for rel, (ino, _sz) in rolled.items()
        if ino not in {i for i, _ in before.values()}
    ]
    assert appended, "the roll must append the increment's files"
    assert all(rel.startswith("cell=") for rel in appended), appended

    from pyspark.sql import functions as F

    from ls_hadoop_3_0_spark.tables import load

    n_new = (
        load(spark, SF_DIR, "embeddings")
        .filter(F.expr(S.IVF_INCR_NEW_PRED))
        .count()
    )
    n_prior_rows = spark.read.schema(
        "vec_id long, label int, u array<double>, cell int"
    ).parquet(prior_path).count()
    n_rolled = spark.read.schema(
        "vec_id long, label int, u array<double>, cell int"
    ).parquet(next_path).count()
    assert n_rolled == n_prior_rows + n_new


def test_index_compact_serve_prunes_rolled_partitions(spark):
    """Serving from the rolled epoch keeps knn_ivf_indexed's pruning:
    only probed cell directories are read (proven over EXECUTED rows
    via input_file_name, the r13 rule — inputFiles() is pre-pruning)."""
    import numpy as np
    from pyspark.sql import functions as F

    from ls_hadoop_3_0_spark.llm import similarity as S

    QUERIES["knn_index_compact"](spark, SF_DIR).collect()
    tag = os.path.basename(os.path.normpath(SF_DIR)) or "default"
    next_path = S._IVF_COMPACT_LAST[tag]
    _, cents = S._IVF_COMPACT_PRIOR[tag]

    back = spark.read.schema(
        "vec_id long, label int, u array<double>, cell int"
    ).parquet(next_path)
    probed = list(range(0, S.IVF_K, 2))  # any strict subset
    touched = {
        r["f"]
        for r in back.filter(F.col("cell").isin(probed))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    assert touched, "probe must read something"
    for f in touched:
        cell = int(f.split("cell=")[1].split("/")[0])
        assert cell in probed, f"unprobed partition read: {f}"


# ---------------------------------------------------------------------------
# dedup_embedding_incremental — bucketed prior probes + constructed dups.


def test_emb_incremental_prior_side_probed_not_reshuffled(spark):
    """All three prior-index scans carry their bucket hash as output
    partitioning (Bucketed: true <=> no Exchange above them), and no
    side is statically broadcast (every side grows with the corpus)."""
    from ls_hadoop_3_0_spark.plans.checks import formatted_plan

    df = QUERIES["dedup_embedding_incremental"](spark, SF_DIR)
    plan = formatted_plan(df)
    scans = [
        block
        for block in plan.split("\n\n")
        if "Scan parquet" in block
        and ".embi_" in block
        and "Location:" in block
    ]
    assert len(scans) == 3, plan
    for block in scans:
        assert "Bucketed: true" in block, block
    assert "BroadcastExchange" not in plan, plan


def test_emb_incremental_constructed_duplicates(spark, tmp_path):
    """Pins the semantics the (dup-free) fixture can't show: exact
    clone of a prior vector, near-copy of a prior vector, label
    blocking (same u, different label is NOT exact), and the
    new-vs-new exclusion. Then full oracle parity on the same
    constructed fixture."""
    import duckdb
    import pandas as pd

    from tests.compare import assert_equivalent

    DIM = 64

    def vec(seed, bump=0.0):
        # deterministic, well-away from hyperplane boundaries
        v = [((seed * 31 + i * 7) % 13 - 6) / 6.0 + 0.01 for i in range(DIM)]
        v[0] += bump
        return v

    rows = [
        # prior slice (vec_id % 10 < 8)
        (3, vec(1), 5),
        (4, vec(2), 5),
        (5, vec(1), 7),  # same direction, different label
        # new slice (vec_id % 10 >= 8)
        (18, vec(1), 5),        # exact clone of 3 -> exact_dup=1
        (19, vec(2, 0.05), 5),  # near copy of 4 -> n_near >= 1, not exact
        (28, vec(9), 5),        # unrelated
        (38, vec(9), 5),        # clones NEW 28, no prior match -> unflagged
    ]
    pd.DataFrame(
        {
            "vec_id": [r[0] for r in rows],
            "embedding": [
                pd.array(r[1], dtype="float32").tolist() for r in rows
            ],
            "label": pd.array([r[2] for r in rows], dtype="int32"),
        }
    ).to_parquet(tmp_path / "embeddings.parquet")

    got = {
        r["vec_id"]: (r["exact_dup"], r["n_near"])
        for r in QUERIES["dedup_embedding_incremental"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got[18][0] == 1 and got[18][1] >= 1  # clone of prior 3
    assert got[19][0] == 0 and got[19][1] >= 1  # near prior 4
    assert got[38] == got[28]  # new-vs-new clone changes nothing
    assert got[38][0] == 0

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet')"
    )
    sdf = QUERIES["dedup_embedding_incremental"](spark, str(tmp_path)).toPandas()
    odf = con.execute(ORACLES["dedup_embedding_incremental"]).fetchdf()
    con.close()
    assert_equivalent(sdf, odf, key="dedup_embedding_incremental")


# ---------------------------------------------------------------------------
# stream_quality_incremental


def test_stream_quality_gate_matches_batch(spark):
    """The executed stream's digest equals the batch twin's (the real
    in-session comparison), and the gate actually splits the slice."""
    row = QUERIES["stream_quality_incremental"](spark, SF_DIR).collect()[0]
    assert row["matches_batch"] is True
    assert 0 <= row["n_pass"] <= row["n_new"]


def test_stream_quality_gate_uses_frozen_prior_model(spark):
    """The stream's pass-set must equal scoring new docs under the
    PRIOR-slice-fit model — not under a model fit on all docs."""
    from pyspark.sql import functions as F

    from ls_hadoop_3_0_spark.llm.classifier import (
        _SIG_SPARK,
        _qc_fit,
        _qc_margins,
        _qc_sparse,
    )
    from ls_hadoop_3_0_spark.llm.dedup import INCR_NEW_PRED, INCR_PRIOR_PRED

    nd_p, sx_p = _qc_sparse(spark, SF_DIR, doc_pred=INCR_PRIOR_PRED)
    qw, qt, _ = _qc_fit(nd_p, sx_p)
    nd_n, sx_n = _qc_sparse(spark, SF_DIR, doc_pred=INCR_NEW_PRED)
    z = (F.col("qm") - F.lit(qt)).cast("double") / F.lit(1e6)
    expected_pass = (
        _qc_margins(sx_n, qw)
        .withColumn("z", z)
        .withColumn(
            "qp", F.round(F.expr(_SIG_SPARK) * F.lit(1e6), 0).cast("long")
        )
        .filter(F.col("qp") >= 500000)
        .count()
    )
    row = QUERIES["stream_quality_incremental"](spark, SF_DIR).collect()[0]
    assert row["n_pass"] == expected_pass


# ---------------------------------------------------------------------------
# doc_pack_sequences — boundary-exact packing invariants.


def test_doc_pack_sequences_boundary_exact(spark):
    from pyspark.sql import functions as F

    from ls_hadoop_3_0_spark.llm.curation import PACK_WINDOW

    win = QUERIES["doc_pack_sequences"](spark, SF_DIR).localCheckpoint()
    man = QUERIES["doc_pack_bpe"](spark, SF_DIR)

    total = man.agg(F.sum("n_tokens")).collect()[0][0]
    n_docs = man.count()
    stats = win.agg(
        F.sum("n_ids").alias("s"),
        F.sum("n_doc_starts").alias("starts"),
        F.max("window_id").alias("mx"),
        F.count(F.lit(1)).alias("nw"),
    ).collect()[0]
    assert stats["s"] == total, "every token in exactly one window"
    assert stats["starts"] == n_docs, "every doc starts exactly once"
    assert stats["mx"] == (total - 1) // PACK_WINDOW
    assert stats["nw"] == stats["mx"] + 1, "windows are contiguous"
    # every window but the last is exactly full
    short = win.filter(
        (F.col("n_ids") != PACK_WINDOW) & (F.col("window_id") != stats["mx"])
    ).count()
    assert short == 0


# ---------------------------------------------------------------------------
# contamination_tokens — a planted eval phrase is caught at id grain.


def test_contamination_tokens_planted_phrase(spark, tmp_path):
    import duckdb
    import pandas as pd

    from ls_hadoop_3_0_spark.llm.curation import EVAL_SET
    from tests.compare import assert_equivalent

    phrase = EVAL_SET[0][1]
    docs = [
        (1, f"intro words then {phrase} and trailing words"),
        (2, "totally unrelated content about weather and birds today"),
        (3, "more filler having zero overlap with benchmark phrasing"),
    ]
    pd.DataFrame(
        {
            "doc_id": [d[0] for d in docs],
            "text": [d[1] for d in docs],
            "lang": ["en"] * len(docs),
            "source": ["t"] * len(docs),
            "n_chars": [len(d[1]) for d in docs],
        }
    ).to_parquet(tmp_path / "documents.parquet")

    out = {
        r["doc_id"]: r["n_shared_grams"]
        for r in QUERIES["contamination_tokens"](spark, str(tmp_path)).collect()
    }
    assert out.get(1, 0) > 0, "planted phrase must be flagged at id grain"
    assert 2 not in out and 3 not in out, "clean docs must not be flagged"

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    sdf = QUERIES["contamination_tokens"](spark, str(tmp_path)).toPandas()
    odf = con.execute(ORACLES["contamination_tokens"]).fetchdf()
    con.close()
    assert_equivalent(sdf, odf, key="contamination_tokens")


# ---------------------------------------------------------------------------
# bpe_learn_sampled


def test_bpe_sampled_counts_all_words(spark):
    """The sampled twin must not silently drop words its vocabulary
    never saw: its per-source word totals cover AT LEAST
    bpe_compression's (which inner-joins away non-alphabet words), and
    every word costs >= 1 token."""
    from pyspark.sql import functions as F

    s = {
        r["source"]: (r["n_words"], r["n_bpe_tokens"])
        for r in QUERIES["bpe_learn_sampled"](spark, SF_DIR).collect()
    }
    full = {
        r["source"]: r["n_words"]
        for r in QUERIES["bpe_compression"](spark, SF_DIR).collect()
    }
    assert s, "sampled compression must produce rows"
    for src, (nw, nt) in s.items():
        assert nt >= nw, "every word costs at least one token"
        assert nw >= full.get(src, 0), "left join must keep OOV words"


def test_bpe_sample_pred_dialect_parity(spark):
    """The two dialect spellings of the md5 sample predicate select the
    SAME doc set (the sampling is part of the key's semantics)."""
    import duckdb
    from pyspark.sql import functions as F

    from ls_hadoop_3_0_spark.functions.text import _bpe_sample_pred
    from ls_hadoop_3_0_spark.tables import load

    ids_spark = sorted(
        r["doc_id"]
        for r in load(spark, SF_DIR, "documents")
        .filter(F.expr(_bpe_sample_pred("spark")))
        .select("doc_id")
        .collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    ids_duck = sorted(
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM documents WHERE {_bpe_sample_pred('duck')}"
        ).fetchall()
    )
    con.close()
    assert ids_spark == ids_duck
    assert 0 < len(ids_spark) < 500  # a strict, non-empty sample


# ---------------------------------------------------------------------------
# quality_classifier_v2


def test_classifier_v2_beats_majority(spark):
    row = QUERIES["quality_classifier_eval_v2"](spark, SF_DIR).collect()[0]
    majority = max(row["tp"] + row["fn"], row["fp"] + row["tn"]) / row["n"]
    assert row["accuracy"] > majority, "v2 must beat the majority class"


def test_classifier_v2_feature_blocks_disjoint(spark):
    """The three families land in disjoint bucket blocks and per-family
    masses each sum to ~FEATURE_DIM*1e6 per doc (L1 normalization)."""
    from pyspark.sql import functions as F

    from ls_hadoop_3_0_spark.functions.text import FEATURE_DIM
    from ls_hadoop_3_0_spark.llm.classifier import QC2_D, _qc2_sparse

    nd, sx = _qc2_sparse(spark, SF_DIR)
    rng = sx.agg(F.min("b"), F.max("b")).collect()[0]
    assert rng[0] >= 1 and rng[1] == QC2_D
    fam = (
        sx.filter(F.col("b") < QC2_D)
        .withColumn("f", ((F.col("b") - 1) / FEATURE_DIM).cast("int"))
        .groupBy("doc_id", "f")
        .agg(F.sum("qx").alias("m"))
    )
    bad = fam.filter(
        (F.col("m") < (FEATURE_DIM - 1) * 1_000_000)
        | (F.col("m") > (FEATURE_DIM + 1) * 1_000_000)
    ).count()
    assert bad == 0, "per-family quantized mass must be ~DIM*1e6"


# ---------------------------------------------------------------------------
# stream_knn_serve


def test_stream_knn_serve_matches_batch_per_query(spark):
    """Every panel query's streamed digest equals the batch twin's, and
    the candidate counts respect the IVF probe bound (only probed-cell
    members can be scored)."""
    from pyspark.sql import functions as F

    from ls_hadoop_3_0_spark.llm import similarity as S
    from ls_hadoop_3_0_spark.tables import load

    out = QUERIES["stream_knn_serve"](spark, SF_DIR).collect()
    assert out, "panel must produce per-query rows"
    assert all(r["matches_batch"] for r in out)
    n_corpus = load(spark, SF_DIR, "embeddings").count()
    for r in out:
        assert 0 < r["n_cand"] < n_corpus  # probed cells, never full scan
        assert -1.000001 <= r["max_cosine"] <= 1.000001
