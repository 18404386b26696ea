"""Degenerate-fixture parity: the ADVICE-r5 failure modes must produce
IDENTICAL output on both engines, not a Spark-side ANSI error.

CLAUDE.md warns fixtures drift across driver regenerations; these tests
pin the two classes a drifted fixture could hit:

- ``anomaly_zscore`` on a zero-variance series (single event / constant
  values): std = 0 → z must be NULL-filtered on both sides, never
  DIVIDE_BY_ZERO (session runs ANSI mode).
- ``text_quality`` on empty / whitespace-only documents: zero tokens →
  NULL metrics row on both sides, keep = FALSE via 3VL.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import ls_hadoop_3_0_spark as engine

from .compare import assert_equivalent

DEGEN_DIR = "/root/repo/.scratch/degenerate_sf"


@pytest.fixture(scope="module")
def degen_sf(spark):
    os.makedirs(DEGEN_DIR, exist_ok=True)
    events = spark.createDataFrame(
        [
            # 'flat': constant values → variance exactly 0
            (1, "2024-01-01 00:00:00", 10, "flat", 5.0, "{}"),
            (2, "2024-01-01 00:01:00", 11, "flat", 5.0, "{}"),
            (3, "2024-01-01 00:02:00", 12, "flat", 5.0, "{}"),
            # 'lone': a single event → variance 0 by construction
            (4, "2024-01-01 00:03:00", 13, "lone", 7.25, "{}"),
            # 'ok': healthy series with one wild outlier. A lone outlier's
            # max |z| is sqrt(n-1), so n must exceed 10 for |z| > 3.
            *[
                (4 + i, f"2024-01-01 00:{4 + i:02d}:00", 13 + i, "ok",
                 1.0 + 0.01 * i, "{}")
                for i in range(1, 12)
            ],
            (16, "2024-01-01 00:16:00", 25, "ok", 1000.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "cast(ts as timestamp_ntz) as ts", "user_id",
        "event_type", "value", "props",
    )
    docs = spark.createDataFrame(
        [
            (1, "", "en", "web", 0),
            (2, "   ", "en", "web", 3),
            (3, "the quick brown fox jumps over the lazy dog again and "
                "again for a while longer today", "en", "web", 88),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    # label 0 carries an ALL-ZERO vector: Σx⁴ = 0 → participation ratio
    # 0/0, the ADVICE-r7 NaN→ANSI-cast-abort class. Must surface as a
    # NULL prm (never an outlier) identically on both engines.
    emb = spark.createDataFrame(
        [
            (1, [0.0, 0.0, 0.0, 0.0], 0),
            (2, [1.0, 2.0, 2.0, 0.5], 0),
            (3, [0.5, 0.5, 0.5, 0.5], 0),
            (4, [3.0, 0.1, 0.1, 0.1], 1),
            (5, [1.0, 1.0, 0.0, 0.0], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    events.coalesce(1).write.mode("overwrite").parquet(f"{DEGEN_DIR}/events.parquet")
    docs.coalesce(1).write.mode("overwrite").parquet(f"{DEGEN_DIR}/documents.parquet")
    emb.coalesce(1).write.mode("overwrite").parquet(f"{DEGEN_DIR}/embeddings.parquet")
    return DEGEN_DIR


@pytest.fixture(scope="module")
def degen_duck(degen_sf):
    con = duckdb.connect()
    for t in ("events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{degen_sf}/{t}.parquet/*.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize(
    "key", ["anomaly_zscore", "text_quality", "embedding_norm_outliers"]
)
def test_degenerate_parity(key, spark, degen_sf, degen_duck):
    sdf = engine.QUERIES[key](spark, degen_sf).toPandas()
    odf = degen_duck.execute(engine.ORACLES[key]).fetchdf()
    assert_equivalent(sdf, odf, key)


def test_zero_variance_rows_dropped_not_raised(spark, degen_sf):
    out = engine.QUERIES["anomaly_zscore"](spark, degen_sf).toPandas()
    # flat/lone series contribute no rows; the 'ok' outlier is flagged.
    assert set(out["event_type"]) == {"ok"}


def test_empty_docs_get_null_metrics(spark, degen_sf):
    out = (
        engine.QUERIES["text_quality"](spark, degen_sf)
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc[1].isna()["awl"] and out.loc[2].isna()["awl"]
    assert not bool(out.loc[1]["keep"]) and not bool(out.loc[2]["keep"])
    assert not out.loc[3].isna()["awl"]
