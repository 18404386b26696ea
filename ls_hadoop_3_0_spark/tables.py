"""Fixture loading (TESTDATA.md / FIXTURES.md).

One parquet file per table per scale factor. Schemas are fixed by the
driver-generated fixtures; we read them as-is (parquet carries the schema —
no inference involved, satisfying SURVEY.md §1.2 "never rely on inference").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


#: DuckDB-side FROM-clause replacement for ``events``. The fixture's ts
#: unit DRIFTS across driver regenerations (TIMESTAMP(NANOS) in r1-r2,
#: timestamp[us] since r3 — FIXTURES.md); ``epoch_ns`` is unit-agnostic
#: in DuckDB, and the ``// 1000`` floor-division truncates to µs exactly
#: as the Spark side does when nanos actually arrive, so both engines
#: agree whichever unit the driver ships next.
EVENTS_SQL = (
    "(SELECT event_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,"
    " user_id, event_type, value, props FROM events)"
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table: {name}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F  # local import, cheap
        from pyspark.sql import types as T

        # Arrival-type detection — never hardcode the fixture's ts unit
        # (it drifts across driver regenerations: NANOS in r1-r2,
        # timestamp[us] since r3). A TIMESTAMP(NANOS) fixture arrives as
        # int64 under spark.sql.legacy.parquet.nanosAsLong — truncate
        # (not round) to µs; `div` is integer division, safe at
        # 1.7e18-scale nanos where double math is not. µs fixtures (and
        # our own re-written sinks) arrive as timestamps and pass
        # through untouched.
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (nanos-normalized).

    The switch-over path for a reference user's own SQL: after this,
    ``spark.sql("SELECT ... FROM lineitem JOIN ...")`` works against the
    same normalized tables every registered key reads (events included,
    with its NANOS→µs handling applied).
    """
    for t, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(t)
