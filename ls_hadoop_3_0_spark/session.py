"""SparkSession construction and runtime-conf normalization.

Two entry points:

- ``get_spark()`` — build a local session for tests/bench (local[N], AQE on).
- ``prepare(spark)`` — normalize *runtime-settable* confs on ANY session
  (including the driver's, whose build-time config we don't control):
  UTC session timezone, ANSI mode, AQE, sane shuffle parallelism, Arrow.

Every registered query calls ``prepare`` first so results are deterministic
and DuckDB-comparable regardless of who built the session.

Scale posture (SURVEY.md §4.2): these confs are the local-mode projection of
a 1000-executor deployment — AQE handles post-shuffle coalescing and skew
splitting at any scale; shuffle partitions here mirror local cores and would
be raised (or left to AQE initialPartitionNum) on a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Runtime-settable confs applied to every session before running a query.
RUNTIME_CONFS: dict[str, str] = {
    # Determinism / oracle parity: fixtures are tz-naive (FIXTURES.md);
    # DuckDB reads them as naive timestamps.
    "spark.sql.session.timeZone": "UTC",
    # Spark 4.x default, pinned explicitly so semantics don't drift with
    # the host session (ANSI interval/overflow/cast behavior).
    "spark.sql.ansi.enabled": "true",
    # AQE: runtime re-plan (partition coalescing, skew-join splitting,
    # broadcast conversion) — the 100 TB safety net.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any pandas_udf / toPandas path.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Runtime bloom-filter join pruning: build a bloom filter from the
    # small/filtered side and push it into the big side's scan — at
    # 100 TB this skips row groups the join would discard anyway.
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # Push COUNT/MIN/MAX straight to parquet footers when possible.
    "spark.sql.parquet.aggregatePushdown": "true",
    # events.parquet carries TIMESTAMP(NANOS) which Spark's µs timestamps
    # cannot represent; read as raw int64 nanos and truncate to µs in
    # tables.load (mirrored in the oracle via epoch_ns // 1000).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def _cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def prepare(spark: SparkSession) -> SparkSession:
    """Apply runtime confs; safe to call repeatedly (idempotent, cheap)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Conf not runtime-settable on this session build — keep going;
            # queries are written to be correct under either value.
            pass
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(_cpus()))
    except Exception:
        pass
    return spark


def get_spark(app_name: str = "ls_hadoop_3_0_spark") -> SparkSession:
    """Local session for tests/bench: local[$SPARK_GRAFT_CPUS]."""
    # Must precede the JVM launch so PYTHONPATH (vendored protobuf shim
    # for transformWithStateInPandas workers) reaches JVM-spawned python
    # processes; harmless no-op when a real protobuf is installed.
    from ls_hadoop_3_0_spark import vendor

    vendor.ensure_protobuf_env()
    n = _cpus()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return prepare(spark)
