"""Source/sink parity beyond the oracle keys (SURVEY §2.1): compression
codecs (S15), SequenceFile (S3), partitioned-sink pruning (S11)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from ls_hadoop_3_0_spark.plans import checks
from ls_hadoop_3_0_spark.tables import load

from .conftest import SF_DIR

SCRATCH = "/root/repo/.scratch/test_io"


@pytest.mark.parametrize("codec", ["snappy", "gzip", "zstd", "lz4"])
def test_parquet_codec_roundtrip(spark, codec):
    src = load(spark, SF_DIR, "nation")
    path = f"{SCRATCH}/codec_{codec}"
    src.write.mode("overwrite").option("compression", codec).parquet(path)
    back = spark.read.parquet(path)
    assert sorted(back.collect()) == sorted(src.collect())


def test_sequencefile_roundtrip(spark):
    """S3 SequenceFileInputFormat/OutputFormat via the RDD bridge."""
    sc = spark.sparkContext
    path = f"{SCRATCH}/seqfile"
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    pairs = [(i, f"v{i}") for i in range(100)]
    sc.parallelize(pairs, 4).saveAsSequenceFile(path)
    back = sorted(sc.sequenceFile(path).collect())
    assert back == pairs


def test_partitioned_sink_enables_partition_pruning(spark):
    path = f"{SCRATCH}/pruned"
    load(spark, SF_DIR, "orders").write.mode("overwrite").partitionBy(
        "o_orderstatus"
    ).parquet(path)
    back = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    plan = checks.formatted_plan(back)
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters", 1)[1].splitlines()[0]


def test_text_sink_preserves_lines(spark):
    path = f"{SCRATCH}/text"
    docs = load(spark, SF_DIR, "documents").select("text")
    docs.write.mode("overwrite").text(path)
    back = spark.read.text(path)
    assert back.count() == docs.count()
    assert sorted(r["value"] for r in back.collect()) == sorted(
        r["text"] for r in docs.collect()
    )
