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


def test_distcp_copies_all_rows(spark):
    from ls_hadoop_3_0_spark.sources.io import distcp

    src = f"{SF_DIR}/orders.parquet"
    dst = f"{SCRATCH}/distcp_orders"
    n = distcp(spark, src, dst)
    orig = load(spark, SF_DIR, "orders")
    assert n == orig.count()
    assert sorted(spark.read.parquet(dst).collect()) == sorted(orig.collect())


def test_bucketed_join_needs_no_shuffle(spark):
    """J1 CompositeInputFormat parity: pre-bucketed co-partitioned inputs
    join with ZERO exchanges — the map-side merge join, persisted."""
    import shutil

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    for t in ("b_orders", "b_customer"):
        shutil.rmtree(f"/root/repo/spark-warehouse/{t}", ignore_errors=True)
    load(spark, SF_DIR, "orders").write.bucketBy(8, "o_custkey").sortBy(
        "o_custkey"
    ).mode("overwrite").saveAsTable("b_orders")
    load(spark, SF_DIR, "customer").write.bucketBy(8, "c_custkey").sortBy(
        "c_custkey"
    ).mode("overwrite").saveAsTable("b_customer")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # Force the big-big join path: bucketing must carry the
        # co-partitioning, so the SMJ needs no exchange at all.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = checks.formatted_plan(j)
        assert checks.shuffle_count(j) == 0, plan
        assert "SortMergeJoin" in plan, plan
        assert j.count() == load(spark, SF_DIR, "orders").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_sorted_sink_preserves_within_file_order(spark):
    """S10 MapFileOutputFormat parity: sorted+indexed sink =
    sortWithinPartitions + parquet (row-group min/max act as the index —
    readers range-prune on the sorted key)."""
    path = f"{SCRATCH}/sorted_sink"
    src = load(spark, SF_DIR, "orders")
    src.repartition(4, "o_custkey").sortWithinPartitions("o_custkey", "o_orderkey").write.mode(
        "overwrite"
    ).parquet(path)
    import glob

    for f in glob.glob(f"{path}/part-*.parquet"):
        keys = [
            (r["o_custkey"], r["o_orderkey"])
            for r in spark.read.parquet(f).select("o_custkey", "o_orderkey").collect()
        ]
        assert keys == sorted(keys), f"file {f} not sorted"
    assert spark.read.parquet(path).count() == src.count()


def test_text_sink_preserves_lines(spark):
    path = f"{SCRATCH}/text"
    docs = load(spark, SF_DIR, "documents").select("text")
    docs.write.mode("overwrite").text(path)
    back = spark.read.text(path)
    assert back.count() == docs.count()
    assert sorted(r["value"] for r in back.collect()) == sorted(
        r["text"] for r in docs.collect()
    )


def test_compaction_reduces_file_count_losslessly(spark):
    """sink_compact: 64 fragments -> 4 files, same rows/bytes."""
    import glob

    from ls_hadoop_3_0_spark.sources.io import scratch, sink_compact

    sink_compact(spark, SF_DIR)
    n_frag = len(glob.glob(f"{scratch(SF_DIR, 'sink_compact_fragmented')}/part-*"))
    n_comp = len(glob.glob(f"{scratch(SF_DIR, 'sink_compact_out')}/part-*"))
    assert n_frag == 64 and n_comp == 4, (n_frag, n_comp)
    a = spark.read.parquet(scratch(SF_DIR, "sink_compact_fragmented"))
    b = spark.read.parquet(scratch(SF_DIR, "sink_compact_out"))
    assert a.count() == b.count()
    assert sorted(r["doc_id"] for r in a.collect()) == sorted(
        r["doc_id"] for r in b.collect()
    )


def test_merge_schema_reads_evolved_table(spark, tmp_path):
    """Schema evolution: batches written before/after adding a column
    read back as one table (new column NULL for old rows) — the
    append-only evolution contract a long-lived 100 TB table needs."""
    from pyspark.sql import functions as F

    from ls_hadoop_3_0_spark.tables import load

    p = str(tmp_path / "evolved")
    nation = load(spark, SF_DIR, "nation")
    nation.select("n_nationkey", "n_name").write.mode("append").parquet(p)
    nation.select(
        "n_nationkey", "n_name", F.lit("v2").alias("schema_ver")
    ).write.mode("append").parquet(p)
    back = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(back.columns) == {"n_nationkey", "n_name", "schema_ver"}
    n = nation.count()
    assert back.count() == 2 * n
    assert back.filter(F.col("schema_ver").isNull()).count() == n
    assert back.filter(F.col("schema_ver") == "v2").count() == n


def test_upsert_changeset_larger_than_base(spark):
    """Adversarial CDC batch: a changeset 3x the base (every key updated
    + 2 inserts per key + every 3rd deleted) must apply in one pass."""
    from pyspark.sql import functions as F

    base = spark.createDataFrame(
        [(i, f"n{i}", float(i)) for i in range(50)], "k int, name string, bal double"
    )
    updates = base.select(
        "k", F.lit("U").alias("op"), F.concat(F.lit("u"), "name").alias("name"),
        (F.col("bal") + 1).alias("bal"),
    )
    inserts = base.selectExpr("k + 1000 AS k").union(
        base.selectExpr("k + 2000 AS k")
    ).select("k", F.lit("I").alias("op"), F.lit("new").alias("name"), F.lit(0.0).alias("bal"))
    deletes = base.filter(F.col("k") % 3 == 0).select(
        "k", F.lit("D").alias("op"), F.lit(None).cast("string").alias("name"),
        F.lit(None).cast("double").alias("bal"),
    )
    # D beats U for the same key (deletes listed last win via anti-join)
    ch = updates.filter(F.col("k") % 3 != 0).unionByName(inserts).unionByName(deletes)
    merged = (
        base.withColumnRenamed("k", "bk")
        .withColumnRenamed("name", "bname")
        .withColumnRenamed("bal", "bbal")
        .join(ch, F.col("bk") == F.col("k"), "full_outer")
        .filter(F.coalesce(F.col("op"), F.lit("")) != "D")
        .select(
            F.coalesce(F.col("k"), F.col("bk")).alias("k"),
            F.coalesce(F.col("name"), F.col("bname")).alias("name"),
            F.coalesce(F.col("bal"), F.col("bbal")).alias("bal"),
        )
    )
    got = {(r["k"], r["name"], r["bal"]) for r in merged.collect()}
    want = {
        (i, f"un{i}", float(i) + 1) for i in range(50) if i % 3 != 0
    } | {(i + 1000, "new", 0.0) for i in range(50)} | {
        (i + 2000, "new", 0.0) for i in range(50)
    }
    assert got == want


def test_register_views_enables_adhoc_sql(spark):
    """register_views: a user's own SQL runs against normalized tables
    (events gets the NANOS -> µs treatment, so ts is a real timestamp)."""
    from ls_hadoop_3_0_spark.tables import TABLES, register_views

    register_views(spark, SF_DIR)
    for t in TABLES:
        assert spark.sql(f"SELECT * FROM {t} LIMIT 1").count() >= 0
    row = spark.sql(
        "SELECT min(ts) AS lo, max(ts) AS hi FROM events"
    ).collect()[0]
    assert str(row["lo"]).startswith("20"), "events.ts not a normalized timestamp"
    n = spark.sql(
        "SELECT count(*) AS n FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey"
    ).collect()[0]["n"]
    assert n > 0


def test_badrecords_dropmalformed_and_failfast_twins(spark):
    """The PERMISSIVE key stages 1-in-5 corrupt rows; the two other CSV
    parse modes must behave per contract on the same staged file:
    DROPMALFORMED keeps only the good rows, FAILFAST raises."""
    import ls_hadoop_3_0_spark as engine
    from ls_hadoop_3_0_spark.sources.io import scratch

    permissive = engine.QUERIES["scan_csv_badrecords"](spark, SF_DIR).collect()[0]
    assert permissive["n_bad"] > 0 and permissive["n_good"] > 0
    path = scratch(SF_DIR, "scan_csv_badrecords")
    schema = "n_nationkey int, n_name string, n_regionkey int"
    dropped = (
        spark.read.schema(schema)
        .option("sep", "\t")
        .option("mode", "DROPMALFORMED")
        .csv(path)
    )
    # collect(), not count(): a bare count() prunes every column, so the
    # CSV parser never attempts conversion and drops nothing (documented
    # Spark behavior for malformed-row handling under column pruning).
    assert len(dropped.collect()) == permissive["n_good"]
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        spark.read.schema(schema).option("sep", "\t").option(
            "mode", "FAILFAST"
        ).csv(path).collect()


def test_scan_xml_stages_real_xml(spark):
    """The staged file must be genuine rowTag XML (not CSV in disguise),
    and the declared read schema must survive."""
    import glob

    from ls_hadoop_3_0_spark.sources.io import scan_xml, scratch

    df = scan_xml(spark, SF_DIR)
    assert df.count() > 0
    files = glob.glob(f"{scratch(SF_DIR, 'scan_xml')}/*.xml") or glob.glob(
        f"{scratch(SF_DIR, 'scan_xml')}/part-*"
    )
    assert files, "no staged XML part files"
    body = open(files[0]).read()
    assert "<nation>" in body and "<n_name>" in body, body[:200]


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """Parquet row-group metadata proof of the Z-order claim, on a
    deterministic synthetic table (scale-independent of the fixture):
    under a SECOND-dimension predicate the Morton layout's min/max
    stats prune most row groups while a first-dimension linear sort
    prunes none; and the Z layout stays within ~2.5x of the linear
    sort's (perfect) first-dimension pruning."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from ls_hadoop_3_0_spark.sources.io import zorder_write

    df = spark.range(200_000).select(
        (F.col("id") % 1024).alias("a"),
        ((F.col("id") * 7919) % 1024).alias("b"),
        F.col("id").alias("payload"),
    )
    zpath, lpath = f"{tmp_path}/z", f"{tmp_path}/linear"
    zorder_write(df, zpath, "a", "b")
    (
        df.repartitionByRange(8, "a")
        .sortWithinPartitions("a")
        .write.mode("overwrite")
        .option("parquet.block.size", 64 * 1024)
        .parquet(lpath)
    )
    lo, hi = 256, 511  # a quarter of each dimension's range

    def overlap(path, col):
        tot = hit = 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(idx).statistics
                tot += 1
                if st.min <= hi and st.max >= lo:
                    hit += 1
        return hit / tot

    z_b, l_b = overlap(zpath, "b"), overlap(lpath, "b")
    z_a, l_a = overlap(zpath, "a"), overlap(lpath, "a")
    assert l_b > 0.9, l_b  # linear sort: no second-dim locality
    assert z_b < 0.7, z_b  # Z-order: a majority of groups pruned
    assert z_a <= max(2.5 * l_a, 0.7), (z_a, l_a)


def test_gzip_text_is_nonsplittable_one_task_per_file(spark):
    """The Hadoop gzip lesson, pinned: each staged .gz file is exactly
    one input partition (no splitting inside the stream), so the
    parallelism ceiling equals the file count."""
    import glob

    from ls_hadoop_3_0_spark.sources.io import scan_text_gzip, scratch

    scan_text_gzip(spark, SF_DIR).collect()
    files = glob.glob(f"{scratch(SF_DIR, 'scan_text_gzip')}/part-*.gz")
    assert files, "staged files are not gzip"
    back = spark.read.text(scratch(SF_DIR, "scan_text_gzip"))
    assert back.rdd.getNumPartitions() == len(files)


def test_schema_evolution_merged_read(spark):
    """mergeSchema widens: legacy rows surface NULL for the evolved
    column; a single-schema read of the same dir would miss it on the
    v1 files (Spark picks an arbitrary footer without the option)."""
    from pyspark.sql import functions as F

    from ls_hadoop_3_0_spark.sources.io import scan_schema_evolution, scratch
    from ls_hadoop_3_0_spark.tables import load

    scan_schema_evolution(spark, SF_DIR).collect()  # stages the dir
    m = spark.read.option("mergeSchema", "true").parquet(
        scratch(SF_DIR, "scan_schema_evolution")
    )
    assert {f.name for f in m.schema.fields} == {
        "doc_id",
        "lang",
        "n_chars",
        "source",
    }
    n_docs = load(spark, SF_DIR, "documents").count()
    assert m.count() == n_docs
    # Exactly the even (v1/legacy) half lacks the evolved column.
    assert (
        m.filter(F.col("source").isNull()).count()
        == load(spark, SF_DIR, "documents").filter(F.col("doc_id") % 2 == 0).count()
    )


def test_json_badrecords_failfast_and_dropmalformed_twins(spark):
    """The PERMISSIVE key's staged file also behaves correctly under the
    two other recovery modes: DROPMALFORMED keeps only the good rows,
    FAILFAST raises."""
    import pytest

    from ls_hadoop_3_0_spark.sources.io import scan_json_badrecords, scratch

    n_good = scan_json_badrecords(spark, SF_DIR).collect()[0].n_good
    path = scratch(SF_DIR, "scan_json_badrecords")
    dropped = (
        spark.read.schema("n_nationkey int, n_name string")
        .option("mode", "DROPMALFORMED")
        .json(path)
    )
    assert dropped.count() == n_good
    with pytest.raises(Exception) as exc:
        (
            spark.read.schema("n_nationkey int, n_name string")
            .option("mode", "FAILFAST")
            .json(path)
            .collect()
        )
    assert "Malformed" in str(exc.value) or "FAILFAST" in str(exc.value)
