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


#: (source path, defaultParallelism, threshold) -> should we re-split?
_SPREAD_CACHE: dict[tuple[str | None, int, int], bool] = {}


def spread(
    df: DataFrame,
    src_path: str | None = None,
    min_rows_per_split: int = 20_000,
) -> DataFrame:
    """Raise map-side parallelism when the source badly under-splits.

    Text compresses so well that a whole corpus can arrive as a handful
    of parquet splits (the 100× replica is 500 k docs in one 4.4 MB
    file → a 2-task scan, and parquet cannot split below a row-group
    boundary) — and tokenize/explode/partial-aggregate work is MAP-SIDE,
    inheriting scan parallelism: quality_repetition measured 436 s at
    100× with 30 of 32 cores idle. Round-robin to the cluster's default
    parallelism ONLY when (a) the scan under-splits AND (b) the footer
    row count says each missing core forgoes real map work
    (``min_rows_per_split`` rows per existing split — measured: the
    extra exchange costs ~0.3-0.6 s at sf0.1, so re-splitting a 5 k-doc
    fixture LOSES time for cheap per-row work, while md5-heavy callers
    pass a lower threshold because they win even there). On a real
    many-file 100 TB corpus the scan has thousands of splits and this
    is a no-op — no gratuitous corpus shuffle at scale. Apply to keys
    whose downstream work is explode/token-heavy; pure per-row map keys
    keep their zero-shuffle plans (their design claim) instead.

    The split probe (``df.rdd.getNumPartitions``) costs ~200 ms of
    driver-side plan conversion per call, so the verdict is cached per
    (source, parallelism, threshold) when ``src_path`` is given. Without
    a path the row count is unknown and under-split alone decides
    (the pre-r9 behavior, for DataFrame-only call sites).
    """
    sc = df.sparkSession.sparkContext
    key = (src_path, sc.defaultParallelism, min_rows_per_split)
    need = _SPREAD_CACHE.get(key) if src_path else None
    if need is None:
        n_parts = df.rdd.getNumPartitions()
        need = n_parts < sc.defaultParallelism
        if need and src_path:
            rows = _parquet_rows(src_path)
            if rows is not None:
                need = rows / max(n_parts, 1) > min_rows_per_split
        if src_path:
            _SPREAD_CACHE[key] = need
    return df.repartition(sc.defaultParallelism) if need else df


def _parquet_rows(src_path: str) -> int | None:
    """Footer row count of a parquet source — single file OR directory.

    Every Spark-written dataset is a DIRECTORY of part files; the r9 cut
    probed it with ``pq.ParquetFile`` (single-file only), so the
    ``min_rows_per_split`` guard was silently bypassed for the common
    layout (ADVICE r9, high). Directories resolve by summing the
    per-fragment footer counts — metadata-only, no data read. When the
    probe is genuinely impossible (non-parquet, remote FS without a
    local path) we warn ONCE and return None so the caller falls back to
    the under-split-only rule VISIBLY instead of silently.
    """
    import os

    try:
        import pyarrow.parquet as pq

        if os.path.isdir(src_path):
            total = 0
            for root, _dirs, files in os.walk(src_path):
                for f in files:
                    if f.endswith(".parquet") and not f.startswith((".", "_")):
                        total += pq.read_metadata(os.path.join(root, f)).num_rows
            return total
        return pq.ParquetFile(src_path).metadata.num_rows
    except Exception as exc:  # noqa: BLE001 - non-parquet/remote source
        if src_path not in _PROBE_WARNED:
            _PROBE_WARNED.add(src_path)
            import warnings

            warnings.warn(
                f"spread(): row-count probe failed for {src_path!r} ({exc!r}); "
                "falling back to the under-split-only rule",
                stacklevel=3,
            )
        return None


_PROBE_WARNED: set[str] = set()


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
