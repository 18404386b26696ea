"""Reference example workloads — SURVEY.md §2 MR-ex rows.

The upstream ``hadoop-mapreduce-examples`` jar ships self-contained
demonstration jobs; the ones with operator substance are already keys
(WordCount → ``wordcount``, Grep → ``grep_count``, TeraSort →
``sort_global`` / ``sort_validate``, WordMean family → ``agg_stats``).
This module carries the remaining workload-parity item:

- ``examples_pi`` — the QuasiMonteCarlo pi estimator (Halton-sequence
  sampling, SURVEY §2 notes it as the canonical generated-input
  map+reduce example).

The upstream job is famously non-verifiable (RNG-seeded darts); the
Halton low-discrepancy sequence it actually uses is DETERMINISTIC, so
re-expressing it with exact integer arithmetic makes even this one
oracle-checkable — every digit of the estimate hash-matches DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ls_hadoop_3_0_spark.registry import query
from ls_hadoop_3_0_spark.session import prepare

#: Sample count and radical-inverse digit budgets. N must not exceed
#: base^digits for either base, so every index's radical inverse is
#: EXACT with that many digits (no truncation anywhere).
PI_N = 50_000
PI_B2_DIGITS = 16  # 2^16 = 65536  >= PI_N
PI_B3_DIGITS = 10  # 3^10 = 59049  >= PI_N

_D2 = 2**PI_B2_DIGITS
_D3 = 3**PI_B3_DIGITS
#: Common-denominator half-width: the circle test
#:   (x-1/2)^2 + (y-1/2)^2 <= 1/4   with x = num2/2^16, y = num3/3^10
#: cross-multiplied by (2^16 * 3^10)^2 becomes
#:   (num2*3^10 - HALF)^2 + (num3*2^16 - HALF)^2 <= HALF^2
#: in EXACT 64-bit integers (HALF^2 ~ 3.7e18, sum of two squares
#: <= 2*HALF^2 ~ 7.5e18 < 2^63-1 — no overflow, ANSI mode would shout).
_HALF = (_D2 // 2) * _D3
_R2 = _HALF * _HALF

assert PI_N <= _D2 and PI_N <= _D3


def _radical_inverse(col: str, base: int, digits: int) -> str:
    """Spark/DuckDB-shared SQL: scaled radical inverse of ``col``.

    Returns the integer  num = sum_d digit_d(i) * base^(digits-1-d),
    i.e. the base-``base`` Halton value of i times base^digits — kept
    as an exact integer so the circle test needs no floating point.
    ``pow(base, d)`` is a double but exact for every power used here
    (max 3^10 = 59049 << 2^53), and both engines' casts agree on exact
    values. The identical string is valid Spark SQL and DuckDB SQL —
    one source of truth, zero dialect drift.
    """
    return (
        f"aggregate(sequence(0, {digits - 1}), CAST(0 AS BIGINT), (acc, d) -> "
        f"acc + (({col} div CAST(pow({base}, d) AS BIGINT)) % {base})"
        f" * CAST(pow({base}, {digits - 1} - d) AS BIGINT))"
    )


#: DuckDB spells the sequential fold list_sum(list_transform(...)) and
#: integer division `//`; everything else mirrors _radical_inverse.
def _radical_inverse_duck(col: str, base: int, digits: int) -> str:
    return (
        f"list_sum(list_transform(range(0, {digits}), d -> "
        f"(({col} // CAST(pow({base}, d) AS BIGINT)) % {base})"
        f" * CAST(pow({base}, {digits - 1} - d) AS BIGINT)))"
    )


@query(
    "examples_pi",
    f"""
    WITH pts AS (
        SELECT {_radical_inverse_duck('i', 2, PI_B2_DIGITS)} AS num2,
               {_radical_inverse_duck('i', 3, PI_B3_DIGITS)} AS num3
        FROM range({PI_N}) t(i)
    ),
    d AS (
        SELECT (num2 * {_D3} - {_HALF}) AS dx,
               (num3 * {_D2} - {_HALF}) AS dy
        FROM pts
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(CASE WHEN dx * dx + dy * dy <= {_R2}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_inside,
           CAST(4 AS DOUBLE)
               * SUM(CASE WHEN dx * dx + dy * dy <= {_R2}
                          THEN 1 ELSE 0 END) / COUNT(*) AS pi_estimate
    FROM d
    """,
)
def examples_pi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MR-ex QuasiMonteCarlo: Halton-sequence pi, exact-integer inside test.

    Point i = (halton_2(i), halton_3(i)) in the unit square; count the
    points inside the inscribed circle; pi ≈ 4 * inside / n. Upstream
    runs this as one generated-input map per split + a 2-counter reduce;
    here it is ``spark.range`` → two codegen'd integer folds → one agg —
    map-only until a single 2-long partial-aggregated reduce, so the
    plan is embarrassingly parallel at any scale (10^12 darts = more
    range partitions, same 2-value shuffle).

    Everything is exact 64-bit integer arithmetic (see _HALF), so both
    engines agree bit-for-bit even on the final double estimate
    (4.0 * inside / n: one exact multiply, one IEEE divide).
    ``sf_dir`` is unused — the input is generated, as upstream's is.
    """
    prepare(spark)
    return _pi_estimate(spark, PI_N)


def _pi_estimate(spark: SparkSession, n: int) -> DataFrame:
    """examples_pi body with the dart count exposed (scale audits time
    10×/100× dart counts through this; digit budgets must still cover n
    so the radical inverses stay exact)."""
    assert n <= _D2 and n <= _D3, "raise PI_B*_DIGITS for this dart count"
    pts = spark.range(n).select(
        F.expr(_radical_inverse("id", 2, PI_B2_DIGITS)).alias("num2"),
        F.expr(_radical_inverse("id", 3, PI_B3_DIGITS)).alias("num3"),
    )
    d = pts.select(
        (F.col("num2") * _D3 - _HALF).alias("dx"),
        (F.col("num3") * _D2 - _HALF).alias("dy"),
    )
    inside = F.when(
        F.col("dx") * F.col("dx") + F.col("dy") * F.col("dy") <= _R2, 1
    ).otherwise(0)
    return d.agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum(inside).alias("n_inside"),
        (F.lit(4.0) * F.sum(inside) / F.count(F.lit(1))).alias("pi_estimate"),
    )


#: TeraGen row count and digest bucket width (examples_teragen).
TERAGEN_N = 100_000
TERAGEN_BUCKET = 1000


@query(
    "examples_teragen",
    f"""
    WITH g AS (
        SELECT i, substr(md5(CAST(i AS VARCHAR)), 1, 10) AS key
        FROM range({TERAGEN_N}) t(i)
    ),
    b AS (
        SELECT i // {TERAGEN_BUCKET} AS bkt,
               md5(string_agg(key, ',' ORDER BY i)) AS bmd5
        FROM g GROUP BY bkt
    ),
    dg AS (SELECT md5(string_agg(bmd5, ',' ORDER BY bkt)) AS data_md5 FROM b),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT key) AS BIGINT) AS n_distinct_keys,
               min(key) AS min_key,
               max(key) AS max_key
        FROM g
    )
    SELECT s.n_rows, s.n_distinct_keys, s.min_key, s.max_key, dg.data_md5
    FROM s, dg
    """,
)
def examples_teragen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MR-ex TeraGen: distributed deterministic data generation, audited.

    Upstream TeraGen writes N pseudo-random 10-byte-keyed rows from a
    seeded generator, split across mappers by row ranges; its companion
    TeraValidate checks the OUTPUT of the sort (our ``sort_validate``).
    This key is the generation half made oracle-checkable: row i's key
    is a pure function of i (md5 prefix — engine-portable, uniformly
    distributed like TeraGen's keys), produced by ``spark.range`` —
    embarrassingly parallel, zero input, any row count = more range
    partitions. The emitted certificate is (count, distinct keys,
    min/max key, content digest); the digest is the dedup_apply
    two-level bounded md5 (per-1000-row ordered bucket digests, then
    one digest over buckets) so no aggregation buffer is ever
    corpus-sized and the value is partitioning-invariant by
    construction. ``sf_dir`` is unused — the input is generated,
    exactly as upstream's is.
    """
    prepare(spark)
    return _teragen(spark, TERAGEN_N)


def _teragen(spark: SparkSession, n: int) -> DataFrame:
    """examples_teragen body with the row count exposed (SCALE.md times
    10×/100× row counts through this)."""
    g = spark.range(n).select(
        F.col("id").alias("i"),
        F.substring(F.md5(F.col("id").cast("string")), 1, 10).alias("key"),
    )
    b = g.groupBy(F.expr(f"i div {TERAGEN_BUCKET}").alias("bkt")).agg(
        F.md5(
            F.array_join(
                F.expr(
                    "transform(array_sort(collect_list(struct(i, key))),"
                    " s -> s.key)"
                ),
                ",",
            )
        ).alias("bmd5")
    )
    dg = b.agg(
        F.md5(
            F.array_join(
                F.expr(
                    "transform(array_sort(collect_list(struct(bkt, bmd5))),"
                    " s -> s.bmd5)"
                ),
                ",",
            )
        ).alias("data_md5")
    )
    s = g.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count_distinct(F.col("key")).cast("long").alias("n_distinct_keys"),
        F.min("key").alias("min_key"),
        F.max("key").alias("max_key"),
    )
    return s.crossJoin(dg)


def pi_estimate_double(spark: SparkSession, n: int) -> DataFrame:
    """Scale-audit twin of examples_pi for dart counts the exact-integer
    circle test cannot reach: the int64 bound ``2·HALF² < 2^63`` caps
    the digit budgets at (16, 10) ⇒ n ≤ 59049. Here the radical
    inverses stay EXACT integers (budgets widened to cover n — they fit
    int64 trivially) and only the circle test runs in doubles. The
    elementary double ops (one exact dyadic subtract, two multiplies,
    one add, one compare) evaluate identically on any IEEE engine — no
    accumulation across rows — so the count is still deterministic; it
    is simply not the registered oracle formulation. Used by SCALE.md's
    10×/100× dart-count timings; agreement with the exact key at
    n = PI_N is unit-tested.
    """
    d2 = max(PI_B2_DIGITS, (n - 1).bit_length())
    d3 = PI_B3_DIGITS
    while 3**d3 < n:
        d3 += 1
    x = F.expr(_radical_inverse("id", 2, d2)) / F.lit(float(2**d2))
    y = F.expr(_radical_inverse("id", 3, d3)) / F.lit(float(3**d3))
    d = spark.range(n).select(
        (x - F.lit(0.5)).alias("dx"), (y - F.lit(0.5)).alias("dy")
    )
    inside = F.when(
        F.col("dx") * F.col("dx") + F.col("dy") * F.col("dy") <= F.lit(0.25), 1
    ).otherwise(0)
    return d.agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum(inside).alias("n_inside"),
        (F.lit(4.0) * F.sum(inside) / F.count(F.lit(1))).alias("pi_estimate"),
    )
