"""Scalar function surface — SURVEY.md §2.8.

The reference has no scalar-function library (row logic is arbitrary Java
in ``Mapper#map``); equivalent capability means declaring and oracle-
testing the Spark built-in surface. One key per family; each query
exercises several functions in one projection.

Dialect mirroring notes (SURVEY §7 risk #1):
- Spark getItem is 0-based, DuckDB list indexing 1-based.
- ``instr``/``levenshtein``/``translate``/``initcap`` exist in both.
- libm functions (exp/ln/pow) may differ in the last ULP between JVM and
  C — scalar_math restricts to a small input slice and rounds to 6
  decimals on both sides.
- JSON: Spark ``get_json_object`` ↔ DuckDB ``json_extract_string``.
- Engine-specific hashes (xxhash64, crc32, murmur ``hash``) are exercised
  in tests/test_scalars.py, not in oracle-compared columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ls_hadoop_3_0_spark.registry import query
from ls_hadoop_3_0_spark.session import prepare
from ls_hadoop_3_0_spark.tables import EVENTS_SQL, load


@query(
    "scalar_string",
    """
    SELECT c_custkey,
           concat(c_name, '|', c_mktsegment) AS tagged,
           concat_ws('-', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS joined,
           substring(c_name, 1, 8) AS prefix,
           length(c_name) AS name_len,
           lower(c_mktsegment) AS seg_lower,
           upper(c_name) AS name_upper,
           trim(c_mktsegment) AS seg_trim,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
           rpad(c_mktsegment, 12, '.') AS rpadded,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits,
           regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
           (c_name LIKE 'Customer%') AS is_cust,
           instr(c_name, '#') AS hash_pos,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS translated,
           upper(substring(c_mktsegment, 1, 1)) || lower(substring(c_mktsegment, 2))
               AS caps,
           levenshtein(c_mktsegment, 'BUILDING') AS lev,
           printf('%s#%05d', c_mktsegment, c_custkey) AS formatted,
           decode(encode(c_name)) AS decoded
    FROM customer WHERE c_custkey <= 100
    """,
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: concat/substr/case/pad/regex/translate/levenshtein."""
    prepare(spark)
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    return c.select(
        "c_custkey",
        F.concat("c_name", F.lit("|"), "c_mktsegment").alias("tagged"),
        F.concat_ws("-", "c_mktsegment", F.col("c_nationkey").cast("string")).alias("joined"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.length("c_name").alias("name_len"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.upper("c_name").alias("name_upper"),
        F.trim("c_mktsegment").alias("seg_trim"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded"),
        F.rpad("c_mktsegment", 12, ".").alias("rpadded"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("digits"),
        F.regexp_replace("c_name", r"[0-9]", "#").alias("masked"),
        F.col("c_name").like("Customer%").alias("is_cust"),
        F.instr("c_name", "#").alias("hash_pos"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("translated"),
        # initcap itself is covered in tests (DuckDB 1.0 lacks it); the
        # oracle-compared column uses the portable first-letter form.
        F.concat(
            F.upper(F.substring("c_mktsegment", 1, 1)),
            F.lower(F.expr("substring(c_mktsegment, 2)")),
        ).alias("caps"),
        F.levenshtein("c_mktsegment", F.lit("BUILDING")).alias("lev"),
        F.format_string("%s#%05d", "c_mktsegment", "c_custkey").alias("formatted"),
        F.decode(F.encode("c_name", "UTF-8"), "UTF-8").alias("decoded"),
    )


@query(
    "scalar_datetime",
    """
    SELECT o_orderkey,
           year(o_orderdate) AS yr,
           month(o_orderdate) AS mo,
           day(o_orderdate) AS dom,
           dayofweek(o_orderdate) + 1 AS dow,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d %H:%M:%S') AS month_start,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d %H:%M:%S') AS plus_30d,
           date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_95,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS iso,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS just_date,
           strftime(CAST(o_orderdate AS DATE) + 5, '%Y-%m-%d') AS plus5,
           strftime(CAST(o_orderdate AS DATE) - 5, '%Y-%m-%d') AS minus5,
           strftime(make_timestamp(CAST(epoch(o_orderdate) AS BIGINT) * 1000000),
                    '%Y-%m-%d %H:%M:%S') AS from_epoch
    FROM orders WHERE o_orderkey <= 200
    """,
)
def scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: extract/trunc/epoch/interval/diff/last_day.

    DuckDB ``dayofweek`` is 0=Sunday; Spark ``dayofweek`` is 1=Sunday —
    mirrored with +1. Timestamps emitted as formatted strings.
    """
    prepare(spark)
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    ts = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(ts).alias("yr"),
        F.month(ts).alias("mo"),
        F.dayofmonth(ts).alias("dom"),
        F.dayofweek(ts).alias("dow"),
        F.date_format(F.date_trunc("month", ts), "yyyy-MM-dd HH:mm:ss").alias("month_start"),
        F.unix_timestamp(ts).alias("epoch_s"),
        F.date_format(ts + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd HH:mm:ss").alias(
            "plus_30d"
        ),
        F.datediff(ts.cast("date"), F.lit("1995-01-01").cast("date")).cast("long").alias(
            "days_since_95"
        ),
        F.date_format(F.last_day(ts.cast("date")), "yyyy-MM-dd").alias("month_end"),
        F.date_format(ts, "yyyy-MM-dd HH:mm:ss").alias("iso"),
        F.date_format(F.to_date(ts), "yyyy-MM-dd").alias("just_date"),
        F.date_format(F.date_add(ts.cast("date"), 5), "yyyy-MM-dd").alias("plus5"),
        F.date_format(F.date_sub(ts.cast("date"), 5), "yyyy-MM-dd").alias("minus5"),
        F.from_unixtime(F.unix_timestamp(ts), "yyyy-MM-dd HH:mm:ss").alias("from_epoch"),
    )


@query(
    "scalar_math",
    """
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - 30000.0) AS abs_diff,
           round(l_extendedprice, 1) AS rounded,
           CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
           CAST(floor(l_tax * 100) AS BIGINT) AS tax_pct_floor,
           round(sqrt(l_extendedprice), 6) AS sqrt_price,
           round(ln(l_extendedprice + 1), 6) AS ln_price,
           round(log10(l_extendedprice + 1), 6) AS log10_price,
           round(pow(l_quantity, 2), 6) AS qty_sq,
           CAST(l_quantity AS BIGINT) % 5 AS qty_mod5,
           CAST(sign(l_extendedprice - 30000.0) AS DOUBLE) AS price_sign,
           greatest(l_discount, l_tax) AS max_rate,
           least(l_discount, l_tax) AS min_rate
    FROM lineitem WHERE l_orderkey <= 40
    """,
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family. libm-sensitive outputs rounded to 6 (see module doc).

    ``rand(seed)``/``randn(seed)`` are engine-specific RNGs — exercised
    for determinism (same seed ⇒ same result twice) in tests only.
    """
    prepare(spark)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 40)
    price = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(price - 30000.0).alias("abs_diff"),
        F.round(price, 1).alias("rounded"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct_ceil"),
        F.floor(F.col("l_tax") * 100).alias("tax_pct_floor"),
        F.round(F.sqrt(price), 6).alias("sqrt_price"),
        F.round(F.log(price + 1), 6).alias("ln_price"),
        F.round(F.log10(price + 1), 6).alias("log10_price"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("qty_sq"),
        (F.col("l_quantity").cast("long") % 5).alias("qty_mod5"),
        F.signum(price - 30000.0).alias("price_sign"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


@query(
    "scalar_conditional",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000.0 THEN 'high'
                WHEN o_totalprice > 100000.0 THEN 'mid'
                ELSE 'low' END AS price_band,
           COALESCE(NULLIF(o_orderstatus, 'F'), 'FINISHED') AS status_decoded,
           (o_totalprice BETWEEN 50000.0 AND 150000.0) AS in_band,
           (o_orderstatus IN ('F', 'O')) AS known_status,
           CASE WHEN o_custkey % 2 = 0 THEN o_totalprice END AS even_price
    FROM orders WHERE o_orderkey <= 500
    """,
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/null family: when/otherwise, coalesce, nullif, between, isin."""
    prepare(spark)
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000.0, "high")
        .when(F.col("o_totalprice") > 100000.0, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("F")), F.lit("FINISHED")).alias(
            "status_decoded"
        ),
        F.col("o_totalprice").between(50000.0, 150000.0).alias("in_band"),
        F.col("o_orderstatus").isin("F", "O").alias("known_status"),
        F.when(F.col("o_custkey") % 2 == 0, F.col("o_totalprice")).alias("even_price"),
    )


@query(
    "scalar_array",
    """
    SELECT doc_id,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_distinct,
           list_contains(toks, 'data') AS has_data,
           list_sort(list_distinct(toks))[1] AS first_token,
           array_to_string(list_sort(list_distinct(toks))[1:3], ',') AS first3,
           toks[1] AS head,
           toks[-1] AS last,
           len(list_filter(toks, t -> length(t) > 5)) AS n_long,
           CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT) AS total_len,
           array_to_string(flatten([toks[1:2], toks[3:4]]), ',') AS flat4,
           array_to_string(list_transform(generate_series(1, least(len(toks), 3)),
                           i -> concat(toks[i], ':', toks[i])), ',') AS zipped,
           array_to_string(list_sort(list_filter(list_distinct(toks),
                           t -> NOT list_contains(toks[1:3], t))), ',') AS except_first3
    FROM (SELECT doc_id, string_split(text, ' ') AS toks
          FROM documents WHERE doc_id <= 100)
    """,
)
def scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family incl. higher-order transform/filter/aggregate."""
    prepare(spark)
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") <= 100)
    toks = F.split(F.col("text"), " ")
    d = d.select("doc_id", toks.alias("toks"))
    t = F.col("toks")
    return d.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_distinct"),
        F.array_contains(t, "data").alias("has_data"),
        F.sort_array(F.array_distinct(t)).getItem(0).alias("first_token"),
        F.array_join(F.slice(F.sort_array(F.array_distinct(t)), 1, 3), ",").alias("first3"),
        F.element_at(t, 1).alias("head"),
        F.element_at(t, -1).alias("last"),
        F.size(F.filter(t, lambda x: F.length(x) > 5)).alias("n_long"),
        F.aggregate(
            t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x).cast("long")
        ).alias("total_len"),
        F.array_join(
            F.flatten(F.array(F.slice(t, 1, 2), F.slice(t, 3, 2))), ","
        ).alias("flat4"),
        F.array_join(
            F.zip_with(
                F.slice(t, 1, 3), F.slice(t, 1, 3), lambda x, y: F.concat(x, F.lit(":"), y)
            ),
            ",",
        ).alias("zipped"),
        F.array_join(
            F.sort_array(F.array_except(t, F.slice(t, 1, 3))), ","
        ).alias("except_first3"),
    )


@query(
    "scalar_posexplode",
    """
    SELECT doc_id,
           unnest(generate_series(1, least(len(toks), 5))) - 1 AS pos,
           unnest(toks[1:5]) AS token
    FROM (SELECT doc_id, string_split(text, ' ') AS toks
          FROM documents WHERE doc_id <= 50)
    """,
)
def scalar_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (UDTF-style 1→N with ordinal). DuckDB mirror: parallel
    unnests zip; pos made 0-based to match Spark."""
    prepare(spark)
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") <= 50)
    return d.select(
        "doc_id",
        F.posexplode(F.slice(F.split("text", " "), 1, 5)).alias("pos", "token"),
    )


@query(
    "scalar_map",
    """
    SELECT o_orderkey,
           map_extract(m, 'price')[1] AS price_val,
           map_extract(m, 'key')[1] AS key_val,
           CAST(cardinality(m) AS BIGINT) AS n_keys,
           array_to_string(list_sort(map_keys(m)), ',') AS keys_sorted,
           list_aggregate(map_values(m), 'max') AS max_val,
           CAST(cardinality(m) + 1 AS BIGINT) AS n_after_concat,
           map_extract(m, 'price')[1] * 2 AS doubled_price
    FROM (SELECT o_orderkey,
                 map(['price', 'key'],
                     [o_totalprice, CAST(o_custkey AS DOUBLE)]) AS m
          FROM orders WHERE o_orderkey <= 200)
    """,
)
def scalar_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family (MapWritable parity): build/extract/keys/cardinality.

    Raw maps never reach the output (cross-engine map hashing is
    undefined) — only extracted scalars and sorted key lists.
    """
    prepare(spark)
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    m = F.create_map(
        F.lit("price"), F.col("o_totalprice"), F.lit("key"), F.col("o_custkey").cast("double")
    )
    o = o.select("o_orderkey", m.alias("m"))
    m = F.col("m")
    return o.select(
        "o_orderkey",
        F.element_at(m, "price").alias("price_val"),
        F.element_at(m, "key").alias("key_val"),
        F.size(m).cast("long").alias("n_keys"),
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys_sorted"),
        F.array_max(F.map_values(m)).alias("max_val"),
        # map_concat/map_entries/map_from_entries: mechanics Spark-side,
        # value parity with arithmetic mirrors (DuckDB 1.0 lacks the fns).
        F.size(
            F.map_from_entries(
                F.array_union(
                    F.map_entries(m),
                    F.array(F.struct(F.lit("extra").alias("key"), F.lit(0.0).alias("value"))),
                )
            )
        )
        .cast("long")
        .alias("n_after_concat"),
        F.element_at(F.transform_values(m, lambda k, v: v * 2), "price").alias(
            "doubled_price"
        ),
    )


@query(
    "scalar_json",
    """
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
           (json_extract_string(props, '$.missing') IS NULL) AS missing_is_null,
           to_json(struct_pack(id := event_id, kind := event_type)) AS as_json,
           CAST(json_extract_string(
               to_json(struct_pack(id := event_id, kind := event_type)),
               '$.id') AS BIGINT) AS json_roundtrip_id,
           hour(ts) AS event_hour,
           minute(ts) AS event_minute
    FROM {events} WHERE event_id <= 300
    """.format(events=EVENTS_SQL),
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family over events.props (a JSON string per FIXTURES.md)."""
    prepare(spark)
    e = load(spark, sf_dir, "events").filter(F.col("event_id") <= 300)
    k = F.get_json_object("props", "$.k")
    as_json = F.to_json(
        F.struct(F.col("event_id").alias("id"), F.col("event_type").alias("kind"))
    )
    return e.select(
        "event_id",
        k.alias("k_str"),
        k.cast("long").alias("k_num"),
        F.get_json_object("props", "$.missing").isNull().alias("missing_is_null"),
        as_json.alias("as_json"),
        F.get_json_object(as_json, "$.id").cast("long").alias("json_roundtrip_id"),
        F.hour("ts").alias("event_hour"),
        F.minute("ts").alias("event_minute"),
    )


@query(
    "scalar_variant",
    """
    SELECT p_partkey,
           p_brand AS brand,
           CAST(p_size + 1 AS BIGINT) AS size_plus,
           CAST(CAST(round(p_retailprice * 1000000) AS BIGINT) AS DOUBLE)
               / 1000000.0 AS retail,
           CAST(NULL AS VARCHAR) AS missing
    FROM part WHERE p_partkey <= 400
    """,
)
def scalar_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT family: semi-structured ingestion + typed access.

    Builds a JSON document per part row, ingests it as a VARIANT
    (``parse_json``), then extracts typed fields back out with
    ``variant_get`` / ``try_variant_get`` — the open-schema column type
    a 100 TB event pipeline stores raw payloads in (binary-encoded,
    shreddable, no re-parse per access). The raw variant never reaches
    the comparator (engine-specific binary): every output is a TYPED
    extraction, and the oracle predicts the values straight from the
    source table — a hash match proves serialize→parse_json→
    variant_get is lossless end-to-end. The double survives the JSON
    round-trip exactly (shortest-repr print, exact parse) and crosses
    the gate through the per-row scaled-long quantization (the _q6
    mechanic — never round(x, d)). try_variant_get on a missing path is
    NULL on both sides, never an error.
    """
    prepare(spark)
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") <= 400)
    v = F.parse_json(
        F.to_json(
            F.struct(
                F.col("p_brand").alias("brand"),
                F.col("p_size").alias("size"),
                F.col("p_retailprice").alias("retail"),
            )
        )
    )
    retail = F.expr("variant_get(v, '$.retail', 'double')")
    return p.select("p_partkey", v.alias("v")).select(
        "p_partkey",
        F.expr("variant_get(v, '$.brand', 'string')").alias("brand"),
        (F.expr("variant_get(v, '$.size', 'int')") + 1)
        .cast("long")
        .alias("size_plus"),
        (F.round(retail * 1_000_000).cast("long").cast("double") / 1_000_000.0).alias(
            "retail"
        ),
        F.expr("try_variant_get(v, '$.nope', 'string')").alias("missing"),
    )


@query(
    "scalar_hash",
    """
    SELECT c_custkey,
           md5(c_name) AS md5_hex,
           sha256(c_name) AS sha256_hex,
           to_base64(encode(c_mktsegment)) AS seg_b64,
           CAST(octet_length(encode(c_name)) AS BIGINT) AS n_bytes
    FROM customer WHERE c_custkey <= 200
    """,
)
def scalar_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash/binary family (the dedup substrate): md5/sha2/base64/bytes.

    xxhash64 / murmur ``hash`` / crc32 are Spark-specific bit-layouts —
    determinism is asserted in tests/test_scalars.py instead.
    """
    prepare(spark)
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("md5_hex"),
        F.sha2("c_name", 256).alias("sha256_hex"),
        F.base64(F.encode("c_mktsegment", "UTF-8")).alias("seg_b64"),
        F.length(F.encode("c_name", "UTF-8")).cast("long").alias("n_bytes"),
    )


@query(
    "scalar_bitwise",
    """
    SELECT o_orderkey,
           CAST(o_orderkey & 255 AS BIGINT) AS lo_byte,
           CAST(o_orderkey | 15 AS BIGINT) AS or_mask,
           CAST(xor(o_orderkey, o_custkey) AS BIGINT) AS key_xor,
           CAST(o_orderkey << 3 AS BIGINT) AS shl3,
           CAST(o_orderkey >> 2 AS BIGINT) AS shr2,
           CAST(bit_count(o_orderkey) AS BIGINT) AS popcount
    FROM orders WHERE o_orderkey % 101 = 0
    """,
)
def scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar family 9: bitwise operators (masks, shifts, popcount).

    The bit-manipulation surface (feature flags, bucket masks, bitmap
    membership, the simhash/minhash internals exposed as first-class
    scalars): AND/OR/XOR, shifts, and population count over the
    non-negative key columns — exact integer semantics, identical on
    both engines (DuckDB spells XOR as ``xor()`` and popcount as
    ``bit_count``, Spark as ``^``/``bit_count``). Map-side only; the
    filter keeps the checked slice small.
    """
    prepare(spark)
    o = F.col("o_orderkey")
    return (
        load(spark, sf_dir, "orders")
        .filter(o % 101 == 0)
        .select(
            "o_orderkey",
            o.bitwiseAND(F.lit(255)).cast("long").alias("lo_byte"),
            o.bitwiseOR(F.lit(15)).cast("long").alias("or_mask"),
            o.bitwiseXOR(F.col("o_custkey")).cast("long").alias("key_xor"),
            F.shiftleft(o, 3).cast("long").alias("shl3"),
            F.shiftright(o, 2).cast("long").alias("shr2"),
            F.bit_count(o).cast("long").alias("popcount"),
        )
    )


@query(
    "scalar_struct",
    """
    SELECT o_orderkey,
           {'status': o_orderstatus, 'priced': o_totalprice}.status
               AS s_status,
           ({'status': o_orderstatus, 'priced': o_totalprice}
            > {'status': 'O', 'priced': CAST(200000.0 AS DOUBLE)})
               AS gt_pivot,
           ({'a': CAST(1 AS BIGINT), 'b': 'x'}
            < {'a': CAST(1 AS BIGINT), 'b': 'y'}) AS lt_tiebreak,
           md5(o_orderstatus || '|' || CAST(o_orderkey AS VARCHAR))
               AS canon_md5
    FROM orders
    WHERE o_orderkey % 7 = 0
    """,
)
def scalar_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar family 10: STRUCT construction, field access, comparison.

    The nested-record surface (named_struct / dot access / lexicographic
    struct comparison — the semantics array_sort-based digests elsewhere
    in the repo rely on, pinned here directly against DuckDB's STRUCT
    type). Struct VALUES never cross the comparator (engines render
    them differently): every output is a field extraction, a boolean
    comparison, or a canonical string digest. Map-side only.
    """
    prepare(spark)
    s = F.struct(
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("priced"),
    )
    pivot = F.struct(
        F.lit("O").alias("status"), F.lit(200000.0).alias("priced")
    )
    lit_a = F.struct(
        F.lit(1).cast("long").alias("a"), F.lit("x").alias("b")
    )
    lit_b = F.struct(
        F.lit(1).cast("long").alias("a"), F.lit("y").alias("b")
    )
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 7 == 0)
        .select(
            "o_orderkey",
            s.getField("status").alias("s_status"),
            (s > pivot).alias("gt_pivot"),
            # equal first field ⇒ comparison falls to the second —
            # the lexicographic tie-break rule pinned explicitly.
            (lit_a < lit_b).alias("lt_tiebreak"),
            F.md5(
                F.concat_ws("|", "o_orderstatus", F.col("o_orderkey").cast("string"))
            ).alias("canon_md5"),
        )
    )
