"""Scalar function families: string / date-time / math / array / map.

One showcase query per family, all built-in JVM functions (whole-stage
codegen; no Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_distributed_kmodes_spark.functions.deterministic import pround
from pyspark_distributed_kmodes_spark.registry import query
from pyspark_distributed_kmodes_spark.sources.tables import table


@query(
    "q40_string_funcs",
    oracle="""
SELECT doc_id,
       upper(substring(text, 1, 12)) AS head_upper,
       length(text) AS text_len,
       regexp_extract(text, '^([a-z]+)', 1) AS first_word,
       replace(substring(text, 1, 20), ' ', '_') AS head_snake,
       concat_ws('|', lang, source) AS lang_source,
       lpad(CAST(doc_id AS VARCHAR), 8, '0') AS padded_id,
       CAST(levenshtein(lang, 'en') AS INTEGER) AS lang_dist
FROM documents
ORDER BY doc_id
""",
    tags=("scalar", "string"),
)
def q40_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: upper/substring/length/regexp/replace/concat_ws/
    lpad/levenshtein."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper(F.substring("text", 1, 12)).alias("head_upper"),
        F.length("text").cast("bigint").alias("text_len"),
        F.regexp_extract("text", r"^([a-z]+)", 1).alias("first_word"),
        F.replace(F.substring("text", 1, 20), F.lit(" "), F.lit("_")).alias("head_snake"),
        F.concat_ws("|", "lang", "source").alias("lang_source"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_id"),
        F.levenshtein("lang", F.lit("en")).alias("lang_dist"),
    ).orderBy("doc_id")


@query(
    "q41_datetime_funcs",
    oracle="""
SELECT event_id,
       CAST(year(ts) AS INTEGER) AS y,
       CAST(month(ts) AS INTEGER) AS m,
       CAST(day(ts) AS INTEGER) AS d,
       CAST(hour(ts) AS INTEGER) AS h,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
       CAST(date_diff('day', TIMESTAMP '2024-01-01', ts) AS INTEGER) AS days_since_start,
       CAST(floor(epoch(ts)) AS BIGINT) AS unix_sec
FROM events
ORDER BY event_id
""",
    tags=("scalar", "datetime"),
)
def q41_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: extract fields, truncate, diff, epoch.

    Session timezone is pinned to UTC (session.py) so field extraction
    agrees with the timezone-naive oracle on any machine.
    """
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.date_trunc("day", "ts").alias("day_start"),
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias("days_since_start"),
        F.unix_timestamp("ts").alias("unix_sec"),
    ).orderBy("event_id")


@query(
    "q42_math_funcs",
    oracle="""
SELECT o_orderkey,
       (CAST(floor((o_totalprice) * 10.0 + 0.5) AS DOUBLE) / 10.0) AS rounded1,
       CAST(floor(o_totalprice) AS BIGINT) AS floor_price,
       CAST(ceil(o_totalprice) AS BIGINT) AS ceil_price,
       abs(o_totalprice - 250000.0) AS dist_from_mid,
       (CAST(floor((sqrt(o_totalprice)) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0) AS sqrt_price,
       (CAST(floor((ln(o_totalprice)) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0) AS ln_price,
       o_totalprice * o_totalprice AS price_sq,
       CAST(o_orderkey % 7 AS BIGINT) AS key_mod7
FROM orders
ORDER BY o_orderkey
""",
    tags=("scalar", "math"),
)
def q42_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family. sqrt is IEEE-exact on both engines; ln is rounded to
    6 decimals to absorb libm last-ulp differences; pow is written as
    explicit multiplication (exact)."""
    o = table(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        pround(p, 1).alias("rounded1"),
        F.floor(p).alias("floor_price"),
        F.ceil(p).alias("ceil_price"),
        F.abs(p - 250000.0).alias("dist_from_mid"),
        pround(F.sqrt(p), 6).alias("sqrt_price"),
        pround(F.log(p), 6).alias("ln_price"),
        (p * p).alias("price_sq"),
        (F.col("o_orderkey") % 7).alias("key_mod7"),
    ).orderBy("o_orderkey")


@query(
    "qo43_array_funcs",
    oracle="""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_words,
       len(list_distinct(string_split(text, ' '))) AS n_unique_words,
       array_to_string(list_sort(string_split(text, ' '))[1:3], ' ') AS first3_sorted,
       list_sort(string_split(text, ' '))[1] AS min_word,
       CAST(list_contains(string_split(text, ' '), 'spark') AS INTEGER) AS has_spark
FROM documents
ORDER BY doc_id
""",
    tags=("scalar", "array"),
)
def qo43_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family over tokenized text: size/distinct/sort/slice/
    contains — all JVM higher-order-function built-ins."""
    d = table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(words).cast("bigint").alias("n_words"),
        F.size(F.array_distinct(words)).cast("bigint").alias("n_unique_words"),
        F.array_join(F.slice(F.array_sort(words), 1, 3), " ").alias("first3_sorted"),
        F.array_sort(words).getItem(0).alias("min_word"),
        F.array_contains(words, "spark").cast("int").alias("has_spark"),
    ).orderBy("doc_id")


@query(
    "qo44_higher_order_funcs",
    oracle="""
SELECT doc_id,
       len(list_filter(string_split(text, ' '), w -> length(w) > 5)) AS n_long_words,
       array_to_string(list_transform(string_split(text, ' ')[1:3], w -> upper(w)), ',') AS head_upper,
       list_reduce(list_transform(string_split(text, ' '), w -> length(w)), (a, b) -> a + b) AS total_chars
FROM documents
ORDER BY doc_id
""",
    tags=("scalar", "array", "lambda"),
)
def qo44_higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order lambdas: filter / transform / aggregate over arrays —
    the JVM-side alternative to row-at-a-time Python UDFs."""
    d = table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(F.filter(words, lambda w: F.length(w) > 5)).cast("bigint").alias("n_long_words"),
        F.array_join(F.transform(F.slice(words, 1, 3), lambda w: F.upper(w)), ",").alias("head_upper"),
        F.aggregate(
            F.transform(words, lambda w: F.length(w).cast("bigint")), F.lit(0).cast("bigint"), lambda a, b: a + b
        ).alias("total_chars"),
    ).orderBy("doc_id")


@query(
    "qo45_map_funcs",
    oracle="""
SELECT event_type,
       CAST(map_from_entries(ARRAY[('n', CAST(COUNT(*) AS BIGINT)),
                                   ('users', COUNT(DISTINCT user_id))])['n'][1] AS BIGINT) AS n,
       CAST(map_from_entries(ARRAY[('n', CAST(COUNT(*) AS BIGINT)),
                                   ('users', COUNT(DISTINCT user_id))])['users'][1] AS BIGINT) AS users
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    tags=("scalar", "map"),
)
def qo45_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: build a map from entries, extract by key (element_at).

    Demonstrates MapType round-tripping; the oracle mirrors with DuckDB
    map_from_entries + subscript.
    """
    e = table(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("_n"), F.countDistinct("user_id").alias("_users")
    )
    m = F.map_from_entries(
        F.array(
            F.struct(F.lit("n").alias("k"), F.col("_n").alias("v")),
            F.struct(F.lit("users").alias("k"), F.col("_users").alias("v")),
        )
    )
    return (
        agg.select(
            "event_type",
            F.element_at(m, "n").alias("n"),
            F.element_at(m, "users").alias("users"),
        )
        .orderBy("event_type")
    )


@query(
    "q36_variant_json",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_variant,
       json_extract_string(props, '$.k') AS k_string
FROM events
ORDER BY event_id
""",
    tags=("scalar", "json", "variant"),
)
def q36_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VariantType (Spark 4): parse_json once, variant_get typed paths —
    the schema-flexible semi-structured column type. DuckDB has no
    variant; the oracle checks the extracted TYPED values instead."""
    e = table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k_variant"),
        F.variant_get(v, "$.k", "string").alias("k_string"),
    ).orderBy("event_id")


@query(
    "qo90_posexplode",
    oracle="""
SELECT doc_id,
       CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INTEGER) AS pos,
       unnest(string_split(text, ' ')) AS word
FROM documents
WHERE doc_id < 25
ORDER BY doc_id, pos
""",
    tags=("scalar", "array"),
)
def qo90_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode: (pos, word) pairs per document — the
    order-preserving flatten used for windowed shingling and
    position-aware tokenization."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 25)
    return (
        d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word"))
        .orderBy("doc_id", "pos")
    )


@query("qo91_approx_percentiles", oracle=None, tags=("agg", "approx"))
def qo91_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch percentiles: percentile_approx (one-pass mergeable) beside
    the exact values — the 100 TB path where exact per-group sorts are
    unaffordable. Rows-only; accuracy bound property-tested.

    All outputs are SCALAR columns: the driver canonicalizes even
    rows-only results through a pandas sort, which cannot hash
    array-typed cells (round-2 a91 crash) — quartiles are therefore
    emitted as approx_p25/approx_p75, never array<double>."""
    li = table(spark, sf_dir, "lineitem")
    quartiles = F.percentile_approx("l_extendedprice", [0.25, 0.75], 10000)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_median"),
            F.median("l_extendedprice").alias("exact_median"),
            quartiles.getItem(0).alias("approx_p25"),
            quartiles.getItem(1).alias("approx_p75"),
        )
        .orderBy("l_returnflag")
    )
