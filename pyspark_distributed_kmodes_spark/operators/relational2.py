"""Relational surface, part 2: grouping sets, TPC-H-shaped multi-join
reporting queries, subqueries, unpivot, generated series, ANSI-safe
arithmetic, sketches."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_distributed_kmodes_spark.functions.deterministic import dsum, sql_dsum
from pyspark_distributed_kmodes_spark.registry import query
from pyspark_distributed_kmodes_spark.sources.tables import table


@query(
    "q17_grouping_sets",
    oracle=f"""
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice')} AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY status, priority
""",
    tags=("agg",),
)
def q17_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (by-status, by-priority, grand total)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupingSets([["o_orderstatus"], ["o_orderpriority"], []], "o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("revenue"))
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n_orders",
            "revenue",
        )
        .orderBy("status", "priority")
    )


@query(
    "q18_shipping_priority",
    oracle=f"""
SELECT l.l_orderkey,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10
""",
    tags=("join", "agg", "tpch"),
    bench=True,
)
def q18_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, filtered fact scan, top-10 revenue.

    Scale: both date filters push to the scans; customer segment filter
    reduces the build side before the join; AQE picks broadcast for the
    filtered customer side when it fits.
    """
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(rev).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc())
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "q19_local_supplier_volume",
    oracle=f"""
SELECT n.n_name,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = (SELECT r_name FROM region ORDER BY r_regionkey LIMIT 1)
GROUP BY n.n_name
ORDER BY revenue DESC, n_name ASC
""",
    tags=("join", "agg", "tpch"),
)
def q19_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star join with a same-nation co-location
    predicate and a scalar subquery for the region pick.

    Scale: region/nation/supplier broadcast; the orders↔lineitem join is
    the only big shuffle (both sides hash on orderkey).
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    # supplier scales with SF — join strategy left to AQE (it broadcasts
    # at small SF); nation is fixed-cardinality (25 rows), hint it
    s = table(spark, sf_dir, "supplier")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = table(spark, sf_dir, "region")
    first_region = r.orderBy("r_regionkey").limit(1).select("r_regionkey", "r_name")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == o.o_orderkey)
        .join(s, (l.l_suppkey == F.col("s_suppkey")) & (c.c_nationkey == F.col("s_nationkey")))
        .join(n, F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(first_region), n.n_regionkey == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(rev).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


@query(
    "q24_value_window_family",
    oracle="""
SELECT event_id, user_id, value,
       CAST(FIRST_VALUE(value) OVER w AS DOUBLE) AS first_val,
       CAST(LAST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE) AS last_val,
       CAST(NTH_VALUE(value, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE) AS second_val,
       CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS user_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, ts, event_id
""",
    tags=("window",),
)
def q24_value_window_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value + unordered count-over-partition."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wpart = Window.partitionBy("user_id")
    return (
        e.select(
            "event_id",
            "user_id",
            "value",
            F.first("value").over(w).alias("first_val"),
            F.last("value").over(wfull).alias("last_val"),
            F.nth_value("value", 2).over(wfull).alias("second_val"),
            F.count(F.lit(1)).over(wpart).alias("user_n"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "q29_in_subquery",
    oracle=f"""
SELECT o_orderpriority, COUNT(*) AS n_orders, {sql_dsum('o_totalprice')} AS revenue
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
  AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem WHERE l_discount > 0.09)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("join", "subquery"),
)
def q29_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / NOT IN subqueries via spark.sql (Catalyst rewrites them to
    semi/anti joins — same plan the DataFrame forms produce)."""
    from pyspark_distributed_kmodes_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT o_orderpriority, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS revenue
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
          AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem WHERE l_discount > 0.09)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@query(
    "qo46_unpivot",
    oracle="""
SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
UNION ALL
SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part
ORDER BY p_partkey, metric
""",
    tags=("reshape",),
)
def qo46_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long): numeric part attributes to (metric, value)."""
    p = table(spark, sf_dir, "part")
    return (
        p.select("p_partkey", F.col("p_size").cast("double"), F.col("p_retailprice"))
        .unpivot("p_partkey", ["p_size", "p_retailprice"], "metric", "value")
        .orderBy("p_partkey", "metric")
    )


@query(
    "qo47_date_series_join",
    oracle=f"""
WITH days AS (
  SELECT unnest(generate_series(TIMESTAMP '1996-01-01', TIMESTAMP '1996-03-31', INTERVAL 1 DAY)) AS day
)
SELECT d.day, COUNT(o.o_orderkey) AS n_orders, {sql_dsum('COALESCE(o.o_totalprice, 0)')} AS revenue
FROM days d
LEFT JOIN orders o ON CAST(date_trunc('day', o.o_orderdate) AS TIMESTAMP) = d.day
GROUP BY d.day
ORDER BY d.day
""",
    tags=("generate",),
)
def qo47_date_series_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated time series (gap-filling calendar): sequence + explode,
    left join facts so zero-activity days still appear."""
    o = table(spark, sf_dir, "orders")
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1996-01-01").cast("timestamp"),
                F.lit("1996-03-31").cast("timestamp"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    return (
        days.join(o, F.date_trunc("day", o.o_orderdate) == F.col("day"), "left")
        .groupBy("day")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dsum(F.coalesce(F.col("o_totalprice"), F.lit(0.0))).alias("revenue"),
        )
        .orderBy("day")
    )


@query(
    "qo48_try_arithmetic",
    oracle="""
SELECT event_id,
       value / nullif(CAST(json_extract_string(props, '$.k') AS INTEGER), 0) AS per_k,
       TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
       TRY_CAST(event_type AS INTEGER) AS bad_cast
FROM events
ORDER BY event_id
""",
    tags=("scalar", "ansi"),
)
def qo48_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic: try_divide / try_cast return NULL instead of
    raising under ANSI mode (division by k=0 rows exist in events)."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.select(
        "event_id",
        F.try_divide(F.col("value"), F.nullif(k, F.lit(0))).alias("per_k"),
        F.try_to_number(F.get_json_object("props", "$.k"), F.lit("999999")).cast("int").alias("k_int"),
        F.expr("TRY_CAST(event_type AS INT)").alias("bad_cast"),
    ).orderBy("event_id")


@query("qo49_sketch_distinct", oracle=None, tags=("agg", "approx"))
def qo49_sketch_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based distinct counting: approx_count_distinct (HLL++) and
    a mergeable Datasketches HLL (hll_sketch_agg → estimate). Rows-only:
    estimates are engine-specific; accuracy vs exact is property-tested
    in tests/test_sketches.py."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.hll_sketch_estimate(F.hll_sketch_agg("l_suppkey")).alias("hll_supps"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q37_lateral_join",
    oracle="""
SELECT c.c_custkey, c.c_name, t.o_orderkey, t.o_totalprice
FROM customer c,
LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
         WHERE o.o_custkey = c.c_custkey
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) t
ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey
""",
    tags=("join", "lateral"),
)
def q37_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: top-2 orders per customer.

    Catalyst rewrites the correlated limit into a window/join plan —
    semantically the per-group top-k pattern, written the SQL-standard
    way. (The row_number formulation is q22.)
    """
    from pyspark_distributed_kmodes_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name, t.o_orderkey, t.o_totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) t
        ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey
        """
    )


@query(
    "q38_full_outer_join",
    oracle="""
SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
       COALESCE(c.n_cust, 0) AS n_cust,
       COALESCE(s.n_supp, 0) AS n_supp
FROM (SELECT CAST(c_nationkey AS INTEGER) AS nationkey, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
FULL OUTER JOIN (SELECT CAST(s_nationkey AS INTEGER) AS nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
  USING (nationkey)
ORDER BY nationkey
""",
    tags=("join",),
)
def q38_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join preserving unmatched rows on both sides."""
    c = (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").cast("int").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").cast("int").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        c.join(s, ["nationkey"], "full_outer")
        .select(
            "nationkey",
            F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_cust"),
            F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_supp"),
        )
        .orderBy("nationkey")
    )
