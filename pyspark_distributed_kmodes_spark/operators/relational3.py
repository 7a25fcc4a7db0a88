"""Relational surface, part 3: correlated subqueries and funnel
analytics — the query shapes Catalyst must decorrelate into joins."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_distributed_kmodes_spark.functions.deterministic import dsum, pround, sql_dsum
from pyspark_distributed_kmodes_spark.registry import query
from pyspark_distributed_kmodes_spark.sources.tables import table


@query(
    "qo85_min_price_per_brand",
    oracle="""
SELECT p.p_partkey, p.p_brand, p.p_retailprice
FROM part p
WHERE p.p_retailprice = (SELECT MIN(p2.p_retailprice) FROM part p2
                         WHERE p2.p_brand = p.p_brand)
ORDER BY p.p_brand, p.p_partkey
""",
    tags=("subquery",),
)
def qo85_min_price_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated scalar MIN subquery — cheapest part(s)
    per brand. DataFrame form: min-over-window equality (the plan
    Catalyst decorrelates the subquery into anyway: one shuffle on
    brand, no self-join)."""
    p = table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand")
    return (
        p.withColumn("_min", F.min("p_retailprice").over(w))
        .filter(F.col("p_retailprice") == F.col("_min"))
        .select("p_partkey", "p_brand", "p_retailprice")
        .orderBy("p_brand", "p_partkey")
    )


@query(
    "qo86_small_quantity_revenue",
    oracle=f"""
SELECT l.l_partkey,
       {sql_dsum('l.l_extendedprice')} AS small_lot_revenue,
       COUNT(*) AS n_small_lots
FROM lineitem l
WHERE l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
                      WHERE l2.l_partkey = l.l_partkey)
GROUP BY l.l_partkey
ORDER BY l.l_partkey
""",
    tags=("subquery", "agg"),
)
def qo86_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated AVG subquery — revenue from lots
    under half the part's average quantity.

    DataFrame form: avg-over-window then filter — one shuffle on
    partkey instead of the naive per-row subquery. AVG determinism:
    only used as a comparison threshold; values ~25±, the < comparison
    is stable because l_quantity is integral-valued while the threshold
    is fractional (both engines compute the same double from the same
    per-key sums — DuckDB's AVG and ours differ only when summation
    order differs, and the comparison sits far from the boundary).
    """
    li = table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    avg_qty = (F.sum(F.col("l_quantity").cast("decimal(25,6)")).over(w) / F.count(F.lit(1)).over(w)).cast("double")
    return (
        li.withColumn("_thresh", 0.5 * avg_qty)
        .filter(F.col("l_quantity") < F.col("_thresh"))
        .groupBy("l_partkey")
        .agg(dsum("l_extendedprice").alias("small_lot_revenue"), F.count(F.lit(1)).alias("n_small_lots"))
        .orderBy("l_partkey")
    )


@query(
    "qo87_event_funnel",
    oracle="""
WITH firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase,
         COUNT(*) AS n_events
  FROM events
  GROUP BY user_id
)
SELECT user_id, first_signup, first_purchase, n_events,
       CASE WHEN first_signup IS NOT NULL AND first_purchase > first_signup
            THEN 1 ELSE 0 END AS converted,
       CASE WHEN first_signup IS NOT NULL AND first_purchase > first_signup
            THEN CAST(date_diff('second', first_signup, first_purchase) AS BIGINT) END AS secs_to_convert
FROM firsts
ORDER BY user_id
""",
    tags=("events", "funnel"),
)
def qo87_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analytics: first signup → first purchase per user,
    conversion flag and time-to-convert — one conditional aggregation
    pass (no joins, no self-joins)."""
    e = table(spark, sf_dir, "events")
    first_signup = F.min(F.when(F.col("event_type") == "signup", F.col("ts")))
    first_purchase = F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
    agg = e.groupBy("user_id").agg(
        first_signup.alias("first_signup"),
        first_purchase.alias("first_purchase"),
        F.count(F.lit(1)).alias("n_events"),
    )
    converted = F.col("first_signup").isNotNull() & (F.col("first_purchase") > F.col("first_signup"))
    return agg.select(
        "user_id",
        "first_signup",
        "first_purchase",
        "n_events",
        F.when(converted, 1).otherwise(0).alias("converted"),
        F.when(
            converted,
            (F.unix_timestamp("first_purchase") - F.unix_timestamp("first_signup")).cast("bigint"),
        ).alias("secs_to_convert"),
    ).orderBy("user_id")


@query(
    "qo92_histogram",
    oracle=f"""
SELECT o_orderstatus,
       CAST(floor(o_totalprice / 50000.0) AS INTEGER) AS bucket,
       COUNT(*) AS n,
       {sql_dsum('o_totalprice')} AS bucket_revenue
FROM orders
GROUP BY 1, 2
ORDER BY o_orderstatus, bucket
""",
    tags=("agg", "histogram"),
)
def qo92_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value histogram: fixed-width 50k price buckets per status — the
    binning aggregation behind distribution profiling. Bucketing is a
    computed grouping key, so the plan is a plain map-side-combined
    hash aggregate."""
    o = table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000.0).cast("int")
    return (
        o.groupBy("o_orderstatus", bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("bucket_revenue"))
        .orderBy("o_orderstatus", "bucket")
    )


@query(
    "qo93_exact_stats",
    oracle="""
WITH moments AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS s2,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS p1,
         CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sp
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       (CAST(floor((s1 / n) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0) AS mean_qty,
       (CAST(floor((sqrt((s2 - s1 * s1 / n) / (n - 1))) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0) AS stddev_qty,
       (CAST(floor(((sp - s1 * p1 / n) / (n - 1)) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0) AS covar_qty_price
FROM moments
ORDER BY l_returnflag
""",
    tags=("agg", "stats"),
)
def qo93_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (mean / sample stddev / sample covariance)
    computed from EXACT decimal moment sums, then one identical float
    formula per group — engine-portable where the built-in stddev/covar
    (order-dependent float accumulation) is not. The moment-sums form is
    also the mergeable one (combine partial moments across partitions).
    """
    li = table(spark, sf_dir, "lineitem")
    dec = "decimal(25,6)"
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q.cast(dec)).cast("double").alias("s1"),
        F.sum((q * q).cast(dec)).cast("double").alias("s2"),
        F.sum(p.cast(dec)).cast("double").alias("p1"),
        F.sum((q * p).cast(dec)).cast("double").alias("sp"),
    )
    n, s1, s2, p1, sp = F.col("n"), F.col("s1"), F.col("s2"), F.col("p1"), F.col("sp")
    return m.select(
        "l_returnflag",
        "n",
        pround(s1 / n, 6).alias("mean_qty"),
        pround(F.sqrt((s2 - s1 * s1 / n) / (n - 1)), 6).alias("stddev_qty"),
        pround((sp - s1 * p1 / n) / (n - 1), 6).alias("covar_qty_price"),
    ).orderBy("l_returnflag")


@query(
    "q39_salted_skew_join",
    oracle=f"""
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       (CAST(floor(({sql_dsum('l.l_extendedprice * (1 - l.l_discount)')}) * 100.0 + 0.5) AS DOUBLE) / 100.0) AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("join", "skew"),
)
def q39_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resilient fact-to-fact join: lineitem ⋈ orders executed
    through `functions/skew.py::salted_join` (8-way key spreading on
    the big side, 8× replication of the probe side), then revenue per
    order priority. Results are provably identical to the plain join —
    the oracle IS the plain join — which is the point: salting changes
    the shuffle distribution, never the semantics.

    At 100 TB this is the explicit fallback when one join key dominates
    so heavily that even AQE's skew-split partitions bottleneck
    (null-key / celebrity-key joins).
    """
    from pyspark_distributed_kmodes_spark.functions.skew import salted_join

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, orders, "l_orderkey", salt=8)
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            pround(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "qo73_market_share",
    bench=True,
    oracle=f"""
WITH all_sales AS (
  SELECT CAST(YEAR(o.o_orderdate) AS INTEGER) AS o_year,
         n2.n_name AS supp_nation,
         l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n1.n_regionkey
  JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'MEDIUM'
    AND o.o_orderdate >= DATE '1996-01-01' AND o.o_orderdate < DATE '1998-01-01'
), nat AS (
  SELECT o_year, supp_nation, {sql_dsum('volume')} AS nation_volume
  FROM all_sales GROUP BY o_year, supp_nation
)
SELECT o_year, supp_nation,
       (CAST(floor((nation_volume) * 100.0 + 0.5) AS DOUBLE) / 100.0) AS nation_volume,
       (CAST(floor((nation_volume / SUM(nation_volume) OVER (PARTITION BY o_year)) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0) AS mkt_share
FROM nat
ORDER BY o_year, supp_nation
""",
    tags=("join", "tpch"),
)
def qo73_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shape national market share: every supplier nation's
    slice of ASIA customers' MEDIUM-part revenue, per year — the
    nested-aggregate ratio pattern (group total ÷ window grand total).

    Plan shape at scale: nation/region are fixed-cardinality (25/5
    rows) and hinted broadcast; part/supplier/customer SCALE with the
    data, so their join strategy is left to AQE — it broadcasts them at
    small SF and falls back to shuffle joins when they outgrow the
    threshold. The final (year, nation) aggregation is tiny and the
    share window runs over dozens of rows.
    """
    from pyspark.sql import Window as W

    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "MEDIUM")
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    cust = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").alias("n1")
    n2 = table(spark, sf_dir, "nation").alias("n2")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    sales = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(region), F.col("n1.n_regionkey") == region.r_regionkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2.n_nationkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            F.col("n2.n_name").alias("supp_nation"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
    )
    nat = sales.groupBy("o_year", "supp_nation").agg(dsum("volume").alias("nation_volume"))
    w = W.partitionBy("o_year")
    return nat.select(
        "o_year",
        "supp_nation",
        pround("nation_volume", 2).alias("nation_volume"),
        pround(F.col("nation_volume") / F.sum("nation_volume").over(w), 6).alias("mkt_share"),
    ).orderBy("o_year", "supp_nation")


@query(
    "qo74_waiting_suppliers",
    bench=True,
    oracle="""
WITH per AS (
  SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS supp_max
  FROM lineitem GROUP BY l_orderkey, l_suppkey
), per2 AS (
  SELECT *, MAX(supp_max) OVER (PARTITION BY l_orderkey) AS ord_max,
         COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supps
  FROM per
), per3 AS (
  SELECT *, SUM(CASE WHEN supp_max = ord_max THEN 1 ELSE 0 END)
              OVER (PARTITION BY l_orderkey) AS n_at_max
  FROM per2
)
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM per3 p JOIN supplier s ON s.s_suppkey = p.l_suppkey
WHERE p.supp_max = p.ord_max AND p.n_supps >= 2 AND p.n_at_max = 1
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
    tags=("join", "tpch", "window"),
)
def qo74_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shape: suppliers who were the SOLE latest shipper in
    multi-supplier orders (everyone else finished earlier), top 20 by
    count. Q21's EXISTS (another supplier on the order) / NOT EXISTS
    (another supplier as late as me) pair is expressed as per-order
    window counts — one pass instead of two correlated self-joins.

    Scale: one (orderkey, suppkey) aggregation, windows over the same
    orderkey partitioning (no extra shuffle), then a broadcast join to
    supplier and a tiny top-k.
    """
    from pyspark.sql import Window as W

    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    per = li.groupBy("l_orderkey", "l_suppkey").agg(F.max("l_shipdate").alias("supp_max"))
    w = W.partitionBy("l_orderkey")
    per3 = (
        per.withColumn("ord_max", F.max("supp_max").over(w))
        .withColumn("n_supps", F.count(F.lit(1)).over(w))
        .withColumn("n_at_max", F.sum(F.when(F.col("supp_max") == F.col("ord_max"), 1).otherwise(0)).over(w))
    )
    waiting = per3.filter(
        (F.col("supp_max") == F.col("ord_max")) & (F.col("n_supps") >= 2) & (F.col("n_at_max") == 1)
    )
    return (
        waiting.join(supp, waiting.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


@query(
    "o16_volume_shipping",
    bench=True,
    oracle=f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
    tags=("join", "tpch"),
)
def o16_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral shipping volume between two nations by
    year — a 6-table join where the same dimension (nation) enters
    twice under different roles.

    Scale: nation/supplier/customer broadcast; the only fact-sized
    shuffle is lineitem⋈orders on orderkey; the nation-pair filter
    prunes before aggregation. Revenue in exact decimal sums.
    """
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    # membership pre-filter (round-13): the bilateral `pair` predicate is
    # a disjunction the optimizer cannot push through the joins, but it
    # IMPLIES each side's nation ∈ {NATION_1, NATION_2} — filtering the
    # two broadcast dims up front drops ~23/25 of lineitem AND orders
    # rows before the only fact-sized shuffle (l_orderkey ⋈ o_orderkey),
    # guide §2.3/§3.2. The exact `pair` filter below is unchanged.
    members = ("NATION_1", "NATION_2")
    n1 = (
        table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*members))
        .select(F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation"))
    )
    n2 = (
        table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*members))
        .select(F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation"))
    )
    pair = ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # both fact sides are nation-pruned BEFORE the orderkey shuffle
    # (inner joins associate — results identical to the flat chain)
    li_side = li.join(s, li["l_suppkey"] == s["s_suppkey"]).join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey")
    )
    o_side = o.join(c, o["o_custkey"] == c["c_custkey"]).join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey")
    )
    return (
        li_side.join(o_side, li["l_orderkey"] == o["o_orderkey"])
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(dsum(vol).alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "o17_promo_revenue",
    oracle=f"""
SELECT CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
       CAST(month(l.l_shipdate) AS INTEGER) AS l_month,
       (CAST(floor((100.0 * {sql_dsum("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")}
             / {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')}) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0) AS promo_pct
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY l_year, l_month
ORDER BY l_year, l_month
""",
    tags=("join", "tpch"),
)
def o17_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: monthly share of revenue from promotional parts
    — conditional aggregation as a ratio of two decimal-exact sums.

    Scale: part is the broadcast side; one fact shuffle on the
    (year, month) grouping after map-side partial aggregation.
    """
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_vol = F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0))
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy(
            F.year("l_shipdate").cast("int").alias("l_year"),
            F.month("l_shipdate").cast("int").alias("l_month"),
        )
        .agg(pround(100.0 * dsum(promo_vol) / dsum(vol), 6).alias("promo_pct"))
        .orderBy("l_year", "l_month")
    )


@query(
    "o18_brand_band_revenue",
    oracle=f"""
SELECT p.p_brand,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND l.l_quantity BETWEEN 1 AND 15)
   OR (p.p_brand = 'Brand#2' AND l.l_quantity BETWEEN 10 AND 25)
   OR (p.p_brand = 'Brand#3' AND l.l_quantity BETWEEN 20 AND 35)
GROUP BY p.p_brand
ORDER BY p.p_brand
""",
    tags=("join", "tpch"),
)
def o18_brand_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue from brand-specific quantity bands — a
    disjunctive join-filter Catalyst must keep OUT of the join condition
    (it references both sides; naive placement forces a nested-loop).

    Scale: equi-join on partkey with part broadcast; the OR predicate
    applies post-join as a filter, so no BroadcastNestedLoopJoin
    appears (asserted by the no-cartesian plan test family).
    """
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    band = (
        ((F.col("p_brand") == "Brand#1") & F.col("l_quantity").between(1, 15))
        | ((F.col("p_brand") == "Brand#2") & F.col("l_quantity").between(10, 25))
        | ((F.col("p_brand") == "Brand#3") & F.col("l_quantity").between(20, 35))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .filter(band)
        .groupBy("p_brand")
        .agg(dsum(vol).alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
        .orderBy("p_brand")
    )
