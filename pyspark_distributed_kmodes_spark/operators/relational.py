"""Relational core: scan → filter → project → join → aggregate → sort.

All pure DataFrame API — Catalyst supplies predicate pushdown, column
pruning, partial aggregation, and join-strategy selection (broadcast vs
sort-merge). Scale notes are per-query in docstrings.

Reference parity: the reference has NO relational surface (it is an
RDD k-modes library, SURVEY.md §2 Part A); this module is the Part B
engine surface mandated by the north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_distributed_kmodes_spark.functions.deterministic import davg, dsum, sql_davg, sql_dsum
from pyspark_distributed_kmodes_spark.registry import query
from pyspark_distributed_kmodes_spark.sources.tables import table


@query(
    "q01_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity')} AS sum_qty,
       {sql_dsum('l_extendedprice')} AS sum_base_price,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {sql_davg('l_quantity')} AS avg_qty,
       {sql_davg('l_extendedprice')} AS avg_price,
       {sql_davg('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    tags=("agg", "flagship"),
    bench=True,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary (flagship).

    Scale: single scan + single shuffle on a 6-value grouping key;
    Catalyst plans partial (map-side) aggregation, so shuffle traffic is
    O(partitions × 6 groups) regardless of input size. The shipdate
    filter pushes down to the parquet scan.
    """
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q02_filter_predicates",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
FROM orders
WHERE o_orderstatus IN ('O', 'F')
  AND o_totalprice BETWEEN 10000 AND 200000
  AND o_orderpriority LIKE '%URGENT%'
  AND NOT (o_custkey IS NULL)
ORDER BY o_orderkey
""",
    tags=("filter",),
)
def q02_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter family: IN, BETWEEN, LIKE, IS NULL, boolean combos.

    Scale: all four predicates are Catalyst-pushable; IN/BETWEEN reach
    the parquet row-group stats, LIKE '%..%' evaluates post-scan.
    """
    o = table(spark, sf_dir, "orders")
    return (
        o.filter(
            F.col("o_orderstatus").isin("O", "F")
            & F.col("o_totalprice").between(10000, 200000)
            & F.col("o_orderpriority").like("%URGENT%")
            & F.col("o_custkey").isNotNull()
        )
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")
    )


@query(
    "q03_conditional_expr",
    oracle="""
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'debtor'
            WHEN c_acctbal < 5000 THEN 'standard'
            ELSE 'premium' END AS tier,
       COALESCE(NULLIF(c_mktsegment, 'AUTOMOBILE'), 'CAR') AS segment_alias,
       CAST(c_acctbal > 0 AS INTEGER) AS is_positive
FROM customer
ORDER BY c_custkey
""",
    tags=("projection",),
)
def q03_conditional_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional expressions: CASE WHEN / COALESCE / NULLIF."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debtor")
        .when(F.col("c_acctbal") < 5000, "standard")
        .otherwise("premium")
        .alias("tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("AUTOMOBILE")), F.lit("CAR")).alias("segment_alias"),
        (F.col("c_acctbal") > 0).cast("int").alias("is_positive"),
    ).orderBy("c_custkey")


@query(
    "q04_broadcast_join_dims",
    oracle=f"""
SELECT r.r_name, n.n_name,
       COUNT(*) AS n_customers,
       {sql_davg('c.c_acctbal')} AS avg_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
ORDER BY r.r_name, n.n_name
""",
    tags=("join", "agg"),
    bench=True,
)
def q04_broadcast_join_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join through two broadcast dimensions.

    Scale: nation (25 rows) and region (5 rows) are broadcast —
    explicitly hinted so the fact side never shuffles for the join; the
    only shuffle is the final 25-group aggregation (map-side combined).
    """
    c = table(spark, sf_dir, "customer")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), davg("c_acctbal").alias("avg_acctbal"))
        .orderBy("r_name", "n_name")
    )


@query(
    "q05_semi_join",
    oracle="""
SELECT c.c_mktsegment, COUNT(*) AS n_active_customers
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
""",
    tags=("join",),
)
def q05_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): customers with a >100k order.

    Scale: semi join never duplicates the left side, so no fan-out;
    Catalyst pushes the o_totalprice filter below the join.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_active_customers"))
        .orderBy("c_mktsegment")
    )


@query(
    "q06_anti_join",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
ORDER BY c_custkey
""",
    tags=("join",),
)
def q06_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no orders."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name").orderBy("c_custkey")


@query(
    "q07_outer_join_coalesce",
    oracle=f"""
SELECT n.n_name,
       COUNT(s.s_suppkey) AS n_suppliers,
       {sql_dsum('COALESCE(s.s_acctbal, 0)')} AS total_bal
FROM nation n
LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY n.n_name
""",
    tags=("join",),
)
def q07_outer_join_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving empty nations; null-safe aggregation."""
    n = table(spark, sf_dir, "nation")
    s = table(spark, sf_dir, "supplier")
    return (
        n.join(s, s.s_nationkey == n.n_nationkey, "left")
        .groupBy("n_name")
        .agg(
            F.count("s_suppkey").alias("n_suppliers"),
            dsum(F.coalesce(F.col("s_acctbal"), F.lit(0.0))).alias("total_bal"),
        )
        .orderBy("n_name")
    )


@query(
    "q08_theta_join",
    oracle=f"""
SELECT n.n_name, COUNT(*) AS n_pairs, {sql_davg('s.s_acctbal - c.c_acctbal')} AS avg_gap
FROM supplier s
JOIN customer c ON s.s_nationkey = c.c_nationkey AND s.s_acctbal > c.c_acctbal
JOIN nation n ON n.n_nationkey = s.s_nationkey
GROUP BY n.n_name
ORDER BY n.n_name
""",
    tags=("join",),
)
def q08_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + inequality (theta) join: same-nation supplier/customer pairs
    where the supplier is richer.

    Scale: the equi component (nationkey) drives the shuffle; the
    inequality is a post-join filter, so this stays a hash/SMJ join, not
    a cartesian product. Skew note: nationkey has only 25 values — at
    100 TB AQE skew-join splitting handles oversized partitions.
    """
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    joined = s.join(c, (s.s_nationkey == c.c_nationkey) & (s.s_acctbal > c.c_acctbal)).join(
        n, F.col("n_nationkey") == s.s_nationkey
    )
    return (
        joined.groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_pairs"), davg(F.col("s_acctbal") - F.col("c_acctbal")).alias("avg_gap"))
        .orderBy("n_name")
    )


@query(
    "q09_cross_join",
    oracle="""
SELECT a.r_name AS r1, b.r_name AS r2
FROM region a CROSS JOIN region b
WHERE a.r_regionkey < b.r_regionkey
ORDER BY r1, r2
""",
    tags=("join",),
)
def q09_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join (tiny × tiny only — never on facts)."""
    r = table(spark, sf_dir, "region")
    a = r.select(F.col("r_regionkey").alias("k1"), F.col("r_name").alias("r1"))
    b = r.select(F.col("r_regionkey").alias("k2"), F.col("r_name").alias("r2"))
    return a.crossJoin(b).filter(F.col("k1") < F.col("k2")).select("r1", "r2").orderBy("r1", "r2")


@query(
    "q10_agg_family",
    oracle="""
SELECT c_mktsegment,
       COUNT(*) AS n_rows,
       COUNT(DISTINCT c_nationkey) AS n_nations,
       CAST(MIN(c_acctbal) AS DOUBLE) AS min_bal,
       CAST(MAX(c_acctbal) AS DOUBLE) AS max_bal,
       FIRST(c_name ORDER BY c_acctbal ASC, c_custkey ASC) AS poorest,
       FIRST(c_name ORDER BY c_acctbal DESC, c_custkey ASC) AS richest,
       STRING_AGG(c_name, ',' ORDER BY c_name) AS all_names
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    tags=("agg",),
)
def q10_agg_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate family: count distinct, min/max, min_by/max_by, ordered
    string agg (deterministic via sort).

    Scale: count distinct expands to a two-phase partial aggregate;
    collect_list is bounded here by group size (segment cardinality 5 ×
    members) — at 100 TB replace with approx or top-N sketches.
    """
    c = table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
            # struct ordering = (acctbal, custkey) lexicographic → unique,
            # so ties on acctbal cannot make the result nondeterministic
            F.min_by("c_name", F.struct(F.col("c_acctbal"), F.col("c_custkey"))).alias("poorest"),
            F.max_by("c_name", F.struct(F.col("c_acctbal"), F.negative(F.col("c_custkey")))).alias("richest"),
            F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias("all_names"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q11_rollup",
    oracle=f"""
SELECT COALESCE(r.r_name, 'ALL') AS region_name,
       COALESCE(n.n_name, 'ALL') AS nation_name,
       COUNT(*) AS n_customers,
       {sql_dsum('c.c_acctbal')} AS total_bal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
ORDER BY region_name, nation_name
""",
    tags=("agg",),
)
def q11_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (region → nation → grand total)."""
    c = table(spark, sf_dir, "customer")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), dsum("c_acctbal").alias("total_bal"))
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region_name"),
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation_name"),
            "n_customers",
            "total_bal",
        )
        .orderBy("region_name", "nation_name")
    )


@query(
    "q12_cube",
    oracle=f"""
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice')} AS revenue
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY status, priority
""",
    tags=("agg",),
)
def q12_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over status × priority (all 4 grouping combinations)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
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
    "q13_pivot",
    oracle=f"""
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS cnt_f,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS cnt_o,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS cnt_p,
       {sql_dsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END")} AS rev_f,
       {sql_dsum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END")} AS rev_o,
       {sql_dsum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END")} AS rev_p
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("agg",),
)
def q13_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order status into columns (explicit value list so Catalyst
    skips the distinct-values discovery job — required at scale)."""
    o = table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("o_totalprice").alias("rev"))
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("F_cnt"), F.lit(0)).alias("cnt_f"),
        F.coalesce(F.col("O_cnt"), F.lit(0)).alias("cnt_o"),
        F.coalesce(F.col("P_cnt"), F.lit(0)).alias("cnt_p"),
        F.coalesce(F.col("F_rev"), F.lit(0.0)).alias("rev_f"),
        F.coalesce(F.col("O_rev"), F.lit(0.0)).alias("rev_o"),
        F.coalesce(F.col("P_rev"), F.lit(0.0)).alias("rev_p"),
    ).orderBy("o_orderpriority")


@query(
    "q14_percentiles",
    oracle="""
SELECT l_returnflag,
       CAST(MEDIAN(l_quantity) AS DOUBLE) AS med_qty,
       CAST(quantile_cont(l_extendedprice, 0.25) AS DOUBLE) AS p25_price,
       CAST(quantile_cont(l_extendedprice, 0.75) AS DOUBLE) AS p75_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("agg",),
)
def q14_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (continuous interpolation) per group.

    Scale: exact percentile requires a per-group sort — fine on bounded
    group counts; at 100 TB prefer `percentile_approx` (t-digest) which
    is a one-pass mergeable sketch.
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.median("l_quantity").alias("med_qty"),
            F.percentile("l_extendedprice", F.lit(0.25)).alias("p25_price"),
            F.percentile("l_extendedprice", F.lit(0.75)).alias("p75_price"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q15_sort_limit",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
LIMIT 25
""",
    tags=("sort",),
)
def q15_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k with deterministic tie-breaks.

    Scale: Spark compiles orderBy().limit(k) to TakeOrderedAndProject —
    each partition keeps its local top-k, only k rows per partition move
    to the driver-side merge. No global sort materialization.
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
        .orderBy(F.col("l_extendedprice").desc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc())
        .limit(25)
    )


@query(
    "q16_top_spenders",
    oracle=f"""
SELECT c.c_custkey, c.c_name, n.n_name,
       COUNT(o.o_orderkey) AS n_orders,
       {sql_dsum('o.o_totalprice')} AS lifetime_value
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY lifetime_value DESC, c_custkey ASC
LIMIT 10
""",
    tags=("join", "agg", "sort"),
    bench=True,
)
def q16_top_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-dim join + aggregate + top-k: the canonical reporting query.

    Scale: orders↔customer is the big join — both sides shuffle on
    custkey (or customer broadcasts at low SF; Catalyst/AQE decides);
    nation broadcasts. Top-10 via TakeOrderedAndProject.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.count("o_orderkey").alias("n_orders"), dsum("o_totalprice").alias("lifetime_value"))
        .orderBy(F.col("lifetime_value").desc(), F.col("c_custkey").asc())
        .limit(10)
    )
