"""Window functions: ranking, analytic (lag/lead), frames, top-k per group.

Scale note common to all: a window partitioned by a high-cardinality key
(user_id, custkey) shuffles once on that key and sorts within partitions
— the same cost profile as a groupBy. Windows WITHOUT partitionBy force
a single-partition global sort and are never used here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_distributed_kmodes_spark.registry import query
from pyspark_distributed_kmodes_spark.sources.tables import table


@query(
    "q20_rank_family",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice,
       CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn,
       CAST(RANK() OVER w AS INTEGER) AS rnk,
       CAST(DENSE_RANK() OVER w AS INTEGER) AS drnk,
       CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
       CAST(PERCENT_RANK() OVER w AS DOUBLE) AS pct_rank
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey ASC)
ORDER BY o_orderstatus, rn
""",
    tags=("window",),
)
def q20_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family over a deterministic total order (tie-break on key)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        o.select(
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
        )
        .orderBy("o_orderstatus", "rn")
    )


@query(
    "q21_lag_lead_running",
    oracle="""
SELECT event_id, user_id, ts, value,
       LAG(value) OVER w AS prev_value,
       LEAD(value) OVER w AS next_value,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0 AS running_total,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0 AS moving_sum3
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, ts, event_id
""",
    tags=("window",),
    bench=True,
)
def q21_lag_lead_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic functions + running/moving frames per user.

    Determinism: frame sums run in exact integer cents (value is
    2-decimal money — round(value*100) is lossless) so summation order
    can't drift; the final /100.0 is one identical float op per row.
    Integer window sums are also measurably cheaper than decimal ones.
    Scale: one shuffle on user_id.
    """
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cents = F.round(F.col("value") * 100).cast("bigint")
    return (
        e.select(
            "event_id",
            "user_id",
            "ts",
            "value",
            F.lag("value").over(w).alias("prev_value"),
            F.lead("value").over(w).alias("next_value"),
            (F.sum(cents).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("double") / 100.0).alias("running_total"),
            (F.sum(cents).over(w.rowsBetween(-2, Window.currentRow)).cast("double") / 100.0).alias("moving_sum3"),
        )
        .orderBy("user_id", "ts", "event_id")
    )


@query(
    "q22_topk_per_group",
    oracle="""
SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) t
WHERE rn <= 3
ORDER BY o_orderpriority, rn
""",
    tags=("window",),
)
def q22_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per priority: the row_number filter pattern.

    Scale: Catalyst rewrites rn<=k filters into per-partition limits
    (WindowGroupLimit in 3.5+/4.x) so each group materializes only k
    rows post-sort.
    """
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        o.select("o_orderpriority", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .orderBy("o_orderpriority", "rn")
    )


@query(
    "q23_range_frame",
    oracle="""
SELECT o_orderkey, o_orderdate, o_totalprice,
       COUNT(*) OVER (ORDER BY o_orderdate
                      RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW) AS n_last_30d
FROM orders
ORDER BY o_orderdate, o_orderkey
""",
    tags=("window",),
)
def q23_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over time: trailing 30-day order count.

    Scale-safe partitioned form (an unpartitioned rangeBetween window
    moves ALL data to one partition — Spark warns exactly that): rows
    are bucketed by coarse time bucket (30-day epoch buckets, == the
    lookback, so a trailing frame spans at most the previous bucket),
    and each row within 30 days of its bucket's end is ALSO carried
    into the next bucket as a count-only shadow row. The range frame
    then runs partitioned by bucket — every row a target's frame needs
    is present in the target's partition exactly once — and shadow rows
    are dropped on output. One shuffle on (bucket), no global sort.
    """
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_totalprice")
    lookback = 30 * 86400
    bucket_len = lookback  # any length >= the lookback keeps span <= 2 buckets
    sec = F.unix_timestamp("o_orderdate")
    base = o.withColumn("sec", sec).withColumn("bucket", F.floor(F.col("sec") / bucket_len))
    native = base.withColumn("_shadow", F.lit(0))
    carried = (
        base.filter(F.col("sec") >= (F.col("bucket") + 1) * bucket_len - lookback)
        .withColumn("bucket", F.col("bucket") + 1)
        .withColumn("_shadow", F.lit(1))
    )
    w = Window.partitionBy("bucket").orderBy("sec").rangeBetween(-lookback, 0)
    return (
        native.unionByName(carried)
        .withColumn("n_last_30d", F.count(F.lit(1)).over(w))
        .filter(F.col("_shadow") == 0)
        .select("o_orderkey", "o_orderdate", "o_totalprice", "n_last_30d")
        .orderBy("o_orderdate", "o_orderkey")
    )
