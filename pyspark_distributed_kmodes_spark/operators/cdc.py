"""CDC-style operators without a table format: upsert (MERGE emulation)
and SCD2 history construction.

Spark has no MERGE INTO on plain parquet (needs Delta/Iceberg); the
standard emulation is anti-join + union for upserts, and
change-detection windows for SCD2 validity intervals. Both are pure
DataFrame ops — at 100 TB the upsert pattern is exactly what a
compaction job runs per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_distributed_kmodes_spark.registry import query
from pyspark_distributed_kmodes_spark.sources.tables import table


def merge_upsert(target: DataFrame, updates: DataFrame, key_cols: list[str]) -> DataFrame:
    """MERGE emulation: rows of `target` whose key appears in `updates`
    are replaced; new keys are inserted. (WHEN MATCHED UPDATE SET * /
    WHEN NOT MATCHED INSERT *.)

    Plan shape: one left-anti join (target keys minus update keys) +
    union — both sides shuffle once on the key; with bucketed targets
    the anti join is exchange-free.
    """
    kept = target.join(updates.select(*key_cols), key_cols, "left_anti")
    return kept.unionByName(updates)


def scd2_history(df: DataFrame, key: str, attr: str, ts: str, tie_break: str) -> DataFrame:
    """Slowly-changing-dimension type 2: collapse an event log into
    validity intervals — one row per (key, attr-run) with
    [valid_from, valid_to) bounds, valid_to NULL for the current row.

    Change detection via lag(); run grouping via a cumulative sum of
    change flags (gaps-and-islands); interval bounds via min/lead.
    One shuffle on the key.
    """
    w = Window.partitionBy(key).orderBy(ts, tie_break)
    changed = F.when(
        F.lag(attr).over(w).isNull() | (F.lag(attr).over(w) != F.col(attr)), 1
    ).otherwise(0)
    runs = (
        df.withColumn("_chg", changed)
        .withColumn("_run", F.sum("_chg").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    )
    intervals = runs.groupBy(key, "_run").agg(
        F.first(F.col(attr)).alias(attr),
        F.min(ts).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = Window.partitionBy(key).orderBy("valid_from")
    return intervals.withColumn("valid_to", F.lead("valid_from").over(w2)).drop("_run")


@query(
    "qo88_scd2_history",
    oracle="""
WITH flagged AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN LAG(event_type) OVER w IS NULL
                   OR LAG(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), runs AS (
  SELECT user_id, event_type, ts,
         SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
  FROM flagged
), intervals AS (
  SELECT user_id, run,
         FIRST(event_type ORDER BY ts) AS event_type,
         MIN(ts) AS valid_from,
         COUNT(*) AS n_events
  FROM runs
  GROUP BY user_id, run
)
SELECT user_id, event_type, valid_from,
       LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from) AS valid_to,
       n_events
FROM intervals
ORDER BY user_id, valid_from
""",
    tags=("cdc", "window"),
)
def qo88_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 validity intervals over the event log: one row per run of
    identical event_type per user, with [valid_from, valid_to)."""
    e = table(spark, sf_dir, "events")
    out = scd2_history(e, key="user_id", attr="event_type", ts="ts", tie_break="event_id")
    return out.select("user_id", "event_type", "valid_from", "valid_to", "n_events").orderBy(
        "user_id", "valid_from"
    )


@query(
    "qo89_merge_upsert",
    oracle="""
WITH updates AS (
  SELECT c_custkey, c_name, c_nationkey, c_acctbal + 1000.0 AS c_acctbal, c_mktsegment
  FROM customer WHERE c_custkey % 10 = 0
), target_kept AS (
  SELECT * FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM updates)
)
SELECT c_custkey, c_name, CAST(c_nationkey AS INTEGER) AS c_nationkey, c_acctbal, c_mktsegment
FROM (SELECT * FROM target_kept UNION ALL SELECT * FROM updates) t
ORDER BY c_custkey
""",
    tags=("cdc",),
)
def qo89_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO emulation: apply a +1000 balance adjustment to every
    10th customer (update) keeping all others (no-op insert set here) —
    the anti-join+union upsert pattern."""
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", F.col("c_nationkey").cast("int").alias("c_nationkey"), "c_acctbal", "c_mktsegment"
    )
    updates = c.filter(F.col("c_custkey") % 10 == 0).withColumn("c_acctbal", F.col("c_acctbal") + 1000.0)
    return merge_upsert(c, updates, ["c_custkey"]).orderBy("c_custkey")


@query(
    "qb39_nullsafe_snapshot_diff",
    oracle="""
WITH snap_a AS (
  SELECT nullif(c_mktsegment, 'BUILDING') AS seg, count(*) AS n_a,
         count(DISTINCT c_nationkey) AS nations_a
  FROM customer GROUP BY 1
), snap_b AS (
  SELECT nullif(c_mktsegment, 'BUILDING') AS seg, count(*) AS n_b
  FROM customer WHERE c_acctbal > 0 GROUP BY 1
)
SELECT coalesce(a.seg, b.seg) AS seg, a.n_a, a.nations_a, b.n_b,
       (a.n_a IS NOT DISTINCT FROM b.n_b) AS unchanged
FROM snap_a a FULL JOIN snap_b b ON a.seg IS NOT DISTINCT FROM b.seg
ORDER BY seg NULLS FIRST
""",
    tags=("join", "cdc", "nullsafe"),
)
def qb39_nullsafe_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): diff two
    snapshot aggregates whose grouping key is nullable (a sentinel
    segment normalized to NULL) — NULL keys must pair with NULL keys,
    which a plain equi-join silently drops.

    Scale: eqNullSafe is still an EQUI join to Catalyst (keyed on
    coalesce-tagged values), so it hash-partitions both sides — no
    fallback to a nested-loop plan; the aggregates shrink each side to
    |segments| rows first.
    """
    c = table(spark, sf_dir, "customer")
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg")
    snap_a = c.groupBy(seg).agg(
        F.count(F.lit(1)).alias("n_a"),
        F.countDistinct("c_nationkey").alias("nations_a"),
    )
    snap_b = (
        c.filter(F.col("c_acctbal") > 0)
        .groupBy(seg)
        .agg(F.count(F.lit(1)).alias("n_b"))
    )
    a, b = snap_a.alias("a"), snap_b.alias("b")
    return (
        a.join(b, F.col("a.seg").eqNullSafe(F.col("b.seg")), "full")
        .select(
            F.coalesce(F.col("a.seg"), F.col("b.seg")).alias("seg"),
            "n_a",
            "nations_a",
            "n_b",
            F.col("n_a").eqNullSafe(F.col("n_b")).alias("unchanged"),
        )
        .orderBy(F.col("seg").asc_nulls_first())
    )
