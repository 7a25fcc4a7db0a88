"""Table sources: parquet scans of the driver-generated star schema.

Scans are plain `spark.read.parquet` so Catalyst gets predicate pushdown,
column pruning, and partition pruning for free (SURVEY.md §4). CSV/JSON
readers are provided for parity with the reference's "any iterable of
records" input surface (SURVEY.md §1.1) and for external data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from pyspark_distributed_kmodes_spark.session import configure

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

# Dimension tables small enough to broadcast at ANY scale factor (region/
# nation are fixed-size; supplier/part grow slowly). Fact tables never.
BROADCASTABLE = {"region", "nation", "supplier", "part", "customer"}


# Analyzed-DataFrame cache: re-reading the same parquet footer for every
# query call costs ~100 ms each; DataFrames are immutable so reuse within
# a session is safe. Weak-keyed by the session so a stopped/collected
# session's entries vanish with it (no stale-session reuse).
import weakref

_TABLE_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[tuple[str, str], DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    configure(spark)
    per_session = _TABLE_CACHE.setdefault(spark, {})
    key = (os.path.abspath(sf_dir), name)
    cached = per_session.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # events.ts has shipped as parquet TIMESTAMP(NANOS) (read as a
        # nanosecond bigint via session.py's nanosAsLong) and as
        # TIMESTAMP(MICROS) without UTC adjustment (read as
        # TIMESTAMP_NTZ). Normalize both to a microsecond TIMESTAMP:
        # the session is pinned to UTC, so the NTZ cast preserves every
        # wall-clock value, and watermarks/windows require TimestampType.
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if isinstance(df.schema["ts"].dataType, T.LongType):
            # integer DIV, not `/`: float division of int64 nanos loses
            # precision above 2^53 and shifts timestamps by ±1 µs
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    per_session[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views for spark.sql() access."""
    for t in TABLES:
        table(spark, sf_dir, t).createOrReplaceTempView(t)


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """CSV scan with an explicit schema (never inferSchema in production:
    inference is a full extra pass over 100 TB)."""
    configure(spark)
    return spark.read.csv(path, header=True, schema=schema)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    configure(spark)
    return spark.read.json(path, schema=schema)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite") -> None:
    """Parquet sink. `partition_by` low-cardinality columns only (lang,
    date) — high-cardinality partitioning creates a small-files explosion
    at scale."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
    path: str | None = None,
) -> None:
    """Persist as a bucketed+sorted native table: co-locates rows by
    `bucket_col` at WRITE time so later equi-joins/aggregations on that
    key run with NO exchange — the pre-shuffled-layout strategy for
    repeatedly-joined 100 TB facts (e.g. lineitem⋈orders on orderkey).

    `path` makes it an external table at that location (otherwise data
    lands in the session's warehouse dir, which defaults to the
    PROCESS CWD — pass an explicit path when the caller can't control
    where the hosting session was started)."""
    w = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def spread(df: DataFrame, partition_col: str | None = None) -> DataFrame:
    """Repartition ONLY when the scan is under-parallelized (small local
    files → 1-2 partitions → explode/UDF stages run on one core).

    At 100 TB inputs arrive in thousands of partitions and this is a
    no-op; on small inputs it costs one tiny shuffle and buys full CPU
    fan-out for the compute-heavy stage that follows.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() * 2 >= target:
        return df
    return df.repartition(target, partition_col) if partition_col else df.repartition(target)
