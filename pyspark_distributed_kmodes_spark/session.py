"""SparkSession construction and per-session runtime configuration.

The driver may hand us an already-built session, so everything that can
be set at runtime (timezone, AQE, shuffle partitions) is applied
idempotently via `configure(spark)`; builder-time settings live in
`get_spark()` for our own tests/bench.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs applied to ANY session that runs our queries.
# - UTC timezone: the DuckDB oracle is timezone-naive; parquet timestamps
#   are naive — pinning the session to UTC makes year()/date_trunc()/
#   window() agree with the oracle on any machine.
# - AQE on (default in 4.x, pinned for safety): runtime coalescing of
#   shuffle partitions + skew-join splitting is the 100 TB safety net.
RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    # events.parquet stores TIMESTAMP(NANOS); Spark has no ns timestamp
    # type — read as long and convert in sources.tables.table().
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def configure(spark: SparkSession) -> SparkSession:
    """Idempotently apply runtime confs to a session we didn't build."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf not settable at runtime on this build — accept default
    return spark


def get_spark(app_name: str = "pyspark-distributed-kmodes-spark") -> SparkSession:
    """Build a local session sized for this machine (local[N], AQE on).

    On a real cluster the same code runs unchanged: nothing below pins
    local mode semantics — shuffle partition count is a starting hint
    that AQE re-coalesces at runtime.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    return configure(builder.getOrCreate())
