"""True Structured Streaming twins of the batch-emulated event queries.

The driver's oracle (DuckDB) is batch-only, so correctness gating runs
on the batch forms in operators/events.py; these jobs prove the SAME
logical plans run incrementally under readStream with watermarks.
tests/test_streaming.py executes them with trigger(availableNow=True)
against the events parquet and checks agreement with the batch results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_distributed_kmodes_spark.sources.tables import table


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (schema pinned from the
    batch read — streaming sources must declare schemas up front)."""
    schema = table(spark, sf_dir, "events").schema
    return spark.readStream.schema(schema).parquet(f"{sf_dir}/events.parquet")


def tumbling_counts_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming tumbling-window counts with late-data watermark.

    The watermark bounds state: windows older than max(event time) -
    watermark are finalized and evicted — the knob that makes this run
    forever on an unbounded stream.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def session_stream(events: DataFrame, gap: str = "30 minutes", watermark: str = "30 minutes") -> DataFrame:
    """Streaming session windows (stateful merge of overlapping sessions)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), F.col("w.end").alias("session_end"), "n_events")
    )


def dedup_stream(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Streaming dedup within the watermark horizon: state holds one key
    per (user_id, event_type) only as long as late data can still
    arrive."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["user_id", "event_type"])


def run_available_now(stream_df: DataFrame, query_name: str):
    """Drain everything currently available through the streaming engine
    into an in-memory sink and stop (the batch-verifiable execution
    mode). Returns the owning SparkSession's view name."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete" if stream_df.isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return query_name
