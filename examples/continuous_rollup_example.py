"""Continuous aggregate maintenance (hypertable-rollup style): keep a
queryable hourly rollup table up to date from an event stream —

    events stream → watermarked tumbling counts (update mode)
    → foreachBatch MERGE-upsert into a parquet rollup table

and prove the maintained table equals the batch q30 aggregate. Counts
per (window, event_type) only grow, so the upsert's max-order_cols rule
("keep the highest n_events per key") makes every micro-batch's partial
emission converge to the final totals — the standard pattern for a
continuously-maintained materialized aggregate on plain parquet.

    python examples/continuous_rollup_example.py [sf_dir]
"""

import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from pyspark_distributed_kmodes_spark.operators.events import q30_tumbling_window
from pyspark_distributed_kmodes_spark.session import get_spark
from pyspark_distributed_kmodes_spark.streaming.jobs import (
    events_stream,
    tumbling_counts_stream,
    upsert_sink_stream,
)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("continuous-rollup")

    rollup = tumbling_counts_stream(events_stream(spark, sf_dir), watermark="10 minutes")
    target = tempfile.mkdtemp(prefix="rollup_tgt_") + "/hourly"
    upsert_sink_stream(
        spark,
        rollup,
        target,
        key_cols=["window_start", "event_type"],
        order_cols=["n_events"],  # monotone per key -> max == final
    )

    maintained = spark.read.parquet(target).select("window_start", "event_type", "n_events")
    batch = q30_tumbling_window(spark, sf_dir).select(
        "window_start", "event_type", "n_events"
    )
    diff = maintained.exceptAll(batch).count() + batch.exceptAll(maintained).count()
    n = maintained.count()
    print(f"maintained rollup rows: {n}; rows differing from batch q30: {diff}")
    assert diff == 0, "continuous rollup diverged from the batch aggregate"
    maintained.orderBy("window_start", "event_type").show(8)
    print("continuous rollup == batch aggregate ✔")
    spark.stop()


if __name__ == "__main__":
    main()
