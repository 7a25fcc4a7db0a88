"""Execution-level validation of d03's watermark semantics: run a REAL
Structured Streaming query with one event per micro-batch (the limit in
which Spark's batch-boundary watermark updates become d03's per-row
rule) and check the surviving aggregate against the per-row reference.

Spark's internal watermark bookkeeping is in MILLISECONDS (event times
collapse to ms via floor before the max is tracked, and the late-row
filter compares against watermark_ms), so the reference here floors to
ms; d03 itself specifies the cleaner pure-microsecond rule — the two
agree except for sub-millisecond boundary landings, which this test's
reference models exactly.
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

N_EVENTS = 40
DELAY_MS = 600_000  # 10 minutes


@pytest.fixture(scope="module")
def staged(spark, sf_dir, tmp_path_factory):
    """First N_EVENTS events (arrival order = event_id), one parquet
    FILE per event with increasing mtimes so FileStreamSource replays
    them in arrival order under maxFilesPerTrigger=1."""
    from pyspark_distributed_kmodes_spark.sources.tables import table

    base = (
        table(spark, sf_dir, "events")
        .orderBy("event_id")
        .limit(N_EVENTS)
        .select("event_id", "ts", "event_type", F.unix_micros("ts").alias("tus"))
        .collect()
    )
    # the raw prefix arrives perfectly in order (no lateness at all), so
    # a drop test on it would be vacuous — inject controlled disorder:
    # sort by event time, then defer five early events to the very end
    # of the arrival sequence (hours late, far beyond the 10-min delay)
    in_order = sorted(base, key=lambda r: r.tus)
    deferred_idx = {5, 11, 17, 23, 29}
    rows = [r for i, r in enumerate(in_order) if i not in deferred_idx] + [
        r for i, r in enumerate(in_order) if i in deferred_idx
    ]
    stage = tmp_path_factory.mktemp("wm_twin")
    for i, r in enumerate(rows):
        df = spark.createDataFrame(
            [(r.event_id, r.ts, r.event_type)], "event_id long, ts timestamp, event_type string"
        )
        path = str(stage / f"ev_{i:05d}")
        df.coalesce(1).write.parquet(path)
        t = 1_600_000_000 + i  # strictly increasing mtimes
        for root, _, files in os.walk(path):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))
    return stage, rows


def test_streaming_watermark_drops_match_window_end_rule(spark, staged):
    """A watermarked windowed AGGREGATION drops late rows at WINDOW
    granularity: a row is discarded iff its window's END <= the
    watermark in force for its micro-batch (the window can no longer
    be updated); the watermark itself advances on max event time SEEN,
    including times carried by rows that are then discarded. With one
    event per micro-batch this becomes a per-row rule this reference
    replays exactly. (An earlier version of this test grouped by
    date_trunc('hour', ts) — NOT a recognized event-time window — and
    Spark then applies NO late filtering at all: every late row
    aggregated. That behavior difference is itself worth pinning.)"""
    stage, rows = staged
    # one directory of single-row files; one file per micro-batch
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stage / "*"))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    state = {}

    def upsert(batch_df, batch_id):
        for r in batch_df.collect():
            state[(r.window.start, r.event_type)] = r.n

    q = (
        agg.writeStream.foreachBatch(upsert)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    HOUR_MS = 3_600_000
    kept = {}
    n_dropped = 0
    max_ms = None
    for r in rows:
        ms = r.tus // 1000
        win_start = r.ts.replace(minute=0, second=0, microsecond=0)
        win_end_ms = (ms // HOUR_MS + 1) * HOUR_MS
        if max_ms is not None and win_end_ms <= max_ms - DELAY_MS:
            n_dropped += 1
            max_ms = max(max_ms, ms)
            continue
        max_ms = ms if max_ms is None else max(max_ms, ms)
        kept[(win_start, r.event_type)] = kept.get((win_start, r.event_type), 0) + 1

    assert n_dropped >= 5, "disorder injection failed — the test would be vacuous"
    assert state == kept, (state, kept)


def test_batch_twin_agrees_with_ms_rule_when_no_boundary_landings(spark, sf_dir, staged):
    """d03's pure-microsecond rule and the ms-floor rule agree unless an
    event lands in the sub-ms gap between the two watermarks — verify
    the sf0.001 prefix has no such landing, so the twin's spec is
    faithful to real streaming behavior on this data."""
    _, rows = staged
    max_us = None
    for r in rows:
        if max_us is not None:
            us_rule = r.tus < max_us - DELAY_MS * 1000
            ms_rule = (r.tus // 1000) < (max_us // 1000) - DELAY_MS
            assert us_rule == ms_rule, (r.event_id, r.tus, max_us)
        max_us = r.tus if max_us is None else max(max_us, r.tus)


def test_watermark_survives_checkpoint_restart(spark, tmp_path):
    """The event-time watermark is part of the checkpointed state: after
    a stop/restart, rows older than the PERSISTED watermark must still
    be dropped even though the new query instance has seen no data.
    Control: the same late batch on a FRESH checkpoint (watermark
    re-initialized) IS admitted — proving the drop comes from the
    restored watermark, not from the data itself."""
    import pandas as pd  # noqa: F401

    src = tmp_path / "src"
    log = tmp_path / "log"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    base_us = 1_700_000_000_000_000  # anchor event time (µs)

    def write_batch(name, rows):
        # FileStreamSource lists src non-recursively: stage the parquet
        # then copy the single part-file in as a flat file
        import glob
        import shutil

        df = spark.createDataFrame(rows, "event_id long, tus long").select(
            "event_id", F.timestamp_micros(F.col("tus")).alias("ts")
        )
        staging = tmp_path / f"staging_{name}"
        df.coalesce(1).write.parquet(str(staging))
        part = glob.glob(str(staging / "part-*.parquet"))[0]
        shutil.copy(part, src / f"{name}.parquet")

    # batch 1: 20 in-order events over ~100 minutes -> watermark lands
    # at max_ts - 10 min, far past the first windows
    write_batch("b1", [(i, base_us + i * 5 * 60_000_000) for i in range(20)])

    def drain(checkpoint):
        stream = spark.readStream.schema("event_id long, ts timestamp").parquet(str(src))
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "10 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("ws"), "n")
        )

        def sink(batch_df, batch_id):
            batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(str(log))

        q = (
            agg.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", str(checkpoint))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain(ckpt)
    n_rows_after_b1 = spark.read.parquet(str(log)).count()

    # batch 2: three rows hours BEFORE the persisted watermark, landing
    # in the very first window (already emitted)
    write_batch("b2", [(100 + i, base_us + i * 60_000_000) for i in range(3)])
    drain(ckpt)  # RESTART on the same checkpoint
    after_restart = spark.read.parquet(str(log))
    # the late rows must be dropped: no new/updated window rows appear
    assert after_restart.count() == n_rows_after_b1, (
        "late rows were admitted after restart — watermark state lost"
    )

    # CONTROL: same source on a FRESH checkpoint admits those rows into
    # the first window (watermark starts uninitialized), so the assert
    # above is meaningful
    log2, ckpt2 = tmp_path / "log2", tmp_path / "ckpt2"

    def drain_fresh():
        stream = spark.readStream.schema("event_id long, ts timestamp").parquet(str(src))
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "10 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("ws"), "n")
        )

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(str(log2))

        q = (
            agg.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", str(ckpt2))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain_fresh()
    # 10-minute windows align to the epoch, not to base: the first
    # window starts at base - (base mod 600 s)
    first_ws_us = base_us - (base_us % (600 * 1_000_000))
    first_window_n = (
        spark.read.parquet(str(log2))
        .filter(F.col("ws") == F.timestamp_micros(F.lit(first_ws_us)))
        .agg(F.max("n"))
        .first()[0]
    )
    # that window holds in-order events 0,1 (base+0, base+5 min) AND the
    # three late ones (base+0,1,2 min) = 5 when everything is admitted
    assert first_window_n == 5
