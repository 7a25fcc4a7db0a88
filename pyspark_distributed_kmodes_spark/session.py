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


# Temp-dir prefixes the engine's staging/checkpoint queries create
# under tempfile.gettempdir() (qm01/qm02/n06, the file-format sinks,
# the streaming stage dirs). Each query cleans up after itself (rmtree
# post-stream or atexit), but a killed process leaks its dirs — the
# round-9 audit found 273 stale ones. sweep_stale_tmp() removes only
# dirs matching these prefixes AND older than a day, so concurrent
# live sessions (whose dirs are minutes old) are never touched.
_TMP_PREFIXES = (
    "events_stream_", "upsert_ckpt_", "m_chunk_", "m_stream_chunks_",
    "qm01_", "qm02_", "qn06_", "qc01_csv_", "qc02_jsonl_",
    "e06_jsonl_sink_", "qh10_orc_", "qh11_part_", "qi02_snap_",
    "qi27_evo_", "qj08_bin_", "qj09_text_", "qj34_wap_", "qj40_dpo_",
    "qk23_xml_", "qk24_csv_", "qk25_zstd_", "qb34_bucketed_",
    # the former r-suite (now o-keys) streaming/staging dirs — each is
    # also atexit-registered at mkdtemp time, so the sweeper only has
    # to catch dirs orphaned by a killed process
    "o10_meta_", "o12_target_", "o15_stage_",
    "o15_target_", "o16_stage_", "o16_ckpt_", "o19_stage_",
    "o19_ckpt_", "o20_runs_", "o26_stage_", "o26_ckpt_",
    # round-11 p-suite + the shared memoized events staging ("o12_stage_"
    # retired with it — o12 now stages through evstage_)
    "evstage_", "p03_target_", "p04_target_", "p05_target_",
    "p06_target_", "p07_target_", "p13_target_", "p14_target_",
    "p04_planted_", "p07_pin_", "p14_pin_", "p03_listener_",
    "p06_contrast_",
)
_SWEEP_DONE = False


def sweep_stale_tmp(max_age_sec: float = 86400.0) -> int:
    """Remove engine temp dirs older than max_age_sec; returns count."""
    global _SWEEP_DONE
    import shutil
    import tempfile
    import time

    _SWEEP_DONE = True
    root = tempfile.gettempdir()
    cutoff = time.time() - max_age_sec
    removed = 0
    try:
        entries = os.listdir(root)
    except OSError:
        return 0
    for name in entries:
        if not name.startswith(_TMP_PREFIXES):
            continue
        path = os.path.join(root, name)
        try:
            if os.path.isdir(path) and os.path.getmtime(path) < cutoff:
                shutil.rmtree(path, ignore_errors=True)
                removed += 1
        except OSError:
            continue
    return removed


def configure(spark: SparkSession) -> SparkSession:
    """Idempotently apply runtime confs to a session we didn't build."""
    if not _SWEEP_DONE:
        sweep_stale_tmp()
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
