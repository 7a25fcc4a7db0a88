"""Lineage-cut boundary for bounded multi-consumer intermediates.

Every operator that builds a bounded intermediate consumed by several
downstream branches (a shingle inverted index, a day dictionary, a
per-group stats table) pins it with `df.transform(cut_lineage)` instead
of calling `localCheckpoint(eager=True)` directly. Two reasons:

1. EXECUTION (default): eager localCheckpoint — compute now, pin the
   blocks, truncate lineage. This is the registry's determinism and
   scan-shape contract: the checkpointed intermediate appears as a
   `Scan ExistingRDD` in the physical plan, so iterative loops don't
   double their logical plan per round (the qk13 lesson) and scan-lint
   counts the as-executed parquet multiplicity.

2. PLAN-ONLY SWEEPS (`SPARK_GRAFT_PLAN_ONLY=1`, set by
   tools/plan_report.py and tools/scan_lint.py): `eager=False`. Spark
   still replaces the logical plan with a LogicalRDD *immediately* —
   static plans and scan counts are identical to the eager mode — but
   the job that fills the RDD is deferred to first execution, which a
   plan-only sweep never performs. Without this, building all ~450
   registry plans executes every checkpointed intermediate's job.

   CAVEAT (measured on this Spark build, see ROUND_NOTES round 9): under
   AQE, even `eager=False` materializes the checkpoint's shuffle stages,
   because finalizing an AdaptiveSparkPlan executes its query stages.
   Plan-only tools must therefore ALSO set
   `spark.conf.set("spark.sql.adaptive.enabled", "false")` for the
   deferral to be real. `plan_only_mode(spark)` does both.

Queries that need a driver-side scalar to *construct* their plan (a
collected median cut, a day dictionary used in a literal) still execute
those jobs in plan-only mode — that is inherent, not a leak.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_ENV = "SPARK_GRAFT_PLAN_ONLY"


def cut_lineage(df: DataFrame) -> DataFrame:
    """Checkpoint a bounded shared intermediate; lazy under plan-only mode."""
    return df.localCheckpoint(eager=not os.environ.get(_ENV))


def cut_lineage_lazy(df: DataFrame) -> DataFrame:
    """Lineage cut whose materialization is DEFERRED to the first action
    that computes it (localCheckpoint(eager=False)): the logical plan is
    truncated to a LogicalRDD immediately — identical plan shape and
    scan counts to `cut_lineage` — but no standalone materialization job
    runs. The first downstream action computes the RDD once and pins its
    blocks (RDD.doCheckpoint runs at job end and recurses through marked
    ancestors), so every later consumer reads the pinned blocks exactly
    as with the eager form.

    Use this when a cut intermediate's first consumer is itself an
    action the caller runs anyway (an iterative loop's convergence
    aggregate, a final collect): the eager form would pay one extra
    result-stage pass + one extra job round-trip per cut for nothing.
    NOTE (same caveat as plan-only mode, measured round 9): under AQE
    the .rdd conversion still executes the plan's SHUFFLE stages at
    build time — only the result stage is deferred. That work is needed
    regardless; it just runs earlier, inside DataFrame construction.
    """
    return df.localCheckpoint(eager=False)


def plan_only_mode(spark: SparkSession) -> None:
    """Enter plan-only mode: lazy lineage cuts + AQE off (see module doc)."""
    os.environ[_ENV] = "1"
    spark.conf.set("spark.sql.adaptive.enabled", "false")
