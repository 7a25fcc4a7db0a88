"""Registry-wide scan-amplification gate (round-7 ADVICE item 4).

tools/scan_lint.py used to be a manual preflight tool only — CI pinned
just five known iterative queries plus planted positives, so a NEW
query exceeding _MAX_SCANS would pass pytest and only surface when
someone remembered to run the tool. This test runs lint_plan over the
FULL registry at sf0.001, making the scan bound an automated gate.

Runs in PLAN-ONLY mode (functions/lineage.py): lineage cuts still
appear as LogicalRDD scans in the static plans — identical counts to
the eager mode, pinned by test_scan_lint.py's twin — but the
checkpoint-fill jobs never run, so the full-registry sweep is plan
construction only (plus the driver-side scalar collects some queries
need to BUILD their plan). Still the slowest test in the suite;
skippable for quick loops with SPARK_GRAFT_SKIP_SLOW=1.
"""

import gc
import os

import pytest

from pyspark_distributed_kmodes_spark.functions.lineage import plan_only_mode
from pyspark_distributed_kmodes_spark.plans.inspect import formatted_plan
from pyspark_distributed_kmodes_spark.registry import load_all
from tools.scan_lint import _MAX_SCANS, lint_plan


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SKIP_SLOW") == "1",
    reason="slow registry-wide sweep skipped by request",
)
def test_no_registered_query_amplifies_scans(spark, sf_dir):
    reg = load_all()
    offenders: list[str] = []
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        plan_only_mode(spark)
        for name, q in sorted(reg.items()):
            try:
                plan = formatted_plan(q.fn(spark, sf_dir))
            except Exception as e:  # a query that cannot plan is its own failure
                offenders.append(f"{name}: plan build failed: {e!r:.120}")
                continue
            off = lint_plan(name, plan)
            if off:
                offenders.append(f"{name}: {', '.join(off)}")
            gc.collect()  # release any blocks from plan-time scalar jobs
    finally:
        os.environ.pop("SPARK_GRAFT_PLAN_ONLY", None)
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
    assert not offenders, (
        f"{len(offenders)} queries scan a source table more than "
        f"{_MAX_SCANS}x in their static plan:\n" + "\n".join(offenders)
    )
