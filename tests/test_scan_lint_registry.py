"""Registry-wide scan-amplification gate (round-7 ADVICE item 4).

tools/scan_lint.py used to be a manual preflight tool only — CI pinned
just five known iterative queries plus planted positives, so a NEW
query exceeding _MAX_SCANS would pass pytest and only surface when
someone remembered to run the tool. This test runs lint_plan over the
FULL registry at sf0.001, making the scan bound an automated gate.

Slow by nature (builds all 412 static plans, which executes the eager
localCheckpoints — that as-executed shape is exactly what the lint
measures); skippable for quick loops with SPARK_GRAFT_SKIP_SLOW=1.
"""

import gc
import os

import pytest

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
    for name, q in sorted(reg.items()):
        try:
            plan = formatted_plan(q.fn(spark, sf_dir))
        except Exception as e:  # a query that cannot plan is its own failure
            offenders.append(f"{name}: plan build failed: {e!r:.120}")
            continue
        off = lint_plan(name, plan)
        if off:
            offenders.append(f"{name}: {', '.join(off)}")
        gc.collect()  # release this query's checkpointed blocks
    assert not offenders, (
        f"{len(offenders)} queries scan a source table more than "
        f"{_MAX_SCANS}x in their static plan:\n" + "\n".join(offenders)
    )
