"""Capture .explain("formatted") for bench queries into plans/<tag>/.

Usage: python tools/capture_plans.py <suffix> [query ...]
Writes plans/r13/<query>_<suffix>.txt for every bench-tagged query (or
the listed subset). Queries whose DataFrame construction executes work
(streaming replays, bucketed writes, eager lineage cuts) are executed
as a side effect — run this on a quiet machine, not inside the bench.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    suffix = sys.argv[1]
    only = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark_distributed_kmodes_spark.registry import load_all
    from pyspark_distributed_kmodes_spark.session import get_spark

    spark = get_spark("plans")
    reg = load_all()
    names = only or [n for n, q in sorted(reg.items()) if q.bench]
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLAN_DIR", "r14"),
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        try:
            df = reg[name].fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        except Exception as e:  # noqa: BLE001 - record, keep capturing
            plan = f"CAPTURE FAILED: {e}\n"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print("captured", name)
    spark.stop()


if __name__ == "__main__":
    main()
