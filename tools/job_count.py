"""Deterministic structural probe: Spark JOB and STAGE counts per query.

Wall-clock on this VM swings +-2x with ambient load, but the number of
jobs and stages a query schedules is a pure function of the code — the
noise-free witness for "this change removed N materialization jobs /
shuffles per run". Each query runs once inside its own job group; the
status tracker then reports that group's job ids and their stage ids.

    python tools/job_count.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.1"
    names = [a for a in sys.argv[1:] if not os.path.isdir(a)]
    from pyspark_distributed_kmodes_spark.registry import load_all
    from pyspark_distributed_kmodes_spark.session import get_spark

    spark = get_spark("job_count")
    sc = spark.sparkContext
    reg = load_all()
    # warm codegen + python workers so one-time init jobs don't pollute
    reg["q01_pricing_summary"].fn(spark, sf_dir).collect()
    spark.createDataFrame([(1,)], ["x"]).mapInPandas(lambda it: it, "x long").collect()

    out = {}
    for n in names:
        q = reg[n]
        group = f"probe_{n}"
        sc.setJobGroup(group, n)
        t0 = time.time()
        len(q.fn(spark, sf_dir).collect())
        wall = round(time.time() - t0, 3)
        sc.setJobGroup(None, None)
        tracker = sc.statusTracker()
        job_ids = tracker.getJobIdsForGroup(group)
        n_stages = 0
        n_tasks = 0
        for j in job_ids:
            info = tracker.getJobInfo(j)
            if info is None:
                continue
            n_stages += len(info.stageIds)
            for s in info.stageIds:
                si = tracker.getStageInfo(s)
                if si is not None:
                    n_tasks += si.numTasks
        out[n] = {"jobs": len(job_ids), "stages": n_stages, "tasks": n_tasks, "wall": wall}
        print(json.dumps({n: out[n]}), flush=True)
    print("RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
