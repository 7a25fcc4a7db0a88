"""Headline benchmark: runs the bench-tagged queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark_distributed_kmodes_spark.registry import load_all
    from pyspark_distributed_kmodes_spark.session import get_spark

    spark = get_spark("bench")
    reg = load_all()
    bench_queries = {n: q for n, q in sorted(reg.items()) if q.bench}

    # Warm one-time subsystems so timings measure queries, not session
    # init: JVM/codegen (a query), Python workers + Arrow (mapInPandas),
    # local-relation path (createDataFrame).
    next(iter(bench_queries.values())).fn(spark, sf_dir).collect()
    spark.createDataFrame([(1,)], ["x"]).mapInPandas(lambda it: it, "x long").collect()

    import gc

    timings = {}
    for name, q in bench_queries.items():
        runs = []
        for _ in range(3):  # median-of-3: robust round-over-round comparison
            t0 = time.time()
            len(q.fn(spark, sf_dir).collect())
            runs.append(time.time() - t0)
        timings[name] = round(sorted(runs)[1], 3)
        # release dropped localCheckpoint RDDs between queries so one
        # query's lineage cuts don't occupy memory during the next
        gc.collect()
    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline_query_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
