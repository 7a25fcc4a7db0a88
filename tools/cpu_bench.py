"""Load-robust per-query measurement: wall medians PLUS JVM+python
CPU-seconds deltas per run.

This VM's wall-clock is +-2x noisy under ambient host load (see
ROUND_NOTES perf lessons), so optimization decisions in the r13 round
are made on CPU-seconds (work actually done), with wall medians kept
for the driver-comparable view. In local mode the whole engine is one
JVM child process of this python driver, so /proc/<jvm>/stat deltas
capture scan+shuffle+compute work; python worker CPU (pandas UDFs,
DataSource readers) is summed over the pyspark.daemon tree.

    python tools/cpu_bench.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_TICK = os.sysconf("SC_CLK_TCK")


def _stat_cpu(pid: int) -> float:
    """utime+stime seconds of one pid (0.0 if gone)."""
    try:
        with open(f"/proc/{pid}/stat", "rb") as fh:
            parts = fh.read().rsplit(b") ", 1)[1].split()
        return (int(parts[11]) + int(parts[12])) / _TICK
    except (OSError, IndexError, ValueError):
        return 0.0


def _children(pid: int) -> list[int]:
    out = []
    try:
        for tid in os.listdir(f"/proc/{pid}/task"):
            with open(f"/proc/{pid}/task/{tid}/children") as fh:
                out.extend(int(c) for c in fh.read().split())
    except OSError:
        pass
    return out


def _tree_cpu(root: int) -> float:
    """CPU seconds of root + all live descendants (python workers)."""
    total, stack, seen = 0.0, [root], set()
    while stack:
        p = stack.pop()
        if p in seen:
            continue
        seen.add(p)
        total += _stat_cpu(p)
        stack.extend(_children(p))
    return total


def measure(names: list[str], sf_dir: str, runs: int = 5) -> dict:
    from pyspark_distributed_kmodes_spark.registry import load_all
    from pyspark_distributed_kmodes_spark.session import get_spark

    spark = get_spark("cpu_bench")
    jvm_pid = next(
        (p for p in _children(os.getpid()) if "java" in _comm(p)), None
    )
    reg = load_all()
    # warm: codegen, python workers, local-relation path
    reg["q01_pricing_summary"].fn(spark, sf_dir).collect()
    spark.createDataFrame([(1,)], ["x"]).mapInPandas(lambda it: it, "x long").collect()

    out = {}
    for n in names:
        q = reg[n]
        wall, cpu = [], []
        for _ in range(runs):
            gc.collect()
            c0 = _tree_cpu(jvm_pid) if jvm_pid else 0.0
            t0 = time.time()
            len(q.fn(spark, sf_dir).collect())
            wall.append(round(time.time() - t0, 3))
            cpu.append(round((_tree_cpu(jvm_pid) if jvm_pid else 0.0) - c0, 2))
        out[n] = {
            "wall_median": sorted(wall)[len(wall) // 2],
            "cpu_median": sorted(cpu)[len(cpu) // 2],
            "wall": wall,
            "cpu": cpu,
        }
        print(json.dumps({n: out[n]}), flush=True)
    spark.stop()
    return out


def _comm(pid: int) -> str:
    try:
        with open(f"/proc/{pid}/comm") as fh:
            return fh.read().strip()
    except OSError:
        return ""


if __name__ == "__main__":
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    res = measure(args, sf_dir)
    print("RESULT " + json.dumps(res))
