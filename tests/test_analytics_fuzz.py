"""Hypothesis fuzz for the round-4 distributed decompositions: the
two-level watermark prefix scan and the two-phase skyline must equal
their brute-force definitions on ARBITRARY inputs — with block/bucket
sizes forced small so tiny generated datasets still exercise many
blocks (the fixed-corpus oracle tests can't reach that regime).
"""

import hypothesis.strategies as st
import pytest
from hypothesis import HealthCheck, given, settings

from pyspark.sql import functions as F

from pyspark_distributed_kmodes_spark.operators.analytics import (
    pareto_frontier_2d,
    watermark_admitted,
)

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# arrival sequences: event times on a small integer grid so late events
# (time < running max - delay) are common
TIMES = st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=30)


@given(times=TIMES, delay=st.integers(min_value=0, max_value=10), block=st.sampled_from([1, 2, 3, 5]))
@SLOW
def test_watermark_prefix_scan_fuzz(spark, times, delay, block):
    rows = [(i, int(t)) for i, t in enumerate(times)]
    df = spark.createDataFrame(rows, "oid long, tus long")
    got = sorted(
        r.oid for r in watermark_admitted(df, "oid", "tus", delay, block=block).collect()
    )
    mx = None
    expected = []
    for i, t in rows:
        if mx is None or t >= mx - delay:
            expected.append(i)
        mx = t if mx is None else max(mx, t)
    assert got == expected


PTS = st.lists(
    st.tuples(st.integers(min_value=0, max_value=20), st.integers(min_value=0, max_value=20)),
    min_size=1,
    max_size=30,
)


@given(pts=PTS, bucket=st.sampled_from([1, 2, 3, 7]))
@SLOW
def test_pareto_frontier_fuzz(spark, pts, bucket):
    rows = [(i, int(x), int(y)) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "pid long, x long, y long")
    got = sorted(r.pid for r in pareto_frontier_2d(df, "x", "y", bucket=bucket).collect())
    expected = sorted(
        i for i, x, y in rows if not any(x2 > x and y2 > y for _, x2, y2 in rows)
    )
    assert got == expected


EDGES = st.lists(
    st.tuples(st.integers(min_value=0, max_value=9), st.integers(min_value=0, max_value=9)),
    min_size=1,
    max_size=20,
)


@given(edges=EDGES, depth=st.sampled_from([1, 2, 3, 6]))
@SLOW
def test_bfs_min_dists_fuzz(spark, edges, depth):
    """The distributed frontier loop must produce exact minimum hop
    distances on arbitrary graphs (self-loops and parallel edges
    included) — compared against a pure-Python BFS."""
    from collections import deque

    from pyspark_distributed_kmodes_spark.operators.analytics2 import bfs_min_dists

    pairs = [(a, b) for a, b in edges if a != b]
    if not pairs:
        return
    df = spark.createDataFrame(pairs, "u long, v long")
    und = df.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionAll(
        df.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    got = {(r.root, r.v): r.d for r in bfs_min_dists(und, depth).collect()}

    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expected = {}
    for root in adj:
        seen = {root: 0}
        q = deque([root])
        while q:
            n = q.popleft()
            if seen[n] >= depth:
                continue
            for m in adj.get(n, ()):
                if m not in seen:
                    seen[m] = seen[n] + 1
                    q.append(m)
        for v, d in seen.items():
            if v != root and d <= depth:
                expected[(root, v)] = d
    assert got == expected


def _und(spark, pairs):
    df = spark.createDataFrame(pairs, "u long, v long")
    return df.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionAll(
        df.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )


def test_bfs_pair_budget_bounds_giant_component(spark):
    """VERDICT r04 item 4: a planted giant component (one 40-clique =
    every root reaches 39 others at depth 1) must hold AT MOST
    `pair_budget` discovered pairs per root — the state cap is hard,
    not advisory — and the capped pairs that DO survive carry exact
    minimum distances."""
    from collections import Counter

    from pyspark_distributed_kmodes_spark.operators.analytics2 import bfs_min_dists

    clique = [(a, b) for a in range(40) for b in range(a + 1, 40)]
    rows = bfs_min_dists(_und(spark, clique), max_depth=4, pair_budget=7).collect()
    per_root = Counter(r.root for r in rows)
    assert per_root and max(per_root.values()) <= 7
    # clique => every surviving pair is at distance exactly 1
    assert all(r.d == 1 for r in rows)


def test_bfs_pair_budget_caps_multihop_growth(spark):
    """On a star graph the quadratic blowup happens at depth 2 (every
    leaf reaches every other leaf through the hub). Budget 5 must stop
    each leaf at 5 pairs while keeping distances exact for the pairs
    kept, in deterministic (d, v) order (hub first, then smallest v)."""
    from pyspark_distributed_kmodes_spark.operators.analytics2 import bfs_min_dists

    star = [(0, i) for i in range(1, 30)]  # hub 0, leaves 1..29
    rows = bfs_min_dists(_und(spark, star), max_depth=3, pair_budget=5).collect()
    by_root = {}
    for r in rows:
        by_root.setdefault(r.root, []).append((r.d, r.v))
    assert max(len(v) for v in by_root.values()) <= 5
    # leaf 7: depth-1 pair (hub) survives, then the 4 smallest leaves
    assert sorted(by_root[7]) == [(1, 0), (2, 1), (2, 2), (2, 3), (2, 4)]


def test_bfs_pair_budget_noop_on_normal_graph(spark):
    """A budget larger than any component leaves the output EXACTLY
    equal to the uncapped BFS — the cap is free on real dedup graphs."""
    from pyspark_distributed_kmodes_spark.operators.analytics2 import bfs_min_dists

    pairs = [(0, 1), (1, 2), (3, 4), (5, 6), (6, 7), (7, 8), (8, 5)]
    und = _und(spark, pairs)
    exact = {(r.root, r.v, r.d) for r in bfs_min_dists(und, 4).collect()}
    capped = {(r.root, r.v, r.d) for r in bfs_min_dists(und, 4, pair_budget=1000).collect()}
    assert exact == capped
