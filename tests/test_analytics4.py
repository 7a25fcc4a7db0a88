"""Property / decomposition tests for the round-4 analytics operators
(operators/analytics.py) — semantics the oracle hash can't express:
the distributed prefix-scan and skyline decompositions must equal
their naive single-pass forms, iterative PageRank must conserve mass,
and rank statistics must be partitioning-invariant.
"""

import pytest
from pyspark.sql import functions as F

from pyspark_distributed_kmodes_spark.registry import load_all


@pytest.fixture(scope="module")
def reg():
    return load_all()


def test_pagerank_mass_conservation(spark, sf_dir, reg):
    """With no dangling nodes (every near-dup node has degree >= 1),
    total PageRank mass stays 1 per iteration up to pround(9) noise."""
    rows = reg["qd01_neardup_pagerank"].fn(spark, sf_dir).collect()
    assert rows, "near-dup graph is non-empty at sf0.001"
    total = sum(r.pagerank for r in rows)
    assert abs(total - 1.0) < 1e-4, total
    assert all(r.pagerank > 0 for r in rows)
    # hubs (higher degree) never get LESS than the teleport floor
    n = len(rows)
    floor = 0.15 / n
    assert all(r.pagerank >= floor - 1e-9 for r in rows)


def test_watermark_prefix_scan_equals_global_window(spark, sf_dir, reg):
    """The two-level (block + prefix) scan in d03 must reproduce the
    naive single-partition global running max exactly."""
    from pyspark_distributed_kmodes_spark.sources.tables import table
    from pyspark.sql.window import Window

    got = {
        (r.hour_start, r.event_type): r.n_kept
        for r in reg["qd03_watermark_batch_twin"].fn(spark, sf_dir).collect()
    }
    e = table(spark, sf_dir, "events")
    w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, -1)
    naive = (
        e.select("event_id", "ts", "event_type", F.unix_micros("ts").alias("tus"))
        .withColumn("wm_basis", F.max("tus").over(w))
        .filter(F.col("wm_basis").isNull() | (F.col("tus") >= F.col("wm_basis") - 600_000_000))
        .groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .collect()
    )
    assert got == {(r.h, r.event_type): r.n for r in naive}


def test_pareto_frontier_equals_bruteforce(spark, sf_dir, reg):
    """The pruned 2-phase skyline must equal the O(n^2) definition."""
    from pyspark_distributed_kmodes_spark.sources.tables import table

    d = table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    pts = d.select(
        "doc_id",
        F.size(words).cast("bigint").alias("x"),
        F.size(F.array_distinct(words)).cast("bigint").alias("y"),
    ).collect()
    expected = sorted(
        p.doc_id
        for p in pts
        if not any(q.x > p.x and q.y > p.y for q in pts)
    )
    got = sorted(r.doc_id for r in reg["qd06_pareto_frontier"].fn(spark, sf_dir).collect())
    assert got == expected


def test_interval_coalesce_invariants(spark, sf_dir, reg):
    rows = reg["qd05_interval_coalesce"].fn(spark, sf_dir).collect()
    assert rows
    pad = 300_000_000
    for r in rows:
        assert r.longest_us >= pad  # a lone event still covers the pad
        assert r.covered_us >= r.longest_us
        assert r.covered_us >= r.n_intervals * pad  # each island covers >= pad
        assert r.busiest_events >= 1


def test_rolling_anomaly_flag_consistency(spark, sf_dir, reg):
    rows = reg["qd14_rolling_anomaly"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # away from the 2.0 boundary the flag must agree with the score
        if abs(abs(r.zscore) - 2.0) > 1e-3:
            assert r.is_anomaly == (1 if abs(r.zscore) > 2.0 else 0), r


def test_column_profile_matches_direct_counts(spark, sf_dir, reg):
    from pyspark_distributed_kmodes_spark.sources.tables import table

    got = {r.col_name: r for r in reg["qd16_column_profile"].fn(spark, sf_dir).collect()}
    o = table(spark, sf_dir, "orders")
    n = o.count()
    for c in ("o_orderkey", "o_orderstatus"):
        assert got[c].n_rows == n
        assert got[c].n_null == n - o.filter(F.col(c).isNotNull()).count()
        assert got[c].n_distinct == o.select(c).distinct().count()


@pytest.mark.parametrize(
    "key",
    [
        "qd09_gini_concentration",
        "qd13_spearman_rank",
        "qd10_ks_two_sample",
        # iterative graph ops: pround+DECIMAL-summed contributions must
        # make the fixpoint independent of partitioning too
        "qd01_neardup_pagerank",
        "qf04_harmonic_centrality",
    ],
)
def test_rank_stats_partitioning_invariant(spark, sf_dir, reg, key, monkeypatch):
    """Rank/ECDF statistics must not depend on input partitioning —
    re-running with a different shuffle width must hash-identically."""
    base = reg[key].fn(spark, sf_dir).collect()
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        alt = reg[key].fn(spark, sf_dir).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert sorted(map(tuple, base)) == sorted(map(tuple, alt))


def test_spearman_bounds_and_perfect_correlation(spark, reg, sf_dir):
    rows = reg["qd13_spearman_rank"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1.0 - 1e-9 <= r.spearman_rho <= 1.0 + 1e-9


def test_wilson_interval_brackets_rate(spark, sf_dir, reg):
    rows = reg["qd15_duprate_wilson"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.wilson_lo <= r.dup_rate + 1e-9
        assert r.dup_rate - 1e-9 <= r.wilson_hi <= 1.0
        assert r.wilson_lo <= r.wilson_hi


def test_gini_matches_numpy_reference(spark, sf_dir, reg):
    """Adversarial cross-check: the rank-identity Gini must match an
    INDEPENDENT formulation (mean absolute difference / 2*mean) — the
    oracle can't catch both sides implementing the same wrong
    identity; a structurally different reference can."""
    import numpy as np

    from pyspark_distributed_kmodes_spark.sources.tables import table

    got = {r.source: r.gini for r in reg["qd09_gini_concentration"].fn(spark, sf_dir).collect()}
    d = table(spark, sf_dir, "documents").select(
        "source", F.size(F.split("text", " ")).alias("nw")
    )
    by_source = {}
    for r in d.collect():
        by_source.setdefault(r.source, []).append(r.nw)
    for src, xs in by_source.items():
        x = np.array(xs, dtype=float)
        n = len(x)
        mad = np.abs(x[:, None] - x[None, :]).mean()  # includes diagonal: x (n^2) pairs
        ref = mad / (2.0 * x.mean())
        # rank-identity Gini uses the (n-1)/n-free population form G =
        # sum|xi-xj| / (2 n^2 mu) — identical to mad/(2 mu)
        assert abs(got[src] - ref) < 1e-4, (src, got[src], ref)


def test_ks_matches_numpy_reference(spark, sf_dir, reg):
    import numpy as np

    from pyspark_distributed_kmodes_spark.sources.tables import table

    row = reg["qd10_ks_two_sample"].fn(spark, sf_dir).collect()[0]
    d = table(spark, sf_dir, "documents").select("source", "n_chars").collect()
    a = np.sort([r.n_chars for r in d if r.source == "src0"])
    b = np.sort([r.n_chars for r in d if r.source == "src1"])
    grid = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(a, grid, side="right") / len(a)
    fb = np.searchsorted(b, grid, side="right") / len(b)
    ref = np.max(np.abs(fa - fb))
    assert abs(row.ks_stat - ref) < 1e-6, (row.ks_stat, ref)
    assert row.n_a == len(a) and row.n_b == len(b)


def test_spearman_matches_numpy_reference(spark, sf_dir, reg):
    """Average-rank Spearman via numpy's corrcoef on independently
    computed average ranks (argsort-based tie averaging — a different
    ranking algorithm from the SQL rank()+count formulation)."""
    import numpy as np

    from pyspark_distributed_kmodes_spark.sources.tables import table

    def avg_ranks(x):
        x = np.asarray(x, dtype=float)
        order = np.argsort(x, kind="stable")
        ranks = np.empty(len(x))
        i = 0
        while i < len(x):
            j = i
            while j + 1 < len(x) and x[order[j + 1]] == x[order[i]]:
                j += 1
            ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
            i = j + 1
        return ranks

    got = {r.source: r.spearman_rho for r in reg["qd13_spearman_rank"].fn(spark, sf_dir).collect()}
    d = table(spark, sf_dir, "documents").select(
        "source", "n_chars", F.size(F.array_distinct(F.split("text", " "))).alias("nd")
    )
    by_source = {}
    for r in d.collect():
        by_source.setdefault(r.source, []).append((r.n_chars, r.nd))
    for src, pts in by_source.items():
        rx = avg_ranks([p[0] for p in pts])
        ry = avg_ranks([p[1] for p in pts])
        ref = np.corrcoef(rx, ry)[0, 1]
        assert abs(got[src] - ref) < 1e-4, (src, got[src], ref)
