"""m22-style SEMANTIC invariants for the round-4 qd-suite (graph,
skyline, attribution, robust-stats rows), continuing the program of
tests/test_semantics_q*.py: first-principles laws and python
re-derivations the Spark==DuckDB hash cannot check.

Keys covered: qd01-qd16 (all 16)."""

import bisect
from collections import defaultdict

import pytest

from pyspark_distributed_kmodes_spark.registry import load_all


@pytest.fixture(scope="module")
def reg():
    return load_all()


def test_qd01_pagerank_is_a_distribution(spark, sf_dir, reg):
    """PageRank sums to 1 over the graph, every score is positive, and
    every node in the result has at least one edge."""
    rows = reg["qd01_neardup_pagerank"].fn(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r.pagerank for r in rows) - 1.0) < 1e-4
    assert all(r.pagerank > 0 for r in rows)
    assert all(r.degree >= 1 for r in rows)


def test_qd02_buckets_partition_lineitem(spark, sf_dir, reg, duck):
    """Equi-depth bucket x returnflag cells tile the lineitem table."""
    rows = reg["qd02_equidepth_bucket_join"].fn(spark, sf_dir).collect()
    n = duck.execute("SELECT COUNT(*) FROM lineitem").fetchone()[0]
    assert sum(r.n_items for r in rows) == n


def test_qd03_windows_are_hour_aligned(spark, sf_dir, reg, duck):
    """Watermark twin: window starts are exact hour boundaries and kept
    rows never exceed the stream's input."""
    rows = reg["qd03_watermark_batch_twin"].fn(spark, sf_dir).collect()
    n = duck.execute("SELECT COUNT(*) FROM events").fetchone()[0]
    assert sum(r.n_kept for r in rows) <= n
    assert all(r.hour_start.minute == 0 and r.hour_start.second == 0 for r in rows)


def test_qd04_zero_distance_means_equal_heads(spark, sf_dir, reg, duck):
    """Linkage gate: edit_dist 0 must mean the 48-char comparison heads
    are byte-identical (the blocked comparison's own contract), pairs
    are canonically ordered, distances non-negative."""
    rows = reg["qd04_record_linkage"].fn(spark, sf_dir).collect()
    texts = dict(duck.execute("SELECT doc_id, text FROM documents").fetchall())
    assert all(r.doc_a < r.doc_b for r in rows)
    assert all(r.edit_dist >= 0 for r in rows)
    for r in rows:
        if r.edit_dist == 0:
            assert texts[r.doc_a][:48] == texts[r.doc_b][:48]


def test_qd05_coverage_dominates_longest(spark, sf_dir, reg):
    """Coalesced intervals: total coverage >= the longest single
    island > 0, and at least one island per user."""
    for r in reg["qd05_interval_coalesce"].fn(spark, sf_dir).collect():
        assert r.covered_us >= r.longest_us > 0
        assert r.n_intervals >= 1


def test_qd06_skyline_rederived_exactly(spark, sf_dir, reg, duck):
    """Full python re-derivation of the 2-D skyline: a doc is on the
    frontier iff NO document strictly dominates it in both coordinates
    — soundness AND completeness, over the whole corpus."""
    rows = reg["qd06_pareto_frontier"].fn(spark, sf_dir).collect()
    texts = dict(duck.execute("SELECT doc_id, text FROM documents").fetchall())
    pts = {d: (len(t.split(" ")), len(set(t.split(" ")))) for d, t in texts.items()}
    frontier = {
        d
        for d, (w, v) in pts.items()
        if not any(pw > w and pv > v for pw, pv in pts.values())
    }
    assert {r.doc_id for r in rows} == frontier
    assert all((r.n_words, r.n_distinct) == pts[r.doc_id] for r in rows)


def test_qd07_bigrams_have_support(spark, sf_dir, reg):
    rows = reg["qd07_bigram_pmi"].fn(spark, sf_dir).collect()
    assert rows
    assert all(r.n_pair > 0 for r in rows)
    assert all(len(r.bigram.split(" ")) == 2 for r in rows)


def test_qd08_first_and_last_touch_conserve_value(spark, sf_dir, reg):
    """Attribution conservation: first-touch and last-touch each assign
    100% of the same conversions, so their totals (value and users)
    must be equal."""
    tot = defaultdict(float)
    users = defaultdict(int)
    for r in reg["qd08_touch_attribution"].fn(spark, sf_dir).collect():
        tot[r.attribution] += r.attributed_value
        users[r.attribution] += r.n_users
    assert set(tot) == {"first", "last"}
    assert abs(tot["first"] - tot["last"]) < 1e-6
    assert users["first"] == users["last"]


def test_qd09_qd11_token_totals_agree(spark, sf_dir, reg):
    """Cross-QUERY identity: qd09's per-source token totals, qd11's
    weighted-median total weights, and qc09's budget n_tokens are the
    same physical quantity — all three must agree exactly."""
    g = {r.source: r.total_tokens for r in
         reg["qd09_gini_concentration"].fn(spark, sf_dir).collect()}
    w = {r.source: r.total_weight for r in
         reg["qd11_weighted_median"].fn(spark, sf_dir).collect()}
    b = {r.source: r.n_tokens for r in
         reg["qc09_token_budget_allocation"].fn(spark, sf_dir).collect()}
    assert g == w == b
    for r in reg["qd09_gini_concentration"].fn(spark, sf_dir).collect():
        assert 0.0 <= r.gini < 1.0


def test_qd10_ks_bounds(spark, sf_dir, reg):
    for r in reg["qd10_ks_two_sample"].fn(spark, sf_dir).collect():
        assert 0.0 <= r.ks_stat <= 1.0
        assert r.n_a > 0 and r.n_b > 0


def test_qd12_gapfill_grid_and_betweenness(spark, sf_dir, reg):
    """Gap-fill laws: the hourly grid is contiguous, and every
    interpolated value lies between its bracketing known values."""
    rows = sorted(reg["qd12_gapfill_interpolate"].fn(spark, sf_dir).collect(),
                  key=lambda r: r.hour_start)
    assert all(
        (b.hour_start - a.hour_start).total_seconds() == 3600
        for a, b in zip(rows, rows[1:])
    )
    known = [(i, r.revenue_filled) for i, r in enumerate(rows) if r.was_missing == 0]
    kidx = [i for i, _ in known]
    assert known, "need at least one observed hour"
    for i, r in enumerate(rows):
        if r.was_missing == 1:
            j = bisect.bisect_left(kidx, i)
            vals = [v for v in (
                known[j - 1][1] if j > 0 else None,
                known[j][1] if j < len(known) else None,
            ) if v is not None]
            assert min(vals) - 1e-6 <= r.revenue_filled <= max(vals) + 1e-6


def test_qd13_rho_bounds(spark, sf_dir, reg):
    rows = reg["qd13_spearman_rank"].fn(spark, sf_dir).collect()
    assert rows
    assert all(abs(r.spearman_rho) <= 1.0 for r in rows)


def test_qd14_anomaly_flag_is_a_threshold(spark, sf_dir, reg):
    """is_anomaly must be a pure |zscore| threshold (same law as
    qc05)."""
    rows = reg["qd14_rolling_anomaly"].fn(spark, sf_dir).collect()
    outs = [abs(r.zscore) for r in rows if r.is_anomaly == 1]
    ins = [abs(r.zscore) for r in rows if r.is_anomaly == 0]
    if outs and ins:
        assert max(ins) < min(outs)


def test_qd15_wilson_brackets_the_rate(spark, sf_dir, reg):
    """Wilson law: lo <= p-hat <= hi, all in [0,1], and the point rate
    is n_dup/n_docs exactly."""
    for r in reg["qd15_duprate_wilson"].fn(spark, sf_dir).collect():
        assert 0.0 <= r.wilson_lo <= r.dup_rate <= r.wilson_hi <= 1.0
        assert abs(r.dup_rate - r.n_dup / r.n_docs) < 1e-6


def test_qd16_profile_rederived(spark, sf_dir, reg, duck):
    """Column profiles re-derived straight from the source tables for
    every profiled column with a recognizable table prefix."""
    tbl = {"o_": "orders", "c_": "customer", "l_": "lineitem"}
    rows = reg["qd16_column_profile"].fn(spark, sf_dir).collect()
    checked = 0
    for r in rows:
        t = tbl.get(r.col_name[:2])
        if not t:
            continue
        n, nn, nd = duck.execute(
            f"SELECT COUNT(*), SUM(CASE WHEN {r.col_name} IS NULL THEN 1 ELSE 0 END),"
            f" COUNT(DISTINCT {r.col_name}) FROM {t}"
        ).fetchone()
        assert (r.n_rows, r.n_null, r.n_distinct) == (n, nn or 0, nd)
        checked += 1
    assert checked > 0
