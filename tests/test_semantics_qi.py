"""m22-style SEMANTIC invariants for the round-6 qi-suite
(incremental dedup, snapshot diffs, OLS/ACF, skew and integrity
audits), continuing the tests/test_semantics_q*.py program:
first-principles laws and python re-derivations the Spark==DuckDB
hash cannot check.

Keys covered: qi01-qi28 (all 28)."""

import itertools
from collections import defaultdict

import pytest

from pyspark_distributed_kmodes_spark.registry import load_all


@pytest.fixture(scope="module")
def reg():
    return load_all()


def test_qi01_incremental_tiles_full(spark, sf_dir, reg):
    """Incremental edges = base-base + delta-touching, equal to the
    full recompute with nothing missing or extra."""
    r = reg["qi01_incremental_neardup_edges"].fn(spark, sf_dir).collect()[0]
    assert r.incremental_complete
    assert r.n_missing == 0 and r.n_extra == 0
    assert r.n_base_base + r.n_delta_touching == r.n_incremental == r.n_full


def test_qi02_snapshot_diff_conservation(spark, sf_dir, reg):
    """Diff algebra: v2 = added + changed + unchanged; v1 = deleted +
    changed + unchanged."""
    r = reg["qi02_snapshot_diff_timetravel"].fn(spark, sf_dir).collect()[0]
    assert r.n_v2 == r.n_added + r.n_changed + r.n_unchanged
    assert r.n_v1 == r.n_deleted + r.n_changed + r.n_unchanged


def test_qi03_multimodal_partitions_docs(spark, sf_dir, reg, duck):
    rows = reg["qi03_multimodal_join_pipeline"].fn(spark, sf_dir).collect()
    n_docs = duck.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    assert sum(r.n_docs for r in rows) == n_docs


def test_qi04_halves_tile_and_gap_consistent(spark, sf_dir, reg, duck):
    rows = reg["qi04_subsample_stability"].fn(spark, sf_dir).collect()
    n = duck.execute("SELECT COUNT(*) FROM lineitem").fetchone()[0]
    assert sum(r.n for r in rows) == n and len(rows) == 2
    gap = abs(rows[0].mean_price - rows[1].mean_price)
    assert all(abs(r.price_gap - gap) < 1e-4 for r in rows)


def test_qi05_rollup_merge_agrees(spark, sf_dir, reg):
    for r in reg["qi05_grouped_quantile_rollup"].fn(spark, sf_dir).collect():
        assert r.merged_agrees and r.p50 <= r.p90


def test_qi06_r2_bounds(spark, sf_dir, reg):
    rows = reg["qi06_grouped_ols_regression"].fn(spark, sf_dir).collect()
    assert rows and all(0.0 <= r.r2 <= 1.0 for r in rows)


def test_qi07_jaccard_law(spark, sf_dir, reg):
    for r in reg["qi07_audience_overlap"].fn(spark, sf_dir).collect():
        assert r.n_both <= min(r.n_a, r.n_b)
        assert abs(r.jaccard - r.n_both / (r.n_a + r.n_b - r.n_both)) < 1e-5


def test_qi08_rfm_partitions_customers(spark, sf_dir, reg, duck):
    rows = reg["qi08_rfm_segments"].fn(spark, sf_dir).collect()
    n = duck.execute("SELECT COUNT(DISTINCT o_custkey) FROM orders").fetchone()[0]
    assert sum(r.n_customers for r in rows) == n
    assert all(1 <= r.r_score <= 5 and 1 <= r.f_score <= 5 and 1 <= r.m_score <= 5
               for r in rows)


def test_qi09_mi_cells_tile_lineitem(spark, sf_dir, reg, duck):
    rows = reg["qi09_mutual_information"].fn(spark, sf_dir).collect()
    n = duck.execute("SELECT COUNT(*) FROM lineitem").fetchone()[0]
    assert sum(r.n_xy for r in rows) == n


def test_qi10_lev_ordering(spark, sf_dir, reg):
    for r in reg["qi10_levenshtein_blocked_join"].fn(spark, sf_dir).collect():
        assert r.n_close <= r.n_candidate_pairs
        assert 0 <= r.min_lev <= r.avg_lev


def test_qi11_cusum_bounds(spark, sf_dir, reg):
    r = reg["qi11_cusum_changepoint"].fn(spark, sf_dir).collect()[0]
    assert r.cusum_peak >= 0 and r.n_days > 0 and r.daily_mean > 0


def test_qi12_acf_bounds(spark, sf_dir, reg):
    rows = reg["qi12_autocorrelation"].fn(spark, sf_dir).collect()
    assert rows
    assert all(abs(r.acf) <= 1 + 1e-9 and r.n_pairs > 0 for r in rows)


def test_qi13_gains_prefix_sum_to_one(spark, sf_dir, reg):
    rows = sorted(reg["qi13_decile_gains"].fn(spark, sf_dir).collect(),
                  key=lambda r: r.decile)
    pref = list(itertools.accumulate(r.capture_rate for r in rows))
    assert all(abs(p - r.cum_capture) < 1e-4 for p, r in zip(pref, rows))
    assert abs(rows[-1].cum_capture - 1.0) < 1e-4


def test_qi14_idempotence_partition(spark, sf_dir, reg):
    for r in reg["qi14_normalization_idempotence"].fn(spark, sf_dir).collect():
        assert r.idempotent and r.n_not_idempotent == 0
        assert r.n_distinct_norm + r.n_collisions == r.n_docs


def test_qi15_topk_merge_and_order(spark, sf_dir, reg):
    rows = sorted(reg["qi15_mergeable_topk"].fn(spark, sf_dir).collect(),
                  key=lambda r: r.rank)
    assert all(r.merge_agrees for r in rows)
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert all(a.o_totalprice >= b.o_totalprice for a, b in zip(rows, rows[1:]))


def test_qi16_null_profile_rederived(spark, sf_dir, reg, duck):
    rows = reg["qi16_null_profile"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        n, nn = duck.execute(
            f"SELECT COUNT(*), SUM(CASE WHEN {r.column_name} IS NULL THEN 1 ELSE 0 END)"
            f" FROM {r.table_name}"
        ).fetchone()
        assert (r.n_rows, r.n_null) == (n, nn or 0)


def test_qi17_hhi_laws(spark, sf_dir, reg):
    """HHI laws: top1^2 <= HHI <= 1 and top1 >= 1/n."""
    for r in reg["qi17_hhi_concentration"].fn(spark, sf_dir).collect():
        assert 0 < r.hhi <= 1
        assert r.top1_share ** 2 <= r.hhi + 1e-9
        assert r.top1_share >= 1.0 / r.n_suppliers - 1e-9


def test_qi18_salted_agrees_rederived(spark, sf_dir, reg, duck):
    exp = dict(duck.execute("SELECT l_returnflag, COUNT(*) FROM lineitem GROUP BY 1").fetchall())
    for r in reg["qi18_salted_agg_audit"].fn(spark, sf_dir).collect():
        assert r.salted_agrees and r.n == exp[r.l_returnflag]


def test_qi19_exactly_once_rederived(spark, sf_dir, reg, duck):
    exp = dict(duck.execute("SELECT event_type, COUNT(*) FROM events GROUP BY 1").fetchall())
    for r in reg["qi19_replay_dedup_idempotency"].fn(spark, sf_dir).collect():
        assert r.exactly_once and r.n == exp[r.event_type]


def test_qi20_gap_run_bounds(spark, sf_dir, reg):
    for r in reg["qi20_longest_gap_runs"].fn(spark, sf_dir).collect():
        assert r.longest_gap <= r.n_zero_days <= r.n_days


def test_qi21_cardinality_estimate_exact(spark, sf_dir, reg):
    r = reg["qi21_join_cardinality_audit"].fn(spark, sf_dir).collect()[0]
    assert r.estimate_exact and r.predicted == r.actual


def test_qi22_skew_profile_laws(spark, sf_dir, reg):
    for r in reg["qi22_key_skew_profile"].fn(spark, sf_dir).collect():
        assert r.p99_freq <= r.max_freq
        assert abs(r.top1_share - r.max_freq / r.n_rows) < 1e-5
        assert r.n_keys <= r.n_rows


def test_qi23_compaction_bounds(spark, sf_dir, reg):
    for r in reg["qi23_latest_n_compaction"].fn(spark, sf_dir).collect():
        assert r.n_kept + r.n_dropped <= r.n_total
        assert r.n_users <= r.n_kept


def test_qi24_bounce_rate_law(spark, sf_dir, reg):
    for r in reg["qi24_session_bounce_rate"].fn(spark, sf_dir).collect():
        assert r.n_bounces <= r.n_sessions
        assert abs(r.bounce_rate - r.n_bounces / r.n_sessions) < 1e-5


def test_qi25_integrity_intact(spark, sf_dir, reg):
    rows = reg["qi25_referential_integrity"].fn(spark, sf_dir).collect()
    assert rows
    assert all(r.intact and r.n_orphans == 0 and r.coverage == 1.0 for r in rows)


def test_qi26_asof_delta_nonnegative(spark, sf_dir, reg):
    rows = reg["qi26_nearest_event_join"].fn(spark, sf_dir).collect()
    assert rows and all(r.delta_us >= 0 for r in rows)


def test_qi27_versions_partition_sources(spark, sf_dir, reg, duck):
    exp = {
        s: (n, c)
        for s, n, c in duck.execute(
            "SELECT source, COUNT(*), SUM(n_chars) FROM documents GROUP BY 1"
        ).fetchall()
    }
    for r in reg["qi27_schema_evolution"].fn(spark, sf_dir).collect():
        assert r.n_v1 + r.n_v2 == r.n_docs
        assert (r.n_docs, r.chars_sum) == exp[r.source]


def test_qi28_churn_rate_law(spark, sf_dir, reg):
    for r in reg["qi28_churn_by_segment"].fn(spark, sf_dir).collect():
        assert r.n_churned <= r.n_active_customers
        assert abs(r.churn_rate - r.n_churned / r.n_active_customers) < 1e-5
