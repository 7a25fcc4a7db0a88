"""m22-style SEMANTIC invariants for the round-8 qk-suite
(nonparametric statistics, distribution distances, index numbers,
corpus audits), completing the tests/test_semantics_q*.py program
across every driver-certified suite through round 8: first-principles
laws and python re-derivations the Spark==DuckDB hash cannot check.

Keys covered: qk01-qk50 (all 50)."""

import math
from collections import defaultdict

import pytest

from pyspark_distributed_kmodes_spark.registry import load_all


@pytest.fixture(scope="module")
def reg():
    return load_all()


def test_qk01_friedman_bound(spark, sf_dir, reg):
    r = reg["qk01_friedman_test"].fn(spark, sf_dir).collect()[0]
    assert 0 <= r.friedman_chi2 <= r.n_blocks * (r.n_treatments - 1)


def test_qk02_cochran_nonnegative(spark, sf_dir, reg):
    assert reg["qk02_cochran_q"].fn(spark, sf_dir).collect()[0].cochran_q >= 0


def test_qk03_kw_bound(spark, sf_dir, reg):
    r = reg["qk03_kruskal_wallis"].fn(spark, sf_dir).collect()[0]
    assert 0 <= r.h_stat <= r.n - 1


def test_qk04_brier_decomposition_identity(spark, sf_dir, reg):
    """Murphy decomposition: Brier = reliability - resolution +
    uncertainty, with resolution <= uncertainty."""
    r = reg["qk04_brier_decomposition"].fn(spark, sf_dir).collect()[0]
    assert abs(r.brier_score - (r.reliability - r.resolution + r.uncertainty)) < 1e-6
    assert 0 <= r.brier_score <= 1
    assert r.resolution <= r.uncertainty + 1e-9


def test_qk05_w_bounds(spark, sf_dir, reg):
    assert 0 <= reg["qk05_kendalls_w"].fn(spark, sf_dir).collect()[0].kendalls_w <= 1


def test_qk06_sign_counts(spark, sf_dir, reg):
    r = reg["qk06_sign_test"].fn(spark, sf_dir).collect()[0]
    assert r.n_up + r.n_down <= r.n_pairs


def test_qk07_hedges_shrinks_cohens(spark, sf_dir, reg):
    """Hedges' correction shrinks |d| toward zero without changing its
    sign."""
    r = reg["qk07_effect_size_d"].fn(spark, sf_dir).collect()[0]
    assert abs(r.hedges_g) <= abs(r.cohens_d)
    assert (r.hedges_g < 0) == (r.cohens_d < 0)


def test_qk08_chebyshev_holds(spark, sf_dir, reg):
    """The empirical coverage can never violate Chebyshev's bound."""
    for r in reg["qk08_chebyshev_coverage"].fn(spark, sf_dir).collect():
        assert r.frac_within >= r.chebyshev_lower - 1e-9


def test_qk09_bowley_bounds(spark, sf_dir, reg):
    """Bowley skewness is bounded in [-1, 1] by construction."""
    for r in reg["qk09_bowley_moors"].fn(spark, sf_dir).collect():
        assert -1 <= r.bowley_skew <= 1


def test_qk10_hurst_bounds(spark, sf_dir, reg):
    assert 0 <= reg["qk10_hurst_exponent"].fn(spark, sf_dir).collect()[0].hurst_h <= 1


def test_qk11_split_nonempty(spark, sf_dir, reg):
    r = reg["qk11_best_single_split"].fn(spark, sf_dir).collect()[0]
    assert r.n_left > 0 and r.n_right > 0 and r.bss >= 0


def test_qk12_rmse_dominates_mae(spark, sf_dir, reg):
    r = reg["qk12_seasonal_naive_backtest"].fn(spark, sf_dir).collect()[0]
    assert r.rmse >= r.mae >= 0 and r.mape >= 0


def test_qk13_stationary_is_distribution(spark, sf_dir, reg):
    rows = reg["qk13_markov_stationary"].fn(spark, sf_dir).collect()
    assert abs(sum(r.stationary_prob for r in rows) - 1.0) < 1e-4
    assert all(r.stationary_prob >= 0 for r in rows)


def test_qk14_migration_bounded_by_users(spark, sf_dir, reg, duck):
    rows = reg["qk14_activity_migration"].fn(spark, sf_dir).collect()
    n = duck.execute("SELECT COUNT(DISTINCT user_id) FROM events").fetchone()[0]
    assert sum(r.n_users for r in rows) <= n


def test_qk15_pooled_ttr_below_segmental(spark, sf_dir, reg):
    """Pooling segments can only lose type diversity per token, so
    pooled TTR <= mean segmental TTR."""
    for r in reg["qk15_lexical_diversity"].fn(spark, sf_dir).collect():
        assert 0 < r.pooled_ttr <= 1 and 0 < r.segmental_ttr <= 1
        assert r.pooled_ttr <= r.segmental_ttr + 1e-9


def test_qk16_casing_ratios(spark, sf_dir, reg):
    for r in reg["qk16_casing_profile"].fn(spark, sf_dir).collect():
        assert 0 <= r.upper_ratio <= 1 and 0 <= r.titlecase_ratio <= 1


def test_qk17_dup_mass_monotone(spark, sf_dir, reg):
    """Raising the document-frequency threshold can only shrink the
    duplicated mass."""
    rows = sorted(reg["qk17_ngram_dup_mass"].fn(spark, sf_dir).collect(),
                  key=lambda r: r.df_threshold)
    assert all(0 <= r.dup_mass <= 1 and 0 <= r.dup_vocab_share <= 1 for r in rows)
    assert all(a.dup_mass >= b.dup_mass for a, b in zip(rows, rows[1:]))


def test_qk18_hapax_bounds(spark, sf_dir, reg):
    for r in reg["qk18_hapax_rate"].fn(spark, sf_dir).collect():
        assert r.hapax <= r.vocab <= r.tokens
        assert abs(r.hapax_vocab_share - r.hapax / r.vocab) < 1e-5


def test_qk19_observed_subset_of_full(spark, sf_dir, reg, duck):
    """The observed filtered scan can never exceed the unfiltered group
    counts."""
    exp = dict(duck.execute("SELECT l_returnflag, COUNT(*) FROM lineitem GROUP BY 1").fetchall())
    for r in reg["qk19_observed_scan_metrics"].fn(spark, sf_dir).collect():
        assert 0 < r.n_lines <= exp[r.l_returnflag]


def test_qk20_concurrency_positive(spark, sf_dir, reg):
    rows = reg["qk20_peak_concurrency"].fn(spark, sf_dir).collect()
    assert rows and all(r.active_sessions >= 1 for r in rows)


def test_qk21_every_level_reassembles_total(spark, sf_dir, reg, duck):
    """Each grouping-set level partitions the same order population."""
    rows = reg["qk21_grouping_id_decode"].fn(spark, sf_dir).collect()
    n = duck.execute("SELECT COUNT(*) FROM orders").fetchone()[0]
    per = defaultdict(int)
    for r in rows:
        per[r.level] += r.n_orders
    assert per and all(v == n for v in per.values())


def test_qk22_topk_jaccard_bounds(spark, sf_dir, reg):
    for r in reg["qk22_metric_agreement"].fn(spark, sf_dir).collect():
        assert 0 <= r.jaccard_topk <= 1 and r.n_common >= 0


def test_qk23_xml_lossless(spark, sf_dir, reg, duck):
    exp = {
        l: (n, c)
        for l, n, c in duck.execute(
            "SELECT lang, COUNT(*), SUM(n_chars) FROM documents GROUP BY 1"
        ).fetchall()
    }
    for r in reg["qk23_xml_roundtrip"].fn(spark, sf_dir).collect():
        assert (r.n_docs, r.chars_total) == exp[r.lang]


def test_qk24_quarantine_partitions(spark, sf_dir, reg):
    r = reg["qk24_csv_malformed_audit"].fn(spark, sf_dir).collect()[0]
    assert r.n_corrupt + r.n_clean == r.n_rows


def test_qk25_codec_lossless(spark, sf_dir, reg, duck):
    r = reg["qk25_parquet_codec_roundtrip"].fn(spark, sf_dir).collect()[0]
    n, rev = duck.execute("SELECT COUNT(*), SUM(o_totalprice) FROM orders").fetchone()
    assert r.n_rows == n and abs(r.revenue - rev) < 1


def test_qk26_provenance_rates(spark, sf_dir, reg, duck):
    exp = dict(duck.execute("SELECT source, COUNT(*) FROM documents GROUP BY 1").fetchall())
    for r in reg["qk26_dedup_provenance_bias"].fn(spark, sf_dir).collect():
        assert r.n_docs == exp[r.source]
        assert 0 <= r.n_removed <= r.n_docs
        assert abs(r.removal_rate - r.n_removed / r.n_docs) < 1e-5


def test_qk27_suppression_rates(spark, sf_dir, reg, duck):
    exp = dict(duck.execute("SELECT event_type, COUNT(*) FROM events GROUP BY 1").fetchall())
    for r in reg["qk27_rate_limit_audit"].fn(spark, sf_dir).collect():
        assert r.n_events == exp[r.event_type]
        assert r.n_suppressed <= r.n_events
        assert abs(r.suppression_rate - r.n_suppressed / r.n_events) < 1e-5


def test_qk28_per_active_law(spark, sf_dir, reg):
    for r in reg["qk28_cold_start_curve"].fn(spark, sf_dir).collect():
        assert abs(r.events_per_active - r.n_events / r.n_active_users) < 1e-4


def test_qk29_bucket_entropy_bounds(spark, sf_dir, reg):
    """Occupied <= possible; entropy <= log2(possible); the max bucket
    is at least the uniform load."""
    r = reg["qk29_lsh_bucket_balance"].fn(spark, sf_dir).collect()[0]
    assert r.n_occupied_buckets <= r.n_possible_buckets
    assert 0 <= r.entropy_bits <= math.log2(r.n_possible_buckets) + 1e-9
    assert r.max_over_uniform >= 1 - 1e-9


def test_qk30_pareto_bounds(spark, sf_dir, reg):
    r = reg["qk30_pareto_point"].fn(spark, sf_dir).collect()[0]
    assert 0 < r.users_frac_for_80pct <= 1
    assert 0 <= r.top_decile_event_share <= 1


def test_qk31_33_distances_nonnegative(spark, sf_dir, reg):
    r = reg["qk31_energy_distance"].fn(spark, sf_dir).collect()[0]
    assert r.energy_dist_sq >= 0 and r.energy_stat >= 0
    assert reg["qk32_wasserstein_distance"].fn(spark, sf_dir).collect()[0].wasserstein_1 >= 0
    assert reg["qk33_cramer_von_mises"].fn(spark, sf_dir).collect()[0].cvm_stat >= 0


def test_qk34_shift_share_identity(spark, sf_dir, reg):
    """The decomposition must reassemble the mean change exactly (the
    query reports its own identity gap — pin it near zero)."""
    r = reg["qk34_shift_share"].fn(spark, sf_dir).collect()[0]
    assert abs((r.mean_y2 - r.mean_y1)
               - (r.within_effect + r.mix_effect + r.interaction_effect)) < 1e-3
    assert abs(r.identity_gap) < 1e-3


def test_qk35_fisher_between_and_geometric(spark, sf_dir, reg):
    """Fisher = sqrt(Laspeyres x Paasche), hence between them."""
    r = reg["qk35_price_indices"].fn(spark, sf_dir).collect()[0]
    assert abs(r.fisher - math.sqrt(r.laspeyres * r.paasche)) < 1e-6
    assert min(r.laspeyres, r.paasche) - 1e-9 <= r.fisher <= max(r.laspeyres, r.paasche) + 1e-9


def test_qk36_abc_shares_sum(spark, sf_dir, reg):
    rows = reg["qk36_abc_classification"].fn(spark, sf_dir).collect()
    assert abs(sum(r.revenue_share for r in rows) - 1.0) < 1e-4


def test_qk37_purity_bounds(spark, sf_dir, reg, duck):
    exp = dict(duck.execute("SELECT source, COUNT(*) FROM documents GROUP BY 1").fetchall())
    for r in reg["qk37_source_lang_purity"].fn(spark, sf_dir).collect():
        assert 0 < r.purity <= 1
        assert r.lang_entropy_bits >= 0
        assert r.n_docs == exp[r.source]


def test_qk38_heatmap_shares(spark, sf_dir, reg):
    rows = reg["qk38_weekday_hour_heatmap"].fn(spark, sf_dir).collect()
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    assert all(1 <= r.dow <= 7 and 0 <= r.hr <= 23 for r in rows)


def test_qk39_lift_nonnegative(spark, sf_dir, reg):
    rows = reg["qk39_coengagement_lift"].fn(spark, sf_dir).collect()
    assert rows and all(r.lift >= 0 for r in rows)


def test_qk40_coverage_law(spark, sf_dir, reg):
    r = reg["qk40_interval_forecast_coverage"].fn(spark, sf_dir).collect()[0]
    assert r.n_covered <= r.n_days_scored
    assert abs(r.coverage_rate - r.n_covered / r.n_days_scored) < 1e-5
    assert r.mean_band_width >= 0


def test_qk41_blocking_cost_nonnegative(spark, sf_dir, reg):
    rows = reg["qk41_blocking_key_cost"].fn(spark, sf_dir).collect()
    assert rows and all(r.candidate_pairs >= 0 and r.n_buckets >= 1 for r in rows)


def test_qk42_corr_bounds(spark, sf_dir, reg):
    rows = reg["qk42_pooled_vs_within_corr"].fn(spark, sf_dir).collect()
    assert rows and all(abs(r.corr_xy) <= 1 for r in rows)


def test_qk43_halflife_positive_or_null(spark, sf_dir, reg):
    r = reg["qk43_retention_halflife"].fn(spark, sf_dir).collect()[0]
    assert r.n_points > 0
    assert r.halflife_days is None or r.halflife_days > 0


def test_qk44_dead_rate_law(spark, sf_dir, reg):
    for r in reg["qk44_dead_stock_audit"].fn(spark, sf_dir).collect():
        assert r.n_dead <= r.n_parts
        assert abs(r.dead_rate - r.n_dead / r.n_parts) < 1e-5


def test_qk45_calendar_reconciles(spark, sf_dir, reg, duck):
    r = reg["qk45_calendar_rollup_reconcile"].fn(spark, sf_dir).collect()[0]
    assert r.weekly_reconciles == 1 and r.monthly_reconciles == 1
    assert r.n_orders == duck.execute("SELECT COUNT(*) FROM orders").fetchone()[0]


def test_qk46_dup_buckets_tile(spark, sf_dir, reg, duck):
    rows = reg["qk46_dup_rate_by_length"].fn(spark, sf_dir).collect()
    n = duck.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    assert sum(r.n_docs for r in rows) == n
    for r in rows:
        assert r.n_duplicated <= r.n_docs
        assert abs(r.dup_rate - r.n_duplicated / r.n_docs) < 1e-5


def test_qk47_ci_brackets_median(spark, sf_dir, reg):
    r = reg["qk47_median_ci"].fn(spark, sf_dir).collect()[0]
    assert r.ci_lower <= r.median_lo_def <= r.ci_upper


def test_qk48_ss_nonnegative(spark, sf_dir, reg):
    r = reg["qk48_two_way_anova"].fn(spark, sf_dir).collect()[0]
    assert r.ss_priority >= 0 and r.ss_year >= 0 and r.ss_interaction >= 0


def test_qk49_drift_nonnegative(spark, sf_dir, reg):
    rows = reg["qk49_daily_wasserstein_drift"].fn(spark, sf_dir).collect()
    assert rows and all(r.w1_vs_corpus >= 0 and r.n_day_events > 0 for r in rows)


def test_qk50_powerlaw_alpha_bounds(spark, sf_dir, reg):
    """Hill's MLE alpha is > 1 by construction and its SE is
    alpha/sqrt(n) > 0."""
    r = reg["qk50_powerlaw_alpha"].fn(spark, sf_dir).collect()[0]
    assert r.alpha_hat > 1 and r.alpha_se > 0 and r.n_tail > 0
