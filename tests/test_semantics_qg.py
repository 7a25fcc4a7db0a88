"""m22-style SEMANTIC invariants for the round-5 qg-suite (audit
twins, reconciliation, bootstrap, graph rows), continuing the
tests/test_semantics_q*.py program: first-principles laws and python
re-derivations the Spark==DuckDB hash cannot check.

Keys covered: qg01-qg23 (all 23)."""

import itertools
from collections import defaultdict

import pytest

from pyspark_distributed_kmodes_spark.registry import load_all


@pytest.fixture(scope="module")
def reg():
    return load_all()


def test_qg01_ppr_and_teleport_are_distributions(spark, sf_dir, reg):
    rows = reg["qg01_personalized_pagerank"].fn(spark, sf_dir).collect()
    assert abs(sum(r.ppr for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.teleport for r in rows) - 1.0) < 1e-4
    assert all(r.ppr >= 0 for r in rows)


def test_qg02_reconcile_partitions(spark, sf_dir, reg):
    """Incremental-vs-full reconcile: survivors agree + differ tile the
    fingerprint set; dropped = docs - fingerprints."""
    r = reg["qg02_incremental_dedup_reconcile"].fn(spark, sf_dir).collect()[0]
    assert r.n_same_survivor + r.n_differ == r.n_fingerprints
    assert r.n_dropped == r.n_docs - r.n_fingerprints


def test_qg03_shards_lossless(spark, sf_dir, reg, duck):
    rows = reg["qg03_shard_reconciliation"].fn(spark, sf_dir).collect()
    n_docs, chars = duck.execute("SELECT COUNT(*), SUM(n_chars) FROM documents").fetchone()
    assert all(r.loss_free for r in rows)
    assert sum(r.n_docs for r in rows) == n_docs
    assert sum(r.chars_sum for r in rows) == chars


def test_qg04_recall_law(spark, sf_dir, reg):
    r = reg["qg04_lsh_recall_audit"].fn(spark, sf_dir).collect()[0]
    assert abs(r.recall - r.n_hits / r.n_true_pairs) < 1e-6
    assert r.n_hits <= min(r.n_true_pairs, r.n_candidates)


def test_qg05_agreement_bounded(spark, sf_dir, reg):
    r = reg["qg05_minhash_stability"].fn(spark, sf_dir).collect()[0]
    assert 0 <= r.n_agree <= r.n_docs


def test_qg06_qg07_bounds_hold_and_exact_rederived(spark, sf_dir, reg, duck):
    """The approx-family audits must themselves pass, and qg07's exact
    side re-derives from the raw table."""
    assert all(r.within_bound for r in
               reg["qg06_approx_percentile_audit"].fn(spark, sf_dir).collect())
    exp = dict(duck.execute(
        "SELECT o_orderpriority, COUNT(DISTINCT o_custkey) FROM orders GROUP BY 1"
    ).fetchall())
    for r in reg["qg07_hll_error_audit"].fn(spark, sf_dir).collect():
        assert r.within_bound
        assert r.exact_distinct == exp[r.priority]


def test_qg08_winsorized_mean_between_clips(spark, sf_dir, reg):
    """Winsorizing clips to [p05, p95], so the winsorized mean must lie
    inside that interval."""
    for r in reg["qg08_winsorized_stats"].fn(spark, sf_dir).collect():
        assert r.p05 <= r.winsorized_mean <= r.p95
        assert r.n_clipped_low + r.n_clipped_high <= r.n


def test_qg09_vocab_growth_prefix_sum(spark, sf_dir, reg):
    rows = sorted(reg["qg09_vocab_growth"].fn(spark, sf_dir).collect(),
                  key=lambda r: r.bucket)
    pref = list(itertools.accumulate(r.n_new_grams for r in rows))
    assert all(p == r.cum_vocab for p, r in zip(pref, rows))


def test_qg10_repetition_counts_rederived(spark, sf_dir, reg, duck):
    exp = dict(duck.execute("SELECT source, COUNT(*) FROM documents GROUP BY 1").fetchall())
    for r in reg["qg10_repetition_audit"].fn(spark, sf_dir).collect():
        assert r.n_docs == exp[r.source]
        assert 0 <= r.n_flagged <= r.n_docs
        assert r.mean_rep_ratio >= 0


def test_qg11_bin_edges_law(spark, sf_dir, reg):
    for r in reg["qg11_pair_similarity_histogram"].fn(spark, sf_dir).collect():
        assert abs(r.bin_lo - r.bin * 0.05) < 1e-9
        assert r.n_pairs >= 1


def test_qg12_match_counts_dominate_doc_counts(spark, sf_dir, reg, duck):
    exp = dict(duck.execute("SELECT source, COUNT(*) FROM documents GROUP BY 1").fetchall())
    for r in reg["qg12_pattern_scan"].fn(spark, sf_dir).collect():
        assert r.n_matches >= r.n_docs_with
        assert r.n_docs_with <= exp[r.source]


def test_qg13_retention_matrix_laws(spark, sf_dir, reg):
    for r in reg["qg13_retention_matrix"].fn(spark, sf_dir).collect():
        assert r.n_active <= r.cohort_size
        assert abs(r.retention - r.n_active / r.cohort_size) < 1e-5
        if r.offset_weeks == 0:
            assert r.n_active == r.cohort_size


def test_qg14_bootstrap_replicates_contiguous(spark, sf_dir, reg):
    rows = reg["qg14_poisson_bootstrap"].fn(spark, sf_dir).collect()
    assert sorted(r.b for r in rows) == list(range(len(rows)))
    assert all(r.boot_mean > 0 and r.n_drawn > 0 for r in rows)


def test_qg15_chi2_parts_rederived(spark, sf_dir, reg, duck):
    exp = dict(duck.execute("SELECT event_type, COUNT(*) FROM events GROUP BY 1").fetchall())
    for r in reg["qg15_chi_square_independence"].fn(spark, sf_dir).collect():
        assert r.chi2_part >= 0
        assert r.n_obs == exp[r.event_type]


def test_qg16_pearson_bounds(spark, sf_dir, reg, duck):
    n = duck.execute("SELECT COUNT(*) FROM lineitem").fetchone()[0]
    rows = reg["qg16_exact_corr_matrix"].fn(spark, sf_dir).collect()
    assert all(abs(r.pearson) <= 1 and r.n == n for r in rows)
    assert len({(r.col_x, r.col_y) for r in rows}) == len(rows)


def test_qg17_ab_rates_consistent(spark, sf_dir, reg):
    r = reg["qg17_two_proportion_ab"].fn(spark, sf_dir).collect()[0]
    assert abs(r.rate_ctl - r.conv_ctl / r.n_ctl) < 1e-6
    assert abs(r.rate_trt - r.conv_trt / r.n_trt) < 1e-6
    assert abs(r.lift - (r.rate_trt - r.rate_ctl)) < 1e-6


def test_qg18_compressibility_ratio(spark, sf_dir, reg):
    for r in reg["qg18_char_ngram_compressibility"].fn(spark, sf_dir).collect():
        assert r.distinct_grams <= r.total_grams
        assert abs(r.distinct_ratio - r.distinct_grams / r.total_grams) < 1e-5


def test_qg19_novelty_bounds(spark, sf_dir, reg):
    for r in reg["qg19_snapshot_novelty"].fn(spark, sf_dir).collect():
        assert 0.0 <= r.mean_novelty <= 1.0
        assert r.new_shingles <= r.total_shingles


def test_qg20_streaks_positive(spark, sf_dir, reg):
    rows = reg["qg20_activity_streaks"].fn(spark, sf_dir).collect()
    assert rows and all(r.streak_days >= 1 and r.n_users >= 1 for r in rows)


def test_qg21_drift_split_partitions_labels(spark, sf_dir, reg, duck):
    """The A/B snapshot split must partition each label's vectors."""
    exp = dict(duck.execute("SELECT label, COUNT(*) FROM embeddings GROUP BY 1").fetchall())
    for r in reg["qg21_embedding_drift"].fn(spark, sf_dir).collect():
        assert r.centroid_l2_drift >= 0
        assert r.n_a + r.n_b == exp[r.label]


def test_qg22_cluster_size_histogram_laws(spark, sf_dir, reg, duck):
    n_docs = duck.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    rows = reg["qg22_dup_cluster_sizes"].fn(spark, sf_dir).collect()
    assert all(r.n_docs == r.cluster_size * r.n_clusters for r in rows)
    assert abs(sum(r.corpus_share for r in rows)
               - sum(r.n_docs for r in rows) / n_docs) < 1e-6


def test_qg23_fd_violation_rate_law(spark, sf_dir, reg):
    for r in reg["qg23_functional_dependency"].fn(spark, sf_dir).collect():
        assert 0 <= r.n_violating <= r.n_groups
        assert abs(r.violation_rate - r.n_violating / r.n_groups) < 1e-5
