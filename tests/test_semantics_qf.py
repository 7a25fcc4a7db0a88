"""m22-style SEMANTIC invariants for the round-5 qf-suite (drift,
calibration, reconciliation, centrality rows), continuing the
tests/test_semantics_q*.py program: first-principles laws and python
re-derivations the Spark==DuckDB hash cannot check.

Keys covered: qf01-qf27 (all 27)."""

import itertools
import math
from collections import Counter, defaultdict

import pytest

from pyspark_distributed_kmodes_spark.registry import load_all


@pytest.fixture(scope="module")
def reg():
    return load_all()


def test_qf01_psi_nonnegative(spark, sf_dir, reg):
    rows = reg["qf01_psi_drift"].fn(spark, sf_dir).collect()
    assert rows and all(r.psi >= 0 for r in rows)


def test_qf02_bigram_logprob_bounds(spark, sf_dir, reg):
    rows = reg["qf02_bigram_lm_logprob"].fn(spark, sf_dir).collect()
    assert rows
    assert all(r.avg_logprob < 0 and r.n_bigrams > 0 for r in rows)


def test_qf03_cluster_sizes_self_consistent(spark, sf_dir, reg):
    rows = reg["qf03_linkage_clusters"].fn(spark, sf_dir).collect()
    sizes = defaultdict(int)
    for r in rows:
        sizes[r.cluster] += 1
    assert all(sizes[r.cluster] == r.cluster_size for r in rows)


def test_qf04_harmonic_centrality_bound(spark, sf_dir, reg):
    """Each reached node contributes 1/dist <= 1, so centrality can
    never exceed the reach count."""
    for r in reg["qf04_harmonic_centrality"].fn(spark, sf_dir).collect():
        assert 0 < r.harmonic_centrality <= r.n_reached


def test_qf05_decay_counts_rederived(spark, sf_dir, reg, duck):
    exp = dict(duck.execute("SELECT user_id, COUNT(*) FROM events GROUP BY 1").fetchall())
    for r in reg["qf05_decayed_activity"].fn(spark, sf_dir).collect():
        assert r.n_events == exp[r.user_id]
        assert r.decayed_score > 0


def test_qf06_qnorm_stays_in_reference_range(spark, sf_dir, reg, duck):
    """Quantile normalization maps into the reference distribution's
    observed range."""
    lo, hi = duck.execute("SELECT MIN(n_chars), MAX(n_chars) FROM documents").fetchone()
    for r in reg["qf06_quantile_normalize"].fn(spark, sf_dir).collect():
        assert lo <= r.qnorm <= hi
        assert r.rk >= 1


def test_qf07_benford_law_exact(spark, sf_dir, reg):
    """The Benford reference column must BE log10(1 + 1/d), observed
    shares must sum to 1, chi-square terms non-negative."""
    rows = reg["qf07_benford_audit"].fn(spark, sf_dir).collect()
    assert abs(sum(r.observed_p for r in rows) - 1.0) < 1e-6
    for r in rows:
        assert abs(r.benford_p - math.log10(1 + 1 / r.digit)) < 1e-5
        assert r.chi2_term >= 0


def test_qf08_dau7_bounded_by_population(spark, sf_dir, reg, duck):
    n_users = duck.execute("SELECT COUNT(DISTINCT user_id) FROM events").fetchone()[0]
    for r in reg["qf08_sliding_dau"].fn(spark, sf_dir).collect():
        assert 0 < r.dau7 <= n_users


def test_qf09_sample_membership(spark, sf_dir, reg, duck):
    """Every sampled doc belongs to its claimed language, no doc twice,
    and pick provenance is one of the two documented paths."""
    rows = reg["qf09_stratified_min_sample"].fn(spark, sf_dir).collect()
    lang_of = dict(duck.execute("SELECT doc_id, lang FROM documents").fetchall())
    assert all(lang_of[r.doc_id] == r.lang for r in rows)
    assert len({r.doc_id for r in rows}) == len(rows)
    assert {r.picked_via for r in rows} <= {"stratum", "topup"}


def test_qf10_moment_laws(spark, sf_dir, reg, duck):
    """Counts re-derived; population stddev non-negative; excess
    kurtosis respects its universal -2 lower bound."""
    exp = dict(duck.execute("SELECT source, COUNT(*) FROM documents GROUP BY 1").fetchall())
    for r in reg["qf10_higher_moments"].fn(spark, sf_dir).collect():
        assert r.n == exp[r.source]
        assert r.stddev_pop >= 0
        assert r.kurtosis_excess >= -2


def test_qf11_transitions_row_stochastic(spark, sf_dir, reg):
    rows = reg["qf11_priority_transitions"].fn(spark, sf_dir).collect()
    tot_f = defaultdict(float)
    tot_n = defaultdict(int)
    for r in rows:
        tot_f[r.prev_priority] += r.frac
        tot_n[r.prev_priority] += r.n_transitions
    assert all(abs(v - 1.0) < 1e-4 for v in tot_f.values())
    assert all(abs(r.frac - r.n_transitions / tot_n[r.prev_priority]) < 1e-4 for r in rows)


def test_qf12_funnel_rates_consistent(spark, sf_dir, reg):
    r = reg["qf12_timeout_funnel"].fn(spark, sf_dir).collect()[0]
    assert abs(r.click_rate - r.n_click_24h / r.n_view) < 1e-5
    assert abs(r.purchase_rate - r.n_purchase_24h / r.n_click_24h) < 1e-5


def test_qf13_segment_share_law(spark, sf_dir, reg):
    for r in reg["qf13_segment_dedup"].fn(spark, sf_dir).collect():
        assert 0 <= r.n_shared <= r.n_segments
        assert abs(r.shared_frac - r.n_shared / r.n_segments) < 1e-5


def test_qf14_cumulative_users_prefix_sum(spark, sf_dir, reg, duck):
    """Cumulative uniques are the exact prefix sum of new users and
    finish at the distinct-user total."""
    rows = sorted(reg["qf14_cumulative_unique_users"].fn(spark, sf_dir).collect(),
                  key=lambda r: r.day_index)
    total = duck.execute("SELECT COUNT(DISTINCT user_id) FROM events").fetchone()[0]
    pref = list(itertools.accumulate(r.n_new_users for r in rows))
    assert all(p == r.cumulative_users for p, r in zip(pref, rows))
    assert rows[-1].cumulative_users == total


def test_qf15_percentile_ordering(spark, sf_dir, reg):
    for r in reg["qf15_interarrival_percentiles"].fn(spark, sf_dir).collect():
        assert r.p50_us <= r.p90_us <= r.p99_us


def test_qf16_latency_fracs_sum_to_one(spark, sf_dir, reg):
    per = defaultdict(float)
    for r in reg["qf16_ship_latency_buckets"].fn(spark, sf_dir).collect():
        per[r.l_returnflag] += r.frac
    assert per and all(abs(v - 1.0) < 1e-4 for v in per.values())


def test_qf17_agreement_rederived(spark, sf_dir, reg, duck):
    exp = dict(duck.execute("SELECT source, COUNT(*) FROM documents GROUP BY 1").fetchall())
    for r in reg["qf17_langid_agreement"].fn(spark, sf_dir).collect():
        assert r.n_tested == exp[r.source]
        assert abs(r.agreement_rate - r.n_agree / r.n_tested) < 1e-5


def test_qf18_contamination_is_a_threshold(spark, sf_dir, reg):
    rows = reg["qf18_ngram_decontamination"].fn(spark, sf_dir).collect()
    hot = [r.n_shared_ngrams for r in rows if r.contaminated == 1]
    cold = [r.n_shared_ngrams for r in rows if r.contaminated == 0]
    if hot and cold:
        assert min(hot) > max(cold)


def test_qf19_calibration_rate_law(spark, sf_dir, reg):
    for r in reg["qf19_score_calibration"].fn(spark, sf_dir).collect():
        assert abs(r.dup_rate - r.n_dup / r.n_docs) < 1e-5


def test_qf20_shard_shares_and_skew(spark, sf_dir, reg, duck):
    """Token shares form a distribution, skew is share x shard-count,
    shards partition the corpus."""
    rows = reg["qf20_shard_skew_audit"].fn(spark, sf_dir).collect()
    n_docs = duck.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-6
    assert all(abs(r.skew_vs_mean - r.token_share * len(rows)) < 1e-4 for r in rows)
    assert sum(r.n_docs for r in rows) == n_docs


def test_qf21_chi2_nonnegative(spark, sf_dir, reg):
    rows = reg["qf21_daily_mix_drift"].fn(spark, sf_dir).collect()
    assert rows and all(r.chi2 >= 0 for r in rows)


def test_qf22_deletion_conserves_rows(spark, sf_dir, reg, duck):
    """GDPR audit laws: nothing leaks and deleted + remaining
    reassembles the table."""
    r = reg["qf22_deletion_propagation"].fn(spark, sf_dir).collect()[0]
    n = duck.execute("SELECT COUNT(*) FROM events").fetchone()[0]
    assert r.n_leaked == 0
    assert r.n_rows_deleted + r.n_rows_remaining == n


def test_qf23_percentile_disc_membership(spark, sf_dir, reg, duck):
    """percentile_disc returns ACTUAL values of the group (the property
    that distinguishes it from interpolation), in order."""
    vals = defaultdict(set)
    for s, c in duck.execute("SELECT source, n_chars FROM documents").fetchall():
        vals[s].add(c)
    for r in reg["qf23_percentile_disc"].fn(spark, sf_dir).collect():
        assert r.p25_disc <= r.p50_disc <= r.p75_disc
        assert {r.p25_disc, r.p50_disc, r.p75_disc} <= vals[r.source]


def test_qf24_hist2d_tiles_corpus(spark, sf_dir, reg, duck):
    rows = reg["qf24_histogram_2d"].fn(spark, sf_dir).collect()
    n_docs = duck.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    assert abs(sum(r.frac for r in rows) - 1.0) < 1e-4
    assert sum(r.n_docs for r in rows) == n_docs


def test_qf25_reconciliation_rederived(spark, sf_dir, reg, duck):
    r = reg["qf25_order_reconciliation"].fn(spark, sf_dir).collect()[0]
    n_orders = duck.execute("SELECT COUNT(*) FROM orders").fetchone()[0]
    n_lines = duck.execute("SELECT COUNT(*) FROM lineitem").fetchone()[0]
    max_lines = duck.execute(
        "SELECT MAX(c) FROM (SELECT COUNT(*) AS c FROM lineitem GROUP BY l_orderkey)"
    ).fetchone()[0]
    assert r.n_orders == n_orders
    assert r.n_matched_lines + r.n_orphan_lines == n_lines
    assert r.max_lines_per_order == max_lines
    assert r.n_childless_orders <= n_orders


def test_qf26_seasonal_indices_average_to_one(spark, sf_dir, reg):
    """A seasonal index is a ratio to the overall mean, so its
    day-weighted average must be 1."""
    rows = reg["qf26_seasonality_profile"].fn(spark, sf_dir).collect()
    assert all(r.seasonal_index > 0 for r in rows)
    wavg = sum(r.seasonal_index * r.n_days for r in rows) / sum(r.n_days for r in rows)
    assert abs(wavg - 1.0) < 1e-3


def test_qf27_char_entropy_rederived(spark, sf_dir, reg, duck):
    """Full python re-derivation (natural-log Shannon entropy over the
    counted character frequencies) for a 50-doc sample."""
    texts = dict(duck.execute("SELECT doc_id, text FROM documents").fetchall())
    for r in reg["qf27_char_entropy"].fn(spark, sf_dir).collect()[:50]:
        t = texts[r.doc_id][: r.n_chars_counted]
        cnt = Counter(t)
        n = sum(cnt.values())
        h = -sum(c / n * math.log(c / n) for c in cnt.values())
        assert abs(h - r.char_entropy) < 1e-4
