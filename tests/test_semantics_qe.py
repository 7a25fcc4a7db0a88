"""m22-style SEMANTIC invariants for the round-4 qe-suite (sampling,
funnels, cohort/LTV, PCA, graph-local-structure rows), continuing the
tests/test_semantics_q*.py program: first-principles laws and python
re-derivations the Spark==DuckDB hash cannot check.

Keys covered: qe01-qe06, qe08-qe23, qe25-qe33 (31 of 33; qe07 is a
single positive-revenue forecast scalar and qe24's basket-lift pairs
are empty at sf0.001)."""

import itertools
import math
from collections import defaultdict
from math import comb

import pytest

from pyspark_distributed_kmodes_spark.registry import load_all


@pytest.fixture(scope="module")
def reg():
    return load_all()


def test_qe01_reservoir_ranks_and_membership(spark, sf_dir, reg, duck):
    """Per-language ranks are contiguous 1..k and every sampled doc
    really belongs to that language."""
    rows = reg["qe01_weighted_reservoir_sample"].fn(spark, sf_dir).collect()
    lang_of = dict(duck.execute("SELECT doc_id, lang FROM documents").fetchall())
    per = defaultdict(list)
    for r in rows:
        per[r.lang].append(r.rk)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per.values())
    assert all(lang_of[r.doc_id] == r.lang for r in rows)


def test_qe02_containment_law(spark, sf_dir, reg):
    """Containment IS n_common / n_a, common never exceeds the smaller
    side's budget, no self-pairs."""
    for r in reg["qe02_containment_pairs"].fn(spark, sf_dir).collect():
        assert r.doc_a != r.doc_b
        assert r.n_common <= r.n_a
        assert abs(r.containment - r.n_common / r.n_a) < 1e-5


def test_qe03_oov_rate_law(spark, sf_dir, reg):
    for r in reg["qe03_oov_rate"].fn(spark, sf_dir).collect():
        assert 0 <= r.n_oov <= r.n_tokens
        assert abs(r.oov_rate - r.n_oov / r.n_tokens) < 1e-6


def test_qe04_strata_counts_rederived(spark, sf_dir, reg, duck):
    """Every reported (lang, source) cell matches the raw group count
    and min id."""
    exp = {
        (l, s): (n, m)
        for l, s, n, m in duck.execute(
            "SELECT lang, source, COUNT(*), MIN(doc_id) FROM documents GROUP BY 1, 2"
        ).fetchall()
    }
    rows = reg["qe04_rare_strata_audit"].fn(spark, sf_dir).collect()
    assert rows
    assert all(exp[(r.lang, r.source)] == (r.n_docs, r.min_doc_id) for r in rows)


def test_qe05_pearson_bounds(spark, sf_dir, reg):
    rows = reg["qe05_length_quality_corr"].fn(spark, sf_dir).collect()
    assert rows
    assert all(abs(r.pearson_r) <= 1.0 for r in rows)


def test_qe06_jsonl_sink_lossless(spark, sf_dir, reg, duck):
    """The JSONL sink round-trip must reproduce per-source counts, char
    totals, and max ids exactly."""
    rows = {r.source: (r.n_docs, r.total_chars, r.max_doc_id) for r in
            reg["qe06_jsonl_sink_roundtrip"].fn(spark, sf_dir).collect()}
    exp = {
        s: (n, c, m)
        for s, n, c, m in duck.execute(
            "SELECT source, COUNT(*), SUM(n_chars), MAX(doc_id) FROM documents GROUP BY 1"
        ).fetchall()
    }
    assert rows == exp


def test_qe08_top_supplier_is_real(spark, sf_dir, reg, duck):
    names = dict(duck.execute("SELECT s_suppkey, s_name FROM supplier").fetchall())
    rows = reg["qe08_top_supplier"].fn(spark, sf_dir).collect()
    assert rows
    assert all(names[r.s_suppkey] == r.s_name for r in rows)
    assert all(r.total_revenue > 0 for r in rows)


def test_qe09_funnel_monotone(spark, sf_dir, reg):
    """Funnel law: users never increase down the funnel; conversion is
    relative to stage 1 and starts at exactly 1."""
    rows = sorted(reg["qe09_event_funnel"].fn(spark, sf_dir).collect(),
                  key=lambda r: r.stage)
    base = rows[0].n_users
    assert rows[0].conversion == 1.0
    assert all(a.n_users >= b.n_users for a, b in zip(rows, rows[1:]))
    assert all(abs(r.conversion - r.n_users / base) < 1e-5 for r in rows)


def test_qe10_stickiness_law(spark, sf_dir, reg):
    """DAU/WAU laws: weekly actives bound average dailies; stickiness
    IS their ratio; a week has 1..7 days."""
    for r in reg["qe10_dau_wau_stickiness"].fn(spark, sf_dir).collect():
        assert r.wau >= r.avg_dau
        assert abs(r.stickiness - r.avg_dau / r.wau) < 1e-4
        assert 1 <= r.n_days <= 7


def test_qe11_ltv_triangle_laws(spark, sf_dir, reg):
    """Cohort-LTV laws: age 0 includes the whole cohort, actives never
    exceed the cohort, and cumulative LTV never decreases with age."""
    per = defaultdict(list)
    for r in reg["qe11_cohort_ltv_triangle"].fn(spark, sf_dir).collect():
        per[r.cohort_year].append(r)
    assert per
    for v in per.values():
        v.sort(key=lambda r: r.age)
        assert v[0].age == 0 and v[0].n_active == v[0].cohort_size
        assert all(r.n_active <= r.cohort_size for r in v)
        assert all(
            a.cum_ltv_per_customer <= b.cum_ltv_per_customer + 1e-6
            for a, b in zip(v, v[1:])
        )


def test_qe12_transition_rows_stochastic(spark, sf_dir, reg):
    """Each prev_type's outgoing probabilities sum to 1 and equal the
    count share."""
    rows = reg["qe12_event_transition_matrix"].fn(spark, sf_dir).collect()
    tot_p = defaultdict(float)
    tot_n = defaultdict(int)
    for r in rows:
        tot_p[r.prev_type] += r.prob
        tot_n[r.prev_type] += r.n_transitions
    assert all(abs(v - 1.0) < 1e-4 for v in tot_p.values())
    assert all(abs(r.prob - r.n_transitions / tot_n[r.prev_type]) < 1e-4 for r in rows)


def test_qe13_topk_ranks_contiguous_and_sorted(spark, sf_dir, reg):
    per = defaultdict(list)
    for r in reg["qe13_sql_top_nations"].fn(spark, sf_dir).collect():
        per[r.o_year].append((r.rk, r.revenue))
    assert per
    for v in per.values():
        v.sort()
        assert [k for k, _ in v] == list(range(1, len(v) + 1))
        assert all(a[1] >= b[1] for a, b in zip(v, v[1:]))


def test_qe14_status_matches_violations(spark, sf_dir, reg):
    for r in reg["qe14_quality_constraints"].fn(spark, sf_dir).collect():
        assert (r.status == "pass") == (r.n_violations == 0)


def test_qe15_pca_spectral_laws(spark, sf_dir, reg):
    """Eigenvalues are non-negative and non-increasing; cum_ratio is the
    exact prefix sum of explained ratios, never exceeding 1."""
    rows = sorted(reg["qe15_pca_variance"].fn(spark, sf_dir).collect(),
                  key=lambda r: r.component)
    assert all(r.eigenvalue >= 0 for r in rows)
    assert all(a.eigenvalue >= b.eigenvalue - 1e-12 for a, b in zip(rows, rows[1:]))
    pref = list(itertools.accumulate(r.explained_ratio for r in rows))
    assert all(abs(p - r.cum_ratio) < 1e-6 for p, r in zip(pref, rows))
    assert rows[-1].cum_ratio <= 1.0 + 1e-9


def test_qe16_silhouette_bounds(spark, sf_dir, reg):
    for r in reg["qe16_kmodes_silhouette"].fn(spark, sf_dir).collect():
        assert -1.0 <= r.mean_s <= 1.0
        assert r.min_s <= r.mean_s


def test_qe17_deciles_are_disjoint_bands(spark, sf_dir, reg):
    """Spend deciles: near-equal bucket sizes and ascending
    non-overlapping spend bands."""
    rows = sorted(reg["qe17_spend_deciles"].fn(spark, sf_dir).collect(),
                  key=lambda r: r.decile)
    assert all(r.min_spend <= r.max_spend for r in rows)
    assert all(a.max_spend <= b.min_spend for a, b in zip(rows, rows[1:]))
    assert max(r.n_customers for r in rows) - min(r.n_customers for r in rows) <= 1


def test_qe18_alignment_overlap_law(spark, sf_dir, reg):
    for r in reg["qe18_cross_lang_alignment"].fn(spark, sf_dir).collect():
        assert r.n_shared <= min(r.n_a, r.n_b)
        assert abs(r.overlap_coeff - r.n_shared / min(r.n_a, r.n_b)) < 1e-5


def test_qe19_first_year_has_no_yoy(spark, sf_dir, reg):
    rows = reg["qe19_yoy_priority_growth"].fn(spark, sf_dir).collect()
    first = min(r.month_start for r in rows).year
    assert all(r.yoy_growth_pct is None for r in rows if r.month_start.year == first)
    assert all(r.n_orders > 0 for r in rows)


def test_qe20_shards_partition_corpus(spark, sf_dir, reg, duck):
    """Global shuffle: per-shard positions are contiguous 1..n and the
    shards partition the corpus exactly (every doc once)."""
    rows = reg["qe20_global_shuffle_shards"].fn(spark, sf_dir).collect()
    n_docs = duck.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    per = defaultdict(list)
    for r in rows:
        per[r.shard].append(r.pos)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per.values())
    ids = [r.doc_id for r in rows]
    assert len(ids) == n_docs and len(set(ids)) == n_docs


def test_qe21_sax_pair_laws(spark, sf_dir, reg):
    rows = reg["qe21_sax_similar_users"].fn(spark, sf_dir).collect()
    assert rows
    word_len = len(rows[0].sax_word)
    for r in rows:
        assert r.user_a < r.user_b
        assert r.dist >= 0
        assert len(r.sax_word) == word_len


def test_qe22_local_structure_laws(spark, sf_dir, reg):
    """Graph laws: clustering coefficient in [0,1] and triangles bounded
    by C(degree, 2)."""
    for r in reg["qe22_neardup_local_structure"].fn(spark, sf_dir).collect():
        assert 0.0 <= r.clustering_coeff <= 1.0
        assert r.n_triangles <= comb(r.degree, 2)


def test_qe23_cohorts_nonempty(spark, sf_dir, reg):
    rows = reg["qe23_ranking_cohorts"].fn(spark, sf_dir).collect()
    assert rows
    assert all(r.n_users >= 1 for r in rows)


def test_qe25_centroid_cosine_bounds(spark, sf_dir, reg):
    for r in reg["qe25_label_separation"].fn(spark, sf_dir).collect():
        assert abs(r.centroid_cosine) <= 1.0
        assert r.label_a < r.label_b


def test_qe26_fusion_is_the_decile_mean(spark, sf_dir, reg):
    for r in reg["qe26_quality_signal_fusion"].fn(spark, sf_dir).collect():
        assert abs(r.fused_score - (r.d_unique + r.d_len + r.d_logprob) / 3) < 1e-6


def test_qe27_jsd_bounds(spark, sf_dir, reg):
    """Jensen-Shannon divergence lives in [0, ln 2]."""
    for r in reg["qe27_source_divergence"].fn(spark, sf_dir).collect():
        assert 0.0 <= r.js_divergence <= math.log(2) + 1e-9


def test_qe28_ratio_ordering(spark, sf_dir, reg):
    for r in reg["qe28_compression_quality"].fn(spark, sf_dir).collect():
        assert 0 < r.min_ratio <= r.avg_ratio <= r.max_ratio


def test_qe29_disorder_consistency(spark, sf_dir, reg):
    for r in reg["qe29_disorder_audit"].fn(spark, sf_dir).collect():
        assert 0.0 <= r.late_frac <= 1.0
        assert r.n_late <= r.n_with_pred
        assert r.p95_late_us <= r.max_late_us


def test_qe30_bfs_layers_contiguous(spark, sf_dir, reg):
    """BFS laws: distances start at 0 and form a contiguous range (a
    BFS cannot skip a layer)."""
    rows = reg["qe30_bfs_layers"].fn(spark, sf_dir).collect()
    ds = sorted({r.dist for r in rows})
    assert ds[0] == 0
    assert ds == list(range(len(ds)))


def test_qe31_ohlc_ordering(spark, sf_dir, reg):
    for r in reg["qe31_weekly_ohlc"].fn(spark, sf_dir).collect():
        assert r.low <= min(r.open, r.close)
        assert r.high >= max(r.open, r.close)


def test_qe32_quantile_ordering(spark, sf_dir, reg):
    for r in reg["qe32_time_to_convert"].fn(spark, sf_dir).collect():
        assert r.p50_us <= r.p90_us <= r.max_us


def test_qe33_waste_fraction_law(spark, sf_dir, reg):
    """Padding waste IS pad / (tokens + pad)."""
    for r in reg["qe33_padding_waste_forecast"].fn(spark, sf_dir).collect():
        assert abs(r.waste_frac - r.pad_tokens / (r.n_tokens + r.pad_tokens)) < 1e-5
