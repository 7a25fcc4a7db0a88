"""m22-style SEMANTIC invariants for the round-6 qh-suite (IR, audit
twins, skew planning, lakehouse rows), continuing the
tests/test_semantics_q*.py program: first-principles laws and python
re-derivations the Spark==DuckDB hash cannot check.

Keys covered: qh01-qh22 (all 22)."""

from collections import defaultdict

import pytest

from pyspark_distributed_kmodes_spark.registry import load_all


@pytest.fixture(scope="module")
def reg():
    return load_all()


def test_qh01_bm25_rank_order(spark, sf_dir, reg):
    rows = sorted(reg["qh01_bm25_ranking"].fn(spark, sf_dir).collect(),
                  key=lambda r: r.rank)
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert all(a.bm25 >= b.bm25 for a, b in zip(rows, rows[1:]))
    assert all(r.n_terms_matched >= 1 for r in rows)


def test_qh02_theil_shares(spark, sf_dir, reg):
    rows = reg["qh02_theil_decomposition"].fn(spark, sf_dir).collect()
    assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-6
    assert all(r.theil_within >= -1e-12 for r in rows)


def test_qh03_jl_ratio_ordering(spark, sf_dir, reg):
    r = reg["qh03_jl_projection_audit"].fn(spark, sf_dir).collect()[0]
    assert r.min_ratio <= r.mean_ratio <= r.max_ratio
    assert r.n_within_50pct <= r.n_pairs


def test_qh04_first_doc_really_contains_pattern(spark, sf_dir, reg, duck):
    texts = dict(duck.execute("SELECT doc_id, text FROM documents").fetchall())
    for r in reg["qh04_substring_search"].fn(spark, sf_dir).collect():
        assert r.n_occurrences >= r.n_docs >= 1
        assert r.pattern in texts[r.first_doc]


def test_qh05_ks_bounds_and_counts(spark, sf_dir, reg, duck):
    exp = dict(duck.execute("SELECT source, COUNT(*) FROM documents GROUP BY 1").fetchall())
    for r in reg["qh05_grouped_ks_drift"].fn(spark, sf_dir).collect():
        assert 0.0 <= r.ks_stat <= 1.0
        assert r.n_docs == exp[r.source]


def test_qh06_pmi_ranks_contiguous(spark, sf_dir, reg):
    rows = sorted(reg["qh06_cooccurrence_pmi"].fn(spark, sf_dir).collect(),
                  key=lambda r: r.rank)
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert all(r.n_ab >= 1 for r in rows)


def test_qh07_percent_of_parent_sums(spark, sf_dir, reg):
    """Share laws at every level of the hierarchy: segment shares sum
    to 1 within each nation, nation shares within each region, region
    shares over the total."""
    rows = reg["qh07_percent_of_parent"].fn(spark, sf_dir).collect()
    seg = defaultdict(float)
    nat = defaultdict(dict)
    rst = {}
    for r in rows:
        seg[(r.region, r.nation)] += r.share_of_nation
        nat[r.region][r.nation] = r.nation_share_of_region
        if r.region_share_of_total is not None:
            rst[r.region] = r.region_share_of_total
    assert all(abs(v - 1.0) < 1e-4 for v in seg.values())
    assert all(abs(sum(d.values()) - 1.0) < 1e-4 for d in nat.values())
    assert abs(sum(rst.values()) - 1.0) < 1e-4


def test_qh08_paths_ranked_by_count(spark, sf_dir, reg):
    rows = sorted(reg["qh08_session_paths"].fn(spark, sf_dir).collect(),
                  key=lambda r: r.rank)
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert all(a.n >= b.n for a, b in zip(rows, rows[1:]))


def test_qh09_windowed_topk_laws(spark, sf_dir, reg):
    per = defaultdict(list)
    for r in reg["qh09_windowed_topk"].fn(spark, sf_dir).collect():
        per[r.window_idx].append((r.rank, r.n))
    for v in per.values():
        v.sort()
        assert [k for k, _ in v] == list(range(1, len(v) + 1))
        assert all(a[1] >= b[1] for a, b in zip(v, v[1:]))


def test_qh10_orc_lossless(spark, sf_dir, reg, duck):
    rows = {r.source: (r.n_docs, r.chars_sum, r.max_doc) for r in
            reg["qh10_orc_roundtrip"].fn(spark, sf_dir).collect()}
    exp = {
        s: (n, c, m)
        for s, n, c, m in duck.execute(
            "SELECT source, COUNT(*), SUM(n_chars), MAX(doc_id) FROM documents GROUP BY 1"
        ).fetchall()
    }
    assert rows == exp


def test_qh11_pruned_scan_rederived(spark, sf_dir, reg, duck):
    rows = {r.day_idx: (r.n, r.n_users) for r in
            reg["qh11_partition_pruned_scan"].fn(spark, sf_dir).collect()}
    exp = {
        d: (n, u)
        for d, n, u in duck.execute(
            "SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT), COUNT(*),"
            " COUNT(DISTINCT user_id) FROM events WHERE event_type = 'purchase' GROUP BY 1"
        ).fetchall()
    }
    assert rows == exp


def test_qh12_margin_law(spark, sf_dir, reg):
    for r in reg["qh12_hard_negative_mining"].fn(spark, sf_dir).collect():
        assert abs(r.margin - (r.cos_pos - r.cos_neg)) < 1e-5
        assert abs(r.cos_pos) <= 1 and abs(r.cos_neg) <= 1


def test_qh13_suspect_is_a_threshold(spark, sf_dir, reg):
    rows = reg["qh13_knn_label_noise"].fn(spark, sf_dir).collect()
    hot = [r.n_disagree for r in rows if r.suspect]
    cold = [r.n_disagree for r in rows if not r.suspect]
    if hot and cold:
        assert min(hot) > max(cold)


def test_qh14_importance_shares(spark, sf_dir, reg):
    rows = reg["qh14_importance_weights"].fn(spark, sf_dir).collect()
    assert abs(sum(r.actual_share for r in rows) - 1.0) < 1e-4
    assert all(r.weight > 0 for r in rows)


def test_qh15_freshness_rederived(spark, sf_dir, reg, duck):
    exp = dict(duck.execute("SELECT event_type, COUNT(*) FROM events GROUP BY 1").fetchall())
    for r in reg["qh15_freshness_audit"].fn(spark, sf_dir).collect():
        assert r.staleness_us >= 0
        assert r.n_events == exp[r.event_type]
        assert r.events_per_day > 0


def test_qh16_quantile_merge_agrees(spark, sf_dir, reg):
    r = reg["qh16_mergeable_quantiles"].fn(spark, sf_dir).collect()[0]
    assert r.p50 <= r.p90 <= r.p99
    assert r.halves_agree


def test_qh17_distinct_decomposition_rederived(spark, sf_dir, reg, duck):
    exp = dict(duck.execute(
        "SELECT event_type, COUNT(DISTINCT user_id) FROM events GROUP BY 1"
    ).fetchall())
    for r in reg["qh17_two_level_distinct"].fn(spark, sf_dir).collect():
        assert r.decomposition_agrees
        assert r.n_distinct == exp[r.event_type]


def test_qh18_cms_bounds_hold(spark, sf_dir, reg):
    rows = reg["qh18_cms_error_audit"].fn(spark, sf_dir).collect()
    assert rows and all(r.within_bound for r in rows)


def test_qh19_skew_planner_arithmetic(spark, sf_dir, reg):
    r = reg["qh19_join_skew_planner"].fn(spark, sf_dir).collect()[0]
    assert r.max_c <= r.n_rows
    assert abs(r.skew_ratio - r.max_c / (r.n_rows / r.n_keys)) < 1e-4
    assert r.recommended_salt >= 1


def test_qh20_checksum_plans_agree(spark, sf_dir, reg, duck):
    r = reg["qh20_resultset_checksum"].fn(spark, sf_dir).collect()[0]
    assert r.plans_agree
    assert r.n_rows == duck.execute("SELECT COUNT(*) FROM orders").fetchone()[0]


def test_qh21_prefilter_no_false_negatives(spark, sf_dir, reg):
    r = reg["qh21_bucket_prefilter_audit"].fn(spark, sf_dir).collect()[0]
    assert r.no_false_negatives and r.n_missed == 0


def test_qh22_kfold_partitions_strata(spark, sf_dir, reg, duck):
    per = defaultdict(int)
    shares = defaultdict(float)
    for r in reg["qh22_stratified_kfold"].fn(spark, sf_dir).collect():
        per[r.lang] += r.n
        shares[r.lang] += r.fold_share
    exp = dict(duck.execute("SELECT lang, COUNT(*) FROM documents GROUP BY 1").fetchall())
    assert per == exp
    assert all(abs(v - 1.0) < 1e-4 for v in shares.values())
