"""Property tests for the round-5 staged h-suite
(operators/analytics5.py): BM25 ranking sanity vs a pure-python
reference, Theil decomposition identities, JL concentration, KS
bounds, share-tree normalization, and session path conservation.
"""

import math

import pytest
from pyspark.sql import functions as F

from pyspark_distributed_kmodes_spark.registry import load_all


@pytest.fixture(scope="module")
def reg():
    return load_all()


def test_bm25_matches_python_reference(spark, sf_dir, reg):
    """Re-derive BM25 in pure python from the raw corpus and compare
    the full ranked prefix (the d09/d13 independent-reference rule)."""
    from pyspark_distributed_kmodes_spark.operators.analytics5 import (
        _H01_B,
        _H01_K1,
        _H01_TERMS,
    )
    from pyspark_distributed_kmodes_spark.sources.tables import table

    got = [(r.rank, r.doc_id, r.bm25) for r in reg["qh01_bm25_ranking"].fn(spark, sf_dir).collect()]
    docs = {r.doc_id: r.text.split(" ") for r in table(spark, sf_dir, "documents").collect()}
    n = len(docs)
    avgdl = sum(len(w) for w in docs.values()) / n
    df = {t: sum(1 for ws in docs.values() if t in ws) for t in _H01_TERMS}
    scores = {}
    for did, ws in docs.items():
        s = 0.0
        for t in _H01_TERMS:
            tf = ws.count(t)
            if tf == 0:
                continue
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * tf * (_H01_K1 + 1.0) / (tf + _H01_K1 * (1 - _H01_B + _H01_B * len(ws) / avgdl))
        if s > 0:
            scores[did] = s
    ref = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[: len(got)]
    for (rank, did, bm25), (rdid, rs) in zip(got, ref):
        assert did == rdid, (rank, did, rdid)
        assert abs(bm25 - rs) < 1e-4


def test_theil_decomposition_identity(spark, sf_dir, reg):
    """Theil is additive: between + sum(w_g * within_g) == total Theil
    computed directly over all documents."""
    from pyspark_distributed_kmodes_spark.sources.tables import table

    rows = reg["qh02_theil_decomposition"].fn(spark, sf_dir).collect()
    toks = [
        (r.source, len(r.text.split(" ")))
        for r in table(spark, sf_dir, "documents").collect()
    ]
    total = sum(t for _, t in toks)
    mu = total / len(toks)
    t_all = sum((t / mu) * math.log(t / mu) for _, t in toks) / len(toks)
    recomposed = rows[0].t_between + sum(r.token_share * r.theil_within for r in rows)
    assert abs(recomposed - t_all) < 1e-3, (recomposed, t_all)
    assert all(r.theil_within >= -1e-9 for r in rows)


def test_jl_audit_concentrates(spark, sf_dir, reg):
    r = reg["qh03_jl_projection_audit"].fn(spark, sf_dir).collect()[0]
    assert r.n_pairs > 0
    assert r.min_ratio <= r.mean_ratio <= r.max_ratio
    # k=16 gives loose but real concentration: mean within 30% of 1
    assert 0.7 < r.mean_ratio < 1.3
    assert r.n_within_50pct > r.n_pairs * 0.5


def test_substring_search_matches_python(spark, sf_dir, reg):
    from pyspark_distributed_kmodes_spark.operators.analytics5 import _H04_PATTERNS
    from pyspark_distributed_kmodes_spark.sources.tables import table

    got = {r.pattern: (r.n_docs, r.n_occurrences) for r in reg["qh04_substring_search"].fn(spark, sf_dir).collect()}
    texts = [(r.doc_id, r.text) for r in table(spark, sf_dir, "documents").collect()]
    for pat in _H04_PATTERNS:
        n_docs = sum(1 for _, t in texts if pat in t)
        n_occ = sum(t.count(pat) for _, t in texts)
        if n_docs:
            assert got[pat] == (n_docs, n_occ), pat
        else:
            # a zero-match pattern still yields one global-aggregate row
            # (n_docs=0, NULL occurrence sum) from both the engine and the
            # oracle arm — asserting absence would fail spuriously if a
            # pattern stops matching at some scale factor
            assert got[pat] == (0, None), pat


def test_grouped_ks_bounds(spark, sf_dir, reg):
    rows = reg["qh05_grouped_ks_drift"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.ks_stat <= 1.0


def test_percent_of_parent_sums_to_one(spark, sf_dir, reg):
    rows = reg["qh07_percent_of_parent"].fn(spark, sf_dir).collect()
    by_nation = {}
    by_region_share = {}
    total_share = {}
    for r in rows:
        by_nation.setdefault((r.region, r.nation), 0.0)
        by_nation[(r.region, r.nation)] += r.share_of_nation
        by_region_share[(r.region, r.nation)] = r.nation_share_of_region
        total_share[r.region] = r.region_share_of_total
    for k, s in by_nation.items():
        assert abs(s - 1.0) < 1e-4, (k, s)
    # nation shares within each region sum to 1
    region_sums = {}
    for (reg_, nat), share in by_region_share.items():
        region_sums.setdefault(reg_, 0.0)
        region_sums[reg_] += share
    for k, s in region_sums.items():
        assert abs(s - 1.0) < 1e-4, (k, s)
    assert abs(sum(total_share.values()) - 1.0) < 1e-4


def test_session_paths_counts_positive_and_ranked(spark, sf_dir, reg):
    rows = reg["qh08_session_paths"].fn(spark, sf_dir).collect()
    assert rows
    ns = [r.n for r in sorted(rows, key=lambda r: r.rank)]
    assert ns == sorted(ns, reverse=True)
    assert all(r.n >= 1 for r in rows)


def test_windowed_topk_matches_oracle_shape(spark, sf_dir, reg):
    rows = reg["qh09_windowed_topk"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.rank <= 3


def test_orc_roundtrip_idempotent(spark, sf_dir, reg):
    a = reg["qh10_orc_roundtrip"].fn(spark, sf_dir).collect()
    b = reg["qh10_orc_roundtrip"].fn(spark, sf_dir).collect()
    assert a == b and len(a) > 0


def test_partition_pruning_in_plan_and_idempotent(spark, sf_dir, reg):
    """The h11 scan must carry the event_type partition filter at
    planning time (PartitionFilters in the FileSourceScan), and the
    query must be re-invokable (temp-dir hygiene)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from pyspark_distributed_kmodes_spark.sources.tables import table

    base = tempfile.mkdtemp(prefix="qh11_plan_")
    try:
        e = table(spark, sf_dir, "events")
        e.write.mode("overwrite").partitionBy("event_type").parquet(base + "/events")
        back = spark.read.parquet(base + "/events").filter(F.col("event_type") == "purchase")
        plan = back._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "event_type" in plan
        # pruning actually bites: scanned rows == purchase rows only
        n_purchase = e.filter("event_type = 'purchase'").count()
        assert back.count() == n_purchase
    finally:
        shutil.rmtree(base, ignore_errors=True)
    a = reg["qh11_partition_pruned_scan"].fn(spark, sf_dir).collect()
    b = reg["qh11_partition_pruned_scan"].fn(spark, sf_dir).collect()
    assert a == b and len(a) > 0


def test_hard_negative_margin_vs_bruteforce(spark, sf_dir, reg):
    """Re-derive hardest positive/negative with numpy for a few anchors
    (independent-reference rule)."""
    import numpy as np

    from pyspark_distributed_kmodes_spark.sources.tables import table

    got = {r.anchor_id: (r.pos_id, r.neg_id) for r in reg["qh12_hard_negative_mining"].fn(spark, sf_dir).collect()}
    rows = table(spark, sf_dir, "embeddings").collect()
    vecs = {r.vec_id: (np.array(r.embedding, dtype=np.float64), r.label) for r in rows}
    for a_id in list(got)[:5]:
        va, la = vecs[a_id]
        best = {}
        for b_id, (vb, lb) in vecs.items():
            if b_id == a_id:
                continue
            c = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
            k = "pos" if lb == la else "neg"
            if k not in best or (c, -b_id) > (best[k][1], -best[k][0]):
                best[k] = (b_id, c)
        assert got[a_id] == (best["pos"][0], best["neg"][0]), a_id


def test_knn_label_noise_votes_bounded(spark, sf_dir, reg):
    from pyspark_distributed_kmodes_spark.operators.analytics5 import _H13_K

    rows = reg["qh13_knn_label_noise"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_disagree <= _H13_K
        assert r.suspect == (r.n_disagree * 2 > _H13_K)


def test_importance_weights_match_target(spark, sf_dir, reg):
    """Reweighted shares hit the uniform target exactly; ESS <= N."""
    rows = reg["qh14_importance_weights"].fn(spark, sf_dir).collect()
    n = sum(r.n_docs for r in rows)
    lcount = len(rows)
    for r in rows:
        assert abs(r.actual_share * r.weight - 1.0 / lcount) < 1e-4
    assert 0 < rows[0].effective_n <= n + 1e-6


def test_freshness_staleness_nonnegative(spark, sf_dir, reg):
    rows = reg["qh15_freshness_audit"].fn(spark, sf_dir).collect()
    assert rows
    assert any(r.staleness_us == 0 for r in rows)  # the head type itself
    assert all(r.staleness_us >= 0 and r.events_per_day > 0 for r in rows)


def test_mergeable_quantiles_agree(spark, sf_dir, reg):
    r = reg["qh16_mergeable_quantiles"].fn(spark, sf_dir).collect()[0]
    assert r.halves_agree
    assert r.p50 <= r.p90 <= r.p99


def test_two_level_distinct_agrees(spark, sf_dir, reg):
    rows = reg["qh17_two_level_distinct"].fn(spark, sf_dir).collect()
    assert rows and all(r.decomposition_agrees for r in rows)


def test_cms_bound_holds(spark, sf_dir, reg):
    rows = reg["qh18_cms_error_audit"].fn(spark, sf_dir).collect()
    assert rows and all(r.within_bound for r in rows)


def test_skew_planner_sane(spark, sf_dir, reg):
    r = reg["qh19_join_skew_planner"].fn(spark, sf_dir).collect()[0]
    assert r.skew_ratio >= 1.0  # max >= mean always
    assert r.recommended_salt >= 1
    assert r.n_rows >= r.n_keys


def test_resultset_checksum_plan_invariant(spark, sf_dir, reg):
    r = reg["qh20_resultset_checksum"].fn(spark, sf_dir).collect()[0]
    assert r.plans_agree and r.n_rows > 0


def test_bucket_prefilter_never_misses(spark, sf_dir, reg):
    r = reg["qh21_bucket_prefilter_audit"].fn(spark, sf_dir).collect()[0]
    assert r.no_false_negatives and r.n_missed == 0
    assert r.n_candidates >= r.n_true_matches


def test_stratified_kfold_covers_strata(spark, sf_dir, reg):
    from pyspark_distributed_kmodes_spark.sources.tables import table

    rows = reg["qh22_stratified_kfold"].fn(spark, sf_dir).collect()
    n_docs = table(spark, sf_dir, "documents").count()
    assert sum(r.n for r in rows) == n_docs
    for r in rows:
        assert 0.0 < r.fold_share < 1.0
        assert r.stratum_spread >= 0
