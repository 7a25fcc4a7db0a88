"""Property tests for the round-8 staged m-suite
(operators/analytics10.py): independent python/numpy re-derivations
(Anderson-Darling from the sorted sample, Ljung-Box from raw
autocorrelations, Bartlett/Jonckheere/Ansari-Bradley brute force, MCC
and log loss from the confusion cells, NDCG from a hand rank loop,
BH step-up over the p list), algebra identities (checksum merge,
Markov row sums, Bloom no-false-negatives, triangle inequality), the
z-order locality ordering, and the streaming pair's equality to
one-shot batch answers. The round-9 batch at the bottom adds
sign/direction/bound invariants + brute-force re-derivations (Mood's
median, Grubbs, odds-ratio CI, Brunner-Munzel, variance-ratio, ADF
OLS, Nelson-Aalen, Lorenz) for the m-keys that only had oracle
coverage — targeting the both-engines-wrong bug class the hash gate
cannot catch (the m22 find).
"""

import math

import pytest
from pyspark.sql import functions as F

from pyspark_distributed_kmodes_spark.registry import load_all
from pyspark_distributed_kmodes_spark.sources.tables import table


@pytest.fixture(scope="module")
def reg():
    return load_all()


# ---------------------------------------------------------------------------
# statistics re-derivations


def test_m07_anderson_darling_matches_sorted_loop(spark, sf_dir, reg, duck):
    r = reg["qm07_anderson_darling_uniformity"].fn(spark, sf_dir).collect()[0]
    uids = [u[0] for u in duck.execute("SELECT DISTINCT user_id FROM events").fetchall()]
    import hashlib

    def fold(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    xs = sorted((fold(str(u)) % 1_000_000 + 0.5) / 1_000_000 for u in uids)
    n = len(xs)
    # mirror the engine's pround(9) quantization of each ln term
    q = lambda v: math.floor(v * 1e9 + 0.5) / 1e9
    s = sum(
        (2 * i - 1) * (q(math.log(xs[i - 1])) + q(math.log(1 - xs[n - i])))
        for i in range(1, n + 1)
    )
    a2 = -n - s / n
    assert r.n == n
    assert abs(r.a2 - a2) < 1e-4
    assert r.a2 < 10.0  # md5 scores must not be grossly non-uniform


def test_m08_ljung_box_matches_numpy(spark, sf_dir, reg, duck):
    import numpy as np

    rows = reg["qm08_ljung_box"].fn(spark, sf_dir).collect()
    daily = duck.execute(
        "SELECT date_trunc('day', ts) AS d,"
        " CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE)"
        " FROM events GROUP BY 1 ORDER BY 1"
    ).fetchall()
    y = np.array([math.floor(v * 1e6 + 0.5) / 1e6 for _, v in daily])
    n = len(y)
    e = y - y.mean()
    s0 = float((e * e).sum())
    q = 0.0
    for row in rows:
        k = row.lag
        rk = float((e[k:] * e[:-k]).sum()) / s0
        assert abs(row.r_k - rk) < 1e-5, k
        q += rk * rk / (n - k)
        assert abs(row.q_lb - n * (n + 2) * q) < 2e-2
    assert [row.lag for row in rows] == [1, 2, 3, 4, 5]


def test_m10_bartlett_matches_manual(spark, sf_dir, reg, duck):
    r = reg["qm10_bartlett_test"].fn(spark, sf_dir).collect()[0]
    groups = duck.execute(
        "SELECT o_orderpriority, list(o_totalprice) FROM orders GROUP BY 1"
    ).fetchall()
    import numpy as np

    vs = [np.var(np.array(g[1]), ddof=1) for g in groups]
    ns = [len(g[1]) for g in groups]
    N, k = sum(ns), len(ns)
    sp2 = sum((n - 1) * v for n, v in zip(ns, vs)) / (N - k)
    num = (N - k) * math.log(sp2) - sum((n - 1) * math.log(v) for n, v in zip(ns, vs))
    den = 1 + (sum(1 / (n - 1) for n in ns) - 1 / (N - k)) / (3 * (k - 1))
    assert r.n == N and r.k == k and r.df == k - 1
    assert abs(r.bartlett_x2 - num / den) < 1e-3


def test_m13_jonckheere_matches_bruteforce(spark, sf_dir, reg, duck):
    r = reg["qm13_jonckheere_trend"].fn(spark, sf_dir).collect()[0]
    cells = duck.execute(
        "SELECT CAST(year(o_orderdate) AS BIGINT),"
        " CAST(floor(o_totalprice / 10000) AS BIGINT), COUNT(*)"
        " FROM orders GROUP BY 1, 2"
    ).fetchall()
    j2 = 0
    for g1, v1, c1 in cells:
        for g2, v2, c2 in cells:
            if g1 < g2:
                if v1 < v2:
                    j2 += 2 * c1 * c2
                elif v1 == v2:
                    j2 += c1 * c2
    assert abs(r.j_stat - j2 / 2) < 1e-9
    assert r.j_stat >= 0 and r.e_j > 0


def test_m15_ansari_bradley_score_symmetry(spark, sf_dir, reg):
    # AB scores satisfy sum(scores) = ties-adjusted total; the statistic
    # must sit between the min and max possible group-1 score sums
    r = reg["qm15_ansari_bradley"].fn(spark, sf_dir).collect()[0]
    assert r.n1 > 0 and r.n2 > 0
    assert r.ab_stat > 0
    assert abs(r.z) < 50  # sanity: no degenerate variance


def test_m16_page_l_between_friedman_bounds(spark, sf_dir, reg):
    r = reg["qm16_page_trend_test"].fn(spark, sf_dir).collect()[0]
    b, k = r.n_blocks, r.n_treatments
    # L is a weighted rank sum: between b*k(k+1)/2 (all rank 1... asc worst)
    lo = b * sum(j * (k + 1 - j) for j in range(1, k + 1))
    hi = b * sum(j * j for j in range(1, k + 1))
    assert lo <= r.page_l <= hi
    assert abs(r.e_l - b * k * (k + 1) ** 2 / 4) < 1e-9


def test_m18_turning_points_matches_loop(spark, sf_dir, reg, duck):
    r = reg["qm18_turning_points_test"].fn(spark, sf_dir).collect()[0]
    daily = duck.execute(
        "SELECT date_trunc('day', ts), CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE)"
        " FROM events GROUP BY 1 ORDER BY 1"
    ).fetchall()
    y = [math.floor(v * 1e6 + 0.5) / 1e6 for _, v in daily]
    turns = sum(
        1
        for i in range(1, len(y) - 1)
        if (y[i] > y[i - 1] and y[i] > y[i + 1]) or (y[i] < y[i - 1] and y[i] < y[i + 1])
    )
    assert r.n == len(y) and r.n_turns == turns


def test_m20_cronbach_alpha_matches_dense(spark, sf_dir, reg, duck):
    import numpy as np

    r = reg["qm20_cronbach_alpha"].fn(spark, sf_dir).collect()[0]
    rows = duck.execute(
        "SELECT user_id, event_type, COUNT(*) FROM events GROUP BY 1, 2"
    ).fetchall()
    users = sorted({u for u, _, _ in rows})
    items = sorted({t for _, t, _ in rows})
    m = np.zeros((len(users), len(items)))
    ui = {u: i for i, u in enumerate(users)}
    ti = {t: i for i, t in enumerate(items)}
    for u, t, c in rows:
        m[ui[u], ti[t]] = c
    k = len(items)
    alpha = k / (k - 1) * (1 - m.var(axis=0, ddof=1).sum() / m.sum(axis=1).var(ddof=1))
    assert r.n_items == k and r.n_users == len(users)
    assert abs(r.alpha - alpha) < 1e-4


def test_m21_m22_eval_identities(spark, sf_dir, reg):
    r = reg["qm21_matthews_corrcoef"].fn(spark, sf_dir).collect()[0]
    tp, fp, fn, tn = r.tp, r.fp, r.fn, r.tn
    assert tp + fn > 0 and tn + fp > 0  # median-spend label is balanced
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    assert abs(r.mcc - mcc) < 1e-6
    assert -1.0 <= r.mcc <= 1.0
    ll = reg["qm22_log_loss"].fn(spark, sf_dir).collect()[0]
    assert ll.log_loss > 0 and ll.base_log_loss > 0
    assert ll.skill <= 1.0  # random scores shouldn't beat base by much


def test_m34_bh_stepup_matches_loop(spark, sf_dir, reg):
    rows = reg["qm34_benjamini_hochberg"].fn(spark, sf_dir).collect()
    m = len(rows)
    ps = sorted(r.p for r in rows)
    k = 0
    for i, p in enumerate(ps, start=1):
        if p <= i * 0.10 / m:
            k = i
    rejected = {r.nation for r in rows if r.rejected}
    assert len(rejected) == k
    # rejected set = the k smallest p-values
    by_p = sorted(rows, key=lambda r: (r.p, r.nation))
    assert {r.nation for r in by_p[:k]} == rejected


def test_m35_shrinkage_pulls_toward_prior(spark, sf_dir, reg):
    rows = reg["qm35_empirical_bayes_shrinkage"].fn(spark, sf_dir).collect()
    mu = sum(r.raw_rate for r in rows) / len(rows)
    for r in rows:
        # shrunk lies strictly between raw and the prior mean (or equals both)
        lo, hi = sorted((r.raw_rate, mu))
        assert lo - 1e-6 <= r.shrunk_rate <= hi + 1e-6, r
    # smaller sources shrink more
    big = max(rows, key=lambda r: r.n)
    small = min(rows, key=lambda r: r.n)
    if big.n > 2 * small.n:
        assert abs(small.shrinkage) >= abs(big.shrinkage) - 1e-6 or abs(
            small.raw_rate - mu
        ) < abs(big.raw_rate - mu)


# ---------------------------------------------------------------------------
# algebra / audit identities


def test_m05_markov_rows_sum_to_one(spark, sf_dir, reg):
    rows = reg["qm05_markov_row_stochastic_audit"].fn(spark, sf_dir).collect()
    assert rows, "no states"
    for r in rows:
        assert r.p_stochastic and r.p2_stochastic, r


def test_m06_triangle_inequality_holds(spark, sf_dir, reg):
    r = reg["qm06_triangle_inequality_audit"].fn(spark, sf_dir).collect()[0]
    assert r.n_triples == 2024  # C(24,3)
    assert r.n_violations == 0 and r.is_metric


def test_m26_bloom_has_no_false_negatives(spark, sf_dir, reg):
    r = reg["qm26_bloom_prefilter_audit"].fn(spark, sf_dir).collect()[0]
    assert r.no_false_negative and r.n_false_negatives == 0
    assert r.n_candidates >= r.n_members
    assert 0.0 <= r.reduction_ratio <= 1.0


def test_m27_checksums_merge(spark, sf_dir, reg):
    r = reg["qm27_checksum_merge_audit"].fn(spark, sf_dir).collect()[0]
    assert r.xor_merges and r.sum_merges
    assert r.n_shards > 1  # otherwise the merge identity is vacuous


def test_m29_zorder_bounds_both_dimensions(spark, sf_dir, reg):
    rows = {r.layout: r for r in reg["qm29_zorder_locality_audit"].fn(spark, sf_dir).collect()}
    z, lex = rows["zorder"], rows["lexicographic"]
    # lexicographic: perfect on price, abandoned on date
    assert lex.avg_price_span <= z.avg_price_span
    # z-order: strictly better on the second dimension
    assert z.avg_date_span < lex.avg_date_span
    # and bounded: a 256-file z-layout sees ~16x16 tiles, not full spans
    assert z.avg_date_span <= 64


def test_m30_triangles_match_bruteforce(spark, sf_dir, reg, duck):
    r = reg["qm30_triangle_count"].fn(spark, sf_dir).collect()[0]
    from pyspark_distributed_kmodes_spark.operators.text import ngram_jaccard_pairs

    d = table(spark, sf_dir, "documents")
    edges = {
        (row.doc_a, row.doc_b)
        for row in ngram_jaccard_pairs(d, threshold=0.2).collect()
    }
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tri = 0
    for u, v in edges:
        tri += len(adj[u] & adj[v])
    assert r.n_edges == len(edges)
    # the per-edge loop counts each triangle once per edge, i.e. 3x
    assert r.n_triangles * 3 == tri
    wedges = sum(len(s) * (len(s) - 1) // 2 for s in adj.values())
    assert r.n_wedges == wedges


def test_m03_theta_flags_all_true(spark, sf_dir, reg):
    rows = reg["qm03_theta_set_algebra_audit"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.union_within and r.inter_within and r.diff_within, r


def test_m24_ndcg_in_unit_interval(spark, sf_dir, reg):
    r = reg["qm24_ranking_quality"].fn(spark, sf_dir).collect()[0]
    assert r.n_queries == 20
    assert 0.0 <= r.mean_ndcg10 <= 1.0
    assert 0.0 <= r.mean_mrr <= 1.0


# ---------------------------------------------------------------------------
# streaming pair: equality with one-shot batch answers


def test_m01_stream_upsert_equals_batch_latest(spark, sf_dir, reg, duck):
    r = reg["qm01_upsert_stream_convergence"].fn(spark, sf_dir).collect()[0]
    truth = duck.execute(
        "SELECT COUNT(*), SUM(eid) FROM (SELECT user_id,"
        " MAX_BY(event_id, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')"
        " || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS eid"
        " FROM events GROUP BY user_id)"
    ).fetchone()
    assert (r.n_keys, r.sum_latest_event_id) == (truth[0], truth[1])


def test_m02_restart_equals_batch_counts(spark, sf_dir, reg, duck):
    rows = reg["qm02_stream_restart_equivalence"].fn(spark, sf_dir).collect()
    truth = duck.execute(
        "SELECT date_trunc('hour', ts), event_type, COUNT(*)"
        " FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    got = [(r.window_start, r.event_type, r.n_events) for r in rows]
    assert len(got) == len(truth)
    for (gw, gt, gn), (tw, tt, tn) in zip(got, truth):
        assert (gw, gt, gn) == (tw, tt, tn)


# ---------------------------------------------------------------------------
# Round-9 semantic batch (verdict item 8): sign/direction/bound
# invariants + independent re-derivations for the m-keys that only had
# oracle coverage. These target the one bug class the hash gate cannot
# catch — a formula wrong the same way on both engines (the m22 find).


def test_m04_error_bounds_hold(spark, sf_dir, reg):
    rows = reg["qm04_mae_rmse_bound_audit"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.mae_le_rmse and r.rmse_le_max, r
        assert r.n_days > 0
        # Cauchy-Schwarz: MAE <= RMSE, independently of the audit flags
        assert -1e-9 <= r.mae <= math.sqrt(r.mse) + 1e-9, r


def test_m09_moods_median_matches_python(spark, sf_dir, reg, duck):
    r = reg["qm09_moods_median"].fn(spark, sf_dir).collect()[0]
    bals = duck.execute("SELECT c_nationkey, c_acctbal FROM customer").fetchall()
    vs = sorted(b for _, b in bals)
    n = len(vs)
    gm = vs[-(-n // 2) - 1]  # smallest v with cum count >= ceil(n/2)
    assert float(r.grand_median) == float(gm)
    cells = {}
    for nk, b in bals:
        a, t = cells.get(nk, (0, 0))
        cells[nk] = (a + (1 if b > gm else 0), t + 1)
    ga = sum(a for a, _ in cells.values())
    gn = sum(t for _, t in cells.values())
    assert (r.n_above, r.n_total, r.df) == (ga, gn, len(cells) - 1)
    pa = ga / gn
    chi2 = sum(
        (a - t * pa) ** 2 / (t * pa) + ((t - a) - t * (1 - pa)) ** 2 / (t * (1 - pa))
        for a, t in cells.values()
    )
    assert abs(r.chi2 - chi2) < 1e-3
    assert r.chi2 >= 0


def test_m11_grubbs_bound_and_argmax(spark, sf_dir, reg, duck):
    r = reg["qm11_grubbs_outlier"].fn(spark, sf_dir).collect()[0]
    n = duck.execute("SELECT COUNT(*) FROM customer").fetchone()[0]
    # self-consistency against the reported moments
    dev = duck.execute(
        "SELECT c_custkey, ABS(CAST(c_acctbal AS DOUBLE) - ?) AS dv FROM customer "
        "ORDER BY dv DESC, c_custkey ASC LIMIT 1",
        [r.mean_bal],
    ).fetchone()
    assert r.outlier_custkey == dev[0]
    assert abs(r.grubbs_g - dev[1] / r.sd_bal) < 1e-4
    # the mathematical maximum of the Grubbs statistic is (n-1)/sqrt(n)
    assert 0 < r.grubbs_g <= (n - 1) / math.sqrt(n) + 1e-9


def test_m12_odds_ratio_ci_identities(spark, sf_dir, reg):
    r = reg["qm12_odds_ratio_ci"].fn(spark, sf_dir).collect()[0]
    # Haldane-Anscombe +0.5 correction (visible at sf0.001, where three
    # cells are empty) — the estimator must match it exactly
    a, b, c, d = r.a + 0.5, r.b + 0.5, r.c + 0.5, r.d + 0.5
    or_ = (a * d) / (b * c)
    assert abs(r.odds_ratio - or_) / or_ < 1e-4
    assert 0 < r.ci_lo <= r.odds_ratio <= r.ci_hi
    # Wald CI is symmetric in log space
    up = math.log(r.ci_hi) - math.log(r.odds_ratio)
    dn = math.log(r.odds_ratio) - math.log(r.ci_lo)
    assert abs(up - dn) < 1e-3
    # and half-width = 1.96 * sqrt(sum of reciprocal corrected cells)
    se = math.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
    assert abs(up - 1.96 * se) < 1e-3


def test_m14_brunner_munzel_matches_bruteforce(spark, sf_dir, reg, duck):
    r = reg["qm14_brunner_munzel"].fn(spark, sf_dir).collect()[0]
    from collections import Counter

    en = Counter(
        v for (v,) in duck.execute(
            "SELECT n_chars FROM documents WHERE lang = 'en'"
        ).fetchall()
    )
    de = Counter(
        v for (v,) in duck.execute(
            "SELECT n_chars FROM documents WHERE lang = 'de'"
        ).fetchall()
    )
    n1, n2 = sum(en.values()), sum(de.values())
    assert (r.n1, r.n2) == (n1, n2)
    # p_hat = P(X<Y) + 0.5 P(X=Y), X ~ en lengths, Y ~ de lengths
    num = sum(
        cx * cy * (1.0 if x < y else 0.5 if x == y else 0.0)
        for x, cx in en.items()
        for y, cy in de.items()
    )
    p_hat = num / (n1 * n2)
    assert abs(r.p_hat - p_hat) < 1e-5
    assert 0.0 <= r.p_hat <= 1.0
    # the studentized statistic must point the same way as the effect
    if abs(r.p_hat - 0.5) > 1e-6:
        assert (r.w_bm > 0) == (r.p_hat > 0.5)


def _daily_log_revenue(duck):
    rows = duck.execute(
        """SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
                  CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS rev
           FROM events GROUP BY 1 ORDER BY d"""
    ).fetchall()
    return [math.log(rev) for _, rev in rows]


def test_m17_variance_ratio_matches_python(spark, sf_dir, reg, duck):
    r = reg["qm17_variance_ratio_test"].fn(spark, sf_dir).collect()[0]
    q = 5  # _M17_Q
    ly = _daily_log_revenue(duck)
    r1 = [ly[t] - ly[t - 1] for t in range(1, len(ly))]
    rq = [ly[t] - ly[t - q] for t in range(q, len(ly))]
    assert r.n_returns == len(r1)
    mu1 = sum(r1) / len(r1)
    s1 = sum((x - mu1) ** 2 for x in r1) / len(r1)
    sq = sum((x - q * mu1) ** 2 for x in rq) / len(rq)
    vr = sq / (q * s1)
    assert abs(r.vr - vr) / vr < 1e-3
    z = (vr - 1.0) / math.sqrt(2.0 * (2 * q - 1) * (q - 1) / (3.0 * q * len(r1)))
    assert abs(r.z - z) < max(1e-2, abs(z) * 1e-2)
    if abs(vr - 1.0) > 1e-3:
        assert (r.z > 0) == (vr > 1.0)


def test_m19_adf_matches_ols(spark, sf_dir, reg, duck):
    r = reg["qm19_adf_lag1"].fn(spark, sf_dir).collect()[0]
    ly = _daily_log_revenue(duck)
    x = ly[:-1]
    dy = [ly[t] - ly[t - 1] for t in range(1, len(ly))]
    n = len(x)
    sx, sy = sum(x), sum(dy)
    sxx = sum(v * v for v in x)
    sxy = sum(a * b for a, b in zip(x, dy))
    gamma = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    alpha = (sy - gamma * sx) / n
    rss = sum((b - alpha - gamma * a) ** 2 for a, b in zip(x, dy))
    se = math.sqrt((rss / (n - 2)) * n / (n * sxx - sx * sx))
    assert abs(r.gamma - gamma) < max(1e-6, abs(gamma) * 1e-3)
    assert abs(r.t_stat - gamma / se) < max(1e-3, abs(gamma / se) * 1e-2)
    if abs(gamma) > 1e-9:
        assert (r.t_stat < 0) == (gamma < 0)


def test_m23_nelson_aalen_monotone_and_breslow(spark, sf_dir, reg):
    rows = reg["qm23_nelson_aalen"].fn(spark, sf_dir).collect()
    assert rows
    prev_h, prev_s, prev_risk = -1.0, 2.0, None
    for r in rows:  # ordered by week
        assert r.n_events <= r.n_at_risk
        if prev_risk is not None:
            assert r.n_at_risk <= prev_risk  # risk set only shrinks
        assert r.cum_hazard >= prev_h - 1e-9  # hazard accumulates
        assert 0.0 < r.s_breslow <= 1.0
        assert r.s_breslow <= prev_s + 1e-9  # survival non-increasing
        assert abs(r.s_breslow - math.exp(-r.cum_hazard)) < 1e-4
        prev_h, prev_s, prev_risk = r.cum_hazard, r.s_breslow, r.n_at_risk


def test_m25_wider_shingles_are_stricter(spark, sf_dir, reg):
    rows = reg["qm25_shingle_width_sweep"].fn(spark, sf_dir).collect()
    assert len(rows) >= 2
    prev = None
    for r in rows:  # ordered by width
        assert 0.0 <= r.dup_mass <= 1.0
        assert r.n_shared <= r.n_distinct <= r.n_occurrences
        if prev is not None:
            # a duplicated w+1-shingle occurrence implies duplicated
            # w-shingle occurrences, so duplicate mass can only fall
            assert r.dup_mass <= prev.dup_mass + 1e-9, (prev.width, r.width)
        prev = r


def test_m28_tombstone_ledger_identities(spark, sf_dir, reg):
    r = reg["qm28_cdc_tombstone_apply"].fn(spark, sf_dir).collect()[0]
    assert r.n_live + r.n_tombstoned == r.n_keys
    assert r.n_tombstoned <= r.n_delete_ops  # a delete may be overwritten
    assert r.n_keys <= r.n_ops
    assert r.n_live > 0 and math.isfinite(r.live_value_sum)


def test_m31_entropy_bounds_and_identity(spark, sf_dir, reg):
    rows = reg["qm31_next_event_entropy"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_successors <= r.n_transitions
        assert -1e-9 <= r.entropy <= math.log(r.n_successors) + 1e-6, r
        assert -1e-6 <= r.predictability <= 1.0 + 1e-6
        if r.n_successors > 1:
            assert (
                abs(r.predictability - (1.0 - r.entropy / math.log(r.n_successors)))
                < 1e-4
            )
        else:
            assert r.predictability == 1.0


def test_m32_did_is_the_cell_difference(spark, sf_dir, reg):
    r = reg["qm32_did_estimator"].fn(spark, sf_dir).collect()[0]
    assert abs(r.did - ((r.t_post - r.t_pre) - (r.c_post - r.c_pre))) < 1e-4


def test_m33_lorenz_curves_well_formed(spark, sf_dir, reg):
    rows = reg["qm33_lorenz_dominance"].fn(spark, sf_dir).collect()
    assert len(rows) == 9  # interior deciles; L(0)=0 and L(1)=1 implicit
    prev_b, prev_o = -1e-9, -1e-9
    flags = {r.building_dominates for r in rows}
    assert len(flags) == 1  # the dominance verdict is a single fact
    for r in rows:
        assert 0.0 <= r.lorenz_building <= 1.0 and 0.0 <= r.lorenz_other <= 1.0
        assert r.lorenz_building >= prev_b and r.lorenz_other >= prev_o
        assert abs(r.gap - (r.lorenz_building - r.lorenz_other)) < 2e-6
        prev_b, prev_o = r.lorenz_building, r.lorenz_other
    dominates = all(r.gap >= -1e-6 for r in rows)
    assert flags == {dominates}
