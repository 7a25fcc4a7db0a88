"""Property tests for the round-6 staged j-suite
(operators/analytics7.py): independent python/numpy re-derivations
(AUC vs sklearn-style rank formula, ANOVA vs scipy-free moments,
kappa recompute, Theil-Sen vs numpy median), algebra identities
(histogram merge, drawdown bounds), and the sources' byte-exactness.
"""

import math

import pytest
from pyspark.sql import functions as F

from pyspark_distributed_kmodes_spark.registry import load_all
from pyspark_distributed_kmodes_spark.sources.tables import table


@pytest.fixture(scope="module")
def reg():
    return load_all()


def _user_scores_labels(spark, sf_dir):
    """Python reference: md5-lattice score + purchase label per user."""
    import hashlib

    rows = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.max((F.col("event_type") == "purchase").cast("int")).alias("label"))
        .collect()
    )
    out = []
    for r in rows:
        h = int(hashlib.md5(str(r.user_id).encode()).hexdigest()[:8], 16)
        out.append((h % 10000 / 10000.0, r.label))
    return out


def test_j01_auc_matches_python_rank_formula(spark, sf_dir, reg):
    r = reg["qj01_roc_auc"].fn(spark, sf_dir).collect()[0]
    data = _user_scores_labels(spark, sf_dir)
    pos = [s for s, l in data if l == 1]
    neg = [s for s, l in data if l == 0]
    assert r.n_pos == len(pos) and r.n_neg == len(neg)
    if not pos or not neg:
        assert r.auc is None
        return
    # pairwise definition: P(score_pos > score_neg) + 0.5 P(tie)
    wins = sum(1 for p in pos for n in neg if p > n)
    ties = sum(1 for p in pos for n in neg if p == n)
    want = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert abs(r.auc - want) < 1e-6
    assert abs(r.gini - (2 * want - 1)) < 1e-5


def test_j02_anova_matches_python(spark, sf_dir, reg):
    r = reg["qj02_anova_f"].fn(spark, sf_dir).collect()[0]
    rows = table(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice").collect()
    groups = {}
    for x in rows:
        groups.setdefault(x.o_orderpriority, []).append(x.o_totalprice)
    n = sum(len(v) for v in groups.values())
    k = len(groups)
    gm = sum(sum(v) for v in groups.values()) / n
    ssb = sum(len(v) * (sum(v) / len(v) - gm) ** 2 for v in groups.values())
    ssw = sum(sum((x - sum(v) / len(v)) ** 2 for x in v) for v in groups.values())
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert r.df_between == k - 1 and r.df_within == n - k
    assert abs(r.f_stat - f) < 1e-3 * max(1.0, f)
    assert abs(r.eta_squared - ssb / (ssb + ssw)) < 1e-6


def test_j03_u_statistic_matches_python(spark, sf_dir, reg):
    r = reg["qj03_mann_whitney_u"].fn(spark, sf_dir).collect()[0]
    rows = (
        table(spark, sf_dir, "documents")
        .filter(F.col("source").isin("src0", "src1"))
        .select("source", "n_chars")
        .collect()
    )
    vals = sorted({x.n_chars for x in rows})
    # average ranks over the combined sample
    from collections import Counter

    c0 = Counter(x.n_chars for x in rows if x.source == "src0")
    c1 = Counter(x.n_chars for x in rows if x.source == "src1")
    cum, r1 = 0, 0.0
    for v in vals:
        t = c0[v] + c1[v]
        avg_rank = cum + (t + 1) / 2
        r1 += c1[v] * avg_rank
        cum += t
    m0, m1 = sum(c0.values()), sum(c1.values())
    u = r1 - m1 * (m1 + 1) / 2
    assert r.n_src0 == m0 and r.n_src1 == m1
    assert abs(r.u_stat - u) < 1e-6
    assert abs(r.z_score) < 10  # sanity: z is a z-scale number


def test_j04_confusion_totals(spark, sf_dir, reg):
    rows = reg["qj04_confusion_matrix"].fn(spark, sf_dir).collect()
    n_vec = table(spark, sf_dir, "embeddings").count()
    assert sum(r.tp + r.fn for r in rows) == n_vec  # every truth counted once
    assert sum(r.tp + r.fp for r in rows) == n_vec  # every pred counted once
    for r in rows:
        for m in (r.precision, r.recall, r.f1):
            assert m is None or 0.0 <= m <= 1.0


def test_j05_drawdown_bounds_and_recompute(spark, sf_dir, reg):
    r = reg["qj05_max_drawdown"].fn(spark, sf_dir).collect()[0]
    assert 0.0 <= r.max_drawdown <= 1.0
    assert r.trough_rev <= r.peak_rev
    daily = {}
    for x in table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("d"), "o_totalprice"
    ).collect():
        daily[x.d] = daily.get(x.d, 0.0) + x.o_totalprice
    peak, best = -1.0, -1.0
    for d in sorted(daily):
        peak = max(peak, daily[d])
        best = max(best, (peak - daily[d]) / peak)
    assert abs(r.max_drawdown - best) < 1e-6


def test_j06_rolling_corr_bounds(spark, sf_dir, reg):
    rows = reg["qj06_rolling_correlation"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n == 28
        assert r.rolling_corr is None or -1.0 - 1e-9 <= r.rolling_corr <= 1.0 + 1e-9


def test_j07_assortativity_bounds(spark, sf_dir, reg):
    r = reg["qj07_degree_assortativity"].fn(spark, sf_dir).collect()[0]
    assert r.n_edges > 0
    assert r.assortativity is None or -1.0 - 1e-9 <= r.assortativity <= 1.0 + 1e-9


def test_j08_j09_sources_byte_exact(spark, sf_dir, reg):
    d = table(spark, sf_dir, "documents")
    r8 = reg["qj08_binaryfile_source"].fn(spark, sf_dir).collect()[0]
    n100 = d.filter(F.col("doc_id") < 100).count()
    assert r8.n_files == n100
    assert r8.bytes_total == (
        d.filter(F.col("doc_id") < 100).agg(F.sum(F.length("text"))).first()[0]
    )
    r9 = reg["qj09_text_source_roundtrip"].fn(spark, sf_dir).collect()[0]
    assert r9.n_lines == d.count()
    assert r9.chars_total == d.agg(F.sum(F.length("text"))).first()[0]


def test_j10_kappa_matches_python(spark, sf_dir, reg):
    import hashlib

    r = reg["qj10_cohens_kappa"].fn(spark, sf_dir).collect()[0]
    texts = [x.text for x in table(spark, sf_dir, "documents").collect()]

    def fold(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    pairs = [(fold(t) % 3, fold(t[::-1]) % 3) for t in texts]
    n = len(pairs)
    po = sum(1 for a, b in pairs if a == b) / n
    from collections import Counter

    ra = Counter(a for a, _ in pairs)
    rb = Counter(b for _, b in pairs)
    pe = sum(ra[i] / n * rb[i] / n for i in set(ra) | set(rb))
    assert abs(r.po - po) < 1e-6
    assert abs(r.pe - pe) < 1e-6
    assert abs(r.kappa - (po - pe) / (1 - pe)) < 1e-5


def test_j11_strength_bounds(spark, sf_dir, reg):
    r = reg["qj11_seasonal_strength"].fn(spark, sf_dir).collect()[0]
    assert 0.0 <= r.seasonal_strength <= 1.0
    assert r.n_days > 0


def test_j12_merge_agrees_and_total(spark, sf_dir, reg):
    rows = reg["qj12_histogram_merge_audit"].fn(spark, sf_dir).collect()
    assert all(r.merged_agrees for r in rows)
    assert sum(r.n for r in rows) == table(spark, sf_dir, "orders").count()


def test_j13_theilsen_matches_python(spark, sf_dir, reg):
    r = reg["qj13_theilsen_slope"].fn(spark, sf_dir).collect()[0]
    daily = {}
    for x in table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("d")
    ).collect():
        daily[x.d] = daily.get(x.d, 0) + 1
    days = sorted(daily)
    slopes = []
    for i, d1 in enumerate(days):
        for d2 in days[i + 1 :]:
            lag = (d2 - d1).days
            if lag > 60:
                break
            slopes.append((daily[d2] - daily[d1]) / lag)
    slopes.sort()
    want = slopes[math.ceil(0.5 * len(slopes)) - 1]  # disc convention
    assert r.n_pairs == len(slopes)
    assert abs(r.median_slope - want) < 1e-9


def test_j14_centroid_eval_sane(spark, sf_dir, reg):
    rows = reg["qj14_nearest_centroid_eval"].fn(spark, sf_dir).collect()
    n_vec = table(spark, sf_dir, "embeddings").count()
    assert sum(r.n for r in rows) == n_vec  # every vector assigned once
    for r in rows:
        assert 0.0 <= r.accuracy <= 1.0
        assert r.n_correct <= r.n


def test_j15_km_monotone_and_bounds(spark, sf_dir, reg):
    rows = sorted(reg["qj15_kaplan_meier"].fn(spark, sf_dir).collect(), key=lambda r: r.week)
    assert rows
    surv = [r.survival for r in rows]
    assert all(0.0 <= s <= 1.0 for s in surv)
    assert all(a >= b - 1e-9 for a, b in zip(surv, surv[1:]))  # non-increasing
    # risk sets shrink over time
    risks = [r.n_at_risk for r in rows]
    assert all(a >= b for a, b in zip(risks, risks[1:]))
    for r in rows:
        assert r.n_events <= r.n_at_risk


def test_j15_km_matches_python(spark, sf_dir, reg):
    rows = {r.week: r for r in reg["qj15_kaplan_meier"].fn(spark, sf_dir).collect()}
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("d")
    ).collect()
    by_cust = {}
    for r in orders:
        by_cust.setdefault(r.o_custkey, []).append(r.d)
    hz = max(r.d for r in orders)
    obs = []
    for ds in by_cust.values():
        ds.sort()
        censor = (hz - ds[0]).days // 7
        later = [d for d in ds if d > ds[0]]  # strictly later: same-day
        if later:  # repeat orders are not a reorder event
            ev = (later[0] - ds[0]).days // 7
            obs.append((min(ev, censor), ev <= censor))
        else:
            obs.append((censor, False))
    obs = [(w, e) for w, e in obs if w <= 26]
    weeks = sorted({w for w, _ in obs})
    s = 1.0
    for w in weeks:
        at_risk = sum(1 for x, _ in obs if x >= w)
        d = sum(1 for x, e in obs if x == w and e)
        s *= 1 - d / at_risk if at_risk else 1.0
        assert rows[w].n_at_risk == at_risk, w
        assert rows[w].n_events == d, w
        assert abs(rows[w].survival - s) < 1e-5, w


def test_j16_am_gm_hm_inequality(spark, sf_dir, reg):
    rows = reg["qj16_generalized_means"].fn(spark, sf_dir).collect()
    for r in rows:
        assert r.mean_harm <= r.mean_geom + 1e-6 <= r.mean_arith + 2e-6
        assert r.mean_harm > 0


def test_j17_sweep_monotone(spark, sf_dir, reg):
    rows = sorted(reg["qj17_dedup_threshold_sweep"].fn(spark, sf_dir).collect(), key=lambda r: r.threshold)
    edges = [r.n_edges for r in rows]
    touched = [r.n_docs_touched for r in rows]
    # raising the threshold can only shrink the edge set and coverage
    assert all(a >= b for a, b in zip(edges, edges[1:]))
    assert all(a >= b for a, b in zip(touched, touched[1:]))
    for r in rows:
        assert r.n_docs_touched <= 2 * r.n_edges or r.n_edges == 0


def test_j18_funnel_monotone(spark, sf_dir, reg):
    rows = reg["qj18_filter_attrition_funnel"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_docs >= r.pass_len >= r.pass_words >= r.pass_all >= 0
        assert 0.0 <= r.keep_rate <= 1.0


def test_j18_matches_python_gates(spark, sf_dir, reg):
    from collections import Counter

    got = {r.source: (r.pass_len, r.pass_words, r.pass_all) for r in reg["qj18_filter_attrition_funnel"].fn(spark, sf_dir).collect()}
    want = {}
    for r in table(spark, sf_dir, "documents").collect():
        ws = r.text.split(" ")
        g1 = r.n_chars >= 120
        g2 = len(ws) >= 20
        g3 = max(Counter(ws).values()) <= 0.45 * len(ws)
        a, b, c = want.get(r.source, (0, 0, 0))
        want[r.source] = (a + g1, b + (g1 and g2), c + (g1 and g2 and g3))
    assert got == want
