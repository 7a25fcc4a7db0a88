"""Property tests for the round-6 staged j19-j50 suite
(operators/analytics8.py): independent python/numpy re-derivations
(Kendall tau over the pandas crosstab, Jarque-Bera and Welch t from raw
moments, Mann-Kendall S, runs counting, the weekday-prefix closed form
vs a brute date loop), algebra identities (mergeable variance carriers,
incremental rollup agreement, WAP publish gate), and bound checks.
"""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from pyspark_distributed_kmodes_spark.operators.analytics8 import _weekday_prefix
from pyspark_distributed_kmodes_spark.registry import load_all
from pyspark_distributed_kmodes_spark.sources.tables import table


@pytest.fixture(scope="module")
def reg():
    return load_all()


# ---------------------------------------------------------------------------
# statistics re-derivations


def test_j19_tau_matches_pandas_crosstab(spark, sf_dir, reg, duck):
    import numpy as np

    r = reg["qj19_kendall_tau"].fn(spark, sf_dir).collect()[0]
    cells = duck.execute(
        "SELECT l_quantity, l_discount, COUNT(*) FROM lineitem GROUP BY 1, 2"
    ).fetchall()
    q = np.array([c[0] for c in cells])
    d = np.array([c[1] for c in cells])
    n = np.array([c[2] for c in cells], dtype=np.int64)
    C = D = 0
    for i in range(len(cells)):
        sgn = np.sign((q - q[i]) * (d - d[i]))
        C += int(n[i] * n[(sgn > 0)].sum())
        D += int(n[i] * n[(sgn < 0)].sum())
    C, D = C // 2, D // 2  # each unordered pair visited twice
    assert (r.concordant, r.discordant) == (C, D)
    N = int(n.sum())
    n0 = N * (N - 1) / 2
    n1 = sum(t * (t - 1) / 2 for t in np.bincount(q.astype(int), weights=n).astype(int) if t > 1)
    cnts_d = {}
    for di, ni in zip(d, n):
        cnts_d[di] = cnts_d.get(di, 0) + int(ni)
    n2 = sum(t * (t - 1) / 2 for t in cnts_d.values())
    tau = (C - D) / math.sqrt((n0 - n1) * (n0 - n2))
    assert abs(r.tau_b - tau) < 1e-6
    assert -1.0 <= r.tau_b <= 1.0


def test_j20_levene_matches_numpy(spark, sf_dir, reg, duck):
    import numpy as np

    r = reg["qj20_levene_test"].fn(spark, sf_dir).collect()[0]
    rows = duck.execute("SELECT o_orderpriority, o_totalprice FROM orders").fetchall()
    groups = {}
    for g, x in rows:
        groups.setdefault(g, []).append(x)
    zs = {g: np.abs(np.array(v) - np.median(v)) for g, v in groups.items()}
    zbar = {g: z.mean() for g, z in zs.items()}
    n = sum(len(v) for v in groups.values())
    k = len(groups)
    grand = sum(z.sum() for z in zs.values()) / n
    num = sum(len(zs[g]) * (zbar[g] - grand) ** 2 for g in groups)
    den = sum(((zs[g] - zbar[g]) ** 2).sum() for g in groups)
    w = (n - k) / (k - 1) * num / den
    assert r.k == k and r.n == n
    # engine quantizes num/den terms to integers; values are ~1e9+, so
    # the statistic agrees to ~1e-4 relative
    assert abs(r.w_stat - w) / max(w, 1e-9) < 1e-3
    assert r.w_stat >= 0


def test_j21_jb_matches_numpy(spark, sf_dir, reg, duck):
    import numpy as np

    rows = {r.lang: r for r in reg["qj21_jarque_bera"].fn(spark, sf_dir).collect()}
    data = duck.execute("SELECT lang, n_chars FROM documents").fetchall()
    bylang = {}
    for lang, c in data:
        bylang.setdefault(lang, []).append(c)
    for lang, xs in bylang.items():
        x = np.array(xs, dtype=np.float64)
        m2 = ((x - x.mean()) ** 2).mean()
        m3 = ((x - x.mean()) ** 3).mean()
        m4 = ((x - x.mean()) ** 4).mean()
        g1 = m3 / m2**1.5
        g2 = m4 / m2**2 - 3
        jb = len(x) / 6 * (g1**2 + g2**2 / 4)
        r = rows[lang]
        assert abs(r.skewness - g1) < 1e-4
        assert abs(r.kurtosis_excess - g2) < 1e-4
        assert abs(r.jb_stat - jb) / max(jb, 1.0) < 1e-3


def test_j22_v_bounds_and_margins(spark, sf_dir, reg, duck):
    r = reg["qj22_cramers_v"].fn(spark, sf_dir).collect()[0]
    n, rr, cc = duck.execute(
        "SELECT COUNT(*), COUNT(DISTINCT lang), COUNT(DISTINCT source) FROM documents"
    ).fetchone()
    assert (r.n, r.r, r.c) == (n, rr, cc)
    assert 0.0 <= r.cramers_v <= 1.0
    assert 0.0 <= r.cramers_v_bc <= 1.0
    assert r.chi2 >= 0.0


def test_j23_s_matches_python(spark, sf_dir, reg, duck):
    r = reg["qj23_mann_kendall"].fn(spark, sf_dir).collect()[0]
    daily = duck.execute(
        "SELECT epoch_us(date_trunc('day', ts)) // 86400000000 AS di, COUNT(*) "
        "FROM events GROUP BY 1 ORDER BY di"
    ).fetchall()
    cnts = [c for _, c in daily]
    s = sum(
        (1 if cnts[j] > cnts[i] else -1 if cnts[j] < cnts[i] else 0)
        for i in range(len(cnts))
        for j in range(i + 1, len(cnts))
    )
    assert r.s_stat == s and r.n_days == len(cnts)
    assert r.var_s > 0


def test_j24_runs_matches_python(spark, sf_dir, reg):
    import statistics

    r = reg["qj24_runs_test"].fn(spark, sf_dir).collect()[0]
    e = table(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("rev"))
        .orderBy("d")
        .collect()
    )
    revs = [row.rev for row in daily]
    med = statistics.median(revs)
    signs = [1 if v > med else 0 for v in revs if v != med]
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    assert r.n_runs == runs
    assert r.n_above == sum(signs)
    assert r.n_below == len(signs) - sum(signs)


def test_j25_dw_bounds(spark, sf_dir, reg):
    r = reg["qj25_durbin_watson"].fn(spark, sf_dir).collect()[0]
    assert 0.0 <= r.dw_stat <= 4.0
    assert abs(r.rho_hat - (1 - r.dw_stat / 2)) < 1e-6


def test_j26_ewma_within_window_range(spark, sf_dir, reg):
    rows = reg["qj26_ewma_anomaly"].fn(spark, sf_dir).collect()
    by_day = {r.day_index: r.rev for r in rows}
    for r in rows:
        window = [by_day[d] for d in range(r.day_index - 6, r.day_index + 1) if d in by_day]
        assert min(window) - 1e-6 <= r.ewma <= max(window) + 1e-6
        assert abs(r.deviation - (r.rev - r.ewma)) < 1e-5


def test_j27_mcnemar_matches_python(spark, sf_dir, reg, duck):
    r = reg["qj27_mcnemar_paired"].fn(spark, sf_dir).collect()[0]
    lo, hi = duck.execute(
        "SELECT MIN(epoch_us(date_trunc('day', ts)) // 86400000000),"
        " MAX(epoch_us(date_trunc('day', ts)) // 86400000000) FROM events"
    ).fetchone()
    mid = (lo + hi + 1) // 2
    rows = duck.execute(
        "SELECT user_id, epoch_us(date_trunc('day', ts)) // 86400000000 AS di, event_type FROM events"
    ).fetchall()
    p1, p2 = {}, {}
    for u, di, et in rows:
        if et == "purchase":
            if di < mid:
                p1[u] = True
            else:
                p2[u] = True
    users = {u for u, _, _ in rows}
    b = sum(1 for u in users if p1.get(u) and not p2.get(u))
    c = sum(1 for u in users if not p1.get(u) and p2.get(u))
    assert (r.n10, r.n01) == (b, c)
    if b + c:
        assert abs(r.mcnemar_chi2 - (abs(b - c) - 1) ** 2 / (b + c)) < 1e-6


def test_j28_burstiness_bounds(spark, sf_dir, reg):
    for r in reg["qj28_burstiness_index"].fn(spark, sf_dir).collect():
        assert -1.0 < r.burstiness < 1.0
        assert r.cv > 0
        assert r.mean_gap_us > 0


def test_j29_twa_within_value_range(spark, sf_dir, reg):
    rows = reg["qj29_time_weighted_avg"].fn(spark, sf_dir).collect()
    e = table(spark, sf_dir, "events")
    bounds = {
        r.user_id: (r.lo, r.hi)
        for r in e.groupBy("user_id").agg(F.min("value").alias("lo"), F.max("value").alias("hi")).collect()
    }
    for r in rows:
        lo, hi = bounds[r.user_id]
        assert lo - 1e-6 <= r.twa_value <= hi + 1e-6


def test_j30_cap_respected(spark, sf_dir, reg):
    r = reg["qj30_capped_sessions"].fn(spark, sf_dir).collect()[0]
    assert r.max_dur_us < 12 * 3600 * 1_000_000  # chunks measured from island start
    n_events = table(spark, sf_dir, "events").count()
    assert r.n_events == n_events
    assert r.n_sessions >= 1


# ---------------------------------------------------------------------------
# engine / infra audits


def test_j31_pick_matches_python_for_one_part(spark, sf_dir, reg, duck):
    rows = reg["qj31_bitemporal_asof"].fn(spark, sf_dir).collect()
    assert sum(r.n_parts for r in rows) == duck.execute(
        """SELECT COUNT(DISTINCT l_partkey) FROM lineitem l JOIN orders o
           ON l.l_orderkey = o.o_orderkey
           WHERE o.o_orderdate <= TIMESTAMP '1997-07-01'
             AND l.l_shipdate <= TIMESTAMP '1997-01-01'"""
    ).fetchone()[0]


def test_j32_cascade_counts_consistent(spark, sf_dir, reg, duck):
    r = reg["qj32_fk_cascade_orphans"].fn(spark, sf_dir).collect()[0]
    nd = duck.execute("SELECT COUNT(*) FROM customer WHERE c_acctbal < 0").fetchone()[0]
    assert r.n_deleted_customers == nd
    assert r.n_cascade_orders >= 0 and r.n_cascade_lineitems >= 0
    assert r.revenue_removed >= 0


def test_j33_carriers_agree(spark, sf_dir, reg):
    r = reg["qj33_mergeable_variance"].fn(spark, sf_dir).collect()[0]
    assert r.carriers_agree == 1
    assert r.variance_merged == r.variance_direct
    assert r.variance_merged > 0


def test_j34_publish_gate(spark, sf_dir, reg, duck):
    r = reg["qj34_write_audit_publish"].fn(spark, sf_dir).collect()[0]
    assert r.published == 1 and r.n_violations == 0
    assert r.n_published == duck.execute(
        "SELECT COUNT(*) FROM documents WHERE n_chars > 0"
    ).fetchone()[0]


def test_j35_bins_partition_the_manifest(spark, sf_dir, reg, duck):
    rows = reg["qj35_compaction_binpack"].fn(spark, sf_dir).collect()
    total_files, total_chars = duck.execute(
        "SELECT COUNT(*), SUM(sz) FROM (SELECT SUM(n_chars) AS sz FROM documents GROUP BY source, lang)"
    ).fetchone()
    assert sum(r.n_files for r in rows) == total_files
    assert sum(r.bin_chars for r in rows) == total_chars
    assert [r.bin for r in rows] == list(range(len(rows)))  # contiguous bins


def test_j36_clustered_prunes_at_least_as_well(spark, sf_dir, reg):
    rows = {r.layout: r for r in reg["qj36_minmax_pruning_audit"].fn(spark, sf_dir).collect()}
    assert rows["clustered"].files_scanned <= rows["hashed"].files_scanned
    assert rows["clustered"].rows_matched == rows["hashed"].rows_matched
    assert rows["clustered"].files_scanned >= 1


def test_j37_all_groups_agree(spark, sf_dir, reg, duck):
    rows = reg["qj37_incremental_agg_maintenance"].fn(spark, sf_dir).collect()
    assert all(r.agrees == 1 for r in rows)
    assert sum(r.cnt for r in rows) == duck.execute("SELECT COUNT(*) FROM orders").fetchone()[0]


def test_j38_estimator_sane(spark, sf_dir, reg):
    r = reg["qj38_block_sample_estimate"].fn(spark, sf_dir).collect()[0]
    assert r.n_est > 0
    assert r.count_rel_err < 0.5
    assert r.mean_rel_err < 0.2


def test_j39_cardinality_bounds(spark, sf_dir, reg):
    for r in reg["qj39_groupby_cardinality_audit"].fn(spark, sf_dir).collect():
        assert max(r.d_a, r.d_b) <= r.d_joint <= r.d_a * r.d_b
        assert 0 < r.correlation_factor <= 1.0


def test_j40_backfill_doubles_urgent_only(spark, sf_dir, reg, duck):
    r = reg["qj40_dynamic_partition_overwrite"].fn(spark, sf_dir).collect()[0]
    n, urgent_rev, other_rev = duck.execute(
        """SELECT COUNT(*),
                  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(25,6)) ELSE 0 END) AS DOUBLE),
                  CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(25,6)) ELSE 0 END) AS DOUBLE)
           FROM orders"""
    ).fetchone()
    assert r.n_total == n
    assert abs(r.urgent_revenue - 2 * urgent_rev) / urgent_rev < 1e-9
    assert abs(r.other_revenue - other_rev) / other_rev < 1e-9


def test_j41_ap_bounds(spark, sf_dir, reg):
    r = reg["qj41_average_precision"].fn(spark, sf_dir).collect()[0]
    assert 0.0 <= r.avg_precision <= 1.0
    assert 0 < r.n_pos <= r.n_users


def test_j42_ratios_partition_unity(spark, sf_dir, reg):
    for r in reg["qj42_charclass_profile"].fn(spark, sf_dir).collect():
        for v in (r.digit_ratio, r.space_ratio, r.punct_ratio):
            assert 0.0 <= v <= 1.0
        assert r.digit_ratio + r.space_ratio + r.punct_ratio <= 1.0  # disjoint classes


def test_j43_tail_shares_bounded(spark, sf_dir, reg):
    for r in reg["qj43_doc_length_percentile"].fn(spark, sf_dir).collect():
        assert r.n_low_tail <= 0.05 * r.n_docs + 1e-9
        assert r.n_high_tail >= 0.05 * r.n_docs - 1e-9
        assert r.low_cut < r.high_cut or r.low_cut == -1


def test_j44_generations_partition(spark, sf_dir, reg, duck):
    r = reg["qj44_union_schema_reconcile"].fn(spark, sf_dir).collect()[0]
    n = duck.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    assert r.n_total == n
    assert r.n_legacy + r.n_modern == n


def test_j45_positions_complete(spark, sf_dir, reg):
    rows = {r.position: r for r in reg["qj45_boilerplate_position"].fn(spark, sf_dir).collect()}
    assert set(rows) <= {"head", "middle", "tail"}
    assert "head" in rows
    for r in rows.values():
        assert 0.0 <= r.shared_frac <= 1.0
        assert r.n_shared <= r.n_segments


def test_j46_weekday_prefix_closed_form():
    """The closed form W(b+1)-W(a+1) == brute-force weekday count in
    (a, b], checked over a grid of date pairs crossing month/year/epoch
    boundaries — a pure-python test of the formula itself."""

    def w(d: dt.date) -> int:
        m = (d - dt.date(1969, 12, 29)).days
        return 5 * (m // 7) + min(m % 7, 5)

    def brute(a: dt.date, b: dt.date) -> int:
        n, d = 0, a + dt.timedelta(days=1)
        while d <= b:
            if d.weekday() < 5:
                n += 1
            d += dt.timedelta(days=1)
        return n

    anchors = [dt.date(1995, 1, 1), dt.date(1996, 2, 28), dt.date(1999, 12, 31), dt.date(2000, 2, 27)]
    for a in anchors:
        for span in (0, 1, 2, 5, 6, 7, 13, 30, 365, 366):
            b = a + dt.timedelta(days=span)
            assert w(b + dt.timedelta(days=1)) - w(a + dt.timedelta(days=1)) == brute(a, b), (a, b)


def test_j46_latency_consistent(spark, sf_dir, reg):
    for r in reg["qj46_business_days_latency"].fn(spark, sf_dir).collect():
        assert 0 <= r.avg_bdays <= r.max_bdays
        assert r.bdays_total >= 0


def test_j47_partitions_cover_and_balance(spark, sf_dir, reg, duck):
    rows = reg["qj47_range_partition_balance"].fn(spark, sf_dir).collect()
    total = duck.execute("SELECT COUNT(*) FROM orders").fetchone()[0]
    assert sum(r.n_rows for r in rows) == total
    for r in rows:
        assert 0.2 <= r.balance_ratio <= 2.0  # $1000 quantization keeps buckets small


def test_j48_matches_numpy(spark, sf_dir, reg, duck):
    import numpy as np

    r = reg["qj48_welch_ttest"].fn(spark, sf_dir).collect()[0]
    en = np.array(duck.execute("SELECT n_chars FROM documents WHERE lang='en'").fetchall(), dtype=np.float64).ravel()
    de = np.array(duck.execute("SELECT n_chars FROM documents WHERE lang='de'").fetchall(), dtype=np.float64).ravel()
    q1, q2 = en.var(ddof=1) / len(en), de.var(ddof=1) / len(de)
    t = (en.mean() - de.mean()) / math.sqrt(q1 + q2)
    df = (q1 + q2) ** 2 / (q1**2 / (len(en) - 1) + q2**2 / (len(de) - 1))
    assert (r.n1, r.n2) == (len(en), len(de))
    assert abs(r.t_stat - t) < 1e-4
    assert abs(r.df_welch - df) / df < 1e-4


def test_j49_overlap_bounded_by_incident_window(spark, sf_dir, reg):
    for r in reg["qj49_interval_intersection_volume"].fn(spark, sf_dir).collect():
        assert r.n_overlapping <= r.n_user_spans
        assert r.overlap_seconds <= 3600.0 * r.n_overlapping + 1e-6


def test_j50_matches_duckdb_join(spark, sf_dir, reg, duck):
    rows = {r.pri: r for r in reg["qj50_cogrouped_applyinpandas"].fn(spark, sf_dir).collect()}
    for pri, n_orders, n_lines, rev_cents, late in duck.execute(
        """SELECT pri, COUNT(*), SUM(n_lines), SUM(rev_cents), SUM(late_lines) FROM (
             SELECT o.o_orderkey, o.o_orderpriority AS pri,
                    COUNT(l.l_orderkey) AS n_lines,
                    COALESCE(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)), 0) AS rev_cents,
                    COALESCE(SUM(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END), 0) AS late_lines
             FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
             GROUP BY 1, 2) GROUP BY pri"""
    ).fetchall():
        r = rows[pri]
        assert (r.n_orders, r.n_lines, r.rev_cents, r.late_lines) == (
            n_orders,
            n_lines,
            rev_cents,
            late,
        )


# ---------------------------------------------------------------------------
# l11-l14 round-7 conversion twins: independent python re-derivations of
# the fixed models (hash-picked hyperplanes / centroids, md5 sign matrix)
# with the engine's quantization (pround = floor(x*10^nd + 0.5)/10^nd and
# sequential left-fold dot products) replicated bit-for-bit in python.


def _pr(x, nd=6):
    s = 10.0**nd
    return math.floor(x * s + 0.5) / s


def _seqdot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _md5rank(vec_id):
    import hashlib

    return (int(hashlib.md5(str(vec_id).encode()).hexdigest()[:8], 16), vec_id)


def _emb(duck):
    rows = duck.execute("SELECT vec_id, embedding FROM embeddings ORDER BY vec_id").fetchall()
    return [(vid, [float(x) for x in v]) for vid, v in rows]


def test_l11_matches_python_rederivation(spark, sf_dir, reg, duck):
    emb = _emb(duck)
    hps = sorted(emb, key=lambda r: _md5rank(r[0]))[:16]
    hist = {}
    for vid, v in emb:
        for t in range(4):
            bucket = 0
            for b in range(4):
                if _pr(_seqdot(v, hps[t * 4 + b][1]), 6) >= 0:
                    bucket |= 1 << b
            hist[(t, bucket)] = hist.get((t, bucket), 0) + 1
    got = {(r.table_id, r.bucket): r.n_vectors for r in reg["ql11_lsh_routing_audit"].fn(spark, sf_dir).collect()}
    assert got == hist


def test_l12_band_totals_and_pair_bounds(spark, sf_dir, reg, duck):
    n_sig_docs = duck.execute(
        "SELECT COUNT(DISTINCT doc_id) FROM (SELECT doc_id FROM documents WHERE len(string_split(text,' ')) >= 3)"
    ).fetchone()[0]
    rows = reg["ql12_minhash_band_routing"].fn(spark, sf_dir).collect()
    assert [r.band for r in rows] == [0, 1, 2, 3]
    for r in rows:
        assert 1 <= r.n_buckets <= n_sig_docs
        assert r.max_bucket >= 1
        assert r.candidate_pairs >= r.max_bucket * (r.max_bucket - 1) // 2


def test_l13_matches_python_lloyd_step(spark, sf_dir, reg, duck):
    emb = _emb(duck)
    cents = sorted(emb, key=lambda r: _md5rank(r[0]))[:8]

    def assign(vecs_by_id, cent_list, dist):
        out = {}
        for vid, v in vecs_by_id:
            best = min(cent_list, key=lambda c: (dist(v, c[1]), c[0]))
            out[vid] = best[0]
        return out

    d0 = lambda v, c: _pr(_seqdot([x - y for x, y in zip(v, c)], [x - y for x, y in zip(v, c)]), 6)
    a0 = assign(emb, cents, d0)
    # update: per-dim mean of round-6 components, decimal-exact then round-9
    from collections import defaultdict

    member = defaultdict(list)
    for vid, v in emb:
        member[a0[vid]].append(v)
    c1 = {}
    for cid, vs in member.items():
        c1[cid] = [_pr(sum(_pr(v[d], 6) for v in vs) / len(vs), 9) for d in range(64)]

    def d1(v, c):
        return _pr(sum(_pr((_pr(x, 6) - y) * (_pr(x, 6) - y), 9) for x, y in zip(v, c)), 6)

    a1 = assign(emb, list(c1.items()), d1)
    rows = {r.cluster: r for r in reg["ql13_lloyd_step_audit"].fn(spark, sf_dir).collect()}
    assert set(rows) == {c[0] for c in cents}
    for cid in rows:
        r = rows[cid]
        assert r.n_init == sum(1 for v in a0.values() if v == cid)
        assert r.n_after == sum(1 for v in a1.values() if v == cid)
        assert r.n_stayed == sum(1 for vid in a0 if a0[vid] == cid and a1[vid] == cid)
    n = len(emb)
    assert sum(r.n_init for r in rows.values()) == n
    assert sum(r.n_after for r in rows.values()) == n


def test_l14_ratio_normalizes_and_matches_python(spark, sf_dir, reg, duck):
    import hashlib

    emb = _emb(duck)
    rows = sorted(reg["ql14_projection_variance_audit"].fn(spark, sf_dir).collect(), key=lambda r: r.component)
    assert all(r.n == len(emb) for r in rows)
    assert abs(sum(r.var_ratio for r in rows) - 1.0) < 1e-3
    for c in (0, 5):
        signs = [
            1.0 if int(hashlib.md5(f"{c}|{i}".encode()).hexdigest()[:8], 16) % 2 == 0 else -1.0
            for i in range(1, 65)
        ]
        ps = [_pr(_seqdot(signs, v) / 8.0, 6) for _, v in emb]
        mean = _pr(sum(ps) / len(ps), 9)
        ex2 = _pr(sum(_pr(p * p, 6) for p in ps) / len(ps), 9)
        assert abs(rows[c].mean_proj - _pr(mean, 6)) < 1e-9
        assert abs(rows[c].var_proj - _pr(ex2 - mean * mean, 6)) < 1e-9
