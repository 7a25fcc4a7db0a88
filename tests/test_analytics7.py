"""Property tests for the round-6 i-suite (operators/analytics6.py):
independent python re-derivations (OLS vs numpy, CUSUM recompute, i02
diff rules), algebra identities (incremental edge completeness, salted
and mergeable reconciliations), and bound checks — plus the round-5
verdict items: the fixed-budget sampling lint and the bounded-lattice
window plan pins.
"""

import math
import re

import pytest
from pyspark.sql import functions as F

from pyspark_distributed_kmodes_spark.registry import load_all
from pyspark_distributed_kmodes_spark.sources.tables import table


@pytest.fixture(scope="module")
def reg():
    return load_all()


# ---------------------------------------------------------------------------
# i-suite properties


def test_i01_incremental_edges_complete(spark, sf_dir, reg):
    r = reg["qi01_incremental_neardup_edges"].fn(spark, sf_dir).collect()[0]
    assert r.incremental_complete
    assert r.n_missing == 0 and r.n_extra == 0
    # base-base and delta-touching partition the full edge set
    assert r.n_base_base + r.n_delta_touching == r.n_full
    assert r.n_incremental == r.n_full


def test_i02_diff_counts_match_rules(spark, sf_dir, reg):
    r = reg["qi02_snapshot_diff_timetravel"].fn(spark, sf_dir).collect()[0]
    docs = [(x.doc_id, x.text) for x in table(spark, sf_dir, "documents").collect()]
    n_del = sum(1 for i, _ in docs if i % 17 == 3)
    n_add = sum(1 for i, _ in docs if i % 13 == 5)
    n_chg = sum(1 for i, t in docs if i % 17 != 3 and i % 11 == 0 and t.upper() != t)
    assert r.n_v1 == len(docs)
    assert r.n_deleted == n_del
    assert r.n_added == n_add
    assert r.n_changed == n_chg
    assert r.n_v2 == len(docs) - n_del + n_add
    assert r.n_v1 == r.n_deleted + r.n_changed + r.n_unchanged


def test_i03_multimodal_norms_match_numpy(spark, sf_dir, reg):
    import numpy as np

    rows = reg["qi03_multimodal_join_pipeline"].fn(spark, sf_dir).collect()
    assert rows and all(r.n_docs > 0 for r in rows)
    emb = {r.vec_id: np.array(r.embedding, dtype=float) for r in table(spark, sf_dir, "embeddings").collect()}
    docs = [(r.doc_id, r.source) for r in table(spark, sf_dir, "documents").collect()]
    lab = {r.vec_id: r.label for r in table(spark, sf_dir, "embeddings").collect()}
    want = {}
    for did, src in docs:
        if did in emb:
            want.setdefault((src, lab[did]), 0.0)
            want[(src, lab[did])] += float(np.sqrt((emb[did] ** 2).sum()))
    for r in rows:
        assert abs(r.norm_sum - want[(r.source, r.label)]) < 1e-5


def test_i04_halves_partition_the_table(spark, sf_dir, reg):
    rows = reg["qi04_subsample_stability"].fn(spark, sf_dir).collect()
    total = table(spark, sf_dir, "lineitem").count()
    assert sum(r.n for r in rows) == total
    assert {r.half for r in rows} == {0, 1}


def test_i05_merged_rollup_agrees(spark, sf_dir, reg):
    rows = reg["qi05_grouped_quantile_rollup"].fn(spark, sf_dir).collect()
    assert all(r.merged_agrees for r in rows)
    for r in rows:
        assert r.p50 <= r.p90
    allrow = [r for r in rows if r.grp == "ALL"]
    assert len(allrow) == 1 and allrow[0].n == sum(r.n for r in rows if r.grp != "ALL")


def test_i06_ols_matches_numpy(spark, sf_dir, reg):
    import numpy as np

    rows = {r.l_returnflag: r for r in reg["qi06_grouped_ols_regression"].fn(spark, sf_dir).collect()}
    li = table(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity", "l_extendedprice").collect()
    by_flag = {}
    for r in li:
        by_flag.setdefault(r.l_returnflag, []).append((r.l_quantity, r.l_extendedprice))
    for flag, pts in by_flag.items():
        x = np.array([p[0] for p in pts])
        y = np.array([p[1] for p in pts])
        slope, intercept = np.polyfit(x, y, 1)
        r2 = np.corrcoef(x, y)[0, 1] ** 2
        assert abs(rows[flag].slope - slope) < 1e-3 * max(1.0, abs(slope))
        assert abs(rows[flag].intercept - intercept) < 1e-2 * max(1.0, abs(intercept))
        assert abs(rows[flag].r2 - r2) < 1e-4


def test_i07_overlap_bounds(spark, sf_dir, reg):
    rows = reg["qi07_audience_overlap"].fn(spark, sf_dir).collect()
    assert len(rows) == 10  # C(5,2) event-type pairs
    for r in rows:
        assert 0.0 <= r.jaccard <= 1.0
        assert r.n_both <= min(r.n_a, r.n_b)


def test_i08_rfm_covers_all_ordering_customers(spark, sf_dir, reg):
    rows = reg["qi08_rfm_segments"].fn(spark, sf_dir).collect()
    n_cust = table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    assert sum(r.n_customers for r in rows) == n_cust
    for r in rows:
        assert 1 <= r.r_score <= 4 and 1 <= r.f_score <= 4 and 1 <= r.m_score <= 4


def test_i09_mi_total_nonnegative(spark, sf_dir, reg):
    rows = reg["qi09_mutual_information"].fn(spark, sf_dir).collect()
    mi = sum(r.mi_term9 for r in rows)
    assert mi >= -1e-9  # MI >= 0 up to the pround(9) grid
    n = sum(r.n_xy for r in rows)
    assert n == table(spark, sf_dir, "lineitem").count()


def test_i10_lev_bounds(spark, sf_dir, reg):
    rows = reg["qi10_levenshtein_blocked_join"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_close <= r.n_candidate_pairs
        assert r.min_lev <= r.avg_lev


def test_i11_cusum_matches_python(spark, sf_dir, reg):
    r = reg["qi11_cusum_changepoint"].fn(spark, sf_dir).collect()[0]
    daily = {}
    for x in table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("d"), "o_totalprice"
    ).collect():
        daily[x.d] = daily.get(x.d, 0.0) + x.o_totalprice
    days = sorted(daily)
    mu = sum(daily.values()) / len(days)
    c, best_day, best_c = 0.0, None, -1.0
    for d in days:
        c += daily[d] - mu
        if abs(c) > best_c:
            best_c, best_day, best_val = abs(c), d, c
    assert r.n_days == len(days)
    assert abs(r.daily_mean - mu) < 1e-3
    assert r.changepoint_day == (best_day - __import__("datetime").date(1970, 1, 1)).days
    assert abs(r.cusum_peak - best_val) < 1e-2


def test_i12_acf_bounds(spark, sf_dir, reg):
    rows = reg["qi12_autocorrelation"].fn(spark, sf_dir).collect()
    assert [r.lag for r in rows] == [1, 7, 30]
    for r in rows:
        assert -1.0 - 1e-9 <= r.acf <= 1.0 + 1e-9
        assert r.n_pairs > 0


def test_i13_gains_monotone_and_complete(spark, sf_dir, reg):
    rows = sorted(reg["qi13_decile_gains"].fn(spark, sf_dir).collect(), key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, 11))
    cums = [r.cum_capture for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(cums, cums[1:]))
    assert abs(cums[-1] - 1.0) < 1e-6


def test_i14_idempotent_everywhere(spark, sf_dir, reg):
    rows = reg["qi14_normalization_idempotence"].fn(spark, sf_dir).collect()
    assert rows and all(r.idempotent for r in rows)
    assert all(r.n_not_idempotent == 0 for r in rows)


def test_i15_merge_agrees_rowwise(spark, sf_dir, reg):
    rows = reg["qi15_mergeable_topk"].fn(spark, sf_dir).collect()
    assert [r.rank for r in rows] == list(range(1, 21))
    assert all(r.merge_agrees for r in rows)
    prices = [r.o_totalprice for r in rows]
    assert all(a >= b for a, b in zip(prices, prices[1:]))


def test_i17_hhi_bounds(spark, sf_dir, reg):
    rows = reg["qi17_hhi_concentration"].fn(spark, sf_dir).collect()
    for r in rows:
        # sum of squared shares is bounded by [1/n, top1] and >= top1^2
        assert 1.0 / r.n_suppliers - 1e-6 <= r.hhi <= 1.0 + 1e-9
        assert r.hhi >= r.top1_share**2 - 1e-6
        assert r.hhi <= r.top1_share + 1e-6


def test_i18_i19_i21_audit_gates_hold(spark, sf_dir, reg):
    assert all(r.salted_agrees for r in reg["qi18_salted_agg_audit"].fn(spark, sf_dir).collect())
    assert all(r.exactly_once for r in reg["qi19_replay_dedup_idempotency"].fn(spark, sf_dir).collect())
    r = reg["qi21_join_cardinality_audit"].fn(spark, sf_dir).collect()[0]
    assert r.estimate_exact and r.predicted == r.actual


def test_i20_gap_bounds(spark, sf_dir, reg):
    rows = reg["qi20_longest_gap_runs"].fn(spark, sf_dir).collect()
    assert len(rows) == 25
    n_days = rows[0].n_days
    for r in rows:
        assert r.n_days == n_days  # shared global spine
        assert 0 <= r.longest_gap <= r.n_zero_days <= r.n_days


def test_i22_skew_profile_bounds(spark, sf_dir, reg):
    rows = reg["qi22_key_skew_profile"].fn(spark, sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.p99_freq <= r.max_freq
        assert 0.0 < r.top1_share <= 1.0
        assert r.freq_cv >= 0.0
        assert r.n_keys <= r.n_rows


def test_i23_compaction_budget(spark, sf_dir, reg):
    rows = reg["qi23_latest_n_compaction"].fn(spark, sf_dir).collect()
    n_users = table(spark, sf_dir, "events").select("user_id").distinct().count()
    kept = sum(r.n_kept for r in rows)
    assert kept <= 3 * n_users
    assert rows[0].n_total == kept + rows[0].n_dropped


def test_i24_bounce_rate_bounds(spark, sf_dir, reg):
    rows = reg["qi24_session_bounce_rate"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.bounce_rate <= 1.0
        assert r.n_bounces <= r.n_sessions


def test_i25_integrity_flags_consistent(spark, sf_dir, reg):
    rows = reg["qi25_referential_integrity"].fn(spark, sf_dir).collect()
    assert len(rows) == 4
    for r in rows:
        assert (r.n_orphans == 0) == r.intact
        assert 0.0 <= r.coverage <= 1.0


def test_i26_nearest_beats_both_asof_sides(spark, sf_dir, reg):
    """Spot-check vs python: for every purchase the matched click is
    truly the global min |Δt| among the user's clicks."""
    got = {r.purchase_id: (r.click_id, r.delta_us) for r in reg["qi26_nearest_event_join"].fn(spark, sf_dir).collect()}
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "event_type", F.unix_micros("ts").alias("us")).collect()
    clicks = {}
    for e in ev:
        if e.event_type == "click":
            clicks.setdefault(e.user_id, []).append((e.us, e.event_id))
    for e in ev:
        if e.event_type != "purchase" or e.user_id not in clicks:
            continue
        best = min((abs(e.us - cus), cus, cid) for cus, cid in clicks[e.user_id])
        assert got[e.event_id][1] == best[0], e.event_id
    n_purch_with_clicks = sum(
        1 for e in ev if e.event_type == "purchase" and e.user_id in clicks
    )
    assert len(got) == n_purch_with_clicks


def test_i27_old_generation_null_filled(spark, sf_dir, reg):
    rows = reg["qi27_schema_evolution"].fn(spark, sf_dir).collect()
    for r in rows:
        assert r.n_null_lang == r.n_v1
        assert r.n_docs == r.n_v1 + r.n_v2


def test_i28_churn_bounds(spark, sf_dir, reg):
    rows = reg["qi28_churn_by_segment"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.churn_rate <= 1.0
        assert r.n_churned <= r.n_active_customers


# ---------------------------------------------------------------------------
# Verdict item 3: the fixed-budget sampling lint (the h12 lesson as a test)

# Ops that legitimately use `% k == 0` as a deterministic PARTITION of the
# data (base/delta splits, shard assignment, replay subsets) — the modulo
# there selects a CONSTANT FRACTION on purpose because both sides of the
# split are processed in full. The anti-pattern the lint hunts is modulo
# used to pick a "small" sample that then feeds a pair join: that sample
# grows linearly with the corpus and the pair join quadratically (the h12
# incident, fixed to hash-rank top-K budgets in commit 7b768a2).
_SPLIT_ALLOWLIST = {
    # function name -> why `% const == 0` is a split, not a sample
    "qg02_incremental_dedup_reconcile": "base/delta partition; both sides fully processed",
    "qi01_incremental_neardup_edges": "base/delta partition; both sides fully processed",
    "qi02_snapshot_diff_timetravel": "CDC rule partition (delete/update/insert classes)",
    "qi19_replay_dedup_idempotency": "duplicate-delivery subset; dedup consumes ALL rows",
    "qi27_schema_evolution": "generation split; both generations fully read back",
    "qh16_mergeable_quantiles": "parity split into two merged halves (all rows kept)",
    "qi15_mergeable_topk": "shard assignment (all rows kept)",
    "qi04_subsample_stability": "md5 disjoint halves; both halves fully aggregated",
    "qi18_salted_agg_audit": "salt assignment (all rows kept)",
    "qh21_bucket_prefilter_audit": "eval/corpus partition; both sides fully processed",
}

_MOD_SAMPLE = re.compile(r"%\s*\d+\s*==\s*0")
_PAIR_JOIN = re.compile(
    r"crossJoin\((?!F\.broadcast)|doc_a.*<.*doc_b|\.\s*join\([^)]*<"
)


def _stride_sample_feeding_pairs(src: str, fn_name: str) -> bool:
    """True when a function body both stride-samples (% k == 0) and
    builds a pair join — the scale anti-pattern, unless allowlisted
    as a declared data partition."""
    if fn_name in _SPLIT_ALLOWLIST:
        return False
    return bool(_MOD_SAMPLE.search(src)) and bool(_PAIR_JOIN.search(src))


def test_sampling_lint_fires_on_planted_stride_pair_op():
    planted = """
    anchors = emb.filter(F.col("vec_id") % 13 == 0)   # stride sample!
    pairs = anchors.crossJoin(emb)                     # pair join
    """
    assert _stride_sample_feeding_pairs(planted, "planted_bad_op")


def test_no_stride_sampled_pair_ops_in_operators():
    """Scan every registered operator's source: a `% k == 0` stride
    filter feeding a pair join must not exist outside the declared
    split allowlist (where modulo partitions rather than samples)."""
    import inspect

    offenders = []
    for name, q in load_all().items():
        try:
            src = inspect.getsource(q.fn)
        except (OSError, TypeError):
            continue
        if _stride_sample_feeding_pairs(src, name):
            offenders.append(name)
    assert not offenders, offenders


def test_split_allowlist_entries_still_exist():
    reg = load_all()
    for name in _SPLIT_ALLOWLIST:
        assert name in reg, f"allowlist entry {name} no longer registered"


# ---------------------------------------------------------------------------
# Verdict item 4: bounded-lattice window plan pins

from tests.test_plans_analytics import _global_row_windows  # noqa: E402


def _plan(spark, sf_dir, key):
    df = load_all()[key].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def _spec_is_global(line: str) -> bool:
    """True when a printed Window line's windowspecdefinition has NO
    partition column: every pre-frame argument is a sort spec (has
    ASC/DESC). A partitioned window lists bare partition columns first,
    whether or not an ordering follows."""
    for m in re.finditer(r"windowspecdefinition\(", line):
        tail = line[m.end() :]
        head = tail.split("specifiedwindowframe", 1)[0]
        args = [a.strip() for a in head.split(",") if a.strip()]
        if not args:
            return True
        if all((" ASC" in a or " DESC" in a) for a in args):
            return True
    return False


def _raw_global_windows(plan: str) -> int:
    """Partition-less Window nodes whose input is a RAW SCAN rather
    than an aggregate (bounded lattice): in the printed tree the
    node's input subtree follows it, so if a file scan appears after
    the window line before any HashAggregate, raw rows feed the
    window — the single-partition scale hazard."""
    lines = plan.splitlines()
    hits = 0
    for idx, line in enumerate(lines):
        stripped = line.strip().lstrip(":+- ")
        if stripped.startswith("Window ") and _spec_is_global(stripped):
            for nxt in lines[idx + 1 :]:
                if "HashAggregate" in nxt or "SortAggregate" in nxt:
                    break  # aggregate feeds this window
                if "FileScan" in nxt or "Scan parquet" in nxt:
                    hits += 1
                    break
    return hits


LATTICE_PINNED = {
    # queries whose docstrings promise global windows only over bounded
    # aggregates (value lattices / histograms / day series); h16/i05
    # each DECLARE one raw global rank window — the direct-path gate
    # their merged construction is audited against (test-scale only,
    # stated in the docstring) — so exactly one raw window is pinned.
    "qf23_percentile_disc": 0,
    "qg09_vocab_growth": 0,
    "qh05_grouped_ks_drift": 0,
    "qh16_mergeable_quantiles": 1,
    "qi05_grouped_quantile_rollup": 1,
    "qi11_cusum_changepoint": 0,
    "qi13_decile_gains": 0,
    "qi22_key_skew_profile": 0,
    # round-6 staged j-suite: every partition-less window must consume
    # an aggregate (day lattice, score dictionary, file manifest,
    # price-bucket lattice) — never raw rows
    "qj24_runs_test": 0,
    "qj25_durbin_watson": 0,
    "qj35_compaction_binpack": 0,
    "qj41_average_precision": 0,
    "qj47_range_partition_balance": 0,
    # k-suite bounded-lattice windows (length/price/day/count lattices)
    "qk03_kruskal_wallis": 0,
    "qk11_best_single_split": 0,
    "qk30_pareto_point": 0,
    "qk32_wasserstein_distance": 0,
    "qk33_cramer_von_mises": 0,
    "qk36_abc_classification": 0,
    "qk47_median_ci": 0,
}


@pytest.mark.parametrize("key,allowed", sorted(LATTICE_PINNED.items()))
def test_lattice_windows_consume_aggregates(spark, sf_dir, key, allowed):
    plan = _plan(spark, sf_dir, key)
    assert _raw_global_windows(plan) == allowed, f"{key}:\n{plan}"


def test_i_suite_no_cartesians(spark, sf_dir):
    """No cartesian products on data-sized relations. i01 assembles its
    1-row output via scalar crossJoins of broadcast aggregates (the
    established crossJoin(F.broadcast(tot)) idiom) which compile to
    BroadcastNestedLoopJoins over single-row inputs — allowed there,
    banned in the pair-building queries."""
    for key in ["qi10_levenshtein_blocked_join", "qi26_nearest_event_join"]:
        plan = _plan(spark, sf_dir, key)
        assert "CartesianProduct" not in plan, key
        assert "BroadcastNestedLoopJoin" not in plan, key
    assert "CartesianProduct" not in _plan(spark, sf_dir, "qi01_incremental_neardup_edges")
