"""Physical-plan shape assertions for the round-4 analytics operators —
the scale-hygiene properties their docstrings promise (SURVEY.md §4):
blocked joins instead of cartesians, per-partition windows instead of
global row windows, top-k instead of global sorts.
"""

from pyspark_distributed_kmodes_spark.plans.inspect import formatted_plan
from pyspark_distributed_kmodes_spark.registry import load_all


def _plan(spark, sf_dir, key):
    df = load_all()[key].fn(spark, sf_dir)
    # simple-mode executed plan: Window nodes print their spec inline
    return df._jdf.queryExecution().executedPlan().toString()


def _bracket_groups(s: str) -> int:
    """Count top-level [...] groups in a plan line tail."""
    depth = 0
    groups = 0
    for ch in s:
        if ch == "[":
            if depth == 0:
                groups += 1
            depth += 1
        elif ch == "]":
            depth = max(depth - 1, 0)
    return groups


def _global_row_windows(plan: str) -> int:
    """Window operators WITHOUT a partition spec (the single-partition
    hazard). In the simple executed plan a partitioned window prints
    `Window [exprs], [part], [order]` (3 top-level groups) while a
    global one prints `Window [exprs], [order]` (2 groups)."""
    hits = 0
    for line in plan.splitlines():
        stripped = line.strip().lstrip(":+- ")
        if stripped.startswith("Window ") or stripped.startswith("WindowGroupLimit"):
            if stripped.startswith("Window ") and _bracket_groups(stripped) == 2:
                hits += 1
    return hits


def test_d03_no_global_window_over_events(spark, sf_dir):
    """The watermark prefix scan's only global-ordered window runs over
    per-block maxima (#events / 1024 rows), never over raw events: the
    plan has exactly one empty-partition Window, and it sits above the
    block-max aggregation, not the scan."""
    plan = _plan(spark, sf_dir, "qd03_watermark_batch_twin")
    assert _global_row_windows(plan) == 1, plan


def test_d04_linkage_no_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "qd04_record_linkage")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_d05_interval_windows_are_user_partitioned(spark, sf_dir):
    plan = _plan(spark, sf_dir, "qd05_interval_coalesce")
    assert _global_row_windows(plan) == 0, plan


def test_d06_skyline_global_window_only_on_candidates(spark, sf_dir):
    """Phase-2's exact sweep is the only global window (bounded
    candidate set); phase-1 pruning adds one more over bucket maxima —
    both run over tiny inputs, and there is no all-pairs join."""
    plan = _plan(spark, sf_dir, "qd06_pareto_frontier")
    assert "CartesianProduct" not in plan
    assert _global_row_windows(plan) <= 2, plan


def test_d09_gini_rank_window_is_source_partitioned(spark, sf_dir):
    plan = _plan(spark, sf_dir, "qd09_gini_concentration")
    assert _global_row_windows(plan) == 0, plan


def test_f09_topup_uses_takeordered_not_global_rownumber(spark, sf_dir):
    plan = _plan(spark, sf_dir, "qf09_stratified_min_sample")
    assert "TakeOrderedAndProject" in plan, plan


def test_f18_decontamination_no_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "qf18_ngram_decontamination")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_f16_factfact_join_no_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "qf16_ship_latency_buckets")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# round-6 staged suites: plan-shape pins


def test_j31_bitemporal_filters_pushed(spark, sf_dir):
    """Both temporal cuts must reach the parquet scans as pushed
    filters — the bitemporal pick scans only the pre-cut subset."""
    plan = _plan(spark, sf_dir, "qj31_bitemporal_asof")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    assert "PushedFilters: [IsNotNull(o_orderdate), LessThanOrEqual(o_orderdate" in plan


def test_j50_uses_cogroup_node(spark, sf_dir):
    """The cogrouped applyInPandas op must compile to the dedicated
    FlatMapCoGroupsInPandas node (both sides shuffled ONCE on the
    bucket key), not to a join + groupBy emulation."""
    plan = _plan(spark, sf_dir, "qj50_cogrouped_applyinpandas")
    assert "FlatMapCoGroupsInPandas" in plan


def test_k19_collectmetrics_in_plan(spark, sf_dir):
    """observe() must appear as a CollectMetrics node inside the plan —
    the zero-extra-pass audit hook the docstring promises."""
    plan = _plan(spark, sf_dir, "qk19_observed_scan_metrics")
    assert "CollectMetrics" in plan


def test_k21_grouping_sets_single_expand(spark, sf_dir):
    """All four grouping-set levels must come from ONE Expand feeding
    one aggregation chain — not four separate scans."""
    plan = _plan(spark, sf_dir, "qk21_grouping_id_decode")
    assert plan.count("Expand") == 1
    assert plan.count("Scan parquet") + plan.count("FileScan") <= 2  # one logical scan


def test_k48_lang_filter_pushed_j48_k07(spark, sf_dir):
    """The two-stratum tests must push the lang predicate into the
    scan (In or EqualTo filters), never scan-all-then-filter."""
    for key in ("qj48_welch_ttest", "qk07_effect_size_d"):
        plan = _plan(spark, sf_dir, key)
        assert "PushedFilters: [In(lang" in plan or "EqualTo(lang" in plan, key


def test_k11_topk_is_take_ordered(spark, sf_dir):
    """The best-split argmax must compile to TakeOrderedAndProject,
    not a global sort + limit."""
    plan = _plan(spark, sf_dir, "qk11_best_single_split")
    assert "TakeOrderedAndProject" in plan
