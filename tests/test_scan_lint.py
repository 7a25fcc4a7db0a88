"""Plan-scan-amplification lint tests (round-6 verdict items 4+5):
the lint must fire on a planted uncheckpointed iterative self-join
(the k13 anti-pattern) and stay quiet on the checkpointed form, and
the repo's known iterative operators are pinned to materialize per
iteration — their static plans may scan each source table only a
small constant number of times, so a refactor that drops a
localCheckpoint resurfaces here, not at 100 TB.
"""

import pytest
from pyspark.sql import functions as F

from pyspark_distributed_kmodes_spark.plans.inspect import formatted_plan
from pyspark_distributed_kmodes_spark.registry import load_all
from pyspark_distributed_kmodes_spark.sources.tables import table
from tools.scan_lint import ALLOWLIST, lint_plan, table_scan_counts


@pytest.fixture(scope="module")
def reg():
    return load_all()


def _tiny_matrix(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.col("event_type").alias("src"))
        .agg(F.count(F.lit(1)).cast("double").alias("p"))
        .withColumn("dst", F.col("src"))
    )


def _square_loop(p, rounds=3):
    """Uncheckpointed matrix-squaring: lineage doubles per round."""
    for _ in range(rounds):  # 2^3 = 8 scans > 4
        a, b = p.alias("a"), p.alias("b")
        p = (
            a.join(b, F.col("a.dst") == F.col("b.src"))
            .groupBy(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
            .agg(F.sum(F.col("a.p") * F.col("b.p")).alias("p"))
        )
    return p


def test_lint_fires_on_planted_uncheckpointed_loop(spark, sf_dir):
    p = _square_loop(_tiny_matrix(spark, sf_dir))
    plan = formatted_plan(p)
    assert table_scan_counts(plan).get("events", 0) >= 8
    assert lint_plan("planted_loop", plan), "lint must flag the uncheckpointed loop"


def test_plan_only_mode_counts_match_eager(spark, sf_dir, reg):
    """scan_lint/plan_report run in PLAN-ONLY mode (functions/lineage.py:
    lazy cut_lineage + AQE off). The lineage cut appears as a LogicalRDD
    in the static plan either way, so per-table scan multiplicities must
    be IDENTICAL to the eager execution mode — and the planted
    uncheckpointed loop must still fire in the mode the tools actually
    run in. This is the twin that licenses the round-9 switch."""
    import os

    from pyspark_distributed_kmodes_spark.functions.lineage import plan_only_mode

    keys = [
        "qk13_markov_stationary",       # per-iteration cut_lineage loop
        "qd01_neardup_pagerank",        # power iteration, checkpointed
        "qm35_empirical_bayes_shrinkage",  # checkpointed shared cells table
    ]
    eager = {
        k: table_scan_counts(formatted_plan(reg[k].fn(spark, sf_dir))) for k in keys
    }
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        plan_only_mode(spark)
        for k in keys:
            got = table_scan_counts(formatted_plan(reg[k].fn(spark, sf_dir)))
            assert got == eager[k], f"{k}: plan-only {got} != eager {eager[k]}"
        plan = formatted_plan(_square_loop(_tiny_matrix(spark, sf_dir)))
        assert lint_plan("planted_loop", plan), "lint must fire in plan-only mode"
    finally:
        os.environ.pop("SPARK_GRAFT_PLAN_ONLY", None)
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)


def test_lint_quiet_on_checkpointed_loop(spark, sf_dir):
    p = _tiny_matrix(spark, sf_dir).localCheckpoint(eager=True)
    for _ in range(3):
        a, b = p.alias("a"), p.alias("b")
        p = (
            a.join(b, F.col("a.dst") == F.col("b.src"))
            .groupBy(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
            .agg(F.sum(F.col("a.p") * F.col("b.p")).alias("p"))
            .localCheckpoint(eager=True)
        )
    plan = formatted_plan(p)
    assert table_scan_counts(plan).get("events", 0) == 0
    assert not lint_plan("checkpointed_loop", plan)


def test_allowlist_entries_still_registered(reg):
    for name in ALLOWLIST:
        assert name in reg, f"scan-lint allowlist entry {name} no longer registered"


# ---------------------------------------------------------------------------
# Checkpoint-discipline pins: the iterative operators' static plans must
# stay scan-bounded (per-iteration localCheckpoint materialization).

ITERATIVE_PINNED = {
    # query -> (table, max static scans of it)
    "qk13_markov_stationary": ("events", 1),       # squaring loop (fixed r7)
    "qi01_incremental_neardup_edges": ("documents", 4),  # full/base/delta paths
    "qd01_neardup_pagerank": ("documents", 2),    # power iteration, checkpointed
    "qg01_personalized_pagerank": ("events", 2),  # power iteration, checkpointed
    "qc03_dup_clusters_distributed": ("documents", 2),  # pointer doubling
}


@pytest.mark.parametrize("key,pin", sorted(ITERATIVE_PINNED.items()))
def test_iterative_ops_stay_scan_bounded(spark, sf_dir, reg, key, pin):
    t, max_scans = pin
    plan = formatted_plan(reg[key].fn(spark, sf_dir))
    got = table_scan_counts(plan).get(t, 0)
    assert got <= max_scans, f"{key}: {t} scanned {got}x (pin {max_scans}) — checkpoint dropped?"
