"""Physical-plan shape assertions for the round-8 m-suite — the
scale-hygiene properties the docstrings promise: constant-size sides
broadcast (m24 candidates, m26 bitmap, m32/m33 customer dim), no
cartesian on the data-sized paths, and the checkpoint-bounded scan
counts that keep multi-consumer audits at one source pass."""

from pyspark_distributed_kmodes_spark.plans.inspect import formatted_plan
from pyspark_distributed_kmodes_spark.registry import load_all
from tools.scan_lint import table_scan_counts


def _formatted(spark, sf_dir, key):
    return formatted_plan(load_all()[key].fn(spark, sf_dir))


def test_m24_candidates_broadcast(spark, sf_dir):
    """The fixed-budget candidate set rides a broadcast — the query/
    candidate cross join must never shuffle the corpus."""
    plan = _formatted(spark, sf_dir, "qm24_ranking_quality")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_m26_bitmap_is_broadcast_and_bounded(spark, sf_dir):
    """The 2048-word Bloom bitmap joins as a broadcast; the documents
    table feeds the screen at most 4x in the static plan (eval keys
    and doc keys are checkpointed once each)."""
    plan = _formatted(spark, sf_dir, "qm26_bloom_prefilter_audit")
    assert "BroadcastHashJoin" in plan, plan
    assert table_scan_counts(plan).get("documents", 0) <= 4, table_scan_counts(plan)


def test_m32_dim_join_broadcast(spark, sf_dir):
    """The customer dimension joins orders as a broadcast hash join.
    (m33's dim join sits behind its cumulative-table checkpoint, so its
    static plan shows only the 9-row probe cross — not asserted here.)"""
    plan = _formatted(spark, sf_dir, "qm32_did_estimator")
    assert "BroadcastHashJoin" in plan, plan


def test_m30_triangle_join_is_equi_not_cartesian(spark, sf_dir):
    """The oriented triangle join must be an EQUI-join on the s/t keys
    (SortMergeJoin/ShuffledHashJoin), never a cartesian — the
    difference between sqrt(m) fan-out and m^2. The plan's
    BroadcastNestedLoopJoins are the three 1-row scalar assemblies
    (counts x triangles x wedges), which are fine."""
    plan = _formatted(spark, sf_dir, "qm30_triangle_count")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan


def test_m03_m25_single_source_pass(spark, sf_dir):
    """Multi-consumer audits hold the one-scan discipline: m03's token
    table is checkpointed (0 inline documents scans), m25's 3-width
    stack reads documents once per arm (3 scans, constant fan-out)."""
    assert table_scan_counts(_formatted(spark, sf_dir, "qm03_theta_set_algebra_audit")).get(
        "documents", 0
    ) == 0
    assert table_scan_counts(_formatted(spark, sf_dir, "qm25_shingle_width_sweep")).get(
        "documents", 0
    ) == 3
