"""Physical-plan shape assertions: the scale-hygiene gate (SURVEY.md §4).

Correct results at sf0.01 with a bad plan is a 100 TB failure; these
tests pin the properties that matter at scale.
"""

from pyspark.sql import functions as F

from pyspark_distributed_kmodes_spark.operators.relational import (
    q01_pricing_summary,
    q04_broadcast_join_dims,
    q15_sort_limit,
    q16_top_spenders,
)
from pyspark_distributed_kmodes_spark.plans.inspect import (
    codegen_stage_count,
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
    read_schema,
)
from pyspark_distributed_kmodes_spark.sources.tables import table


def test_q01_filter_pushed_to_scan(spark, sf_dir):
    plan = pushed_filters(q01_pricing_summary(spark, sf_dir))
    assert "l_shipdate" in plan, f"shipdate filter not pushed: {plan}"


def test_q01_prunes_columns(spark, sf_dir):
    rs = read_schema(q01_pricing_summary(spark, sf_dir))
    assert "l_comment" not in rs
    assert "l_partkey" not in rs  # only the 7 needed columns read


def test_q04_broadcasts_dims(spark, sf_dir):
    assert has_broadcast_join(q04_broadcast_join_dims(spark, sf_dir))


def test_q16_no_cartesian(spark, sf_dir):
    plan = formatted_plan(q16_top_spenders(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q15_topk_not_global_sort(spark, sf_dir):
    plan = formatted_plan(q15_sort_limit(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_projection_prunes_scan(spark, sf_dir):
    df = table(spark, sf_dir, "lineitem").select("l_orderkey")
    rs = read_schema(df)
    assert "l_orderkey" in rs and "l_quantity" not in rs


def test_queries_use_whole_stage_codegen(spark, sf_dir):
    assert codegen_stage_count(q01_pricing_summary(spark, sf_dir)) >= 1


def test_partition_pruning_on_partitioned_sink(spark, sf_dir, tmp_path_factory):
    """Filters on partition columns must prune directories, not scan
    them (PartitionFilters in the scan node)."""
    import pyspark.sql.functions as F

    base = str(tmp_path_factory.mktemp("pruned") / "docs")
    docs = table(spark, sf_dir, "documents")
    docs.write.partitionBy("lang").parquet(base)
    df = spark.read.parquet(base).filter(F.col("lang") == "en").select("doc_id")
    plan = formatted_plan(df)
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters")[1][:120]
    n_en = docs.filter(F.col("lang") == "en").count()
    assert df.count() == n_en


def test_o02_right_join_broadcasts(spark, sf_dir):
    """Right outer join with a small preserved side must broadcast."""
    from pyspark_distributed_kmodes_spark.operators.udfs import qo02_right_join

    assert has_broadcast_join(qo02_right_join(spark, sf_dir))


def test_o07_incremental_dedup_no_cartesian(spark, sf_dir):
    from pyspark_distributed_kmodes_spark.operators.training import qo07_incremental_dedup

    plan = formatted_plan(qo07_incremental_dedup(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "LeftAnti" in plan


def test_b11_duplicate_spans_join_free(spark, sf_dir):
    """Round-13 shape: the span document-frequency comes from ONE
    gram-keyed window pass (max-of-dense_rank), so the plan has NO join
    at all — the former shared-span aggregate + broadcast back-join
    (and its data-dependent build side) is gone."""
    from pyspark_distributed_kmodes_spark.operators.training import o11_duplicate_spans

    plan = formatted_plan(o11_duplicate_spans(spark, sf_dir))
    assert "Join" not in plan, plan
    assert "Window" in plan
    import re

    n_exchanges = len(re.findall(r"\(\d+\) Exchange\b", plan))
    # spread() repartition + gram window + doc rollup + final sort
    assert n_exchanges <= 4, f"expected spread + gram-window + doc rollup + sort only: {n_exchanges}"


def test_b05_chunking_no_shuffle_before_sort(spark, sf_dir):
    """Chunk generation itself is shuffle-free; the only exchange comes
    from the oracle-determinism orderBy."""
    from pyspark_distributed_kmodes_spark.operators.training import qo05_context_chunks

    plan = formatted_plan(qo05_context_chunks(spark, sf_dir))
    import re

    n_exchanges = len(re.findall(r"\(\d+\) Exchange\b", plan))
    assert n_exchanges <= 1, f"chunking should add no exchange beyond the final sort: {n_exchanges}"


def test_o55_stop_shingle_filter_in_plan(spark, sf_dir):
    """The max_df hot-shingle filter must appear as a broadcast anti
    join feeding the pair self-join."""
    from pyspark_distributed_kmodes_spark.operators.text import ngram_jaccard_pairs
    from pyspark_distributed_kmodes_spark.sources.tables import table

    # materialize=False: the registered q55 eagerly checkpoints the
    # shingle index (scan-lint), which hides the anti-join from the
    # final plan; the pin inspects the un-materialized lineage
    d = table(spark, sf_dir, "documents")
    plan = formatted_plan(ngram_jaccard_pairs(d, threshold=0.2, max_df=100_000, materialize=False))
    assert "LeftAnti" in plan
