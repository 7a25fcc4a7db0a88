"""Physical-plan assertions for the round-3 curation/sampling operators:
broadcast placement, partitioned windows, top-k group-limit pushdown,
and absence of cartesian products (SURVEY.md §4 scale-hygiene gate)."""

from pyspark_distributed_kmodes_spark.operators.curation2 import (
    qc08_source_overlap_matrix,
    qc10_per_source_quality_caps,
    qc13_label_cohesion,
    qc14_zipf_slope,
)
from pyspark_distributed_kmodes_spark.operators.curation3 import (
    qe01_weighted_reservoir_sample,
    qe02_containment_pairs,
    qe03_oov_rate,
)
from pyspark_distributed_kmodes_spark.plans.inspect import (
    formatted_plan,
    has_broadcast_join,
)


def test_c13_centroids_broadcast(spark, sf_dir):
    """The label-centroid table must broadcast: the corpus is never
    shuffled for the similarity pass."""
    plan = formatted_plan(qc13_label_cohesion(spark, sf_dir))
    assert has_broadcast_join(qc13_label_cohesion(spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_z03_vocab_broadcast(spark, sf_dir):
    """The k-row vocabulary joins broadcast-side; token rows must not
    shuffle for the membership probe."""
    plan = formatted_plan(qe03_oov_rate(spark, sf_dir))
    assert has_broadcast_join(qe03_oov_rate(spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_z01_topk_group_limit_pushdown(spark, sf_dir):
    """The per-language rank filter must compile to WindowGroupLimit
    (partial top-k BEFORE the shuffle) over a lang-partitioned window —
    never a global sort."""
    plan = formatted_plan(qe01_weighted_reservoir_sample(spark, sf_dir))
    assert "WindowGroupLimit" in plan
    assert "hashpartitioning(lang" in plan


def test_c10_window_partitioned_by_source(spark, sf_dir):
    """The quality-cap rank runs on a source-partitioned window, not a
    single global partition."""
    plan = formatted_plan(qc10_per_source_quality_caps(spark, sf_dir))
    assert "hashpartitioning(source" in plan


def test_c14_rank_filter_pushed(spark, sf_dir):
    """The top-100-words filter gets the WindowGroupLimit treatment on
    a source-partitioned window."""
    plan = formatted_plan(qc14_zipf_slope(spark, sf_dir))
    assert "WindowGroupLimit" in plan
    assert "hashpartitioning(source" in plan


def test_pair_joins_are_equi_not_cartesian(spark, sf_dir):
    """Both pair detectors meet rows ONLY on equal shingle/fingerprint
    keys; the only nested-loop join allowed is c08's |sources|²
    matrix, which is built from the tiny per-source aggregate."""
    assert "CartesianProduct" not in formatted_plan(qe02_containment_pairs(spark, sf_dir))
    c08 = formatted_plan(qc08_source_overlap_matrix(spark, sf_dir))
    assert "CartesianProduct" not in c08


def test_z07_filters_pushed_to_scan(spark, sf_dir):
    """Q6 is THE pushdown benchmark: shipdate/discount/quantity
    predicates must reach the parquet scan, and the read schema must
    prune to the four referenced columns."""
    from pyspark_distributed_kmodes_spark.operators.relational4 import (
        qe07_forecast_revenue,
        qe08_top_supplier,
    )
    from pyspark_distributed_kmodes_spark.plans.inspect import (
        formatted_plan,
        pushed_filters,
        read_schema,
    )

    pf = pushed_filters(qe07_forecast_revenue(spark, sf_dir))
    assert "l_shipdate" in pf and "l_quantity" in pf and "l_discount" in pf
    rs = read_schema(qe07_forecast_revenue(spark, sf_dir))
    assert "l_extendedprice" in rs and "l_comment" not in rs and "l_orderkey" not in rs

    plan = formatted_plan(qe08_top_supplier(spark, sf_dir))
    assert "l_shipdate" in pushed_filters(qe08_top_supplier(spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_z21_sax_join_is_equi(spark, sf_dir):
    """The SAX PAIR join must be a hash join on the word (users meet
    only on equal words). The 1-row corpus-start bound broadcasts as a
    nested-loop by design — assert nothing user-sized does."""
    from pyspark_distributed_kmodes_spark.operators.events import qe21_sax_similar_users

    plan = formatted_plan(qe21_sax_similar_users(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # the word-keyed pair join
    # the only nested-loop inputs are the 1-row date bound (d0)
    import re

    for m in re.finditer(r"\(\d+\) BroadcastNestedLoopJoin[\s\S]*?Join condition: ([^\n]*)", plan):
        assert "d0" in m.group(1)


def test_z17_no_global_sort_window(spark, sf_dir):
    """Decile binning must not compile to a single-partition window:
    boundaries come from an aggregate, not ntile's global ORDER BY."""
    from pyspark_distributed_kmodes_spark.operators.curation3 import qe17_spend_deciles

    plan = formatted_plan(qe17_spend_deciles(spark, sf_dir))
    assert "Window" not in plan  # no window operator at all
    assert "CartesianProduct" not in plan


def test_z24_marginals_broadcast(spark, sf_dir):
    """Basket-lift marginal tables join broadcast-side; the only
    shuffling join is the basket-keyed pair join."""
    from pyspark_distributed_kmodes_spark.operators.relational4 import qe24_brand_basket_lift

    assert has_broadcast_join(qe24_brand_basket_lift(spark, sf_dir))
    assert "CartesianProduct" not in formatted_plan(qe24_brand_basket_lift(spark, sf_dir))
