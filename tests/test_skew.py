"""Salted join must be result-identical to the plain join."""

from pyspark.sql import functions as F

from pyspark_distributed_kmodes_spark.functions.skew import salted_join
from pyspark_distributed_kmodes_spark.sources.tables import table


def test_salted_join_matches_plain(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_quantity")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name").withColumnRenamed("s_suppkey", "l_suppkey")
    plain = li.join(s, "l_suppkey").groupBy("s_name").agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
    salted = (
        salted_join(li, s, "l_suppkey")
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
    )
    a = {(r.s_name): (r.n, r.q) for r in plain.collect()}
    b = {(r.s_name): (r.n, r.q) for r in salted.collect()}
    assert a == b


def test_salted_join_spreads_keys(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey").withColumnRenamed("s_suppkey", "l_suppkey")
    joined = salted_join(li, s, "l_suppkey")
    assert joined.count() == li.join(s, "l_suppkey").count()


def test_merge_upsert_semantics(spark, sf_dir):
    """Updated keys replaced, unmatched kept, new keys inserted."""
    from pyspark_distributed_kmodes_spark.operators.cdc import merge_upsert

    target = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    updates = spark.createDataFrame([(2, "B"), (3, "C")], ["k", "v"])
    out = {r.k: r.v for r in merge_upsert(target, updates, ["k"]).collect()}
    assert out == {1: "a", 2: "B", 3: "C"}


def test_asof_join_exclusive_and_unmatched(spark):
    """Generic as-of: exclusive bound ignores same-instant rows; keys
    with no earlier right rows get NULL payload."""
    from pyspark_distributed_kmodes_spark.functions.asof import asof_join

    left = spark.createDataFrame([(1, 10, "e1"), (1, 20, "e2"), (2, 5, "e3")], ["k", "t", "name"])
    right = spark.createDataFrame([(1, 10, 100.0), (1, 15, 150.0)], ["k", "rt", "px"])
    inc = {r.name: r.px for r in asof_join(left, right, "k", "t", "rt", ["px"]).collect()}
    assert inc == {"e1": 100.0, "e2": 150.0, "e3": None}
    exc = {r.name: r.px for r in asof_join(left, right, "k", "t", "rt", ["px"], inclusive=False).collect()}
    assert exc == {"e1": None, "e2": 150.0, "e3": None}
