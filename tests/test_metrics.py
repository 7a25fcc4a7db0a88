"""Mode-silhouette metric tests: hand-computed values on a crafted
corpus, bounds, and the degenerate tied-mode case."""

import pytest


def test_silhouette_hand_computed(spark):
    from pyspark_distributed_kmodes_spark.ml.kmodes import KModesModel
    from pyspark_distributed_kmodes_spark.ml.metrics import silhouette_scores

    model = KModesModel(cols=("a", "b"), modes=[("x", "y"), ("p", "q")])
    df = spark.createDataFrame(
        [
            ("x", "y"),  # a=0, b=2 -> s = 1
            ("x", "q"),  # a=1 to both -> own mode idx 0, b=1 -> s = 0
            ("p", "q"),  # a=0, b=2 -> s = 1 (cluster 1)
            ("x", "z"),  # d0=1, d1=2 -> a=1, b=2 -> s = 0.5
        ],
        "a string, b string",
    )
    rows = silhouette_scores(model, df).collect()
    got = [(r.prediction, r.s) for r in rows]
    assert got == [(0, 1.0), (0, 0.0), (1, 1.0), (0, 0.5)]


def test_silhouette_degenerate_single_value(spark):
    """A row equal to BOTH modes (possible with duplicate modes) gets
    s = 0, not NaN."""
    from pyspark_distributed_kmodes_spark.ml.kmodes import KModesModel
    from pyspark_distributed_kmodes_spark.ml.metrics import silhouette_scores

    model = KModesModel(cols=("a",), modes=[("x",), ("x",)])
    df = spark.createDataFrame([("x",)], "a string")
    [r] = silhouette_scores(model, df).collect()
    assert r.s == 0.0


def test_silhouette_report_bounds(spark, sf_dir):
    from pyspark_distributed_kmodes_spark.ml.kmodes import KModes
    from pyspark_distributed_kmodes_spark.ml.metrics import silhouette_report
    from pyspark_distributed_kmodes_spark.sources.tables import table

    o = table(spark, sf_dir, "orders")
    cols = ("o_orderstatus", "o_orderpriority")
    model = KModes(n_clusters=4, cols=cols, max_iter=10, seed=1).fit(o)
    rows = silhouette_report(model, o.select(*cols)).collect()
    overall = [r for r in rows if r.cluster == -1]
    assert len(overall) == 1
    per = [r for r in rows if r.cluster >= 0]
    assert sum(r.n_rows for r in per) == overall[0].n_rows
    for r in rows:
        assert -1.0 <= r.min_s <= r.mean_s <= 1.0
