"""queries() entries exposing the k-modes capability (rows-only checks —
clustering is not ANSI-SQL-expressible; properties are verified in
tests/test_kmodes.py: fixed-seed determinism, cost monotonicity,
non-empty clusters, label-permutation invariance)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_distributed_kmodes_spark.ml.kmodes import EnsembleKModes, KModes
from pyspark_distributed_kmodes_spark.registry import query
from pyspark_distributed_kmodes_spark.sources.tables import table

KMODES_COLS = ("o_orderstatus", "o_orderpriority")


@query("q70_kmodes_fit", oracle=None, tags=("kmodes", "ml"), bench=True)
def q70_kmodes_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global Lloyd k-modes (k=5) on orders categorical columns; returns
    per-cluster size + mode — the DataFrame-native form of the
    reference's EnsembleKModes.fit output (modes + assignment counts)."""
    o = table(spark, sf_dir, "orders")
    model = KModes(n_clusters=5, cols=KMODES_COLS, max_iter=20, seed=42).fit(o)
    assigned = model.transform(o.select(*KMODES_COLS), "cluster")
    sizes = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_members"))
    # modes are driver-side constants — attach them as literal map
    # lookups (zero extra jobs; createDataFrame/broadcast-join of a tiny
    # frame costs seconds of fixed overhead per session)
    mode_cols = []
    for j, c in enumerate(KMODES_COLS):
        m = F.map_from_arrays(
            F.array(*[F.lit(i) for i in range(len(model.modes))]),
            F.array(*[F.lit(mode[j]) for mode in model.modes]),
        )
        mode_cols.append(F.element_at(m, F.col("cluster")).alias(f"mode_{c}"))
    return sizes.select("cluster", "n_members", *mode_cols).orderBy("cluster")


@query("q71_kmodes_ensemble_fit", oracle=None, tags=("kmodes", "ml"))
def q71_kmodes_ensemble_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-parity two-level ensemble k-modes (A6/A9): independent
    per-partition k-modes via applyInPandas, meta-clustering on driver."""
    o = table(spark, sf_dir, "orders")
    est = EnsembleKModes(n_partitions=4, n_clusters=5, seed=42, cols=KMODES_COLS)
    model = est.fit(o.select(*KMODES_COLS))
    assigned = model.transform(o.select(*KMODES_COLS), "cluster")
    return (
        assigned.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy("cluster")
    )


@query("q72_kmodes_predict", oracle=None, tags=("kmodes", "ml"))
def q72_kmodes_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """model.predict parity (reference A10): fit on orders, transform the
    same relation, emit (keys → cluster) for every row."""
    o = table(spark, sf_dir, "orders")
    model = KModes(n_clusters=4, cols=KMODES_COLS, max_iter=20, seed=7).fit(o)
    return (
        model.transform(o, "prediction")
        .select("o_orderkey", "o_orderstatus", "o_orderpriority", "prediction")
        .orderBy("o_orderkey")
    )


@query("qe16_kmodes_silhouette", oracle=None, tags=("kmodes", "ml"))
def qe16_kmodes_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-quality validation for the fitted k-modes model: the
    mode-based silhouette report (ml/metrics.py) — per-cluster size,
    mean and min silhouette, plus the overall row (cluster = −1). The
    "is k right?" gate run after every q70-style fit; pairwise-free, so
    it costs one scan + one aggregate at any corpus size.

    Rows-only (depends on the iterative fit); bounds, degenerate-case
    and hand-computed values are pinned in tests/test_metrics.py.
    """
    from pyspark_distributed_kmodes_spark.ml.kmodes import KModes
    from pyspark_distributed_kmodes_spark.ml.metrics import silhouette_report

    o = table(spark, sf_dir, "orders")
    model = KModes(n_clusters=5, cols=KMODES_COLS, max_iter=20, seed=42).fit(o)
    return silhouette_report(model, o.select(*KMODES_COLS))
