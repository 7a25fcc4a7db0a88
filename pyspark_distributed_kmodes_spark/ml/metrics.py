"""Clustering-quality metrics for the categorical (k-modes) models.

Mode-based silhouette: the classical silhouette replaces pairwise
distances (O(n²) — a 100 TB non-starter) with distances TO THE MODES:
a(x) = Hamming distance to the own cluster's mode, b(x) = min distance
to any other mode, s(x) = (b − a) / max(a, b) (s = 0 when both are 0,
i.e. the row IS a tied mode). This is the medoid-silhouette
simplification every large-scale clustering validation uses: one pure
JVM expression per row — the same (dist, idx) struct array the
assignment transform already builds — followed by one aggregate; no
shuffle of pairs, no Python.

Scores lie in [−1, 1]; higher = better separated. A cluster whose mean
s ≈ 0 overlaps its neighbors; negative means rows sit closer to a
foreign mode than their own (mis-assignment or k too large).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_distributed_kmodes_spark.functions.deterministic import pround
from pyspark_distributed_kmodes_spark.ml.kmodes import KModesModel


def silhouette_scores(model: KModesModel, df: DataFrame) -> DataFrame:
    """Per-row mode-silhouette: input columns + `prediction` + `s`."""
    # dist array and its argmin materialized once per row — `pred`
    # captured inside the filter lambda would re-run array_min(dists)
    # (itself k Hamming distances) per array element: O(k²·n_cols)/row
    staged = df.withColumn("_dists", model._dist_array()).withColumn(
        "_own", F.array_min(F.col("_dists"))
    )
    a = F.col("_own").getField("dist").cast("double")
    pred = F.col("_own").getField("idx")
    b = F.array_min(
        F.filter(
            F.col("_dists"),
            lambda d: d.getField("idx") != F.col("_own").getField("idx"),
        )
    ).getField("dist").cast("double")
    s = F.when(F.greatest(a, b) == 0.0, F.lit(0.0)).otherwise(
        (b - a) / F.greatest(a, b)
    )
    return (
        staged.withColumn("prediction", pred)
        .withColumn("s", s)
        .drop("_dists", "_own")
    )


def silhouette_report(model: KModesModel, df: DataFrame) -> DataFrame:
    """Per-cluster silhouette summary: size, mean s (decimal-exact
    sum / count), min s — plus the overall row under cluster = -1."""
    scored = silhouette_scores(model, df).select("prediction", "s")
    per = scored.groupBy(F.col("prediction").alias("cluster")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        pround(
            F.sum(pround(F.col("s"), 9).cast("decimal(25,12)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_s"),
        pround(F.min("s"), 6).alias("min_s"),
    )
    overall = scored.agg(
        F.lit(-1).alias("cluster"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        pround(
            F.sum(pround(F.col("s"), 9).cast("decimal(25,12)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_s"),
        pround(F.min("s"), 6).alias("min_s"),
    )
    return per.unionByName(overall).orderBy("cluster")
