"""DataFrame-native Lloyd k-means over an embedding column — the
numeric sibling of ml/kmodes.py, and the coarse-clustering stage a
SemDeDup-style pipeline uses to bound semantic dedup at scale (cluster
first, dedup within clusters only).

Execution shape per iteration (the 100 TB design):
- centroids (k × d doubles, a few KB) travel to executors as a LITERAL
  array-of-arrays column — no join, no shuffle, no broadcast variable
  churn; the assignment argmin is pure JVM higher-order functions
  (`transform` + `aggregate` + `array_min` over (dist, idx) structs),
  whole-stage codegen end to end.
- the update step is ONE groupBy(cluster) over d per-dimension DECIMAL
  sums + a count — built-in aggregates, so partial (map-side) combine
  applies and no executor ever materializes a cluster; the k × (d + 2)
  result collected to the driver is bounded by k, never by corpus size.
  A grouped-map/grouped-agg pandas alternative would pull an entire
  cluster (corpus / k rows) into one pandas frame — the executor-OOM
  shape deliberately avoided here.

So a full fit is `iters` shuffles of (cluster, vector) — nothing else
touches the corpus. Deterministic: seeded init takes the k
lowest-`id_col` vectors (total order), argmin tie-breaks on the lowest
cluster index, and the decimal sums are EXACT, so centroids are
bit-identical under any partitioning (double sums would drift with
reduction order).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dist_struct(vec_col, centroids: list[list[float]]):
    """Array of (squared_dist, cluster_idx) structs, one per centroid —
    pure JVM: transform over a literal array of centroid arrays."""
    cents = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
    )
    return F.transform(
        cents,
        lambda c, i: F.struct(
            F.aggregate(
                F.zip_with(vec_col, c, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("dist"),
            i.alias("cluster"),
        ),
    )


@dataclass
class KMeansModel:
    centroids: list[list[float]]
    costs: list[float]  # summed squared distance after each iteration
    vec_col: str = "embedding"

    def transform(self, df: DataFrame, id_col: str = "vec_id") -> DataFrame:
        """(id_col, cluster, sq_dist) — nearest-centroid assignment."""
        best = F.array_min(_dist_struct(F.col(self.vec_col).cast("array<double>"), self.centroids))
        return df.select(
            id_col,
            best["cluster"].alias("cluster"),
            best["dist"].alias("sq_dist"),
        )

    # ---- persistence (model state is provably tiny: k × d doubles —
    # a JSON document, not a distributed dataset; mirrors KModesModel) —
    def save(self, path: str) -> None:
        import json
        import os

        os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(
                {"centroids": self.centroids, "costs": self.costs, "vec_col": self.vec_col},
                f,
            )

    @classmethod
    def load(cls, path: str) -> "KMeansModel":
        import json

        with open(path) as f:
            d = json.load(f)
        return cls(centroids=d["centroids"], costs=d["costs"], vec_col=d["vec_col"])


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> KMeansModel:
    """Fixed-iteration Lloyd fit (fixed count keeps runs byte-identical
    regardless of convergence noise; callers wanting early stop can
    compare successive `costs`). Empty clusters keep their previous
    centroid — deterministic and standard."""
    if k < 1 or iters < 0:
        raise ValueError("k >= 1 and iters >= 0 required")
    vec = F.col(vec_col).cast("array<double>")
    init = df.select(id_col, vec.alias("_v")).orderBy(id_col).limit(k).collect()
    if len(init) < k:
        raise ValueError(f"need at least k={k} rows, got {len(init)}")
    centroids = [list(r["_v"]) for r in init]

    d = len(centroids[0])
    costs: list[float] = []
    for _ in range(iters):
        best = F.array_min(_dist_struct(vec, centroids))
        assigned = df.select(
            best["cluster"].alias("cluster"), vec.alias("_v"), best["dist"].alias("_d")
        )
        stats = (
            assigned.groupBy("cluster")
            .agg(
                *[F.sum(F.element_at("_v", i + 1).cast("decimal(28,12)")).alias(f"s{i}") for i in range(d)],
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("_d").cast("decimal(28,12)")).alias("cost"),
            )
            .collect()
        )
        new_centroids = list(centroids)  # empty clusters keep position
        for r in stats:
            new_centroids[r["cluster"]] = [float(r[f"s{i}"]) / r["n"] for i in range(d)]
        costs.append(float(sum(r["cost"] for r in stats)))
        centroids = new_centroids
    return KMeansModel(centroids=centroids, costs=costs, vec_col=vec_col)
