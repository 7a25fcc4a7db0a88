"""Semantic deduplication end to end: exact cosine-pair path vs the
k-means-clustered SemDeDup scale path, with agreement metrics, plus the
fitted k-means model round-tripped through persistence.

    python examples/semantic_dedup_example.py [sf_dir]
"""

import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark_distributed_kmodes_spark.ml.kmeans import KMeansModel, kmeans_fit
from pyspark_distributed_kmodes_spark.operators.vectors import (
    qb28_semantic_dedup,
    qb30_semantic_dedup_scaled,
)
from pyspark_distributed_kmodes_spark.session import get_spark
from pyspark_distributed_kmodes_spark.sources.tables import table


def labels(rows):
    return {r.vec_id: r.component for r in rows}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("semantic-dedup-example")

    exact = qb28_semantic_dedup(spark, sf_dir).collect()
    scaled = qb30_semantic_dedup_scaled(spark, sf_dir).collect()
    le, ls = labels(exact), labels(scaled)
    dup_exact = {r.vec_id for r in exact if r.component_size >= 2}
    dup_scaled = {r.vec_id for r in scaled if r.component_size >= 2}
    kept_exact = sum(1 for r in exact if r.keep)
    print(f"exact: {len(le)} vectors, {len(dup_exact)} in dup clusters, {kept_exact} kept")
    if dup_exact:
        recall = len(dup_scaled & dup_exact) / len(dup_exact)
        print(f"clustered scale path: dup-membership recall {recall:.2f} vs exact")
    else:
        print(f"clustered scale path: no exact dup clusters at this SF ({len(dup_scaled)} scaled)")

    emb = table(spark, sf_dir, "embeddings")
    model = kmeans_fit(emb, k=8, iters=5)
    print(f"k-means costs per iteration: {[round(c, 1) for c in model.costs]}")
    with tempfile.NamedTemporaryFile(suffix=".json") as f:
        model.save(f.name)
        reloaded = KMeansModel.load(f.name)
    same = reloaded.centroids == model.centroids
    print(f"persistence round-trip identical: {same}")

    spark.stop()


if __name__ == "__main__":
    main()
