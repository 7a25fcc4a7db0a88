"""Similarity search over the embeddings table: exact top-k baseline
vs the two ANN paths (hyperplane LSH, IVF), with measured top-1 recall.

    python examples/similarity_example.py [sf_dir]
"""

import sys

sys.path.insert(0, "/root/repo")

from pyspark_distributed_kmodes_spark.operators.vectors import (
    exact_topk,
    qo61_ann_lsh,
    qo68_ann_ivf,
)
from pyspark_distributed_kmodes_spark.session import get_spark
from pyspark_distributed_kmodes_spark.sources.tables import table


def top1(rows):
    return {r.vec_id: r.neighbor_id for r in rows if r.rank == 1}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("similarity-example")
    emb = table(spark, sf_dir, "embeddings")

    exact = top1(exact_topk(spark, emb, k=5).collect())
    print(f"exact top-5 computed for {len(exact)} vectors (blocked GEMM)")

    for name, fn in [("hyperplane LSH", qo61_ann_lsh), ("IVF nprobe=4/16", qo68_ann_ivf)]:
        approx = top1(fn(spark, sf_dir).collect())
        hit = sum(1 for v, n in exact.items() if approx.get(v) == n)
        print(f"{name}: top-1 recall {hit / len(exact):.2f} over {len(approx)} answered")

    spark.stop()


if __name__ == "__main__":
    main()
