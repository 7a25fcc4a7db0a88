"""Example: distributed k-modes on categorical columns, reference-style.

The reference's README example (reconstructed, SURVEY.md §3.1 E3) builds
an RDD of categorical records, fits EnsembleKModes, and inspects
clusters / mean_cost / predictions. Same flow here over DataFrames:

    python examples/kmodes_example.py [sf_dir]
"""

import sys

sys.path.insert(0, "/root/repo")

from pyspark_distributed_kmodes_spark.ml.kmodes import EnsembleKModes, KModes
from pyspark_distributed_kmodes_spark.session import get_spark
from pyspark_distributed_kmodes_spark.sources.tables import table


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("kmodes-example")
    orders = table(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority")

    # reference-parity two-level ensemble
    method = EnsembleKModes(n_partitions=4, n_clusters=5, seed=42,
                            cols=("o_orderstatus", "o_orderpriority"))
    model = method.fit(orders)
    print("clusters (modes):")
    for i, m in enumerate(model.clusters):
        print(f"  {i}: {m}")
    print(f"mean_cost: {model.mean_cost:.4f}")
    method.predictions.show(5)
    method.indexes.show(5)  # reference `.indexes`: bare cluster indices
    model.predict(orders).groupBy("prediction").count().orderBy("prediction").show()

    # Spark-first global Lloyd variant
    model2 = KModes(n_clusters=5, cols=("o_orderstatus", "o_orderpriority"), seed=42).fit(orders)
    print(f"global-Lloyd cost: {model2.cost:.1f} (converged={model2.converged} in {model2.n_iter} iters)")

    # persistence round-trip (model state = k modes, a JSON document)
    import tempfile

    path = tempfile.mktemp(suffix=".json")
    model2.save(path)
    from pyspark_distributed_kmodes_spark.ml.kmodes import KModesModel

    reloaded = KModesModel.load(path)
    print(f"reloaded modes == fitted modes: {reloaded.modes == model2.modes}")
    spark.stop()


if __name__ == "__main__":
    main()
