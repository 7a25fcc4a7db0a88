"""End-to-end training-data pipeline: compose the engine's pipeline
module into the standard pre-training cleaning cascade —

    quality filter → exact dedup → near-dedup (cluster, keep one) →
    decontaminate vs eval → pack into sequences

    python examples/training_pipeline_example.py [sf_dir]
"""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from pyspark_distributed_kmodes_spark import pipeline as P
from pyspark_distributed_kmodes_spark.session import get_spark
from pyspark_distributed_kmodes_spark.sources.tables import table


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("training-pipeline")
    docs = table(spark, sf_dir, "documents")
    n0 = docs.count()

    quality = P.quality_filter(docs, min_words=20, min_unique_ratio=0.3)
    n1 = quality.count()

    deduped = P.exact_dedup(quality)
    n2 = deduped.count()

    near = P.near_dedup(deduped, threshold=0.2)
    n3 = near.count()

    train = near.filter(F.col("source") != "src2")
    eval_ = near.filter(F.col("source") == "src2")
    clean = P.decontaminate(train, eval_, min_shared_shingles=1)
    n4 = clean.count()

    packed = P.pack_sequences(clean, target_words=256)
    n_packs = packed.select("source", "pack_id").distinct().count()

    print(f"corpus:          {n0} docs")
    print(f"quality gate:    {n1} docs ({n0 - n1} dropped)")
    print(f"exact dedup:     {n2} docs ({n1 - n2} dropped)")
    print(f"near dedup:      {n3} docs ({n2 - n3} dropped)")
    print(f"decontaminated:  {n4} train docs ({n3 - eval_.count() - n4} dropped)")
    print(f"packed into:     {n_packs} sequences of ~256 words")
    spark.stop()


if __name__ == "__main__":
    main()
