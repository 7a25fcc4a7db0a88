"""End-to-end mixture curation: the planning pass a data-mixture owner
runs before materializing a pre-training corpus —

    audit (overlap / novelty / rare strata / Zipf)
    → temperature weights → integer token budget
    → per-source quality caps → weighted sample → split assignment

    python examples/mixture_curation_example.py [sf_dir]
"""

import sys

sys.path.insert(0, "/root/repo")

from pyspark_distributed_kmodes_spark.operators.curation import (
    qc04_temperature_mixture_weights,
)
from pyspark_distributed_kmodes_spark.operators.curation2 import (
    qc08_source_overlap_matrix,
    qc09_token_budget_allocation,
    qc10_per_source_quality_caps,
    qc11_shingle_novelty,
    qc14_zipf_slope,
)
from pyspark_distributed_kmodes_spark.operators.curation3 import (
    qe01_weighted_reservoir_sample,
    qe04_rare_strata_audit,
)
from pyspark_distributed_kmodes_spark.operators.training import qb42_train_val_test_split
from pyspark_distributed_kmodes_spark.session import get_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("mixture-curation")

    print("== 1. Audits: is the corpus safe to mix? ==")
    hot = (
        qc08_source_overlap_matrix(spark, sf_dir)
        .orderBy("overlap_coeff", ascending=False)
        .limit(3)
    )
    print("most-overlapping source pairs (shared normalized docs):")
    hot.show(truncate=False)
    print("least-original sources (lowest exclusive-shingle ratio):")
    qc11_shingle_novelty(spark, sf_dir).orderBy("exclusive_ratio").limit(3).show()
    print("strata too small to trust statistics on:")
    qe04_rare_strata_audit(spark, sf_dir).show(5)
    print("sources whose word distribution doesn't look like language:")
    qc14_zipf_slope(spark, sf_dir).orderBy("zipf_slope", ascending=False).limit(3).show()

    print("== 2. Plan the mix: weights -> integer token budget ==")
    qc04_temperature_mixture_weights(spark, sf_dir).show(5)
    alloc = qc09_token_budget_allocation(spark, sf_dir)
    alloc.show(5)
    total = alloc.groupBy().sum("alloc_tokens").collect()[0][0]
    print(f"allocated tokens sum EXACTLY to budget: {total:,}")

    print("== 3. Select documents: caps, weighted sample, split ==")
    qc10_per_source_quality_caps(spark, sf_dir).show(5)
    qe01_weighted_reservoir_sample(spark, sf_dir).show(10)
    qb42_train_val_test_split(spark, sf_dir).show(9)

    spark.stop()


if __name__ == "__main__":
    main()
