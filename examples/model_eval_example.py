"""Model-evaluation tour: the round-8 m-suite's eval surface — how a
platform judges a scorer end to end: threshold-free ranking (qj01
AUC), at-a-threshold correlation that imbalance can't game (m21 MCC),
proper scoring of the probabilities themselves (m22 log loss + skill
vs base rate), retrieval quality in the two numbers papers report
(m24 NDCG@10 + MRR), honesty of every md5 sampling decision upstream
(m07 Anderson-Darling uniformity), and the multiple-testing discipline
once 25 segments are tested at once (m34 Benjamini-Hochberg). Every
operator is oracle-gated against DuckDB.

    python examples/model_eval_example.py [sf_dir]
"""

import sys

sys.path.insert(0, "/root/repo")

from pyspark_distributed_kmodes_spark.operators.analytics10 import (
    qm07_anderson_darling_uniformity,
    qm21_matthews_corrcoef,
    qm22_log_loss,
    qm24_ranking_quality,
    qm34_benjamini_hochberg,
)
from pyspark_distributed_kmodes_spark.session import get_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("model-eval")

    print("== is the scorer any good at a threshold? (MCC, balanced acc) ==")
    row = qm21_matthews_corrcoef(spark, sf_dir)
    row.show()
    assert -1.0 <= row.collect()[0]["mcc"] <= 1.0

    print("== are its probabilities USEFUL? (log loss vs base rate) ==")
    ll = qm22_log_loss(spark, sf_dir)
    ll.show()
    assert ll.collect()[0]["skill"] <= 1.0

    print("== retrieval quality of the embedding index (NDCG@10, MRR) ==")
    rq = qm24_ranking_quality(spark, sf_dir)
    rq.show()
    r = rq.collect()[0]
    assert 0.0 <= r["mean_ndcg10"] <= 1.0 and 0.0 <= r["mean_mrr"] <= 1.0

    print("== is the md5 sampling hash actually uniform? (Anderson-Darling) ==")
    qm07_anderson_darling_uniformity(spark, sf_dir).show()

    print("== 25 segment tests at once: who survives FDR control? (BH) ==")
    qm34_benjamini_hochberg(spark, sf_dir).show(25)

    spark.stop()


if __name__ == "__main__":
    main()
