"""Pipeline-health monitoring tour: the round-4 audit suite a
continuously-ingesting training-data pipeline runs per snapshot —
distribution drift gates, anomaly tripwires, duplication confidence
intervals, eval-set leakage, shard balance, and the offline watermark
audit for the streaming side.

    python examples/pipeline_monitoring_example.py [sf_dir]
"""

import sys

sys.path.insert(0, "/root/repo")

from pyspark_distributed_kmodes_spark.operators.analytics import (
    qd03_watermark_batch_twin,
    qd10_ks_two_sample,
    qd14_rolling_anomaly,
    qd15_duprate_wilson,
    qd16_column_profile,
)
from pyspark_distributed_kmodes_spark.operators.analytics2 import qf01_psi_drift
from pyspark_distributed_kmodes_spark.operators.analytics3 import (
    qf18_ngram_decontamination,
    qf20_shard_skew_audit,
    qf21_daily_mix_drift,
)
from pyspark_distributed_kmodes_spark.session import get_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("pipeline-monitoring")

    print("== did a source's length distribution drift? (PSI vs baseline) ==")
    qf01_psi_drift(spark, sf_dir).orderBy("psi", ascending=False).show(5)
    print("== sharper two-source comparison: KS statistic ==")
    qd10_ks_two_sample(spark, sf_dir).show()
    print("== is today's event MIX normal? (chi-square vs trailing week) ==")
    qf21_daily_mix_drift(spark, sf_dir).orderBy("chi2", ascending=False).show(5)
    print("== is today's VOLUME normal? (rolling z-score) ==")
    qd14_rolling_anomaly(spark, sf_dir).filter("is_anomaly = 1").show(5)
    print("== which sources are dirty, with confidence? (Wilson CI) ==")
    qd15_duprate_wilson(spark, sf_dir).orderBy("dup_rate", ascending=False).show(5)
    print("== does training data leak the benchmark? (8-gram overlap) ==")
    qf18_ngram_decontamination(spark, sf_dir).filter("contaminated = 1").show(5)
    print("== are training shards balanced? ==")
    qf20_shard_skew_audit(spark, sf_dir).show()
    print("== what would a 10-min watermark discard? (batch twin) ==")
    qd03_watermark_batch_twin(spark, sf_dir).show(5)
    print("== schema sanity before writing constraints ==")
    qd16_column_profile(spark, sf_dir).show()

    # the example doubles as a smoke assertion set
    assert qf20_shard_skew_audit(spark, sf_dir).count() == 8
    assert qd16_column_profile(spark, sf_dir).count() == 5
    print("pipeline monitoring example OK")


if __name__ == "__main__":
    main()
