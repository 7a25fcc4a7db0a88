"""Integrity-audit tour: the round-5 verification suite a data
platform runs to TRUST its own machinery — loss-free sharding,
incremental-dedup reconciliation, plan-invariant result checksums,
exact-decomposition audits (mergeable quantiles, two-level distinct),
and the sketch error-bound gates that keep the approximate family
honest (approx-percentile rank bounds, HLL relative error, CMS
overestimates, LSH banding recall).

    python examples/integrity_audit_example.py [sf_dir]
"""

import sys

sys.path.insert(0, "/root/repo")

from pyspark_distributed_kmodes_spark.operators.analytics4 import (
    qg02_incremental_dedup_reconcile,
    qg03_shard_reconciliation,
    qg04_lsh_recall_audit,
    qg06_approx_percentile_audit,
    qg07_hll_error_audit,
)
from pyspark_distributed_kmodes_spark.operators.analytics5 import (
    qh16_mergeable_quantiles,
    qh17_two_level_distinct,
    qh18_cms_error_audit,
    qh20_resultset_checksum,
    qh21_bucket_prefilter_audit,
)
from pyspark_distributed_kmodes_spark.session import get_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("integrity-audit")

    print("== did hash sharding lose anything? (counts/bytes/checksums) ==")
    qg03_shard_reconciliation(spark, sf_dir).show()
    print("== does incremental dedup agree with a full rebuild? ==")
    qg02_incremental_dedup_reconcile(spark, sf_dir).show()
    print("== does the same query give the same result under TWO plans? ==")
    qh20_resultset_checksum(spark, sf_dir).show()
    print("== mergeable exact quantiles == direct quantiles? ==")
    qh16_mergeable_quantiles(spark, sf_dir).show()
    print("== two-level exact distinct == direct distinct? ==")
    qh17_two_level_distinct(spark, sf_dir).show()
    print("== approx percentile within its published rank bound? ==")
    qg06_approx_percentile_audit(spark, sf_dir).show()
    print("== HLL within 3*rsd? ==")
    qg07_hll_error_audit(spark, sf_dir).show()
    print("== CMS overestimates bounded by eps*N? ==")
    qh18_cms_error_audit(spark, sf_dir).show()
    print("== LSH banding recall vs the exact truth set ==")
    qg04_lsh_recall_audit(spark, sf_dir).show()
    print("== decontamination prefilter misses nothing? ==")
    qh21_bucket_prefilter_audit(spark, sf_dir).show()

    rows = qg03_shard_reconciliation(spark, sf_dir).collect()
    assert all(r.loss_free for r in rows)
    assert qh20_resultset_checksum(spark, sf_dir).collect()[0].plans_agree
    assert qh21_bucket_prefilter_audit(spark, sf_dir).collect()[0].no_false_negatives
    print("integrity audit: all green")
    spark.stop()


if __name__ == "__main__":
    main()
