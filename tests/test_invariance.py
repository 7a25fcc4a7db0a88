"""Partition-count invariance: the driver runs our queries under ITS
session config, so results must be identical under any shuffle
partitioning (summation order, partition-local ops, bucket joins)."""

import pytest

import __spark_entry__ as entrymod
from tools.check_correctness import rows_key

QUERIES = [
    "q01_pricing_summary",  # decimal-sum aggregation
    "q10_agg_family",  # min_by/collect_list determinism
    "q21_lag_lead_running",  # window frames
    "qo63_minhash_neardup",  # multi-stage shuffle pipeline
    "qo97_dup_clusters",  # collapse/expand + iterative CC
    "qo06_sequence_packing",  # per-shard cumsum windows
    "o12_unigram_logprob",  # decimal-sum of per-word logprobs
    "qc09_token_budget_allocation",  # integer largest-remainder bookkeeping
    "qc13_label_cohesion",  # decimal zip_with folds over broadcast centroids
    "qe01_weighted_reservoir_sample",  # hash-keyed sampling, WindowGroupLimit
    "qe14_quality_constraints",  # single-scan fused violation counts
    "qe17_spend_deciles",  # percentile-boundary binning
    "qe21_sax_similar_users",  # binary-exact z-norm/SAX chain
    "qe26_quality_signal_fusion",  # decile fusion over three signals
    # round-6 staged suites: the shapes most exposed to summation order
    "qj20_levene_test",  # floor-quantized quadratic terms, 2-pass medians
    "qj33_mergeable_variance",  # exact decimal carriers merged across shards
    "qj41_average_precision",  # bounded-lattice cumulative window
    "qj50_cogrouped_applyinpandas",  # bucketed cogroup Python path
    "qk13_markov_stationary",  # 5 chained matrix-squaring join-aggs
    "qk32_wasserstein_distance",  # merged-lattice CDF cross-products
    "qk48_two_way_anova",  # decimal margins re-aggregation
    # round-7 conversion twins: fixed-model float folds + min_by keys
    "ql11_lsh_routing_audit",  # dot-sign folds, bit packing
    "ql13_lloyd_step_audit",  # padded-string argmin ties, DECIMAL means
    "ql14_projection_variance_audit",  # signed folds + moment identity
]


@pytest.mark.parametrize("name", QUERIES)
def test_result_invariant_to_shuffle_partitions(name, spark, sf_dir):
    fn = entrymod.queries()[name]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        df = fn(spark, sf_dir)
        a = rows_key(df.columns, df.collect())
        spark.conf.set("spark.sql.shuffle.partitions", "67")
        df = fn(spark, sf_dir)
        b = rows_key(df.columns, df.collect())
        assert a == b, f"{name}: results depend on partition count"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
