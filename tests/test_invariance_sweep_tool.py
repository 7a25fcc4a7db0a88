"""The partition-invariance sweep tool must FIRE on a planted
partition-variant query (round-7 verdict item 4's planted-positive
discipline, mirrored from tests/test_scan_lint.py): a float sum whose
value is quantized AFTER accumulation is summation-order-dependent, so
5-partition and 67-partition runs disagree — if the sweep calls that
clean, the tool is broken, not the registry."""

from pyspark.sql import functions as F

from pyspark_distributed_kmodes_spark.sources.tables import table
from tools.invariance_sweep import KNOWN_VARIANT, sweep


def _variant_query(spark, sf_dir):
    """Deliberately order-dependent: float sum with catastrophic
    cancellation (alternating ±1e16 spikes dwarf the payload, so the
    partial-sum tree decides which low bits survive), every accumulated
    bit exposed via the exact string form."""
    li = table(spark, sf_dir, "lineitem")
    # repartition-by-key uses spark.sql.shuffle.partitions — the same
    # mechanism that gives real shuffling queries their reducer count —
    # so 5 vs 67 produces different partial-sum trees
    return li.repartition("l_orderkey").agg(
        F.expr(
            "CAST(SUM(CASE WHEN l_orderkey % 2 = 0 THEN 1e16 ELSE -1e16 END"
            " + CAST(l_extendedprice AS DOUBLE)) AS STRING)"
        ).alias("order_dependent_sum")
    )


def _invariant_query(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.agg(F.sum("l_quantity").cast("decimal(25,2)").alias("exact_sum"))


def test_sweep_fires_on_planted_variant(spark, sf_dir):
    variants, errors = sweep(
        spark, sf_dir, fns={"planted_variant": _variant_query}
    )
    assert errors == []
    assert variants == ["planted_variant"], (
        "sweep must flag a raw-float-sum query as partition-variant"
    )


def test_sweep_quiet_on_exact_arithmetic(spark, sf_dir):
    variants, errors = sweep(
        spark, sf_dir, fns={"exact_decimal": _invariant_query}
    )
    assert variants == [] and errors == []


def test_known_variant_list_is_exactly_qb37():
    assert sorted(KNOWN_VARIANT) == ["qb37_kll_price_quantiles"]
