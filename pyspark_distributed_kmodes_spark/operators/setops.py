"""Set operations: UNION [ALL] / INTERSECT [ALL] / EXCEPT [ALL]."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_distributed_kmodes_spark.registry import query
from pyspark_distributed_kmodes_spark.sources.tables import table


def _cust_nations(spark, sf_dir):
    return table(spark, sf_dir, "customer").select(F.col("c_nationkey").cast("int").alias("nationkey"))


def _supp_nations(spark, sf_dir):
    return table(spark, sf_dir, "supplier").select(F.col("s_nationkey").cast("int").alias("nationkey"))


@query(
    "q25_union_distinct",
    oracle="""
SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
UNION
SELECT CAST(s_nationkey AS INTEGER) FROM supplier
ORDER BY nationkey
""",
    tags=("setop",),
)
def q25_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): nations having a customer or a supplier."""
    return _cust_nations(spark, sf_dir).union(_supp_nations(spark, sf_dir)).distinct().orderBy("nationkey")


@query(
    "q26_intersect",
    oracle="""
SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
INTERSECT
SELECT CAST(s_nationkey AS INTEGER) FROM supplier
ORDER BY nationkey
""",
    tags=("setop",),
)
def q26_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: nations with both customers and suppliers."""
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir)).orderBy("nationkey")


@query(
    "q27_except",
    oracle="""
SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
EXCEPT
SELECT CAST(s_nationkey AS INTEGER) FROM supplier
ORDER BY nationkey
""",
    tags=("setop",),
)
def q27_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: nations with customers but no suppliers."""
    return _cust_nations(spark, sf_dir).subtract(_supp_nations(spark, sf_dir)).orderBy("nationkey")


@query(
    "o10_intersect_except_all",
    oracle="""
SELECT op, nationkey, COUNT(*) AS n
FROM (
  SELECT 'intersect_all' AS op, nationkey FROM (
    SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
    INTERSECT ALL
    SELECT CAST(s_nationkey AS INTEGER) FROM supplier
  )
  UNION ALL
  SELECT 'except_all' AS op, nationkey FROM (
    SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
    EXCEPT ALL
    SELECT CAST(s_nationkey AS INTEGER) FROM supplier
  )
) t
GROUP BY op, nationkey
ORDER BY op, nationkey
""",
    tags=("setop",),
)
def o10_intersect_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL (bag semantics): per nation,
    min(customer-count, supplier-count) copies survive intersectAll and
    max(customer-count − supplier-count, 0) survive exceptAll; the
    result aggregates multiplicities so the oracle hash is order-free.

    Scale: Catalyst plans both as a single aggregate computing per-side
    counts then replicating — one shuffle on the compare key, no join.
    """
    c, s = _cust_nations(spark, sf_dir), _supp_nations(spark, sf_dir)
    ia = c.intersectAll(s).select(F.lit("intersect_all").alias("op"), "nationkey")
    ea = c.exceptAll(s).select(F.lit("except_all").alias("op"), "nationkey")
    return (
        ia.unionByName(ea)
        .groupBy("op", "nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("op", "nationkey")
    )


@query(
    "q28_union_all_tagged",
    oracle="""
SELECT 'customer' AS side, CAST(c_nationkey AS INTEGER) AS nationkey, COUNT(*) AS n
FROM customer GROUP BY c_nationkey
UNION ALL
SELECT 'supplier' AS side, CAST(s_nationkey AS INTEGER) AS nationkey, COUNT(*) AS n
FROM supplier GROUP BY s_nationkey
ORDER BY side, nationkey
""",
    tags=("setop",),
)
def q28_union_all_tagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL with provenance tag (unionByName for schema safety)."""
    c = (
        _cust_nations(spark, sf_dir)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("customer").alias("side"), "nationkey", "n")
    )
    s = (
        _supp_nations(spark, sf_dir)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("supplier").alias("side"), "nationkey", "n")
    )
    return c.unionByName(s).orderBy("side", "nationkey")
