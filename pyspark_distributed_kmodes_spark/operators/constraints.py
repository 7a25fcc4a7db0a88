"""Declarative data-quality constraints: validate a table in ONE scan.

The missing piece between "the pipeline ran" and "the output is safe to
train on": completeness (non-null), uniqueness, domain/range membership,
and referential integrity, declared as data and evaluated as ordinary
aggregations — Spark fuses every per-row constraint into a single pass
over the table (one scan, one 1-row aggregate), uniqueness adds one
keyed aggregate, and each foreign-key check is an anti-join that
broadcasts or shuffles by AQE's choice. Violation COUNTS (not booleans)
come back so a report can rank what to fix first.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_distributed_kmodes_spark.registry import query
from pyspark_distributed_kmodes_spark.sources.tables import table


@dataclass(frozen=True)
class NotNull:
    col: str

    @property
    def name(self) -> str:
        return f"not_null({self.col})"

    def violation(self) -> Column:
        return F.col(self.col).isNull()


@dataclass(frozen=True)
class InRange:
    col: str
    lo: float
    hi: float

    @property
    def name(self) -> str:
        return f"in_range({self.col},{self.lo},{self.hi})"

    def violation(self) -> Column:
        c = F.col(self.col)
        return c.isNotNull() & ~c.between(self.lo, self.hi)


@dataclass(frozen=True)
class InSet:
    col: str
    values: tuple

    @property
    def name(self) -> str:
        return f"in_set({self.col})"

    def violation(self) -> Column:
        return F.col(self.col).isNotNull() & ~F.col(self.col).isin(*self.values)


@dataclass(frozen=True)
class Unique:
    """Violations = rows beyond the first per key (count - distinct)."""

    cols: tuple

    @property
    def name(self) -> str:
        return f"unique({','.join(self.cols)})"


@dataclass(frozen=True)
class ForeignKey:
    """Violations = rows whose key has no match in the parent table."""

    col: str
    parent: str  # table name
    parent_col: str

    @property
    def name(self) -> str:
        return f"fk({self.col}->{self.parent}.{self.parent_col})"


def check_constraints(
    spark: SparkSession,
    df: DataFrame,
    constraints: list,
    parents: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Evaluate all constraints; returns (check_name, n_violations,
    status) ordered by constraint name.

    Row-local constraints (NotNull/InRange/InSet) fuse into ONE
    aggregate over one scan. Each Unique adds one keyed aggregate;
    each ForeignKey one anti-join count. At 100 TB the row-local pass
    dominates and stays a single whole-stage-codegen scan.
    """
    # Build every constraint's count as a 1-row aggregate and cross-join
    # them into ONE plan collected by ONE action (round-13: the former
    # per-family sequential collects paid a full job launch each — 3
    # driver round-trips for qe14 where this pays 1; the independent
    # subtrees' stages run concurrently inside the single job).
    names: list[str] = []
    parts: list[DataFrame] = []
    rowlocal = [c for c in constraints if hasattr(c, "violation")]
    if rowlocal:
        parts.append(
            df.agg(
                *[
                    F.sum(F.when(c.violation(), 1).otherwise(0)).cast("bigint").alias(f"_c{len(names) + i}")
                    for i, c in enumerate(rowlocal)
                ]
            )
        )
        names += [c.name for c in rowlocal]
    for c in constraints:
        if isinstance(c, Unique):
            parts.append(
                df.groupBy(*c.cols)
                .count()
                .filter(F.col("count") > 1)
                .agg(F.coalesce(F.sum(F.col("count") - 1), F.lit(0)).cast("bigint").alias(f"_c{len(names)}"))
            )
            names.append(c.name)
        elif isinstance(c, ForeignKey):
            parent = (parents or {})[c.parent].select(F.col(c.parent_col).alias(c.col)).distinct()
            parts.append(
                df.select(c.col)
                .filter(F.col(c.col).isNotNull())
                .join(parent, c.col, "left_anti")
                .agg(F.count(F.lit(1)).cast("bigint").alias(f"_c{len(names)}"))
            )
            names.append(c.name)
    combined = parts[0]
    for p in parts[1:]:
        combined = combined.crossJoin(p)
    vals = combined.collect()[0] if parts else []
    rows = list(zip(names, vals))
    out = spark.createDataFrame(
        [(name, int(v), "pass" if v == 0 else "fail") for name, v in rows],
        "check_name string, n_violations bigint, status string",
    )
    return out.orderBy("check_name")


@query(
    "qe14_quality_constraints",
    oracle="""
SELECT 'fk(o_custkey->customer.c_custkey)' AS check_name,
       CAST((SELECT COUNT(*) FROM orders o
             WHERE o.o_custkey IS NOT NULL
               AND o.o_custkey NOT IN (SELECT c_custkey FROM customer)) AS BIGINT) AS n_violations,
       CASE WHEN (SELECT COUNT(*) FROM orders o
                  WHERE o.o_custkey IS NOT NULL
                    AND o.o_custkey NOT IN (SELECT c_custkey FROM customer)) = 0
            THEN 'pass' ELSE 'fail' END AS status
UNION ALL
SELECT 'in_range(o_totalprice,0.0,1000000.0)',
       CAST((SELECT COUNT(*) FROM orders
             WHERE o_totalprice IS NOT NULL
               AND NOT (o_totalprice BETWEEN 0.0 AND 1000000.0)) AS BIGINT),
       CASE WHEN (SELECT COUNT(*) FROM orders
                  WHERE o_totalprice IS NOT NULL
                    AND NOT (o_totalprice BETWEEN 0.0 AND 1000000.0)) = 0
            THEN 'pass' ELSE 'fail' END
UNION ALL
SELECT 'in_set(o_orderstatus)',
       CAST((SELECT COUNT(*) FROM orders
             WHERE o_orderstatus IS NOT NULL
               AND o_orderstatus NOT IN ('F', 'O', 'P')) AS BIGINT),
       CASE WHEN (SELECT COUNT(*) FROM orders
                  WHERE o_orderstatus IS NOT NULL
                    AND o_orderstatus NOT IN ('F', 'O', 'P')) = 0
            THEN 'pass' ELSE 'fail' END
UNION ALL
SELECT 'not_null(o_custkey)',
       CAST((SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL) AS BIGINT),
       CASE WHEN (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL) = 0
            THEN 'pass' ELSE 'fail' END
UNION ALL
SELECT 'not_null(o_orderdate)',
       CAST((SELECT COUNT(*) FROM orders WHERE o_orderdate IS NULL) AS BIGINT),
       CASE WHEN (SELECT COUNT(*) FROM orders WHERE o_orderdate IS NULL) = 0
            THEN 'pass' ELSE 'fail' END
UNION ALL
SELECT 'unique(o_orderkey)',
       CAST((SELECT COALESCE(SUM(c - 1), 0) FROM
              (SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey) t
             WHERE c > 1) AS BIGINT),
       CASE WHEN (SELECT COALESCE(SUM(c - 1), 0) FROM
                   (SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey) t
                  WHERE c > 1) = 0
            THEN 'pass' ELSE 'fail' END
ORDER BY check_name
""",
    tags=("quality", "constraints"),
    bench=True,
)
def qe14_quality_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate over `orders`: completeness, uniqueness,
    domain membership, value range, and referential integrity to
    `customer`, evaluated by the declarative single-pass checker
    (check_constraints above). The oracle recomputes each count with
    plain SQL — the report is exact integers, so the gate hash-matches.
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return check_constraints(
        spark,
        o,
        [
            NotNull("o_custkey"),
            NotNull("o_orderdate"),
            InRange("o_totalprice", 0.0, 1_000_000.0),
            InSet("o_orderstatus", ("F", "O", "P")),
            Unique(("o_orderkey",)),
            ForeignKey("o_custkey", "customer", "c_custkey"),
        ],
        parents={"customer": c},
    )
