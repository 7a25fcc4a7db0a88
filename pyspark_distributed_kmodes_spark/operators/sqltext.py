"""The SQL front door: a query expressed as ONE ANSI-SQL string that
both Spark (`spark.sql` over registered temp views) and DuckDB (the
oracle) execute VERBATIM — demonstrating that the engine's SQL surface
is genuinely portable, not a DataFrame-only dialect.

The statement exercises a CTE, a 4-table join, decimal-exact
aggregation, a ranked window with full tie-breaks, and the floor-form
portable rounding — the determinism contract written once, run twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark_distributed_kmodes_spark.registry import query
from pyspark_distributed_kmodes_spark.sources.tables import table

# one text, two engines: every construct below is in both dialects
_TOP_NATIONS_SQL = """
WITH rev AS (
  SELECT n.n_name AS nation,
         CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
         SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6))) AS revenue_dec
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY n.n_name, year(o.o_orderdate)
), ranked AS (
  SELECT nation, o_year,
         CAST(revenue_dec AS DOUBLE) AS revenue_d,
         rank() OVER (PARTITION BY o_year
                      ORDER BY revenue_dec DESC, nation ASC) AS rk
  FROM rev
)
SELECT o_year, CAST(rk AS INTEGER) AS rk, nation,
       (CAST(floor(revenue_d * 100.0 + 0.5) AS DOUBLE) / 100.0) AS revenue
FROM ranked
WHERE rk <= 3
ORDER BY o_year, rk, nation
"""


@query("qe13_sql_top_nations", oracle=_TOP_NATIONS_SQL, tags=("sql", "tpch"))
def qe13_sql_top_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 revenue nations per order year — executed via `spark.sql`
    with the IDENTICAL text the DuckDB oracle runs (see module
    docstring). Proves the SQL API end of the engine: a user can paste
    ANSI SQL at it and get hash-identical answers to the DataFrame API.

    Determinism inside pure SQL: the revenue aggregate stays DECIMAL
    through the window ordering (exact — rank ties are impossible to
    mis-order across engines) and converts to double only for the final
    floor-form rounding. Scale shape: Catalyst plans this exactly like
    the DataFrame twin — dims broadcast, one fact shuffle per
    aggregate, ranked window partitioned by year.
    """
    for t in ("lineitem", "orders", "customer", "nation"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_TOP_NATIONS_SQL)
