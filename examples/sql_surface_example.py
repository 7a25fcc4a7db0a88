"""Tour of the engine's Spark-4 SQL surface (the round-9 n-suite,
operators/analytics11.py) as a user would drive it:

  1. WITH RECURSIVE — BFS reachability over a graph derived from the
     nation table, and a hierarchy walk whose per-depth rollup is
     cross-checked against the digit-length identity.
  2. SQL scalar UDFs (CREATE FUNCTION ... RETURN expr) — declarative
     user logic that inlines into codegen (no Python boundary).
  3. SQL table-valued UDF + correlated LATERAL join — per-customer
     top-k, with the ORDER BY+LIMIT decorrelation pitfall avoided.
  4. Session variables + EXECUTE IMMEDIATE — a data-derived cutoff
     flowing through DECLARE/SET VAR into a dynamic statement.
  5. Collated grouping — case-insensitive GROUP BY via UNICODE_CI.
  6. State-store reader — auditing a streaming checkpoint's internal
     state against the batch answer.

    python examples/sql_surface_example.py [sf_dir]
"""

import sys

sys.path.insert(0, "/root/repo")

from pyspark_distributed_kmodes_spark.registry import load_all
from pyspark_distributed_kmodes_spark.session import get_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("sql-surface-example")
    reg = load_all()

    print("== 1a. recursive CTE: BFS min-hop from the lowest-keyed nation ==")
    reg["qn01_recursive_reachability"].fn(spark, sf_dir).show(8)

    print("== 1b. recursive CTE: hierarchy walk, per-depth rollup ==")
    reg["qn02_recursive_hierarchy_rollup"].fn(spark, sf_dir).show()

    print("== 2. SQL scalar UDFs inlined into a grouped aggregate ==")
    reg["qn03_sql_scalar_udf"].fn(spark, sf_dir).show(9)

    print("== 3. SQL table UDF via correlated LATERAL (top-3 per customer) ==")
    reg["qn04_sql_table_udf_lateral"].fn(spark, sf_dir).show(9)

    print("== 4. session variable -> EXECUTE IMMEDIATE (above-mean orders) ==")
    reg["qn07_session_variable_exec"].fn(spark, sf_dir).show()

    print("== 5. UNICODE_CI collated grouping (top tokens, case-insensitive) ==")
    reg["qn05_collated_token_grouping"].fn(spark, sf_dir).show(10)

    print("== 6. statestore reader: streaming state == batch aggregate ==")
    state = reg["qn06_statestore_reader"].fn(spark, sf_dir)
    state.show()

    spark.stop()


if __name__ == "__main__":
    main()
