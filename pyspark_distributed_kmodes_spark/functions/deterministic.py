"""Determinism helpers for the DuckDB hash oracle.

Floating-point SUM/AVG are summation-order dependent; Spark and DuckDB
partition and therefore sum in different orders, so a raw
`SUM(double)` can differ in the last ulps and fail an exact value-hash.
The fix: round each input to a fixed decimal, sum EXACTLY in decimal,
then cast the exact result to double. Both engines then produce the
bit-identical double. AVG is written as exact-sum / count so the single
final division is the only float op (IEEE-identical on both engines).

These helpers implement the Spark half; oracle SQL strings use the
mirrored pattern `CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE)`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(25,6)"  # 19 integer digits: safe for 100 TB-scale sums
SQL_DEC = "DECIMAL(25,6)"


def dsum(col: Column | str) -> Column:
    """Order-insensitive, engine-portable sum of a double column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-insensitive average: exact decimal sum / count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double") / F.count(F.lit(1))


def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS {SQL_DEC})) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS {SQL_DEC})) AS DOUBLE) / COUNT(*)"
