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


def pround(col: Column | str, nd: int = 6) -> Column:
    """Portable round-half-up: floor(x*10^nd + 0.5) / 10^nd, pure IEEE
    double ops that Spark and DuckDB compute bit-identically.

    Built-in round() diverges between engines on boundary values:
    Spark rounds the double's SHORTEST DECIMAL REPR (BigDecimal.valueOf)
    while DuckDB rounds the BINARY value, so a mean whose repr sits on a
    ...5 boundary (e.g. 0.0032135 stored as 0.00321349999...) rounds up
    in Spark and down in DuckDB — a one-ulp hash mismatch that only
    appears when the data lands on a boundary (b08 at sf0.1 did).
    The floor form trades exact decimal-round semantics at the boundary
    for engine-identical results everywhere. Mirror: sql_pround.
    """
    c = F.col(col) if isinstance(col, str) else col
    s = float(10**nd)
    return F.floor(c * F.lit(s) + F.lit(0.5)).cast("double") / F.lit(s)


def sql_pround(expr: str, nd: int = 6) -> str:
    # Caveat (round-12 hypothesis find): a 17-digit DECIMAL LITERAL fed
    # into `expr` goes through DuckDB's decimal parse (scaled-integer /
    # 10^k), which can land 1 ulp off python/Spark's correctly-rounded
    # float parse — a literal-transport artifact, deterministic per
    # literal (a key that passes once passes always), and absent for
    # values transported via parquet or bound parameters. Keep embedded
    # oracle literals short, or verify the key at all SFs as usual.
    s = float(10**nd)
    return f"(CAST(floor(({expr}) * {s} + 0.5) AS DOUBLE) / {s})"
