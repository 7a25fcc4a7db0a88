"""JVM-side vector math over array<float> columns.

Built from higher-order functions (zip_with / aggregate / transform) so
the expressions stay inside Catalyst — no Python round-trip. Used for
candidate re-ranking in LSH paths where per-row vector ops are cheap
relative to the join.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dbl(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns (float64 accumulate)."""
    return F.aggregate(F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(_dbl(a), lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine_sim(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.zip_with(_dbl(a), _dbl(b), lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda acc, x: acc + x)
    )
