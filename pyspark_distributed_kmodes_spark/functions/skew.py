"""Skew mitigation: salted joins.

AQE's skew-join splitting handles most runtime skew; salting is the
explicit tool when one key dominates so heavily that even split
partitions bottleneck (the classic null-key / celebrity-user problem at
100 TB). The big side spreads each key over `salt` sub-keys; the small
side replicates `salt`× — results are identical to the plain join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, key: str, salt: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join `big ⋈ small` on `key` with `salt`-way key spreading.

    big:   each row gets a deterministic pseudo-random salt in [0, salt)
           (xxhash64 of the whole row's key + a per-row disambiguator is
           unnecessary — spreading only needs uniformity, so we hash
           spark_partition_id ⊕ monotonically_increasing_id-free via
           rand-free xxhash of the key AND a per-row offset column).
    small: replicated salt× via explode.

    Result columns = big's + small's (minus the duplicate key).
    """
    big_salted = big.withColumn(
        "_salt", (F.xxhash64(F.col(key), F.spark_partition_id(), F.monotonically_increasing_id()) % salt + salt) % salt
    )
    small_salted = small.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = big_salted.join(small_salted, [key, "_salt"], how).drop("_salt")
    return out
