"""Generic as-of join operator (union-merge algorithm).

Spark has no native ASOF JOIN; the scalable composition is the
union-merge: tag both relations, union them onto one (key, time) spine,
sort within key, and carry the right side's payload forward with
last_value(ignore nulls). Each input row is processed exactly once —
no join fan-out — and the only shuffle is the window partition on the
key. This is the form that survives unbounded per-key history at 100 TB
(the equi-join + filter-to-past + row_number form multiplies by
matches-per-key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    right_tie_break: str | None = None,
    inclusive: bool = True,
) -> DataFrame:
    """For each left row, attach `payload` columns from the latest right
    row with right_ts <= left_ts (or < if inclusive=False), matching on
    the `on` key. Payload columns keep their names; unmatched rows get
    NULLs (left-join semantics).

    `right_tie_break`: column ordering rows that share right_ts — the
    LAST one in ascending order wins (pass e.g. a monotone id).

    The payload travels as ONE struct carried by a single
    last(ignorenulls=True): carrying each column independently would
    back-fill a NULL in the latest right row from an OLDER right row,
    emitting a payload stitched from different rows.
    """
    tb = right_tie_break or right_ts
    payload_struct = F.struct(*[F.col(c) for c in payload])
    right_side = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_is_right"),
        F.col(tb).alias("_tb"),
        payload_struct.alias("_payload"),
    )
    struct_type = right_side.schema["_payload"].dataType
    left_side = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_is_right"),
        F.lit(None).cast(right.schema[tb].dataType).alias("_tb"),
        F.lit(None).cast(struct_type).alias("_payload"),
        *[F.col(c) for c in left.columns if c not in {on}],
    )
    # at equal timestamps: right rows first if inclusive (they count),
    # after the left row if exclusive (they don't)
    right_order = F.col("_is_right").desc() if inclusive else F.col("_is_right").asc()
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts").asc(), right_order, F.col("_tb").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = left_side.unionByName(right_side, allowMissingColumns=True).withColumn(
        "_payload", F.last("_payload", ignorenulls=True).over(w)
    )
    keep = [c for c in left.columns if c != on]
    return out.filter(F.col("_is_right") == 0).select(
        on, *keep, *[F.col(f"_payload.{c}").alias(c) for c in payload]
    )
