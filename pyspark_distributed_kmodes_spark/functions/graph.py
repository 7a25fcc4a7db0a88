"""Connected components over an edge list — the clustering step that
turns near-duplicate PAIRS into dedup GROUPS (keep one doc per
component). Implemented as iterative min-label propagation PLUS
pointer doubling:

    label(v) ← min(label(v),                 # keep
                   min over neighbors u of label(u),   # propagate 1 hop
                   label(label(v)))          # pointer doubling

repeated until fixpoint. Plain propagation needs O(diameter) rounds; the
label(label(v)) term halves remaining path length each round, giving
O(log diameter) — the same convergence class as the large-star/small-star
map-reduce CC algorithm (Kiveris et al.), with simpler per-round plans
(one edge→label join + one label→label join + one min-agg: 3 shuffles).

Scale notes: every round ends in `localCheckpoint(eager=True)` — without
it each iteration's plan embeds the previous plan several times and the
Catalyst tree grows exponentially (analysis stack overflow long before
data size matters). Checkpointing also bounds recovery lineage on a real
cluster. Deterministic: labels are vertex ids, min is total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25) -> DataFrame:
    """(vertex, component) for every vertex appearing in `edges`;
    component = min vertex id reachable. Undirected (edges symmetrized
    internally). Converges in O(log diameter) rounds via pointer
    doubling; `max_iter` is a safety bound, not the expected count."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # fused round 0: label(v) = min(v, min neighbor) straight from the
    # edge aggregation — one shuffle replaces a full propagate round
    # (identity-label round 1 would also make pointer doubling a no-op)
    labels = (
        sym.groupBy("a")
        .agg(F.least(F.col("a"), F.min("b")).alias("label"))
        .select(F.col("a").alias("v"), "label")
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = sym.join(
            labels.select(F.col("v").alias("b"), "label"), "b"
        ).select(F.col("a").alias("v"), "label")
        # pointer doubling: label(v) ← label(label(v))
        doubled = labels.join(
            labels.select(F.col("v").alias("label"), F.col("label").alias("label2")),
            "label",
        ).select("v", F.col("label2").alias("label"))
        new_labels = (
            labels.unionByName(neighbor_min)
            .unionByName(doubled)
            .groupBy("v")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "v")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("v").alias("vertex"), F.col("label").alias("component"))
