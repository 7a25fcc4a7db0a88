"""Mergeable-sketch operators (Datasketches family built into Spark SQL).

At 100 TB the only viable form for distinct counts, quantiles, and set
overlap is a MERGEABLE sketch: each partition builds a small bounded
summary map-side, the shuffle moves sketches (KB) instead of values
(TB), and rollups merge sketches instead of rescanning raw data. These
queries exercise the three families Spark 4 ships natively — theta
(set algebra), KLL (quantiles), HLL (distinct rollup) — all rows-only
(estimates are engine-specific; accuracy vs exact is property-tested
in tests/test_sketches.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_distributed_kmodes_spark.registry import query
from pyspark_distributed_kmodes_spark.sources.tables import table


def _source_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "source",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")


@query("qb36_theta_source_overlap", oracle=None, tags=("sketch", "approx", "text"))
def qb36_theta_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source vocabulary overlap via theta sketches: one sketch of
    distinct tokens per document source, then pairwise
    intersection/union ESTIMATES by sketch algebra — no token-level
    join ever happens.

    Scale: the exact form is a distinct over (source, token) followed
    by a self-join on token — two corpus-sized shuffles that grow with
    vocabulary. Here each partition builds a bounded theta sketch,
    the groupBy moves kilobytes, and the pairwise stage joins
    |sources|² sketch rows (a handful). This is how corpus-overlap
    audits stay feasible when each source is terabytes.
    """
    sk = _source_tokens(spark, sf_dir).groupBy("source").agg(
        F.theta_sketch_agg("token").alias("sk")
    )
    a, b = sk.alias("a"), sk.alias("b")
    inter = F.theta_sketch_estimate(F.theta_intersection(F.col("a.sk"), F.col("b.sk")))
    union = F.theta_sketch_estimate(F.theta_union(F.col("a.sk"), F.col("b.sk")))
    return (
        a.join(b, F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            inter.alias("est_common_tokens"),
            union.alias("est_union_tokens"),
            F.round(inter / union, 6).alias("est_jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


@query("qb37_kll_price_quantiles", oracle=None, tags=("sketch", "approx", "agg"))
def qb37_kll_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group price quantiles from KLL sketches: kll_sketch_agg_double
    partial-aggregates map-side; quantile reads happen on the merged
    sketch.

    NOTE: this is the registry's ONE partition-VARIANT query (found by
    the round-7 registry-wide invariance sweep): the KLL merge tree
    follows the partitioning, so estimates move within the sketch's
    rank-error envelope when shuffle.partitions changes. That is
    inherent to mergeable sketches (fixing the merge order would defeat
    re-mergeability); the guarantee itself is what's gated — rows-only
    here, rank-error bound hash-audited in the g06/h18 family.

    Scale: exact percentiles (q14) need a full sort or a
    per-group value materialization; approx_percentile (a91) is
    one-shot. KLL sketches add the missing property for 100 TB
    pipelines: MERGEABILITY — per-shard sketches can be persisted and
    re-merged for any grouping rollup without touching raw data again.
    """
    li = table(spark, sf_dir, "lineitem")
    sk = li.groupBy("l_returnflag").agg(
        F.kll_sketch_agg_double("l_extendedprice").alias("sk"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    q = lambda p: F.kll_sketch_get_quantile_double(F.col("sk"), F.lit(p))  # noqa: E731
    return sk.select(
        "l_returnflag",
        "n_rows",
        F.round(q(0.25), 2).alias("kll_p25"),
        F.round(q(0.5), 2).alias("kll_p50"),
        F.round(q(0.75), 2).alias("kll_p75"),
        F.round(q(0.95), 2).alias("kll_p95"),
    ).orderBy("l_returnflag")


@query("qb38_hll_distinct_rollup", oracle=None, tags=("sketch", "approx", "events"))
def qb38_hll_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical distinct-user rollup from persisted HLL sketches:
    daily user sketches are built once, then WEEKLY distinct estimates
    come from hll_union_agg over the daily sketches — the hypertable
    continuous-aggregate pattern (never re-reads raw events for the
    coarser grain).

    Scale: daily sketches are the materialized rollup a streaming job
    would maintain; any coarser window (week, month, lifetime) is a
    merge of a handful of KB-sized sketches instead of a
    count-distinct shuffle over the raw corpus.
    """
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count(F.lit(1)).alias("n_events"),
    )
    weekly = daily.groupBy(
        F.date_trunc("week", "day").alias("week")
    ).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users"),
        F.sum("n_events").alias("n_events"),
        F.count(F.lit(1)).alias("n_days"),
    )
    return weekly.select("week", "est_users", "n_events", "n_days").orderBy("week")


@query("qb40_cms_heavy_hitters", oracle=None, tags=("sketch", "approx", "text"))
def qb40_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter token frequencies from a count-min sketch: the
    sketch aggregates distributed (partial+merge inside one agg), then
    the driver deserializes the few-KB blob and reads point estimates
    for the candidate set.

    Scale: frequency estimation without a per-token shuffle — the CMS
    is a fixed-size (eps=0.1%, conf=99%) summary regardless of corpus
    size, and reads are O(1) per candidate. Candidates here are the
    exact top-20 (also computed, as ground truth for the overestimate
    bound test); in production they come from a prior vocabulary or a
    sample. Rows-only: CMS guarantees est >= exact and
    est <= exact + eps*N w.h.p. — property-tested.
    """
    toks = _source_tokens(spark, sf_dir).select("token")
    blob_row, top = (
        toks.agg(
            F.count_min_sketch("token", F.lit(0.001), F.lit(0.99), F.lit(42)).alias("sk"),
            F.count(F.lit(1)).alias("n_total"),
        ).first(),
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "token")
        .limit(20)
        .collect(),
    )
    jvm = spark.sparkContext._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytes(blob_row.sk))
    )
    rows = [
        (r.token, int(r.exact_n), int(cms.estimateCount(r.token)), int(blob_row.n_total))
        for r in top
    ]
    return spark.createDataFrame(
        rows, "token string, exact_n bigint, cms_n bigint, n_total bigint"
    ).orderBy(F.col("exact_n").desc(), "token")
