"""Training-mix curation operators: temperature-scaled source weights,
robust (median/MAD) outlier filtering, perplexity-proxy bucketing, and
mixture-diversity diagnostics.

These are the planning/diagnostic steps that sit between raw-corpus
stats (text.py) and mixture materialization (q95/q96/b42): decide HOW
MUCH of each source to sample, drop length outliers robustly, split each
language's documents into quality tiers, and audit how diverse the
resulting mix is. All pure JVM DataFrame ops; every oracle-gated rounded
double goes through pround (floor-form, engine-exact — see
functions/deterministic.py and the round-2 knife-edge rule).
"""

from __future__ import annotations

from pyspark_distributed_kmodes_spark.functions.lineage import cut_lineage

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_distributed_kmodes_spark.functions.deterministic import pround, sql_pround
from pyspark_distributed_kmodes_spark.registry import query
from pyspark_distributed_kmodes_spark.sources.tables import table


@query(
    "qc04_temperature_mixture_weights",
    oracle=f"""
WITH counts AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY source
), tot AS (
  SELECT CAST(SUM(n_docs) AS DOUBLE) AS n FROM counts
), powed AS (
  SELECT c.source, c.n_docs,
         pow(CAST(c.n_docs AS DOUBLE) / t.n, 0.7) AS p_alpha
  FROM counts c CROSS JOIN tot t
), z AS (
  SELECT CAST(SUM(CAST(round(p_alpha, 9) AS DECIMAL(25,12))) AS DOUBLE) AS z FROM powed
)
SELECT p.source, p.n_docs,
       {sql_pround('p.p_alpha / z.z', 6)} AS weight
FROM powed p CROSS JOIN z
ORDER BY p.source
""",
    tags=("curation", "sampling"),
)
def qc04_temperature_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source sampling weights — the multilingual /
    multi-source rebalancing rule (weight_s ∝ (n_s/N)^alpha, alpha=0.7):
    raises rare sources, damps dominant ones, the standard knob for
    building a pre-training mix from skewed corpora.

    Shape: one tiny per-source count, two 1-row scalars cross-joined
    back — at 100 TB everything after the first aggregate is
    driver-trivial (|sources| rows). Determinism: the normalizer sums
    9-decimal-rounded terms as DECIMAL (order-independent); the final
    weight is pround(6). pow/ln agree bit-for-bit across both engines'
    libm on these inputs (same pattern b12 relies on for ln).
    """
    d = table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    tot = counts.agg(F.sum("n_docs").cast("double").alias("n"))
    powed = counts.crossJoin(F.broadcast(tot)).select(
        "source", "n_docs", F.pow(F.col("n_docs").cast("double") / F.col("n"), F.lit(0.7)).alias("p_alpha")
    )
    z = powed.agg(
        F.sum(F.round("p_alpha", 9).cast("decimal(25,12)")).cast("double").alias("z")
    )
    return (
        powed.crossJoin(F.broadcast(z))
        .select("source", "n_docs", pround(F.col("p_alpha") / F.col("z"), 6).alias("weight"))
        .orderBy("source")
    )


@query(
    "qc05_mad_robust_zscores",
    oracle="""
WITH med AS (
  SELECT CAST(median(CAST(n_chars AS DOUBLE)) AS DOUBLE) AS med FROM documents
), mad AS (
  SELECT CAST(median(abs(CAST(d.n_chars AS DOUBLE) - m.med)) AS DOUBLE) AS mad, m.med AS med
  FROM documents d CROSS JOIN med m GROUP BY m.med
)
SELECT d.doc_id, CAST(d.n_chars AS BIGINT) AS n_chars,
       (CAST(d.n_chars AS DOUBLE) - m.med) / (1.4826 * m.mad) AS robust_z,
       CASE WHEN abs((CAST(d.n_chars AS DOUBLE) - m.med) / (1.4826 * m.mad)) > 3.0
            THEN 1 ELSE 0 END AS is_outlier
FROM documents d CROSS JOIN mad m
ORDER BY abs((CAST(d.n_chars AS DOUBLE) - m.med) / (1.4826 * m.mad)) DESC, d.doc_id ASC
LIMIT 20
""",
    tags=("curation", "quality"),
)
def qc05_mad_robust_zscores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) length z-scores: the normal-consistent
    robust standardization (z = (x − median) / (1.4826·MAD)) every
    outlier filter should use instead of mean/stddev — one 2 GB garbage
    document cannot drag a median-based fence. Emits the 20 most
    extreme documents with the |z| > 3 outlier flag, so the gate stays
    non-vacuous even on corpora (like this synthetic one) whose length
    distribution has no tail.

    Determinism: median/MAD of integer char counts are exact doubles
    (integers or binary-exact .5 halves under both engines' identical
    linear interpolation), and subtract/multiply/divide are the same
    IEEE ops on both sides — no rounding needed anywhere; the ordering
    tie-breaks on doc_id. Shape: two 1-row scalar aggregates broadcast
    back over the scan (b31's adaptive-threshold pattern), then a
    global top-20 (TakeOrderedAndProject — no full sort). At 100 TB
    swap exact median for approx_percentile; plan shape unchanged.
    """
    d = table(spark, sf_dir, "documents")
    x = F.col("n_chars").cast("double")
    med = d.agg(F.median(x).alias("med"))
    mad = (
        d.crossJoin(F.broadcast(med))
        .agg(F.median(F.abs(x - F.col("med"))).alias("mad"), F.first("med").alias("med"))
    )
    z = (x - F.col("med")) / (1.4826 * F.col("mad"))
    return (
        d.crossJoin(F.broadcast(mad))
        .select(
            "doc_id",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            z.alias("robust_z"),
            F.when(F.abs(z) > 3.0, 1).otherwise(0).alias("is_outlier"),
        )
        .orderBy(F.abs(F.col("robust_z")).desc(), F.col("doc_id").asc())
        .limit(20)
    )


@query(
    "qc06_logprob_quality_tiers",
    oracle=f"""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), freq AS (
  SELECT word, COUNT(*) AS cnt FROM words GROUP BY word
), total AS (
  SELECT COUNT(*) AS n FROM words
), scored AS (
  SELECT w.doc_id,
         {sql_pround('CAST(SUM(CAST(round(ln(CAST(f.cnt AS DOUBLE) / t.n), 6) AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*)', 6)} AS avg_logprob
  FROM words w JOIN freq f USING (word) CROSS JOIN total t
  GROUP BY w.doc_id
), docs AS (
  SELECT d.doc_id, d.lang, s.avg_logprob FROM documents d JOIN scored s USING (doc_id)
), thr AS (
  SELECT lang,
         {sql_pround('quantile_cont(avg_logprob, 0.333)', 6)} AS p33,
         {sql_pround('quantile_cont(avg_logprob, 0.667)', 6)} AS p67
  FROM docs GROUP BY lang
)
SELECT d.lang,
       CASE WHEN d.avg_logprob >= t.p67 THEN 'head'
            WHEN d.avg_logprob >= t.p33 THEN 'middle'
            ELSE 'tail' END AS tier,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(d.doc_id) AS BIGINT) AS min_doc_id
FROM docs d JOIN thr t USING (lang)
GROUP BY d.lang, tier
ORDER BY d.lang, tier
""",
    tags=("curation", "quality"),
)
def qc06_logprob_quality_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality tiers: score every document with the unigram
    LM proxy (b12's avg per-word log-probability), learn per-language
    tercile thresholds, and bucket into head / middle / tail — the
    standard perplexity-partitioned curation split (keep head+middle,
    resample or drop tail).

    Determinism: scores are pround(6) (b12's contract); the per-lang
    terciles are pround(6) of the SAME linear-interpolation quantile
    both engines implement; tier assignment compares rounded score to
    rounded threshold with >= on both boundaries. Shape: b12's score
    pass, then a |langs|-row threshold aggregate broadcast back — one
    extra tiny join over the score computation, nothing driver-side.
    """
    from pyspark_distributed_kmodes_spark.operators.training import o12_unigram_logprob

    d = table(spark, sf_dir, "documents").select("doc_id", "lang")
    scored = o12_unigram_logprob(spark, sf_dir).select("doc_id", "avg_logprob")
    # the scored join feeds the threshold learner AND the tiering pass;
    # materialize it so the b12 LM scoring pipeline runs once, and the
    # |langs|-row thresholds never replay it (scan-lint)
    docs = d.join(scored, "doc_id").transform(cut_lineage)
    thr = docs.groupBy("lang").agg(
        pround(F.expr("percentile(avg_logprob, 0.333)"), 6).alias("p33"),
        pround(F.expr("percentile(avg_logprob, 0.667)"), 6).alias("p67"),
    )
    tier = (
        F.when(F.col("avg_logprob") >= F.col("p67"), "head")
        .when(F.col("avg_logprob") >= F.col("p33"), "middle")
        .otherwise("tail")
    )
    return (
        docs.join(F.broadcast(thr), "lang")
        .withColumn("tier", tier)
        .groupBy("lang", "tier")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("min_doc_id"),
        )
        .orderBy("lang", "tier")
    )


@query(
    "qc07_mixture_entropy_report",
    oracle=f"""
WITH cell AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY lang, source
), lang_tot AS (
  SELECT lang, CAST(SUM(n) AS DOUBLE) AS n_lang, CAST(COUNT(*) AS BIGINT) AS n_sources
  FROM cell GROUP BY lang
)
SELECT c.lang,
       lt.n_sources,
       CAST(lt.n_lang AS BIGINT) AS n_docs,
       {sql_pround("CAST(SUM(CAST(round(-(c.n / lt.n_lang) * ln(c.n / lt.n_lang), 9) AS DECIMAL(25,12))) AS DOUBLE)", 6)} AS entropy,
       {sql_pround("CASE WHEN lt.n_sources > 1 THEN CAST(SUM(CAST(round(-(c.n / lt.n_lang) * ln(c.n / lt.n_lang), 9) AS DECIMAL(25,12))) AS DOUBLE) / ln(CAST(lt.n_sources AS DOUBLE)) ELSE 0.0 END", 6)} AS norm_entropy
FROM cell c JOIN lang_tot lt USING (lang)
GROUP BY c.lang, lt.n_sources, lt.n_lang
ORDER BY c.lang
""",
    tags=("curation", "diagnostics"),
)
def qc07_mixture_entropy_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-diversity audit: Shannon entropy of the source
    distribution within each language, plus the [0,1]-normalized form
    (entropy / ln n_sources) — the one-number diagnostic for "is this
    language's data all coming from one source?" that gates mixture
    sign-off before a training run.

    Determinism: each -p·ln(p) term rounds to 9 decimals then sums as
    DECIMAL (order-independent, b12's pattern); final values pround(6).
    Shape: one (lang, source) count, one per-lang roll-up — two tiny
    shuffles on low-cardinality keys, nothing data-dependent broadcast.
    """
    d = table(spark, sf_dir, "documents")
    cell = d.groupBy("lang", "source").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    lang_tot = cell.groupBy("lang").agg(
        F.sum("n").cast("double").alias("n_lang"), F.count(F.lit(1)).cast("bigint").alias("n_sources")
    )
    p = F.col("n") / F.col("n_lang")
    term = F.round(-p * F.log(p), 9).cast("decimal(25,12)")
    ent = F.sum(term).cast("double")
    return (
        cell.join(lang_tot, "lang")
        .groupBy("lang", "n_sources", "n_lang")
        .agg(
            pround(ent, 6).alias("entropy"),
            pround(
                F.when(
                    F.col("n_sources") > 1, ent / F.log(F.col("n_sources").cast("double"))
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("norm_entropy"),
        )
        .select(
            "lang",
            "n_sources",
            F.col("n_lang").cast("bigint").alias("n_docs"),
            "entropy",
            "norm_entropy",
        )
        .orderBy("lang")
    )
