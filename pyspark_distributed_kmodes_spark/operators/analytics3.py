"""Round-4 analytics extensions, third batch (f17-f21): label-quality
and pipeline-health audits — language-ID agreement, n-gram eval-set
decontamination (the GPT-3 method at segment granularity), model-score
calibration, shard skew, and daily event-mix drift.

Same staging as f01-f16: keys sort after the live 50-entry window and
rotate in next round; all oracle-gated, all green on the local mirror.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark_distributed_kmodes_spark.functions.deterministic import pround, sql_pround
from pyspark_distributed_kmodes_spark.registry import query
from pyspark_distributed_kmodes_spark.sources.tables import table

# q58's langid pipeline as a reusable oracle prefix (text.py:368 — the
# same dedup-across-queries convention as the near-dup edge CTE)
_LANGID_CTE = """
tri AS (
  SELECT doc_id, lang,
         unnest(list_transform(range(1, greatest(len(text) - 2, 1) + 1),
                i -> substr(text, i, 3))) AS tri
  FROM documents
), counts AS (
  SELECT lang, tri, COUNT(*) AS cnt FROM tri WHERE doc_id % 10 < 8 GROUP BY 1, 2
), profile AS (
  SELECT lang AS cand_lang, tri, ln(cnt + 1) AS weight
  FROM (SELECT lang, tri, cnt,
               row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, tri ASC) AS rn
        FROM counts)
  WHERE rn <= 50
), scored AS (
  SELECT t.doc_id, t.lang AS true_lang, p.cand_lang,
         CAST(SUM(CAST((CAST(floor((p.weight) * 1000000000.0 + 0.5) AS DOUBLE) / 1000000000.0) AS DECIMAL(25,12))) AS DOUBLE) AS score
  FROM tri t JOIN profile p USING (tri)
  WHERE t.doc_id % 10 >= 8
  GROUP BY 1, 2, 3
), pred AS (
  SELECT doc_id, true_lang, cand_lang AS predicted_lang
  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cand_lang ASC) AS rn
        FROM scored)
  WHERE rn = 1
)"""


@query(
    "f17_langid_agreement",
    oracle=f"""
WITH {_LANGID_CTE}
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_tested,
       CAST(SUM(CASE WHEN p.predicted_lang = p.true_lang THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
       {sql_pround('CAST(SUM(CASE WHEN p.predicted_lang = p.true_lang THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)', 6)} AS agreement_rate
FROM pred p JOIN documents d ON d.doc_id = p.doc_id
GROUP BY d.source
ORDER BY d.source
""",
    tags=("text", "quality", "audit"),
)
def f17_langid_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-quality audit: per source, how often does q58's trained
    language-ID model AGREE with the corpus's lang labels on the
    held-out split — the mislabeled-metadata detector every multilingual
    curation pipeline runs, because a source whose labels the model
    can't reproduce either has dirty labels or out-of-profile text,
    and both mean "don't trust lang-conditional sampling there".
    (On this shared-vocabulary synthetic corpus agreement ~ chance;
    the operator is the real audit shape.)

    Scale: q58's pipeline unchanged (profiles are a 50x|langs|
    broadcast; scoring is linear in held-out trigrams), plus one
    doc_id join and a per-source aggregate. Integer counts, one
    division, pround(6).
    """
    from pyspark_distributed_kmodes_spark.operators.text import q58_language_id

    pred = q58_language_id(spark, sf_dir)
    src = table(spark, sf_dir, "documents").select("doc_id", "source")
    agree = F.sum((F.col("predicted_lang") == F.col("true_lang")).cast("int"))
    return (
        pred.join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tested"),
            agree.cast("bigint").alias("n_agree"),
            pround(agree.cast("double") / F.count(F.lit(1)), 6).alias("agreement_rate"),
        )
        .orderBy("source")
    )


_DECON_N = 8  # n-gram width for eval-overlap detection
_EVAL_SOURCE = "src19"  # held-out "benchmark" source


@query(
    "f18_ngram_decontamination",
    oracle=f"""
WITH grams AS (
  SELECT DISTINCT doc_id, source,
         unnest(list_transform(range(1, len(string_split(text, ' ')) - {_DECON_N - 2}),
                i -> array_to_string(string_split(text, ' ')[i:i + {_DECON_N - 1}], ' '))) AS g
  FROM documents
), eval_grams AS (
  SELECT DISTINCT g FROM grams WHERE source = '{_EVAL_SOURCE}'
), hits AS (
  SELECT t.doc_id, COUNT(DISTINCT t.g) AS n_shared
  FROM grams t JOIN eval_grams e ON e.g = t.g
  WHERE t.source <> '{_EVAL_SOURCE}'
  GROUP BY t.doc_id
)
SELECT d.doc_id, d.source,
       CAST(COALESCE(h.n_shared, 0) AS BIGINT) AS n_shared_ngrams,
       CAST(h.doc_id IS NOT NULL AS INTEGER) AS contaminated
FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
WHERE d.source <> '{_EVAL_SOURCE}'
ORDER BY d.doc_id
""",
    tags=("dedup", "training", "decontamination"),
)
def f18_ngram_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram eval-set decontamination (the GPT-3 report's method):
    flag every training document sharing at least one {_DECON_N}-word
    n-gram with the held-out benchmark source — q75's hash-level
    decontamination only catches verbatim documents; n-gram overlap
    catches a benchmark QUESTION quoted inside an otherwise-unique
    page, which is how eval leakage actually happens.

    Scale: the join key is the n-gram itself (inverted index — only
    docs SHARING an n-gram ever meet, never corpus x eval); the eval
    side is distinct-collapsed first. DISTINCT per doc keeps the
    count a per-doc unique-overlap measure. Integer counts only.
    """
    d = table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    n_words = F.size(words)
    starts = F.sequence(F.lit(1), F.greatest(n_words - (_DECON_N - 1), F.lit(0)))
    grams = (
        d.select(
            "doc_id",
            "source",
            F.explode(F.transform(starts, lambda s: F.slice(words, s, _DECON_N))).alias("gm"),
        )
        .select("doc_id", "source", F.array_join("gm", " ").alias("g"))
        .distinct()
    )
    eval_grams = grams.filter(F.col("source") == _EVAL_SOURCE).select("g").distinct()
    hits = (
        grams.filter(F.col("source") != _EVAL_SOURCE)
        .join(eval_grams, "g")
        .groupBy("doc_id")
        .agg(F.count_distinct("g").alias("n_shared"))
    )
    return (
        d.filter(F.col("source") != _EVAL_SOURCE)
        .select("doc_id", "source")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.coalesce("n_shared", F.lit(0)).cast("bigint").alias("n_shared_ngrams"),
            F.col("n_shared").isNotNull().cast("int").alias("contaminated"),
        )
        .orderBy("doc_id")
    )


_CAL_M = 2147483647


@query(
    "f19_score_calibration",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, md5(text) AS h,
         CAST(list_reduce(
           list_prepend(CAST(7 AS BIGINT),
             list_transform(list_filter(string_split(text, ''), c -> c <> ''),
                            c -> CAST(ascii(c) AS BIGINT))),
           (acc, x) -> (acc * 131 + x) % {_CAL_M}) % 1000 AS DOUBLE) / 1000.0 AS score
  FROM documents
), dupes AS (
  SELECT h, COUNT(*) AS c FROM scored GROUP BY h
), bucketed AS (
  SELECT CAST(floor(s.score * 10.0) AS INTEGER) AS bucket,
         CAST(d.c > 1 AS INTEGER) AS is_dup
  FROM scored s JOIN dupes d ON d.h = s.h
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(is_dup) AS BIGINT) AS n_dup,
       {sql_pround('CAST(SUM(is_dup) AS DOUBLE) / COUNT(*)', 6)} AS dup_rate
FROM bucketed
GROUP BY bucket
ORDER BY bucket
""",
    tags=("training", "quality", "audit"),
)
def f19_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-score calibration report: bucket qb13's quality scores
    into deciles and measure the exact-duplicate rate per bucket —
    the "is the classifier's score actually predictive?" check run
    before a score threshold gates terabytes (a useful quality score
    should correlate with SOMETHING ground-truthable; dup-rate is the
    cheapest such target).

    Here the scorer runs as a pure JVM `reduce` over characters (the
    same base-131 fold qb13 computes in a pandas UDF — demonstrating
    the Arrow batch and the codegen formulations of one model side by
    side). Scale: one scoring scan, one hash-count shuffle, one join
    back, a 10-bucket aggregate. Integer counts, one division,
    pround(6).
    """
    d = table(spark, sf_dir, "documents")
    score = (
        F.expr(
            f"reduce(filter(split(text, ''), c -> c <> ''), 7L, "
            f"(acc, c) -> (acc * 131L + ascii(c)) % {_CAL_M}L) % 1000L"
        ).cast("double")
        / 1000.0
    )
    scored = d.select("doc_id", F.md5("text").alias("h"), score.alias("score"))
    dupes = scored.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    bucketed = scored.join(dupes, "h").select(
        F.floor(F.col("score") * 10.0).cast("int").alias("bucket"),
        (F.col("c") > 1).cast("int").alias("is_dup"),
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("is_dup").cast("bigint").alias("n_dup"),
            pround(F.sum("is_dup").cast("double") / F.count(F.lit(1)), 6).alias("dup_rate"),
        )
        .orderBy("bucket")
    )


_N_SHARDS = 8  # must match e20


@query(
    "f20_shard_skew_audit",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(list_sum(list_transform(range(1, 9), i ->
               (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1)
               * CAST(pow(16, 8 - i) AS BIGINT))) AS BIGINT) AS h
  FROM documents
), per AS (
  SELECT CAST(h % {_N_SHARDS} AS INTEGER) AS shard,
         COUNT(*) AS n_docs, SUM(n_tokens) AS n_tokens
  FROM keyed GROUP BY 1
), tot AS (
  SELECT SUM(n_tokens) AS t, COUNT(*) AS n_shards FROM per
)
SELECT p.shard,
       CAST(p.n_docs AS BIGINT) AS n_docs,
       CAST(p.n_tokens AS BIGINT) AS n_tokens,
       {sql_pround('CAST(p.n_tokens AS DOUBLE) / t.t', 6)} AS token_share,
       {sql_pround('CAST(p.n_tokens AS DOUBLE) * t.n_shards / t.t', 6)} AS skew_vs_mean
FROM per p CROSS JOIN tot t
ORDER BY p.shard
""",
    tags=("curation", "training", "audit"),
)
def f20_shard_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard balance audit for e20's deterministic shuffle:
    per shard, document and TOKEN counts plus each shard's load
    relative to the mean — dataloaders synchronize on the slowest
    shard, so a skew_vs_mean of 1.3 means ~30% of every epoch is
    idle time; this is the number that decides between modulo
    sharding and explicit token balancing (e33's packing analysis
    feeds the same decision).

    Scale: the e20 hash placement re-derived in one projection (same
    md5 fold, bit-identical), then a {_N_SHARDS}-group aggregation
    and a 1-row totals broadcast. Integer sums, single divisions,
    pround(6).
    """
    from pyspark_distributed_kmodes_spark.operators.curation3 import _hash_u

    d = table(spark, sf_dir, "documents")
    # e20's integer hash: the same md5-hex fold _hash_u scales to (0,1)
    h = (_hash_u(F.col("doc_id")) * F.lit(float(2**32)) - 0.5).cast("bigint")
    keyed = d.select(
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        (h % _N_SHARDS).cast("int").alias("shard"),
    )
    per = keyed.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("n_tokens")
    )
    tot = per.agg(F.sum("n_tokens").alias("t"), F.count(F.lit(1)).alias("n_shards"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "shard",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            pround(F.col("n_tokens").cast("double") / F.col("t"), 6).alias("token_share"),
            pround(
                F.col("n_tokens").cast("double") * F.col("n_shards") / F.col("t"), 6
            ).alias("skew_vs_mean"),
        )
        .orderBy("shard")
    )


_MIX_WIN = 7  # trailing days forming the baseline mix


@query(
    "f21_daily_mix_drift",
    oracle=f"""
WITH per AS (
  SELECT epoch_us(date_trunc('day', ts)) // {86_400_000_000} AS di, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), grid AS (
  SELECT d.di, t.event_type, COALESCE(p.n, 0) AS n
  FROM (SELECT DISTINCT di FROM per) d
  CROSS JOIN (SELECT DISTINCT event_type FROM per) t
  LEFT JOIN per p ON p.di = d.di AND p.event_type = t.event_type
), framed AS (
  SELECT di, event_type, n,
         SUM(n) OVER (PARTITION BY event_type ORDER BY di ASC
                      ROWS BETWEEN {_MIX_WIN} PRECEDING AND 1 PRECEDING) AS trail_n,
         COUNT(*) OVER (PARTITION BY event_type ORDER BY di ASC
                        ROWS BETWEEN {_MIX_WIN} PRECEDING AND 1 PRECEDING) AS n_prev
  FROM grid
), totals AS (
  SELECT di,
         SUM(n) AS day_total,
         SUM(trail_n) AS trail_total,
         MIN(n_prev) AS min_prev
  FROM framed GROUP BY di
), terms AS (
  SELECT f.di, t.day_total,
         (f.n - t.day_total * (CAST(f.trail_n AS DOUBLE) / t.trail_total))
         * (f.n - t.day_total * (CAST(f.trail_n AS DOUBLE) / t.trail_total))
         / (t.day_total * (CAST(f.trail_n AS DOUBLE) / t.trail_total)) AS chi2_term
  FROM framed f JOIN totals t ON t.di = f.di
  WHERE t.min_prev = {_MIX_WIN} AND t.trail_total > 0 AND f.trail_n > 0
)
SELECT CAST(di AS BIGINT) AS day_index,
       CAST(day_total AS BIGINT) AS n_events,
       {sql_pround('SUM(chi2_term)', 6)} AS chi2
FROM terms GROUP BY di, day_total ORDER BY day_index
""",
    tags=("events", "drift", "anomaly"),
)
def f21_daily_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-type mix drift: chi-square of each day's event-type
    distribution against the trailing {_MIX_WIN}-day pooled mix — the
    composition tripwire that fires when (say) errors surge even
    though total volume looks normal (d14 watches VOLUME; this
    watches SHAPE; f01 does the same for static corpora).

    Scale: the stream collapses to per-(day, type) counts (one
    map-side-combined shuffle); the dense day x type grid, the
    trailing windows (partitioned BY TYPE — parallel over types, each
    walking the bounded day grid), and the chi-square aggregation are
    all domain-bounded. Determinism: counts are exact integers;
    expected frequencies and chi-square terms are one fixed IEEE
    chain; zero-expectation rows are excluded identically on both
    engines; pround(6).
    """
    e = table(spark, sf_dir, "events")
    di = (F.unix_micros(F.date_trunc("day", "ts")) / 86_400_000_000).cast("bigint")
    per = e.groupBy(di.alias("di"), "event_type").agg(F.count(F.lit(1)).alias("n"))
    days = per.select("di").distinct()
    types = per.select("event_type").distinct()
    grid = (
        days.crossJoin(F.broadcast(types))
        .join(per, ["di", "event_type"], "left")
        .select("di", "event_type", F.coalesce("n", F.lit(0)).alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy("di").rowsBetween(-_MIX_WIN, -1)
    framed = grid.select(
        "di",
        "event_type",
        "n",
        F.sum("n").over(w).alias("trail_n"),
        F.count(F.lit(1)).over(w).alias("n_prev"),
    )
    totals = framed.groupBy("di").agg(
        F.sum("n").alias("day_total"),
        F.sum("trail_n").alias("trail_total"),
        F.min("n_prev").alias("min_prev"),
    )
    j = framed.join(totals, "di").filter(
        (F.col("min_prev") == _MIX_WIN) & (F.col("trail_total") > 0) & (F.col("trail_n") > 0)
    )
    expected = F.col("day_total") * (F.col("trail_n").cast("double") / F.col("trail_total"))
    term = (F.col("n") - expected) * (F.col("n") - expected) / expected
    return (
        j.select("di", "day_total", term.alias("chi2_term"))
        .groupBy("di", "day_total")
        .agg(pround(F.sum("chi2_term"), 6).alias("chi2"))
        .select(
            F.col("di").cast("bigint").alias("day_index"),
            F.col("day_total").cast("bigint").alias("n_events"),
            "chi2",
        )
        .orderBy("day_index")
    )
