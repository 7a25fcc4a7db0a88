"""Sampling and audit operators, continued: deterministic weighted
reservoir sampling, asymmetric containment detection, OOV-rate audit,
rare-strata (k-anonymity-style) audit, and length/quality correlation.

Keys are z-prefixed: this round's 50-entry driver window is already
fully occupied by never-verified keys (a91, b08–b42, c01–c14), so these
sort AFTER it, pass the identical local mirror now, and rotate into the
window next round (the scheme __spark_entry__.py documents). Engine
style unchanged: pure JVM DataFrame ops, pround floor-rounding on every
oracle-gated double, decimal-summed float aggregates.
"""

from __future__ import annotations

from pyspark_distributed_kmodes_spark.functions.lineage import cut_lineage

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark_distributed_kmodes_spark.functions.deterministic import pround, sql_pround
from pyspark_distributed_kmodes_spark.operators.curation2 import _dterm, _sql_dterm
from pyspark_distributed_kmodes_spark.registry import query
from pyspark_distributed_kmodes_spark.sources.tables import table


def _words():
    return F.split("text", " ")


def _hash_u(col: Column) -> Column:
    """Deterministic uniform in (0,1) from a key: integer value of the
    first 8 md5 hex chars, shifted off the lattice by +0.5 so ln(u) is
    finite. Engine-portable: Spark parses the hex with conv(); the SQL
    mirror folds hex digits positionally (_sql_hash_u) — both yield the
    same integer, hence bit-identical doubles."""
    h = F.substring(F.md5(col.cast("string")), 1, 8)
    return (F.conv(h, 16, 10).cast("bigint").cast("double") + 0.5) / F.lit(float(2**32))


def _sql_hash_u(expr: str) -> str:
    fold = (
        f"list_sum(list_transform(range(1, 9), i -> "
        f"(strpos('0123456789abcdef', substr(md5(CAST({expr} AS VARCHAR)), i, 1)) - 1)"
        f" * CAST(pow(16, 8 - i) AS BIGINT)))"
    )
    return f"((CAST({fold} AS DOUBLE) + 0.5) / {float(2**32)})"


_SAMPLE_K = 5  # docs sampled per language


@query(
    "qe01_weighted_reservoir_sample",
    oracle=f"""
WITH keyed AS (
  SELECT lang, doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         -ln({_sql_hash_u('doc_id')}) / len(string_split(text, ' ')) AS key
  FROM documents
), ranked AS (
  SELECT lang, doc_id, n_words,
         CAST(row_number() OVER (PARTITION BY lang ORDER BY key ASC, doc_id ASC) AS INTEGER) AS rk
  FROM keyed
)
SELECT lang, rk, doc_id, n_words
FROM ranked WHERE rk <= {_SAMPLE_K}
ORDER BY lang, rk
""",
    tags=("curation", "sampling"),
    bench=True,
)
def qe01_weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (the
    exponential-key formulation of Efraimidis–Spirakis A-ES): each
    document draws key = −ln(u)/weight from a HASH-seeded uniform, and
    the k smallest keys per language win — inclusion odds proportional
    to token count, yet fully reproducible across runs, engines, and
    partitionings (no rand(), so no seed/plan sensitivity). This is how
    a mixture sampler picks "200B tokens from source X, longer docs
    proportionally likelier" without ever coordinating global state.

    Determinism: u comes from the md5-integer lattice (+0.5 keeps ln
    finite), both engines compute the identical double key, and the
    per-stratum rank tie-breaks on doc_id. Scale shape: one projection,
    then a per-language top-k window — k and |langs| are parameters, and
    the same key doubles as a distributed merge key (take the k smallest
    per partition, then merge) if a stratum outgrows its sort.
    """
    d = table(spark, sf_dir, "documents")
    nw = F.size(_words())
    key = -F.log(_hash_u(F.col("doc_id"))) / nw
    w = Window.partitionBy("lang").orderBy(F.asc("key"), F.asc("doc_id"))
    return (
        d.select("lang", "doc_id", nw.cast("bigint").alias("n_words"), key.alias("key"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _SAMPLE_K)
        .select("lang", "rk", "doc_id", "n_words")
        .orderBy("lang", "rk")
    )


_CONTAIN_T = 0.8  # containment threshold


@query(
    "qe02_containment_pairs",
    oracle=f"""
WITH shingles AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(string_split(text, ' ')) - 1),
                  i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS shingle
    FROM documents)
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_shingles FROM shingles GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM shingles a JOIN shingles b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT p.doc_a, p.doc_b,
       CAST(sa.n_shingles AS BIGINT) AS n_a,
       CAST(p.n_common AS BIGINT) AS n_common,
       {sql_pround('CAST(p.n_common AS DOUBLE) / sa.n_shingles', 6)} AS containment
FROM pairs p JOIN sizes sa ON sa.doc_id = p.doc_a
WHERE CAST(p.n_common AS DOUBLE) / sa.n_shingles >= {_CONTAIN_T}
ORDER BY p.doc_a, p.doc_b
""",
    tags=("curation", "dedup"),
)
def qe02_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment detection: ORDERED pairs where ≥80% of
    doc A's trigram shingles also occur in doc B — the Jaccard-blind
    case (a55 misses it when B is much longer) that catches quotes,
    wrapper pages, and subset documents; the standard companion metric
    to Jaccard in near-dup pipelines (Broder's containment).

    Scale shape: a55's inverted-index join — docs meet ONLY on shared
    shingles, n_common aggregates per ordered pair, and the containment
    divides by |A| alone. The same stop-shingle `max_df` cap applies
    verbatim at scale (text.py:ngram_jaccard_pairs documents it); at
    this SF no shingle is hot enough to trigger it, so query and oracle
    agree exactly. Threshold compares the raw IEEE ratio (identical
    doubles both engines); the emitted copy is pround(6).
    """
    d = table(spark, sf_dir, "documents")
    # split materialized once per row — captured in the transform lambda
    # it re-runs per shingle position (O(words²) splits per doc; the
    # r13 HOF-capture fix, same as curation2's shingle pipeline)
    words = F.col("_w")
    n = F.size(words)
    shingle_arr = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(0), n - 3),
            lambda i: F.array_join(F.slice(words, i + 1, 3), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    shingles = (
        d.withColumn("_w", _words())
        .select("doc_id", F.explode(shingle_arr).alias("shingle"))
        .distinct()
    )
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a, b = shingles.alias("a"), shingles.alias("b")
    pairs = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") != F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    cont = F.col("n_common").cast("double") / F.col("n_shingles")
    return (
        pairs.join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .filter(cont >= _CONTAIN_T)
        .select(
            "doc_a",
            "doc_b",
            F.col("n_shingles").cast("bigint").alias("n_a"),
            F.col("n_common").cast("bigint").alias("n_common"),
            pround(cont, 6).alias("containment"),
        )
        .orderBy("doc_a", "doc_b")
    )


_VOCAB_K = 1000  # in-vocabulary size


@query(
    "qe03_oov_rate",
    oracle=f"""
WITH freq AS (
  SELECT word, COUNT(*) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
  GROUP BY word
), vocab AS (
  SELECT word FROM (
    SELECT word, row_number() OVER (ORDER BY cnt DESC, word ASC) AS rk FROM freq
  ) WHERE rk <= {_VOCAB_K}
), per AS (
  SELECT s.source,
         COUNT(*) AS n_tokens,
         SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS n_oov
  FROM (SELECT source, unnest(string_split(text, ' ')) AS word FROM documents) s
  LEFT JOIN vocab v ON v.word = s.word
  GROUP BY s.source
)
SELECT source,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_oov AS BIGINT) AS n_oov,
       {sql_pround('CAST(n_oov AS DOUBLE) / n_tokens', 6)} AS oov_rate
FROM per
ORDER BY source
""",
    tags=("curation", "text"),
)
def qe03_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary audit: per source, the fraction of tokens not
    in the corpus top-1000 vocabulary (b14's tokenizer basis) — high
    OOV flags a source the tokenizer will shred into bytes (code,
    wrong-language, binary junk) BEFORE a tokenization run wastes a
    cluster pass on it.

    Scale shape: the vocabulary is a k-row TakeOrdered top-k (k is a
    PARAMETER, so broadcasting it respects the broadcast rule); tokens
    left-join it broadcast-side — per-source counts partial-aggregate
    map-side, no token ever shuffles. At 100 TB swap the exact top-k
    for b40's CMS heavy hitters; plan shape unchanged. Integers plus
    one pround ratio.
    """
    d = table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(_words()).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    vocab = freq.orderBy(F.desc("cnt"), F.asc("word")).limit(_VOCAB_K).select("word")
    toks = d.select("source", F.explode(_words()).alias("word"))
    oov = F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
    return (
        toks.join(F.broadcast(vocab.withColumn("in_vocab", F.lit(1))), "word", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(oov).cast("bigint").alias("n_oov"),
            pround(F.sum(oov).cast("double") / F.count(F.lit(1)), 6).alias("oov_rate"),
        )
        .orderBy("source")
    )


_MIN_STRATUM = 5  # smallest acceptable stratum size


@query(
    "qe04_rare_strata_audit",
    oracle=f"""
SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
FROM documents
GROUP BY lang, source
HAVING COUNT(*) < {_MIN_STRATUM}
ORDER BY lang, source
""",
    tags=("curation", "diagnostics"),
)
def qe04_rare_strata_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rare-strata audit: (lang, source) cells with fewer than 5
    documents — the k-anonymity-style check run before any per-stratum
    statistic (c06's terciles, q95's rates) is trusted, and the
    memorization red-flag list (a handful of documents alone in their
    stratum are the ones a model quotes verbatim).

    Shape: one partial-aggregated groupBy on a low-cardinality composite
    key with a HAVING filter — the minimal-cost audit; all integers.
    """
    d = table(spark, sf_dir, "documents")
    return (
        d.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("min_doc_id"),
        )
        .filter(F.col("n_docs") < _MIN_STRATUM)
        .orderBy("lang", "source")
    )


@query(
    "qe05_length_quality_corr",
    oracle=f"""
WITH base AS (
  SELECT source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / len(string_split(text, ' ')) AS y
  FROM documents
), agg AS (
  SELECT source,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx,
         CAST(SUM(x * x) AS DOUBLE) AS sxx,
         CAST(SUM({_sql_dterm('y')}) AS DOUBLE) AS sy,
         CAST(SUM({_sql_dterm('y * y')}) AS DOUBLE) AS syy,
         CAST(SUM({_sql_dterm('x * y')}) AS DOUBLE) AS sxy
  FROM base GROUP BY source
)
SELECT source,
       CAST(n AS BIGINT) AS n_docs,
       {sql_pround('(n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))', 6)} AS pearson_r
FROM agg
ORDER BY source
""",
    tags=("curation", "diagnostics"),
)
def qe05_length_quality_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length/quality confound audit: per source, the Pearson
    correlation between document length and lexical-diversity score. A
    strong negative r (short docs score "diverse" by construction)
    means a quality threshold is secretly a length filter — the check
    that keeps c10's caps and c06's tiers honest.

    Determinism: x-moments are INTEGER sums (exact bigints cast once);
    y-moments round each term to 9 decimals and sum in exact DECIMAL;
    the closed-form r is then a fixed IEEE sequence, pround(6). Shape:
    one map-side-combined aggregate per source — a single shuffle of
    |sources| six-number rows, nothing else.
    """
    d = table(spark, sf_dir, "documents")
    words = _words()
    x = F.size(words).cast("bigint")
    y = F.size(F.array_distinct(words)).cast("double") / F.size(words)
    base = d.select("source", x.alias("x"), y.alias("y"))
    agg = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(_dterm(F.col("y"))).cast("double").alias("sy"),
        F.sum(_dterm(F.col("y") * F.col("y"))).cast("double").alias("syy"),
        F.sum(_dterm(F.col("x") * F.col("y"))).cast("double").alias("sxy"),
    )
    r = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return agg.select(
        "source",
        F.col("n").cast("bigint").alias("n_docs"),
        pround(r, 6).alias("pearson_r"),
    ).orderBy("source")


_DECILES = [i / 10.0 for i in range(1, 10)]  # 0.1 .. 0.9


@query(
    "qe17_spend_deciles",
    oracle=f"""
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS spend
  FROM orders GROUP BY o_custkey
), bounds AS (
  SELECT quantile_cont(spend, {_DECILES}) AS bs FROM spend
), binned AS (
  SELECT s.o_custkey, s.spend,
         CAST(1 + len(list_filter(b.bs, x -> x < s.spend)) AS INTEGER) AS decile
  FROM spend s CROSS JOIN bounds b
)
SELECT decile,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       (CAST(floor(CAST(SUM(CAST(spend AS DECIMAL(25,6))) AS DOUBLE) * 100.0 + 0.5) AS DOUBLE) / 100.0) AS total_spend,
       (CAST(floor(MIN(spend) * 100.0 + 0.5) AS DOUBLE) / 100.0) AS min_spend,
       (CAST(floor(MAX(spend) * 100.0 + 0.5) AS DOUBLE) / 100.0) AS max_spend
FROM binned
GROUP BY decile
ORDER BY decile
""",
    tags=("curation", "analytics"),
)
def qe17_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth customer-spend deciles WITHOUT a global sort: decile
    boundaries come from one percentile aggregate (map-side partial,
    1-row result broadcast back), and each customer bins by counting
    boundaries below their spend — the scale-safe replacement for
    ntile(), whose global ORDER BY would pull every customer into one
    partition (the b31/c06 adaptive-threshold pattern, taken to ten
    bins).

    Determinism: spends are decimal-exact doubles, the interpolated
    percentiles are the SAME linear interpolation on both engines
    (c06's precedent), binning compares identical doubles with strict
    <, and emitted aggregates round pround(2) after exact decimal
    sums. Ties at a boundary go to the lower decile on both engines.
    """
    o = table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(25,6)")).cast("double").alias("spend")
    )
    bounds = spend.agg(
        F.percentile("spend", F.array(*[F.lit(q) for q in _DECILES])).alias("bs")
    )
    decile = (1 + F.size(F.filter(F.col("bs"), lambda x: x < F.col("spend")))).cast("int")
    return (
        spend.crossJoin(F.broadcast(bounds))
        .select("spend", decile.alias("decile"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            pround(F.sum(F.col("spend").cast("decimal(25,6)")).cast("double"), 2).alias("total_spend"),
            pround(F.min("spend"), 2).alias("min_spend"),
            pround(F.max("spend"), 2).alias("max_spend"),
        )
        .orderBy("decile")
    )


@query(
    "qe18_cross_lang_alignment",
    oracle=f"""
WITH fp AS (
  SELECT DISTINCT lang,
         md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
  FROM documents
), sizes AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_fp FROM fp GROUP BY lang
), pairs AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b, CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM fp a JOIN fp b ON a.fp = b.fp AND a.lang < b.lang
  GROUP BY 1, 2
)
SELECT sa.lang AS lang_a, sb.lang AS lang_b,
       sa.n_fp AS n_a, sb.n_fp AS n_b,
       CAST(COALESCE(p.n_shared, 0) AS BIGINT) AS n_shared,
       {sql_pround('CAST(COALESCE(p.n_shared, 0) AS DOUBLE) / least(sa.n_fp, sb.n_fp)', 6)} AS overlap_coeff
FROM sizes sa JOIN sizes sb ON sa.lang < sb.lang
LEFT JOIN pairs p ON p.lang_a = sa.lang AND p.lang_b = sb.lang
ORDER BY lang_a, lang_b
""",
    tags=("curation", "dedup"),
)
def qe18_cross_lang_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-language content-alignment matrix: for every language
    pair, how many normalized documents (bag-of-words fingerprints)
    appear under BOTH language labels — surfacing mislabeled language
    IDs and copy-translated boilerplate, the multilingual twin of
    c08's cross-source audit (a training mix that counts the same
    content once per language label silently over-weights it).

    Scale shape: identical to c08 — one DISTINCT (lang, fp) shuffle,
    a self-join that meets only on equal fingerprints, and a
    |langs|²-row matrix built from the tiny per-language aggregate.
    """
    d = table(spark, sf_dir, "documents")
    fp = d.select(
        "lang",
        F.md5(F.array_join(F.array_sort(F.array_distinct(_words())), " ")).alias("fp"),
    ).distinct()
    sizes = fp.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("n_fp"))
    a, b = fp.alias("a"), fp.alias("b")
    pairs = (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.lang") < F.col("b.lang")))
        .groupBy(F.col("a.lang").alias("lang_a"), F.col("b.lang").alias("lang_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    mat = sa.join(sb, F.col("sa.lang") < F.col("sb.lang")).select(
        F.col("sa.lang").alias("lang_a"),
        F.col("sb.lang").alias("lang_b"),
        F.col("sa.n_fp").alias("n_a"),
        F.col("sb.n_fp").alias("n_b"),
    )
    return (
        mat.join(F.broadcast(pairs), ["lang_a", "lang_b"], "left")
        .select(
            "lang_a",
            "lang_b",
            "n_a",
            "n_b",
            F.coalesce("n_shared", F.lit(0)).cast("bigint").alias("n_shared"),
            pround(
                F.coalesce("n_shared", F.lit(0)).cast("double") / F.least("n_a", "n_b"), 6
            ).alias("overlap_coeff"),
        )
        .orderBy("lang_a", "lang_b")
    )


_N_SHARDS = 8


@query(
    "qe20_global_shuffle_shards",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(1, 9), i ->
               (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1)
               * CAST(pow(16, 8 - i) AS BIGINT))) AS BIGINT) AS h
  FROM documents
), placed AS (
  SELECT doc_id, CAST(h % {_N_SHARDS} AS INTEGER) AS shard, h FROM keyed
)
SELECT shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY h ASC, doc_id ASC) AS INTEGER) AS pos,
       doc_id
FROM placed
ORDER BY shard, pos
""",
    tags=("curation", "training"),
)
def qe20_global_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle into training shards: every document
    gets a (shard, position) from its md5 hash — shard by modulo,
    within-shard order by hash value — the dataloader-shuffling step
    that materializes a reproducible random order WITHOUT any RNG
    state, identical across engines, runs, and cluster sizes (re-runs
    of a failed materialization job place every row identically).

    Scale shape: one hash projection, one shuffle keyed `shard` (N
    partitions by construction), and a per-shard sort — each shard
    sorts independently, so the "global shuffle" never concentrates on
    one node; pos is emitted per shard, exactly how shard files are
    written. Integers end to end.
    """
    d = table(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("bigint")
    placed = d.select("doc_id", h.alias("h"), (h % _N_SHARDS).cast("int").alias("shard"))
    w = Window.partitionBy("shard").orderBy(F.asc("h"), F.asc("doc_id"))
    return (
        placed.select("shard", F.row_number().over(w).cast("int").alias("pos"), "doc_id")
        .orderBy("shard", "pos")
    )


@query(
    "qe26_quality_signal_fusion",
    oracle=f"""
WITH base AS (
  SELECT d.doc_id,
         CAST(len(list_distinct(string_split(d.text, ' '))) AS DOUBLE)
           / len(string_split(d.text, ' ')) AS unique_ratio,
         CAST(len(string_split(d.text, ' ')) AS DOUBLE) AS n_words
  FROM documents d
), words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), freq AS (
  SELECT word, COUNT(*) AS cnt FROM words GROUP BY word
), total AS (
  SELECT COUNT(*) AS n FROM words
), lp AS (
  SELECT w.doc_id,
         CAST(SUM(CAST(round(ln(CAST(f.cnt AS DOUBLE) / t.n), 6) AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS logprob
  FROM words w JOIN freq f USING (word) CROSS JOIN total t
  GROUP BY w.doc_id
), sig AS (
  SELECT b.doc_id, b.unique_ratio, b.n_words, lp.logprob
  FROM base b JOIN lp USING (doc_id)
), bounds AS (
  SELECT quantile_cont(unique_ratio, {_DECILES}) AS bu,
         quantile_cont(n_words, {_DECILES}) AS bw,
         quantile_cont(logprob, {_DECILES}) AS bl
  FROM sig
)
SELECT s.doc_id,
       CAST(1 + len(list_filter(b.bu, x -> x < s.unique_ratio)) AS INTEGER) AS d_unique,
       CAST(1 + len(list_filter(b.bw, x -> x < s.n_words)) AS INTEGER) AS d_len,
       CAST(1 + len(list_filter(b.bl, x -> x < s.logprob)) AS INTEGER) AS d_logprob,
       {sql_pround('(CAST(1 + len(list_filter(b.bu, x -> x < s.unique_ratio)) AS DOUBLE) + (1 + len(list_filter(b.bw, x -> x < s.n_words))) + (1 + len(list_filter(b.bl, x -> x < s.logprob)))) / 3.0', 6)} AS fused_score
FROM sig s CROSS JOIN bounds b
ORDER BY s.doc_id
""",
    tags=("curation", "quality"),
)
def qe26_quality_signal_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-signal quality fusion by rank normalization: three raw
    signals on incompatible scales (lexical diversity, length, unigram
    logprob) each map to their corpus DECILE, and the fused score is
    the mean decile — the ensembling step that makes heterogeneous
    quality classifiers comparable before a single keep/drop threshold
    (raw-score averaging would let whichever signal has the widest
    scale dominate).

    Scale shape: deciles come from ONE percentile aggregate per signal
    (z17's boundary-count binning — no global sort, no percent_rank
    window); the 3×9 boundary row broadcasts over the scan.
    Determinism: b12's decimal-summed logprob, raw IEEE ratios for the
    other signals, identical interpolated boundaries, strict-< bin
    counting, and a /3.0 mean pround(6).
    """
    d = table(spark, sf_dir, "documents")
    words = _words()
    base = d.select(
        "doc_id",
        (F.size(F.array_distinct(words)).cast("double") / F.size(words)).alias("unique_ratio"),
        F.size(words).cast("double").alias("n_words"),
    )
    # logprob stays UNROUNDED here (b12's registered form rounds to 6
    # for its own oracle); same distinct-(doc,word) shape as b12
    dw = d.select("doc_id", F.explode(words).alias("word")).groupBy("doc_id", "word").agg(
        F.count(F.lit(1)).alias("cnt_dw")
    ).transform(cut_lineage)  # feeds the vocab census AND the score join (scan-lint)
    freq = dw.groupBy("word").agg(F.sum("cnt_dw").alias("cnt"))
    total = freq.groupBy().agg(F.sum("cnt").cast("double").alias("n"))
    term = (
        F.col("cnt_dw")
        * F.round(F.log(F.col("cnt").cast("double") / F.col("n")), 6).cast("decimal(25,6)")
    ).cast("decimal(25,6)")
    lp = (
        dw.join(freq.crossJoin(F.broadcast(total)), "word")
        .groupBy("doc_id")
        .agg((F.sum(term).cast("double") / F.sum("cnt_dw")).alias("logprob"))
    )
    # compact per-doc signal table; the decile learner and the fusion
    # pass both consume it (scan-lint)
    sig = base.join(lp, "doc_id").transform(cut_lineage)
    qarr = F.array(*[F.lit(q) for q in _DECILES])
    bounds = sig.agg(
        F.percentile("unique_ratio", qarr).alias("bu"),
        F.percentile("n_words", qarr).alias("bw"),
        F.percentile("logprob", qarr).alias("bl"),
    )
    def dec(sig_col, bcol):
        return (1 + F.size(F.filter(F.col(bcol), lambda x: x < F.col(sig_col)))).cast("int")
    fused = (
        dec("unique_ratio", "bu").cast("double")
        + dec("n_words", "bw")
        + dec("logprob", "bl")
    ) / 3.0
    return (
        sig.crossJoin(F.broadcast(bounds))
        .select(
            "doc_id",
            dec("unique_ratio", "bu").alias("d_unique"),
            dec("n_words", "bw").alias("d_len"),
            dec("logprob", "bl").alias("d_logprob"),
            pround(fused, 6).alias("fused_score"),
        )
        .orderBy("doc_id")
    )


@query(
    "qe27_source_divergence",
    oracle=f"""
WITH sw AS (
  SELECT source, word, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT source, unnest(string_split(text, ' ')) AS word FROM documents) t
  GROUP BY 1, 2
), stot AS (
  SELECT source, CAST(SUM(c) AS DOUBLE) AS n_s FROM sw GROUP BY source
), cw AS (
  SELECT word, CAST(SUM(c) AS BIGINT) AS cc FROM sw GROUP BY word
), ctot AS (
  SELECT CAST(SUM(cc) AS DOUBLE) AS n FROM cw
)
SELECT sw.source,
       CAST(st.n_s AS BIGINT) AS n_tokens,
       {sql_pround(f"CAST(SUM(CAST((CAST(floor((0.5 * (sw.c / st.n_s) * ln((sw.c / st.n_s) / (((sw.c / st.n_s) + (cw.cc / ct.n)) / 2)) + 0.5 * (cw.cc / ct.n) * ln((cw.cc / ct.n) / (((sw.c / st.n_s) + (cw.cc / ct.n)) / 2))) * 1000000000.0 + 0.5) AS DOUBLE) / 1000000000.0) AS DECIMAL(25,12))) AS DOUBLE)", 6)} AS js_divergence
FROM sw
JOIN stot st ON st.source = sw.source
JOIN cw ON cw.word = sw.word
CROSS JOIN ctot ct
GROUP BY sw.source, st.n_s
ORDER BY sw.source
""",
    tags=("curation", "diagnostics"),
)
def qe27_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between each source's unigram
    distribution and the corpus distribution — the domain-shift audit
    that flags a source whose vocabulary usage departs from the mix
    (code dumped in a text crawl, wrong-language content, spam) even
    when every individual word is in-vocabulary (which z03's OOV rate
    cannot see).

    Simplification note: words absent from a source contribute only
    the q-side mass; restricting terms to the source's OWN vocabulary
    (as here, and in the oracle identically) yields the truncated-JS
    variant — a lower bound that preserves ranking, standard when the
    reference support is much larger than each source's.

    Determinism: p and q are single IEEE divisions of exact counts,
    each JS term pround(9)-rounds before the exact DECIMAL sum.
    Scale: one (source, word) rollup joined to the |vocab| corpus
    table — b12's distinct-pair shape, nothing token-level.
    """
    d = table(spark, sf_dir, "documents")
    sw = (
        d.select("source", F.explode(_words()).alias("word"))
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    stot = sw.groupBy("source").agg(F.sum("c").cast("double").alias("n_s"))
    cw = sw.groupBy("word").agg(F.sum("c").cast("bigint").alias("cc"))
    ctot = cw.agg(F.sum("cc").cast("double").alias("n"))
    p = F.col("c") / F.col("n_s")
    q = F.col("cc") / F.col("n")
    m = (p + q) / 2.0
    term = _dterm(0.5 * p * F.log(p / m) + 0.5 * q * F.log(q / m))
    return (
        sw.join(stot, "source")
        .join(cw, "word")
        .crossJoin(F.broadcast(ctot))
        .groupBy("source", "n_s")
        .agg(pround(F.sum(term).cast("double"), 6).alias("js_divergence"))
        .select("source", F.col("n_s").cast("bigint").alias("n_tokens"), "js_divergence")
        .orderBy("source")
    )


_PAD_LEN = 64  # fixed sequence length for the padding forecast


@query(
    "qe33_padding_waste_forecast",
    oracle=f"""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       CAST(SUM(CAST(ceil(len(string_split(text, ' ')) / {_PAD_LEN}.0) AS BIGINT) * {_PAD_LEN}
                - len(string_split(text, ' '))) AS BIGINT) AS pad_tokens,
       (CAST(floor((CAST(SUM(CAST(ceil(len(string_split(text, ' ')) / {_PAD_LEN}.0) AS BIGINT) * {_PAD_LEN}
                - len(string_split(text, ' '))) AS DOUBLE)
         / SUM(CAST(ceil(len(string_split(text, ' ')) / {_PAD_LEN}.0) AS BIGINT) * {_PAD_LEN})) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0) AS waste_frac
FROM documents
GROUP BY source
ORDER BY source
""",
    tags=("curation", "training"),
)
def qe33_padding_waste_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste forecast for naive one-doc-per-sequence batching
    at a fixed 64-token length: tokens wasted on pad positions per
    source and the waste fraction — the number that justifies paying
    for sequence PACKING (qb06) before a training run, per source
    because short-doc sources waste disproportionately.

    Determinism: ceil of an integer/64 division is exact on both
    engines (n/64.0 is binary-exact for n under 2^46), everything else
    is integer; one pround ratio. Shape: one map-side-combined
    per-source aggregate over the scan.
    """
    d = table(spark, sf_dir, "documents")
    n = F.size(_words())
    seqs = F.ceil(n / float(_PAD_LEN)).cast("bigint")
    pad = seqs * _PAD_LEN - n
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(n).cast("bigint").alias("n_tokens"),
            F.sum(pad).cast("bigint").alias("pad_tokens"),
            pround(
                F.sum(pad).cast("double") / F.sum(seqs * _PAD_LEN), 6
            ).alias("waste_frac"),
        )
        .orderBy("source")
    )
