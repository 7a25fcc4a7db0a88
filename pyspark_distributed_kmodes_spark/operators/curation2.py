"""Corpus-composition analytics: cross-source overlap, integer token-budget
allocation, per-source quality caps, shingle novelty, sequence-length
histograms, embedding-cluster cohesion, and Zipf-slope audits.

Round-3 extension of curation.py: the diagnostics a data-mixture owner
runs BEFORE signing off a pre-training corpus (where is content shared
across sources? how many tokens does each source get? is any source
low-diversity or statistically anomalous?). All pure JVM DataFrame ops;
every oracle-gated rounded double goes through pround (floor-form,
engine-exact), and every floating sum rounds its terms to 9 decimals and
accumulates in DECIMAL so summation order can never drift the hash
(functions/deterministic.py contract).
"""

from __future__ import annotations

from pyspark_distributed_kmodes_spark.functions.lineage import cut_lineage

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark_distributed_kmodes_spark.functions.deterministic import pround, sql_pround
from pyspark_distributed_kmodes_spark.registry import query
from pyspark_distributed_kmodes_spark.sources.tables import table


def _dterm(col: Column) -> Column:
    """A float term prepared for an order-insensitive sum: pround(9) →
    exact DECIMAL(25,12). Mirrored by _sql_dterm."""
    return pround(col, 9).cast("decimal(25,12)")


def _sql_dterm(expr: str) -> str:
    return f"CAST({sql_pround(expr, 9)} AS DECIMAL(25,12))"


def _words():
    """Lazy: F.split resolves a lit() and needs an active SparkContext."""
    return F.split("text", " ")


@query(
    "qc08_source_overlap_matrix",
    oracle=f"""
WITH fp AS (
  SELECT DISTINCT source,
         md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
  FROM documents
), sizes AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_fp FROM fp GROUP BY source
), pairs AS (
  SELECT a.source AS source_a, b.source AS source_b, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM fp a JOIN fp b ON a.fp = b.fp AND a.source < b.source
  GROUP BY 1, 2
)
SELECT sa.source AS source_a, sb.source AS source_b,
       sa.n_fp AS n_a, sb.n_fp AS n_b,
       CAST(COALESCE(p.n_common, 0) AS BIGINT) AS n_common,
       {sql_pround('CAST(COALESCE(p.n_common, 0) AS DOUBLE) / least(sa.n_fp, sb.n_fp)', 6)} AS overlap_coeff
FROM sizes sa JOIN sizes sb ON sa.source < sb.source
LEFT JOIN pairs p ON p.source_a = sa.source AND p.source_b = sb.source
ORDER BY source_a, source_b
""",
    tags=("curation", "dedup"),
)
def qc08_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: for every source pair, how many
    NORMALIZED documents (bag-of-words fingerprint, q56's scheme — robust
    to word order) appear in both, plus the overlap coefficient
    |A∩B| / min(|A|,|B|). The audit that catches one crawl re-hosting
    another's content before both are double-counted in a training mix.

    Scale shape: the corpus collapses to DISTINCT (source, fingerprint)
    first (one shuffle on the 32-char hash); the self-join meets only on
    equal fingerprints, so its output is bounded by true duplication, not
    corpus². The pair matrix itself is |sources|² rows — driver-trivial —
    built from the tiny `sizes` aggregate; every double is pround(6).
    """
    d = table(spark, sf_dir, "documents")
    fp = d.select(
        "source",
        F.md5(F.array_join(F.array_sort(F.array_distinct(_words())), " ")).alias("fp"),
    ).distinct()
    sizes = fp.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n_fp"))
    a, b = fp.alias("a"), fp.alias("b")
    pairs = (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    mat = sa.join(sb, F.col("sa.source") < F.col("sb.source")).select(
        F.col("sa.source").alias("source_a"),
        F.col("sb.source").alias("source_b"),
        F.col("sa.n_fp").alias("n_a"),
        F.col("sb.n_fp").alias("n_b"),
    )
    return (
        mat.join(F.broadcast(pairs), ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            F.coalesce("n_common", F.lit(0)).cast("bigint").alias("n_common"),
            pround(
                F.coalesce("n_common", F.lit(0)).cast("double") / F.least("n_a", "n_b"), 6
            ).alias("overlap_coeff"),
        )
        .orderBy("source_a", "source_b")
    )


_BUDGET = 10_000_000  # tokens to allocate across sources


@query(
    "qc09_token_budget_allocation",
    oracle=f"""
WITH tok AS (
  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(SUM(n_tokens) AS DOUBLE) AS n FROM tok
), powed AS (
  SELECT t.source, t.n_tokens, pow(CAST(t.n_tokens AS DOUBLE) / tt.n, 0.7) AS p_alpha
  FROM tok t CROSS JOIN tot tt
), z AS (
  SELECT CAST(SUM({_sql_dterm('p_alpha')}) AS DOUBLE) AS z FROM powed
), micro AS (
  SELECT p.source, p.n_tokens,
         CAST(floor((p.p_alpha / z.z) * 1000000.0 + 0.5) AS BIGINT) AS weight_micro
  FROM powed p CROSS JOIN z
), ideal AS (
  SELECT source, n_tokens, weight_micro,
         (weight_micro * {_BUDGET}) // 1000000 AS base,
         (weight_micro * {_BUDGET}) % 1000000 AS rem
  FROM micro
), lo AS (
  SELECT {_BUDGET} - SUM(base) AS leftover FROM ideal
), ranked AS (
  SELECT source, n_tokens, weight_micro, base, rem,
         row_number() OVER (ORDER BY rem DESC, source ASC) AS rk_hi,
         row_number() OVER (ORDER BY rem ASC, source DESC) AS rk_lo
  FROM ideal
)
SELECT r.source, r.n_tokens, r.weight_micro,
       CAST(r.base
            + CASE WHEN l.leftover > 0 AND r.rk_hi <= l.leftover THEN 1 ELSE 0 END
            - CASE WHEN l.leftover < 0 AND r.rk_lo <= -l.leftover THEN 1 ELSE 0 END
            AS BIGINT) AS alloc_tokens
FROM ranked r CROSS JOIN lo l
ORDER BY r.source
""",
    tags=("curation", "sampling"),
)
def qc09_token_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer token-budget allocation by largest remainder (Hamilton's
    method): temperature-scale each source's TOKEN share (c04's
    (n_s/N)^0.7 rule, but on tokens — budgets are spent in tokens, not
    documents), quantize weights to integer micro-units, then hand out
    the 10M-token budget so allocations are integers that sum EXACTLY to
    the budget — the final step before a sampler materializes the mix.

    Determinism: after `weight_micro` (pround-form floor on the one
    transcendental, pow — c04's engine-exact pattern), everything is
    64-bit integer arithmetic: base = w·B div 1e6, remainder = w·B mod
    1e6, ranked with full tie-breaks; no float ever touches the output.
    Scale shape: one token-count aggregate over the corpus, then
    |sources|-row integer bookkeeping — the unpartitioned row_numbers run
    AFTER the per-source roll-up, on a schema-bounded handful of rows.
    """
    d = table(spark, sf_dir, "documents")
    # |sources|-row token census with many integer-bookkeeping
    # consumers: materialize once (scan-lint)
    tok = d.groupBy("source").agg(
        F.sum(F.size(_words())).cast("bigint").alias("n_tokens")
    ).transform(cut_lineage)
    tot = tok.agg(F.sum("n_tokens").cast("double").alias("n"))
    powed = tok.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        F.pow(F.col("n_tokens").cast("double") / F.col("n"), F.lit(0.7)).alias("p_alpha"),
    )
    z = powed.agg(F.sum(_dterm(F.col("p_alpha"))).cast("double").alias("z"))
    micro = powed.crossJoin(F.broadcast(z)).select(
        "source",
        "n_tokens",
        F.floor((F.col("p_alpha") / F.col("z")) * 1000000.0 + 0.5).cast("bigint").alias("weight_micro"),
    )
    ideal = micro.select(
        "source",
        "n_tokens",
        "weight_micro",
        F.expr(f"(weight_micro * {_BUDGET}) div 1000000").alias("base"),
        (F.col("weight_micro") * _BUDGET % 1000000).alias("rem"),
    )
    leftover = ideal.agg((F.lit(_BUDGET) - F.sum("base")).alias("leftover"))
    ranked = ideal.select(
        "*",
        F.row_number().over(Window.orderBy(F.desc("rem"), F.asc("source"))).alias("rk_hi"),
        F.row_number().over(Window.orderBy(F.asc("rem"), F.desc("source"))).alias("rk_lo"),
    )
    return (
        ranked.crossJoin(F.broadcast(leftover))
        .select(
            "source",
            "n_tokens",
            "weight_micro",
            (
                F.col("base")
                + F.when((F.col("leftover") > 0) & (F.col("rk_hi") <= F.col("leftover")), 1).otherwise(0)
                - F.when((F.col("leftover") < 0) & (F.col("rk_lo") <= -F.col("leftover")), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("alloc_tokens"),
        )
        .orderBy("source")
    )


_CAP = 20  # max documents kept per source


@query(
    "qc10_per_source_quality_caps",
    oracle=f"""
WITH base AS (
  SELECT doc_id, source,
         len(string_split(text, ' ')) AS n_words,
         len(list_distinct(string_split(text, ' '))) AS n_unique
  FROM documents
), ranked AS (
  SELECT source, doc_id, n_words,
         CAST(n_unique AS DOUBLE) / n_words AS ratio,
         row_number() OVER (PARTITION BY source
                            ORDER BY CAST(n_unique AS DOUBLE) / n_words DESC, doc_id ASC) AS rk
  FROM base
)
SELECT source,
       CAST(SUM(CASE WHEN rk <= {_CAP} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN rk > {_CAP} THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       CAST(SUM(CASE WHEN rk <= {_CAP} THEN n_words ELSE 0 END) AS BIGINT) AS kept_words,
       {sql_pround(f'MIN(CASE WHEN rk <= {_CAP} THEN ratio END)', 6)} AS min_kept_ratio
FROM ranked
GROUP BY source
ORDER BY source
""",
    tags=("curation", "quality"),
)
def qc10_per_source_quality_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality cap: keep at most N documents per source,
    chosen by lexical-diversity rank (q52's unique-word ratio, ties by
    doc_id) — the guard that stops any single source from flooding the
    mix with its low-quality tail, reported as kept/dropped counts, the
    retained token mass, and the quality floor the cap implies.

    Determinism: the rank orders on a single IEEE division both engines
    compute bit-identically from the same integers, with a doc_id
    tie-break; outputs are integers plus one pround(6) MIN (MIN of
    identical doubles is order-free). Scale shape: one hash-partitioned
    window keyed `source` — for a skewed 100 TB source, swap row_number
    for a pre-computed per-source quantile threshold (b31's adaptive
    pattern) to avoid sorting a giant partition; semantics identical.
    """
    d = table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        "source",
        F.size(_words()).alias("n_words"),
        F.size(F.array_distinct(_words())).alias("n_unique"),
    )
    ratio = F.col("n_unique").cast("double") / F.col("n_words")
    w = Window.partitionBy("source").orderBy(ratio.desc(), F.col("doc_id").asc())
    ranked = base.select(
        "source", "doc_id", "n_words", ratio.alias("ratio"), F.row_number().over(w).alias("rk")
    )
    kept = F.col("rk") <= _CAP
    return (
        ranked.groupBy("source")
        .agg(
            F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_kept"),
            F.sum(F.when(~kept, 1).otherwise(0)).cast("bigint").alias("n_dropped"),
            F.sum(F.when(kept, F.col("n_words")).otherwise(0)).cast("bigint").alias("kept_words"),
            pround(F.min(F.when(kept, F.col("ratio"))), 6).alias("min_kept_ratio"),
        )
        .orderBy("source")
    )


@query(
    "qc11_shingle_novelty",
    oracle=f"""
WITH sh AS (
  SELECT DISTINCT source, shingle FROM (
    SELECT source,
           unnest(list_transform(range(1, len(string_split(text, ' ')) - 1),
                  i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS shingle
    FROM documents)
), nsrc AS (
  SELECT shingle, COUNT(*) AS n_sources FROM sh GROUP BY shingle
)
SELECT s.source,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN n.n_sources = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_exclusive,
       {sql_pround('CAST(SUM(CASE WHEN n.n_sources = 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)', 6)} AS exclusive_ratio
FROM sh s JOIN nsrc n USING (shingle)
GROUP BY s.source
ORDER BY s.source
""",
    tags=("curation", "text"),
)
def qc11_shingle_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle-novelty audit: per source, how many distinct word
    trigrams it contributes and what fraction appear NOWHERE else — the
    phrase-level originality score that separates a source adding new
    text from one re-mixing what the corpus already has (doc-level
    overlap, c08, misses this: remixes have fresh fingerprints but stale
    shingles).

    Scale shape: q55's trigram explode collapses to DISTINCT
    (source, shingle) in one shuffle; the source-count side aggregates
    the same keys (partial map-side combine) and joins back on
    `shingle` — no pair join anywhere, so unlike near-dup detection this
    stays linear in distinct-shingle count. Integers + one pround ratio.
    """
    d = table(spark, sf_dir, "documents")
    # split materialized once per row — captured in the transform lambda
    # it re-runs per shingle position (r13 HOF-capture fix)
    wcol = F.col("_w")
    n = F.size(wcol)
    shingle_arr = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(0), n - 3),
            lambda i: F.array_join(F.slice(wcol, i + 1, 3), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = (
        d.withColumn("_w", _words())
        .select("source", F.explode(shingle_arr).alias("shingle"))
        .distinct()
    )
    nsrc = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("n_sources"))
    excl = F.when(F.col("n_sources") == 1, 1).otherwise(0)
    return (
        sh.join(nsrc, "shingle")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(excl).cast("bigint").alias("n_exclusive"),
            pround(F.sum(excl).cast("double") / F.count(F.lit(1)), 6).alias("exclusive_ratio"),
        )
        .orderBy("source")
    )


@query(
    "qc12_seqlen_histogram",
    oracle=f"""
WITH d AS (
  SELECT len(string_split(text, ' ')) AS n_words FROM documents
), b AS (
  SELECT CAST(length(format('{{:b}}', n_words)) - 1 AS INTEGER) AS bucket, n_words FROM d
), h AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_words) AS BIGINT) AS total_words
  FROM b GROUP BY bucket
)
SELECT bucket,
       CAST(CAST(1 AS BIGINT) << bucket AS BIGINT) AS lo_words,
       CAST((CAST(1 AS BIGINT) << (bucket + 1)) - 1 AS BIGINT) AS hi_words,
       n_docs, total_words,
       {sql_pround('CAST(SUM(n_docs) OVER (ORDER BY bucket) AS DOUBLE) / SUM(n_docs) OVER ()', 6)} AS cum_doc_frac
FROM h
ORDER BY bucket
""",
    tags=("curation", "diagnostics"),
)
def qc12_seqlen_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length histogram on power-of-two buckets, with the
    cumulative document fraction — the profile a packing planner (qb05/
    b15) reads to pick max_seq_len and predict padding waste before a
    tokenization run.

    Determinism: the bucket is floor(log2(n_words)) computed via BINARY
    STRING LENGTH (bin/format '{:b}'), pure integer — a float log2 would
    knife-edge on exact powers of two. Counts and the running totals are
    integers; the single ratio is pround(6). Scale shape: one aggregate
    to ≤64 bucket rows (bounded by the bigint width, i.e. by SCHEMA),
    then unpartitioned windows over those bounded rows only.
    """
    d = table(spark, sf_dir, "documents")
    nw = F.size(_words())
    b = d.select(nw.alias("n_words")).select(
        (F.length(F.expr("bin(n_words)")) - 1).cast("int").alias("bucket"), "n_words"
    )
    h = b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("total_words"),
    )
    cum = Window.orderBy("bucket").rangeBetween(Window.unboundedPreceding, Window.currentRow)
    tot = Window.partitionBy()
    return (
        h.select(
            "bucket",
            F.expr("shiftleft(CAST(1 AS BIGINT), bucket)").cast("bigint").alias("lo_words"),
            (F.expr("shiftleft(CAST(1 AS BIGINT), bucket + 1)") - 1).cast("bigint").alias("hi_words"),
            "n_docs",
            "total_words",
            pround(
                F.sum("n_docs").over(cum).cast("double") / F.sum("n_docs").over(tot), 6
            ).alias("cum_doc_frac"),
        )
        .orderBy("bucket")
    )


@query(
    "qc13_label_cohesion",
    oracle=f"""
WITH pos AS (
  SELECT vec_id, label, t.pos AS pos, CAST(t.val AS DOUBLE) AS val FROM (
    SELECT vec_id, label,
           unnest(list_transform(range(1, len(embedding) + 1),
                  i -> {{'pos': i - 1, 'val': embedding[i]}})) AS t
    FROM embeddings) s
), cent AS (
  SELECT label, pos,
         {sql_pround('CAST(SUM(CAST(val AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*)', 6)} AS c
  FROM pos GROUP BY label, pos
), pv AS (
  SELECT p.vec_id, p.label,
         CAST(SUM({_sql_dterm('p.val * c.c')}) AS DOUBLE) AS dot,
         CAST(SUM({_sql_dterm('p.val * p.val')}) AS DOUBLE) AS nv2,
         CAST(SUM({_sql_dterm('c.c * c.c')}) AS DOUBLE) AS nc2
  FROM pos p JOIN cent c ON c.label = p.label AND c.pos = p.pos
  GROUP BY p.vec_id, p.label
)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       {sql_pround(f"CAST(SUM({_sql_dterm('dot / (sqrt(nv2) * sqrt(nc2))')}) AS DOUBLE) / COUNT(*)", 6)} AS avg_cosine
FROM pv
GROUP BY label
ORDER BY label
""",
    tags=("curation", "vector"),
    bench=True,
)
def qc13_label_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cluster cohesion: per label, the average cosine
    similarity of member vectors to the label centroid — the one-number
    "is this cluster real?" check run after any clustering / labeling
    pass (a low-cohesion label in a semantic-dedup or topic partition
    means its groups shouldn't be trusted).

    Shape: centroids come from b08's (label, pos) aggregate — dims ×
    labels cells, one tiny shuffle — then re-assemble to arrays and
    BROADCAST-join back on `label` alone, so the corpus is never
    exploded for the similarity pass: dot and norms are per-row zip_with
    folds in whole-stage codegen, zero additional shuffle. Determinism:
    fold terms pround(9)-round then accumulate in exact DECIMAL (order
    can't matter once terms are exact), centroids are pround(6), sqrt is
    correctly-rounded IEEE on both engines, and the per-label mean is an
    exact-decimal sum / count, pround(6).
    """
    emb = table(spark, sf_dir, "embeddings")
    cent = (
        emb.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(
            pround(
                F.sum(F.col("val").cast("double").cast("decimal(25,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("c")
        )
    )

    def dfold(terms: Column) -> Column:
        return F.aggregate(
            terms,
            F.lit(0).cast("decimal(25,12)"),
            lambda acc, x: (acc + x).cast("decimal(25,12)"),
        ).cast("double")

    # centroid norm hoisted to the label table (r14): it depends only on
    # carr, so folding it per MEMBER row re-ran a dim-element DECIMAL
    # fold n_vecs times for |labels| distinct values. Same fold over the
    # same pround(6) centroid values → identical doubles.
    carr = cent.groupBy("label").agg(
        F.transform(F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]).alias("carr")
    )
    carr = carr.withColumn(
        "nc", F.sqrt(dfold(F.transform(F.col("carr"), lambda b: _dterm(b * b))))
    )
    v = F.transform("embedding", lambda x: x.cast("double"))

    dot = dfold(F.zip_with(v, F.col("carr"), lambda a, b: _dterm(a * b)))
    nv2 = dfold(F.transform(v, lambda a: _dterm(a * a)))
    pv = emb.join(F.broadcast(carr), "label").select(
        "label", (dot / (F.sqrt(nv2) * F.col("nc"))).alias("cos")
    )
    return (
        pv.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            pround(F.sum(_dterm(F.col("cos"))).cast("double") / F.count(F.lit(1)), 6).alias(
                "avg_cosine"
            ),
        )
        .orderBy("label")
    )


_ZIPF_TOP = 100  # words ranked per source


@query(
    "qc14_zipf_slope",
    oracle=f"""
WITH wc AS (
  SELECT source, word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT source, unnest(string_split(text, ' ')) AS word FROM documents) t
  GROUP BY 1, 2
), ranked AS (
  SELECT source, cnt,
         row_number() OVER (PARTITION BY source ORDER BY cnt DESC, word ASC) AS rk
  FROM wc
), terms AS (
  SELECT source,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM({_sql_dterm('ln(CAST(rk AS DOUBLE))')}) AS DOUBLE) AS sx,
         CAST(SUM({_sql_dterm('ln(CAST(cnt AS DOUBLE))')}) AS DOUBLE) AS sy,
         CAST(SUM({_sql_dterm('ln(CAST(rk AS DOUBLE)) * ln(CAST(cnt AS DOUBLE))')}) AS DOUBLE) AS sxy,
         CAST(SUM({_sql_dterm('ln(CAST(rk AS DOUBLE)) * ln(CAST(rk AS DOUBLE))')}) AS DOUBLE) AS sxx
  FROM ranked WHERE rk <= {_ZIPF_TOP}
  GROUP BY source
)
SELECT source,
       CAST(n AS BIGINT) AS n_terms,
       {sql_pround('(n * sxy - sx * sy) / (n * sxx - sx * sx)', 6)} AS zipf_slope
FROM terms
ORDER BY source
""",
    tags=("curation", "diagnostics"),
)
def qc14_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-slope audit: least-squares slope of log-frequency vs
    log-rank over each source's top-100 words. Natural text sits near
    −1; templated / machine-generated text flattens toward 0 and
    keyword-stuffed spam steepens past −1.5 — a cheap statistical
    fingerprint for "does this source look like language?".

    Determinism: ranks are integer row_numbers with full tie-breaks
    (count DESC, word ASC); every ln/product term is pround(9)-rounded
    and summed in exact DECIMAL, so the four regression sums are
    order-free; the closed-form slope is then a fixed sequence of IEEE
    ops. Scale shape: word counts partial-aggregate map-side into one
    (source, word) shuffle; the window sorts only each source's DISTINCT
    VOCABULARY (not its tokens), and the regression runs on ≤100 rows
    per source.
    """
    d = table(spark, sf_dir, "documents")
    wc = (
        d.select("source", F.explode(_words()).alias("word"))
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    w = Window.partitionBy("source").orderBy(F.desc("cnt"), F.asc("word"))
    ranked = wc.select("source", "cnt", F.row_number().over(w).alias("rk")).filter(
        F.col("rk") <= _ZIPF_TOP
    )
    x = F.log(F.col("rk").cast("double"))
    y = F.log(F.col("cnt").cast("double"))
    terms = ranked.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(_dterm(x)).cast("double").alias("sx"),
        F.sum(_dterm(y)).cast("double").alias("sy"),
        F.sum(_dterm(x * y)).cast("double").alias("sxy"),
        F.sum(_dterm(x * x)).cast("double").alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return terms.select(
        "source",
        F.col("n").cast("bigint").alias("n_terms"),
        pround(slope, 6).alias("zipf_slope"),
    ).orderBy("source")


@query(
    "qe25_label_separation",
    oracle=f"""
WITH pos AS (
  SELECT vec_id, label, t.pos AS pos, CAST(t.val AS DOUBLE) AS val FROM (
    SELECT vec_id, label,
           unnest(list_transform(range(1, len(embedding) + 1),
                  i -> {{'pos': i - 1, 'val': embedding[i]}})) AS t
    FROM embeddings) s
), cent AS (
  SELECT label, pos,
         {sql_pround('CAST(SUM(CAST(val AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*)', 6)} AS c
  FROM pos GROUP BY label, pos
), pv AS (
  SELECT a.label AS label_a, b.label AS label_b,
         CAST(SUM({_sql_dterm('a.c * b.c')}) AS DOUBLE) AS dot,
         CAST(SUM({_sql_dterm('a.c * a.c')}) AS DOUBLE) AS na2,
         CAST(SUM({_sql_dterm('b.c * b.c')}) AS DOUBLE) AS nb2
  FROM cent a JOIN cent b ON a.pos = b.pos AND a.label < b.label
  GROUP BY 1, 2
)
SELECT label_a, label_b,
       {sql_pround('dot / (sqrt(na2) * sqrt(nb2))', 6)} AS centroid_cosine
FROM pv
ORDER BY label_a, label_b
""",
    tags=("curation", "vector"),
)
def qe25_label_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Between-label centroid separation matrix: pairwise cosine of
    label centroids — c13's complement (within-cluster cohesion is only
    half the validation; two cohesive clusters whose centroids sit at
    cosine 0.99 are still one cluster mislabeled as two). Together they
    form the separation/cohesion pair every clustering sign-off reads.

    Shape: the |labels|×dims centroid table (one tiny aggregate, b08's)
    self-joins on the dimension index — labels² × dims rows, a
    schema-bounded worktable independent of corpus size. Determinism:
    pround(6) centroids, pround(9)-rounded product terms summed in
    exact DECIMAL, correctly-rounded sqrt (c13's contract).
    """
    emb = table(spark, sf_dir, "embeddings")
    cent = (
        emb.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(
            pround(
                F.sum(F.col("val").cast("double").cast("decimal(25,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("c")
        )
    )
    a, b = cent.alias("a"), cent.alias("b")
    pv = (
        a.join(b, (F.col("a.pos") == F.col("b.pos")) & (F.col("a.label") < F.col("b.label")))
        .groupBy(F.col("a.label").alias("label_a"), F.col("b.label").alias("label_b"))
        .agg(
            F.sum(_dterm(F.col("a.c") * F.col("b.c"))).cast("double").alias("dot"),
            F.sum(_dterm(F.col("a.c") * F.col("a.c"))).cast("double").alias("na2"),
            F.sum(_dterm(F.col("b.c") * F.col("b.c"))).cast("double").alias("nb2"),
        )
    )
    return pv.select(
        "label_a",
        "label_b",
        pround(F.col("dot") / (F.sqrt("na2") * F.sqrt("nb2")), 6).alias("centroid_cosine"),
    ).orderBy("label_a", "label_b")
