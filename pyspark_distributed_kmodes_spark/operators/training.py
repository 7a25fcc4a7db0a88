"""Training-data preparation operators: the steps between a cleaned
corpus and a training run — context-window chunking, sequence packing,
incremental (cross-snapshot) dedup, embedding centroids, and int8
embedding quantization.

All JVM built-ins (sequence/transform/aggregate/posexplode + windows);
no Python in any hot path, so every operator whole-stage-codegens and
shuffles only what the grouping key requires.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_distributed_kmodes_spark.functions.deterministic import pround
from pyspark_distributed_kmodes_spark.registry import query
from pyspark_distributed_kmodes_spark.sources.tables import table

CHUNK_WORDS = 32  # context-window size in words
CHUNK_STRIDE = 24  # stride (8-word overlap) — standard sliding chunking
PACK_TARGET = 256  # words per packed training sequence


@query(
    "qo05_context_chunks",
    oracle=f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words, len(string_split(text, ' ')) AS n
  FROM documents
)
SELECT doc_id,
       CAST((s - 1) // {CHUNK_STRIDE} AS INTEGER) AS chunk_idx,
       array_to_string(words[s:s + {CHUNK_WORDS - 1}], ' ') AS chunk_text,
       CAST(len(words[s:s + {CHUNK_WORDS - 1}]) AS BIGINT) AS n_words
FROM w, (SELECT unnest(range(1, (SELECT MAX(n) FROM w) + 1, {CHUNK_STRIDE})) AS s)
WHERE s <= n
ORDER BY doc_id, chunk_idx
""",
    tags=("training", "text"),
)
def qo05_context_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding context-window chunking: each document becomes overlapping
    {CHUNK_WORDS}-word chunks at stride {CHUNK_STRIDE} — the
    tokenize-and-window step that turns documents into model inputs.

    Shape: per-row array ops (sequence of start offsets → slice) +
    posexplode; no shuffle at all until a downstream consumer groups.
    The final orderBy exists only for the deterministic oracle hash.
    """
    d = table(spark, sf_dir, "documents")
    # split materialized once per row — captured in the transform lambda
    # it re-runs per chunk start (r13 HOF-capture fix)
    words = F.col("_w")
    n = F.size(words)
    starts = F.sequence(F.lit(1), n, F.lit(CHUNK_STRIDE))
    chunks = F.transform(starts, lambda s: F.slice(words, s, CHUNK_WORDS))
    return (
        d.withColumn("_w", F.split("text", " "))
        .select("doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.array_join("chunk", " ").alias("chunk_text"),
            F.size("chunk").cast("bigint").alias("n_words"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


@query(
    "qo06_sequence_packing",
    oracle=f"""
SELECT doc_id, source,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(start_offset AS BIGINT) AS start_offset,
       CAST(start_offset // {PACK_TARGET} AS BIGINT) AS pack_id
FROM (
  SELECT doc_id, source,
         len(string_split(text, ' ')) AS n_words,
         SUM(len(string_split(text, ' '))) OVER (PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - len(string_split(text, ' ')) AS start_offset
  FROM documents
) t
ORDER BY source, doc_id
""",
    tags=("training", "text"),
)
def qo06_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: concatenate documents in deterministic order and
    cut every {PACK_TARGET} words — each doc gets the pack id of its
    start offset (concat-and-chunk packing, the standard pre-training
    batch construction).

    Scale: packing is PER SOURCE SHARD (window partitioned by source,
    ordered by doc_id) — a single global cumulative sum would serialize
    onto one partition; per-shard packing is what a real pipeline does
    anyway (shards are the unit of data loading). Integer word counts →
    exact cumsum, no float drift.
    """
    d = table(spark, sf_dir, "documents")
    n_words = F.size(F.split("text", " ")).cast("bigint")
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        d.select("doc_id", "source", n_words.alias("n_words"))
        .withColumn("start_offset", F.sum("n_words").over(w) - F.col("n_words"))
        .withColumn("pack_id", F.floor(F.col("start_offset") / PACK_TARGET).cast("bigint"))
        .orderBy("source", "doc_id")
    )


@query(
    "qo07_incremental_dedup",
    oracle="""
WITH corpus AS (
  SELECT md5(text) AS h FROM documents WHERE source <> 'src2'
), batch AS (
  SELECT doc_id, md5(text) AS h FROM documents WHERE source = 'src2'
)
SELECT b.doc_id, b.h AS content_hash
FROM batch b
WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.h = b.h)
ORDER BY b.doc_id
""",
    tags=("training", "dedup"),
)
def qo07_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (cross-snapshot) dedup: which docs of an incoming
    batch (source src2) are NOT already in the accepted corpus (other
    sources) — the admission check a continuously-ingesting training
    pipeline runs per batch, as opposed to q56's within-corpus dedup.

    Shape: anti join on content hash — shuffles (hash, id) only. At
    100 TB the corpus side is a bucketed hash table on disk, so the
    anti join co-locates without a corpus-side shuffle.
    """
    d = table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("source") != "src2").select(F.md5("text").alias("content_hash"))
    batch = d.filter(F.col("source") == "src2").select("doc_id", F.md5("text").alias("content_hash"))
    return batch.join(corpus, "content_hash", "left_anti").select("doc_id", "content_hash").orderBy("doc_id")


@query(
    "o08_embedding_centroids",
    oracle="""
SELECT label,
       CAST(t.pos AS INTEGER) AS pos,
       (CAST(floor((CAST(SUM(CAST(CAST(t.val AS DOUBLE) AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*)) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0) AS centroid
FROM (
  SELECT label,
         unnest(list_transform(range(1, len(embedding) + 1),
                i -> {'pos': i - 1, 'val': embedding[i]})) AS t
  FROM embeddings
) s
GROUP BY label, t.pos
ORDER BY label, pos
""",
    tags=("training", "vector"),
)
def o08_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid, dimension-wise: posexplode the
    vector → one (label, pos) aggregation. The distributed mean-vector
    primitive behind IVF list training, class prototypes, and drift
    monitoring.

    Determinism: per-dimension sums run in DECIMAL(25,6) (exact) and
    divide once — float accumulation order can't drift the hash.
    Scale: ONE shuffle keyed (label, pos) — dims × labels cells, each
    partially aggregated map-side.
    """
    emb = table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(
            pround(
                F.sum(F.col("val").cast("double").cast("decimal(25,6)")).cast("double") / F.count(F.lit(1)), 6
            ).alias("centroid")
        )
        .select("label", F.col("pos").cast("int").alias("pos"), "centroid")
        .orderBy("label", "pos")
    )


@query(
    "o09_int8_quantization",
    oracle="""
SELECT vec_id,
       (CAST(floor((list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x)))) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0) AS max_abs,
       CAST(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
            x -> CAST(round(x * 127.0 / list_max(list_transform(CAST(embedding AS DOUBLE[]), y -> abs(y)))) AS BIGINT)
                 * CAST(round(x * 127.0 / list_max(list_transform(CAST(embedding AS DOUBLE[]), y -> abs(y)))) AS BIGINT)))
            AS BIGINT) AS q_sq_sum
FROM embeddings
ORDER BY vec_id
""",
    tags=("training", "vector"),
)
def o09_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization: per-vector scale =
    127/max|x|, codes = round(x·scale) — storage compression every
    vector store applies before ANN serving. Emits the scale basis and
    the integer square-sum of the codes (the norm a quantized dot
    product uses), all exact integers so the oracle hash can't drift.

    Shape: pure per-row higher-order folds (transform/aggregate), no
    shuffle, whole-stage codegen end to end.
    """
    emb = table(spark, sf_dir, "embeddings")
    xs = F.transform("embedding", lambda x: x.cast("double"))
    # max_abs hoisted into its own projection: captured inside the codes
    # lambda it re-runs the full array_max fold PER ELEMENT — O(d²)
    # per vector (r13 HOF-capture fix)
    max_abs = F.col("_max_abs")
    codes = F.transform(xs, lambda x: F.round(x * 127.0 / max_abs).cast("bigint"))
    q_sq_sum = F.aggregate(codes, F.lit(0).cast("bigint"), lambda acc, c: acc + c * c)
    return (
        emb.withColumn("_max_abs", F.array_max(F.transform(xs, lambda x: F.abs(x))))
        .select(
            "vec_id",
            pround(max_abs, 6).alias("max_abs"),
            q_sq_sum.alias("q_sq_sum"),
        )
        .orderBy("vec_id")
    )


NGRAM_SPAN = 8  # span length for duplicate-substring detection


@query(
    "o11_duplicate_spans",
    bench=True,
    oracle=f"""
WITH grams AS (
  SELECT doc_id, s AS start_pos,
         array_to_string(string_split(text, ' ')[s:s + {NGRAM_SPAN - 1}], ' ') AS gram
  FROM documents,
       (SELECT unnest(range(1, (SELECT MAX(len(string_split(text, ' '))) FROM documents) + 1)) AS s)
  WHERE s <= len(string_split(text, ' ')) - {NGRAM_SPAN - 1}
), shared AS (
  SELECT gram FROM grams GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
)
SELECT g.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(COUNT(s.gram) AS BIGINT) AS n_dup_spans,
       (CAST(floor((CAST(COUNT(s.gram) AS DOUBLE) / COUNT(*)) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0) AS dup_frac
FROM grams g LEFT JOIN shared s ON g.gram = s.gram
GROUP BY g.doc_id
ORDER BY g.doc_id
""",
    tags=("training", "dedup"),
)
def o11_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-substring metric: fraction of each document's
    {NGRAM_SPAN}-gram start positions whose span also appears in
    ANOTHER document — the per-doc signal behind exact-substring dedup
    ("train-on-it-once" policies) and memorization audits.

    Shape: positional n-gram explode → ONE gram-keyed window pass that
    computes each span's distinct-document frequency in place
    (max-of-dense_rank == COUNT DISTINCT) → per-doc rollup. The
    round-13 optimization replaced the former shared-span aggregate +
    join-back (whose strategy had to be left to AQE because the shared
    set's size is DATA-DEPENDENT — a forced broadcast measured 7.7×
    growth on the 10×-replicated scale probe) with this join-free form:
    2 exchanges instead of 4, and no data-dependent join side at all.
    Docs shorter than {NGRAM_SPAN} words emit no spans (guarded
    sequence) and drop out — same as the oracle.
    """
    from pyspark_distributed_kmodes_spark.sources.tables import spread

    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    # split materialized once per row — captured in the transform lambda
    # it re-runs per span start (r13 HOF-capture fix)
    words = F.col("_w")
    n = F.size(words)
    starts = F.when(
        n >= NGRAM_SPAN, F.sequence(F.lit(1), n - (NGRAM_SPAN - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = d.withColumn("_w", F.split("text", " ")).select(
        "doc_id",
        F.explode(F.transform(starts, lambda s: F.array_join(F.slice(words, s, NGRAM_SPAN), " "))).alias("gram"),
    )
    # document frequency per span via ONE gram-keyed window pass:
    # df = max(dense_rank over doc_id) within the gram partition ==
    # COUNT(DISTINCT doc_id). The old form aggregated a shared-span
    # table (two-phase distinct exchange) and joined it back (another
    # gram exchange) — 2 exchanges and a join more than this for the
    # same per-row shared flag. AQE still picks the join strategy for
    # nothing: there is no join left.
    from pyspark.sql import Window

    w_go = Window.partitionBy("gram").orderBy("doc_id")
    w_g = Window.partitionBy("gram")
    flagged = (
        grams.withColumn("_dr", F.dense_rank().over(w_go))
        .withColumn("_df", F.max("_dr").over(w_g))
    )
    is_dup = (F.col("_df") >= 2).cast("int")
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(is_dup).alias("n_dup_spans"),
            pround(F.sum(is_dup).cast("double") / F.count(F.lit(1)), 6).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


@query(
    "o12_unigram_logprob",
    oracle="""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), freq AS (
  SELECT word, COUNT(*) AS cnt FROM words GROUP BY word
), total AS (
  SELECT COUNT(*) AS n FROM words
)
SELECT w.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       (CAST(floor((CAST(SUM(CAST(round(ln(CAST(f.cnt AS DOUBLE) / t.n), 6) AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*)) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0) AS avg_logprob
FROM words w JOIN freq f USING (word) CROSS JOIN total t
GROUP BY w.doc_id
ORDER BY w.doc_id
""",
    tags=("training", "quality"),
)
def o12_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring: mean per-word log-probability of
    each document under the corpus unigram distribution — the cheap
    KenLM-style perplexity proxy used to quality-filter pre-training
    data (low avg logprob = gibberish, high = boilerplate).

    Shape (round-3 rewrite — the 10× scale probe flagged the old
    token-level join as the repo's worst scaler): tokens collapse to
    per-doc WORD COUNTS first, so the frequency rollup, the join, and
    the final aggregation all run over distinct (doc, word) pairs —
    Heaps'-law sub-linear in token count — instead of every token; the
    per-doc sum multiplies each word's rounded logprob by its count
    (exact: decimal × integer), which is algebraically identical to
    summing per token, so the oracle is unchanged. Vocabulary size is
    data-dependent, so the join strategy stays AQE's call. Determinism:
    each term rounds to 6 before an exact DECIMAL sum, one division at
    the end.
    """
    d = table(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    dw = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("cnt_dw"))
    freq = dw.groupBy("word").agg(F.sum("cnt_dw").alias("cnt"))
    total = freq.groupBy().agg(F.sum("cnt").cast("double").alias("n"))
    lp = F.round(F.log(F.col("cnt").cast("double") / F.col("n")), 6)
    term = (F.col("cnt_dw") * lp.cast("decimal(25,6)")).cast("decimal(25,6)")
    return (
        dw.join(freq.crossJoin(F.broadcast(total)), "word")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt_dw").cast("bigint").alias("n_words"),
            pround(F.sum(term).cast("double") / F.sum("cnt_dw"), 6).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


@query(
    "o13_model_quality_scores",
    oracle="""
SELECT doc_id,
       round(CAST(list_reduce(
         list_prepend(CAST(7 AS BIGINT),
           list_transform(list_filter(string_split(text, ''), c -> c <> ''),
                          c -> CAST(ascii(c) AS BIGINT))),
         (acc, h) -> (acc * 131 + h) % 2147483647) % 1000 AS DOUBLE) / 1000.0, 6) AS score,
       CASE WHEN (list_reduce(
         list_prepend(CAST(7 AS BIGINT),
           list_transform(list_filter(string_split(text, ''), c -> c <> ''),
                          c -> CAST(ascii(c) AS BIGINT))),
         (acc, h) -> (acc * 131 + h) % 2147483647) % 1000) >= 200 THEN 1 ELSE 0 END AS keep
FROM documents
ORDER BY doc_id
""",
    tags=("training", "udf", "quality"),
)
def o13_model_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring, the batched-inference shape: an
    Arrow-batched pandas UDF scores each document and a threshold gates
    it — exactly how a fastText/BERT quality classifier plugs into the
    pipeline (swap the scorer body for tokenizer+model.forward; batch
    size and partitioning stay identical).

    The stand-in "model" is the corpus's portable polynomial hash
    (a59's base-131 fold) so the driver can hash-gate the plumbing
    against SQL — deterministic across engines, batches, and partition
    counts, which a real model's floats on varying hardware are not.
    """
    M = 2147483647

    @F.pandas_udf("double")
    def score_udf(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            acc = 7
            for ch in t:
                acc = (acc * 131 + ord(ch)) % M
            out.append(round((acc % 1000) / 1000.0, 6))
        return pd.Series(out)

    from pyspark_distributed_kmodes_spark.sources.tables import spread

    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    return (
        d.select("doc_id", score_udf("text").alias("score"))
        .withColumn("keep", F.when(F.col("score") >= 0.2, 1).otherwise(0))
        .orderBy("doc_id")
    )


VOCAB_SIZE = 100  # top-N words kept; everything else maps to UNK_ID
UNK_ID = 100


@query(
    "qb14_tokenize_ids",
    oracle=f"""
WITH words AS (
  SELECT doc_id, unnest(list_transform(range(1, len(string_split(text, ' ')) + 1),
         i -> {{'pos': i, 'word': string_split(text, ' ')[i]}})) AS w
  FROM documents
), freq AS (
  SELECT w.word, COUNT(*) AS cnt FROM words GROUP BY w.word
), vocab AS (
  SELECT word, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, word ASC) - 1 AS INTEGER) AS id
  FROM freq ORDER BY id LIMIT {VOCAB_SIZE}
)
SELECT w.doc_id,
       md5(array_to_string(list(COALESCE(v.id, {UNK_ID}) ORDER BY w.pos), ',')) AS token_seq_hash,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unk
FROM words w LEFT JOIN vocab v ON v.word = w.w.word
GROUP BY w.doc_id
ORDER BY w.doc_id
""",
    tags=("training", "text"),
)
def qb14_tokenize_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary tokenization: build the top-{VOCAB_SIZE} word vocab
    (rank by corpus frequency, deterministic tie-break), map every
    document to its token-id sequence with OOV → UNK — the final step
    before sequence packing writes model input.

    Scale shape: vocab is a tiny broadcast table (it IS the model
    artifact); the corpus side is one explode + broadcast join + one
    per-doc aggregation. Order restored via array_sort on (pos, id)
    structs — no assumption that collect_list preserves order.

    Output is SCALAR columns only (determinism/harness contract): the
    id sequence itself is emitted as `token_seq_hash` =
    md5(comma-joined ids in position order) plus `n_tokens`/`n_unk`
    counts — array<int> cells crash the harness canonicalizer (pandas
    sort_values cannot factorize ndarray cells), and a hash carries
    the same equality signal. Downstream consumers that need the raw
    ids use b15/qb06's packing path, which materializes them.
    """
    d = table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "word")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "word")
    freq = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    from pyspark.sql import Window as W

    # distributed top-k FIRST (TakeOrderedAndProject — parallel per
    # partition, never a global single-partition window over the full
    # vocabulary), then ids assigned on the bounded VOCAB_SIZE rows
    vocab = (
        freq.orderBy(F.desc("cnt"), F.asc("word"))
        .limit(VOCAB_SIZE)
        .withColumn(
            "id", (F.row_number().over(W.orderBy(F.desc("cnt"), F.asc("word"))) - 1).cast("int")
        )
        .select("word", "id")
    )
    tok = words.join(F.broadcast(vocab), "word", "left").select(
        "doc_id", "pos", F.coalesce("id", F.lit(UNK_ID)).alias("id")
    )
    return (
        tok.groupBy("doc_id")
        .agg(
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "id"))),
                        lambda s: s["id"].cast("string"),
                    ),
                )
            ).alias("token_seq_hash"),
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("id") == UNK_ID, 1).otherwise(0)).cast("bigint").alias("n_unk"),
        )
        .orderBy("doc_id")
    )


@query(
    "o15_packed_sequences",
    oracle=f"""
WITH packed AS (
  SELECT doc_id, source, text,
         (SUM(len(string_split(text, ' '))) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - len(string_split(text, ' '))) // {PACK_TARGET} AS pack_id
  FROM documents
)
SELECT source, CAST(pack_id AS BIGINT) AS pack_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(len(string_split(string_agg(text, ' ' ORDER BY doc_id), ' ')) AS BIGINT) AS n_words,
       md5(string_agg(text, ' ' ORDER BY doc_id)) AS content_hash
FROM packed
GROUP BY source, pack_id
ORDER BY source, pack_id
""",
    tags=("training", "text"),
)
def o15_packed_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized packed sequences: concatenate each pack's documents
    in doc_id order into one training-sequence text (emitted here as
    its md5 + stats so the oracle hash stays compact) — the writer
    stage after b06's pack assignment.

    Shape: b06's per-shard cumsum window, then ONE aggregation per
    (source, pack_id) whose concat order is pinned by sorting (doc_id,
    text) structs — no reliance on collect_list ordering. At scale each
    pack is a bounded handful of documents (target words / avg doc
    words), so per-group state stays small no matter the corpus size.
    """
    d = table(spark, sf_dir, "documents")
    n_words = F.size(F.split("text", " ")).cast("bigint")
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    packed = (
        d.select("doc_id", "source", "text", n_words.alias("n_words"))
        .withColumn("pack_id", F.floor((F.sum("n_words").over(w) - F.col("n_words")) / PACK_TARGET))
    )
    seq_text = F.array_join(
        F.transform(F.array_sort(F.collect_list(F.struct("doc_id", "text"))), lambda s: s["text"]),
        " ",
    )
    return (
        packed.groupBy("source", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.size(F.split(seq_text, " ")).cast("bigint").alias("n_words"),
            F.md5(seq_text).alias("content_hash"),
        )
        .orderBy("source", "pack_id")
    )


@query(
    "qb42_train_val_test_split",
    oracle="""
SELECT source, split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(MIN(doc_id) AS BIGINT) AS min_id
FROM (
  SELECT source, n_chars, doc_id,
         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
              WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
              ELSE 'test' END AS split
  FROM documents
) t
GROUP BY source, split
ORDER BY source, split
""",
    tags=("training", "sampling"),
)
def qb42_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split assignment (~80/10/10) by a
    hash of the document id: md5 hex-prefix bucketing, so the split is
    reproducible across engines, runs, and cluster sizes, independent
    of row order, and stable under text edits (id-keyed, not
    content-keyed). The canonical last step before materializing
    training shards; contrast a95's strata-keyed mod sampling.

    Scale: a pure per-row expression plus one small aggregation — the
    split column costs nothing at 100 TB and partitions the write by
    (split) with no shuffle beyond the report's groupBy. Hex-prefix
    comparison works because md5 hex is fixed-length lowercase in both
    engines (lexicographic == numeric on the prefix).
    """
    d = table(spark, sf_dir, "documents")
    prefix = F.md5(F.col("doc_id").cast("string")).substr(1, 2)
    split = (
        F.when(prefix < "cc", "train").when(prefix < "e6", "val").otherwise("test")
    )
    return (
        d.select("source", "n_chars", "doc_id", split.alias("split"))
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_id"),
        )
        .orderBy("source", "split")
    )
