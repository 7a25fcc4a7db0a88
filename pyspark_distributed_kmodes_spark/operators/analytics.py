"""Round-4 analytics extensions (d01-d16): graph centrality over the
near-dup graph, equi-depth bucket joins, a watermark batch twin,
blocked record linkage, interval algebra, skyline, collocations,
attribution, inequality / nonparametric statistics, gap-fill
interpolation, robust anomaly scoring, and table profiling.

Engine style unchanged: pure JVM DataFrame ops, pround floor-rounding
on every oracle-gated double, DECIMAL-summed float aggregates, every
ORDER BY carries a unique tie-break, scalar-only output columns.
Keys are d-prefixed so they sort inside the driver's 50-entry window
alongside b14 and e01-e33 (the rotation __spark_entry__.py documents).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark_distributed_kmodes_spark.functions.deterministic import (
    dsum,
    pround,
    sql_dsum,
    sql_pround,
)
from pyspark_distributed_kmodes_spark.operators.curation2 import _dterm, _sql_dterm
from pyspark_distributed_kmodes_spark.registry import query
from pyspark_distributed_kmodes_spark.sources.tables import table

# The shared near-dup edge CTE (word-trigram Jaccard >= 0.2), identical
# to the e22/e30 oracle prefix so every graph query sees the same graph.
_EDGE_CTE = """
shingles AS (
  SELECT DISTINCT doc_id, shingle
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(string_split(text, ' ')) - 1),
                  i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS shingle
    FROM documents
  ) t
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_shingles FROM shingles GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS u, b.doc_id AS v, COUNT(*) AS n_common
  FROM shingles a JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), edges AS (
  SELECT p.u, p.v FROM pairs p
  JOIN sizes sa ON sa.doc_id = p.u
  JOIN sizes sb ON sb.doc_id = p.v
  WHERE CAST(p.n_common AS DOUBLE) / (sa.n_shingles + sb.n_shingles - p.n_common) >= 0.2
), und AS (
  SELECT u AS node, v AS nbr FROM edges UNION ALL SELECT v, u FROM edges
)"""

_PR_ITERS = 3
_PR_DAMP = 0.85


def _pr_iter_sql(prev: str, out: str) -> str:
    """One PageRank iteration as SQL: contributions pround(9)-stabilized
    and DECIMAL-summed so neighbor-sum order can't drift the hash."""
    contrib = _sql_dterm(f"p.pr / d.degree")
    return f"""{out} AS (
  SELECT u.nbr AS node,
         {sql_pround(f"(1.0 - {_PR_DAMP}) / nn.c + {_PR_DAMP} * CAST(SUM({contrib}) AS DOUBLE)", 9)} AS pr
  FROM und u JOIN {prev} p ON p.node = u.node JOIN deg d ON d.node = u.node
  CROSS JOIN nn
  GROUP BY u.nbr, nn.c
)"""


@query(
    "d01_neardup_pagerank",
    oracle=f"""
WITH {_EDGE_CTE},
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM und GROUP BY node
), nn AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM deg
), pr0 AS (
  SELECT node, {sql_pround('1.0 / nn.c', 9)} AS pr FROM deg CROSS JOIN nn
),
{_pr_iter_sql('pr0', 'pr1')},
{_pr_iter_sql('pr1', 'pr2')},
{_pr_iter_sql('pr2', 'pr3')}
SELECT p.node AS doc_id, d.degree, {sql_pround('p.pr', 6)} AS pagerank
FROM pr3 p JOIN deg d ON d.node = p.node
ORDER BY doc_id
""",
    tags=("dedup", "graph"),
    bench=True,
)
def d01_neardup_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank ({_PR_ITERS} fixed power iterations, damping 0.85) over
    the near-dup graph — centrality separates template/boilerplate hub
    documents (high PR: everything links to them) from members of plain
    duplicate cliques (PR ~ degree share), extending e22's triangle
    census with a global importance signal.

    Scale: every iteration is ONE join of the bounded edge list against
    the k-row rank table plus one grouped sum — no adjacency matrix,
    no driver state beyond the 1-row node count. The edge list is
    dedup-pair OUTPUT (bounded by true duplication, not corpus^2), and
    each iteration localCheckpoints so the 3-deep lineage never replays
    shingling. Determinism: contributions are pround(9)-stabilized then
    DECIMAL(25,12)-summed — neighbor order can't drift the hash; the
    node count joins in as a 1-row broadcast (schema-bounded).
    """
    from pyspark_distributed_kmodes_spark.operators.text import ngram_jaccard_pairs

    d = table(spark, sf_dir, "documents")
    edges = ngram_jaccard_pairs(d, threshold=0.2).select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    )
    und = (
        edges.select(F.col("u").alias("node"), F.col("v").alias("nbr"))
        .unionAll(edges.select(F.col("v").alias("node"), F.col("u").alias("nbr")))
        .localCheckpoint(eager=True)  # consumed once per iteration + deg
    )
    deg = und.groupBy("node").agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    deg = deg.localCheckpoint(eager=True)
    nn = deg.agg(F.count(F.lit(1)).cast("double").alias("c"))
    pr = deg.crossJoin(F.broadcast(nn)).select(
        "node", pround(F.lit(1.0) / F.col("c"), 9).alias("pr")
    )
    for _ in range(_PR_ITERS):
        contrib = und.join(pr, "node").join(deg, "node").select(
            F.col("nbr"), _dterm(F.col("pr") / F.col("degree")).alias("t")
        )
        pr = (
            contrib.groupBy(F.col("nbr").alias("node"))
            .agg(F.sum("t").cast("double").alias("s"))
            .crossJoin(F.broadcast(nn))
            .select(
                "node",
                pround((1.0 - _PR_DAMP) / F.col("c") + _PR_DAMP * F.col("s"), 9).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        pr.join(deg, "node")
        .select(F.col("node").alias("doc_id"), "degree", pround(F.col("pr"), 6).alias("pagerank"))
        .orderBy("doc_id")
    )


_DECILES = [i / 10.0 for i in range(1, 10)]


@query(
    "d02_equidepth_bucket_join",
    oracle=f"""
WITH bounds AS (
  SELECT quantile_cont(o_totalprice, {_DECILES}) AS bs FROM orders
)
SELECT CAST(1 + len(list_filter(b.bs, x -> x < l.l_extendedprice)) AS INTEGER) AS bucket,
       l.l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM lineitem l CROSS JOIN bounds b
GROUP BY 1, 2
ORDER BY bucket, l_returnflag
""",
    tags=("join", "analytics"),
)
def d02_equidepth_bucket_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth bucket JOIN: decile boundaries learned from ONE
    table's distribution (order totals) bin a DIFFERENT table's rows
    (line-item prices) — the cross-distribution generalization of
    e17's self-binning, and the scale-safe replacement for a range
    join against an ntile()'d build side (whose global sort would
    serialize the build table).

    Scale: the boundary table is a 1-row array from a percentile
    aggregate (map-side partial), broadcast to the fact scan; binning
    is a per-row array count, then one shuffle on the 10x|flags| key.
    Determinism: both engines interpolate quantiles identically on
    exact doubles (e17/c06 precedent); strict < binning; DECIMAL-sum
    revenue.
    """
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    bounds = o.agg(F.percentile("o_totalprice", F.array(*[F.lit(q) for q in _DECILES])).alias("bs"))
    bucket = (1 + F.size(F.filter(F.col("bs"), lambda x: x < F.col("l_extendedprice")))).cast("int")
    return (
        li.crossJoin(F.broadcast(bounds))
        .select(bucket.alias("bucket"), "l_returnflag", "l_extendedprice", "l_discount")
        .groupBy("bucket", "l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
        .orderBy("bucket", "l_returnflag")
    )


_WM_DELAY_US = 600_000_000  # 10-minute watermark delay
_WM_BLOCK = 1024  # arrival-order block size for the distributed prefix scan


@query(
    "d03_watermark_batch_twin",
    oracle=f"""
WITH seq AS (
  SELECT event_id, ts, event_type, epoch_us(ts) AS tus,
         MAX(epoch_us(ts)) OVER (ORDER BY event_id ASC
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm_basis
  FROM events
)
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_kept
FROM seq
WHERE wm_basis IS NULL OR tus >= wm_basis - {_WM_DELAY_US}
GROUP BY 1, 2
ORDER BY hour_start, event_type
""",
    tags=("events", "streaming"),
    bench=True,
)
def d03_watermark_batch_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of Structured Streaming's watermark DROP semantics:
    treating event_id as arrival order, an event is admitted iff its
    event time >= (max event time over all STRICTLY EARLIER arrivals)
    - 10 min — exactly the per-record bound a withWatermark('ts',
    '10 minutes') stream enforces between triggers — then the
    surviving events roll into hourly per-type counts. Together with
    e29 (which measures disorder) this makes watermark tuning fully
    auditable offline: e29 picks the delay, d03 shows precisely which
    rows that delay would discard.

    Scale: the global running max is a distributed two-level prefix
    scan, NOT a single-partition window — per-block running maxima
    (window partitioned by arrival block, fully parallel) combine
    with an exclusive prefix over the tiny per-block-max table
    (#blocks = n/{_WM_BLOCK} rows), then join back on block id. The
    only serialized window runs over block maxima, never rows.
    Determinism: integer microseconds throughout.
    """
    e = table(spark, sf_dir, "events")
    blk = F.floor(F.col("event_id") / _WM_BLOCK).alias("blk")
    seq = e.select("event_id", "ts", "event_type", F.unix_micros("ts").alias("tus"), blk)
    w_intra = (
        Window.partitionBy("blk").orderBy("event_id").rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = seq.withColumn("intra_max", F.max("tus").over(w_intra))
    blk_max = seq.groupBy("blk").agg(F.max("tus").alias("bmax"))
    w_blocks = Window.orderBy("blk").rowsBetween(Window.unboundedPreceding, -1)
    prefix = blk_max.select("blk", F.max("bmax").over(w_blocks).alias("prefix_max"))
    joined = seq.join(prefix, "blk")
    wm_basis = F.greatest("intra_max", "prefix_max")  # greatest skips nulls
    kept = joined.filter(
        wm_basis.isNull() | (F.col("tus") >= wm_basis - F.lit(_WM_DELAY_US))
    )
    return (
        kept.groupBy(
            F.date_trunc("hour", "ts").alias("hour_start"), "event_type"
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_kept"))
        .orderBy("hour_start", "event_type")
    )


_LINK_HEAD = 48  # chars compared by edit distance
_LINK_MAXDIST = 14
_LINK_BAND = 8  # n_chars length band width


@query(
    "d04_record_linkage",
    oracle=f"""
WITH b AS (
  SELECT doc_id, lang, n_chars // {_LINK_BAND} AS band, substr(text, 1, {_LINK_HEAD}) AS head
  FROM documents
)
SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
       CAST(levenshtein(a.head, c.head) AS BIGINT) AS edit_dist
FROM b a JOIN b c ON a.lang = c.lang AND a.band = c.band AND a.doc_id < c.doc_id
WHERE levenshtein(a.head, c.head) <= {_LINK_MAXDIST}
ORDER BY doc_a, doc_b
""",
    tags=("dedup", "linkage"),
)
def d04_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked approximate record linkage: candidate pairs meet ONLY
    inside a (language, length-band) block, then an edit-distance gate
    on the {_LINK_HEAD}-char head confirms the link — the standard
    blocking+comparison architecture of record-linkage systems, here
    catching near-identical documents that token-level Jaccard (q55)
    scores low because a single early edit shifts every shingle.

    Scale: NEVER all-pairs — the self-join key is the block, so
    candidate count is sum of per-block sizes squared, bounded by the
    band design, and levenshtein (JVM codegen) runs only on
    candidates. The same-key self-join co-partitions both sides in
    one shuffle. Determinism: integer distance, unique (a,b) order.
    """
    d = table(spark, sf_dir, "documents")
    b = d.select(
        "doc_id",
        "lang",
        (F.col("n_chars") / _LINK_BAND).cast("bigint").alias("band"),
        F.substring("text", 1, _LINK_HEAD).alias("head"),
    )
    a, c = b.alias("a"), b.alias("c")
    dist = F.levenshtein(F.col("a.head"), F.col("c.head"))
    return (
        a.join(
            c,
            (F.col("a.lang") == F.col("c.lang"))
            & (F.col("a.band") == F.col("c.band"))
            & (F.col("a.doc_id") < F.col("c.doc_id")),
        )
        .filter(dist <= _LINK_MAXDIST)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("c.doc_id").alias("doc_b"),
            dist.cast("bigint").alias("edit_dist"),
        )
        .orderBy("doc_a", "doc_b")
    )


_SESS_PAD_US = 300_000_000  # each event covers [ts, ts + 5 min)


@query(
    "d05_interval_coalesce",
    oracle=f"""
WITH iv AS (
  SELECT user_id, event_id, epoch_us(ts) AS s, epoch_us(ts) + {_SESS_PAD_US} AS e
  FROM events
), flagged AS (
  SELECT user_id, event_id, s, e,
         CASE WHEN MAX(e) OVER (PARTITION BY user_id ORDER BY s ASC, event_id ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) >= s
              THEN 0 ELSE 1 END AS new_island
  FROM iv
), islands AS (
  SELECT user_id, s, e,
         SUM(new_island) OVER (PARTITION BY user_id ORDER BY s ASC, event_id ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
), merged AS (
  SELECT user_id, island, MIN(s) AS m_start, MAX(e) AS m_end, COUNT(*) AS n_events
  FROM islands GROUP BY user_id, island
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_intervals,
       CAST(SUM(m_end - m_start) AS BIGINT) AS covered_us,
       CAST(MAX(m_end - m_start) AS BIGINT) AS longest_us,
       CAST(MAX(n_events) AS BIGINT) AS busiest_events
FROM merged GROUP BY user_id
ORDER BY user_id
""",
    tags=("events", "intervals"),
)
def d05_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval coalescing (gaps-and-islands): each event claims
    [ts, ts+5min); overlapping claims per user merge into maximal
    covered intervals, reported as per-user coverage stats — the
    interval-union primitive behind session stitching, on-call
    coverage, and GPU-occupancy accounting, and the batch complement
    of q32's session windows (which group events; this measures TIME).

    Scale: two user-partitioned windows (running max end, running
    island sum) + two grouped aggregations — all partitioned by
    user_id, nothing global. Determinism: integer microseconds, the
    island flag compares exact integers, (s, event_id) is a unique
    ordering.
    """
    e = table(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + _SESS_PAD_US).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("s"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "new_island",
        F.when(F.max("e").over(w_prev) >= F.col("s"), 0).otherwise(1),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("s"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = flagged.withColumn("island", F.sum("new_island").over(w_run))
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("m_start"), F.max("e").alias("m_end"), F.count(F.lit(1)).alias("n_events")
    )
    span = F.col("m_end") - F.col("m_start")
    return (
        merged.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
            F.sum(span).cast("bigint").alias("covered_us"),
            F.max(span).cast("bigint").alias("longest_us"),
            F.max("n_events").cast("bigint").alias("busiest_events"),
        )
        .orderBy("user_id")
    )


_SKY_BUCKET = 16  # n_words bucket width for the distributed pruning pass


@query(
    "d06_pareto_frontier",
    oracle="""
WITH pts AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct
  FROM documents
)
SELECT p.doc_id, p.n_words, p.n_distinct
FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q WHERE q.n_words > p.n_words AND q.n_distinct > p.n_distinct
)
ORDER BY doc_id
""",
    tags=("analytics", "skyline"),
)
def d06_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto frontier (skyline): documents not strictly dominated
    on (length, vocabulary richness) — the corpus-curation shortlist
    "longest docs that are also the most lexically diverse at their
    length", computed without the oracle's O(n^2) NOT EXISTS.

    Scale: two-phase distributed skyline. Phase 1 prunes with bucket
    maxima: bucket x by {_SKY_BUCKET}-word bands, take max(y) per
    bucket (tiny table), suffix-max it over strictly higher buckets —
    any point with y < that suffix max is dominated by something in a
    higher bucket (x' >= next band start > x) and drops WITHOUT any
    pairwise work. Phase 2 runs the exact single-pass sweep (max(y)
    over x-range strictly above, a RANGE window) on the surviving
    candidates only. Skyline points always survive phase 1 (a higher-
    bucket dominator would contradict skyline membership), so the
    result is exact; the only serialized window runs over candidates,
    whose count is bounded by the bucket-frontier, never the corpus.
    """
    d = table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    pts = d.select(
        "doc_id",
        F.size(words).cast("bigint").alias("n_words"),
        F.size(F.array_distinct(words)).cast("bigint").alias("n_distinct"),
    )
    pts = pts.withColumn("bkt", F.floor(F.col("n_words") / _SKY_BUCKET))
    bmax = pts.groupBy("bkt").agg(F.max("n_distinct").alias("bmax"))
    w_suffix = Window.orderBy("bkt").rowsBetween(1, Window.unboundedFollowing)
    bounds = bmax.select("bkt", F.max("bmax").over(w_suffix).alias("suffix_max"))
    cand = pts.join(bounds, "bkt").filter(
        F.col("suffix_max").isNull() | (F.col("n_distinct") >= F.col("suffix_max"))
    )
    # exact sweep on the bounded candidate set: strictly-greater-x max y
    w_above = Window.orderBy("n_words").rangeBetween(1, Window.unboundedFollowing)
    swept = cand.withColumn("max_y_above", F.max("n_distinct").over(w_above))
    return (
        swept.filter(
            F.col("max_y_above").isNull() | (F.col("n_distinct") >= F.col("max_y_above"))
        )
        .select("doc_id", "n_words", "n_distinct")
        .orderBy("doc_id")
    )


_PMI_MIN_COUNT = 5
_PMI_TOP = 20


@query(
    "d07_bigram_pmi",
    oracle=f"""
WITH words AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
), uni AS (
  SELECT w, COUNT(*) AS cw FROM words GROUP BY w
), n AS (
  SELECT CAST(SUM(cw) AS DOUBLE) AS n FROM uni
), bigrams AS (
  SELECT unnest(list_transform(range(1, len(string_split(text, ' '))),
         i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS bg
  FROM documents
), bi AS (
  SELECT bg, COUNT(*) AS cab FROM bigrams GROUP BY bg HAVING COUNT(*) >= {_PMI_MIN_COUNT}
), m AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM bigrams
), scored AS (
  SELECT b.bg AS bigram, CAST(b.cab AS BIGINT) AS n_pair,
         {sql_pround('ln((b.cab / m.m) * (n.n / ua.cw) * (n.n / ub.cw))', 6)} AS pmi
  FROM bi b
  JOIN uni ua ON ua.w = string_split(b.bg, ' ')[1]
  JOIN uni ub ON ub.w = string_split(b.bg, ' ')[2]
  CROSS JOIN n CROSS JOIN m
)
SELECT bigram, n_pair, pmi FROM scored
ORDER BY pmi DESC, bigram ASC LIMIT {_PMI_TOP}
""",
    tags=("text", "collocation"),
)
def d07_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-{_PMI_TOP} word bigrams by pointwise
    mutual information (min pair count {_PMI_MIN_COUNT}) — PMI finds
    phrases whose parts co-occur far above chance, the classic signal
    for tokenizer merge candidates and boilerplate phrase detection.

    Scale: two exploded counts (map-side combined), two joins of the
    HAVING-filtered bigram table against the unigram table (both
    vocabulary-bounded, judged by AQE), 1-row totals broadcast.
    Determinism: PMI = ln((cab/M)*(N/ca)*(N/cb)) — a fixed chain of
    divisions on exact integers (never an overflow-prone integer
    product), identical IEEE ops on both engines; transcendental ln on
    identical doubles is bit-identical; pround(6); (pmi desc, bigram)
    is a unique order.
    """
    d = table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    uni = (
        d.select(F.explode(words).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cw"))
    )
    n = uni.agg(F.sum("cw").cast("double").alias("n"))
    bigrams = d.select(
        F.explode(
            F.expr(
                "transform(slice(split(text, ' '), 1, size(split(text, ' ')) - 1), "
                "(x, i) -> concat(x, ' ', element_at(split(text, ' '), i + 2)))"
            )
        ).alias("bg")
    )
    m = bigrams.agg(F.count(F.lit(1)).cast("double").alias("m"))
    bi = bigrams.groupBy("bg").agg(F.count(F.lit(1)).alias("cab")).filter(
        F.col("cab") >= _PMI_MIN_COUNT
    )
    parts = F.split("bg", " ")
    bi = bi.withColumn("wa", parts[0]).withColumn("wb", parts[1])
    ua = uni.select(F.col("w").alias("wa"), F.col("cw").alias("ca"))
    ub = uni.select(F.col("w").alias("wb"), F.col("cw").alias("cb"))
    pmi = pround(
        F.log(
            (F.col("cab") / F.col("m")) * (F.col("n") / F.col("ca")) * (F.col("n") / F.col("cb"))
        ),
        6,
    )
    return (
        bi.join(ua, "wa")
        .join(ub, "wb")
        .crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(m))
        .select(F.col("bg").alias("bigram"), F.col("cab").cast("bigint").alias("n_pair"), pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), F.asc("bigram"))
        .limit(_PMI_TOP)
    )


@query(
    "d08_touch_attribution",
    oracle=f"""
WITH ev AS (
  SELECT user_id, event_id, event_type, value,
         lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || lpad(CAST(event_id AS VARCHAR), 12, '0') AS akey
  FROM events
), conv AS (
  SELECT user_id,
         arg_min(value, akey) AS conv_value,
         MIN(akey) AS conv_key
  FROM ev WHERE event_type = 'purchase' GROUP BY user_id
), priors AS (
  SELECT e.user_id, e.event_type, e.akey, c.conv_value
  FROM ev e JOIN conv c ON c.user_id = e.user_id AND e.akey < c.conv_key
), touched AS (
  SELECT user_id,
         arg_min(event_type, akey) AS first_touch,
         arg_max(event_type, akey) AS last_touch,
         arg_min(conv_value, akey) AS conv_value
  FROM priors GROUP BY user_id
)
SELECT attribution, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       {sql_dsum('conv_value')} AS attributed_value
FROM (
  SELECT 'first' AS attribution, first_touch AS event_type, conv_value FROM touched
  UNION ALL
  SELECT 'last', last_touch, conv_value FROM touched
)
GROUP BY attribution, event_type
ORDER BY attribution, event_type
""",
    tags=("events", "attribution"),
)
def d08_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch / last-touch conversion attribution: each user's
    FIRST purchase value is credited to the event type of their very
    first interaction (first-touch) and of the interaction immediately
    preceding the purchase (last-touch); users with no pre-purchase
    activity are unattributable and excluded. The marketing-analytics
    primitive that assigns channel credit without a session model.

    Scale: one grouped min-struct per user to find the conversion, one
    user-keyed join to restrict to priors, one grouped min/max-struct
    for the touches — three user-partitioned shuffles, no windows over
    the full stream. Determinism: the unique arrival order
    (tus, event_id) is encoded as a fixed-width zero-padded string so
    ONE scalar carries the total order through min_by/max_by on both
    engines (DuckDB's arg_min keys must be scalar); purchase values
    DECIMAL-sum.
    """
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "value", F.unix_micros("ts").alias("tus")
    )
    e = e.withColumn(
        "akey",
        F.concat(
            F.lpad(F.col("tus").cast("string"), 20, "0"),
            F.lpad(F.col("event_id").cast("string"), 12, "0"),
        ),
    )
    key = F.col("akey")
    conv = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.min_by("value", key).alias("conv_value"),
            F.min(key).alias("conv_key"),
        )
    )
    priors = e.join(conv, "user_id").filter(key < F.col("conv_key"))
    touched = priors.groupBy("user_id").agg(
        F.min_by("event_type", key).alias("first_touch"),
        F.max_by("event_type", key).alias("last_touch"),
        F.min_by("conv_value", key).alias("conv_value"),
    )
    stacked = touched.select(
        F.lit("first").alias("attribution"),
        F.col("first_touch").alias("event_type"),
        "conv_value",
    ).unionAll(
        touched.select(
            F.lit("last").alias("attribution"),
            F.col("last_touch").alias("event_type"),
            "conv_value",
        )
    )
    return (
        stacked.groupBy("attribution", "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            dsum("conv_value").alias("attributed_value"),
        )
        .orderBy("attribution", "event_type")
    )
