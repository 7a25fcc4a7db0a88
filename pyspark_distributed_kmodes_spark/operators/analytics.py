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

from pyspark_distributed_kmodes_spark.functions.lineage import cut_lineage

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
    "qd01_neardup_pagerank",
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
def qd01_neardup_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
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

    from pyspark_distributed_kmodes_spark.functions.lineage import cut_lineage_lazy

    d = table(spark, sf_dir, "documents")
    edges = ngram_jaccard_pairs(d, threshold=0.2).select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    )
    # Every cut below is LAZY (r14): each still truncates the logical
    # plan (bounded depth at scale, unchanged shape), but the blocks pin
    # on first computation instead of via standalone checkpoint jobs —
    # the nn collect materializes und+deg, the final collect the rest.
    # Within that one final plan the three iterations reference the SAME
    # und_deg LogicalRDD, so its exchange canonicalizes equal and is
    # planned once (exchange reuse) where the eager per-checkpoint jobs
    # re-shuffled it per iteration.
    und = (
        edges.select(F.col("u").alias("node"), F.col("v").alias("nbr"))
        .unionAll(edges.select(F.col("v").alias("node"), F.col("u").alias("nbr")))
        .transform(cut_lineage_lazy)  # consumed once per iteration + deg
    )
    deg = und.groupBy("node").agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    deg = deg.transform(cut_lineage_lazy)
    # static (node, nbr, degree) adjacency attached ONCE — each power
    # iteration then pays a single rank join instead of rank + degree
    # joins (round-13: one exchange fewer per iteration)
    und_deg = und.join(deg, "node").transform(cut_lineage_lazy)
    # node count: ONE bounded 1-row read replaces a broadcast-exchange
    # crossJoin re-planned inside every power iteration (r13); the
    # divisions still run in the JVM on the same IEEE doubles
    nn = float(deg.agg(F.count(F.lit(1)).cast("double")).collect()[0][0])
    pr = deg.select("node", pround(F.lit(1.0) / F.lit(nn), 9).alias("pr"))
    for i in range(_PR_ITERS):
        contrib = und_deg.join(pr, "node").select(
            F.col("nbr"), _dterm(F.col("pr") / F.col("degree")).alias("t")
        )
        pr = contrib.groupBy(F.col("nbr").alias("node")).agg(
            F.sum("t").cast("double").alias("s")
        ).select(
            "node",
            pround(F.lit((1.0 - _PR_DAMP)) / F.lit(nn) + _PR_DAMP * F.col("s"), 9).alias("pr"),
        )
        # lineage here grows LINEARLY (the adjacency side is a static
        # checkpoint; pr appears once per iteration), so a lineage cut
        # every 3rd round bounds plan depth at scale (r13 cadence; r14
        # makes it lazy — the final collect materializes it)
        if i % 3 == 2 or i == _PR_ITERS - 1:
            pr = pr.transform(cut_lineage_lazy)
    return (
        pr.join(deg, "node")
        .select(F.col("node").alias("doc_id"), "degree", pround(F.col("pr"), 6).alias("pagerank"))
        .orderBy("doc_id")
    )


_DECILES = [i / 10.0 for i in range(1, 10)]


@query(
    "qd02_equidepth_bucket_join",
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
def qd02_equidepth_bucket_join(spark: SparkSession, sf_dir: str) -> DataFrame:
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


def watermark_admitted(
    df: DataFrame,
    order_col: str,
    tus_col: str,
    delay_us: int,
    block: int = _WM_BLOCK,
) -> DataFrame:
    """Rows admitted under the per-record watermark rule (event time >=
    running max over strictly earlier arrivals − delay), computed as a
    distributed two-level prefix scan over `block`-sized arrival
    ranges. Exposed (with the block size as a parameter) so property
    tests can force multi-block decompositions on tiny inputs; d03
    uses the default."""
    blk = F.floor(F.col(order_col) / block).alias("__blk")
    seq = df.withColumn("__blk", blk)
    w_intra = (
        Window.partitionBy("__blk").orderBy(order_col).rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = seq.withColumn("__intra", F.max(tus_col).over(w_intra))
    blk_max = seq.groupBy("__blk").agg(F.max(tus_col).alias("__bmax"))
    w_blocks = Window.orderBy("__blk").rowsBetween(Window.unboundedPreceding, -1)
    prefix = blk_max.select("__blk", F.max("__bmax").over(w_blocks).alias("__prefix"))
    joined = seq.join(prefix, "__blk")
    basis = F.greatest("__intra", "__prefix")  # greatest skips nulls
    return joined.filter(basis.isNull() | (F.col(tus_col) >= basis - F.lit(delay_us))).drop(
        "__blk", "__intra", "__prefix"
    )


@query(
    "qd03_watermark_batch_twin",
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
def qd03_watermark_batch_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of Structured Streaming's watermark DROP semantics:
    treating event_id as arrival order, an event is admitted iff its
    event time >= (max event time over all STRICTLY EARLIER arrivals)
    - 10 min — the PER-RECORD admission bound a withWatermark('ts',
    '10 minutes') stream enforces in row-keyed stateful operators
    (dropDuplicatesWithinWatermark, stream-stream join state) — then
    the surviving events roll into hourly per-type counts. Windowed
    AGGREGATIONS coarsen the same bound to window granularity (drop
    iff window END <= watermark) — tests/test_watermark_twin.py
    validates that rule against REAL per-micro-batch streaming
    execution, including the trap that a date_trunc grouping gets NO
    late filtering at all. Together with e29 (which measures
    disorder) this makes watermark tuning fully auditable offline:
    e29 picks the delay, d03 shows precisely which rows that delay
    would discard.

    Scale: the global running max is a distributed two-level prefix
    scan, NOT a single-partition window — per-block running maxima
    (window partitioned by arrival block, fully parallel) combine
    with an exclusive prefix over the tiny per-block-max table
    (#blocks = n/{_WM_BLOCK} rows), then join back on block id. The
    only serialized window runs over block maxima, never rows.
    Determinism: integer microseconds throughout.
    """
    e = table(spark, sf_dir, "events")
    seq = e.select("event_id", "ts", "event_type", F.unix_micros("ts").alias("tus"))
    kept = watermark_admitted(seq, "event_id", "tus", _WM_DELAY_US)
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


def linkage_pairs(d: DataFrame) -> DataFrame:
    """(doc_a, doc_b, edit_dist) candidate links: (lang, length-band)
    blocking + levenshtein gate on the {_LINK_HEAD}-char head. Shared
    by d04 (the pair report) and f03 (entity-resolution clusters)."""
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
    )


@query(
    "qd04_record_linkage",
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
def qd04_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    return linkage_pairs(table(spark, sf_dir, "documents")).orderBy("doc_a", "doc_b")


_SESS_PAD_US = 300_000_000  # each event covers [ts, ts + 5 min)


@query(
    "qd05_interval_coalesce",
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
def qd05_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
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


def pareto_frontier_2d(pts: DataFrame, x: str, y: str, bucket: int = _SKY_BUCKET) -> DataFrame:
    """Rows not strictly dominated on (x, y) (exists no row with x' > x
    AND y' > y), via the two-phase distributed skyline d06 describes.
    Bucket width is a parameter so property tests can force many-bucket
    decompositions on tiny inputs."""
    p = pts.withColumn("__bkt", F.floor(F.col(x) / bucket))
    bmax = p.groupBy("__bkt").agg(F.max(y).alias("__bmax"))
    w_suffix = Window.orderBy("__bkt").rowsBetween(1, Window.unboundedFollowing)
    bounds = bmax.select("__bkt", F.max("__bmax").over(w_suffix).alias("__suffix"))
    cand = p.join(bounds, "__bkt").filter(
        F.col("__suffix").isNull() | (F.col(y) >= F.col("__suffix"))
    )
    w_above = Window.orderBy(x).rangeBetween(1, Window.unboundedFollowing)
    swept = cand.withColumn("__above", F.max(y).over(w_above))
    return swept.filter(F.col("__above").isNull() | (F.col(y) >= F.col("__above"))).drop(
        "__bkt", "__suffix", "__above"
    )


@query(
    "qd06_pareto_frontier",
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
def qd06_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    return (
        pareto_frontier_2d(pts, "n_words", "n_distinct")
        .select("doc_id", "n_words", "n_distinct")
        .orderBy("doc_id")
    )


_PMI_MIN_COUNT = 5
_PMI_TOP = 20


@query(
    "qd07_bigram_pmi",
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
def qd07_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    # vocabulary-bounded unigram dictionary, three consumers:
    # materialize once (scan-lint)
    uni = (
        d.select(F.explode(words).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cw"))
        .transform(cut_lineage)
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
    # one grouped pass over the bigram explode; the total bigram mass
    # is the dictionary's exact sum, so no second scan (scan-lint)
    bi_all = bigrams.groupBy("bg").agg(
        F.count(F.lit(1)).alias("cab")
    ).transform(cut_lineage)
    m = bi_all.agg(F.sum("cab").cast("double").alias("m"))
    bi = bi_all.filter(F.col("cab") >= _PMI_MIN_COUNT)
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
    "qd08_touch_attribution",
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
def qd08_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
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


@query(
    "qd09_gini_concentration",
    oracle=f"""
WITH x AS (
  SELECT source, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
  FROM documents
), ranked AS (
  SELECT source, n_words,
         CAST(row_number() OVER (PARTITION BY source ORDER BY n_words ASC, doc_id ASC) AS BIGINT) AS i
  FROM x
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS total_tokens,
       {sql_pround('(2.0 * SUM(i * n_words) - (COUNT(*) + 1) * SUM(n_words)) / (COUNT(*) * SUM(n_words))', 6)} AS gini
FROM ranked
GROUP BY source
ORDER BY source
""",
    tags=("curation", "inequality"),
)
def qd09_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Gini coefficient of token mass across documents —
    the inequality audit a mixture planner reads before sampling:
    gini ~ 0 means tokens spread evenly over docs, gini -> 1 means a
    few giant documents carry the source (so doc-level sampling and
    token-level sampling diverge badly there).

    Scale: rank docs within source (source-partitioned window), then
    one grouped aggregation using the rank identity
    G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) — no pairwise
    |x_i - x_j| expansion. Determinism: all-integer sums (rank x
    integer token counts), one final division, pround(6); (n_words,
    doc_id) is a unique rank order.
    """
    d = table(spark, sf_dir, "documents")
    x = d.select(
        "source", "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_words")
    )
    w = Window.partitionBy("source").orderBy(F.asc("n_words"), F.asc("doc_id"))
    ranked = x.withColumn("i", F.row_number().over(w).cast("bigint"))
    n = F.count(F.lit(1))
    sx = F.sum("n_words")
    six = F.sum(F.col("i") * F.col("n_words"))
    return (
        ranked.groupBy("source")
        .agg(
            n.cast("bigint").alias("n_docs"),
            sx.cast("bigint").alias("total_tokens"),
            pround((2.0 * six - (n + 1) * sx) / (n * sx), 6).alias("gini"),
        )
        .orderBy("source")
    )


_KS_SRC_A = "src0"
_KS_SRC_B = "src1"


@query(
    "qd10_ks_two_sample",
    oracle=f"""
WITH counts AS (
  SELECT n_chars AS v,
         SUM(CASE WHEN source = '{_KS_SRC_A}' THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN source = '{_KS_SRC_B}' THEN 1 ELSE 0 END) AS cb
  FROM documents WHERE source IN ('{_KS_SRC_A}', '{_KS_SRC_B}')
  GROUP BY n_chars
), cum AS (
  SELECT v,
         SUM(ca) OVER (ORDER BY v ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
         SUM(cb) OVER (ORDER BY v ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb
  FROM counts
), tot AS (
  SELECT MAX(cuma) AS na, MAX(cumb) AS nb FROM cum
), diffs AS (
  SELECT c.v, abs(c.cuma * t.nb - c.cumb * t.na) AS d_int, t.na, t.nb
  FROM cum c CROSS JOIN tot t
), top AS (
  SELECT MAX(d_int) AS dmax FROM diffs
)
SELECT CAST(d.na AS BIGINT) AS n_a, CAST(d.nb AS BIGINT) AS n_b,
       {sql_pround('CAST(t.dmax AS DOUBLE) / (d.na * d.nb)', 6)} AS ks_stat,
       CAST(MIN(CASE WHEN d.d_int = t.dmax THEN d.v END) AS BIGINT) AS ks_at_value
FROM diffs d CROSS JOIN top t
GROUP BY d.na, d.nb, t.dmax
""",
    tags=("analytics", "statistics"),
)
def qd10_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between the document-
    length distributions of two sources — the distribution-drift gate
    a curation pipeline runs when a source's new crawl should "look
    like" its last one (KS is the max ECDF gap, attained at a data
    point, so the grid of distinct values suffices).

    Scale: lengths collapse to per-distinct-value counts FIRST (one
    shuffle, map-side combined), so the running-sum window iterates
    the value DOMAIN (hundreds of distinct lengths), not the corpus —
    that window is the only serialized step and is domain-bounded.
    Determinism: the ECDF gap is compared as the exact INTEGER
    |cuma*nb - cumb*na| (no float ECDFs), divided once at the end,
    pround(6); ties in the argmax resolve to the smallest value.
    """
    d = table(spark, sf_dir, "documents")
    counts = (
        d.filter(F.col("source").isin(_KS_SRC_A, _KS_SRC_B))
        .groupBy(F.col("n_chars").alias("v"))
        .agg(
            F.sum(F.when(F.col("source") == _KS_SRC_A, 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("source") == _KS_SRC_B, 1).otherwise(0)).alias("cb"),
        )
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select(
        "v", F.sum("ca").over(w).alias("cuma"), F.sum("cb").over(w).alias("cumb")
    )
    tot = cum.agg(F.max("cuma").alias("na"), F.max("cumb").alias("nb"))
    diffs = cum.crossJoin(F.broadcast(tot)).select(
        "v",
        F.abs(F.col("cuma") * F.col("nb") - F.col("cumb") * F.col("na")).alias("d_int"),
        "na",
        "nb",
    )
    top = diffs.agg(F.max("d_int").alias("dmax"))
    return (
        diffs.crossJoin(F.broadcast(top))
        .groupBy("na", "nb", "dmax")
        .agg(
            F.min(F.when(F.col("d_int") == F.col("dmax"), F.col("v"))).cast("bigint").alias("ks_at_value")
        )
        .select(
            F.col("na").cast("bigint").alias("n_a"),
            F.col("nb").cast("bigint").alias("n_b"),
            pround(F.col("dmax").cast("double") / (F.col("na") * F.col("nb")), 6).alias("ks_stat"),
            "ks_at_value",
        )
    )


@query(
    "qd11_weighted_median",
    oracle="""
WITH vw AS (
  SELECT source, n_chars AS v, SUM(len(string_split(text, ' '))) AS w
  FROM documents GROUP BY source, n_chars
), cum AS (
  SELECT source, v, w,
         SUM(w) OVER (PARTITION BY source ORDER BY v ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         SUM(w) OVER (PARTITION BY source) AS total
  FROM vw
)
SELECT source,
       CAST(total AS BIGINT) AS total_weight,
       CAST(MIN(CASE WHEN 2 * cw >= total THEN v END) AS BIGINT) AS weighted_median
FROM cum
GROUP BY source, total
ORDER BY source
""",
    tags=("analytics", "statistics"),
)
def qd11_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-weighted median document length per source: the smallest
    length v whose cumulative token weight reaches half the source's
    total — "the length of the document holding the middle TOKEN",
    which is what sequence-packing efficiency actually depends on
    (the unweighted median ignores that long docs carry most tokens).

    Scale: collapse to per-(source, distinct length) weights first
    (one map-side-combined shuffle), so the cumulative window walks
    the per-source value domain, not the corpus; the lower-median
    pick is a conditional MIN in the same grouped pass. All-integer
    arithmetic (2*cw >= total avoids division entirely).
    """
    d = table(spark, sf_dir, "documents")
    vw = d.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.sum(F.size(F.split("text", " "))).alias("w")
    )
    w_cum = Window.partitionBy("source").orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy("source")
    cum = vw.select(
        "source",
        "v",
        F.sum("w").over(w_cum).alias("cw"),
        F.sum("w").over(w_all).alias("total"),
    )
    return (
        cum.groupBy("source", "total")
        .agg(
            F.min(F.when(2 * F.col("cw") >= F.col("total"), F.col("v")))
            .cast("bigint")
            .alias("weighted_median")
        )
        .select(
            "source", F.col("total").cast("bigint").alias("total_weight"), "weighted_median"
        )
        .orderBy("source")
    )


@query(
    "qd12_gapfill_interpolate",
    oracle=f"""
WITH hourly AS (
  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
         CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS revenue
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1
), bounds AS (
  SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hourly
), grid AS (
  SELECT unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS h FROM bounds b
), joined AS (
  SELECT g.h, hr.revenue,
         epoch_us(g.h) // 3600000000 AS idx
  FROM grid g LEFT JOIN hourly hr ON hr.h = g.h
), ctx AS (
  SELECT h, revenue, idx,
         last_value(CASE WHEN revenue IS NOT NULL THEN idx END IGNORE NULLS)
           OVER (ORDER BY idx ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_idx,
         last_value(revenue IGNORE NULLS)
           OVER (ORDER BY idx ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_rev,
         first_value(CASE WHEN revenue IS NOT NULL THEN idx END IGNORE NULLS)
           OVER (ORDER BY idx ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_idx,
         first_value(revenue IGNORE NULLS)
           OVER (ORDER BY idx ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_rev
  FROM joined
)
SELECT h AS hour_start,
       CAST(revenue IS NULL AS INTEGER) AS was_missing,
       {sql_pround('''CASE
         WHEN revenue IS NOT NULL THEN revenue
         WHEN prev_rev IS NULL THEN next_rev
         WHEN next_rev IS NULL THEN prev_rev
         WHEN next_idx = prev_idx THEN prev_rev
         ELSE prev_rev + (next_rev - prev_rev) * (CAST(idx - prev_idx AS DOUBLE) / (next_idx - prev_idx))
       END''', 4)} AS revenue_filled
FROM ctx
ORDER BY hour_start
""",
    tags=("events", "timeseries"),
)
def qd12_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling with linear interpolation: hourly
    purchase revenue joined onto the dense hour grid between the first
    and last observation; missing hours interpolate linearly between
    the nearest observed neighbors (nearest-value at the edges) — the
    densification step before any rolling-window model sees the
    series, extending q47's series JOIN with actual value repair.

    Scale: the raw stream collapses to per-hour aggregates first (one
    map-side-combined shuffle); every window after that walks the
    HOUR GRID (time-range-bounded, thousands of rows), never events.
    Determinism: hour aggregates DECIMAL-sum; interpolation is one
    fixed IEEE expression on exact inputs with integer hour indices;
    pround(4).
    """
    e = table(spark, sf_dir, "events")
    hourly = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(dsum("value").alias("revenue"))
    )
    bounds = hourly.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = bounds.select(
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    joined = grid.join(hourly, "h", "left").select(
        "h", "revenue", (F.unix_micros("h") / 3_600_000_000).cast("bigint").alias("idx")
    )
    w_back = Window.orderBy("idx").rowsBetween(Window.unboundedPreceding, 0)
    w_fwd = Window.orderBy("idx").rowsBetween(0, Window.unboundedFollowing)
    obs_idx = F.when(F.col("revenue").isNotNull(), F.col("idx"))
    ctx = joined.select(
        "h",
        "revenue",
        "idx",
        F.last(obs_idx, ignorenulls=True).over(w_back).alias("prev_idx"),
        F.last("revenue", ignorenulls=True).over(w_back).alias("prev_rev"),
        F.first(obs_idx, ignorenulls=True).over(w_fwd).alias("next_idx"),
        F.first("revenue", ignorenulls=True).over(w_fwd).alias("next_rev"),
    )
    filled = (
        F.when(F.col("revenue").isNotNull(), F.col("revenue"))
        .when(F.col("prev_rev").isNull(), F.col("next_rev"))
        .when(F.col("next_rev").isNull(), F.col("prev_rev"))
        .when(F.col("next_idx") == F.col("prev_idx"), F.col("prev_rev"))
        .otherwise(
            F.col("prev_rev")
            + (F.col("next_rev") - F.col("prev_rev"))
            * ((F.col("idx") - F.col("prev_idx")).cast("double") / (F.col("next_idx") - F.col("prev_idx")))
        )
    )
    return ctx.select(
        F.col("h").alias("hour_start"),
        F.col("revenue").isNull().cast("int").alias("was_missing"),
        pround(filled, 4).alias("revenue_filled"),
    ).orderBy("hour_start")


@query(
    "qd13_spearman_rank",
    oracle=f"""
WITH pts AS (
  SELECT source, doc_id,
         CAST(n_chars AS BIGINT) AS x,
         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS y
  FROM documents
), rx AS (
  SELECT source, doc_id, x, y,
         2 * rank() OVER (PARTITION BY source ORDER BY x ASC)
           + count(*) OVER (PARTITION BY source, x) - 1 AS rx2,
         2 * rank() OVER (PARTITION BY source ORDER BY y ASC)
           + count(*) OVER (PARTITION BY source, y) - 1 AS ry2
  FROM pts
), sums AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(rx2) AS sx, SUM(ry2) AS sy,
         SUM(rx2 * rx2) AS sxx, SUM(ry2 * ry2) AS syy, SUM(rx2 * ry2) AS sxy
  FROM rx GROUP BY source
)
SELECT source, n,
       {sql_pround('''(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))''', 6)} AS spearman_rho
FROM sums
ORDER BY source
""",
    tags=("analytics", "statistics"),
)
def qd13_spearman_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation per source between document length
    and vocabulary size — the robust (monotone, outlier-immune)
    association check behind "does longer mean richer in this
    source?", where Pearson on raw values would be dragged by the
    length tail.

    Determinism is the whole design: built-in corr() accumulates
    float sums in partition order (non-reproducible), so this
    computes Pearson-on-average-ranks from INTEGER sums — average
    tie rank enters doubled (2r+c-1, an exact integer via rank() +
    per-value counts), all five moment sums are exact, and the rho
    formula is one fixed IEEE expression, pround(6). Scale: two
    source-partitioned rank windows + one grouped aggregation.
    """
    d = table(spark, sf_dir, "documents")
    pts = d.select(
        "source",
        "doc_id",
        F.col("n_chars").cast("bigint").alias("x"),
        F.size(F.array_distinct(F.split("text", " "))).cast("bigint").alias("y"),
    )
    wx = Window.partitionBy("source").orderBy(F.asc("x"))
    wy = Window.partitionBy("source").orderBy(F.asc("y"))
    cx = Window.partitionBy("source", "x")
    cy = Window.partitionBy("source", "y")
    rx = pts.select(
        "source",
        (2 * F.rank().over(wx) + F.count(F.lit(1)).over(cx) - 1).cast("bigint").alias("rx2"),
        (2 * F.rank().over(wy) + F.count(F.lit(1)).over(cy) - 1).cast("bigint").alias("ry2"),
    )
    n = F.count(F.lit(1)).cast("bigint")
    sums = rx.groupBy("source").agg(
        n.alias("n"),
        F.sum("rx2").alias("sx"),
        F.sum("ry2").alias("sy"),
        F.sum(F.col("rx2") * F.col("rx2")).alias("sxx"),
        F.sum(F.col("ry2") * F.col("ry2")).alias("syy"),
        F.sum(F.col("rx2") * F.col("ry2")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    rho = (nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) / F.sqrt(
        (nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        * (nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
    )
    return sums.select("source", "n", pround(rho, 6).alias("spearman_rho")).orderBy("source")


_ANOM_WIN = 7  # trailing days in the baseline frame
_ANOM_Z = 2.0


@query(
    "qd14_rolling_anomaly",
    oracle=f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
         SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS cents
  FROM orders GROUP BY 1
), framed AS (
  SELECT day, cents,
         COUNT(*) OVER w AS n_prev,
         SUM(cents) OVER w AS s1,
         SUM(CAST(cents AS DECIMAL(38,0)) * cents) OVER w AS s2
  FROM daily
  WINDOW w AS (ORDER BY day ASC ROWS BETWEEN {_ANOM_WIN} PRECEDING AND 1 PRECEDING)
), scored AS (
  SELECT day, cents, n_prev,
         (CAST(s1 AS DOUBLE) / n_prev) AS mu,
         (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_prev) / (n_prev - 1) AS var
  FROM framed WHERE n_prev = {_ANOM_WIN}
)
SELECT day, CAST(cents AS BIGINT) AS revenue_cents,
       {sql_pround('(cents - mu) / sqrt(var)', 6)} AS zscore,
       CAST(abs(cents - mu) > {_ANOM_Z} * sqrt(var) AS INTEGER) AS is_anomaly
FROM scored
ORDER BY day
""",
    tags=("analytics", "anomaly"),
)
def qd14_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection on daily order revenue: each
    day scores against the mean/stddev of the trailing {_ANOM_WIN}
    FULLY-OBSERVED days (current day excluded, so an anomaly never
    suppresses its own detection) and flags |z| > {_ANOM_Z} — the
    data-quality tripwire a daily ingest pipeline runs before
    publishing a partition.

    Scale: revenue pre-aggregates per day (map-side combined), so the
    rolling window walks the DAY grid (time-range-bounded), never
    orders. Determinism: revenue is exact integer cents; frame sums
    are exact (sum-of-squares in DECIMAL(38,0) — cents^2 x 7 days
    would overflow BIGINT well below 100 TB); mean/variance/sqrt are
    one fixed IEEE expression on exact inputs, pround(6).
    """
    o = table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("bigint")
    daily = o.groupBy(F.date_trunc("day", "o_orderdate").alias("day")).agg(
        F.sum(cents).alias("cents")
    )
    w = Window.orderBy("day").rowsBetween(-_ANOM_WIN, -1)
    framed = daily.select(
        "day",
        "cents",
        F.count(F.lit(1)).over(w).alias("n_prev"),
        F.sum("cents").over(w).alias("s1"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).over(w).alias("s2"),
    ).filter(F.col("n_prev") == _ANOM_WIN)
    mu = F.col("s1").cast("double") / F.col("n_prev")
    var = (F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1") / F.col("n_prev")) / (
        F.col("n_prev") - 1
    )
    scored = framed.select(
        "day",
        F.col("cents").cast("bigint").alias("revenue_cents"),
        pround((F.col("cents") - mu) / F.sqrt(var), 6).alias("zscore"),
        (F.abs(F.col("cents") - mu) > _ANOM_Z * F.sqrt(var)).cast("int").alias("is_anomaly"),
    )
    return scored.orderBy("day")


_WILSON_Z = 1.96


@query(
    "qd15_duprate_wilson",
    oracle=f"""
WITH hashes AS (
  SELECT source, md5(text) AS h FROM documents
), global_counts AS (
  SELECT h, COUNT(*) AS c FROM hashes GROUP BY h
), flagged AS (
  SELECT hs.source, CAST(gc.c > 1 AS INTEGER) AS is_dup
  FROM hashes hs JOIN global_counts gc ON gc.h = hs.h
), agg AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(is_dup) AS BIGINT) AS n_dup
  FROM flagged GROUP BY source
)
SELECT source, n_docs, n_dup,
       {sql_pround('CAST(n_dup AS DOUBLE) / n_docs', 6)} AS dup_rate,
       {sql_pround(f'''((CAST(n_dup AS DOUBLE) / n_docs + {_WILSON_Z}*{_WILSON_Z} / (2.0 * n_docs))
          - {_WILSON_Z} * sqrt((CAST(n_dup AS DOUBLE) / n_docs) * (1.0 - CAST(n_dup AS DOUBLE) / n_docs) / n_docs
                   + {_WILSON_Z}*{_WILSON_Z} / (4.0 * n_docs * n_docs)))
         / (1.0 + {_WILSON_Z}*{_WILSON_Z} / n_docs)''', 6)} AS wilson_lo,
       {sql_pround(f'''((CAST(n_dup AS DOUBLE) / n_docs + {_WILSON_Z}*{_WILSON_Z} / (2.0 * n_docs))
          + {_WILSON_Z} * sqrt((CAST(n_dup AS DOUBLE) / n_docs) * (1.0 - CAST(n_dup AS DOUBLE) / n_docs) / n_docs
                   + {_WILSON_Z}*{_WILSON_Z} / (4.0 * n_docs * n_docs)))
         / (1.0 + {_WILSON_Z}*{_WILSON_Z} / n_docs)''', 6)} AS wilson_hi
FROM agg
ORDER BY source
""",
    tags=("dedup", "statistics"),
)
def qd15_duprate_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication rate with a Wilson 95% confidence
    interval: the fraction of a source's docs whose exact content hash
    appears more than once ANYWHERE in the corpus, plus the interval
    that says whether "source A is dirtier than source B" is signal or
    small-sample noise — the statistically honest version of qb32's
    point estimates, and the right scale for deciding which source
    earns a full near-dup pass.

    Scale: hash -> global count (one shuffle, map-side combined) ->
    join back on hash (co-partitioned) -> per-source aggregate.
    Determinism: counts are exact integers; the Wilson score is one
    fixed IEEE expression per row, pround(6).
    """
    d = table(spark, sf_dir, "documents")
    hashes = d.select("source", F.md5("text").alias("h"))
    gc = hashes.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    agg = (
        hashes.join(gc, "h")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum((F.col("c") > 1).cast("int")).cast("bigint").alias("n_dup"),
        )
    )
    nd = F.col("n_docs").cast("double")
    p = F.col("n_dup").cast("double") / nd
    z2 = _WILSON_Z * _WILSON_Z
    center = p + z2 / (2.0 * nd)
    half = _WILSON_Z * F.sqrt(p * (1.0 - p) / nd + z2 / (4.0 * nd * nd))
    denom = 1.0 + z2 / nd
    return agg.select(
        "source",
        "n_docs",
        "n_dup",
        pround(p, 6).alias("dup_rate"),
        pround((center - half) / denom, 6).alias("wilson_lo"),
        pround((center + half) / denom, 6).alias("wilson_hi"),
    ).orderBy("source")


_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]


@query(
    "qd16_column_profile",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{c}' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
FROM orders"""
        for c in _PROFILE_COLS
    )
    + "\nORDER BY col_name",
    tags=("profiling", "quality"),
)
def qd16_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling: per-column row/null/exact-distinct counts over
    the orders table — the schema-discovery pass (DESCRIBE-with-stats)
    every ingestion pipeline runs on an unfamiliar drop before writing
    constraints (e14's input comes from exactly this kind of scan).

    Scale: ONE scan computes all per-column aggregates (count +
    count-distinct per column in a single Aggregate; Spark plans
    multi-distinct via a single expand, not N scans), then a stack()
    unpivots the 1-row result — versus the oracle's N-scan UNION ALL.
    Exact integers only.
    """
    o = table(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).cast("bigint").alias(f"{c}__rows"),
            (F.count(F.lit(1)) - F.count(c)).cast("bigint").alias(f"{c}__null"),
            F.countDistinct(c).cast("bigint").alias(f"{c}__distinct"),
        ]
    one = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__rows, {c}__null, {c}__distinct" for c in _PROFILE_COLS
    )
    return one.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) AS (col_name, n_rows, n_null, n_distinct)"
        )
    ).orderBy("col_name")
