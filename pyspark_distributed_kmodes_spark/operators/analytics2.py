"""Round-4 analytics extensions, second batch (f01-f12): drift and
distribution audits (PSI, Benford, higher moments, quantile
normalization), bigram language modeling, entity-resolution clusters
and harmonic centrality over bounded graphs, decayed activity scoring,
sliding distinct counts, stratified minimum sampling, Markov
transition matrices, and a timeout funnel.

Keys are f-prefixed: they sort AFTER the live 50-entry driver window
(b14 + d01-d16 + e01-e33) and before q01, so they are exactly the
round-5 rotation's window candidates — the same staging that z01-z33
(now e01-e33) used in round 3. All pass the identical local mirror
now. Engine style unchanged: pure JVM ops, pround floor-rounding,
DECIMAL-summed float aggregates, unique ORDER BY tie-breaks,
scalar-only output columns.
"""

from __future__ import annotations

from pyspark_distributed_kmodes_spark.functions.lineage import cut_lineage

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark_distributed_kmodes_spark.functions.deterministic import (
    pround,
    sql_pround,
)
from pyspark_distributed_kmodes_spark.operators.curation2 import _dterm, _sql_dterm
from pyspark_distributed_kmodes_spark.operators.curation3 import _hash_u, _sql_hash_u
from pyspark_distributed_kmodes_spark.registry import query
from pyspark_distributed_kmodes_spark.sources.tables import spread, table

_PSI_BASELINE = "src0"
_PSI_BINS = [i / 10.0 for i in range(1, 10)]  # baseline deciles -> 10 bins


@query(
    "qf01_psi_drift",
    oracle=f"""
WITH bounds AS (
  SELECT quantile_cont(n_chars, {_PSI_BINS}) AS bs
  FROM documents WHERE source = '{_PSI_BASELINE}'
), binned AS (
  SELECT d.source,
         CAST(1 + len(list_filter(b.bs, x -> x < d.n_chars)) AS INTEGER) AS bin
  FROM documents d CROSS JOIN bounds b
), per AS (
  SELECT source, bin, COUNT(*) AS cnt FROM binned GROUP BY source, bin
), grid AS (
  SELECT s.source, g.bin, COALESCE(p.cnt, 0) AS cnt, s.n_source
  FROM (SELECT source, COUNT(*) AS n_source FROM documents GROUP BY source) s
  CROSS JOIN (SELECT unnest(range(1, 11)) AS bin) g
  LEFT JOIN per p ON p.source = s.source AND p.bin = g.bin
), base AS (
  SELECT bin, (CAST(cnt AS DOUBLE) + 0.5) / (n_source + 5.0) AS p0 FROM grid
  WHERE source = '{_PSI_BASELINE}'
), terms AS (
  SELECT g.source,
         {_sql_dterm('((CAST(g.cnt AS DOUBLE) + 0.5) / (g.n_source + 5.0) - b.p0) '
                     '* ln(((CAST(g.cnt AS DOUBLE) + 0.5) / (g.n_source + 5.0)) / b.p0)')} AS t
  FROM grid g JOIN base b ON b.bin = g.bin
)
SELECT source, {sql_pround('CAST(SUM(t) AS DOUBLE)', 6)} AS psi
FROM terms GROUP BY source ORDER BY source
""",
    tags=("curation", "drift"),
)
def qf01_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of every source's document-length
    distribution against the {_PSI_BASELINE} baseline, over the
    baseline's own deciles — the standard drift tripwire (PSI < 0.1
    stable, > 0.25 action) a recurring crawl runs before a new
    snapshot joins the mixture; the binned, baseline-anchored
    complement of d10's KS statistic.

    Scale: bin bounds are a 1-row broadcast percentile; binning is a
    per-row array count; the (source x 10 bins) grid and everything
    after it is parameter-bounded. Determinism: Laplace-smoothed
    (+0.5) bin probabilities are single divisions of exact integers,
    ln on identical doubles, per-bin terms pround(9)-stabilized into
    a DECIMAL sum, pround(6) out.
    """
    d = table(spark, sf_dir, "documents")
    bounds = d.filter(F.col("source") == _PSI_BASELINE).agg(
        F.percentile("n_chars", F.array(*[F.lit(q) for q in _PSI_BINS])).alias("bs")
    )
    binned = d.crossJoin(F.broadcast(bounds)).select(
        "source",
        (1 + F.size(F.filter(F.col("bs"), lambda x: x < F.col("n_chars")))).cast("int").alias("bin"),
    )
    # bounded source x bin census: every document lands in exactly one
    # bin, so source totals re-aggregate it — no second scan (scan-lint)
    per = binned.groupBy("source", "bin").agg(
        F.count(F.lit(1)).alias("cnt")
    ).transform(cut_lineage)
    n_source = per.groupBy("source").agg(F.sum("cnt").alias("n_source"))
    grid = (
        n_source.crossJoin(F.broadcast(spark.range(1, 11).select(F.col("id").cast("int").alias("bin"))))
        .join(per, ["source", "bin"], "left")
        .select("source", "bin", F.coalesce("cnt", F.lit(0)).alias("cnt"), "n_source")
    )
    p = (F.col("cnt").cast("double") + 0.5) / (F.col("n_source") + 5.0)
    base = grid.filter(F.col("source") == _PSI_BASELINE).select("bin", p.alias("p0"))
    terms = grid.join(F.broadcast(base), "bin").select(
        "source", _dterm((p - F.col("p0")) * F.log(p / F.col("p0"))).alias("t")
    )
    return (
        terms.groupBy("source")
        .agg(pround(F.sum("t").cast("double"), 6).alias("psi"))
        .orderBy("source")
    )


@query(
    "qf02_bigram_lm_logprob",
    oracle="""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), uni AS (
  SELECT w, COUNT(*) AS c1 FROM words GROUP BY w
), v AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM uni
), doc_bigrams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(string_split(text, ' '))),
                i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS bg
  FROM documents
), db AS (
  SELECT doc_id, bg, COUNT(*) AS k FROM doc_bigrams GROUP BY doc_id, bg
), corpus AS (
  SELECT bg, SUM(k) AS c12 FROM db GROUP BY bg
)
SELECT d.doc_id,
       CAST(SUM(d.k) AS BIGINT) AS n_bigrams,
       (CAST(floor((CAST(SUM(CAST(round(ln((c.c12 + 1.0) / (u.c1 + v.v)), 6) AS DECIMAL(25,6)) * d.k) AS DOUBLE) / SUM(d.k)) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0) AS avg_logprob
FROM db d
JOIN corpus c ON c.bg = d.bg
JOIN uni u ON u.w = string_split(d.bg, ' ')[1]
CROSS JOIN v
GROUP BY d.doc_id
ORDER BY d.doc_id
""",
    tags=("training", "quality"),
    bench=True,
)
def qf02_bigram_lm_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model scoring with add-one smoothing: mean
    per-bigram log-probability ln((c(w1w2)+1)/(c(w1)+V)) of each
    document under the corpus bigram model — one order up from qb12's
    unigram proxy, and sensitive to scrambled word order that unigram
    scoring cannot see (the shuffled-text detector).

    Scale: qb12's collapse discipline — per-(doc, bigram) counts
    first, so the model join and the scoring aggregation run over
    distinct pairs (Heaps-sublinear), with each term multiplied back
    by its count (exact: decimal x integer). V and the model tables
    are vocabulary-bounded, join strategy AQE's call. Determinism:
    round(6) per term, DECIMAL sum, one division, pround(6).
    """
    # spread BEFORE the word/bigram explodes (r14): the sf-scale
    # documents table is one parquet split, so both explode+partial-agg
    # stages otherwise run single-core; no-op at real scale (guard).
    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    words = F.split("text", " ")
    uni = (
        d.select(F.explode(words).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    v = uni.agg(F.count(F.lit(1)).cast("double").alias("v"))
    db = (
        d.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(slice(split(text, ' '), 1, size(split(text, ' ')) - 1), "
                    "(x, i) -> concat(x, ' ', element_at(split(text, ' '), i + 2)))"
                )
            ).alias("bg"),
        )
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    # corpus bigram totals via a window over the SAME bg key — one
    # exchange of the (doc, bigram) table where the former
    # aggregate-and-rejoin paid the aggregation exchange AND re-shuffled
    # db into the join (round-13; result identical: c12 = Σk per bg)
    from pyspark.sql import Window

    ua = uni.select(F.col("w").alias("w1"), "c1")
    term = F.round(F.log((F.col("c12") + 1.0) / (F.col("c1") + F.col("v"))), 6).cast(
        "decimal(25,6)"
    )
    return (
        db.withColumn("c12", F.sum("k").over(Window.partitionBy("bg")))
        .withColumn("w1", F.split("bg", " ")[0])
        .join(ua, "w1")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.sum("k").cast("bigint").alias("n_bigrams"),
            pround(F.sum(term * F.col("k")).cast("double") / F.sum("k"), 6).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


_LINK_CTE = """
b AS (
  SELECT doc_id, lang, n_chars // 8 AS band, substr(text, 1, 48) AS head
  FROM documents
), e AS (
  SELECT a.doc_id AS a, c.doc_id AS b
  FROM b a JOIN b c ON a.lang = c.lang AND a.band = c.band AND a.doc_id < c.doc_id
  WHERE levenshtein(a.head, c.head) <= 14
), sym AS (
  SELECT a, b FROM e UNION SELECT b, a FROM e
)"""


@query(
    "qf03_linkage_clusters",
    oracle=f"""
WITH RECURSIVE {_LINK_CTE},
reach(v, r) AS (
  SELECT a, a FROM sym
  UNION
  SELECT sym.a, reach.r FROM sym JOIN reach ON sym.b = reach.v
), cc AS (
  SELECT v AS doc_id, MIN(r) AS cluster FROM reach GROUP BY v
), sized AS (
  SELECT cluster, COUNT(*) AS cluster_size FROM cc GROUP BY cluster
)
SELECT cc.doc_id, cc.cluster, CAST(s.cluster_size AS BIGINT) AS cluster_size
FROM cc JOIN sized s ON s.cluster = cc.cluster
ORDER BY cc.doc_id
""",
    tags=("dedup", "linkage", "graph"),
)
def qf03_linkage_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution: d04's pairwise links closed into clusters via
    connected components (min-reachable-id label), with cluster sizes
    — pairwise linkage says "these two match"; resolution needs the
    transitive entity, and a chain a-b-c must land in ONE cluster even
    though (a,c) never passed the edit-distance gate.

    Scale: the edge list is d04's blocked output (bounded by block
    design); components run through functions/graph.py — bounded
    driver union-find under the 4M-edge budget, pointer-doubling
    distributed loop above it (the qc03-verified path). Integer
    labels, unique order.
    """
    from pyspark_distributed_kmodes_spark.functions.graph import connected_components
    from pyspark_distributed_kmodes_spark.operators.analytics import linkage_pairs

    edges = linkage_pairs(table(spark, sf_dir, "documents")).select("doc_a", "doc_b")
    cc = connected_components(edges, src="doc_a", dst="doc_b")
    return (
        cc.select(
            F.col("vertex").alias("doc_id"),
            F.col("component").alias("cluster"),
        )
        .withColumn("cluster_size", F.count(F.lit(1)).over(Window.partitionBy("cluster")).cast("bigint"))
        .orderBy("doc_id")
    )


_HC_DEPTH = 6
# Per-root discovered-pair hard cap for f04's BFS: never binds on real
# dedup graphs (components ~ clique-sized, orders of magnitude smaller),
# but turns a pathological giant component into a truncated lower bound
# instead of quadratic (root, v) state.  Chosen >> any component the
# oracle gate sees so the sf0.001-0.1 hash match is exact.
_HC_PAIR_BUDGET = 100_000


def bfs_min_dists(
    und: DataFrame, max_depth: int = _HC_DEPTH, pair_budget: int | None = None
) -> DataFrame:
    """(root, v, d) minimum hop distances (1 <= d <= max_depth, root != v)
    for every ordered pair reachable over the symmetric adjacency list
    `und(node, nbr)` — multi-source BFS as a frontier loop: each round
    extends the CURRENT frontier one hop, anti-joins against already-
    discovered pairs (so the first discovery wins = minimum distance),
    and localCheckpoints to cut lineage. Exposed for property tests;
    f04 consumes it.

    `pair_budget` hard-caps the discovered-pair state PER ROOT: once a
    root holds `pair_budget` (root, v) pairs it stops expanding, and a
    round that would overflow the budget keeps only the first
    (budget - held) new pairs in deterministic (d, v) order. On a
    pathological giant component the state therefore degrades to a
    truncated-neighbourhood lower bound instead of growing
    quadratically; on normal dedup graphs (components bounded by
    clique size) the cap never binds and the output is exactly the
    uncapped BFS. None = unbounded (exact).
    """
    known = und.select(
        F.col("node").alias("root"), F.col("nbr").alias("v"), F.lit(1).alias("d")
    ).transform(cut_lineage)
    if pair_budget is not None:
        capw = Window.partitionBy("root").orderBy("v")
        known = (
            known.withColumn("_rn", F.row_number().over(capw))
            .filter(F.col("_rn") <= pair_budget)
            .drop("_rn")
            .transform(cut_lineage)
        )
    frontier = known
    for depth in range(2, max_depth + 1):
        if pair_budget is not None:
            held = known.groupBy("root").agg(F.count(F.lit(1)).alias("_held"))
            frontier = (
                frontier.join(held, "root")
                .filter(F.col("_held") < pair_budget)
                .drop("_held")
            )
        nxt = (
            frontier.join(und, frontier["v"] == und["node"])
            .select(frontier["root"], und["nbr"].alias("v"), F.lit(depth).alias("d"))
            .filter(F.col("root") != F.col("v"))
            .dropDuplicates(["root", "v"])
            .join(known.select("root", "v"), ["root", "v"], "left_anti")
        )
        if pair_budget is not None:
            capw = Window.partitionBy("root").orderBy("v")
            nxt = (
                nxt.join(held, "root", "left")
                .withColumn("_held", F.coalesce(F.col("_held"), F.lit(0)))
                .withColumn("_rn", F.row_number().over(capw))
                .filter(F.col("_rn") + F.col("_held") <= pair_budget)
                .drop("_rn", "_held")
            )
        nxt = nxt.transform(cut_lineage)
        known = known.unionAll(nxt).transform(cut_lineage)
        frontier = nxt
    return known

_EDGE_CTE_F = """
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


@query(
    "qf04_harmonic_centrality",
    oracle=f"""
WITH RECURSIVE {_EDGE_CTE_F},
walk(root, v, d) AS (
  SELECT node, nbr, 1 FROM und
  UNION
  SELECT w.root, u.nbr, w.d + 1
  FROM walk w JOIN und u ON u.node = w.v
  WHERE w.d < {_HC_DEPTH}
), dist AS (
  SELECT root, v, MIN(d) AS d FROM walk WHERE root <> v GROUP BY root, v
), terms AS (
  SELECT root, {_sql_dterm('1.0 / d')} AS t FROM dist
)
SELECT root AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_reached,
       {sql_pround('CAST(SUM(t) AS DOUBLE)', 6)} AS harmonic_centrality
FROM terms GROUP BY root ORDER BY doc_id
""",
    tags=("dedup", "graph"),
)
def qf04_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic centrality (sum of 1/distance to every node reachable
    within {_HC_DEPTH} hops) over the near-dup graph — unlike d01's
    PageRank it is distance-based, so it separates a node bridging two
    duplicate cliques (short paths into both) from a deep clique
    member, and it is well-defined on disconnected graphs where
    closeness centrality is not.

    Scale: multi-source BFS as frontier iteration — each round joins
    the CURRENT frontier (undiscovered (root, v) pairs only, via
    anti-join) against the bounded edge list, localCheckpoint per
    round; pair count is bounded by within-component reachability,
    which duplicate clustering keeps small by construction. The
    oracle's recursive walk dedups (root, v, d) triples, so both
    sides compute true minimum distances. Determinism: 1/d on small
    integers, pround(9)-stabilized DECIMAL sum, pround(6).
    """
    from pyspark_distributed_kmodes_spark.operators.text import ngram_jaccard_pairs

    d = table(spark, sf_dir, "documents")
    e = ngram_jaccard_pairs(d, threshold=0.2).select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    )
    und = (
        e.select(F.col("u").alias("node"), F.col("v").alias("nbr"))
        .unionAll(e.select(F.col("v").alias("node"), F.col("u").alias("nbr")))
        .transform(cut_lineage)
    )
    known = bfs_min_dists(und, _HC_DEPTH, pair_budget=_HC_PAIR_BUDGET)
    terms = known.select("root", _dterm(F.lit(1.0) / F.col("d")).alias("t"))
    return (
        terms.groupBy(F.col("root").alias("doc_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_reached"),
            pround(F.sum("t").cast("double"), 6).alias("harmonic_centrality"),
        )
        .orderBy("doc_id")
    )


_DECAY_DAYS = 30.0
_US_PER_DAY = 86_400_000_000.0


@query(
    "qf05_decayed_activity",
    oracle=f"""
WITH mx AS (
  SELECT MAX(epoch_us(ts)) AS mt FROM events
), terms AS (
  SELECT user_id,
         {_sql_dterm(f'value * exp(-((mx.mt - epoch_us(ts)) / {_US_PER_DAY}) / {_DECAY_DAYS})')} AS t
  FROM events CROSS JOIN mx
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {sql_pround('CAST(SUM(t) AS DOUBLE)', 6)} AS decayed_score
FROM terms GROUP BY user_id ORDER BY user_id
""",
    tags=("events", "scoring"),
)
def qf05_decayed_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed activity score per user (half-life
    ~{_DECAY_DAYS}*ln2 days, anchored at the newest event): recent
    engagement counts, ancient engagement fades — the standard
    recency-weighted LTV/engagement feature, computed as a single
    aggregate instead of a per-day state machine.

    Scale: one 1-row max broadcast + one user-keyed aggregation;
    decay needs no windows because exp(-(T-t)) factorizes per event.
    Determinism: age is exact integer microseconds divided once;
    exp on identical doubles is bit-identical; per-event terms
    pround(9)-stabilize into a DECIMAL sum, pround(6) out.
    """
    e = table(spark, sf_dir, "events")
    mx = e.agg(F.max(F.unix_micros("ts")).alias("mt"))
    age_days = (F.col("mt") - F.unix_micros("ts")) / _US_PER_DAY
    terms = e.crossJoin(F.broadcast(mx)).select(
        "user_id", _dterm(F.col("value") * F.exp(-age_days / _DECAY_DAYS)).alias("t")
    )
    return (
        terms.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            pround(F.sum("t").cast("double"), 6).alias("decayed_score"),
        )
        .orderBy("user_id")
    )


@query(
    "qf06_quantile_normalize",
    oracle="""
WITH ranked AS (
  SELECT doc_id, source, n_chars,
         CAST(row_number() OVER (PARTITION BY source ORDER BY n_chars ASC, doc_id ASC) AS BIGINT) AS rk
  FROM documents
), ref AS (
  SELECT rk,
         (CAST(floor((CAST(SUM(CAST(n_chars AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*)) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0) AS ref_value
  FROM ranked GROUP BY rk
)
SELECT r.doc_id, r.source, r.rk, CAST(r.n_chars AS BIGINT) AS n_chars, f.ref_value AS qnorm
FROM ranked r JOIN ref f ON f.rk = r.rk
ORDER BY r.doc_id
""",
    tags=("curation", "statistics"),
)
def qf06_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization across sources (the microarray/batch-
    effect classic): rank documents within each source, replace each
    value with the cross-source MEAN at its rank — afterwards every
    source has an identical length distribution, so downstream
    length-sensitive scoring can't favor one crawl's formatting over
    another's. Ragged sources are handled the standard way (the mean
    runs over however many sources reach that rank).

    Scale: one source-partitioned rank window, one rank-keyed
    aggregation (rank domain = max source size), one rank-keyed join
    back. Determinism: row_number with doc_id tie-break, DECIMAL-
    exact rank means over integers, pround(6) via the floor form.
    """
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.asc("n_chars"), F.asc("doc_id"))
    ranked = d.select(
        "doc_id", "source", "n_chars", F.row_number().over(w).cast("bigint").alias("rk")
    )
    ref = ranked.groupBy("rk").agg(
        pround(
            F.sum(F.col("n_chars").cast("decimal(25,6)")).cast("double") / F.count(F.lit(1)), 6
        ).alias("ref_value")
    )
    return (
        ranked.join(ref, "rk")
        .select(
            "doc_id",
            "source",
            "rk",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            F.col("ref_value").alias("qnorm"),
        )
        .orderBy("doc_id")
    )


@query(
    "qf07_benford_audit",
    oracle=f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
  FROM orders
), agg AS (
  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY digit
), tot AS (
  SELECT CAST(SUM(n) AS DOUBLE) AS t FROM agg
)
SELECT a.digit, a.n AS n_orders,
       {sql_pround('a.n / t.t', 6)} AS observed_p,
       {sql_pround('log10(1.0 + 1.0 / a.digit)', 6)} AS benford_p,
       {sql_pround('t.t * (a.n / t.t - log10(1.0 + 1.0 / a.digit)) * (a.n / t.t - log10(1.0 + 1.0 / a.digit)) / log10(1.0 + 1.0 / a.digit)', 6)} AS chi2_term
FROM agg a CROSS JOIN tot t
ORDER BY digit
""",
    tags=("quality", "audit"),
)
def qf07_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order totals: observed first-significant-
    digit frequencies vs the log10(1+1/d) expectation with per-digit
    chi-square contributions — the forensic fabricated-data tripwire
    (synthetic or capped amounts flunk digit 1's ~30.1% share).

    Determinism trap avoided: the first digit comes from the STRING
    of exact integer cents (floor(x*100+0.5)), never from
    floor(log10(x)) — log10(1000.0) can land below 3.0 in IEEE and
    shift the digit. Integer-to-string is identical on both engines.
    Scale: one map-side-combined 9-group aggregation; totals are a
    1-row broadcast.
    """
    o = table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("bigint")
    digits = o.select(F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit"))
    agg = digits.groupBy("digit").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = agg.agg(F.sum("n").cast("double").alias("t"))
    obs = F.col("n") / F.col("t")
    exp = F.log10(1.0 + 1.0 / F.col("digit"))
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.col("n").alias("n_orders"),
            pround(obs, 6).alias("observed_p"),
            pround(exp, 6).alias("benford_p"),
            pround(F.col("t") * (obs - exp) * (obs - exp) / exp, 6).alias("chi2_term"),
        )
        .orderBy("digit")
    )


_DAU_WIN = 7  # trailing days, inclusive


@query(
    "qf08_sliding_dau",
    oracle=f"""
WITH pairs AS (
  SELECT DISTINCT user_id, epoch_us(date_trunc('day', ts)) // {86_400_000_000} AS di
  FROM events
), bounds AS (
  SELECT MIN(di) AS lo, MAX(di) AS hi FROM pairs
), fanned AS (
  SELECT DISTINCT p.user_id, p.di + o.off AS wd
  FROM pairs p CROSS JOIN (SELECT unnest(range(0, {_DAU_WIN})) AS off) o
)
SELECT CAST(f.wd AS BIGINT) AS day_index,
       CAST(COUNT(*) AS BIGINT) AS dau{_DAU_WIN}
FROM fanned f CROSS JOIN bounds b
WHERE f.wd BETWEEN b.lo AND b.hi
GROUP BY f.wd
ORDER BY day_index
""",
    tags=("events", "analytics"),
)
def qf08_sliding_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{_DAU_WIN}-day sliding distinct active users per day (the WAU
    curve at daily resolution), via the fan-out-then-dedup identity:
    a user active on day d contributes to windows d..d+{_DAU_WIN}-1,
    so explode each DISTINCT (user, day) pair to its {_DAU_WIN}
    windows and count distinct pairs per window — an exact sliding
    COUNT DISTINCT with NO windows over the event stream and no
    per-day re-scan (e10's fixed-bucket DAU/WAU can't slide daily).

    Scale: the stream first collapses to distinct (user, day) pairs
    (one map-side-combined shuffle), the x{_DAU_WIN} fan-out runs on
    those bounded pairs, and the second dedup+count is again
    map-side combined. All-integer day indices.
    """
    e = table(spark, sf_dir, "events")
    di = (F.unix_micros(F.date_trunc("day", "ts")) / 86_400_000_000).cast("bigint")
    pairs = e.select("user_id", di.alias("di")).distinct()
    bounds = pairs.agg(F.min("di").alias("lo"), F.max("di").alias("hi"))
    offs = spark.range(0, _DAU_WIN).select(F.col("id").alias("off"))
    fanned = (
        pairs.crossJoin(F.broadcast(offs))
        .select("user_id", (F.col("di") + F.col("off")).alias("wd"))
        .distinct()
    )
    return (
        fanned.crossJoin(F.broadcast(bounds))
        .filter(F.col("wd").between(F.col("lo"), F.col("hi")))
        .groupBy("wd")
        .agg(F.count(F.lit(1)).cast("bigint").alias(f"dau{_DAU_WIN}"))
        .select(F.col("wd").cast("bigint").alias("day_index"), f"dau{_DAU_WIN}")
        .orderBy("day_index")
    )


_STRAT_K = 3  # guaranteed picks per language
_STRAT_N = 30  # total sample size


@query(
    "qf09_stratified_min_sample",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, lang, {_sql_hash_u('doc_id')} AS key FROM documents
), ranked AS (
  SELECT doc_id, lang, key,
         row_number() OVER (PARTITION BY lang ORDER BY key ASC, doc_id ASC) AS rk
  FROM keyed
), strata AS (
  SELECT doc_id, lang FROM ranked WHERE rk <= {_STRAT_K}
), quota AS (
  SELECT {_STRAT_N} - COUNT(*) AS q FROM strata
), topup AS (
  SELECT r.doc_id, r.lang
  FROM ranked r CROSS JOIN quota
  WHERE r.rk > {_STRAT_K}
  ORDER BY r.key ASC, r.doc_id ASC
  LIMIT (SELECT q FROM quota)
)
SELECT doc_id, lang, picked_via FROM (
  SELECT doc_id, lang, 'stratum' AS picked_via FROM strata
  UNION ALL
  SELECT doc_id, lang, 'topup' FROM topup
)
ORDER BY doc_id
""",
    tags=("curation", "sampling"),
)
def qf09_stratified_min_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified minimum-guarantee sampling: every language keeps its
    {_STRAT_K} smallest-hash-key docs (rare strata never vanish), then
    the remaining budget up to {_STRAT_N} total fills with the
    globally smallest keys — the evaluation-set construction rule
    "cover every stratum, spend the rest proportionally", fully
    reproducible (e01's md5-uniform keys, no RNG).

    Scale: the stratum pass is a per-language WindowGroupLimit (top-k
    per group, no global sort); the top-up is a TakeOrderedAndProject
    over the remainder — never a global row_number window. The quota
    is a 1-row scalar (bounded collect, house rule). Deterministic
    keys, unique (key, doc_id) order.
    """
    d = table(spark, sf_dir, "documents")
    keyed = d.select("doc_id", "lang", _hash_u(F.col("doc_id")).alias("key"))
    w = Window.partitionBy("lang").orderBy(F.asc("key"), F.asc("doc_id"))
    ranked = keyed.withColumn("rk", F.row_number().over(w))
    strata = ranked.filter(F.col("rk") <= _STRAT_K)
    n_strata = strata.count()  # bounded scalar: <= K x |langs|
    quota = max(_STRAT_N - n_strata, 0)
    topup = (
        ranked.filter(F.col("rk") > _STRAT_K)
        .orderBy(F.asc("key"), F.asc("doc_id"))
        .limit(quota)
    )
    return (
        strata.select("doc_id", "lang", F.lit("stratum").alias("picked_via"))
        .unionAll(topup.select("doc_id", "lang", F.lit("topup").alias("picked_via")))
        .orderBy("doc_id")
    )


@query(
    "qf10_higher_moments",
    oracle=f"""
WITH sums AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(n_chars AS DECIMAL(38,0))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(n_chars AS DECIMAL(38,0)) * n_chars) AS DOUBLE) AS s2,
         CAST(SUM(CAST(n_chars AS DECIMAL(38,0)) * n_chars * n_chars) AS DOUBLE) AS s3,
         CAST(SUM(CAST(n_chars AS DECIMAL(38,0)) * n_chars * n_chars * n_chars) AS DOUBLE) AS s4
  FROM documents GROUP BY source
), mom AS (
  SELECT source, n,
         s1 / n AS mu,
         s2 / n - (s1 / n) * (s1 / n) AS m2,
         s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
         s4 / n - 4 * (s1 / n) * (s3 / n) + 6 * (s1 / n) * (s1 / n) * (s2 / n) - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
  FROM sums
)
SELECT source, n,
       {sql_pround('mu', 6)} AS mean_chars,
       {sql_pround('sqrt(m2)', 6)} AS stddev_pop,
       {sql_pround('m3 / (sqrt(m2) * sqrt(m2) * sqrt(m2))', 6)} AS skewness,
       {sql_pround('m4 / (m2 * m2) - 3.0', 6)} AS kurtosis_excess
FROM mom
ORDER BY source
""",
    tags=("analytics", "statistics"),
)
def qf10_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis of document length per
    source, from exact power sums — the distribution-SHAPE audit
    (heavy right tail? truncation spikes?) that q93's mean/stddev
    pass can't see, extended to 3rd/4th moments with the same
    exact-moments discipline (built-in skewness()/kurtosis() are
    order-dependent float accumulations, never oracle-safe).

    Scale: one grouped aggregation, map-side combined; power sums in
    DECIMAL(38,0) (n_chars^4 x n overflows BIGINT long before 100 TB).
    Determinism: the central-moment formulas are fixed IEEE chains on
    exact inputs, pround(6).
    """
    d = table(spark, sf_dir, "documents")
    x = F.col("n_chars")
    dec = F.col("n_chars").cast("decimal(38,0)")
    sums = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dec).cast("double").alias("s1"),
        F.sum(dec * x).cast("double").alias("s2"),
        F.sum(dec * x * x).cast("double").alias("s3"),
        F.sum(dec * x * x * x).cast("double").alias("s4"),
    )
    n = F.col("n")
    mu = F.col("s1") / n
    m2 = F.col("s2") / n - mu * mu
    m3 = F.col("s3") / n - 3 * mu * (F.col("s2") / n) + 2 * mu * mu * mu
    m4 = (
        F.col("s4") / n
        - 4 * mu * (F.col("s3") / n)
        + 6 * mu * mu * (F.col("s2") / n)
        - 3 * mu * mu * mu * mu
    )
    sd = F.sqrt(m2)
    return sums.select(
        "source",
        "n",
        pround(mu, 6).alias("mean_chars"),
        pround(sd, 6).alias("stddev_pop"),
        pround(m3 / (sd * sd * sd), 6).alias("skewness"),
        pround(m4 / (m2 * m2) - 3.0, 6).alias("kurtosis_excess"),
    ).orderBy("source")


@query(
    "qf11_priority_transitions",
    oracle=f"""
WITH seq AS (
  SELECT o_custkey, o_orderpriority,
         lag(o_orderpriority) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_priority
  FROM orders
), trans AS (
  SELECT prev_priority, o_orderpriority AS next_priority, COUNT(*) AS n
  FROM seq WHERE prev_priority IS NOT NULL
  GROUP BY 1, 2
), tot AS (
  SELECT prev_priority, SUM(n) AS t FROM trans GROUP BY prev_priority
)
SELECT tr.prev_priority, tr.next_priority,
       CAST(tr.n AS BIGINT) AS n_transitions,
       {sql_pround('CAST(tr.n AS DOUBLE) / tot.t', 6)} AS frac
FROM trans tr JOIN tot ON tot.prev_priority = tr.prev_priority
ORDER BY tr.prev_priority, tr.next_priority
""",
    tags=("analytics", "markov"),
)
def qf11_priority_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of order priority per
    customer: for consecutive orders (date, then key, per customer),
    how often does priority p follow priority q — the behavioral
    drift matrix ("urgent customers stay urgent?") that e12 computes
    for event types, here on the orders fact with row fractions.

    Scale: one customer-partitioned lag window, then a 25-cell
    aggregation; the row-total join is priority-bounded (5x5).
    Determinism: integer counts, one division, unique order.
    """
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    seq = o.select(
        "o_orderpriority", F.lag("o_orderpriority").over(w).alias("prev_priority")
    ).filter(F.col("prev_priority").isNotNull())
    trans = seq.groupBy("prev_priority", F.col("o_orderpriority").alias("next_priority")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = trans.groupBy("prev_priority").agg(F.sum("n").alias("t"))
    return (
        trans.join(tot, "prev_priority")
        .select(
            "prev_priority",
            "next_priority",
            F.col("n").cast("bigint").alias("n_transitions"),
            pround(F.col("n").cast("double") / F.col("t"), 6).alias("frac"),
        )
        .orderBy("prev_priority", "next_priority")
    )


_FUNNEL_TIMEOUT_US = 86_400_000_000  # each step must follow within 24h


@query(
    "qf12_timeout_funnel",
    oracle=f"""
WITH t1 AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t FROM events WHERE event_type = 'view' GROUP BY user_id
), t2 AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t
  FROM events e JOIN t1 ON t1.user_id = e.user_id
   AND epoch_us(e.ts) > t1.t AND epoch_us(e.ts) <= t1.t + {_FUNNEL_TIMEOUT_US}
  WHERE e.event_type = 'click' GROUP BY e.user_id
), t3 AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t
  FROM events e JOIN t2 ON t2.user_id = e.user_id
   AND epoch_us(e.ts) > t2.t AND epoch_us(e.ts) <= t2.t + {_FUNNEL_TIMEOUT_US}
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT CAST((SELECT COUNT(*) FROM t1) AS BIGINT) AS n_view,
       CAST((SELECT COUNT(*) FROM t2) AS BIGINT) AS n_click_24h,
       CAST((SELECT COUNT(*) FROM t3) AS BIGINT) AS n_purchase_24h,
       {sql_pround('CAST((SELECT COUNT(*) FROM t2) AS DOUBLE) / (SELECT COUNT(*) FROM t1)', 6)} AS click_rate,
       {sql_pround('CAST((SELECT COUNT(*) FROM t3) AS DOUBLE) / GREATEST((SELECT COUNT(*) FROM t2), 1)', 6)} AS purchase_rate
""",
    tags=("events", "funnel"),
)
def qf12_timeout_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timeout funnel: view -> click -> purchase where each step must
    land within 24h of the previous step's first completion —
    the attribution-window variant of e09's unbounded ordered funnel
    (a purchase a month after the click no longer counts), the form
    marketing actually reports.

    Scale: e09's earliest-completion chaining — each stage is one
    user-keyed aggregate joined to the previous stage's 1-column
    table; timeouts are integer-microsecond predicates in the join
    condition, no windows, no per-user event sorting. Determinism:
    exact integer counts and bounds, single divisions, pround(6).
    """
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("tus")
    )
    # each stage table is consumed twice (chain + count): materialize
    # so each pushed-filter events scan runs once per stage (scan-lint)
    t1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("tus").alias("t1"))
        .transform(cut_lineage)
    )
    t2 = (
        e.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter((F.col("tus") > F.col("t1")) & (F.col("tus") <= F.col("t1") + _FUNNEL_TIMEOUT_US))
        .groupBy("user_id")
        .agg(F.min("tus").alias("t2"))
        .transform(cut_lineage)
    )
    t3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter((F.col("tus") > F.col("t2")) & (F.col("tus") <= F.col("t2") + _FUNNEL_TIMEOUT_US))
        .groupBy("user_id")
        .agg(F.min("tus").alias("t3"))
    )
    c1 = t1.agg(F.count(F.lit(1)).cast("bigint").alias("n_view"))
    c2 = t2.agg(F.count(F.lit(1)).cast("bigint").alias("n_click_24h"))
    c3 = t3.agg(F.count(F.lit(1)).cast("bigint").alias("n_purchase_24h"))
    return (
        c1.crossJoin(F.broadcast(c2))
        .crossJoin(F.broadcast(c3))
        .select(
            "n_view",
            "n_click_24h",
            "n_purchase_24h",
            pround(F.col("n_click_24h").cast("double") / F.col("n_view"), 6).alias("click_rate"),
            pround(
                F.col("n_purchase_24h").cast("double")
                / F.greatest(F.col("n_click_24h"), F.lit(1)),
                6,
            ).alias("purchase_rate"),
        )
    )


_SEG_WORDS = 8  # fixed segment width, the "line" unit of line-level dedup


@query(
    "qf13_segment_dedup",
    oracle=f"""
WITH segs AS (
  SELECT doc_id,
         CAST((s - 1) // {_SEG_WORDS} AS INTEGER) AS seg_idx,
         md5(array_to_string(string_split(text, ' ')[s:s + {_SEG_WORDS - 1}], ' ')) AS seg_hash
  FROM documents,
       (SELECT unnest(range(1, (SELECT MAX(len(string_split(text, ' '))) FROM documents) + 1, {_SEG_WORDS})) AS s)
  WHERE s <= len(string_split(text, ' '))
), freq AS (
  SELECT seg_hash, COUNT(DISTINCT doc_id) AS df FROM segs GROUP BY seg_hash
)
SELECT s.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(CASE WHEN f.df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       {sql_pround('CAST(SUM(CASE WHEN f.df > 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)', 6)} AS shared_frac
FROM segs s JOIN freq f ON f.seg_hash = s.seg_hash
GROUP BY s.doc_id
ORDER BY s.doc_id
""",
    tags=("dedup", "text"),
)
def qf13_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level (CCNet/Gopher "line dedup" analog) duplication:
    cut every document into fixed {_SEG_WORDS}-word segments, hash
    them, and report per document how many of its segments appear in
    OTHER documents too — document-level dedup (q56/q63) misses
    boilerplate that contaminates otherwise-unique pages, which is
    exactly what segment-level fractions expose (and what CCNet
    removes line-by-line before anything else).

    Scale: segments explode once (non-overlapping, so output tokens =
    input tokens), hash to fixed 32-char keys, one distinct-doc count
    per hash (map-side combined), one join back on hash. The
    DISTINCT-doc document frequency makes a doc repeating its OWN
    segment not count as sharing. Integer counts, one division,
    pround(6).
    """
    d = table(spark, sf_dir, "documents")
    # split materialized once per row — captured in the transform lambda
    # it re-runs per segment start (r13 HOF-capture fix)
    words = F.col("_w")
    starts = F.sequence(F.lit(1), F.size(words), F.lit(_SEG_WORDS))
    segs = (
        d.withColumn("_w", F.split("text", " "))
        .select(
            "doc_id",
            F.posexplode(
                F.transform(starts, lambda s: F.slice(words, s, _SEG_WORDS))
            ).alias("seg_idx", "seg"),
        )
        .select("doc_id", F.md5(F.array_join("seg", " ")).alias("seg_hash"))
    )
    freq = segs.groupBy("seg_hash").agg(F.count_distinct("doc_id").alias("df"))
    shared = F.sum(F.when(F.col("df") > 1, 1).otherwise(0))
    return (
        segs.join(freq, "seg_hash")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_segments"),
            shared.cast("bigint").alias("n_shared"),
            pround(shared.cast("double") / F.count(F.lit(1)), 6).alias("shared_frac"),
        )
        .orderBy("doc_id")
    )


@query(
    "qf14_cumulative_unique_users",
    oracle=f"""
WITH first_seen AS (
  SELECT user_id, MIN(epoch_us(date_trunc('day', ts)) // {86_400_000_000}) AS d0
  FROM events GROUP BY user_id
), adds AS (
  SELECT d0 AS day_index, COUNT(*) AS n_new FROM first_seen GROUP BY d0
), days AS (
  SELECT DISTINCT epoch_us(date_trunc('day', ts)) // {86_400_000_000} AS day_index FROM events
)
SELECT CAST(d.day_index AS BIGINT) AS day_index,
       CAST(COALESCE(a.n_new, 0) AS BIGINT) AS n_new_users,
       CAST(SUM(COALESCE(a.n_new, 0)) OVER (ORDER BY d.day_index ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumulative_users
FROM days d LEFT JOIN adds a ON a.day_index = d.day_index
ORDER BY day_index
""",
    tags=("events", "analytics"),
)
def qf14_cumulative_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative unique users per active day (the user-acquisition
    curve) via the first-seen identity: a user contributes to every
    day >= their first event day, so cumulative distinct = running
    sum of per-day FIRST-SEEN counts — an exact growing-window COUNT
    DISTINCT with no growing state and no per-day re-scan (the
    growing-window complement of f08's sliding window).

    Scale: one user-keyed min, one per-day count, then a running sum
    over the DAY grid only (time-range-bounded). All-integer day
    indices.
    """
    e = table(spark, sf_dir, "events")
    di = (F.unix_micros(F.date_trunc("day", "ts")) / 86_400_000_000).cast("bigint")
    first_seen = e.select("user_id", di.alias("di")).groupBy("user_id").agg(
        F.min("di").alias("d0")
    )
    adds = first_seen.groupBy(F.col("d0").alias("day_index")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    days = e.select(di.alias("day_index")).distinct()
    w = Window.orderBy("day_index").rowsBetween(Window.unboundedPreceding, 0)
    joined = days.join(adds, "day_index", "left").select(
        "day_index", F.coalesce("n_new", F.lit(0)).alias("n_new")
    )
    return (
        joined.select(
            F.col("day_index").cast("bigint").alias("day_index"),
            F.col("n_new").cast("bigint").alias("n_new_users"),
            F.sum("n_new").over(w).cast("bigint").alias("cumulative_users"),
        )
        .orderBy("day_index")
    )


@query(
    "qf15_interarrival_percentiles",
    oracle=f"""
WITH seq AS (
  SELECT user_id, event_type, epoch_us(ts) AS tus,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC) AS prev_tus
  FROM events
), gaps AS (
  SELECT event_type, tus - prev_tus AS gap_us FROM seq WHERE prev_tus IS NOT NULL
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       {sql_pround('quantile_cont(gap_us, 0.50)', 6)} AS p50_us,
       {sql_pround('quantile_cont(gap_us, 0.90)', 6)} AS p90_us,
       {sql_pround('quantile_cont(gap_us, 0.99)', 6)} AS p99_us
FROM gaps GROUP BY event_type ORDER BY event_type
""",
    tags=("events", "statistics"),
)
def qf15_interarrival_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap percentiles per event type: the time since
    the SAME USER's previous event (any type), sliced by the type of
    the arriving event — the latency fingerprint behind session-gap
    tuning (d05/q32's pad is exactly a p-quantile of these gaps) and
    anomaly-rate baselines.

    Scale: one user-partitioned lag window, then a per-type percentile
    aggregate (map-side partials). Determinism: gaps are exact
    integer microseconds; both engines interpolate percentiles
    identically on integers (qc05/e29 precedent), pround(6).
    """
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc(F.unix_micros("ts")), F.asc("event_id"))
    seq = e.select(
        "event_type",
        F.unix_micros("ts").alias("tus"),
        F.lag(F.unix_micros("ts")).over(w).alias("prev_tus"),
    ).filter(F.col("prev_tus").isNotNull())
    gap = (F.col("tus") - F.col("prev_tus")).alias("gap_us")
    return (
        seq.select("event_type", gap)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
            pround(F.expr("percentile(gap_us, 0.50)"), 6).alias("p50_us"),
            pround(F.expr("percentile(gap_us, 0.90)"), 6).alias("p90_us"),
            pround(F.expr("percentile(gap_us, 0.99)"), 6).alias("p99_us"),
        )
        .orderBy("event_type")
    )


_LAT_BUCKETS_DAYS = [7, 30, 90]  # ship-latency bucket upper bounds


@query(
    "qf16_ship_latency_buckets",
    oracle=f"""
WITH lat AS (
  SELECT l.l_returnflag,
         (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)) // {86_400_000_000} AS lat_days
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
), bucketed AS (
  SELECT l_returnflag,
         CASE WHEN lat_days <= 7 THEN '0-7d'
              WHEN lat_days <= 30 THEN '8-30d'
              WHEN lat_days <= 90 THEN '31-90d'
              ELSE '90d+' END AS bucket
  FROM lat
), tot AS (
  SELECT l_returnflag, COUNT(*) AS t FROM bucketed GROUP BY l_returnflag
)
SELECT b.l_returnflag AS l_returnflag, b.bucket,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       {sql_pround('CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(t.t)', 6)} AS frac
FROM bucketed b JOIN tot t ON t.l_returnflag = b.l_returnflag
GROUP BY b.l_returnflag, b.bucket
ORDER BY b.l_returnflag, b.bucket
""",
    tags=("join", "analytics"),
)
def qf16_ship_latency_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency distribution: days between order date and
    each line's ship date, bucketed (0-7 / 8-30 / 31-90 / 90d+) per
    return flag with within-flag fractions — the fulfillment-SLA
    report, and the canonical fact-to-fact date-arithmetic join.

    Scale: one orderkey equi-join (co-partitioned fact-fact shuffle;
    AQE picks the strategy), integer-day bucketing in the projection,
    then a 12-cell aggregation with a flag-bounded totals join.
    Determinism: latency is exact integer days (floor division of
    integer microseconds), fixed bucket edges, one division,
    pround(6).
    """
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    # these date columns read as TIMESTAMP_NTZ — unix_micros needs TIMESTAMP
    lat_days = (
        (
            F.unix_micros(F.col("l_shipdate").cast("timestamp"))
            - F.unix_micros(F.col("o_orderdate").cast("timestamp"))
        )
        / 86_400_000_000
    ).cast("bigint")
    bucket = (
        F.when(lat_days <= 7, "0-7d")
        .when(lat_days <= 30, "8-30d")
        .when(lat_days <= 90, "31-90d")
        .otherwise("90d+")
    )
    b = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select("l_returnflag", bucket.alias("bucket"))
    )
    tot = b.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("t"))
    return (
        b.groupBy("l_returnflag", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_lines"))
        .join(tot, "l_returnflag")
        .select(
            "l_returnflag",
            "bucket",
            "n_lines",
            pround(F.col("n_lines").cast("double") / F.col("t"), 6).alias("frac"),
        )
        .orderBy("l_returnflag", "bucket")
    )
