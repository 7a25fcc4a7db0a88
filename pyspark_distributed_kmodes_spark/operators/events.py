"""Streaming-shaped operators over the `events` table, batch-emulated.

Each query here has a true Structured Streaming twin in
`pyspark_distributed_kmodes_spark/streaming/jobs.py` (readStream +
watermark); the batch forms below are what the DuckDB oracle can check
(SURVEY.md §1.2 — the oracle is batch-only).
"""

from __future__ import annotations

from pyspark_distributed_kmodes_spark.functions.lineage import cut_lineage

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_distributed_kmodes_spark.functions.deterministic import dsum, pround, sql_dsum, sql_pround
from pyspark_distributed_kmodes_spark.registry import query
from pyspark_distributed_kmodes_spark.sources.tables import table


@query(
    "q30_tumbling_window",
    oracle=f"""
SELECT date_trunc('hour', ts) AS window_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
       event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS total_value
FROM events
GROUP BY 1, 2, 3
ORDER BY window_start, event_type
""",
    tags=("events", "window-agg"),
    bench=True,
)
def q30_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation by event type.

    Scale: window() is just a computed grouping key — one shuffle with
    map-side partial aggregation; in streaming mode the same expression
    runs incrementally with a watermark (see streaming/jobs.py).
    """
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


@query(
    "q31_sliding_window",
    oracle=f"""
WITH slid AS (
  SELECT time_bucket(INTERVAL 15 MINUTES, ts) - k * INTERVAL 15 MINUTES AS window_start,
         value
  FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) AS offsets(k)
)
SELECT window_start,
       window_start + INTERVAL 1 HOUR AS window_end,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS total_value
FROM slid
GROUP BY 1, 2
ORDER BY window_start
""",
    tags=("events", "window-agg"),
)
def q31_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 1-hour windows every 15 minutes (each event lands
    in 4 windows). Spark's window() expands the overlap natively; the
    oracle mirrors it with an explicit 4-way offset cross join."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "total_value",
        )
        .orderBy("window_start")
    )


@query(
    "q32_session_window",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTES OR
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
), sess AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTES AS session_end,
       COUNT(*) AS n_events
FROM sess
GROUP BY user_id, session_id
ORDER BY user_id, session_start
""",
    tags=("events", "window-agg"),
    bench=True,
)
def q32_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute inactivity gap) per user.

    Spark: native F.session_window (works in batch groupBy; in streaming
    it becomes stateful session aggregation). Oracle: classic
    gaps-and-islands. session_window.end = last_event + gap by
    definition — mirrored as MAX(ts) + 30 min.
    """
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "q33_asof_join",
    oracle="""
SELECT event_id, user_id, ts, last_orderkey, last_totalprice
FROM (
  SELECT e.event_id, e.user_id, e.ts,
         o.o_orderkey AS last_orderkey, o.o_totalprice AS last_totalprice,
         ROW_NUMBER() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC NULLS LAST,
                                     o.o_orderkey DESC NULLS LAST) AS rn
  FROM events e
  LEFT JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
) t
WHERE rn = 1
ORDER BY event_id
""",
    tags=("events", "join"),
)
def q33_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each event, the latest order of that customer at
    or before the event time.

    Spark lacks a native as-of join; this is the scalable union-merge
    form: tag both relations, union them on a common (key, ts) spine,
    and carry the most recent order forward with last_value(ignore
    nulls) over one window. NO join fan-out — each input row appears
    exactly once, and the only shuffle is the window's partition on the
    key. (The naive equi-join + filter-to-past + row_number form blows
    up by orders-per-customer at 100 TB.)

    Tie semantics: an order AT the event timestamp counts (≤), so
    orders sort before events at equal ts (is_order DESC); equal-date
    orders resolve to the highest o_orderkey (last in orderkey ASC).
    """
    from pyspark_distributed_kmodes_spark.functions.asof import asof_join

    e = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        "o_orderdate",
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_totalprice").alias("last_totalprice"),
    )
    return (
        asof_join(
            e,
            o,
            on="user_id",
            left_ts="ts",
            right_ts="o_orderdate",
            payload=["last_orderkey", "last_totalprice"],
            right_tie_break="last_orderkey",
        )
        .select("event_id", "user_id", "ts", "last_orderkey", "last_totalprice")
        .orderBy("event_id")
    )


@query(
    "q34_latest_event_dedup",
    oracle="""
SELECT user_id, event_type, ts AS last_ts, value AS last_value
FROM (
  SELECT user_id, event_type, ts, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) t
WHERE rn = 1
ORDER BY user_id, event_type
""",
    tags=("events", "dedup"),
)
def q34_latest_event_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful-dedup-shaped: keep only the latest event per
    (user, event_type) — the batch twin of streaming
    dropDuplicatesWithinWatermark / last-value state."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", F.col("ts").alias("last_ts"), F.col("value").alias("last_value"))
        .orderBy("user_id", "event_type")
    )


@query(
    "q35_json_props",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS min_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    tags=("events", "json"),
)
def q35_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON extraction from the props column.

    get_json_object is JVM-side (Jackson); for repeated multi-key access
    at scale prefer from_json to a struct once, or parse_json →
    VariantType (Spark 4) for schema-flexible columns.
    """
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
            F.sum(k).cast("bigint").alias("sum_k"),
        )
        .orderBy("event_type")
    )


@query(
    "o19_retention_cohorts",
    oracle="""
WITH weekly AS (
  SELECT DISTINCT user_id, CAST(floor(epoch(ts) / 604800) AS BIGINT) AS week_idx
  FROM events
), cohorts AS (
  SELECT user_id, MIN(week_idx) AS cohort_week FROM weekly GROUP BY user_id
), joined AS (
  SELECT c.cohort_week, w.week_idx - c.cohort_week AS weeks_since, w.user_id
  FROM weekly w JOIN cohorts c USING (user_id)
), sizes AS (
  SELECT cohort_week, COUNT(*) AS cohort_size FROM cohorts GROUP BY cohort_week
)
SELECT j.cohort_week,
       CAST(j.weeks_since AS INTEGER) AS weeks_since,
       COUNT(DISTINCT j.user_id) AS n_active,
       s.cohort_size,
       (CAST(floor((CAST(COUNT(DISTINCT j.user_id) AS DOUBLE) / s.cohort_size) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0) AS retention
FROM joined j JOIN sizes s USING (cohort_week)
GROUP BY j.cohort_week, j.weeks_since, s.cohort_size
ORDER BY cohort_week, weeks_since
""",
    tags=("events", "analytics"),
)
def o19_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort analysis: users grouped by first-active week,
    tracked by distinct activity in each subsequent week — the standard
    product-analytics rollup (and, for training pipelines, the shape of
    contributor/source freshness tracking).

    Scale: one distinct over (user, week) — the only corpus-sized
    shuffle; cohorts and sizes are per-user aggregates that reuse the
    same key; the cohort-size join broadcasts (≤ one row per week).
    Week index is floor(epoch/604800) — integer math both engines
    compute identically.
    """
    e = table(spark, sf_dir, "events")
    weekly = e.select(
        "user_id", F.floor(F.unix_timestamp("ts") / 604800).cast("bigint").alias("week_idx")
    ).distinct()
    cohorts = weekly.groupBy("user_id").agg(F.min("week_idx").alias("cohort_week"))
    joined = weekly.join(cohorts, "user_id").select(
        "cohort_week", (F.col("week_idx") - F.col("cohort_week")).cast("int").alias("weeks_since"), "user_id"
    )
    sizes = cohorts.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("cohort_size"))
    return (
        joined.groupBy("cohort_week", "weeks_since")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "weeks_since",
            "n_active",
            "cohort_size",
            pround(F.col("n_active").cast("double") / F.col("cohort_size"), 6).alias("retention"),
        )
        .orderBy("cohort_week", "weeks_since")
    )


@query(
    "qb35_interval_join_attribution",
    oracle="""
SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
       p.ts AS purchase_ts,
       epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
FROM events p
JOIN events c
  ON c.user_id = p.user_id
 AND c.ts <= p.ts
 AND c.ts > p.ts - INTERVAL 1 HOUR
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
ORDER BY purchase_id, click_id
""",
    tags=("events", "join", "streaming-twin"),
)
def qb35_interval_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (event-time range) join: every click by the same user in
    the hour before each purchase — the batch twin of the stream-stream
    join in streaming/jobs.py::attribution_join_stream, which emits
    exactly these pairs under watermarks.

    All-pairs semantics on purpose: a stream-stream inner join emits
    every matching pair, so this is the form whose availableNow drain
    is directly comparable (test_streaming). Last-touch attribution
    (one row per purchase) is q33's as-of join instead.

    Scale: both sides filter on event_type at the scan; the join is an
    equi-join on user_id with the time-range as a post-join predicate,
    so it shuffles once on user_id — per-user output is bounded by
    click rate within the window, not by corpus size. lag_us is exact
    integer microsecond arithmetic on both engines.
    """
    e = table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    return (
        purchases.join(
            clicks,
            (F.col("c_user") == F.col("user_id"))
            & (F.col("click_ts") <= F.col("purchase_ts"))
            & (F.col("click_ts") > F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")),
        )
        .select(
            "purchase_id",
            "click_id",
            "user_id",
            "purchase_ts",
            (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias("lag_us"),
        )
        .orderBy("purchase_id", "click_id")
    )


@query(
    "qe09_event_funnel",
    oracle=f"""
WITH t1 AS (
  SELECT user_id, MIN(ts) AS t FROM events WHERE event_type = 'view' GROUP BY user_id
), t2 AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN t1 ON t1.user_id = e.user_id AND e.ts > t1.t
  WHERE e.event_type = 'click' GROUP BY e.user_id
), t3 AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN t2 ON t2.user_id = e.user_id AND e.ts > t2.t
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
), c AS (
  SELECT (SELECT COUNT(*) FROM t1) AS n1,
         (SELECT COUNT(*) FROM t2) AS n2,
         (SELECT COUNT(*) FROM t3) AS n3
)
SELECT 1 AS stage, 'view' AS event_type, CAST(n1 AS BIGINT) AS n_users, CAST(1.0 AS DOUBLE) AS conversion FROM c
UNION ALL
SELECT 2, 'click', CAST(n2 AS BIGINT),
       CASE WHEN n1 > 0 THEN {sql_pround('CAST(n2 AS DOUBLE) / n1', 6)} ELSE 0.0 END FROM c
UNION ALL
SELECT 3, 'purchase', CAST(n3 AS BIGINT),
       CASE WHEN n2 > 0 THEN {sql_pround('CAST(n3 AS DOUBLE) / n2', 6)} ELSE 0.0 END FROM c
ORDER BY stage
""",
    tags=("events", "funnel"),
)
def qe09_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis: how many users progress view → click →
    purchase with STRICTLY increasing timestamps (a click before the
    first view does not count) — the product-analytics sequence-match
    every engine in this space ships, reduced to relational algebra:
    stage k's entry time is the MIN event time after stage k−1's.

    Scale shape: three aggregate→join rounds, all keyed user_id, each
    stage's table shrinking monotonically; no per-user event arrays are
    ever materialized (the sessionize-then-fold alternative), so a user
    with 10M events costs the same shuffle bytes as one with 10. The
    stage tables are data-dependent — broadcast is left to AQE.
    Conversions are single IEEE divisions of exact counts, pround(6).
    """
    e = table(spark, sf_dir, "events")

    def stage(prev, etype):
        # each stage table has two consumers (the next stage's chain
        # plus counts/deltas): materialize so every pushed-filter events
        # scan runs once per stage, not once per consumer (scan-lint)
        nxt = e.filter(F.col("event_type") == etype)
        if prev is None:
            return nxt.groupBy("user_id").agg(F.min("ts").alias("t")).transform(cut_lineage)
        return (
            nxt.join(
                prev.select(F.col("user_id").alias("pu"), F.col("t").alias("pt")),
                (F.col("user_id") == F.col("pu")) & (F.col("ts") > F.col("pt")),
            )
            .groupBy("user_id")
            .agg(F.min("ts").alias("t"))
            .transform(cut_lineage)
        )

    t1 = stage(None, "view")
    t2 = stage(t1, "click")
    t3 = stage(t2, "purchase")
    row = (
        t1.agg(F.count(F.lit(1)).alias("n1"))
        .crossJoin(t2.agg(F.count(F.lit(1)).alias("n2")))
        .crossJoin(t3.agg(F.count(F.lit(1)).alias("n3")))
    )
    conv2 = F.when(F.col("n1") > 0, pround(F.col("n2").cast("double") / F.col("n1"), 6)).otherwise(0.0)
    conv3 = F.when(F.col("n2") > 0, pround(F.col("n3").cast("double") / F.col("n2"), 6)).otherwise(0.0)
    stages = F.array(
        F.struct(
            F.lit(1).alias("stage"),
            F.lit("view").alias("event_type"),
            F.col("n1").cast("bigint").alias("n_users"),
            F.lit(1.0).alias("conversion"),
        ),
        F.struct(
            F.lit(2).alias("stage"),
            F.lit("click").alias("event_type"),
            F.col("n2").cast("bigint").alias("n_users"),
            conv2.alias("conversion"),
        ),
        F.struct(
            F.lit(3).alias("stage"),
            F.lit("purchase").alias("event_type"),
            F.col("n3").cast("bigint").alias("n_users"),
            conv3.alias("conversion"),
        ),
    )
    return row.select(F.explode(stages).alias("s")).select("s.*").orderBy("stage")


@query(
    "qe10_dau_wau_stickiness",
    oracle=f"""
WITH daily AS (
  SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
         CAST(date_trunc('day', ts) AS DATE) AS day,
         COUNT(DISTINCT user_id) AS dau
  FROM events GROUP BY 1, 2
), weekly AS (
  SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
         COUNT(DISTINCT user_id) AS wau
  FROM events GROUP BY 1
)
SELECT d.week,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(w.wau AS BIGINT) AS wau,
       {sql_pround('CAST(SUM(d.dau) AS DOUBLE) / COUNT(*)', 6)} AS avg_dau,
       {sql_pround('CAST(SUM(d.dau) AS DOUBLE) / COUNT(*) / w.wau', 6)} AS stickiness
FROM daily d JOIN weekly w USING (week)
GROUP BY d.week, w.wau
ORDER BY d.week
""",
    tags=("events", "engagement"),
)
def qe10_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement stickiness: average daily active users over weekly
    active users per week (the DAU/WAU ratio product teams track) —
    two distinct-user rollups at different grains joined back together.

    Scale shape: both rollups are distinct-aggregates over the RAW scan
    (no join fan-out — the vanilla-heap rule), keyed by calendar
    buckets; the weekly side is |weeks| rows and joins the daily side
    on week. Counts are exact integers; the two ratios are IEEE
    divisions of exact sums, pround(6).
    """
    e = table(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    day = F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    daily = e.groupBy(week, day).agg(F.count_distinct("user_id").alias("dau"))
    weekly = e.groupBy(week).agg(F.count_distinct("user_id").alias("wau"))
    avg_dau = F.sum("dau").cast("double") / F.count(F.lit(1))
    return (
        daily.join(weekly, "week")
        .groupBy("week", "wau")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            pround(avg_dau, 6).alias("avg_dau"),
            pround(avg_dau / F.col("wau"), 6).alias("stickiness"),
        )
        .select("week", "n_days", F.col("wau").cast("bigint").alias("wau"), "avg_dau", "stickiness")
        .orderBy("week")
    )


@query(
    "qe12_event_transition_matrix",
    oracle=f"""
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_type
  FROM events
), pairs AS (
  SELECT prev_type, event_type AS next_type, COUNT(*) AS cnt
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
), totals AS (
  SELECT prev_type, SUM(cnt) AS total FROM pairs GROUP BY prev_type
)
SELECT p.prev_type, p.next_type,
       CAST(p.cnt AS BIGINT) AS n_transitions,
       {sql_pround('CAST(p.cnt AS DOUBLE) / t.total', 6)} AS prob
FROM pairs p JOIN totals t USING (prev_type)
ORDER BY p.prev_type, p.next_type
""",
    tags=("events", "analytics"),
)
def qe12_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    sequence: P(next event type | previous event type) — the behavioral
    fingerprint behind "what do users do after an error?" and the
    input to any sequence-anomaly monitor.

    Determinism: the sequence order is (ts, event_id) — a total order,
    so lag() is identical on both engines; counts are integers and each
    probability is one IEEE division, pround(6). Scale shape: one
    user-partitioned window (each user's events sort within their
    partition), then a |types|²-bounded aggregate — the matrix is
    schema-small no matter the corpus.
    """
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    pairs = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    totals = pairs.groupBy("prev_type").agg(F.sum("cnt").alias("total"))
    return (
        pairs.join(totals, "prev_type")
        .select(
            "prev_type",
            "next_type",
            F.col("cnt").cast("bigint").alias("n_transitions"),
            pround(F.col("cnt").cast("double") / F.col("total"), 6).alias("prob"),
        )
        .orderBy("prev_type", "next_type")
    )


_TS_DAYS = 16  # series length (days from corpus start)
_TS_SEG = 4  # PAA segments -> 4-char SAX word, alphabet {a,b}
_TS_DIST_T = 4.2  # z-normalized Euclidean threshold


@query(
    "qe21_sax_similar_users",
    oracle=f"""
WITH bounds AS (
  SELECT MIN(CAST(date_trunc('day', ts) AS DATE)) AS d0 FROM events
), daily AS (
  SELECT user_id, datediff('day', b.d0, CAST(date_trunc('day', ts) AS DATE)) AS di,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events CROSS JOIN bounds b
  WHERE datediff('day', b.d0, CAST(date_trunc('day', ts) AS DATE)) < {_TS_DAYS}
  GROUP BY 1, 2
), series AS (
  SELECT user_id,
         list_transform(range(0, {_TS_DAYS}),
           i -> CAST(COALESCE(map(list(di ORDER BY di), list(c ORDER BY di))[i][1], 0) AS DOUBLE)) AS s
  FROM daily GROUP BY user_id
), stats AS (
  SELECT user_id, s, list_sum(s) / {_TS_DAYS} AS mu,
         sqrt(list_sum(list_transform(s, x -> (x - list_sum(s)/{_TS_DAYS}) * (x - list_sum(s)/{_TS_DAYS}))) / {_TS_DAYS}) AS sd
  FROM series
), zed AS (
  SELECT user_id,
         CASE WHEN sd = 0 THEN list_transform(s, x -> 0.0)
              ELSE list_transform(s, x -> (x - mu) / sd) END AS z,
         CASE WHEN sd = 0 THEN repeat('b', {_TS_SEG}) ELSE
           array_to_string(list_transform(range(1, {_TS_SEG} + 1),
             seg -> CASE WHEN ((s[4*seg-3] + s[4*seg-2] + s[4*seg-1] + s[4*seg]) / 4 - mu) / sd < 0
                         THEN 'a' ELSE 'b' END), '') END AS word
  FROM stats
), pairs AS (
  SELECT a.user_id AS user_a, b.user_id AS user_b, a.word AS sax_word,
         sqrt(CAST(list_sum(list_transform(range(1, {_TS_DAYS} + 1),
           i -> CAST((CAST(floor(((a.z[i] - b.z[i]) * (a.z[i] - b.z[i])) * 1000000000.0 + 0.5) AS DOUBLE) / 1000000000.0) AS DECIMAL(25,12)))) AS DOUBLE)) AS dist
  FROM zed a JOIN zed b ON a.word = b.word AND a.user_id < b.user_id
)
SELECT user_a, user_b, sax_word,
       (CAST(floor(dist * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0) AS dist
FROM pairs
WHERE dist <= {_TS_DIST_T}
ORDER BY user_a, user_b
""",
    tags=("events", "timeseries", "similarity"),
)
def qe21_sax_similar_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search with SAX blocking: each user's
    16-day activity series is z-normalized, PAA-compressed to 4
    segments, and discretized to a SAX word; only users sharing a word
    ever meet (the LSH-style bucket join of the time-series world —
    REPOSE/EDBT-family systems use exactly this shape), and the exact
    z-normalized Euclidean distance confirms pairs under the
    threshold. Finds users with the same activity SHAPE regardless of
    absolute volume.

    Determinism: every pre-distance intermediate is EXACT in binary —
    daily counts are integers, means divide by 16 (a power of two),
    deviations are multiples of 1/16 and square exactly under 2^53 —
    so mu/sd/z/word are bit-identical on both engines with no rounding
    anywhere; the distance terms then pround(9)-round into an exact
    DECIMAL sum and the threshold compares identical doubles. Scale
    shape: one (user, day) rollup, one per-user fold (codegen), a
    bucket join on the 4-char word — corpus² never materializes; at
    100 TB, lengthen the word (more segments/symbols) exactly like
    adding LSH bands.
    """
    e = table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    d0 = e.agg(F.min(day).alias("d0"))
    daily = (
        e.crossJoin(F.broadcast(d0))
        .select("user_id", F.datediff(day, F.col("d0")).alias("di"))
        .filter(F.col("di") < _TS_DAYS)
        .groupBy("user_id", "di")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    series = daily.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("di", "c"))).alias("m")
    ).select(
        "user_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(_TS_DAYS - 1)),
            lambda i: F.coalesce(F.element_at("m", i), F.lit(0)).cast("double"),
        ).alias("s"),
    )
    tot = F.aggregate("s", F.lit(0.0), lambda a, x: a + x)
    mu = tot / _TS_DAYS
    # mu materialized as its own projection BEFORE the variance fold —
    # captured inside the transform lambda, the full sum-over-s fold
    # re-ran per element (O(days²) per user; r13 HOF-capture fix)
    var = F.aggregate(
        F.transform("s", lambda x: (x - F.col("mu")) * (x - F.col("mu"))),
        F.lit(0.0),
        lambda a, x: a + x,
    ) / _TS_DAYS
    stats = series.select("user_id", "s", mu.alias("mu")).select(
        "user_id", "s", "mu", F.sqrt(var).alias("sd")
    )
    z = F.when(F.col("sd") == 0.0, F.transform("s", lambda x: F.lit(0.0))).otherwise(
        F.transform("s", lambda x: (x - F.col("mu")) / F.col("sd"))
    )
    paa = lambda seg: (  # noqa: E731 — 1-based segment of 4 days
        F.element_at("s", 4 * seg - 3)
        + F.element_at("s", 4 * seg - 2)
        + F.element_at("s", 4 * seg - 1)
        + F.element_at("s", 4 * seg)
    ) / 4.0
    sym = lambda seg: F.when((paa(seg) - F.col("mu")) / F.col("sd") < 0, "a").otherwise("b")  # noqa: E731
    word = F.when(F.col("sd") == 0.0, F.lit("b" * _TS_SEG)).otherwise(
        F.concat(*[sym(g) for g in range(1, _TS_SEG + 1)])
    )
    zed = stats.select("user_id", z.alias("z"), word.alias("word"))
    a, b = zed.alias("a"), zed.alias("b")
    sq = F.zip_with(
        F.col("a.z"), F.col("b.z"), lambda x, y: pround((x - y) * (x - y), 9).cast("decimal(25,12)")
    )
    dist = F.sqrt(
        F.aggregate(
            sq, F.lit(0).cast("decimal(25,12)"), lambda acc, t: (acc + t).cast("decimal(25,12)")
        ).cast("double")
    )
    return (
        a.join(b, (F.col("a.word") == F.col("b.word")) & (F.col("a.user_id") < F.col("b.user_id")))
        .select(
            F.col("a.user_id").alias("user_a"),
            F.col("b.user_id").alias("user_b"),
            F.col("a.word").alias("sax_word"),
            dist.alias("dist"),
        )
        .filter(F.col("dist") <= _TS_DIST_T)
        .select("user_a", "user_b", "sax_word", pround(F.col("dist"), 6).alias("dist"))
        .orderBy("user_a", "user_b")
    )


@query(
    "qe23_ranking_cohorts",
    oracle="""
WITH cnt AS (
  SELECT user_id, event_type, COUNT(*) AS c
  FROM events GROUP BY 1, 2
), ranked AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY c DESC, event_type ASC) AS rk
  FROM cnt
), sig AS (
  SELECT user_id, string_agg(event_type, '>' ORDER BY rk) AS ranking
  FROM ranked WHERE rk <= 3 GROUP BY user_id
)
SELECT ranking,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(MIN(user_id) AS BIGINT) AS min_user_id
FROM sig
GROUP BY ranking
ORDER BY ranking
""",
    tags=("events", "rankings"),
)
def qe23_ranking_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k ranking cohorts: users grouped by their top-3 event-type
    ranking (the exact-match blocking used in top-k rankings similarity
    joins — identical rankings are distance-zero, so signature grouping
    finds every such pair without a pairwise comparison). The cohort
    table answers "which behavioral profiles exist and how common is
    each" in one pass.

    Determinism: ranks are integer row_numbers with full (count,
    type) tie-breaks; signatures concatenate in rank order on both
    engines. Scale: one (user, type) rollup, a user-partitioned top-3
    window over ≤|types| rows per user, one signature aggregate.
    """
    e = table(spark, sf_dir, "events")
    cnt = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("user_id").orderBy(F.desc("c"), F.asc("event_type"))
    sig = (
        cnt.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rk", "event_type"))),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("ranking")
        )
    )
    return (
        sig.groupBy("ranking")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.min("user_id").cast("bigint").alias("min_user_id"),
        )
        .orderBy("ranking")
    )


@query(
    "qe29_disorder_audit",
    oracle=f"""
WITH seq AS (
  SELECT user_id, event_id, epoch_us(ts) AS tus,
         MAX(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id ASC
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS run_max
  FROM events
), flagged AS (
  SELECT user_id, event_id, tus, run_max,
         CASE WHEN run_max IS NOT NULL AND tus < run_max THEN run_max - tus END AS late_us
  FROM seq
)
SELECT CAST(COUNT(run_max) AS BIGINT) AS n_with_pred,
       CAST(COUNT(late_us) AS BIGINT) AS n_late,
       {sql_pround('CAST(COUNT(late_us) AS DOUBLE) / COUNT(run_max)', 6)} AS late_frac,
       CAST(COALESCE(MAX(late_us), 0) AS BIGINT) AS max_late_us,
       {sql_pround('COALESCE(quantile_cont(late_us, 0.95), 0.0)', 6)} AS p95_late_us
FROM flagged
""",
    tags=("events", "streaming", "diagnostics"),
)
def qe29_disorder_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-disorder audit: treating event_id as ARRIVAL order, how
    often does an event carry an EVENT time earlier than something the
    same user already sent, and by how much — exactly the statistic
    that justifies a watermark setting (p95 lateness ≈ the delay
    threshold that loses 5% of late data; max = the loss-free bound).
    Run it on a day of history BEFORE wiring withWatermark.

    Determinism: lateness is integer microseconds (unix_micros /
    epoch_us), fractions are single divisions of exact counts, and the
    p95 interpolates integers identically on both engines (c05's
    argument), pround(6). Scale shape: one user-partitioned running-max
    window, then a 1-row global aggregate.
    """
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = e.select(
        F.unix_micros("ts").alias("tus"),
        F.max(F.unix_micros("ts")).over(w).alias("run_max"),
    )
    late_us = F.when(
        F.col("run_max").isNotNull() & (F.col("tus") < F.col("run_max")),
        F.col("run_max") - F.col("tus"),
    )
    return seq.select(F.col("tus"), F.col("run_max"), late_us.alias("late_us")).agg(
        F.count("run_max").cast("bigint").alias("n_with_pred"),
        F.count("late_us").cast("bigint").alias("n_late"),
        pround(F.count("late_us").cast("double") / F.count("run_max"), 6).alias("late_frac"),
        F.coalesce(F.max("late_us"), F.lit(0)).cast("bigint").alias("max_late_us"),
        pround(
            F.coalesce(F.expr("percentile(late_us, 0.95)"), F.lit(0.0)), 6
        ).alias("p95_late_us"),
    )


@query(
    "qe32_time_to_convert",
    oracle=f"""
WITH t1 AS (
  SELECT user_id, MIN(ts) AS t FROM events WHERE event_type = 'view' GROUP BY user_id
), t2 AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN t1 ON t1.user_id = e.user_id AND e.ts > t1.t
  WHERE e.event_type = 'click' GROUP BY e.user_id
), t3 AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN t2 ON t2.user_id = e.user_id AND e.ts > t2.t
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
), deltas AS (
  SELECT t3.user_id, epoch_us(t3.t) - epoch_us(t1.t) AS delta_us
  FROM t3 JOIN t1 ON t1.user_id = t3.user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
       {sql_pround('quantile_cont(delta_us, 0.5)', 6)} AS p50_us,
       {sql_pround('quantile_cont(delta_us, 0.9)', 6)} AS p90_us,
       CAST(MAX(delta_us) AS BIGINT) AS max_us
FROM deltas
""",
    tags=("events", "funnel"),
)
def qe32_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: for users completing the ordered
    view→click→purchase funnel (z09's min-ts chain), the latency from
    first view to qualifying purchase — the p50/p90 a growth team
    actually tracks on top of the funnel's conversion counts.

    Determinism: stage times are exact MIN timestamps, deltas are
    integer microseconds, and the percentiles interpolate integers
    identically on both engines, pround(6). Scale: z09's three
    shrinking aggregate-join rounds plus one 1-row summary.
    """
    e = table(spark, sf_dir, "events")

    def stage(prev, etype):
        # each stage table has two consumers (the next stage's chain
        # plus counts/deltas): materialize so every pushed-filter events
        # scan runs once per stage, not once per consumer (scan-lint)
        nxt = e.filter(F.col("event_type") == etype)
        if prev is None:
            return nxt.groupBy("user_id").agg(F.min("ts").alias("t")).transform(cut_lineage)
        return (
            nxt.join(
                prev.select(F.col("user_id").alias("pu"), F.col("t").alias("pt")),
                (F.col("user_id") == F.col("pu")) & (F.col("ts") > F.col("pt")),
            )
            .groupBy("user_id")
            .agg(F.min("ts").alias("t"))
            .transform(cut_lineage)
        )

    t1 = stage(None, "view")
    t2 = stage(t1, "click")
    t3 = stage(t2, "purchase")
    deltas = (
        t3.select("user_id", F.unix_micros("t").alias("t3us"))
        .join(t1.select(F.col("user_id"), F.unix_micros("t").alias("t1us")), "user_id")
        .select((F.col("t3us") - F.col("t1us")).alias("delta_us"))
    )
    return deltas.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converted"),
        pround(F.expr("percentile(delta_us, 0.5)"), 6).alias("p50_us"),
        pround(F.expr("percentile(delta_us, 0.9)"), 6).alias("p90_us"),
        F.max("delta_us").cast("bigint").alias("max_us"),
    )
