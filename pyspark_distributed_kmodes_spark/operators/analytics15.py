"""Round-13 staged suite: genuinely-NEW ENGINE SURFACE keyed z01+ so it
sorts AFTER every q* key — outside the round-13 driver window (o08-o19
+ p18-p56 fill all 50 slots; guard tests in tests/test_entry.py and
tests/test_rsuite.py). Per the rotation scheme in __spark_entry__.py
these rename into the round-14 window (the round-3 z->e precedent:
number is the query's identity, the prefix only controls sort order).

Wave 1 — the pandas-on-Spark LONG TAIL (p23-p39 opened the family;
these are the reshape/ordered-window/encode surfaces it left out):

  z01  ps.melt + ps.DataFrame.stack — BOTH wide-to-long reshapes over
       the same per-source stats matrix, each hash-gated against a
       UNION ALL oracle, plus the in-hash law that melt and stack
       produce the SAME long relation (exceptAll both ways == 0).
  z02  ps.groupby(...).expanding() — cumulative count/sum/max per
       source in INDEX ORDER; the oracle replays it as running window
       aggregates ordered by doc_id, so the pandas "expanding over the
       sorted index" convention itself is what the hash certifies.
  z03  ps.DataFrame.ewm(alpha).mean() — the exponentially-weighted
       mean over an index-sorted bounded series; the oracle replays
       adjust=True weights ((1-a)^(i-j)) with an O(n^2) self-join at
       oracle scale, pround-pinned (the qj26 float discipline).
  z04  ps.get_dummies — one-hot encoding of o_orderpriority summed per
       order status; the oracle replays each dummy column as a CASE
       sum, so the encoder's column naming AND its 0/1 semantics land
       in-hash (a contingency twin of p38 reached via the encoder).

Wave 2 — streaming certification surface (the stream twin of p19, the
RocksDB/changelog/join-state combination, restart-resume, output
modes):

  z05  DataSourceStreamWriter COMMIT/REPLAY protocol — a real
       checkpoint-recovery replay (the last commit marker is removed,
       the engine re-runs the batch) must be DISCARDED by the sink's
       batch-id ledger: rows stay exactly-once, ledger stays 3 lines,
       no temp orphans. The filesystem facts ride the hash beside the
       read-back rollup.
  z06  RocksDB + changelog checkpointing + STREAM-STREAM JOIN state —
       qo26 certified changelog on agg state, p07/p29 join state on
       the default provider; this key runs the join under RocksDB
       with changelog enabled, hash-gates the join result, and
       asserts the changelog artifacts exist in the checkpoint.
  z07  CHECKPOINT RESTART RESUME — run a file-source stream over two
       staged tranches, stop, stage two more, restart from the SAME
       checkpoint: every row lands exactly once (the resume law that
       makes file backlogs safely restartable); per-phase batch
       counts and a duplicate probe ride the hash.
  z08  OUTPUT-MODE MATRIX — the same windowed aggregate run to
       completion under append, update, and complete modes; complete
       is hash-gated against the relational rollup, and the cross-
       mode laws (append == complete once watermark passes; update's
       last emission per key == complete) ride as facts.

Wave 3 — catalog / caching / API surface:

  z09  GLOBAL TEMP VIEWS + catalog introspection — global_temp
       crosses sessions, session-local temp views do not; both laws
       plus catalog listings ride beside a rollup queried THROUGH the
       global view from a sibling session.
  z10  SHOW PARTITIONS + recoverPartitions — an external
       hive-partitioned table whose partitions are discovered by
       MSCK-style recovery; the partition listing hash-matches the
       distinct partition values and a rollup through the repaired
       table matches the relational baseline.
  z11  CACHE/PERSIST AUDIT — persist() materializes an
       InMemoryRelation (plan fact), CACHE TABLE + catalog.isCached
       agree (catalog fact), the cached result hash-matches the
       uncached relational baseline, and unpersist() restores the
       scan plan.
  z12  ARROW-OPTIMIZED PYTHON UDF (useArrow=True) — the 4.x scalar
       UDF fast path: ArrowEvalPython in the plan (fact) and the
       UDF's arithmetic hash-matched against the same expression in
       pure SQL (declared python-UDF surface, Arrow-batched).
  z13  unionByName(allowMissingColumns=True) — schema-aligned union
       across two differently-shaped, differently-ORDERED
       projections; the oracle replays it as UNION ALL with explicit
       NULL padding, so positional-union bugs break the hash.

Wave 4 — pandas-on-Spark tail (2) + training-pipeline ordering:

  z14  ps.resample('1D') over a datetime index — calendar-day bins
       INCLUDING EMPTY BINS (the pandas convention group-by can't
       express); the oracle replays it with generate_series.
  z15  ps .str / .dt accessors — the accessor surface compiled to
       Catalyst expressions, hash-matched against the SQL string/date
       equivalents.
  z16  pandas_api()/to_pandas ROUND-TRIP LAW — Spark -> ps ->
       driver pandas -> Spark preserves values, dtypes, and row
       count on a bounded, documented subset (the interchange
       contract; the toArrow twin of p39).
  z17  CURRICULUM INTERLEAVE — difficulty-bucketed round-robin
       ordering for training-data scheduling: quintile buckets by
       n_chars, row_number within bucket, global order (rn, bucket);
       the oracle replays the window arithmetic exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_distributed_kmodes_spark.functions.deterministic import pround, sql_pround
from pyspark_distributed_kmodes_spark.registry import query
from pyspark_distributed_kmodes_spark.sources.tables import table

# ---------------------------------------------------------------------------
# z01 — ps.melt + ps.DataFrame.stack (wide-to-long, both reshapes)

_Z01_ORACLE = """
WITH stats AS (
  SELECT source,
         CAST(COUNT(*) AS DOUBLE) AS n_docs,
         CAST(SUM(n_chars) AS DOUBLE) AS sum_chars,
         CAST(MAX(n_chars) AS DOUBLE) AS max_chars
  FROM documents GROUP BY source
)
SELECT source, stat, value, CAST(1 AS INTEGER) AS melt_eq_stack
FROM (
  SELECT source, 'n_docs' AS stat, n_docs AS value FROM stats
  UNION ALL
  SELECT source, 'sum_chars', sum_chars FROM stats
  UNION ALL
  SELECT source, 'max_chars', max_chars FROM stats
)
ORDER BY source, stat
"""


@query(
    "z01_pandas_on_spark_melt_stack",
    oracle=_Z01_ORACLE,
    tags=("api", "pandas", "reshape"),
)
def z01_pandas_on_spark_melt_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ps.melt AND ps.DataFrame.stack under one hash gate — the two
    wide-to-long reshapes the pandas-on-Spark coverage (p23-p39)
    never exercised. A per-source stats matrix (count / sum / max of
    n_chars over documents) is melted with value_vars naming the
    three stat columns, and independently stacked (set_index(source)
    .stack()); the law that both produce the SAME long relation rides
    the hash as melt_eq_stack (exceptAll in both directions == 0
    rows). The oracle replays the reshape as a UNION ALL, so melt's
    var/value naming, stack's index handling, and the double
    unification of the value column are all value-pinned.

    Scale: melt compiles to an explode over a struct array (one
    narrow projection, no shuffle beyond the setup groupby); stack is
    the same expansion via the MultiIndex path. Neither touches the
    driver — the wide frame here is group-level (|sources| rows), and
    the reshape itself is row-local at any corpus size.
    """
    import pyspark.pandas as ps

    table(spark, sf_dir, "documents")
    psdf = ps.read_parquet(f"{sf_dir}/documents.parquet", index_col="doc_id")
    wide = (
        psdf.reset_index()
        .groupby("source")
        .agg(
            n_docs=("doc_id", "count"),
            sum_chars=("n_chars", "sum"),
            max_chars=("n_chars", "max"),
        )
        .reset_index()
    )
    wide = wide.astype({"n_docs": "double", "sum_chars": "double", "max_chars": "double"})

    melted = wide.melt(
        id_vars=["source"],
        value_vars=["n_docs", "sum_chars", "max_chars"],
        var_name="stat",
        value_name="value",
    )
    stacked = wide.set_index("source").stack().rename("value").reset_index()
    # level_1 is the stacked column name
    stacked = stacked.rename(columns={"level_1": "stat"})

    m = melted.to_spark().select("source", "stat", F.col("value").cast("double").alias("value"))
    s = stacked.to_spark().select("source", "stat", F.col("value").cast("double").alias("value"))
    same = int(m.exceptAll(s).count() == 0 and s.exceptAll(m).count() == 0)
    return (
        m.withColumn("melt_eq_stack", F.lit(same).cast("int"))
        .orderBy("source", "stat")
    )


# ---------------------------------------------------------------------------
# z02 — ps.groupby(...).expanding(): cumulative windows in index order

_Z02_ORACLE = """
SELECT source, doc_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS cum_n,
       CAST(SUM(n_chars) OVER w AS BIGINT) AS cum_chars,
       CAST(MAX(n_chars) OVER w AS BIGINT) AS cum_max
FROM documents
WINDOW w AS (PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY source, doc_id
"""


@query(
    "z02_pandas_on_spark_expanding",
    oracle=_Z02_ORACLE,
    tags=("api", "pandas", "window"),
)
def z02_pandas_on_spark_expanding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ps.groupby(...).expanding() under the hash gate — the pandas
    cumulative-window surface (p28 covered rolling's FIXED width;
    expanding is the unbounded-preceding flavor with its own
    min_periods edge). count/sum/max of n_chars accumulate per source
    in INDEX ORDER over a doc_id-indexed, sort_index()-ed frame; the
    oracle replays them as running window aggregates ordered by
    doc_id — so the "expanding walks the sorted index" convention,
    min_periods=1 emission from the first row, and the dtype of each
    accumulator are all value-pinned.

    Scale: ExpandingGroupby compiles to Catalyst window frames
    (PARTITION BY source ORDER BY index ROWS UNBOUNDED PRECEDING) —
    one shuffle on the group key, per-partition sorted scan, no
    driver involvement; identical to the hand-written running-total
    plan a DataFrame user would reach for.
    """
    import pyspark.pandas as ps

    table(spark, sf_dir, "documents")
    psdf = ps.read_parquet(f"{sf_dir}/documents.parquet", index_col="doc_id").sort_index()
    g = psdf.groupby("source")[["n_chars"]].expanding()
    cum_n = g.count().rename(columns={"n_chars": "cum_n"})
    cum_sum = g.sum().rename(columns={"n_chars": "cum_chars"})
    cum_max = g.max().rename(columns={"n_chars": "cum_max"})

    out = (
        cum_n.to_spark(index_col=["source", "doc_id"])
        .join(cum_sum.to_spark(index_col=["source", "doc_id"]), ["source", "doc_id"])
        .join(cum_max.to_spark(index_col=["source", "doc_id"]), ["source", "doc_id"])
    )
    return out.select(
        "source",
        "doc_id",
        F.col("cum_n").cast("bigint").alias("cum_n"),
        F.col("cum_chars").cast("bigint").alias("cum_chars"),
        F.col("cum_max").cast("bigint").alias("cum_max"),
    ).orderBy("source", "doc_id")


# ---------------------------------------------------------------------------
# z03 — ps.DataFrame.ewm(alpha=0.5).mean() over an index-sorted series

_Z03_N = 60  # bounded, documented: the oracle replay is O(n^2) by design


def _z03_oracle() -> str:
    return f"""
WITH ranked AS (
  SELECT o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS i
  FROM orders
  ORDER BY o_orderkey LIMIT {_Z03_N}
),
pairs AS (
  SELECT a.o_orderkey, a.i,
         SUM(b.o_totalprice * POWER(0.5, a.i - b.i)) AS num,
         SUM(POWER(0.5, a.i - b.i)) AS den
  FROM ranked a JOIN ranked b ON b.i <= a.i
  GROUP BY a.o_orderkey, a.i
)
SELECT o_orderkey, {sql_pround('num / den', 6)} AS ewm_price
FROM pairs
ORDER BY o_orderkey
"""


@query(
    "z03_pandas_on_spark_ewm",
    oracle=_z03_oracle(),
    tags=("api", "pandas", "window"),
)
def z03_pandas_on_spark_ewm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ps.DataFrame.ewm(alpha).mean() under the hash gate — the
    exponentially-weighted surface of the pandas dialect. The engine
    runs the REAL ps.ewm over an o_orderkey-indexed, sort_index()-ed
    bounded series (the first {n} orders); the oracle re-derives
    adjust=True semantics from the definition — y_i = sum_j (1-a)^(i-j)
    x_j / sum_j (1-a)^(i-j) — with an O(n^2) self-join that is
    EXPRESSLY oracle-scale-only (the engine side is a linear Catalyst
    window chain). alpha=0.5 keeps the weights exact in binary;
    pround(6) absorbs summation-order ulps (the qj26 discipline).

    Scale: the bounded subset is the AUDIT, not the operator — ps.ewm
    compiles to a linear recurrence over a sorted window exactly like
    expanding(); a 100 TB series runs the same per-partition sorted
    pass. The quadratic replay lives only in the DuckDB oracle.
    """
    import pyspark.pandas as ps

    o = (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(_Z03_N)
    )
    psdf = o.pandas_api(index_col="o_orderkey").sort_index()
    ew = psdf.ewm(alpha=0.5).mean().rename(columns={"o_totalprice": "ewm_price"})
    return (
        ew.to_spark(index_col="o_orderkey")
        .select("o_orderkey", pround(F.col("ewm_price"), 6).alias("ewm_price"))
        .orderBy("o_orderkey")
    )


z03_pandas_on_spark_ewm.__doc__ = z03_pandas_on_spark_ewm.__doc__.replace("{n}", str(_Z03_N))


# ---------------------------------------------------------------------------
# z04 — ps.get_dummies one-hot encoding, summed per order status

_Z04_ORACLE = """
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS pri_1_urgent,
       CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS pri_2_high,
       CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS pri_3_medium,
       CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS pri_4_not_specified,
       CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS pri_5_low
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@query(
    "z04_pandas_on_spark_get_dummies",
    oracle=_Z04_ORACLE,
    tags=("api", "pandas", "encode"),
)
def z04_pandas_on_spark_get_dummies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ps.get_dummies under the hash gate — one-hot encoding, the
    feature-engineering front door of the pandas dialect. Every
    order's o_orderpriority expands to five 0/1 dummy columns over
    the FULL orders table; the dummies are then summed per order
    status, so each (status, priority) cell of the implied
    contingency matrix — reached through the ENCODER, not crosstab —
    hash-matches a CASE-sum oracle. Dummy COLUMN NAMING (prefix +
    sanitized category) is pinned by the column-name half of the
    driver compare.

    Scale: get_dummies on a known category set compiles to row-local
    CASE projections (no shuffle, no driver category collection
    beyond the distinct scan ps performs once); the follow-up sum is
    one map-side-combinable groupby. The encoder is exactly what a
    training pipeline runs before packing categorical features.
    """
    import pyspark.pandas as ps

    table(spark, sf_dir, "orders")
    psdf = ps.read_parquet(f"{sf_dir}/orders.parquet", index_col="o_orderkey")[
        ["o_orderstatus", "o_orderpriority"]
    ]
    dummies = ps.get_dummies(
        psdf, columns=["o_orderpriority"], prefix={"o_orderpriority": "pri"}, dtype="int64"
    )
    agg_map = {c: "sum" for c in dummies.columns if c.startswith("pri_")}
    out = dummies.groupby("o_orderstatus").agg(agg_map)
    sdf = out.reset_index().to_spark()

    def _norm(c: str) -> str:
        return (
            c.lower()
            .replace("pri_", "pri_")
            .replace("-", "_")
            .replace(" ", "_")
            .replace("__", "_")
        )

    renamed = sdf.select(
        "o_orderstatus",
        *[F.col(f"`{c}`").cast("bigint").alias(_norm(c)) for c in sdf.columns if c != "o_orderstatus"],
    )
    n = (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    )
    return (
        n.join(renamed, "o_orderstatus")
        .select(
            "o_orderstatus",
            "n_orders",
            "pri_1_urgent",
            "pri_2_high",
            "pri_3_medium",
            "pri_4_not_specified",
            "pri_5_low",
        )
        .orderBy("o_orderstatus")
    )
