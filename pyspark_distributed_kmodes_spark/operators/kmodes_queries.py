"""queries() entries exposing the k-modes capability (rows-only checks —
clustering is not ANSI-SQL-expressible; properties are verified in
tests/test_kmodes.py: fixed-seed determinism, cost monotonicity,
non-empty clusters, label-permutation invariance)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark_distributed_kmodes_spark.ml.kmodes import EnsembleKModes, KModes
from pyspark_distributed_kmodes_spark.registry import query
from pyspark_distributed_kmodes_spark.sources.tables import table

KMODES_COLS = ("o_orderstatus", "o_orderpriority")


@query("qo70_kmodes_fit", oracle=None, tags=("kmodes", "ml"), bench=True)
def qo70_kmodes_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global Lloyd k-modes (k=5) on orders categorical columns; returns
    per-cluster size + mode — the DataFrame-native form of the
    reference's EnsembleKModes.fit output (modes + assignment counts)."""
    o = table(spark, sf_dir, "orders")
    model = KModes(n_clusters=5, cols=KMODES_COLS, max_iter=20, seed=42).fit(o)
    assigned = model.transform(o.select(*KMODES_COLS), "cluster")
    sizes = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_members"))
    # modes are driver-side constants — attach them as literal map
    # lookups (zero extra jobs; createDataFrame/broadcast-join of a tiny
    # frame costs seconds of fixed overhead per session)
    mode_cols = []
    for j, c in enumerate(KMODES_COLS):
        m = F.map_from_arrays(
            F.array(*[F.lit(i) for i in range(len(model.modes))]),
            F.array(*[F.lit(mode[j]) for mode in model.modes]),
        )
        mode_cols.append(F.element_at(m, F.col("cluster")).alias(f"mode_{c}"))
    return sizes.select("cluster", "n_members", *mode_cols).orderBy("cluster")


@query("qo71_kmodes_ensemble_fit", oracle=None, tags=("kmodes", "ml"))
def qo71_kmodes_ensemble_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-parity two-level ensemble k-modes (A6/A9): independent
    per-partition k-modes via applyInPandas, meta-clustering on driver."""
    o = table(spark, sf_dir, "orders")
    est = EnsembleKModes(n_partitions=4, n_clusters=5, seed=42, cols=KMODES_COLS)
    model = est.fit(o.select(*KMODES_COLS))
    assigned = model.transform(o.select(*KMODES_COLS), "cluster")
    return (
        assigned.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy("cluster")
    )


@query("qo72_kmodes_predict", oracle=None, tags=("kmodes", "ml"))
def qo72_kmodes_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """model.predict parity (reference A10): fit on orders, transform the
    same relation, emit (keys → cluster) for every row."""
    o = table(spark, sf_dir, "orders")
    model = KModes(n_clusters=4, cols=KMODES_COLS, max_iter=20, seed=7).fit(o)
    return (
        model.transform(o, "prediction")
        .select("o_orderkey", "o_orderstatus", "o_orderpriority", "prediction")
        .orderBy("o_orderkey")
    )


@query("qe16_kmodes_silhouette", oracle=None, tags=("kmodes", "ml"))
def qe16_kmodes_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-quality validation for the fitted k-modes model: the
    mode-based silhouette report (ml/metrics.py) — per-cluster size,
    mean and min silhouette, plus the overall row (cluster = −1). The
    "is k right?" gate run after every q70-style fit; pairwise-free, so
    it costs one scan + one aggregate at any corpus size.

    Rows-only (depends on the iterative fit); bounds, degenerate-case
    and hand-computed values are pinned in tests/test_metrics.py.
    """
    from pyspark_distributed_kmodes_spark.ml.kmodes import KModes
    from pyspark_distributed_kmodes_spark.ml.metrics import silhouette_report

    o = table(spark, sf_dir, "orders")
    model = KModes(n_clusters=5, cols=KMODES_COLS, max_iter=20, seed=42).fit(o)
    return silhouette_report(model, o.select(*KMODES_COLS))


@query(
    "ql01_kmodes_assign_audit",
    oracle="""
WITH combos AS (
  SELECT o_orderstatus AS s, o_orderpriority AS p, CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY 1, 2
), modes AS (
  SELECT s, p, CAST(ROW_NUMBER() OVER (ORDER BY c DESC, s ASC, p ASC) - 1 AS INTEGER) AS idx
  FROM combos QUALIFY idx < 4
), assigned AS (
  SELECT o.o_orderkey,
         MIN((CASE WHEN o.o_orderstatus <> m.s THEN 1 ELSE 0 END)
             + (CASE WHEN o.o_orderpriority <> m.p THEN 1 ELSE 0 END)) AS dist,
         MIN_BY(m.idx, ((CASE WHEN o.o_orderstatus <> m.s THEN 1 ELSE 0 END)
                        + (CASE WHEN o.o_orderpriority <> m.p THEN 1 ELSE 0 END)) * 10 + m.idx) AS cluster
  FROM orders o CROSS JOIN modes m
  GROUP BY o.o_orderkey
)
SELECT a.cluster AS cluster,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(a.dist) AS BIGINT) AS total_cost,
       MAX(m.s) AS mode_status,
       MAX(m.p) AS mode_priority
FROM assigned a JOIN modes m ON m.idx = a.cluster
GROUP BY a.cluster
ORDER BY cluster
""",
    tags=("kmodes", "ml"),
)
def ql01_kmodes_assign_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HASH-GATED audit of the k-modes ASSIGNMENT path (reference
    A4/A10): with the model FIXED to a deterministic set of modes (the
    4 most frequent (status, priority) combos, count-desc lexicographic
    tie-break), `KModesModel.transform` — the REAL
    `ml/kmodes.py` argmin-Hamming expression, not a SQL re-phrase — is
    run over all orders and its per-cluster sizes, total Hamming cost
    and mode labels are value-hash-matched against a DuckDB replay of
    the same assignment rule. Fitting stays rows-only by design
    (iterative, q70-q72), but assignment is pure algebra once modes are
    fixed, so this converts the transform half of the k-modes
    capability from property-tested to oracle-gated.

    Scale: the mode table is 4 driver-side rows (bounded scalar
    collect, house-allowed); transform is the zero-shuffle JVM
    array_min expression; the rollup is one map-side-combined groupBy.
    """
    from pyspark_distributed_kmodes_spark.ml.kmodes import KModesModel

    o = table(spark, sf_dir, "orders")
    combos = (
        o.groupBy(F.col("o_orderstatus").alias("s"), F.col("o_orderpriority").alias("p"))
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("s"), F.asc("p"))
        .limit(4)
        .collect()
    )  # 4-row model constant: the fixed modes
    modes = [(r.s, r.p) for r in combos]
    model = KModesModel(cols=KMODES_COLS, modes=modes)
    assigned = model.transform(o.select(*KMODES_COLS), "cluster")
    from pyspark_distributed_kmodes_spark.ml.kmodes import hamming_distance_col

    per_mode_dist = F.array(
        *[hamming_distance_col(KMODES_COLS, m) for m in modes]
    )
    assigned = assigned.withColumn("dist", F.element_at(per_mode_dist, F.col("cluster") + 1))
    sizes = assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.sum("dist").cast("bigint").alias("total_cost"),
    )
    status_map = F.map_from_arrays(
        F.array(*[F.lit(i) for i in range(len(modes))]),
        F.array(*[F.lit(m[0]) for m in modes]),
    )
    prio_map = F.map_from_arrays(
        F.array(*[F.lit(i) for i in range(len(modes))]),
        F.array(*[F.lit(m[1]) for m in modes]),
    )
    return sizes.select(
        "cluster",
        "n_members",
        "total_cost",
        F.element_at(status_map, F.col("cluster")).alias("mode_status"),
        F.element_at(prio_map, F.col("cluster")).alias("mode_priority"),
    ).orderBy("cluster")


@query(
    "ql03_kmodes_silhouette_audit",
    oracle="""
WITH combos AS (
  SELECT o_orderstatus AS s, o_orderpriority AS p, CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY 1, 2
), modes AS (
  SELECT s, p, CAST(ROW_NUMBER() OVER (ORDER BY c DESC, s ASC, p ASC) - 1 AS INTEGER) AS idx
  FROM combos QUALIFY idx < 4
), assigned AS (
  SELECT cb.s, cb.p, cb.c,
         MIN_BY(m.idx, ((CASE WHEN cb.s <> m.s THEN 1 ELSE 0 END)
                        + (CASE WHEN cb.p <> m.p THEN 1 ELSE 0 END)) * 10 + m.idx) AS cl
  FROM combos cb CROSS JOIN modes m
  GROUP BY cb.s, cb.p, cb.c
), pair AS (
  SELECT x.s, x.p, x.c, x.cl,
         y.cl AS ycl,
         CAST(SUM(((CASE WHEN x.s <> y.s THEN 1 ELSE 0 END)
                   + (CASE WHEN x.p <> y.p THEN 1 ELSE 0 END)) * y.c) AS BIGINT) AS dsum,
         CAST(SUM(y.c) AS BIGINT) AS ncl
  FROM assigned x JOIN assigned y ON TRUE
  GROUP BY x.s, x.p, x.c, x.cl, y.cl
), ab AS (
  SELECT s, p, c, cl,
         MAX(CASE WHEN ycl = cl THEN CAST(dsum AS DOUBLE) / NULLIF(ncl - 1, 0) END) AS a,
         MIN(CASE WHEN ycl <> cl THEN CAST(dsum AS DOUBLE) / ncl END) AS b
  FROM pair GROUP BY s, p, c, cl
), sil AS (
  SELECT cl, c,
         CASE WHEN a IS NULL OR b IS NULL OR GREATEST(a, b) = 0 THEN 0.0
              ELSE (b - a) / GREATEST(a, b) END AS s_x
  FROM ab
)
SELECT CAST(cl AS INTEGER) AS cluster,
       CAST(SUM(c) AS BIGINT) AS n_members,
       {SW} AS mean_silhouette
FROM sil GROUP BY cl
ORDER BY cluster
""".replace(
        "{SW}",
        "(CAST(SUM(CAST((CAST(floor((s_x) * 1000000000.0 + 0.5) AS DOUBLE) / 1000000000.0) * c AS DECIMAL(25,12))) AS DOUBLE) / SUM(c))",
    ),
    tags=("kmodes", "ml"),
)
def ql03_kmodes_silhouette_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HASH-GATED silhouette for the fixed-modes k-modes assignment
    (l01's model): with the clustering FIXED, the categorical
    silhouette is EXACT algebra over the (status, priority) combo
    DICTIONARY — a(x) = weighted mean Hamming distance to own-cluster
    members (self excluded), b(x) = min other-cluster mean, s(x) =
    (b-a)/max(a,b) — so the quality metric qe16 can only property-test
    for a FITTED model becomes value-hash-gated here (singleton
    clusters score 0 by the standard convention). Per-combo s(x) is
    quantized to the 1e-9 grid and DECIMAL-weighted into cluster means.

    Scale: everything runs on the bounded combo dictionary (~10 rows;
    pairwise = ~100 cells); raw orders are touched once by the combo
    count. The same shape holds at any row count.
    """
    o = table(spark, sf_dir, "orders")
    combos = o.groupBy(F.col("o_orderstatus").alias("s"), F.col("o_orderpriority").alias("p")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wm = Window.orderBy(F.desc("c"), F.asc("s"), F.asc("p"))
    modes = combos.withColumn("idx", (F.row_number().over(wm) - 1).cast("int")).filter(
        F.col("idx") < 4
    ).select("s", "p", "idx")
    cb, m = combos.alias("cb"), modes.alias("m")
    dist_to_mode = (
        (F.col("cb.s") != F.col("m.s")).cast("int") + (F.col("cb.p") != F.col("m.p")).cast("int")
    )
    assigned = (
        cb.crossJoin(F.broadcast(m))
        .groupBy(F.col("cb.s").alias("s"), F.col("cb.p").alias("p"), F.col("cb.c").alias("c"))
        .agg(F.min_by(F.col("m.idx"), dist_to_mode * 10 + F.col("m.idx")).alias("cl"))
    )
    x, y = assigned.alias("x"), assigned.alias("y")
    d = (F.col("x.s") != F.col("y.s")).cast("int") + (F.col("x.p") != F.col("y.p")).cast("int")
    pair = (
        x.crossJoin(F.broadcast(y))
        .groupBy(
            F.col("x.s").alias("s"),
            F.col("x.p").alias("p"),
            F.col("x.c").alias("c"),
            F.col("x.cl").alias("cl"),
            F.col("y.cl").alias("ycl"),
        )
        .agg(
            F.sum(d * F.col("y.c")).cast("bigint").alias("dsum"),
            F.sum(F.col("y.c")).cast("bigint").alias("ncl"),
        )
    )
    ab = pair.groupBy("s", "p", "c", "cl").agg(
        F.max(
            F.when(
                F.col("ycl") == F.col("cl"),
                F.col("dsum").cast("double") / F.nullif(F.col("ncl") - 1, F.lit(0)),
            )
        ).alias("a"),
        F.min(
            F.when(F.col("ycl") != F.col("cl"), F.col("dsum").cast("double") / F.col("ncl"))
        ).alias("b"),
    )
    s_x = F.when(
        F.col("a").isNull() | F.col("b").isNull() | (F.greatest("a", "b") == 0), F.lit(0.0)
    ).otherwise((F.col("b") - F.col("a")) / F.greatest("a", "b"))
    sil = ab.select("cl", "c", s_x.alias("s_x"))
    from pyspark_distributed_kmodes_spark.functions.deterministic import pround as _pr

    return (
        sil.groupBy(F.col("cl").cast("int").alias("cluster"))
        .agg(
            F.sum("c").cast("bigint").alias("n_members"),
            (
                F.sum((_pr(F.col("s_x"), 9) * F.col("c")).cast("decimal(25,12)")).cast("double")
                / F.sum("c")
            ).alias("mean_silhouette"),
        )
        .orderBy("cluster")
    )
