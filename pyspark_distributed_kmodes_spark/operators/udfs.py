"""Remaining SURVEY §2 UDF-surface rows: grouped-agg pandas UDAF,
mapInArrow, Python UDTF, plus the right-join demonstration.

These close the last unimplemented SURVEY rows. Each stays on the Arrow
fast path (grouped-agg pandas_udf / mapInArrow) — no row-at-a-time
Python anywhere — and carries a DuckDB oracle so the driver hash-gates
it like any relational operator.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_distributed_kmodes_spark.registry import query
from pyspark_distributed_kmodes_spark.sources.tables import table


@query(
    "qo01_grouped_agg_udaf",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       round(sqrt(CAST(SUM(CAST(round(o_totalprice * 100) AS HUGEINT)
                           * CAST(round(o_totalprice * 100) AS HUGEINT)) AS DOUBLE)
                  / COUNT(*)) / 100.0, 6) AS rms_price
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("udf", "agg"),
)
def qo01_grouped_agg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom mergeable metric as a GROUPED-AGG pandas UDF (SURVEY §2
    "custom cost metrics" row): root-mean-square order price per
    priority, computed inside `.agg()`. (Spark disallows mixing
    grouped-agg pandas UDFs with built-in aggregates in one agg — so
    the row count is a second tiny pandas UDAF.)

    Determinism: the group arrives as an arbitrarily-ordered pandas
    Series, so float summation would drift run-to-run; the UDF sums
    exact integer cents squared with Python ints (arbitrary precision —
    cents² × group-size overflows int64) and performs ONE float op at
    the end. Scale: grouped-agg UDFs materialize each group on one
    executor — right for bounded group counts like this (5 priorities);
    unbounded-cardinality metrics belong in built-in partial aggs.
    """

    @F.pandas_udf("double")
    def rms_cents(price: pd.Series) -> float:
        import numpy as np

        cents = np.round(price.to_numpy(dtype=np.float64) * 100).astype(np.int64)
        total = sum(int(c) * int(c) for c in cents)  # exact, order-free
        return round(float(np.sqrt(total / len(cents)) / 100.0), 6)

    @F.pandas_udf("bigint")
    def n_rows(price: pd.Series) -> int:
        return len(price)

    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            n_rows("o_totalprice").alias("n_orders"),
            rms_cents("o_totalprice").alias("rms_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "qo02_right_join",
    oracle="""
SELECT n.n_name, s.s_name, s.s_acctbal
FROM (SELECT * FROM supplier WHERE s_acctbal > 9000) s
RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
ORDER BY n.n_name ASC, s.s_name ASC NULLS LAST
""",
    tags=("join",),
)
def qo02_right_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (SURVEY §2 join-family row): high-balance
    suppliers right-joined onto nation — every nation survives, nations
    with no qualifying supplier carry NULL supplier columns.

    Scale: identical plan shape to the left join with sides swapped;
    here the preserved side (nation) is the small one, so Spark can
    still broadcast it (BroadcastHashJoin supports RightOuter with a
    broadcast left/stream right).
    """
    s = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 9000)
    n = table(spark, sf_dir, "nation")
    return (
        s.join(n, s["s_nationkey"] == n["n_nationkey"], "right")
        .select("n_name", "s_name", "s_acctbal")
        .orderBy(F.col("n_name").asc(), F.col("s_name").asc_nulls_last())
    )


@query(
    "qo03_mapinarrow_doc_stats",
    oracle="""
SELECT doc_id,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
FROM documents
ORDER BY doc_id
""",
    tags=("udf", "text"),
)
def qo03_mapinarrow_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow (SURVEY §2 UDTF/mapInArrow row): per-document byte and
    word counts computed directly on Arrow RecordBatches with pyarrow
    compute kernels — zero pandas materialization, zero copies beyond
    the Arrow IPC transfer itself. The right tool when the per-batch
    work is itself vectorizable C (pyarrow.compute / numpy on buffers):
    skips even the Arrow→pandas conversion that mapInPandas pays.
    """
    import pyarrow as pa

    def stats(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc

        for batch in batches:
            text = batch.column("text")
            n_bytes = pc.cast(pc.binary_length(text), pa.int64())
            n_words = pc.cast(pc.add(pc.count_substring(text, " "), 1), pa.int64())
            yield pa.RecordBatch.from_arrays(
                [batch.column("doc_id"), n_bytes, n_words],
                names=["doc_id", "n_bytes", "n_words"],
            )

    d = table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", "text")
        .mapInArrow(stats, "doc_id bigint, n_bytes bigint, n_words bigint")
        .orderBy("doc_id")
    )


@query(
    "qo04_udtf_first_words",
    oracle="""
SELECT doc_id, CAST(s.pos AS INTEGER) AS pos, s.word
FROM (
  SELECT doc_id,
         unnest(list_transform(range(1, least(len(string_split(text, ' ')), 3) + 1),
                i -> {'pos': i - 1, 'word': string_split(text, ' ')[i]})) AS s
  FROM documents
) t
ORDER BY doc_id, pos
""",
    tags=("udf", "text"),
)
def qo04_udtf_first_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function, SURVEY §2 UDTF row): expands each
    document into its first 3 (pos, word) rows — the one-row-in,
    many-rows-out shape (tokenizers, parsers, span extractors) that
    scalar UDFs can't express.

    Scale note: UDTFs run row-at-a-time in Python — fine for low-volume
    expansion stages; the hot-path equivalents here remain the JVM
    posexplode/transform forms (q43/q44). This query exists to cover the
    API surface with a hash-gated oracle.
    """
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="pos int, word string")
    class FirstWords:
        def eval(self, text: str, n: int):
            for i, w in enumerate(text.split(" ")[:n]):
                yield i, w

    spark.udtf.register("first_words", FirstWords)
    d = table(spark, sf_dir, "documents")
    return (
        d.lateralJoin(FirstWords(F.col("text").outer(), lit(3)))
        .select("doc_id", "pos", "word")
        .orderBy("doc_id", "pos")
    )


@query(
    "qb41_applyinarrow_source_stats",
    oracle="""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
       CAST(MAX(len(string_split(text, ' '))) AS BIGINT) AS max_words
FROM documents
GROUP BY source
ORDER BY source
""",
    tags=("udf", "text"),
)
def qb41_applyinarrow_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped applyInArrow (the grouped-map sibling of b03's
    mapInArrow): per-source corpus stats computed on a whole group as
    one Arrow Table with pyarrow compute kernels — no pandas
    materialization. Exact integer outputs, so unlike most UDF showcase
    queries this one is hash-gated against the SQL oracle.

    Scale: one shuffle on the grouping key; each group is vectorized C
    on Arrow buffers. Use built-in aggs when they exist (this oracle IS
    one) — the pattern earns its keep when the per-group logic has no
    JVM equivalent (tokenizers, model featurizers) but is still
    columnar.
    """
    import pyarrow as pa

    def stats(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        text = tbl.column("text")
        n_words = pc.add(pc.count_substring(text, " "), 1)
        return pa.table(
            {
                "source": [tbl.column("source")[0].as_py()],
                "n_docs": [tbl.num_rows],
                "total_bytes": [pc.sum(pc.binary_length(text)).as_py()],
                "max_words": [pc.max(n_words).as_py()],
            },
            schema=pa.schema(
                [
                    ("source", pa.string()),
                    ("n_docs", pa.int64()),
                    ("total_bytes", pa.int64()),
                    ("max_words", pa.int64()),
                ]
            ),
        )

    d = table(spark, sf_dir, "documents")
    return (
        d.select("source", "text")
        .groupBy("source")
        .applyInArrow(stats, "source string, n_docs bigint, total_bytes bigint, max_words bigint")
        .orderBy("source")
    )
