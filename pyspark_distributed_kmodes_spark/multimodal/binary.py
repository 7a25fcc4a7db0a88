"""Multimodal columns: opaque binary payloads + typed metadata.

The engine's contract for image/audio/video at 100 TB: the payload is an
opaque `binary` column; metadata is typed columns next to it; decode /
feature-extract runs as Arrow-batched `mapInPandas` so bytes never
round-trip through Python row-at-a-time.

The container has no image/audio codecs, so `decode_image` /
`decode_audio` STUB the real decode behind NotImplementedError and the
pipeline is exercised end-to-end with `fake_decode_meta`, a
deterministic byte-level "decoder" (length-derived dimensions). The
Spark-side plumbing — schema, batching, UDF signature — is the real,
tested article; swapping in PIL/librosa changes only the body of one
function.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyspark_distributed_kmodes_spark.registry import query
from pyspark_distributed_kmodes_spark.sources.tables import table

META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def decode_image(payload: bytes):
    """Real image decode — requires a codec library not present in this
    container. The deterministic fake below exercises the identical
    plumbing."""
    raise NotImplementedError("image codec not available in this environment; use fake_decode_meta")


def decode_audio(payload: bytes):
    raise NotImplementedError("audio codec not available in this environment; use fake_decode_meta")


def fake_decode_meta(doc_ids: pd.Series, payloads: pd.Series) -> pd.DataFrame:
    """Deterministic stand-in decoder: derives dimensions from payload
    length only, so the oracle can reproduce it from n_chars."""
    lens = payloads.map(len)
    return pd.DataFrame(
        {
            "doc_id": doc_ids,
            "byte_len": lens,
            "width": (lens % 640).astype("int32"),
            "height": (lens * 7 % 480).astype("int32"),
            "n_frames": (lens % 16).astype("int32"),
        }
    )


def with_blob(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary payload column (UTF-8 bytes of text here;
    in production this is the raw media payload from parquet/tar)."""
    return docs.withColumn("payload", F.encode(F.col("text"), "utf-8"))


@query(
    "qo80_multimodal_decode",
    oracle="""
SELECT doc_id,
       CAST(n_chars AS BIGINT) AS byte_len,
       CAST(n_chars % 640 AS INTEGER) AS width,
       CAST(n_chars * 7 % 480 AS INTEGER) AS height,
       CAST(n_chars % 16 AS INTEGER) AS n_frames
FROM documents
ORDER BY doc_id
""",
    tags=("multimodal",),
)
def qo80_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode pipeline: text → binary payload → mapInPandas
    "decode" → typed metadata. The oracle reproduces the deterministic
    fake from n_chars (text is ASCII: byte_len == n_chars)."""
    docs = with_blob(table(spark, sf_dir, "documents"))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield fake_decode_meta(pdf["doc_id"], pdf["payload"])

    return docs.select("doc_id", "payload").mapInPandas(decode, META_SCHEMA).orderBy("doc_id")


@query(
    "qo81_multimodal_filter_join",
    oracle="""
SELECT d.lang,
       COUNT(*) AS n_large,
       CAST(SUM(CAST(d.n_chars AS BIGINT)) AS BIGINT) AS total_bytes
FROM documents d
WHERE d.n_chars % 640 >= 200
GROUP BY d.lang
ORDER BY d.lang
""",
    tags=("multimodal",),
)
def qo81_multimodal_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-predicate scan over decoded multimodal columns: filter on
    decoded width, aggregate payload bytes per lang — the "select the
    frames worth training on" access pattern."""
    docs = with_blob(table(spark, sf_dir, "documents"))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield fake_decode_meta(pdf["doc_id"], pdf["payload"])

    meta = docs.select("doc_id", "payload").mapInPandas(decode, META_SCHEMA)
    d = table(spark, sf_dir, "documents")
    return (
        meta.filter(F.col("width") >= 200)
        .join(d.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_large"), F.sum("byte_len").cast("bigint").alias("total_bytes"))
        .orderBy("lang")
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_hist", T.ArrayType(T.LongType())),
        T.StructField("sampled_frames", T.ArrayType(T.IntegerType())),
    ]
)


def extract_features(doc_ids: pd.Series, payloads: pd.Series) -> pd.DataFrame:
    """Deterministic byte-level feature extraction: 8-bin histogram of
    byte values (numpy bincount per Arrow batch) + every-2nd-frame
    sample indexes from the fake decoder's frame count. The real
    image/audio featurizer replaces only this function body."""
    import numpy as np

    hists, frames = [], []
    for p in payloads:
        arr = np.frombuffer(p, dtype=np.uint8)
        hists.append(np.bincount(arr >> 5, minlength=8).astype("int64").tolist())
        n_frames = len(p) % 16
        frames.append(list(range(0, n_frames, 2)))
    return pd.DataFrame({"doc_id": doc_ids, "byte_hist": hists, "sampled_frames": frames})


@query(
    "qo82_multimodal_features",
    oracle="""
WITH feats AS (
  SELECT doc_id,
         list_transform(range(0, 8),
           b -> CAST(len(list_filter(list_transform(list_filter(string_split(text, ''), c -> c <> ''),
                                                    c -> ascii(c) // 32),
                                     v -> v = b)) AS BIGINT)) AS byte_hist,
         list_transform(range(0, CAST(ceil((n_chars % 16) / 2.0) AS BIGINT)),
                        i -> i * 2) AS sampled_frames
  FROM documents
)
SELECT doc_id,
       byte_hist[1] AS h0, byte_hist[2] AS h1, byte_hist[3] AS h2, byte_hist[4] AS h3,
       byte_hist[5] AS h4, byte_hist[6] AS h5, byte_hist[7] AS h6, byte_hist[8] AS h7,
       COALESCE(array_to_string(sampled_frames, ','), '') AS frames
FROM feats
ORDER BY doc_id
""",
    tags=("multimodal",),
)
def qo82_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads: Arrow-batched numpy
    histogramming + frame-index sampling via mapInPandas. The oracle
    reproduces both from the text (ASCII payload: byte == ascii(char),
    byte>>5 == ascii//32; frame count == n_chars % 16). Output is
    flattened to scalar columns (histogram bins h0..h7, frames as a
    joined string) so the hash oracle compares scalars, not arrays."""
    docs = with_blob(table(spark, sf_dir, "documents"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield extract_features(pdf["doc_id"], pdf["payload"])

    feats = docs.select("doc_id", "payload").mapInPandas(run, FEATURE_SCHEMA)
    return feats.select(
        "doc_id",
        *[F.element_at("byte_hist", i + 1).alias(f"h{i}") for i in range(8)],
        F.array_join(F.transform("sampled_frames", lambda x: x.cast("string")), ",").alias("frames"),
    ).orderBy("doc_id")


def resize_image(payload: bytes, width: int, height: int):
    """Real image resize — requires a codec/imaging library not present
    in this container (same contract as decode_image)."""
    raise NotImplementedError("imaging library not available; use fake_resize_meta")


def fake_resize_meta(meta: pd.DataFrame, scale_num: int = 1, scale_den: int = 2) -> pd.DataFrame:
    """Deterministic resize stand-in over decoded metadata: integer
    rescale of width/height (floor), preserving ids. Real resize swaps
    this body and additionally rewrites the payload column."""
    out = meta.copy()
    out["width"] = (out["width"] * scale_num // scale_den).astype("int32")
    out["height"] = (out["height"] * scale_num // scale_den).astype("int32")
    return out


def resized_meta(docs: DataFrame) -> DataFrame:
    """decode → resize pipeline as one mapInPandas pass (decode and
    transform fuse into a single Python stage — no extra exchange)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield fake_resize_meta(fake_decode_meta(pdf["doc_id"], pdf["payload"]))

    return with_blob(docs).select("doc_id", "payload").mapInPandas(run, META_SCHEMA)
