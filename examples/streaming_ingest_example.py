"""Streaming corpus ingestion end to end: JSONL shards arrive over
time, stream through the custom Python Data Source, pass the quality
gate, and merge into a deduplicated parquet corpus via the foreachBatch
upsert sink — the continuous-ingestion loop of a training-data
pipeline, runnable on a laptop and shaped for a cluster.

    python examples/streaming_ingest_example.py [sf_dir]
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from pyspark_distributed_kmodes_spark import pipeline as P
from pyspark_distributed_kmodes_spark.session import get_spark
from pyspark_distributed_kmodes_spark.sources import jsonl
from pyspark_distributed_kmodes_spark.sources.tables import table
from pyspark_distributed_kmodes_spark.streaming.jobs import upsert_sink_stream


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("streaming-ingest-example")
    jsonl.register(spark)

    work = tempfile.mkdtemp(prefix="stream_ingest_")
    shards, target, ckpt = f"{work}/shards", f"{work}/corpus", f"{work}/ckpt"
    os.makedirs(shards)

    docs = table(spark, sf_dir, "documents").collect()
    half = len(docs) // 2

    def write_shard(name, rows):
        with open(f"{shards}/{name}.jsonl", "w") as f:
            for r in rows:
                f.write(json.dumps({"doc_id": r.doc_id, "text": r.text, "source": r.source}) + "\n")

    def drain():
        stream = (
            spark.readStream.format("jsonl_docs")
            .schema("doc_id bigint, text string, source string")
            .option("path", f"{shards}/*.jsonl")
            # shards here are complete the instant they exist (single
            # atomic write below), so the in-flight-shard stability
            # window can be disabled; producers that write in place
            # should keep the default
            .option("stability_sec", "0")
            .load()
        )
        upsert_sink_stream(spark, stream, target, ["doc_id"], ["doc_id"])

    # batch 1 arrives
    write_shard("shard-000", docs[:half])
    drain()
    n1 = spark.read.parquet(target).count()
    print(f"after shard-000: corpus rows = {n1}")

    # batch 2 arrives (with some overlap to exercise the upsert)
    write_shard("shard-001", docs[half - 50 :])
    drain()
    corpus = spark.read.parquet(target)
    n2 = corpus.count()
    print(f"after shard-001: corpus rows = {n2} (overlap upserted, not duplicated)")
    assert n2 == len(docs), (n2, len(docs))

    # quality-gate the corpus with free in-flight metrics
    staged, obs = P.with_stage_metrics(P.quality_filter(corpus), "quality")
    kept = staged.count()
    print(f"quality gate kept {kept}/{n2}; metrics = {obs.get}")

    spark.stop()


if __name__ == "__main__":
    main()
