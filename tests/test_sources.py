"""Source/sink round-trips: CSV and JSON scans with explicit schemas,
partitioned parquet sink."""

import os
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyspark_distributed_kmodes_spark.sources.tables import read_csv, read_json, table, write_parquet


def test_csv_roundtrip(spark, sf_dir):
    nation = table(spark, sf_dir, "nation")
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "nation_csv")
        nation.write.option("header", True).csv(path)
        schema = T.StructType(
            [
                T.StructField("n_nationkey", T.IntegerType()),
                T.StructField("n_name", T.StringType()),
                T.StructField("n_regionkey", T.IntegerType()),
            ]
        )
        back = read_csv(spark, path, schema)
        assert sorted(r.n_name for r in back.collect()) == sorted(r.n_name for r in nation.collect())


def test_json_roundtrip(spark, sf_dir):
    region = table(spark, sf_dir, "region")
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "region_json")
        region.write.json(path)
        schema = T.StructType(
            [T.StructField("r_regionkey", T.IntegerType()), T.StructField("r_name", T.StringType())]
        )
        back = read_json(spark, path, schema)
        assert back.count() == region.count()


def test_partitioned_parquet_sink(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "docs_by_lang")
        write_parquet(docs, path, partition_by=["lang"])
        langs = {e.split("=")[1] for e in os.listdir(path) if e.startswith("lang=")}
        assert langs == {r.lang for r in docs.select("lang").distinct().collect()}
        back = spark.read.parquet(path)
        assert back.count() == docs.count()


def test_jsonl_python_datasource(spark, tmp_path):
    """Custom Python Data Source: file-per-partition JSONL reads with
    schema-driven projection."""
    import json

    from pyspark_distributed_kmodes_spark.sources import jsonl

    for shard in range(3):
        with open(tmp_path / f"shard-{shard}.jsonl", "w") as f:
            for i in range(10):
                doc = {"doc_id": shard * 10 + i, "text": f"doc {shard} {i}", "lang": "en", "extra": "ignored"}
                f.write(json.dumps(doc) + "\n")

    jsonl.register(spark)
    df = (
        spark.read.format("jsonl_docs")
        .schema("doc_id long, text string, lang string")
        .option("path", str(tmp_path / "shard-*.jsonl"))
        .load()
    )
    assert df.rdd.getNumPartitions() == 3  # one partition per shard file
    rows = df.orderBy("doc_id").collect()
    assert len(rows) == 30
    assert rows[0].doc_id == 0 and rows[0].text == "doc 0 0" and rows[0].lang == "en"
    assert rows[29].doc_id == 29
    # missing fields in the narrowed schema surface as NULL, extras drop
    df2 = (
        spark.read.format("jsonl_docs")
        .schema("doc_id long, source string")
        .option("path", str(tmp_path / "shard-*.jsonl"))
        .load()
    )
    r = df2.orderBy("doc_id").first()
    assert r.doc_id == 0 and r.source is None
