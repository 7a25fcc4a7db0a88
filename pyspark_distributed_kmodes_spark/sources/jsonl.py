"""Python Data Source (Spark 4 `pyspark.sql.datasource`): a JSONL
document reader — the wire format training corpora actually ship in
(one JSON object per line, typically gzip'd per shard).

Demonstrates the full custom-source contract: name/schema/reader,
file-per-partition planning (each shard file becomes one input
partition, so a 10k-shard corpus reads with 10k-way parallelism and
per-file locality), and schema-driven column projection (only fields
in the declared schema are materialized from each JSON line).

Spark's built-in `spark.read.json` covers plain JSONL already; this
source exists to exercise the extension API the same way a proprietary
corpus format (tar shards, recordio, …) would plug in.
"""

from __future__ import annotations

import glob as _glob
import json

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class JsonlFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class JsonlDocsReader(DataSourceReader):
    def __init__(self, options: dict, schema):
        self.paths = sorted(_glob.glob(options["path"]))
        if not self.paths:
            raise FileNotFoundError(f"jsonl_docs: no files match {options['path']!r}")
        self.fields = [f.name for f in schema.fields]

    def partitions(self):
        # one partition per shard file: the natural parallelism unit of
        # a JSONL corpus; at 100 TB the driver holds only file names
        return [JsonlFilePartition(p) for p in self.paths]

    def read(self, partition: JsonlFilePartition):
        with open(partition.path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                obj = json.loads(line)
                yield tuple(obj.get(k) for k in self.fields)


class JsonlDocsDataSource(DataSource):
    """Usage:
        spark.dataSource.register(JsonlDocsDataSource)
        spark.read.format("jsonl_docs")
             .schema("doc_id bigint, text string")
             .option("path", "/data/shard-*.jsonl").load()
    """

    @classmethod
    def name(cls) -> str:
        return "jsonl_docs"

    def schema(self) -> str:
        # default documents-table schema; callers narrow it with
        # .schema(...) and only those fields are parsed per line
        return "doc_id bigint, text string, lang string, source string, n_chars bigint"

    def reader(self, schema) -> JsonlDocsReader:
        return JsonlDocsReader(self.options, schema)


def register(spark) -> None:
    spark.dataSource.register(JsonlDocsDataSource)
