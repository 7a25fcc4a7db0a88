"""Python Data Source (Spark 4 `pyspark.sql.datasource`): a JSONL
document reader — the wire format training corpora actually ship in
(one JSON object per line, typically gzip'd per shard).

Demonstrates the full custom-source contract: name/schema/reader,
file-per-partition planning (each shard file becomes one input
partition, so a 10k-shard corpus reads with 10k-way parallelism and
per-file locality), schema-driven column projection (only fields in
the declared schema are materialized from each JSON line), a streaming
reader with file-granularity offsets, and a two-phase-commit batch
WRITER (task-local temp shards renamed by the driver on commit —
JsonlDocsWriter) so the same format round-trips.

Spark's built-in `spark.read.json` covers plain JSONL already; this
source exists to exercise the extension API the same way a proprietary
corpus format (tar shards, recordio, …) would plug in.
"""

from __future__ import annotations

import glob as _glob
import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)


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


class JsonlDocsStreamReader(SimpleDataSourceStreamReader):
    """Simple streaming reader (pyspark.sql.datasource
    SimpleDataSourceStreamReader contract): tails the glob for NEW shard
    files; the offset is the sorted list of files already consumed, so
    restarts from a checkpoint replay exactly the unread shards —
    exactly-once PER FILE, provided each shard is complete when
    consumed. Two guards make that hold:

    - Producers should write shards to a temp name and rename into the
      glob (rename is atomic on every FS this targets), so a matching
      file is complete by construction.
    - Defense in depth for producers that write in place: a file whose
      mtime is younger than `stability_sec` (option, default 2 s,
      0 disables) is NOT consumed this batch — it stays out of the
      offset and is picked up once it stops changing. Without this, a
      half-written shard would be read partially and its later rows
      silently lost forever (the offset marks the whole file done).

    Memory note (SimpleDataSourceStreamReader contract): offsets carry
    file NAMES only, but `read` runs ON THE DRIVER and materializes
    each micro-batch's rows into a driver-side list (the engine's
    prefetch wrapper pickles it for replay). Per-batch driver memory is
    therefore bounded by the size of the new shards in that batch —
    size shards accordingly, or use the partition-based
    DataSourceStreamReader API (one partition per shard, rows read on
    executors) for corpora whose shards don't fit on the driver.
    """

    def __init__(self, options: dict, schema):
        self.glob = options["path"]
        self.fields = [f.name for f in schema.fields]
        self.stability_sec = float(options.get("stability_sec", "2"))

    def initialOffset(self):
        return {"done": []}

    def _rows(self, paths):
        # materialized (not a generator): the engine's prefetching
        # wrapper caches the batch for replay, which requires pickling
        rows = []
        for path in paths:
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        obj = json.loads(line)
                        rows.append(tuple(obj.get(k) for k in self.fields))
        return rows

    def read(self, start):
        import os
        import time

        done = set(start["done"])
        now = time.time()
        new = []
        for p in sorted(_glob.glob(self.glob)):
            if p in done:
                continue
            try:
                if self.stability_sec > 0 and now - os.path.getmtime(p) < self.stability_sec:
                    continue  # possibly still being written: defer, don't mark done
            except OSError:
                continue  # vanished between glob and stat: not consumed
            new.append(p)
        end = {"done": sorted(done | set(new))}
        return self._rows(new), end

    def readBetweenOffsets(self, start, end):
        # deterministic replay for recovery: exactly the files that are
        # in `end` but not in `start`
        replay = sorted(set(end["done"]) - set(start["done"]))
        return self._rows(replay)

    def commit(self, end):
        pass


class JsonlShardCommit(WriterCommitMessage):
    """One successful task's output: the temp shard it wrote (must be
    picklable — plain attributes only)."""

    def __init__(self, tmp_path: str, n_rows: int):
        self.tmp_path = tmp_path
        self.n_rows = n_rows


class JsonlDocsWriter(DataSourceWriter):
    """Batch sink half of the contract: two-phase commit with task-local
    temp shards.

    Each task streams its partition to `_tmp-<uuid>.jsonl` inside the
    target directory (executor-side, one pass, no buffering of the
    partition in memory) and reports the file in its commit message.
    The DRIVER then makes the job atomic-per-job:

    - commit(): rename each reported temp shard to
      `part-<i>-<uuid>.jsonl` (rename is atomic on the target FS); in
      overwrite mode, delete the previously committed `part-*` files
      first; finally sweep any `_tmp-*` leftovers (failed / speculative
      task attempts that never made it into a commit message).
    - abort(): delete reported temp shards; readers never see them
      because the reader/stream glob should target `part-*.jsonl`.

    Exactly-once per job: a retried task writes a DIFFERENT uuid temp
    file and only the attempt whose message reaches commit() is renamed
    — duplicated attempts are swept, never published. At 100 TB the
    driver handles only file names (one message per task).
    """

    def __init__(self, options: dict, schema, overwrite: bool):
        self.dir = options["path"]
        self.fields = [f.name for f in schema.fields]
        self.overwrite = overwrite
        # fault injection for protocol audits (p19): raise after N rows,
        # leaving a partial orphan temp shard on disk — the failure mode
        # the two-phase commit exists to contain
        self.fail_after = int(options.get("fail_after", "0"))

    def write(self, iterator):
        import os
        import uuid

        os.makedirs(self.dir, exist_ok=True)
        tmp = os.path.join(self.dir, f"_tmp-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(dict(zip(self.fields, row)), default=str) + "\n")
                n += 1
                if self.fail_after and n >= self.fail_after:
                    raise RuntimeError(
                        f"jsonl_docs: planted task failure after {n} rows (fail_after)"
                    )
        return JsonlShardCommit(tmp, n)

    def commit(self, messages):
        import os

        if self.overwrite:
            for old in _glob.glob(os.path.join(self.dir, "part-*.jsonl")):
                os.remove(old)
        total = 0
        for i, m in enumerate(messages):
            if m is None:
                continue
            base = os.path.basename(m.tmp_path).replace("_tmp-", "")
            os.rename(m.tmp_path, os.path.join(self.dir, f"part-{i:05d}-{base}"))
            total += m.n_rows
        for stale in _glob.glob(os.path.join(self.dir, "_tmp-*.jsonl")):
            os.remove(stale)  # orphaned attempts: never published
        aborted = os.path.join(self.dir, "_ABORTED")
        if os.path.exists(aborted):
            os.remove(aborted)  # a successful job supersedes a prior abort
        with open(os.path.join(self.dir, "_SUCCESS"), "w") as f:
            f.write(json.dumps({"rows": total, "shards": sum(m is not None for m in messages)}))

    def abort(self, messages):
        import os

        reported = 0
        for m in messages:
            if m is not None:
                reported += 1
                try:
                    os.remove(m.tmp_path)
                except OSError:
                    pass
        # abort ledger: the observable protocol fact p19 audits (a sink
        # consumer must be able to SEE that a job aborted rather than
        # infer it from a missing _SUCCESS)
        try:
            with open(os.path.join(self.dir, "_ABORTED"), "w") as f:
                f.write(json.dumps({"reported_attempts_cleaned": reported}))
        except OSError:
            pass


class JsonlDocsStreamWriter(DataSourceStreamWriter):
    """Streaming sink half: per-micro-batch two-phase commit with a
    batch-id ledger, so REPLAYED batches are exactly-once.

    Tasks write temp shards exactly like the batch writer. The driver's
    commit(messages, batchId) then:

    1. If `batchId` is already in `_commits.jsonl` (Structured
       Streaming re-ran a batch after checkpoint recovery), DELETES the
       new temp shards — the batch's rows are already published;
       re-publishing would double them.
    2. Otherwise removes any `batch-<id>-*` leftovers from a commit
       that crashed mid-rename (publish is not atomic across shards;
       the ledger line is written LAST, so an unledgered batch id may
       own partial files), renames the temp shards to
       `batch-<id>-part-<i>-<uuid>.jsonl`, and appends the ledger line.

    Crash matrix: fail before any rename → replay republishes cleanly;
    fail mid-rename → step 2 sweeps the partials on replay; fail after
    ledger append → step 1 discards the replay. Readers consume
    `batch-*-part-*.jsonl`; temp files and the ledger never match that
    glob. The ledger is one JSON line per batch — at 100 TB the driver
    state stays file names + batch ids.
    """

    def __init__(self, options: dict, schema, overwrite: bool):
        self.dir = options["path"]
        self.fields = [f.name for f in schema.fields]

    def _ledger(self):
        import os

        return os.path.join(self.dir, "_commits.jsonl")

    def _committed(self):
        import os

        ids = set()
        if os.path.exists(self._ledger()):
            with open(self._ledger()) as f:
                for line in f:
                    if line.strip():
                        ids.add(json.loads(line)["batch_id"])
        return ids

    def write(self, iterator):
        import os
        import uuid

        os.makedirs(self.dir, exist_ok=True)
        tmp = os.path.join(self.dir, f"_tmp-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(dict(zip(self.fields, row)), default=str) + "\n")
                n += 1
        return JsonlShardCommit(tmp, n)

    def commit(self, messages, batchId):
        import os

        if batchId in self._committed():
            for m in messages:  # replayed batch: already published
                if m is not None:
                    try:
                        os.remove(m.tmp_path)
                    except OSError:
                        pass
            return
        for partial in _glob.glob(os.path.join(self.dir, f"batch-{batchId:08d}-*")):
            os.remove(partial)  # crashed mid-rename on a previous attempt
        total = 0
        for i, m in enumerate(messages):
            if m is None:
                continue
            base = os.path.basename(m.tmp_path).replace("_tmp-", "")
            os.rename(m.tmp_path, os.path.join(self.dir, f"batch-{batchId:08d}-part-{i:05d}-{base}"))
            total += m.n_rows
        with open(self._ledger(), "a") as f:
            f.write(json.dumps({"batch_id": batchId, "rows": total}) + "\n")

    def abort(self, messages, batchId):
        import os

        for m in messages:
            if m is not None:
                try:
                    os.remove(m.tmp_path)
                except OSError:
                    pass


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

    def simpleStreamReader(self, schema):
        return JsonlDocsStreamReader(self.options, schema)

    def writer(self, schema, overwrite: bool) -> JsonlDocsWriter:
        return JsonlDocsWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> JsonlDocsStreamWriter:
        return JsonlDocsStreamWriter(self.options, schema, overwrite)


def register(spark) -> None:
    spark.dataSource.register(JsonlDocsDataSource)


class JsonlShardsStreamReader(DataSourceStreamReader):
    """PARTITION-BASED streaming reader (pyspark.sql.datasource
    DataSourceStreamReader) — the executor-side sibling of
    JsonlDocsStreamReader's Simple flavor: offsets still carry file
    NAMES only, but each new shard becomes an InputPartition whose rows
    are read ON EXECUTORS in read(partition), so per-batch memory is
    per-task, not driver-side — the flavor a 100 TB shard stream needs
    (the Simple reader's driver-materialized batch is the documented
    limitation it exists to remove).

    Batch pacing: latestOffset() advances at most `files_per_batch`
    (option, default 1) new files past the current committed offset,
    so a backlog replays as a deterministic one-file-per-micro-batch
    sequence (the tercile-staging replay shape).
    """

    def __init__(self, options: dict, schema):
        self.glob = options["path"]
        self.fields = [f.name for f in schema.fields]
        self.files_per_batch = int(options.get("files_per_batch", "1"))
        self._current = {"done": []}

    def initialOffset(self):
        return {"done": []}

    def latestOffset(self):
        done = set(self._current["done"])
        new = sorted(p for p in _glob.glob(self.glob) if p not in done)
        advance = new[: self.files_per_batch]
        self._current = {"done": sorted(done | set(advance))}
        return self._current

    def partitions(self, start, end):
        fresh = sorted(set(end["done"]) - set(start["done"]))
        return [JsonlFilePartition(p) for p in fresh]

    def read(self, partition: JsonlFilePartition):
        # executor-side: one shard per task, streamed line by line
        with open(partition.path) as f:
            for line in f:
                line = line.strip()
                if line:
                    obj = json.loads(line)
                    yield tuple(obj.get(k) for k in self.fields)

    def commit(self, end):
        pass


class JsonlShardsDataSource(DataSource):
    """`jsonl_shards`: the partition-based streaming flavor. Kept as a
    SEPARATE format from `jsonl_docs` so the Simple-reader path that
    qc02 certified stays exactly what it certifies (a DataSource
    exposing streamReader() would shadow simpleStreamReader())."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_shards"

    def schema(self) -> str:
        return "doc_id bigint, text string, lang string, source string, n_chars bigint"

    def reader(self, schema) -> JsonlDocsReader:
        return JsonlDocsReader(self.options, schema)

    def streamReader(self, schema) -> JsonlShardsStreamReader:
        return JsonlShardsStreamReader(self.options, schema)


def register_shards(spark) -> None:
    spark.dataSource.register(JsonlShardsDataSource)
