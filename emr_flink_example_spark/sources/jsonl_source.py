"""A custom PySpark (Spark 4) Python DataSource: a partition-aware JSONL
directory reader with equality-filter pushdown.

The reference's only extensibility surface is Flink connector configuration
(`Kafka2S3Hive.scala:71-80` — the Kafka table WITH-clause); Spark's
equivalent extension point for a NEW source is the DataSource V2 Python API
(`pyspark.sql.datasource`), demonstrated here end-to-end:

  * one `InputPartition` per .jsonl file — Spark schedules files across
    executors, so the scan parallelizes like any file source;
  * `pushFilters` accepts top-level equality predicates and applies them
    inside the partition reader (rows are dropped at the source, before
    they ever reach the JVM) and returns the rest for Spark to evaluate —
    the same contract a parquet scan's PushedFilters implements;
  * schema comes from the user (`.schema(...)`) or a documents-shaped
    default.

This is deliberately a SOURCE demo, not a query: the catalog's queries all
read parquet (the scale path — vectorized reader + pushdown for free).
A Python-row source pays per-row Python cost, which is the right trade only
for formats/systems Spark has no native reader for.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

#: documents-table shape, the default schema (DDL string form)
DEFAULT_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars int"


class JsonlDirDataSource(DataSource):
    """`spark.read.format("jsonl_dir").option("path", dir)` after
    `spark.dataSource.register(JsonlDirDataSource)`."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_dir"

    def schema(self) -> str:
        return self.options.get("schema", DEFAULT_SCHEMA)

    def reader(self, schema) -> "JsonlDirReader":
        return JsonlDirReader(schema, self.options)

    def writer(self, schema, overwrite: bool) -> "JsonlDirWriter":
        return JsonlDirWriter(self.options, overwrite)

    def simpleStreamReader(self, schema) -> "JsonlDirStreamReader":
        return JsonlDirStreamReader(schema, self.options)


class JsonlDirReader(DataSourceReader):
    def __init__(self, schema, options) -> None:
        self._schema = schema
        self._path = options["path"]
        self._eq: list[tuple[str, object]] = []

    def pushFilters(self, filters):
        """Accept top-level equality filters; everything else is returned
        (yielded) for Spark to evaluate above the scan."""
        for f in filters:
            if isinstance(f, EqualTo) and len(f.attribute) == 1:
                self._eq.append((f.attribute[0], f.value))
            else:
                yield f

    def partitions(self):
        # hidden files (".staging-*" from in-flight or crashed writes) are
        # NOT data: listing them would hand readers uncommitted rows and
        # defeat the writer's stage-then-rename atomicity (ADVICE r5)
        files = sorted(
            f
            for f in os.listdir(self._path)
            if f.endswith(".jsonl") and not f.startswith(".")
        )
        if not files:
            # zero-file directory still needs >= 1 partition (empty scan)
            return [InputPartition(None)]
        return [InputPartition(os.path.join(self._path, f)) for f in files]

    def read(self, partition):
        if partition.value is None:
            return
        names = [f.name for f in self._schema.fields]
        with open(partition.value, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue  # permissive: drop malformed rows (A2 parity)
                if any(rec.get(k) != v for k, v in self._eq):
                    continue
                yield tuple(rec.get(n) for n in names)


class JsonlDirWriter(DataSourceWriter):
    """Sink half: one .jsonl file per input partition, two-phase commit.

    Tasks write to `.staging-<pid>.jsonl` files (deterministic names from
    the partition id — a re-run of the same task overwrites its own
    staging file, never duplicates); `commit` renames staged files into
    place and, for overwrite mode, removes pre-existing part files;
    `abort` deletes the staging files. This is the same
    stage-then-rename contract the reference's StreamingFileSink commits
    on checkpoint (`Kafka2S3Text.scala:35-50`), scoped to a batch write.

    SINGLE-WRITER CONTRACT: at most one write job may target a directory
    at a time (overwrite mode already assumes this — it deletes the other
    job's committed files too). Commit-time garbage collection of a dead
    predecessor's `.staging-*` orphans is AGE-GATED
    (`STAGING_GC_AGE_SECONDS`) so that even a contract violation — two
    concurrent appenders — cannot delete a live job's in-flight staging
    files (ADVICE r6); a commit whose own staged file vanished anyway
    raises with a pointer at concurrent-writer misuse."""

    #: staging files younger than this are presumed in-flight, never GC'd.
    STAGING_GC_AGE_SECONDS = 600.0

    def __init__(self, options, overwrite: bool) -> None:
        import uuid

        self._path = options["path"]
        self._overwrite = overwrite
        # job-unique token minted ONCE on the driver and shipped to every
        # task: append jobs never collide with an earlier job's part files,
        # while a retried task still overwrites its own staging file
        self._job = uuid.uuid4().hex[:12]

    def write(self, iterator) -> WriterCommitMessage:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        staged = os.path.join(self._path, f".staging-{self._job}-{pid}.jsonl")
        n = 0
        with open(staged, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        msg = WriterCommitMessage()
        msg.staged = staged  # type: ignore[attr-defined]
        msg.n_rows = n  # type: ignore[attr-defined]
        return msg

    def commit(self, messages) -> None:
        if self._overwrite:
            for f in os.listdir(self._path):
                if f.endswith(".jsonl") and not f.startswith(".staging-"):
                    os.remove(os.path.join(self._path, f))
        # garbage-collect staging leftovers from crashed earlier jobs: the
        # sink directory is single-writer (class docstring), so a staging
        # file not staged by THIS job is a dead predecessor's orphan —
        # without this, append mode accumulates them forever (ADVICE r5).
        # Age gate (ADVICE r6): only files older than STAGING_GC_AGE_SECONDS
        # are removed, so a contract-violating concurrent appender's
        # in-flight files survive and its commit still succeeds.
        import time

        ours = {os.path.basename(m.staged) for m in messages}
        cutoff = time.time() - self.STAGING_GC_AGE_SECONDS
        for f in os.listdir(self._path):
            if f.startswith(".staging-") and f not in ours:
                p = os.path.join(self._path, f)
                try:
                    if os.path.getmtime(p) < cutoff:
                        os.remove(p)
                except FileNotFoundError:
                    pass
        for m in messages:
            final = os.path.join(
                self._path, os.path.basename(m.staged).removeprefix(".staging-")
            )
            try:
                os.replace(m.staged, f"{self._path}/part-{os.path.basename(final)}")
            except FileNotFoundError as exc:
                raise RuntimeError(
                    f"staged file {m.staged} vanished before commit — was a "
                    "second write job running against this directory? The "
                    "jsonl_dir sink is single-writer (see JsonlDirWriter)."
                ) from exc

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.remove(m.staged)
            except FileNotFoundError:
                pass


class JsonlDirStreamReader(SimpleDataSourceStreamReader):
    """Streaming half: the directory consumed as an append-only stream,
    one micro-batch per crop of new files — the reference's continuous
    Kafka->S3 ingestion loop restated for a file-drop source.

    The offset is a lexicographic filename high-watermark, so producers
    must write monotonically-named files (part-000.., timestamps, ULIDs —
    the standard file-drop contract). `read` advances the watermark;
    `readBetweenOffsets` replays the half-open (start, end] window, which
    is what makes checkpoint recovery exactly-once: a replayed batch
    yields byte-identical rows."""

    def __init__(self, schema, options) -> None:
        self._schema = schema
        self._path = options["path"]

    def _files(self):
        # same hidden-file rule as the batch reader: staging files must
        # never enter the watermark ordering or the replay window
        return sorted(
            f
            for f in os.listdir(self._path)
            if f.endswith(".jsonl") and not f.startswith(".")
        )

    def initialOffset(self) -> dict:
        return {"last": ""}

    def _rows(self, names):
        # a LIST, not a generator: the simple stream reader's batch payload
        # is pickled into the streaming prefetch cache, and generators
        # don't pickle. Batch size is bounded by the files-per-trigger crop.
        out = []
        fields = [f.name for f in self._schema.fields]
        for name in names:
            with open(os.path.join(self._path, name), encoding="utf-8") as fh:
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        rec = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    out.append(tuple(rec.get(n) for n in fields))
        return out

    def read(self, start: dict):
        # iter(list): the runtime drives it with next() (so a bare list is
        # rejected) AND pickles it into the prefetch cache (so a generator
        # is rejected); a list_iterator satisfies both
        new = [f for f in self._files() if f > start["last"]]
        if not new:
            return iter([]), start
        return iter(self._rows(new)), {"last": new[-1]}

    def readBetweenOffsets(self, start: dict, end: dict):
        names = [f for f in self._files() if start["last"] < f <= end["last"]]
        return iter(self._rows(names))
