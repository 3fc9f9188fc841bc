"""Custom Python DataSource: a length-prefixed record archive reader —
the crawl-archive connector shape (WARC-like: a shard file is a
concatenation of ``[4-byte big-endian length][payload bytes]`` records).

Large-scale corpus ingest routinely starts from archive formats Spark
has no built-in reader for.  PySpark 4's Python DataSource API is the
idiomatic extension point: the driver lists shard files and plans ONE
InputPartition per file (archives are not splittable mid-record without
an index, and shard files are written at target size anyway), then each
executor task streams records from its file — reading scales with file
count, payloads stay opaque ``binary`` for the multimodal pipeline
(operators/multimodal.py) to decode downstream.

Usage::

    spark.dataSource.register(RecordArchiveDataSource)
    df = spark.read.format("recordarchive").load("/data/shards")
    # schema: file string, offset long, n_bytes long, payload binary

``write_record_archive`` is the matching plain-Python shard writer
(ingest-side tooling; record framing is trivial enough not to need the
cluster).
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

MAGIC_SUFFIX = ".lprec"


def write_record_archive(path: str, payloads) -> int:
    """Write one shard file of length-prefixed records; returns bytes
    written.  Framing: 4-byte big-endian length, then the payload."""
    n = 0
    with open(path, "wb") as fh:
        for p in payloads:
            fh.write(struct.pack(">I", len(p)))
            fh.write(p)
            n += 4 + len(p)
    return n


def read_records(file_path: str) -> Iterator[tuple[int, bytes]]:
    """(offset, payload) records of one shard; raises on a truncated
    frame (a short archive means a failed ingest write — silently
    yielding a partial corpus is the worse outcome)."""
    with open(file_path, "rb") as fh:
        offset = 0
        while True:
            head = fh.read(4)
            if not head:
                return
            if len(head) < 4:
                raise EOFError(f"{file_path}: truncated length prefix at {offset}")
            (n,) = struct.unpack(">I", head)
            payload = fh.read(n)
            if len(payload) < n:
                raise EOFError(f"{file_path}: truncated record at {offset}")
            yield offset, payload
            offset += 4 + n


class _ShardPartition(InputPartition):
    def __init__(self, file_path: str):
        self.file_path = file_path


class RecordArchiveReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("recordarchive: .load(path) is required")

    def partitions(self):  # one task per shard file
        if os.path.isdir(self.path):
            files = sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if f.endswith(MAGIC_SUFFIX)
            )
        else:
            files = [self.path]
        return [_ShardPartition(f) for f in files]

    def read(self, partition: _ShardPartition):
        for offset, payload in read_records(partition.file_path):
            yield (partition.file_path, offset, len(payload), payload)


class RecordArchiveWriter(DataSourceWriter):
    """Sink side: each task writes ONE shard file of its partition's
    ``payload`` column (task-temp name, renamed on task success — a
    failed/retried task leaves no visible shard), so shard count ==
    partition count and a ``repartition(n)`` upstream sizes the shards.
    """

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("recordarchive: .save(path) is required")

    def write(self, iterator) -> WriterCommitMessage:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        part = ctx.partitionId() if ctx else 0
        os.makedirs(self.path, exist_ok=True)
        final = os.path.join(self.path, f"shard-{part:05d}{MAGIC_SUFFIX}")
        tmp = final + f".tmp-{os.getpid()}"
        n = write_record_archive(
            tmp, (bytes(row["payload"]) for row in iterator)
        )
        os.replace(tmp, final)
        return WriterCommitMessage()

    def abort(self, messages) -> None:
        pass  # temp files are pid-suffixed; committed shards stay atomic

    def commit(self, messages) -> None:
        pass


class RecordArchiveStreamReader(SimpleDataSourceStreamReader):
    """Streaming side: continuous ingestion of an append-only shard
    directory — the live-crawl-drop shape (new ``.lprec`` shards appear
    as upstream fetchers finish; the stream picks each up exactly once).

    Offset model: ``{"seen": [filename, ...]}`` — file-granularity is
    EXACT here because the batch writer publishes shards atomically
    (os.replace), so a visible file is complete.  ``read`` returns all
    records of not-yet-seen files and advances the offset;
    ``readBetweenOffsets`` replays a committed range deterministically
    from the file-list diff (failure recovery).  Listing is
    per-microbatch driver work (one readdir); record parsing happens
    where the simple-stream API runs it.
    """

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("recordarchive: .load(path) is required")

    def _list(self) -> list:
        if os.path.isdir(self.path):
            return sorted(
                f for f in os.listdir(self.path) if f.endswith(MAGIC_SUFFIX)
            )
        return [os.path.basename(self.path)]

    def _dir(self) -> str:
        return self.path if os.path.isdir(self.path) else os.path.dirname(self.path)

    def initialOffset(self) -> dict:
        return {"seen": []}

    def _rows_for(self, names) -> list:
        # a LIST, not a generator: the simple-stream API pickles the
        # returned rows into the offset log for deterministic replay
        rows = []
        for name in names:
            fp = os.path.join(self._dir(), name)
            for offset, payload in read_records(fp):
                rows.append((fp, offset, len(payload), payload))
        return rows

    def read(self, start: dict):
        seen = set(start.get("seen", []))
        new = [n for n in self._list() if n not in seen]
        end = {"seen": sorted(seen | set(new))}
        return iter(self._rows_for(new)), end

    def readBetweenOffsets(self, start: dict, end: dict):
        replay = sorted(set(end.get("seen", [])) - set(start.get("seen", [])))
        return iter(self._rows_for(replay))


class RecordArchiveDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "recordarchive"

    def schema(self) -> str:
        return "file string, offset long, n_bytes long, payload binary"

    def reader(self, schema) -> RecordArchiveReader:
        return RecordArchiveReader(self.options)

    def simpleStreamReader(self, schema) -> RecordArchiveStreamReader:
        return RecordArchiveStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> RecordArchiveWriter:
        names = [f.name for f in schema.fields]
        if "payload" not in names:
            raise ValueError("recordarchive writer requires a 'payload' binary column")
        return RecordArchiveWriter(self.options)
