"""A custom Spark data source in pure Python (Spark 4 DataSource API) —
the new-engine counterpart of the reference's custom relation provider.

The reference extends Spark 2.2 with a JDBC relation that does three
things host Spark didn't: partitioned scans from partition predicates
(reference: JDBCRDDWithLimit.scala:53-63), filter pushdown into the
per-partition query (JDBCRDDWithLimit.scala:45-48), and an
all-or-nothing write path (ExtJdbcRelationProvider.scala:10-59). Spark
4's ``pyspark.sql.datasource`` exposes exactly those extension points to
Python, so this module rebuilds the same CONTRACT natively:

- ``LedgerDataSource`` serves a deterministic synthetic "ledger" table
  (the stand-in for an external system; swap ``_gen`` for real client
  calls and nothing else changes).
- ``LedgerReader.partitions()`` splits the key range into N independent
  slices — each ``read(partition)`` call runs in its own task, like the
  reference's partition-predicate scan.
- ``LedgerReader.pushFilters()`` ACCEPTS key-range and flag-equality
  filters — accepted filters narrow row GENERATION (rows never
  materialize, the true meaning of pushdown) — and returns everything
  else for Spark to re-apply above the scan, mirroring the reference's
  handled/unhandled filter split (JDBCRelationWithLimit.scala:29-43).
- ``LedgerWriter`` implements the two-phase commit the DataSourceWriter
  API prescribes: every task stages its output under a unique name and
  returns a commit message; ``commit()`` publishes all staged files and
  writes a manifest; ``abort()`` removes the debris — the same
  all-or-nothing semantics as sinks/transactional.py, expressed through
  the V2 writer protocol instead of hand-rolled renames.

Scale: partitions are independent tasks (reader parallelism = the
``numPartitions`` option); rows are generated (or fetched) per-partition
with no driver-side materialization; pushed key bounds shrink each
partition's work before a single row exists.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

LEDGER_SCHEMA = (
    "id bigint, bucket bigint, amount double, flag string"
)
FLAGS = ("A", "N", "R")


def _gen(start: int, end: int, flag: str | None):
    """Deterministic ledger rows for ids in [start, end) — the stand-in
    for an external system's cursor; pure arithmetic so tests and any
    future oracle can recompute every row."""
    for i in range(start, end):
        f = FLAGS[i % 3]
        if flag is not None and f != flag:
            continue
        yield (i, i % 32, ((i * 7919) % 10000) / 100.0, f)


@dataclass
class _Slice(InputPartition):
    start: int
    end: int
    flag: str | None


class LedgerReader(DataSourceReader):
    def __init__(self, options):
        self.num_rows = int(options.get("numRows", 1000))
        self.num_partitions = int(options.get("numPartitions", 4))
        self.lo = 0                      # pushed key lower bound (incl)
        self.hi = self.num_rows          # pushed key upper bound (excl)
        self.flag: str | None = None     # pushed flag equality
        self.accepted: list[Filter] = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Accept what generation can honor; return the rest unhandled."""
        for f in filters:
            col = f.attribute[-1] if hasattr(f, "attribute") else None
            if isinstance(f, GreaterThanOrEqual) and col == "id":
                self.lo = max(self.lo, int(f.value))
            elif isinstance(f, GreaterThan) and col == "id":
                self.lo = max(self.lo, int(f.value) + 1)
            elif isinstance(f, LessThan) and col == "id":
                self.hi = min(self.hi, int(f.value))
            elif isinstance(f, LessThanOrEqual) and col == "id":
                self.hi = min(self.hi, int(f.value) + 1)
            elif isinstance(f, EqualTo) and col == "flag" and f.value in FLAGS:
                self.flag = str(f.value)
            elif isinstance(f, IsNotNull) and col in ("id", "bucket", "amount", "flag"):
                pass  # columns are never null here — trivially satisfied
            else:
                yield f  # unhandled: Spark re-applies above the scan
                continue
            self.accepted.append(f)

    def partitions(self):
        """Split the (possibly filter-narrowed) key range into contiguous
        slices — the partition-predicate pattern: each task scans only
        its slice, and pushed bounds shrink every slice before any row
        is generated."""
        lo, hi = self.lo, max(self.lo, self.hi)
        n = max(1, self.num_partitions)
        span = max(1, (hi - lo + n - 1) // n)
        out = []
        s = lo
        while s < hi:
            out.append(_Slice(s, min(s + span, hi), self.flag))
            s += span
        return out or [_Slice(0, 0, None)]

    def read(self, partition: _Slice):
        yield from _gen(partition.start, partition.end, partition.flag)


@dataclass
class _Staged(WriterCommitMessage):
    path: str
    rows: int


class LedgerWriter(DataSourceWriter):
    """Two-phase commit through the V2 writer protocol: tasks stage, the
    driver publishes atomically (manifest = commit point) or aborts."""

    def __init__(self, options, overwrite: bool):
        self.target = options.get("path")
        if not self.target:
            raise ValueError("ledger writer requires a path option")
        self.overwrite = overwrite
        self.token = uuid.uuid4().hex[:12]

    def write(self, rows) -> _Staged:
        from pyspark import TaskContext

        staging = os.path.join(self.target, "_staging")
        os.makedirs(staging, exist_ok=True)
        pid = TaskContext.get().partitionId()
        path = os.path.join(staging, f"{self.token}-{pid}.jsonl")
        n = 0
        with open(path, "w") as f:
            for r in rows:
                f.write(json.dumps(list(r)) + "\n")
                n += 1
        return _Staged(path=path, rows=n)

    def commit(self, messages) -> None:
        os.makedirs(self.target, exist_ok=True)
        published = []
        for m in messages:
            name = os.path.basename(m.path)
            dst = os.path.join(self.target, name)
            os.replace(m.path, dst)  # atomic per file on one filesystem
            published.append({"file": name, "rows": m.rows})
        # manifest write is the commit point readers key on
        with open(os.path.join(self.target, "_LEDGER_MANIFEST.json"), "w") as f:
            json.dump({"token": self.token, "files": published}, f)
        staging = os.path.join(self.target, "_staging")
        if os.path.isdir(staging) and not os.listdir(staging):
            os.rmdir(staging)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class LedgerDataSource(DataSource):
    """``spark.read.format("ledger")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "ledger"

    def schema(self) -> str:
        return LEDGER_SCHEMA

    def reader(self, schema: StructType) -> LedgerReader:
        return LedgerReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> LedgerWriter:
        return LedgerWriter(self.options, overwrite)

    def simpleStreamReader(self, schema: StructType) -> "LedgerStreamReader":
        return LedgerStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(LedgerDataSource)


class LedgerStreamReader(SimpleDataSourceStreamReader):
    """Streaming leg of the ledger source (SimpleDataSourceStreamReader):
    the offset is the high-watermark row id; every micro-batch serves the
    next ``rowsPerBatch`` ids (bounded by ``numRows``). Offsets are plain
    dicts checkpointed by Spark — replay of a committed range goes
    through ``readBetweenOffsets``, which regenerates EXACTLY the same
    rows (deterministic generation = free exactly-once), the same
    offset/replay contract a Kafka-like source implements with seeks."""

    def __init__(self, options):
        self.num_rows = int(options.get("numRows", 1000))
        self.rows_per_batch = int(options.get("rowsPerBatch", 100))

    def initialOffset(self) -> dict:
        return {"watermark": 0}

    def read(self, start: dict):
        lo = int(start["watermark"])
        hi = min(lo + self.rows_per_batch, self.num_rows)
        # iter(list), not a generator: the simple-reader runtime needs a
        # COPYABLE iterator (copy.copy) to cache the prefetched batch for
        # replay; generators aren't copyable, list iterators are
        return iter(list(_gen(lo, hi, None))), {"watermark": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(list(_gen(int(start["watermark"]), int(end["watermark"]), None)))

    def commit(self, end: dict) -> None:
        pass  # nothing external to acknowledge — generation is replayable
