"""Custom Spark 4 Python Data Source for the WAL changelog (S8).

The reference consumes Debezium's WAL-derived topic with a hand-rolled
poll loop (reference main.py:12-58); here the same envelope stream is a
first-class Spark source: ``spark.read.format("wal_jsonl")`` /
``spark.readStream.format("wal_jsonl")`` over a JSONL change log. This
upgrades the parquet file-stream stand-in (streaming/filestream.py) with
the real source contract:

- **Batch**: line-range ``InputPartition``s (parallel scan of one log),
  plus FILTER PUSHDOWN — ``op`` equality and ``source_lsn`` range
  predicates are evaluated inside the source's read loop, so a
  `op = 'd'` audit query never materializes the other 95% of envelopes.
- **Streaming**: offsets are line positions (JSON-serializable dicts);
  `readBetweenOffsets` makes replay after a restart deterministic — the
  exactly-once contract Structured Streaming needs from a source. The
  driver-side simple reader is appropriate for a single log file; a
  partitioned WAL would promote to DataSourceStreamReader with one
  InputPartition per (segment, range).

The JSONL layout is one envelope per line in delivery order — the
at-least-once, out-of-order-by-lsn stream the CDC operators are built to
absorb (see sources/cdc.ChangeLogFixture).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)

from .cdc import ENVELOPE_SCHEMA, ChangeLogFixture

FORMAT_NAME = "wal_jsonl"

# pushFilters() executes in a separate Python planning worker, so an
# in-process record is invisible to the test process; the reader instead
# writes the accepted filters to a `<path>.pushed` sidecar (local/shared
# FS), which tests read back to assert pushdown actually happened.
def pushed_filters(path: str) -> list[str]:
    try:
        with open(path + ".pushed") as f:
            return json.load(f)
    except FileNotFoundError:
        return []

_FIELDS = [f.name for f in ENVELOPE_SCHEMA.fields]
_ROW_FIELDS = ["id", "username", "email", "created_at_us"]


def write_wal_jsonl(fixture: ChangeLogFixture, path: str) -> int:
    """Materialize a fixture as a JSONL change log (delivery order)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for ev in fixture.events:
            f.write(json.dumps(ev) + "\n")
    return len(fixture.events)


def _parse_line(line: str):
    ev = json.loads(line)

    def row(d):
        return None if d is None else tuple(d.get(k) for k in _ROW_FIELDS)

    return (
        row(ev.get("before")),
        row(ev.get("after")),
        ev.get("op"),
        ev.get("ts_ms"),
        ev.get("source_lsn"),
        ev.get("source_table"),
        ev.get("kafka_partition"),
        ev.get("kafka_offset"),
    )


def _passes(ev_tuple, filters) -> bool:
    idx = {n: i for i, n in enumerate(_FIELDS)}
    for f in filters:
        (col,) = f.attribute
        v = ev_tuple[idx[col]]
        if v is None:
            return False
        if isinstance(f, EqualTo) and not v == f.value:
            return False
        if isinstance(f, GreaterThan) and not v > f.value:
            return False
        if isinstance(f, GreaterThanOrEqual) and not v >= f.value:
            return False
        if isinstance(f, LessThan) and not v < f.value:
            return False
        if isinstance(f, LessThanOrEqual) and not v <= f.value:
            return False
    return True


@dataclass
class _LineRange(InputPartition):
    start: int
    end: int


class WalBatchReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]
        self.n_partitions = int(options.get("numPartitions", 4))
        self.filters: list = []

    def pushFilters(self, filters):
        """Accept flat op/lsn comparisons; hand everything else back."""
        supported = (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
        rest = []
        for f in filters:
            if isinstance(f, supported) and len(f.attribute) == 1 and f.attribute[0] in (
                "op",
                "source_lsn",
                "kafka_offset",
                "source_table",
            ):
                self.filters.append(f)
            else:
                rest.append(f)
        with open(self.path + ".pushed", "w") as f:
            json.dump([repr(x) for x in self.filters], f)
        return iter(rest)

    def partitions(self):
        with open(self.path) as f:
            n = sum(1 for _ in f)
        per = max(1, (n + self.n_partitions - 1) // self.n_partitions)
        return [_LineRange(i, min(i + per, n)) for i in range(0, n, per)]

    def read(self, partition: _LineRange):
        with open(self.path) as f:
            for i, line in enumerate(f):
                if i >= partition.end:
                    break
                if i >= partition.start:
                    t = _parse_line(line)
                    if _passes(t, self.filters):
                        yield t


class WalStreamReader(SimpleDataSourceStreamReader):
    """Offsets are line positions; replay between offsets is exact."""

    def __init__(self, options):
        self.path = options["path"]
        self.batch_lines = int(options.get("batchLines", 100))

    def initialOffset(self):
        return {"line": 0}

    def _read_range(self, start: int, end: int | None):
        rows = []
        with open(self.path) as f:
            for i, line in enumerate(f):
                if end is not None and i >= end:
                    break
                if i >= start:
                    rows.append(_parse_line(line))
        return rows

    def read(self, start: dict):
        s = start["line"]
        rows = self._read_range(s, s + self.batch_lines)
        return iter(rows), {"line": s + len(rows)}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._read_range(start["line"], end["line"]))


class WalDataSource(DataSource):
    """``spark.dataSource.register(WalDataSource)`` then
    ``spark.read.format("wal_jsonl").option("path", p)``."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        return ENVELOPE_SCHEMA

    def reader(self, schema):
        return WalBatchReader(self.options)

    def simpleStreamReader(self, schema):
        return WalStreamReader(self.options)


# ---------------------------------------------------------------------------
# Segmented WAL: the scale path. A directory of per-segment JSONL logs
# (the Kafka-partition / WAL-segment analog). Offsets are a dict
# {segment: line}; each micro-batch plans ONE InputPartition per advancing
# segment and rows are parsed on EXECUTORS — the driver only lists files
# and line counts. Growth per trigger is capped at batchLines per segment
# (the maxOffsetsPerTrigger analog), so a backlogged restart catches up in
# bounded batches instead of one giant one.
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import DataSourceStreamReader  # noqa: E402

SEGMENTED_FORMAT_NAME = "wal_jsonl_dir"


@dataclass
class _SegmentRange(InputPartition):
    path: str
    start: int
    end: int


def _count_lines(path: str) -> int:
    with open(path) as f:
        return sum(1 for _ in f)


class WalSegmentedStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.dir = options["path"]
        self.batch_lines = int(options.get("batchLines", 1000))
        self._last: dict | None = None  # last offsets THIS reader planned

    def _segments(self) -> list[str]:
        return sorted(
            os.path.join(self.dir, n)
            for n in os.listdir(self.dir)
            if n.endswith(".jsonl")
        )

    def initialOffset(self):
        return {}

    def latestOffset(self):
        # The offset log records whatever this returns, so the per-trigger
        # admission cap MUST be applied here (a cap in partitions() would
        # silently skip the lines between the cap and the recorded end).
        # The first trigger after a (re)start has no planning history and
        # admits everything available — one catch-up batch, like the
        # built-in file source without maxFilesPerTrigger; every
        # subsequent trigger admits at most batchLines per segment.
        eofs = {p: _count_lines(p) for p in self._segments()}
        if self._last is None:
            planned = eofs
        else:
            planned = {
                p: min(eof, self._last.get(p, 0) + self.batch_lines)
                for p, eof in eofs.items()
            }
        self._last = planned
        return planned

    def partitions(self, start: dict, end: dict):
        # Resync planning history with the checkpoint on restart: the
        # recorded start is ground truth for what was already consumed.
        if self._last is not None:
            self._last = {
                p: max(v, start.get(p, 0)) for p, v in self._last.items()
            }
        parts = [
            _SegmentRange(path, start.get(path, 0), e)
            for path, e in end.items()
            if e > start.get(path, 0)
        ]
        # An empty batch still needs one no-op partition.
        return parts or [_SegmentRange("", 0, 0)]

    def read(self, partition: _SegmentRange):
        if not partition.path:
            return
        with open(partition.path) as f:
            for i, line in enumerate(f):
                if i >= partition.end:
                    break
                if i >= partition.start:
                    yield _parse_line(line)

    def commit(self, end: dict):
        pass


class WalSegmentedDataSource(DataSource):
    """``format("wal_jsonl_dir")`` over a directory of segment logs."""

    @classmethod
    def name(cls) -> str:
        return SEGMENTED_FORMAT_NAME

    def schema(self):
        return ENVELOPE_SCHEMA

    def reader(self, schema):
        raise NotImplementedError(
            "batch reads go through format('wal_jsonl') per segment"
        )

    def streamReader(self, schema):
        return WalSegmentedStreamReader(self.options)
