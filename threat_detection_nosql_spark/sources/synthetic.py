"""Custom Python data source (Spark 4 ``pyspark.sql.datasource``):
a file-less, deterministic synthetic event generator.

Why a data source and not a helper that builds a DataFrame: the
DataSource API gives the generator real scan semantics — its
``partitions()`` define the parallelism (each partition generates its
slice independently from a seeded hash, so 10^12 rows need no driver
materialization and no files), and the scan composes with the rest of
the engine (filters/projections on top, AQE downstream) exactly like a
parquet relation. This is the load-generator path for soak-testing
operators at arbitrary scale on a cluster: ``rows_per_partition`` ×
``num_partitions`` rows, bit-identical on every run and any cluster
size.

Determinism: every field derives from md5(seed|row_id) — the same
portable-hash discipline as operators/dedup._portable_hash60, so tests
(and, if ever needed, a SQL oracle) can replay the generator.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_EVENT_TYPES = ["login", "read", "write", "purchase", "error"]


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _row(seed: int, row_id: int) -> tuple:
    h = _h60(f"{seed}|{row_id}")
    user_id = h % 150
    etype = _EVENT_TYPES[(h >> 8) % len(_EVENT_TYPES)]
    # microsecond timestamps across one synthetic day, as raw longs so
    # the source stays timezone-free (cast downstream like any fact)
    ts_us = 1_700_000_000_000_000 + (h % 86_400) * 1_000_000
    value = round((h % 100_000) / 100.0, 2)
    return (row_id, ts_us, user_id, etype, value)


class _SyntheticPartition(InputPartition):
    def __init__(self, index: int, start: int, end: int, seed: int):
        self.index = index
        self.start = start
        self.end = end
        self.seed = seed


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_parts = int(options.get("numpartitions", 4))
        self.rows_per_part = int(options.get("rowsperpartition", 1000))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        return [
            _SyntheticPartition(i, i * self.rows_per_part,
                                (i + 1) * self.rows_per_part, self.seed)
            for i in range(self.n_parts)
        ]

    def read(self, partition: _SyntheticPartition) -> Iterator[tuple]:
        for row_id in range(partition.start, partition.end):
            yield _row(partition.seed, row_id)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the generator: offsets are plain row
    counters, each micro-batch deterministically generates the rows in
    [start, end) from the same seeded hash as the batch reader — so a
    drained stream equals the batch read of the same row range
    (pinned in tests). ``rowsPerBatch`` rows arrive per trigger until
    ``maxRows`` (finite for tests; omit for an unbounded soak
    stream)."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rowsperbatch", 500))
        self.max_rows = int(options.get("maxrows", 2000))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self) -> dict:
        return {"row": 0}

    def read(self, start: dict):
        begin = start["row"]
        end = min(begin + self.rows_per_batch, self.max_rows)
        rows = [_row(self.seed, i) for i in range(begin, end)]
        return iter(rows), {"row": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(_row(self.seed, i)
                    for i in range(start["row"], end["row"]))

    def commit(self, end: dict) -> None:
        pass


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events")`` after
    ``spark.dataSource.register(SyntheticEventsDataSource)``.
    Batch options: numPartitions, rowsPerPartition, seed.
    Stream options (``spark.readStream``): rowsPerBatch, maxRows,
    seed."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> StructType:
        return StructType([
            StructField("event_id", LongType()),
            StructField("ts_us", LongType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ])

    def reader(self, schema: StructType) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema: StructType
                           ) -> SyntheticEventsStreamReader:
        return SyntheticEventsStreamReader(self.options)
