"""Python DataSource API (Spark 4) — a deterministic synthetic-document
source, batch + streaming.

The reference ingests CSV blobs (S1); an engine that claims source
EXTENSIBILITY needs the modern path too: `pyspark.sql.datasource` lets a
pure-Python connector plug into Catalyst with real partition planning and
filter pushdown, no JVM code. This module is the repo's reference
implementation of that API:

- ``SynthDocsDataSource`` ("synthdocs"): N deterministic documents, split
  over P planned input partitions (parallel scan). ``pushFilters`` accepts
  doc_id range/equality predicates and PRUNES whole partitions before
  read() runs — the same contract parquet scans honor, demonstrated at the
  Python layer (everything else is returned to Spark as residual).
- ``SynthDocsStreamReader``: the same feed as a micro-batch stream with
  dict offsets ({"pos": k}) — deterministic replay from any offset, which
  is exactly what exactly-once sinks need from a source.

Rows are generated from a per-doc_id hash, so content is a pure function
of (doc_id, seed): any partitioning, any batch boundaries, any replay
produces identical rows. At scale the source is embarrassingly parallel —
partitions share nothing, and pruning means a doc_id-range query reads
only the partitions that can contain it.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)

_SOURCES = ("web", "books", "code", "wiki")
_WORDS = (
    "data spark engine scale shuffle join corpus token model train "
    "filter dedup stream batch column row plan query index vector"
).split()

SCHEMA = "doc_id bigint, source string, text string, n_tokens bigint"


def _doc_row(doc_id: int, seed: int) -> tuple:
    """Pure function of (doc_id, seed) — replay-stable everywhere."""
    h = hashlib.md5(f"{seed}:{doc_id}".encode()).digest()
    n_tokens = 5 + h[0] % 28
    words = [_WORDS[h[i % 16] % len(_WORDS)] for i in range(1, n_tokens + 1)]
    return (doc_id, _SOURCES[h[1] % len(_SOURCES)], " ".join(words), n_tokens)


class _IdRange(InputPartition):
    def __init__(self, lo: int, hi: int):  # [lo, hi)
        self.lo, self.hi = lo, hi


class SynthDocsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.num_partitions = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 7))
        self.lo, self.hi = 0, self.n  # pushed doc_id bounds, [lo, hi)

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Fold doc_id range/equality predicates into the planned scan
        bounds; everything else (and every non-doc_id column) is residual
        for Spark to re-check. Accepted filters also stay SAFE to re-apply
        Spark-side — pruning can only remove rows the predicate excludes."""
        for f in filters:
            col = getattr(f, "attribute", None)
            col = col[0] if col else None
            if col != "doc_id" or not isinstance(getattr(f, "value", None), int):
                yield f
                continue
            if isinstance(f, EqualTo):
                self.lo = max(self.lo, int(f.value))
                self.hi = min(self.hi, int(f.value) + 1)
            elif isinstance(f, GreaterThan):
                self.lo = max(self.lo, int(f.value) + 1)
            elif isinstance(f, GreaterThanOrEqual):
                self.lo = max(self.lo, int(f.value))
            elif isinstance(f, LessThan):
                self.hi = min(self.hi, int(f.value))
            elif isinstance(f, LessThanOrEqual):
                self.hi = min(self.hi, int(f.value) + 1)
            else:
                yield f

    def partitions(self) -> list[InputPartition]:
        """Plan id-range slices AFTER pushdown: slices that fall entirely
        outside the pushed [lo, hi) bounds are never emitted, so a
        doc_id-range query schedules only the tasks that can match."""
        per = max(1, -(-self.n // self.num_partitions))
        parts = []
        for i in range(self.num_partitions):
            lo, hi = i * per, min((i + 1) * per, self.n)
            lo, hi = max(lo, self.lo), min(hi, self.hi)
            if lo < hi:
                parts.append(_IdRange(lo, hi))
        return parts or [_IdRange(0, 0)]

    def read(self, partition: _IdRange) -> Iterator[tuple]:
        for doc_id in range(partition.lo, partition.hi):
            yield _doc_row(doc_id, self.seed)


class SynthDocsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.seed = int(options.get("seed", 7))
        self.rows_per_batch = int(options.get("rowsPerBatch", 100))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = int(start["pos"])
        hi = min(lo + self.rows_per_batch, self.n)
        return (
            iter([_doc_row(i, self.seed) for i in range(lo, hi)]),
            {"pos": hi},
        )

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # deterministic replay for recovery: same pure row function
        return iter(
            [_doc_row(i, self.seed) for i in range(int(start["pos"]), int(end["pos"]))]
        )


class SynthDocsDataSource(DataSource):
    """spark.dataSource.register(SynthDocsDataSource); then
    spark.read.format("synthdocs").option("n", 5000).load() or
    spark.readStream.format("synthdocs")...
    Options: n (row count), partitions, seed, rowsPerBatch (stream)."""

    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SynthDocsReader:
        return SynthDocsReader(self.options)

    def simpleStreamReader(self, schema) -> SynthDocsStreamReader:
        return SynthDocsStreamReader(self.options)
