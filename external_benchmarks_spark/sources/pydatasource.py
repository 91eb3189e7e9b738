"""Custom connector via the Spark 4 Python DataSource API (DSv2).

The reference's ingest surface is fixed files (JSONL/parquet,
reference README.md:45-49); a production engine also needs a place to
plug in NON-file feeds (an internal service, a queue, a generator). This
module is that extension point done idiomatically for PySpark 4:
`pyspark.sql.datasource.DataSource` with a batch reader AND a streaming
reader, registered per-session and addressed as a normal
`spark.read.format("docgen")` / `spark.readStream.format("docgen")`.

The shipped source generates deterministic synthetic documents
(arithmetic on doc_id only — same fixture discipline as the multimodal
blob generators), so the whole connector is hash-oracle-able: DuckDB
re-derives every row from `generate_series`.

Scale notes: `partitions()` is the split-planning hook — each partition
is an independent row range read by one task, so parallelism is a
planner decision, not a data property. The streaming reader advances a
monotonic row offset in `chunk`-sized micro-batches with replayable
`partitions(start, end)` — Spark owns offset tracking/commit, the
source stays stateless (the contract that makes a real queue connector
exactly-once).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

# Fixed wordlist shared verbatim with the DuckDB oracle (FIXTURES.md
# determinism rules).
GEN_WORDS: tuple[str, ...] = (
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa",
)
GEN_SCHEMA = "doc_id bigint, text string"


def gen_text(doc_id: int) -> str:
    """1 + doc_id%7 words, each picked by integer arithmetic on doc_id."""
    n = 1 + doc_id % 7
    return " ".join(
        GEN_WORDS[(doc_id * 31 + j * 17) % len(GEN_WORDS)] for j in range(n)
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def _read_range(part: _RangePartition):
    for i in range(part.start, part.end):
        yield (i, gen_text(i))


class _DocGenReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n_docs", 1000))
        self.parts = int(options.get("n_partitions", 8))

    def partitions(self):
        step = max(1, -(-self.n // self.parts))
        return [
            _RangePartition(s, min(s + step, self.n))
            for s in range(0, self.n, step)
        ]

    def read(self, partition):
        return _read_range(partition)


class _DocGenStreamReader(DataSourceStreamReader):
    """Replays the same rows as micro-batches of `chunk` rows."""

    def __init__(self, options):
        self.n = int(options.get("n_docs", 1000))
        self.chunk = int(options.get("chunk", 250))

    def initialOffset(self):
        return {"row": 0}

    def latestOffset(self):
        return {"row": self.n}

    def partitions(self, start, end):
        lo, hi = int(start["row"]), int(end["row"])
        return [
            _RangePartition(s, min(s + self.chunk, hi))
            for s in range(lo, hi, self.chunk)
        ]

    def read(self, partition):
        return _read_range(partition)

    def commit(self, end):
        pass  # stateless source: nothing to clean up


class DocGenDataSource(DataSource):
    @classmethod
    def name(cls):
        return "docgen"

    def schema(self):
        return GEN_SCHEMA

    def reader(self, schema):
        return _DocGenReader(self.options)

    def streamReader(self, schema):
        return _DocGenStreamReader(self.options)


def register(spark) -> None:
    """Idempotent per-session registration."""
    spark.dataSource.register(DocGenDataSource)
