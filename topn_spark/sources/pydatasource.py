"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic-documents generator source.

The reference's source surface is "read rows from an external system
through a pluggable connector"; Spark 4 finally exposes that plug
point to pure Python. This module implements it end-to-end — schema
declaration, option handling, PARTITIONED planning (one
``InputPartition`` per slice, so a 10^9-doc generation run fans out
across the cluster exactly like a parquet scan), and per-partition
iterators — with a generator whose output is a pure function of
(seed, doc_id): md5 drives every choice, so any row can be
reproduced independently (the catalog oracle regenerates the corpus
in plain Python and matches exactly).

Register + read:

    spark.dataSource.register(SyntheticDocsDataSource)
    spark.read.format("synthetic_docs")
         .option("n", 1000).option("parts", 8).option("seed", 7).load()

A corpus generator is the honest demo here (the container has no
external databases to connect to), and a useful one: deterministic
synthetic corpora are how pipeline tests get arbitrarily large,
schema-faithful inputs without storing them.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

#: small fixed vocabulary — overlaps the testdata corpus's register so
#: downstream text operators (langid markers, CMS probe terms) fire.
VOCAB = (
    "the quick brown fox jumps over lazy dog join hash scan filter "
    "vector data spark query plan shuffle broadcast partition merge "
    "sort agg window stream batch token corpus model train split "
    "und der die das le la et los el que is in on at"
).split()

LANGS = ("en", "de", "fr", "es")

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def _h(parts: str) -> int:
    """First 8 md5 hex digits of ``parts`` as an int — the one
    primitive every generation choice derives from."""
    return int(hashlib.md5(parts.encode()).hexdigest()[:8], 16)


def generate_doc(seed: int, doc_id: int) -> tuple:
    """The (seed, doc_id) -> row pure function. Module-level so the
    executor-side reader and any driver-side mirror share one
    definition; the catalog oracle still re-implements it
    independently as the correctness check."""
    base = _h(f"{seed}:{doc_id}")
    n_words = 5 + base % 60
    words = [
        VOCAB[_h(f"{seed}:{doc_id}:{i}") % len(VOCAB)]
        for i in range(n_words)
    ]
    text = " ".join(words)
    return (
        doc_id,
        text,
        LANGS[(base >> 8) % len(LANGS)],
        f"src{(base >> 16) % 8}",
        len(text),
    )


class _Slice(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class _Reader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = max(1, int(options.get("parts", 8)))
        self.seed = int(options.get("seed", 0))

    def partitions(self):
        per = -(-self.n // self.parts)  # ceil
        return [
            _Slice(lo, min(lo + per, self.n), self.seed)
            for lo in range(0, self.n, per)
        ]

    def read(self, partition: _Slice):
        for doc_id in range(partition.start, partition.end):
            yield generate_doc(partition.seed, doc_id)


class SyntheticDocsDataSource(DataSource):
    """``format("synthetic_docs")`` — options: ``n`` rows total,
    ``parts`` input partitions, ``seed``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self):
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _Reader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticDocsDataSource)


class _StreamReader:
    """``SimpleDataSourceStreamReader`` for the same generator: each
    micro-batch advances the doc_id cursor by ``batch_rows``. Offsets
    are plain dicts (``{"next": n}``) checkpointed by the engine, so
    a restarted query resumes exactly where it stopped — determinism
    of (seed, doc_id) makes replayed batches byte-identical, which is
    what makes this a usable exactly-once test feed.

    Simple-API cadence note: the engine discovers "latest" by calling
    ``read`` ONCE per trigger cycle, so an ``availableNow`` run
    consumes exactly one ``batch_rows`` batch and stops — progress
    across the corpus comes from successive runs (or a continuous
    trigger), each resuming from the checkpointed cursor."""

    def __init__(self, options):
        self.seed = int(options.get("seed", 0))
        self.batch_rows = int(options.get("batch_rows", 100))
        self.max_rows = int(options.get("n", 0))  # 0 = unbounded

    def initialOffset(self):
        return {"next": 0}

    def read(self, start):
        lo = int(start["next"])
        hi = lo + self.batch_rows
        if self.max_rows:
            hi = min(hi, self.max_rows)
        # a LIST, not a generator: the engine prefetches driver-side
        # and pickles the rows into the batch cache
        rows = [generate_doc(self.seed, d) for d in range(lo, hi)]
        return rows, {"next": hi}

    def readBetweenOffsets(self, start, end):
        return [
            generate_doc(self.seed, d)
            for d in range(int(start["next"]), int(end["next"]))
        ]

    def commit(self, end):
        pass  # nothing external to clean up


def _simple_stream_reader_base():
    """Import shim: the simple-reader ABC moved/gained surface across
    4.x minors; resolve it lazily so batch reads never depend on it."""
    from pyspark.sql.datasource import SimpleDataSourceStreamReader

    return SimpleDataSourceStreamReader


class SyntheticDocsStreamSource(DataSource):
    """``format("synthetic_docs_stream")`` — micro-batched feed of the
    same deterministic corpus; options: ``seed``, ``batch_rows``,
    ``n`` (total cap, 0 = unbounded). Use with availableNow triggers
    in tests: ``n`` bounds the run."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs_stream"

    def schema(self):
        return SCHEMA

    def simpleStreamReader(self, schema):
        base = _simple_stream_reader_base()

        # _StreamReader FIRST in the MRO: the ABC's methods raise
        # NotImplemented, so they must be the fallback, not the front
        class _R(_StreamReader, base):
            pass

        return _R(self.options)


def register_stream(spark) -> None:
    spark.dataSource.register(SyntheticDocsStreamSource)
