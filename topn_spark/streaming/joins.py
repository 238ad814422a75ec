"""Streaming joins and streaming dedup.

Like the window builders, every function here accepts BOTH a batch
and a streaming DataFrame and produces the same logical plan — the
replay-equivalence test surface (SURVEY.md §5.3). The reference has
no join or dedup operators at all (its host CDAP wires streams to the
same batch plugin, reference pom.xml:39-42); these are the Spark-
native ops a streaming ingest pipeline needs.

Scale notes:
- stream-static enrich broadcasts the dimension — per-batch hash
  join, no shuffle of the stream, no state;
- stream-stream joins keep both sides' rows in the state store until
  the watermark + interval bound lets Spark drop them. ALWAYS pass
  watermarks and a time bound in production: an unbounded
  stream-stream join grows state forever;
- streaming dedup state is one entry per key, expired by the
  watermark (dropDuplicatesWithinWatermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream_df: DataFrame,
    dim_df: DataFrame,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Stream-static join: enrich a fact stream with a dimension
    table. The dim is broadcast (it is re-read per micro-batch, so
    slowly-changing dims pick up updates at batch granularity)."""
    return stream_df.join(F.broadcast(dim_df), on=on, how=how)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "r_ts",
    within: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream (or batch) interval equi-join: match rows with
    equal ``key`` where ``right_ts`` falls in
    ``[left_ts, left_ts + within]``.

    Right-side columns come back prefixed ``r_`` (so ``right_ts``
    refers to the prefixed name, default ``r_ts``). On streams both
    sides get event-time watermarks — together with the interval
    bound this lets Spark expire join state; without them state is
    unbounded.
    """
    right = right.select([F.col(c).alias(f"r_{c}") for c in right.columns])
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    cond = (
        (F.col(key) == F.col(f"r_{key}"))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {within}"))
    )
    return left.join(right, cond, how)


def streaming_dedup(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    delay: str = "1 hour",
) -> DataFrame:
    """Drop duplicate records by ``keys``, keeping the first arrival.

    On a stream: watermark + ``dropDuplicatesWithinWatermark`` — two
    rows with the same keys within the watermark window dedupe to
    one; state for a key is dropped once the watermark passes it, so
    a duplicate arriving later than ``delay`` after the original is
    NOT caught (the documented trade for bounded state — exactly the
    contract a 100 TB/day ingest dedup needs). On a batch frame:
    plain ``dropDuplicates`` (global, exact).
    """
    if df.isStreaming:
        return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
            keys
        )
    return df.dropDuplicates(keys)
