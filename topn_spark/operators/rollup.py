"""Hypertable-style continuous rollups: pre-aggregated, mergeable
time-bucket tables.

The pattern (TimescaleDB continuous aggregates, Druid rollup,
materialized summary tables) re-expressed as plain Spark: scan the
raw table ONCE, store per ``(bucket_start, *keys)`` a row of
*mergeable partial aggregates* — ``cnt``, decimal/long ``sum_*``,
``min_*``/``max_*``, and Apache DataSketches HLL sketches
(``hll_*``, via :func:`pyspark.sql.functions.hll_sketch_agg`) for
distinct counts. Every coarser view then re-aggregates FROM the
rollup, never from raw data: daily = merge of 24 hourlies, a
per-type breakdown collapses to global by dropping keys, and
``COUNT(DISTINCT …)`` stays answerable because HLL sketches union
losslessly (:func:`pyspark.sql.functions.hll_union_agg`).

Correctness contract:
- ``cnt``/``sum``/``min``/``max`` merge EXACTLY (sums should be
  decimal or integral — the catalog query casts doubles to
  ``DECIMAL`` first, per SURVEY.md §2.4 rule 3);
- distinct counts are approximate with standard HLL error
  (~1.04/sqrt(2^lgk); lgk=12 → ~1.6%), tolerance-tested.

Scale rationale (100 TB): the raw scan is one shuffle keyed by
``(bucket, keys)`` — high cardinality, so it parallelizes evenly and
partial aggregation (HashAggregate partial+final) does most work
map-side. The rollup output is O(buckets × key-cardinality) rows —
typically 4-6 orders of magnitude smaller than raw — so every
downstream re-rollup/query is interactive regardless of raw size,
and incremental maintenance is append-only per new time bucket.

The reference (TopN.java) has no aggregation-storage layer at all —
this is north-star surface per BASELINE.json, not reference parity.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKETS = ("year", "quarter", "month", "week", "day", "hour", "minute")
# date_trunc granularity ordering, coarse→fine. Note 'week' does not
# nest in month/quarter/year — _check_transition rejects those mixes.
_BUCKET_RANK = {b: i for i, b in enumerate(_BUCKETS)}

BUCKET_COL = "bucket_start"


@dataclass(frozen=True)
class RollupSpec:
    """Which partials a rollup carries. Shared by build, merge, and
    finalize so the column naming scheme stays consistent:
    ``cnt``, ``sum_<c>``, ``min_<c>``, ``max_<c>``, ``hll_<c>``.
    """

    keys: tuple[str, ...] = ()
    sum_cols: tuple[str, ...] = ()
    minmax_cols: tuple[str, ...] = ()
    distinct_cols: tuple[str, ...] = ()
    lgk: int = 12  # HLL precision: rel. error ≈ 1.04 / sqrt(2^lgk)

    def __post_init__(self):
        if not (4 <= self.lgk <= 21):
            raise ValueError(f"lgk must be in [4, 21], got {self.lgk}")


def _check_bucket(bucket: str) -> None:
    if bucket not in _BUCKET_RANK:
        raise ValueError(f"bucket must be one of {_BUCKETS}, got {bucket!r}")


def rollup(df: DataFrame, ts_col: str, bucket: str, spec: RollupSpec) -> DataFrame:
    """Aggregate raw rows into the finest rollup level.

    One wide shuffle over ``(date_trunc(bucket, ts), *keys)``; the
    result is the persistable summary table.
    """
    _check_bucket(bucket)
    aggs = [F.count(F.lit(1)).alias("cnt")]
    aggs += [F.sum(c).alias(f"sum_{c}") for c in spec.sum_cols]
    for c in spec.minmax_cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    aggs += [
        F.hll_sketch_agg(c, F.lit(spec.lgk)).alias(f"hll_{c}")
        for c in spec.distinct_cols
    ]
    return df.groupBy(
        F.date_trunc(bucket, F.col(ts_col)).alias(BUCKET_COL), *spec.keys
    ).agg(*aggs)


# week starts straddle month/quarter/year boundaries, so re-bucketing
# between 'week' and any calendar bucket silently misassigns counts
# (a week's total would land wholly in the month containing its
# Monday). Alignment-compatible pairs only.
_CALENDAR = frozenset({"year", "quarter", "month"})


def _check_transition(source: str, target: str) -> None:
    """A re-rollup is only exact when every source bucket nests
    entirely inside one target bucket: target must be same-or-coarser
    AND not a week↔month/quarter/year mix."""
    if _BUCKET_RANK[target] > _BUCKET_RANK[source]:
        raise ValueError(
            f"re_rollup can only coarsen: target {target!r} is finer "
            f"than source bucket {source!r}"
        )
    if (source == "week" and target in _CALENDAR) or (
        target == "week" and source in _CALENDAR
    ):
        raise ValueError(
            f"{source!r}->{target!r} is not alignment-compatible: weeks "
            "straddle month/quarter/year boundaries, so merged counts "
            "would be misassigned. Re-rollup from a finer bucket "
            "(day or below) instead."
        )


def re_rollup(
    rollup_df: DataFrame,
    bucket: str,
    spec: RollupSpec,
    keys: tuple[str, ...] | None = None,
    source_bucket: str | None = None,
) -> DataFrame:
    """Merge a rollup to a coarser bucket and/or a key subset.

    Reads ONLY the rollup (never raw data): counts and sums add,
    min/min and max/max fold, HLL sketches union. ``keys`` defaults
    to the spec's keys; pass a subset (possibly ``()``) to collapse
    dimensions — legal because every partial is mergeable.

    ``source_bucket`` is the granularity ``rollup_df`` was built at;
    when given, the transition is validated: the target must be
    same-or-coarser (equal is the identity merge the streaming store
    uses), and week↔month/quarter/year mixes are rejected because
    weeks straddle calendar boundaries. Omitting it skips the check
    (caller asserts compatibility).
    """
    _check_bucket(bucket)
    if source_bucket is not None:
        _check_bucket(source_bucket)
        _check_transition(source_bucket, bucket)
    out_keys = spec.keys if keys is None else keys
    extra = set(out_keys) - set(spec.keys)
    if extra:
        raise ValueError(f"keys {sorted(extra)} not in rollup spec {spec.keys}")
    aggs = [F.sum("cnt").alias("cnt")]
    aggs += [F.sum(f"sum_{c}").alias(f"sum_{c}") for c in spec.sum_cols]
    for c in spec.minmax_cols:
        aggs += [
            F.min(f"min_{c}").alias(f"min_{c}"),
            F.max(f"max_{c}").alias(f"max_{c}"),
        ]
    aggs += [
        F.hll_union_agg(f"hll_{c}").alias(f"hll_{c}") for c in spec.distinct_cols
    ]
    return rollup_df.groupBy(
        F.date_trunc(bucket, F.col(BUCKET_COL)).alias(BUCKET_COL), *out_keys
    ).agg(*aggs)


def finalize(rollup_df: DataFrame, spec: RollupSpec) -> DataFrame:
    """Replace opaque HLL sketch columns with ``approx_ndv_<c>``
    BIGINT estimates, yielding a user-facing result frame."""
    out = rollup_df
    for c in spec.distinct_cols:
        out = out.withColumn(
            f"approx_ndv_{c}", F.hll_sketch_estimate(f"hll_{c}")
        ).drop(f"hll_{c}")
    return out
