"""Interval (range-overlap) join, planned as equi-joins.

Spark plans a raw ``a.start <= b.end AND b.start <= a.end`` join as a
nested loop (SURVEY.md §2.3 "theta join") — O(n·m) compares and a
whole-side broadcast. This module applies the same cure as
``asof.asof_join_bucketed``: discretize the time axis so the planner
sees an equi-join.

Standard technique (e.g. Spark range-join hints on Databricks, the
"binning" strategy in genomics interval libraries): each interval is
exploded to every bucket it spans, the join runs on
``(key, bucket)``, and each overlapping pair is kept exactly once at
its *canonical* bucket — the bucket of the later start, which both
intervals necessarily cover.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    start_col: str = "s",
    end_col: str = "e",
    bucket: str = "hour",
    suffixes: tuple[str, str] = ("_a", "_b"),
) -> DataFrame:
    """All pairs (l, r) sharing every ``by`` key whose closed
    intervals ``[start, end]`` overlap: ``l.s <= r.e AND r.s <= l.e``.

    Output columns: the ``by`` keys plus every non-key column of each
    side suffixed with ``suffixes``. Rows with ``end < start`` are
    dropped (invalid intervals).

    Scale shape: explode each interval to the buckets it spans
    (``ceil(len/bucket) + 1`` rows — choose ``bucket`` near the median
    interval length), one shuffle on ``(by, bucket)``, and a
    bucket-local pair filter. Long-tail intervals fatten the explode
    linearly, never quadratically; hot ``(by, bucket)`` cells are the
    residual skew and AQE's skew-join splitting applies to them.
    """
    sa, sb = suffixes

    def expand(df: DataFrame, suffix: str) -> DataFrame:
        val_cols = [c for c in df.columns if c not in by]
        renamed = df.select(
            *by, *[F.col(c).alias(c + suffix) for c in val_cols]
        ).where(F.col(end_col + suffix) >= F.col(start_col + suffix))
        return renamed.withColumn(
            "_bkt",
            F.explode(
                F.sequence(
                    F.date_trunc(bucket, F.col(start_col + suffix)),
                    F.date_trunc(bucket, F.col(end_col + suffix)),
                    F.expr(f"interval 1 {bucket}"),
                )
            ),
        )

    la, rb = expand(left, sa), expand(right, sb)
    pair_start = F.greatest(
        F.date_trunc(bucket, F.col(start_col + sa)),
        F.date_trunc(bucket, F.col(start_col + sb)),
    )
    return (
        la.join(rb, [*by, "_bkt"])
        .where(
            (F.col(start_col + sa) <= F.col(end_col + sb))
            & (F.col(start_col + sb) <= F.col(end_col + sa))
            # canonical bucket: count each pair exactly once, at the
            # bucket of the later start (covered by both by overlap)
            & (F.col("_bkt") == pair_start)
        )
        .drop("_bkt")
    )
