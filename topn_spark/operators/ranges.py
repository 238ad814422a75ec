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


def grid_radius_join(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: float,
) -> DataFrame:
    """Planar within-``radius`` self-join: every unordered point pair
    ``(a, b)`` with ``(ax-bx)^2 + (ay-by)^2 <= radius^2``, each pair
    once with ``a_id < b_id``. Output: ``a_id, b_id, dist_sq``
    (squared distance — no sqrt, so the value is exact IEEE arithmetic
    on both engine and oracle).

    The naive formulation is an O(n^2) cross join. Spatial cure,
    same family as ``interval_overlap_join``'s binning: hash points
    into a square grid of cell size ``radius``; any pair within
    ``radius`` lies in the same or an 8-adjacent cell. Probe side
    explodes to its 3x3 cell neighborhood (9 rows), build side keeps
    one row per point, and the join is a pure equi-join on the cell
    id — shuffle-partitioned by cell, never all-pairs. The candidate
    set per point is bounded by local density * 9 cells; the exact
    distance filter runs cell-locally inside the joined partition.
    ``a_id < b_id`` both canonicalizes the unordered pair and halves
    the filter work. Dense hot cells are ordinary join skew — AQE's
    skew-join split applies; at 100 TB pick ``radius``-sized cells so
    a cell holds ~(density * radius^2) points, and shrink the explode
    to 4 quadrant-neighbors if 9x fan-out dominates the shuffle.
    """
    pt = df.select(
        F.col(id_col).cast("bigint").alias("_id"),
        F.col(x_col).cast("double").alias("_x"),
        F.col(y_col).cast("double").alias("_y"),
        F.floor(F.col(x_col) / F.lit(radius)).alias("_cx"),
        F.floor(F.col(y_col) / F.lit(radius)).alias("_cy"),
    )
    probe = pt.select(
        F.col("_id").alias("a_id"),
        F.col("_x").alias("_ax"),
        F.col("_y").alias("_ay"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("_cx") + F.lit(dx)).alias("cx"),
                        (F.col("_cy") + F.lit(dy)).alias("cy"),
                    )
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ).alias("_cell"),
    )
    build = pt.select(
        F.col("_id").alias("b_id"),
        F.col("_x").alias("_bx"),
        F.col("_y").alias("_by"),
        F.struct(
            F.col("_cx").alias("cx"), F.col("_cy").alias("cy")
        ).alias("_cell"),
    )
    dist_sq = (F.col("_ax") - F.col("_bx")) * (
        F.col("_ax") - F.col("_bx")
    ) + (F.col("_ay") - F.col("_by")) * (F.col("_ay") - F.col("_by"))
    return (
        probe.join(build, "_cell")
        .where(F.col("a_id") < F.col("b_id"))
        .withColumn("dist_sq", dist_sq)
        .where(F.col("dist_sq") <= F.lit(float(radius) * float(radius)))
        .select("a_id", "b_id", "dist_sq")
    )
