"""Data-distribution diagnostics: the pre-flight checks run before
shuffling 100 TB on a key.

``plans.audit_scale`` lints plan *shape*; these profile the *data* —
the other half of scale readiness. Both are one aggregate each, cheap
relative to the join/window they de-risk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_skew_profile(df: DataFrame, cols: list[str], k: int = 20) -> DataFrame:
    """Top-``k`` heaviest key values of ``cols`` with their share of
    all rows: the check to run before using ``cols`` as a join or
    window key. A single key holding >1/partitions of the rows will
    serialize that partition; route such keys to
    ``topn_grouped_salted`` (windows) or rely on AQE skew-join
    splitting (joins), or salt manually.

    One partial+final hash aggregate plus a bounded-heap top-k —
    no sort, no collect.
    """
    counts = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("n"))
    total = df.agg(F.count(F.lit(1)).alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            *cols,
            "n",
            F.round(F.col("n") / F.col("_total"), 6).alias("frac"),
        )
        .orderBy(F.col("n").desc(), *[F.col(c).asc_nulls_last() for c in cols])
        .limit(k)
    )


def partition_profile(df: DataFrame) -> DataFrame:
    """Rows per physical partition (``spark_partition_id``): shows
    unbalanced inputs before they become straggler tasks. Returns
    ``(partition, n)`` — compare max/median to judge balance; empty
    partitions after a selective filter suggest coalescing."""
    return (
        df.select(F.spark_partition_id().alias("partition"))
        .groupBy("partition")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("partition")
    )
