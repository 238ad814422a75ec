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


def profile_table(
    df: DataFrame, cols: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """ANALYZE-style column profile: one row per column with
    ``(col_name, n, n_null, ndv, min_v, max_v)`` — min/max rendered as
    strings so heterogeneous column types share one result schema.

    ONE aggregation pass computes every column's statistics
    simultaneously (a single wide HashAggregate row, then a map-only
    ``stack`` unpivot) — never one job per column. ``approx=True``
    swaps exact ``COUNT(DISTINCT)`` for HLL++
    (`approx_count_distinct`): at 100 TB the exact form expands the
    aggregate per distinct column (Expand × columns shuffle), while
    the sketch keeps the pass single-shuffle and bounded-memory —
    profiling wants the sketch; the exact form exists to be
    oracle-comparable.
    """
    cols = cols or df.columns
    ndv = F.approx_count_distinct if approx else F.countDistinct
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{c}"),
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"__null_{c}"),
            ndv(c).alias(f"__ndv_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', __n_{c}, __null_{c}, CAST(__ndv_{c} AS BIGINT), __min_{c}, __max_{c}"
        for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stacked}) AS "
            "(col_name, n, n_null, ndv, min_v, max_v)"
        )
    )


def check_expectations(
    df: DataFrame,
    rules: dict[str, Column],
    allow_fail: float = 0.0,
) -> DataFrame:
    """Data-quality gate: evaluate named boolean expectations in ONE
    aggregation pass — ``(rule, n, n_fail, fail_frac, ok)`` per rule.

    A NULL predicate counts as a failure (an expectation that cannot
    be evaluated is not met). ``ok`` is ``fail_frac <= allow_fail``.
    Like :func:`profile_table`, every rule aggregates in the same
    wide row then unpivots map-side — the 100 TB cost is one scan
    regardless of rule count; no driver-side row loop, so the gate
    composes with any upstream DataFrame (post-join, post-transform).

    Rule names are embedded as SQL string literals in the unpivot —
    keep them to word characters/spaces/dashes.
    """
    if not rules:
        raise ValueError("check_expectations needs at least one rule")
    for name in rules:
        if "'" in name or "\\" in name:
            raise ValueError(f"rule name {name!r} may not contain quotes")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, pred in enumerate(rules.values()):
        # outer coalesce: SUM over zero rows is NULL — an empty input
        # has zero failures, not an unevaluable gate
        aggs.append(
            F.coalesce(
                F.sum((~F.coalesce(pred, F.lit(False))).cast("bigint")),
                F.lit(0),
            ).alias(f"__f_{i}")
        )
    wide = df.agg(*aggs)
    stacked = ", ".join(
        f"'{name}', __f_{i}" for i, name in enumerate(rules)
    )
    return wide.select(
        F.col("__n").alias("n"),
        F.expr(f"stack({len(rules)}, {stacked}) AS (rule, n_fail)"),
    ).select(
        "rule",
        "n",
        "n_fail",
        F.round(F.col("n_fail") / F.greatest(F.col("n"), F.lit(1)), 6).alias(
            "fail_frac"
        ),
        (
            F.col("n_fail") <= F.lit(allow_fail) * F.col("n")
        ).alias("ok"),
    )
