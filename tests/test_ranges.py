"""interval_overlap_join: bucketed equi-join plan must exactly match
the naive theta-join semantics (x54 cross-checks vs DuckDB too)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from topn_spark.operators.ranges import interval_overlap_join
from topn_spark.plans import assert_plan_lacks


def _iv(spark, rows):
    return spark.createDataFrame(
        [
            (k, i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=s),
             dt.datetime(2024, 1, 1) + dt.timedelta(minutes=e))
            for k, i, s, e in rows
        ],
        "k long, id long, s timestamp, e timestamp",
    )


def test_planted_overlaps(spark):
    left = _iv(spark, [(1, 1, 0, 60), (1, 2, 200, 260), (2, 3, 0, 60)])
    right = _iv(
        spark,
        [
            (1, 10, 30, 90),     # overlaps id 1
            (1, 11, 61, 120),    # disjoint from id 1 (closed: 60<61)
            (1, 12, 60, 70),     # touches id 1 endpoint → overlap
            (1, 13, 250, 400),   # overlaps id 2, crosses many buckets
            (2, 14, 500, 600),   # same key, no overlap
            (3, 15, 0, 60),      # different key
        ],
    ).withColumnRenamed("id", "rid")
    got = {
        (r["id_a"], r["rid_b"])
        for r in interval_overlap_join(
            left, right, ["k"], "s", "e", "hour"
        ).collect()
    }
    assert got == {(1, 10), (1, 12), (2, 13)}


def test_matches_naive_theta_join_and_counts_once(spark):
    # pseudo-random intervals incl. multi-bucket spans and duplicates
    rows = [
        (i % 3, i, (i * 37) % 500, (i * 37) % 500 + (i * 13) % 240)
        for i in range(120)
    ]
    df = _iv(spark, rows)
    other = df.withColumnRenamed("id", "rid")
    bucketed = interval_overlap_join(df, other, ["k"], "s", "e", "hour")
    got = sorted(
        (r["id_a"], r["rid_b"]) for r in bucketed.collect()
    )
    a, b = df.alias("a"), other.alias("b")
    naive = sorted(
        (r["id"], r["rid"])
        for r in a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.s") <= F.col("b.e"))
            & (F.col("b.s") <= F.col("a.e")),
        ).collect()
    )
    assert got == naive  # equality also proves exactly-once (no dup pairs)


def test_plan_is_equi_join_not_nested_loop(spark):
    df = _iv(spark, [(1, 1, 0, 60)])
    out = interval_overlap_join(
        df, df.withColumnRenamed("id", "rid"), ["k"], "s", "e"
    )
    assert_plan_lacks(out, "BroadcastNestedLoopJoin", "CartesianProduct")
