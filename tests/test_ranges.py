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


def test_grid_radius_join_matches_brute_force(spark):
    import itertools
    import random

    from topn_spark.operators.ranges import grid_radius_join

    rng = random.Random(7)
    pts = [
        (i, float(rng.randint(0, 200)) / 2.0, float(rng.randint(0, 200)) / 2.0)
        for i in range(150)
    ]
    r = 9.0
    want = sorted(
        (a[0], b[0])
        for a, b in itertools.combinations(pts, 2)
        if (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2 <= r * r
    )
    df = spark.createDataFrame(pts, "id long, x double, y double")
    out = grid_radius_join(df, "id", "x", "y", r)
    got = sorted((row.a_id, row.b_id) for row in out.collect())
    assert got == want and len(want) > 50


def test_grid_radius_join_boundary_inclusive(spark):
    from topn_spark.operators.ranges import grid_radius_join

    # dist exactly r (3-4-5 triangle, r=5) is included; cell-adjacent
    # pairs beyond r are excluded; same-cell far pair excluded.
    df = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 3.0, 4.0), (3, 5.1, 0.0), (4, 0.0, 20.0)],
        "id long, x double, y double",
    )
    out = grid_radius_join(df, "id", "x", "y", 5.0).collect()
    pairs = sorted((r.a_id, r.b_id) for r in out)
    assert pairs == [(1, 2), (2, 3)]
    # (2,3): dx=2.1 dy=4 -> 4.41+16=20.41 <= 25 yes. (1,3): 26.01 no.


def test_grid_radius_join_is_equi_join(spark):
    from topn_spark.operators.ranges import grid_radius_join

    df = spark.range(100).selectExpr(
        "id", "CAST(id % 37 AS DOUBLE) x", "CAST(id % 53 AS DOUBLE) y"
    )
    assert_plan_lacks(
        grid_radius_join(df, "id", "x", "y", 4.0),
        "NestedLoop",
        "CartesianProduct",
    )
