"""coalesce_intervals / ewma / triangle_count / ab_compare unit tests
against closed-form and brute-force references."""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from topn_spark.diag import ab_compare
from topn_spark.operators.graph import triangle_count
from topn_spark.operators.pipeline import coalesce_intervals, ewma


def test_coalesce_overlap_touch_gap(spark):
    df = spark.createDataFrame(
        [
            ("a", 1, 5),   # overlaps next
            ("a", 3, 8),   # touches next (end == start: merge)
            ("a", 8, 10),
            ("a", 12, 13),  # gap -> own island
            ("b", 1, 2),
            ("a", 2, 4),   # contained; also tests non-sorted input
        ],
        "k string, s int, e int",
    )
    got = [
        tuple(r)
        for r in coalesce_intervals(df, "s", "e", ["k"])
        .orderBy("k", "start")
        .collect()
    ]
    assert got == [("a", 1, 10, 4), ("a", 12, 13, 1), ("b", 1, 2, 1)]


def test_coalesce_contained_interval_never_splits(spark):
    # an interval fully inside an earlier one must not reopen islands
    df = spark.createDataFrame(
        [("k", 1, 100), ("k", 2, 3), ("k", 50, 60), ("k", 99, 150)],
        "k string, s int, e int",
    )
    got = coalesce_intervals(df, "s", "e", ["k"]).collect()
    assert len(got) == 1 and got[0]["end"] == 150 and got[0]["n_merged"] == 4


def test_coalesce_no_keys_global(spark):
    df = spark.createDataFrame(
        [(1, 2), (5, 6), (2, 5)], "s int, e int"
    )
    got = coalesce_intervals(df, "s", "e").collect()
    assert len(got) == 1 and (got[0]["start"], got[0]["end"]) == (1, 6)


def test_ewma_matches_pandas(spark):
    rng = np.random.default_rng(3)
    rows = [
        (k, int(t), float(v))
        for k in "ab"
        for t, v in enumerate(rng.uniform(0, 100, 50))
    ]
    df = spark.createDataFrame(rows, "k string, t int, v double")
    got = (
        ewma(df, ["k"], "t", "v", alpha=0.3)
        .orderBy("k", "t")
        .toPandas()
    )
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["k", "t", "v"]).sort_values(["k", "t"])
    want = pdf.groupby("k").v.transform(
        lambda s: s.ewm(alpha=0.3, adjust=False).mean()
    )
    assert np.allclose(got.ewma.to_numpy(), want.to_numpy(), atol=1e-9)


def test_ewma_keeps_all_columns_and_validates(spark):
    df = spark.createDataFrame([("a", 1, 2.0, "x")], "k string, t int, v double, extra string")
    out = ewma(df, ["k"], "t", "v", alpha=1.0)
    assert set(out.columns) == {"k", "t", "v", "extra", "ewma"}
    assert out.collect()[0]["ewma"] == 2.0  # alpha=1: ewma == value
    with pytest.raises(ValueError, match="alpha"):
        ewma(df, ["k"], "t", "v", alpha=0.0)
    with pytest.raises(ValueError, match="key"):
        ewma(df, [], "t", "v", alpha=0.5)


def _brute_triangles(edges):
    adj = set()
    nodes = set()
    for u, v in edges:
        if u != v:
            adj.add((min(u, v), max(u, v)))
            nodes.update((u, v))
    return sum(
        1
        for a, b, c in itertools.combinations(sorted(nodes), 3)
        if (a, b) in adj and (a, c) in adj and (b, c) in adj
    )


def test_triangles_random_graph(spark):
    rng = np.random.default_rng(11)
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, 25, size=(120, 2))
    ]
    df = spark.createDataFrame(edges, "src int, dst int")
    row = triangle_count(df).collect()[0]
    assert row["n_triangles"] == _brute_triangles(edges)
    # duplicate + reversed edges and self-loops must not change counts
    noisy = edges + [(b, a) for a, b in edges] + [(3, 3), (7, 7)]
    row2 = triangle_count(
        spark.createDataFrame(noisy, "src int, dst int")
    ).collect()[0]
    assert row2["n_triangles"] == row["n_triangles"]
    assert row2["n_edges"] == row["n_edges"]


def test_ab_compare_closed_form(spark):
    # 1000 treatment (200 conv), 500 control (50 conv)
    rows = (
        [(True, True)] * 200
        + [(True, False)] * 800
        + [(False, True)] * 50
        + [(False, False)] * 450
    )
    df = spark.createDataFrame(rows, "t boolean, s boolean")
    from pyspark.sql import functions as F

    r = ab_compare(df, F.col("t"), F.col("s")).collect()[0]
    assert (r["n_t"], r["n_c"], r["conv_t"], r["conv_c"]) == (
        1000, 500, 200, 50,
    )
    p_t, p_c = 0.2, 0.1
    pool = 250 / 1500
    se = (pool * (1 - pool) * (1 / 1000 + 1 / 500)) ** 0.5
    assert r["abs_lift"] == pytest.approx(0.1, abs=1e-6)
    assert r["z"] == pytest.approx((p_t - p_c) / se, abs=1e-5)


def test_ab_compare_degenerate_arms(spark):
    from pyspark.sql import functions as F

    # no successes at all -> z undefined (NULL), rates 0
    df = spark.createDataFrame([(True, False), (False, False)], "t boolean, s boolean")
    r = ab_compare(df, F.col("t"), F.col("s")).collect()[0]
    assert r["z"] is None and r["rate_t"] == 0.0
    # empty control arm -> rate_c NULL, z NULL
    df2 = spark.createDataFrame([(True, True), (True, False)], "t boolean, s boolean")
    r2 = ab_compare(df2, F.col("t"), F.col("s")).collect()[0]
    assert r2["n_c"] == 0 and r2["rate_c"] is None and r2["z"] is None


def _brute_skyline(pts):
    pts = set(pts)
    out = set()
    for p in pts:
        dominated = any(
            q != p and q[0] >= p[0] and q[1] >= p[1] for q in pts
        )
        if not dominated:
            out.add(p)
    return out


@pytest.mark.parametrize("prune", ["agg", "arrow"])
def test_skyline_matches_brute_force(spark, prune):
    from topn_spark.operators.pipeline import skyline_2d

    rng = np.random.default_rng(5)
    pts = [(int(a), int(b)) for a, b in rng.integers(0, 40, size=(300, 2))]
    df = spark.createDataFrame(pts, "x int, y int").repartition(7)
    got = {tuple(r) for r in skyline_2d(df, "x", "y", prune=prune).collect()}
    assert got == _brute_skyline(pts)


@pytest.mark.parametrize("prune", ["agg", "arrow"])
def test_skyline_ties_and_duplicates(spark, prune):
    from topn_spark.operators.pipeline import skyline_2d

    # duplicates collapse; equal-x chains keep only the max y;
    # equal-y chains keep only the max x
    df = spark.createDataFrame(
        [(5, 5), (5, 5), (5, 4), (4, 5), (6, 2), (2, 6)],
        "x int, y int",
    )
    got = {tuple(r) for r in skyline_2d(df, "x", "y", prune=prune).collect()}
    assert got == {(5, 5), (6, 2), (2, 6)}


def test_time_weighted_avg_step_integral(spark):
    from pyspark.sql import functions as F
    from topn_spark.operators.pipeline import time_weighted_avg

    rows = [
        ("a", "2024-01-01 00:00:00", 10.0),  # holds 60 s
        ("a", "2024-01-01 00:01:00", 20.0),  # holds 120 s
        ("a", "2024-01-01 00:03:00", 99.0),  # zero width at the end
        ("b", "2024-01-01 00:00:00", 7.0),   # single obs
    ]
    df = spark.createDataFrame(rows, "k string, ts string, v double")
    df = df.withColumn("ts", F.to_timestamp("ts"))
    got = {r["k"]: r for r in time_weighted_avg(df, ["k"], "ts", "v").collect()}
    assert got["a"]["twa"] == pytest.approx((10 * 60 + 20 * 120) / 180, abs=1e-6)
    assert got["a"]["n_obs"] == 3
    assert got["b"]["twa"] == 7.0
    # plain AVG would say 43 for key a — the burst-weighting error
    assert got["a"]["twa"] < 20


def test_skyline_arrow_phase1_is_map_side(spark):
    """The Arrow local prune must not shuffle: no Exchange may appear
    below the mapInPandas node (ADVICE r1 — the old
    spark_partition_id window inserted one)."""
    from topn_spark.operators.pipeline import skyline_2d

    df = spark.range(0, 1000).selectExpr(
        "CAST(id % 97 AS DOUBLE) AS x", "CAST(id % 89 AS DOUBLE) AS y"
    )
    plan = (
        skyline_2d(df, "x", "y", prune="arrow")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # everything below the python-worker prune must be exchange-free:
    # the only exchanges allowed are above it (distinct + final window)
    below = plan.split("MapInPandas")[-1]
    assert "Exchange" not in below, below


def test_skyline_agg_phase1_is_codegen_partial_agg(spark):
    """The default prune is a JVM hash aggregate with map-side partial
    combine: partial_max below the Exchange, no Python worker node
    anywhere in the plan."""
    from topn_spark.operators.pipeline import skyline_2d

    df = spark.range(0, 1000).selectExpr(
        "CAST(id % 97 AS DOUBLE) AS x", "CAST(id % 89 AS DOUBLE) AS y"
    )
    plan = (
        skyline_2d(df, "x", "y")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" not in plan
    below_exchange = plan.split("Exchange", 1)[-1]
    assert "partial_max" in below_exchange, plan
