"""as-of join tests vs the pandas merge_asof oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from topn_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(11)
    left = pd.DataFrame(
        {
            "lid": np.arange(200),
            "k": rng.integers(0, 5, 200),
            "t": rng.integers(0, 1000, 200).astype("int64"),
        }
    ).sort_values(["t", "lid"], ignore_index=True)
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 100),
            "rt": np.sort(rng.integers(0, 1000, 100)).astype("int64"),
            "val": rng.normal(size=100).round(6),
        }
    )
    # drop duplicate (k, rt) so merge_asof's pick is unambiguous
    right = right.drop_duplicates(["k", "rt"], keep="last").reset_index(
        drop=True
    )
    return left, right


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_pandas(spark, frames, direction):
    left, right = frames
    want = pd.merge_asof(
        left.sort_values("t"),
        right.sort_values("rt"),
        left_on="t",
        right_on="rt",
        by="k",
        direction=direction,
    ).sort_values("lid", ignore_index=True)
    l = spark.createDataFrame(left)
    r = spark.createDataFrame(right)
    got = (
        asof_join(
            l, r, "t", "rt", left_by="k", right_by="k", value_cols=["val"]
        )
        .orderBy("lid")
        .toPandas()
        if direction == "backward"
        else asof_join(
            l,
            r,
            "t",
            "rt",
            left_by="k",
            right_by="k",
            value_cols=["val"],
            direction="forward",
        )
        .orderBy("lid")
        .toPandas()
    )
    assert list(got["lid"]) == list(want["lid"])
    gv = got["val"].to_numpy(dtype=float)
    wv = want["val"].to_numpy(dtype=float)
    assert ((gv == wv) | (np.isnan(gv) & np.isnan(wv))).all()


def test_asof_no_match_is_null(spark):
    l = spark.createDataFrame([(1, 5)], "lid long, t long")
    r = spark.createDataFrame([(10, 1.0)], "rt long, val double")
    out = asof_join(l, r, "t", "rt", value_cols=["val"]).collect()
    assert out[0].val is None
    fwd = asof_join(
        l, r, "t", "rt", value_cols=["val"], direction="forward"
    ).collect()
    assert fwd[0].val == 1.0


def test_asof_tiebreak_deterministic(spark):
    l = spark.createDataFrame([(1, 10)], "lid long, t long")
    r = spark.createDataFrame(
        [(10, 1, "a"), (10, 3, "c"), (10, 2, "b")],
        "rt long, pri int, val string",
    )
    out = asof_join(
        l, r, "t", "rt", value_cols=["val"], right_tiebreak="pri"
    ).collect()
    assert out[0].val == "c"  # highest tiebreak wins (arg_max semantics)


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_tolerance_matches_pandas(spark, frames, direction):
    left, right = frames
    want = pd.merge_asof(
        left.sort_values("t"),
        right.sort_values("rt"),
        left_on="t",
        right_on="rt",
        by="k",
        direction=direction,
        tolerance=50,
    ).sort_values("lid", ignore_index=True)
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            "t",
            "rt",
            left_by="k",
            right_by="k",
            value_cols=["val"],
            direction=direction,
            tolerance=50,
        )
        .orderBy("lid")
        .toPandas()
    )
    gv = got["val"].to_numpy(dtype=float)
    wv = want["val"].to_numpy(dtype=float)
    assert ((gv == wv) | (np.isnan(gv) & np.isnan(wv))).all()


def test_asof_inclusive_boundary(spark):
    l = spark.createDataFrame([(1, 10)], "lid long, t long")
    r = spark.createDataFrame([(10, 7.0)], "rt long, val double")
    assert (
        asof_join(l, r, "t", "rt", value_cols=["val"]).collect()[0].val == 7.0
    )


def test_bucketed_asof_matches_bruteforce(spark):
    """asof_join_bucketed vs a pure-Python model over adversarial
    timestamps: probes before/after/inside the build range, bucket
    boundaries, gap buckets, duplicate build times."""
    import datetime as dt

    from topn_spark.operators.asof import asof_join_bucketed

    base = dt.datetime(2024, 3, 1)
    bt = [0, 1, 59, 60, 61, 600, 600, 3600, 86400 * 3 + 30]
    build_rows = [
        (i, base + dt.timedelta(minutes=m), float(i)) for i, m in enumerate(bt)
    ]
    build = spark.createDataFrame(build_rows, "bid long, t timestamp, v double")
    probe_minutes = [-500, -1, 0, 30, 59, 60, 90, 599, 601, 3599,
                     86400 * 3 + 29, 86400 * 3 + 31, 86400 * 10]
    probe = spark.createDataFrame(
        [(j, base + dt.timedelta(minutes=m))
         for j, m in enumerate(probe_minutes)],
        "pid long, pt timestamp",
    )
    got = {
        r["pid"]: r["t_asof"]
        for r in asof_join_bucketed(
            probe, build, "pt", "t", left_id="pid", bucket="hour"
        ).collect()
    }
    fwd = {
        r["pid"]: r["t_asof"]
        for r in asof_join_bucketed(
            probe,
            build,
            "pt",
            "t",
            left_id="pid",
            bucket="hour",
            direction="forward",
        ).collect()
    }
    for j, m in enumerate(probe_minutes):
        pt = base + dt.timedelta(minutes=m)
        expect = max((t for _, t, _ in build_rows if t <= pt), default=None)
        assert got[j] == expect, (j, m, got[j], expect)
        expect_f = min(
            (t for _, t, _ in build_rows if t >= pt), default=None
        )
        assert fwd[j] == expect_f, (j, m, fwd[j], expect_f)


def test_asof_nearest_matches_pandas(spark, frames):
    left, right = frames
    want = pd.merge_asof(
        left.sort_values("t"),
        right.sort_values("rt"),
        left_on="t",
        right_on="rt",
        by="k",
        direction="nearest",
    ).sort_values("lid", ignore_index=True)
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            "t",
            "rt",
            left_by="k",
            right_by="k",
            value_cols=["val"],
            direction="nearest",
        )
        .orderBy("lid")
        .toPandas()
    )
    assert list(got["lid"]) == list(want["lid"])
    gv = got["val"].to_numpy(dtype=float)
    wv = want["val"].to_numpy(dtype=float)
    assert ((gv == wv) | (np.isnan(gv) & np.isnan(wv))).all()


def test_asof_nearest_tolerance_and_ties(spark, frames):
    left, right = frames
    want = pd.merge_asof(
        left.sort_values("t"),
        right.sort_values("rt"),
        left_on="t",
        right_on="rt",
        by="k",
        direction="nearest",
        tolerance=15,
    ).sort_values("lid", ignore_index=True)
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            "t",
            "rt",
            left_by="k",
            right_by="k",
            value_cols=["val"],
            direction="nearest",
            tolerance=15,
        )
        .orderBy("lid")
        .toPandas()
    )
    gv = got["val"].to_numpy(dtype=float)
    wv = want["val"].to_numpy(dtype=float)
    assert ((gv == wv) | (np.isnan(gv) & np.isnan(wv))).all()
    # explicit equidistant tie -> backward (pandas semantics)
    l = spark.createDataFrame(pd.DataFrame({"lid": [0], "t": [10]}))
    r = spark.createDataFrame(
        pd.DataFrame({"rt": [5, 15], "val": [1.0, 2.0]})
    )
    out = asof_join(
        l, r, "t", "rt", value_cols=["val"], direction="nearest"
    ).collect()
    assert out[0].val == 1.0


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_asof_nearest_fuzz_vs_pandas(spark, seed):
    """Random keyed frames, duplicate probe times, sparse keys —
    nearest must match pandas merge_asof exactly (values and NULL
    pattern) for every seed."""
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "lid": np.arange(120),
            "k": rng.integers(0, 7, 120),  # key 6 often right-empty
            "t": rng.integers(0, 300, 120).astype("int64"),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 60),
            "rt": np.sort(rng.integers(0, 300, 60)).astype("int64"),
            "val": rng.normal(size=60).round(6),
        }
    ).drop_duplicates(["k", "rt"], keep="last")
    want = pd.merge_asof(
        left.sort_values(["t", "lid"]),
        right.sort_values("rt"),
        left_on="t",
        right_on="rt",
        by="k",
        direction="nearest",
    ).sort_values("lid", ignore_index=True)
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            "t",
            "rt",
            left_by="k",
            right_by="k",
            value_cols=["val"],
            direction="nearest",
        )
        .orderBy("lid")
        .toPandas()
    )
    gv = got["val"].to_numpy(dtype=float)
    wv = want["val"].to_numpy(dtype=float)
    assert ((gv == wv) | (np.isnan(gv) & np.isnan(wv))).all()


def test_asof_nearest_null_probe_key_matches_nothing(spark):
    """A left row with a NULL timestamp gets NULL matched values in
    ALL directions — including 'nearest', where the desc scan sorts
    NULL last and, ungated, would spuriously match the min-t build
    row (pandas merge_asof drops/nulls NULL keys likewise)."""
    from topn_spark.operators.asof import asof_join

    l = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 25.0)], "lid int, t double"
    )
    r = spark.createDataFrame(
        [(9.0, "a"), (24.0, "b")], "rt double, val string"
    )
    expected = {
        "backward": {1: "a", 2: None, 3: "b"},
        "forward": {1: "b", 2: None, 3: None},
        "nearest": {1: "a", 2: None, 3: "b"},
    }
    for direction, want in expected.items():
        matched = {
            row.lid: row.val
            for row in asof_join(
                l, r, "t", "rt", value_cols=["val"], direction=direction
            ).collect()
        }
        assert matched == want, direction
