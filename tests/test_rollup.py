"""Hypertable rollup operator (operators/rollup.py).

Contract: algebraic partials (cnt/sum/min/max) merge EXACTLY across
bucket coarsening and key dropping; HLL distinct sketches union with
bounded error. North-star surface (SURVEY §2.6) — the reference has
no aggregation-storage layer.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from topn_spark.catalog import load_table
from topn_spark.operators.rollup import (
    BUCKET_COL,
    RollupSpec,
    finalize,
    re_rollup,
    rollup,
)

SPEC = RollupSpec(
    keys=("event_type",),
    sum_cols=("value_dec",),
    minmax_cols=("value",),
    distinct_cols=("user_id",),
)


@pytest.fixture(scope="module")
def events(spark):
    return (
        load_table(spark, SF_SMALL, "events")
        .withColumn("value_dec", F.col("value").cast("decimal(18,2)"))
        .cache()
    )


def _by_key(rows, nkeys=2):
    return {tuple(r[:nkeys]): r[nkeys:] for r in (tuple(r) for r in rows)}


def test_merge_equals_direct_daily(spark, events):
    """daily-from-hourly == daily-from-raw, exactly, on every
    algebraic column (the x62 property, checked column-wise here)."""
    hourly = rollup(events, "ts", "hour", SPEC)
    merged = re_rollup(hourly, "day", SPEC)
    direct = rollup(events, "ts", "day", SPEC)
    cols = [BUCKET_COL, "event_type", "cnt", "sum_value_dec", "min_value", "max_value"]
    got = _by_key(merged.select(*cols).collect())
    want = _by_key(direct.select(*cols).collect())
    assert got == want and len(got) > 0


def test_key_drop_equals_global(spark, events):
    """Collapsing the event_type dimension from the keyed rollup
    equals a rollup built with no keys at all."""
    keyed = rollup(events, "ts", "hour", SPEC)
    collapsed = re_rollup(keyed, "day", SPEC, keys=())
    global_spec = RollupSpec(
        sum_cols=SPEC.sum_cols,
        minmax_cols=SPEC.minmax_cols,
    )
    direct = rollup(events, "ts", "day", global_spec)
    cols = [BUCKET_COL, "cnt", "sum_value_dec", "min_value", "max_value"]
    got = _by_key(collapsed.select(*cols).collect(), nkeys=1)
    want = _by_key(direct.select(*cols).collect(), nkeys=1)
    assert got == want and len(got) > 0


def test_hll_merge_tolerance(spark, events):
    """Daily distinct-user estimates from UNIONED hourly sketches stay
    within 5% of exact (lgk=12 → ~1.6% expected error)."""
    hourly = rollup(events, "ts", "hour", SPEC)
    est = _by_key(
        finalize(re_rollup(hourly, "day", SPEC, keys=()), SPEC)
        .select(BUCKET_COL, "approx_ndv_user_id")
        .collect(),
        nkeys=1,
    )
    exact = _by_key(
        events.groupBy(F.date_trunc("day", "ts").alias(BUCKET_COL))
        .agg(F.countDistinct("user_id").alias("ndv"))
        .collect(),
        nkeys=1,
    )
    assert est.keys() == exact.keys() and len(exact) > 0
    for k, (e,) in est.items():
        (x,) = exact[k]
        assert abs(e - x) <= max(1, 0.05 * x), (k, e, x)


def test_empty_input(spark, events):
    empty = events.where(F.lit(False))
    assert rollup(empty, "ts", "hour", SPEC).count() == 0
    assert re_rollup(rollup(empty, "ts", "hour", SPEC), "day", SPEC).count() == 0


def test_validation(spark, events):
    with pytest.raises(ValueError, match="bucket"):
        rollup(events, "ts", "fortnight", SPEC)
    with pytest.raises(ValueError, match="lgk"):
        RollupSpec(lgk=2)
    with pytest.raises(ValueError, match="not in rollup spec"):
        re_rollup(rollup(events, "ts", "hour", SPEC), "day", SPEC, keys=("user_id",))


def test_partial_aggregation_plan(spark, events):
    """The build is one partial+final HashAggregate pair — map-side
    combine keeps the shuffle at O(buckets × keys), not O(rows)."""
    plan = rollup(events, "ts", "hour", SPEC)._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan
    assert plan.count("partial") >= 1 or "Partial" in plan


# ---------------------------------------------------------------------------
# transition validation (ADVICE r1: coarsening + week alignment)
# ---------------------------------------------------------------------------

def test_re_rollup_rejects_finer_target(spark, events):
    hourly = rollup(events, "ts", "hour", SPEC)
    with pytest.raises(ValueError, match="finer"):
        re_rollup(hourly, "minute", SPEC, source_bucket="hour")


def test_re_rollup_rejects_week_calendar_mix(spark, events):
    weekly = rollup(events, "ts", "week", SPEC)
    with pytest.raises(ValueError, match="alignment"):
        re_rollup(weekly, "month", SPEC, source_bucket="week")
    monthly = rollup(events, "ts", "month", SPEC)
    # month->week trips the rank check first (week ranks finer than
    # month); either way it must raise
    with pytest.raises(ValueError, match="finer|alignment"):
        re_rollup(monthly, "week", SPEC, source_bucket="month")


def test_re_rollup_equal_bucket_is_identity_merge(spark, events):
    """Equal-bucket re-rollup (the streaming store's merge path) is
    legal and exact."""
    daily = rollup(events, "ts", "day", SPEC)
    again = re_rollup(daily, "day", SPEC, source_bucket="day")
    a = daily.select(BUCKET_COL, "event_type", "cnt", "sum_value_dec")
    b = again.select(BUCKET_COL, "event_type", "cnt", "sum_value_dec")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_re_rollup_day_to_week_allowed(spark, events):
    daily = rollup(events, "ts", "day", SPEC)
    weekly = re_rollup(daily, "week", SPEC, source_bucket="day")
    direct = rollup(events, "ts", "week", SPEC)
    assert (
        weekly.agg(F.sum("cnt")).first()[0]
        == direct.agg(F.sum("cnt")).first()[0]
    )
