"""Streaming join + dedup tests: replay equivalence vs the identical
batch formulation (SURVEY.md §5.3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from topn_spark.catalog import load_table
from topn_spark.streaming import (
    enrich_stream,
    interval_join,
    streaming_dedup,
)


@pytest.fixture(scope="module")
def events_batch(spark):
    return load_table(spark, SF_SMALL, "events").cache()


@pytest.fixture(scope="module")
def events_stream_dir(spark, events_batch, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ev_joins"))
    events_batch.repartition(4).write.mode("overwrite").parquet(d)
    return d


def _stream(spark, events_batch, path):
    return spark.readStream.schema(events_batch.schema).parquet(path)


def _run(spark, df, name, mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_stream_static_enrich_replay(spark, events_batch, events_stream_dir):
    dim = (
        events_batch.select("user_id")
        .distinct()
        .withColumn("cohort", (F.col("user_id") % 3).cast("int"))
    )
    got = _run(
        spark,
        enrich_stream(
            _stream(spark, events_batch, events_stream_dir), dim, "user_id"
        ).select("event_id", "cohort"),
        "t_enrich",
    )
    want = enrich_stream(events_batch, dim, "user_id").select(
        "event_id", "cohort"
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_stream_stream_interval_join_replay(
    spark, events_batch, events_stream_dir
):
    def split(df):
        purchases = df.where(F.col("event_type") == "purchase").select(
            "user_id", "ts", F.col("event_id").alias("pid")
        )
        clicks = df.where(F.col("event_type") == "click").select(
            "user_id", "ts", F.col("event_id").alias("cid")
        )
        return purchases, clicks

    def joined(p, c):
        return interval_join(
            p,
            c,
            key="user_id",
            left_ts="ts",
            right_ts="r_ts",
            within="30 minutes",
            watermark="365 days",  # availableNow replay: drop nothing
        ).select("pid", "r_cid")

    sp, sc = split(_stream(spark, events_batch, events_stream_dir))
    got = _run(spark, joined(sp, sc), "t_ssj")
    bp, bc = split(events_batch)
    want = joined(bp, bc)
    got_rows = sorted(map(tuple, got.collect()))
    want_rows = sorted(map(tuple, want.collect()))
    assert got_rows == want_rows
    assert len(got_rows) > 0  # join is non-vacuous on the fixture


def test_streaming_dedup_replay(spark, events_batch, tmp_path):
    # Write the events twice — every event_id is a planted duplicate.
    d = str(tmp_path / "dups")
    doubled = events_batch.union(events_batch)
    doubled.repartition(4).write.mode("overwrite").parquet(d)
    got = _run(
        spark,
        streaming_dedup(
            _stream(spark, events_batch, d),
            keys=["event_id"],
            ts_col="ts",
            delay="365 days",
        ).select("event_id"),
        "t_dedup",
    )
    want = streaming_dedup(doubled, keys=["event_id"]).select("event_id")
    assert got.count() == events_batch.count()
    assert sorted(r.event_id for r in got.collect()) == sorted(
        r.event_id for r in want.collect()
    )
