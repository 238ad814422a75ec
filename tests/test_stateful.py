"""Stateful streaming operator test: per-key running top-N via
applyInPandasWithState, replay-checked against batch grouped top-N."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from topn_spark.catalog import load_table
from topn_spark.operators.topn import topn_grouped
from topn_spark.streaming.stateful import grouped_running_topn


def test_grouped_running_topn_matches_batch(spark, tmp_path):
    ev = load_table(spark, SF_SMALL, "events")
    d = str(tmp_path / "stream")
    ev.repartition(3).write.mode("overwrite").parquet(d)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = grouped_running_topn(stream, "event_type", "event_id", "value", 3)
    q = (
        out.writeStream.format("memory")
        .queryName("running_topn")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    emitted = spark.table("running_topn").collect()
    # multiple emissions per key (one per touching micro-batch);
    # the max-version row is the final state
    final = {}
    for r in emitted:
        if r.event_type not in final or r.version > final[r.event_type].version:
            final[r.event_type] = r
    # versions must sum to the full row count per key
    batch_counts = {
        r.event_type: r.cnt
        for r in ev.groupBy("event_type").agg(F.count("*").alias("cnt")).collect()
    }
    assert {k: v.version for k, v in final.items()} == batch_counts

    want = topn_grouped(
        ev.select("event_type", "event_id", "value"),
        "event_type",
        "value",
        3,
        tiebreak="event_id",
    )
    want_by_key = {}
    for r in want.collect():
        want_by_key.setdefault(r.event_type, []).append((r.event_id, r.value))
    got_by_key = {
        k: list(zip(v.ids, v.vals)) for k, v in final.items()
    }
    assert got_by_key == want_by_key


def _has_protobuf():
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def test_grouped_running_topn_v2_gated_without_protobuf(spark, tmp_path):
    """Without protobuf the v2 operator must fail fast with a clear
    error, not crash the streaming worker mid-query."""
    if _has_protobuf():
        pytest.skip("protobuf present; gate inactive")
    from topn_spark.streaming.stateful import grouped_running_topn_v2

    ev = load_table(spark, SF_SMALL, "events")
    (tmp_path / "empty").mkdir()
    stream = spark.readStream.schema(ev.schema).parquet(str(tmp_path / "empty"))
    with pytest.raises(ImportError, match="protobuf"):
        grouped_running_topn_v2(stream, "event_type", "event_id", "value", 3)


@pytest.mark.skipif(
    not _has_protobuf(), reason="transformWithState needs protobuf"
)
def test_grouped_running_topn_v2_matches_v1_semantics(spark, tmp_path):
    """The transformWithState (v2 API) operator must produce the same
    final per-key top-N as the batch grouped top-N over the replayed
    stream — same contract as the v1 test."""
    from topn_spark.streaming.stateful import grouped_running_topn_v2

    ev = load_table(spark, SF_SMALL, "events")
    d = str(tmp_path / "stream")
    ev.repartition(3).write.mode("overwrite").parquet(d)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = grouped_running_topn_v2(stream, "event_type", "event_id", "value", 3)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            out.writeStream.format("memory")
            .queryName("running_topn_v2")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    emitted = spark.table("running_topn_v2").collect()
    final = {}
    for r in emitted:
        if r.event_type not in final or r.version > final[r.event_type].version:
            final[r.event_type] = r
    batch_counts = {
        r.event_type: r.cnt
        for r in ev.groupBy("event_type").agg(F.count("*").alias("cnt")).collect()
    }
    assert {k: v.version for k, v in final.items()} == batch_counts

    want = topn_grouped(
        ev.select("event_type", "event_id", "value"),
        "event_type",
        "value",
        3,
        tiebreak="event_id",
    )
    want_by_key = {}
    for r in want.collect():
        want_by_key.setdefault(r.event_type, []).append((r.event_id, r.value))
    got_by_key = {
        k: list(zip(v.ids, v.vals)) for k, v in final.items()
    }
    assert got_by_key == want_by_key
