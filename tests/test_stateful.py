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
