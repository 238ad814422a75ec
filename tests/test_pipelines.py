"""JSON pipeline-spec compiler tests: the reference's deploy/run
lifecycle (ETLBatchConfig stages + connections, TopNTest.java:94-105)
reproduced over Spark DataFrames."""

from __future__ import annotations

import pytest

from topn_spark.errors import ValidationError
from topn_spark.pipelines import compile_pipeline, run_pipeline

# the reference's golden end-to-end table (TopNTest.java:64-79):
# (name, age) with a null age — topField=age, size=3 keeps
# Bob 7, Alice 6, Fred 5 (nulls smallest, never in a full top-3)
GOLDEN = [
    ("Leo", 1),
    ("Eve", 3),
    ("Bob", 7),
    ("Alice", 6),
    ("Fred", 5),
    ("Nat", None),
]


def _golden_source(spark, tmp_path):
    p = str(tmp_path / "people")
    spark.createDataFrame(GOLDEN, "name string, age int").coalesce(
        1
    ).write.mode("overwrite").parquet(p)
    return p


def _spec(src, dst, topn_props):
    return {
        "stages": [
            {
                "name": "source",
                "type": "batchsource",
                "plugin": "File",
                "properties": {"path": src, "format": "parquet"},
            },
            {
                "name": "topn",
                "type": "batchaggregator",
                "plugin": "TopN",
                "properties": topn_props,
            },
            {
                "name": "sink",
                "type": "batchsink",
                "plugin": "FileSink",
                "properties": {"path": dst, "format": "parquet"},
            },
        ],
        "connections": [
            {"from": "source", "to": "topn"},
            {"from": "topn", "to": "sink"},
        ],
    }


def test_reference_golden_pipeline_end_to_end(spark, tmp_path):
    src = _golden_source(spark, tmp_path)
    dst = str(tmp_path / "out")
    spec = _spec(src, dst, {"field": "age", "size": "3"})
    # deploy: validates, builds, writes nothing
    staged = compile_pipeline(spark, spec)
    assert set(staged) == {"source", "topn", "sink"}
    import os

    assert not os.path.exists(dst)
    # run: executes the sink; result is the reference's golden top-3
    run_pipeline(spark, spec)
    got = {
        (r.name, r.age) for r in spark.read.parquet(dst).collect()
    }
    assert got == {("Bob", 7), ("Alice", 6), ("Fred", 5)}


def test_macro_deferral_and_run_substitution(spark, tmp_path):
    src = _golden_source(spark, tmp_path)
    dst = str(tmp_path / "out_m")
    spec = _spec(src, dst, {"field": "${f}", "size": "${n}"})
    # deploy passes: every macro'd property's validation is skipped
    compile_pipeline(spark, spec)
    # run without substitutions: the macro failures surface, batched
    with pytest.raises(ValidationError) as ei:
        run_pipeline(spark, spec)
    msg = str(ei.value)
    assert "${f}" in msg and "${n}" in msg
    # run with substitutions executes the resolved config
    run_pipeline(spark, spec, {"f": "age", "n": "1"})
    got = {(r.name, r.age) for r in spark.read.parquet(dst).collect()}
    assert got == {("Bob", 7)}


def test_all_stage_failures_collected_together(spark, tmp_path):
    src = _golden_source(spark, tmp_path)
    spec = {
        "stages": [
            {
                "name": "source",
                "plugin": "File",
                "properties": {"path": src},
            },
            {
                "name": "topn",
                "plugin": "TopN",
                # bad field AND bad size: both must be reported
                "properties": {"field": "nope", "size": "0"},
            },
            {
                "name": "pick",
                "plugin": "Projection",
                "properties": {"select": "ghost"},  # third failure
            },
        ],
        "connections": [
            {"from": "source", "to": "topn"},
            {"from": "source", "to": "pick"},
        ],
    }
    with pytest.raises(ValidationError) as ei:
        compile_pipeline(spark, spec)
    msg = str(ei.value)
    assert "nope" in msg and "0" in msg and "ghost" in msg
    assert len(ei.value.failures) >= 3


def test_joiner_groupby_filter_pipeline(spark, tmp_path):
    lp = str(tmp_path / "l")
    rp = str(tmp_path / "r")
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0), (4, "c", 5.0)],
        "id long, k string, v double",
    ).write.parquet(lp)
    spark.createDataFrame(
        [("a", "alpha"), ("b", "beta")], "k string, label string"
    ).write.parquet(rp)
    spec = {
        "stages": [
            {"name": "l", "plugin": "File", "properties": {"path": lp}},
            {"name": "r", "plugin": "File", "properties": {"path": rp}},
            {
                "name": "j",
                "plugin": "Joiner",
                "properties": {"joinKeys": "k = k", "joinType": "inner"},
            },
            {
                "name": "f",
                "plugin": "Filter",
                "properties": {"condition": "v > 5"},
            },
            {
                "name": "g",
                "plugin": "GroupByAggregate",
                "properties": {
                    "groupByFields": "label",
                    "aggregates": "n:count(*), total:sum(v)",
                },
            },
        ],
        "connections": [
            {"from": "l", "to": "j"},
            {"from": "r", "to": "j"},
            {"from": "j", "to": "f"},
            {"from": "f", "to": "g"},
        ],
    }
    out = run_pipeline(spark, spec)["g"]
    got = {(r.label, r.n, r.total) for r in out.collect()}
    assert got == {("alpha", 2, 40.0), ("beta", 1, 20.0)}


def test_dedup_sql_and_synthetic_source(spark, tmp_path):
    spec = {
        "stages": [
            {
                "name": "gen",
                "plugin": "SyntheticDocs",
                "properties": {"n": "50", "seed": "3"},
            },
            {
                "name": "dedup",
                "plugin": "Deduplicate",
                "properties": {
                    "uniqueFields": "text",
                    "tiebreak": "doc_id",
                },
            },
            {
                "name": "stats",
                "plugin": "SQL",
                "properties": {
                    "query": "SELECT source, COUNT(*) AS n "
                    "FROM ${input} GROUP BY source"
                },
            },
        ],
        "connections": [
            {"from": "gen", "to": "dedup"},
            {"from": "dedup", "to": "stats"},
        ],
    }
    out = run_pipeline(spark, spec)
    assert out["dedup"].count() <= 50
    assert out["stats"].columns == ["source", "n"]
    assert sum(r.n for r in out["stats"].collect()) == out["dedup"].count()


def test_structural_errors(spark, tmp_path):
    src = _golden_source(spark, tmp_path)
    base = {"name": "s", "plugin": "File", "properties": {"path": src}}
    # unknown plugin
    with pytest.raises(ValidationError, match="unknown plugin"):
        compile_pipeline(
            spark,
            {"stages": [dict(base), {"name": "x", "plugin": "Nope"}],
             "connections": []},
        )
    # cycle
    with pytest.raises(ValidationError, match="cycle"):
        compile_pipeline(
            spark,
            {
                "stages": [
                    dict(base),
                    {"name": "a", "plugin": "Filter",
                     "properties": {"condition": "1=1"}},
                    {"name": "b", "plugin": "Filter",
                     "properties": {"condition": "1=1"}},
                ],
                "connections": [
                    {"from": "s", "to": "a"},
                    {"from": "a", "to": "b"},
                    {"from": "b", "to": "a"},
                ],
            },
        )
    # declared type mismatching the plugin's kind
    with pytest.raises(ValidationError, match="batchsource"):
        compile_pipeline(
            spark,
            {"stages": [
                {"name": "s", "type": "transform", "plugin": "File",
                 "properties": {"path": src}}],
             "connections": []},
        )
    # duplicate stage names
    with pytest.raises(ValidationError, match="Duplicate"):
        compile_pipeline(
            spark,
            {"stages": [dict(base), dict(base)], "connections": []},
        )
