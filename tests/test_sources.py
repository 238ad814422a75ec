"""Source/sink round-trips + partition-pruning contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from topn_spark.catalog import load_table
from topn_spark.plans import formatted_plan
from topn_spark.sources import read, write


@pytest.fixture(scope="module")
def orders(spark):
    return load_table(spark, SF_SMALL, "orders").cache()


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("o_orderkey").collect()]


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv", "xml"])
def test_roundtrip(spark, orders, tmp_path, fmt):
    p = str(tmp_path / fmt)
    write(orders, p, fmt=fmt, mode="overwrite")
    back = read(spark, p, fmt=fmt, schema=orders.schema)
    assert _sorted_rows(back) == _sorted_rows(orders)


def test_text_roundtrip(spark, tmp_path):
    # text: one string column per line — the raw-corpus ingest format
    p = str(tmp_path / "text")
    lines = spark.range(0, 50).selectExpr(
        "CONCAT('doc-', CAST(id AS STRING)) AS value"
    )
    write(lines, p, fmt="text", mode="overwrite")
    back = read(spark, p, fmt="text")
    assert back.columns == ["value"]
    assert sorted(r.value for r in back.collect()) == sorted(
        f"doc-{i}" for i in range(50)
    )


def test_avro_rejected_with_explanation(spark):
    with pytest.raises(ValueError, match="spark-avro"):
        read(spark, "/nope", fmt="avro")


def test_partitioned_write_prunes(spark, orders, tmp_path):
    p = str(tmp_path / "part")
    write(orders, p, fmt="parquet", mode="overwrite", partition_by=["o_orderstatus"])
    back = read(spark, p).where("o_orderstatus = 'F'")
    plan = formatted_plan(back)
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan
    assert back.count() == orders.where("o_orderstatus = 'F'").count()


def test_coalesce_files(spark, orders, tmp_path):
    import os

    p = str(tmp_path / "one")
    write(orders.repartition(8), p, mode="overwrite", coalesce_files=1)
    files = [f for f in os.listdir(p) if f.endswith(".parquet")]
    assert len(files) == 1


def test_bucketed_join_has_no_shuffle(spark, orders):
    """Bucketed tables co-locate join keys: the join plans with zero
    Exchange nodes — the shape that removes the dominant cost of big
    joins at 100 TB."""
    from topn_spark.catalog import load_table
    from topn_spark.plans import formatted_plan
    from tests.conftest import SF_SMALL

    import shutil

    customer = load_table(spark, SF_SMALL, "customer")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    # a previous session's managed-table dirs survive on disk while
    # the in-memory catalog does not — DROP can't see them
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_customer"):
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    write(orders, fmt="parquet", mode="overwrite",
          bucket_by=(4, ["o_custkey"]), table="b_orders")
    write(customer, fmt="parquet", mode="overwrite",
          bucket_by=(4, ["c_custkey"]), table="b_customer")
    bo = spark.table("b_orders")
    bc = spark.table("b_customer")
    joined = bo.join(
        bc.hint("merge"), bo.o_custkey == bc.c_custkey
    ).groupBy("c_mktsegment").count()
    plan = formatted_plan(joined)
    # sort-merge join over bucketed scans: no shuffle before the join
    join_pos = plan.find("SortMergeJoin")
    assert join_pos != -1
    assert "Exchange hashpartitioning(o_custkey" not in plan
    assert "Exchange hashpartitioning(c_custkey" not in plan
    assert joined.count() == 5


def test_bad_format_rejected(spark):
    with pytest.raises(ValueError):
        read(spark, "/nope", fmt="feather")


def test_bucket_by_requires_table(orders, tmp_path):
    with pytest.raises(ValueError):
        write(orders, str(tmp_path / "b"), bucket_by=(4, ["o_custkey"]))


def test_jdbc_roundtrip_embedded_derby(spark, tmp_path):
    """JDBC source/sink proof against Apache Derby embedded in the
    Spark JVM (derby*.jar ships with the Spark distribution — no
    external service needed). Covers write, read-back, filter/column
    pushdown into the remote query, and the partitioned parallel read
    (partitionColumn/bounds/numPartitions) that makes JDBC ingest
    scale past a single task."""
    url = f"jdbc:derby:{tmp_path}/jdbcdb;create=true"
    df = spark.range(0, 100).selectExpr(
        "id", "CAST(id * 2.5 AS DOUBLE) AS v", "CAST(id % 7 AS INT) AS k"
    )
    write(df, fmt="jdbc", mode="overwrite", url=url, dbtable="t1")

    back = read(spark, fmt="jdbc", url=url, dbtable="t1")
    assert back.count() == 100
    assert dict(back.dtypes) == {"id": "bigint", "v": "double", "k": "int"}
    assert back.agg({"v": "sum"}).collect()[0][0] == sum(
        i * 2.5 for i in range(100)
    )

    # filter + projection push into the generated SQL (shown as
    # PushedFilters / ReadSchema on the JDBC scan)
    q = back.where(back.k == 3).select("id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "k" in plan.split("PushedFilters")[1][:80]
    assert q.count() == sum(1 for i in range(100) if i % 7 == 3)

    # partitioned parallel read: 4 non-overlapping id-range queries
    par = read(
        spark, fmt="jdbc", url=url, dbtable="t1",
        partitionColumn="id", lowerBound="0", upperBound="100",
        numPartitions="4",
    )
    assert par.rdd.getNumPartitions() == 4
    assert par.count() == 100


def test_dynamic_partition_pruning_fires(spark, orders, tmp_path):
    """Star-join scan reduction at 100 TB: when the fact table is
    partitioned on the join column and the dim side is filtered,
    Spark must inject a dynamicpruning subquery into the fact scan so
    only partitions matching the dim's surviving keys are read — the
    runtime analogue of static partition pruning."""
    fact_path = str(tmp_path / "fact")
    orders.withColumn(
        "bucket", (F.col("o_custkey") % 16).cast("int")
    ).write.partitionBy("bucket").parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    dim = (
        orders.withColumn(
            "bucket", (F.col("o_custkey") % 16).cast("int")
        )
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("bucket")
        .distinct()
    )
    plan = (
        fact.join(dim, "bucket")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "dynamicpruning" in plan, plan


def test_write_rejects_avro_and_unknown_formats(spark, tmp_path):
    df = spark.range(3)
    with pytest.raises(ValueError, match="spark-avro"):
        write(df, str(tmp_path / "a"), fmt="avro")
    with pytest.raises(ValueError, match="unsupported"):
        write(df, str(tmp_path / "f"), fmt="feather")


class TestPythonDataSource:
    def test_partitioning_determinism_and_options(self, spark):
        from topn_spark.sources.pydatasource import (
            SyntheticDocsDataSource,
            generate_doc,
        )

        spark.dataSource.register(SyntheticDocsDataSource)
        df = (
            spark.read.format("synthetic_docs")
            .option("n", 97)  # not divisible by parts: ragged slice
            .option("parts", 4)
            .option("seed", 3)
            .load()
        )
        rows = {r.doc_id: r for r in df.collect()}
        assert set(rows) == set(range(97))  # every id exactly once
        # executor rows equal the pure-function contract
        for did in (0, 41, 96):
            want = generate_doc(3, did)
            got = rows[did]
            assert (
                got.text, got.lang, got.source, got.n_chars
            ) == want[1:]
        assert rows[5].n_chars == len(rows[5].text)
        # different seed -> different corpus; same seed -> identical
        other = (
            spark.read.format("synthetic_docs")
            .option("n", 97)
            .option("parts", 2)
            .option("seed", 4)
            .load()
            .collect()
        )
        assert {r.doc_id for r in other} == set(range(97))
        assert any(
            r.text != rows[r.doc_id].text for r in other
        )
        again = (
            spark.read.format("synthetic_docs")
            .option("n", 97)
            .option("parts", 2)  # different slicing, same rows
            .option("seed", 3)
            .load()
            .collect()
        )
        assert {
            (r.doc_id, r.text) for r in again
        } == {(d, r.text) for d, r in rows.items()}

    def test_feeds_downstream_operators(self, spark):
        from topn_spark.operators.dedup import dedup_exact
        from topn_spark.operators.textstats import add_quality
        from topn_spark.sources.pydatasource import register

        register(spark)
        df = (
            spark.read.format("synthetic_docs")
            .option("n", 200)
            .option("seed", 1)
            .load()
        )
        q = add_quality(df)
        assert q.count() == 200
        assert dedup_exact(q, subset=["text"], tiebreak=["doc_id"]).count() <= 200


def test_python_stream_source_resumes_from_checkpoint(spark, tmp_path):
    from topn_spark.sources.pydatasource import (
        generate_doc,
        register_stream,
    )

    register_stream(spark)
    out, ck = str(tmp_path / "pysrc_out"), str(tmp_path / "pysrc_ck")

    def run(cap):
        stream = (
            spark.readStream.format("synthetic_docs_stream")
            .option("seed", 5)
            .option("batch_rows", 40)
            .option("n", cap)
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # simple-API cadence: one batch_rows batch per availableNow run,
    # cursor checkpointed between runs
    run(100)
    first = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert first == set(range(40))
    run(100)
    run(100)  # third run hits the n=100 cap: 80..100 = 20 rows
    assert {
        r.doc_id for r in spark.read.parquet(out).collect()
    } == set(range(100))
    # restart with a higher cap: cursor resumes at 100, no re-emit
    run(180)
    rows = spark.read.parquet(out).collect()
    assert {r.doc_id for r in rows} == set(range(140))
    assert len(rows) == 140  # exactly once across all restarts
    by_id = {r.doc_id: r.text for r in rows}
    assert by_id[120] == generate_doc(5, 120)[1]


def test_read_json_rescued_captures_malformed_rows(spark, tmp_path):
    from topn_spark.sources.io import read_json_rescued

    p = str(tmp_path / "feed.jsonl")
    with open(p, "w") as f:
        f.write('{"id": 1, "v": "ok"}\n')
        f.write('{"id": 2, "v": "also ok"}\n')
        f.write('{"id": "NOT A NUMBER", "v": "type clash"}\n')
        f.write('{broken json!!\n')
    df = read_json_rescued(spark, p, "id long, v string")
    rows = df.collect()
    assert len(rows) == 4
    good = [r for r in rows if r._corrupt_record is None]
    bad = [r for r in rows if r._corrupt_record is not None]
    assert {r.id for r in good} == {1, 2}
    # both failure modes captured verbatim: type clash + broken syntax
    assert len(bad) == 2
    assert any("NOT A NUMBER" in r._corrupt_record for r in bad)
    assert any("broken json" in r._corrupt_record for r in bad)
    # corrupt rows carry NULL data fields (quarantine-able as-is)
    assert all(r.id is None for r in bad)


def test_dolma_interchange_round_trip(spark, tmp_path):
    """write_dolma/read_dolma: gzip jsonl with the spec's required
    id/text/source fields (id stringified), metadata columns riding
    along; non-Dolma input fails loudly."""
    import pytest

    from topn_spark.sources.io import read_dolma, write_dolma

    df = spark.createDataFrame(
        [(1, "alpha text", "web", 0.9), (2, "beta text", "wiki", 0.2)],
        "doc_id long, text string, source string, score double",
    )
    path = str(tmp_path / "dolma")
    write_dolma(df, path, coalesce_files=1)
    import glob
    import gzip
    import json

    files = glob.glob(f"{path}/part-*.json.gz")
    assert len(files) == 1
    lines = [
        json.loads(l)
        for l in gzip.open(files[0], "rt").read().splitlines()
    ]
    assert {l["id"] for l in lines} == {"1", "2"}
    assert all(
        isinstance(l["id"], str) and "text" in l and "source" in l
        and "score" in l
        for l in lines
    )
    back = read_dolma(spark, path)
    assert dict(back.dtypes)["id"] == "string"
    got = {(r.id, r.text, r.source, r.score) for r in back.collect()}
    assert got == {("1", "alpha text", "web", 0.9),
                   ("2", "beta text", "wiki", 0.2)}

    # default source stamp when the corpus has none
    df2 = df.drop("source")
    path2 = str(tmp_path / "dolma2")
    write_dolma(df2, path2, source_col=None, default_source="crawl9")
    assert {
        r.source for r in read_dolma(spark, path2).collect()
    } == {"crawl9"}

    # a random json dir is not a Dolma corpus
    path3 = str(tmp_path / "notdolma")
    spark.createDataFrame([(1, "x")], "a long, b string").write.json(path3)
    with pytest.raises(ValueError, match="missing required field"):
        read_dolma(spark, path3)

    # a passthrough column named like a required Dolma field would
    # produce duplicate JSON keys -> loud, not silent
    clash1 = df.withColumn("id", F.lit("meta"))
    with pytest.raises(ValueError, match="collide"):
        write_dolma(clash1, str(tmp_path / "c1"))
    clash2 = df2.withColumn("source", F.lit("old"))
    with pytest.raises(ValueError, match="collide"):
        write_dolma(clash2, str(tmp_path / "c2"), source_col=None)
