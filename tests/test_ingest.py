"""Incremental corpus ingestion: streaming dedup against the full
fingerprint history must equal batch exact-dedup over the union of all
data ever ingested — across multiple stream runs (restarts)."""

from __future__ import annotations

from pyspark.sql import functions as F

from topn_spark.streaming.ingest import incremental_corpus_sink


def _write_docs(spark, path, rows):
    spark.createDataFrame(rows, "doc_id long, text string").repartition(
        2
    ).write.mode("append").parquet(path)


def test_incremental_ingest_dedups_across_runs(spark, tmp_path):
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    # run 1: 4 docs, one in-batch duplicate pair (1,2)
    _write_docs(
        spark,
        src,
        [(1, "alpha text"), (2, "alpha text"), (3, "beta text"),
         (4, "gamma text")],
    )
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = incremental_corpus_sink(stream, store, out, ck)
    q.awaitTermination(120)

    got1 = {
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(out).collect()
    }
    assert got1 == {(1, "alpha text"), (3, "beta text"), (4, "gamma text")}

    # run 2 (restart): re-sends an old text under a new id + new docs
    _write_docs(
        spark,
        src,
        [(5, "alpha text"), (6, "delta text"), (7, "delta text")],
    )
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = incremental_corpus_sink(stream, store, out, ck)
    q.awaitTermination(120)

    got2 = {
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(out).collect()
    }
    # 5 rejected (alpha seen in run 1); only one of (6,7) kept
    assert got2 == got1 | {(6, "delta text")}
    # store holds exactly the distinct fingerprints
    assert spark.read.parquet(store).distinct().count() == 4
