"""Continuous corpus ingestion: streaming dedup against ALL history.

``dropDuplicatesWithinWatermark`` (streaming/joins.py) bounds its
state by a time horizon — correct for replayed events, wrong for a
training corpus where a document seen last month must still be
rejected today. This sink keeps the full fingerprint history in a
parquet store and anti-joins every micro-batch against it: the
``foreachBatch`` pattern for state that must outlive any watermark.

At 100 TB of accumulated corpus the fingerprint store is still tiny
relative to the text (16-byte digests), and the per-batch anti-join
broadcasts the BATCH side against the store scan (the batch is the
small side); a production deployment would put a table format
(Delta/Iceberg) or a key-value store under the same shape for
transactional appends — the join logic is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from topn_spark.operators.dedup import dedup_exact


def ingest_batch(
    batch: DataFrame,
    store_dir: str,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Process one micro-batch: drop rows whose content fingerprint is
    already in ``store_dir`` (or duplicated within the batch —
    min-``id_col`` row wins), append survivors to ``out_dir`` and
    their fingerprints to the store."""
    spark = batch.sparkSession
    deduped = dedup_exact(batch, subset=[text_col], tiebreak=[id_col])
    fp = deduped.withColumn("_fp", F.md5(F.col(text_col)))
    try:
        seen = spark.read.parquet(store_dir).select("_fp")
        fresh = fp.join(seen, "_fp", "left_anti")
    except Exception:  # first batch: no store yet
        fresh = fp
    # persist: the survivors feed two writes; without it the
    # anti-join + dedup would re-run for the fingerprint append
    fresh = fresh.persist()
    try:
        fresh.drop("_fp").write.mode("append").parquet(out_dir)
        fresh.select("_fp").write.mode("append").parquet(store_dir)
    finally:
        fresh.unpersist()


def incremental_corpus_sink(
    stream: DataFrame,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Wire a document stream into :func:`ingest_batch` via
    ``foreachBatch`` (availableNow-compatible). Returns the started
    ``StreamingQuery``.

    Exactly-once caveat: plain parquet appends are not transactional —
    a crash between the two writes in a batch can leave a fingerprint
    without its document (safe: re-ingest skips it) but the reverse
    order would drop data, hence documents are appended FIRST. The
    checkpoint makes batch replays idempotent at the source level.
    """

    def _process(batch: DataFrame, _batch_id: int) -> None:
        ingest_batch(batch, store_dir, out_dir, text_col, id_col)

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
