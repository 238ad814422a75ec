"""UDF-surface tests: each escape hatch agrees with its
built-in-expression counterpart."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from topn_spark.catalog import load_table
from topn_spark.functions import cosine_to_query_udf, ngrams_udtf, zscore_by_group
from topn_spark.operators.similarity import cosine_scores


def test_pandas_cosine_matches_expression(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    qvec = [float(x) for x in emb.select("embedding").first()[0]]
    expr_scores = {
        r.vec_id: r.score for r in cosine_scores(emb, qvec).select("vec_id", "score").collect()
    }
    udf_scores = {
        r.vec_id: r.score
        for r in emb.select(
            "vec_id", cosine_to_query_udf(qvec)(F.col("embedding").cast("array<double>")).alias("score")
        ).collect()
    }
    assert set(expr_scores) == set(udf_scores)
    for k in expr_scores:
        assert abs(expr_scores[k] - udf_scores[k]) < 1e-9


def test_zscore_matches_window(spark):
    ev = load_table(spark, SF_SMALL, "events")
    got = {
        r.event_id: r.zscore
        for r in zscore_by_group(ev, ["event_type"], "value").collect()
    }
    w = Window.partitionBy("event_type")
    want = {
        r.event_id: r.z
        for r in ev.withColumn(
            "z",
            (F.col("value") - F.avg("value").over(w)) / F.stddev("value").over(w),
        ).collect()
    }
    assert set(got) == set(want)
    for k in want:
        if want[k] is None:
            assert got[k] is None or np.isnan(got[k])
        else:
            assert abs(got[k] - want[k]) < 1e-9


def test_ngrams_udtf_matches_shingles(spark):
    from topn_spark.operators.dedup import shingles

    spark.udtf.register("ngrams", ngrams_udtf)
    df = spark.createDataFrame(
        [(1, "The quick brown fox jumps!")], "doc_id long, text string"
    )
    df.createOrReplaceTempView("udtf_docs")
    got = sorted(
        (r.pos, r.ngram)
        for r in spark.sql(
            "SELECT t.* FROM udtf_docs, LATERAL ngrams(text) t"
        ).collect()
    )
    assert got == [
        (0, "the quick brown"),
        (1, "quick brown fox"),
        (2, "brown fox jumps"),
    ]
    # agrees with the higher-order-expression formulation
    want_arr = df.select(shingles("text").alias("sh")).first().sh
    assert [g for _, g in got] == list(want_arr)
