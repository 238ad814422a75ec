"""Empty-input robustness: every operator must plan and execute on a
zero-row input without error (the situation every 100 TB pipeline hits
when an upstream filter eliminates a slice), returning zero rows with
the declared schema."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _empty_docs(spark):
    return spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string"
    )


def _empty_events(spark):
    return spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, value double"
    )


def test_text_and_dedup_ops_on_empty(spark):
    from topn_spark.operators import textstats
    from topn_spark.operators.dedup import (
        connected_components,
        dedup_exact,
        minhash_dedup_pairs,
        ngram_jaccard_pairs,
        simhash,
    )
    from topn_spark.operators.textstats import (
        add_repetition_signals,
        tfidf_top_terms,
    )

    docs = _empty_docs(spark)
    assert textstats.add_token_stats(docs).count() == 0
    assert textstats.add_quality(docs).count() == 0
    assert textstats.language_id(docs).count() == 0
    assert add_repetition_signals(docs).count() == 0
    assert tfidf_top_terms(docs).count() == 0
    assert dedup_exact(docs, ["text"], ["doc_id"]).count() == 0
    assert minhash_dedup_pairs(docs).count() == 0
    assert simhash(docs).count() == 0
    assert ngram_jaccard_pairs(docs).count() == 0
    edges = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(edges).count() == 0


def test_pipeline_ops_on_empty(spark):
    from topn_spark.operators.pipeline import (
        assign_split,
        chunk_by_tokens,
        chunk_documents,
        contamination_check,
        hash_sample,
        histogram,
        merge_upsert,
        pack_sequences,
        sessionize,
        stratified_sample,
        token_heavy_hitters,
        winsorize,
        zscore,
    )

    docs = _empty_docs(spark)
    ev = _empty_events(spark)
    assert chunk_documents(docs).count() == 0
    assert chunk_by_tokens(docs).count() == 0
    assert hash_sample(docs, "doc_id").count() == 0
    assert assign_split(docs, "doc_id").count() == 0
    assert stratified_sample(docs, ("source",), 0.5, "doc_id").count() == 0
    assert token_heavy_hitters(docs).count() == 0
    assert pack_sequences(
        docs.withColumn("n_tokens", F.lit(1)), "n_tokens", 10
    ).count() == 0
    assert contamination_check(docs, docs).count() == 0
    assert histogram(ev, "value", 0.0, 100.0, 10).count() == 0
    assert zscore(ev, "value", ["user_id"]).count() == 0
    assert winsorize(ev, "value", ["user_id"]).count() == 0
    assert sessionize(ev, "ts", ["user_id"]).count() == 0
    # merge with one empty side keeps the other intact
    some = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 2, 3.0)],
        "event_id long, ts timestamp, user_id long, value double",
    )
    assert merge_upsert(some, ev, ["event_id"]).count() == 1
    assert merge_upsert(ev, some, ["event_id"]).count() == 1


def test_join_and_graph_ops_on_empty(spark):
    from topn_spark.operators.asof import asof_join, asof_join_bucketed
    from topn_spark.operators.graph import pagerank
    from topn_spark.operators.pipeline import resample_ffill
    from topn_spark.operators.ranges import interval_overlap_join
    from topn_spark.operators.similarity import cosine_topk, ivf_topk
    from topn_spark.operators.topn import topn, topn_grouped

    ev = _empty_events(spark)
    assert topn(ev, "value", 5).count() == 0
    assert topn_grouped(ev, ["user_id"], "value", 3).count() == 0
    # empty build side: probes survive with null matches
    probe = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1))], "pid long, pt timestamp"
    )
    build = spark.createDataFrame([], "t timestamp, v double")
    out = asof_join_bucketed(probe, build, "pt", "t", left_id="pid")
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["t_asof"] is None
    keyed = asof_join(
        probe.withColumn("k", F.lit(1)),
        build.withColumn("k", F.lit(1)),
        "pt", "t", left_by="k", right_by="k", value_cols=["v"],
    )
    assert keyed.count() == 1
    iv = spark.createDataFrame([], "k long, id long, s timestamp, e timestamp")
    assert interval_overlap_join(iv, iv, ["k"], "s", "e").count() == 0
    assert resample_ffill(ev, "ts", ["user_id"], F.max("value")).count() == 0
    assert pagerank(spark.createDataFrame([], "src long, dst long")).count() == 0
    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert cosine_topk(emb, [1.0, 0.0]).count() == 0
    assert ivf_topk(
        emb, [1.0, 0.0], centroids=[[1.0, 0.0], [0.0, 1.0]]
    ).count() == 0


def test_new_wave_ops_on_empty(spark):
    from topn_spark.diag import check_expectations, profile_table
    from topn_spark.operators.pipeline import equidepth_histogram, scd2
    from topn_spark.operators.similarity import edit_distance_join
    from topn_spark.operators.textstats import (
        js_divergence_matrix,
        token_distribution,
    )

    docs = _empty_docs(spark)
    events = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string"
    )
    assert scd2(events, ["user_id"], ["event_type"], tiebreak=["event_id"]).count() == 0
    assert edit_distance_join(docs, "doc_id", "text").count() == 0
    dist = token_distribution(docs)
    assert dist.count() == 0
    assert js_divergence_matrix(dist).count() == 0
    nums = spark.createDataFrame([], "v double")
    assert equidepth_histogram(nums, "v", 4).count() == 0
    prof = {r.col_name: r for r in profile_table(docs).collect()}
    assert set(prof) == {"doc_id", "text", "lang", "source"}
    assert all(r.n == 0 and r.ndv == 0 for r in prof.values())
    gate = check_expectations(docs, {"ok": F.col("doc_id").isNotNull()}).collect()
    assert gate[0].n == 0 and gate[0].n_fail == 0 and gate[0].ok


def test_round3_ops_on_empty(spark):
    from topn_spark.diag import chi2_independence
    from topn_spark.operators.graph import triangle_count
    from topn_spark.operators.pipeline import (
        resample_interpolate,
        sample_k_per_group,
    )

    ev = _empty_events(spark)
    assert (
        resample_interpolate(ev, "ts", ["user_id"], F.max("value")).count()
        == 0
    )
    assert (
        sample_k_per_group(_empty_docs(spark), ["source"], 5, "doc_id").count()
        == 0
    )
    r = chi2_independence(
        spark.createDataFrame([], "a string, b int"), "a", "b"
    ).collect()[0]
    assert (r["n"], r["dof"], r["chi2"]) == (0, 0, None)
    t = triangle_count(spark.createDataFrame([], "src long, dst long"))
    assert [tuple(x) for x in t.collect()] == [(0, 0, 0)]


def test_round4_y_series_ops_on_empty(spark):
    from topn_spark.operators.dedup import dedup_against
    from topn_spark.operators.multimodal import video_frame_times
    from topn_spark.operators.ranges import grid_radius_join
    from topn_spark.operators.similarity import (
        kmeans_assign,
        semantic_dedup,
    )
    from topn_spark.operators.textstats import (
        bigram_fluency,
        cms_token_counts,
        vocab_oov_rates,
    )
    from topn_spark.operators.topn import topn_with_ties

    docs = _empty_docs(spark)
    assert bigram_fluency(docs).count() == 0
    assert vocab_oov_rates(docs).count() == 0
    # CMS over zero tokens: estimates exist and are all zero
    ests = cms_token_counts(docs, ["a", "b"]).collect()
    assert [r.est for r in ests] == [0, 0]
    assert dedup_against(docs, docs, ["text"]).count() == 0

    pts = spark.createDataFrame([], "id long, x double, y double")
    assert grid_radius_join(pts, "id", "x", "y", 5.0).count() == 0

    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    # kmeans_lloyd needs >= 1 row for init; the documented empty-safe
    # pieces are the assignment and the dedup built on a given model
    assert kmeans_assign(emb, [[0.0, 0.0]]).count() == 0

    vids = spark.createDataFrame([], "doc_id long, payload binary")
    assert video_frame_times(vids).count() == 0

    li = spark.createDataFrame([], "g string, v int")
    assert topn_with_ties(li, "v", 3).count() == 0
    assert topn_with_ties(li, "v", 3, group_by="g").count() == 0


def test_round4_second_wave_ops_on_empty(spark):
    import numpy as np

    from pyspark.sql import functions as F

    from topn_spark.diag import welch_ttest
    from topn_spark.operators.asof import asof_join
    from topn_spark.operators.pipeline import (
        mixture_sample,
        robust_zscore,
    )
    from topn_spark.operators.similarity import pq_encode
    from topn_spark.operators.textstats import duplicate_ngram_coverage

    docs = _empty_docs(spark)
    assert duplicate_ngram_coverage(docs).count() == 0
    assert mixture_sample(docs, {"a": 1.0}, 10).count() == 0

    ev = spark.createDataFrame([], "grp string, t boolean, v double")
    assert welch_ttest(ev, "grp", F.col("t"), "v").count() == 0
    assert robust_zscore(ev, "v", ["grp"]).count() == 0

    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    books = np.zeros((2, 4, 2))
    assert pq_encode(emb, books).count() == 0

    # nearest as-of: empty build side -> probes survive with NULLs
    l = spark.createDataFrame([(1, 10)], "lid long, t long")
    r = spark.createDataFrame([], "rt long, val double")
    out = asof_join(
        l, r, "t", "rt", value_cols=["val"], direction="nearest"
    ).collect()
    assert len(out) == 1 and out[0].val is None


def test_round4_config_guards(spark):
    import pytest

    from topn_spark.operators.graph import bfs_hops
    from topn_spark.operators.pipeline import mixture_sample

    docs = _empty_docs(spark)
    with pytest.raises(ValueError, match="at least one weight"):
        mixture_sample(docs, {}, 10)
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="source node"):
        bfs_hops(edges, [])
