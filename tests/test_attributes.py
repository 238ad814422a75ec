"""Attribute sidecars + mixer (operators/attributes.py): tagger
registry contracts, mixer boolean algebra incl. NULL semantics, span
replacement arithmetic (adjacent/edge/unsorted spans), and the
corpus-order first-occurrence contract of the dup-paragraph tagger."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from topn_spark.operators.attributes import (
    apply_mixer,
    doc_tagger_names,
    dup_paragraph_spans,
    mixer_errors,
    replace_spans,
    scrub_dup_paragraphs,
    tag_attributes,
)


def _docs(spark, rows, schema="doc_id bigint, text string"):
    return spark.createDataFrame(rows, schema)


# --------------------------------------------------------------------------
# Doc-level taggers
# --------------------------------------------------------------------------

def test_tag_attributes_full_registry(spark):
    df = _docs(spark, [(1, "the data of that value runs here now")])
    row = tag_attributes(df).collect()[0]
    assert row.word_count == 8
    assert row.char_length == 36
    assert row.line_count == 1
    assert row.stop_hits == 3  # the, of, that
    assert row.hash_word_ratio == 0.0
    assert set(tag_attributes(df).columns) == {"doc_id", *doc_tagger_names()}


def test_tag_attributes_null_and_empty_edges(spark):
    df = _docs(spark, [(1, None), (2, "   "), (3, "")])
    rows = {r.doc_id: r for r in tag_attributes(df).collect()}
    assert rows[1].word_count is None and rows[1].char_length is None
    assert rows[2].word_count == 0 and rows[2].mean_word_len is None
    assert rows[3].word_count == 0 and rows[3].digit_char_frac is None


def test_tag_attributes_subset_and_validation(spark):
    df = _docs(spark, [(1, "a b c")])
    out = tag_attributes(df, ["word_count", "char_length"])
    assert out.columns == ["doc_id", "word_count", "char_length"]
    with pytest.raises(ValueError, match="Unknown tagger"):
        tag_attributes(df, ["word_count", "nope"])
    with pytest.raises(ValueError, match="at least one"):
        tag_attributes(df, [])


def test_tagger_words_are_lowercased(spark):
    # stopword hits must see "The" as "the" — the Gopher convention
    df = _docs(spark, [(1, "The Data OF That")])
    assert tag_attributes(df, ["stop_hits"]).collect()[0].stop_hits == 3


# --------------------------------------------------------------------------
# Mixer
# --------------------------------------------------------------------------

def _attrs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, score double, n bigint"
    )


def test_mixer_include_exclude_semantics(spark):
    docs = _docs(spark, [(i, f"t{i}") for i in range(1, 6)])
    attrs = _attrs(
        spark,
        [(1, 0.9, 10), (2, 0.9, 1), (3, 0.1, 10), (4, None, 10)],
    )  # doc 5 missing from the sidecar entirely
    cfg = {
        "include": [[["score", ">=", 0.5], ["n", ">=", 5]]],
        "exclude": [[["n", ">", 100]]],
    }
    kept = sorted(
        r.doc_id for r in apply_mixer(docs, attrs, cfg).collect()
    )
    # 2 fails n, 3 fails score, 4 has NULL score (matches nothing),
    # 5 has no sidecar row at all
    assert kept == [1]


def test_mixer_empty_include_keeps_all_and_exclude_null_safe(spark):
    docs = _docs(spark, [(1, "a"), (2, "b"), (3, "c")])
    attrs = _attrs(spark, [(1, 0.9, 1), (2, None, 1)])
    cfg = {"exclude": [[["score", ">", 0.5]]]}
    kept = sorted(
        r.doc_id for r in apply_mixer(docs, attrs, cfg).collect()
    )
    # 1 excluded; 2's NULL score never triggers exclude; 3 unjoined
    assert kept == [2, 3]


def test_mixer_or_of_and_lists(spark):
    docs = _docs(spark, [(1, "a"), (2, "b"), (3, "c")])
    attrs = _attrs(spark, [(1, 0.9, 1), (2, 0.1, 50), (3, 0.1, 1)])
    cfg = {"include": [[["score", ">", 0.5]], [["n", ">=", 10]]]}
    kept = sorted(
        r.doc_id for r in apply_mixer(docs, attrs, cfg).collect()
    )
    assert kept == [1, 2]


def test_mixer_none_value_is_null_test(spark):
    docs = _docs(spark, [(1, "a"), (2, "b")])
    attrs = _attrs(spark, [(1, None, 1), (2, 0.5, 1)])
    cfg = {"include": [[["score", "==", None]]]}
    assert [
        r.doc_id for r in apply_mixer(docs, attrs, cfg).collect()
    ] == [1]
    cfg = {"include": [[["score", "!=", None]]]}
    assert [
        r.doc_id for r in apply_mixer(docs, attrs, cfg).collect()
    ] == [2]


def test_mixer_validation(spark):
    cols = ["score", "n"]
    assert mixer_errors({}, cols) == []
    errs = mixer_errors(
        {
            "include": [[["bogus", ">", 1]], [["score", "~", 1]]],
            "exclude": [[]],
            "span_replacement": [{"span": "missing"}, {"bad": 1}],
            "typo": [],
        },
        cols,
    )
    joined = "\n".join(errs)
    assert "unknown attribute 'bogus'" in joined
    assert "invalid op '~'" in joined
    assert "non-empty AND-list" in joined
    assert "unknown span" in joined and "attribute 'missing'" in joined
    assert "'span' key" in joined
    assert "unknown config key 'typo'" in joined
    assert mixer_errors({"include": [[["score", "<", None]]]}, cols)
    docs = _docs(spark, [(1, "a")])
    attrs = _attrs(spark, [(1, 0.5, 1)])
    with pytest.raises(ValueError, match="invalid mixer config"):
        apply_mixer(docs, attrs, {"include": [[["bogus", ">", 1]]]})


def test_mixer_rejects_column_clash(spark):
    docs = _docs(spark, [(1, "a")]).withColumn("score", F.lit(1.0))
    attrs = _attrs(spark, [(1, 0.5, 1)])
    with pytest.raises(ValueError, match="collide"):
        apply_mixer(docs, attrs, {})


# --------------------------------------------------------------------------
# Span replacement
# --------------------------------------------------------------------------

def _spans_df(spark, text, spans):
    return spark.createDataFrame(
        [(1, text, spans)],
        "doc_id bigint, text string, "
        "spans array<struct<begin:bigint,end:bigint>>",
    )


@pytest.mark.parametrize(
    "text,spans,expect",
    [
        ("abcdef", [(1, 3)], "adef"),
        ("abcdef", [(0, 2), (4, 6)], "cd"),  # edges
        ("abcdef", [(2, 4), (0, 2)], "ef"),  # unsorted, adjacent
        ("abcdef", [(0, 6)], ""),  # whole string
        ("abcdef", [], "abcdef"),
        ("abcdef", None, "abcdef"),
    ],
)
def test_replace_spans_arithmetic(spark, text, spans, expect):
    df = _spans_df(spark, text, spans)
    assert replace_spans(df, "spans").collect()[0].text == expect


def test_replace_spans_placeholder_and_out_col(spark):
    df = _spans_df(spark, "call 555 0199 now", [(5, 13)])
    out = replace_spans(
        df, "spans", replacement="|||PHONE|||", out_col="clean"
    ).collect()[0]
    assert out.clean == "call |||PHONE||| now"
    assert out.text == "call 555 0199 now"  # original untouched


# --------------------------------------------------------------------------
# Dup-paragraph span tagger
# --------------------------------------------------------------------------

def test_dup_paragraph_first_occurrence_contract(spark):
    sep = "\n\n"
    df = _docs(
        spark,
        [
            (0, sep.join(["u zero", "BOILER", "more zero"])),
            (1, sep.join(["BOILER", "u one"])),  # later doc, pos 0
            (2, sep.join(["u two", "COOKIE", "COOKIE"])),  # in-doc dup
            (3, "u three"),
            (4, sep.join(["u four", "", "  ", "u four b"])),  # blanks
        ],
    )
    spans = {
        r.doc_id: [(s.begin, s.end) for s in r.dup_paragraph_spans]
        for r in dup_paragraph_spans(df).collect()
    }
    assert spans[0] == []  # (0,1) is BOILER's first occurrence
    assert spans[1] == [(0, 6)]
    assert spans[2] == [(15, 21)]  # second COOKIE only
    assert spans[3] == []
    assert spans[4] == []  # blank paragraphs never tagged


def test_scrub_dup_paragraphs_end_to_end(spark):
    sep = "\n\n"
    df = _docs(
        spark,
        [
            (0, sep.join(["u zero", "BOILER"])),
            (1, sep.join(["BOILER", "u one", "BOILER"])),
        ],
    )
    rows = {r.doc_id: r for r in scrub_dup_paragraphs(df).collect()}
    assert rows[0].text == "u zero\n\nBOILER" and rows[0].n_scrubbed == 0
    assert rows[1].text == "\n\nu one\n\n" and rows[1].n_scrubbed == 2


def test_scrub_custom_separator_and_replacement(spark):
    df = _docs(spark, [(0, "A | B"), (1, "B | C")])
    rows = {
        r.doc_id: r
        for r in scrub_dup_paragraphs(
            df, sep=" | ", replacement="[DUP]"
        ).collect()
    }
    assert rows[0].text == "A | B"
    assert rows[1].text == "[DUP] | C" and rows[1].n_scrubbed == 1


def test_mixer_span_replacement_rule(spark):
    sep = "\n\n"
    docs = _docs(
        spark,
        [(0, sep.join(["u zero", "BOILER"])),
         (1, sep.join(["BOILER", "u one"]))],
    )
    attrs = dup_paragraph_spans(docs)
    cfg = {"span_replacement": [{"span": "dup_paragraph_spans"}]}
    rows = {
        r.doc_id: r.text for r in apply_mixer(docs, attrs, cfg).collect()
    }
    assert rows[0] == "u zero\n\nBOILER"
    assert rows[1] == "\n\nu one"


def test_tag_attributes_incremental(spark):
    df1 = _docs(spark, [(1, "a b c"), (2, "d e f")])
    sidecar = tag_attributes(df1, ["word_count", "stop_hits"])
    df2 = _docs(spark, [(1, "a b c"), (2, "d e f"), (3, "the end of it")])
    from topn_spark.operators.attributes import tag_attributes_incremental

    new = tag_attributes_incremental(
        df2, sidecar, ["word_count", "stop_hits"]
    )
    rows = new.collect()
    assert [r.doc_id for r in rows] == [3]
    assert rows[0].word_count == 4 and rows[0].stop_hits == 2
    # appended union == from-scratch tagging
    full = sidecar.unionByName(new)
    scratch = tag_attributes(df2, ["word_count", "stop_hits"])
    assert sorted(map(tuple, full.collect())) == sorted(
        map(tuple, scratch.collect())
    )
    with pytest.raises(ValueError, match="signal version"):
        tag_attributes_incremental(df2, sidecar, ["word_count"])


def test_mixer_report_counts(spark):
    docs = _docs(spark, [(i, f"t{i}") for i in range(1, 6)])
    attrs = spark.createDataFrame(
        [(1, 0.9, 10), (2, 0.9, 1), (3, 0.1, 200), (4, None, 10)],
        "doc_id bigint, score double, n bigint",
    )
    cfg = {
        "include": [[["score", ">=", 0.5]], [["n", ">=", 10]]],
        "exclude": [[["n", ">", 100]]],
    }
    from topn_spark.operators.attributes import mixer_report

    rep = {r.rule: r.n_docs for r in mixer_report(docs, attrs, cfg).collect()}
    assert rep == {
        "include[0]": 2,  # docs 1, 2
        "include[1]": 3,  # docs 1, 3, 4
        "exclude[0]": 1,  # doc 3
        "kept": 3,        # 1, 2, 4 (3 excluded, 5 unjoined)
        "total": 5,
    }
    assert rep["kept"] == apply_mixer(docs, attrs, cfg).count()
    with pytest.raises(ValueError, match="invalid mixer config"):
        mixer_report(docs, attrs, {"include": [[["bogus", ">", 1]]]})
