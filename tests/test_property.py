"""Property-based tests (FIXTURES.md F5): random tables × random
(field, size, ignoreNull) vs a pure-Python heap model of the
reference's aggregate loop (TopN.java:98-130) — null smallest,
descending, NaN above +Inf, set-equality on ties."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from topn_spark.operators.topn import topn

# value domains per F5: nulls, NaN, ±Inf, -0.0, forced duplicates
_floats = st.one_of(
    st.none(),
    st.just(float("nan")),
    st.just(float("inf")),
    st.just(float("-inf")),
    st.just(-0.0),
    st.sampled_from([1.0, 2.0, 2.0, 3.0]),  # forced ties
    st.floats(allow_nan=False, allow_infinity=False, width=32),
)
_ints = st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1), st.sampled_from([7, 7, 7]))


def _norm_zero(v):
    # Spark SQL normalizes -0.0 == 0.0 in comparisons and sort keys
    # (Float/DoubleType ordering treats the zeros as equal), so which
    # zero survives a LIMIT is plan-arbitrary — that is the engine's
    # documented tie semantics, diverging from the reference's
    # Double.compare (TopN.java:171-179) which orders -0.0 < 0.0.
    # The model mirrors the engine: both zeros collapse to +0.0.
    if isinstance(v, float) and v == 0.0:
        return 0.0
    return v


def _sort_key(v):
    # Mirrors the reference comparator (TopN.java:144-186, 222-231) +
    # Float.compare NaN ordering: null < everything < ... < +Inf < NaN
    # — except signed zero, normalized to Spark semantics (_norm_zero).
    if v is None:
        return (0, 0.0)
    if isinstance(v, float) and math.isnan(v):
        return (2, 0.0)
    return (1, _norm_zero(v))


def model_topn(values, size, ignore_null):
    vals = [v for v in values if v is not None] if ignore_null else list(values)
    return sorted(vals, key=_sort_key, reverse=True)[:size]


def _canon(v):
    if v is None:
        return "null"
    if isinstance(v, float):
        # -0.0 and 0.0 compare equal in Spark sorts; canonicalize so
        # the multiset compare doesn't distinguish which zero survived
        return "nan" if math.isnan(v) else repr(_norm_zero(v))
    return repr(v)


def _multiset_key(vals):
    return sorted(_canon(v) for v in vals)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    values=st.lists(_floats, min_size=0, max_size=60),
    size=st.sampled_from([1, 2, 5, 59, 60, 61, 1048576]),
    ignore_null=st.booleans(),
)
def test_topn_double_matches_model(spark, values, size, ignore_null):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "id long, v double"
    )
    got = [r.v for r in topn(df, "v", size, ignore_null).collect()]
    want = model_topn(values, size, ignore_null)
    assert _multiset_key(got) == _multiset_key(want)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    values=st.lists(_ints, min_size=0, max_size=40),
    size=st.sampled_from([1, 3, 40, 41]),
    ignore_null=st.booleans(),
)
def test_topn_int_matches_model(spark, values, size, ignore_null):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "id long, v int"
    )
    got = [r.v for r in topn(df, "v", size, ignore_null).collect()]
    want = model_topn(values, size, ignore_null)
    assert _multiset_key(got) == _multiset_key(want)


# ---------------------------------------------------------------------------
# dedup_lines / weighted_sample_k vs pure-Python models (x91 / x92)
# ---------------------------------------------------------------------------

_line = st.sampled_from(["aa", "bb", "cc", "dd", "ee ff", ""])
_doc = st.lists(_line, min_size=1, max_size=6)


def model_dedup_lines(docs, max_docs):
    from collections import defaultdict

    doc_count = defaultdict(set)
    for did, lines in docs:
        for ln in lines:
            doc_count[ln].add(did)
    out = {}
    for did, lines in docs:
        kept = [ln for ln in lines if len(doc_count[ln]) <= max_docs]
        out[did] = ("\n".join(kept), len(kept), len(lines) - len(kept))
    return out


@settings(
    deadline=None,
    max_examples=12,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(_doc, min_size=1, max_size=8),
    max_docs=st.integers(1, 3),
)
def test_dedup_lines_matches_model(spark, docs, max_docs):
    from topn_spark.operators.pipeline import dedup_lines

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_lines_kept"], r["n_lines_removed"])
        for r in dedup_lines(df, max_docs=max_docs).collect()
    }
    # NB the df.split path sees "a\n\nb" as three lines incl. an empty
    # one — the model receives the same line lists, so semantics align
    want = model_dedup_lines(list(enumerate(docs)), max_docs)
    assert got == want


def model_weighted_sample_k(rows, k, key=None):
    import hashlib
    from collections import defaultdict

    groups = defaultdict(list)
    for rid, grp, w in rows:
        if w is None or w <= 0:
            continue
        u = int(
            hashlib.md5(str(rid).encode()).hexdigest()[:12], 16
        )
        groups[grp if key else None].append((u / float(w), rid))
    out = []
    for g, members in groups.items():
        members.sort()
        out += [rid for _, rid in members[:k]]
    return sorted(out)


@settings(
    deadline=None,
    max_examples=10,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n=st.integers(5, 60),
    k=st.integers(1, 8),
    grouped=st.booleans(),
)
def test_weighted_sample_k_matches_model(spark, n, k, grouped):
    from topn_spark.operators.pipeline import weighted_sample_k

    rows = [
        (i, "g%d" % (i % 3), [None, 0.0, 1.5, 7.0, 40.0][i % 5])
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "id long, grp string, w double")
    got = weighted_sample_k(
        df, k, "w", "id", key_cols=["grp"] if grouped else None
    )
    want = model_weighted_sample_k(rows, k, key="grp" if grouped else None)
    assert sorted(r["id"] for r in got.collect()) == want


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 10),
    data=st.data(),
    fmt=st.sampled_from(["png", "gif", "bmp", "ppm"]),
)
def test_lossless_image_codecs_round_trip(w, h, data, fmt):
    """Every lossless codec pair reproduces arbitrary RGB images
    bit-exactly at arbitrary sizes (GIF capped at 256 colors by
    drawing from a small palette)."""
    from topn_spark.operators.multimodal import (
        decode_bmp_pixels,
        decode_gif_pixels,
        decode_png_pixels,
        decode_ppm_pixels,
        encode_bmp_rgb,
        encode_gif_rgb,
        encode_png,
        encode_ppm_rgb,
    )

    n = w * h * 3
    if fmt == "gif":
        # distinct colors <= 256: draw bytes from {0, 85, 170, 255}
        pix = bytes(
            data.draw(st.sampled_from([0, 85, 170, 255]))
            for _ in range(n)
        )
    else:
        pix = bytes(data.draw(st.integers(0, 255)) for _ in range(n))
    enc = {
        "png": lambda: encode_png(w, h, pix),
        "gif": lambda: encode_gif_rgb(w, h, pix, interlace=h % 2 == 0),
        "bmp": lambda: encode_bmp_rgb(w, h, pix),
        "ppm": lambda: encode_ppm_rgb(w, h, pix),
    }[fmt]()
    dec = {
        "png": decode_png_pixels,
        "gif": decode_gif_pixels,
        "bmp": decode_bmp_pixels,
        "ppm": decode_ppm_pixels,
    }[fmt](enc)
    assert dec is not None
    assert dec[1] == [h, w, 3]
    assert bytes(dec[0]) == pix


@settings(max_examples=30, deadline=None)
@given(w=st.integers(1, 10), h=st.integers(1, 8), data=st.data())
def test_jpeg_round_trip_within_rounding(w, h, data):
    """All-1s-quant JPEG round-trips arbitrary gray images within
    coefficient-rounding error (±2) at arbitrary sizes including the
    edge-replication padding path."""
    import numpy as np

    from topn_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_gray,
    )

    pix = bytes(data.draw(st.integers(0, 255)) for _ in range(w * h))
    out = decode_jpeg_pixels(encode_jpeg_gray(w, h, pix))
    assert out is not None
    got, shape = out
    assert shape == [h, w, 1]
    err = np.abs(
        np.asarray(got).reshape(h, w).astype(int)
        - np.frombuffer(pix, np.uint8).reshape(h, w).astype(int)
    ).max()
    assert err <= 2


@settings(max_examples=80, deadline=None)
@given(junk=st.binary(max_size=400), data=st.data())
def test_decoders_never_crash_on_garbage(junk, data):
    """Arbitrary bytes — including bytes wearing a valid magic
    number — must decode to None, never raise: decode_pixels turns
    None into a CONTROLLED fail-fast, so an uncontrolled exception
    here would crash whole tasks on one bad asset."""
    from topn_spark.operators.multimodal import (
        decode_bmp_pixels,
        decode_gif_pixels,
        decode_jpeg_pixels,
        decode_png_pixels,
        decode_ppm_pixels,
        parse_wav,
    )

    magics = [
        b"", b"\x89PNG\r\n\x1a\n", b"GIF89a", b"BM", b"P6\n",
        b"\xff\xd8", b"RIFF",
    ]
    payload = data.draw(st.sampled_from(magics)) + junk
    for dec in (
        decode_png_pixels,
        decode_gif_pixels,
        decode_bmp_pixels,
        decode_ppm_pixels,
        decode_jpeg_pixels,
        parse_wav,
    ):
        dec(payload)  # any return is fine; raising is the failure


# ---------------------------------------------------------------------------
# WARC framing: encode -> parse is the identity for ANY payload bytes
# (Content-Length slicing must never desync, whatever the payload holds)
# ---------------------------------------------------------------------------

_payloads = st.lists(
    st.binary(max_size=200), min_size=0, max_size=6
)


@given(payloads=_payloads, gz=st.booleans())
@settings(max_examples=60, deadline=None)
def test_warc_roundtrip_any_payload(payloads, gz):
    from topn_spark.sources.warc import encode_warc, parse_warc_records

    recs = [
        ("response", f"http://t/{i}", p) for i, p in enumerate(payloads)
    ]
    out = parse_warc_records(encode_warc(recs, gzip_members=gz))
    assert [r["payload"] for r in out] == payloads
    assert [r["content_length"] for r in out] == [
        len(p) for p in payloads
    ]
    assert [r["target_uri"] for r in out] == [
        f"http://t/{i}" for i in range(len(payloads))
    ]


# ---------------------------------------------------------------------------
# Unigram-LM Viterbi: segmentation always concatenates back to the word
# (the single-char coverage guarantee), pieces come from the vocab, and
# the tie contract is deterministic
# ---------------------------------------------------------------------------

_words = st.text(alphabet="abcd", min_size=1, max_size=12)


@given(
    word=_words,
    vocab_words=st.lists(_words, min_size=1, max_size=8),
)
@settings(max_examples=100, deadline=None)
def test_unigram_viterbi_total_and_deterministic(word, vocab_words):
    import math

    from topn_spark.operators.textstats import _unigram_viterbi

    pieces = {c for w in vocab_words + [word] for c in w}
    pieces.update(w[:3] for w in vocab_words)
    logp = {
        p: math.log((i + 1) / (len(pieces) + 1))
        for i, p in enumerate(sorted(pieces))
    }
    max_len = max(len(p) for p in logp)
    seg = _unigram_viterbi(word, logp, max_len)
    assert "".join(seg) == word
    assert all(p in logp for p in seg)
    assert seg == _unigram_viterbi(word, logp, max_len)


def test_pack_unpack_round_trip_property(spark):
    """Property: for ANY corpus of token arrays and ANY seq_len,
    pack_token_sequences is lossless — unpack_sequences rebuilds
    every non-empty document exactly, every non-final sequence is
    exactly full, and the token total is conserved."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from topn_spark.operators.pipeline import (
        pack_token_sequences,
        packed_doc_spans,
        unpack_sequences,
    )

    @settings(max_examples=5, deadline=None)
    @given(
        docs=st.lists(
            st.lists(
                st.sampled_from(["a", "bb", "ccc", "dd", "e"]),
                max_size=12,
            ),
            min_size=1,
            max_size=8,
        ),
        seq_len=st.integers(min_value=1, max_value=7),
    )
    def check(docs, seq_len):
        df = spark.createDataFrame(
            [(i, toks) for i, toks in enumerate(docs)],
            "doc_id long, tokens array<string>",
        )
        packed = pack_token_sequences(df, seq_len=seq_len).collect()
        spans = packed_doc_spans(df, seq_len=seq_len)
        rebuilt = {
            r.doc_id: r.tokens
            for r in unpack_sequences(
                pack_token_sequences(df, seq_len=seq_len), spans
            ).collect()
        }
        want = {i: t for i, t in enumerate(docs) if t}
        assert rebuilt == want
        total = sum(len(t) for t in docs)
        assert sum(r.n_tokens for r in packed) == total
        full = sorted(r.n_tokens for r in packed)
        # at most one non-full sequence (the final remainder)
        assert sum(1 for n in full if n != seq_len) <= 1

    check()


def test_pack_unpack_round_trip_with_sep_property(spark):
    """Property: with sep_token, packing appends exactly one
    separator per non-empty document (token total = corpus + n_docs),
    the flattened stream ends with a separator, and unpack with the
    same sep_token strips it — round trip still lossless."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from topn_spark.operators.pipeline import (
        pack_token_sequences,
        packed_doc_spans,
        unpack_sequences,
    )

    SEP = "<eos>"

    @settings(max_examples=5, deadline=None)
    @given(
        docs=st.lists(
            st.lists(
                st.sampled_from(["a", "bb", "ccc", "dd", "e"]),
                max_size=12,
            ),
            min_size=1,
            max_size=8,
        ),
        seq_len=st.integers(min_value=1, max_value=7),
    )
    def check(docs, seq_len):
        df = spark.createDataFrame(
            [(i, toks) for i, toks in enumerate(docs)],
            "doc_id long, tokens array<string>",
        )
        packed = pack_token_sequences(
            df, seq_len=seq_len, sep_token=SEP
        ).collect()
        spans = packed_doc_spans(df, seq_len=seq_len, sep_token=SEP)
        rebuilt = {
            r.doc_id: r.tokens
            for r in unpack_sequences(
                pack_token_sequences(
                    df, seq_len=seq_len, sep_token=SEP
                ),
                spans,
                sep_token=SEP,
            ).collect()
        }
        want = {i: t for i, t in enumerate(docs) if t}
        assert rebuilt == want
        n_docs = len(want)
        total = sum(len(t) for t in docs) + n_docs
        assert sum(r.n_tokens for r in packed) == total
        flat = [
            t
            for r in sorted(packed, key=lambda r: r.seq_id)
            for t in r.tokens
        ]
        assert flat.count(SEP) == n_docs
        if flat:
            assert flat[-1] == SEP

    check()


def test_pack_masked_round_trip_property(spark):
    """Property: for ANY corpus of (tokens, mask) pairs and ANY
    seq_len, pack_masked_sequences keeps the mask bit-aligned — every
    packed sequence has len(tokens) == len(mask), the supervised
    total is conserved, and unpack_masked_sequences rebuilds every
    non-empty document's (tokens, mask) pair exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from topn_spark.operators.pipeline import (
        pack_masked_sequences,
        packed_doc_spans,
        unpack_masked_sequences,
    )

    @settings(max_examples=5, deadline=None)
    @given(
        docs=st.lists(
            st.lists(
                st.tuples(
                    st.sampled_from(["a", "bb", "ccc"]),
                    st.booleans(),
                ),
                max_size=10,
            ),
            min_size=1,
            max_size=6,
        ),
        seq_len=st.integers(min_value=1, max_value=5),
    )
    def check(docs, seq_len):
        rows = [
            (i, [t for t, _ in d], [m for _, m in d])
            for i, d in enumerate(docs)
        ]
        df = spark.createDataFrame(
            rows,
            "doc_id long, tokens array<string>, "
            "loss_mask array<boolean>",
        )
        packed_df = pack_masked_sequences(df, seq_len=seq_len)
        packed = packed_df.collect()
        for r in packed:
            assert len(r.tokens) == len(r.loss_mask)
            assert r.n_supervised == sum(r.loss_mask)
        assert sum(r.n_supervised for r in packed) == sum(
            m for d in docs for _, m in d
        )
        spans = packed_doc_spans(df, seq_len=seq_len)
        rebuilt = {
            r.doc_id: (list(r.tokens), list(r.loss_mask))
            for r in unpack_masked_sequences(
                pack_masked_sequences(df, seq_len=seq_len), spans
            ).collect()
        }
        want = {
            i: ([t for t, _ in d], [m for _, m in d])
            for i, d in enumerate(docs)
            if d
        }
        assert rebuilt == want

    check()


# ------------------------------------------- truncate_conversation


def _model_truncate(msgs, max_chars, keep_system):
    """Reference model: pin the system turn, longest fitting suffix."""
    has_sys = keep_system and bool(msgs) and msgs[0][0] == "system"
    sys_part = msgs[:1] if has_sys else []
    sys_chars = len(msgs[0][1] or "") if has_sys else 0
    body = msgs[1:] if has_sys else msgs
    budget = max_chars - sys_chars
    cut = len(body)
    total = 0
    # grow the suffix from the end while it fits
    for i in range(len(body) - 1, -1, -1):
        total += len(body[i][1] or "")
        if total <= budget:
            cut = i
        else:
            break
    kept = sys_part + body[cut:]
    chars = sys_chars + sum(len(c or "") for _, c in body[cut:])
    return kept, cut, chars, sys_chars > max_chars


_turn = st.tuples(
    st.sampled_from(["system", "user", "assistant"]),
    st.text(
        alphabet=st.characters(min_codepoint=97, max_codepoint=122),
        max_size=12,
    ),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    convs=st.lists(
        st.lists(_turn, min_size=0, max_size=8), min_size=1, max_size=6
    ),
    max_chars=st.sampled_from([0, 5, 17, 60, 10_000]),
    keep_system=st.booleans(),
)
def test_truncate_conversation_matches_model(
    spark, convs, max_chars, keep_system
):
    from topn_spark.operators.sft import truncate_conversation

    df = spark.createDataFrame(
        [(i, [(r, c) for r, c in conv]) for i, conv in enumerate(convs)],
        "conv_id long,"
        " messages array<struct<role:string,content:string>>",
    )
    got = {
        r.conv_id: r
        for r in truncate_conversation(
            df, max_chars=max_chars, keep_system=keep_system
        ).collect()
    }
    for i, conv in enumerate(convs):
        kept, dropped, chars, over = _model_truncate(
            conv, max_chars, keep_system
        )
        r = got[i]
        assert [(m.role, m.content) for m in r.messages_fit] == kept
        assert r.n_turns_dropped == dropped
        assert r.chars_kept == chars
        assert r.over_budget == over
        # the invariant the trainer relies on: within budget unless
        # the pinned system prefix alone exceeds it
        assert r.chars_kept <= max_chars or r.over_budget


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    docs=st.lists(
        st.lists(
            st.integers(min_value=0, max_value=70000),
            min_size=0,
            max_size=20,
        ),
        min_size=0,
        max_size=12,
    ),
    n_shards=st.sampled_from([1, 2, 5]),
)
def test_bin_shard_round_trip_property(spark, tmp_path_factory, docs, n_shards):
    """Any token/mask corpus survives the binary export byte-exactly:
    export -> read equals the packed input (ids, masks, counts), and
    verify stays green — across dtype boundaries (ids above 65535
    force uint32), empty docs, and shard counts."""
    from topn_spark.operators.binshard import (
        export_bin_shards,
        read_bin_shards,
        verify_bin_shards,
    )
    from topn_spark.operators.pipeline import pack_masked_sequences

    rows = [
        (i, toks, [t % 3 == 0 for t in toks])
        for i, toks in enumerate(docs)
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id bigint, tokens array<bigint>,"
        " loss_mask array<boolean>",
    )
    packed = pack_masked_sequences(
        df, id_col="doc_id", order_col="doc_id", seq_len=7,
        sep_token=1,
    ).persist()
    out = str(tmp_path_factory.mktemp("binprop"))
    if packed.count() == 0:
        return  # nothing to export: empty corpora pack to nothing
    export_bin_shards(packed, out, n_shards)
    back = read_bin_shards(spark, out)
    cols = ["seq_id", "n_tokens", "n_supervised", "tokens", "loss_mask"]
    assert packed.select(*cols).exceptAll(back.select(*cols)).count() == 0
    assert back.select(*cols).exceptAll(packed.select(*cols)).count() == 0
    assert all(r.ok for r in verify_bin_shards(spark, out).collect())
    packed.unpersist()


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["w", "xx", "longword", "<img>"]),
            min_size=1,
            max_size=10,
        ),
        min_size=1,
        max_size=8,
    ),
    seq_len=st.sampled_from([3, 5, 11]),
)
def test_multimodal_pack_binding_property(spark, docs, seq_len):
    """For ANY conversation mix, the packed per-sequence manifests
    (a) concatenate back to each doc's asset list in order, and
    (b) every sequence's manifest length equals its placeholder
    count — the binding invariant under arbitrary boundary splits."""
    from topn_spark.operators.pipeline import pack_multimodal_sequences

    rows = []
    for i, toks in enumerate(docs):
        n_img = sum(1 for t in toks if t == "<img>")
        assets = [i * 100 + j for j in range(n_img)]
        rows.append((i, toks, [len(t) >= 4 for t in toks], assets))
    df = spark.createDataFrame(
        rows,
        "conv_id bigint, tokens array<string>,"
        " loss_mask array<boolean>, asset_ids array<bigint>",
    )
    out = pack_multimodal_sequences(
        df, id_col="conv_id", order_col="conv_id", seq_len=seq_len,
        image_token="<img>", sep_token="</s>",
    ).orderBy("seq_id").collect()
    # (b) per-sequence: manifest length == placeholder count
    for r in out:
        assert len(r.asset_ids) == r.tokens.count("<img>")
        assert r.n_images == len(r.asset_ids)
        assert len(r.tokens) == len(r.loss_mask)
    # (a) global: manifests concatenated in seq order reproduce every
    # doc's asset list in order (docs packed in conv_id order)
    got = [a for r in out for a in r.asset_ids]
    want = [a for _, _, _, assets in rows for a in assets]
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    base=st.lists(
        st.lists(st.integers(0, 99), min_size=1, max_size=6),
        min_size=2,
        max_size=12,
    ),
    data=st.data(),
    n_shards=st.sampled_from([1, 3, 5]),
)
def test_incremental_export_equals_full_property(
    spark, tmp_path_factory, base, data, n_shards
):
    """For ANY base corpus and ANY delta (mutate / drop / append
    documents), an incremental re-export leaves the directory
    byte-identical to a full export of the v2 corpus, and every
    shard containing a touched id is marked rewritten."""
    import glob as _glob
    import hashlib
    import os

    from hypothesis import strategies as hst

    from topn_spark.operators.binshard import export_bin_shards

    def frame(docs):
        return spark.createDataFrame(
            [
                (i, toks, [t % 2 == 0 for t in toks])
                for i, toks in docs
            ],
            "seq_id bigint, tokens array<bigint>,"
            " loss_mask array<boolean>",
        )

    v1 = list(enumerate(base))
    ids = [i for i, _ in v1]
    mutate = data.draw(
        hst.sets(hst.sampled_from(ids), max_size=len(ids))
    )
    drop = data.draw(
        hst.sets(
            hst.sampled_from([i for i in ids if i not in mutate]),
            max_size=max(len(ids) - len(mutate) - 1, 0),
        )
        if len(mutate) < len(ids)
        else hst.just(set())
    )
    extra = data.draw(hst.integers(0, 2))
    v2 = [
        (i, ([77] + toks) if i in mutate else toks)
        for i, toks in v1
        if i not in drop
    ] + [(len(ids) + j, [7, 8, 9]) for j in range(extra)]

    def hashes(d):
        return {
            os.path.basename(p): hashlib.md5(
                open(p, "rb").read()
            ).hexdigest()
            for p in _glob.glob(os.path.join(d, "shard_*"))
        }

    inc = str(tmp_path_factory.mktemp("incprop"))
    export_bin_shards(frame(v1), inc, n_shards, salt="pp")
    man = export_bin_shards(
        frame(v2), inc, n_shards, salt="pp", incremental=True
    )
    full = str(tmp_path_factory.mktemp("fullprop"))
    export_bin_shards(frame(v2), full, n_shards, salt="pp")
    assert hashes(inc) == hashes(full)
    # every shard holding a touched id must have been rewritten
    from topn_spark.operators.pipeline import shard_assignment

    touched = (
        set(mutate)
        | set(drop)
        | {len(ids) + j for j in range(extra)}
    )
    if touched:
        owner = {
            int(r["seq_id"]): int(r["shard"])
            for r in shard_assignment(
                frame(
                    [(i, [0]) for i in touched]
                ),
                n_shards,
                "seq_id",
                "pp",
            ).collect()
        }
        rewritten = {
            int(r["shard"]) for r in man.collect() if r["rewritten"]
        }
        # dropped ids whose shard became empty are orphans (no
        # manifest row), so check only shards that still exist
        alive = {int(r["shard"]) for r in man.collect()}
        assert {
            s for i, s in owner.items() if s in alive
        } <= rewritten | (set(owner.values()) - alive)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    docs=st.lists(
        st.lists(st.integers(0, 50), min_size=1, max_size=5),
        min_size=1,
        max_size=15,
    ),
    data=st.data(),
    epoch=st.integers(0, 3),
)
def test_window_read_equals_slice_property(
    spark, tmp_path_factory, docs, data, epoch
):
    """For ANY corpus and ANY window [a, b), read_bin_window equals
    the same slice of the full epoch-order read."""
    from hypothesis import strategies as hst

    from topn_spark.operators.binshard import (
        export_bin_shards,
        export_epoch_order,
        read_bin_shards,
        read_bin_window,
        read_epoch_order,
    )

    df = spark.createDataFrame(
        [
            (i, toks, [t % 2 == 0 for t in toks])
            for i, toks in enumerate(docs)
        ],
        "seq_id bigint, tokens array<bigint>,"
        " loss_mask array<boolean>",
    )
    out = str(tmp_path_factory.mktemp("winprop"))
    export_bin_shards(df, out, 4, salt="wp")
    export_epoch_order(spark, out, epoch, salt="wp")
    n = len(docs)
    a = data.draw(hst.integers(0, n))
    b = data.draw(hst.integers(a, n))
    full = (
        read_epoch_order(spark, out, epoch)
        .join(read_bin_shards(spark, out), ["shard", "seq_index"])
        .orderBy("shard_pos", "position")
        .collect()
    )
    win = (
        read_bin_window(spark, out, epoch, a, b)
        .orderBy("global_pos")
        .collect()
    )
    assert [r.global_pos for r in win] == list(range(a, b))
    for g, r in zip(range(a, b), win):
        f = full[g]
        assert (f.seq_id, f.tokens, f.loss_mask) == (
            r.seq_id, r.tokens, r.loss_mask,
        )


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    docs=st.lists(
        st.lists(st.integers(0, 50), min_size=1, max_size=5),
        min_size=1,
        max_size=14,
    ),
    owners=st.data(),
)
def test_streaming_maintenance_equals_full_export_property(
    spark, tmp_path_factory, docs, owners
):
    """For ANY corpus and ANY partition of it into ordered
    micro-batches, the sequence of bin_export_batch commits
    produces shard files BYTE-IDENTICAL to one from-scratch export
    of the whole corpus — the folded signatures, partition-pruned
    rewrites, and manifest carry-forward compose to the pure
    declarative result regardless of how ingestion was sliced."""
    import glob
    import hashlib
    import os

    from hypothesis import strategies as hst

    from topn_spark.operators.binshard import export_bin_shards
    from topn_spark.streaming.ingest import bin_export_batch

    ddl = (
        "seq_id bigint, tokens array<bigint>,"
        " loss_mask array<boolean>"
    )
    n_batches = owners.draw(hst.integers(1, 3))
    owner = [
        owners.draw(hst.integers(0, n_batches - 1))
        for _ in docs
    ]
    rows = [
        (i, toks, [t % 2 == 0 for t in toks])
        for i, toks in enumerate(docs)
    ]
    base = str(tmp_path_factory.mktemp("smprop"))
    corpus, out = f"{base}/store", f"{base}/out"
    for b in range(n_batches):
        batch = [r for r, o in zip(rows, owner) if o == b]
        bin_export_batch(
            spark.createDataFrame(batch, ddl) if batch
            else spark.createDataFrame([], ddl),
            corpus, out, b, 4, salt="sm",
        )
    clean = f"{base}/clean"
    export_bin_shards(
        spark.createDataFrame(rows, ddl), clean, 4, salt="sm"
    )

    def hashes(d):
        return {
            os.path.basename(p): hashlib.md5(
                open(p, "rb").read()
            ).hexdigest()
            for p in glob.glob(os.path.join(d, "shard_*"))
        }

    assert hashes(out) == hashes(clean)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    n=st.integers(1, 18),
    draws=st.data(),
)
def test_cursor_consumption_tiles_epochs_property(
    spark, tmp_path_factory, n, draws
):
    """For ANY corpus and ANY sequence of batch sizes, repeated
    resume_bin_window + commit_trainer_cursor consumption tiles
    epoch 0 then epoch 1 exactly — every position served once, in
    order, across the epoch boundary, regardless of how the
    trainer slices its steps."""
    from hypothesis import strategies as hst

    from topn_spark.operators.binshard import (
        commit_trainer_cursor,
        export_bin_shards,
        export_epoch_order,
        read_bin_window,
        resume_bin_window,
    )

    ddl = (
        "seq_id bigint, tokens array<bigint>,"
        " loss_mask array<boolean>"
    )
    df = spark.createDataFrame(
        [(i, [1 + i % 7], [True]) for i in range(n)], ddl
    )
    out = str(tmp_path_factory.mktemp("curprop"))
    export_bin_shards(df, out, 3, salt="cp")
    export_epoch_order(spark, out, 0, salt="cp0")
    export_epoch_order(spark, out, 1, salt="cp1")
    served = []
    consumed = 0
    while consumed < 2 * n:
        units = draws.draw(hst.integers(1, max(1, n)))
        frame, cur = resume_bin_window(spark, out, units)
        got = frame.orderBy("global_pos").collect()
        served.extend((cur["epoch"], r.global_pos, r.seq_id) for r in got)
        consumed += len(got)
        commit_trainer_cursor(out, cur)
    want = []
    for e in (0, 1):
        for r in read_bin_window(spark, out, e, 0, n).orderBy(
            "global_pos"
        ).collect():
            want.append((e, r.global_pos, r.seq_id))
    assert served == want
