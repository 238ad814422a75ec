"""Trainer-native binary shard export (operators/binshard.py):
vocab build/artifact, id encoding, .bin/.idx/.msk round trip with
bit-exact loss masks, byte-level verify, and the loud-failure
contract for misaligned masks / OOV tokens / dtype overflow."""

from __future__ import annotations

import os
import struct

import pytest
from pyspark.sql import functions as F

from topn_spark.operators.binshard import (
    encode_token_ids,
    export_bin_shards,
    load_vocab,
    read_bin_shards,
    save_vocab,
    token_vocab,
    verify_bin_shards,
)


def _tok_docs(spark, n=40):
    rows = [
        (
            i,
            [f"w{j % 7}" for j in range(3 + i % 9)],
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "doc_id bigint, tokens array<string>"
    ).withColumn(
        "loss_mask",
        F.transform("tokens", lambda t: F.length(t) >= 2),
    )


# ------------------------------------------------------------- vocab


def test_token_vocab_specials_and_order(spark):
    df = spark.createDataFrame(
        [(1, ["b", "a", "b", "c", "b", "a"])],
        "doc_id bigint, tokens array<string>",
    )
    v = {
        r.token: (r.token_id, r.n)
        for r in token_vocab(df, specials=("<pad>", "</s>")).collect()
    }
    # specials first in given order, count 0 when unseen
    assert v["<pad>"] == (0, 0) and v["</s>"] == (1, 0)
    # then by count desc, token asc: b(3), a(2), c(1)
    assert v["b"][0] == 2 and v["a"][0] == 3 and v["c"][0] == 4
    assert v["b"][1] == 3 and v["c"][1] == 1


def test_token_vocab_special_seen_in_corpus_keeps_one_id(spark):
    df = spark.createDataFrame(
        [(1, ["</s>", "x", "</s>", "</s>"])],
        "doc_id bigint, tokens array<string>",
    )
    out = token_vocab(df, specials=("</s>",)).collect()
    by_tok = {r.token: r for r in out}
    assert len(out) == 2  # no duplicate id for the special
    assert by_tok["</s>"].token_id == 0 and by_tok["</s>"].n == 3
    assert by_tok["x"].token_id == 1


def test_vocab_artifact_round_trip_and_corruption(spark, tmp_path):
    df = _tok_docs(spark)
    p = str(tmp_path / "vocab")
    save_vocab(token_vocab(df, specials=("<pad>",)), p)
    d = load_vocab(spark, p)
    assert d["<pad>"] == 0 and sorted(d.values()) == list(
        range(len(d))
    )
    # gapped ids -> loud corruption error
    bad = spark.createDataFrame(
        [("a", 0, 1), ("b", 2, 1)], "token string, token_id bigint, n bigint"
    )
    p2 = str(tmp_path / "vocab_bad")
    bad.write.parquet(p2)
    with pytest.raises(IOError, match="not contiguous"):
        load_vocab(spark, p2)


def test_encode_token_ids_and_oov(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, None)],
        "doc_id bigint, tokens array<string>",
    )
    out = {
        r.doc_id: r.tokens
        for r in encode_token_ids(df, {"a": 3, "b": 5}).collect()
    }
    assert out[1] == [3, 5] and out[2] is None
    with pytest.raises(Exception, match="not in the vocabulary"):
        encode_token_ids(df, {"a": 3}).collect()


# ------------------------------------------------- export round trip


def _packed(spark, seq_len=16):
    from topn_spark.operators.pipeline import pack_masked_sequences

    docs = _tok_docs(spark)
    vocab = {
        r.token: r.token_id
        for r in token_vocab(docs, specials=("<pad>", "</s>")).collect()
    }
    enc = encode_token_ids(docs, vocab)
    return pack_masked_sequences(
        enc,
        id_col="doc_id",
        order_col="doc_id",
        seq_len=seq_len,
        sep_token=vocab["</s>"],
        sep_supervised=True,
    ).persist()


def test_bin_round_trip_masks_bit_exact(spark, tmp_path):
    out = str(tmp_path / "shards")
    packed = _packed(spark)
    man = export_bin_shards(packed, out, 4).collect()
    # manifest accounting: totals equal the packed frame's totals
    tot = packed.agg(
        F.sum("n_tokens").alias("t"), F.sum("n_supervised").alias("s")
    ).collect()[0]
    assert sum(r.n_tokens for r in man) == tot["t"]
    assert sum(r.n_supervised for r in man) == tot["s"]
    back = read_bin_shards(spark, out)
    cols = ["seq_id", "n_tokens", "n_supervised", "tokens", "loss_mask"]
    a, b = packed.select(*cols), back.select(*cols)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    ok = verify_bin_shards(spark, out)
    assert all(r.ok for r in ok.collect())
    # deterministic re-export: byte-identical files
    import hashlib

    def digest():
        h = hashlib.md5()
        for f in sorted(os.listdir(out)):
            if f.startswith("shard_"):
                h.update(open(os.path.join(out, f), "rb").read())
        return h.hexdigest()

    d1 = digest()
    export_bin_shards(packed, out, 4)
    assert digest() == d1


def test_bin_export_no_mask_mode(spark, tmp_path):
    out = str(tmp_path / "shards_nomask")
    packed = _packed(spark)
    man = export_bin_shards(packed, out, 2, mask_col=None).collect()
    assert all(r.n_supervised == 0 and r.msk_bytes == 0 for r in man)
    assert not any(
        f.endswith(".msk") for f in os.listdir(out)
    )
    back = read_bin_shards(spark, out)
    assert back.where(F.col("loss_mask").isNotNull()).count() == 0
    assert all(r.ok for r in verify_bin_shards(spark, out).collect())


def test_bin_torn_export_detected(spark, tmp_path):
    out = str(tmp_path / "shards_torn")
    packed = _packed(spark)
    export_bin_shards(packed, out, 2)
    # truncate one .bin -> that shard (and only it) fails verify
    victim = os.path.join(out, "shard_00001.bin")
    raw = open(victim, "rb").read()
    open(victim, "wb").write(raw[:-4])
    flags = {
        r.shard: r.ok for r in verify_bin_shards(spark, out).collect()
    }
    assert flags[1] is False and flags[0] is True
    # a missing index -> ok False with NULL actuals, not a crash
    os.remove(os.path.join(out, "shard_00000.idx"))
    rows = {
        r.shard: r for r in verify_bin_shards(spark, out).collect()
    }
    assert rows[0].ok is False and rows[0].n_seqs_actual is None


def test_bin_dtype_selection_and_overflow(spark, tmp_path):
    big = spark.createDataFrame(
        [(1, [70000, 2], [True, False])],
        "seq_id bigint, tokens array<bigint>,"
        " loss_mask array<boolean>",
    )
    out = str(tmp_path / "s32")
    man = export_bin_shards(big, out, 1).collect()
    assert man[0].dtype == "uint32"
    # forcing uint16 must raise, not wrap
    with pytest.raises(ValueError, match="exceeds"):
        export_bin_shards(big, str(tmp_path / "s16"), 1, dtype="uint16")
    neg = spark.createDataFrame(
        [(1, [-1], [True])],
        "seq_id bigint, tokens array<bigint>,"
        " loss_mask array<boolean>",
    )
    with pytest.raises(ValueError, match="negative"):
        export_bin_shards(neg, str(tmp_path / "sneg"), 1)
    # string tokens -> told to encode first
    s = spark.createDataFrame(
        [(1, ["a"], [True])],
        "seq_id bigint, tokens array<string>, loss_mask array<boolean>",
    )
    with pytest.raises(ValueError, match="encode_token_ids"):
        export_bin_shards(s, str(tmp_path / "sstr"), 1)


def test_bin_misaligned_mask_raises_with_id(spark, tmp_path):
    df = spark.createDataFrame(
        [(7, [1, 2, 3], [True])],
        "seq_id bigint, tokens array<bigint>,"
        " loss_mask array<boolean>",
    )
    with pytest.raises(Exception, match="misaligned"):
        export_bin_shards(df, str(tmp_path / "sbad"), 1)


def test_bin_stale_files_removed_and_reader_uses_manifest(
    spark, tmp_path
):
    out = str(tmp_path / "shards_shrink")
    packed = _packed(spark)
    export_bin_shards(packed, out, 4)
    # re-export with FEWER shards: the old shard_00003.* must not
    # survive on disk nor leak into reads
    export_bin_shards(packed, out, 2)
    assert not os.path.exists(
        os.path.join(out, "shard_00003.bin")
    )
    back = read_bin_shards(spark, out)
    assert back.select("shard").distinct().count() == 2
    cols = ["seq_id", "tokens", "loss_mask"]
    assert packed.select(*cols).exceptAll(
        back.select(*cols)
    ).count() == 0


def test_idx_header_layout(spark, tmp_path):
    # the header is a contract: magic/version/dtype/has_mask/n_seqs
    out = str(tmp_path / "shards_hdr")
    packed = _packed(spark)
    export_bin_shards(packed, out, 1)
    raw = open(os.path.join(out, "shard_00000.idx"), "rb").read()
    assert raw[:8] == b"TNSPBIN1"
    version, code, has_mask = struct.unpack_from("<III", raw, 8)
    (n,) = struct.unpack_from("<Q", raw, 20)
    assert version == 1 and code == 2 and has_mask == 1
    assert n == packed.count()


# ------------------------------------------------- epoch ordering


def test_epoch_order_permutation_and_determinism(spark, tmp_path):
    from topn_spark.operators.binshard import (
        export_epoch_order,
        read_epoch_order,
    )

    out = str(tmp_path / "shards_ep")
    packed = _packed(spark)
    export_bin_shards(packed, out, 3)
    man = {
        r.shard: r
        for r in export_epoch_order(spark, out, epoch=0).collect()
    }
    # every shard gets a position; positions are a permutation
    assert sorted(r.shard_pos for r in man.values()) == list(
        range(len(man))
    )
    back = read_epoch_order(spark, out, epoch=0)
    rows = back.collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for k, rs in by_shard.items():
        # a true permutation of 0..n_seqs-1
        assert sorted(x.seq_index for x in rs) == list(range(len(rs)))
        assert man[k].n_seqs == len(rs)
        # and NOT the identity order (shuffled), for non-tiny shards
        if len(rs) > 4:
            ordered = [
                x.seq_index
                for x in sorted(rs, key=lambda y: y.position)
            ]
            assert ordered != sorted(ordered)
    # every epoch-order position dereferences a real sequence
    seqs = read_bin_shards(spark, out).select(
        "shard", F.col("seq_index").alias("si")
    )
    joined = back.join(
        seqs,
        (back.shard == seqs.shard) & (back.seq_index == seqs.si),
    )
    assert joined.count() == len(rows)
    # deterministic re-export: identical bytes
    import os as _os

    f = _os.path.join(out, "shard_00000.ep0000")
    b1 = open(f, "rb").read()
    export_epoch_order(spark, out, epoch=0)
    assert open(f, "rb").read() == b1
    # a different epoch is a different permutation
    export_epoch_order(spark, out, epoch=1)
    b2 = open(_os.path.join(out, "shard_00000.ep0001"), "rb").read()
    assert b2 != b1
