"""Trainer-native binary shard export — the last meter between the
parquet shard machinery (:func:`~topn_spark.operators.pipeline.
export_training_shards`) and an actual pretraining/SFT trainer.

Trainers that memory-map their data (Megatron-LM's ``.bin``/``.idx``
indexed datasets are the public reference point) consume a flat
little-endian token stream plus a sequence-offset index, NOT parquet:
random access to sequence *i* must be two pointer reads, with zero
decode work in the input pipeline. This module writes that shape from
the output of :func:`~topn_spark.operators.pipeline.
pack_masked_sequences` / ``pack_token_sequences``, carrying the
per-token LOSS MASK as an aligned bitstream — the round-9/10 lesson
that a supervise mask which does not survive export produces shards
that silently train on prompts.

Format (own layout, self-describing — inspired by the public
Megatron-LM indexed-dataset idea of token stream + offset index, not
a copy of its encoding):

``shard_<k>.bin``
    all sequences' token ids concatenated, little-endian
    uint16 (``dtype_code=2``) or uint32 (``dtype_code=4``).
``shard_<k>.msk`` (only when a mask column is exported)
    per-sequence loss masks, bit-packed LSB-first
    (``numpy.packbits(bitorder="little")``), each sequence starting
    on a fresh byte so a trainer can slice masks independently.
``shard_<k>.idx``  (all integers little-endian)
    ========  =====================================================
    bytes     field
    ========  =====================================================
    8         magic ``b"TNSPBIN1"``
    u32       version (1)
    u32       dtype_code (2 = uint16, 4 = uint32)
    u32       has_mask (0/1)
    u64       n_seqs
    u32[n]    seq_lens  (real token count per sequence)
    u64[n]    seq_ids   (source ``seq_id`` — the parquet audit link)
    u32[n]    n_supervised per sequence (zeros when has_mask = 0)
    u64[n]    tok_ptrs  (byte offset of each sequence in ``.bin``)
    u64[n]    msk_ptrs  (byte offset in ``.msk``; only if has_mask)
    ========  =====================================================

``_manifest`` (parquet, one row per non-empty shard)
    ``shard, n_seqs, n_tokens, n_supervised, dtype, bin_bytes,
    msk_bytes, bin_crc32, msk_crc32`` — the byte-level accounting
    :func:`verify_bin_shards` recounts.

Reference parity: the reference engine (TopN.java) has no trainer
export at all — this is north-star surface for the training-data
pipeline, sized per the round-9/10 verdict task list.
"""

from __future__ import annotations

import glob
import os
import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MAGIC = b"TNSPBIN1"
_VERSION = 1
#: dtype_code -> (numpy dtype string, max token id)
_DTYPES = {2: ("<u2", (1 << 16) - 1), 4: ("<u4", (1 << 32) - 1)}

_MANIFEST_SCHEMA = (
    "shard int, n_seqs bigint, n_tokens bigint, n_supervised bigint,"
    " dtype string, bin_bytes bigint, msk_bytes bigint,"
    " bin_crc32 bigint, msk_crc32 bigint"
)

_INTEGRAL = {"tinyint", "smallint", "int", "bigint"}


# ------------------------------------------------------------------
# vocabulary: token string -> dense integer id
# ------------------------------------------------------------------

def token_vocab(
    df: DataFrame,
    tokens_col: str = "tokens",
    specials: tuple[str, ...] = (),
) -> DataFrame:
    """Build a dense token-id vocabulary from tokenized documents —
    the id-assignment step between a string tokenizer
    (:func:`~topn_spark.operators.textstats.apply_bpe` /
    :func:`~topn_spark.operators.sft.bpe_loss_mask` emit subtoken
    STRINGS) and binary export (which needs integer ids): ``specials``
    take ids ``0..len(specials)-1`` in the given order (pad/eos
    conventionally first so id 0 is the pad id), then corpus tokens
    by descending occurrence count, ties broken by the token string
    ascending — fully deterministic across runs/engines. A special
    that also occurs in the corpus keeps its special id (corpus
    occurrences of it are counted but assign no second id). Returns
    ``(token, token_id, n)`` with ``n`` = corpus occurrences (0 for
    unseen specials).

    Scale shape: one token explode into a map-side-combinable hash
    agg (output = vocabulary, sublinear in corpus size), then the
    two-phase bucketed exact rank
    (:func:`~topn_spark.operators.topn.rank_low_cardinality` — no
    keyless window, so the vocab sort stays parallel even for a
    multi-million-type vocabulary)."""
    from topn_spark.operators.topn import rank_low_cardinality

    counts = (
        df.select(F.explode(tokens_col).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    sp = list(specials)
    spark = df.sparkSession
    if sp:
        sp_df = spark.createDataFrame(
            [(t, i) for i, t in enumerate(sp)],
            "token string, token_id bigint",
        )
        sp_counts = counts.join(
            F.broadcast(sp_df.select("token")), "token", "semi"
        )
        sp_out = (
            sp_df.join(sp_counts, "token", "left")
            .select(
                "token",
                "token_id",
                F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
            )
        )
        counts = counts.join(
            F.broadcast(sp_df.select("token")), "token", "anti"
        )
    ranked = rank_low_cardinality(
        counts, keys=[], value_col="n", ascending=False,
        tiebreak=["token"],
    ).select(
        "token",
        (F.col("rank") - 1 + len(sp)).cast("bigint").alias(
            "token_id"
        ),
        "n",
    )
    return sp_out.unionByName(ranked) if sp else ranked


def save_vocab(vocab: DataFrame, path: str) -> None:
    """Persist a :func:`token_vocab` frame as parquet (coalesced to
    one file — vocabularies are model-sized, not data)."""
    vocab.select("token", "token_id", "n").coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def load_vocab(spark: SparkSession, path: str) -> dict[str, int]:
    """Load a vocabulary artifact as the ``{token: id}`` dict
    :func:`encode_token_ids` consumes, validating ids are exactly the
    dense range ``0..V-1`` (a gapped or duplicated id means a corrupt
    artifact — encoding with it would silently shift every id)."""
    rows = spark.read.parquet(path).select(
        "token", "token_id"
    ).collect()
    ids = sorted(r["token_id"] for r in rows)
    if ids != list(range(len(rows))):
        raise IOError(
            f"corrupt vocabulary at {path}: ids are not contiguous "
            f"0..{len(rows) - 1}"
        )
    return {r["token"]: int(r["token_id"]) for r in rows}


def encode_token_ids(
    df: DataFrame,
    vocab: dict[str, int],
    tokens_col: str = "tokens",
    out_col: str | None = None,
) -> DataFrame:
    """Replace a string-token array column with its integer-id array
    under ``vocab`` (a :func:`token_vocab`/:func:`load_vocab` dict).
    A token missing from the vocabulary RAISES with the token — an
    id-encoded corpus with silent OOV substitutions is untrainable
    to debug (byte-level BPE vocabularies are total by construction,
    so a miss means the wrong artifact was loaded). NULL token
    arrays stay NULL (observable); a NULL element inside an array
    raises the same way.

    Scale shape: one Arrow-batched ``pandas_udf`` projection with the
    vocabulary riding into tasks as a closure (model-sized — the
    same tier as the BPE merge tables); map-only, no shuffle, no
    join: a per-token explode+equi-join would shuffle one row per
    token OCCURRENCE, the exact data-sized shape this avoids."""
    from pyspark.sql.pandas.functions import pandas_udf

    out_col = out_col or tokens_col

    @pandas_udf("array<bigint>")
    def _enc(s: pd.Series) -> pd.Series:
        def one(toks):
            if toks is None:
                return None
            try:
                return [vocab[t] for t in toks]
            except KeyError as e:
                raise ValueError(
                    f"encode_token_ids: token {e.args[0]!r} is not "
                    "in the vocabulary — wrong or stale vocab "
                    "artifact"
                ) from None

        return s.map(one)

    return df.withColumn(out_col, _enc(F.col(tokens_col)))


# ------------------------------------------------------------------
# binary export
# ------------------------------------------------------------------

def _pick_dtype(df: DataFrame, tokens_col: str, dtype: str) -> int:
    """Resolve the dtype code, validating the id range with one
    scalar aggregate (min/max over array elements — model-sized
    driver state)."""
    if dtype not in ("auto", "uint16", "uint32"):
        raise ValueError(
            f"unknown dtype {dtype!r} (auto|uint16|uint32)"
        )
    row = df.agg(
        F.min(F.array_min(tokens_col)).alias("lo"),
        F.max(F.array_max(tokens_col)).alias("hi"),
    ).collect()[0]
    lo = row["lo"] if row["lo"] is not None else 0
    hi = row["hi"] if row["hi"] is not None else 0
    if lo < 0:
        raise ValueError(
            f"export_bin_shards: negative token id {lo} — binary "
            "token streams are unsigned"
        )
    if dtype == "uint16":
        code = 2
    elif dtype == "uint32":
        code = 4
    else:
        code = 2 if hi <= _DTYPES[2][1] else 4
    if hi > _DTYPES[code][1]:
        raise ValueError(
            f"export_bin_shards: token id {hi} exceeds "
            f"{'uint16' if code == 2 else 'uint32'} range"
        )
    return code


def export_bin_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int,
    tokens_col: str = "tokens",
    mask_col: str | None = "loss_mask",
    id_col: str = "seq_id",
    dtype: str = "auto",
    salt: str = "",
) -> DataFrame:
    """Write packed sequences as trainer-native binary shards —
    ``shard_<k>.bin`` token stream + ``.idx`` offset index +
    ``.msk`` loss-mask bitstream (see module docstring for the
    layout) plus a ``_manifest`` parquet of byte-exact per-shard
    accounting, returned as a DataFrame. Shard assignment is the
    same deterministic ``md5(id||salt) mod n_shards`` as the parquet
    exporter (:func:`~topn_spark.operators.pipeline.
    shard_assignment`), and sequences are laid out in ascending
    ``id_col`` order within each shard, so re-running reproduces
    byte-identical files. Pass ``mask_col=None`` for pretraining
    shards (no supervise mask — ``has_mask=0`` in the index).

    Loud-failure contract (the SFT-export lessons): non-integral
    token arrays, negative ids, ids over the dtype range, NULL
    token arrays, non-integral ``id_col``, and a mask whose length
    differs from its token array all RAISE with the offending
    sequence id — never a silently wrong shard.

    Scale shape: ONE shuffle (hash repartition on the shard key +
    in-partition sort — the exchange the partitioned parquet write
    pays too), then a single Arrow ``mapInPandas`` pass in which
    each task streams its shards' bytes straight to disk:
    nothing data-sized ever sits on the driver, and memory per task
    is one Arrow batch plus the open file buffers. The manifest is
    n_shards rows (model-sized) — collected once so the write
    executes exactly once, then persisted next to the shards.
    ``out_dir`` must be storage every executor can reach (one task
    writes each shard file in full; memory-mapped trainer formats
    are POSIX files by nature — export to a shared filesystem, or
    run the export co-located with the training storage).
    """
    from topn_spark.operators.pipeline import shard_assignment

    elem = df.schema[tokens_col].dataType.elementType.simpleString()
    if elem not in _INTEGRAL:
        raise ValueError(
            f"export_bin_shards: {tokens_col} elements are {elem}; "
            "binary export needs integer token ids — run "
            "encode_token_ids (or a BPE id encode) first"
        )
    if df.schema[id_col].dataType.simpleString() not in _INTEGRAL:
        raise ValueError(
            f"export_bin_shards: {id_col} must be integral (the "
            ".idx seq_ids field is uint64)"
        )
    code = _pick_dtype(df, tokens_col, dtype)
    np_dtype, _ = _DTYPES[code]
    dtype_name = "uint16" if code == 2 else "uint32"
    has_mask = mask_col is not None

    os.makedirs(out_dir, exist_ok=True)
    for stale in glob.glob(os.path.join(out_dir, "shard_*")):
        os.remove(stale)

    cols = [F.col("shard"), F.col(id_col).cast("bigint").alias("_id"),
            F.col(tokens_col).alias("_toks")]
    if has_mask:
        cols.append(F.col(mask_col).alias("_mask"))
    assigned = (
        shard_assignment(df, n_shards, id_col, salt)
        .select(*cols)
        .repartition(int(n_shards), "shard")
        .sortWithinPartitions("shard", "_id")
    )

    def _write(batches):
        state: dict | None = None

        def open_shard(k):
            return {
                "k": int(k),
                "bin": open(
                    os.path.join(out_dir, f"shard_{int(k):05d}.bin"),
                    "wb",
                ),
                "msk": open(
                    os.path.join(out_dir, f"shard_{int(k):05d}.msk"),
                    "wb",
                )
                if has_mask
                else None,
                "lens": [],
                "ids": [],
                "nsup": [],
                "bin_bytes": 0,
                "msk_bytes": 0,
                "bin_crc": 0,
                "msk_crc": 0,
            }

        def close_shard(s):
            n = len(s["lens"])
            lens = np.asarray(s["lens"], dtype="<u4")
            nsup = np.asarray(s["nsup"], dtype="<u4")
            itemsize = 2 if code == 2 else 4
            tok_ptrs = np.zeros(n, dtype="<u8")
            np.cumsum(
                lens[:-1].astype("<u8") * itemsize, out=tok_ptrs[1:]
            )
            parts = [
                _MAGIC,
                struct.pack(
                    "<III", _VERSION, code, 1 if has_mask else 0
                ),
                struct.pack("<Q", n),
                lens.tobytes(),
                np.asarray(s["ids"], dtype="<u8").tobytes(),
                nsup.tobytes(),
                tok_ptrs.tobytes(),
            ]
            if has_mask:
                msk_ptrs = np.zeros(n, dtype="<u8")
                np.cumsum(
                    ((lens[:-1].astype("<u8") + 7) // 8),
                    out=msk_ptrs[1:],
                )
                parts.append(msk_ptrs.tobytes())
            with open(
                os.path.join(
                    out_dir, f"shard_{s['k']:05d}.idx"
                ),
                "wb",
            ) as f:
                f.write(b"".join(parts))
            s["bin"].close()
            if s["msk"] is not None:
                s["msk"].close()
            return {
                "shard": s["k"],
                "n_seqs": n,
                "n_tokens": int(lens.sum(dtype="int64")),
                "n_supervised": int(nsup.sum(dtype="int64")),
                "dtype": dtype_name,
                "bin_bytes": s["bin_bytes"],
                "msk_bytes": s["msk_bytes"] if has_mask else 0,
                "bin_crc32": s["bin_crc"],
                "msk_crc32": s["msk_crc"] if has_mask else 0,
            }

        out_rows = []
        for pdf in batches:
            masks = pdf["_mask"] if has_mask else None
            for i in range(len(pdf)):
                k = int(pdf["shard"].iloc[i])
                sid = int(pdf["_id"].iloc[i])
                toks = pdf["_toks"].iloc[i]
                if toks is None:
                    raise ValueError(
                        f"export_bin_shards: NULL token array for "
                        f"id {sid}"
                    )
                if state is None or state["k"] != k:
                    if state is not None:
                        out_rows.append(close_shard(state))
                    state = open_shard(k)
                arr = np.asarray(toks, dtype="int64")
                b = arr.astype(np_dtype).tobytes()
                state["bin"].write(b)
                state["bin_crc"] = zlib.crc32(b, state["bin_crc"])
                state["bin_bytes"] += len(b)
                state["lens"].append(len(arr))
                state["ids"].append(sid)
                if has_mask:
                    m = masks.iloc[i]
                    if m is None or len(m) != len(arr):
                        raise ValueError(
                            "export_bin_shards: NULL or misaligned "
                            f"loss mask for id {sid}"
                        )
                    mb = np.packbits(
                        np.asarray(m, dtype=bool),
                        bitorder="little",
                    ).tobytes()
                    state["msk"].write(mb)
                    state["msk_crc"] = zlib.crc32(
                        mb, state["msk_crc"]
                    )
                    state["msk_bytes"] += len(mb)
                    state["nsup"].append(int(np.sum(m)))
                else:
                    state["nsup"].append(0)
        if state is not None:
            out_rows.append(close_shard(state))
        if out_rows:
            yield pd.DataFrame(out_rows)

    # collect executes the write exactly once; the manifest is
    # n_shards rows — model-sized by definition
    rows = assigned.mapInPandas(_write, _MANIFEST_SCHEMA).collect()
    spark = df.sparkSession
    manifest = spark.createDataFrame(rows, _MANIFEST_SCHEMA)
    manifest.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "_manifest")
    )
    return spark.createDataFrame(rows, _MANIFEST_SCHEMA).orderBy(
        "shard"
    )


def _parse_idx(path: str):
    """Parse one ``.idx`` file into (code, has_mask, lens, ids,
    nsup, tok_ptrs, msk_ptrs) — shared by the reader and verifier."""
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:8] != _MAGIC:
        raise IOError(f"{path}: bad magic {raw[:8]!r}")
    version, code, has_mask = struct.unpack_from("<III", raw, 8)
    if version != _VERSION:
        raise IOError(f"{path}: unsupported version {version}")
    if code not in _DTYPES:
        raise IOError(f"{path}: unknown dtype code {code}")
    (n,) = struct.unpack_from("<Q", raw, 20)
    off = 28
    lens = np.frombuffer(raw, dtype="<u4", count=n, offset=off)
    off += 4 * n
    ids = np.frombuffer(raw, dtype="<u8", count=n, offset=off)
    off += 8 * n
    nsup = np.frombuffer(raw, dtype="<u4", count=n, offset=off)
    off += 4 * n
    tok_ptrs = np.frombuffer(raw, dtype="<u8", count=n, offset=off)
    off += 8 * n
    msk_ptrs = None
    if has_mask:
        msk_ptrs = np.frombuffer(
            raw, dtype="<u8", count=n, offset=off
        )
        off += 8 * n
    if off != len(raw):
        raise IOError(
            f"{path}: {len(raw) - off} trailing bytes after index"
        )
    return code, bool(has_mask), lens, ids, nsup, tok_ptrs, msk_ptrs


def _shard_frame(spark: SparkSession, out_dir: str) -> DataFrame:
    """The shard work-list from the manifest (NOT a directory
    listing — stale files from an older, wider export must not leak
    into a read), one shard per partition."""
    manifest = spark.read.parquet(os.path.join(out_dir, "_manifest"))
    shards = manifest.select("shard").distinct()
    n = shards.count()
    return manifest.repartition(max(int(n), 1), "shard")


def read_bin_shards(
    spark: SparkSession, out_dir: str
) -> DataFrame:
    """Read an :func:`export_bin_shards` directory back as a
    DataFrame — ``(shard, seq_index, seq_id, n_tokens, n_supervised,
    tokens, loss_mask)`` with ``loss_mask`` NULL when the export
    carried none. The round-trip inverse the export's pytest drives:
    read output must equal the packed frame the export consumed,
    masks bit-exact. Shards are listed from the ``_manifest`` (never
    a directory listing — stale files from an older export with
    more shards must not resurface), one task per shard, each task
    reading only its own files: parallel, nothing on the driver."""
    schema = (
        "shard int, seq_index bigint, seq_id bigint,"
        " n_tokens bigint, n_supervised bigint,"
        " tokens array<bigint>, loss_mask array<boolean>"
    )

    def _read(batches):
        for pdf in batches:
            for k in pdf["shard"].tolist():
                base = os.path.join(out_dir, f"shard_{int(k):05d}")
                code, has_mask, lens, ids, nsup, tok_ptrs, msk_ptrs \
                    = _parse_idx(base + ".idx")
                np_dtype, _ = _DTYPES[code]
                toks = np.fromfile(base + ".bin", dtype=np_dtype)
                mraw = (
                    np.fromfile(base + ".msk", dtype="u1")
                    if has_mask
                    else None
                )
                rows = []
                pos = 0
                for i in range(len(lens)):
                    ln = int(lens[i])
                    t = toks[pos : pos + ln].astype("int64").tolist()
                    pos += ln
                    if has_mask:
                        mp = int(msk_ptrs[i])
                        nb = (ln + 7) // 8
                        bits = np.unpackbits(
                            mraw[mp : mp + nb], bitorder="little"
                        )[:ln]
                        m = bits.astype(bool).tolist()
                    else:
                        m = None
                    rows.append(
                        (
                            int(k),
                            i,
                            int(ids[i]),
                            ln,
                            int(nsup[i]),
                            t,
                            m,
                        )
                    )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "shard", "seq_index", "seq_id", "n_tokens",
                        "n_supervised", "tokens", "loss_mask",
                    ],
                )

    return _shard_frame(spark, out_dir).mapInPandas(_read, schema)


def verify_bin_shards(
    spark: SparkSession, out_dir: str
) -> DataFrame:
    """Integrity check for a binary shard set — the
    :func:`~topn_spark.operators.pipeline.verify_shards` contract at
    the BYTE level: re-parse every ``.idx``, recount sequences and
    tokens, re-checksum the ``.bin``/``.msk`` streams, re-derive the
    offset tables from the lengths, and compare everything against
    the stored ``_manifest``. Returns one row per shard with the
    stored and actual numbers and ``ok``; a torn file, a truncated
    stream, a stale index, or a missing shard shows up here as
    ``ok = false`` (missing/corrupt files report NULL actuals), not
    as a silent short epoch at training time. One task per shard,
    file-local work only."""
    schema = (
        _MANIFEST_SCHEMA
        + ", n_seqs_actual bigint, n_tokens_actual bigint,"
        " n_supervised_actual bigint, bin_bytes_actual bigint,"
        " msk_bytes_actual bigint, bin_crc32_actual bigint,"
        " msk_crc32_actual bigint, ok boolean"
    )

    def _verify(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                base = os.path.join(
                    out_dir, f"shard_{int(r.shard):05d}"
                )
                stored = {
                    "shard": int(r.shard),
                    "n_seqs": int(r.n_seqs),
                    "n_tokens": int(r.n_tokens),
                    "n_supervised": int(r.n_supervised),
                    "dtype": r.dtype,
                    "bin_bytes": int(r.bin_bytes),
                    "msk_bytes": int(r.msk_bytes),
                    "bin_crc32": int(r.bin_crc32),
                    "msk_crc32": int(r.msk_crc32),
                }
                try:
                    code, has_mask, lens, ids, nsup, tok_ptrs, \
                        msk_ptrs = _parse_idx(base + ".idx")
                    itemsize = 2 if code == 2 else 4
                    with open(base + ".bin", "rb") as f:
                        braw = f.read()
                    exp_tok = np.zeros(len(lens), dtype="<u8")
                    np.cumsum(
                        lens[:-1].astype("<u8") * itemsize,
                        out=exp_tok[1:],
                    )
                    consistent = (
                        np.array_equal(tok_ptrs, exp_tok)
                        and len(braw)
                        == int(lens.astype("int64").sum()) * itemsize
                    )
                    actual = {
                        "n_seqs_actual": len(lens),
                        "n_tokens_actual": int(
                            lens.astype("int64").sum()
                        ),
                        "n_supervised_actual": int(
                            nsup.astype("int64").sum()
                        ),
                        "bin_bytes_actual": len(braw),
                        "bin_crc32_actual": zlib.crc32(braw),
                    }
                    if has_mask:
                        with open(base + ".msk", "rb") as f:
                            mraw = f.read()
                        exp_msk = np.zeros(len(lens), dtype="<u8")
                        np.cumsum(
                            (lens[:-1].astype("<u8") + 7) // 8,
                            out=exp_msk[1:],
                        )
                        consistent = consistent and np.array_equal(
                            msk_ptrs, exp_msk
                        )
                        actual["msk_bytes_actual"] = len(mraw)
                        actual["msk_crc32_actual"] = zlib.crc32(mraw)
                    else:
                        actual["msk_bytes_actual"] = 0
                        actual["msk_crc32_actual"] = 0
                    ok = consistent and all(
                        stored[k] == actual[k + "_actual"]
                        for k in (
                            "n_seqs", "n_tokens", "n_supervised",
                            "bin_bytes", "msk_bytes", "bin_crc32",
                            "msk_crc32",
                        )
                    )
                except (OSError, IOError):
                    actual = {
                        k: None
                        for k in (
                            "n_seqs_actual", "n_tokens_actual",
                            "n_supervised_actual",
                            "bin_bytes_actual", "msk_bytes_actual",
                            "bin_crc32_actual", "msk_crc32_actual",
                        )
                    }
                    ok = False
                out.append({**stored, **actual, "ok": bool(ok)})
            if out:
                yield pd.DataFrame(out)

    return _shard_frame(spark, out_dir).mapInPandas(_verify, schema)


# ------------------------------------------------------------------
# epoch ordering
# ------------------------------------------------------------------

def export_epoch_order(
    spark: SparkSession,
    out_dir: str,
    epoch: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-epoch consumption order for a binary shard
    set — the dataloader's missing half (trainers that memory-map
    ``.bin``/``.idx`` shards consume a PERMUTATION per epoch; doing
    the shuffle at training time either costs a global index the
    size of the corpus or silently repeats the storage order): the
    standard two-level shuffle, materialized — a salted-md5
    permutation OF the shards (epoch-level macro order) and, inside
    every shard, a salted-md5 permutation of its sequences, written
    as one little-endian uint32 file ``shard_<k>.ep<epoch>`` per
    shard (the trainer walks shards in macro order and within each
    shard follows its permutation file — two O(1)-memory reads, no
    corpus-sized index anywhere). Same epoch+salt → byte-identical
    files; a new epoch is a fresh permutation (the
    :func:`~topn_spark.operators.pipeline.epoch_shuffle` contract,
    at the binary layer). Returns the epoch manifest —
    ``(shard, shard_pos, n_seqs)`` — also written to
    ``_epoch_<epoch>`` parquet beside the shards.

    Scale shape: one task per shard (the verify shape), each writing
    its own permutation file from its ``.idx`` sequence count —
    nothing data-sized on the driver; the macro shard order is
    model-sized arithmetic over the manifest."""
    import hashlib

    man = (
        spark.read.parquet(os.path.join(out_dir, "_manifest"))
        .select("shard", "n_seqs")
        .collect()
    )
    def shard_key(k):
        return hashlib.md5(
            f"{int(epoch)}:{int(k)}{salt}".encode()
        ).hexdigest()

    order = sorted(
        (int(r["shard"]) for r in man), key=lambda k: (shard_key(k), k)
    )
    pos = {k: i for i, k in enumerate(order)}
    rows = [
        (int(r["shard"]), pos[int(r["shard"])], int(r["n_seqs"]))
        for r in man
    ]
    schema = "shard int, shard_pos int, n_seqs bigint"
    work = spark.createDataFrame(rows, schema).repartition(
        max(len(rows), 1), "shard"
    )

    def _write(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                k, n = int(r.shard), int(r.n_seqs)
                keys = [
                    (
                        hashlib.md5(
                            f"{int(epoch)}:{k}:{i}{salt}".encode()
                        ).hexdigest(),
                        i,
                    )
                    for i in range(n)
                ]
                keys.sort()
                perm = np.asarray(
                    [i for _, i in keys], dtype="<u4"
                )
                with open(
                    os.path.join(
                        out_dir,
                        f"shard_{k:05d}.ep{int(epoch):04d}",
                    ),
                    "wb",
                ) as f:
                    f.write(perm.tobytes())
                out.append(
                    {
                        "shard": k,
                        "shard_pos": int(r.shard_pos),
                        "n_seqs": n,
                    }
                )
            if out:
                yield pd.DataFrame(out)

    got = work.mapInPandas(_write, schema).collect()
    ep = spark.createDataFrame(got, schema)
    ep.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, f"_epoch_{int(epoch):04d}")
    )
    return spark.createDataFrame(got, schema).orderBy("shard")


def read_epoch_order(
    spark: SparkSession, out_dir: str, epoch: int
) -> DataFrame:
    """Read an :func:`export_epoch_order` epoch back as
    ``(shard, shard_pos, position, seq_index)`` — ``position`` is
    the within-shard visit order, ``seq_index`` the stored sequence
    it dereferences (the :func:`read_bin_shards` index). One task
    per shard; the round-trip pytest checks each file is a true
    permutation of ``0..n_seqs-1``."""
    schema = (
        "shard int, shard_pos int, position bigint, seq_index bigint"
    )
    ep = spark.read.parquet(
        os.path.join(out_dir, f"_epoch_{int(epoch):04d}")
    )
    work = ep.repartition(
        max(ep.count(), 1), "shard"
    )

    def _read(batches):
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                k = int(r.shard)
                perm = np.fromfile(
                    os.path.join(
                        out_dir,
                        f"shard_{k:05d}.ep{int(epoch):04d}",
                    ),
                    dtype="<u4",
                )
                yield pd.DataFrame(
                    {
                        "shard": k,
                        "shard_pos": int(r.shard_pos),
                        "position": np.arange(
                            len(perm), dtype="int64"
                        ),
                        "seq_index": perm.astype("int64"),
                    }
                )

    return work.mapInPandas(_read, schema)
