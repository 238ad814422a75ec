"""End-to-end corpus pipeline: the operators must COMPOSE — quality
filter → language gate → exact dedup → near-dup removal →
decontamination → PII redaction → chunking → split assignment →
sequence packing, on real test data, with conservation invariants at
every stage. This is the shape a production 100 TB corpus build takes;
every stage here is a Catalyst plan (no collect between stages)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from topn_spark.catalog import load_table
from topn_spark.operators.dedup import dedup_exact, minhash_dedup_pairs
from topn_spark.operators.pipeline import (
    assign_split,
    chunk_documents,
    contamination_check,
    pack_sequences,
    scrub_pii,
)
from topn_spark.operators.textstats import add_quality, add_token_stats


def test_full_corpus_pipeline(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    n0 = docs.count()

    # 1. quality + language gate (map-only)
    kept = add_quality(docs).where(F.col("quality_keep")).where(
        F.col("lang").isin("en", "de", "fr", "es")
    )
    n1 = kept.count()
    assert 0 < n1 <= n0

    # 2. exact dedup (hash groupBy, deterministic keeper)
    deduped = dedup_exact(kept, subset=["text"], tiebreak=["doc_id"])
    n2 = deduped.count()
    assert 0 < n2 <= n1
    assert deduped.select("text").distinct().count() == n2

    # 3. near-dup removal: drop the higher doc_id of each pair
    pairs = minhash_dedup_pairs(
        deduped, "doc_id", "text", threshold=0.8
    ).select(F.col("id_b").alias("doc_id")).distinct()
    survivors = deduped.join(pairs, "doc_id", "left_anti")
    n3 = survivors.count()
    assert 0 < n3 <= n2

    # 4. decontamination vs a held-out benchmark slice
    bench = docs.where(F.col("doc_id") % 101 == 0)
    contaminated = contamination_check(
        survivors.where(F.col("doc_id") % 101 != 0), bench, n=5
    ).select("doc_id")
    clean = survivors.join(contaminated, "doc_id", "left_anti")
    n4 = clean.count()
    assert 0 < n4 <= n3

    # 5. redact + chunk + token counts (map-only chain)
    prepared = clean.withColumn("text", scrub_pii("text"))
    chunks = chunk_documents(prepared, size=200, overlap=50)
    assert chunks.where(F.col("chunk_len") > 200).count() == 0
    chunks = add_token_stats(chunks, "chunk")

    # 6. deterministic split + packing per (split) partition
    final = assign_split(chunks.withColumn(
        "chunk_id", F.concat_ws("-", "doc_id", "chunk_idx")
    ), "chunk_id")
    packed = pack_sequences(
        final, "n_tokens", budget=512, by=("split",), order_col="chunk_id"
    )

    # conservation: every chunk assigned exactly one split and one bin
    total = packed.count()
    assert total == chunks.count()
    by_split = dict(
        packed.groupBy("split").count().collect()
    )
    assert set(by_split) <= {"train", "val", "test"} and sum(
        by_split.values()
    ) == total
    # bins respect the budget for fully-packed bins (every bin's
    # preceding cumulative fits below the next boundary by construction)
    worst = (
        packed.groupBy("split", "bin_id")
        .agg(F.sum("n_tokens").alias("tok"))
        .agg(F.max("tok"))
        .first()[0]
    )
    max_chunk = packed.agg(F.max("n_tokens")).first()[0]
    assert worst <= 512 + max_chunk  # a bin overflows by < one document


def test_multilingual_gate_pipeline_spec(spark, tmp_path):
    """examples/multilingual_gate_pipeline.json runs end-to-end
    through the REAL registered plugins: LangId annotates, each
    language passes only its own route, the benchmark-quoting page
    drops at Decontaminate, and the small domain repeats at
    EpochMixture."""
    import json

    from topn_spark.operators.langid import save_langid, train_langid
    from topn_spark.pipelines import run_pipeline

    seeds = spark.createDataFrame(
        [
            ("en", "the quick brown fox jumps over the lazy dog and"
             " the children read their books in the quiet library"),
            ("de", "der schnelle braune fuchs springt ueber den"
             " faulen hund und die kinder lesen ihre buecher in der"
             " stillen bibliothek"),
        ],
        "lang string, text string",
    )
    lang_model = str(tmp_path / "mg_lang")
    save_langid(*train_langid(seeds), lang_model)

    quote = (
        "the quick brown fox jumps over the lazy dog near the"
        " river bank"
    )
    ev_path = str(tmp_path / "mg_eval")
    spark.createDataFrame(
        [(1, quote + " today indeed")], "qid long, text string"
    ).write.parquet(ev_path)

    clean_en = (
        "the quick brown fox jumps over the lazy dog and then "
        "the dog jumps over the quick brown fox again today " * 3
    ).strip()
    german = (
        "der schnelle braune fuchs springt ueber den faulen hund "
        "und die kinder lesen ihre buecher in der bibliothek " * 3
    ).strip()
    src_path = str(tmp_path / "mg_src")
    spark.createDataFrame(
        [
            (1, clean_en),
            (2, "intro " + quote + " outro " + clean_en),
            (3, german),
        ],
        "doc_id long, text string",
    ).write.parquet(src_path)

    spec = json.load(open("examples/multilingual_gate_pipeline.json"))
    out_path = str(tmp_path / "mg_out")
    routes = json.dumps({
        "en": {"min_sentences": None},
        "de": {
            "min_sentences": None,
            "min_stop_hits": 3,
            "stopwords": ["der", "die", "das", "und", "mit", "von"],
        },
    })
    out = run_pipeline(
        spark,
        spec,
        substitutions={
            "input": src_path,
            "langModel": lang_model,
            "routes": routes,
            "lmPaths": "{}",
            "evalSet": ev_path,
            "weights": "en:0.5,de:0.5",
            "totalTokens": "400",
            "maxEpochs": "4",
            "out": out_path,
        },
    )
    got = {
        r.doc_id: (r.lang_pred, r.n_epochs)
        for r in spark.read.parquet(out_path).collect()
    }
    # doc 2 (benchmark quote) dropped; doc 1 (en) and doc 3 (de)
    # survive and repeat toward their 200-token quotas
    assert sorted(got) == [1, 3]
    assert got[1][0] == "en" and got[3][0] == "de"
    assert got[1][1] >= 2 and got[3][1] >= 2


def test_tag_then_mix_pipeline_specs(spark, tmp_path):
    """examples/tag_corpus_pipeline.json + mix_release_pipeline.json
    run end-to-end through the real registered plugins: one tagging
    pass writes the attribute sidecar, then TWO different releases
    are mixed from rule strings alone — no signal recomputation —
    with the PII release gate masking on the way out."""
    import json

    from topn_spark.pipelines import run_pipeline

    src_path = str(tmp_path / "tm_src")
    spark.createDataFrame(
        [
            (1, "the data of that value pipeline runs with care"
                " and detail contact me at bob@example.com"),
            (2, "# # tags of # doom with # spam and the rest"),
            (3, "call 555 0199 ext 42 room 101 now ok then fine"),
        ],
        "doc_id long, text string",
    ).write.parquet(src_path)

    attrs_path = str(tmp_path / "tm_attrs")
    tag_spec = json.load(open("examples/tag_corpus_pipeline.json"))
    run_pipeline(
        spark,
        tag_spec,
        substitutions={
            "input": src_path,
            "taggers": "word_count,stop_hits,digit_char_frac,"
                       "hash_word_ratio",
            "attrsOut": attrs_path,
        },
    )
    sidecar = spark.read.parquet(attrs_path)
    assert set(sidecar.columns) == {
        "doc_id", "word_count", "stop_hits", "digit_char_frac",
        "hash_word_ratio",
    }

    mix_spec = json.load(open("examples/mix_release_pipeline.json"))
    out1 = str(tmp_path / "tm_rel1")
    run_pipeline(
        spark,
        mix_spec,
        substitutions={
            "input": src_path,
            "attrs": attrs_path,
            "rules": json.dumps({
                "include": [[["stop_hits", ">=", 2]]],
                "exclude": [[["hash_word_ratio", ">", 0.1]]],
            }),
            "out": out1,
        },
    )
    rel1 = {r.doc_id: r.text for r in spark.read.parquet(out1).collect()}
    # doc 2 excluded by hash spam, doc 3 fails the stopword include;
    # doc 1 survives with its email masked by the release gate
    assert sorted(rel1) == [1]
    assert "bob@example.com" not in rel1[1]
    assert "EMAIL" in rel1[1]

    # a second release from the SAME sidecar, looser rules
    out2 = str(tmp_path / "tm_rel2")
    run_pipeline(
        spark,
        mix_spec,
        substitutions={
            "input": src_path,
            "attrs": attrs_path,
            "rules": json.dumps({
                "exclude": [[["digit_char_frac", ">", 0.5]]],
            }),
            "out": out2,
        },
    )
    assert sorted(
        r.doc_id for r in spark.read.parquet(out2).collect()
    ) == [1, 2, 3]


def test_sft_pipeline_spec(spark, tmp_path):
    """examples/sft_pipeline.json end-to-end: malformed conversations
    drop at the QC gate, survivors render to ChatML with an aligned
    per-token loss mask (LossMask), pack WITH the mask riding through
    (PackMasked), and land as manifest-verified shards whose token
    AND supervised-token totals reconcile — the trainable-shard
    property."""
    import json

    from pyspark.sql import functions as F

    from topn_spark.pipelines import run_pipeline

    src_path = str(tmp_path / "sft_src")
    spark.createDataFrame(
        [
            (1, [("system", "be helpful"), ("user", "hello there"),
                 ("assistant", "hi how can i help")]),
            (2, [("user", "what is spark"), ("assistant",
                 "a distributed engine"), ("user", "thanks"),
                 ("assistant", "welcome")]),
            (3, [("user", "broken"), ("user", "double send"),
                 ("assistant", "ok")]),
        ],
        "conv_id long, "
        "messages array<struct<role:string,content:string>>",
    ).write.parquet(src_path)

    spec = json.load(open("examples/sft_pipeline.json"))
    out_path = str(tmp_path / "sft_shards")
    # the binary branch needs a vocabulary artifact: build it from a
    # prefix run (src -> qc -> mask -> pack) over the same spec — the
    # realistic flow, where the tokenizer/vocab is trained on the
    # corpus before the export pipeline runs
    from topn_spark.operators.binshard import save_vocab, token_vocab

    prefix_names = {"src", "qc", "mask", "pack"}
    prefix = {
        **spec,
        "stages": [
            s for s in spec["stages"] if s["name"] in prefix_names
        ],
        "connections": [
            c
            for c in spec["connections"]
            if c["from"] in prefix_names and c["to"] in prefix_names
        ],
    }
    pre = run_pipeline(
        spark,
        prefix,
        substitutions={"input": src_path, "seqLen": "16"},
    )
    vocab_path = str(tmp_path / "sft_vocab")
    save_vocab(token_vocab(pre["pack"], specials=("<pad>",)), vocab_path)

    bin_out = str(tmp_path / "sft_bin")
    staged = run_pipeline(
        spark,
        spec,
        substitutions={
            "input": src_path,
            "seqLen": "16",
            "nShards": "2",
            "out": out_path,
            "vocab": vocab_path,
            "binOut": bin_out,
        },
    )
    assert [r.conv_id for r in staged["qc"].orderBy("conv_id").collect()] == [1, 2]
    rendered = staged["mask"].orderBy("conv_id").collect()
    assert rendered[0].text.startswith("<|im_start|>system")
    # LossMask emits packable aligned arrays
    for r in rendered:
        assert len(r.tokens) == len(r.loss_mask)
        assert 0 < r.n_supervised < len(r.tokens)
    n_docs = len(rendered)
    n_tok = sum(len(r.tokens) for r in rendered) + n_docs  # + EOS each
    n_sup = sum(r.n_supervised for r in rendered) + n_docs  # EOS learned
    packed = spark.read.parquet(out_path)
    assert packed.agg(F.sum("n_tokens")).collect()[0][0] == n_tok
    assert packed.agg(F.sum("n_supervised")).collect()[0][0] == n_sup
    # every packed sequence keeps tokens and mask aligned
    for r in packed.collect():
        assert len(r.tokens) == len(r.loss_mask)
    manifest = spark.read.parquet(f"{out_path}/_manifest")
    assert manifest.agg(F.sum("n_tokens")).collect()[0][0] == n_tok
    # binary branch: the .bin/.idx/.msk export reconciles to the
    # same totals and reads back with the mask bit-exact
    from topn_spark.operators.binshard import (
        read_bin_shards,
        verify_bin_shards,
    )

    back = read_bin_shards(spark, bin_out)
    assert back.agg(F.sum("n_tokens")).collect()[0][0] == n_tok
    assert back.agg(F.sum("n_supervised")).collect()[0][0] == n_sup
    enc_cols = ["seq_id", "n_tokens", "n_supervised", "loss_mask"]
    assert staged["encode"].select(*enc_cols).exceptAll(
        back.select(*enc_cols)
    ).count() == 0
    assert all(
        r.ok for r in verify_bin_shards(spark, bin_out).collect()
    )


def test_preference_pipeline_example_end_to_end(spark, tmp_path):
    """examples/preference_pipeline.json: one scored-samples table
    fans out to the DPO pair frame (margin-gated) AND the unpaired
    KTO frame, both landing as parquet."""
    import json

    from topn_spark.pipelines import run_pipeline

    src_path = str(tmp_path / "pref_src")
    spark.createDataFrame(
        [
            (1, 10, 1.0, "weak", "mA"), (1, 11, 9.0, "strong", "mB"),
            (2, 20, 5.0, "only", "mA"),
            (3, 30, 4.0, "a", "mA"), (3, 31, 4.5, "b", "mB"),
            (4, 40, None, "unscored", "mA"), (4, 41, 3.0, "scored", "mB"),
        ],
        "prompt_id long, sample_id long, score double,"
        " response string, model string",
    ).write.parquet(src_path)

    spec = json.load(open("examples/preference_pipeline.json"))
    # binary branch needs a vocabulary: build it from a prefix run
    # over the pair frame's tokenized responses (the realistic flow —
    # the tokenizer artifact exists before the export runs)
    from topn_spark.operators.binshard import save_vocab, token_vocab

    prefix_names = {"src", "pairs", "pairTok"}
    prefix = {
        **spec,
        "stages": [
            s for s in spec["stages"] if s["name"] in prefix_names
        ],
        "connections": [
            c
            for c in spec["connections"]
            if c["from"] in prefix_names and c["to"] in prefix_names
        ],
    }
    pre = run_pipeline(
        spark, prefix,
        substitutions={"input": src_path, "minGap": "1"},
    )
    vocab_path = str(tmp_path / "pref_vocab")
    both = pre["pairTok"].select(
        F.explode(
            F.array(
                F.col("chosen_tokens"), F.col("rejected_tokens")
            )
        ).alias("tokens")
    )
    save_vocab(token_vocab(both), vocab_path)

    pref_bin = str(tmp_path / "pref_bin")
    staged = run_pipeline(
        spark,
        spec,
        substitutions={
            "input": src_path,
            "minGap": "1",
            "pairsOut": str(tmp_path / "pairs"),
            "ktoOut": str(tmp_path / "kto"),
            "eloOut": str(tmp_path / "elo"),
            "vocab": vocab_path,
            "prefBinOut": pref_bin,
            "nShards": "2",
        },
    )
    pairs = {r.prompt_id: r for r in staged["pairs"].collect()}
    # only prompt 1 has >= 2 samples AND gap >= 1
    assert set(pairs) == {1}
    assert pairs[1].chosen_response == "strong"
    kto = {
        (r.prompt_id, r.sample_id): r for r in staged["kto"].collect()
    }
    assert len(kto) == 7  # every sample labeled, none dropped
    assert kto[(1, 11)].label is True and kto[(1, 10)].label is False
    # arena branch: WinRate matrix -> Bradley-Terry ratings landed
    wr = {(r.model_a, r.model_b): r for r in staged["winrate"].collect()}
    # shared scored prompts for (mA, mB): 1 and 3, mB wins both
    assert wr[("mA", "mB")].n_prompts == 2
    assert wr[("mA", "mB")].wins_b == 2
    elo = {
        r.model: r
        for r in spark.read.parquet(str(tmp_path / "elo")).collect()
    }
    assert elo["mB"].rating > elo["mA"].rating
    assert all(r.converged for r in elo.values())
    assert kto[(4, 40)].label is None  # unscored observable
    # both sinks landed readable parquet
    assert spark.read.parquet(str(tmp_path / "pairs")).count() == 1
    assert spark.read.parquet(str(tmp_path / "kto")).count() == 7
    # binary branch: the paired shards read back as the id-encoded
    # pair frame, adjacency invariant verified
    from topn_spark.operators.binshard import (
        read_preference_shards,
        verify_preference_shards,
    )

    enc = staged["encodeRejected"]
    back = read_preference_shards(spark, pref_bin)
    cols = ["pair_id", "chosen_tokens", "rejected_tokens"]
    assert enc.select(*cols).exceptAll(
        back.select(*cols)
    ).count() == 0
    assert back.count() == 1  # one surviving pair
    assert all(
        r.ok and r.pairing_ok
        for r in verify_preference_shards(spark, pref_bin).collect()
    )


def test_multimodal_pipeline_spec(spark, tmp_path):
    """examples/multimodal_pipeline.json end-to-end: the dangling
    asset-reference gate drops the broken conversation BEFORE any
    export, packing preserves the placeholder->asset binding, and
    the binary sink lands .bin/.idx/.msk/.ast shards that read back
    equal to the packed frame on all streams."""
    import json

    from topn_spark.operators.binshard import (
        read_bin_shards,
        save_vocab,
        token_vocab,
        verify_bin_shards,
    )
    from topn_spark.pipelines import run_pipeline

    src_path = str(tmp_path / "mm_src")
    img = "<|image|>"
    spark.createDataFrame(
        [
            (1, [img, "describe", "this", "scene"],
             [False, False, True, True], [100]),
            (2, ["compare", img, "with", img, "please"],
             [True, False, True, False, True], [101, 102]),
            (3, ["text", "only", "conversation"],
             [True, True, True], []),
            (4, [img, "dangling", "reference"],
             [False, True, True], [999]),
        ],
        "conv_id long, tokens array<string>,"
        " loss_mask array<boolean>, asset_ids array<bigint>",
    ).write.parquet(src_path)
    assets_path = str(tmp_path / "mm_assets")
    spark.createDataFrame(
        [(100,), (101,), (102,), (103,)], "asset_id long"
    ).write.parquet(assets_path)

    spec = json.load(open("examples/multimodal_pipeline.json"))
    prefix_names = {"src", "assetRegistry", "validate", "gate"}
    prefix = {
        **spec,
        "stages": [
            s for s in spec["stages"] if s["name"] in prefix_names
        ],
        "connections": [
            c
            for c in spec["connections"]
            if c["from"] in prefix_names and c["to"] in prefix_names
        ],
    }
    pre = run_pipeline(
        spark, prefix,
        substitutions={"input": src_path, "assets": assets_path},
    )
    # the gate: conv 4 references an unregistered asset and drops
    assert sorted(
        r.conv_id for r in pre["gate"].collect()
    ) == [1, 2, 3]
    assert {
        r.conv_id: r.n_missing for r in pre["validate"].collect()
    } == {1: 0, 2: 0, 3: 0, 4: 1}
    vocab_path = str(tmp_path / "mm_vocab")
    save_vocab(
        token_vocab(
            pre["gate"].select("tokens"),
            specials=("<|endoftext|>",),
        ),
        vocab_path,
    )
    bin_out = str(tmp_path / "mm_bin")
    staged = run_pipeline(
        spark,
        spec,
        substitutions={
            "input": src_path,
            "assets": assets_path,
            "seqLen": "6",
            "nShards": "2",
            "vocab": vocab_path,
            "binOut": bin_out,
        },
    )
    packed = staged["encode"]
    back = read_bin_shards(spark, bin_out)
    cols = ["seq_id", "tokens", "loss_mask", "asset_ids"]
    assert packed.select(*cols).exceptAll(
        back.select(*cols)
    ).count() == 0
    assert back.count() == packed.count()
    # the binding survived: every exported asset ref is registered,
    # and each original conversation's refs appear in order
    all_refs = [
        a
        for r in back.orderBy("seq_id").collect()
        for a in (r.asset_ids or [])
    ]
    assert sorted(all_refs) == [100, 101, 102]
    assert all(
        r.ok for r in verify_bin_shards(spark, bin_out).collect()
    )


def test_validate_assets_stable_id_join(spark, tmp_path):
    """ValidateAssets keys its count re-join on the user-supplied
    idField (stable across plan re-evaluation) — content-identical
    rows with different ids still get THEIR OWN n_missing; a
    monotonically_increasing_id keyed join could renumber between
    branches and attach the verdict to the wrong rows. Missing
    idField in the schema is a collected deploy-time failure."""
    import pytest

    from topn_spark.errors import ValidationError
    from topn_spark.pipelines import compile_pipeline, run_pipeline

    a_path = str(tmp_path / "va_rows")
    spark.createDataFrame(
        [(1, [7]), (2, [7]), (3, [8]), (4, [8])],
        "cid long, refs array<bigint>",
    ).write.parquet(a_path)
    reg_path = str(tmp_path / "va_reg")
    spark.createDataFrame([(7,)], "asset_id long").write.parquet(
        reg_path
    )

    def spec(props):
        return {
            "stages": [
                {
                    "name": "a",
                    "type": "batchsource",
                    "plugin": "File",
                    "properties": {"path": a_path},
                },
                {
                    "name": "reg",
                    "type": "batchsource",
                    "plugin": "File",
                    "properties": {"path": reg_path},
                },
                {
                    "name": "v",
                    "type": "batchjoiner",
                    "plugin": "ValidateAssets",
                    "properties": props,
                },
            ],
            "connections": [
                {"from": "a", "to": "v"},
                {"from": "reg", "to": "v"},
            ],
        }

    out = run_pipeline(
        spark,
        spec({"refsField": "refs", "idField": "cid"}),
    )["v"]
    got = {r.cid: (r.n_missing, r.assets_ok) for r in out.collect()}
    # rows 3/4 are content-identical yet each carries its own verdict
    assert got == {
        1: (0, True), 2: (0, True), 3: (1, False), 4: (1, False)
    }
    with pytest.raises(ValidationError, match="idField"):
        compile_pipeline(
            spark,
            spec({"refsField": "refs", "idField": "nope"}),
        )
