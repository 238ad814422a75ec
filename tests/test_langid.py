"""Char-n-gram Naive-Bayes language ID tests (operators/langid.py)."""

from __future__ import annotations

import pytest

from topn_spark.operators.langid import (
    char_ngrams,
    langid_model_table,
    langid_score,
    load_langid,
    save_langid,
    train_langid,
)

TRAIN = {
    "en": "the quick brown fox jumps over the lazy dog and the small"
    " children read their books in the quiet library",
    "de": "der schnelle braune fuchs springt über den faulen hund und"
    " die kleinen kinder lesen ihre bücher in der stillen bibliothek",
    "fr": "le rapide renard brun saute par dessus le chien paresseux"
    " et les petits enfants lisent leurs livres dans la bibliothèque"
    " tranquille",
    "es": "el rápido zorro marrón salta sobre el perro perezoso y los"
    " niños pequeños leen sus libros en la biblioteca tranquila",
    "ru": "быстрая коричневая лиса прыгает через ленивую собаку а"
    " маленькие дети читают свои книги в тихой библиотеке",
    "el": "η γρήγορη καφέ αλεπού πηδάει πάνω από το τεμπέλικο σκυλί"
    " και τα μικρά παιδιά διαβάζουν τα βιβλία τους στην ήσυχη"
    " βιβλιοθήκη",
}

HELD = {
    "en": "a gentle rain falls on the green hills while the old"
    " fisherman waits by the river with his wooden boat",
    "de": "ein sanfter regen fällt auf die grünen hügel während der"
    " alte fischer mit seinem holzboot am fluss wartet",
    "fr": "une pluie douce tombe sur les collines vertes pendant que"
    " le vieux pêcheur attend près de la rivière avec son bateau en"
    " bois",
    "es": "una lluvia suave cae sobre las colinas verdes mientras el"
    " viejo pescador espera junto al río con su barco de madera",
    "ru": "тихий дождь падает на зелёные холмы пока старый рыбак ждёт"
    " у реки со своей деревянной лодкой",
    "el": "μια απαλή βροχή πέφτει στους πράσινους λόφους ενώ ο γέρος"
    " ψαράς περιμένει δίπλα στο ποτάμι με την ξύλινη βάρκα του",
}


def _train_df(spark):
    return spark.createDataFrame(
        [(lang, text) for lang, text in TRAIN.items()],
        "lang string, text string",
    )


def test_char_ngrams_extraction(spark):
    df = spark.createDataFrame([("AbC",), (None,)], "text string")
    rows = df.select(
        char_ngrams("text", 1, 3).alias("g")
    ).collect()
    # lowercased; all sizes 1..3 concatenated in size order
    assert rows[0].g == ["a", "b", "c", "ab", "bc", "abc"]
    assert rows[1].g == []  # NULL text -> empty stream
    with pytest.raises(ValueError, match="n-gram range"):
        df.select(char_ngrams("text", 3, 2))


def test_heldout_accuracy_across_scripts(spark):
    """6/6 on held-out text in six languages across three scripts —
    the capability the retired stopword-argmax heuristic lacked."""
    counts, classes = train_langid(_train_df(spark))
    model, meta = langid_model_table(counts, classes)
    docs = spark.createDataFrame(
        [
            (i, HELD[lang])
            for i, lang in enumerate(sorted(HELD))
        ],
        "doc_id long, text string",
    )
    out = langid_score(docs, model, meta).collect()
    truth = sorted(HELD)
    assert {r.doc_id: r.lang_pred for r in out} == {
        i: truth[i] for i in range(len(truth))
    }
    # scores carry the prior: all finite negative log-probs
    for r in out:
        for lang in meta["langs"]:
            assert getattr(r, f"score_{lang}") < 0


def test_empty_and_null_text_predict_und(spark):
    counts, classes = train_langid(_train_df(spark))
    model, meta = langid_model_table(counts, classes)
    docs = spark.createDataFrame(
        [(1, ""), (2, None), (3, HELD["en"])],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in langid_score(docs, model, meta).collect()
    }
    assert out[1].lang_pred == "und" and out[1].n_grams == 0
    assert out[2].lang_pred == "und" and out[2].n_grams == 0
    assert out[3].lang_pred == "en"
    # und rows carry NULL scores (no model opinion), not fake zeros
    assert out[1].score_en is None


def test_unsegmented_scripts_need_no_whitespace(spark):
    """Char n-grams classify whitespace-free text: Han vs Kana with
    zero spaces — exactly where every word-rule heuristic breaks."""
    train = spark.createDataFrame(
        [
            ("zh", "我们在图书馆里安静地读书孩子们喜欢这些故事"),
            ("ja", "としょかんでしずかにほんをよみますこどもたちはものがたりがすきです"),
        ],
        "lang string, text string",
    )
    counts, classes = train_langid(train)
    model, meta = langid_model_table(counts, classes)
    docs = spark.createDataFrame(
        [(1, "孩子们在安静的图书馆读故事"), (2, "こどもはしずかなとしょかんでものがたりをよむ")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.lang_pred
        for r in langid_score(docs, model, meta).collect()
    }
    assert out == {1: "zh", 2: "ja"}


def test_min_count_pruning_keeps_model_usable(spark):
    counts, classes = train_langid(_train_df(spark), min_count=2)
    full, _ = train_langid(_train_df(spark), min_count=1)
    assert counts.count() < full.count()  # tail actually pruned
    model, meta = langid_model_table(counts, classes)
    docs = spark.createDataFrame(
        [(1, HELD["ru"]), (2, HELD["de"])],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.lang_pred
        for r in langid_score(docs, model, meta).collect()
    }
    assert out == {1: "ru", 2: "de"}


def test_artifact_roundtrip_and_garbage_rejection(spark, tmp_path):
    counts, classes = train_langid(_train_df(spark))
    path = str(tmp_path / "langid_model")
    save_langid(counts, classes, path, n_lo=1, n_hi=3)
    model, meta = load_langid(spark, path)
    assert (meta["n_lo"], meta["n_hi"]) == (1, 3)
    assert meta["langs"] == sorted(TRAIN)
    docs = spark.createDataFrame(
        [(1, HELD["el"])], "doc_id long, text string"
    )
    out = langid_score(
        docs, model, meta, n_lo=meta["n_lo"], n_hi=meta["n_hi"]
    ).collect()
    assert out[0].lang_pred == "el"
    # in-memory and artifact-backed scores agree to float noise
    m2, meta2 = langid_model_table(counts, classes)
    ref = langid_score(docs, m2, meta2).collect()
    assert (
        abs(out[0].score_el - ref[0].score_el)
        <= 1e-9 * abs(ref[0].score_el)
    )
    # wrong path fails loudly, not with a join of garbage
    bad = str(tmp_path / "not_a_model")
    spark.createDataFrame([(1,)], "x long").write.parquet(
        f"{bad}/counts"
    )
    spark.createDataFrame([(1,)], "x long").write.parquet(
        f"{bad}/classes"
    )
    spark.createDataFrame([(1,)], "x long").write.parquet(
        f"{bad}/meta"
    )
    with pytest.raises(ValueError, match="langid artifact"):
        load_langid(spark, bad)


def test_empty_training_set_raises(spark):
    empty = spark.createDataFrame([], "lang string, text string")
    counts, classes = train_langid(empty)
    with pytest.raises(ValueError, match="no languages"):
        langid_model_table(counts, classes)


def test_update_langid_fold_equals_retrain(spark, tmp_path):
    """Incremental artifact fold == retrain on the union, exactly
    (count tables are additive); new languages appear; in-place
    update refused."""
    import pytest

    from topn_spark.operators.langid import (
        load_langid,
        save_langid,
        train_langid,
        update_langid,
    )

    a = spark.createDataFrame(
        [("en", "the cat sat on the mat"),
         ("de", "die katze sass auf der matte")],
        "lang string, text string",
    )
    b = spark.createDataFrame(
        [("en", "the dog ran to the park"),
         ("fr", "le chien court vers le parc")],
        "lang string, text string",
    )
    p_a = str(tmp_path / "m_a")
    p_ab = str(tmp_path / "m_ab")
    p_union = str(tmp_path / "m_union")
    save_langid(*train_langid(a), p_a)
    update_langid(spark, p_a, b, p_ab)
    save_langid(*train_langid(a.unionByName(b)), p_union)

    def table(path):
        c = spark.read.parquet(f"{path}/counts")
        return {
            (r.lang, r.gram): r.c for r in c.collect()
        }, {
            (r.lang, r.total, r.n_docs)
            for r in spark.read.parquet(f"{path}/classes").collect()
        }

    assert table(p_ab) == table(p_union)
    model, meta = load_langid(spark, p_ab)
    assert set(meta["langs"]) == {"en", "de", "fr"}
    with pytest.raises(ValueError, match="fresh path"):
        update_langid(spark, p_ab, b, p_ab)
