"""Dedup operator tests: exact, MinHash-LSH recall on planted
near-duplicates, SimHash, n-gram Jaccard, connected components."""

from __future__ import annotations

import random

import pytest

from topn_spark.operators.dedup import (
    connected_components,
    dedup_exact,
    minhash_dedup_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)

WORDS = (
    "data spark table row scan filter join group sort merge hash key value "
    "batch stream window agg query column line part order fast slow big "
    "small the a of and to is"
).split()


def _doc(rng, n=60):
    return " ".join(rng.choice(WORDS) for _ in range(n))


def _perturb(rng, text, k=3):
    toks = text.split()
    for _ in range(k):
        toks[rng.randrange(len(toks))] = rng.choice(WORDS)
    return " ".join(toks)


@pytest.fixture(scope="module")
def planted(spark):
    """100 random docs + 10 planted near-dup pairs (id, id+1000)."""
    rng = random.Random(42)
    rows = [(i, _doc(rng)) for i in range(100)]
    rows += [(1000 + i, _perturb(rng, rows[i][1])) for i in range(10)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_exact_keeps_first(spark):
    df = spark.createDataFrame(
        [(3, "aaa"), (1, "aaa"), (2, "bbb")], "doc_id long, text string"
    )
    out = dedup_exact(df, subset=["text"], tiebreak=["doc_id"])
    assert {(r.doc_id, r.text) for r in out.collect()} == {(1, "aaa"), (2, "bbb")}


def test_minhash_signature_shape(planted):
    sigs = minhash_signatures(planted, num_hashes=16).collect()
    assert all(r.sig is not None and len(r.sig) == 16 for r in sigs)


def test_minhash_short_doc_null_sig(spark):
    df = spark.createDataFrame([(1, "one two")], "doc_id long, text string")
    assert minhash_signatures(df, shingle_size=3).collect()[0].sig is None


def test_minhash_lsh_recovers_planted_pairs(planted):
    # r=2, b=32 banding: P(candidate) ≈ 1-(1-s²)^32 → ~0.99 at s=0.6,
    # the Jaccard of a 3-of-60-token edit. threshold below s minus the
    # 64-hash estimator's noise floor.
    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_dedup_pairs(
            planted, threshold=0.4, num_hashes=64, bands=32
        ).collect()
    }
    planted_pairs = {(i, 1000 + i) for i in range(10)}
    recovered = planted_pairs & pairs
    assert len(recovered) >= 8  # ≥80% recall on 3-of-60-token edits
    # precision: no wildly-dissimilar random pair should appear
    false_pos = {p for p in pairs - planted_pairs if p[0] < 100 and p[1] < 100}
    assert len(false_pos) <= 2


def test_simhash_near_dups_close(planted, spark):
    from pyspark.sql import functions as F

    sh = simhash(planted)
    a = sh.alias("a")
    b = sh.alias("b")
    joined = (
        a.join(b, F.col("a.doc_id") + 1000 == F.col("b.doc_id"))
        .select(
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("ham")
        )
        .collect()
    )
    assert joined and all(r.ham <= 16 for r in joined)  # near-dups close in Hamming space


def test_ngram_jaccard_pairs(planted):
    pairs = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(planted, threshold=0.5).collect()
    }
    planted_pairs = {(i, 1000 + i) for i in range(10)}
    assert len(planted_pairs & pairs) >= 8


def test_connected_components(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (3, 4)],
        "id_a long, id_b long",
    )
    comp = {
        (r.id, r.component) for r in connected_components(pairs).collect()
    }
    assert comp == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_dedup_against_drops_known_content(spark):
    from topn_spark.operators.dedup import dedup_against

    base = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "beta")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(10, "beta"), (11, "gamma"), (12, "alpha"), (13, "delta")],
        "doc_id long, text string",
    )
    out = dedup_against(new, base, subset=["text"])
    assert sorted(r.doc_id for r in out.collect()) == [11, 13]
    # schema passthrough
    assert out.columns == new.columns


def test_dedup_against_infers_common_columns(spark):
    from topn_spark.operators.dedup import dedup_against

    base = spark.createDataFrame([("x", 1)], "text string, extra int")
    new = spark.createDataFrame([("x", "a"), ("y", "b")], "text string, other string")
    # only `text` is common -> dedup on text
    out = dedup_against(new, base)
    assert [r.text for r in out.collect()] == ["y"]


def test_lsh_pairs_md5_matches_python_mirror(spark):
    """The portable md5 MinHash family: pair set and estimated
    Jaccard reproduce EXACTLY from an independent pure-Python mirror
    of the documented hash recipe (the cross-engine property the
    family exists for)."""
    import hashlib
    from itertools import combinations

    from topn_spark.operators.dedup import lsh_pairs_md5

    base = ("the cat sat on the mat near the red door today "
            "and watched the quiet street below").split()
    rows = [
        (1, " ".join(base)),
        (2, " ".join(base[:10] + ["changed"] + base[11:])),  # near dup
        (3, " ".join(w + "x" for w in base)),  # disjoint shingles
        (4, "too short"),  # < 3 tokens of shingle -> no signature
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.est_j
        for r in lsh_pairs_md5(df, threshold=0.5).collect()
    }

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    def sig(text):
        toks = __import__("re").findall("[a-z0-9]+", text.lower())
        sh = [" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)]
        if not sh:
            return None
        return [min(md5(f"{j}:{s}") for s in sh) for j in range(8)]

    sigs = {i: sig(t) for i, t in rows}
    want = {}
    for a, b in combinations(sorted(sigs), 2):
        sa, sb = sigs[a], sigs[b]
        if sa is None or sb is None:
            continue
        banded = any(
            md5(sa[2 * k] + sa[2 * k + 1]) == md5(sb[2 * k] + sb[2 * k + 1])
            for k in range(4)
        )
        est = sum(x == y for x, y in zip(sa, sb)) / 8.0
        if banded and est >= 0.5:
            want[(a, b)] = est
    assert got == want and (1, 2) in got
    # invalid band split is a config error, not silent truncation
    import pytest

    with pytest.raises(ValueError, match="divide"):
        lsh_pairs_md5(df, num_hashes=8, bands=3)


def test_neardup_keep_best(spark):
    """Each component keeps its highest-score member (ties: lowest
    id); singletons always survive; component column is the min
    member id."""
    from topn_spark.operators.dedup import neardup_keep_best

    docs = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9), (4, 7), (9, 2)],
        "doc_id long, score long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )
    out = {
        r.doc_id: r.component
        for r in neardup_keep_best(docs, pairs, "score").collect()
    }
    # component {1,2,3}: 2 and 3 tie at 9 -> lowest id 2 survives
    assert out == {2: 1, 4: 4, 9: 9}


def test_contamination_report_per_benchmark(spark):
    """contamination_report: a gram shared by two benchmarks counts
    against EACH; clean benchmarks report zeros; min_hits
    thresholds; bad params fail loudly."""
    import pytest

    from topn_spark.operators.dedup import contamination_report

    shared = "alpha beta gamma delta epsilon"
    bench = spark.createDataFrame(
        [
            ("t1", shared + " one two"),
            ("t2", shared + " six seven"),
            ("t3", "nothing here overlaps with anything at all"),
        ],
        "benchmark string, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "intro " + shared + " outro"),   # hits t1 AND t2
            (2, "totally clean words only here"),
        ],
        "doc_id long, text string",
    )
    rep = {
        r.benchmark: (
            r.n_eval_grams, r.n_contaminated_docs, r.n_contam_instances
        )
        for r in contamination_report(train, bench, n=5).collect()
    }
    # each benchmark has 3 distinct 5-grams; the shared 5-gram is
    # gram #1 of both t1 and t2, quoted once by doc 1
    assert rep["t1"] == (3, 1, 1)
    assert rep["t2"] == (3, 1, 1)
    assert rep["t3"] == (3, 0, 0)
    high = {
        r.benchmark: r.n_contaminated_docs
        for r in contamination_report(
            train, bench, n=5, min_hits=2
        ).collect()
    }
    assert high == {"t1": 0, "t2": 0, "t3": 0}
    with pytest.raises(ValueError, match="n must be"):
        contamination_report(train, bench, n=0)
    with pytest.raises(ValueError, match="min_hits"):
        contamination_report(train, bench, min_hits=0)


def test_dup_cluster_report(spark):
    from topn_spark.operators.dedup import dup_cluster_report

    df = spark.createDataFrame(
        [("a",), ("a",), ("a",), ("b",), ("b",), ("c",), (None,)],
        "text string",
    )
    rows = {
        r.cluster_size: r for r in dup_cluster_report(df).collect()
    }
    # c alone + the NULL document (its own observable cluster)
    assert rows[1].n_clusters == 2 and rows[1].n_excess == 0
    assert rows[2].n_clusters == 1 and rows[2].n_docs == 2
    assert rows[3].n_clusters == 1 and rows[3].n_excess == 2
    assert set(rows) == {1, 2, 3}


def test_dup_cluster_report_all_unique(spark):
    from topn_spark.operators.dedup import dup_cluster_report

    df = spark.createDataFrame(
        [("x",), ("y",)], "text string"
    )
    [r] = dup_cluster_report(df).collect()
    assert (
        r.cluster_size == 1
        and r.n_clusters == 2
        and r.n_docs == 2
        and r.n_excess == 0
    )


def test_dedup_lineage_maps_to_keeper(spark):
    from topn_spark.operators.dedup import dedup_lineage

    df = spark.createDataFrame(
        [(1, "a"), (5, "a"), (3, "a"), (2, "b"), (4, None)],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in dedup_lineage(df).collect()}
    assert out[1].keeper_id == 1 and out[1].is_keeper
    assert out[5].keeper_id == 1 and not out[5].is_keeper
    assert out[3].cluster_size == 3
    assert out[2].keeper_id == 2 and out[2].cluster_size == 1
    # NULL text: its own observable cluster, never dropped
    assert out[4].keeper_id == 4 and out[4].is_keeper


def test_dedup_lineage_agrees_with_dedup_exact(spark):
    from topn_spark.operators.dedup import dedup_exact, dedup_lineage

    df = spark.createDataFrame(
        [(i, f"t{i % 7}") for i in range(40)],
        "doc_id bigint, text string",
    )
    kept = {
        r.doc_id
        for r in dedup_exact(
            df, subset=["text"], tiebreak=["doc_id"]
        ).collect()
    }
    lineage = dedup_lineage(df).collect()
    assert {r.keeper_id for r in lineage} == kept
    assert sum(r.is_keeper for r in lineage) == len(kept)


def test_memorization_risk_counts_df1_grams(spark):
    from topn_spark.operators.dedup import memorization_risk

    df = spark.createDataFrame(
        [
            (1, "a b c d e"),       # grams: abc, bcd, cde
            (2, "a b c x y"),       # shares abc with doc 1
            (3, "a b c x y"),       # exact copy of doc 2
            (4, "q r"),             # too short for n=3
        ],
        "doc_id bigint, text string",
    )
    out = {
        r.doc_id: r for r in memorization_risk(df, n=3).collect()
    }
    # doc 1: 'a b c' shared with 2/3 -> 2 of 3 grams unique
    assert out[1].n_grams == 3 and out[1].n_unique == 2
    assert out[1].uniq_ratio == 0.666667
    # exact copies: every gram df >= 2 -> zero unique
    assert out[2].n_unique == 0 and out[3].n_unique == 0
    # short doc observable with NULL ratio
    assert out[4].n_grams == 0 and out[4].uniq_ratio is None


def test_memorization_risk_within_doc_repeat_not_unique_loss(spark):
    from topn_spark.operators.dedup import memorization_risk

    # a gram repeated WITHIN one doc is still df=1 (distinct per
    # doc): document frequency, not raw frequency
    df = spark.createDataFrame(
        [(1, "p q r p q r")], "doc_id bigint, text string"
    )
    [r] = memorization_risk(df, n=3).collect()
    # gram stream p-q-r, q-r-p, r-p-q, p-q-r -> 3 DISTINCT grams,
    # each in exactly one document
    assert r.n_grams == 3 and r.n_unique == 3


def test_split_doc_pairs_matches_chunk_overlap(spark):
    from topn_spark.operators.dedup import split_doc_pairs

    words = [f"w{i}" for i in range(30)]
    rows = [
        (1, " ".join(words[:16])),     # tail-8 = w8..w15
        (2, " ".join(words[8:24])),    # head-8 = w8..w15 -> pair
        (3, " ".join(words[16:30])),   # head-8 = w16..w23 -> pair w/2
        (4, "short doc"),              # < k tokens: no keys
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    pairs = {
        (r.id_a, r.id_b) for r in split_doc_pairs(df, k=8).collect()
    }
    assert pairs == {(1, 2), (2, 3)}


def test_split_doc_pairs_excludes_self_chorus(spark):
    from topn_spark.operators.dedup import split_doc_pairs

    # head == tail within ONE doc (repeated chorus): no self pair
    chorus = " ".join(f"c{i}" for i in range(8))
    df = spark.createDataFrame(
        [(1, f"{chorus} middle words here {chorus}")],
        "doc_id bigint, text string",
    )
    assert split_doc_pairs(df, k=8).count() == 0
