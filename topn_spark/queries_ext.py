"""LLM-data-pipeline extension queries (north star per BASELINE.json).

Registered into the same QUERIES registry as the SURVEY §2.5 catalog.
Hash-matchable ops carry a DuckDB oracle (dedup accounting, token
stats, quality features, language-ID heuristic, fingerprints,
portable md5-MinHash); float-valued similarity ops are rows-only here
and tolerance-checked in tests (SURVEY.md §2.6 — float scores are
never hash-stable across engines).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from topn_spark.catalog import load_table
from topn_spark.operators import textstats
from topn_spark.operators.similarity import cosine_topk
from topn_spark.operators.textstats import (
    LANG_MARKERS,
    fingerprint,
    language_scores,
)
from topn_spark.queries import query

_TOKS_DUCK = "regexp_extract_all(lower(text), '[a-z0-9]+')"


@query(
    "x01_dedup_first",
    """SELECT MD5(text) AS h, MIN(doc_id) AS keep_id, COUNT(*) AS n
FROM documents GROUP BY MD5(text) ORDER BY h ASC""",
    doc="Exact dedup: canonical keeper (min doc_id) per content hash",
)
def x01_dedup_first(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5("text").alias("h"))
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("h")
    )


@query(
    "x02_token_stats",
    f"""SELECT doc_id, CAST(len({_TOKS_DUCK}) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct({_TOKS_DUCK})) AS BIGINT) AS n_uniq_tokens,
       ROUND(CAST(len(list_distinct({_TOKS_DUCK})) AS DOUBLE)
             / NULLIF(CAST(len({_TOKS_DUCK}) AS DOUBLE), 0), 6) AS ttr
FROM documents ORDER BY doc_id ASC LIMIT 200""",
    doc="Token counting: whitespace/alnum tokenizer, type-token ratio",
)
def x02_token_stats(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        textstats.add_token_stats(docs)
        .select("doc_id", "n_tokens", "n_uniq_tokens", "ttr")
        .orderBy("doc_id")
        .limit(200)
    )


@query(
    "x03_quality",
    f"""WITH q AS (
  SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS n_chars_m,
    ROUND(CAST(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
          / NULLIF(CAST(LENGTH(text) AS DOUBLE), 0), 6) AS alpha_ratio,
    ROUND(CAST(LENGTH(regexp_replace(text, '[^ ]', '', 'g')) AS DOUBLE)
          / NULLIF(CAST(LENGTH(text) AS DOUBLE), 0), 6) AS space_ratio,
    ROUND(CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[^ ]', '', 'g')) AS DOUBLE)
          / NULLIF(CAST(len({_TOKS_DUCK}) AS DOUBLE), 0), 6) AS mean_word_len,
    len({_TOKS_DUCK}) AS _nt
  FROM documents)
SELECT doc_id, n_chars_m, alpha_ratio, space_ratio, mean_word_len,
       (_nt >= 10 AND alpha_ratio >= 0.6
        AND mean_word_len BETWEEN 2.0 AND 12.0) AS quality_keep
FROM q ORDER BY doc_id ASC LIMIT 200""",
    doc="Quality scoring: length/alpha/space ratios + keep flag",
)
def x03_quality(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        textstats.add_quality(docs)
        .select(
            "doc_id",
            "n_chars_m",
            "alpha_ratio",
            "space_ratio",
            "mean_word_len",
            "quality_keep",
        )
        .orderBy("doc_id")
        .limit(200)
    )


def _lang_hits_duck(words: tuple[str, ...]) -> str:
    lits = ", ".join(f"'{w}'" for w in words)
    return (
        f"CAST(len(list_filter({_TOKS_DUCK}, t -> t IN ({lits}))) AS BIGINT)"
    )


@query(
    "x04_langid",
    f"""WITH h AS (
  SELECT doc_id,
    {_lang_hits_duck(LANG_MARKERS["en"])} AS hits_en,
    {_lang_hits_duck(LANG_MARKERS["de"])} AS hits_de,
    {_lang_hits_duck(LANG_MARKERS["fr"])} AS hits_fr,
    {_lang_hits_duck(LANG_MARKERS["es"])} AS hits_es
  FROM documents)
SELECT doc_id, hits_en, hits_de, hits_fr, hits_es,
  CASE WHEN greatest(hits_en, hits_de, hits_fr, hits_es) <= 0 THEN 'und'
       WHEN hits_en = greatest(hits_en, hits_de, hits_fr, hits_es) THEN 'en'
       WHEN hits_de = greatest(hits_en, hits_de, hits_fr, hits_es) THEN 'de'
       WHEN hits_fr = greatest(hits_en, hits_de, hits_fr, hits_es) THEN 'fr'
       ELSE 'es' END AS lang_pred
FROM h ORDER BY doc_id ASC LIMIT 200""",
    doc="Language-ID heuristic: per-language marker-token hit argmax",
)
def x04_langid(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    scores = language_scores("text")
    langs = list(scores)
    df = docs.select(
        "doc_id", *[scores[x].alias(f"hits_{x}") for x in langs]
    )
    best = F.greatest(*[F.col(f"hits_{x}") for x in langs])
    pred = F.when(best <= 0, "und")
    for lang in langs:
        pred = pred.when(F.col(f"hits_{lang}") == best, lang)
    return df.withColumn("lang_pred", pred).orderBy("doc_id").limit(200)


@query(
    "x05_fingerprint",
    """SELECT source, COUNT(*) AS n,
       COUNT(DISTINCT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))) AS n_uniq
FROM documents GROUP BY source ORDER BY source ASC""",
    doc="Document fingerprinting: normalized-content md5 per source",
)
def x05_fingerprint(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(fingerprint("text")).alias("n_uniq"),
        )
        .orderBy("source")
    )


@query(
    "x06_embed_stats",
    """SELECT label, COUNT(*) AS n, CAST(MIN(len(embedding)) AS BIGINT) AS mind,
       CAST(MAX(len(embedding)) AS BIGINT) AS maxd
FROM embeddings GROUP BY label ORDER BY label ASC""",
    doc="Embedding table profile: per-label counts + dim invariants",
)
def x06_embed_stats(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.size("embedding")).cast("bigint").alias("mind"),
            F.max(F.size("embedding")).cast("bigint").alias("maxd"),
        )
        .orderBy("label")
    )


@query(
    "x07_cosine_topk",
    None,  # float scores are not hash-stable cross-engine (SURVEY §2.6);
    # tolerance-checked vs NumPy in tests/test_similarity.py
    doc="Brute-force cosine top-10 vs the vec_id=0 embedding "
    "(TakeOrderedAndProject per-partition heap)",
    tol_oracle="""WITH q AS (
  SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       ROUND(CAST(list_cosine_similarity(embedding, qe) AS DOUBLE), 4)
         AS score_r
FROM embeddings, q
ORDER BY list_cosine_similarity(embedding, qe) DESC, vec_id ASC
LIMIT 10""",
    tolerance=1e-3,
    tol_keys=("vec_id",),
)
def x07_cosine_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [
        float(x)
        for x in emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    out = cosine_topk(emb, qvec, k=10)
    return out.select("vec_id", F.round("score", 4).alias("score_r"))


@query(
    "x09_session_windows",
    """WITH e AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
    CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
           OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER w
              > INTERVAL 10 MINUTE
         THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
), s AS (
  SELECT user_id, ts,
    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, brk
                   ROWS UNBOUNDED PRECEDING) AS sid
  FROM e)
SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS cnt
FROM s GROUP BY user_id, sid
ORDER BY user_id ASC, session_start ASC""",
    doc="Session windows (10-min gap) — Spark session_window vs a "
    "first-principles lag/gap-break SQL oracle; batch mode of the "
    "streaming operator (replay equivalence in tests/test_streaming.py)",
)
def x09_session_windows(spark, sf_dir):
    from topn_spark.streaming import session_counts

    events = load_table(spark, sf_dir, "events")
    return (
        session_counts(events, gap="10 minutes", group_cols=["user_id"])
        .select("user_id", "session_start", "cnt")
        .orderBy("user_id", "session_start")
    )


@query(
    "x10_asof_join",
    """WITH b AS (
  SELECT o_custkey, o_orderdate, arg_max(o_totalprice, o_orderkey) AS last_price
  FROM orders GROUP BY o_custkey, o_orderdate
), p AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type = 'purchase')
SELECT p.event_id, b.o_orderdate AS last_order_date, b.last_price
FROM p ASOF LEFT JOIN b ON p.user_id = b.o_custkey AND p.ts >= b.o_orderdate
ORDER BY p.event_id ASC""",
    doc="Keyed as-of join (union-window technique, one shuffle on the "
    "key — the 100 TB path) vs DuckDB's native ASOF JOIN",
)
def x10_asof_join(spark, sf_dir):
    from topn_spark.operators.asof import asof_join

    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    probe = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    build = (
        orders.groupBy("o_custkey", "o_orderdate")
        .agg(F.max_by("o_totalprice", "o_orderkey").alias("last_price"))
        .withColumn("last_order_date", F.col("o_orderdate"))
    )
    out = asof_join(
        probe,
        build,
        left_on="ts",
        right_on="o_orderdate",
        left_by="user_id",
        right_by="o_custkey",
        value_cols=["last_order_date", "last_price"],
    )
    return out.select("event_id", "last_order_date", "last_price").orderBy(
        "event_id"
    )


@query(
    "x11_cube",
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY GROUPING(o_orderstatus) ASC, GROUPING(o_orderpriority) ASC,
         o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""",
    doc="CUBE aggregation",
)
def x11_cube(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.grouping("o_orderstatus").alias("_g1"),
            F.grouping("o_orderpriority").alias("_g2"),
        )
        .orderBy(
            F.col("_g1").asc(),
            F.col("_g2").asc(),
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
        .select("o_orderstatus", "o_orderpriority", "cnt")
    )


@query(
    "x12_range_frame",
    """SELECT user_id, event_id,
       CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch(CAST(ts AS TIMESTAMP))
                           RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_1h
FROM events ORDER BY user_id ASC, event_id ASC LIMIT 200""",
    doc="Time-based RANGE frame: events per user in the trailing hour",
)
def x12_range_frame(spark, sf_dir):
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-3600, 0)
    )
    return (
        events.select(
            "user_id",
            "event_id",
            F.count(F.lit(1)).over(w).cast("bigint").alias("n_1h"),
        )
        .orderBy("user_id", "event_id")
        .limit(200)
    )


@query(
    "x13_ntile",
    """SELECT o_orderkey, CAST(NTILE(4) OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS quartile
FROM orders ORDER BY o_orderkey ASC LIMIT 200""",
    doc="NTILE quartiles over a GLOBAL order — planned via the "
    "value-bucketed two-phase rank (operators/topn.py::"
    "rank_low_cardinality + ntile_from_rank), not a single-task "
    "keyless window; identical results at keys x buckets parallelism",
)
def x13_ntile(spark, sf_dir):
    from topn_spark.operators.topn import (
        ntile_from_rank,
        rank_low_cardinality,
    )

    orders = load_table(spark, sf_dir, "orders")
    ranked = rank_low_cardinality(
        orders.select("o_orderkey", "o_totalprice"),
        [],
        "o_totalprice",
        ascending=False,
        tiebreak=["o_orderkey"],
        buckets=64,
    )
    return (
        ranked.select(
            "o_orderkey",
            ntile_from_rank(F.col("rank"), F.col("total"), 4)
            .cast("bigint")
            .alias("quartile"),
        )
        .orderBy("o_orderkey")
        .limit(200)
    )


@query(
    "x14_first_nth",
    """SELECT user_id, event_id,
       FIRST_VALUE(event_type) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS first_t,
       NTH_VALUE(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS second_t
FROM events ORDER BY user_id ASC, event_id ASC LIMIT 200""",
    doc="first_value / nth_value analytic windows",
)
def x14_first_nth(spark, sf_dir):
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        events.select(
            "user_id",
            "event_id",
            F.first("event_type").over(w).alias("first_t"),
            F.nth_value("event_type", 2).over(w).alias("second_t"),
        )
        .orderBy("user_id", "event_id")
        .limit(200)
    )


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "x15_pivot",
    f"""SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
       {", ".join(f"COUNT(*) FILTER (WHERE event_type = '{t}') AS {t}" for t in _EVENT_TYPES)}
FROM events GROUP BY d ORDER BY d ASC""",
    doc="Pivot: per-day counts by event type (DuckDB oracle via FILTER)",
)
def x15_pivot(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    out = (
        events.groupBy(F.col("ts").cast("date").alias("d"))
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "d",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES],
    ).orderBy("d")


@query(
    "x16_except_all",
    """SELECT c_nationkey AS k FROM customer EXCEPT ALL SELECT s_nationkey AS k FROM supplier
ORDER BY k ASC LIMIT 100""",
    doc="EXCEPT ALL (multiset difference)",
)
def x16_except_all(spark, sf_dir):
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("k")
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("k")
    )
    return customer.exceptAll(supplier).orderBy("k").limit(100)


@query(
    "x17_intersect_all",
    """SELECT c_nationkey AS k FROM customer INTERSECT ALL SELECT s_nationkey AS k FROM supplier
ORDER BY k ASC LIMIT 100""",
    doc="INTERSECT ALL (multiset intersection)",
)
def x17_intersect_all(spark, sf_dir):
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("k")
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("k")
    )
    return customer.intersectAll(supplier).orderBy("k").limit(100)


@query(
    "x18_approx_percentile",
    None,  # t-digest/GK sketches differ by engine — tolerance-checked
    # in tests/test_queries.py::test_x18_tolerance
    doc="approx_percentile p50/p95/p99 of order totals (rows-only; "
    "±2% vs exact quantiles asserted in tests)",
    tol_oracle="SELECT "
    "percentile_cont(0.50) WITHIN GROUP (ORDER BY o_totalprice) AS p50, "
    "percentile_cont(0.95) WITHIN GROUP (ORDER BY o_totalprice) AS p95, "
    "percentile_cont(0.99) WITHIN GROUP (ORDER BY o_totalprice) AS p99 "
    "FROM orders",
    tolerance=0.02,
)
def x18_approx_percentile(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(10000)).alias("p50"),
        F.approx_percentile("o_totalprice", F.lit(0.95), F.lit(10000)).alias("p95"),
        F.approx_percentile("o_totalprice", F.lit(0.99), F.lit(10000)).alias("p99"),
    )


def _portable_minhash_pairs(df, id_col="doc_id", text_col="text"):
    """The x19 portable-md5 MinHash-LSH pair pipeline over ANY
    (id, text) frame: 3-word shingles, 8 seeded-md5 min-hashes,
    4 bands x 2 rows, bucket self-join, signature-estimated Jaccard
    >= 0.5. Shared by x19 (documents) and z86 (rendered
    conversations) so both modalities prove the SAME shape."""
    from topn_spark.operators.dedup import ensure_parallelism

    toks = f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"
    # tokens bound once via transform(array(...)) — an inlined toks
    # inside the slice lambda re-runs the regexp per position (r14)
    sh = (
        f"transform(array({toks}), t -> if(size(t) >= 3,"
        f" transform(sequence(1, size(t) - 2),"
        f" i -> concat_ws(' ', slice(t, i, 3))), array()))[0]"
    )
    exploded = ensure_parallelism(df.select(id_col, text_col)).select(
        id_col, F.explode(F.expr(sh)).alias("_s")
    )
    # Four consumers read sig (both band-join sides + both similarity
    # sides); persist so the tokenize/shingle/hash pipeline runs once.
    sig = exploded.groupBy(id_col).agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("_s")))).alias(f"m{j}")
            for j in range(8)
        ]
    ).persist()
    bands = sig.select(
        id_col,
        F.posexplode(
            F.array(
                *[
                    F.md5(F.concat(F.col(f"m{2 * b}"), F.col(f"m{2 * b + 1}")))
                    for b in range(4)
                ]
            )
        ).alias("b", "h"),
    )
    cand = (
        bands.alias("a")
        .join(
            bands.alias("c"),
            (F.col("a.b") == F.col("c.b"))
            & (F.col("a.h") == F.col("c.h"))
            & (F.col(f"a.{id_col}") < F.col(f"c.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"c.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    sa = sig.select(
        F.col(id_col).alias("id_a"), *[F.col(f"m{j}").alias(f"a{j}") for j in range(8)]
    )
    sb = sig.select(
        F.col(id_col).alias("id_b"), *[F.col(f"m{j}").alias(f"b{j}") for j in range(8)]
    )
    matches = sum(
        F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0)
        for j in range(8)
    )
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("_m", matches)
        .where(F.col("_m") >= 4)
        .select("id_a", "id_b", (F.col("_m") / 8.0).alias("est_j"))
        .orderBy("id_a", "id_b")
    )


@query(
    "x19_lsh_neardup_pairs",
    """WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
), sh AS (
  SELECT doc_id, unnest(
    CASE WHEN len(t) >= 3
      THEN [array_to_string(t[i:i+2], ' ') for i in generate_series(1, len(t)-2)]
      ELSE [] END) AS s
  FROM toks
), sig AS (
  SELECT doc_id,
    min(md5('0:' || s)) AS m0, min(md5('1:' || s)) AS m1,
    min(md5('2:' || s)) AS m2, min(md5('3:' || s)) AS m3,
    min(md5('4:' || s)) AS m4, min(md5('5:' || s)) AS m5,
    min(md5('6:' || s)) AS m6, min(md5('7:' || s)) AS m7
  FROM sh GROUP BY doc_id
), bands AS (
  SELECT doc_id, b, h FROM sig, LATERAL (VALUES
    (0, md5(m0 || m1)), (1, md5(m2 || m3)),
    (2, md5(m4 || m5)), (3, md5(m6 || m7))) AS v(b, h)
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
  FROM bands a JOIN bands c ON a.b = c.b AND a.h = c.h AND a.doc_id < c.doc_id
)
SELECT cand.id_a, cand.id_b,
  ((CASE WHEN sa.m0 = sb.m0 THEN 1 ELSE 0 END) + (CASE WHEN sa.m1 = sb.m1 THEN 1 ELSE 0 END)
 + (CASE WHEN sa.m2 = sb.m2 THEN 1 ELSE 0 END) + (CASE WHEN sa.m3 = sb.m3 THEN 1 ELSE 0 END)
 + (CASE WHEN sa.m4 = sb.m4 THEN 1 ELSE 0 END) + (CASE WHEN sa.m5 = sb.m5 THEN 1 ELSE 0 END)
 + (CASE WHEN sa.m6 = sb.m6 THEN 1 ELSE 0 END) + (CASE WHEN sa.m7 = sb.m7 THEN 1 ELSE 0 END)
  ) / 8.0 AS est_j
FROM cand JOIN sig sa ON cand.id_a = sa.doc_id JOIN sig sb ON cand.id_b = sb.doc_id
WHERE ((CASE WHEN sa.m0 = sb.m0 THEN 1 ELSE 0 END) + (CASE WHEN sa.m1 = sb.m1 THEN 1 ELSE 0 END)
 + (CASE WHEN sa.m2 = sb.m2 THEN 1 ELSE 0 END) + (CASE WHEN sa.m3 = sb.m3 THEN 1 ELSE 0 END)
 + (CASE WHEN sa.m4 = sb.m4 THEN 1 ELSE 0 END) + (CASE WHEN sa.m5 = sb.m5 THEN 1 ELSE 0 END)
 + (CASE WHEN sa.m6 = sb.m6 THEN 1 ELSE 0 END) + (CASE WHEN sa.m7 = sb.m7 THEN 1 ELSE 0 END)) >= 4
ORDER BY id_a ASC, id_b ASC""",
    doc="MinHash-LSH near-dup pipeline end-to-end WITH an oracle: "
    "portable md5 signature family (8 hashes), 4 bands x 2 rows, "
    "bucket self-join, signature-estimated Jaccard >= 0.5. The "
    "production path (xxhash64, operators/dedup.py) is identical in "
    "shape; this query proves the pipeline cross-engine.",
)
def x19_lsh_neardup_pairs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return _portable_minhash_pairs(docs)


@query(
    "x20_predicates",
    """SELECT o_orderkey,
       o_orderpriority IN ('1-URGENT', '2-HIGH') AS urgent,
       o_orderstatus LIKE 'O%' AS open_like,
       o_totalprice BETWEEN 100000 AND 200000 AS mid,
       o_orderstatus IS NOT DISTINCT FROM 'F' AS is_f
FROM orders
WHERE o_custkey % 10 = 3
ORDER BY o_orderkey ASC LIMIT 200""",
    doc="Predicate surface: IN, LIKE, BETWEEN, null-safe equality "
    "(<=> / IS NOT DISTINCT FROM dialect pair)",
)
def x20_predicates(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.where(F.col("o_custkey") % 10 == 3)
        .select(
            "o_orderkey",
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("urgent"),
            F.col("o_orderstatus").like("O%").alias("open_like"),
            F.col("o_totalprice").between(100000, 200000).alias("mid"),
            F.col("o_orderstatus").eqNullSafe("F").alias("is_f"),
        )
        .orderBy("o_orderkey")
        .limit(200)
    )


@query(
    "x21_string_fns2",
    """SELECT doc_id,
       regexp_extract(text, '([a-z]+)', 1) AS first_word,
       LENGTH(regexp_replace(text, '[aeiou]', '', 'g')) AS n_consonant_chars,
       split_part(text, ' ', 2) AS second_token,
       LPAD(CAST(doc_id AS VARCHAR), 8, '0') AS padded,
       REVERSE(SUBSTR(text, 1, 10)) AS rev10,
       REPLACE(SUBSTR(text, 1, 20), ' ', '_') AS snake
FROM documents ORDER BY doc_id ASC LIMIT 200""",
    doc="Extended string functions (regexp_extract/replace, split, "
    "lpad, reverse, replace; DuckDB 'g' flag + split_part dialect)",
)
def x21_string_fns2(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
            F.length(F.regexp_replace("text", "[aeiou]", "")).alias(
                "n_consonant_chars"
            ),
            F.element_at(F.split("text", " "), 2).alias("second_token"),
            F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded"),
            F.reverse(F.substring("text", 1, 10)).alias("rev10"),
            F.replace(
                F.substring("text", 1, 20), F.lit(" "), F.lit("_")
            ).alias("snake"),
        )
        .orderBy("doc_id")
        .limit(200)
    )


@query(
    "x22_datetime_fns2",
    """SELECT o_orderkey,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS BIGINT) AS days_to_y2k,
       CAST(o_orderdate AS DATE) + 30 AS plus30,
       CAST(EXTRACT(dow FROM o_orderdate) AS BIGINT) AS dow,
       CAST(EXTRACT(doy FROM o_orderdate) AS BIGINT) AS doy,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
FROM orders ORDER BY o_orderkey ASC LIMIT 200""",
    doc="Datetime arithmetic: datediff, date_add, dayofweek (0-based "
    "dialect alignment), dayofyear, epoch seconds",
)
def x22_datetime_fns2(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            F.datediff(
                F.lit("2000-01-01").cast("date"),
                F.col("o_orderdate").cast("date"),
            )
            .cast("bigint")
            .alias("days_to_y2k"),
            F.date_add(F.col("o_orderdate").cast("date"), 30).alias("plus30"),
            # Spark dayofweek is 1=Sunday..7; DuckDB dow is 0=Sunday..6
            (F.dayofweek("o_orderdate") - 1).cast("bigint").alias("dow"),
            F.dayofyear("o_orderdate").cast("bigint").alias("doy"),
            F.unix_timestamp("o_orderdate").alias("epoch_s"),
        )
        .orderBy("o_orderkey")
        .limit(200)
    )


@query(
    "x23_quantized_topk",
    """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
  list_sum(list_transform(list_zip(
     list_transform(e.embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)),
     list_transform(q.qe,        x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))),
   p -> p[1] * p[2])) AS dot
FROM embeddings e, q
ORDER BY dot DESC, vec_id ASC LIMIT 10""",
    doc="Similarity top-k with a FULL hash-match oracle: embeddings "
    "quantized to integers (round(x*1000)) so the dot product is "
    "exact integer math on both engines — the determinism-safe "
    "variant of cosine top-k (float scores are rows-only, x07)",
)
def x23_quantized_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [
        float(x)
        for x in emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    qq = F.array(
        *[
            F.round(F.lit(x).cast("double") * 1000).cast("bigint")
            for x in qvec
        ]
    )
    eq = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * 1000).cast("bigint"),
    )
    dot = F.aggregate(
        F.zip_with(eq, qq, lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    return (
        emb.select("vec_id", dot.alias("dot"))
        .orderBy(F.col("dot").desc(), F.col("vec_id").asc())
        .limit(10)
    )


@query(
    "x24_sliding_windows",
    """SELECT ws AS window_start, event_type, COUNT(*) AS cnt FROM (
  SELECT TIMESTAMP '1970-01-01'
         + CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 1800) * 1800 - k * 1800 AS BIGINT)
           * INTERVAL '1 second' AS ws,
         event_type
  FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) ks) t
GROUP BY ws, event_type ORDER BY ws ASC, event_type ASC LIMIT 300""",
    doc="Sliding windows (2h window / 30min slide), batch-equivalent of "
    "the streaming operator, vs a first-principles window-expansion "
    "oracle (each event belongs to window/slide = 4 windows)",
)
def x24_sliding_windows(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "2 hours", "30 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "cnt"
        )
        .orderBy("window_start", "event_type")
        .limit(300)
    )


def _simhash_contrib_duck(j: int) -> str:
    # bit j of token hash = bit (j%4) of hex nibble (1 + j//4) of md5
    return (
        f"CASE WHEN ((strpos('0123456789abcdef', substr(md5(t), {1 + j // 4}, 1)) - 1)"
        f" >> {j % 4}) & 1 = 1 THEN 1 ELSE -1 END"
    )


@query(
    "x25_simhash",
    f"""WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
  FROM documents
), bits AS (
  SELECT doc_id,
    {", ".join(f"SUM({_simhash_contrib_duck(j)}) AS s{j}" for j in range(16))}
  FROM tok GROUP BY doc_id)
SELECT doc_id,
  CAST({" + ".join(f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(16))} AS BIGINT) AS simhash16
FROM bits ORDER BY doc_id ASC LIMIT 200""",
    doc="Portable 16-bit SimHash (per-bit majority over md5-nibble token "
    "hashes) with full cross-engine oracle; production 64-bit xxhash64 "
    "path is operators/dedup.simhash",
)
def x25_simhash(spark, sf_dir):
    from topn_spark.operators.dedup import ensure_parallelism

    docs = load_table(spark, sf_dir, "documents")
    toks = "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"
    # md5 is computed ONCE per token in the aggregate's child project
    # (a Project under Aggregate is not collapse-duplicated); the 16
    # per-bit CASE expressions reference the bound column `h`. The
    # earlier form with md5 inside each of 16 sibling projections
    # cost 16x the hashing.
    tok = ensure_parallelism(docs.select("doc_id", "text")).select(
        "doc_id", F.explode(F.expr(toks)).alias("t")
    ).select("doc_id", F.md5("t").alias("h"))
    bits = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.expr(
                    f"CASE WHEN ((instr('0123456789abcdef', substr(h, {1 + j // 4}, 1)) - 1)"
                    f" >> {j % 4}) & 1 = 1 THEN 1 ELSE -1 END"
                )
            ).alias(f"s{j}")
            for j in range(16)
        ]
    )
    sim = sum(
        F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        for j in range(16)
    )
    return (
        bits.select("doc_id", sim.cast("bigint").alias("simhash16"))
        .orderBy("doc_id")
        .limit(200)
    )


@query(
    "x26_dedup_keep_rows",
    """SELECT doc_id, source, lang FROM (
  SELECT doc_id, source, lang,
         ROW_NUMBER() OVER (PARTITION BY MD5(text) ORDER BY doc_id ASC) AS rn
  FROM documents) t
WHERE rn = 1 ORDER BY doc_id ASC""",
    doc="Exact dedup keeping the first row per content hash — the "
    "row-level companion of x01's accounting (operators/dedup.dedup_exact)",
)
def x26_dedup_keep_rows(spark, sf_dir):
    from topn_spark.operators.dedup import dedup_exact

    docs = load_table(spark, sf_dir, "documents")
    return (
        dedup_exact(docs, subset=["text"], tiebreak=["doc_id"])
        .select("doc_id", "source", "lang")
        .orderBy("doc_id")
    )


@query(
    "x27_ngram_jaccard",
    """WITH t AS (
  SELECT doc_id, list_distinct(
    CASE WHEN len(tk) >= 3
      THEN [array_to_string(tk[i:i+2], ' ') for i in generate_series(1, len(tk)-2)]
      ELSE [] END) AS sh
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
        FROM documents)
), c AS (SELECT doc_id, len(sh) AS n FROM t),
inv0 AS (SELECT doc_id, unnest(sh) AS g FROM t),
gdf AS (SELECT g FROM inv0 GROUP BY g HAVING COUNT(*) <= 100),
inv AS (SELECT inv0.doc_id, inv0.g FROM inv0 JOIN gdf USING (g)),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS nc
  FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b, nc / (ca.n + cb.n - nc) AS jaccard
FROM inter JOIN c ca ON inter.id_a = ca.doc_id
           JOIN c cb ON inter.id_b = cb.doc_id
WHERE nc / (ca.n + cb.n - nc) >= 0.5
ORDER BY id_a ASC, id_b ASC""",
    doc="Exact n-gram Jaccard near-dup pairs (inverted-index self-join "
    "with the document-frequency cap that bounds bucket blowup — the "
    "cap is part of the operator's declared semantics and the oracle "
    "mirrors it) — operators/dedup.ngram_jaccard_pairs vs SQL",
)
def x27_ngram_jaccard(spark, sf_dir):
    from topn_spark.operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    return (
        ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.5, max_gram_df=100
        )
        .orderBy("id_a", "id_b")
    )


def _srp_planes(n_bits: int = 8, dim: int = 64, seed: int = 42):
    import random

    rng = random.Random(seed)
    return [
        [rng.randrange(-1000, 1001) for _ in range(dim)]
        for _ in range(n_bits)
    ]


def _x28_oracle() -> str:
    planes = _srp_planes()
    plane_rows = ", ".join(
        f"({j}, {list(p)!r})".replace("'", "") for j, p in enumerate(planes)
    )
    return f"""WITH quant AS (
  SELECT vec_id, list_transform(embedding,
         x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
  FROM embeddings
), planes(j, p) AS (VALUES {plane_rows}),
bits AS (
  SELECT q.vec_id,
    CAST(SUM(CASE WHEN list_sum(list_transform(list_zip(q.qv, pl.p),
              z -> z[1] * CAST(z[2] AS BIGINT))) > 0
         THEN CAST(1 AS BIGINT) << pl.j ELSE 0 END) AS BIGINT) AS bucket
  FROM quant q CROSS JOIN planes pl GROUP BY q.vec_id
), b AS (
  SELECT quant.vec_id, qv, bucket FROM quant JOIN bits USING (vec_id)
), pairs AS (
  SELECT a.vec_id AS id_a, c.vec_id AS id_b,
    list_sum(list_transform(list_zip(a.qv, c.qv), z -> z[1] * z[2])) AS qdot,
    list_sum(list_transform(a.qv, x -> x * x)) AS na,
    list_sum(list_transform(c.qv, x -> x * x)) AS nb
  FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id)
SELECT id_a, id_b, qdot FROM pairs
WHERE qdot > 0
  AND CAST(qdot AS DECIMAL(38,0)) * CAST(qdot AS DECIMAL(38,0)) * 10000
      >= CAST(625 AS DECIMAL(38,0)) * CAST(na AS DECIMAL(38,0)) * CAST(nb AS DECIMAL(38,0))
ORDER BY id_a ASC, id_b ASC"""


@query(
    "x28_embedding_neardup",
    None,  # replaced right below — needs _srp_planes literals
    doc="Embedding-cosine near-dup with an EXACT-arithmetic oracle: "
    "integer-quantized vectors, integer random-hyperplane LSH "
    "buckets, and the cosine>=0.25 test done as "
    "dot^2*10^4 >= 625*|a|^2*|b|^2 in DECIMAL(38,0) — no floats "
    "anywhere, hence hash-matchable",
)
def x28_embedding_neardup(spark, sf_dir):
    from topn_spark.operators.dedup import ensure_parallelism

    # the embeddings table arrives as one parquet split; the
    # per-plane integer folds below are the CPU cost — spread them
    # (guide §2.5 input skew: repartition right after the read)
    emb = ensure_parallelism(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        )
    )
    planes = _srp_planes()
    q = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * 1000).cast("bigint"),
    )
    quant = emb.select("vec_id", q.alias("qv"))
    # same per-plane integer folds, built as ONE expr string instead
    # of n_bits x dim literal Columns (~1.4 s/trial of driver py4j)
    terms = []
    for j, p in enumerate(planes):
        lits = ", ".join(f"CAST({int(v)} AS BIGINT)" for v in p)
        dot_p = (
            f"aggregate(zip_with(qv, array({lits}), (a, b) -> a * b),"
            f" CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        )
        terms.append(
            f"CASE WHEN {dot_p} > 0 THEN {1 << j} ELSE 0 END"
        )
    b = quant.withColumn(
        "bucket",
        F.expr(f"CAST(0 AS BIGINT) + {' + '.join(terms)}"),
    )
    a_ = b.alias("a")
    c_ = b.alias("c")
    dot = F.aggregate(
        F.zip_with(F.col("a.qv"), F.col("c.qv"), lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    norm2 = lambda side: F.aggregate(  # noqa: E731
        F.col(f"{side}.qv"),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v * v,
    )
    pairs = (
        a_.join(
            c_,
            (F.col("a.bucket") == F.col("c.bucket"))
            & (F.col("a.vec_id") < F.col("c.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("c.vec_id").alias("id_b"),
            dot.alias("_dot"),
            norm2("a").alias("_na"),
            norm2("c").alias("_nb"),
        )
        .where(
            (F.col("_dot") > 0)
            & (
                F.col("_dot").cast("decimal(38,0)")
                * F.col("_dot").cast("decimal(38,0)")
                * 10000
                >= F.lit(625).cast("decimal(38,0)")
                * F.col("_na").cast("decimal(38,0)")
                * F.col("_nb").cast("decimal(38,0)")
            )
        )
        .select("id_a", "id_b", "_dot")
        .withColumnRenamed("_dot", "qdot")
        .orderBy("id_a", "id_b")
    )
    return pairs


from topn_spark.queries import QUERIES as _Q  # noqa: E402

_Q["x28_embedding_neardup"] = _Q["x28_embedding_neardup"].__class__(
    name="x28_embedding_neardup",
    builder=_Q["x28_embedding_neardup"].builder,
    oracle=_x28_oracle(),
    doc=_Q["x28_embedding_neardup"].doc,
)


@query(
    "x29_explode",
    """SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
FROM documents WHERE doc_id < 20
ORDER BY doc_id ASC, tok ASC LIMIT 500""",
    doc="Explode / lateral unnest (row-expanding projection)",
)
def x29_explode(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"
    return (
        docs.where(F.col("doc_id") < 20)
        .select("doc_id", F.explode(F.expr(toks)).alias("tok"))
        .orderBy("doc_id", "tok")
        .limit(500)
    )


@query(
    "x30_unpivot",
    """SELECT l_orderkey, l_linenumber, var, val FROM (
  SELECT l_orderkey, l_linenumber, 'l_quantity' AS var, l_quantity AS val FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem) t
ORDER BY l_orderkey ASC, l_linenumber ASC, var ASC, val ASC LIMIT 300""",
    doc="Unpivot / melt (wide→long)",
)
def x30_unpivot(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_extendedprice", "l_discount"],
            "var",
            "val",
        )
        .orderBy("l_orderkey", "l_linenumber", "var", "val")
        .limit(300)
    )


def _x31_oracle() -> str:
    x19 = _Q["x19_lsh_neardup_pairs"].oracle
    return f"""WITH RECURSIVE pairs AS ({x19}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs),
nodes AS (SELECT DISTINCT src AS id FROM edges),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id)
SELECT id, MIN(r) AS component FROM reach GROUP BY id ORDER BY id ASC"""


@query(
    "x31_neardup_components",
    None,  # oracle patched below (embeds the x19 pair SQL)
    doc="Connected components over the near-dup pair graph — the "
    "iterative min-label-propagation operator vs a DuckDB recursive "
    "transitive closure. This is the dedup CLUSTERING step: "
    "component id = canonical keeper per near-dup group.",
)
def x31_neardup_components(spark, sf_dir):
    from topn_spark.operators.dedup import connected_components

    pairs = _Q["x19_lsh_neardup_pairs"].builder(spark, sf_dir)
    comp = connected_components(pairs.select("id_a", "id_b"))
    return comp.orderBy("id")


_Q["x31_neardup_components"] = _Q["x31_neardup_components"].__class__(
    name="x31_neardup_components",
    builder=_Q["x31_neardup_components"].builder,
    oracle=_x31_oracle(),
    doc=_Q["x31_neardup_components"].doc,
)


@query(
    "x32_topn_salted",
    """SELECT o_custkey, o_orderkey, o_totalprice FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders) t
WHERE rn <= 2
ORDER BY o_custkey ASC, o_totalprice DESC, o_orderkey ASC""",
    doc="Salted two-phase grouped top-N (the hot-key escape hatch, "
    "operators/topn.topn_grouped_salted) proven equal to the plain "
    "window formulation via oracle",
)
def x32_topn_salted(spark, sf_dir):
    from topn_spark.operators.topn import topn_grouped_salted

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    out = topn_grouped_salted(
        orders,
        "o_custkey",
        "o_totalprice",
        2,
        tiebreak=F.col("o_orderkey").asc(),
        salt_buckets=8,
    )
    return out.orderBy(
        "o_custkey", F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )


def _ivf_centroids(nlist: int = 8, dim: int = 64, seed: int = 7):
    import random

    rng = random.Random(seed)
    return [
        [rng.randrange(-1000, 1001) for _ in range(dim)]
        for _ in range(nlist)
    ]


def _x33_oracle() -> str:
    cents = _ivf_centroids()
    rows = ", ".join(f"({i}, {c!r})" for i, c in enumerate(cents))
    return f"""WITH cents(cid, c) AS (VALUES {rows}),
q AS (SELECT list_transform(embedding,
        x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
      FROM embeddings WHERE vec_id = 0),
quant AS (
  SELECT vec_id, list_transform(embedding,
         x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
  FROM embeddings),
scored AS (
  SELECT quant.vec_id, quant.v, cents.cid,
    list_sum(list_transform(list_zip(quant.v, cents.c),
             z -> z[1] * CAST(z[2] AS BIGINT))) AS cdot,
    ROW_NUMBER() OVER (PARTITION BY quant.vec_id
                       ORDER BY list_sum(list_transform(list_zip(quant.v, cents.c),
                                z -> z[1] * CAST(z[2] AS BIGINT))) DESC,
                                cents.cid ASC) AS rn
  FROM quant CROSS JOIN cents),
assign AS (SELECT vec_id, v, cid FROM scored WHERE rn = 1),
probe AS (
  SELECT cents.cid FROM cents, q
  ORDER BY list_sum(list_transform(list_zip(q.qv, cents.c),
           z -> z[1] * CAST(z[2] AS BIGINT))) DESC, cents.cid ASC
  LIMIT 2)
SELECT a.vec_id,
  list_sum(list_transform(list_zip(a.v, q.qv), z -> z[1] * z[2])) AS qdot
FROM assign a JOIN probe USING (cid), q
ORDER BY qdot DESC, a.vec_id ASC LIMIT 10"""


@query(
    "x33_ivf_topk",
    None,  # oracle patched below (needs centroid literals)
    doc="IVF approximate top-k with a full oracle: fixed integer "
    "centroids, integer-quantized vectors, argmax cluster assignment, "
    "probe the 2 nearest cells, exact integer dot top-10 within them "
    "— the ANN scale path (prune 1 - nprobe/nlist of the corpus), "
    "cross-engine deterministic",
)
def x33_ivf_topk(spark, sf_dir):
    from pyspark.sql import Row

    from topn_spark.operators.dedup import ensure_parallelism

    # one parquet split otherwise evaluates every centroid fold on
    # one core (guide §2.5)
    emb = ensure_parallelism(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        )
    )
    cents = _ivf_centroids()
    cents_df = spark.createDataFrame(
        [Row(cid=i, c=c) for i, c in enumerate(cents)],
        "cid int, c array<bigint>",
    )
    qv = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * 1000).cast("bigint"),
    )
    quant = emb.select("vec_id", qv.alias("v"))

    # Map-side argmax assignment: per-centroid integer dots in one
    # struct array; array_max over (d, -cid) == the window's
    # (cdot DESC, cid ASC) tiebreak — no crossJoin explode, no
    # per-vector window shuffle (was nlist x rows through an exchange).
    # one F.expr string instead of nlist x dim literal Columns: the
    # per-centroid integer fold is unchanged (bit-exact), but the
    # construction is 1 py4j call, not ~4700 (measured ~1.9 s/trial
    # of pure driver time)
    def dot_lit_sql(c):
        lits = ", ".join(f"CAST({int(x)} AS BIGINT)" for x in c)
        return (
            f"aggregate(zip_with(v, array({lits}), (a, b) -> a * b),"
            f" CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        )

    cands = F.expr(
        "array(%s)"
        % ", ".join(
            f"named_struct('d', {dot_lit_sql(c)}, 'negcid', {-i})"
            for i, c in enumerate(cents)
        )
    )
    assign = (
        quant.withColumn("_best", F.array_max(cands))
        .withColumn("cid", (-F.col("_best.negcid")).cast("int"))
        .select("vec_id", "v", "cid")
    )
    qrow = quant.where(F.col("vec_id") == 0).select(
        F.col("v").alias("qv")
    )
    probe = (
        cents_df.crossJoin(F.broadcast(qrow))
        .withColumn(
            "qcdot",
            F.aggregate(
                F.zip_with("qv", "c", lambda a, b: a * b),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ),
        )
        .orderBy(F.col("qcdot").desc(), F.col("cid").asc())
        .limit(2)
        .select("cid")
    )
    dot_q = F.aggregate(
        F.zip_with("v", "qv", lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return (
        assign.join(F.broadcast(probe), "cid")
        .crossJoin(F.broadcast(qrow))
        .withColumn("qdot", dot_q)
        .select("vec_id", "qdot")
        .orderBy(F.col("qdot").desc(), F.col("vec_id").asc())
        .limit(10)
    )


_Q["x33_ivf_topk"] = _Q["x33_ivf_topk"].__class__(
    name="x33_ivf_topk",
    builder=_Q["x33_ivf_topk"].builder,
    oracle=_x33_oracle(),
    doc=_Q["x33_ivf_topk"].doc,
)


_MH_SH_DUCK = (
    f"CASE WHEN len({_TOKS_DUCK}) >= 3 THEN "
    f"[array_to_string(t[i:i+2], ' ') for i in generate_series(1, len(t)-2)] "
    f"ELSE [] END"
)


@query(
    "x08_minhash",
    f"""WITH toks AS (
  SELECT doc_id, {_TOKS_DUCK} AS t FROM documents
), sh AS (
  SELECT doc_id,
    CASE WHEN len(t) >= 3
      THEN [array_to_string(t[i:i+2], ' ') for i in generate_series(1, len(t)-2)]
      ELSE [] END AS s
  FROM toks)
SELECT doc_id,
  list_min(list_transform(s, x -> md5('0:' || x))) AS mh0,
  list_min(list_transform(s, x -> md5('1:' || x))) AS mh1,
  list_min(list_transform(s, x -> md5('2:' || x))) AS mh2,
  list_min(list_transform(s, x -> md5('3:' || x))) AS mh3
FROM sh ORDER BY doc_id ASC LIMIT 100""",
    doc="Portable MinHash signature: lexicographic min of seeded md5 over "
    "word 3-shingles — engine-independent, hence oracle-able. The "
    "production path (xxhash64 family) is operators/dedup.py",
)
def x08_minhash(spark, sf_dir):
    # Explode-then-aggregate (see operators/dedup.minhash_signatures):
    # per-row nested transforms would re-inline the tokenizer into
    # every hash lambda (O(tokens²) regexps — measured 13 s at sf0.1
    # vs <1 s for this shape).
    docs = load_table(spark, sf_dir, "documents")
    toks = "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"
    # tokens bound once via transform(array(...)) — an inlined toks
    # inside the slice lambda re-runs the regexp per position (r14)
    sh = (
        f"transform(array({toks}), t -> if(size(t) >= 3,"
        f" transform(sequence(1, size(t) - 2),"
        f" i -> concat_ws(' ', slice(t, i, 3))), array()))[0]"
    )
    # Manual limit pushdown: the output is ORDER BY doc_id LIMIT 100
    # of a LEFT join keyed on doc_id, so the surviving ids are decided
    # by the docs side alone — hash only those 100 documents instead
    # of the corpus (Catalyst can't push a limit through join+agg).
    keep = docs.select("doc_id", "text").orderBy("doc_id").limit(100)
    exploded = keep.repartition(
        spark.sparkContext.defaultParallelism
    ).select("doc_id", F.explode(F.expr(sh)).alias("_s"))
    sig = exploded.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("_s")))).alias(
                f"mh{j}"
            )
            for j in range(4)
        ]
    )
    return (
        keep.select("doc_id")
        .join(sig, "doc_id", "left")
        .orderBy("doc_id")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Corpus-preparation pipeline ops (operators/pipeline.py)
# ---------------------------------------------------------------------------

@query(
    "x34_chunking",
    """SELECT doc_id, CAST((s - 1) // 192 AS BIGINT) AS chunk_idx,
       substr(text, CAST(s AS BIGINT), 256) AS chunk,
       CAST(length(substr(text, CAST(s AS BIGINT), 256)) AS BIGINT) AS chunk_len
FROM documents, UNNEST(range(1, greatest(length(text), 1) + 1, 192)) AS u(s)
WHERE doc_id % 5 = 0
ORDER BY doc_id ASC, chunk_idx ASC""",
    doc="Document chunking: 256-char chunks, 64 overlap (step 192), "
    "posexplode of a generated start sequence — map-only, no shuffle",
)
def x34_chunking(spark, sf_dir):
    from topn_spark.operators.pipeline import chunk_documents

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 5 == 0
    )
    return chunk_documents(docs, size=256, overlap=64).orderBy(
        "doc_id", "chunk_idx"
    )


@query(
    "x35_hash_sample",
    """SELECT source, COUNT(*) AS n_sampled,
       CAST(SUM(n_chars) AS BIGINT) AS chars,
       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '29'
GROUP BY source ORDER BY source ASC""",
    doc="Deterministic ~16% corpus sample via md5 hex-prefix threshold "
    "— stable across engines/partitionings, unlike rand() sampling",
)
def x35_hash_sample(spark, sf_dir):
    from topn_spark.operators.pipeline import hash_sample

    docs = load_table(spark, sf_dir, "documents")
    return (
        hash_sample(docs, "doc_id", threshold_hex="29")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").cast("bigint").alias("chars"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("source")
    )


@query(
    "x36_split_counts",
    """SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
              THEN 'train'
            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e'
              THEN 'val'
            ELSE 'test' END AS split,
       lang, COUNT(*) AS n
FROM documents GROUP BY 1, 2 ORDER BY split ASC, lang ASC""",
    doc="Deterministic train/val/test split (75/12.5/12.5) on md5 first "
    "hex digit; per-language counts",
)
def x36_split_counts(spark, sf_dir):
    from topn_spark.operators.pipeline import assign_split

    docs = load_table(spark, sf_dir, "documents")
    return (
        assign_split(docs, "doc_id")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("split", "lang")
    )


@query(
    "x37_redaction",
    r"""WITH aug AS (
  SELECT doc_id,
    text || ' contact user' || CAST(doc_id AS VARCHAR)
         || '@example.com ref ' || CAST(doc_id + 10000000 AS VARCHAR)
         || ' see http://ex.com/d/' || CAST(doc_id AS VARCHAR) AS t
  FROM documents)
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(t,
    'https?://\S+', '<URL>', 'g'),
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
    '[0-9]{7,}', '<ID>', 'g') AS clean,
  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails
FROM aug ORDER BY doc_id ASC LIMIT 200""",
    doc="Inline PII scrub (pipeline.py::scrub_pii, the lightweight "
    "column form; the accounting release gate is z51): URL → email → "
    "digit-run regexp_replace chain over deterministically augmented "
    "text (corpus has no native PII)",
)
def x37_redaction(spark, sf_dir):
    from topn_spark.operators.pipeline import (
        SCRUB_PATTERNS,
        scrub_pii,
    )

    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com ref "),
            (F.col("doc_id") + 10000000).cast("string"),
            F.lit(" see http://ex.com/d/"),
            F.col("doc_id").cast("string"),
        ).alias("t"),
    )
    email_pat = SCRUB_PATTERNS[1][0]
    return (
        aug.select(
            "doc_id",
            scrub_pii("t").alias("clean"),
            F.size(
                F.expr(f"regexp_extract_all(t, '{email_pat}', 0)")
            ).cast("bigint").alias("n_emails"),
        )
        .orderBy("doc_id")
        .limit(200)
    )


@query(
    "x38_packing",
    """WITH t AS (
  SELECT doc_id, source,
    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, source, n_tokens,
    COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM t)
SELECT source, CAST(cum_before // 512 AS BIGINT) AS bin_id,
       COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
FROM c GROUP BY 1, 2 ORDER BY source ASC, bin_id ASC""",
    doc="Sequence packing: contiguous-fill binning of docs into "
    "512-token training sequences via window cumsum per source",
)
def x38_packing(spark, sf_dir):
    from topn_spark.operators.pipeline import (
        add_token_count,
        pack_sequences,
    )

    docs = add_token_count(load_table(spark, sf_dir, "documents"))
    packed = pack_sequences(
        docs, "n_tokens", budget=512, by=("source",), order_col="doc_id"
    )
    return (
        packed.groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("bin_tokens"),
        )
        .orderBy("source", "bin_id")
    )


@query(
    "x39_heavy_hitters",
    """WITH tok AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
  FROM documents)
SELECT token, COUNT(*) AS n FROM tok
GROUP BY token ORDER BY n DESC, token ASC LIMIT 50""",
    doc="Corpus heavy-hitters: top-50 tokens by frequency — explode + "
    "partial/final hash agg + TakeOrderedAndProject",
)
def x39_heavy_hitters(spark, sf_dir):
    from topn_spark.operators.pipeline import token_heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    return token_heavy_hitters(docs, "text", k=50)


@query(
    "x40_percentiles",
    """SELECT l_returnflag,
  ROUND(quantile_cont(CAST(l_quantity AS DOUBLE), 0.25), 6) AS p25,
  ROUND(quantile_cont(CAST(l_quantity AS DOUBLE), 0.50), 6) AS p50,
  ROUND(quantile_cont(CAST(l_quantity AS DOUBLE), 0.75), 6) AS p75,
  ROUND(quantile_cont(CAST(l_quantity AS DOUBLE), 0.99), 6) AS p99
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag ASC""",
    doc="Exact interpolated percentiles (Spark percentile() ↔ DuckDB "
    "quantile_cont) — the exact counterpart of x18's approx path",
)
def x40_percentiles(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    q = F.expr(
        "percentile(CAST(l_quantity AS DOUBLE), array(0.25, 0.50, 0.75, 0.99))"
    )
    return (
        li.groupBy("l_returnflag")
        .agg(q.alias("qs"))
        .select(
            "l_returnflag",
            F.round(F.col("qs")[0], 6).alias("p25"),
            F.round(F.col("qs")[1], 6).alias("p50"),
            F.round(F.col("qs")[2], 6).alias("p75"),
            F.round(F.col("qs")[3], 6).alias("p99"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "x41_stratified_sample",
    """WITH r AS (
  SELECT doc_id, lang, n_chars,
    ROW_NUMBER() OVER (PARTITION BY lang
      ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rn,
    COUNT(*) OVER (PARTITION BY lang) AS n
  FROM documents)
SELECT lang, COUNT(*) AS n_sampled, MIN(doc_id) AS min_id,
       CAST(SUM(n_chars) AS BIGINT) AS chars
FROM r WHERE rn <= CAST(CEIL(n * 0.2) AS BIGINT)
GROUP BY lang ORDER BY lang ASC""",
    doc="Deterministic exact-rate stratified sample: first ceil(20%) of "
    "each language by md5-key order — same rows on any engine/run",
)
def x41_stratified_sample(spark, sf_dir):
    from topn_spark.operators.pipeline import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    return (
        stratified_sample(docs, ("lang",), 0.2, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.min("doc_id").alias("min_id"),
            F.sum("n_chars").cast("bigint").alias("chars"),
        )
        .orderBy("lang")
    )


def _x42_numpy_oracle(con):
    """Exact NumPy power iteration (same semantics as graph.pagerank:
    distinct edges, 5 rounds, d=0.85, uniform dangling redistribution)
    over the same event-derived edge list, for the tolerance compare —
    the iteration itself is not expressible as one SQL query."""
    import numpy as np

    edges = con.execute(
        "SELECT DISTINCT user_id AS src, event_id % 50 + 1000 AS dst "
        "FROM events"
    ).fetchall()
    src = np.array([e[0] for e in edges], dtype=np.int64)
    dst = np.array([e[1] for e in edges], dtype=np.int64)
    ids = np.unique(np.concatenate([src, dst]))
    n = len(ids)
    idx = {v: i for i, v in enumerate(ids)}
    si = np.array([idx[v] for v in src])
    di = np.array([idx[v] for v in dst])
    deg = np.zeros(n)
    np.add.at(deg, si, 1.0)
    rank = np.full(n, 1.0 / n)
    d = 0.85
    for _ in range(5):
        m = np.zeros(n)
        np.add.at(m, di, rank[si] / deg[si])
        dangling = 1.0 - m.sum()
        rank = (1.0 - d) / n + d * dangling / n + d * m
    return ["id", "rank_r"], [
        (int(v), round(float(rank[idx[v]]), 6)) for v in ids
    ]


@query(
    "x42_pagerank",
    None,  # iterative float algorithm: rows-only (SURVEY §2.4 rule 3)
    doc="PageRank over the user->item interaction graph (events): "
    "power iteration with dangling-mass redistribution; property-"
    "tested (mass conservation, known-graph fixture) in tests",
    tol_oracle=_x42_numpy_oracle,
    tolerance=1e-5,
    tol_keys=("id",),
)
def x42_pagerank(spark, sf_dir):
    from topn_spark.operators.graph import pagerank

    ev = load_table(spark, sf_dir, "events")
    edges = ev.select(
        F.col("user_id").alias("src"),
        (F.col("event_id") % 50 + 1000).alias("dst"),
    )
    return (
        pagerank(edges, max_iter=5, tol=None)
        .select("id", F.round("rank", 6).alias("rank_r"))
        .orderBy("id")
    )


@query(
    "x43_dist_windows",
    """SELECT o_orderkey, o_orderpriority,
  ROUND(PERCENT_RANK() OVER w, 6) AS prnk,
  ROUND(CUME_DIST() OVER w, 6) AS cdist
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice ASC, o_orderkey ASC)
ORDER BY o_orderpriority ASC, o_orderkey ASC LIMIT 200""",
    doc="Distribution window functions: percent_rank + cume_dist over "
    "a deterministic per-priority ordering",
)
def x43_dist_windows(spark, sf_dir):
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            F.round(F.percent_rank().over(w), 6).alias("prnk"),
            F.round(F.cume_dist().over(w), 6).alias("cdist"),
        )
        .orderBy("o_orderpriority", "o_orderkey")
        .limit(200)
    )


@query(
    "x44_stats_aggs",
    """SELECT l_returnflag,
  ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
  ROUND(covar_pop(l_quantity, l_discount), 6) AS covp_qd,
  ROUND(stddev_pop(l_quantity), 6) AS sd_q,
  ROUND(var_pop(l_discount), 6) AS var_d
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag ASC""",
    doc="Statistical aggregates: corr / covar_pop / stddev_pop / "
    "var_pop per return flag (ROUND(…,6) for cross-engine floats)",
)
def x44_stats_aggs(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
                "corr_qp"
            ),
            F.round(F.covar_pop("l_quantity", "l_discount"), 6).alias(
                "covp_qd"
            ),
            F.round(F.stddev_pop("l_quantity"), 6).alias("sd_q"),
            F.round(F.var_pop("l_discount"), 6).alias("var_d"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "x45_tfidf_terms",
    f"""WITH toks AS (
  SELECT doc_id, source, unnest({_TOKS_DUCK}) AS term FROM documents),
tf AS (SELECT source AS src, term, COUNT(*) AS cnt FROM toks GROUP BY 1, 2),
dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT src, term, score, rn FROM (
  SELECT tf.src, tf.term,
         ROUND(tf.cnt * LN(CAST(n.n_docs AS DOUBLE) / dfreq.df), 6) AS score,
         ROW_NUMBER() OVER (
           PARTITION BY tf.src
           ORDER BY ROUND(tf.cnt * LN(CAST(n.n_docs AS DOUBLE) / dfreq.df), 6)
                    DESC, tf.term ASC) AS rn
  FROM tf JOIN dfreq USING (term) CROSS JOIN n) t
WHERE rn <= 5 ORDER BY src ASC, rn ASC""",
    doc="TF-IDF: top-5 characteristic terms per source "
    "(score rounded before ranking for cross-engine determinism)",
)
def x45_tfidf_terms(spark, sf_dir):
    from topn_spark.operators.textstats import tfidf_top_terms

    docs = load_table(spark, sf_dir, "documents")
    return (
        tfidf_top_terms(docs, "source", "text", "doc_id", k=5)
        .select(F.col("group").alias("src"), "term", "score", "rn")
        .orderBy("src", "rn")
    )


@query(
    "x46_repetition",
    """WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
  FROM documents),
g AS (SELECT doc_id, len(toks) - 1 AS nslots,
             unnest(list_transform(range(1, len(toks)),
                    i -> toks[i] || ' ' || toks[i+1])) AS gram
      FROM t WHERE len(toks) >= 2),
c AS (SELECT doc_id, ANY_VALUE(nslots) AS nslots, gram, COUNT(*) AS cnt
      FROM g GROUP BY doc_id, gram)
SELECT doc_id, CAST(MAX(cnt) AS BIGINT) AS top_ngram_cnt,
       CAST(ANY_VALUE(nslots) AS BIGINT) AS ngram_slots,
       ROUND(CAST(MAX(cnt) AS DOUBLE) / ANY_VALUE(nslots), 6) AS top_ngram_frac
FROM c GROUP BY doc_id ORDER BY doc_id ASC LIMIT 300""",
    doc="Repetition quality signal (Gopher-style): most frequent "
    "2-gram count + covered fraction per document; engine side is a "
    "map-only sort+run-scan fold, oracle recomputes via explode+group",
)
def x46_repetition(spark, sf_dir):
    from topn_spark.operators.textstats import add_repetition_signals, tokens

    docs = load_table(spark, sf_dir, "documents")
    # pre-filter on token count (== ngram_slots >= 1, but cheap): a
    # filter on the derived column would be pushed down as the whole
    # inlined gram pipeline and re-run per input row
    docs = docs.where(F.size(tokens("text")) >= 2)
    return (
        add_repetition_signals(docs, "text", n=2)
        .select(
            "doc_id", "top_ngram_cnt", "ngram_slots", "top_ngram_frac"
        )
        .orderBy("doc_id")
        .limit(300)
    )


@query(
    "x47_contamination",
    """WITH grams AS (
  SELECT doc_id, unnest(list_distinct(
      CASE WHEN len(toks) >= 5
        THEN list_transform(range(1, len(toks) - 3),
             i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2],
                            toks[i+3], toks[i+4]))
        ELSE [] END)) AS gram
  FROM (SELECT doc_id,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        FROM documents)),
b AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0),
t AS (SELECT * FROM grams WHERE doc_id % 97 <> 0)
SELECT t.doc_id, CAST(COUNT(DISTINCT t.gram) AS BIGINT) AS n_shared_grams
FROM t JOIN b USING (gram)
GROUP BY t.doc_id ORDER BY t.doc_id ASC LIMIT 200""",
    doc="Benchmark decontamination: training docs sharing any word "
    "5-gram with the held-out doc set (doc_id % 97), with shared-gram "
    "counts; broadcast bench-gram probe",
)
def x47_contamination(spark, sf_dir):
    from topn_spark.operators.pipeline import contamination_check

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    train = docs.where(F.col("doc_id") % 97 != 0)
    return (
        contamination_check(train, bench, "text", "doc_id", n=5)
        .select(
            "doc_id", F.col("n_shared_grams").cast("bigint").alias(
                "n_shared_grams"
            )
        )
        .orderBy("doc_id")
        .limit(200)
    )


@query(
    "x48_resample_ffill",
    """WITH ev AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
  FROM events WHERE user_id < 8),
span AS (SELECT user_id, date_trunc('hour', MIN(ts)) AS lo,
                date_trunc('hour', MAX(ts)) AS hi
         FROM ev GROUP BY 1),
grid AS (SELECT user_id,
                unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
         FROM span),
actual AS (SELECT user_id, date_trunc('hour', ts) AS bucket,
                  MAX(value) AS v
           FROM ev GROUP BY 1, 2)
SELECT g.user_id, g.bucket,
       last_value(a.v IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
       a.v IS NULL AS ffilled
FROM grid g LEFT JOIN actual a USING (user_id, bucket)
ORDER BY g.user_id ASC, g.bucket ASC LIMIT 500""",
    doc="Time-series resample to an hourly grid with forward-fill "
    "(gap-fill + LOCF): sequence-exploded grid, bucketed agg join, "
    "ignore-nulls carry window",
)
def x48_resample_ffill(spark, sf_dir):
    from topn_spark.operators.pipeline import resample_ffill

    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 8)
    return (
        resample_ffill(
            ev, "ts", ["user_id"], F.max("value"), "1 hour", "hour"
        )
        .select("user_id", "bucket", "value", "ffilled")
        .orderBy("user_id", "bucket")
        .limit(500)
    )


@query(
    "x49_histogram",
    """SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0
            WHEN o_totalprice >= 600000 THEN 21
            ELSE 1 + FLOOR(20.0 * (o_totalprice - 0) / 600000) END
       AS BIGINT) AS bucket,
       COUNT(*) AS n
FROM orders GROUP BY 1 ORDER BY bucket ASC""",
    doc="Equi-width histogram of order totals (width_bucket "
    "semantics, formula pinned for cross-engine FP identity)",
)
def x49_histogram(spark, sf_dir):
    from topn_spark.operators.pipeline import histogram

    orders = load_table(spark, sf_dir, "orders")
    return histogram(orders, "o_totalprice", 0.0, 600000.0, 20).orderBy(
        "bucket"
    )


@query(
    "x50_zscore",
    """WITH m AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s,
         CAST(SUM(CAST(value AS DECIMAL(18,2))
                  * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s2
  FROM events GROUP BY 1)
SELECT e.event_id, e.event_type,
       ROUND((e.value - m.s / m.n)
             / SQRT((m.s2 - m.s * m.s / m.n) / (m.n - 1)), 6) AS z
FROM events e JOIN m USING (event_type)
ORDER BY e.event_id ASC LIMIT 200""",
    doc="Per-group z-score feature normalization, decimal-exact "
    "moments (order-independent sums) converted to double once",
)
def x50_zscore(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).cast("double").alias("s"),
        F.sum(dec * dec).cast("double").alias("s2"),
    )
    return (
        ev.join(m, "event_type")
        .select(
            "event_id",
            "event_type",
            F.round(
                (F.col("value") - F.col("s") / F.col("n"))
                / F.sqrt(
                    (F.col("s2") - F.col("s") * F.col("s") / F.col("n"))
                    / (F.col("n") - 1)
                ),
                6,
            ).alias("z"),
        )
        .orderBy("event_id")
        .limit(200)
    )


@query(
    "x51_merge_upsert",
    """WITH updates AS (
  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
         o_totalprice + 1000 AS o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 10 = 0),
merged AS (
  SELECT * FROM updates
  UNION ALL
  SELECT o.* FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM updates u
                    WHERE u.o_orderkey = o.o_orderkey))
SELECT o_orderstatus, COUNT(*) AS cnt,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
         AS sum_p
FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus ASC""",
    doc="MERGE/upsert semantics on plain parquet (source wins on key "
    "collision) via source ∪ target-anti-join; checksum per status",
)
def x51_merge_upsert(spark, sf_dir):
    from topn_spark.operators.pipeline import merge_upsert

    orders = load_table(spark, sf_dir, "orders")
    updates = (
        orders.where(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_orderstatus", F.lit("U"))
        .withColumn("o_totalprice", F.col("o_totalprice") + 1000)
    )
    merged = merge_upsert(orders, updates, ["o_orderkey"])
    return (
        merged.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .alias("sum_p"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "x52_winsorize",
    """WITH b AS (
  SELECT l_returnflag,
         ROUND(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.05), 6)
           AS clip_lo,
         ROUND(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.95), 6)
           AS clip_hi
  FROM lineitem GROUP BY 1)
SELECT l.l_returnflag,
       CAST(SUM(CASE WHEN l_extendedprice < clip_lo THEN 1 ELSE 0 END)
         AS BIGINT) AS n_low,
       CAST(SUM(CASE WHEN l_extendedprice > clip_hi THEN 1 ELSE 0 END)
         AS BIGINT) AS n_high,
       CAST(SUM(CAST(LEAST(GREATEST(l_extendedprice, clip_lo), clip_hi)
                     AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS sum_clipped
FROM lineitem l JOIN b USING (l_returnflag)
GROUP BY l.l_returnflag ORDER BY l.l_returnflag ASC""",
    doc="Winsorization (per-group p05/p95 outlier clipping): bounds "
    "rounded before clamping for cross-engine determinism; decimal "
    "checksum of the clipped column",
)
def x52_winsorize(spark, sf_dir):
    from topn_spark.operators.pipeline import winsorize

    li = load_table(spark, sf_dir, "lineitem")
    w = winsorize(li, "l_extendedprice", ["l_returnflag"], 0.05, 0.95)
    return (
        w.groupBy("l_returnflag")
        .agg(
            F.sum(
                F.when(F.col("l_extendedprice") < F.col("clip_lo"), 1)
                .otherwise(0)
            ).cast("bigint").alias("n_low"),
            F.sum(
                F.when(F.col("l_extendedprice") > F.col("clip_hi"), 1)
                .otherwise(0)
            ).cast("bigint").alias("n_high"),
            F.sum(
                F.col("l_extendedprice_clipped").cast("decimal(18,6)")
            ).cast("decimal(38,6)").alias("sum_clipped"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "x53_ordered_collect",
    """WITH ranked AS (
  SELECT o_orderpriority, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey ASC)
           AS rn
  FROM orders)
SELECT o_orderpriority,
       string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY rn) AS top_keys,
       CAST(COUNT(*) AS BIGINT) AS n
FROM ranked WHERE rn <= 5
GROUP BY o_orderpriority ORDER BY o_orderpriority ASC""",
    doc="Deterministic ordered collect: top-5 order keys per priority "
    "as a CSV string (Spark sort_array(collect_list(struct)) ↔ DuckDB "
    "string_agg ORDER BY) — the array_agg aggregation surface",
)
def x53_ordered_collect(spark, sf_dir):
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    ranked = o.select(
        "o_orderpriority",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
    ).where(F.col("rn") <= 5)
    return (
        ranked.groupBy("o_orderpriority")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rn", "o_orderkey"))
                    ),
                    lambda s: s["o_orderkey"].cast("string"),
                ),
            ).alias("top_keys"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "x54_interval_join",
    """WITH iv AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS s,
         CAST(ts AS TIMESTAMP)
           + INTERVAL 1 MINUTE * CAST(FLOOR(value) AS INTEGER) AS e
  FROM events WHERE user_id < 30)
SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b
FROM iv a JOIN iv b
  ON a.user_id = b.user_id AND a.event_id < b.event_id
 AND a.s <= b.e AND b.s <= a.e
ORDER BY a.user_id ASC, id_a ASC, id_b ASC LIMIT 300""",
    doc="Interval-overlap (range) join: engine uses the bucketed "
    "equi-join plan (operators/ranges.py), oracle runs the naive "
    "theta join — a full algorithmic cross-check",
)
def x54_interval_join(spark, sf_dir):
    from topn_spark.operators.ranges import interval_overlap_join

    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 30)
    iv = ev.select(
        "user_id",
        "event_id",
        F.col("ts").alias("s"),
        F.expr(
            "timestampadd(MINUTE, CAST(FLOOR(value) AS INT), ts)"
        ).alias("e"),
    )
    pairs = interval_overlap_join(
        iv, iv.withColumnRenamed("event_id", "event_id2"),
        by=["user_id"], start_col="s", end_col="e", bucket="hour",
    )
    return (
        pairs.where(F.col("event_id_a") < F.col("event_id2_b"))
        .select(
            "user_id",
            F.col("event_id_a").alias("id_a"),
            F.col("event_id2_b").alias("id_b"),
        )
        .orderBy("user_id", "id_a", "id_b")
        .limit(300)
    )


@query(
    "x55_sessionize",
    """WITH e AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
    CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
           OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER w
              > INTERVAL 10 MINUTE
         THEN 1 ELSE 0 END AS brk
  FROM events WHERE user_id < 10
  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) ASC,
               event_id ASC))
SELECT user_id, event_id,
       CAST(SUM(brk) OVER (PARTITION BY user_id
                           ORDER BY ts ASC, event_id ASC
                           ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT)
         AS session_id
FROM e ORDER BY user_id ASC, event_id ASC LIMIT 300""",
    doc="Row-level sessionization (10-min gap): per-event session ids "
    "via pipeline.sessionize — the row-granular sibling of x09",
)
def x55_sessionize(spark, sf_dir):
    from topn_spark.operators.pipeline import sessionize

    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 10)
    return (
        sessionize(
            ev, "ts", ["user_id"], "10 minutes",
            order_tiebreak="event_id",
        )
        .select("user_id", "event_id", "session_id")
        .orderBy("user_id", "event_id")
        .limit(300)
    )


@query(
    "x56_zorder",
    """SELECT o_orderkey,
       CAST(list_sum(list_transform(generate_series(0, 9), i ->
         ((((o_custkey % 1024) >> i) & 1) << (2 * i))
         + ((((o_orderkey % 1024) >> i) & 1) << (2 * i + 1))))
       AS BIGINT) AS z
FROM orders ORDER BY z ASC, o_orderkey ASC LIMIT 200""",
    doc="Z-order (Morton) clustering key over two bucketized key "
    "columns — the layout primitive behind multi-column scan pruning "
    "(operators/layout.py); bit-identical vs the DuckDB formulation",
)
def x56_zorder(spark, sf_dir):
    from topn_spark.operators.layout import zorder_key

    o = load_table(spark, sf_dir, "orders")
    return (
        o.withColumn("ck", F.col("o_custkey") % 1024)
        .withColumn("ok", F.col("o_orderkey") % 1024)
        .select(
            "o_orderkey",
            zorder_key(["ck", "ok"], bits=10).alias("z"),
        )
        .orderBy("z", "o_orderkey")
        .limit(200)
    )


@query(
    "x57_approx_topk_tokens",
    None,  # sketch contents are merge-order dependent: rows-only;
    # tolerance vs the exact x39 counts in tests/test_pipeline_ops.py
    doc="Sketch heavy-hitters (approx_top_k) — fixed-memory top-k "
    "tokens; completes the approx family (q16 HLL, x18 KLL)",
    tol_oracle=f"""WITH t AS (
  SELECT unnest({_TOKS_DUCK}) AS token FROM documents)
SELECT token, CAST(COUNT(*) AS BIGINT) AS n_approx
FROM t GROUP BY token
ORDER BY n_approx DESC, token ASC LIMIT 30""",
    tolerance=0.10,
    tol_keys=("token",),
)
def x57_approx_topk_tokens(spark, sf_dir):
    from topn_spark.operators.pipeline import token_heavy_hitters_approx

    docs = load_table(spark, sf_dir, "documents")
    return token_heavy_hitters_approx(docs, "text", k=30).orderBy(
        F.col("n_approx").desc(), F.col("token").asc()
    )


@query(
    "x58_token_chunks",
    f"""WITH t AS (
  SELECT doc_id, {_TOKS_DUCK} AS toks FROM documents),
s AS (
  SELECT doc_id, toks,
         unnest(generate_series(1, greatest(len(toks), 1), 96)) AS st
  FROM t)
SELECT doc_id, CAST((st - 1) / 96 AS BIGINT) AS chunk_idx,
       MD5(array_to_string(toks[st:st+127], ' ')) AS chunk_md5,
       CAST(GREATEST(LEAST(128, len(toks) - st + 1), 0) AS BIGINT)
         AS n_chunk_tokens
FROM s ORDER BY doc_id ASC, chunk_idx ASC LIMIT 500""",
    doc="Token-budget chunking (128-token windows, 32 overlap): "
    "tokenizer-aligned shards; chunks md5-hashed for a narrow oracle",
)
def x58_token_chunks(spark, sf_dir):
    from topn_spark.operators.pipeline import chunk_by_tokens

    docs = load_table(spark, sf_dir, "documents")
    return (
        chunk_by_tokens(docs, "text", ("doc_id",), size=128, overlap=32)
        .select(
            "doc_id",
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            F.md5("chunk").alias("chunk_md5"),
            "n_chunk_tokens",
        )
        .orderBy("doc_id", "chunk_idx")
        .limit(500)
    )


@query(
    "x59_conditional_agg",
    """SELECT o_orderpriority,
       CAST(COUNT(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT)
         AS n_big,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
       CAST(COUNT(DISTINCT o_custkey)
            FILTER (WHERE o_totalprice > 200000) AS BIGINT)
         AS n_big_cust
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority ASC""",
    doc="Conditional aggregation: FILTER clause (shared SQL dialect; "
    "DataFrame side uses count_if / when-guarded countDistinct)",
)
def x59_conditional_agg(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    big = F.col("o_totalprice") > 200000
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count_if(big).cast("bigint").alias("n_big"),
            F.count_if(F.col("o_orderstatus") == "F")
            .cast("bigint")
            .alias("n_f"),
            F.countDistinct(F.when(big, F.col("o_custkey")))
            .cast("bigint")
            .alias("n_big_cust"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "x60_date_arith",
    """SELECT o_orderkey,
       CAST(datediff('day', DATE '2024-01-01', CAST(o_orderdate AS DATE))
         AS BIGINT) AS days_since,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS BIGINT) AS dow
FROM orders ORDER BY o_orderkey ASC LIMIT 200""",
    doc="Date arithmetic (dialect pair): datediff arg order, "
    "add_months month-end clamping, last_day, dayofweek base offset "
    "(Spark 1=Sunday vs DuckDB 0=Sunday)",
)
def x60_date_arith(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return (
        o.select(
            "o_orderkey",
            F.datediff(d, F.lit("2024-01-01").cast("date"))
            .cast("bigint")
            .alias("days_since"),
            F.add_months(d, 3).alias("plus3m"),
            F.last_day(d).alias("month_end"),
            F.dayofweek(d).cast("bigint").alias("dow"),
        )
        .orderBy("o_orderkey")
        .limit(200)
    )


@query(
    "x61_binary_columns",
    """SELECT doc_id,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
       md5(text) AS digest,
       UPPER(hex(CAST(substring(text, 1, 4) AS BLOB))) AS magic
FROM documents ORDER BY doc_id ASC LIMIT 200""",
    doc="Binary-column operations (multimodal data model, SURVEY "
    "§2.6): byte length, content digest, magic-bytes hex over a "
    "BinaryType payload — dialect pair (Spark binary fns vs DuckDB "
    "BLOB; test corpus is ASCII so byte/char offsets coincide)",
)
def x61_binary_columns(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    payload = F.col("text").cast("binary")
    return (
        docs.select(
            "doc_id",
            F.length(payload).cast("bigint").alias("n_bytes"),
            F.md5(payload).alias("digest"),
            F.upper(
                F.hex(F.expr("substring(CAST(text AS BINARY), 1, 4)"))
            ).alias("magic"),
        )
        .orderBy("doc_id")
        .limit(200)
    )


@query(
    "x62_rollup_merge",
    """SELECT CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
       event_type, COUNT(*) AS cnt,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_v,
       MIN(value) AS min_v, MAX(value) AS max_v
FROM events GROUP BY 1, 2 ORDER BY day ASC, event_type ASC""",
    doc="Hypertable rollup (SURVEY §2.6 north star): hourly "
    "pre-aggregate merged to daily via mergeable partials "
    "(operators/rollup.py) — the oracle recomputes the daily answer "
    "directly from raw events, proving merge exactness",
)
def x62_rollup_merge(spark, sf_dir):
    from topn_spark.operators.rollup import (
        BUCKET_COL,
        RollupSpec,
        re_rollup,
        rollup,
    )

    spec = RollupSpec(
        keys=("event_type",),
        sum_cols=("value_dec",),
        minmax_cols=("value",),
    )
    ev = load_table(spark, sf_dir, "events").withColumn(
        "value_dec", F.col("value").cast("decimal(18,2)")
    )
    daily = re_rollup(rollup(ev, "ts", "hour", spec), "day", spec)
    return daily.select(
        F.col(BUCKET_COL).cast("date").alias("day"),
        "event_type",
        "cnt",
        F.col("sum_value_dec").cast("decimal(38,2)").alias("sum_v"),
        F.col("min_value").alias("min_v"),
        F.col("max_value").alias("max_v"),
    ).orderBy("day", "event_type")


@query(
    "x63_rollup_distinct",
    None,
    doc="Daily approx distinct users answered from MERGED hourly HLL "
    "sketches (hll_sketch_agg/hll_union_agg, operators/rollup.py) — "
    "rows-only for the driver; ≤5%-vs-exact tolerance in "
    "tests/test_rollup.py",
    tol_oracle="SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) "
    "AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS cnt, "
    "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS approx_ndv_user_id "
    "FROM events GROUP BY 1 ORDER BY 1",
    tolerance=0.05,
    tol_keys=("day",),
)
def x63_rollup_distinct(spark, sf_dir):
    from topn_spark.operators.rollup import (
        BUCKET_COL,
        RollupSpec,
        finalize,
        re_rollup,
        rollup,
    )

    spec = RollupSpec(keys=("event_type",), distinct_cols=("user_id",))
    ev = load_table(spark, sf_dir, "events")
    daily = finalize(re_rollup(rollup(ev, "ts", "hour", spec), "day", spec, keys=()), spec)
    return daily.select(
        F.col(BUCKET_COL).cast("date").alias("day"),
        "cnt",
        "approx_ndv_user_id",
    ).orderBy("day")


@query(
    "x64_scd2_history",
    """WITH ch AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC) AS prev
  FROM events),
ivl AS (
  SELECT user_id, event_id, event_type, ts AS eff_from,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS eff_to
  FROM ch WHERE prev IS NULL OR prev <> event_type)
SELECT user_id, event_id, event_type, eff_from, eff_to,
       (eff_to IS NULL) AS is_current
FROM ivl ORDER BY user_id ASC, eff_from ASC, event_id ASC LIMIT 500""",
    doc="SCD type-2 dimension history (pipeline.py::scd2): collapse "
    "no-op updates, close intervals with the next change's "
    "timestamp — one shuffle on the dimension key, sort reused "
    "across both windows",
)
def x64_scd2_history(spark, sf_dir):
    from topn_spark.operators.pipeline import scd2

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    hist = scd2(
        ev, ["user_id"], ["event_type"], ts_col="ts", tiebreak=["event_id"]
    )
    return (
        hist.select(
            "user_id", "event_id", "event_type", "eff_from", "eff_to", "is_current"
        )
        .orderBy("user_id", "eff_from", "event_id")
        .limit(500)
    )


@query(
    "x65_fuzzy_blocked_join",
    """SELECT a.c_custkey AS k1, b.c_custkey AS k2,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS d
FROM customer a JOIN customer b
  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
ORDER BY k1 ASC, k2 ASC""",
    doc="Fuzzy (edit-distance ≤1) self-join via FastSS "
    "deletion-neighborhood blocking (similarity.py::"
    "edit_distance_join): candidates come from an equi-join on "
    "single-deletion variant keys — thousands of tiny groups — "
    "while the oracle runs the naive quadratic nation-blocked join, "
    "proving the candidate set is lossless",
)
def x65_fuzzy_blocked_join(spark, sf_dir):
    from topn_spark.operators.similarity import edit_distance_join

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    pairs = edit_distance_join(
        cust, "c_custkey", "c_name", block_cols=("c_nationkey",), max_dist=1
    )
    return pairs.select(
        "k1", "k2", F.col("d").cast("bigint").alias("d")
    ).orderBy("k1", "k2")


@query(
    "x66_source_divergence",
    f"""WITH tok AS (
  SELECT source, unnest({_TOKS_DUCK}) AS tok FROM documents),
cnts AS (SELECT source, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2),
tot AS (SELECT source, SUM(c) AS t FROM cnts GROUP BY 1),
p AS (SELECT c.source, c.tok, CAST(c.c AS DOUBLE) / t.t AS p
      FROM cnts c JOIN tot t ON c.source = t.source),
pairs AS (SELECT a.source AS s1, b.source AS s2
          FROM tot a JOIN tot b ON a.source < b.source),
ut AS (SELECT DISTINCT pr.s1, pr.s2, d.tok
       FROM pairs pr JOIN (SELECT DISTINCT source, tok FROM p) d
         ON d.source = pr.s1 OR d.source = pr.s2),
v AS (SELECT ut.s1, ut.s2, COALESCE(pa.p, 0) AS p, COALESCE(pb.p, 0) AS q
      FROM ut LEFT JOIN p pa ON pa.source = ut.s1 AND pa.tok = ut.tok
              LEFT JOIN p pb ON pb.source = ut.s2 AND pb.tok = ut.tok)
SELECT s1, s2, ROUND(SUM(
   CASE WHEN p > 0 THEN p * LN(2 * p / (p + q)) ELSE 0 END
 + CASE WHEN q > 0 THEN q * LN(2 * q / (p + q)) ELSE 0 END) / 2, 6) AS js
FROM v GROUP BY s1, s2 ORDER BY s1 ASC, s2 ASC""",
    doc="Jensen–Shannon divergence between per-source token "
    "distributions (textstats.py::token_distribution + "
    "js_divergence_matrix): corpus distribution-shift detection via "
    "equi-joins over the sparse union vocabulary — never a dense "
    "vocab matrix; the oracle recomputes the full pipeline in SQL",
)
def x66_source_divergence(spark, sf_dir):
    from topn_spark.operators.textstats import (
        js_divergence_matrix,
        token_distribution,
    )

    docs = load_table(spark, sf_dir, "documents")
    dist = token_distribution(docs, by="source")
    return (
        js_divergence_matrix(dist, by="source")
        .select("s1", "s2", F.round("js", 6).alias("js"))
        .orderBy("s1", "s2")
    )


def _profile_oracle() -> str:
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate"]
    parts = [
        f"""SELECT '{c}' AS col_name, COUNT(*) AS n,
       COUNT(*) - COUNT({c}) AS n_null, COUNT(DISTINCT {c}) AS ndv,
       CAST(MIN({c}) AS VARCHAR) AS min_v, CAST(MAX({c}) AS VARCHAR) AS max_v
FROM src"""
        for c in cols
    ]
    return (
        "WITH src AS (SELECT o_orderkey, o_custkey, o_orderstatus,"
        " o_orderpriority, CAST(o_orderdate AS DATE) AS o_orderdate"
        " FROM orders)\n"
        + "\nUNION ALL\n".join(parts)
        + "\nORDER BY col_name ASC"
    )


@query(
    "x67_table_profile",
    _profile_oracle(),
    doc="ANALYZE-style table profile (diag.py::profile_table): "
    "count / nulls / NDV / min / max for every column in ONE "
    "aggregation pass (wide agg row + map-only stack unpivot); "
    "approx=True swaps exact distincts for HLL++ at scale — the "
    "oracle recomputes each column's stats as a UNION ALL",
)
def x67_table_profile(spark, sf_dir):
    from topn_spark.diag import profile_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_orderpriority",
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
    )
    return profile_table(orders).orderBy("col_name")


@query(
    "x68_equidepth_histogram",
    """WITH cuts AS (
  SELECT quantile_cont(o_totalprice,
                       [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS c
  FROM orders),
b AS (SELECT o_totalprice AS v,
        CAST(len(list_filter((SELECT c FROM cuts), x -> o_totalprice > x)) + 1
             AS BIGINT) AS bucket
      FROM orders)
SELECT bucket, COUNT(*) AS n, ROUND(MIN(v), 6) AS lo, ROUND(MAX(v), 6) AS hi
FROM b GROUP BY bucket ORDER BY bucket ASC""",
    doc="Equi-depth histogram (pipeline.py::equidepth_histogram): "
    "exact quantile cutpoints broadcast, bucket assignment via a "
    "higher-order filter over the tiny cutpoint array (map-only); "
    "approx=True (KLL sketch) is the single-shuffle 100 TB path — "
    "dialect pair (percentile/filter ↔ quantile_cont/list_filter)",
)
def x68_equidepth_histogram(spark, sf_dir):
    from topn_spark.operators.pipeline import equidepth_histogram

    orders = load_table(spark, sf_dir, "orders")
    return equidepth_histogram(orders, "o_totalprice", 10).orderBy("bucket")


@query(
    "x69_funnel",
    """WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
s1 AS (SELECT user_id, MIN(ts) AS t FROM ev WHERE event_type = 'view' GROUP BY 1),
s2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM ev e JOIN s1 ON e.user_id = s1.user_id
       WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
s3 AS (SELECT e.user_id, MIN(e.ts) AS t FROM ev e JOIN s2 ON e.user_id = s2.user_id
       WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1)
SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name,
       (SELECT COUNT(*) FROM s1) AS n_keys
UNION ALL SELECT CAST(2 AS BIGINT), 'click', (SELECT COUNT(*) FROM s2)
UNION ALL SELECT CAST(3 AS BIGINT), 'purchase', (SELECT COUNT(*) FROM s3)
ORDER BY step ASC""",
    doc="Funnel analysis (pipeline.py::funnel): users completing "
    "view→click→purchase with strictly increasing timestamps — one "
    "greedy codegen'd fold over per-user sorted event arrays (one "
    "shuffle total); the oracle proves greedy == the k-level "
    "MIN-join formulation",
)
def x69_funnel(spark, sf_dir):
    from topn_spark.operators.pipeline import funnel

    ev = load_table(spark, sf_dir, "events")
    return funnel(
        ev, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    ).orderBy("step")


@query(
    "x70_retention",
    """WITH ev AS (
  SELECT user_id,
         CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d
  FROM events),
c AS (SELECT user_id, MIN(d) AS cohort FROM ev GROUP BY 1)
SELECT c.cohort, CAST(datediff('day', c.cohort, ev.d) AS BIGINT) AS period_offset,
       COUNT(DISTINCT ev.user_id) AS n_active
FROM ev JOIN c ON ev.user_id = c.user_id
GROUP BY 1, 2 ORDER BY cohort ASC, period_offset ASC""",
    doc="Cohort retention (pipeline.py::retention): first-seen cohort "
    "via window MIN (no self-join), distinct actives per (cohort, "
    "offset) — output O(cohorts × horizon) regardless of event volume",
)
def x70_retention(spark, sf_dir):
    from topn_spark.operators.pipeline import retention

    ev = load_table(spark, sf_dir, "events")
    return retention(ev, "user_id", "ts", period="day").orderBy(
        "cohort", "period_offset"
    )


@query(
    "x71_event_transitions",
    """WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC) AS prev
  FROM events),
n AS (SELECT prev AS from_step, event_type AS to_step, COUNT(*) AS n
      FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
t AS (SELECT from_step, SUM(n) AS tt FROM n GROUP BY 1)
SELECT n.from_step, n.to_step, n.n, ROUND(CAST(n.n AS DOUBLE) / t.tt, 6) AS p
FROM n JOIN t ON n.from_step = t.from_step
ORDER BY n.from_step ASC, n.to_step ASC""",
    doc="Markov transition matrix (pipeline.py::event_transitions): "
    "consecutive-event pair counts per user + row-normalized "
    "probabilities — one key-partitioned window, O(states²) output",
)
def x71_event_transitions(spark, sf_dir):
    from topn_spark.operators.pipeline import event_transitions

    ev = load_table(spark, sf_dir, "events")
    return event_transitions(
        ev, "user_id", "ts", "event_type", tiebreak=["event_id"]
    ).orderBy("from_step", "to_step")


@query(
    "x72_groupwise_linreg",
    """SELECT l_returnflag,
       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs,
       ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
       ROUND(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
       ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag ASC""",
    doc="Group-wise OLS fit (diag.py::groupwise_linreg): SQL-standard "
    "regr_* moment aggregates — the whole per-group fit is one "
    "partial+final hash aggregate; only constant-size (n, Σx, Σy, "
    "Σxx, Σxy, Σyy) sketches cross the shuffle",
)
def x72_groupwise_linreg(spark, sf_dir):
    from topn_spark.diag import groupwise_linreg

    li = load_table(spark, sf_dir, "lineitem")
    return (
        groupwise_linreg(
            li, "l_extendedprice", "l_quantity", ["l_returnflag"]
        )
        .withColumn("n_pairs", F.col("n_pairs").cast("bigint"))
        .select("l_returnflag", "n_pairs", "slope", "intercept", "r2")
        .orderBy("l_returnflag")
    )


@query(
    "x73_slice_entropy",
    """WITH c AS (SELECT source, lang, COUNT(*) AS c
           FROM documents GROUP BY 1, 2)
SELECT source, CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS n_values,
       ROUND(LN(SUM(c)) - SUM(c * LN(c)) / SUM(c), 6) AS entropy,
       ROUND(CASE WHEN COUNT(*) > 1
             THEN (LN(SUM(c)) - SUM(c * LN(c)) / SUM(c)) / LN(COUNT(*))
             END, 6) AS norm_entropy
FROM c GROUP BY source ORDER BY source ASC""",
    doc="Corpus-balance entropy (diag.py::categorical_entropy): "
    "Shannon entropy of the language mix inside each source slice — "
    "two stacked hash aggregates; the second shuffles only "
    "O(distinct values) rows. norm_entropy 1.0 = uniform mix",
)
def x73_slice_entropy(spark, sf_dir):
    from topn_spark.diag import categorical_entropy

    docs = load_table(spark, sf_dir, "documents")
    return categorical_entropy(docs, "lang", ["source"]).orderBy("source")


@query(
    "x74_mutual_information",
    """WITH j AS (SELECT lang AS a, source AS b, COUNT(*) AS c
           FROM documents GROUP BY 1, 2),
cells AS (
  SELECT CAST(c AS DOUBLE) AS c,
         CAST(SUM(c) OVER () AS DOUBLE) AS n,
         CAST(SUM(c) OVER (PARTITION BY a) AS DOUBLE) AS ca,
         CAST(SUM(c) OVER (PARTITION BY b) AS DOUBLE) AS cb
  FROM j),
m AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n,
         SUM((c / n) * LN(c * n / (ca * cb))) AS mi,
         -SUM((c / n) * LN(ca / n)) AS h_a,
         -SUM((c / n) * LN(cb / n)) AS h_b
  FROM cells)
SELECT n, ROUND(mi, 6) AS mi,
       ROUND(CASE WHEN h_a > 0 AND h_b > 0
             THEN mi / SQRT(h_a * h_b) END, 6) AS nmi
FROM m""",
    doc="Lang↔source mutual information (diag.py::mutual_information): "
    "dependence probe for slice leakage — one raw-data aggregate to "
    "the O(|A|·|B|) contingency table, marginals via window sums over "
    "cells only; NMI normalized by sqrt(H(a)·H(b))",
)
def x74_mutual_information(spark, sf_dir):
    from topn_spark.diag import mutual_information

    docs = load_table(spark, sf_dir, "documents")
    return mutual_information(docs, "lang", "source")


@query(
    "x75_interval_coalesce",
    """WITH iv AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS s,
         CAST(ts AS TIMESTAMP) + INTERVAL 3 DAY AS e
  FROM events),
mk AS (
  SELECT user_id, s, e,
         MAX(e) OVER (PARTITION BY user_id ORDER BY s ASC, e ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max
  FROM iv),
isl AS (
  SELECT user_id, s, e,
         SUM(CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY s ASC, e ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM mk)
SELECT user_id, MIN(s) AS start, MAX(e) AS "end",
       COUNT(*) AS n_merged
FROM isl GROUP BY user_id, island
ORDER BY user_id ASC, start ASC""",
    doc="Merge overlapping 3-day activity intervals per user "
    "(pipeline.py::coalesce_intervals): gaps-and-islands via running "
    "MAX(end) — O(n log n) window sort per key, no O(n²) self-join",
)
def x75_interval_coalesce(spark, sf_dir):
    from topn_spark.operators.pipeline import coalesce_intervals

    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 3 DAYS")).alias("e"),
    )
    return coalesce_intervals(iv, "s", "e", ["user_id"]).orderBy(
        "user_id", "start"
    )


@query(
    "x76_ewma",
    """WITH RECURSIVE seq AS (
  SELECT user_id, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY CAST(ts AS TIMESTAMP) ASC,
                                     event_id ASC) AS rn
  FROM events),
r AS (
  SELECT user_id, event_id, value, rn, CAST(value AS DOUBLE) AS ew
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.event_id, s.value, s.rn,
         0.3 * s.value + 0.7 * r.ew
  FROM r JOIN seq s ON s.user_id = r.user_id AND s.rn = r.rn + 1)
SELECT user_id, event_id, value, ROUND(ew, 6) AS ewma
FROM r ORDER BY user_id ASC, event_id ASC""",
    doc="Per-user EWMA of event values (pipeline.py::ewma, α=0.3): "
    "the sequential recurrence runs as a codegen'd JVM array fold — "
    "one shuffle + map-only explode; the oracle replays the same "
    "recurrence via a recursive CTE with identical float "
    "literals — bit-identical IEEE arithmetic, so ROUND(6) "
    "hash-matches (a closed-form POWER() oracle straddles "
    "rounding boundaries after ~50 steps)",
)
def x76_ewma(spark, sf_dir):
    from topn_spark.operators.pipeline import ewma

    ev = load_table(spark, sf_dir, "events")
    out = ewma(
        ev, ["user_id"], "ts", "value", alpha=0.3, tiebreak=["event_id"]
    )
    return out.select(
        "user_id",
        "event_id",
        "value",
        F.round("ewma", 6).alias("ewma"),
    ).orderBy("user_id", "event_id")


@query(
    "x77_triangle_count",
    """WITH e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
nn AS (SELECT COUNT(*) AS n_nodes FROM
         (SELECT u AS x FROM e UNION SELECT v FROM e)),
ne AS (SELECT COUNT(*) AS n_edges FROM e),
nt AS (SELECT COUNT(*) AS n_triangles
       FROM e e1 JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
                 JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v)
SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
       CAST(n_edges AS BIGINT) AS n_edges,
       CAST(n_triangles AS BIGINT) AS n_triangles
FROM nn, ne, nt""",
    doc="Triangle census of the co-purchased-parts graph "
    "(graph.py::triangle_count): compact-forward with degree "
    "orientation — wedge volume capped at O(m^1.5) on any degree "
    "distribution; the oracle counts u<v<w id-ordered triangles, "
    "proving orientation-independence of the count",
)
def x77_triangle_count(spark, sf_dir):
    from topn_spark.operators.graph import triangle_count

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    # Co-purchase edges WITHOUT a lineitem self-join: orders are tiny
    # groups (≤7 items), so collect the part set per order and expand
    # the C(k,2) pairs map-side with array transforms — one shuffle on
    # l_orderkey instead of a sort-merge self-join, ~2x faster and the
    # same edge set (the oracle's DISTINCT pair join).
    edges = (
        li.groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("ps"))
        # The C(k,2) explode expands each order row ~k²/2-fold, but
        # AQE coalesces the tiny pre-explode aggregate output below
        # the core count (its size heuristic cannot see through the
        # explode) — spread the collapsed rows to full parallelism
        # first so the expansion runs on every core (§2.5 input
        # skew; scale-adaptive: one node-sized exchange).
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> "
                    "transform(slice(ps, i + 2, size(ps)), y -> "
                    "struct(least(x, y) as src, greatest(x, y) as dst))))"
                )
            ).alias("p")
        )
        .select("p.src", "p.dst")
    )
    # Opt up from the library's 1M-row OOM-safe broadcast defaults:
    # this entry runs on the 128 GiB local[32] JVM, where even the
    # sf1 co-purchase graph's adjacency relation (12M edges ≈ ~400 MB
    # hashed: 8 B/edge of array payload + ~100 B/node row) is
    # comfortably map-side.
    return triangle_count(
        edges,
        broadcast_edge_limit=20_000_000,
        broadcast_node_limit=5_000_000,
    )


@query(
    "x78_ab_compare",
    """WITH f AS (
  SELECT substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8' AS t,
         event_type = 'purchase' AS s
  FROM events),
c AS (
  SELECT CAST(SUM(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
         CAST(SUM(CASE WHEN NOT t THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
         CAST(SUM(CASE WHEN t AND s THEN 1 ELSE 0 END) AS BIGINT) AS conv_t,
         CAST(SUM(CASE WHEN NOT t AND s THEN 1 ELSE 0 END) AS BIGINT) AS conv_c
  FROM f)
SELECT n_t, n_c, conv_t, conv_c,
       ROUND(CAST(conv_t AS DOUBLE) / n_t, 6) AS rate_t,
       ROUND(CAST(conv_c AS DOUBLE) / n_c, 6) AS rate_c,
       ROUND(CAST(conv_t AS DOUBLE) / n_t
             - CAST(conv_c AS DOUBLE) / n_c, 6) AS abs_lift,
       ROUND(CASE WHEN conv_t + conv_c > 0
                   AND conv_t + conv_c < n_t + n_c THEN
         (CAST(conv_t AS DOUBLE) / n_t - CAST(conv_c AS DOUBLE) / n_c)
         / SQRT((CAST(conv_t + conv_c AS DOUBLE) / (n_t + n_c))
                * (1 - CAST(conv_t + conv_c AS DOUBLE) / (n_t + n_c))
                * (1.0 / n_t + 1.0 / n_c))
         END, 6) AS z
FROM c""",
    doc="Two-proportion experiment readout (diag.py::ab_compare): "
    "hash-split arms (md5 — reproducible across engines and "
    "re-partitionings), purchase-rate lift + pooled z — one "
    "conditional-aggregation scan; arithmetic on four counts only",
)
def x78_ab_compare(spark, sf_dir):
    from topn_spark.diag import ab_compare

    ev = load_table(spark, sf_dir, "events")
    return ab_compare(
        ev,
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8",
        F.col("event_type") == "purchase",
    )


@query(
    "x79_skyline",
    """WITH p AS (SELECT DISTINCT l_quantity AS x, l_extendedprice AS y
           FROM lineitem),
s AS (SELECT x, y,
        MAX(y) OVER (ORDER BY x DESC, y DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
          AS pm
      FROM p)
SELECT x AS l_quantity, y AS l_extendedprice FROM s
WHERE pm IS NULL OR y > pm
ORDER BY l_quantity ASC""",
    doc="Pareto frontier of (quantity, price) points "
    "(pipeline.py::skyline_2d): O(n log n) sort+scan instead of the "
    "O(n²) dominance self-join; two-phase in Spark (map-side "
    "per-partition prune, then the tiny survivor set globally)",
)
def x79_skyline(spark, sf_dir):
    from topn_spark.operators.pipeline import skyline_2d

    li = load_table(spark, sf_dir, "lineitem")
    return skyline_2d(li, "l_quantity", "l_extendedprice").orderBy(
        "l_quantity"
    )


@query(
    "x80_time_weighted_avg",
    """WITH seg AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS tsv,
         epoch_us(CAST(ts AS TIMESTAMP)) AS t, value AS v,
         LEAD(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
           PARTITION BY user_id
           ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) ASC, value ASC)
           AS nxt
  FROM events)
SELECT user_id, MIN(tsv) AS t_start, MAX(tsv) AS t_end,
       COUNT(*) AS n_obs,
       ROUND(COALESCE(
         SUM(v * (nxt - t)) / NULLIF(CAST(MAX(t) - MIN(t) AS DOUBLE), 0),
         MIN(v)), 6) AS twa
FROM seg GROUP BY user_id ORDER BY user_id ASC""",
    doc="Time-weighted average of irregular per-user series "
    "(pipeline.py::time_weighted_avg): LOCF step-function integral "
    "over the observed span in exact integer microseconds — one "
    "lead() window + one keyed aggregate; plain AVG over-weights "
    "sample bursts",
)
def x80_time_weighted_avg(spark, sf_dir):
    from topn_spark.operators.pipeline import time_weighted_avg

    ev = load_table(spark, sf_dir, "events")
    return time_weighted_avg(ev, ["user_id"], "ts", "value").orderBy(
        "user_id"
    )


@query(
    "x81_image_header_decode",
    """SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'gif' END AS img_format,
       CAST(1 + doc_id % 1920 AS INT) AS width,
       CAST(1 + doc_id % 1080 AS INT) AS height
FROM documents ORDER BY doc_id ASC LIMIT 200""",
    doc="Image metadata decode oracle (multimodal.py::decode_image): "
    "Spark synthesizes spec-valid PNG/GIF container headers from "
    "per-row values, runs the REAL pure-stdlib header parser "
    "distributed via mapInPandas, and returns the parsed dims; the "
    "oracle recomputes the planted dims arithmetically, so any parser "
    "byte-offset/endianness bug hash-mismatches",
)
def x81_image_header_decode(spark, sf_dir):
    from topn_spark.operators.multimodal import decode_image

    docs = load_table(spark, sf_dir, "documents")
    # Spec-valid headers built JVM-side from planted dims: PNG packs
    # big-endian u32 dims at bytes 16..24 after the 8-byte signature +
    # IHDR length/type; GIF packs little-endian u16 dims at bytes 6..10.
    w = (1 + F.col("doc_id") % 1920).cast("int")
    h = (1 + F.col("doc_id") % 1080).cast("int")
    be32 = lambda c: F.unhex(F.lpad(F.hex(c), 8, "0"))  # noqa: E731
    le16 = lambda c: F.unhex(  # noqa: E731
        F.concat(
            F.substring(F.lpad(F.hex(c), 4, "0"), 3, 2),
            F.substring(F.lpad(F.hex(c), 4, "0"), 1, 2),
        )
    )
    png = F.concat(
        F.lit(b"\x89PNG\r\n\x1a\n"),
        F.lit(b"\x00\x00\x00\x0dIHDR"),
        be32(w),
        be32(h),
        F.lit(b"\x08\x06\x00\x00\x00\x00\x00\x00\x00"),
    )
    gif = F.concat(F.lit(b"GIF89a"), le16(w), le16(h), F.lit(b"\x00\x00\x00"))
    assets = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, png).otherwise(gif).alias("payload"),
    )
    return (
        decode_image(assets)
        .select("doc_id", "img_format", "width", "height")
        .orderBy("doc_id")
        .limit(200)
    )


@query(
    "x82_resample_interpolate",
    """WITH ev AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
  FROM events WHERE user_id < 8),
span AS (SELECT user_id, date_trunc('hour', MIN(ts)) AS lo,
                date_trunc('hour', MAX(ts)) AS hi
         FROM ev GROUP BY 1),
grid AS (SELECT user_id,
                unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
         FROM span),
actual AS (SELECT user_id, date_trunc('hour', ts) AS bucket,
                  MAX(value) AS v
           FROM ev GROUP BY 1, 2),
j AS (SELECT g.user_id, g.bucket, a.v,
        last_value(a.v IGNORE NULLS) OVER (
          PARTITION BY g.user_id ORDER BY g.bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        last_value(CASE WHEN a.v IS NOT NULL THEN g.bucket END
                   IGNORE NULLS) OVER (
          PARTITION BY g.user_id ORDER BY g.bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
        first_value(a.v IGNORE NULLS) OVER (
          PARTITION BY g.user_id ORDER BY g.bucket
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN a.v IS NOT NULL THEN g.bucket END
                    IGNORE NULLS) OVER (
          PARTITION BY g.user_id ORDER BY g.bucket
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      FROM grid g LEFT JOIN actual a USING (user_id, bucket))
SELECT user_id, bucket,
       ROUND(CASE WHEN v IS NOT NULL THEN v
             WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
               pv + (nv - pv) * (epoch(bucket) - epoch(pt))
                              / (epoch(nt) - epoch(pt))
             END, 6) AS value,
       v IS NULL AND pv IS NOT NULL AND nv IS NOT NULL AS interpolated
FROM j ORDER BY user_id ASC, bucket ASC LIMIT 500""",
    doc="Time-series resample to an hourly grid with LINEAR "
    "interpolation (pipeline.py::resample_interpolate — TimescaleDB "
    "interpolate() / pandas resample().interpolate()): "
    "sequence-exploded grid, bucketed agg join, prev/next observed "
    "carry windows, closed-form lerp in codegen",
)
def x82_resample_interpolate(spark, sf_dir):
    from topn_spark.operators.pipeline import resample_interpolate

    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 8)
    return (
        resample_interpolate(
            ev, "ts", ["user_id"], F.max("value"), "1 hour", "hour"
        )
        .select(
            "user_id",
            "bucket",
            F.round("value", 6).alias("value"),
            "interpolated",
        )
        .orderBy("user_id", "bucket")
        .limit(500)
    )


@query(
    "x83_variant_json",
    """WITH j AS (
  SELECT event_id,
         '{"a": ' || CAST(user_id AS VARCHAR) ||
         ', "t": ["' || event_type || '"], "n": {"k": ' ||
         CAST(json_extract(props, '$.k') AS VARCHAR) || '}}' AS js
  FROM events WHERE props IS NOT NULL)
SELECT event_id,
       CAST(json_extract(js, '$.a') AS BIGINT) AS a,
       CAST(json_extract_string(js, '$.t[0]') AS VARCHAR) AS tag,
       CAST(json_extract(js, '$.n.k') AS INT) AS k,
       json_extract(js, '$.missing') IS NULL AS no_path
FROM j ORDER BY event_id ASC LIMIT 200""",
    doc="Semi-structured VARIANT path (Spark 4 VariantType): identical "
    "nested JSON built from row values in both engines; Spark parses "
    "to VARIANT (binary semi-structured encoding, not string re-scans) "
    "and extracts typed paths with variant_get / v:path syntax; the "
    "oracle extracts the same paths with DuckDB JSON functions — "
    "missing paths null out in both",
)
def x83_variant_json(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").where(
        F.col("props").isNotNull()
    )
    js = F.concat(
        F.lit('{"a": '),
        F.col("user_id").cast("string"),
        F.lit(', "t": ["'),
        F.col("event_type"),
        F.lit('"], "n": {"k": '),
        F.get_json_object("props", "$.k"),
        F.lit("}}"),
    )
    # try_parse_json, not parse_json: the payload is string-built, so
    # a non-numeric props.k would make it malformed JSON — that row
    # must null out (as the oracle's json_extract does), not throw.
    v = ev.select("event_id", F.try_parse_json(js).alias("v"))
    return (
        v.select(
            "event_id",
            F.expr("variant_get(v, '$.a', 'bigint')").alias("a"),
            F.expr("variant_get(v, '$.t[0]', 'string')").alias("tag"),
            F.expr("cast(v:n.k as int)").alias("k"),
            F.expr("variant_get(v, '$.missing', 'string')")
            .isNull()
            .alias("no_path"),
        )
        .orderBy("event_id")
        .limit(200)
    )


@query(
    "x84_sample_k_per_group",
    """WITH r AS (
  SELECT doc_id, source, lang,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rn
  FROM documents)
SELECT doc_id, source, lang, rn FROM r
WHERE rn <= 25 ORDER BY source ASC, rn ASC""",
    doc="Bounded per-source corpus cap "
    "(pipeline.py::sample_k_per_group): deterministic uniform "
    "k-sample per group via md5-rank — the k smallest content hashes "
    "ARE a uniform k-sample; WindowGroupLimit cuts map-side so at "
    "most k rows per group per partition reach the shuffle",
)
def x84_sample_k_per_group(spark, sf_dir):
    from topn_spark.operators.pipeline import sample_k_per_group

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang"
    )
    return sample_k_per_group(
        docs, ["source"], 25, "doc_id", rank_col="rn"
    ).orderBy("source", "rn")


@query(
    "x85_chi2_independence",
    """WITH cells AS (
  SELECT event_type AS a, user_id % 4 AS b, COUNT(*) AS o
  FROM events GROUP BY 1, 2),
m AS (SELECT a, b, o,
        SUM(o) OVER (PARTITION BY a) AS ra,
        SUM(o) OVER (PARTITION BY b) AS cb,
        SUM(o) OVER () AS n
      FROM cells)
SELECT CAST(MAX(n) AS BIGINT) AS n,
       CAST((COUNT(DISTINCT a) - 1
             + MAX(CASE WHEN a IS NULL THEN 1 ELSE 0 END))
          * (COUNT(DISTINCT b) - 1
             + MAX(CASE WHEN b IS NULL THEN 1 ELSE 0 END)) AS BIGINT)
         AS dof,
       ROUND(SUM((o - ra * cb / n) * (o - ra * cb / n) / (ra * cb / n)
                 - ra * cb / n) + MAX(n), 6) AS chi2
FROM m""",
    doc="Pearson chi-square independence test of event_type x "
    "user-bucket (diag.py::chi2_independence): contingency cells via "
    "one map-side-combined groupBy, marginals windowed over the CELL "
    "table (|A|x|B| rows, not the data), absent-cell mass folded in "
    "closed form (sum over observed cells + n - sum of observed "
    "expectations)",
)
def x85_chi2_independence(spark, sf_dir):
    from topn_spark.diag import chi2_independence

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 4).alias("ub")
    )
    return chi2_independence(ev, "event_type", "ub")


@query(
    "x86_lateral_topn",
    """SELECT r.r_name, l.n_name
FROM region r,
     LATERAL (SELECT n_name FROM nation n
              WHERE n.n_regionkey = r.r_regionkey
              ORDER BY n_name ASC LIMIT 2) l
ORDER BY r_name ASC, n_name ASC""",
    doc="LATERAL correlated subquery (Spark 4 SQL surface): per-region "
    "top-2 nations via a correlated ordered-limit subquery — the "
    "SQL-standard form of grouped top-N; Catalyst decorrelates it, "
    "DuckDB runs the identical text",
)
def x86_lateral_topn(spark, sf_dir):
    from topn_spark.catalog import register_views

    register_views(spark, sf_dir, ("region", "nation"))
    return spark.sql(
        """SELECT r.r_name, l.n_name
           FROM region r,
                LATERAL (SELECT n_name FROM nation n
                         WHERE n.n_regionkey = r.r_regionkey
                         ORDER BY n_name ASC LIMIT 2) l
           ORDER BY r_name ASC, n_name ASC"""
    )


@query(
    "x87_recursive_cte",
    """WITH RECURSIVE chain AS (
  SELECT n_nationkey AS a,
         LEAD(n_nationkey) OVER (
           PARTITION BY n_regionkey ORDER BY n_nationkey ASC) AS b
  FROM nation),
edges AS (SELECT a, b FROM chain WHERE b IS NOT NULL)
, reach AS (
  SELECT a, b FROM edges
  UNION ALL
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
SELECT a, b FROM reach ORDER BY a ASC, b ASC""",
    doc="Recursive CTE (Spark 4 WITH RECURSIVE): transitive closure of "
    "the per-region nation successor chain — variable-depth iteration "
    "expressed in the SQL standard's recursion form; DuckDB runs the "
    "identical text (both engines fixpoint on UNION ALL)",
)
def x87_recursive_cte(spark, sf_dir):
    from topn_spark.catalog import register_views

    register_views(spark, sf_dir, ("nation",))
    return spark.sql(
        """WITH RECURSIVE chain AS (
             SELECT n_nationkey AS a,
                    LEAD(n_nationkey) OVER (
                      PARTITION BY n_regionkey ORDER BY n_nationkey ASC) AS b
             FROM nation),
           edges AS (SELECT a, b FROM chain WHERE b IS NOT NULL),
           reach AS (
             SELECT a, b FROM edges
             UNION ALL
             SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
           SELECT a, b FROM reach ORDER BY a ASC, b ASC"""
    )


@query(
    "x88_groupwise_auc",
    """WITH per_score AS (
  SELECT user_id % 4 AS slice, value AS s,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p,
         SUM(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END) AS n
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
r AS (SELECT slice, p, n,
        COALESCE(SUM(n) OVER (
          PARTITION BY slice ORDER BY s
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          AS negs_below
      FROM per_score)
SELECT slice, CAST(SUM(p) AS BIGINT) AS n_pos,
       CAST(SUM(n) AS BIGINT) AS n_neg,
       ROUND(SUM(p * (negs_below + n / 2.0))
             / (CAST(SUM(p) AS DOUBLE) * CAST(SUM(n) AS DOUBLE)), 6)
         AS auc
FROM r GROUP BY slice ORDER BY slice ASC""",
    doc="Per-slice ROC AUC of 'does value rank purchases above other "
    "events' (diag.py::groupwise_auc): Mann-Whitney with exact tie "
    "handling over the per-(group, distinct score) aggregate — sort "
    "cost is O(distinct scores), not O(rows)",
)
def x88_groupwise_auc(spark, sf_dir):
    from topn_spark.diag import groupwise_auc

    ev = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 4).alias("slice"),
        "value",
        "event_type",
    )
    return groupwise_auc(
        ev, F.col("event_type") == "purchase", "value", ["slice"]
    ).orderBy("slice")


@query(
    "x89_pixel_decode_stats",
    """WITH g AS (
  SELECT doc_id,
         CAST(1 + doc_id % 7 AS INT) AS w,
         CAST(1 + doc_id % 5 AS INT) AS h
  FROM documents WHERE doc_id < 200),
px AS (
  SELECT doc_id, w, h,
         [CAST((i // 3) % w + (i // (3 * w)) + 40 * (i % 3) AS INT)
          for i in generate_series(0, 3 * w * h - 1)] AS pixels
  FROM g)
SELECT doc_id, h, w,
       CAST(3 * w * h AS INT) AS n_px,
       md5(array_to_string(pixels, ',')) AS px_md5,
       CAST(0 AS INT) AS r_min,
       CAST((w - 1) + (h - 1) AS INT) AS r_max,
       ROUND((w - 1) / 2.0 + (h - 1) / 2.0, 4) AS r_mean,
       CAST(40 AS INT) AS g_min,
       CAST(40 + (w - 1) + (h - 1) AS INT) AS g_max,
       ROUND(40 + (w - 1) / 2.0 + (h - 1) / 2.0, 4) AS g_mean,
       CAST(80 AS INT) AS b_min,
       CAST(80 + (w - 1) + (h - 1) AS INT) AS b_max,
       ROUND(80 + (w - 1) / 2.0 + (h - 1) / 2.0, 4) AS b_mean
FROM px ORDER BY doc_id ASC""",
    doc="REAL pixel decode, oracled (multimodal.py::decode_pixels): "
    "spec-valid uncompressed 24-bit BMPs (even doc_id — BGR order, "
    "padded bottom-up rows) and binary P6 PPMs (odd) are synthesized "
    "from planted per-position pixel values x+y+40c; the pure-stdlib "
    "decoder runs distributed via mapInPandas, and the oracle "
    "recomputes the full pixel array (md5 — catches row-order/"
    "padding/channel-order bugs) plus per-channel min/max/mean "
    "arithmetically from doc_id",
)
def x89_pixel_decode_stats(spark, sf_dir):
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from topn_spark.operators.multimodal import (
        decode_pixels,
        encode_bmp_rgb,
        encode_ppm_rgb,
    )

    @pandas_udf(T.BinaryType())
    def planted_payload(doc_ids):
        import pandas as pd

        out = []
        for d in doc_ids:
            d = int(d)
            w, h = 1 + d % 7, 1 + d % 5
            pix = bytes(
                x + y + 40 * c
                for y in range(h)
                for x in range(w)
                for c in range(3)
            )
            enc = encode_bmp_rgb if d % 2 == 0 else encode_ppm_rgb
            out.append(enc(w, h, pix))
        return pd.Series(out)

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 200
    )
    assets = docs.select(
        "doc_id", planted_payload("doc_id").alias("payload")
    )
    decoded = decode_pixels(assets)

    def ch_min(c):
        return F.array_min(F.expr(f"filter(pixels, (x, i) -> i % 3 = {c})"))

    def ch_max(c):
        return F.array_max(F.expr(f"filter(pixels, (x, i) -> i % 3 = {c})"))

    def ch_mean(c):
        return F.round(
            F.expr(
                f"aggregate(filter(pixels, (x, i) -> i % 3 = {c}), 0L, "
                "(a, x) -> a + x, "
                "a -> a / cast(size(pixels) div 3 as double))"
            ),
            4,
        )

    return decoded.select(
        "doc_id",
        F.element_at("shape", 1).alias("h"),
        F.element_at("shape", 2).alias("w"),
        F.size("pixels").alias("n_px"),
        F.md5(
            F.concat_ws(",", F.transform("pixels", lambda x: x.cast("string")))
            .cast("binary")
        ).alias("px_md5"),
        ch_min(0).alias("r_min"),
        ch_max(0).alias("r_max"),
        ch_mean(0).alias("r_mean"),
        ch_min(1).alias("g_min"),
        ch_max(1).alias("g_max"),
        ch_mean(1).alias("g_mean"),
        ch_min(2).alias("b_min"),
        ch_max(2).alias("b_max"),
        ch_mean(2).alias("b_mean"),
    ).orderBy("doc_id")


@query(
    "x90_audio_decode_stats",
    """WITH g AS (
  SELECT doc_id,
         CAST(1 + doc_id % 2 AS INT) AS ch,
         CAST(8000 + 100 * (doc_id % 3) AS INT) AS sr,
         CAST(20 + doc_id % 50 AS BIGINT) AS nf
  FROM documents WHERE doc_id < 200),
s AS (
  SELECT doc_id, ch, sr, nf,
         [CAST((doc_id * 7 + (i // ch) * 3 + (i % ch) * 11) % 200 - 100
               AS INT)
          for i in generate_series(0, nf * ch - 1)] AS samples
  FROM g)
SELECT doc_id, CAST('wav' AS VARCHAR) AS aud_format, ch AS channels,
       sr AS sample_rate, nf AS n_frames,
       CAST(nf * 1000 // sr AS BIGINT) AS duration_ms,
       md5(array_to_string(samples, ',')) AS s_md5,
       CAST(list_min(samples) AS INT) AS s_min,
       CAST(list_max(samples) AS INT) AS s_max,
       CAST(list_sum(samples) AS BIGINT) AS s_sum
FROM s ORDER BY doc_id ASC""",
    doc="REAL audio decode, oracled (multimodal.py::decode_audio): "
    "spec-valid RIFF/WAVE PCM16 payloads are synthesized from planted "
    "per-(frame, channel) sample values (doc_id*7 + f*3 + c*11) % 200 "
    "- 100 with per-doc channel count and sample rate; the pure-stdlib "
    "chunk-walking parser runs distributed via mapInPandas and the "
    "oracle recomputes the full interleaved sample array (md5 — "
    "catches byte-order/interleave/frame-count bugs) plus min/max/sum "
    "and the integer duration arithmetically from doc_id",
)
def x90_audio_decode_stats(spark, sf_dir):
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from topn_spark.operators.multimodal import (
        decode_audio,
        encode_wav_pcm16,
    )

    @pandas_udf(T.BinaryType())
    def planted_wav(doc_ids):
        import pandas as pd

        out = []
        for d in doc_ids:
            d = int(d)
            ch, sr, nf = 1 + d % 2, 8000 + 100 * (d % 3), 20 + d % 50
            frames = [
                (d * 7 + f * 3 + c * 11) % 200 - 100
                for f in range(nf)
                for c in range(ch)
            ]
            out.append(encode_wav_pcm16(sr, ch, frames))
        return pd.Series(out)

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 200
    )
    assets = docs.select(
        "doc_id", planted_wav("doc_id").alias("payload")
    )
    decoded = decode_audio(assets)
    return decoded.select(
        "doc_id",
        "aud_format",
        "channels",
        "sample_rate",
        "n_frames",
        "duration_ms",
        F.md5(
            F.concat_ws(
                ",", F.transform("samples", lambda x: x.cast("string"))
            ).cast("binary")
        ).alias("s_md5"),
        F.array_min("samples").alias("s_min"),
        F.array_max("samples").alias("s_max"),
        F.expr(
            "aggregate(samples, 0L, (a, x) -> a + x)"
        ).alias("s_sum"),
    ).orderBy("doc_id")


@query(
    "x93_video_header_decode",
    """SELECT doc_id, CAST('mp4' AS VARCHAR) AS vid_format,
       CAST(600 * (1 + doc_id % 4) AS INT) AS timescale,
       CAST((1000 + doc_id * 37) * 1000 // (600 * (1 + doc_id % 4))
            AS BIGINT) AS duration_ms
FROM documents WHERE doc_id < 200 ORDER BY doc_id ASC""",
    doc="REAL video metadata decode, oracled (multimodal.py::"
    "decode_video): minimal spec-valid ISO-BMFF streams (ftyp + "
    "moov/mvhd, alternating mvhd version 0/1 by doc parity) carry a "
    "planted movie timescale/duration; the pure-stdlib box-tree walk "
    "runs distributed via mapInPandas and the oracle recomputes "
    "timescale and integer-milliseconds duration arithmetically from "
    "doc_id — completes the image(x81/x89)/audio(x90)/video metadata "
    "triple",
)
def x93_video_header_decode(spark, sf_dir):
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from topn_spark.operators.multimodal import (
        decode_video,
        encode_mp4_stub,
    )

    @pandas_udf(T.BinaryType())
    def planted_mp4(doc_ids):
        import pandas as pd

        out = []
        for d in doc_ids:
            d = int(d)
            out.append(
                encode_mp4_stub(
                    600 * (1 + d % 4), 1000 + d * 37, version=d % 2
                )
            )
        return pd.Series(out)

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 200
    )
    assets = docs.select(
        "doc_id", planted_mp4("doc_id").alias("payload")
    )
    return (
        decode_video(assets)
        .select("doc_id", "vid_format", "timescale", "duration_ms")
        .orderBy("doc_id")
    )


@query(
    "x91_line_dedup",
    """WITH t AS (
  SELECT doc_id, str_split(text, ' ') AS toks FROM documents),
b AS (
  SELECT doc_id,
         ['shared boilerplate footer all rights reserved']
           || (CASE WHEN doc_id % 10 = 0
               THEN ['subscribe to the newsletter']
               ELSE CAST([] AS VARCHAR[]) END)
           || [array_to_string(toks[(i-1)*8+1:(i-1)*8+8], ' ')
               for i in generate_series(
                 1, CAST(ceil(len(toks) / 8.0) AS INT))] AS lines
  FROM t),
e AS (
  SELECT doc_id, UNNEST(
    [{'pos': i, 'line': lines[i]}
     for i in generate_series(1, len(lines))], recursive := true)
  FROM b),
c AS (SELECT md5(line) AS h, COUNT(DISTINCT doc_id) AS nd
      FROM e GROUP BY 1),
j AS (SELECT e.doc_id, e.pos, e.line, c.nd > 1 AS rm
      FROM e JOIN c ON md5(e.line) = c.h)
SELECT doc_id,
       CAST(SUM(CASE WHEN rm THEN 0 ELSE 1 END) AS BIGINT)
         AS n_lines_kept,
       CAST(SUM(CASE WHEN rm THEN 1 ELSE 0 END) AS BIGINT)
         AS n_lines_removed,
       md5(COALESCE(string_agg(CASE WHEN NOT rm THEN line END,
                               chr(10) ORDER BY pos), ''))
         AS text_md5
FROM j GROUP BY doc_id ORDER BY doc_id ASC""",
    doc="Cross-document line-level dedup (RefinedWeb/CCNet boilerplate "
    "removal; pipeline.py::dedup_lines): documents are linearized into "
    "8-token lines plus a planted all-docs boilerplate footer and a "
    "10%%-of-docs newsletter line; every line occurring in >1 distinct "
    "doc is dropped, survivors keep original order. Oracle recomputes "
    "the identical linearization and checks per-doc kept/removed "
    "counts plus an md5 of the reassembled text (pins line ORDER, not "
    "just membership)",
)
def x91_line_dedup(spark, sf_dir):
    from topn_spark.operators.pipeline import dedup_lines

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_lines = F.ceil(F.size(toks) / F.lit(8.0)).cast("int")
    body = F.transform(
        F.sequence(F.lit(1), n_lines),
        lambda i: F.concat_ws(
            " ", F.slice(toks, (i - 1) * 8 + 1, F.lit(8))
        ),
    )
    lines = F.concat(
        F.array(F.lit("shared boilerplate footer all rights reserved")),
        F.when(
            F.col("doc_id") % 10 == 0,
            F.array(F.lit("subscribe to the newsletter")),
        ).otherwise(F.array().cast("array<string>")),
        body,
    )
    staged = docs.select(
        "doc_id", F.array_join(lines, "\n").alias("text")
    )
    return (
        dedup_lines(staged, id_col="doc_id", text_col="text", max_docs=1)
        .select(
            "doc_id",
            "n_lines_kept",
            "n_lines_removed",
            F.md5(F.col("text").cast("binary")).alias("text_md5"),
        )
        .orderBy("doc_id")
    )


@query(
    "x92_weighted_sample",
    """WITH w AS (
  SELECT source, doc_id, n_chars,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)
              AS BIGINT) / CAST(n_chars AS DOUBLE) AS k
  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
r AS (SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY k ASC, doc_id ASC) AS rn
      FROM w)
SELECT source, doc_id, n_chars FROM r WHERE rn <= 25
ORDER BY source ASC, doc_id ASC""",
    doc="Deterministic weighted per-group sampling (pipeline.py::"
    "weighted_sample_k): sequential-Poisson order sampling — rank by "
    "md5-uniform(doc_id)/weight, keep the 25 smallest per source, so "
    "inclusion probability tracks n_chars. Hash-exact across engines "
    "because the key is integer hash arithmetic + one IEEE-rounded "
    "division (no libm ln/pow in the ranking); WindowGroupLimit cuts "
    "the rank map-side",
)
def x92_weighted_sample(spark, sf_dir):
    from topn_spark.operators.pipeline import weighted_sample_k

    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    )
    return weighted_sample_k(
        docs, 25, weight_col="n_chars", id_col="doc_id",
        key_cols=["source"],
    ).orderBy("source", "doc_id")


@query(
    "x94_bm25",
    None,
    doc="Okapi BM25 relevance scores for a 3-term query over the "
    "corpus (textstats.py::bm25_scores): exact-membership row set "
    "(every doc containing >=1 query term, no float-ordered cutoff); "
    "the df side and 1-row corpus stats broadcast; ln is the only "
    "libm call, hence the tolerance-mode oracle",
    tol_oracle="""WITH tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM (SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                 AS term
        FROM documents)
  WHERE term IN ('spark', 'table', 'window') GROUP BY 1, 2),
dfr AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
dl AS (SELECT doc_id,
              len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS dl
       FROM documents),
st AS (SELECT COUNT(*) AS N, AVG(dl) AS avgdl FROM dl)
SELECT tf.doc_id,
       SUM(ln(1 + (N - df + 0.5) / (df + 0.5)) * tf * 2.2
           / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))) AS bm25
FROM tf JOIN dfr USING (term)
        JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN st
GROUP BY tf.doc_id ORDER BY tf.doc_id ASC""",
    tolerance=1e-9,
    tol_keys=("doc_id",),
)
def x94_bm25(spark, sf_dir):
    from topn_spark.operators.textstats import bm25_scores

    docs = load_table(spark, sf_dir, "documents")
    return bm25_scores(docs, ["spark", "table", "window"]).orderBy(
        "doc_id"
    )


# ---------------------------------------------------------------- #
# y-series: round-4 second-wave surface (separate prefix so the     #
# driver's first-50 sorted gate window q01..x18 stays stable).      #
# ---------------------------------------------------------------- #


@query(
    "y01_topn_ties_grouped",
    """SELECT l_returnflag, l_orderkey, l_linenumber,
       CAST(l_quantity AS BIGINT) AS qty
FROM (SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
             RANK() OVER (PARTITION BY l_returnflag
                          ORDER BY l_quantity DESC) AS rk
      FROM lineitem)
WHERE rk <= 2
ORDER BY l_returnflag ASC, l_orderkey ASC, l_linenumber ASC""",
    doc="Grouped top-N WITH TIES (operators/topn.py::topn_with_ties): "
    "rank() <= n keeps every row tied at the cut — the semantics the "
    "reference's heap silently truncates; rank() gets the same "
    "WindowGroupLimit map-side cut as row_number()",
)
def y01_topn_ties_grouped(spark, sf_dir):
    from topn_spark.operators.topn import topn_with_ties

    li = load_table(spark, sf_dir, "lineitem")
    return (
        topn_with_ties(li, "l_quantity", 2, group_by="l_returnflag")
        .select(
            "l_returnflag",
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("bigint").alias("qty"),
        )
        .orderBy("l_returnflag", "l_orderkey", "l_linenumber")
    )


@query(
    "y02_topn_ties_global",
    """SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty
FROM (SELECT l_orderkey, l_linenumber, l_quantity,
             RANK() OVER (ORDER BY l_quantity DESC) AS rk
      FROM lineitem)
WHERE rk <= 100
ORDER BY l_orderkey ASC, l_linenumber ASC""",
    doc="Global top-N WITH TIES: the oracle's global rank window "
    "serializes every row through one task, so the engine instead "
    "takes the bounded-heap top-100 (TakeOrderedAndProject), reads "
    "the 100th value as a scalar threshold, and re-scans with a "
    "pushed filter — rank semantics, no global sort, two scale-safe "
    "jobs",
)
def y02_topn_ties_global(spark, sf_dir):
    from topn_spark.operators.topn import topn_with_ties

    li = load_table(spark, sf_dir, "lineitem")
    return (
        topn_with_ties(li, "l_quantity", 100)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("bigint").alias("qty"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "y03_median_mode",
    """WITH c AS (
  SELECT l_returnflag, l_quantity, COUNT(*) AS n
  FROM lineitem GROUP BY 1, 2),
m AS (
  SELECT l_returnflag, l_quantity,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY n DESC, l_quantity ASC) AS rn
  FROM c)
SELECT l.l_returnflag,
       ROUND(median(l.l_quantity), 6) AS med,
       ROUND(quantile_cont(l.l_quantity, 0.25), 6) AS q1,
       ROUND(quantile_cont(l.l_quantity, 0.75), 6) AS q3,
       CAST(MIN(m.l_quantity) AS BIGINT) AS mode_qty
FROM lineitem l
JOIN m ON l.l_returnflag = m.l_returnflag AND m.rn = 1
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag ASC""",
    doc="Exact order statistics per group: interpolated median / "
    "quartiles (Spark percentile <-> DuckDB quantile_cont — both "
    "interpolate (1-g)*lo + g*hi, exact for dyadic inputs) plus a "
    "DETERMINISTIC mode (count-desc, value-asc tiebreak via window "
    "rank over the count table — engines' native mode() breaks ties "
    "arbitrarily, so it can never be oracled)",
)
def y03_median_mode(spark, sf_dir):
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("n").desc(), F.col("l_quantity").asc()
    )
    mode = (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").cast("bigint").alias("mode_qty"),
        )
    )
    stats = li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5D)"), 6).alias("med"),
        F.round(F.expr("percentile(l_quantity, 0.25D)"), 6).alias("q1"),
        F.round(F.expr("percentile(l_quantity, 0.75D)"), 6).alias("q3"),
    )
    return (
        stats.join(F.broadcast(mode), "l_returnflag")
        .select("l_returnflag", "med", "q1", "q3", "mode_qty")
        .orderBy("l_returnflag")
    )


@query(
    "y04_listagg",
    """SELECT s_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       string_agg(s_name, ',' ORDER BY s_name ASC) AS names
FROM supplier
GROUP BY s_nationkey
ORDER BY s_nationkey ASC""",
    doc="Ordered string aggregation (LISTAGG): Spark sorts the "
    "collected array then joins (collect_list is unordered by "
    "contract — array_sort makes it deterministic) <-> DuckDB "
    "string_agg ORDER BY; per-group payload is the scale bound, as "
    "with any collect",
)
def y04_listagg(spark, sf_dir):
    sup = load_table(spark, sf_dir, "supplier")
    return (
        sup.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.array_join(
                F.array_sort(F.collect_list("s_name")), ","
            ).alias("names"),
        )
        .orderBy("s_nationkey")
    )


_Y05_SQL = """SELECT c_custkey, c_nationkey, ROUND(c_acctbal, 2) AS acctbal
FROM customer c
WHERE c_acctbal >= (SELECT MAX(c2.c_acctbal) * 0.9 FROM customer c2
                    WHERE c2.c_nationkey = c.c_nationkey)
ORDER BY c_custkey ASC"""


@query(
    "y05_scalar_subquery",
    _Y05_SQL,
    doc="Correlated SCALAR subquery (identical text on both engines): "
    "customers within 10% of their nation's max balance. Catalyst "
    "decorrelates to an aggregate + join — no per-row re-execution; "
    "MAX is order-insensitive, so the 0.9*max threshold is one exact "
    "IEEE multiply on both engines (an AVG-derived threshold would "
    "be summation-order-dependent and unoracleable)",
)
def y05_scalar_subquery(spark, sf_dir):
    from topn_spark.catalog import register_views

    register_views(spark, sf_dir, ("customer",))
    return spark.sql(_Y05_SQL)


@query(
    "y06_radius_join",
    """WITH p AS (
  SELECT c_custkey AS id,
         CAST(CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 6)
              AS BIGINT) % 1000000 AS DOUBLE) AS x,
         CAST(CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 7, 6)
              AS BIGINT) % 1000000 AS DOUBLE) AS y
  FROM customer)
SELECT a.id AS a_id, b.id AS b_id,
       CAST((a.x - b.x) * (a.x - b.x)
            + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS dist_sq
FROM p a JOIN p b ON a.id < b.id
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 25000000.0
ORDER BY a_id ASC, b_id ASC""",
    doc="Planar within-radius self-join (ranges.py::grid_radius_join): "
    "points at md5-uniform integer coordinates in a 10^6-square "
    "domain (independent x/y hex substrings — a linear-congruential "
    "derivation puts points on a 1-D orbit, and a small modulus "
    "stacks the scaled corpus onto repeated sites, inflating pairs "
    "quadratically); the oracle is the naive O(n^2) theta join, the "
    "engine is the radius-sized grid-cell equi-join (probe explodes "
    "to its 3x3 neighborhood) — same pairs, shuffle-partitioned by "
    "cell, never all-pairs; squared distance on integer-valued "
    "doubles keeps the output hash-exact (no sqrt, no libm)",
)
def y06_radius_join(spark, sf_dir):
    from topn_spark.operators.ranges import grid_radius_join

    cust = load_table(spark, sf_dir, "customer")
    h = F.md5(F.col("c_custkey").cast("string"))
    pts = cust.select(
        F.col("c_custkey").alias("id"),
        (F.conv(F.substring(h, 1, 6), 16, 10).cast("bigint") % 1000000)
        .cast("double")
        .alias("x"),
        (F.conv(F.substring(h, 7, 6), 16, 10).cast("bigint") % 1000000)
        .cast("double")
        .alias("y"),
    )
    return (
        grid_radius_join(pts, "id", "x", "y", 5000.0)
        .select(
            "a_id", "b_id", F.col("dist_sq").cast("bigint").alias("dist_sq")
        )
        .orderBy("a_id", "b_id")
    )


def _y07_kmeans_exact(con):
    """NumPy mirror of kmeans_lloyd's deterministic contract (init =
    k lowest vec_ids, first-min argmin, empty cluster keeps its
    centroid, 5 rounds) — float64 throughout, so the only divergence
    from Spark is summation order (~1e-15 rel)."""
    import numpy as np

    rows = con.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id"
    ).fetchall()
    V = np.array([r[1] for r in rows], dtype=np.float32).astype(np.float64)
    k, iters = 10, 5
    C = V[:k].copy()
    for _ in range(iters):
        d = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for c in range(k):
            m = V[a == c]
            if len(m):
                C[c] = m.mean(axis=0)
    d = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    a = d.argmin(axis=1)
    dm = d.min(axis=1)
    out = [
        (c, int((a == c).sum()), float(dm[a == c].sum()))
        for c in range(k)
        if (a == c).any()
    ]
    return ["cluster", "n", "inertia"], out


@query(
    "y07_kmeans",
    None,
    doc="Distributed Lloyd's k-means, k=10 x 5 rounds over the 64-dim "
    "embeddings (similarity.py::kmeans_lloyd): per round one map-only "
    "assignment pass (k x d centroid literals) + one map-side-combined "
    "(cluster, dim) sum — the driver holds the k x d model only, the "
    "MLlib shape. Tolerance oracle: a NumPy replay of the identical "
    "deterministic contract; per-cluster size and inertia within 1e-6",
    tol_oracle=_y07_kmeans_exact,
    tolerance=1e-6,
    tol_keys=("cluster",),
)
def y07_kmeans(spark, sf_dir):
    from topn_spark.operators.similarity import kmeans_lloyd

    emb = load_table(spark, sf_dir, "embeddings")
    return (
        kmeans_lloyd(emb, 10, iters=5)
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("dist_sq").alias("inertia"),
        )
        .orderBy("cluster")
    )


@query(
    "y08_cross_corpus_dedup",
    """WITH base AS (SELECT text FROM documents WHERE doc_id % 2 = 0),
newd AS (SELECT doc_id, source, text FROM documents WHERE doc_id % 2 = 1)
SELECT n.doc_id, n.source FROM newd n
WHERE NOT EXISTS (SELECT 1 FROM base b WHERE MD5(b.text) = MD5(n.text))
ORDER BY n.doc_id ASC""",
    doc="Cross-corpus exact dedup gate (dedup.py::dedup_against): new "
    "crawl (odd doc_ids) anti-joined on content digest against the "
    "existing corpus (even doc_ids) — 16-byte keys shuffle, never "
    "text; the incremental-ingest admission step before near-dup "
    "passes",
)
def y08_cross_corpus_dedup(spark, sf_dir):
    from topn_spark.operators.dedup import dedup_against

    docs = load_table(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)
    return (
        dedup_against(new, base, subset=["text"])
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


@query(
    "y09_bigram_fluency",
    """WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
  FROM documents),
pos AS (
  SELECT doc_id, unnest(generate_series(1, len(t) - 1)) AS i, t
  FROM toks WHERE len(t) >= 2),
big AS (SELECT doc_id, t[i] || ' ' || t[i + 1] AS bg FROM pos),
cnt AS (SELECT bg, COUNT(*) AS c FROM big GROUP BY bg)
SELECT big.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(CAST(SUM(c) AS BIGINT) / COUNT(*), 6) AS fluency
FROM big JOIN cnt USING (bg)
GROUP BY big.doc_id
ORDER BY big.doc_id ASC""",
    doc="Corpus bigram-frequency fluency score (textstats.py::"
    "bigram_fluency): mean corpus count of each doc's word bigrams — "
    "a zero-model LM-perplexity proxy; word-count-shaped agg + a "
    "zipf-skewed join back on the bigram (AQE skew split at scale); "
    "SUM/COUNT is one bigint/bigint IEEE division, hash-exact",
)
def y09_bigram_fluency(spark, sf_dir):
    from topn_spark.operators.textstats import bigram_fluency

    docs = load_table(spark, sf_dir, "documents")
    return bigram_fluency(docs).orderBy("doc_id")


@query(
    "y10_corpus_pipeline",
    f"""WITH q AS (
  SELECT doc_id, source, text,
    ROUND(CAST(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
          / NULLIF(CAST(LENGTH(text) AS DOUBLE), 0), 6) AS alpha_ratio,
    ROUND(CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[^ ]', '', 'g')) AS DOUBLE)
          / NULLIF(CAST(len({_TOKS_DUCK}) AS DOUBLE), 0), 6) AS mean_word_len,
    len({_TOKS_DUCK}) AS nt
  FROM documents),
k AS (
  SELECT doc_id, source, text FROM q
  WHERE nt >= 10 AND alpha_ratio >= 0.6
    AND mean_word_len BETWEEN 2.0 AND 12.0),
d AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY MD5(text)
                            ORDER BY doc_id ASC) AS dup_rn
  FROM k),
c AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rn
  FROM d WHERE dup_rn = 1)
SELECT doc_id, source FROM c WHERE rn <= 25
ORDER BY source ASC, doc_id ASC""",
    doc="END-TO-END training-corpus admission pipeline, composed from "
    "the engine's own operators: Gopher-style quality gate "
    "(textstats.add_quality) -> exact content dedup keeping the "
    "lowest doc_id (dedup_exact) -> deterministic per-source cap of "
    "25 (sample_k_per_group md5-rank). Three stages, three shuffles "
    "(16-byte digest, then source key), every cut map-side-bounded; "
    "the oracle replays the identical composition in one SQL text",
)
def y10_corpus_pipeline(spark, sf_dir):
    from topn_spark.operators.dedup import dedup_exact
    from topn_spark.operators.pipeline import sample_k_per_group
    from topn_spark.operators.textstats import add_quality

    docs = load_table(spark, sf_dir, "documents")
    kept = (
        add_quality(docs)
        .where(F.col("quality_keep"))
        .select("doc_id", "source", "text")
    )
    unique = dedup_exact(kept, subset=["text"], tiebreak=["doc_id"])
    capped = sample_k_per_group(unique, ["source"], 25, "doc_id")
    return capped.select("doc_id", "source").orderBy("source", "doc_id")


@query(
    "y11_cms_point_counts",
    None,
    doc="Count-min-sketch token point queries (textstats.py::"
    "cms_token_counts): one mergeable-sketch aggregate pass over the "
    "token stream -> fixed (2/eps x ln(1/(1-conf))) counter grid on "
    "the driver, point estimates overshoot-only by <= eps*N; exact "
    "word-count oracle under 5% tolerance (same bar as the approx "
    "top-k entry x57)",
    tol_oracle=f"""WITH t AS (
  SELECT unnest({_TOKS_DUCK}) AS term FROM documents)
SELECT term, CAST(COUNT(*) AS BIGINT) AS est
FROM t WHERE term IN ('join', 'hash', 'scan', 'filter', 'vector')
GROUP BY term ORDER BY term ASC""",
    tolerance=0.05,
    tol_keys=("term",),
)
def y11_cms_point_counts(spark, sf_dir):
    from topn_spark.operators.textstats import cms_token_counts

    docs = load_table(spark, sf_dir, "documents")
    return cms_token_counts(
        docs, ["join", "hash", "scan", "filter", "vector"]
    ).orderBy("term")


def _y12_semdedup_exact(con):
    """NumPy mirror of semantic_dedup's full pipeline: the kmeans_lloyd
    deterministic contract (see _y07_kmeans_exact), then inside each
    cluster drop every vector with a >= 0.4-cosine neighbor of smaller
    id. Kept-set equality is the check (no float columns — cluster ids
    are exact ints; the 0.4 threshold sits in a ~0.05-wide gap of the
    cosine distribution, far beyond float noise)."""
    import numpy as np

    rows = con.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id"
    ).fetchall()
    ids = [r[0] for r in rows]
    V = np.array([r[1] for r in rows], dtype=np.float32).astype(np.float64)
    k, iters = 10, 5
    C = V[:k].copy()
    for _ in range(iters):
        d = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for c in range(k):
            m = V[a == c]
            if len(m):
                C[c] = m.mean(axis=0)
    d = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    a = d.argmin(axis=1)
    U = V / np.linalg.norm(V, axis=1, keepdims=True)
    out = []
    for i, vid in enumerate(ids):
        dropped = False
        for j in range(i):
            if a[j] == a[i] and float(U[i] @ U[j]) >= 0.4:
                dropped = True
                break
        if not dropped:
            out.append((vid, int(a[i])))
    return ["vec_id", "cluster"], out


@query(
    "y12_semantic_dedup",
    None,
    doc="SemDeDup-style semantic dedup (similarity.py::semantic_dedup, "
    "arXiv:2303.09540): k-means clusters block the candidate space, "
    "one per-cluster equi-join generates pairs (never all-pairs), and "
    "the order-free rule 'drop if a smaller-id neighbor has cosine "
    ">= t' makes the kept set deterministic; NumPy mirror oracle "
    "checks kept-set equality exactly",
    tol_oracle=_y12_semdedup_exact,
    tolerance=0.0,
    tol_keys=("vec_id",),
)
def y12_semantic_dedup(spark, sf_dir):
    from topn_spark.operators.similarity import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, k=10, iters=5, threshold=0.4).orderBy(
        "vec_id"
    )


_Y13_SQL = """SELECT o_orderpriority, o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01'
GROUP BY ALL
ORDER BY ALL"""


@query(
    "y13_group_by_all",
    _Y13_SQL,
    doc="GROUP BY ALL / ORDER BY ALL (Spark 4 SQL sugar, DuckDB "
    "dialect-identical): the analyzer derives the grouping set from "
    "the non-aggregate select items — identical text on both "
    "engines, same partial+final hash aggregate underneath",
)
def y13_group_by_all(spark, sf_dir):
    from topn_spark.catalog import register_views

    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_Y13_SQL)


@query(
    "y14_vocab_oov",
    f"""WITH toks AS (
  SELECT doc_id, unnest({_TOKS_DUCK}) AS term FROM documents),
vocab AS (
  SELECT term FROM (
    SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term)
  WHERE df >= 50),
j AS (
  SELECT t.doc_id, t.term, v.term IS NOT NULL AS in_vocab
  FROM toks t LEFT JOIN vocab v ON t.term = v.term)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN in_vocab THEN 0 ELSE 1 END) AS BIGINT) AS n_oov,
       ROUND(CAST(SUM(CASE WHEN in_vocab THEN 0 ELSE 1 END) AS BIGINT)
             / COUNT(*), 6) AS oov_rate
FROM j GROUP BY doc_id ORDER BY doc_id ASC""",
    doc="Vocabulary build + per-doc OOV rate (textstats.py::"
    "vocab_oov_rates): vocab = tokens in >= min_df distinct docs "
    "(min_df=50 here so the synthetic corpus actually has OOV mass); "
    "doc-token stream left-joined against the vocab (broadcast-able "
    "after the cut) and re-aggregated per doc — the tokenizer-prep "
    "QC gate; single IEEE division, hash-exact",
)
def y14_vocab_oov(spark, sf_dir):
    from topn_spark.operators.textstats import vocab_oov_rates

    docs = load_table(spark, sf_dir, "documents")
    return vocab_oov_rates(docs, min_df=50).orderBy("doc_id")


@query(
    "y15_video_frame_times",
    """WITH f AS (
  SELECT doc_id, unnest(generate_series(0, 4)) AS frame_idx
  FROM documents WHERE doc_id < 150),
c AS (
  SELECT doc_id, frame_idx,
    CASE WHEN frame_idx <= 3 THEN frame_idx * 50 * (1 + doc_id % 3)
         ELSE 3 * 50 * (1 + doc_id % 3) + (frame_idx - 3) * 200
    END AS cum
  FROM f)
SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
       CAST(cum * 1000 // (500 * (1 + doc_id % 2)) AS BIGINT) AS t_ms
FROM c ORDER BY doc_id ASC, frame_idx ASC""",
    doc="REAL video frame timing, oracled (multimodal.py::"
    "video_frame_times): planted ISO-BMFF containers carry an actual "
    "trak/mdia/mdhd + minf/stbl/stts chain (run-length sample deltas "
    "over a per-doc media timescale); the pure-stdlib box walk "
    "run-length-decodes frame start times distributed via mapInPandas "
    "fan-out, and the oracle recomputes every t_ms arithmetically "
    "from doc_id — frame sampling's metadata half made real (pixel "
    "extraction stays sample_frames' fail-fast contract)",
)
def y15_video_frame_times(spark, sf_dir):
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from topn_spark.operators.multimodal import (
        encode_mp4_with_track,
        video_frame_times,
    )

    @pandas_udf(T.BinaryType())
    def planted_mp4(doc_ids):
        import pandas as pd

        out = []
        for d in doc_ids:
            d = int(d)
            out.append(
                encode_mp4_with_track(
                    600,
                    500 * (1 + d % 2),
                    [(3, 50 * (1 + d % 3)), (2, 200)],
                    version=d % 2,
                )
            )
        return pd.Series(out)

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 150
    )
    assets = docs.select(
        "doc_id", planted_mp4("doc_id").alias("payload")
    )
    return video_frame_times(assets).orderBy("doc_id", "frame_idx")


def _y16_cov_exact(con):
    """NumPy np.cov mirror (float32 inputs widened to float64, sample
    denominator n-1) for the Arrow-batched partial-moment covariance."""
    import numpy as np

    rows = con.execute(
        "SELECT embedding FROM embeddings ORDER BY vec_id"
    ).fetchall()
    V = np.array([r[0] for r in rows], dtype=np.float32).astype(np.float64)
    C = np.cov(V, rowvar=False, ddof=1)
    d = V.shape[1]
    out = [(i, j, float(C[i, j])) for i in range(d) for j in range(d)]
    return ["i", "j", "cov"], out


@query(
    "y16_embedding_covariance",
    None,
    doc="Embedding covariance matrix (similarity.py::"
    "embedding_covariance) — the PCA/whitening moment computation: "
    "one Arrow-batched mapInPandas pass emits a partial (n, sum_x, "
    "X^T X) row per batch (one BLAS call each); the driver combines "
    "#partitions x d^2 partials — model-sized, never data — into the "
    "closed-form sample covariance. NumPy np.cov mirror at 1e-9",
    tol_oracle=_y16_cov_exact,
    tolerance=1e-9,
    tol_keys=("i", "j"),
)
def y16_embedding_covariance(spark, sf_dir):
    from topn_spark.operators.similarity import embedding_covariance

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_covariance(emb).orderBy("i", "j")


@query(
    "y17_hashed_features",
    f"""WITH t AS (
  SELECT doc_id, unnest({_TOKS_DUCK}) AS term FROM documents)
SELECT doc_id,
       CAST(CAST('0x' || substr(md5(term), 1, 8) AS BIGINT) % 64 AS INT)
         AS bucket,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM t GROUP BY 1, 2
ORDER BY doc_id ASC, bucket ASC""",
    doc="Feature hashing / hashing trick (textstats.py::"
    "hashed_features): bag-of-words folded into 64 buckets via a "
    "portable md5 bucket hash — vocabulary-free sparse featurization "
    "(no vocab state to build or broadcast; fixed feature space "
    "forever); one explode + map-side-combined count agg, hash-exact",
)
def y17_hashed_features(spark, sf_dir):
    from topn_spark.operators.textstats import hashed_features

    docs = load_table(spark, sf_dir, "documents")
    return hashed_features(docs, n_buckets=64).orderBy(
        "doc_id", "bucket"
    )


@query(
    "y18_dup_ngram_coverage",
    """WITH grams AS (
  SELECT doc_id, unnest(list_distinct(
      list_transform(range(1, len(toks) - 3),
        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2],
                       toks[i+3], toks[i+4])))) AS sh
  FROM (SELECT doc_id,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        FROM documents)
  WHERE len(toks) >= 5),
c AS (SELECT sh, COUNT(*) AS n_docs FROM grams GROUP BY sh)
SELECT g.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN c.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS dup_shingles,
       CAST(SUM(CASE WHEN c.n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS dup_frac
FROM grams g JOIN c USING (sh)
GROUP BY g.doc_id ORDER BY g.doc_id ASC""",
    doc="Duplicated-passage coverage (textstats.py::"
    "duplicate_ngram_coverage, arXiv:2107.06499): fraction of each "
    "doc's distinct word 5-gram shingles occurring in >= 2 docs "
    "corpus-wide — the doc-removal signal of exact-substring dedup; "
    "explode -> shingle-keyed count agg -> join back -> per-doc agg, "
    "never all-pairs; dup_frac is one IEEE division, hash-exact",
)
def y18_dup_ngram_coverage(spark, sf_dir):
    from topn_spark.operators.textstats import duplicate_ngram_coverage

    docs = load_table(spark, sf_dir, "documents")
    return duplicate_ngram_coverage(docs, n=5, min_docs=2).orderBy(
        "doc_id"
    )


@query(
    "y19_welch_ttest",
    """WITH s AS (
  SELECT event_type,
    COUNT(CASE WHEN user_id % 2 = 0 THEN value END) AS n_t,
    ROUND(AVG(CASE WHEN user_id % 2 = 0 THEN value END), 6) AS m_t,
    ROUND(VAR_SAMP(CASE WHEN user_id % 2 = 0 THEN value END), 6) AS v_t,
    COUNT(CASE WHEN user_id % 2 <> 0 THEN value END) AS n_c,
    ROUND(AVG(CASE WHEN user_id % 2 <> 0 THEN value END), 6) AS m_c,
    ROUND(VAR_SAMP(CASE WHEN user_id % 2 <> 0 THEN value END), 6) AS v_c
  FROM events GROUP BY event_type)
SELECT event_type, CAST(n_t AS BIGINT) AS n_t,
       CAST(n_c AS BIGINT) AS n_c, m_t, m_c,
       ROUND(CASE WHEN n_t >= 2 AND n_c >= 2
                   AND v_t / n_t + v_c / n_c > 0
         THEN (m_t - m_c) / sqrt(v_t / n_t + v_c / n_c) END, 6)
         AS t_stat,
       ROUND(CASE WHEN n_t >= 2 AND n_c >= 2
                   AND v_t / n_t + v_c / n_c > 0
         THEN ((v_t / n_t + v_c / n_c) * (v_t / n_t + v_c / n_c))
              / ((v_t / n_t) * (v_t / n_t) / (n_t - 1)
                 + (v_c / n_c) * (v_c / n_c) / (n_c - 1)) END, 6)
         AS dof
FROM s ORDER BY event_type ASC""",
    doc="Group-wise Welch two-sample t-test (diag.py::welch_ttest): "
    "continuous-metric A/B readout per event_type, even-vs-odd "
    "user_id arms; one conditional-agg scan emits six moments per "
    "group, closed-form t + Welch-Satterthwaite dof on the moment "
    "row; moments rounded before the closed form so both engines "
    "compute from identical doubles — hash-exact",
)
def y19_welch_ttest(spark, sf_dir):
    from topn_spark.diag import welch_ttest

    ev = load_table(spark, sf_dir, "events")
    return welch_ttest(
        ev, "event_type", F.col("user_id") % 2 == 0, "value"
    ).orderBy("event_type")


@query(
    "y20_robust_zscore",
    """WITH m AS (
  SELECT event_type, ROUND(quantile_cont(value, 0.5), 6) AS med
  FROM events GROUP BY event_type),
s AS (
  SELECT e.event_type, ANY_VALUE(m.med) AS med,
         ROUND(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad
  FROM events e JOIN m USING (event_type) GROUP BY e.event_type)
SELECT e.event_id, e.event_type, e.value, s.med, s.mad,
       CASE WHEN s.mad > 0
         THEN (e.value - s.med) / (1.4826 * s.mad) END AS value_rz
FROM events e JOIN s USING (event_type)
ORDER BY e.event_id ASC LIMIT 500""",
    doc="Robust z-score via median/MAD (pipeline.py::robust_zscore): "
    "outlier-resistant per-group standardization — three hash-agg "
    "passes (median, median abs deviation, map-only scale), zero "
    "window sorts; medians rounded before the scale so both engines "
    "divide identical doubles (percentile <-> quantile_cont); "
    "MAD=0 -> NULL; hash-exact",
)
def y20_robust_zscore(spark, sf_dir):
    from topn_spark.operators.pipeline import robust_zscore

    ev = load_table(spark, sf_dir, "events")
    return (
        robust_zscore(ev, "value", ["event_type"])
        .select(
            "event_id", "event_type", "value", "med", "mad",
            "value_rz",
        )
        .orderBy("event_id")
        .limit(500)
    )


@query(
    "y21_mixture_sample",
    """WITH r AS (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents WHERE source IN ('src0', 'src1', 'src2', 'src3'))
SELECT source, doc_id, CAST(rn AS BIGINT) AS rn
FROM r
WHERE rn <= CASE source WHEN 'src0' THEN 20 WHEN 'src1' THEN 12
                        WHEN 'src2' THEN 6 ELSE 2 END
ORDER BY source ASC, rn ASC""",
    doc="Dataset-mixture sampling (pipeline.py::mixture_sample): "
    "deterministic md5-rank draw whose per-source counts follow "
    "configured mixture weights (50/30/15/5 of 40) — the corpus "
    "domain-proportion step; literal max-quota rank cut runs "
    "map-side (WindowGroupLimit), per-group quota is a residual "
    "literal CASE filter; quotas computed driver-side from config, "
    "hash-exact",
)
def y21_mixture_sample(spark, sf_dir):
    from topn_spark.operators.pipeline import mixture_sample

    docs = load_table(spark, sf_dir, "documents")
    out = mixture_sample(
        docs,
        {"src0": 0.5, "src1": 0.3, "src2": 0.15, "src3": 0.05},
        total=40,
        rank_col="rn",
    )
    return out.select("source", "doc_id", "rn").orderBy("source", "rn")


def _y22_pq_exact(con):
    """NumPy mirror of the full PQ pipeline: train codebooks on the
    128 smallest-id vectors (first-rows init, 10 Lloyd rounds, ties
    to lowest index), encode every vector, ADC-score vs the vec_id-0
    query, keep the 20 smallest (id tiebreak). All arithmetic is the
    same float64 op sequence as the operator's NumPy kernels, so the
    distances agree to 1e-9."""
    import numpy as np

    rows = con.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    V = np.array([r[1] for r in rows], dtype=np.float64)
    m, ksub, iters = 8, 16, 10
    dsub = V.shape[1] // m
    T = V[:128]
    books = np.empty((m, ksub, dsub))
    for j in range(m):
        X = T[:, j * dsub : (j + 1) * dsub]
        C = X[:ksub].copy()
        for _ in range(iters):
            d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = d.argmin(axis=1)
            for c in range(ksub):
                mem = X[a == c]
                if len(mem):
                    C[c] = mem.mean(axis=0)
        books[j] = C
    codes = np.empty((len(V), m), dtype=np.int64)
    for j in range(m):
        X = V[:, j * dsub : (j + 1) * dsub]
        d = ((X[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = d.argmin(axis=1)
    q = V[int(np.nonzero(ids == 0)[0][0])]
    lut = np.empty((m, ksub))
    for j in range(m):
        lut[j] = ((books[j] - q[j * dsub : (j + 1) * dsub]) ** 2).sum(
            axis=1
        )
    dist = lut[np.arange(m)[None, :], codes].sum(axis=1)
    order = sorted(range(len(V)), key=lambda i: (dist[i], ids[i]))[:20]
    return ["vec_id", "adc_dist"], [
        (int(ids[i]), float(dist[i])) for i in order
    ]


@query(
    "y22_pq_ann",
    None,
    doc="Product-quantization ANN (similarity.py::pq_topk, Jégou et "
    "al. 2011): codebooks trained driver-side on a 128-row "
    "deterministic sample (model state, not data state), corpus "
    "encoded to m=8 4-bit codes in one Arrow pass (32x storage cut "
    "— queries scan codes, not embeddings), ADC top-20 vs the "
    "vec_id-0 query via a model-sized lookup table + "
    "TakeOrderedAndProject; full-pipeline NumPy mirror at 1e-9",
    tol_oracle=_y22_pq_exact,
    tolerance=1e-9,
    tol_keys=("vec_id",),
)
def y22_pq_ann(spark, sf_dir):
    from topn_spark.operators.similarity import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return pq_topk(
        emb, k=20, m=8, nbits=4, train_rows=128, query_id=0
    )


@query(
    "y23_asof_nearest",
    """WITH b AS (
  SELECT o_custkey, o_orderdate, arg_max(o_totalprice, o_orderkey) AS last_price
  FROM orders GROUP BY o_custkey, o_orderdate
), p AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type = 'purchase'
), j AS (
  SELECT p.event_id, b.o_orderdate, b.last_price,
         ROW_NUMBER() OVER (PARTITION BY p.event_id
           ORDER BY abs(epoch(p.ts) - epoch(b.o_orderdate)) ASC,
                    b.o_orderdate ASC) AS rn
  FROM p LEFT JOIN b ON p.user_id = b.o_custkey)
SELECT event_id, o_orderdate AS near_order_date, last_price
FROM j WHERE rn = 1 ORDER BY event_id ASC""",
    doc="Nearest-direction as-of join (asof.py::asof_join, "
    "direction='nearest' — pandas merge_asof parity): both "
    "directional candidates carried in ONE keyed union (one shuffle, "
    "two within-partition sorts), winner picked row-locally by "
    "absolute gap with backward tie; oracle ranks the per-probe "
    "candidate set by gap in plain SQL",
)
def y23_asof_nearest(spark, sf_dir):
    from topn_spark.operators.asof import asof_join

    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    probe = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    build = (
        orders.groupBy("o_custkey", "o_orderdate")
        .agg(F.max_by("o_totalprice", "o_orderkey").alias("last_price"))
        .withColumn("near_order_date", F.col("o_orderdate"))
    )
    out = asof_join(
        probe,
        build,
        left_on="ts",
        right_on="o_orderdate",
        left_by="user_id",
        right_by="o_custkey",
        value_cols=["near_order_date", "last_price"],
        direction="nearest",
    )
    return out.select(
        "event_id", "near_order_date", "last_price"
    ).orderBy("event_id")


@query(
    "y24_join_size_estimate",
    """WITH sl AS (
  SELECT o_custkey AS k FROM orders
  WHERE substr(md5(CAST(o_custkey AS VARCHAR)), 1, 1) IN
        ('0', '1', '2', '3')),
sr AS (
  SELECT c_custkey AS k FROM customer
  WHERE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1) IN
        ('0', '1', '2', '3'))
SELECT CAST(COUNT(*) AS BIGINT) AS sampled_pairs,
       0.25 AS p,
       COUNT(*) / 0.25 AS est_pairs
FROM sl JOIN sr USING (k)""",
    doc="Join-size estimation by correlated key sampling (diag.py::"
    "join_size_estimate): both sides keep a key iff md5 first hex "
    "digit < 4 — same deterministic predicate, so pairs survive at "
    "rate p (not p²) and |sample join|/p is unbiased; the 100 TB "
    "pre-flight that sizes shuffle volume and output blowup from a "
    "quarter-keyspace probe; hash-exact",
)
def y24_join_size_estimate(spark, sf_dir):
    from topn_spark.diag import join_size_estimate

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return join_size_estimate(orders, customer, "o_custkey", "c_custkey")


@query(
    "y25_table_diff",
    """WITH old AS (
  SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
  WHERE o_orderkey % 3 <> 0),
new AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 2 = 0 THEN '9-RESTATED'
              ELSE o_orderpriority END AS o_orderpriority
  FROM orders WHERE o_orderkey % 5 <> 0),
od AS (SELECT o_orderkey, md5(concat_ws(chr(31),
         coalesce(CAST(o_orderstatus AS VARCHAR), chr(0)),
         coalesce(CAST(o_orderpriority AS VARCHAR), chr(0)))) AS d
       FROM old),
nd AS (SELECT o_orderkey, md5(concat_ws(chr(31),
         coalesce(CAST(o_orderstatus AS VARCHAR), chr(0)),
         coalesce(CAST(o_orderpriority AS VARCHAR), chr(0)))) AS d
       FROM new)
SELECT CASE WHEN nd.d IS NULL THEN 'removed'
            WHEN od.d IS NULL THEN 'added'
            WHEN od.d <> nd.d THEN 'changed'
            ELSE 'unchanged' END AS status,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(COALESCE(od.o_orderkey, nd.o_orderkey)) AS BIGINT)
         AS min_key
FROM od FULL OUTER JOIN nd USING (o_orderkey)
GROUP BY 1 ORDER BY status ASC""",
    doc="Table snapshot diff (pipeline.py::table_diff): per-key "
    "added/removed/changed/unchanged between two versions — each "
    "side reduces to (key, md5 digest) BEFORE the single full-outer "
    "join, so the shuffle carries 16-byte digests, never payloads; "
    "the ingest-validation / incremental-refresh primitive; "
    "hash-exact",
)
def y25_table_diff(spark, sf_dir):
    from topn_spark.operators.pipeline import table_diff

    orders = load_table(spark, sf_dir, "orders")
    old = orders.where(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    new = orders.where(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 2 == 0, F.lit("9-RESTATED"))
        .otherwise(F.col("o_orderpriority"))
        .alias("o_orderpriority"),
    )
    return (
        table_diff(old, new, ["o_orderkey"])
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_orderkey").alias("min_key"),
        )
        .orderBy("status")
    )


#: fixed demo BPE merge table (rank = position): common English pairs.
_BPE_MERGES = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("a", "t"), ("e", "n"),
    ("o", "r"), ("e", "s"), ("t", "i"), ("s", "t"), ("a", "r"),
    ("a", "l"), ("o", "u"), ("i", "s"), ("i", "t"), ("l", "e"),
    ("in", "g"), ("ti", "on"), ("e", "d"), ("c", "o"), ("d", "e"),
]


def _y26_bpe_exact(con):
    """Independent mirror of the apply_bpe contract: per word, loop —
    find the MIN-rank adjacent pair (leftmost on rank ties), merge
    that single occurrence, rescan — until no merge applies. Same
    word rule ([a-z0-9]+ on lowercased text)."""
    import re as _re

    ranks = {p: i for i, p in enumerate(_BPE_MERGES)}
    wr = _re.compile("[a-z0-9]+")

    def enc_len(word):
        parts = list(word)
        while True:
            cands = [
                (ranks[(parts[i], parts[i + 1])], i)
                for i in range(len(parts) - 1)
                if (parts[i], parts[i + 1]) in ranks
            ]
            if not cands:
                return len(parts)
            _, i = min(cands)
            parts = (
                parts[:i] + [parts[i] + parts[i + 1]] + parts[i + 2 :]
            )

    rows = con.execute(
        "SELECT doc_id, text FROM documents ORDER BY doc_id"
    ).fetchall()
    out = []
    for did, text in rows:
        words = wr.findall((text or "").lower())
        out.append(
            (did, len(words), sum(enc_len(w) for w in words))
        )
    return ["doc_id", "n_words", "n_bpe_tokens"], out


@query(
    "y26_bpe_tokenize",
    None,
    doc="BPE tokenizer application (textstats.py::apply_bpe, Sennrich "
    "et al. 2016): apply a fixed 25-merge table per word (min-rank "
    "pair first, leftmost on ties) — exact trained-tokenizer token "
    "counts, not the regex proxy; one map-only Arrow pass, merge "
    "table as closure model state; independent pure-Python mirror "
    "oracle, exact",
    tol_oracle=_y26_bpe_exact,
    tolerance=0.0,
    tol_keys=("doc_id",),
)
def y26_bpe_tokenize(spark, sf_dir):
    from topn_spark.operators.textstats import apply_bpe

    docs = load_table(spark, sf_dir, "documents")
    return apply_bpe(docs, _BPE_MERGES).orderBy("doc_id")


@query(
    "y27_bfs_hops",
    """WITH RECURSIVE e AS (
  SELECT user_id AS src, event_id % 50 + 1000 AS dst FROM events),
und AS (
  SELECT src AS a, dst AS b FROM e
  UNION SELECT dst AS a, src AS b FROM e),
walk (id, hops) AS (
  SELECT CAST(1 AS BIGINT) AS id, 0 AS hops
  UNION
  SELECT u.b AS id, w.hops + 1 AS hops
  FROM walk w JOIN und u ON u.a = w.id WHERE w.hops < 3)
SELECT id, CAST(MIN(hops) AS INT) AS hops
FROM walk GROUP BY id ORDER BY id ASC""",
    doc="BFS hop distance (graph.py::bfs_hops): level-synchronous "
    "frontier expansion over the user-item interaction graph from "
    "seed user 1, 3 hops — per hop one frontier⋈adjacency equi-join "
    "+ settled anti-join, driver sees only the termination scalar; "
    "integer output hash-matches a recursive-CTE oracle exactly "
    "(contrast the float iterative ops)",
)
def y27_bfs_hops(spark, sf_dir):
    from topn_spark.operators.graph import bfs_hops

    ev = load_table(spark, sf_dir, "events")
    edges = ev.select(
        F.col("user_id").alias("src"),
        (F.col("event_id") % 50 + 1000).alias("dst"),
    )
    out = bfs_hops(edges, [1], max_hops=3)
    return out.select(
        "id", F.col("hops").cast("int").alias("hops")
    ).orderBy("id")


def _y28_pysource_exact(con):
    """Independent regeneration of the synthetic_docs source output
    (seed 7, n 300) + the same per-source rollup, in plain Python —
    proves the custom DataSource's planning/read path end-to-end:
    every row is a pure function of (seed, doc_id)."""
    import hashlib

    vocab = (
        "the quick brown fox jumps over lazy dog join hash scan "
        "filter vector data spark query plan shuffle broadcast "
        "partition merge sort agg window stream batch token corpus "
        "model train split und der die das le la et los el que is "
        "in on at"
    ).split()
    langs = ("en", "de", "fr", "es")

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    agg = {}
    for doc_id in range(300):
        base = h(f"7:{doc_id}")
        n_words = 5 + base % 60
        text = " ".join(
            vocab[h(f"7:{doc_id}:{i}") % len(vocab)]
            for i in range(n_words)
        )
        src = f"src{(base >> 16) % 8}"
        n, chars, words = agg.get(src, (0, 0, 0))
        agg[src] = (n + 1, chars + len(text), words + n_words)
    out = [
        (s, n, chars, words) for s, (n, chars, words) in agg.items()
    ]
    out.sort()
    return ["source", "n_docs", "total_chars", "total_words"], out


@query(
    "y28_python_datasource",
    None,
    doc="Custom Python DataSource (sources/pydatasource.py, Spark 4 "
    "pyspark.sql.datasource API): deterministic synthetic-documents "
    "generator with PARTITIONED planning (one InputPartition per "
    "slice — generation fans out like a parquet scan); entry reads "
    "seed-7/n-300 through the registered format and rolls up per "
    "source; independent pure-Python regeneration oracle, exact",
    tol_oracle=_y28_pysource_exact,
    tolerance=0.0,
    tol_keys=("source",),
)
def y28_python_datasource(spark, sf_dir):
    from topn_spark.operators.textstats import token_count
    from topn_spark.sources.pydatasource import register

    register(spark)
    df = (
        spark.read.format("synthetic_docs")
        .option("n", 300)
        .option("parts", 8)
        .option("seed", 7)
        .load()
    )
    return (
        df.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(token_count("text")).alias("total_words"),
        )
        .orderBy("source")
    )


@query(
    "y29_ohlc_bars",
    """WITH pts AS (
  SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, MIN(value) AS v
  FROM events WHERE value IS NOT NULL
  GROUP BY event_type, CAST(ts AS TIMESTAMP)),
bars AS (
  SELECT event_type, date_trunc('hour', ts) AS bar,
         arg_min(v, ts) AS open, MAX(v) AS high, MIN(v) AS low,
         arg_max(v, ts) AS close, CAST(COUNT(*) AS BIGINT) AS n
  FROM pts GROUP BY event_type, date_trunc('hour', ts))
SELECT * FROM bars ORDER BY event_type ASC, bar ASC LIMIT 300""",
    doc="Time-bucketed OHLC bars (pipeline.py::ohlc_bars): per-key "
    "hourly open/high/low/close via min_by/max_by over the timestamp "
    "— ONE hash aggregate, no window sort; series pre-aggregated to "
    "unique (key, ts) so open/close picks are deterministic; values "
    "pass through unchanged, hash-exact",
)
def y29_ohlc_bars(spark, sf_dir):
    from topn_spark.operators.pipeline import ohlc_bars

    ev = load_table(spark, sf_dir, "events")
    pts = (
        ev.where(F.col("value").isNotNull())
        .groupBy("event_type", "ts")
        .agg(F.min("value").alias("v"))
    )
    return (
        ohlc_bars(pts, "ts", "v", ["event_type"], bucket="hour")
        .orderBy("event_type", "bar")
        .limit(300)
    )


@query(
    "y30_cohens_kappa",
    """WITH pairs AS (
  SELECT lang AS a,
         (['en', 'de', 'fr', 'es'])[
           CAST(CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) % 4
                AS INT) + 1] AS b
  FROM documents),
cells AS (SELECT a, b, COUNT(*) AS c FROM pairs GROUP BY a, b),
po AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
              CAST(SUM(CASE WHEN a = b THEN c ELSE 0 END) AS DOUBLE)
                / SUM(c) AS p_o
       FROM cells),
ma AS (SELECT a AS k, SUM(c) AS na FROM cells GROUP BY a),
mb AS (SELECT b AS k, SUM(c) AS nb FROM cells GROUP BY b),
nt AS (SELECT SUM(c) AS ntot FROM cells),
pe AS (SELECT SUM((COALESCE(na, 0) / ntot) * (COALESCE(nb, 0) / ntot))
                AS p_e
       FROM ma FULL OUTER JOIN mb USING (k), nt)
SELECT po.n, ROUND(po.p_o, 6) AS p_o, ROUND(pe.p_e, 6) AS p_e,
       ROUND(CASE WHEN pe.p_e < 1.0
         THEN (po.p_o - pe.p_e) / (1.0 - pe.p_e) END, 6) AS kappa
FROM po, pe""",
    doc="Cohen's kappa (diag.py::cohens_kappa): chance-corrected "
    "agreement between the declared lang column and a deterministic "
    "md5-bucket pseudo-annotator — the annotator-QC readout; one "
    "groupBy builds contingency cells, marginals and the closed form "
    "run over the cell table; exact-integer inputs, hash-exact",
)
def y30_cohens_kappa(spark, sf_dir):
    from topn_spark.diag import cohens_kappa

    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("text")), 1, 8), 16, 10)
        .cast("bigint")
        % 4
    ).cast("int")
    rater_b = F.element_at(
        F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("es")),
        bucket + 1,
    )
    return cohens_kappa(docs, F.col("lang"), rater_b)


@query(
    "y31_calibration_ece",
    """WITH s AS (
  SELECT CAST(event_id % 101 AS BIGINT) AS sp,
         CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END AS y
  FROM events),
per AS (
  SELECT LEAST(CAST(FLOOR(sp * 10 / 100) AS INT), 9) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(sp) AS ss, SUM(y) AS sy
  FROM s GROUP BY 1),
tot AS (SELECT SUM(n) AS nt FROM per)
SELECT bin, n,
       ss / n / 100.0 AS conf,
       CAST(sy AS DOUBLE) / n AS acc,
       ROUND((SELECT SUM((CAST(p2.n AS DOUBLE) / tot.nt)
                * ABS(CAST(p2.sy AS DOUBLE) / p2.n
                      - p2.ss / p2.n / 100.0))
              FROM per p2, tot), 6) AS ece
FROM per ORDER BY bin ASC""",
    doc="Expected calibration error (diag.py::"
    "expected_calibration_error): 10-bin reliability table + ECE "
    "scalar for an integer-percent scorer — the 'does 80% mean 80%' "
    "model-QC gate for quality classifiers feeding data filters; "
    "integral scores keep every bin statistic a ratio of exact ints "
    "(one data pass, then bins-sized arithmetic); ECE rounded at 6 "
    "(bins-sized float sum is the one order-dependent step)",
)
def y31_calibration_ece(spark, sf_dir):
    from topn_spark.diag import expected_calibration_error

    ev = load_table(spark, sf_dir, "events")
    out = expected_calibration_error(
        ev,
        (F.col("event_id") % 101).cast("bigint"),
        F.col("user_id") % 3 == 0,
        bins=10,
    )
    return out.select(
        "bin", "n", "conf", "acc", F.round("ece", 6).alias("ece")
    ).orderBy("bin")


def _y32_script_exact(con):
    """Pure-Python mirror of the SQL-scripting control flow: double
    the threshold until fewer than 100 orders exceed it; floats stay
    exact (power-of-two scaling of 1000.0)."""
    thr, iters = 1000.0, 0
    cnt = con.execute(
        "SELECT COUNT(*) FROM orders WHERE o_totalprice > ?", [thr]
    ).fetchone()[0]
    while cnt >= 100:
        thr *= 2
        iters += 1
        cnt = con.execute(
            "SELECT COUNT(*) FROM orders WHERE o_totalprice > ?", [thr]
        ).fetchone()[0]
    return ["threshold", "n_above", "iters"], [(thr, cnt, iters)]


_Y32_SCRIPT = """BEGIN
  DECLARE thr DOUBLE DEFAULT 1000.0;
  DECLARE cnt BIGINT DEFAULT 0;
  DECLARE iters INT DEFAULT 0;
  SET cnt = (SELECT COUNT(*) FROM orders WHERE o_totalprice > thr);
  WHILE cnt >= 100 DO
    SET thr = thr * 2;
    SET iters = iters + 1;
    SET cnt = (SELECT COUNT(*) FROM orders WHERE o_totalprice > thr);
  END WHILE;
  SELECT thr AS threshold, cnt AS n_above, iters AS iters;
END"""


@query(
    "y32_sql_scripting",
    None,
    doc="SQL scripting (Spark 4 BEGIN/DECLARE/WHILE/SET blocks): a "
    "data-driven iterative threshold search runs ENTIRELY inside the "
    "SQL engine — each loop iteration re-plans a scalar-subquery "
    "count; the procedural surface DBAs expect from a warehouse, "
    "driven through spark.sql; exact pure-Python + DuckDB mirror",
    tol_oracle=_y32_script_exact,
    tolerance=0.0,
    tol_keys=("iters",),
)
def y32_sql_scripting(spark, sf_dir):
    from topn_spark.catalog import register_views

    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_Y32_SCRIPT)


_Y33_ORACLE = """SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       MAX(o_totalprice) AS top_price
FROM orders
WHERE o_orderstatus = 'F' AND o_totalprice > 1000
GROUP BY o_orderpriority ORDER BY o_orderpriority ASC"""


@query(
    "y33_pipeline_spec",
    _Y33_ORACLE,
    doc="JSON pipeline-spec compiler (pipelines.py::run_pipeline — "
    "the reference's ETLBatchConfig usage mode): a declared stage "
    "DAG (File source -> Filter -> GroupByAggregate) compiles, "
    "validates against real input schemas, and executes; the oracle "
    "states the same logic as one SQL query — proving spec execution "
    "is exact, not just shaped right",
)
def y33_pipeline_spec(spark, sf_dir):
    from topn_spark.pipelines import run_pipeline

    spec = {
        "stages": [
            {
                "name": "orders",
                "type": "batchsource",
                "plugin": "File",
                "properties": {
                    "path": f"{sf_dir}/orders.parquet",
                    "format": "parquet",
                },
            },
            {
                "name": "closed",
                "type": "transform",
                "plugin": "Filter",
                "properties": {
                    "condition":
                    "o_orderstatus = 'F' AND o_totalprice > 1000"
                },
            },
            {
                "name": "by_priority",
                "type": "batchaggregator",
                "plugin": "GroupByAggregate",
                "properties": {
                    "groupByFields": "o_orderpriority",
                    "aggregates":
                    "n:count(*), top_price:max(o_totalprice)",
                },
            },
        ],
        "connections": [
            {"from": "orders", "to": "closed"},
            {"from": "closed", "to": "by_priority"},
        ],
    }
    return run_pipeline(spark, spec)["by_priority"].orderBy(
        "o_orderpriority"
    )


@query(
    "y34_scd2_as_of",
    """WITH ch AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC) AS prev
  FROM events),
ivl AS (
  SELECT user_id, event_id, event_type, ts AS eff_from,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS eff_to
  FROM ch WHERE prev IS NULL OR prev <> event_type)
SELECT user_id, event_type, eff_from, eff_to
FROM ivl
WHERE eff_from <= TIMESTAMP '2024-03-01 00:00:00'
  AND (eff_to IS NULL OR eff_to > TIMESTAMP '2024-03-01 00:00:00')
ORDER BY user_id ASC""",
    doc="SCD2 point-in-time read (pipeline.py::scd2_as_of): the "
    "dimension exactly as it stood at an instant — interval-covering "
    "filter over the x64 history (eff_from <= t < eff_to, NULL-open "
    "current rows); map-only, partition-prunable; hash-exact",
)
def y34_scd2_as_of(spark, sf_dir):
    from topn_spark.operators.pipeline import scd2, scd2_as_of

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    hist = scd2(
        ev, ["user_id"], ["event_type"], ts_col="ts",
        tiebreak=["event_id"],
    )
    return (
        scd2_as_of(hist, "2024-03-01 00:00:00")
        .select("user_id", "event_type", "eff_from", "eff_to")
        .orderBy("user_id")
    )


@query(
    "y35_stratified_split",
    """WITH r AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM documents)
SELECT source,
       CASE WHEN rk <= CEIL(0.8 * n) THEN 'train'
            WHEN rk <= CEIL(0.9 * n) THEN 'val'
            ELSE 'test' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS min_id
FROM r GROUP BY 1, 2 ORDER BY source ASC, split ASC""",
    doc="Stratified train/val/test split (pipeline.py::"
    "stratified_split): EXACT 80/10/10 per source via md5-rank "
    "cut at ceil boundaries — every stratum contributes its share "
    "to every split (contrast the in-expectation global hash split "
    "x36); one grouped window + broadcast stratum counts; "
    "hash-exact",
)
def y35_stratified_split(spark, sf_dir):
    from topn_spark.operators.pipeline import stratified_split

    docs = load_table(spark, sf_dir, "documents")
    out = stratified_split(
        docs, ["source"], {"train": 0.8, "val": 0.1, "test": 0.1},
        "doc_id",
    )
    return (
        out.groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_id"),
        )
        .orderBy("source", "split")
    )


@query(
    "y36_population_stability",
    """WITH pc AS (
  SELECT event_type AS b, COUNT(*) AS np FROM events
  WHERE user_id % 2 = 0 GROUP BY event_type),
qc AS (
  SELECT event_type AS b, COUNT(*) AS nq FROM events
  WHERE user_id % 2 <> 0 AND event_type <> 'error'
  GROUP BY event_type),
j AS (
  SELECT COALESCE(pc.b, qc.b) AS b,
         COALESCE(np, 0) AS n_ref, COALESCE(nq, 0) AS n_new
  FROM pc FULL OUTER JOIN qc ON pc.b = qc.b),
t AS (SELECT SUM(n_ref) AS tp, SUM(n_new) AS tq FROM j),
terms AS (
  SELECT b AS event_type,
         CAST(n_ref AS BIGINT) AS n_ref,
         CAST(n_new AS BIGINT) AS n_new,
         ROUND(GREATEST(n_ref / tp, 1e-6), 6) AS p,
         ROUND(GREATEST(n_new / tq, 1e-6), 6) AS q,
         ROUND((GREATEST(n_new / tq, 1e-6) - GREATEST(n_ref / tp, 1e-6))
               * LN(GREATEST(n_new / tq, 1e-6)
                    / GREATEST(n_ref / tp, 1e-6)), 6) AS term
  FROM j, t)
SELECT event_type, n_ref, n_new, p, q, term,
       (SELECT ROUND(SUM(term), 6) FROM terms) AS psi
FROM terms ORDER BY event_type ASC""",
    doc="Population stability index (diag.py::population_stability): "
    "corpus-mix drift between even-user and odd-user-minus-'error' "
    "slices of the event stream — one count agg per side, full-outer "
    "join on the category table, eps-floored shares so one-sided "
    "buckets contribute finite terms; ln is the one libm call, "
    "ROUND(…,6) per term and for psi",
)
def y36_population_stability(spark, sf_dir):
    from topn_spark.diag import population_stability

    ev = load_table(spark, sf_dir, "events")
    ref = ev.where(F.col("user_id") % 2 == 0)
    new = ev.where(
        (F.col("user_id") % 2 != 0) & (F.col("event_type") != "error")
    )
    return population_stability(ref, new, "event_type").orderBy(
        "event_type"
    )


# --------------------------------------------------------------------------
# Round 5: PNG pixel decode, BPE training, IVF-PQ ANN
# --------------------------------------------------------------------------

@query(
    "z01_png_decode",
    """WITH g AS (
  SELECT doc_id, CAST(1 + doc_id % 7 AS INT) AS w, CAST(5 AS INT) AS h
  FROM documents WHERE doc_id < 200),
px AS (
  SELECT doc_id, w, h,
         [CAST((i // 3) % w + (i // (3 * w)) + 40 * (i % 3) AS INT)
          for i in generate_series(0, 3 * w * h - 1)] AS pixels
  FROM g)
SELECT doc_id, h, w,
       CAST(3 * w * h AS INT) AS n_px,
       md5(array_to_string(pixels, ',')) AS px_md5,
       CAST(0 AS INT) AS r_min,
       CAST((w - 1) + (h - 1) AS INT) AS r_max,
       ROUND((w - 1) / 2.0 + (h - 1) / 2.0, 4) AS r_mean,
       CAST(40 AS INT) AS g_min,
       CAST(40 + (w - 1) + (h - 1) AS INT) AS g_max,
       ROUND(40 + (w - 1) / 2.0 + (h - 1) / 2.0, 4) AS g_mean,
       CAST(80 AS INT) AS b_min,
       CAST(80 + (w - 1) + (h - 1) AS INT) AS b_max,
       ROUND(80 + (w - 1) / 2.0 + (h - 1) / 2.0, 4) AS b_mean
FROM px ORDER BY doc_id ASC""",
    doc="REAL compressed-format pixel decode, oracled (multimodal.py::"
    "decode_png_pixels): spec-valid 8-bit RGB PNGs — zlib IDAT, "
    "height fixed at 5 so the cycling per-row filter exercises ALL "
    "FIVE scanline filters (None/Sub/Up/Average/Paeth) in every "
    "image — are synthesized from planted per-position values "
    "x+y+40c; the pure-stdlib inflate+unfilter decoder runs "
    "distributed via mapInPandas and the oracle recomputes the full "
    "pixel array (md5 — catches filter/row/channel-order bugs) plus "
    "per-channel min/max/mean arithmetically from doc_id",
)
def z01_png_decode(spark, sf_dir):
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from topn_spark.operators.multimodal import decode_pixels, encode_png

    @pandas_udf(T.BinaryType())
    def planted_png(doc_ids):
        import pandas as pd

        out = []
        for d in doc_ids:
            d = int(d)
            w, h = 1 + d % 7, 5
            pix = bytes(
                x + y + 40 * c
                for y in range(h)
                for x in range(w)
                for c in range(3)
            )
            out.append(encode_png(w, h, pix))
        return pd.Series(out)

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 200
    )
    assets = docs.select(
        "doc_id", planted_png("doc_id").alias("payload")
    )
    decoded = decode_pixels(assets)

    def ch_min(c):
        return F.array_min(F.expr(f"filter(pixels, (x, i) -> i % 3 = {c})"))

    def ch_max(c):
        return F.array_max(F.expr(f"filter(pixels, (x, i) -> i % 3 = {c})"))

    def ch_mean(c):
        return F.round(
            F.expr(
                f"aggregate(filter(pixels, (x, i) -> i % 3 = {c}), 0L, "
                "(a, x) -> a + x, "
                "a -> a / cast(size(pixels) div 3 as double))"
            ),
            4,
        )

    return decoded.select(
        "doc_id",
        F.element_at("shape", 1).alias("h"),
        F.element_at("shape", 2).alias("w"),
        F.size("pixels").alias("n_px"),
        F.md5(
            F.concat_ws(",", F.transform("pixels", lambda x: x.cast("string")))
            .cast("binary")
        ).alias("px_md5"),
        ch_min(0).alias("r_min"),
        ch_max(0).alias("r_max"),
        ch_mean(0).alias("r_mean"),
        ch_min(1).alias("g_min"),
        ch_max(1).alias("g_max"),
        ch_mean(1).alias("g_mean"),
        ch_min(2).alias("b_min"),
        ch_max(2).alias("b_max"),
        ch_mean(2).alias("b_mean"),
    ).orderBy("doc_id")


def _z02_bpe_train_mirror(con):
    """Pure-Python Sennrich mirror of bpe_train's deterministic
    contract (same [a-z0-9]+ word rule, max-count pair with
    lexicographic (lhs, rhs) tie-break, leftmost non-overlapping
    in-word merge, min_pair_count=2) plus the applied token count —
    exact equality expected (tolerance 0)."""
    import collections
    import re

    texts = [
        r[0]
        for r in con.execute(
            "SELECT text FROM documents WHERE doc_id < 500"
        ).fetchall()
    ]
    vocab = collections.Counter()
    for t in texts:
        for w in re.findall("[a-z0-9]+", (t or "").lower()):
            vocab[w] += 1
    segs = {w: list(w) for w in vocab}
    merges = []
    for _ in range(24):
        pc = collections.Counter()
        for w, c in vocab.items():
            s = segs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        mx = max(pc.values())
        if mx < 2:
            break
        a, b = sorted(p for p, c in pc.items() if c == mx)[0]
        merges.append((a, b))
        for w, s in segs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    n_tokens = sum(len(segs[w]) * c for w, c in vocab.items())
    n_words = sum(vocab.values())
    rows = [
        (r, a, b, n_words, n_tokens)
        for r, (a, b) in enumerate(merges)
    ]
    return ["rank", "lhs", "rhs", "corpus_words", "corpus_bpe_tokens"], rows


@query(
    "z02_bpe_train",
    None,
    doc="Distributed BPE merge-table TRAINING (textstats.py::"
    "bpe_train) — the Sennrich loop that produces what apply_bpe "
    "(y26) consumes: corpus read once (the only data pass) into a "
    "distinct-word frequency table; a model-sized vocab then trains "
    "on the driver with the incremental heap algorithm (zero Spark "
    "jobs per merge), while an over-cap vocab falls back to batched "
    "distributed rounds (provably sequential-equivalent prefix "
    "acceptance) — both tiers bit-identical; 24 merges over the sf "
    "documents table, stopping at pair count < 2. Oracle: "
    "pure-Python Sennrich mirror, exact merge-table equality plus "
    "the applied corpus token count",
    tol_oracle=_z02_bpe_train_mirror,
    tolerance=0.0,
    tol_keys=("rank",),
)
def z02_bpe_train(spark, sf_dir):
    from topn_spark.diag import _attach_scalar
    from topn_spark.operators.textstats import apply_bpe, bpe_train

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 500
    )
    merges = bpe_train(docs, 24, min_pair_count=2)
    totals = apply_bpe(docs, merges).agg(
        F.sum("n_words").alias("corpus_words"),
        F.sum("n_bpe_tokens").alias("corpus_bpe_tokens"),
    )
    mdf = spark.createDataFrame(
        [(r, a, b) for r, (a, b) in enumerate(merges)],
        "rank int, lhs string, rhs string",
    )
    return _attach_scalar(mdf, totals).orderBy("rank")


def _ivfpq_adc_mirror_core(con):
    """Shared NumPy mirror of the ivfpq deterministic contract
    (coarse centroids = nlist smallest-id vectors, PQ codebooks on
    residuals of the train_rows smallest ids, stable nprobe cell
    sort, ADC over probed cells, ties by id): returns (id→row map,
    vectors, query, full sorted candidate list). Used by the z03
    single-stage and z15 re-rank mirrors."""
    import numpy as np

    from topn_spark.operators.similarity import pq_train_codebooks

    rows = con.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    V = np.array([r[1] for r in rows], dtype=np.float32).astype(
        np.float64
    )
    nlist, nprobe, m, nbits, train_rows = 8, 3, 8, 4, 64
    C = V[:nlist].copy()
    tc = (
        ((V[:train_rows, None, :] - C[None, :, :]) ** 2)
        .sum(axis=2)
        .argmin(axis=1)
    )
    B = np.asarray(
        pq_train_codebooks(
            (V[:train_rows] - C[tc]).tolist(), m=m, nbits=nbits
        ),
        dtype=np.float64,
    )
    _, ksub, dsub = B.shape
    q = V[ids.tolist().index(0)]
    cell = (
        ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    )
    R = V - C[cell]
    codes = np.empty((len(V), m), dtype=np.int64)
    for j in range(m):
        X = R[:, j * dsub : (j + 1) * dsub]
        codes[:, j] = (
            ((X[:, None, :] - B[j][None, :, :]) ** 2)
            .sum(axis=2)
            .argmin(axis=1)
        )
    probe = set(
        np.argsort(((q[None, :] - C) ** 2).sum(axis=1), kind="stable")[
            :nprobe
        ].tolist()
    )
    cand = []
    for i in range(len(V)):
        c = int(cell[i])
        if c not in probe:
            continue
        r = q - C[c]
        d = 0.0
        for j in range(m):
            d += float(
                ((B[j][codes[i, j]] - r[j * dsub : (j + 1) * dsub]) ** 2).sum()
            )
        cand.append((int(ids[i]), d))
    cand.sort(key=lambda t: (t[1], t[0]))
    idpos = {int(v): p for p, v in enumerate(ids.tolist())}
    return idpos, V, q, cand


def _z03_ivfpq_mirror(con):
    """NumPy full-pipeline mirror of ivfpq_topk's deterministic
    contract (see _ivfpq_adc_mirror_core) — float64, 1e-9."""
    _, _, _, cand = _ivfpq_adc_mirror_core(con)
    return ["vec_id", "adc_dist"], cand[:20]


def _z15_rerank_mirror(con):
    """Mirror of ivfpq_topk_rerank: the same ADC candidate list,
    shortlist = top-50 by (adc, id), exact squared-L2 re-score of the
    shortlist rows, final top-20 by (exact, id) — float64, 1e-9."""
    idpos, V, q, cand = _ivfpq_adc_mirror_core(con)
    short = cand[:50]
    out = [
        (vid, adc, float(((q - V[idpos[vid]]) ** 2).sum()))
        for vid, adc in short
    ]
    out.sort(key=lambda t: (t[2], t[0]))
    return ["vec_id", "adc_dist", "exact_dist"], out[:20]


@query(
    "z03_ivfpq_ann",
    None,
    doc="IVF-PQ ANN (similarity.py::ivfpq_topk) — the standard 100 TB "
    "index: coarse quantizer prunes to nprobe of nlist cells, "
    "product-quantized RESIDUALS scored by per-cell ADC LUT within "
    "probed cells only; one Arrow encode pass, driver-sized models, "
    "TakeOrderedAndProject top-k. Composition of IVF (x33) and PQ "
    "(y22). Oracle: NumPy full-pipeline mirror, 1e-9",
    tol_oracle=_z03_ivfpq_mirror,
    tolerance=1e-9,
    tol_keys=("vec_id",),
)
def z03_ivfpq_ann(spark, sf_dir):
    from topn_spark.operators.similarity import ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivfpq_topk(
        emb, query_id=0, k=20, nlist=8, nprobe=3, m=8, nbits=4,
        train_rows=64,
    )


@query(
    "z04_gif_decode",
    """WITH g AS (
  SELECT doc_id,
         CAST(1 + doc_id % 5 AS INT) AS w,
         CAST(3 + doc_id % 7 AS INT) AS h
  FROM documents WHERE doc_id < 200),
px AS (
  SELECT doc_id, w, h,
         [CAST((i // 3) % w + (i // (3 * w)) + 40 * (i % 3) AS INT)
          for i in generate_series(0, 3 * w * h - 1)] AS pixels
  FROM g)
SELECT doc_id, h, w,
       CAST(3 * w * h AS INT) AS n_px,
       md5(array_to_string(pixels, ',')) AS px_md5,
       CAST(0 AS INT) AS r_min,
       CAST((w - 1) + (h - 1) AS INT) AS r_max,
       ROUND((w - 1) / 2.0 + (h - 1) / 2.0, 4) AS r_mean,
       CAST(40 AS INT) AS g_min,
       CAST(40 + (w - 1) + (h - 1) AS INT) AS g_max,
       ROUND(40 + (w - 1) / 2.0 + (h - 1) / 2.0, 4) AS g_mean,
       CAST(80 AS INT) AS b_min,
       CAST(80 + (w - 1) + (h - 1) AS INT) AS b_max,
       ROUND(80 + (w - 1) / 2.0 + (h - 1) / 2.0, 4) AS b_mean
FROM px ORDER BY doc_id ASC""",
    doc="REAL GIF pixel decode, oracled (multimodal.py::"
    "decode_gif_pixels): spec-valid INTERLACED GIF89a frames — pure-"
    "Python spec-appendix-F LZW with variable code widths and CLEAR "
    "resets, four-pass interlace row re-order, palette expansion — "
    "synthesized from planted per-position values x+y+40c at varied "
    "heights 3..9 so every interlace split occurs; the oracle "
    "recomputes the full pixel array (md5 — catches LZW/interlace/"
    "palette bugs) plus per-channel stats arithmetically from doc_id",
)
def z04_gif_decode(spark, sf_dir):
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from topn_spark.operators.multimodal import (
        decode_pixels,
        encode_gif_rgb,
    )

    @pandas_udf(T.BinaryType())
    def planted_gif(doc_ids):
        import pandas as pd

        out = []
        for d in doc_ids:
            d = int(d)
            w, h = 1 + d % 5, 3 + d % 7
            pix = bytes(
                x + y + 40 * c
                for y in range(h)
                for x in range(w)
                for c in range(3)
            )
            out.append(encode_gif_rgb(w, h, pix, interlace=True))
        return pd.Series(out)

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 200
    )
    assets = docs.select(
        "doc_id", planted_gif("doc_id").alias("payload")
    )
    decoded = decode_pixels(assets)

    def ch_min(c):
        return F.array_min(F.expr(f"filter(pixels, (x, i) -> i % 3 = {c})"))

    def ch_max(c):
        return F.array_max(F.expr(f"filter(pixels, (x, i) -> i % 3 = {c})"))

    def ch_mean(c):
        return F.round(
            F.expr(
                f"aggregate(filter(pixels, (x, i) -> i % 3 = {c}), 0L, "
                "(a, x) -> a + x, "
                "a -> a / cast(size(pixels) div 3 as double))"
            ),
            4,
        )

    return decoded.select(
        "doc_id",
        F.element_at("shape", 1).alias("h"),
        F.element_at("shape", 2).alias("w"),
        F.size("pixels").alias("n_px"),
        F.md5(
            F.concat_ws(",", F.transform("pixels", lambda x: x.cast("string")))
            .cast("binary")
        ).alias("px_md5"),
        ch_min(0).alias("r_min"),
        ch_max(0).alias("r_max"),
        ch_mean(0).alias("r_mean"),
        ch_min(1).alias("g_min"),
        ch_max(1).alias("g_max"),
        ch_mean(1).alias("g_mean"),
        ch_min(2).alias("b_min"),
        ch_max(2).alias("b_max"),
        ch_mean(2).alias("b_mean"),
    ).orderBy("doc_id")


@query(
    "z05_jpeg_decode",
    """WITH g AS (
  SELECT doc_id,
         CAST(8 * (1 + doc_id % 3) AS INT) AS w,
         CAST(8 * (1 + doc_id % 2) AS INT) AS h
  FROM documents WHERE doc_id < 200),
px AS (
  SELECT doc_id, w, h,
         [CAST(20 + 3 * ((i % w) // 8) + 5 * ((i // w) // 8)
               + doc_id % 7 AS INT)
          for i in generate_series(0, w * h - 1)] AS pixels
  FROM g)
SELECT doc_id, h, w,
       CAST(w * h AS INT) AS n_px,
       md5(array_to_string(pixels, ',')) AS px_md5,
       CAST(20 + doc_id % 7 AS INT) AS v_min,
       CAST(20 + 3 * (w // 8 - 1) + 5 * (h // 8 - 1) + doc_id % 7
            AS INT) AS v_max,
       ROUND(20 + doc_id % 7 + 3 * (w // 8 - 1) / 2.0
             + 5 * (h // 8 - 1) / 2.0, 4) AS v_mean
FROM px ORDER BY doc_id ASC""",
    doc="REAL JPEG pixel decode, oracled (multimodal.py::"
    "decode_jpeg_pixels): spec-valid baseline-sequential grayscale "
    "JPEGs whose 8x8 blocks are CONSTANT — with all-1s quantization "
    "the FDCT yields exactly DC-only coefficients (S00 = 8*(v-128)), "
    "so Huffman entropy decode + dequant + IDCT reproduces the "
    "planted per-block values 20+3bx+5by+(doc_id%7) bit-exactly; the "
    "oracle recomputes the full pixel array (md5 — catches "
    "DC-predictor/MCU-order/IDCT bugs) plus min/max/mean "
    "arithmetically from doc_id",
)
def z05_jpeg_decode(spark, sf_dir):
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from topn_spark.operators.multimodal import (
        decode_pixels,
        encode_jpeg_gray,
    )

    @pandas_udf(T.BinaryType())
    def planted_jpeg(doc_ids):
        import pandas as pd

        out = []
        for d in doc_ids:
            d = int(d)
            w, h = 8 * (1 + d % 3), 8 * (1 + d % 2)
            pix = bytes(
                20 + 3 * (x // 8) + 5 * (y // 8) + d % 7
                for y in range(h)
                for x in range(w)
            )
            out.append(encode_jpeg_gray(w, h, pix))
        return pd.Series(out)

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 200
    )
    assets = docs.select(
        "doc_id", planted_jpeg("doc_id").alias("payload")
    )
    decoded = decode_pixels(assets)
    return decoded.select(
        "doc_id",
        F.element_at("shape", 1).alias("h"),
        F.element_at("shape", 2).alias("w"),
        F.size("pixels").alias("n_px"),
        F.md5(
            F.concat_ws(",", F.transform("pixels", lambda x: x.cast("string")))
            .cast("binary")
        ).alias("px_md5"),
        F.array_min("pixels").alias("v_min"),
        F.array_max("pixels").alias("v_max"),
        F.round(
            F.expr(
                "aggregate(pixels, 0L, (a, x) -> a + x, "
                "a -> a / cast(size(pixels) as double))"
            ),
            4,
        ).alias("v_mean"),
    ).orderBy("doc_id")


@query(
    "z06_image_features",
    """WITH g AS (
  SELECT doc_id,
         CAST(3 + doc_id % 5 AS INT) AS w,
         CAST(3 + doc_id % 4 AS INT) AS h
  FROM documents WHERE doc_id < 200)
SELECT doc_id, w AS width, h AS height, CAST(3 AS INT) AS channels,
       ROUND((w - 1) / 2.0 + (h - 1) / 2.0 + 32.6, 4) AS lum_mean,
       ROUND(SQRT((w * w - 1) / 12.0 + (h * h - 1) / 12.0), 4)
         AS lum_std,
       ROUND(SQRT(128), 4) AS edge_mean,
       CAST(1.0 AS DOUBLE) AS edge_frac
FROM g ORDER BY doc_id ASC""",
    doc="REAL classical-CV image featurization over decoded pixels "
    "(multimodal.py::image_features): BT.601 luminance mean/std and "
    "Sobel gradient-magnitude stats, computed from planted x+y+40c "
    "ramps that round-robin through the PNG, GIF, and BMP decoders "
    "(doc_id % 3) — the linear ramp makes every feature a CLOSED "
    "FORM the oracle recomputes arithmetically: lum = (x+y) + 32.6, "
    "std = sqrt(var(x)+var(y)), Sobel |G| = sqrt(128) at every "
    "interior pixel, so edge_frac(10) = 1",
)
def z06_image_features(spark, sf_dir):
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from topn_spark.operators.multimodal import (
        encode_bmp_rgb,
        encode_gif_rgb,
        encode_png,
        image_features,
    )

    @pandas_udf(T.BinaryType())
    def planted(doc_ids):
        import pandas as pd

        encs = (encode_png, encode_gif_rgb, encode_bmp_rgb)
        out = []
        for d in doc_ids:
            d = int(d)
            w, h = 3 + d % 5, 3 + d % 4
            pix = bytes(
                x + y + 40 * c
                for y in range(h)
                for x in range(w)
                for c in range(3)
            )
            out.append(encs[d % 3](w, h, pix))
        return pd.Series(out)

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 200
    )
    assets = docs.select("doc_id", planted("doc_id").alias("payload"))
    return (
        image_features(assets)
        .select(
            "doc_id", "width", "height", "channels",
            "lum_mean", "lum_std", "edge_mean", "edge_frac",
        )
        .orderBy("doc_id")
    )


@query(
    "z07_image_resize",
    """WITH g AS (
  SELECT doc_id,
         CAST(2 * (1 + doc_id % 4) AS INT) AS w,
         CAST(2 * (1 + doc_id % 3) AS INT) AS h
  FROM documents WHERE doc_id < 200),
px AS (
  SELECT doc_id, w, h,
         [CAST(2 * ((i // 3) % (w // 2)) + 2 * (i // (3 * (w // 2)))
               + 1 + 40 * (i % 3) AS DOUBLE)
          for i in generate_series(0, 3 * (w // 2) * (h // 2) - 1)]
           AS r_pixels
  FROM g)
SELECT doc_id, h // 2 AS rh, w // 2 AS rw,
       CAST(3 * (w // 2) * (h // 2) AS INT) AS n_px,
       md5(array_to_string(r_pixels, ',')) AS px_md5
FROM px ORDER BY doc_id ASC""",
    doc="REAL integer-factor box downsample over decoded pixels "
    "(multimodal.py::resize_image, factor 2): planted x+y+40c ramps "
    "through the PNG decoder; each output pixel is the EXACT mean of "
    "its 2x2 block, which for the ramp is the closed form "
    "2bx+2by+1+40c (an integer-valued double) — the oracle rebuilds "
    "the full downsampled array and md5s it, catching block "
    "alignment, channel order, and mean-vs-sum bugs",
)
def z07_image_resize(spark, sf_dir):
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from topn_spark.operators.multimodal import encode_png, resize_image

    @pandas_udf(T.BinaryType())
    def planted(doc_ids):
        import pandas as pd

        out = []
        for d in doc_ids:
            d = int(d)
            w, h = 2 * (1 + d % 4), 2 * (1 + d % 3)
            pix = bytes(
                x + y + 40 * c
                for y in range(h)
                for x in range(w)
                for c in range(3)
            )
            out.append(encode_png(w, h, pix))
        return pd.Series(out)

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 200
    )
    assets = docs.select("doc_id", planted("doc_id").alias("payload"))
    return (
        resize_image(assets, factor=2)
        .select(
            "doc_id",
            F.element_at("r_shape", 1).alias("rh"),
            F.element_at("r_shape", 2).alias("rw"),
            F.size("r_pixels").alias("n_px"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform("r_pixels", lambda x: x.cast("string")),
                ).cast("binary")
            ).alias("px_md5"),
        )
        .orderBy("doc_id")
    )


@query(
    "z08_audio_features",
    """WITH g AS (
  SELECT doc_id,
         CAST(1 + doc_id % 2 AS INT) AS ch,
         CAST(8000 + 100 * (doc_id % 3) AS INT) AS sr,
         CAST(20 + doc_id % 50 AS BIGINT) AS nf
  FROM documents WHERE doc_id < 200),
s AS (
  SELECT doc_id, ch, sr, nf,
         [CAST((doc_id * 7 + (i // ch) * 3 + (i % ch) * 11) % 200 - 100
               AS BIGINT)
          for i in generate_series(0, nf * ch - 1)] AS samples,
         [CASE WHEN
            ((doc_id * 7 + (1 + j % (nf - 1) - 1) * 3
              + (j // (nf - 1)) * 11) % 200 - 100)
            * ((doc_id * 7 + (1 + j % (nf - 1)) * 3
                + (j // (nf - 1)) * 11) % 200 - 100) < 0
          THEN 1 ELSE 0 END
          for j in generate_series(0, ch * (nf - 1) - 1)] AS zc
  FROM g)
SELECT doc_id, ch AS channels, sr AS sample_rate, nf AS n_frames,
       ROUND(SQRT(list_sum(list_transform(samples, x -> x * x))
                  * 1.0 / (nf * ch)), 6) AS rms,
       CAST(list_max(list_transform(samples, x -> abs(x))) AS INT)
         AS peak,
       ROUND(list_sum(zc) * 1.0 / (ch * (nf - 1)), 6) AS zcr
FROM s ORDER BY doc_id ASC""",
    doc="REAL audio featurization over decoded PCM16 "
    "(multimodal.py::audio_features): overall RMS (exact integer "
    "sum-of-squares before the one division), peak |sample|, and "
    "strict-sign-change zero-crossing rate per channel — the "
    "silence/clipping/speech screens — on the same planted x90 "
    "waveform (doc_id*7 + f*3 + c*11) % 200 - 100; the oracle "
    "recomputes every feature arithmetically from doc_id",
)
def z08_audio_features(spark, sf_dir):
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from topn_spark.operators.multimodal import (
        audio_features,
        encode_wav_pcm16,
    )

    @pandas_udf(T.BinaryType())
    def planted_wav(doc_ids):
        import pandas as pd

        out = []
        for d in doc_ids:
            d = int(d)
            ch, sr, nf = 1 + d % 2, 8000 + 100 * (d % 3), 20 + d % 50
            frames = [
                (d * 7 + f * 3 + c * 11) % 200 - 100
                for f in range(nf)
                for c in range(ch)
            ]
            out.append(encode_wav_pcm16(sr, ch, frames))
        return pd.Series(out)

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 200
    )
    assets = docs.select(
        "doc_id", planted_wav("doc_id").alias("payload")
    )
    return (
        audio_features(assets)
        .select(
            "doc_id", "channels", "sample_rate", "n_frames",
            "rms", "peak", "zcr",
        )
        .orderBy("doc_id")
    )


@query(
    "z09_url_features",
    """SELECT doc_id,
       CASE doc_id % 7
         WHEN 0 THEN 'https' WHEN 1 THEN 'http' WHEN 2 THEN 'ftp'
         WHEN 4 THEN 'https' WHEN 5 THEN 'http' WHEN 6 THEN 'https'
         END AS scheme,
       CASE doc_id % 7
         WHEN 0 THEN 'www.site' || (doc_id // 5) || '.co.uk'
         WHEN 1 THEN 'sub.dom' || (doc_id % 13) || '.com'
         WHEN 2 THEN '10.0.' || (doc_id % 256) || '.1'
         WHEN 4 THEN 'host' || doc_id
         WHEN 5 THEN 'frag.site' || (doc_id % 9) || '.org'
         WHEN 6 THEN '2001:db8::' || (doc_id % 9 + 1) END AS host,
       CASE doc_id % 7
         WHEN 0 THEN 'site' || (doc_id // 5) || '.co.uk'
         WHEN 1 THEN 'dom' || (doc_id % 13) || '.com'
         WHEN 2 THEN '10.0.' || (doc_id % 256) || '.1'
         WHEN 4 THEN 'host' || doc_id
         WHEN 5 THEN 'site' || (doc_id % 9) || '.org'
         WHEN 6 THEN '2001:db8::' || (doc_id % 9 + 1)
         END AS registered_domain,
       CAST(CASE doc_id % 7
         WHEN 0 THEN 2 WHEN 1 THEN 2 WHEN 2 THEN 1
         WHEN 3 THEN 0 WHEN 4 THEN 0 WHEN 5 THEN 1 WHEN 6 THEN 3
         END AS INT) AS path_depth,
       CAST(CASE doc_id % 7
         WHEN 0 THEN 2 WHEN 4 THEN 2 WHEN 6 THEN 1 ELSE 0
         END AS INT) AS n_params,
       CAST(doc_id % 7 IN (2, 6) AS BOOLEAN) AS is_ip
FROM documents WHERE doc_id < 500 ORDER BY doc_id ASC""",
    doc="URL decomposition for domain-based corpus filtering "
    "(pipeline.py::url_features): scheme/host/registered-domain "
    "(two-level public-suffix aware, IP and single-label hosts kept "
    "whole), path depth, query-param count, IP flag — pure Catalyst "
    "regexp/split/slice, map-only. URLs are planted per doc_id "
    "across seven shapes (co.uk suffix, plain .com, IPv4 host, "
    "unparseable, port+userinfo, '?' inside the fragment which must "
    "NOT count as query params, IPv6 bracket literal with port) and "
    "every feature is recomputed by the oracle as a closed form per "
    "shape",
)
def z09_url_features(spark, sf_dir):
    from topn_spark.operators.pipeline import url_features

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 500
    )
    d = F.col("doc_id")
    url = (
        F.when(
            d % 7 == 0,
            F.concat(
                F.lit("https://www.site"),
                (d / 5).cast("long").cast("string"),
                F.lit(".co.uk/a/b?x=1&y=2"),
            ),
        )
        .when(
            d % 7 == 1,
            F.concat(
                F.lit("http://sub.dom"),
                (d % 13).cast("string"),
                F.lit(".com/p/q"),
            ),
        )
        .when(
            d % 7 == 2,
            F.concat(
                F.lit("ftp://10.0."),
                (d % 256).cast("string"),
                F.lit(".1/f"),
            ),
        )
        .when(d % 7 == 3, F.lit("not a url"))
        .when(
            d % 7 == 4,
            F.concat(
                F.lit("https://User:pw@HOST"),
                d.cast("string"),
                F.lit(":8080/?a=1&b=2"),
            ),
        )
        .when(
            d % 7 == 5,
            F.concat(
                F.lit("http://frag.site"),
                (d % 9).cast("string"),
                F.lit(".org/one#sec?a=1&b=2"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://[2001:db8::"),
                (d % 9 + 1).cast("string"),
                F.lit("]:8443/x/y/z?q=1#top"),
            )
        )
    )
    planted = docs.select("doc_id", url.alias("url"))
    return (
        url_features(planted)
        .select(
            "doc_id", "scheme", "host", "registered_domain",
            "path_depth", "n_params", "is_ip",
        )
        .orderBy("doc_id")
    )


@query(
    "z10_domain_cap",
    """WITH u AS (
  SELECT doc_id,
         CASE doc_id % 5
           WHEN 0 THEN 'site' || (doc_id % 3) || '.co.uk'
           WHEN 1 THEN 'dom' || (doc_id % 4) || '.com'
           WHEN 2 THEN '10.0.' || (doc_id % 2) || '.1'
           WHEN 4 THEN 'host' || (doc_id % 3) END AS registered_domain
  FROM documents WHERE doc_id < 500),
parsed AS (SELECT * FROM u WHERE registered_domain IS NOT NULL),
ranked AS (
  SELECT doc_id, registered_domain,
         ROW_NUMBER() OVER (
           PARTITION BY registered_domain
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rn
  FROM parsed)
SELECT registered_domain,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN rn <= 25 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(MIN(CASE WHEN rn <= 25 THEN doc_id END) AS BIGINT)
         AS kept_min_id,
       CAST(SUM(CASE WHEN rn <= 25 THEN doc_id ELSE 0 END) AS BIGINT)
         AS kept_id_sum
FROM ranked GROUP BY registered_domain
ORDER BY registered_domain ASC""",
    doc="Per-domain frequency cap — the 'at most N docs per domain' "
    "pretraining rule, composed end-to-end from url_features (domain "
    "extraction; unparseable rows fail closed) and sample_k_per_group "
    "(deterministic md5-rank cap, map-side WindowGroupLimit): reports "
    "per-domain corpus count, post-cap count, and kept-set "
    "fingerprints. Oracle mirrors the same md5-rank rule in SQL",
)
def z10_domain_cap(spark, sf_dir):
    from topn_spark.operators.pipeline import (
        sample_k_per_group,
        url_features,
    )

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 500
    )
    d = F.col("doc_id")
    url = (
        F.when(
            d % 5 == 0,
            F.concat(F.lit("https://www.site"), (d % 3).cast("string"),
                     F.lit(".co.uk/a")),
        )
        .when(
            d % 5 == 1,
            F.concat(F.lit("http://sub.dom"), (d % 4).cast("string"),
                     F.lit(".com/p")),
        )
        .when(
            d % 5 == 2,
            F.concat(F.lit("ftp://10.0."), (d % 2).cast("string"),
                     F.lit(".1/f")),
        )
        .when(d % 5 == 3, F.lit("not a url"))
        .otherwise(
            F.concat(F.lit("https://host"), (d % 3).cast("string"),
                     F.lit("/x")),
        )
    )
    # persisted: two consumers (cap + totals) read the features once,
    # and the cache boundary stops the planted CASE fixture from
    # inlining into every url_features regexp — without it the
    # generated sort code passes Janino's 64 KB method limit and the
    # whole stage silently falls back to interpreted execution
    feat = (
        url_features(docs.select("doc_id", url.alias("url")))
        .select("doc_id", "registered_domain")
        .persist()
    )
    # filter on the CACHED columns: pushing this predicate through
    # the projections would re-substitute the whole registered_domain
    # expression tree (incl. the planted CASE) into the scan filter
    # and blow whole-stage codegen past Janino's 64 KB method limit
    feat = feat.where(F.col("registered_domain").isNotNull())
    kept = sample_k_per_group(
        feat.select("doc_id", "registered_domain"),
        ["registered_domain"], 25, "doc_id",
    ).select(F.col("doc_id").alias("_kid"), F.col("registered_domain"))
    totals = feat.groupBy("registered_domain").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    kept_agg = kept.groupBy("registered_domain").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.min("_kid").alias("kept_min_id"),
        F.sum("_kid").alias("kept_id_sum"),
    )
    return (
        totals.join(kept_agg, "registered_domain")
        .select(
            "registered_domain", "n_docs", "n_kept",
            "kept_min_id", "kept_id_sum",
        )
        .orderBy("registered_domain")
    )


@query(
    "z11_histogram_features",
    """WITH g AS (
  SELECT doc_id, CAST(1 + doc_id % 3 AS INT) AS nbx,
         CAST(1 + doc_id % 2 AS INT) AS nby
  FROM documents WHERE doc_id < 200),
blocks AS (
  SELECT g.doc_id, g.nbx, g.nby,
         CAST((i % nbx + i // nbx + doc_id) % 5 AS INT) AS bin
  FROM g, LATERAL (
    SELECT UNNEST(generate_series(0, nbx * nby - 1)) AS i)),
counts AS (
  SELECT doc_id, bin, COUNT(*) AS cnt
  FROM blocks GROUP BY doc_id, bin),
ranked AS (
  SELECT doc_id, bin, cnt,
         ROW_NUMBER() OVER (
           PARTITION BY doc_id ORDER BY cnt DESC, bin ASC) AS rn
  FROM counts)
SELECT r.doc_id,
       CAST(r.bin AS INT) AS top_bin,
       CAST(n.nz AS INT) AS n_nonzero,
       TRUE AS is_unit
FROM ranked r
JOIN (SELECT doc_id, COUNT(*) AS nz FROM counts GROUP BY doc_id) n
  ON r.doc_id = n.doc_id
WHERE r.rn = 1 ORDER BY r.doc_id ASC""",
    doc="REAL default featurization (multimodal.py::extract_features "
    "mode='histogram'): the L2-normalized 16-bin luminance histogram "
    "over decoded pixels, here from planted gray PNGs whose 8x8 "
    "blocks carry value 16*((bx+by+d)%5)+8 so each block lands "
    "wholly in one known bin; the oracle recomputes the per-bin "
    "block counts, the argmax bin (ties -> lowest, matching "
    "np.argmax first-hit), the nonzero-bin count, and asserts unit "
    "L2 norm — integer/boolean invariants, immune to float32 "
    "rounding in the vector itself",
)
def z11_histogram_features(spark, sf_dir):
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from topn_spark.operators.multimodal import (
        encode_png,
        extract_features,
    )

    @pandas_udf(T.BinaryType())
    def planted(doc_ids):
        import pandas as pd

        out = []
        for d in doc_ids:
            d = int(d)
            nbx, nby = 1 + d % 3, 1 + d % 2
            w, h = 8 * nbx, 8 * nby
            pix = bytes(
                16 * ((x // 8 + y // 8 + d) % 5) + 8
                for y in range(h)
                for x in range(w)
            )
            out.append(encode_png(w, h, pix, color_type=0))
        return pd.Series(out)

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 200
    )
    assets = docs.select("doc_id", planted("doc_id").alias("payload"))
    feat = extract_features(assets)
    f = F.col("features")
    sq = F.aggregate(
        f, F.lit(0.0), lambda a, x: a + x.cast("double") * x
    )
    return feat.select(
        "doc_id",
        (
            F.array_position(f, F.array_max(f)) - 1
        ).cast("int").alias("top_bin"),
        F.size(F.filter(f, lambda x: x > 0)).alias("n_nonzero"),
        (F.abs(sq - 1.0) < 1e-5).alias("is_unit"),
    ).orderBy("doc_id")


@query(
    "z12_video_frame_sample",
    """WITH g AS (
  SELECT doc_id, CAST(3 + doc_id % 4 AS INT) AS nf
  FROM documents WHERE doc_id < 200),
fr AS (
  SELECT doc_id, UNNEST(generate_series(0, nf - 1, 2)) AS fi
  FROM g),
px AS (
  SELECT doc_id, fi,
         [CAST(20 + 10 * fi + 3 * ((i % 16) // 8) + doc_id % 7
               AS INT)
          for i in generate_series(0, 16 * 8 - 1)] AS pixels
  FROM fr)
SELECT doc_id, CAST(fi AS INT) AS frame_idx,
       CAST(40 * fi AS BIGINT) AS t_ms,
       CAST(8 AS INT) AS h, CAST(16 AS INT) AS w, CAST(1 AS INT) AS ch,
       CAST(16 * 8 AS INT) AS n_px,
       md5(array_to_string(pixels, ',')) AS px_md5
FROM px ORDER BY doc_id ASC, frame_idx ASC""",
    doc="REAL video frame sampling (multimodal.py::"
    "sample_video_frames): planted MJPEG-in-AVI containers — RIFF "
    "walk to the movi '00dc' chunks, every 2nd frame decoded through "
    "the baseline JPEG path — per-frame constant 8x8 blocks "
    "20+10f+3bx+(doc_id%7) are DC-exact, so the oracle recomputes "
    "each sampled frame's timestamp (40ms cadence) and full pixel "
    "array md5 arithmetically; one mapInPandas fan-out row per "
    "sampled frame",
)
def z12_video_frame_sample(spark, sf_dir):
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from topn_spark.operators.multimodal import (
        encode_avi_mjpeg,
        encode_jpeg_gray,
        sample_video_frames,
    )

    @pandas_udf(T.BinaryType())
    def planted_avi(doc_ids):
        import pandas as pd

        out = []
        for d in doc_ids:
            d = int(d)
            nf = 3 + d % 4
            frames = []
            for f in range(nf):
                pix = bytes(
                    20 + 10 * f + 3 * (x // 8) + d % 7
                    for y in range(8)
                    for x in range(16)
                )
                frames.append(encode_jpeg_gray(16, 8, pix))
            out.append(encode_avi_mjpeg(16, 8, frames))
        return pd.Series(out)

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 200
    )
    assets = docs.select(
        "doc_id", planted_avi("doc_id").alias("payload")
    )
    sampled = sample_video_frames(assets, every=2)
    return sampled.select(
        "doc_id", "frame_idx", "t_ms", "h", "w", "ch",
        F.size("pixels").alias("n_px"),
        F.md5(
            F.concat_ws(",", F.transform("pixels", lambda x: x.cast("string")))
            .cast("binary")
        ).alias("px_md5"),
    ).orderBy("doc_id", "frame_idx")


@query(
    "z13_html_extract",
    """SELECT doc_id,
       CASE doc_id % 4 WHEN 0 THEN 'Title ' || doc_id END AS title,
       CASE doc_id % 4
         WHEN 0 THEN 'Doc ' || doc_id || chr(10) || 'alpha ' || doc_id
                     || ' beta' || chr(10) || 'gamma & delta'
         WHEN 1 THEN 'item A ' || doc_id || chr(10) || 'item B'
                     || chr(10) || 'tail link text'
         WHEN 2 THEN 'A <tag> & B' || chr(10) || 'second ' || doc_id
                     || ' line'
         WHEN 3 THEN 'r1c1' || chr(10) || 'r1c2 ' || doc_id || chr(10)
                     || 'r2' || chr(10) || 'after ' || doc_id
       END AS text,
       CAST(CASE doc_id % 4 WHEN 1 THEN 1 ELSE 0 END AS INT) AS n_links
FROM documents WHERE doc_id < 400 ORDER BY doc_id ASC""",
    doc="HTML -> text extraction (markup.py::extract_html_text) — "
    "the first stage of every web-corpus pipeline: stdlib-parser "
    "boilerplate strip (script/style/head/comments), block-element "
    "line breaks, entity decode, whitespace collapse, title capture, "
    "href count, all inside one Arrow mapInPandas map-only pass. "
    "Planted HTML per doc_id across four shapes (full page with "
    "script+style+comment+entity, list+inline-anchor, entities+br, "
    "table cells); the oracle recomputes title/text/n_links as "
    "closed-form strings per shape",
)
def z13_html_extract(spark, sf_dir):
    from topn_spark.operators.markup import extract_html_text

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 400
    )
    d = F.col("doc_id")
    ds = d.cast("string")
    html = (
        F.when(
            d % 4 == 0,
            F.concat(
                F.lit("<html><head><title>Title "), ds,
                F.lit("</title><style>p{c:red}</style></head>"
                      "<body><h1>Doc "), ds,
                F.lit("</h1><p>alpha "), ds,
                F.lit(" beta</p><script>var x="), ds,
                F.lit(";</script><p>gamma &amp; delta</p>"
                      "<!--hidden--></body></html>"),
            ),
        )
        .when(
            d % 4 == 1,
            F.concat(
                F.lit("<body><ul><li>item A "), ds,
                F.lit("</li><li>item B</li></ul><div>tail "
                      "<a href=\"/x\">link</a> text</div></body>"),
            ),
        )
        .when(
            d % 4 == 2,
            F.concat(
                F.lit("<body><p>A &lt;tag&gt; &amp; B<br>second "), ds,
                F.lit(" line</p></body>"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("<body><table><tr><td>r1c1</td><td>r1c2 "), ds,
                F.lit("</td></tr><tr><td>r2</td></tr></table>"
                      "<p>after "), ds,
                F.lit("</p></body>"),
            )
        )
    )
    planted = docs.select("doc_id", html.alias("html"))
    return extract_html_text(planted).orderBy("doc_id")


@query(
    "z14_unicode_tokens",
    r"""WITH t AS (
  SELECT doc_id,
    CASE doc_id % 4
      WHEN 0 THEN 'Grüße ' || doc_id || ' МОСКВА 東京 café hello'
      WHEN 1 THEN 'ΑΘΗΝΑ ١٢٣ ' || doc_id || ' mixed ２３full'
      WHEN 2 THEN 'word ' || doc_id || ' word WORD wort'
      ELSE '!!! ### ---' END AS text
  FROM documents WHERE doc_id < 400),
tok AS (
  SELECT doc_id,
         regexp_extract_all(lower(text), '[\p{L}\p{N}]+') AS toks
  FROM t)
SELECT doc_id,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq_tokens,
  ROUND(CAST(len(list_distinct(toks)) AS DOUBLE)
        / NULLIF(len(toks), 0), 6) AS ttr,
  toks[1] AS first_token
FROM tok ORDER BY doc_id ASC""",
    doc="Unicode-aware tokenization mode (textstats.py::tokens "
    "mode='unicode'): \\p{L}\\p{N} category classes tokenize any "
    "script — Cyrillic, Greek, CJK, Arabic-Indic digits, fullwidth "
    "forms — where the historical ascii rule saw nothing. Planted "
    "multilingual fixture across four shapes (incl. a tokenless "
    "one); the oracle re-tokenizes in DuckDB with the same RE2 "
    "category classes and lower() casing — the dialect alignment is "
    "the point of the test",
)
def z14_unicode_tokens(spark, sf_dir):
    from topn_spark.operators.textstats import add_token_stats, tokens

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 400
    )
    d = F.col("doc_id")
    ds = d.cast("string")
    text = (
        F.when(
            d % 4 == 0,
            F.concat(
                F.lit("Grüße "), ds, F.lit(" МОСКВА 東京 café hello")
            ),
        )
        .when(
            d % 4 == 1,
            F.concat(F.lit("ΑΘΗΝΑ ١٢٣ "), ds, F.lit(" mixed ２３full")),
        )
        .when(
            d % 4 == 2,
            F.concat(F.lit("word "), ds, F.lit(" word WORD wort")),
        )
        .otherwise(F.lit("!!! ### ---"))
    )
    planted = docs.select("doc_id", text.alias("text"))
    return (
        add_token_stats(planted, mode="unicode")
        .withColumn(
            "first_token", F.get(tokens("text", "unicode"), F.lit(0))
        )
        .select(
            "doc_id", "n_tokens", "n_uniq_tokens", "ttr", "first_token"
        )
        .orderBy("doc_id")
    )


@query(
    "z15_ann_rerank",
    None,
    doc="Two-stage ANN retrieval (similarity.py::ivfpq_topk_rerank): "
    "IVF-PQ ADC shortlist (k'=50) -> exact float re-score of only "
    "the shortlist rows (broadcast id join + Catalyst zip_with "
    "aggregate, no UDF) -> top-20 by true squared L2. Recall is "
    "provably >= single-stage ivfpq (the shortlist is a superset of "
    "its answer and exact ordering keeps every true neighbor). "
    "Oracle: NumPy mirror sharing the z03 ADC core, 1e-9",
    tol_oracle=_z15_rerank_mirror,
    tolerance=1e-9,
    tol_keys=("vec_id",),
)
def z15_ann_rerank(spark, sf_dir):
    from topn_spark.operators.similarity import ivfpq_topk_rerank

    emb = load_table(spark, sf_dir, "embeddings")
    return ivfpq_topk_rerank(
        emb, query_id=0, k=20, rerank=50, nlist=8, nprobe=3, m=8,
        nbits=4, train_rows=64,
    )


def _z16_quality_logreg_mirror(con):
    """Pure-Python mirror of train_quality_classifier on documents
    doc_id < 300: identical rounded features (Decimal HALF_UP mirrors
    Spark ROUND), identical Gopher-style label rule, identical
    full-batch GD (zero init, lr=1.0, 40 iters, float64). Sum-order
    float noise across partitions is the only engine divergence —
    tolerance 1e-6."""
    import re
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    def r6(x):
        return float(
            Decimal(repr(x)).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )

    rows = con.execute(
        "SELECT doc_id, text FROM documents WHERE doc_id < 300 "
        "ORDER BY doc_id"
    ).fetchall()
    ids, X, y = [], [], []
    for did, text in rows:
        if text is None or len(text) == 0:
            continue
        ln = float(len(text))
        nt = len(re.findall("[a-z0-9]+", text.lower()))
        if nt == 0:
            continue
        alpha = float(len(re.findall("[A-Za-z]", text)))
        space = float(text.count(" "))
        ar = r6(alpha / ln)
        sr = r6(space / ln)
        mwl = r6((ln - space) / float(nt))
        keep = nt >= 10 and ar >= 0.6 and 2.0 <= mwl <= 12.0
        ids.append(int(did))
        X.append([ar, sr, mwl])
        y.append(1.0 if keep else 0.0)
    X = np.asarray(X, dtype=np.float64)
    yv = np.asarray(y, dtype=np.float64)
    n = len(yv)
    w = np.zeros(X.shape[1] + 1)
    lr = 1.0
    for _ in range(40):
        p = 1.0 / (1.0 + np.exp(-(w[0] + X @ w[1:])))
        r = p - yv
        w[0] -= lr * r.sum() / n
        w[1:] -= lr * (X.T @ r) / n
    probs = 1.0 / (1.0 + np.exp(-(w[0] + X @ w[1:])))
    out = [
        (ids[i], int(yv[i]), float(probs[i])) for i in range(n)
    ]
    return ["doc_id", "label", "prob"], out


@query(
    "z16_quality_logreg",
    None,
    doc="Trainable quality classifier (textstats.py::logreg_train / "
    "train_quality_classifier): distributed full-batch logistic "
    "regression over the rounded add_quality features — one "
    "map-side-combined (d+2)-sized gradient partial per iteration "
    "over a cached projection, O(d) driver updates, then a pure "
    "Catalyst sigmoid scoring pass (distilling the Gopher-style "
    "heuristic label here; human/LLM labels in production). Oracle: "
    "pure-Python feature + GD mirror, 1e-6 (partition sum order)",
    tol_oracle=_z16_quality_logreg_mirror,
    tolerance=1e-6,
    tol_keys=("doc_id",),
)
def z16_quality_logreg(spark, sf_dir):
    from topn_spark.operators.textstats import train_quality_classifier

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 300
    )
    _, scored = train_quality_classifier(docs)
    return (
        scored.where(F.col("prob").isNotNull())
        .select(
            "doc_id",
            F.col("quality_keep").cast("int").alias("label"),
            "prob",
        )
        .orderBy("doc_id")
    )


@query(
    "z17_g711_audio",
    """WITH g AS (
  SELECT doc_id, CAST(16 + doc_id % 5 AS INT) AS n
  FROM documents WHERE doc_id < 200),
idx AS (
  SELECT doc_id, UNNEST(generate_series(0, n - 1)) AS i FROM g),
raw AS (
  SELECT doc_id, i,
         CAST((doc_id * 7 + i * 13) % 256 AS INT) AS by
  FROM idx),
cw AS (
  SELECT doc_id, i, 255 - by AS u, xor(by, 85) AS a FROM raw),
ex AS (
  SELECT doc_id, i,
    CASE WHEN doc_id % 2 = 0 THEN
      CASE WHEN u >= 128
        THEN 132 - (((u % 16) * 8 + 132) * (1 << ((u // 16) % 8)))
        ELSE (((u % 16) * 8 + 132) * (1 << ((u // 16) % 8))) - 132
      END
    ELSE
      CASE WHEN a >= 128 THEN
        CASE (a // 16) % 8
          WHEN 0 THEN (a % 16) * 16 + 8
          WHEN 1 THEN (a % 16) * 16 + 264
          ELSE ((a % 16) * 16 + 264) * (1 << ((a // 16) % 8 - 1))
        END
      ELSE
        -(CASE (a // 16) % 8
            WHEN 0 THEN (a % 16) * 16 + 8
            WHEN 1 THEN (a % 16) * 16 + 264
            ELSE ((a % 16) * 16 + 264) * (1 << ((a // 16) % 8 - 1))
          END)
      END
    END AS sample
  FROM cw)
SELECT doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_frames,
  CAST(SUM(sample) AS BIGINT) AS sample_sum,
  CAST(MIN(sample) AS INT) AS sample_min,
  CAST(MAX(sample) AS INT) AS sample_max,
  md5(string_agg(CAST(sample AS VARCHAR), ',' ORDER BY i)) AS sample_md5
FROM ex GROUP BY doc_id ORDER BY doc_id ASC""",
    doc="G.711 companded audio decode (multimodal.py::parse_wav tags "
    "6/7, alaw_to_linear/ulaw_to_linear): telephony-standard µ-law "
    "and A-law WAV payloads expand to linear int16 through the ITU "
    "spec arithmetic inside the same Arrow decode_audio pass as "
    "PCM16. Planted codeword streams per doc_id (µ-law on even ids, "
    "A-law on odd); the oracle re-derives EVERY sample with the same "
    "integer expansion written in SQL (xor/shift/bias) and pins the "
    "full sample stream by md5",
)
def z17_g711_audio(spark, sf_dir):
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from topn_spark.operators.multimodal import (
        decode_audio,
        encode_wav_g711,
    )

    @pandas_udf(T.BinaryType())
    def planted_g711(doc_ids):
        import pandas as pd

        out = []
        for d in doc_ids:
            d = int(d)
            n = 16 + d % 5
            enc = bytes((d * 7 + i * 13) % 256 for i in range(n))
            out.append(
                encode_wav_g711(
                    8000, 1, enc, "ulaw" if d % 2 == 0 else "alaw"
                )
            )
        return pd.Series(out)

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 200
    )
    assets = docs.select(
        "doc_id", planted_g711("doc_id").alias("payload")
    )
    dec = decode_audio(assets)
    return dec.select(
        "doc_id",
        F.col("n_frames"),
        F.expr(
            "aggregate(samples, 0L, (acc, x) -> acc + x)"
        ).alias("sample_sum"),
        F.array_min("samples").alias("sample_min"),
        F.array_max("samples").alias("sample_max"),
        F.md5(
            F.concat_ws(
                ",", F.transform("samples", lambda x: x.cast("string"))
            ).cast("binary")
        ).alias("sample_md5"),
    ).orderBy("doc_id")


@query(
    "z18_web_pipeline",
    """WITH t AS (
  SELECT doc_id,
    CASE doc_id % 4 WHEN 0 THEN 'Title ' || doc_id END AS title,
    CASE doc_id % 4
      WHEN 0 THEN 'Doc ' || doc_id || chr(10) || 'alpha ' || doc_id
                  || ' beta' || chr(10) || 'gamma & delta'
      WHEN 1 THEN 'item A ' || doc_id || chr(10) || 'item B'
                  || chr(10) || 'tail link text'
      WHEN 2 THEN 'A <tag> & B' || chr(10) || 'second ' || doc_id
                  || ' line'
      WHEN 3 THEN 'r1c1' || chr(10) || 'r1c2 ' || doc_id || chr(10)
                  || 'r2' || chr(10) || 'after ' || doc_id
    END AS text
  FROM documents WHERE doc_id < 400),
q AS (
  SELECT doc_id, title, text,
    ROUND(CAST(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g'))
               AS DOUBLE)
          / NULLIF(CAST(LENGTH(text) AS DOUBLE), 0), 6) AS alpha_ratio,
    ROUND(CAST(LENGTH(text)
               - LENGTH(regexp_replace(text, '[^ ]', '', 'g'))
               AS DOUBLE)
          / NULLIF(CAST(len(regexp_extract_all(lower(text),
                                               '[a-z0-9]+'))
                        AS DOUBLE), 0), 6) AS mean_word_len,
    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
         AS BIGINT) AS n_tokens
  FROM t)
SELECT doc_id, title, n_tokens, alpha_ratio,
       (n_tokens >= 10 AND alpha_ratio >= 0.6
        AND mean_word_len BETWEEN 2.0 AND 12.0) AS quality_keep
FROM q ORDER BY doc_id ASC""",
    doc="END-TO-END web-corpus front end: raw planted HTML -> "
    "markup.py::extract_html_text (boilerplate strip, entity decode, "
    "block line rules) -> textstats.py::add_quality over the "
    "EXTRACTED text, one composed map-only job — the first two "
    "stages every crawl-based pretraining pipeline runs. The oracle "
    "recomputes the extracted text as per-shape closed-form strings "
    "(same plants as z13), then derives the identical quality "
    "features and keep flag in SQL",
)
def z18_web_pipeline(spark, sf_dir):
    from topn_spark.operators.markup import extract_html_text
    from topn_spark.operators.textstats import add_quality

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 400
    )
    d = F.col("doc_id")
    ds = d.cast("string")
    html = (
        F.when(
            d % 4 == 0,
            F.concat(
                F.lit("<html><head><title>Title "), ds,
                F.lit("</title><style>p{c:red}</style></head>"
                      "<body><h1>Doc "), ds,
                F.lit("</h1><p>alpha "), ds,
                F.lit(" beta</p><script>var x="), ds,
                F.lit(";</script><p>gamma &amp; delta</p>"
                      "<!--hidden--></body></html>"),
            ),
        )
        .when(
            d % 4 == 1,
            F.concat(
                F.lit("<body><ul><li>item A "), ds,
                F.lit("</li><li>item B</li></ul><div>tail "
                      "<a href=\"/x\">link</a> text</div></body>"),
            ),
        )
        .when(
            d % 4 == 2,
            F.concat(
                F.lit("<body><p>A &lt;tag&gt; &amp; B<br>second "), ds,
                F.lit(" line</p></body>"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("<body><table><tr><td>r1c1</td><td>r1c2 "), ds,
                F.lit("</td></tr><tr><td>r2</td></tr></table>"
                      "<p>after "), ds,
                F.lit("</p></body>"),
            )
        )
    )
    planted = docs.select("doc_id", html.alias("html"))
    extracted = extract_html_text(planted)
    return (
        add_quality(extracted)
        .withColumn(
            "n_tokens",
            F.size(
                F.expr(
                    "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"
                )
            ).cast("bigint"),
        )
        .select(
            "doc_id", "title", "n_tokens", "alpha_ratio",
            "quality_keep",
        )
        .orderBy("doc_id")
    )


def _z19_bpe_unicode_mirror(con):
    """Sennrich mirror for unicode-mode BPE on the planted
    multilingual corpus. Python's re lacks Unicode property classes,
    so the mirror TOKENIZES THROUGH DuckDB's RE2 (the same
    \\p{L}\\p{N} rule the engine runs JVM-side — the dialect pair
    already proven aligned by z14), then replays the exact sequential
    merge loop in pure Python. Exact equality (tolerance 0)."""
    import collections

    rows = con.execute(
        r"""SELECT regexp_extract_all(lower(
              CASE doc_id % 3
                WHEN 0 THEN 'москва москва слово слово слово ' || doc_id
                WHEN 1 THEN 'grüße grüße größe ' || doc_id
                ELSE '東京 東京 京都 data ' || doc_id END),
              '[\p{L}\p{N}]+') AS toks
            FROM documents WHERE doc_id < 300"""
    ).fetchall()
    vocab = collections.Counter()
    for (toks,) in rows:
        for w in toks:
            vocab[w] += 1
    segs = {w: list(w) for w in vocab}
    merges = []
    for _ in range(12):
        pc = collections.Counter()
        for w, c in vocab.items():
            s = segs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        mx = max(pc.values())
        if mx < 2:
            break
        a, b = sorted(p for p, c in pc.items() if c == mx)[0]
        merges.append((a, b))
        for w, s in segs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    n_tokens = sum(len(segs[w]) * c for w, c in vocab.items())
    n_words = sum(vocab.values())
    rows_out = [
        (r, a, b, n_words, n_tokens)
        for r, (a, b) in enumerate(merges)
    ]
    return ["rank", "lhs", "rhs", "corpus_words", "corpus_bpe_tokens"], rows_out


@query(
    "z19_bpe_unicode",
    None,
    doc="Unicode-mode BPE training + application (textstats.py::"
    "bpe_train/apply_bpe mode='unicode'): the merge loop is "
    "script-agnostic, so with the \\p{L}\\p{N} word rule the SAME "
    "two-tier trainer learns Cyrillic/German/CJK subwords the ascii "
    "rule never saw; application pre-tokenizes JVM-side (Python re "
    "has no Unicode classes) and feeds token arrays to the Arrow "
    "encoder. Oracle: Sennrich mirror whose tokenization runs "
    "through DuckDB RE2 (the z14-proven dialect pair), exact",
    tol_oracle=_z19_bpe_unicode_mirror,
    tolerance=0.0,
    tol_keys=("rank",),
)
def z19_bpe_unicode(spark, sf_dir):
    from topn_spark.diag import _attach_scalar
    from topn_spark.operators.textstats import apply_bpe, bpe_train

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 300
    )
    d = F.col("doc_id")
    ds = d.cast("string")
    text = (
        F.when(
            d % 3 == 0,
            F.concat(F.lit("москва москва слово слово слово "), ds),
        )
        .when(d % 3 == 1, F.concat(F.lit("grüße grüße größe "), ds))
        .otherwise(F.concat(F.lit("東京 東京 京都 data "), ds))
    )
    planted = docs.select("doc_id", text.alias("text"))
    merges = bpe_train(planted, 12, min_pair_count=2, mode="unicode")
    totals = apply_bpe(planted, merges, mode="unicode").agg(
        F.sum("n_words").alias("corpus_words"),
        F.sum("n_bpe_tokens").alias("corpus_bpe_tokens"),
    )
    mdf = spark.createDataFrame(
        [(r, a, b) for r, (a, b) in enumerate(merges)],
        "rank int, lhs string, rhs string",
    )
    return _attach_scalar(mdf, totals).orderBy("rank")


@query(
    "z20_script_profile",
    r"""WITH t AS (
  SELECT doc_id,
    CASE doc_id % 4
      WHEN 0 THEN 'Analysis report no ' || doc_id
      WHEN 1 THEN 'Москва и текст номер ' || doc_id
      WHEN 2 THEN '東京都市 statistik ' || doc_id
      ELSE 'مرحبا بالعالم رقم ' || doc_id END AS text
  FROM documents WHERE doc_id < 400),
c AS (
  SELECT doc_id,
    CAST(length(regexp_replace(text, '[^\p{Latin}]', '', 'g')) AS BIGINT) AS n_latin,
    CAST(length(regexp_replace(text, '[^\p{Cyrillic}]', '', 'g')) AS BIGINT) AS n_cyrillic,
    CAST(length(regexp_replace(text, '[^\p{Han}]', '', 'g')) AS BIGINT) AS n_han,
    CAST(length(regexp_replace(text, '[^\p{Greek}]', '', 'g')) AS BIGINT) AS n_greek,
    CAST(length(regexp_replace(text, '[^\p{Arabic}]', '', 'g')) AS BIGINT) AS n_arabic,
    CAST(length(regexp_replace(text, '[^\p{Nd}]', '', 'g')) AS BIGINT) AS n_digit
  FROM t)
SELECT doc_id, n_latin, n_cyrillic, n_han, n_greek, n_arabic, n_digit,
  CASE
    WHEN greatest(n_latin, n_cyrillic, n_han, n_greek, n_arabic) <= 0
      THEN 'und'
    WHEN n_latin = greatest(n_latin, n_cyrillic, n_han, n_greek, n_arabic)
      THEN 'latin'
    WHEN n_cyrillic = greatest(n_latin, n_cyrillic, n_han, n_greek, n_arabic)
      THEN 'cyrillic'
    WHEN n_han = greatest(n_latin, n_cyrillic, n_han, n_greek, n_arabic)
      THEN 'han'
    WHEN n_greek = greatest(n_latin, n_cyrillic, n_han, n_greek, n_arabic)
      THEN 'greek'
    ELSE 'arabic' END AS dominant_script
FROM c ORDER BY doc_id ASC""",
    doc="Unicode script profiling (textstats.py::script_profile): "
    "per-document character counts by script (Latin/Cyrillic/Han/"
    "Greek/Arabic + decimal digits) and the dominant script — the "
    "corpus-routing signal in front of language-specific pipelines. "
    "Pure Catalyst regexp counts, map-only; the oracle recomputes "
    "every count with RE2's \\p{Script} classes (the Java-regex/RE2 "
    "pair verified count-identical) and mirrors the tie-break",
)
def z20_script_profile(spark, sf_dir):
    from topn_spark.operators.textstats import script_profile

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 400
    )
    d = F.col("doc_id")
    ds = d.cast("string")
    text = (
        F.when(d % 4 == 0, F.concat(F.lit("Analysis report no "), ds))
        .when(d % 4 == 1, F.concat(F.lit("Москва и текст номер "), ds))
        .when(d % 4 == 2, F.concat(F.lit("東京都市 statistik "), ds))
        .otherwise(F.concat(F.lit("مرحبا بالعالم رقم "), ds))
    )
    planted = docs.select("doc_id", text.alias("text"))
    return (
        script_profile(planted)
        .select(
            "doc_id", "n_latin", "n_cyrillic", "n_han", "n_greek",
            "n_arabic", "n_digit", "dominant_script",
        )
        .orderBy("doc_id")
    )


@query(
    "z21_nfc_normalize",
    r"""WITH t AS (
  SELECT doc_id,
    CASE doc_id % 4
      WHEN 0 THEN 'cafe' || chr(769) || ' nr ' || doc_id
      WHEN 1 THEN 'A' || chr(778) || 'ngstro' || chr(776) || 'm ' || doc_id
      WHEN 2 THEN 'plain text ' || doc_id
      ELSE chr(12459) || chr(12441) || 'raw ' || doc_id END AS raw
  FROM documents WHERE doc_id < 400)
SELECT doc_id,
  nfc_normalize(raw) AS text,
  CAST(length(raw) AS BIGINT) AS n_before,
  CAST(length(nfc_normalize(raw)) AS BIGINT) AS n_after,
  (nfc_normalize(raw) != raw) AS changed
FROM t ORDER BY doc_id ASC""",
    doc="Unicode NFC normalization (textstats.py::normalize_unicode):"
    " canonical composition before any hash-based stage — visually "
    "identical strings with different codepoint sequences (e +"
    " combining acute vs precomposed e-acute) would dedup/fingerprint"
    " apart. Arrow-vectorized stdlib unicodedata UDF (no JVM builtin"
    " exists). Planted DECOMPOSED fixtures (combining acute/ring/"
    "diaeresis, katakana dakuten); the oracle normalizes with"
    " DuckDB's nfc_normalize and pins text, codepoint counts before/"
    "after, and the changed flag",
)
def z21_nfc_normalize(spark, sf_dir):
    from topn_spark.operators.textstats import normalize_unicode

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 400
    )
    d = F.col("doc_id")
    ds = d.cast("string")
    raw = (
        F.when(d % 4 == 0, F.concat(F.lit("cafe\u0301 nr "), ds))
        .when(
            d % 4 == 1,
            F.concat(F.lit("A\u030angstro\u0308m "), ds),
        )
        .when(d % 4 == 2, F.concat(F.lit("plain text "), ds))
        .otherwise(F.concat(F.lit("\u30ab\u3099raw "), ds))
    )
    planted = docs.select("doc_id", raw.alias("raw"))
    out = normalize_unicode(planted, "raw", form="NFC", out_col="text")
    return out.select(
        "doc_id",
        "text",
        F.length("raw").cast("bigint").alias("n_before"),
        F.length("text").cast("bigint").alias("n_after"),
        (F.col("text") != F.col("raw")).alias("changed"),
    ).orderBy("doc_id")



def _z22_compress_mirror(con):
    """Byte-identical mirror of compression_signals on the real sf
    documents: same stdlib zlib, same level, same ROUND-6 ratio (via
    Decimal HALF_UP mirroring Spark ROUND). Exact (tolerance 0)."""
    import zlib
    from decimal import ROUND_HALF_UP, Decimal

    rows = con.execute(
        "SELECT doc_id, text FROM documents WHERE doc_id < 300 "
        "ORDER BY doc_id"
    ).fetchall()
    out = []
    for did, text in rows:
        if text is None:
            out.append((int(did), None, None, None))
            continue
        raw = text.encode("utf-8")
        nz = len(zlib.compress(raw, 6))
        ratio = (
            None
            if not raw
            else float(
                Decimal(repr(nz / float(len(raw)))).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP
                )
            )
        )
        out.append((int(did), len(raw), nz, ratio))
    return ["doc_id", "n_bytes", "n_zlib_bytes", "compress_ratio"], out


@query(
    "z22_compress_ratio",
    None,
    doc="zlib compressibility quality signal (textstats.py::"
    "compression_signals): per-doc UTF-8 byte length, RFC 1950 "
    "stream length, and the compressed/raw ratio — repetitive or "
    "templated junk compresses far below natural prose, noise "
    "barely compresses; the classic cheap pretraining filter beside "
    "the Gopher rules. Arrow-vectorized stdlib zlib (no JVM "
    "expression exists). Oracle: byte-identical Python zlib mirror "
    "over the same documents, exact",
    tol_oracle=_z22_compress_mirror,
    tolerance=0.0,
    tol_keys=("doc_id",),
)
def z22_compress_ratio(spark, sf_dir):
    from topn_spark.operators.textstats import compression_signals

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 300
    )
    return (
        compression_signals(docs)
        .select("doc_id", "n_bytes", "n_zlib_bytes", "compress_ratio")
        .orderBy("doc_id")
    )


#: Gopher-rule planted corpus: seven shapes, each isolating one rule
#: (0 passes all; 1 bullet-lines; 2 ellipsis-lines; 3 hash-symbol
#: ratio; 4 word count; 5 alpha-word fraction; 6 mean word length).
_Z23_SHAPES = (
    ("the data to be of and that have with pipeline value system ", 7),
    ("• the list of item rows here\n", 60),
    (
        "the data of that value pipeline goes on further and ever on"
        "...\n",
        60,
    ),
    ("the data # of value that rows # have with more size ", 7),
    ("the data of that value ", 1),
    ("the 1111 2222 3333 of 4444 5555 6666 7777 8888 ", 6),
    ("a b c d e of to be in at ", 6),
)


@query(
    "z23_gopher_rules",
    r"""WITH t AS (
  SELECT doc_id,
    CASE doc_id % 7
      WHEN 0 THEN repeat('the data to be of and that have with pipeline value system ', 7)
      WHEN 1 THEN repeat('• the list of item rows here' || chr(10), 60)
      WHEN 2 THEN repeat('the data of that value pipeline goes on further and ever on...' || chr(10), 60)
      WHEN 3 THEN repeat('the data # of value that rows # have with more size ', 7)
      WHEN 4 THEN 'the data of that value '
      WHEN 5 THEN repeat('the 1111 2222 3333 of 4444 5555 6666 7777 8888 ', 6)
      ELSE repeat('a b c d e of to be in at ', 6)
    END || 'nr ' || doc_id AS text
  FROM documents WHERE doc_id < 490),
m AS (
  SELECT doc_id,
    regexp_extract_all(lower(text), '\S+') AS words,
    list_filter(string_split(text, chr(10)), l -> trim(l) != '') AS lines,
    text
  FROM t),
c AS (
  SELECT doc_id,
    CAST(len(words) AS BIGINT) AS n_words,
    ROUND(CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
          / NULLIF(CAST(len(words) AS DOUBLE), 0), 6) AS mean_word_len,
    ROUND(CAST(len(regexp_extract_all(text, '#')) AS DOUBLE)
          / NULLIF(CAST(len(words) AS DOUBLE), 0), 6) AS hash_word_ratio,
    ROUND(CAST(len(regexp_extract_all(text, '\.\.\.|…')) AS DOUBLE)
          / NULLIF(CAST(len(words) AS DOUBLE), 0), 6) AS ellipsis_word_ratio,
    ROUND(CAST(len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•‣▪]'))) AS DOUBLE)
          / NULLIF(CAST(len(lines) AS DOUBLE), 0), 6) AS frac_bullet_lines,
    ROUND(CAST(len(list_filter(lines, l -> regexp_matches(trim(l), '(\.\.\.|…)$'))) AS DOUBLE)
          / NULLIF(CAST(len(lines) AS DOUBLE), 0), 6) AS frac_ellipsis_lines,
    ROUND(CAST(len(list_filter(words, w -> regexp_matches(w, '\p{L}'))) AS DOUBLE)
          / NULLIF(CAST(len(words) AS DOUBLE), 0), 6) AS frac_alpha_words,
    CAST(len(list_intersect(list_distinct(words),
      ['the','be','to','of','and','that','have','with'])) AS BIGINT) AS stop_hits
  FROM m)
SELECT doc_id, n_words, mean_word_len, hash_word_ratio,
  ellipsis_word_ratio, frac_bullet_lines, frac_ellipsis_lines,
  frac_alpha_words, stop_hits,
  COALESCE(n_words BETWEEN 50 AND 100000
    AND mean_word_len BETWEEN 3.0 AND 10.0
    AND hash_word_ratio <= 0.1 AND ellipsis_word_ratio <= 0.1
    AND frac_bullet_lines <= 0.9 AND frac_ellipsis_lines <= 0.3
    AND frac_alpha_words >= 0.8 AND stop_hits >= 2,
    false) AS gopher_keep
FROM c ORDER BY doc_id ASC""",
    doc="The full published Gopher quality-rule suite (textstats.py::"
    "gopher_rules; Rae et al. 2021 Appendix A1.1.2): word count,"
    " mean word length, hash/ellipsis symbol ratios, bullet- and"
    " ellipsis-line fractions, alpha-word fraction, and the"
    " required-stopword gate, each as its own column plus the"
    " composite keep flag. Seven planted document shapes each"
    " isolate exactly one rule. Map-only Catalyst arrays; the"
    " oracle recomputes every rule with DuckDB list ops over the"
    " identically-planted corpus, hash-exact",
)
def z23_gopher_rules(spark, sf_dir):
    from topn_spark.operators.textstats import gopher_rules

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 490
    )
    d = F.col("doc_id")
    text = F.lit(None).cast("string")
    branches = [
        (d % 7 == i, F.lit(s * n)) for i, (s, n) in enumerate(_Z23_SHAPES)
    ]
    text = F.when(branches[0][0], branches[0][1])
    for cond, val in branches[1:]:
        text = text.when(cond, val)
    text = F.concat(text, F.lit("nr "), d.cast("string"))
    planted = docs.select("doc_id", text.alias("text"))
    return (
        gopher_rules(planted)
        .select(
            "doc_id", "n_words", "mean_word_len", "hash_word_ratio",
            "ellipsis_word_ratio", "frac_bullet_lines",
            "frac_ellipsis_lines", "frac_alpha_words", "stop_hits",
            "gopher_keep",
        )
        .orderBy("doc_id")
    )


#: C4 planted corpus: six shapes (0 clean page; 1 curly-brace page;
#: 2 lorem-ipsum page; 3 javascript-heavy page; 4 no terminal
#: punctuation anywhere; 5 quote/interrogative/exclamation endings).
_Z24_SHAPES = (
    "The first fine sentence sits right here.\nno.\n"
    "no terminal punctuation on this line\n"
    "A second good sentence follows on here!\n"
    "A third good sentence follows on here.\n"
    "A fourth good sentence follows on here.\n"
    'A fifth closing sentence wraps it up."',
    "Has a curly { brace marker inside it.\n"
    "But otherwise a fine long sentence here.\n"
    "And another good long one right here.\n"
    "And a third one to be sure of it.\n"
    "And a fourth one to seal the deal.",
    "Standard Lorem Ipsum filler text goes here.\n"
    "But otherwise a fine long sentence here.\n"
    "And another good long one right here.\n"
    "And a third one to be sure of it.\n"
    "And a fourth one to seal the deal.",
    "Please enable javascript to view this page.\n"
    "This page needs javascript enabled to work.\n"
    "Only one proper sentence survives in here.",
    "a heading without any closing mark\nanother bare fragment line\n"
    "yet more words that never end properly",
    'He said the words clearly: "follow the data."\n'
    "She replied with certainty that it would hold!\n"
    "They agreed on the final plan together?",
)


@query(
    "z24_c4_line_filter",
    r"""WITH t AS (
  SELECT doc_id,
    CASE doc_id % 6
      WHEN 0 THEN 'The first fine sentence sits right here.' || chr(10) || 'no.' || chr(10) || 'no terminal punctuation on this line' || chr(10) || 'A second good sentence follows on here!' || chr(10) || 'A third good sentence follows on here.' || chr(10) || 'A fourth good sentence follows on here.' || chr(10) || 'A fifth closing sentence wraps it up."'
      WHEN 1 THEN 'Has a curly { brace marker inside it.' || chr(10) || 'But otherwise a fine long sentence here.' || chr(10) || 'And another good long one right here.' || chr(10) || 'And a third one to be sure of it.' || chr(10) || 'And a fourth one to seal the deal.'
      WHEN 2 THEN 'Standard Lorem Ipsum filler text goes here.' || chr(10) || 'But otherwise a fine long sentence here.' || chr(10) || 'And another good long one right here.' || chr(10) || 'And a third one to be sure of it.' || chr(10) || 'And a fourth one to seal the deal.'
      WHEN 3 THEN 'Please enable javascript to view this page.' || chr(10) || 'This page needs javascript enabled to work.' || chr(10) || 'Only one proper sentence survives in here.'
      WHEN 4 THEN 'a heading without any closing mark' || chr(10) || 'another bare fragment line' || chr(10) || 'yet more words that never end properly'
      ELSE 'He said the words clearly: "follow the data."' || chr(10) || 'She replied with certainty that it would hold!' || chr(10) || 'They agreed on the final plan together?'
    END || chr(10) || 'nr ' || doc_id AS text
  FROM documents WHERE doc_id < 480),
m AS (
  SELECT doc_id, text,
    list_filter(string_split(text, chr(10)),
      l -> regexp_matches(trim(l), '[.!?"]$')
        AND len(regexp_extract_all(trim(l), '\S+')) >= 3
        AND NOT contains(lower(l), 'javascript')) AS kept
  FROM t),
c AS (
  SELECT doc_id,
    COALESCE(array_to_string(kept, chr(10)), '') AS clean_text,
    CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
    CAST(len(kept) AS BIGINT) AS n_kept_lines,
    CAST(len(regexp_extract_all(COALESCE(array_to_string(kept, chr(10)), ''), '[.!?]')) AS BIGINT) AS n_sentences,
    text
  FROM m)
SELECT doc_id, clean_text, n_lines, n_kept_lines, n_sentences,
  COALESCE(n_sentences >= 5
    AND NOT contains(lower(text), 'lorem ipsum')
    AND NOT contains(text, '{'), false) AS c4_keep
FROM c ORDER BY doc_id ASC""",
    doc="C4-style line-level cleaning (textstats.py::c4_line_filter;"
    " Raffel et al. 2020 §2.2, paper constants): keep lines ending in"
    " terminal punctuation with >= 3 words and no 'javascript'"
    " mention, then gate the page on >= 5 sentences in the kept text,"
    " no 'lorem ipsum', and no curly brace. Emits the cleaned text"
    " plus line/sentence counts and the keep flag. Six planted page"
    " shapes isolate each rule. Map-only higher-order arrays; the"
    " oracle replays every rule in DuckDB list ops, hash-exact",
)
def z24_c4_line_filter(spark, sf_dir):
    from topn_spark.operators.textstats import c4_line_filter

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 480
    )
    d = F.col("doc_id")
    text = F.when(d % 6 == 0, F.lit(_Z24_SHAPES[0]))
    for i in range(1, 6):
        text = text.when(d % 6 == i, F.lit(_Z24_SHAPES[i]))
    text = F.concat(text, F.lit("\nnr "), d.cast("string"))
    planted = docs.select("doc_id", text.alias("text"))
    return (
        c4_line_filter(planted)
        .select(
            "doc_id", "clean_text", "n_lines", "n_kept_lines",
            "n_sentences", "c4_keep",
        )
        .orderBy("doc_id")
    )


def _z25_dup_span_mirror(con):
    """Exact Python mirror of remove_duplicate_spans(window=8,
    min_count=2, keep='first') over the real documents: same token
    rule, same global first-occurrence ordering by (doc_id, pos),
    same overlapping-span coverage. Exact strings (tolerance 0)."""
    import re

    rows = con.execute(
        "SELECT doc_id, text FROM documents WHERE doc_id < 400 "
        "ORDER BY doc_id"
    ).fetchall()
    w = 8
    toks = {
        int(d): re.findall("[a-z0-9]+", (t or "").lower())
        for d, t in rows
    }
    occ: dict[tuple, list] = {}
    for d in sorted(toks):
        ts = toks[d]
        for p in range(len(ts) - w + 1):
            occ.setdefault(tuple(ts[p : p + w]), []).append((d, p))
    removed: dict[int, list] = {}
    for lst in occ.values():
        if len(lst) >= 2:
            for d, p in lst[1:]:
                removed.setdefault(d, []).append(p)
    out = []
    for d in sorted(toks):
        ts = toks[d]
        dups = sorted(removed.get(d, []))
        cov = set()
        for p in dups:
            cov.update(range(p, p + w))
        kept = [t for i, t in enumerate(ts) if i not in cov]
        out.append((d, len(ts), len(dups), len(cov), " ".join(kept)))
    return (
        ["doc_id", "n_tokens", "n_dup_windows", "n_removed",
         "clean_text"],
        out,
    )


@query(
    "z25_dup_span_removal",
    None,  # windowed first-occurrence logic is not ANSI-SQL-shaped;
    # the exact Python mirror below is the oracle (tolerance 0)
    doc="Exact-substring deduplication at token-window granularity"
    " (textstats.py::remove_duplicate_spans; Lee et al. 2022,"
    " arXiv:2107.06499): every 8-token span occurring >= 2 times"
    " corpus-wide is removed except its globally first occurrence,"
    " and the documents are rebuilt from the surviving tokens —"
    " the REMOVAL stage whose measurement half is y18. One"
    " window-hash-keyed shuffle computes occurrence count and"
    " first-occurrence rank together; span merging and token"
    " filtering are per-row array ops. Oracle: exact Python mirror"
    " (tolerance 0) incl. the rebuilt clean_text strings",
    tol_oracle=_z25_dup_span_mirror,
    tolerance=0.0,
    tol_keys=("doc_id",),
)
def z25_dup_span_removal(spark, sf_dir):
    from topn_spark.operators.textstats import remove_duplicate_spans

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 400
    )
    return remove_duplicate_spans(
        docs, window=8, min_count=2, keep="first"
    ).orderBy("doc_id")


def _z26_temperature_mirror(con):
    """Exact mirror of temperature_rebalance(total=600, alpha=0.3) on
    the real documents: identical driver-side quota arithmetic
    (Python float ** and round, summed in sorted-group order) and the
    identical (md5(id), id) per-group rank cut run in DuckDB. Exact
    (tolerance 0)."""
    counts = dict(
        con.execute(
            "SELECT lang, COUNT(*) FROM documents "
            "WHERE lang IS NOT NULL GROUP BY lang"
        ).fetchall()
    )
    total, alpha = 600, 0.3
    powed = {g: float(n) ** alpha for g, n in counts.items()}
    z = sum(powed[g] for g in sorted(powed))
    quotas = {
        g: min(counts[g], int(round(total * powed[g] / z)))
        for g in counts
    }
    out = []
    for g in sorted(quotas):
        rows = con.execute(
            "SELECT lang, doc_id FROM documents WHERE lang = ? "
            "ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC "
            "LIMIT ?",
            [g, quotas[g]],
        ).fetchall()
        out.extend((str(l), int(d)) for l, d in rows)
    out.sort()
    return ["lang", "doc_id"], out


@query(
    "z26_temperature_rebalance",
    None,  # quota arithmetic is driver-side Python; the exact mirror
    # below replicates it bit-for-bit (tolerance 0)
    doc="Temperature-based corpus rebalancing (pipeline.py::"
    "temperature_rebalance; the XLM-R exponential-smoothing recipe,"
    " Conneau et al. 2020 §3.1): per-language quotas proportional to"
    " count^0.3 over the MEASURED language distribution — flattening"
    " high-resource dominance — then the engine-portable"
    " (md5(id), id) rank cut per language. The group-count aggregate"
    " is model-sized (#languages) and runs the quota arithmetic"
    " driver-side; the selection is one grouped window with a"
    " map-side WindowGroupLimit cut. Oracle: exact mirror of both"
    " stages, tolerance 0",
    tol_oracle=_z26_temperature_mirror,
    tolerance=0.0,
    tol_keys=("lang", "doc_id"),
)
def z26_temperature_rebalance(spark, sf_dir):
    from topn_spark.operators.pipeline import temperature_rebalance

    docs = load_table(spark, sf_dir, "documents")
    return (
        temperature_rebalance(
            docs, total=600, alpha=0.3, group_col="lang",
            id_col="doc_id",
        )
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id")
    )


def _z27_repetition_mirror(con):
    """Independent re-derivation of the Gopher repetition signals
    (declared semantics in textstats._gopher_repetition_signals's
    docstring) over the same planted/real text mix. Exact
    (tolerance 0): integer counting + one round(6) per signal."""
    import re
    from collections import Counter

    from topn_spark.operators.textstats import GOPHER_REP_THRESHOLDS

    rows = con.execute(
        "SELECT doc_id, text FROM documents WHERE doc_id < 300 "
        "ORDER BY doc_id"
    ).fetchall()

    def planted(did, real):
        m = did % 5
        if m == 0:
            return (
                f"alpha beta gamma {did}\nalpha beta gamma {did}\n"
                f"omega unique tail {did}"
            )
        if m == 1:
            return (
                f"first para body {did}\n\nfirst para body {did}\n\n"
                f"second distinct para {did}"
            )
        if m == 2:
            return "buy now " * 20 + f"end {did}"
        return real

    out = []
    for did, real in rows:
        text = planted(int(did), real)
        lines = [l for l in (x.strip() for x in text.split("\n")) if l]
        paras = [
            p for p in (x.strip() for x in re.split(r"\n\s*\n", text)) if p
        ]
        sig = {}

        def dup(units, frac_key, char_key):
            if not units:
                sig[frac_key] = None
                sig[char_key] = None
                return
            c = Counter(units)
            sig[frac_key] = round(
                sum(v - 1 for v in c.values() if v > 1) / len(units), 6
            )
            chars = sum(len(u) for u in units)
            sig[char_key] = (
                None
                if chars == 0
                else round(
                    sum((v - 1) * len(u) for u, v in c.items() if v > 1)
                    / chars,
                    6,
                )
            )

        dup(lines, "frac_dup_lines", "frac_dup_line_chars")
        dup(paras, "frac_dup_paras", "frac_dup_para_chars")
        toks = re.findall("[a-z0-9]+", text.lower())
        tc = sum(len(t) for t in toks)
        for n in (2, 3, 4):
            key = f"top{n}_char_frac"
            if len(toks) < n or tc == 0:
                sig[key] = None
                continue
            c = Counter(
                tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)
            )
            top = max(c.values())
            if top < 2:
                sig[key] = 0.0
                continue
            g = min(k for k, v in c.items() if v == top)
            sig[key] = round(top * sum(map(len, g)) / tc, 6)
        for n in (5, 6, 7, 8, 9, 10):
            key = f"dup{n}_char_frac"
            if len(toks) < n or tc == 0:
                sig[key] = None
                continue
            grams = [
                tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)
            ]
            c = Counter(grams)
            cov: set[int] = set()
            for i, g in enumerate(grams):
                if c[g] >= 2:
                    cov.update(range(i, i + n))
            sig[key] = round(sum(len(toks[j]) for j in cov) / tc, 6)
        keep = all(
            (sig[k] or 0.0) <= thr
            for k, thr in GOPHER_REP_THRESHOLDS.items()
        )
        out.append(
            (int(did),)
            + tuple(sig[k] for k in GOPHER_REP_THRESHOLDS)
            + (keep,)
        )
    cols = (
        ["doc_id"] + list(GOPHER_REP_THRESHOLDS) + ["gopher_rep_keep"]
    )
    return cols, out


@query(
    "z27_gopher_repetition",
    None,  # per-doc multi-size gram counting is the declared Arrow
    # case; the independent Python mirror below is exact (tolerance 0)
    doc="The published Gopher repetition-rule suite (textstats.py::"
    "gopher_repetition; Rae et al. 2021 Table A1) — duplicate"
    " line/paragraph fractions (count + character), top-{2,3,4}-gram"
    " character fractions, duplicated-{5..10}-gram character"
    " coverage, and the composite keep flag with the Table A1"
    " thresholds; completes the Gopher filter whose quality half is"
    " z23. One Arrow pass computes all thirteen signals (nine gram"
    " sizes would be interpreted AND re-tokenized per size as"
    " Catalyst folds). Mixed corpus: planted dup-line/dup-para/spam"
    " shapes + real documents. Oracle: independent Python"
    " re-derivation, exact",
    tol_oracle=_z27_repetition_mirror,
    tolerance=0.0,
    tol_keys=("doc_id",),
)
def z27_gopher_repetition(spark, sf_dir):
    from topn_spark.operators.textstats import (
        GOPHER_REP_THRESHOLDS,
        gopher_repetition,
    )

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 300
    )
    d = F.col("doc_id")
    ds = d.cast("string")
    nl = F.lit("\n")
    text = (
        F.when(
            d % 5 == 0,
            F.concat(
                F.lit("alpha beta gamma "), ds, nl,
                F.lit("alpha beta gamma "), ds, nl,
                F.lit("omega unique tail "), ds,
            ),
        )
        .when(
            d % 5 == 1,
            F.concat(
                F.lit("first para body "), ds, F.lit("\n\n"),
                F.lit("first para body "), ds, F.lit("\n\n"),
                F.lit("second distinct para "), ds,
            ),
        )
        .when(
            d % 5 == 2,
            F.concat(F.lit("buy now " * 20 + "end "), ds),
        )
        .otherwise(F.col("text"))
    )
    planted = docs.select("doc_id", text.alias("text"))
    return (
        gopher_repetition(planted)
        .select(
            "doc_id", *GOPHER_REP_THRESHOLDS, "gopher_rep_keep"
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Model-based corpus filtering: CCNet perplexity + DSIR (operators/lm.py)
# --------------------------------------------------------------------------

@query(
    "z28_bigram_lm",
    """WITH t AS (
  SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS w
  FROM documents WHERE doc_id % 5 <> 0),
b AS (
  SELECT w[i] || ' ' || w[i + 1] AS bg
  FROM t, UNNEST(range(1, len(w))) AS r(i))
SELECT bg, COUNT(*) AS c FROM b GROUP BY bg
HAVING COUNT(*) >= 3 ORDER BY bg ASC LIMIT 500""",
    doc="Bigram LM TRAINING (lm.py::train_bigram_lm): the count-table "
    "half of CCNet-style model-based filtering — one map-side-"
    "combined hash agg over the corpus bigram stream, zipf tail "
    "pruned at min_count=3 (the unigram denominator table is never "
    "pruned). Counts are exact ints, hash-exact vs the DuckDB "
    "UNNEST(range) re-derivation. Train split doc_id % 5 != 0 "
    "(held-in corpus; z29 scores the complement pattern)",
)
def z28_bigram_lm(spark, sf_dir):
    from topn_spark.operators.lm import train_bigram_lm

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 5 != 0
    )
    _, bigrams = train_bigram_lm(docs, min_count=3)
    return bigrams.orderBy("bg").limit(500)


def _z29_ppl_mirror(con):
    """Independent Python mirror of train_bigram_lm +
    perplexity_score: same ASCII token rule, same add-k formula
    ((c12+k)/(c1+k*V), V = vocab+1), same min_count=3 bigram
    pruning. Sum order differs from Spark's plan-dependent partial
    aggregation, hence tolerance (1e-9 relative) instead of hash."""
    import math
    import re
    from collections import Counter

    uni: Counter = Counter()
    bi: Counter = Counter()
    for (text,) in con.execute(
        "SELECT text FROM documents WHERE doc_id % 5 <> 0"
    ).fetchall():
        if text is None:
            continue
        t = re.findall(r"[a-z0-9]+", text.lower())
        uni.update(t)
        bi.update(
            t[i] + " " + t[i + 1] for i in range(len(t) - 1)
        )
    bic = {g: c for g, c in bi.items() if c >= 3}
    v = float(len(uni) + 1)
    k = 1.0
    out = []
    for did, text in con.execute(
        "SELECT doc_id, text FROM documents WHERE doc_id < 300 "
        "ORDER BY doc_id"
    ).fetchall():
        if text is None:
            continue
        t = re.findall(r"[a-z0-9]+", text.lower())
        if len(t) < 2:
            continue
        s = 0.0
        n = len(t) - 1
        for i in range(n):
            g = t[i] + " " + t[i + 1]
            s += math.log(
                (bic.get(g, 0) + k) / (uni.get(t[i], 0) + k * v)
            )
        out.append((int(did), n, s, math.exp(-s / n)))
    return ["doc_id", "n_bigrams", "logprob", "ppl"], out


@query(
    "z29_perplexity",
    None,  # float log-prob sums are order-dependent — tolerance mirror
    doc="CCNet-style LM perplexity SCORING (lm.py::perplexity_score; "
    "Wenzek et al. 2020): every document scored under the add-k-"
    "smoothed bigram model trained on the doc_id % 5 != 0 split — "
    "explode to the per-doc bigram stream, LEFT join the bigram + "
    "unigram count tables on their gram keys (AQE broadcast/skew "
    "territory; the hot 'of the' keys are the 100 TB story), one "
    "per-doc re-agg to (n_bigrams, logprob, ppl). Oracle: "
    "independent Python mirror, 1e-9 relative",
    tol_oracle=_z29_ppl_mirror,
    tolerance=1e-9,
    tol_keys=("doc_id",),
)
def z29_perplexity(spark, sf_dir):
    from topn_spark.operators.lm import (
        perplexity_score,
        train_bigram_lm,
    )

    docs = load_table(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 5 != 0)
    unigrams, bigrams = train_bigram_lm(train, min_count=3)
    scored = perplexity_score(
        docs.where(F.col("doc_id") < 300), unigrams, bigrams, k=1.0
    )
    return scored.orderBy("doc_id")


#: z30 planted quality tiers: in-model prose / one-corruption prose /
#: out-of-vocabulary gibberish. Tier sizes 150/90/60 put the 1/3 and
#: 2/3 percentile cuts strictly INSIDE the tier-0 and tier-1 constant
#: runs, so ANY linear-interpolation percentile variant yields exactly
#: the tier value and the bucket strings are engine-stable.
_Z30_CLEAN = (
    "the quick brown fox jumps over the lazy dog again and again"
)
_Z30_NOISY = (
    "the quick brown fox jumps over the lazy zorblat vexquip"
)
_Z30_GIBBER = "zxqv wvut tsrq qpon nmlk kjih hgfe edcb"


def _z30_buckets_mirror(con):
    """Mirror of the full CCNet chain over the planted tiers: train on
    the >= 300 docs (all planted clean), score the < 300 docs, ROUND
    ppl to 6 (Decimal HALF_UP = Spark ROUND), rank-interpolated
    1/3 / 2/3 thresholds, head/middle/tail CASE. Exact (tolerance 0):
    rounding crushes sum-order ulp noise and the cuts land inside
    constant runs."""
    import math
    import re
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    n_train = con.execute(
        "SELECT COUNT(*) FROM documents WHERE doc_id >= 300"
    ).fetchone()[0]
    toks = re.findall(r"[a-z0-9]+", _Z30_CLEAN.lower())
    uni: Counter = Counter()
    bi: Counter = Counter()
    uni.update(toks)
    bi.update(
        toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)
    )
    uni = {w: c * n_train for w, c in uni.items()}
    bi = {g: c * n_train for g, c in bi.items()}
    v = float(len(uni) + 1)
    k = 1.0

    def rnd6(x):
        return float(
            Decimal(repr(x)).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )

    def score(text):
        t = re.findall(r"[a-z0-9]+", text.lower())
        s = 0.0
        n = len(t) - 1
        for i in range(n):
            g = t[i] + " " + t[i + 1]
            s += math.log(
                (bi.get(g, 0) + k) / (uni.get(t[i], 0) + k * v)
            )
        return n, rnd6(math.exp(-s / n))

    rows = []
    for (did,) in con.execute(
        "SELECT doc_id FROM documents WHERE doc_id < 300 "
        "ORDER BY doc_id"
    ).fetchall():
        did = int(did)
        if did % 2 == 0:
            text = _Z30_CLEAN
        elif did % 10 < 7:
            text = _Z30_NOISY
        else:
            text = _Z30_GIBBER
        n, ppl = score(text)
        rows.append([did, n, ppl])
    ppls = sorted(r[2] for r in rows)
    m = len(ppls)

    def pct(p):
        r = p * (m - 1)
        lo = int(math.floor(r))
        g = r - lo
        hi = min(lo + 1, m - 1)
        return ppls[lo] * (1 - g) + ppls[hi] * g

    t1, t2 = pct(1.0 / 3.0), pct(2.0 / 3.0)
    out = [
        (
            did,
            n,
            ppl,
            "head"
            if ppl <= t1
            else ("middle" if ppl <= t2 else "tail"),
        )
        for did, n, ppl in rows
    ]
    return ["doc_id", "n_bigrams", "ppl", "bucket"], out


@query(
    "z30_ccnet_buckets",
    None,  # bucket thresholds are driver-collected floats — mirror
    doc="CCNet head/middle/tail bucketing (lm.py::ccnet_buckets; "
    "Wenzek et al. 2020 keep the low-perplexity head) over planted "
    "quality tiers: in-model prose / one-corruption prose / OOV "
    "gibberish. Exact-percentile thresholds (two doubles to the "
    "driver) then a map-only CASE — no second shuffle. ppl is "
    "ROUND(...,6) BEFORE thresholding so tier runs are exactly "
    "constant and the cuts (placed inside runs by the 150/90/60 "
    "tier sizes) are interpolation-variant-proof. Oracle: full "
    "Python chain mirror, exact",
    tol_oracle=_z30_buckets_mirror,
    tolerance=0.0,
    tol_keys=("doc_id",),
)
def z30_ccnet_buckets(spark, sf_dir):
    from topn_spark.operators.lm import (
        ccnet_buckets,
        perplexity_score,
        train_bigram_lm,
    )

    docs = load_table(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") >= 300).select(
        "doc_id", F.lit(_Z30_CLEAN).alias("text")
    )
    d = F.col("doc_id")
    tier_text = (
        F.when(d % 2 == 0, F.lit(_Z30_CLEAN))
        .when(d % 10 < 7, F.lit(_Z30_NOISY))
        .otherwise(F.lit(_Z30_GIBBER))
    )
    planted = docs.where(d < 300).select(
        "doc_id", tier_text.alias("text")
    )
    unigrams, bigrams = train_bigram_lm(train)
    scored = perplexity_score(planted, unigrams, bigrams, k=1.0).select(
        "doc_id", "n_bigrams", F.round("ppl", 6).alias("ppl")
    )
    return ccnet_buckets(scored).orderBy("doc_id")


def _z31_dsir_mirror(con):
    """Independent DSIR mirror: same md5 bucket hash (first 8 hex
    chars mod B — the engine-portable hashed_features convention),
    same Laplace-smoothed bucket probabilities, same target/raw
    splits. logweight under 1e-9 relative (per-bucket log ratios are
    libm calls; the per-doc sum order differs)."""
    import hashlib
    import math
    import re
    from collections import Counter

    b = 128

    def bucket(term):
        return (
            int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % b
        )

    def counts(sql):
        c: Counter = Counter()
        for (text,) in con.execute(sql).fetchall():
            if text is None:
                continue
            for t in re.findall(r"[a-z0-9]+", text.lower()):
                c[bucket(t)] += 1
        return c

    tc = counts(
        "SELECT text FROM documents WHERE doc_id % 10 = 0"
    )
    rc = counts("SELECT text FROM documents")
    tt, rt = sum(tc.values()), sum(rc.values())
    lr = {
        i: math.log((tc.get(i, 0) + 1.0) / float(tt + b))
        - math.log((rc.get(i, 0) + 1.0) / float(rt + b))
        for i in range(b)
    }
    out = []
    for did, text in con.execute(
        "SELECT doc_id, text FROM documents WHERE doc_id < 300 "
        "ORDER BY doc_id"
    ).fetchall():
        if text is None:
            continue
        dc: Counter = Counter()
        for t in re.findall(r"[a-z0-9]+", text.lower()):
            dc[bucket(t)] += 1
        if not dc:
            continue
        out.append(
            (
                int(did),
                sum(dc.values()),
                sum(c * lr[i] for i, c in dc.items()),
            )
        )
    return ["doc_id", "n_tokens", "logweight"], out


@query(
    "z31_dsir_weights",
    None,  # log-ratio sums are float — tolerance mirror
    doc="DSIR importance-resampling log-weights (lm.py::"
    "dsir_logweights; Xie et al. 2023): hashed-unigram bag-of-words "
    "models (128 md5 buckets — model size independent of corpus "
    "size, the hashing-trick point at 100 TB) for the target split "
    "(doc_id % 10 = 0) vs the raw corpus; per-doc logweight = "
    "sum_b c_b * (ln p_target(b) - ln p_raw(b)), Laplace-smoothed. "
    "Three hash aggs + one broadcast join on the bucket id. "
    "Oracle: independent Python mirror, 1e-9 relative",
    tol_oracle=_z31_dsir_mirror,
    tolerance=1e-9,
    tol_keys=("doc_id",),
)
def z31_dsir_weights(spark, sf_dir):
    from topn_spark.operators.lm import dsir_logweights

    docs = load_table(spark, sf_dir, "documents")
    return dsir_logweights(
        docs.where(F.col("doc_id") < 300),
        target=docs.where(F.col("doc_id") % 10 == 0),
        raw=docs,
        n_buckets=128,
    ).orderBy("doc_id")


@query(
    "z32_warc_parse",
    """SELECT doc_id // 5 AS blob_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id // 5 ORDER BY doc_id) - 1
            AS BIGINT) AS rec_idx,
       'response' AS warc_type,
       'http://example.com/doc/' || doc_id AS target_uri,
       CAST(octet_length(encode(text)) AS BIGINT) AS content_length,
       text AS payload_text
FROM documents WHERE doc_id < 300
ORDER BY blob_id ASC, rec_idx ASC""",
    doc="WARC web-archive ingestion (sources/warc.py::parse_warc; ISO "
    "28500 — the CommonCrawl front end): five documents are framed "
    "into each WARC blob IN SPARK (version line + typed headers + "
    "byte-exact Content-Length + CRLFCRLF terminators, cast to "
    "binary), then the Arrow mapInPandas record walk explodes the "
    "blobs back into records. Content-Length is sliced in BYTES — "
    "payloads containing CRLFCRLF cannot desync the walk. Oracle: "
    "closed-form reconstruction from the same documents, hash-exact",
)
def z32_warc_parse(spark, sf_dir):
    from topn_spark.sources.warc import parse_warc

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 300
    )
    d = F.col("doc_id")
    rec = F.concat(
        F.lit(
            "WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: "
            "<urn:doc:"
        ),
        d.cast("string"),
        F.lit(">\r\nWARC-Target-URI: http://example.com/doc/"),
        d.cast("string"),
        F.lit("\r\nContent-Length: "),
        F.octet_length("text").cast("string"),
        F.lit("\r\n\r\n"),
        F.col("text"),
        F.lit("\r\n\r\n"),
    )
    blobs = (
        docs.select(
            F.expr("doc_id DIV 5").alias("blob_id"),
            F.struct(d.alias("doc_id"), rec.alias("rec")).alias("s"),
        )
        .groupBy("blob_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("s")),
                    lambda s: s["rec"],
                ),
                "",
            )
            .cast("binary")
            .alias("content"),
        )
    )
    return (
        parse_warc(blobs)
        .select(
            "blob_id",
            F.col("rec_idx").cast("bigint").alias("rec_idx"),
            "warc_type",
            "target_uri",
            "content_length",
            F.col("payload").cast("string").alias("payload_text"),
        )
        .orderBy("blob_id", "rec_idx")
    )


def _z33_oracle():
    from topn_spark.operators.layout import zorder_key_sql

    z = zorder_key_sql(["o_custkey", "o_orderkey"], 8)
    return f"""WITH k AS (
  SELECT o_orderkey, o_custkey, {z} AS z FROM orders),
b AS (SELECT z >> 10 AS block, o_orderkey, o_custkey FROM k)
SELECT block, COUNT(*) AS n,
  MIN(o_custkey) AS o_custkey_min, MAX(o_custkey) AS o_custkey_max,
  MIN(o_orderkey) AS o_orderkey_min, MAX(o_orderkey) AS o_orderkey_max
FROM b GROUP BY block ORDER BY block ASC"""


@query(
    "z33_zorder_blocks",
    _z33_oracle(),
    doc="Z-order block min/max accounting (layout.py::block_stats "
    "over the x56 zorder_key): per-block (top-6-z-bits) count and "
    "per-dimension min/max over (o_custkey, o_orderkey) — the "
    "parquet-footer statistics a multi-dimension range scan prunes "
    "on, materialized IN-ENGINE (one hash agg keyed by block; "
    "contrast file_skipping_report's driver-side footer walk). "
    "Pure integer arithmetic; the oracle re-derives the key with "
    "generated identical SQL terms (zorder_key_sql), hash-exact",
)
def z33_zorder_blocks(spark, sf_dir):
    from topn_spark.operators.layout import block_stats, zorder_key

    ords = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    keyed = ords.withColumn(
        "z", zorder_key(["o_custkey", "o_orderkey"], bits=8)
    )
    return block_stats(
        keyed,
        dims=["o_custkey", "o_orderkey"],
        block_col=F.shiftright("z", 10),
    ).orderBy("block")


@query(
    "z34_cc_pipeline",
    """WITH t AS (
  SELECT doc_id,
    CASE WHEN doc_id % 2 = 0 THEN 'Title ' || doc_id END AS title,
    CASE doc_id % 2
      WHEN 0 THEN 'Doc ' || doc_id || chr(10) || 'alpha ' || doc_id
                  || ' beta' || chr(10) || 'gamma & delta'
      WHEN 1 THEN 'item A ' || doc_id || chr(10) || 'item B'
                  || chr(10) || 'tail link text'
    END AS text
  FROM documents WHERE doc_id < 400),
q AS (
  SELECT doc_id, title, text,
    ROUND(CAST(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g'))
               AS DOUBLE)
          / NULLIF(CAST(LENGTH(text) AS DOUBLE), 0), 6) AS alpha_ratio,
    ROUND(CAST(LENGTH(text)
               - LENGTH(regexp_replace(text, '[^ ]', '', 'g'))
               AS DOUBLE)
          / NULLIF(CAST(len(regexp_extract_all(lower(text),
                                               '[a-z0-9]+'))
                        AS DOUBLE), 0), 6) AS mean_word_len,
    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
         AS BIGINT) AS n_tokens
  FROM t)
SELECT doc_id, 'http://crawl.test/doc/' || doc_id AS target_uri,
       title, n_tokens,
       (n_tokens >= 10 AND alpha_ratio >= 0.6
        AND mean_word_len BETWEEN 2.0 AND 12.0) AS quality_keep
FROM q ORDER BY doc_id ASC""",
    doc="FULL CommonCrawl-shaped front end in ONE composed job: WARC "
    "blobs (framed in Spark, four HTML response records each) -> "
    "sources/warc.py::parse_warc (byte-sliced record walk) -> doc id "
    "recovered from WARC-Target-URI -> markup.py::extract_html_text "
    "-> textstats.py::add_quality keep gate. Everything after the "
    "blob build is the real ingestion path a crawl dump takes — "
    "binary archive to scored text with no intermediate "
    "materialization. Oracle: closed-form extracted text per planted "
    "shape (z13/z18 recipe) + the identical quality arithmetic in "
    "SQL, hash-exact",
)
def z34_cc_pipeline(spark, sf_dir):
    from topn_spark.operators.markup import extract_html_text
    from topn_spark.operators.textstats import add_quality
    from topn_spark.sources.warc import parse_warc

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 400
    )
    d = F.col("doc_id")
    ds = d.cast("string")
    html = F.when(
        d % 2 == 0,
        F.concat(
            F.lit("<html><head><title>Title "), ds,
            F.lit("</title><style>p{c:red}</style></head>"
                  "<body><h1>Doc "), ds,
            F.lit("</h1><p>alpha "), ds,
            F.lit(" beta</p><script>var x="), ds,
            F.lit(";</script><p>gamma &amp; delta</p>"
                  "<!--hidden--></body></html>"),
        ),
    ).otherwise(
        F.concat(
            F.lit("<body><ul><li>item A "), ds,
            F.lit("</li><li>item B</li></ul><div>tail "
                  "<a href=\"/x\">link</a> text</div></body>"),
        )
    )
    rec = F.concat(
        F.lit(
            "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "
            "http://crawl.test/doc/"
        ),
        ds,
        F.lit("\r\nContent-Length: "),
        F.octet_length(html).cast("string"),
        F.lit("\r\n\r\n"),
        html,
        F.lit("\r\n\r\n"),
    )
    blobs = (
        docs.select(
            F.expr("doc_id DIV 4").alias("blob_id"),
            F.struct(d.alias("doc_id"), rec.alias("rec")).alias("s"),
        )
        .groupBy("blob_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("s")),
                    lambda s: s["rec"],
                ),
                "",
            )
            .cast("binary")
            .alias("content"),
        )
    )
    pages = parse_warc(blobs).select(
        F.regexp_extract("target_uri", r"/doc/(\d+)$", 1)
        .cast("bigint")
        .alias("doc_id"),
        "target_uri",
        F.col("payload").cast("string").alias("html"),
    )
    extracted = extract_html_text(pages, keep_cols=("target_uri",))
    return (
        add_quality(extracted)
        .withColumn(
            "n_tokens",
            F.size(
                F.expr(
                    "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"
                )
            ).cast("bigint"),
        )
        .select(
            "doc_id", "target_uri", "title", "n_tokens",
            "quality_keep",
        )
        .orderBy("doc_id")
    )


def _z35_wb_mirror(con):
    """Witten-Bell interpolated-bigram mirror: identical expression
    shapes as lm.py (lam = c1/(c1+N1+), p = lam*(c12/c1) +
    (1-lam)*(c2+1)/(T+V) — NOT algebraically simplified, so the IEEE
    op sequence matches), 1e-9 relative."""
    import math
    import re
    from collections import Counter, defaultdict

    uni: Counter = Counter()
    bi: Counter = Counter()
    for (text,) in con.execute(
        "SELECT text FROM documents WHERE doc_id % 5 <> 0"
    ).fetchall():
        if text is None:
            continue
        t = re.findall(r"[a-z0-9]+", text.lower())
        uni.update(t)
        bi.update(
            t[i] + " " + t[i + 1] for i in range(len(t) - 1)
        )
    cont: dict = defaultdict(int)
    for g in bi:
        cont[g.split(" ", 1)[0]] += 1
    v = float(len(uni) + 1)
    t_tot = float(sum(uni.values()))
    out = []
    for did, text in con.execute(
        "SELECT doc_id, text FROM documents WHERE doc_id < 300 "
        "ORDER BY doc_id"
    ).fetchall():
        if text is None:
            continue
        toks = re.findall(r"[a-z0-9]+", text.lower())
        if len(toks) < 2:
            continue
        s = 0.0
        n = len(toks) - 1
        for i in range(n):
            w1, w2 = toks[i], toks[i + 1]
            c1 = float(uni.get(w1, 0))
            n1p = float(cont.get(w1, 0))
            c12 = float(bi.get(w1 + " " + w2, 0))
            lam = c1 / (c1 + n1p) if c1 > 0 and n1p > 0 else 0.0
            p_ml = c12 / c1 if c1 > 0 else 0.0
            p_uni = (uni.get(w2, 0) + 1.0) / (t_tot + v)
            s += math.log(lam * p_ml + (1.0 - lam) * p_uni)
        out.append((int(did), n, s, math.exp(-s / n)))
    return ["doc_id", "n_bigrams", "logprob", "ppl"], out


@query(
    "z35_wb_perplexity",
    None,  # float log-prob sums are order-dependent — tolerance mirror
    doc="Witten-Bell INTERPOLATED bigram perplexity (lm.py::"
    "perplexity_score(smoothing='wb'); Witten & Bell 1991 — the "
    "smoothing real perplexity filters run, since add-k (z29) "
    "over-penalizes unseen continuations of frequent words): "
    "lam(w1) = c1/(c1+N1+) weights the ML bigram against a "
    "Laplace unigram backoff; the continuation-type table N1+ is "
    "derived from the bigram counts at no extra training pass, and "
    "scoring stays the same gram-keyed join shape with two more "
    "model-sized LEFT joins. Oracle: expression-shape-identical "
    "Python mirror, 1e-9 relative",
    tol_oracle=_z35_wb_mirror,
    tolerance=1e-9,
    tol_keys=("doc_id",),
)
def z35_wb_perplexity(spark, sf_dir):
    from topn_spark.operators.lm import (
        perplexity_score,
        train_bigram_lm,
    )

    docs = load_table(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 5 != 0)
    unigrams, bigrams = train_bigram_lm(train)
    return perplexity_score(
        docs.where(F.col("doc_id") < 300),
        unigrams,
        bigrams,
        smoothing="wb",
    ).orderBy("doc_id")


@query(
    "z36_train_shards",
    f"""WITH a AS (
  SELECT doc_id,
    CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || 'r7'), 1, 8))
         AS BIGINT) % 16 AS INT) AS shard,
    len({_TOKS_DUCK}) AS n_toks
  FROM documents)
SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS n_tokens
FROM a GROUP BY shard ORDER BY shard ASC""",
    doc="Training-shard export accounting (pipeline.py::"
    "shard_assignment/shard_manifest, IO half covered by "
    "export_training_shards/verify_shards pytests): deterministic "
    "md5(id||salt) mod n_shards assignment — stateless and "
    "reproducible across runs/engines, the property a RESUMABLE "
    "export needs — plus the per-shard doc/token manifest a trainer "
    "budgets epochs from. One keyed agg; the md5 bucket arithmetic "
    "is the proven engine-portable convention, hash-exact",
)
def z36_train_shards(spark, sf_dir):
    from topn_spark.operators.pipeline import (
        shard_assignment,
        shard_manifest,
    )
    from topn_spark.operators.textstats import token_count

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_toks", token_count("text")
    )
    assigned = shard_assignment(docs, 16, salt="r7")
    return shard_manifest(assigned, token_col="n_toks").orderBy(
        "shard"
    )


def _z37_sentspan_mirror(con):
    """Exact Python mirror of remove_duplicate_sentence_spans over the
    planted + real corpus: same sentence rule (RE2/Java-portable, no
    lookaround), same \\x1f-joined md5 span keys, same global
    (doc_id, pos) first-occurrence semantics, same rebuild."""
    import hashlib
    import re
    from collections import defaultdict

    rows = con.execute(
        """SELECT doc_id,
  CASE doc_id % 5
    WHEN 0 THEN 'Intro unique ' || doc_id
                || '. Common footer one. Common footer two.'
                || ' Common footer three.'
    WHEN 1 THEN 'Alpha ' || doc_id || '. Beta ' || doc_id || '.'
    ELSE text
  END AS text
FROM documents WHERE doc_id < 300 ORDER BY doc_id"""
    ).fetchall()
    window, min_count = 3, 2
    docs = []
    for did, text in rows:
        if text is None:
            sent = []
        else:
            sent = [
                re.sub(r"^\s+|\s+$", "", s)
                for s in re.findall(r"[^.!?]+[.!?]*", text)
            ]
            sent = [s for s in sent if s]
        docs.append((int(did), sent))
    occs: dict = defaultdict(list)
    for did, sent in docs:
        for pos in range(len(sent) - window + 1):
            h = hashlib.md5(
                "\x1f".join(sent[pos : pos + window]).encode()
            ).hexdigest()
            occs[h].append((did, pos))
    removed: dict = defaultdict(list)
    for h, lst in occs.items():
        if len(lst) < min_count:
            continue
        for did, pos in sorted(lst)[1:]:
            removed[did].append(pos)
    out = []
    for did, sent in docs:
        dups = sorted(removed.get(did, []))
        cov = set()
        for p in dups:
            cov.update(range(p, p + window))
        kept = [s for i, s in enumerate(sent) if i not in cov]
        out.append(
            (
                did,
                len(sent),
                len(dups),
                len(cov),
                " ".join(kept),
            )
        )
    return (
        ["doc_id", "n_sentences", "n_dup_spans", "n_removed",
         "clean_text"],
        out,
    )


@query(
    "z37_c4_span_dedup",
    None,  # cross-doc dedup over planted fixtures — Python mirror
    doc="The C4 DEDUP rule (textstats.py::"
    "remove_duplicate_sentence_spans; Raffel et al. 2020 §2.2 — "
    "'discarded all but one of any three-sentence span occurring "
    "more than once'): the corpus-wide half of C4 whose line-rule "
    "half is z24, at sentence granularity (the token-window sibling "
    "is z25). One span-hash shuffle computes occurrence count and "
    "global first-occurrence rank together; docs rebuilt from "
    "surviving sentences. Mixed corpus: planted shared-footer docs "
    "(every copy after the first loses the footer), two-sentence "
    "docs (below window, untouched), and real documents. Oracle: "
    "exact Python re-derivation, tolerance 0",
    tol_oracle=_z37_sentspan_mirror,
    tolerance=0.0,
    tol_keys=("doc_id",),
)
def z37_c4_span_dedup(spark, sf_dir):
    from topn_spark.operators.textstats import (
        remove_duplicate_sentence_spans,
    )

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 300
    )
    d = F.col("doc_id")
    ds = d.cast("string")
    text = (
        F.when(
            d % 5 == 0,
            F.concat(
                F.lit("Intro unique "), ds,
                F.lit(". Common footer one. Common footer two."
                      " Common footer three."),
            ),
        )
        .when(
            d % 5 == 1,
            F.concat(
                F.lit("Alpha "), ds, F.lit(". Beta "), ds, F.lit("."),
            ),
        )
        .otherwise(F.col("text"))
    )
    planted = docs.select("doc_id", text.alias("text"))
    return remove_duplicate_sentence_spans(planted).orderBy("doc_id")


def _z38_unigram_mirror_pieces(con):
    """Independent re-derivation of the unigram-LM trainer's
    documented contract (textstats.py::unigram_lm_train): word-freq
    table -> occurrence-weighted substring seed (all single chars +
    top seed_size multi by (count desc, piece asc), min_count) ->
    Viterbi hard-EM with Laplace (c+1)/(T+n) probabilities and the
    ascending-start strictly-greater tie rule -> shrink-prune by
    (count desc, piece asc). Counts are ints and probabilities single
    IEEE divisions in the same interpreter, so the table matches
    bit-for-bit (tolerance 0)."""
    import math
    import re
    from collections import Counter

    VOCAB, SEED, MAXLEN, MINC, ITERS, SHRINK = 150, 1500, 8, 2, 2, 0.75
    wf: Counter = Counter()
    for (text,) in con.execute(
        "SELECT text FROM documents WHERE doc_id % 5 <> 0"
    ).fetchall():
        if text is not None:
            wf.update(re.findall(r"[a-z0-9]+", text.lower()))
    words = sorted(wf.items())
    seed: Counter = Counter()
    for w, f in words:
        n = len(w)
        for i in range(n):
            for ln in range(1, min(MAXLEN, n - i) + 1):
                seed[w[i : i + ln]] += f
    chars = sorted(p for p in seed if len(p) == 1)
    multi = sorted(
        (p for p, c in seed.items() if len(p) > 1 and c >= MINC),
        key=lambda p: (-seed[p], p),
    )[:SEED]
    counts = {p: seed[p] for p in chars}
    counts.update({p: seed[p] for p in multi})

    def viterbi(word, logp, max_len):
        n = len(word)
        dp = [0.0] + [None] * n
        back = [None] * (n + 1)
        for j in range(1, n + 1):
            best, best_i = None, None
            for i in range(max(0, j - max_len), j):
                if dp[i] is None:
                    continue
                lp = logp.get(word[i:j])
                if lp is None:
                    continue
                s = dp[i] + lp
                if best is None or s > best:
                    best, best_i = s, i
            if best is None:
                best, best_i = (dp[j - 1] or 0.0) - 1e9, j - 1
            dp[j], back[j] = best, best_i
        out = []
        j = n
        while j > 0:
            i = back[j]
            out.append(word[i:j])
            j = i
        out.reverse()
        return out

    def laplace(cnts):
        total = sum(cnts.values())
        npieces = len(cnts)
        return {
            p: math.log((c + 1) / (total + npieces))
            for p, c in cnts.items()
        }

    def em(cnts, iters):
        for _ in range(iters):
            logp = laplace(cnts)
            max_len = max(len(p) for p in cnts)
            new = {p: 0 for p in cnts}
            for w, f in words:
                for p in viterbi(w, logp, max_len):
                    if p in new:
                        new[p] += f
            cnts = new
        return cnts

    while len(counts) > VOCAB:
        counts = em(counts, ITERS)
        n_multi = len(counts) - len(chars)
        target = max(VOCAB - len(chars), int(n_multi * SHRINK))
        target = min(target, n_multi - 1)
        keep = set(
            sorted(
                (p for p in counts if len(p) > 1),
                key=lambda p: (-counts[p], p),
            )[:target]
        )
        counts = {
            p: c
            for p, c in counts.items()
            if len(p) == 1 or p in keep
        }
    counts = em(counts, ITERS)
    logp = laplace(counts)
    return ["piece", "logprob"], sorted(logp.items())


@query(
    "z38_unigram_lm_train",
    None,  # driver-tier training over the word table — Python mirror
    doc="SentencePiece-style unigram-LM tokenizer TRAINING "
    "(textstats.py::unigram_lm_train; Kudo 2018, deterministic "
    "Viterbi hard-EM variant): corpus reduced distributed-side to "
    "the distinct-word frequency table (the bpe_train tier-1 "
    "discipline, capped collect), then substring seeding, "
    "Laplace-smoothed hard-EM, and the SentencePiece shrink "
    "schedule on the driver — every step deterministic and "
    "partitioning-independent. The tokenizer family is now "
    "{BPE (z02), unigram-LM}. Oracle: full independent Python "
    "re-derivation of the documented contract, exact",
    tol_oracle=_z38_unigram_mirror_pieces,
    tolerance=0.0,
    tol_keys=("piece",),
)
def z38_unigram_lm_train(spark, sf_dir):
    from topn_spark.operators.textstats import unigram_lm_train

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 5 != 0
    )
    pieces = unigram_lm_train(
        docs,
        vocab_size=150,
        seed_size=1500,
        max_piece_len=8,
        min_count=2,
    )
    return spark.createDataFrame(
        pieces, "piece string, logprob double"
    ).orderBy("piece")


def _z39_unigram_apply_mirror(con):
    """Mirror of apply_unigram_lm under the z38-trained table: same
    Viterbi contract per word; per-doc word/piece counts plus the
    first-40-piece string, exact."""
    import re

    cols, pieces = _z38_unigram_mirror_pieces(con)
    logp = dict(pieces)
    max_len = max(len(p) for p in logp)

    def viterbi(word):
        n = len(word)
        dp = [0.0] + [None] * n
        back = [None] * (n + 1)
        for j in range(1, n + 1):
            best, best_i = None, None
            for i in range(max(0, j - max_len), j):
                if dp[i] is None:
                    continue
                lp = logp.get(word[i:j])
                if lp is None:
                    continue
                s = dp[i] + lp
                if best is None or s > best:
                    best, best_i = s, i
            if best is None:
                best, best_i = (dp[j - 1] or 0.0) - 1e9, j - 1
            dp[j], back[j] = best, best_i
        out = []
        j = n
        while j > 0:
            i = back[j]
            out.append(word[i:j])
            j = i
        out.reverse()
        return out

    out = []
    for did, text in con.execute(
        "SELECT doc_id, text FROM documents WHERE doc_id < 300 "
        "ORDER BY doc_id"
    ).fetchall():
        ws = re.findall(r"[a-z0-9]+", (text or "").lower())
        toks = []
        n = 0
        for w in ws:
            enc = viterbi(w)
            n += len(enc)
            if len(toks) < 40:
                toks.extend(enc)
        out.append(
            (int(did), len(ws), n, " ".join(toks[:40]))
        )
    return ["doc_id", "n_words", "n_lm_tokens", "head_tokens"], out


@query(
    "z39_unigram_lm_apply",
    None,  # trained-tokenizer application — Python mirror
    doc="Unigram-LM tokenizer APPLICATION (textstats.py::"
    "apply_unigram_lm): Viterbi-best segmentation of every word "
    "under the z38-trained piece table — same DP and tie contract "
    "as training; one Arrow mapInPandas pass, map-only, the piece "
    "table rides as a closure (the apply_bpe sibling — real "
    "trained-tokenizer token counts for packing/budgeting). "
    "Oracle: mirror shares the z38 table derivation then re-applies "
    "the documented Viterbi contract, exact",
    tol_oracle=_z39_unigram_apply_mirror,
    tolerance=0.0,
    tol_keys=("doc_id",),
)
def z39_unigram_lm_apply(spark, sf_dir):
    from topn_spark.operators.textstats import (
        apply_unigram_lm,
        unigram_lm_train,
    )

    docs = load_table(spark, sf_dir, "documents")
    pieces = unigram_lm_train(
        docs.where(F.col("doc_id") % 5 != 0),
        vocab_size=150,
        seed_size=1500,
        max_piece_len=8,
        min_count=2,
    )
    out = apply_unigram_lm(
        docs.where(F.col("doc_id") < 300), pieces, keep_tokens=40
    )
    return out.select(
        "doc_id",
        "n_words",
        "n_lm_tokens",
        F.concat_ws(" ", "tokens").alias("head_tokens"),
    ).orderBy("doc_id")


def _z40_oracle() -> str:
    x19 = _Q["x19_lsh_neardup_pairs"].oracle
    return f"""WITH RECURSIVE pairs AS ({x19}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs),
nodes AS (SELECT DISTINCT src AS id FROM edges),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id),
comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
assigned AS (
  SELECT d.doc_id,
         COALESCE(c.component, d.doc_id) AS component
  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
labeled AS (
  SELECT doc_id, component,
    CASE WHEN substr(md5(CAST(component AS VARCHAR)), 1, 1) < 'c'
           THEN 'train'
         WHEN substr(md5(CAST(component AS VARCHAR)), 1, 1) < 'e'
           THEN 'val'
         ELSE 'test' END AS split
  FROM assigned)
SELECT doc_id, component, split FROM labeled ORDER BY doc_id ASC"""


@query(
    "z40_leakage_safe_split",
    None,  # oracle patched below (embeds the x19 pair SQL)
    doc="Near-dup-aware train/val/test split (pipeline.py::"
    "leakage_safe_split): documents connected by the MinHash-LSH "
    "near-duplicate graph land in the SAME split — a plain id-keyed "
    "split puts one copy of a near-duplicated doc in train and "
    "another in test, silent corpus-internal eval contamination "
    "that benchmark decontamination never sees. Composition: the "
    "x31 connected-components fixpoint over the x19 pair graph, a "
    "component-table left join, and the deterministic md5 split "
    "keyed by the component label (singletons key by their own "
    "id — one consistent rule). Oracle: DuckDB recursive transitive "
    "closure + the identical split arithmetic, hash-exact",
)
def z40_leakage_safe_split(spark, sf_dir):
    from topn_spark.operators.pipeline import leakage_safe_split

    docs = load_table(spark, sf_dir, "documents")
    pairs = _Q["x19_lsh_neardup_pairs"].builder(spark, sf_dir)
    return leakage_safe_split(
        docs, pairs.select("id_a", "id_b")
    ).select("doc_id", "component", "split").orderBy("doc_id")


_Q["z40_leakage_safe_split"] = _Q["z40_leakage_safe_split"].__class__(
    name="z40_leakage_safe_split",
    builder=_Q["z40_leakage_safe_split"].builder,
    oracle=_z40_oracle(),
    doc=_Q["z40_leakage_safe_split"].doc,
)


@query(
    "z41_corpus_report",
    f"""WITH q AS (
  SELECT text, lang, LENGTH(text) AS n_chars,
    CAST(len({_TOKS_DUCK}) AS BIGINT) AS n_toks,
    ROUND(CAST(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
          / NULLIF(CAST(LENGTH(text) AS DOUBLE), 0), 6) AS alpha_ratio,
    ROUND(CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[^ ]', '', 'g'))
               AS DOUBLE)
          / NULLIF(CAST(len({_TOKS_DUCK}) AS DOUBLE), 0), 6) AS mean_word_len
  FROM documents),
s AS (
  SELECT
    CAST(COUNT(*) AS DOUBLE) AS n_docs,
    CAST(COUNT(*) - COUNT(text) AS DOUBLE) AS n_null_text,
    CAST(SUM(n_toks) AS DOUBLE) AS total_tokens,
    ROUND(SUM(n_toks) / CAST(COUNT(text) AS DOUBLE), 6) AS mean_tokens,
    ROUND((COUNT(text) - COUNT(DISTINCT MD5(text)))
          / CAST(COUNT(text) AS DOUBLE), 6) AS exact_dup_frac,
    ROUND(SUM(CASE WHEN n_toks >= 10 AND alpha_ratio >= 0.6
                    AND mean_word_len BETWEEN 2.0 AND 12.0
              THEN 1 ELSE 0 END)
          / CAST(COUNT(text) AS DOUBLE), 6) AS quality_keep_frac,
    ROUND(quantile_cont(n_chars, 0.5), 6) AS chars_p50,
    ROUND(quantile_cont(n_chars, 0.9), 6) AS chars_p90
  FROM q)
SELECT metric, value FROM (
  SELECT 'n_docs' AS metric, n_docs AS value FROM s
  UNION ALL SELECT 'n_null_text', n_null_text FROM s
  UNION ALL SELECT 'total_tokens', total_tokens FROM s
  UNION ALL SELECT 'mean_tokens', mean_tokens FROM s
  UNION ALL SELECT 'exact_dup_frac', exact_dup_frac FROM s
  UNION ALL SELECT 'quality_keep_frac', quality_keep_frac FROM s
  UNION ALL SELECT 'chars_p50', chars_p50 FROM s
  UNION ALL SELECT 'chars_p90', chars_p90 FROM s
  UNION ALL
  SELECT 'lang_frac:' || COALESCE(lang, 'null'),
         ROUND(COUNT(*) / CAST(SUM(COUNT(*)) OVER () AS DOUBLE), 6)
  FROM q GROUP BY lang)
ORDER BY metric ASC""",
    doc="Corpus data card (pipeline.py::corpus_report; the "
    "Datasheets/Dolma-style release accounting): doc/null counts, "
    "token totals and means, exact-duplicate fraction (distinct "
    "content hashes), the add_quality keep rate, exact length "
    "percentiles, and per-language mass — ONE wide aggregate over a "
    "per-doc feature projection + a lang-keyed count agg, unioned "
    "as a tall (metric, value) frame. Every number is ROUND-6 of "
    "exact counts or single IEEE divisions — the whole card is "
    "hash-exact vs the SQL re-derivation",
)
def z41_corpus_report(spark, sf_dir):
    from topn_spark.operators.pipeline import corpus_report

    docs = load_table(spark, sf_dir, "documents")
    return corpus_report(docs).orderBy("metric")


@query(
    "z42_corpus_overlap",
    None,  # HLL estimates — tolerance vs the exact DuckDB counts
    doc="Sketch-based cross-corpus overlap estimation (pipeline.py::"
    "corpus_overlap_estimate): HLL sketches of each corpus's "
    "distinct 5-gram shingles + the union sketch give "
    "|A∩B| ≈ a + b − union by inclusion–exclusion — the "
    "contamination first-look between two 100 TB corpora with NO "
    "join (each side is one mergeable-sketch pass; the exact "
    "follow-up is contamination_check). Overlapping doc_id splits "
    "(<300 vs >=200). Oracle: exact DuckDB distinct/intersect "
    "counts, 5% relative (observed HLL error 0.6–3.4% at lgk=14)",
    tol_oracle="""WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
  FROM documents),
sh AS (
  SELECT doc_id,
    w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
         || ' ' || w[i+4] AS s
  FROM t, UNNEST(range(1, len(w) - 3)) AS r(i)),
A AS (SELECT DISTINCT s FROM sh WHERE doc_id < 300),
B AS (SELECT DISTINCT s FROM sh WHERE doc_id >= 200),
c AS (
  SELECT (SELECT COUNT(*) FROM A) AS ndv_a,
         (SELECT COUNT(*) FROM B) AS ndv_b,
         (SELECT COUNT(*) FROM
            (SELECT s FROM A UNION SELECT s FROM B)) AS ndv_union,
         (SELECT COUNT(*) FROM
            (SELECT s FROM A INTERSECT SELECT s FROM B)) AS ni)
SELECT ndv_a, ndv_b, ndv_union, ni AS est_intersection,
       ROUND(ni / CAST(ndv_union AS DOUBLE), 6) AS jaccard_est,
       ROUND(ni / CAST(ndv_a AS DOUBLE), 6) AS containment_a
FROM c""",
    tolerance=0.05,
    tol_keys=(),
)
def z42_corpus_overlap(spark, sf_dir):
    from topn_spark.operators.pipeline import corpus_overlap_estimate

    docs = load_table(spark, sf_dir, "documents")
    return corpus_overlap_estimate(
        docs.where(F.col("doc_id") < 300),
        docs.where(F.col("doc_id") >= 200),
        n=5,
    )


def _z43_tokenizer_eval_mirror(con):
    """Tokenizer-evaluation mirror: corpus-level fertility (subword
    tokens per word) for the fixed y26 BPE table vs the z38-trained
    unigram-LM table vs a BYTE-level BPE trained on the z38 slice,
    composed from the already-proven mirrors; ROUND-6 of one
    exact-int division each (tolerance 0)."""
    from decimal import ROUND_HALF_UP, Decimal

    def rnd6(x):
        return float(
            Decimal(repr(x)).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )

    _, brows = _y26_bpe_exact(con)
    brows = [r for r in brows if r[0] < 300]
    bw, bt = sum(r[1] for r in brows), sum(r[2] for r in brows)
    _, urows = _z39_unigram_apply_mirror(con)
    uw, ut = sum(r[1] for r in urows), sum(r[2] for r in urows)
    # byte-level BPE: train on the same slice the unigram-LM used,
    # apply with the min-rank leftmost walk (the apply_bpe contract)
    train_texts = [
        r[0]
        for r in con.execute(
            "SELECT text FROM documents WHERE doc_id % 5 != 0"
        ).fetchall()
    ]
    _, _, merges = _byte_bpe_mirror(con, train_texts, 24)
    ranks = {p: i for i, p in enumerate(merges)}

    def enc_len(word):
        parts = list(word)
        while True:
            cands = [
                (ranks[(parts[i], parts[i + 1])], i)
                for i in range(len(parts) - 1)
                if (parts[i], parts[i + 1]) in ranks
            ]
            if not cands:
                return len(parts)
            _, i = min(cands)
            parts = (
                parts[:i] + [parts[i] + parts[i + 1]] + parts[i + 2 :]
            )

    yw = yt = yn = 0
    for did, text in con.execute(
        "SELECT doc_id, text FROM documents WHERE doc_id < 300"
        " ORDER BY doc_id"
    ).fetchall():
        words = con.execute(
            r"SELECT regexp_extract_all(lower(?), '[\p{L}\p{N}]+')",
            [text or ""],
        ).fetchone()[0]
        yn += 1
        yw += len(words)
        yt += sum(
            enc_len(w.encode("utf-8").decode("latin-1"))
            for w in words
        )
    return (
        ["tokenizer", "n_docs", "total_words", "total_tokens",
         "fertility"],
        [
            ("bpe25", len(brows), bw, bt, rnd6(bt / bw)),
            ("bytebpe24", yn, yw, yt, rnd6(yt / yw)),
            ("unigram150", len(urows), uw, ut, rnd6(ut / uw)),
        ],
    )


@query(
    "z43_tokenizer_eval",
    None,  # composes two mirror-oracled tokenizers — Python mirror
    doc="Tokenizer EVALUATION (the selection step every pretraining "
    "setup runs before committing a vocabulary): corpus-level "
    "fertility — subword tokens per word, the standard compression "
    "metric — for the fixed 25-merge BPE table (y26) vs the "
    "z38-trained 150-piece unigram-LM vs a 24-merge BYTE-level BPE "
    "trained on the same slice (z46's mode), all applied to the "
    "same doc_id < 300 slice in one Arrow pass each and reduced to "
    "one accounting row per tokenizer. Oracle: composed from the "
    "already-proven application/training mirrors, exact",
    tol_oracle=_z43_tokenizer_eval_mirror,
    tolerance=0.0,
    tol_keys=("tokenizer",),
)
def z43_tokenizer_eval(spark, sf_dir):
    from topn_spark.operators.textstats import (
        apply_bpe,
        apply_unigram_lm,
        bpe_train,
        unigram_lm_train,
    )

    docs = load_table(spark, sf_dir, "documents")
    sl = docs.where(F.col("doc_id") < 300)
    pieces = unigram_lm_train(
        docs.where(F.col("doc_id") % 5 != 0),
        vocab_size=150,
        seed_size=1500,
        max_piece_len=8,
        min_count=2,
    )

    def _acct(applied, tok_col, name):
        return applied.agg(
            F.lit(name).alias("tokenizer"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("total_words"),
            F.sum(tok_col).alias("total_tokens"),
            F.round(
                F.sum(tok_col) / F.sum("n_words").cast("double"), 6
            ).alias("fertility"),
        )

    bpe = _acct(apply_bpe(sl, _BPE_MERGES), "n_bpe_tokens", "bpe25")
    ulm = _acct(
        apply_unigram_lm(sl, pieces), "n_lm_tokens", "unigram150"
    )
    byte_merges = bpe_train(
        docs.where(F.col("doc_id") % 5 != 0),
        24,
        min_pair_count=2,
        mode="byte",
    )
    byt = _acct(
        apply_bpe(sl, byte_merges, mode="byte"),
        "n_bpe_tokens",
        "bytebpe24",
    )
    return bpe.unionByName(ulm).unionByName(byt).orderBy("tokenizer")


@query(
    "z44_image_neardup",
    """SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(1.0 AS DOUBLE) AS score
FROM documents a JOIN documents b
  ON a.doc_id < b.doc_id AND a.doc_id % 10 = b.doc_id % 10
WHERE a.doc_id < 200 AND b.doc_id < 200
ORDER BY id_a ASC, id_b ASC""",
    doc="IMAGE near-duplicate detection — the multimodal x dedup "
    "composition: planted constant-color PNGs (pixel value 16g+8 for "
    "group g = doc_id % 10) decode to EXACT one-hot 16-bin luminance "
    "histograms (multimodal.py::extract_features over real PNG "
    "decode), then similarity.py::embedding_near_dup_pairs (SRP-LSH "
    "bucket join -> exact cosine >= 0.99). Same-group vectors are "
    "bit-identical (cosine exactly 1.0, same bucket by "
    "construction); cross-group one-hots are orthogonal. The oracle "
    "is the pure closed form: all within-group pairs at score 1.0, "
    "hash-exact",
)
def z44_image_neardup(spark, sf_dir):
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from topn_spark.operators.multimodal import (
        encode_png,
        extract_features,
    )
    from topn_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    @pandas_udf(T.BinaryType())
    def planted(doc_ids):
        import pandas as pd

        out = []
        for d in doc_ids:
            g = int(d) % 10
            pix = bytes([16 * g + 8]) * (16 * 8)
            out.append(encode_png(16, 8, pix, color_type=0))
        return pd.Series(out)

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 200
    )
    assets = docs.select("doc_id", planted("doc_id").alias("payload"))
    feats = extract_features(assets).select("doc_id", "features")
    return embedding_near_dup_pairs(
        feats,
        threshold=0.99,
        id_col="doc_id",
        vec_col="features",
        dim=16,
    ).orderBy("id_a", "id_b")


#: planted multilingual fixtures for the char-n-gram language-ID
#: model (z45): six languages across three scripts (Latin, Cyrillic,
#: Greek); HELD texts are same-language but disjoint content from the
#: TRAIN texts, so the entry scores genuinely held-out documents.
_Z45_TRAIN = {
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

_Z45_HELD = {
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


def _z45_langid_mirror(con):
    """Independent pure-Python Naive-Bayes mirror of the langid
    deterministic contract (char 1..3-grams of the lowercased text,
    Laplace (c+1)/(total+V) with V = |model grams| + 1 shared OOV
    bucket, log-prior from document counts, argmax with
    sorted-language tie order). Counts are exact ints; log-prob sums
    are compared at 1e-9 relative (per-doc sum order is
    plan-dependent); labels exact."""
    import math

    langs = sorted(_Z45_TRAIN)

    def grams(s):
        s = s.lower()
        out = []
        for n in (1, 2, 3):
            out.extend(s[i : i + n] for i in range(len(s) - n + 1))
        return out

    train_ids = [
        r[0]
        for r in con.execute(
            "SELECT doc_id FROM documents WHERE doc_id < 120"
        ).fetchall()
    ]
    counts: dict = {}
    totals = {lang: 0 for lang in langs}
    n_docs = {lang: 0 for lang in langs}
    for did in train_ids:
        lang = langs[did % 6]
        n_docs[lang] += 1
        for g in grams(_Z45_TRAIN[lang]):
            counts[(lang, g)] = counts.get((lang, g), 0) + 1
            totals[lang] += 1
    v = len({g for (_, g) in counts}) + 1
    all_docs = sum(n_docs.values())
    prior = {
        lang: math.log(n_docs[lang] / all_docs) for lang in langs
    }
    oov = {
        lang: math.log(1.0 / (totals[lang] + v)) for lang in langs
    }
    rows = []
    for (did,) in con.execute(
        "SELECT doc_id FROM documents WHERE doc_id >= 120 AND"
        " doc_id < 360 ORDER BY doc_id"
    ).fetchall():
        text = _Z45_HELD[langs[did % 6]] + " nr " + str(did)
        gs = grams(text)
        scores = {}
        for lang in langs:
            t = float(totals[lang] + v)
            s = 0.0
            for g in gs:
                c = counts.get((lang, g))
                s += math.log((c + 1) / t) if c else oov[lang]
            scores[lang] = s + prior[lang]
        best = max(scores.values())
        pred = next(l for l in langs if scores[l] == best)
        rows.append(
            (did, len(gs), pred, *[scores[l] for l in langs])
        )
    return (
        ["doc_id", "n_grams", "lang_pred"]
        + [f"score_{l}" for l in langs],
        rows,
    )


@query(
    "z45_langid_ngram",
    None,
    doc="Character-n-gram Naive-Bayes language ID, trained in-engine"
    " (operators/langid.py): char 1..3-gram count profiles per"
    " language (one (lang, gram)-keyed hash agg — the word-count"
    " shape, output bounded by the char-n-gram vocabulary), compiled"
    " to a wide Laplace log-prob table, then scoring = one explode +"
    " broadcast model join + per-doc re-agg + map-only prior/argmax."
    " Trains on 120 planted docs across six languages and THREE"
    " scripts (Latin/Cyrillic/Greek — no whitespace or Latin-script"
    " assumption, unlike the x04 stopword heuristic), classifies 240"
    " held-out same-language documents. Oracle: independent"
    " pure-Python NB mirror — labels exact, log-prob scores <= 1e-9"
    " relative (per-doc float-sum order is plan-dependent)",
    tol_oracle=_z45_langid_mirror,
    tolerance=1e-9,
    tol_keys=("doc_id",),
)
def z45_langid_ngram(spark, sf_dir):
    from topn_spark.operators.langid import (
        langid_model_table,
        langid_score,
        train_langid,
    )

    langs = sorted(_Z45_TRAIN)
    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    lang_of = F.element_at(
        F.array(*[F.lit(l) for l in langs]),
        (d % 6 + 1).cast("int"),
    )

    def planted(texts):
        e = F.when(d % 6 == 0, F.lit(texts[langs[0]]))
        for i in range(1, 6):
            e = e.when(d % 6 == i, F.lit(texts[langs[i]]))
        return e

    train = docs.where(d < 120).select(
        lang_of.alias("lang"), planted(_Z45_TRAIN).alias("text")
    )
    held = docs.where((d >= 120) & (d < 360)).select(
        "doc_id",
        F.concat(
            planted(_Z45_HELD), F.lit(" nr "), d.cast("string")
        ).alias("text"),
    )
    counts, classes = train_langid(train)
    model, meta = langid_model_table(counts, classes)
    return langid_score(held, model, meta).orderBy("doc_id")


def _byte_bpe_mirror(con, texts, n_merges, min_pair_count=2):
    """Shared pure-Python Sennrich mirror for BYTE-level BPE: words
    via the DuckDB RE2 unicode rule (dialect parity with Spark's
    Java regex), each word's UTF-8 bytes rendered as latin-1 chars
    (the same bijection the engine applies JVM-side), then the exact
    max-count / lexicographic-tie merge loop. Returns
    (vocab, segs, merges) — all-int counts and string symbols, so
    downstream comparisons are exact."""
    import collections

    vocab = collections.Counter()
    for t in texts:
        words = con.execute(
            r"SELECT regexp_extract_all(lower(?), '[\p{L}\p{N}]+')",
            [t or ""],
        ).fetchone()[0]
        for w in words:
            vocab[w.encode("utf-8").decode("latin-1")] += 1
    segs = {w: list(w) for w in vocab}
    merges = []
    while len(merges) < n_merges:
        pc = collections.Counter()
        for w, c in vocab.items():
            s = segs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        mx = max(pc.values())
        if mx < min_pair_count:
            break
        a, b = sorted(p for p, c in pc.items() if c == mx)[0]
        merges.append((a, b))
        for w, s in segs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    return vocab, segs, merges


def _rnd6(x):
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(x)).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )
    )


def _z46_byte_bpe_mirror(con):
    """z46 mirror: byte-level Sennrich over the six-language planted
    corpus (multi-byte UTF-8 scripts exercise real byte merges), plus
    the applied corpus token count and fertility — exact equality
    expected (tolerance 0; ints + one rounded IEEE division)."""
    langs = sorted(_Z45_TRAIN)
    ids = [
        r[0]
        for r in con.execute(
            "SELECT doc_id FROM documents WHERE doc_id < 240"
        ).fetchall()
    ]
    texts = [_Z45_TRAIN[langs[d % 6]] for d in ids]
    vocab, segs, merges = _byte_bpe_mirror(con, texts, 24)
    n_words = sum(vocab.values())
    n_tokens = sum(len(segs[w]) * c for w, c in vocab.items())
    rows = [
        (r, a, b, n_words, n_tokens, _rnd6(n_tokens / n_words))
        for r, (a, b) in enumerate(merges)
    ]
    return (
        ["rank", "lhs", "rhs", "corpus_words", "corpus_bpe_tokens",
         "fertility"],
        rows,
    )


@query(
    "z46_byte_bpe",
    None,
    doc="BYTE-LEVEL BPE training + application (textstats.py::"
    "bpe_train mode='byte' — GPT-2-style, Radford et al. 2019): "
    "words from the unicode rule, UTF-8 bytes as base symbols "
    "(rendered latin-1, the bijective byte map), so the alphabet is "
    "closed at <= 256 symbols and ANY string tokenizes with zero "
    "OOV by construction — the actual pretraining standard. Trains "
    "24 merges over a six-language three-script planted corpus "
    "(multi-byte codepoints exercise real byte merges), applies the "
    "table back, and reports corpus words/tokens/fertility. Same "
    "two-tier trainer as z02 (driver Sennrich for model-sized "
    "vocabs, batched sequential-equivalent rounds beyond). Oracle: "
    "independent pure-Python byte-Sennrich mirror, exact",
    tol_oracle=_z46_byte_bpe_mirror,
    tolerance=0.0,
    tol_keys=("rank",),
)
def z46_byte_bpe(spark, sf_dir):
    from topn_spark.diag import _attach_scalar
    from topn_spark.operators.textstats import apply_bpe, bpe_train

    langs = sorted(_Z45_TRAIN)
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 240
    )
    d = F.col("doc_id")
    text = F.when(d % 6 == 0, F.lit(_Z45_TRAIN[langs[0]]))
    for i in range(1, 6):
        text = text.when(d % 6 == i, F.lit(_Z45_TRAIN[langs[i]]))
    planted = docs.select("doc_id", text.alias("text"))
    merges = bpe_train(planted, 24, min_pair_count=2, mode="byte")
    totals = apply_bpe(planted, merges, mode="byte").agg(
        F.sum("n_words").alias("corpus_words"),
        F.sum("n_bpe_tokens").alias("corpus_bpe_tokens"),
        F.round(
            F.sum("n_bpe_tokens") / F.sum("n_words").cast("double"),
            6,
        ).alias("fertility"),
    )
    mdf = spark.createDataFrame(
        [(r, a, b) for r, (a, b) in enumerate(merges)],
        "rank int, lhs string, rhs string",
    )
    return _attach_scalar(mdf, totals).orderBy("rank")


@query(
    "z47_pack_sequences",
    r"""WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
  FROM documents WHERE doc_id < 400),
c AS (
  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n,
    CAST(COALESCE(SUM(CAST(len(toks) AS BIGINT)) OVER (
      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
      AND 1 PRECEDING), 0) AS BIGINT) AS off
  FROM t WHERE len(toks) > 0),
s AS (
  SELECT doc_id, toks, n, off, u.seq_id AS seq_id
  FROM c, UNNEST(range(off // 32, (off + n - 1) // 32 + 1))
    AS u(seq_id)),
p AS (
  SELECT seq_id,
    GREATEST(seq_id * 32, off) - seq_id * 32 AS seq_start,
    toks[CAST(GREATEST(seq_id * 32 - off, 0) + 1 AS BIGINT)
         :CAST(GREATEST(seq_id * 32 - off, 0)
           + LEAST((seq_id + 1) * 32, off + n)
           - GREATEST(seq_id * 32, off) AS BIGINT)] AS piece
  FROM s)
SELECT seq_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(len(flatten(list(piece ORDER BY seq_start))) AS BIGINT)
    AS n_tokens,
  flatten(list(piece ORDER BY seq_start)) AS tokens
FROM p GROUP BY seq_id ORDER BY seq_id ASC""",
    doc="GPT-style SEQUENCE PACKING (pipeline.py::"
    "pack_token_sequences) — the stage between tokenizer and shard"
    " export: concatenate tokenized documents in doc order, cut"
    " every 32 tokens; documents split across boundaries so no token"
    " is dropped and every non-final sequence is exactly full."
    " Deterministic pure arithmetic over ONE window cumsum of token"
    " counts (no per-token explode: each (doc, sequence) overlap"
    " slices its document array), then one hash agg reassembles"
    " sequences. The companion packed_doc_spans emits the"
    " (seq_start, doc_start, n) boundary metadata a trainer uses for"
    " attention-mask resets. Oracle: the identical arithmetic in"
    " DuckDB window + list ops, hash-exact including the full token"
    " arrays",
)
def z47_pack_sequences(spark, sf_dir):
    from topn_spark.operators.pipeline import pack_token_sequences
    from topn_spark.operators.textstats import tokens

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 400)
        .select("doc_id", tokens("text").alias("tokens"))
    )
    return pack_token_sequences(docs, seq_len=32).orderBy("seq_id")


#: planted mixed-script fixtures for the z48 script-aware tokenizer:
#: Han, Kana, CJK/Latin mixed (no spaces around the CJK runs), and a
#: Latin control — the shapes where the space-delimited word rules
#: break and the char-level fallback is the standard treatment.
_Z48_SHAPES = (
    "孩子们在安静的图书馆里读书他们喜欢这些故事",
    "こどもたちはしずかなとしょかんでほんをよみます",
    "GPT模型のtraining dataは大きい123です",
    "plain latin words with numbers 42 only",
)


@query(
    "z48_script_tokens",
    r"""WITH t AS (
  SELECT doc_id,
    CASE doc_id % 4
      WHEN 0 THEN '孩子们在安静的图书馆里读书他们喜欢这些故事'
      WHEN 1 THEN 'こどもたちはしずかなとしょかんでほんをよみます'
      WHEN 2 THEN 'GPT模型のtraining dataは大きい123です'
      ELSE 'plain latin words with numbers 42 only'
    END || ' nr ' || doc_id AS text
  FROM documents WHERE doc_id < 400),
s AS (
  SELECT doc_id,
    regexp_extract_all(
      lower(regexp_replace(text,
        '([\p{Han}\p{Hiragana}\p{Katakana}])', ' \1 ', 'g')),
      '[\p{L}\p{N}]+') AS toks,
    regexp_extract_all(lower(text), '[\p{L}\p{N}]+') AS wtoks
  FROM t)
SELECT doc_id, toks,
  CAST(len(toks) AS BIGINT) AS n_script_tokens,
  CAST(len(wtoks) AS BIGINT) AS n_unicode_tokens
FROM s ORDER BY doc_id ASC""",
    doc="Script-aware tokenization fallback for unsegmented scripts"
    " (textstats.py::tokens mode='script'): Han/Hiragana/Katakana"
    " characters become one token each — the standard char-level"
    " treatment, since no whitespace word rule exists for these"
    " scripts — while other scripts keep the unicode word rule, so"
    " mixed CJK/Latin text tokenizes sensibly (route corpora here"
    " via script_profile's dominant_script, z20). Implemented as two"
    " portable regex steps (space-isolate CJK chars, then the word"
    " rule) because RE2 lacks Java's class intersection; emitted"
    " beside the plain unicode-rule count to show the lumping the"
    " fallback fixes. Map-only, codegen'd, no UDF. Oracle: the"
    " identical two-step rule in the DuckDB RE2 dialect"
    " (\\p{IsX} -> \\p{X}), hash-exact including token arrays",
)
def z48_script_tokens(spark, sf_dir):
    from topn_spark.operators.textstats import tokens

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 400
    )
    d = F.col("doc_id")
    text = F.when(d % 4 == 0, F.lit(_Z48_SHAPES[0]))
    for i in range(1, 4):
        text = text.when(d % 4 == i, F.lit(_Z48_SHAPES[i]))
    planted = docs.select(
        "doc_id",
        F.concat(text, F.lit(" nr "), d.cast("string")).alias("text"),
    )
    return planted.select(
        "doc_id",
        tokens("text", "script").alias("toks"),
        F.size(tokens("text", "script")).cast("bigint").alias(
            "n_script_tokens"
        ),
        F.size(tokens("text", "unicode")).cast("bigint").alias(
            "n_unicode_tokens"
        ),
    ).orderBy("doc_id")


#: shared word-prefix alphabet for the z49 end-to-end fixture: 40
#: pure-letter prefixes; each planted document's body is the 40
#: prefixes suffixed with a per-doc letter tag, so every shingle of
#: every document carries the tag and unrelated documents share NO
#: shingles (no spurious LSH pairs to reason about).
_Z49_PREFIXES = (
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliett", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
    "victor", "whiskey", "xray", "yankee", "zulu", "anchor", "beacon",
    "cedar", "dune", "ember", "fjord", "grove", "harbor", "island",
    "juniper", "keel", "lagoon", "meadow", "nectar",
)


def _z49_oracle() -> str:
    """Closed-form SQL mirror of the z49 pipeline: planted
    post-extraction text per doc (the WARC/HTML layers reconstruct
    exactly — z32/z13 proved byte-exact framing and extraction),
    then the quality gate, exact dedup, the x19 md5 MinHash-LSH
    family, the z40 recursive-CTE components + md5 split, and the
    z47 packing arithmetic PARTITIONed by split."""
    w0 = ", ".join(f"'{p}' || t" for p in _Z49_PREFIXES)
    w1 = ", ".join(f"'{p}' || t || 'q'" for p in _Z49_PREFIXES)
    w2 = ", ".join(
        "'variantword'" if i == 20 else f"'{p}' || t"
        for i, p in enumerate(_Z49_PREFIXES)
    )
    eq = " + ".join(
        f"(CASE WHEN sa.m{j} = sb.m{j} THEN 1 ELSE 0 END)"
        for j in range(8)
    )
    mins = ", ".join(
        f"min(md5('{j}:' || s)) AS m{j}" for j in range(8)
    )
    return f"""WITH RECURSIVE base AS (
  SELECT doc_id, doc_id // 100 AS fam, doc_id % 100 AS n,
    translate(CAST(doc_id % 100 AS VARCHAR),
              '0123456789', 'abcdefghij') AS t
  FROM documents WHERE doc_id < 400),
docs AS (
  SELECT doc_id,
    CASE WHEN n % 10 = 9 THEN '== ' || CAST(n AS VARCHAR) || ' =='
         WHEN fam = 1 THEN array_to_string([{w1}], ' ')
         WHEN fam = 2 THEN array_to_string([{w2}], ' ')
         ELSE array_to_string([{w0}], ' ') END AS text
  FROM base),
q AS (
  SELECT doc_id, text,
    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
         AS BIGINT) AS nt,
    ROUND(CAST(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g'))
               AS DOUBLE)
          / NULLIF(CAST(LENGTH(text) AS DOUBLE), 0), 6) AS ar,
    ROUND(CAST(LENGTH(text)
               - LENGTH(regexp_replace(text, '[^ ]', '', 'g'))
               AS DOUBLE)
          / NULLIF(CAST(len(regexp_extract_all(lower(text),
                                               '[a-z0-9]+'))
                        AS DOUBLE), 0), 6) AS mwl
  FROM docs),
kept AS (
  SELECT doc_id, text FROM q
  WHERE nt >= 10 AND ar >= 0.6 AND mwl BETWEEN 2.0 AND 12.0),
d AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
      ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id ASC) AS rn
    FROM kept) WHERE rn = 1),
toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
  FROM d),
sh AS (
  SELECT doc_id, unnest(
    CASE WHEN len(tk) >= 3
      THEN [array_to_string(tk[i:i+2], ' ')
            for i in generate_series(1, len(tk)-2)]
      ELSE [] END) AS s
  FROM toks),
sig AS (
  SELECT doc_id, {mins}
  FROM sh GROUP BY doc_id),
bands AS (
  SELECT doc_id, b, h FROM sig, LATERAL (VALUES
    (0, md5(m0 || m1)), (1, md5(m2 || m3)),
    (2, md5(m4 || m5)), (3, md5(m6 || m7))) AS v(b, h)),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
  FROM bands a
  JOIN bands c ON a.b = c.b AND a.h = c.h AND a.doc_id < c.doc_id),
pairs AS (
  SELECT id_a, id_b
  FROM cand
  JOIN sig sa ON cand.id_a = sa.doc_id
  JOIN sig sb ON cand.id_b = sb.doc_id
  WHERE ({eq}) / 8.0 >= 0.5),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs),
nodes AS (SELECT DISTINCT src AS id FROM edges),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id),
comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
labeled AS (
  SELECT t.doc_id, t.tk,
    CASE WHEN substr(md5(CAST(COALESCE(c.component, t.doc_id)
                              AS VARCHAR)), 1, 1) < 'c' THEN 'train'
         WHEN substr(md5(CAST(COALESCE(c.component, t.doc_id)
                              AS VARCHAR)), 1, 1) < 'e' THEN 'val'
         ELSE 'test' END AS split
  FROM toks t LEFT JOIN comp c ON c.id = t.doc_id),
c AS (
  SELECT split, doc_id, tk, CAST(len(tk) AS BIGINT) AS n,
    CAST(COALESCE(SUM(CAST(len(tk) AS BIGINT)) OVER (
      PARTITION BY split ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS BIGINT) AS off
  FROM labeled WHERE len(tk) > 0),
s AS (
  SELECT split, doc_id, tk, n, off, u.seq_id AS seq_id
  FROM c, UNNEST(range(off // 32, (off + n - 1) // 32 + 1))
    AS u(seq_id)),
p AS (
  SELECT split, seq_id,
    GREATEST(seq_id * 32, off) - seq_id * 32 AS seq_start,
    tk[CAST(GREATEST(seq_id * 32 - off, 0) + 1 AS BIGINT)
       :CAST(GREATEST(seq_id * 32 - off, 0)
         + LEAST((seq_id + 1) * 32, off + n)
         - GREATEST(seq_id * 32, off) AS BIGINT)] AS piece
  FROM s)
SELECT split, seq_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(len(flatten(list(piece ORDER BY seq_start))) AS BIGINT)
    AS n_tokens,
  flatten(list(piece ORDER BY seq_start)) AS tokens
FROM p GROUP BY split, seq_id ORDER BY split ASC, seq_id ASC"""


@query(
    "z49_pretrain_pipeline",
    None,  # oracle patched below (programmatically composed SQL)
    doc="The COMPLETE pretraining-data pipeline as ONE executed spec"
    " (pipelines.py::run_pipeline_with_source — the Dolma/RefinedWeb"
    " shape, examples/pretrain_corpus_pipeline.json is the"
    " disk-to-disk twin): planted WARC blobs -> WarcParse (byte-"
    "sliced record walk) -> SQL id recovery -> HtmlExtract ->"
    " QualityScore gate -> exact Deduplicate -> LeakageSafeSplit"
    " (md5 MinHash-LSH pairs -> connected components -> md5 split,"
    " so near-duplicate docs land in the SAME split) -> Tokenize ->"
    " PackSequences (GPT-style concat-and-chunk, per-split window)."
    " Fixture plants all four corpus pathologies: junk pages (the"
    " quality gate drops them), exact duplicates (fam 3 = fam 0,"
    " dedup keeps min doc_id), near duplicates (fam 2 = fam 0 with"
    " one word changed — split-leak bait), and clean singletons."
    " Every stage is the real registered plugin running through the"
    " spec compiler, not a hand-wired composition. Oracle: closed-"
    "form planted text + the x19 md5-LSH family + z40 recursive-CTE"
    " components + z47 packing arithmetic, hash-exact including the"
    " packed token arrays",
)
def z49_pretrain_pipeline(spark, sf_dir):
    from topn_spark.pipelines import run_pipeline_with_source

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 400
    )
    d = F.col("doc_id")
    n = d % 100
    t = F.translate(n.cast("string"), "0123456789", "abcdefghij")
    body0 = F.concat_ws(
        " ", *[F.concat(F.lit(p), t) for p in _Z49_PREFIXES]
    )
    body1 = F.concat_ws(
        " ",
        *[F.concat(F.lit(p), t, F.lit("q")) for p in _Z49_PREFIXES],
    )
    body2 = F.concat_ws(
        " ",
        *[
            F.lit("variantword") if i == 20
            else F.concat(F.lit(p), t)
            for i, p in enumerate(_Z49_PREFIXES)
        ],
    )
    fam = F.floor(d / 100)
    text = (
        F.when(n % 10 == 9,
               F.concat(F.lit("== "), n.cast("string"), F.lit(" ==")))
        .when(fam == 1, body1)
        .when(fam == 2, body2)
        .otherwise(body0)
    )
    html = F.concat(
        F.lit("<html><body><p>"), text, F.lit("</p></body></html>")
    )
    rec = F.concat(
        F.lit(
            "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "
            "http://crawl.test/doc/"
        ),
        d.cast("string"),
        F.lit("\r\nContent-Length: "),
        F.octet_length(html).cast("string"),
        F.lit("\r\n\r\n"),
        html,
        F.lit("\r\n\r\n"),
    )
    blobs = (
        docs.select(
            F.expr("doc_id DIV 4").alias("blob_id"),
            F.struct(d.alias("doc_id"), rec.alias("rec")).alias("s"),
        )
        .groupBy("blob_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("s")),
                    lambda s: s["rec"],
                ),
                "",
            )
            .cast("binary")
            .alias("content"),
        )
    )
    spec = {
        "stages": [
            {"name": "src", "type": "batchsource", "plugin": "File",
             "properties": {"path": "<injected>"}},
            {"name": "parse", "type": "transform",
             "plugin": "WarcParse", "properties": {}},
            {"name": "page", "type": "transform", "plugin": "SQL",
             "properties": {"query": (
                 "SELECT CAST(regexp_extract(target_uri,"
                 " 'doc/([0-9]+)$', 1) AS BIGINT) AS doc_id,"
                 " CAST(payload AS STRING) AS html FROM ${input}"
                 " WHERE warc_type = 'response'")}},
            {"name": "extract", "type": "transform",
             "plugin": "HtmlExtract", "properties": {}},
            {"name": "quality", "type": "transform",
             "plugin": "QualityScore", "properties": {}},
            {"name": "keep", "type": "transform", "plugin": "Filter",
             "properties": {"condition": "quality_keep"}},
            {"name": "proj", "type": "transform",
             "plugin": "Projection",
             "properties": {"select": "doc_id, text"}},
            {"name": "dedup", "type": "batchaggregator",
             "plugin": "Deduplicate",
             "properties": {"uniqueFields": "text",
                            "tiebreak": "doc_id"}},
            {"name": "split", "type": "transform",
             "plugin": "LeakageSafeSplit",
             "properties": {"family": "md5"}},
            {"name": "tok", "type": "transform", "plugin": "Tokenize",
             "properties": {"mode": "unicode"}},
            {"name": "pack", "type": "transform",
             "plugin": "PackSequences",
             "properties": {"seqLen": "32", "byFields": "split",
                            "orderField": "doc_id"}},
        ],
        "connections": [
            {"from": "src", "to": "parse"},
            {"from": "parse", "to": "page"},
            {"from": "page", "to": "extract"},
            {"from": "extract", "to": "quality"},
            {"from": "quality", "to": "keep"},
            {"from": "keep", "to": "proj"},
            {"from": "proj", "to": "dedup"},
            {"from": "dedup", "to": "split"},
            {"from": "split", "to": "tok"},
            {"from": "tok", "to": "pack"},
        ],
    }
    out = run_pipeline_with_source(spark, spec, "src", blobs)
    return out["pack"].select(
        "split", "seq_id", "n_docs", "n_tokens", "tokens"
    ).orderBy("split", "seq_id")


_Q["z49_pretrain_pipeline"] = _Q["z49_pretrain_pipeline"].__class__(
    name="z49_pretrain_pipeline",
    builder=_Q["z49_pretrain_pipeline"].builder,
    oracle=_z49_oracle(),
    doc=_Q["z49_pretrain_pipeline"].doc,
)


@query(
    "z50_url_filter",
    """WITH t AS (
  SELECT doc_id,
    CASE doc_id % 6
      WHEN 0 THEN 'http://www.example.com/page/' || doc_id
      WHEN 1 THEN 'https://sub.ads-tracker.net/x/' || doc_id || '?y=1'
      WHEN 2 THEN 'http://news.bbc.co.uk/story/' || doc_id
      WHEN 3 THEN 'http://192.168.0.1/admin/' || doc_id
      WHEN 4 THEN 'https://blog.example.org/post/' || doc_id
      ELSE 'https://shop.mall-site.com/item/' || doc_id
    END AS url
  FROM documents WHERE doc_id < 600)
SELECT doc_id, url,
  CASE doc_id % 6
    WHEN 0 THEN 'example.com'
    WHEN 4 THEN 'example.org'
    ELSE 'mall-site.com' END AS registered_domain
FROM t WHERE doc_id % 6 IN (0, 4, 5)
ORDER BY doc_id ASC""",
    doc="Domain-blocklist URL filtering as a pipeline stage"
    " (pipelines.py::UrlFilter — the UT1-style source gate every"
    " web-corpus recipe runs before content filters): planted URLs"
    " covering a www host, a subdomained tracker, a two-level-TLD"
    " host (bbc.co.uk — naive last-two-labels would wrongly emit"
    " 'co.uk'), an IPv4 literal, and two clean domains; the stage"
    " derives registered_domain via the z09-proven url_features"
    " decomposition and drops the blocklisted rows (tracker, the"
    " co.uk host, the IP) through the REAL registered plugin"
    " executing a spec. Literal lists filter map-side isin; artifact"
    " lists (domainsPath) join broadcast-side so a millions-of-"
    "domains UT1 file never reaches the driver. Oracle: closed-form"
    " keep set + domains per planted shape (derivation fidelity on"
    " harder shapes is z09's contract), hash-exact",
)
def z50_url_filter(spark, sf_dir):
    from topn_spark.operators.pipeline import url_features
    from topn_spark.pipelines import run_pipeline_with_source

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 600
    )
    d = F.col("doc_id")
    ds = d.cast("string")
    shapes = [
        F.concat(F.lit("http://www.example.com/page/"), ds),
        F.concat(
            F.lit("https://sub.ads-tracker.net/x/"), ds, F.lit("?y=1")
        ),
        F.concat(F.lit("http://news.bbc.co.uk/story/"), ds),
        F.concat(F.lit("http://192.168.0.1/admin/"), ds),
        F.concat(F.lit("https://blog.example.org/post/"), ds),
        F.concat(F.lit("https://shop.mall-site.com/item/"), ds),
    ]
    url = F.when(d % 6 == 0, shapes[0])
    for i in range(1, 6):
        url = url.when(d % 6 == i, shapes[i])
    planted = docs.select("doc_id", url.alias("url"))
    spec = {
        "stages": [
            {"name": "src", "type": "batchsource", "plugin": "File",
             "properties": {"path": "<injected>"}},
            {"name": "gate", "type": "transform", "plugin": "UrlFilter",
             "properties": {
                 "action": "block",
                 "domains":
                 "ads-tracker.net, bbc.co.uk, 192.168.0.1"}},
        ],
        "connections": [{"from": "src", "to": "gate"}],
    }
    kept = run_pipeline_with_source(spark, spec, "src", planted)["gate"]
    return (
        url_features(kept)
        .select("doc_id", "url", "registered_domain")
        .orderBy("doc_id")
    )


def _z51_oracle() -> str:
    """DuckDB mirror of redact_pii: IDENTICAL RE2-compatible
    patterns (that compatibility is why the operator bans
    lookaround), same email -> ip -> phone precedence, counts on the
    original text."""
    from topn_spark.operators.textstats import PII_PATTERNS

    pats = {name: (pat, tok) for name, pat, tok in PII_PATTERNS}
    clean = "text"
    for name, _, _ in PII_PATTERNS:
        pat, tok = pats[name]
        clean = f"regexp_replace({clean}, '{pat}', '{tok}', 'g')"
    cnt = {
        name: f"CAST(len(regexp_extract_all(text, '{pats[name][0]}'))"
        " AS BIGINT)"
        for name in pats
    }
    return f"""WITH t AS (
  SELECT doc_id,
    CASE doc_id % 5
      WHEN 0 THEN 'contact me at user' || doc_id
                  || '@mail-example.com for details'
      WHEN 1 THEN 'server at 10.0.' || (doc_id % 200)
                  || '.25 responded then called (555) 867-5309 twice'
      WHEN 2 THEN 'call 555-123-4567 or email a.b' || doc_id
                  || '@x.co now'
      WHEN 3 THEN text
      ELSE 'no pii here just words ' || doc_id
    END AS text
  FROM documents WHERE doc_id < 500)
SELECT doc_id, {clean} AS clean_text,
  {cnt['email']} AS n_emails,
  {cnt['ip']} AS n_ips,
  {cnt['phone']} AS n_phones,
  {cnt['email']} + {cnt['ip']} + {cnt['phone']} AS pii_total
FROM t ORDER BY doc_id ASC"""


@query(
    "z51_pii_redact",
    None,  # oracle patched below (composed from PII_PATTERNS)
    doc="PII redaction (textstats.py::redact_pii, PiiRedact plugin)"
    " — the release-gate stage every public corpus ships through"
    " (Dolma postprocess, ROOTS): emails, IPv4 literals, and phone"
    " numbers replaced by the standard |||EMAIL_ADDRESS||| /"
    " |||IP_ADDRESS||| / |||PHONE_NUMBER||| placeholders, per-class"
    " counts on the ORIGINAL text so data-card accounting is"
    " replacement-order independent; email->ip->phone precedence so"
    " an address's digit runs can't be half-eaten. Planted shapes"
    " cover each class, a mixed multi-PII doc, real corpus text, and"
    " a clean control. Pure Catalyst regexp chain in sequential"
    " projections — map-only, codegen'd, one scan at 100 TB. Oracle:"
    " the IDENTICAL patterns (RE2-compatible by design, no"
    " lookaround) and precedence in DuckDB, hash-exact",
)
def z51_pii_redact(spark, sf_dir):
    from topn_spark.operators.textstats import redact_pii

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 500
    )
    d = F.col("doc_id")
    ds = d.cast("string")
    text = (
        F.when(
            d % 5 == 0,
            F.concat(
                F.lit("contact me at user"), ds,
                F.lit("@mail-example.com for details"),
            ),
        )
        .when(
            d % 5 == 1,
            F.concat(
                F.lit("server at 10.0."), (d % 200).cast("string"),
                F.lit(".25 responded then called (555) 867-5309"
                      " twice"),
            ),
        )
        .when(
            d % 5 == 2,
            F.concat(
                F.lit("call 555-123-4567 or email a.b"), ds,
                F.lit("@x.co now"),
            ),
        )
        .when(d % 5 == 3, F.col("text"))
        .otherwise(
            F.concat(F.lit("no pii here just words "), ds)
        )
    )
    planted = docs.select("doc_id", text.alias("text"))
    return redact_pii(planted).select(
        "doc_id", "clean_text", "n_emails", "n_ips", "n_phones",
        "pii_total",
    ).orderBy("doc_id")


_Q["z51_pii_redact"] = _Q["z51_pii_redact"].__class__(
    name="z51_pii_redact",
    builder=_Q["z51_pii_redact"].builder,
    oracle=_z51_oracle(),
    doc=_Q["z51_pii_redact"].doc,
)


def _z52_oracle() -> str:
    x19 = _Q["x19_lsh_neardup_pairs"].oracle
    return f"""WITH RECURSIVE pairs AS ({x19}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs),
nodes AS (SELECT DISTINCT src AS id FROM edges),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id),
comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
scored AS (
  SELECT d.doc_id,
         COALESCE(c.component, d.doc_id) AS component,
         CAST(LENGTH(d.text) AS BIGINT) AS score
  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
ranked AS (
  SELECT doc_id, component, score,
    ROW_NUMBER() OVER (PARTITION BY component
                       ORDER BY score DESC, doc_id ASC) AS rn
  FROM scored)
SELECT doc_id, component, score FROM ranked
WHERE rn = 1 ORDER BY doc_id ASC"""


@query(
    "z52_neardup_keep_best",
    None,  # oracle patched below (embeds the x19 pair SQL)
    doc="Quality-aware near-duplicate collapse (dedup.py::"
    "neardup_keep_best): each MinHash-LSH component keeps its"
    " HIGHEST-scoring member (ties: lowest id) instead of the"
    " min-id convention — when a page is crawled five times at"
    " varying extraction quality, the corpus keeps the cleanest"
    " copy. Composition: x31 connected components over the x19 pair"
    " graph + a component-table left join + one per-component window"
    " rank (bounded partitions — components ARE near-dup clusters;"
    " singletons survive keyed by their own id). Score here ="
    " LENGTH(text), a deterministic cross-engine proxy for any"
    " quality signal (the operator takes any score column, e.g. the"
    " z16 classifier's). Oracle: DuckDB recursive transitive closure"
    " + identical rank arithmetic, hash-exact",
)
def z52_neardup_keep_best(spark, sf_dir):
    from topn_spark.operators.dedup import neardup_keep_best

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "score", F.length("text").cast("bigint")
    )
    pairs = _Q["x19_lsh_neardup_pairs"].builder(spark, sf_dir)
    return (
        neardup_keep_best(
            docs, pairs.select("id_a", "id_b"), "score"
        )
        .select("doc_id", "component", "score")
        .orderBy("doc_id")
    )


_Q["z52_neardup_keep_best"] = _Q["z52_neardup_keep_best"].__class__(
    name="z52_neardup_keep_best",
    builder=_Q["z52_neardup_keep_best"].builder,
    oracle=_z52_oracle(),
    doc=_Q["z52_neardup_keep_best"].doc,
)


@query(
    "z53_unpack_round_trip",
    """SELECT doc_id,
  regexp_extract_all(lower(text), '[a-z0-9]+') AS tokens
FROM documents
WHERE doc_id < 400
  AND len(regexp_extract_all(lower(text), '[a-z0-9]+')) > 0
ORDER BY doc_id ASC""",
    doc="Packing losslessness stated AS A QUERY (pipeline.py::"
    "unpack_sequences, the inverse/audit of pack_token_sequences):"
    " tokenize -> pack into 32-token sequences -> rebuild every"
    " document from the packed sequences plus the packed_doc_spans"
    " boundary metadata. The oracle is simply the ORIGINAL token"
    " arrays — hash-equality proves the full pack/unpack cycle"
    " drops and reorders nothing (the property a manifest-verified"
    " packed export rests on), not merely that counts add up."
    " Plan: one equi-join of sequences and spans on seq_id (both"
    " sides carry the key; AQE broadcasts the smaller), per-overlap"
    " array slices, one per-doc hash agg reassembly — the packer's"
    " own shapes run backwards. Production use: reconstruct any"
    " document from a packed shard for inspection, or audit an"
    " exported epoch end-to-end",
)
def z53_unpack_round_trip(spark, sf_dir):
    from topn_spark.operators.pipeline import (
        pack_token_sequences,
        packed_doc_spans,
        unpack_sequences,
    )
    from topn_spark.operators.textstats import tokens

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 400)
        .select("doc_id", tokens("text").alias("tokens"))
    )
    packed = pack_token_sequences(docs, seq_len=32)
    spans = packed_doc_spans(docs, seq_len=32)
    return unpack_sequences(packed, spans).orderBy("doc_id")


@query(
    "z54_token_budget_mixture",
    """WITH t AS (
  SELECT doc_id, lang,
    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
         AS BIGINT) AS n_tokens
  FROM documents WHERE lang IN ('en', 'de', 'zh')),
c AS (
  SELECT doc_id, lang, n_tokens,
    CAST(COALESCE(SUM(n_tokens) OVER (
      PARTITION BY lang
      ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS BIGINT) AS cum_before
  FROM t)
SELECT doc_id, lang, n_tokens FROM c
WHERE cum_before < CASE lang
  WHEN 'en' THEN 3000 WHEN 'de' THEN 1500 ELSE 500 END
ORDER BY doc_id ASC""",
    doc="TOKEN-budget dataset-mixture sampling (pipeline.py::"
    "token_budget_mixture) — how training mixes are actually"
    " specified ('1T tokens: 60% web / 20% code / 20% books'),"
    " where mixture_sample (y21) budgets document COUNTS: each"
    " group takes documents in the engine-portable md5(id) order"
    " until its token quota round(total*weight) is reached, the"
    " boundary-crossing document included (overshoot bounded by one"
    " document; quotas en 3000 / de 1500 / zh 500 of a 5000-token"
    " budget at weights 0.6/0.3/0.1). Mixture groups are FEW, so a"
    " per-group cumsum window would serialize each group through"
    " one task; instead the two-level scan buckets each group by a"
    " 2-hex md5 prefix (order-preserving: the bucket is a prefix of"
    " the sort key), cumsums per (group,bucket) in parallel, and"
    " windows only the model-sized bucket-totals table, offsets"
    " broadcast back; then a map-only filter against the literal"
    " quota map — quota arithmetic is driver-side config, never a"
    " data collect."
    " Oracle: identical cumsum-prefix arithmetic in DuckDB over the"
    " same md5 order, hash-exact",
)
def z54_token_budget_mixture(spark, sf_dir):
    from topn_spark.operators.pipeline import token_budget_mixture
    from topn_spark.operators.textstats import token_count

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", token_count("text").alias("n_tokens")
    )
    return token_budget_mixture(
        docs,
        {"en": 0.6, "de": 0.3, "zh": 0.1},
        5000,
        group_col="lang",
    ).orderBy("doc_id")


def _z55_kn_mirror(con):
    """Interpolated Kneser-Ney bigram mirror: identical expression
    shapes as lm.py (p = max(c12-D,0)/c1b + (D*n1p/c1b)*p_cont,
    p_cont = (r1p+1)/(N_bb+V) — NOT algebraically simplified, so the
    IEEE op sequence matches), 1e-9 relative."""
    import math
    import re
    from collections import Counter, defaultdict

    uni: Counter = Counter()
    bi: Counter = Counter()
    for (text,) in con.execute(
        "SELECT text FROM documents WHERE doc_id % 5 <> 0"
    ).fetchall():
        if text is None:
            continue
        t = re.findall(r"[a-z0-9]+", text.lower())
        uni.update(t)
        bi.update(
            t[i] + " " + t[i + 1] for i in range(len(t) - 1)
        )
    c1b_t: dict = defaultdict(int)
    n1p_t: dict = defaultdict(int)
    r1p_t: dict = defaultdict(int)
    for g, c in bi.items():
        w1, w2 = g.split(" ", 1)
        c1b_t[w1] += c
        n1p_t[w1] += 1
        r1p_t[w2] += 1
    v = float(len(uni) + 1)
    d = 0.75
    nbb_v = float(len(bi)) + v
    out = []
    for did, text in con.execute(
        "SELECT doc_id, text FROM documents WHERE doc_id < 300 "
        "ORDER BY doc_id"
    ).fetchall():
        if text is None:
            continue
        toks = re.findall(r"[a-z0-9]+", text.lower())
        if len(toks) < 2:
            continue
        s = 0.0
        n = len(toks) - 1
        for i in range(n):
            w1, w2 = toks[i], toks[i + 1]
            c1b = float(c1b_t.get(w1, 0))
            n1p = float(n1p_t.get(w1, 0))
            c12 = float(bi.get(w1 + " " + w2, 0))
            p_cont = (r1p_t.get(w2, 0) + 1.0) / nbb_v
            if c1b > 0:
                p = (
                    max(c12 - d, 0.0) / c1b
                    + (d * n1p / c1b) * p_cont
                )
            else:
                p = p_cont
            s += math.log(p)
        out.append((int(did), n, s, math.exp(-s / n)))
    return ["doc_id", "n_bigrams", "logprob", "ppl"], out


@query(
    "z55_kn_perplexity",
    None,  # float log-prob sums are order-dependent — tolerance mirror
    doc="Interpolated KNESER-NEY bigram perplexity (lm.py::"
    "perplexity_score(smoothing='kn'); Kneser & Ney 1995, Chen &"
    " Goodman 1999 eq. 4.26 — the smoothing KenLM and hence the"
    " actual CCNet pipeline run; z29 add-k and z35 Witten-Bell are"
    " the cheaper plug-ins): absolute discount D=0.75 off every"
    " seen bigram, the freed mass D*N1+(w1,.)/c1b routed to the"
    " CONTINUATION distribution P_cont(w2) ~ how many distinct"
    " contexts w2 follows (Laplace over N_bb+V so OOV stays"
    " finite) — the 'Francisco problem' fix: frequent-but-"
    "predictable words get low continuation mass. Both context"
    " tables derive from the bigram counts at no extra training"
    " pass; scoring keeps the same gram-keyed join shape with two"
    " model-sized LEFT joins. Oracle: expression-shape-identical"
    " Python mirror, 1e-9 relative",
    tol_oracle=_z55_kn_mirror,
    tolerance=1e-9,
    tol_keys=("doc_id",),
)
def z55_kn_perplexity(spark, sf_dir):
    from topn_spark.operators.lm import (
        perplexity_score,
        train_bigram_lm,
    )

    docs = load_table(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 5 != 0)
    unigrams, bigrams = train_bigram_lm(train)
    return perplexity_score(
        docs.where(F.col("doc_id") < 300),
        unigrams,
        bigrams,
        smoothing="kn",
    ).orderBy("doc_id")


@query(
    "z56_pack_with_eos",
    r"""WITH t AS (
  SELECT md5(CAST(doc_id AS VARCHAR)) AS okey,
    list_append(
      regexp_extract_all(lower(text), '[a-z0-9]+'), '</s>') AS toks
  FROM documents WHERE doc_id < 400
    AND len(regexp_extract_all(lower(text), '[a-z0-9]+')) > 0),
c AS (
  SELECT okey, toks, CAST(len(toks) AS BIGINT) AS n,
    CAST(COALESCE(SUM(CAST(len(toks) AS BIGINT)) OVER (
      ORDER BY okey ROWS BETWEEN UNBOUNDED PRECEDING
      AND 1 PRECEDING), 0) AS BIGINT) AS off
  FROM t),
s AS (
  SELECT okey, toks, n, off, u.seq_id AS seq_id
  FROM c, UNNEST(range(off // 32, (off + n - 1) // 32 + 1))
    AS u(seq_id)),
p AS (
  SELECT seq_id,
    GREATEST(seq_id * 32, off) - seq_id * 32 AS seq_start,
    toks[CAST(GREATEST(seq_id * 32 - off, 0) + 1 AS BIGINT)
         :CAST(GREATEST(seq_id * 32 - off, 0)
           + LEAST((seq_id + 1) * 32, off + n)
           - GREATEST(seq_id * 32, off) AS BIGINT)] AS piece
  FROM s)
SELECT seq_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(len(flatten(list(piece ORDER BY seq_start))) AS BIGINT)
    AS n_tokens,
  flatten(list(piece ORDER BY seq_start)) AS tokens
FROM p GROUP BY seq_id ORDER BY seq_id ASC""",
    doc="Sequence packing WITH the in-band EOS separator"
    " (pipeline.py::pack_token_sequences sep_token=) — the GPT"
    " convention: the tokenizer's EOS is appended after EVERY"
    " document before concatenation, so a trainer sees document"
    " boundaries in-band as well as via the span metadata;"
    " separators are real training tokens (manifest total = corpus"
    " tokens + one per document). Documents are packed in"
    " md5(doc_id) order — the shuffled order a real pretraining"
    " pipeline uses — which exercises the STRING-order two-level"
    " prefix sum: lexicographic 3-char-prefix buckets cumsum in"
    " parallel and only the bucket-totals table takes a keyless"
    " window (the md5 prefix is uniform, 4096 buckets at any"
    " scale). Oracle: identical +1-per-doc arithmetic in DuckDB"
    " over the same md5 order, hash-exact including the full token"
    " arrays",
)
def z56_pack_with_eos(spark, sf_dir):
    from topn_spark.operators.pipeline import pack_token_sequences
    from topn_spark.operators.textstats import tokens

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 400)
        .select(
            F.md5(F.col("doc_id").cast("string")).alias("okey"),
            tokens("text").alias("tokens"),
        )
    )
    return pack_token_sequences(
        docs,
        id_col="okey",
        seq_len=32,
        order_col="okey",
        sep_token="</s>",
    ).orderBy("seq_id")


#: planted fixtures for z57 per-language routed quality: English
#: prose (passes the published defaults), a no-terminal-punctuation
#: page (C4 sentence gate), and German compound-noun prose whose
#: mean word length (~12.6) violates the English [3,10] band but
#: fits the German route's widened [3,14] band.
_Z57_SHAPES = (
    (
        "the data to be of and that have with pipeline value"
        " system goes right here now.\n",
        7,
    ),
    ("the data to be of and that have with more value ", 6),
    (
        "der die das und mit von einer hier"
        " donaudampfschifffahrtsgesellschaft kapitaenspatent"
        " wertschoepfungskette weiterverarbeitungsprozess"
        " qualitaetssicherungsmassnahme"
        " softwareentwicklungsumgebung.\n",
        6,
    ),
)


@query(
    "z57_routed_quality",
    r"""WITH t AS (
  SELECT doc_id,
    CASE doc_id % 3 WHEN 0 THEN 'en' WHEN 1 THEN 'de'
      ELSE 'fr' END AS lang,
    CASE (doc_id % 9) // 3
      WHEN 0 THEN repeat('the data to be of and that have with pipeline value system goes right here now.' || chr(10), 7)
      WHEN 1 THEN repeat('the data to be of and that have with more value ', 6)
      ELSE repeat('der die das und mit von einer hier donaudampfschifffahrtsgesellschaft kapitaenspatent wertschoepfungskette weiterverarbeitungsprozess qualitaetssicherungsmassnahme softwareentwicklungsumgebung.' || chr(10), 6)
    END || chr(10) || 'nr ' || doc_id AS text
  FROM documents WHERE doc_id < 490),
r AS (
  SELECT * FROM (VALUES
    ('en', CAST(50 AS BIGINT), CAST(100000 AS BIGINT), 3.0, 10.0,
     0.1, 0.1, 0.9, 0.3, 0.8, CAST(2 AS BIGINT),
     ['the','be','to','of','and','that','have','with'],
     CAST(5 AS BIGINT), CAST(NULL AS DOUBLE)),
    ('de', CAST(40 AS BIGINT), CAST(100000 AS BIGINT), 3.0, 14.0,
     0.1, 0.1, 0.9, 0.3, 0.8, CAST(3 AS BIGINT),
     ['der','die','das','und','mit','von'],
     CAST(5 AS BIGINT), CAST(NULL AS DOUBLE))
  ) AS v(lang, min_words, max_words, min_mwl, max_mwl, max_hash,
         max_ell, max_bull, max_elll, min_alpha, min_stop,
         stopwords, min_sent, max_ppl)),
m AS (
  SELECT doc_id, lang,
    regexp_extract_all(lower(text), '\S+') AS words,
    list_filter(string_split(text, chr(10)), l -> trim(l) != '')
      AS lines,
    list_filter(string_split(text, chr(10)),
      l -> regexp_matches(trim(l), '[.!?"]$')
        AND len(regexp_extract_all(trim(l), '\S+')) >= 3
        AND NOT contains(lower(l), 'javascript')) AS kept,
    text
  FROM t),
c AS (
  SELECT doc_id, lang,
    CAST(len(words) AS BIGINT) AS n_words,
    ROUND(CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
          / NULLIF(CAST(len(words) AS DOUBLE), 0), 6) AS mean_word_len,
    ROUND(CAST(len(regexp_extract_all(text, '#')) AS DOUBLE)
          / NULLIF(CAST(len(words) AS DOUBLE), 0), 6) AS hash_word_ratio,
    ROUND(CAST(len(regexp_extract_all(text, '\.\.\.|…')) AS DOUBLE)
          / NULLIF(CAST(len(words) AS DOUBLE), 0), 6) AS ellipsis_word_ratio,
    ROUND(CAST(len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•‣▪]'))) AS DOUBLE)
          / NULLIF(CAST(len(lines) AS DOUBLE), 0), 6) AS frac_bullet_lines,
    ROUND(CAST(len(list_filter(lines, l -> regexp_matches(trim(l), '(\.\.\.|…)$'))) AS DOUBLE)
          / NULLIF(CAST(len(lines) AS DOUBLE), 0), 6) AS frac_ellipsis_lines,
    ROUND(CAST(len(list_filter(words, w -> regexp_matches(w, '\p{L}'))) AS DOUBLE)
          / NULLIF(CAST(len(words) AS DOUBLE), 0), 6) AS frac_alpha_words,
    list_distinct(words) AS dwords,
    CAST(len(regexp_extract_all(COALESCE(array_to_string(kept, chr(10)), ''), '[.!?]')) AS BIGINT) AS n_sentences
  FROM m),
j AS (
  SELECT c.*, r.lang AS route_lang, r.min_words, r.max_words,
    r.min_mwl, r.max_mwl, r.max_hash, r.max_ell, r.max_bull,
    r.max_elll, r.min_alpha, r.min_stop, r.min_sent, r.max_ppl,
    CASE WHEN r.stopwords IS NULL THEN NULL
      ELSE CAST(len(list_intersect(c.dwords, r.stopwords)) AS BIGINT)
    END AS route_stop_hits,
    CAST(NULL AS DOUBLE) AS ppl
  FROM c LEFT JOIN r ON c.lang = r.lang),
v AS (
  SELECT doc_id, lang, n_words, mean_word_len, route_stop_hits,
    n_sentences, ppl,
    CASE
      WHEN route_lang IS NULL THEN 'unrouted'
      WHEN (min_words IS NOT NULL AND NOT COALESCE(n_words >= min_words, false))
        OR (max_words IS NOT NULL AND NOT COALESCE(n_words <= max_words, false))
        THEN 'words'
      WHEN (min_mwl IS NOT NULL AND NOT COALESCE(mean_word_len >= min_mwl, false))
        OR (max_mwl IS NOT NULL AND NOT COALESCE(mean_word_len <= max_mwl, false))
        THEN 'word_len'
      WHEN (max_hash IS NOT NULL AND NOT COALESCE(hash_word_ratio <= max_hash, false))
        OR (max_ell IS NOT NULL AND NOT COALESCE(ellipsis_word_ratio <= max_ell, false))
        THEN 'symbols'
      WHEN (max_bull IS NOT NULL AND NOT COALESCE(frac_bullet_lines <= max_bull, false))
        OR (max_elll IS NOT NULL AND NOT COALESCE(frac_ellipsis_lines <= max_elll, false))
        THEN 'lines'
      WHEN min_alpha IS NOT NULL AND NOT COALESCE(frac_alpha_words >= min_alpha, false)
        THEN 'alpha'
      WHEN min_stop IS NOT NULL AND NOT COALESCE(route_stop_hits >= min_stop, false)
        THEN 'stopwords'
      WHEN min_sent IS NOT NULL AND NOT COALESCE(n_sentences >= min_sent, false)
        THEN 'sentences'
      WHEN max_ppl IS NOT NULL AND ppl IS NULL THEN 'unscored'
      WHEN max_ppl IS NOT NULL AND NOT COALESCE(ppl <= max_ppl, false)
        THEN 'perplexity'
    END AS route_reason
  FROM j)
SELECT doc_id, lang, n_words, mean_word_len, route_stop_hits,
  n_sentences, ppl, route_reason,
  route_reason IS NULL AS routed_keep
FROM v ORDER BY doc_id ASC""",
    doc="PER-LANGUAGE ROUTED QUALITY THRESHOLDS (textstats.py::"
    "routed_quality) — the Dolma per-language reality: one corpus,"
    " one signal computation, but each language gates on its own"
    " Gopher/C4/LM parameters. Planted two-language fixture: English"
    " prose passes the published defaults; German compound-noun"
    " prose (mean word length ~12.6) fails the English [3,10] band"
    " but passes the German route's widened [3,14] band with its"
    " own stopword list (min 3 of der/die/das/und/mit/von); a"
    " no-terminal-punctuation page hits the C4 sentence gate;"
    " French documents have no route and surface as 'unrouted'"
    " (observable, never silently dropped). route_reason is the"
    " FIRST failing gate in Dolma stage order. Scale: signals"
    " map-only over one scan; thresholds (including each route's"
    " stopword array) are a BROADCAST table joined on lang — never"
    " a per-language CASE chain, never a collect. Oracle: the full"
    " rule+routing arithmetic replayed in DuckDB over a VALUES"
    " route table, hash-exact",
)
def z57_routed_quality(spark, sf_dir):
    from topn_spark.operators.textstats import routed_quality

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 490
    )
    d = F.col("doc_id")
    lang = (
        F.when(d % 3 == 0, F.lit("en"))
        .when(d % 3 == 1, F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    shape = F.floor((d % 9) / 3)
    text = (
        F.when(shape == 0, F.lit(_Z57_SHAPES[0][0] * _Z57_SHAPES[0][1]))
        .when(shape == 1, F.lit(_Z57_SHAPES[1][0] * _Z57_SHAPES[1][1]))
        .otherwise(F.lit(_Z57_SHAPES[2][0] * _Z57_SHAPES[2][1]))
    )
    text = F.concat(text, F.lit("\nnr "), d.cast("string"))
    planted = docs.select(
        "doc_id", lang.alias("lang"), text.alias("text")
    )
    routes = {
        "en": {},
        "de": {
            "min_words": 40,
            "max_mean_word_len": 14.0,
            "min_stop_hits": 3,
            "stopwords": ["der", "die", "das", "und", "mit", "von"],
        },
    }
    return (
        routed_quality(planted, routes)
        .select(
            "doc_id", "lang", "n_words", "mean_word_len",
            "route_stop_hits", "n_sentences", "ppl",
            "route_reason", "routed_keep",
        )
        .orderBy("doc_id")
    )


#: z58 planted decontamination fixtures: two eval "benchmark"
#: passages; train shapes quote a 13-word span of E0, quote E1
#: wholesale, stay clean, or are too short to hold any 13-gram.
_Z58_EVAL = (
    "the quick brown fox jumps over the lazy dog near the river"
    " bank today",
    "to be or not to be that is the question whether tis nobler"
    " in the mind",
)
_Z58_TRAIN = (
    "a web page quoting the quick brown fox jumps over the lazy"
    " dog near the river bank for flavor",
    "a perfectly clean document about nothing in particular with"
    " plenty of ordinary words to say here",
    "an essay citing to be or not to be that is the question"
    " whether tis nobler in the mind at length",
    "too short to match",
)


@query(
    "z58_ngram_decontaminate",
    r"""WITH ev AS (
  SELECT CASE doc_id % 2 WHEN 0
      THEN 'the quick brown fox jumps over the lazy dog near the river bank today'
      ELSE 'to be or not to be that is the question whether tis nobler in the mind'
    END AS text
  FROM documents WHERE doc_id < 30),
eg AS (
  SELECT DISTINCT u.g FROM (
    SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
    FROM ev) s,
  UNNEST(CASE WHEN len(toks) >= 13
    THEN list_transform(range(1, len(toks) - 11),
      i -> array_to_string(toks[i:i+12], ' '))
    ELSE [] END) AS u(g)),
t AS (
  SELECT doc_id,
    CASE doc_id % 4
      WHEN 0 THEN 'a web page quoting the quick brown fox jumps over the lazy dog near the river bank for flavor'
      WHEN 1 THEN 'a perfectly clean document about nothing in particular with plenty of ordinary words to say here'
      WHEN 2 THEN 'an essay citing to be or not to be that is the question whether tis nobler in the mind at length'
      ELSE 'too short to match'
    END || ' nr ' || doc_id AS text
  FROM documents WHERE doc_id < 400),
tg AS (
  SELECT doc_id, u.g FROM (
    SELECT doc_id,
      regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
    FROM t) s,
  UNNEST(CASE WHEN len(toks) >= 13
    THEN list_transform(range(1, len(toks) - 11),
      i -> array_to_string(toks[i:i+12], ' '))
    ELSE [] END) AS u(g)),
h AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_contam_grams
  FROM tg JOIN eg USING (g) GROUP BY doc_id)
SELECT t.doc_id,
  COALESCE(h.n_contam_grams, 0) AS n_contam_grams,
  COALESCE(h.n_contam_grams, 0) >= 1 AS contaminated
FROM t LEFT JOIN h ON t.doc_id = h.doc_id
ORDER BY t.doc_id ASC""",
    doc="BENCHMARK DECONTAMINATION by 13-gram collision"
    " (dedup.py::ngram_decontaminate) — the published"
    " pretraining-hygiene recipe (GPT-3 Appendix C; PaLM/LLaMA at"
    " 8-10 grams): flag every training document sharing any word"
    " 13-gram with an eval benchmark. Distinct from whole-document"
    " digest dedup (misses a benchmark question quoted inside a"
    " larger page) and from within-corpus near-dup splits: this is"
    " the substring gate against an EXTERNAL eval set. Planted"
    " shapes: a page quoting a 13-word eval span (1 colliding"
    " instance), a clean page, a page quoting a full eval passage"
    " (many instances), and a page too short to hold any 13-gram."
    " Scale: eval reduces to its DISTINCT md5'd gram set"
    " (benchmark-sized, broadcast); train explodes grams map-side"
    " into the broadcast join + one per-doc count agg. Oracle:"
    " identical tokenization + n-gram window + join arithmetic in"
    " DuckDB, hash-exact",
)
def z58_ngram_decontaminate(spark, sf_dir):
    from topn_spark.operators.dedup import ngram_decontaminate

    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    ev = docs.where(d < 30).select(
        F.when(d % 2 == 0, F.lit(_Z58_EVAL[0]))
        .otherwise(F.lit(_Z58_EVAL[1]))
        .alias("text")
    )
    text = (
        F.when(d % 4 == 0, F.lit(_Z58_TRAIN[0]))
        .when(d % 4 == 1, F.lit(_Z58_TRAIN[1]))
        .when(d % 4 == 2, F.lit(_Z58_TRAIN[2]))
        .otherwise(F.lit(_Z58_TRAIN[3]))
    )
    train = docs.where(d < 400).select(
        "doc_id",
        F.concat(text, F.lit(" nr "), d.cast("string")).alias("text"),
    )
    return (
        ngram_decontaminate(train, ev, n=13)
        .select("doc_id", "n_contam_grams", "contaminated")
        .orderBy("doc_id")
    )


@query(
    "z59_epoch_mixture",
    r"""WITH t AS (
  SELECT doc_id, lang, CAST(doc_id % 7 + 1 AS BIGINT) AS n_tokens
  FROM documents WHERE lang IN ('en', 'de', 'zh')),
s AS (
  SELECT lang, CAST(SUM(n_tokens) AS BIGINT) AS gsum
  FROM t GROUP BY lang),
c AS (
  SELECT doc_id, lang, n_tokens,
    CAST(COALESCE(SUM(n_tokens) OVER (
      PARTITION BY lang
      ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS BIGINT) AS cum
  FROM t),
j AS (
  SELECT c.doc_id, c.lang, c.n_tokens, c.cum, s.gsum,
    CAST(CASE c.lang WHEN 'en' THEN 2000 WHEN 'de' THEN 6000
      ELSE 12000 END AS BIGINT) AS q
  FROM c JOIN s USING (lang)),
e AS (
  SELECT doc_id, lang, n_tokens,
    LEAST(
      (CASE WHEN gsum > 0 THEN q // gsum ELSE 0 END)
      + (CASE WHEN cum < q - (CASE WHEN gsum > 0 THEN q // gsum
           ELSE 0 END) * gsum THEN 1 ELSE 0 END),
      5) AS n_epochs
  FROM j)
SELECT doc_id, lang, n_tokens, CAST(n_epochs AS BIGINT) AS n_epochs
FROM e WHERE n_epochs > 0 ORDER BY doc_id ASC""",
    doc="MIXTURE SAMPLING WITH REPETITION (pipeline.py::"
    "epoch_mixture) — how real training mixes hit quotas when a"
    " domain is smaller than its share (LLaMA/DoReMi: small"
    " domains run multiple epochs): group g's token quota"
    " round(total*w) is filled by repeating the whole group"
    " quota div group_tokens times plus the deterministic"
    " md5-order partial-epoch prefix (boundary doc included);"
    " n_epochs is a repeat COUNT, not materialized copies, capped"
    " at 5 (the data-constrained-scaling rule of thumb); groups"
    " larger than their quota degenerate to z54's truncation."
    " Quotas en 2000 / de 6000 / zh 12000 over doc_id%7+1 token"
    " counts. All arithmetic exact bigint (div, remainder, prefix"
    " compare). Scale: one model-sized group-sum agg broadcast"
    " back, the two-level z54 cumsum for the prefix, map-only"
    " epoch expression. Oracle: identical integer arithmetic in"
    " DuckDB, hash-exact",
)
def z59_epoch_mixture(spark, sf_dir):
    from topn_spark.operators.pipeline import epoch_mixture

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        ((F.col("doc_id") % 7) + 1).cast("bigint").alias("n_tokens"),
    )
    return (
        epoch_mixture(
            docs,
            {"en": 0.1, "de": 0.3, "zh": 0.6},
            20000,
            group_col="lang",
            max_epochs=5,
        )
        .orderBy("doc_id")
    )


#: z60/z61 planted attribute fixtures: six shapes, each lighting up a
#: different tagger family (prose+stopwords, digits, ellipsis lines,
#: bullets, hash spam, whitespace-only NULL-ratio edge).
_Z60_SHAPES = (
    "the data of that value pipeline runs with care and detail here",
    "call 555 0199 ext 42 room 101 now",
    "the story goes on...\nthe tale goes on...\nplain line of text here",
    "• item one\n• item two\n- item three\nthe end of list",
    "# # tags of # doom with # spam",
)

_Z60_SQL_TEXT = r"""SELECT doc_id,
    CASE WHEN doc_id % 6 = 5 THEN '   '
      ELSE (CASE doc_id % 6
        WHEN 0 THEN 'the data of that value pipeline runs with care and detail here'
        WHEN 1 THEN 'call 555 0199 ext 42 room 101 now'
        WHEN 2 THEN 'the story goes on...' || chr(10) || 'the tale goes on...' || chr(10) || 'plain line of text here'
        WHEN 3 THEN '• item one' || chr(10) || '• item two' || chr(10) || '- item three' || chr(10) || 'the end of list'
        ELSE '# # tags of # doom with # spam'
      END) || ' nr ' || doc_id END AS text
  FROM documents WHERE doc_id < 480"""

_Z60_SQL_ATTRS = r"""m AS (
  SELECT doc_id, text,
    regexp_extract_all(lower(text), '\S+') AS words,
    list_filter(string_split(text, chr(10)), l -> trim(l) != '') AS lines
  FROM t),
a AS (
  SELECT doc_id,
    CAST(length(text) AS BIGINT) AS char_length,
    CAST(len(string_split(text, chr(10))) AS BIGINT) AS line_count,
    CAST(len(words) AS BIGINT) AS word_count,
    ROUND(CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
      / NULLIF(CAST(len(words) AS DOUBLE), 0), 6) AS mean_word_len,
    ROUND(CAST(len(list_filter(words, w -> regexp_matches(w, '\p{L}'))) AS DOUBLE)
      / NULLIF(CAST(len(words) AS DOUBLE), 0), 6) AS alpha_word_frac,
    ROUND(CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
      / NULLIF(CAST(length(text) AS DOUBLE), 0), 6) AS digit_char_frac,
    ROUND(CAST(len(regexp_extract_all(text, '#')) AS DOUBLE)
      / NULLIF(CAST(len(words) AS DOUBLE), 0), 6) AS hash_word_ratio,
    CAST(len(list_intersect(list_distinct(words),
      ['the','be','to','of','and','that','have','with'])) AS BIGINT) AS stop_hits,
    ROUND(CAST(len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•‣▪]'))) AS DOUBLE)
      / NULLIF(CAST(len(lines) AS DOUBLE), 0), 6) AS bullet_line_frac,
    ROUND(CAST(len(list_filter(lines, l -> regexp_matches(trim(l), '(\.\.\.|…)$'))) AS DOUBLE)
      / NULLIF(CAST(len(lines) AS DOUBLE), 0), 6) AS ellipsis_line_frac
  FROM m)"""


def _z60_text():
    d = F.col("doc_id")
    m = d % 6
    base = F.when(m == 0, F.lit(_Z60_SHAPES[0]))
    for i in range(1, 5):
        base = base.when(m == i, F.lit(_Z60_SHAPES[i]))
    return F.when(m == 5, F.lit("   ")).otherwise(
        F.concat(base, F.lit(" nr "), d.cast("string"))
    )


@query(
    "z60_tag_attributes",
    "WITH t AS (" + _Z60_SQL_TEXT + """),
""" + _Z60_SQL_ATTRS + """
SELECT * FROM a ORDER BY doc_id ASC""",
    doc="ATTRIBUTE SIDECAR TAGGING (attributes.py::tag_attributes)"
    " — the Dolma/RedPajama-v2 tag-then-mix architecture's first"
    " half: the full doc-level tagger registry (length, line/word"
    " counts, mean word length, alpha-word + digit-char fractions,"
    " hash-symbol ratio, Gopher stopword hits, bullet/ellipsis"
    " line fractions) evaluated in ONE map-only scan into the"
    " sidecar row (id + one column per tagger). Signals are"
    " computed once per corpus; every later mix reads only the"
    " attribute columns its rules touch (parquet column pruning)."
    " Six planted shapes, incl. whitespace-only (NULL ratios) and"
    " NULL-free counts as exact BIGINTs, every ratio ROUND(x,6) of"
    " one IEEE division. Oracle: every tagger expression replayed"
    " verbatim in DuckDB (RE2-portable by design), hash-exact",
)
def z60_tag_attributes(spark, sf_dir):
    from topn_spark.operators.attributes import tag_attributes

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 480
    )
    planted = docs.select("doc_id", _z60_text().alias("text"))
    return tag_attributes(planted).orderBy("doc_id")


#: z61 mixer config: OR of two include AND-lists (prose gate OR
#: bullet-heavy gate), two exclude lists (digit spam, hash spam).
_Z61_CONFIG = {
    "include": [
        [["word_count", ">=", 8], ["stop_hits", ">=", 2]],
        [["bullet_line_frac", ">", 0.5]],
    ],
    "exclude": [
        [["digit_char_frac", ">", 0.2]],
        [["hash_word_ratio", ">", 0.1]],
    ],
}


@query(
    "z61_mixer",
    "WITH t AS (" + _Z60_SQL_TEXT + """),
""" + _Z60_SQL_ATTRS + """
SELECT doc_id, word_count, stop_hits, bullet_line_frac
FROM a
WHERE (COALESCE(word_count >= 8 AND stop_hits >= 2, false)
       OR COALESCE(bullet_line_frac > 0.5, false))
  AND NOT COALESCE(digit_char_frac > 0.2, false)
  AND NOT COALESCE(hash_word_ratio > 0.1, false)
ORDER BY doc_id ASC""",
    doc="DECLARATIVE CORPUS MIXER (attributes.py::apply_mixer) —"
    " the tag-then-mix architecture's second half: a JSON rule"
    " config (include = OR of AND-lists of [attr, op, value]"
    " triples, exclude likewise, Dolma mixer semantics) evaluated"
    " over the z60 attribute sidecar, NULL attributes matching"
    " nothing on either side (whitespace-only docs fall out of"
    " include, never trip exclude). Kept shapes: prose (include"
    " AND-list 1), ellipsis prose (same), bullet list (include"
    " AND-list 2); digit spam + hash spam shapes are excluded."
    " Plan: one id-equi left join to the sidecar + a literal"
    " predicate — re-mixing a 100 TB corpus touches text only in"
    " the final join. Oracle: identical COALESCE'd boolean"
    " algebra in DuckDB, hash-exact",
)
def z61_mixer(spark, sf_dir):
    from topn_spark.operators.attributes import apply_mixer, tag_attributes

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 480
    )
    planted = docs.select("doc_id", _z60_text().alias("text"))
    attrs = tag_attributes(planted)
    return (
        apply_mixer(planted, attrs, _Z61_CONFIG, keep_attrs=True)
        .select("doc_id", "word_count", "stop_hits", "bullet_line_frac")
        .orderBy("doc_id")
    )


#: z62 planted paragraph shapes: boilerplate shared across 3/4 of
#: docs (first occurrence survives in doc 0), a cookie banner
#: duplicated across docs AND within one doc, and clean docs.
_Z62_BOILER = "subscribe to our newsletter for updates"
_Z62_COOKIE = "this site uses cookies to improve your experience"


@query(
    "z62_scrub_dup_paragraphs",
    r"""WITH t AS (
  SELECT doc_id,
    CASE doc_id % 4
      WHEN 0 THEN 'doc body ' || doc_id || chr(10) || chr(10)
        || 'subscribe to our newsletter for updates'
        || chr(10) || chr(10) || 'more body ' || doc_id
      WHEN 1 THEN 'subscribe to our newsletter for updates'
        || chr(10) || chr(10) || 'doc body beta ' || doc_id
      WHEN 2 THEN 'doc body gamma ' || doc_id || chr(10) || chr(10)
        || 'this site uses cookies to improve your experience'
        || chr(10) || chr(10)
        || 'this site uses cookies to improve your experience'
      ELSE 'doc body delta ' || doc_id
    END AS text
  FROM documents WHERE doc_id < 300),
p AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, paras[i] AS para
  FROM (SELECT doc_id,
          string_split(text, chr(10) || chr(10)) AS paras
        FROM t) s,
  UNNEST(range(1, len(paras) + 1)) AS r(i)),
d AS (
  SELECT doc_id, pos, para,
    (trim(para) <> '') AND (ROW_NUMBER() OVER (
      PARTITION BY md5(para) ORDER BY doc_id ASC, pos ASC) > 1) AS dup
  FROM p)
SELECT doc_id,
  array_to_string(
    list(CASE WHEN dup THEN '' ELSE para END ORDER BY pos ASC),
    chr(10) || chr(10)) AS text,
  CAST(SUM(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_scrubbed
FROM d GROUP BY doc_id ORDER BY doc_id ASC""",
    doc="BOILERPLATE-PARAGRAPH SCRUB (attributes.py::"
    "scrub_dup_paragraphs = dup_paragraph_spans + replace_spans) —"
    " the FineWeb/Dolma span-level cleanup whole-document dedup"
    " cannot express: every paragraph occurrence that is not the"
    " corpus-wide FIRST occurrence of its exact text (first ="
    " smallest (id, position); blank paragraphs never tagged) is"
    " spliced out of the text via the sorted span fold, separators"
    " preserved byte-exactly. Planted shapes: a newsletter banner"
    " shared by 3/4 of docs (survives only in doc 0), a cookie"
    " banner duplicated across docs AND twice within one doc, and"
    " clean docs. Scale: paragraph explode + map-side-combinable"
    " min(struct(id,pos)) per md5 key (boilerplate skew safe) +"
    " join back + per-doc bounded span collect; the splice is a"
    " map-only Catalyst aggregate fold. Oracle: DuckDB rebuilds"
    " each text by blanking non-first paragraph occurrences and"
    " re-joining on the separator — value equality proves the"
    " span offset arithmetic end to end, hash-exact",
)
def z62_scrub_dup_paragraphs(spark, sf_dir):
    from topn_spark.operators.attributes import scrub_dup_paragraphs

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 300
    )
    d = F.col("doc_id")
    ds = d.cast("string")
    sep = F.lit("\n\n")
    text = (
        F.when(
            d % 4 == 0,
            F.concat(
                F.lit("doc body "), ds, sep, F.lit(_Z62_BOILER), sep,
                F.lit("more body "), ds,
            ),
        )
        .when(
            d % 4 == 1,
            F.concat(F.lit(_Z62_BOILER), sep, F.lit("doc body beta "), ds),
        )
        .when(
            d % 4 == 2,
            F.concat(
                F.lit("doc body gamma "), ds, sep, F.lit(_Z62_COOKIE),
                sep, F.lit(_Z62_COOKIE),
            ),
        )
        .otherwise(F.concat(F.lit("doc body delta "), ds))
    )
    planted = docs.select("doc_id", text.alias("text"))
    return scrub_dup_paragraphs(planted).orderBy("doc_id")


@query(
    "z63_expand_epochs",
    r"""WITH t AS (
  SELECT doc_id, lang, CAST(doc_id % 7 + 1 AS BIGINT) AS n_tokens
  FROM documents WHERE lang IN ('en', 'de', 'zh')),
s AS (
  SELECT lang, CAST(SUM(n_tokens) AS BIGINT) AS gsum
  FROM t GROUP BY lang),
c AS (
  SELECT doc_id, lang, n_tokens,
    CAST(COALESCE(SUM(n_tokens) OVER (
      PARTITION BY lang
      ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS BIGINT) AS cum
  FROM t),
j AS (
  SELECT c.doc_id, c.lang, c.n_tokens, c.cum, s.gsum,
    CAST(CASE c.lang WHEN 'en' THEN 2000 WHEN 'de' THEN 6000
      ELSE 12000 END AS BIGINT) AS q
  FROM c JOIN s USING (lang)),
e AS (
  SELECT doc_id,
    LEAST(
      (CASE WHEN gsum > 0 THEN q // gsum ELSE 0 END)
      + (CASE WHEN cum < q - (CASE WHEN gsum > 0 THEN q // gsum
           ELSE 0 END) * gsum THEN 1 ELSE 0 END),
      5) AS n_epochs
  FROM j),
x AS (
  SELECT doc_id, CAST(u.ep AS BIGINT) AS epoch
  FROM e, UNNEST(range(n_epochs)) AS u(ep)
  WHERE n_epochs > 0)
SELECT doc_id, epoch,
  md5(CAST(doc_id AS VARCHAR) || ':' || CAST(epoch AS VARCHAR))
    AS order_key
FROM x ORDER BY order_key ASC, doc_id ASC""",
    doc="EPOCH EXPANSION + GLOBAL INTERLEAVE (pipeline.py::"
    "expand_epochs) — the link between mixture sampling and the"
    " trainer: z59's per-document repeat counts materialized into"
    " one row per (document, epoch) with the deterministic"
    " interleave key order_key = md5(id || ':' || epoch), so"
    " reading in key order spreads every repeated document's"
    " copies uniformly through the stream instead of clustering"
    " them (the multi-epoch training requirement); md5 keeps the"
    " order engine-portable and a salt re-deals it per run."
    " Scale: one explode(sequence) map-only pass sized by the"
    " total epoch count the trainer reads anyway; the interleave"
    " is a per-shard sort or repartitionByRange at export, never"
    " a driver-side sort. Oracle: z59's exact integer arithmetic"
    " + UNNEST(range) + the same md5 key in DuckDB, hash-exact",
)
def z63_expand_epochs(spark, sf_dir):
    from topn_spark.operators.pipeline import epoch_mixture, expand_epochs

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        ((F.col("doc_id") % 7) + 1).cast("bigint").alias("n_tokens"),
    )
    mixed = epoch_mixture(
        docs,
        {"en": 0.1, "de": 0.3, "zh": 0.6},
        20000,
        group_col="lang",
        max_epochs=5,
    )
    return (
        expand_epochs(mixed)
        .select("doc_id", "epoch", "order_key")
        .orderBy("order_key", "doc_id")
    )


@query(
    "z64_mixer_report",
    "WITH t AS (" + _Z60_SQL_TEXT + """),
""" + _Z60_SQL_ATTRS + """
SELECT rule, n_docs FROM (
  SELECT 'include[0]' AS rule, CAST(SUM(CASE WHEN
      COALESCE(word_count >= 8 AND stop_hits >= 2, false)
    THEN 1 ELSE 0 END) AS BIGINT) AS n_docs FROM a
  UNION ALL
  SELECT 'include[1]', CAST(SUM(CASE WHEN
      COALESCE(bullet_line_frac > 0.5, false)
    THEN 1 ELSE 0 END) AS BIGINT) FROM a
  UNION ALL
  SELECT 'exclude[0]', CAST(SUM(CASE WHEN
      COALESCE(digit_char_frac > 0.2, false)
    THEN 1 ELSE 0 END) AS BIGINT) FROM a
  UNION ALL
  SELECT 'exclude[1]', CAST(SUM(CASE WHEN
      COALESCE(hash_word_ratio > 0.1, false)
    THEN 1 ELSE 0 END) AS BIGINT) FROM a
  UNION ALL
  SELECT 'kept', CAST(SUM(CASE WHEN
      (COALESCE(word_count >= 8 AND stop_hits >= 2, false)
       OR COALESCE(bullet_line_frac > 0.5, false))
      AND NOT COALESCE(digit_char_frac > 0.2, false)
      AND NOT COALESCE(hash_word_ratio > 0.1, false)
    THEN 1 ELSE 0 END) AS BIGINT) FROM a
  UNION ALL
  SELECT 'total', CAST(COUNT(*) AS BIGINT) FROM a
) r ORDER BY rule ASC""",
    doc="MIXER RULE ACCOUNTING (attributes.py::mixer_report) — the"
    " release data card's 'why documents dropped' table (Dolma's"
    " mixer emits the same statistics): one row per rule with its"
    " AND-list match count over the z60 sidecar, plus kept/total"
    " summary rows; NULL-safe exactly like apply_mixer, so 'kept'"
    " equals the z61 release row count. One scan: every rule a 0/1"
    " projection summed in a single hash agg to one model-sized"
    " row, unpivoted via stack — no per-rule job. Oracle: the same"
    " COALESCE'd CASE sums as a UNION ALL in DuckDB, hash-exact",
)
def z64_mixer_report(spark, sf_dir):
    from topn_spark.operators.attributes import mixer_report, tag_attributes

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 480
    )
    planted = docs.select("doc_id", _z60_text().alias("text"))
    attrs = tag_attributes(planted)
    return mixer_report(planted, attrs, _Z61_CONFIG)


@query(
    "z65_contamination_report",
    r"""WITH ev AS (
  SELECT CASE doc_id % 2 WHEN 0 THEN 'task_fox' ELSE 'task_hamlet' END
      AS benchmark,
    CASE doc_id % 2 WHEN 0
      THEN 'the quick brown fox jumps over the lazy dog near the river bank today'
      ELSE 'to be or not to be that is the question whether tis nobler in the mind'
    END AS text
  FROM documents WHERE doc_id < 30),
eg AS (
  SELECT DISTINCT benchmark, u.g FROM (
    SELECT benchmark,
      regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
    FROM ev) s,
  UNNEST(CASE WHEN len(toks) >= 13
    THEN list_transform(range(1, len(toks) - 11),
      i -> array_to_string(toks[i:i+12], ' '))
    ELSE [] END) AS u(g)),
gc AS (
  SELECT benchmark, CAST(COUNT(*) AS BIGINT) AS n_eval_grams
  FROM eg GROUP BY benchmark),
t AS (
  SELECT doc_id,
    CASE doc_id % 4
      WHEN 0 THEN 'a web page quoting the quick brown fox jumps over the lazy dog near the river bank for flavor'
      WHEN 1 THEN 'a perfectly clean document about nothing in particular with plenty of ordinary words to say here'
      WHEN 2 THEN 'an essay citing to be or not to be that is the question whether tis nobler in the mind at length'
      ELSE 'too short to match'
    END || ' nr ' || doc_id AS text
  FROM documents WHERE doc_id < 400),
tg AS (
  SELECT doc_id, u.g FROM (
    SELECT doc_id,
      regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
    FROM t) s,
  UNNEST(CASE WHEN len(toks) >= 13
    THEN list_transform(range(1, len(toks) - 11),
      i -> array_to_string(toks[i:i+12], ' '))
    ELSE [] END) AS u(g)),
h AS (
  SELECT doc_id, benchmark, CAST(COUNT(*) AS BIGINT) AS inst
  FROM tg JOIN eg USING (g) GROUP BY doc_id, benchmark
  HAVING COUNT(*) >= 1),
pb AS (
  SELECT benchmark,
    CAST(COUNT(*) AS BIGINT) AS n_contaminated_docs,
    CAST(SUM(inst) AS BIGINT) AS n_contam_instances
  FROM h GROUP BY benchmark)
SELECT gc.benchmark, gc.n_eval_grams,
  COALESCE(pb.n_contaminated_docs, 0) AS n_contaminated_docs,
  COALESCE(pb.n_contam_instances, 0) AS n_contam_instances
FROM gc LEFT JOIN pb USING (benchmark)
ORDER BY benchmark ASC""",
    doc="PER-BENCHMARK CONTAMINATION REPORT (dedup.py::"
    "contamination_report) — the form dataset reports publish"
    " (GPT-3 Appendix C reports leakage per eval TASK): for each"
    " benchmark in the suite, its distinct gram count, how many"
    " training docs collide with >= min_hits gram instances, and"
    " the instance totals. NOT a GROUP BY over the pooled z58 gate"
    " — a gram shared by several tasks must count against each."
    " Planted: the fox passage (quoted 13 words by 1/4 of docs,"
    " one instance each) and the hamlet passage (quoted wholesale"
    " by another 1/4, four instances each); clean + too-short"
    " shapes hit nothing. Scale: suite-sized distinct (benchmark,"
    " gram) pairs broadcast; ONE train gram explode feeds one"
    " (doc,benchmark) agg then one benchmark agg. Oracle:"
    " identical tokenize/gram/join/agg arithmetic in DuckDB,"
    " hash-exact",
)
def z65_contamination_report(spark, sf_dir):
    from topn_spark.operators.dedup import contamination_report

    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    ev = docs.where(d < 30).select(
        F.when(d % 2 == 0, F.lit("task_fox"))
        .otherwise(F.lit("task_hamlet"))
        .alias("benchmark"),
        F.when(d % 2 == 0, F.lit(_Z58_EVAL[0]))
        .otherwise(F.lit(_Z58_EVAL[1]))
        .alias("text"),
    )
    text = (
        F.when(d % 4 == 0, F.lit(_Z58_TRAIN[0]))
        .when(d % 4 == 1, F.lit(_Z58_TRAIN[1]))
        .when(d % 4 == 2, F.lit(_Z58_TRAIN[2]))
        .otherwise(F.lit(_Z58_TRAIN[3]))
    )
    train = docs.where(d < 400).select(
        "doc_id",
        F.concat(text, F.lit(" nr "), d.cast("string")).alias("text"),
    )
    return contamination_report(train, ev, n=13)


def _z66_messages():
    """Planted SFT conversations: eight structural shapes keyed by
    doc_id % 8, content salted with the id for uniqueness."""
    d = F.col("doc_id")
    ds = d.cast("string")

    def msg(role, content):
        return F.struct(
            F.lit(role).alias("role"), content.alias("content")
        )

    def s(x):
        return F.lit(x)

    return (
        F.when(d % 8 == 0, F.array(
            msg("system", F.concat(s("sys "), ds)),
            msg("user", F.concat(s("hi "), ds)),
            msg("assistant", F.concat(s("hello "), ds)),
        ))
        .when(d % 8 == 1, F.array(
            msg("user", F.concat(s("q1 "), ds)),
            msg("assistant", s("a1")),
            msg("user", s("q2")),
            msg("assistant", F.concat(s("a2 "), ds)),
        ))
        .when(d % 8 == 2, F.array(
            msg("user", s("x")),
            msg("user", F.concat(s("y "), ds)),
            msg("assistant", s("z")),
        ))
        .when(d % 8 == 3, F.array(
            msg("user", F.concat(s("x "), ds)),
            msg("assistant", s("y")),
            msg("user", s("tail")),
        ))
        .when(d % 8 == 4, F.array(
            msg("user", s("x")),
            msg("tool", F.concat(s("t "), ds)),
            msg("assistant", s("y")),
        ))
        .when(d % 8 == 5, F.array(
            msg("user", F.concat(s("x "), ds)),
            msg("assistant", s("   ")),
        ))
        .when(d % 8 == 6, F.array(
            msg("user", s("x")),
            msg("system", F.concat(s("late "), ds)),
            msg("assistant", s("y")),
        ))
        .otherwise(
            F.array().cast(
                "array<struct<role:string,content:string>>"
            )
        )
    )


@query(
    "z66_sft_chat_prep",
    r"""WITH t AS (
  SELECT doc_id AS conv_id,
    CASE doc_id % 8
      WHEN 0 THEN [{'role': 'system', 'content': 'sys ' || doc_id},
                   {'role': 'user', 'content': 'hi ' || doc_id},
                   {'role': 'assistant', 'content': 'hello ' || doc_id}]
      WHEN 1 THEN [{'role': 'user', 'content': 'q1 ' || doc_id},
                   {'role': 'assistant', 'content': 'a1'},
                   {'role': 'user', 'content': 'q2'},
                   {'role': 'assistant', 'content': 'a2 ' || doc_id}]
      WHEN 2 THEN [{'role': 'user', 'content': 'x'},
                   {'role': 'user', 'content': 'y ' || doc_id},
                   {'role': 'assistant', 'content': 'z'}]
      WHEN 3 THEN [{'role': 'user', 'content': 'x ' || doc_id},
                   {'role': 'assistant', 'content': 'y'},
                   {'role': 'user', 'content': 'tail'}]
      WHEN 4 THEN [{'role': 'user', 'content': 'x'},
                   {'role': 'tool', 'content': 't ' || doc_id},
                   {'role': 'assistant', 'content': 'y'}]
      WHEN 5 THEN [{'role': 'user', 'content': 'x ' || doc_id},
                   {'role': 'assistant', 'content': '   '}]
      WHEN 6 THEN [{'role': 'user', 'content': 'x'},
                   {'role': 'system', 'content': 'late ' || doc_id},
                   {'role': 'assistant', 'content': 'y'}]
      ELSE CAST([] AS STRUCT(role VARCHAR, content VARCHAR)[])
    END AS m
  FROM documents WHERE doc_id < 400),
q AS (
  SELECT conv_id, m,
    list_transform(m, x -> x.role) AS roles,
    CAST(len(m) AS BIGINT) AS n_turns,
    (m IS NULL OR len(m) = 0) AS no_messages
  FROM t),
f AS (
  SELECT conv_id, n_turns, no_messages,
    CASE WHEN no_messages THEN false ELSE
      len(list_filter(roles, r -> r IS NULL
        OR r NOT IN ('system', 'user', 'assistant'))) > 0 END
      AS bad_role,
    CASE WHEN no_messages THEN false ELSE
      len(list_filter(m, x -> x.content IS NULL
        OR trim(x.content) = '')) > 0 END AS empty_content,
    CASE WHEN no_messages THEN false ELSE
      list_contains(roles[2:], 'system') END AS misplaced_system,
    CASE WHEN no_messages THEN false ELSE (
      len(CASE WHEN roles[1] = 'system' THEN roles[2:]
          ELSE roles END) = 0
      OR len(list_filter(
        CASE WHEN roles[1] = 'system' THEN roles[2:] ELSE roles END,
        (r, i) -> r <> CASE WHEN (i - 1) % 2 = 0 THEN 'user'
                       ELSE 'assistant' END)) > 0
    ) END AS not_alternating,
    CASE WHEN no_messages THEN false ELSE
      roles[len(roles)] <> 'assistant' END AS assistant_last,
    CASE WHEN len(m) = 0 THEN ''
      ELSE array_to_string(list_transform(m,
        x -> '<|im_start|>' || x.role || chr(10) || x.content
             || '<|im_end|>'), chr(10)) END AS text
  FROM q)
SELECT conv_id, n_turns, no_messages, bad_role, empty_content,
  misplaced_system, not_alternating, assistant_last,
  CASE WHEN no_messages THEN 'no_messages'
       WHEN bad_role THEN 'bad_role'
       WHEN empty_content THEN 'empty_content'
       WHEN misplaced_system THEN 'misplaced_system'
       WHEN not_alternating THEN 'not_alternating'
       WHEN assistant_last THEN 'assistant_last' END AS qc_reason,
  (CASE WHEN no_messages THEN 'no_messages'
       WHEN bad_role THEN 'bad_role'
       WHEN empty_content THEN 'empty_content'
       WHEN misplaced_system THEN 'misplaced_system'
       WHEN not_alternating THEN 'not_alternating'
       WHEN assistant_last THEN 'assistant_last' END) IS NULL
    AS qc_pass,
  text
FROM f ORDER BY conv_id ASC""",
    doc="SFT CONVERSATION PREP (operators/sft.py::conversation_qc +"
    " render_chat) — the post-pretraining data modality: message"
    " arrays (array<struct<role,content>>) structurally QC'd (roles"
    " from the allowed set, optional system only at position 0,"
    " strict user/assistant alternation user-first, non-empty"
    " content, assistant-final — per-rule flags + first-failure"
    " qc_reason, the observable-gate discipline) and flattened to"
    " training text under the public ChatML template"
    " (<|im_start|>role\\ncontent<|im_end|>, newline-joined)."
    " Eight planted shapes each isolating one rule. All pure array"
    " algebra over one projection-bound message array — map-only,"
    " no UDF. Oracle: identical list_transform/list_filter/indexed"
    " lambda algebra + the verbatim template concatenation in"
    " DuckDB, hash-exact",
)
def z66_sft_chat_prep(spark, sf_dir):
    from topn_spark.operators.sft import conversation_qc, render_chat

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 400
    )
    convs = docs.select(
        F.col("doc_id").alias("conv_id"),
        _z66_messages().alias("messages"),
    )
    out = conversation_qc(convs)
    out = render_chat(out, out_col="text")
    return out.select(
        "conv_id", "n_turns", "no_messages", "bad_role",
        "empty_content", "misplaced_system", "not_alternating",
        "assistant_last", "qc_reason", "qc_pass", "text",
    ).orderBy("conv_id")


@query(
    "z67_best_of_n",
    r"""WITH s AS (
  SELECT doc_id // 8 AS prompt_id,
    doc_id % 8 AS sample_id,
    CAST((doc_id * 37) % 100 AS BIGINT) AS score,
    'resp ' || doc_id AS response
  FROM documents WHERE doc_id < 480),
r AS (
  SELECT prompt_id, sample_id, score, response,
    ROW_NUMBER() OVER (
      PARTITION BY prompt_id
      ORDER BY score DESC NULLS LAST, sample_id ASC) AS rk
  FROM s)
SELECT prompt_id, sample_id, score, response
FROM r WHERE rk <= 1
ORDER BY prompt_id ASC""",
    doc="BEST-OF-N REJECTION SAMPLING (operators/topn.py::"
    "topn_grouped, size=1) — the reference's grouped top-N"
    " (TopN.java semantics: desc, null-smallest) IS the SFT/RLHF"
    " best-of-n step: n scored samples per prompt, keep the"
    " highest-reward response (deterministic sample_id tiebreak),"
    " the standard rejection-sampling data construction (Llama 2's"
    " RS fine-tuning; WebGPT best-of-n). Planted: 8 samples per"
    " prompt with a (doc_id*37)%100 reward. Scale: WindowGroupLimit"
    " evaluates the rank cut map-side, so at most one row per"
    " prompt per partition shuffles — the grouped bounded heap."
    " Oracle: identical window SQL in DuckDB, hash-exact",
)
def z67_best_of_n(spark, sf_dir):
    from topn_spark.operators.topn import topn_grouped

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 480
    )
    d = F.col("doc_id")
    samples = docs.select(
        (d / 8).cast("bigint").alias("prompt_id"),
        (d % 8).alias("sample_id"),
        ((d * 37) % 100).cast("bigint").alias("score"),
        F.concat(F.lit("resp "), d.cast("string")).alias("response"),
    )
    return topn_grouped(
        samples,
        "prompt_id",
        "score",
        size=1,
        tiebreak=F.col("sample_id").asc(),
    ).orderBy("prompt_id")


@query(
    "z68_score_bin_sample",
    r"""WITH s AS (
  SELECT doc_id, CAST((doc_id * 37) % 100 AS BIGINT) AS score
  FROM documents WHERE doc_id < 480),
b AS (
  SELECT doc_id, score,
    CAST(NTILE(5) OVER (ORDER BY score DESC, doc_id ASC) AS INT)
      AS score_bin
  FROM s)
SELECT doc_id, score, score_bin FROM b
WHERE CASE score_bin
    WHEN 1 THEN true
    WHEN 2 THEN true
    WHEN 3 THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                  < '80000000'
    WHEN 4 THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                  < '40000000'
    ELSE false END
ORDER BY doc_id ASC""",
    doc="QUALITY-BIN SAMPLING (pipeline.py::score_bin_sample) — the"
    " FineWeb-Edu/DCLM release recipe: rank by a quality score, cut"
    " into NTILE bins (bin 1 = best), keep each bin at its own"
    " deterministic rate (here 1.0/1.0/0.5/0.25/0.0 over 5 bins):"
    " top bins wholesale, middle downsampled by the md5 8-hex-prefix"
    " threshold (engine-portable, rerun-stable), tail dropped."
    " Binning is the exact two-phase global rank + ntile_from_rank"
    " — NO keyless ntile window, so the corpus sort stays parallel"
    " (the x13 equivalence, reused as a release stage). Oracle:"
    " DuckDB NTILE over the identical (score DESC, id ASC) order +"
    " the same md5 prefix thresholds, hash-exact",
)
def z68_score_bin_sample(spark, sf_dir):
    from topn_spark.operators.pipeline import score_bin_sample

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 480
    )
    d = F.col("doc_id")
    scored = docs.select(
        "doc_id", ((d * 37) % 100).cast("bigint").alias("score")
    )
    return (
        score_bin_sample(
            scored, "score", [1.0, 1.0, 0.5, 0.25, 0.0]
        )
        .select("doc_id", "score", "score_bin")
        .orderBy("doc_id")
    )


@query(
    "z69_redact_conversation",
    r"""WITH t AS (
  SELECT doc_id AS conv_id,
    CASE doc_id % 3
      WHEN 0 THEN [{'role': 'user',
                    'content': 'mail me at bob' || doc_id || '@example.com or 10.0.0.' || doc_id % 250},
                   {'role': 'assistant',
                    'content': 'noted ' || doc_id}]
      WHEN 1 THEN [{'role': 'user',
                    'content': 'call (555) 123-4567 and 555-987-6543 nr ' || doc_id},
                   {'role': 'assistant',
                    'content': 'ok also reach a' || doc_id || '@b.co'}]
      ELSE [{'role': 'user', 'content': 'clean question ' || doc_id},
            {'role': 'assistant', 'content': 'clean answer ' || doc_id}]
    END AS m
  FROM documents WHERE doc_id < 400),
r AS (
  SELECT conv_id,
    list_transform(m, x -> {'role': x.role,
      'content': regexp_replace(regexp_replace(regexp_replace(
        x.content,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        '|||EMAIL_ADDRESS|||', 'g'),
        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
        '|||IP_ADDRESS|||', 'g'),
        '\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}',
        '|||PHONE_NUMBER|||', 'g')}) AS mm,
    CAST(COALESCE(list_aggregate(list_transform(m, x ->
      len(regexp_extract_all(x.content,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))), 'sum'), 0)
      AS BIGINT) AS pii_email,
    CAST(COALESCE(list_aggregate(list_transform(m, x ->
      len(regexp_extract_all(x.content,
        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))), 'sum'), 0)
      AS BIGINT) AS pii_ip,
    CAST(COALESCE(list_aggregate(list_transform(m, x ->
      len(regexp_extract_all(x.content,
        '\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}'))), 'sum'), 0)
      AS BIGINT) AS pii_phone
  FROM t)
SELECT conv_id, pii_email, pii_ip, pii_phone,
  pii_email + pii_ip + pii_phone AS pii_total,
  array_to_string(list_transform(mm,
    x -> '<|im_start|>' || x.role || chr(10) || x.content
         || '<|im_end|>'), chr(10)) AS text
FROM r ORDER BY conv_id ASC""",
    doc="CONVERSATION PII RELEASE GATE (operators/sft.py::"
    "redact_conversation) — the z51 document gate applied to the"
    " SFT modality: every message content rewritten IN PLACE"
    " through the engine's standard PII patterns (emails, IPv4,"
    " phones → placeholder tokens, same order/precedence),"
    " preserving roles and turn structure (redacting the rendered"
    " text would destroy the array every trainer consumes);"
    " per-class counts over the ORIGINAL turns + pii_total."
    " Rendered after redaction to prove the in-place rewrite end"
    " to end. Pure Catalyst transform/aggregate over one bound"
    " array. Oracle: the identical RE2 patterns + 'g'-flagged"
    " chained replaces + per-turn count sums in DuckDB, hash-exact",
)
def z69_redact_conversation(spark, sf_dir):
    from topn_spark.operators.sft import redact_conversation, render_chat

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 400
    )
    d = F.col("doc_id")
    ds = d.cast("string")

    def msg(role, content):
        return F.struct(
            F.lit(role).alias("role"), content.alias("content")
        )

    messages = (
        F.when(d % 3 == 0, F.array(
            msg("user", F.concat(
                F.lit("mail me at bob"), ds, F.lit("@example.com or 10.0.0."),
                (d % 250).cast("string"))),
            msg("assistant", F.concat(F.lit("noted "), ds)),
        ))
        .when(d % 3 == 1, F.array(
            msg("user", F.concat(
                F.lit("call (555) 123-4567 and 555-987-6543 nr "), ds)),
            msg("assistant", F.concat(
                F.lit("ok also reach a"), ds, F.lit("@b.co"))),
        ))
        .otherwise(F.array(
            msg("user", F.concat(F.lit("clean question "), ds)),
            msg("assistant", F.concat(F.lit("clean answer "), ds)),
        ))
    )
    convs = docs.select(
        d.alias("conv_id"), messages.alias("messages")
    )
    out = redact_conversation(convs)
    out = render_chat(out, out_col="text")
    return out.select(
        "conv_id", "pii_email", "pii_ip", "pii_phone", "pii_total",
        "text",
    ).orderBy("conv_id")


@query(
    "z70_preference_pairs",
    r"""WITH s AS (
  SELECT doc_id // 6 AS prompt_id,
    CAST(doc_id % 6 AS BIGINT) AS sample_id,
    CAST(CASE WHEN doc_id % 6 >= 4 THEN 7
      ELSE (doc_id * 41) % 50 END AS DOUBLE) AS score,
    'resp ' || doc_id AS response
  FROM documents WHERE doc_id < 480),
r AS (
  SELECT *,
    ROW_NUMBER() OVER (PARTITION BY prompt_id
      ORDER BY score DESC, sample_id ASC) AS rc,
    ROW_NUMBER() OVER (PARTITION BY prompt_id
      ORDER BY score ASC, sample_id DESC) AS rr,
    CAST(COUNT(*) OVER (PARTITION BY prompt_id) AS BIGINT)
      AS n_samples
  FROM s),
c AS (SELECT prompt_id, sample_id AS chosen_id,
        score AS chosen_score, response AS chosen_response,
        n_samples
      FROM r WHERE rc = 1),
j AS (SELECT prompt_id, sample_id AS rejected_id,
        score AS rejected_score, response AS rejected_response
      FROM r WHERE rr = 1)
SELECT c.prompt_id, chosen_id, chosen_score, chosen_response,
  rejected_id, rejected_score, rejected_response,
  chosen_score - rejected_score AS score_gap, n_samples
FROM c JOIN j USING (prompt_id)
WHERE n_samples >= 2 AND chosen_score - rejected_score > 0
  AND chosen_score - rejected_score >= 5.0
ORDER BY prompt_id ASC""",
    doc="PREFERENCE-PAIR CONSTRUCTION (operators/sft.py::"
    "preference_pairs) — the DPO/RLHF reward-data step: per prompt,"
    " chosen = highest-score sample (ties -> lowest id), rejected ="
    " lowest (ties -> HIGHEST id, so a two-way tie never selects"
    " the same row), emitted only with >= 2 samples and a strictly"
    " positive gap >= min_gap (tied pairs carry no preference"
    " signal). Planted: 6 samples per prompt with two forced-tie"
    " scores, min_gap 5. Scale: ONE hash agg per prompt — extremes"
    " as min/max over struct(score, ±id, response payload),"
    " map-side combinable, so a hot prompt with millions of samples"
    " still partial-aggregates; no window over data. Oracle:"
    " dual row_number windows + join in DuckDB encoding the same"
    " tiebreaks, hash-exact",
)
def z70_preference_pairs(spark, sf_dir):
    from topn_spark.operators.sft import preference_pairs

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 480
    )
    d = F.col("doc_id")
    s = d % 6
    samples = docs.select(
        (d / 6).cast("bigint").alias("prompt_id"),
        s.cast("bigint").alias("sample_id"),
        F.when(s >= 4, F.lit(7.0))
        .otherwise(((d * 41) % 50).cast("double"))
        .alias("score"),
        F.concat(F.lit("resp "), d.cast("string")).alias("response"),
    )
    return preference_pairs(samples, min_gap=5.0).orderBy("prompt_id")


@query(
    "z71_loss_spans",
    r"""WITH t AS (
  SELECT doc_id AS conv_id,
    CASE doc_id % 8
      WHEN 0 THEN [{'role': 'system', 'content': 'sys ' || doc_id},
                   {'role': 'user', 'content': 'hi ' || doc_id},
                   {'role': 'assistant', 'content': 'hello ' || doc_id}]
      WHEN 1 THEN [{'role': 'user', 'content': 'q1 ' || doc_id},
                   {'role': 'assistant', 'content': 'a1'},
                   {'role': 'user', 'content': 'q2'},
                   {'role': 'assistant', 'content': 'a2 ' || doc_id}]
      WHEN 2 THEN [{'role': 'user', 'content': 'x'},
                   {'role': 'user', 'content': 'y ' || doc_id},
                   {'role': 'assistant', 'content': 'z'}]
      WHEN 3 THEN [{'role': 'user', 'content': 'x ' || doc_id},
                   {'role': 'assistant', 'content': 'y'},
                   {'role': 'user', 'content': 'tail'}]
      WHEN 4 THEN [{'role': 'user', 'content': 'x'},
                   {'role': 'tool', 'content': 't ' || doc_id},
                   {'role': 'assistant', 'content': 'y'}]
      WHEN 5 THEN [{'role': 'user', 'content': 'x ' || doc_id},
                   {'role': 'assistant', 'content': '   '}]
      WHEN 6 THEN [{'role': 'user', 'content': 'x'},
                   {'role': 'system', 'content': 'late ' || doc_id},
                   {'role': 'assistant', 'content': 'y'}]
      ELSE CAST([] AS STRUCT(role VARCHAR, content VARCHAR)[])
    END AS m
  FROM documents WHERE doc_id < 400),
u AS (
  SELECT conv_id, i, m[i].role AS role, m[i].content AS content,
    13 + length(m[i].role) AS prefix,
    13 + length(m[i].role) + length(m[i].content) + 10 AS rlen
  FROM t, UNNEST(range(1, len(m) + 1)) AS r(i)),
o AS (
  SELECT conv_id, i, role, content, prefix,
    COALESCE(SUM(rlen + 1) OVER (PARTITION BY conv_id ORDER BY i
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM u),
txt AS (
  SELECT conv_id,
    CASE WHEN len(m) = 0 THEN '' ELSE array_to_string(
      list_transform(m, x -> '<|im_start|>' || x.role || chr(10)
        || x.content || '<|im_end|>'), chr(10)) END AS text
  FROM t),
a AS (
  SELECT conv_id,
    CAST(ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY i) - 1
      AS BIGINT) AS span_idx,
    CAST(off + prefix AS BIGINT) AS span_start,
    CAST(off + prefix + length(content) AS BIGINT) AS span_end,
    content
  FROM o WHERE role = 'assistant'),
g AS (
  SELECT conv_id,
    CAST(SUM(span_end - span_start) AS BIGINT) AS loss_chars
  FROM a GROUP BY conv_id)
SELECT a.conv_id, span_idx, span_start, span_end,
  substr(txt.text, CAST(span_start AS INTEGER) + 1,
    CAST(span_end - span_start AS INTEGER)) AS span_text,
  substr(txt.text, CAST(span_start AS INTEGER) + 1,
    CAST(span_end - span_start AS INTEGER)) = a.content AS span_ok,
  g.loss_chars,
  CAST(length(txt.text) AS BIGINT) AS total_chars
FROM a
JOIN txt ON a.conv_id = txt.conv_id
JOIN g ON a.conv_id = g.conv_id
ORDER BY a.conv_id ASC, span_idx ASC""",
    doc="SFT LOSS-MASKING SPANS (operators/sft.py::loss_spans) — the"
    " trainer handoff after chat rendering: per conversation, the"
    " 0-based half-open char offsets of every assistant turn's"
    " CONTENT inside the ChatML-rendered text (user/system tokens"
    " are context, assistant tokens are supervised — the universal"
    " instruction-tuning convention), derived from the SAME template"
    " arithmetic as the text (post-hoc content search is wrong the"
    " moment a user turn quotes the assistant). Emitted exploded"
    " with a SELF-CHECK: span_ok proves substr(text, start, end)"
    " round-trips each assistant content byte-exactly, over the z66"
    " eight-shape fixture. Scale: ONE aggregate fold per row"
    " carrying struct(offset, spans) — linear in turns, map-only, no"
    " UDF, no shuffle. Oracle: UNNEST-with-ordinality + prefix-sum"
    " window re-deriving the offsets independently in DuckDB,"
    " hash-exact including the extracted substrings",
)
def z71_loss_spans(spark, sf_dir):
    from topn_spark.operators.sft import loss_spans

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 400
    )
    convs = docs.select(
        F.col("doc_id").alias("conv_id"),
        _z66_messages().alias("messages"),
    )
    out = loss_spans(convs)
    asst = F.filter(
        F.col("messages"), lambda x: x["role"] == F.lit("assistant")
    )
    ex = out.select(
        "conv_id",
        "text",
        "loss_chars",
        "total_chars",
        asst.alias("_asst"),
        F.posexplode("loss_spans").alias("span_idx", "_sp"),
    )
    span_text = F.col("text").substr(
        F.col("_sp.start").cast("int") + F.lit(1),
        (F.col("_sp.end") - F.col("_sp.start")).cast("int"),
    )
    return ex.select(
        "conv_id",
        F.col("span_idx").cast("bigint").alias("span_idx"),
        F.col("_sp.start").alias("span_start"),
        F.col("_sp.end").alias("span_end"),
        span_text.alias("span_text"),
        (
            span_text
            == F.element_at(
                F.col("_asst"), F.col("span_idx") + 1
            )["content"]
        ).alias("span_ok"),
        "loss_chars",
        "total_chars",
    ).orderBy("conv_id", "span_idx")


@query(
    "z72_token_loss_mask",
    r"""WITH t AS (
  SELECT doc_id AS conv_id,
    CASE doc_id % 5
      WHEN 0 THEN 'a  bb' || chr(10) || 'ccc ' || doc_id
        || '<|im_end|> dd'
      WHEN 1 THEN 'x   y z  '
      WHEN 3 THEN 'plain words here'
      WHEN 4 THEN ''
      ELSE NULL END AS text,
    CASE doc_id % 5
      WHEN 0 THEN [{'s': 0, 'e': 1},
        {'s': 6, 'e': 10 + length(CAST(doc_id AS VARCHAR))}]
      WHEN 1 THEN [{'s': 4, 'e': 5}]
      WHEN 2 THEN [{'s': 0, 'e': 2}]
      WHEN 4 THEN CAST([] AS STRUCT(s INTEGER, e INTEGER)[])
      ELSE NULL END AS spans
  FROM documents WHERE doc_id < 300),
p AS (
  SELECT conv_id, spans, regexp_split_to_array(text, '\s') AS parts
  FROM t WHERE text IS NOT NULL AND spans IS NOT NULL),
u AS (
  SELECT conv_id, spans, i, parts[i] AS part,
    COALESCE(SUM(length(parts[i]) + 1) OVER (PARTITION BY conv_id
      ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      0) AS off
  FROM p, UNNEST(range(1, len(parts) + 1)) AS r(i)),
tok AS (
  SELECT conv_id, i, part AS tokn,
    CAST(off AS BIGINT) AS ts,
    CAST(off + length(part) AS BIGINT) AS te,
    len(list_filter(spans,
      x -> off < x.e AND off + length(part) > x.s)) > 0 AS sup
  FROM u WHERE length(part) > 0),
g AS (
  SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
    CAST(SUM(CASE WHEN sup THEN 1 ELSE 0 END) AS BIGINT)
      AS n_supervised,
    string_agg(CASE WHEN sup THEN '1' ELSE '0' END, ''
      ORDER BY i) AS mask_str,
    string_agg(tokn || ':' || ts || ':' || te, '|' ORDER BY i)
      AS toks_sig
  FROM tok GROUP BY conv_id)
SELECT t.conv_id,
  CASE WHEN t.text IS NULL OR t.spans IS NULL THEN NULL
    ELSE COALESCE(g.n_tokens, 0) END AS n_tokens,
  CASE WHEN t.text IS NULL OR t.spans IS NULL THEN NULL
    ELSE COALESCE(g.n_supervised, 0) END AS n_supervised,
  CASE WHEN t.text IS NULL OR t.spans IS NULL THEN NULL
    ELSE COALESCE(g.mask_str, '') END AS mask_str,
  CASE WHEN t.text IS NULL OR t.spans IS NULL THEN NULL
    ELSE COALESCE(g.toks_sig, '') END AS toks_sig
FROM t LEFT JOIN g USING (conv_id)
ORDER BY conv_id ASC""",
    doc="TOKEN-LEVEL LOSS MASK (operators/sft.py::token_loss_mask) —"
    " char spans -> per-token supervise mask, the last SFT prep step"
    " before tokenizer handoff: whitespace tokens WITH exact char"
    " offsets (the split pattern consumes exactly one char per"
    " separator, so offsets are a running length sum; empty parts"
    " from whitespace runs advance the offset but emit no token),"
    " each token supervised iff [start,end) OVERLAPS any loss span"
    " (overlap, not containment — the template glues markup to the"
    " final content word, e.g. '42<|im_end|>', and containment would"
    " unsupervise every turn's last token). Planted five-shape"
    " fixture: glued-markup span end, multi-space+trailing runs,"
    " NULL text, NULL spans, empty text + empty spans (NULL inputs"
    " -> NULL outputs, observable). Scale: one split + one aggregate"
    " fold + transform*exists per row over projection-bound arrays —"
    " map-only, no UDF, no shuffle. Oracle: UNNEST-with-ordinality +"
    " prefix-sum window re-deriving offsets independently in DuckDB,"
    " hash-exact over token signature and mask strings",
)
def z72_token_loss_mask(spark, sf_dir):
    from topn_spark.operators.sft import token_loss_mask

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 300
    )
    d = F.col("doc_id")
    m = d % 5
    ids = d.cast("string")
    span_t = "array<struct<start:bigint,end:bigint>>"

    def sp(s, e):
        return F.struct(
            s.cast("bigint").alias("start"),
            e.cast("bigint").alias("end"),
        )

    text = (
        F.when(
            m == 0,
            F.concat(
                F.lit("a  bb\nccc "), ids, F.lit("<|im_end|> dd")
            ),
        )
        .when(m == 1, F.lit("x   y z  "))
        .when(m == 3, F.lit("plain words here"))
        .when(m == 4, F.lit(""))
    )
    spans = (
        F.when(
            m == 0,
            F.array(
                sp(F.lit(0), F.lit(1)),
                sp(F.lit(6), F.lit(10) + F.length(ids)),
            ),
        )
        .when(m == 1, F.array(sp(F.lit(4), F.lit(5))))
        .when(m == 2, F.array(sp(F.lit(0), F.lit(2))))
        .when(m == 4, F.array().cast(span_t))
    )
    base = docs.select(
        d.alias("conv_id"),
        text.alias("text"),
        spans.alias("loss_spans"),
    )
    out = token_loss_mask(base)
    toks = F.col("tokens")
    mask = F.col("loss_mask")
    return out.select(
        "conv_id",
        F.when(toks.isNotNull(), F.size(toks).cast("bigint")).alias(
            "n_tokens"
        ),
        "n_supervised",
        F.when(
            mask.isNotNull(),
            F.array_join(
                F.transform(
                    mask, lambda b: F.when(b, "1").otherwise("0")
                ),
                "",
            ),
        ).alias("mask_str"),
        F.when(
            toks.isNotNull(),
            F.array_join(
                F.transform(
                    toks,
                    lambda t: F.concat_ws(
                        ":", t["tok"], t["start"], t["end"]
                    ),
                ),
                "|",
            ),
        ).alias("toks_sig"),
    ).orderBy("conv_id")


@query(
    "z73_pack_masked",
    r"""WITH t AS (
  SELECT md5(CAST(doc_id AS VARCHAR)) AS okey,
    list_append(
      regexp_extract_all(lower(text), '[a-z0-9]+'), '</s>') AS toks,
    list_append(
      list_transform(regexp_extract_all(lower(text), '[a-z0-9]+'),
        x -> length(x) >= 4), false) AS msk
  FROM documents WHERE doc_id < 400
    AND len(regexp_extract_all(lower(text), '[a-z0-9]+')) > 0),
c AS (
  SELECT okey, toks, msk, CAST(len(toks) AS BIGINT) AS n,
    CAST(COALESCE(SUM(CAST(len(toks) AS BIGINT)) OVER (
      ORDER BY okey ROWS BETWEEN UNBOUNDED PRECEDING
      AND 1 PRECEDING), 0) AS BIGINT) AS off
  FROM t),
s AS (
  SELECT okey, toks, msk, n, off, u.seq_id AS seq_id
  FROM c, UNNEST(range(off // 32, (off + n - 1) // 32 + 1))
    AS u(seq_id)),
p AS (
  SELECT seq_id,
    GREATEST(seq_id * 32, off) - seq_id * 32 AS seq_start,
    toks[CAST(GREATEST(seq_id * 32 - off, 0) + 1 AS BIGINT)
         :CAST(GREATEST(seq_id * 32 - off, 0)
           + LEAST((seq_id + 1) * 32, off + n)
           - GREATEST(seq_id * 32, off) AS BIGINT)] AS piece,
    msk[CAST(GREATEST(seq_id * 32 - off, 0) + 1 AS BIGINT)
        :CAST(GREATEST(seq_id * 32 - off, 0)
          + LEAST((seq_id + 1) * 32, off + n)
          - GREATEST(seq_id * 32, off) AS BIGINT)] AS mpiece
  FROM s)
SELECT seq_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(len(flatten(list(piece ORDER BY seq_start))) AS BIGINT)
    AS n_tokens,
  CAST(len(list_filter(flatten(list(mpiece ORDER BY seq_start)),
    x -> x)) AS BIGINT) AS n_supervised,
  flatten(list(piece ORDER BY seq_start)) AS tokens,
  flatten(list(mpiece ORDER BY seq_start)) AS loss_mask
FROM p GROUP BY seq_id ORDER BY seq_id ASC""",
    doc="MASK-PRESERVING SEQUENCE PACKING (pipeline.py::"
    "pack_masked_sequences) — the missing SFT->shard link: packing"
    " that carries a per-token supervise mask through GPT-style"
    " concat-and-chunk, so packed shards stay trainable for"
    " instruction tuning (without it the mask from token_loss_mask"
    " dies at the packing stage and prompts would be supervised)."
    " Each document contributes zip(tokens, mask); every sequence"
    " emits aligned tokens + loss_mask + n_supervised (the trainer's"
    " per-sequence loss normalizer); the injected EOS carries the"
    " sep_supervised policy (False here); NULL/misaligned masks"
    " raise at execution with the document id. Packed in md5(doc_id)"
    " order — exercises the string-order two-level prefix sum (3-char"
    " buckets, keyless window only over bucket totals). Content-"
    "derived mask (token length >= 4) proves alignment survives"
    " splitting across sequence boundaries. Oracle: identical"
    " dual-array slice arithmetic in DuckDB, hash-exact including"
    " both full arrays",
)
def z73_pack_masked(spark, sf_dir):
    from topn_spark.operators.pipeline import pack_masked_sequences
    from topn_spark.operators.textstats import tokens

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 400)
        .select(
            F.md5(F.col("doc_id").cast("string")).alias("okey"),
            tokens("text").alias("tokens"),
        )
        .withColumn(
            "loss_mask",
            F.transform("tokens", lambda t: F.length(t) >= 4),
        )
    )
    return pack_masked_sequences(
        docs,
        id_col="okey",
        order_col="okey",
        seq_len=32,
        sep_token="</s>",
    ).orderBy("seq_id")


@query(
    "z74_unpack_masked_round_trip",
    r"""SELECT doc_id,
  regexp_extract_all(lower(text), '[a-z0-9]+') AS tokens,
  list_transform(regexp_extract_all(lower(text), '[a-z0-9]+'),
    x -> length(x) >= 4) AS loss_mask
FROM documents
WHERE doc_id < 400
  AND len(regexp_extract_all(lower(text), '[a-z0-9]+')) > 0
ORDER BY doc_id ASC""",
    doc="MASKED-packing losslessness stated AS A QUERY (pipeline.py"
    "::unpack_masked_sequences, inverse/audit of"
    " pack_masked_sequences): tokenize + derive a content mask ->"
    " pack into 32-token sequences WITH the mask and an EOS"
    " separator -> rebuild every document's (tokens, mask) pair"
    " from the packed sequences plus packed_doc_spans metadata."
    " The oracle is the ORIGINAL arrays — hash-equality proves the"
    " mask rides the full cycle bit-exactly (counts adding up is"
    " NOT enough: a swapped mask bit silently trains the wrong"
    " tokens), the property a trainable packed export rests on."
    " Plan: the unpack equi-join on seq_id + per-overlap dual"
    " slices + one per-doc hash agg — the packer's shapes run"
    " backwards; the second array adds only projection-bound"
    " slices. Production use: audit an exported SFT epoch"
    " end-to-end before training",
)
def z74_unpack_masked_round_trip(spark, sf_dir):
    from topn_spark.operators.pipeline import (
        pack_masked_sequences,
        packed_doc_spans,
        unpack_masked_sequences,
    )
    from topn_spark.operators.textstats import tokens

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 400)
        .select("doc_id", tokens("text").alias("tokens"))
        .withColumn(
            "loss_mask",
            F.transform("tokens", lambda t: F.length(t) >= 4),
        )
    )
    packed = pack_masked_sequences(docs, seq_len=32, sep_token="</s>")
    spans = packed_doc_spans(docs, seq_len=32, sep_token="</s>")
    return unpack_masked_sequences(
        packed, spans, sep_token="</s>"
    ).orderBy("doc_id")


@query(
    "z75_fim_transform",
    r"""WITH t AS (
  SELECT doc_id, text, md5(CAST(doc_id AS VARCHAR)) AS h,
    length(text) AS n
  FROM documents WHERE doc_id < 500),
c AS (
  SELECT *,
    substr(h, 1, 8) < '80000000' AND n > 0 AS fim_on,
    ((strpos('0123456789abcdef', substr(h, 17, 1)) - 1) * 16
      + strpos('0123456789abcdef', substr(h, 18, 1)) - 1) AS u1,
    ((strpos('0123456789abcdef', substr(h, 19, 1)) - 1) * 16
      + strpos('0123456789abcdef', substr(h, 20, 1)) - 1) AS u2
  FROM t),
d AS (
  SELECT *,
    LEAST((u1 * (n + 1)) // 256, (u2 * (n + 1)) // 256) AS lo,
    GREATEST((u1 * (n + 1)) // 256, (u2 * (n + 1)) // 256) AS hi
  FROM c),
e AS (
  SELECT doc_id, text, n, lo, hi,
    CASE WHEN fim_on THEN
      CASE WHEN substr(h, 9, 8) < '80000000'
        THEN 'spm' ELSE 'psm' END
    END AS fim_style,
    substr(text, 1, CAST(lo AS INTEGER)) AS p,
    substr(text, CAST(lo + 1 AS INTEGER),
      CAST(hi - lo AS INTEGER)) AS m,
    substr(text, CAST(hi + 1 AS INTEGER),
      CAST(n - hi AS INTEGER)) AS s
  FROM d)
SELECT doc_id, fim_style,
  CASE fim_style
    WHEN 'spm' THEN '<fim_prefix>' || '<fim_suffix>' || s
      || '<fim_middle>' || p || m
    WHEN 'psm' THEN '<fim_prefix>' || p || '<fim_suffix>' || s
      || '<fim_middle>' || m
    ELSE text END AS text
FROM e ORDER BY doc_id ASC""",
    doc="FILL-IN-THE-MIDDLE transformation (pipeline.py::"
    "fim_transform) — the code-model training staple (Bavarian et"
    " al. 2022, FIM-for-free): split a document's characters at two"
    " uniform cuts into (prefix, middle, suffix) and rearrange with"
    " sentinels so the model learns to infill — PSM"
    " <p>prefix<s>suffix<m>middle or the joined SPM variant;"
    " untransformed documents pass through with fim_style NULL."
    " Every decision is DETERMINISTIC from md5(doc_id): hex 1-8"
    " gates the 50% transform rate, 9-16 picks PSM/SPM, digit pairs"
    " 17-18/19-20 place the cuts at 1/256 granularity — the"
    " reproducibility df.sample + Python random cannot give."
    " Character (codepoint) arithmetic — never tears a multibyte"
    " char. Scale: ONE map-only codegen'd projection (md5 +"
    " substring slices + concat), no shuffle, no UDF. Oracle:"
    " identical hex-digit/cut arithmetic re-derived in DuckDB via"
    " strpos digit decoding, hash-exact over the rendered text",
)
def z75_fim_transform(spark, sf_dir):
    from topn_spark.operators.pipeline import fim_transform

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 500)
        .select("doc_id", "text")
    )
    return fim_transform(docs).select(
        "doc_id", "fim_style", "text"
    ).orderBy("doc_id")


@query(
    "z76_conversation_report",
    r"""WITH t AS (
  SELECT doc_id,
    CASE WHEN doc_id % 9 = 8 THEN NULL ELSE
    CASE doc_id % 8
      WHEN 0 THEN [{'role': 'system', 'content': 'sys ' || doc_id},
                   {'role': 'user', 'content': 'hi ' || doc_id},
                   {'role': 'assistant', 'content': 'hello ' || doc_id}]
      WHEN 1 THEN [{'role': 'user', 'content': 'q1 ' || doc_id},
                   {'role': 'assistant', 'content': 'a1'},
                   {'role': 'user', 'content': 'q2'},
                   {'role': 'assistant', 'content': 'a2 ' || doc_id}]
      WHEN 2 THEN [{'role': 'user', 'content': 'x'},
                   {'role': 'user', 'content': 'y ' || doc_id},
                   {'role': 'assistant', 'content': 'z'}]
      WHEN 3 THEN [{'role': 'user', 'content': 'x ' || doc_id},
                   {'role': 'assistant', 'content': 'y'},
                   {'role': 'user', 'content': 'tail'}]
      WHEN 4 THEN [{'role': 'user', 'content': 'x'},
                   {'role': 'tool', 'content': 't ' || doc_id},
                   {'role': 'assistant', 'content': 'y'}]
      WHEN 5 THEN [{'role': 'user', 'content': 'x ' || doc_id},
                   {'role': 'assistant', 'content': '   '}]
      WHEN 6 THEN [{'role': 'user', 'content': 'x'},
                   {'role': 'system', 'content': 'late ' || doc_id},
                   {'role': 'assistant', 'content': 'y'}]
      ELSE CAST([] AS STRUCT(role VARCHAR, content VARCHAR)[])
    END END AS m
  FROM documents WHERE doc_id < 450),
r AS (
  SELECT doc_id,
    CASE WHEN m IS NULL THEN 1 ELSE 0 END AS is_null,
    CASE WHEN m IS NULL THEN NULL
      ELSE CAST(len(m) AS BIGINT) END AS nt,
    CASE WHEN m IS NULL THEN NULL ELSE CAST(len(list_filter(m,
      x -> x.role = 'user')) AS BIGINT) END AS nu,
    CASE WHEN m IS NULL THEN NULL ELSE CAST(len(list_filter(m,
      x -> x.role = 'assistant')) AS BIGINT) END AS na,
    CASE WHEN m IS NULL THEN NULL ELSE CAST(len(list_filter(m,
      x -> x.role = 'system')) AS BIGINT) END AS ns,
    CASE WHEN m IS NULL THEN NULL ELSE CAST(COALESCE(
      list_sum(list_transform(list_filter(m,
        x -> x.role = 'assistant'), x -> length(x.content))), 0)
      AS BIGINT) END AS ac,
    CASE WHEN m IS NULL THEN NULL ELSE CAST(COALESCE(
      list_sum(list_transform(m, x -> length(x.content))), 0)
      AS BIGINT) END AS tc
  FROM t)
SELECT CAST(COUNT(*) AS BIGINT) AS n_conversations,
  CAST(SUM(is_null) AS BIGINT) AS n_null,
  CAST(SUM(CASE WHEN nt = 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_empty,
  CAST(SUM(nt) AS BIGINT) AS n_turns,
  CAST(SUM(nu) AS BIGINT) AS n_user_turns,
  CAST(SUM(na) AS BIGINT) AS n_assistant_turns,
  CAST(SUM(ns) AS BIGINT) AS n_system_turns,
  CAST(SUM(nt) - SUM(nu) - SUM(na) - SUM(ns) AS BIGINT)
    AS n_other_turns,
  CAST(MAX(nt) AS BIGINT) AS max_turns,
  ROUND(CAST(SUM(nt) AS DOUBLE) / COUNT(nt), 6) AS mean_turns,
  CAST(SUM(ac) AS BIGINT) AS assistant_chars,
  CAST(SUM(tc) AS BIGINT) AS total_chars,
  ROUND(CAST(SUM(ac) AS DOUBLE) / SUM(tc), 6)
    AS assistant_char_ratio
FROM r""",
    doc="SFT CORPUS DATA CARD (operators/sft.py::"
    "conversation_report) — the release-note aggregate for a"
    " conversation corpus, sibling of corpus_report (z41) for the"
    " document corpus: ONE row of corpus structure — conversation"
    " counts (total/NULL/empty), turn totals and per-role splits"
    " (user/assistant/system/other — 'other' catches unexpected"
    " roles like the planted 'tool' turns, observable not folded),"
    " max/mean turns, character totals, and assistant_char_ratio"
    " (the fraction of corpus characters a trainer supervises — the"
    " number that catches one-line answers under walls of context)."
    " Fixture: the eight z66 structural shapes plus a NULL-messages"
    " branch. Scale: per-row projection-bound size/filter/fold"
    " signals (map-only) into ONE map-side-combinable global hash"
    " agg — shuffle carries one partial row per task; output is"
    " scalar-sized. Oracle: identical list algebra + the ROUND-6"
    " single-division trick in DuckDB, hash-exact",
)
def z76_conversation_report(spark, sf_dir):
    from topn_spark.operators.sft import conversation_report

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 450
    )
    d = F.col("doc_id")
    msg_t = "array<struct<role:string,content:string>>"
    convs = docs.select(
        F.when(d % 9 == 8, F.lit(None).cast(msg_t))
        .otherwise(_z66_messages())
        .alias("messages")
    )
    return conversation_report(convs)


@query(
    "z77_packing_report",
    r"""WITH t AS (
  SELECT md5(CAST(doc_id AS VARCHAR)) AS okey,
    list_append(
      regexp_extract_all(lower(text), '[a-z0-9]+'), '</s>') AS toks,
    list_append(
      list_transform(regexp_extract_all(lower(text), '[a-z0-9]+'),
        x -> length(x) >= 4), false) AS msk
  FROM documents WHERE doc_id < 400
    AND len(regexp_extract_all(lower(text), '[a-z0-9]+')) > 0),
c AS (
  SELECT okey, toks, msk, CAST(len(toks) AS BIGINT) AS n,
    CAST(COALESCE(SUM(CAST(len(toks) AS BIGINT)) OVER (
      ORDER BY okey ROWS BETWEEN UNBOUNDED PRECEDING
      AND 1 PRECEDING), 0) AS BIGINT) AS off
  FROM t),
s AS (
  SELECT okey, msk, n, off, u.seq_id AS seq_id
  FROM c, UNNEST(range(off // 32, (off + n - 1) // 32 + 1))
    AS u(seq_id)),
p AS (
  SELECT seq_id,
    msk[CAST(GREATEST(seq_id * 32 - off, 0) + 1 AS BIGINT)
        :CAST(GREATEST(seq_id * 32 - off, 0)
          + LEAST((seq_id + 1) * 32, off + n)
          - GREATEST(seq_id * 32, off) AS BIGINT)] AS mpiece
  FROM s),
q AS (
  SELECT seq_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(len(flatten(list(mpiece))) AS BIGINT) AS n_tokens,
    CAST(len(list_filter(flatten(list(mpiece)), x -> x))
      AS BIGINT) AS n_supervised
  FROM p GROUP BY seq_id)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sequences,
  CAST(SUM(n_docs) AS BIGINT) AS n_doc_slices,
  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
  CAST(SUM(CASE WHEN n_tokens = 32 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_full_sequences,
  ROUND(CAST(SUM(n_tokens) AS DOUBLE) / (COUNT(*) * 32), 6)
    AS fill_ratio,
  CAST(MAX(n_docs) AS BIGINT) AS max_docs_per_seq,
  ROUND(CAST(SUM(n_docs) AS DOUBLE) / COUNT(*), 6)
    AS mean_docs_per_seq,
  CAST(SUM(n_supervised) AS BIGINT) AS n_supervised,
  ROUND(CAST(SUM(n_supervised) AS DOUBLE) / SUM(n_tokens), 6)
    AS supervised_ratio
FROM q""",
    doc="PACKING-EFFICIENCY DATA CARD (pipeline.py::packing_report)"
    " — the one-row audit a trainer reads before an epoch, over the"
    " z73 masked pack: sequence/doc-slice counts, token totals,"
    " fill_ratio (real tokens / n_sequences*seq_len — padding waste"
    " shows up here), full-sequence count, docs-per-sequence"
    " extremes and mean (document fragmentation), n_supervised and"
    " supervised_ratio (the loss-bearing fraction — catches an SFT"
    " export whose masks died upstream). Scale: ONE map-side-"
    "combinable hash agg over the pack's METADATA columns — the"
    " token arrays are never opened (column pruning drops them);"
    " scalar-sized output. Oracle: re-derives the z73 pack"
    " arithmetic in DuckDB then the identical aggregate, ROUND-6"
    " single divisions, hash-exact",
)
def z77_packing_report(spark, sf_dir):
    from topn_spark.operators.pipeline import (
        pack_masked_sequences,
        packing_report,
    )
    from topn_spark.operators.textstats import tokens

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 400)
        .select(
            F.md5(F.col("doc_id").cast("string")).alias("okey"),
            tokens("text").alias("tokens"),
        )
        .withColumn(
            "loss_mask",
            F.transform("tokens", lambda t: F.length(t) >= 4),
        )
    )
    packed = pack_masked_sequences(
        docs, id_col="okey", order_col="okey", seq_len=32,
        sep_token="</s>",
    )
    return packing_report(packed, seq_len=32, mask_col="loss_mask")


@query(
    "z78_token_windows",
    r"""WITH t AS (
  SELECT doc_id,
    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
  FROM documents WHERE doc_id < 400),
c AS (
  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n
  FROM t WHERE len(toks) > 0),
w AS (
  SELECT doc_id, toks, n,
    CAST(1 + GREATEST(0, (n - 16 + 8 - 1) // 8) AS BIGINT)
      AS n_wins
  FROM c),
e AS (
  SELECT doc_id, toks, n, u.i AS win_idx
  FROM w, UNNEST(range(0, n_wins)) AS u(i))
SELECT doc_id, CAST(win_idx AS BIGINT) AS win_idx,
  CAST(win_idx * 8 AS BIGINT) AS win_start,
  CAST(len(toks[CAST(win_idx * 8 + 1 AS BIGINT)
    :CAST(LEAST(win_idx * 8 + 16, n) AS BIGINT)]) AS BIGINT)
    AS n_tokens,
  toks[CAST(win_idx * 8 + 1 AS BIGINT)
    :CAST(LEAST(win_idx * 8 + 16, n) AS BIGINT)] AS tokens
FROM e ORDER BY doc_id ASC, win_idx ASC""",
    doc="TOKEN-LEVEL SLIDING WINDOWS (pipeline.py::token_windows) —"
    " long-document handling BEFORE packing when documents exceed"
    " the context length (the published MLM/CLM chunking recipe:"
    " overlapping windows, stride < window, so boundary regions get"
    " two views and no token loses all left context): one row per"
    " window at starts 0, stride, 2*stride, …; len <= window yields"
    " exactly one whole window; the final window is the clipped"
    " tail, always > window - stride tokens (no sliver rows)."
    " Window 16 / stride 8 over the tokenized documents. Contrast"
    " chunk_documents (char windows, retrieval prep) and packing"
    " (concatenates ACROSS docs). Scale: one guarded"
    " explode(sequence) + projection-bound slices — map-only, no"
    " shuffle, no UDF; rows ~ tokens/stride. Oracle:"
    " UNNEST(range(n_wins)) + identical floor/clip arithmetic in"
    " DuckDB, hash-exact including the full window arrays",
)
def z78_token_windows(spark, sf_dir):
    from topn_spark.operators.pipeline import token_windows
    from topn_spark.operators.textstats import tokens

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 400)
        .select("doc_id", tokens("text").alias("tokens"))
    )
    return token_windows(docs, window=16, stride=8).orderBy(
        "doc_id", "win_idx"
    )


@query(
    "z79_dedup_conversations",
    r"""WITH t AS (
  SELECT doc_id AS conv_id,
    CASE
      WHEN doc_id % 4 = 2 OR doc_id % 4 = 3 THEN NULL
      ELSE md5(trim(regexp_replace(lower(
        CASE WHEN doc_id % 2 = 0
          THEN 'ASK   ' || CAST(doc_id % 50 AS VARCHAR) || '  pls'
          ELSE 'ask ' || CAST(doc_id % 50 AS VARCHAR) || ' pls'
        END), '\s+', ' ', 'g')))
    END AS prompt_digest
  FROM documents WHERE doc_id < 400),
w AS (
  SELECT prompt_digest, MIN(conv_id) AS keep_id
  FROM t WHERE prompt_digest IS NOT NULL
  GROUP BY prompt_digest)
SELECT conv_id, prompt_digest FROM t
WHERE prompt_digest IS NULL
   OR EXISTS (SELECT 1 FROM w
      WHERE w.prompt_digest = t.prompt_digest
        AND w.keep_id = t.conv_id)
ORDER BY conv_id ASC""",
    doc="PROMPT-LEVEL CONVERSATION DEDUP (operators/sft.py::"
    "dedup_conversations) — the standard instruct-set cleanup"
    " (Alpaca-style: generated conversations share prompts, and"
    " keeping several trains one input against conflicting"
    " targets): conversations keyed by md5 of the FIRST user turn's"
    " NORMALIZED content (lower + whitespace-collapse + trim, so"
    " the planted 'ASK   7  pls'/'ask 7 pls' variants collide); one"
    " survivor per key — the smallest id, deterministic."
    " Conversations with no user turn or NULL messages have no"
    " prompt to compare and always survive (keyless, digest NULL,"
    " observable). Fixture: 400 conversations over 50 planted"
    " prompts in two formatting variants + keyless/NULL shapes."
    " Scale: one map-only digest projection, one map-side-"
    "combinable min(id) agg per digest, one semi-join back — the"
    " exact-dedup shape, never all-pairs; a viral prompt is one hot"
    " agg key absorbed by partial aggregation. Oracle: identical"
    " normalization + window-free MIN/EXISTS in DuckDB, hash-exact",
)
def z79_dedup_conversations(spark, sf_dir):
    from topn_spark.operators.sft import dedup_conversations

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 400
    )
    d = F.col("doc_id")
    ds = d.cast("string")
    pid = (d % 50).cast("string")
    msg_t = "array<struct<role:string,content:string>>"

    def msg(role, content):
        return F.struct(
            F.lit(role).alias("role"), content.alias("content")
        )

    prompt = F.when(
        d % 2 == 0,
        F.concat(F.lit("ASK   "), pid, F.lit("  pls")),
    ).otherwise(F.concat(F.lit("ask "), pid, F.lit(" pls")))
    msgs = (
        F.when(d % 4 == 2, F.lit(None).cast(msg_t))
        .when(
            d % 4 == 3,
            F.array(msg("assistant", F.concat(F.lit("solo "), ds))),
        )
        .otherwise(
            F.array(
                msg("user", prompt),
                msg("assistant", F.concat(F.lit("resp "), ds)),
            )
        )
    )
    convs = docs.select(d.alias("conv_id"), msgs.alias("messages"))
    return (
        dedup_conversations(convs)
        .select("conv_id", "prompt_digest")
        .orderBy("conv_id")
    )


@query(
    "z80_ngram_diversity",
    r"""WITH t AS (
  SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
  FROM documents WHERE doc_id < 500),
g AS (
  SELECT nn.n AS n, u.g AS gram
  FROM t, (SELECT UNNEST([1, 2, 3]) AS n) nn,
  UNNEST(CASE WHEN len(toks) >= nn.n
    THEN list_transform(range(1, len(toks) - nn.n + 2),
      i -> array_to_string(toks[i:i + nn.n - 1], ' '))
    ELSE [] END) AS u(g))
SELECT CAST(n AS BIGINT) AS n,
  CAST(COUNT(*) AS BIGINT) AS total_ngrams,
  CAST(COUNT(DISTINCT md5(gram)) AS BIGINT) AS distinct_ngrams,
  ROUND(CAST(COUNT(DISTINCT md5(gram)) AS DOUBLE) / COUNT(*), 6)
    AS distinct_ratio
FROM g GROUP BY n ORDER BY n ASC""",
    doc="LEXICAL-DIVERSITY REPORT (textstats.py::ngram_diversity) —"
    " the corpus repetitiveness release metric: per n in {1,2,3},"
    " total n-gram instances, DISTINCT n-grams, and distinct_ratio"
    " — a low ratio at n=2/3 is the 'templated corpus' signal that"
    " survives per-document filters (the corpus-level dual of the"
    " Gopher repetition rules; this synthetic corpus's ~31-word"
    " vocabulary makes the ratios tiny, which is exactly what the"
    " metric should say about it). Scale: tokens bound ONCE per doc,"
    " all n built from the same projection, ONE explode into ONE"
    " hash agg keyed by n; grams md5 to 16-byte digests before the"
    " exact-distinct shuffle (the only data-sized term — swap the"
    " z42 HLL path for approximate at extreme scale). Oracle:"
    " UNNEST cross join over n + identical gram construction in"
    " DuckDB, hash-exact",
)
def z80_ngram_diversity(spark, sf_dir):
    from topn_spark.operators.textstats import ngram_diversity

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 500
    )
    return ngram_diversity(docs)


#: z81 planted merge table (byte mode: symbols are latin-1-rendered
#: UTF-8 bytes; the ("\xc3", "\xb6") pair merges the two bytes of
#: 'ö' — a REAL byte merge a char-mode walk never sees).
_Z81_MERGES = [
    ("l", "l"), ("h", "e"), ("he", "ll"), ("a", "b"), ("b", "a"),
    ("\xc3", "\xb6"), ("w", "\xc3\xb6"), ("ab", "ba"),
]


def _z81_fixture(d: int):
    m3 = d % 3
    if m3 == 0:
        return (
            ["hello", "wörld", f"{d % 10}<|im_end|>"],
            [False, True, True],
        )
    if m3 == 1:
        return (["ab", "ba", "abba"], [True, False, True])
    return (["x"], None)


def _z81_bpe_mask_mirror(con):
    """z81 mirror: an INDEPENDENT pure-Python byte-BPE walk over the
    planted (tokens, mask) fixture — lowest rank wins, leftmost on
    ties, each subtoken inherits its whitespace unit's bit."""
    ranks = {m: i for i, m in enumerate(_Z81_MERGES)}

    def enc(word):
        parts = list(word)
        while len(parts) > 1:
            cands = [
                (ranks[(parts[i], parts[i + 1])], i)
                for i in range(len(parts) - 1)
                if (parts[i], parts[i + 1]) in ranks
            ]
            if not cands:
                break
            _, i = min(cands)
            parts[i : i + 2] = [parts[i] + parts[i + 1]]
        return parts

    ids = [
        r[0]
        for r in con.execute(
            "SELECT doc_id FROM documents WHERE doc_id < 300"
        ).fetchall()
    ]
    rows = []
    for d in ids:
        toks, bits = _z81_fixture(d)
        if bits is None:
            rows.append((d, None, None, None, None))
            continue
        subs, sm = [], []
        for w, b in zip(toks, bits):
            for s in enc(w.encode("utf-8").decode("latin-1")):
                subs.append(s)
                sm.append(b)
        rows.append(
            (
                d,
                len(subs),
                sum(sm),
                "|".join(subs),
                "".join("1" if x else "0" for x in sm),
            )
        )
    return (
        ["conv_id", "n_bpe_tokens", "n_supervised", "toks_sig",
         "mask_str"],
        rows,
    )


@query(
    "z81_bpe_loss_mask",
    None,
    doc="BPE-ALIGNED LOSS MASK (operators/sft.py::bpe_loss_mask) —"
    " the last alignment step before packing when the trainer"
    " consumes trained-tokenizer ids: each whitespace token from"
    " token_loss_mask is one pre-token unit, encoded with the SAME"
    " merge walk as the corpus tokenizer (textstats.bpe_encode_word"
    " — shared code with apply_bpe, so SFT and pretraining token"
    " counts reconcile), every subtoken inheriting its unit's"
    " supervise bit. Byte mode: UTF-8 bytes rendered latin-1"
    " JVM-side; the planted ('\\xc3','\\xb6') merge fuses the two"
    " bytes of 'o-umlaut' — a real byte merge. NULL-mask rows yield"
    " NULL outputs (observable). Scale: one Arrow mapInPandas pass,"
    " merge table as closure — map-only; no SQL merge walk exists,"
    " hence the UDF tier. Oracle: INDEPENDENT pure-Python byte-BPE"
    " mirror over the same fixture, exact (tolerance 0)",
    tol_oracle=_z81_bpe_mask_mirror,
    tolerance=0.0,
    tol_keys=("conv_id",),
)
def z81_bpe_loss_mask(spark, sf_dir):
    from topn_spark.operators.sft import bpe_loss_mask

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 300
    )
    d = F.col("doc_id")
    m3 = d % 3
    tok_t = "array<string>"
    msk_t = "array<boolean>"
    tokens = (
        F.when(
            m3 == 0,
            F.array(
                F.lit("hello"),
                F.lit("wörld"),
                F.concat((d % 10).cast("string"), F.lit("<|im_end|>")),
            ),
        )
        .when(m3 == 1, F.array(F.lit("ab"), F.lit("ba"), F.lit("abba")))
        .otherwise(F.array(F.lit("x")))
        .cast(tok_t)
    )
    mask = (
        F.when(
            m3 == 0,
            F.array(F.lit(False), F.lit(True), F.lit(True)),
        )
        .when(
            m3 == 1,
            F.array(F.lit(True), F.lit(False), F.lit(True)),
        )
        .cast(msk_t)
    )
    base = docs.select(
        d.alias("conv_id"),
        tokens.alias("tokens"),
        mask.alias("loss_mask"),
    )
    out = bpe_loss_mask(base, _Z81_MERGES)
    toks, msk = F.col("tokens"), F.col("loss_mask")
    return out.select(
        "conv_id",
        "n_bpe_tokens",
        "n_supervised",
        F.when(toks.isNotNull(), F.array_join(toks, "|")).alias(
            "toks_sig"
        ),
        F.when(
            msk.isNotNull(),
            F.array_join(
                F.transform(
                    msk, lambda b: F.when(b, "1").otherwise("0")
                ),
                "",
            ),
        ).alias("mask_str"),
    ).orderBy("conv_id")


@query(
    "z82_corpus_diff",
    r"""WITH docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 500),
vold AS (
  SELECT doc_id,
    CASE WHEN doc_id % 11 = 3 THEN NULL ELSE text END AS text
  FROM docs WHERE doc_id < 450),
vnew AS (
  SELECT doc_id,
    CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
  FROM docs WHERE doc_id < 450 AND doc_id % 7 != 0
  UNION ALL
  SELECT doc_id, text FROM docs WHERE doc_id >= 450),
o AS (SELECT doc_id, COALESCE(md5(text), 'NULL') AS old_digest
      FROM vold),
n AS (SELECT doc_id, COALESCE(md5(text), 'NULL') AS new_digest
      FROM vnew),
j AS (
  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
    old_digest, new_digest
  FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
SELECT doc_id,
  CASE WHEN old_digest IS NULL THEN 'added'
       WHEN new_digest IS NULL THEN 'removed'
       WHEN old_digest = new_digest THEN 'unchanged'
       ELSE 'changed' END AS status,
  old_digest, new_digest
FROM j ORDER BY doc_id ASC""",
    doc="CORPUS SNAPSHOT DIFF (pipeline.py::corpus_diff) — the"
    " release-engineering audit between two dataset versions (the"
    " 'N added, M removed, K edited' release-note line, and the"
    " first question after a pipeline change): full outer join on"
    " id, per-document status added/removed/changed/unchanged from"
    " NULL-SENTINEL md5 digests (md5(NULL) is NULL, which would"
    " make 'present with NULL text' indistinguishable from 'absent'"
    " — the sentinel keeps digest nullness = presence, and the"
    " planted NULL-text rows prove NULL->text counts as changed,"
    " not re-added). Planted v2: every 7th doc removed, every 5th"
    " edited, 50 new ids appended. Scale: two map-only digest"
    " projections + ONE outer shuffle join on the id carrying only"
    " 16-byte digests (text never crosses the shuffle). Oracle:"
    " identical sentinel/join/CASE in DuckDB, hash-exact",
)
def z82_corpus_diff(spark, sf_dir):
    from topn_spark.operators.pipeline import corpus_diff

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 500
    ).select("doc_id", "text")
    d = F.col("doc_id")
    vold = docs.where(d < 450).select(
        "doc_id",
        F.when(d % 11 == 3, F.lit(None).cast("string"))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    vnew = (
        docs.where((d < 450) & (d % 7 != 0))
        .select(
            "doc_id",
            F.when(d % 5 == 0, F.concat(F.col("text"), F.lit(" v2")))
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(docs.where(d >= 450))
    )
    return corpus_diff(vold, vnew).orderBy("doc_id")


#: z83 planted benchmark quote (11 words — every 8-gram window of a
#: quoting assistant turn collides).
_Z83_QUOTE = (
    "the quick brown fox jumps over the lazy dog near the river"
)


@query(
    "z83_sft_decontaminate",
    r"""WITH conv AS (
  SELECT doc_id AS conv_id,
    CASE doc_id % 2
      WHEN 0 THEN [
        {'role': 'user', 'content': 'tell me a classic line'},
        {'role': 'assistant', 'content':
          'sure here it is """ + _Z83_QUOTE + r""" nr ' || doc_id}]
      ELSE [
        {'role': 'user', 'content': 'say something original'},
        {'role': 'assistant', 'content':
          'an entirely novel reply with plenty of ordinary words'
          || ' nr ' || doc_id}]
    END AS m
  FROM documents WHERE doc_id < 400),
rendered AS (
  SELECT conv_id, array_to_string(
    list_transform(m, x -> '<|im_start|>' || x.role || chr(10)
      || x.content || '<|im_end|>'), chr(10)) AS text
  FROM conv),
ev AS (
  SELECT 'benchmark item: """ + _Z83_QUOTE + r"""' AS text),
eg AS (
  SELECT DISTINCT u.g FROM (
    SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
    FROM ev) s,
  UNNEST(CASE WHEN len(toks) >= 8
    THEN list_transform(range(1, len(toks) - 6),
      i -> array_to_string(toks[i:i+7], ' '))
    ELSE [] END) AS u(g)),
tg AS (
  SELECT conv_id, u.g FROM (
    SELECT conv_id,
      regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
    FROM rendered) s,
  UNNEST(CASE WHEN len(toks) >= 8
    THEN list_transform(range(1, len(toks) - 6),
      i -> array_to_string(toks[i:i+7], ' '))
    ELSE [] END) AS u(g)),
hits AS (
  SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_contam_grams
  FROM tg JOIN eg USING (g) GROUP BY conv_id)
SELECT r.conv_id,
  CAST(COALESCE(h.n_contam_grams, 0) AS BIGINT) AS n_contam_grams,
  COALESCE(h.n_contam_grams, 0) >= 1 AS contaminated
FROM rendered r LEFT JOIN hits h ON r.conv_id = h.conv_id
ORDER BY r.conv_id ASC""",
    doc="SFT BENCHMARK DECONTAMINATION — the conversation-modality"
    " composition of the GPT-3 n-gram gate (sft.render_chat ->"
    " dedup.ngram_decontaminate): an SFT set leaks eval benchmarks"
    " through ASSISTANT turns (a model trained on them parrots the"
    " benchmark), so the gate runs over the RENDERED text — the"
    " same surface the trainer sees, markup tokens and all — with"
    " 8-grams (the LLaMA-class SFT setting; 13 is the pretraining"
    " default). Planted: every even conversation quotes an 11-word"
    " benchmark line inside its assistant turn; odd ones are clean."
    " Scale: render is map-only; the gate is the z58 shape — eval"
    " reduces to a broadcast DISTINCT gram set, ONE train explode."
    " Oracle: ChatML render re-derived in DuckDB list ops + the"
    " z58 gram SQL at n=8, hash-exact",
)
def z83_sft_decontaminate(spark, sf_dir):
    from topn_spark.operators.dedup import ngram_decontaminate
    from topn_spark.operators.sft import render_chat

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 400
    )
    d = F.col("doc_id")
    ds = d.cast("string")

    def msg(role, content):
        return F.struct(
            F.lit(role).alias("role"), content.alias("content")
        )

    msgs = F.when(
        d % 2 == 0,
        F.array(
            msg("user", F.lit("tell me a classic line")),
            msg(
                "assistant",
                F.concat(
                    F.lit("sure here it is " + _Z83_QUOTE + " nr "),
                    ds,
                ),
            ),
        ),
    ).otherwise(
        F.array(
            msg("user", F.lit("say something original")),
            msg(
                "assistant",
                F.concat(
                    F.lit(
                        "an entirely novel reply with plenty of"
                        " ordinary words nr "
                    ),
                    ds,
                ),
            ),
        )
    )
    convs = docs.select(d.alias("conv_id"), msgs.alias("messages"))
    rendered = render_chat(convs).select("conv_id", "text")
    ev = convs.sparkSession.createDataFrame(
        [(1, "benchmark item: " + _Z83_QUOTE)],
        "qid long, text string",
    )
    return (
        ngram_decontaminate(
            rendered, ev, n=8, id_col="conv_id"
        )
        .select("conv_id", "n_contam_grams", "contaminated")
        .orderBy("conv_id")
    )


@query(
    "z84_multimodal_chat",
    r"""WITH t AS (
  SELECT doc_id AS conv_id,
    CASE doc_id % 4
      WHEN 0 THEN [
        {'role': 'user', 'content': 'plain q ' || doc_id,
         'asset_id': CAST(NULL AS BIGINT)},
        {'role': 'assistant', 'content': 'plain a',
         'asset_id': CAST(NULL AS BIGINT)}]
      WHEN 1 THEN [
        {'role': 'user', 'content': CAST(NULL AS VARCHAR),
         'asset_id': CAST(doc_id % 500 AS BIGINT)},
        {'role': 'user', 'content': 'what is this',
         'asset_id': CAST(NULL AS BIGINT)},
        {'role': 'assistant', 'content': 'an image ' || doc_id,
         'asset_id': CAST(NULL AS BIGINT)}]
      WHEN 2 THEN [
        {'role': 'user', 'content': 'caption: cat ' || doc_id,
         'asset_id': CAST(doc_id % 250 AS BIGINT)},
        {'role': 'assistant', 'content': 'nice cat',
         'asset_id': CAST(NULL AS BIGINT)}]
      ELSE [
        {'role': 'user', 'content': CAST(NULL AS VARCHAR),
         'asset_id': CAST(doc_id + 1000000 AS BIGINT)},
        {'role': 'assistant', 'content': 'dangling ' || doc_id,
         'asset_id': CAST(NULL AS BIGINT)}]
    END AS m
  FROM documents WHERE doc_id < 400),
r AS (
  SELECT conv_id,
    array_to_string(list_transform(m,
      x -> '<|im_start|>' || x.role || chr(10)
        || COALESCE(x.content,
             CASE WHEN x.asset_id IS NOT NULL
               THEN '<|image|>' END)
        || '<|im_end|>'), chr(10)) AS text,
    list_filter(list_transform(m, x -> x.asset_id),
      a -> a IS NOT NULL) AS asset_ids
  FROM t),
reg AS (SELECT DISTINCT vec_id FROM embeddings),
miss AS (
  SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_missing
  FROM (SELECT conv_id, u.a FROM r, UNNEST(asset_ids) AS u(a)) e
  WHERE NOT EXISTS (SELECT 1 FROM reg WHERE reg.vec_id = e.a)
  GROUP BY conv_id)
SELECT r.conv_id, r.text,
  CAST(len(r.asset_ids) AS BIGINT) AS n_images,
  CASE WHEN len(r.asset_ids) = 0 THEN ''
    ELSE array_to_string(list_transform(r.asset_ids,
      a -> CAST(a AS VARCHAR)), ',') END AS assets_sig,
  CAST(COALESCE(m.n_missing, 0) AS BIGINT) AS n_missing,
  COALESCE(m.n_missing, 0) = 0 AS assets_ok
FROM r LEFT JOIN miss m ON r.conv_id = m.conv_id
ORDER BY r.conv_id ASC""",
    doc="INTERLEAVED MULTIMODAL CONVERSATIONS (operators/sft.py::"
    "render_multimodal_chat + validate_conversation_assets) — the"
    " VLM-SFT modality (LLaVA-class): a turn is text OR an image"
    " reference (asset_id with NULL content); rendering emits the"
    " fixed <|image|> placeholder (trainers reserve one token id"
    " and splice vision embeddings at its positions) plus the"
    " ALIGNED asset_ids sidecar in placeholder order, and the"
    " referential-integrity gate counts DANGLING references against"
    " the asset registry (a dangling id trains a placeholder"
    " against nothing, silently, without this). Fixture: text-only,"
    " image-turn, caption-style (text AND asset), and dangling-"
    "reference shapes against the embeddings table as the registry."
    " Scale: render is map-only Catalyst; the gate explodes image"
    " REFERENCES (not tokens) into one anti-join against the"
    " registry key + count re-agg — the decontamination shape."
    " Oracle: identical list algebra + NOT EXISTS anti-join in"
    " DuckDB, hash-exact including the rendered text",
)
def z84_multimodal_chat(spark, sf_dir):
    from topn_spark.operators.sft import (
        render_multimodal_chat,
        validate_conversation_assets,
    )

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 400
    )
    emb = load_table(spark, sf_dir, "embeddings")
    d = F.col("doc_id")
    ds = d.cast("string")

    def msg(role, content, asset):
        return F.struct(
            F.lit(role).alias("role"),
            content.alias("content"),
            asset.cast("bigint").alias("asset_id"),
        )

    snull = F.lit(None).cast("string")
    anull = F.lit(None).cast("bigint")
    m4 = d % 4
    msgs = (
        F.when(m4 == 0, F.array(
            msg("user", F.concat(F.lit("plain q "), ds), anull),
            msg("assistant", F.lit("plain a"), anull),
        ))
        .when(m4 == 1, F.array(
            msg("user", snull, d % 500),
            msg("user", F.lit("what is this"), anull),
            msg(
                "assistant",
                F.concat(F.lit("an image "), ds),
                anull,
            ),
        ))
        .when(m4 == 2, F.array(
            msg(
                "user",
                F.concat(F.lit("caption: cat "), ds),
                d % 250,
            ),
            msg("assistant", F.lit("nice cat"), anull),
        ))
        .otherwise(F.array(
            msg("user", snull, d + 1000000),
            msg(
                "assistant",
                F.concat(F.lit("dangling "), ds),
                anull,
            ),
        ))
    )
    convs = docs.select(d.alias("conv_id"), msgs.alias("messages"))
    rendered = render_multimodal_chat(convs)
    gated = validate_conversation_assets(rendered, emb, asset_key="vec_id")
    return gated.select(
        "conv_id",
        "text",
        "n_images",
        F.array_join(
            F.transform(
                F.col("asset_ids"), lambda a: a.cast("string")
            ),
            ",",
        ).alias("assets_sig"),
        "n_missing",
        "assets_ok",
    ).orderBy("conv_id")


@query(
    "z85_preference_margin_report",
    r"""WITH s AS (
  SELECT (doc_id // 6) AS prompt_id,
    CASE
      WHEN (doc_id // 6) % 11 = 10 THEN NULL
      WHEN (doc_id // 6) % 7 = 6 AND doc_id % 6 > 0 THEN NULL
      WHEN (doc_id // 6) % 5 = 4 THEN CAST(9 AS DOUBLE)
      ELSE CAST((doc_id * 37) % 23 AS DOUBLE) END AS score
  FROM documents WHERE doc_id < 480),
per AS (
  SELECT prompt_id,
    CAST(COUNT(score) AS BIGINT) AS n_valid,
    MAX(score) - MIN(score) AS gap
  FROM s GROUP BY prompt_id),
tagged AS (
  SELECT n_valid, gap,
    CASE WHEN n_valid = 0 THEN 'no_valid'
         WHEN n_valid = 1 THEN 'single'
         WHEN gap = 0 THEN 'tied'
         ELSE 'paired' END AS cls
  FROM per)
SELECT CAST(COUNT(*) AS BIGINT) AS n_prompts,
  CAST(SUM(CASE WHEN cls = 'no_valid' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_no_valid,
  CAST(SUM(CASE WHEN cls = 'single' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_single,
  CAST(SUM(CASE WHEN cls = 'tied' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_tied,
  CAST(SUM(CASE WHEN cls = 'paired' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_paired,
  ROUND(SUM(CASE WHEN cls = 'paired' THEN gap END)
    / SUM(CASE WHEN cls = 'paired' THEN 1 END), 6) AS mean_gap,
  MIN(CASE WHEN cls = 'paired' THEN gap END) AS min_gap,
  MAX(CASE WHEN cls = 'paired' THEN gap END) AS max_gap
FROM tagged""",
    doc="PREFERENCE-DATA MARGIN REPORT (operators/sft.py::"
    "preference_margin_report) — the DPO release card that goes"
    " WITH preference_pairs (z70): that operator silently drops"
    " tied/singleton/unscorable prompts by design; this makes the"
    " drop classes and the margin distribution the implicit-reward"
    " gap depends on observable — n_prompts, n_no_valid, n_single,"
    " n_tied, n_paired, mean/min/max paired gap. Planted: 80"
    " prompts of 6 samples with all-NULL, one-valid, forced-tie,"
    " and integer-scored shapes (integer scores keep the gap sum"
    " exact in IEEE — the ROUND-6 single-division trick needs it)."
    " Scale: one map-side-combinable per-prompt hash agg + one"
    " global agg to a scalar row. Oracle: identical per-prompt/"
    "global CASE aggregates in DuckDB, hash-exact",
)
def z85_preference_margin_report(spark, sf_dir):
    from topn_spark.operators.sft import preference_margin_report

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 480
    )
    d = F.col("doc_id")
    p = (d / 6).cast("bigint")
    score = (
        F.when(p % 11 == 10, F.lit(None).cast("double"))
        .when((p % 7 == 6) & (d % 6 > 0), F.lit(None).cast("double"))
        .when(p % 5 == 4, F.lit(9.0))
        .otherwise(((d * 37) % 23).cast("double"))
    )
    samples = docs.select(
        p.alias("prompt_id"), score.alias("score")
    )
    return preference_margin_report(samples)


#: z86 oracle: the x19 MinHash-LSH SQL body over a rendered-
#: conversation CTE instead of the documents table.
_Z86_SQL = r"""WITH conv AS (
  SELECT doc_id AS conv_id,
    [{'role': 'user', 'content': 'paraphrase please'},
     {'role': 'assistant', 'content':
       array_to_string(list_transform(range(0, 12),
         i -> CASE WHEN i = 11 AND doc_id % 2 = 1 THEN 'reworded'
           ELSE 'w' || i || 'g' || (doc_id // 2) END), ' ')}]
    AS m
  FROM documents WHERE doc_id < 200),
rendered AS (
  SELECT conv_id, array_to_string(
    list_transform(m, x -> x.role || ': ' || x.content),
    chr(10)) AS text
  FROM conv),
toks AS (
  SELECT conv_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
  FROM rendered
), sh AS (
  SELECT conv_id, unnest(
    CASE WHEN len(t) >= 3
      THEN [array_to_string(t[i:i+2], ' ')
            for i in generate_series(1, len(t)-2)]
      ELSE [] END) AS s
  FROM toks
), sig AS (
  SELECT conv_id,
    min(md5('0:' || s)) AS m0, min(md5('1:' || s)) AS m1,
    min(md5('2:' || s)) AS m2, min(md5('3:' || s)) AS m3,
    min(md5('4:' || s)) AS m4, min(md5('5:' || s)) AS m5,
    min(md5('6:' || s)) AS m6, min(md5('7:' || s)) AS m7
  FROM sh GROUP BY conv_id
), bands AS (
  SELECT conv_id, b, h FROM sig, LATERAL (VALUES
    (0, md5(m0 || m1)), (1, md5(m2 || m3)),
    (2, md5(m4 || m5)), (3, md5(m6 || m7))) AS v(b, h)
), cand AS (
  SELECT DISTINCT a.conv_id AS id_a, c.conv_id AS id_b
  FROM bands a JOIN bands c
    ON a.b = c.b AND a.h = c.h AND a.conv_id < c.conv_id
)
SELECT cand.id_a, cand.id_b,
  ((CASE WHEN sa.m0 = sb.m0 THEN 1 ELSE 0 END) + (CASE WHEN sa.m1 = sb.m1 THEN 1 ELSE 0 END)
 + (CASE WHEN sa.m2 = sb.m2 THEN 1 ELSE 0 END) + (CASE WHEN sa.m3 = sb.m3 THEN 1 ELSE 0 END)
 + (CASE WHEN sa.m4 = sb.m4 THEN 1 ELSE 0 END) + (CASE WHEN sa.m5 = sb.m5 THEN 1 ELSE 0 END)
 + (CASE WHEN sa.m6 = sb.m6 THEN 1 ELSE 0 END) + (CASE WHEN sa.m7 = sb.m7 THEN 1 ELSE 0 END)
  ) / 8.0 AS est_j
FROM cand JOIN sig sa ON cand.id_a = sa.conv_id
JOIN sig sb ON cand.id_b = sb.conv_id
WHERE ((CASE WHEN sa.m0 = sb.m0 THEN 1 ELSE 0 END) + (CASE WHEN sa.m1 = sb.m1 THEN 1 ELSE 0 END)
 + (CASE WHEN sa.m2 = sb.m2 THEN 1 ELSE 0 END) + (CASE WHEN sa.m3 = sb.m3 THEN 1 ELSE 0 END)
 + (CASE WHEN sa.m4 = sb.m4 THEN 1 ELSE 0 END) + (CASE WHEN sa.m5 = sb.m5 THEN 1 ELSE 0 END)
 + (CASE WHEN sa.m6 = sb.m6 THEN 1 ELSE 0 END) + (CASE WHEN sa.m7 = sb.m7 THEN 1 ELSE 0 END)) >= 4
ORDER BY id_a ASC, id_b ASC"""


@query(
    "z86_conversation_neardup",
    _Z86_SQL,
    doc="CONVERSATION NEAR-DUP PAIRS (sft.render_chat + the x19"
    " portable MinHash-LSH pipeline via the shared"
    " _portable_minhash_pairs) — the near-dup gate exact prompt"
    " dedup (z79) misses: two conversations whose assistant turns"
    " differ by one reworded token are training-set duplicates even"
    " though their prompts and digests differ; LSH over the"
    " RENDERED text (plain template) finds them without all-pairs."
    " Planted: 100 conversation pairs, each pair's assistant turn"
    " 12 group-salted words with the odd member's last word"
    " reworded (high within-pair shingle overlap, none across"
    " groups). Scale: the x19 shape — shingle explode, 8 md5"
    " min-hash aggs, band bucket self-join (candidates only from"
    " shared buckets), signature-estimated Jaccard cut. Oracle:"
    " identical render + x19 SQL in DuckDB, hash-exact",
)
def z86_conversation_neardup(spark, sf_dir):
    from topn_spark.operators.sft import render_chat

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 200
    )
    d = F.col("doc_id")
    g = (d / 2).cast("bigint").cast("string")
    words = F.transform(
        F.sequence(F.lit(0), F.lit(11)),
        lambda i: F.when(
            (i == 11) & (d % 2 == 1), F.lit("reworded")
        ).otherwise(
            F.concat(F.lit("w"), i.cast("string"), F.lit("g"), g)
        ),
    )
    msgs = F.array(
        F.struct(
            F.lit("user").alias("role"),
            F.lit("paraphrase please").alias("content"),
        ),
        F.struct(
            F.lit("assistant").alias("role"),
            F.array_join(words, " ").alias("content"),
        ),
    )
    convs = docs.select(d.alias("conv_id"), msgs.alias("messages"))
    rendered = render_chat(convs, template="plain").select(
        "conv_id", "text"
    )
    return _portable_minhash_pairs(rendered, id_col="conv_id")


#: z87 planted unigram piece table (log-probs; 'ab' vs 'a'+'b'
#: exercises the longest-piece-on-tie contract, 'Z' is OOV).
_Z87_PIECES = [
    ("a", -2.0), ("b", -2.0), ("c", -2.5), ("d", -2.5),
    ("ab", -3.0), ("cd", -4.0), ("abcd", -8.0), ("x", -1.5),
    ("1", -2.0), ("2", -2.0), ("3", -2.0), ("4", -2.0),
    ("5", -2.0), ("6", -2.0), ("7", -2.0), ("8", -2.0),
    ("9", -2.0), ("0", -2.0),
]


def _z87_unigram_mask_mirror(con):
    """z87 mirror: an INDEPENDENT Viterbi DP over the planted
    (tokens, mask) fixture — ascending start scan, strictly-better
    replacement (longest piece wins float ties), OOV chars emitted
    raw at -1e9 — each piece inheriting its unit's bit."""
    logp = dict(_Z87_PIECES)
    mx = max(len(p) for p in logp)

    def enc(word):
        n = len(word)
        dp = [0.0] + [None] * n
        back = [None] * (n + 1)
        for j in range(1, n + 1):
            best, bi = None, None
            for i in range(max(0, j - mx), j):
                if dp[i] is None:
                    continue
                lp = logp.get(word[i:j])
                if lp is None:
                    continue
                s = dp[i] + lp
                if best is None or s > best:
                    best, bi = s, i
            if best is None:
                best, bi = (dp[j - 1] or 0.0) - 1e9, j - 1
            dp[j], back[j] = best, bi
        out, j = [], n
        while j > 0:
            i = back[j]
            out.append(word[i:j])
            j = i
        out.reverse()
        return out

    ids = [
        r[0]
        for r in con.execute(
            "SELECT doc_id FROM documents WHERE doc_id < 300"
        ).fetchall()
    ]
    rows = []
    for d in ids:
        m3 = d % 3
        if m3 == 2:
            rows.append((d, None, None, None, None))
            continue
        if m3 == 0:
            toks = ["abcd", f"ab{d % 10}", "aZb"]
            bits = [False, True, True]
        else:
            toks = ["abab", "cdcd"]
            bits = [True, False]
        subs, sm = [], []
        for w, b in zip(toks, bits):
            for s in enc(w):
                subs.append(s)
                sm.append(b)
        rows.append(
            (
                d,
                len(subs),
                sum(sm),
                "|".join(subs),
                "".join("1" if x else "0" for x in sm),
            )
        )
    return (
        ["conv_id", "n_lm_tokens", "n_supervised", "toks_sig",
         "mask_str"],
        rows,
    )


@query(
    "z87_unigram_loss_mask",
    None,
    doc="UNIGRAM-LM-ALIGNED LOSS MASK (operators/sft.py::"
    "unigram_loss_mask) — the bpe_loss_mask sibling for the"
    " SentencePiece-family tokenizer: each whitespace unit segments"
    " under the trained piece table with the SAME Viterbi DP and"
    " tie contract as apply_unigram_lm (shared _unigram_viterbi —"
    " longest piece wins exact float ties, OOV chars emit raw at"
    " -1e9 so application stays total), every piece inheriting its"
    " unit's supervise bit — either trained tokenizer now feeds"
    " pack_masked_sequences. Planted: tie-exercising 'ab' pieces,"
    " an OOV 'Z', NULL-mask rows observable. Scale: one Arrow"
    " mapInPandas pass, piece table as closure — map-only. Oracle:"
    " INDEPENDENT Python Viterbi mirror over the same fixture,"
    " exact (tolerance 0)",
    tol_oracle=_z87_unigram_mask_mirror,
    tolerance=0.0,
    tol_keys=("conv_id",),
)
def z87_unigram_loss_mask(spark, sf_dir):
    from topn_spark.operators.sft import unigram_loss_mask

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 300
    )
    d = F.col("doc_id")
    m3 = d % 3
    tokens = (
        F.when(
            m3 == 0,
            F.array(
                F.lit("abcd"),
                F.concat(F.lit("ab"), (d % 10).cast("string")),
                F.lit("aZb"),
            ),
        )
        .when(m3 == 1, F.array(F.lit("abab"), F.lit("cdcd")))
        .otherwise(F.array(F.lit("x")))
        .cast("array<string>")
    )
    mask = (
        F.when(m3 == 0, F.array(F.lit(False), F.lit(True), F.lit(True)))
        .when(m3 == 1, F.array(F.lit(True), F.lit(False)))
        .cast("array<boolean>")
    )
    base = docs.select(
        d.alias("conv_id"),
        tokens.alias("tokens"),
        mask.alias("loss_mask"),
    )
    out = unigram_loss_mask(base, _Z87_PIECES)
    toks, msk = F.col("tokens"), F.col("loss_mask")
    return out.select(
        "conv_id",
        "n_lm_tokens",
        "n_supervised",
        F.when(toks.isNotNull(), F.array_join(toks, "|")).alias(
            "toks_sig"
        ),
        F.when(
            msk.isNotNull(),
            F.array_join(
                F.transform(
                    msk, lambda b: F.when(b, "1").otherwise("0")
                ),
                "",
            ),
        ).alias("mask_str"),
    ).orderBy("conv_id")


@query(
    "z88_epoch_shuffle",
    r"""WITH a AS (
  SELECT doc_id, md5('1:' || CAST(doc_id AS VARCHAR)) AS k
  FROM documents),
b AS (
  SELECT doc_id, k,
    CAST(CAST(('0x' || substring(k, 1, 8)) AS BIGINT) % 8 AS INT)
      AS shard
  FROM a)
SELECT doc_id, CAST(1 AS INT) AS epoch, shard,
  CAST(row_number() OVER (PARTITION BY shard ORDER BY k, doc_id)
       AS BIGINT) AS pos
FROM b ORDER BY shard ASC, pos ASC""",
    doc="BETWEEN-EPOCH RESHUFFLE (pipeline.py::epoch_shuffle) — the"
    " trainer-side deterministic permutation: every row gets an"
    " epoch-salted md5(epoch||':'||id) key, a balanced key-prefix"
    " mod-n_shards assignment, and an exact 1-based pos within its"
    " shard ordered by (key, id) — a different permutation every"
    " epoch, the same permutation on every re-run of the same epoch"
    " (resumable multi-epoch training; z36's UNsalted"
    " shard_assignment is deliberately epoch-stable for exports)."
    " Scale: stateless map-only assignment + ONE row_number window"
    " partitioned by shard — parallelism = n_shards, each task"
    " sorting corpus/n_shards rows (~1 GB at 10^5 shards on 100 TB);"
    " no task ever sees the global order. Oracle: identical md5"
    " arithmetic + windowed row_number in DuckDB, hash-exact",
)
def z88_epoch_shuffle(spark, sf_dir):
    from topn_spark.operators.pipeline import epoch_shuffle

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return epoch_shuffle(docs, epoch=1, n_shards=8).orderBy(
        "shard", "pos"
    )


@query(
    "z89_kto_labels",
    r"""WITH s AS (
  SELECT doc_id // 5 AS prompt_id, doc_id AS sample_id,
    CASE WHEN doc_id % 13 = 12 OR (doc_id // 5) % 16 = 15 THEN NULL
         ELSE CAST((doc_id * 17) % 10 AS DOUBLE) END AS score
  FROM documents WHERE doc_id < 400),
p AS (
  SELECT prompt_id, AVG(score) AS ref_point,
         CAST(COUNT(score) AS BIGINT) AS n_valid
  FROM s GROUP BY prompt_id)
SELECT s.prompt_id, s.sample_id, s.score,
  ROUND(p.ref_point, 6) AS ref_point_r, p.n_valid,
  CASE WHEN s.score IS NOT NULL AND p.ref_point IS NOT NULL
       THEN s.score >= p.ref_point END AS label
FROM s JOIN p USING (prompt_id)
ORDER BY sample_id ASC""",
    doc="KTO BINARY PREFERENCE LABELS (operators/sft.py::"
    "kto_labels) — the unpaired sibling of preference_pairs (z70):"
    " KTO trains on independent (prompt, response, desirable?)"
    " examples, so every scored sample becomes a labeled row instead"
    " of only the per-prompt extremes surviving; label = score >="
    " per-prompt mean of the validly-scored samples (the KTO reward"
    " baseline), NULL-scored rows keep label NULL (observable, the"
    " caller decides), n_valid rides along for the desirable/"
    "undesirable balance check the KTO loss weights by. Planted: 80"
    " prompts x 5 integer-scored samples with scattered NULLs and"
    " one fully-unscored prompt stripe (integer scores keep the"
    " mean's dividend exact in IEEE, so the >= cut and the ROUND-6"
    " projection are engine-stable). Scale: ONE map-side-combinable"
    " per-prompt hash agg + an equi-join back on the prompt key —"
    " no window, no sort. Oracle: identical CASE aggregates + join"
    " in DuckDB, hash-exact",
)
def z89_kto_labels(spark, sf_dir):
    from topn_spark.operators.sft import kto_labels

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 400
    )
    d = F.col("doc_id")
    p = (d / 5).cast("bigint")
    score = F.when(
        (d % 13 == 12) | (p % 16 == 15),
        F.lit(None).cast("double"),
    ).otherwise(((d * 17) % 10).cast("double"))
    samples = docs.select(
        p.alias("prompt_id"), d.alias("sample_id"),
        score.alias("score"),
    )
    out = kto_labels(samples)
    return out.select(
        "prompt_id",
        "sample_id",
        "score",
        F.round("ref_point", 6).alias("ref_point_r"),
        "n_valid",
        "label",
    ).orderBy("sample_id")


@query(
    "z90_dup_cluster_report",
    r"""WITH u AS (
  SELECT text FROM documents
  UNION ALL SELECT text FROM documents WHERE doc_id % 10 = 0
  UNION ALL SELECT text FROM documents WHERE doc_id % 100 = 0),
c AS (
  SELECT COALESCE(md5(text), 'NULL') AS h,
         CAST(COUNT(*) AS BIGINT) AS cluster_size
  FROM u GROUP BY 1)
SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
  CAST(SUM(cluster_size) AS BIGINT) AS n_docs,
  CAST(SUM(cluster_size) - COUNT(*) AS BIGINT) AS n_excess
FROM c GROUP BY cluster_size ORDER BY cluster_size ASC""",
    doc="DUPLICATE-MULTIPLICITY HISTOGRAM (operators/dedup.py::"
    "dup_cluster_report) — the release-audit view of exact dedup"
    " (x01/q31 KEEP one row per digest; this reports how much a"
    " dedup pass would remove and in what shape BEFORE it rewrites"
    " the corpus): per-digest counts re-aggregated over the"
    " multiplicity domain — cluster_size, n_clusters, n_docs,"
    " n_excess; the heavy tail at high multiplicities is the"
    " boilerplate signature. Planted: the corpus unioned with its"
    " doc_id%10 and doc_id%100 slices (multiplicities 1/2/3)."
    " Scale: two hash aggs — the per-digest one is the same"
    " map-side-combinable shuffle exact dedup already pays; the"
    " re-agg domain is distinct cluster SIZES (log-sized), and the"
    " ORDER BY sorts a report-sized frame. Oracle: identical"
    " digest-count-histogram SQL in DuckDB, hash-exact",
)
def z90_dup_cluster_report(spark, sf_dir):
    from topn_spark.operators.dedup import dup_cluster_report

    docs = load_table(spark, sf_dir, "documents")
    u = (
        docs.select("text")
        .unionAll(docs.where(F.col("doc_id") % 10 == 0).select("text"))
        .unionAll(
            docs.where(F.col("doc_id") % 100 == 0).select("text")
        )
    )
    return dup_cluster_report(u)


def _z91_contrast_mirror(con):
    """z91 mirror: INDEPENDENT two-model add-k contrast — same ASCII
    token rule, same (c12+k)/(c1+k*V) formula per model, log_ratio =
    (lp_general - lp_domain)/n. Sum order differs from Spark's
    partial aggregation, hence tolerance (1e-9 relative)."""
    import math
    import re
    from collections import Counter

    def train(sql):
        uni, bi = Counter(), Counter()
        for (text,) in con.execute(sql).fetchall():
            if text is None:
                continue
            t = re.findall(r"[a-z0-9]+", text.lower())
            uni.update(t)
            bi.update(
                t[i] + " " + t[i + 1] for i in range(len(t) - 1)
            )
        return uni, bi

    du, db = train("SELECT text FROM documents WHERE lang = 'en'")
    gu, gb = train("SELECT text FROM documents")
    vd, vg, k = float(len(du) + 1), float(len(gu) + 1), 1.0
    out = []
    for did, text in con.execute(
        "SELECT doc_id, text FROM documents WHERE doc_id < 300 "
        "ORDER BY doc_id"
    ).fetchall():
        if text is None:
            continue
        t = re.findall(r"[a-z0-9]+", text.lower())
        if len(t) < 2:
            continue
        n = len(t) - 1
        ds = gs = 0.0
        for i in range(n):
            g = t[i] + " " + t[i + 1]
            ds += math.log(
                (db.get(g, 0) + k) / (du.get(t[i], 0) + k * vd)
            )
            gs += math.log(
                (gb.get(g, 0) + k) / (gu.get(t[i], 0) + k * vg)
            )
        lr = (gs - ds) / n
        out.append(
            (
                int(did),
                n,
                math.exp(-ds / n),
                math.exp(-gs / n),
                lr,
                lr <= 0.0,
            )
        )
    return (
        ["doc_id", "n_bigrams", "ppl_domain", "ppl_general",
         "log_ratio", "keep"],
        out,
    )


@query(
    "z91_ppl_contrast",
    None,  # float log-prob sums are order-dependent — tolerance mirror
    doc="TWO-MODEL PERPLEXITY CONTRAST (lm.py::perplexity_contrast)"
    " — the domain-targeting selection rule behind DSIR-style and"
    " RHO-style curation: score every document under a DOMAIN add-k"
    " bigram LM (trained on the lang='en' slice) and a GENERAL one"
    " (all docs); keep = ln(ppl_domain/ppl_general) <= 0, the"
    " per-token cross-entropy DIFFERENCE, which cancels the length"
    " and burstiness effects either absolute perplexity carries"
    " (z29/z31 are the single-model siblings). Scale: ONE corpus"
    " explode — not one per model, the point of fusing the scorings"
    " — four model-sized LEFT joins, one per-doc re-agg computing"
    " both logprob sums. Oracle: independent Python two-model"
    " mirror, 1e-9 relative",
    tol_oracle=_z91_contrast_mirror,
    tolerance=1e-9,
    tol_keys=("doc_id",),
)
def z91_ppl_contrast(spark, sf_dir):
    from topn_spark.operators.lm import (
        perplexity_contrast,
        train_bigram_lm,
    )

    docs = load_table(spark, sf_dir, "documents")
    domain = train_bigram_lm(docs.where(F.col("lang") == "en"))
    general = train_bigram_lm(docs)
    return perplexity_contrast(
        docs.where(F.col("doc_id") < 300), domain, general
    ).orderBy("doc_id")


def _z92_triplet_mirror(con):
    """z92 mirror: NumPy cosine matrix over the embeddings table,
    hardest same-label / different-label neighbor per anchor with
    the (score desc, id asc) tiebreak. Summation order differs from
    Spark's left-to-right fold, hence tolerance (1e-9 relative)."""
    import numpy as np

    rows = con.execute(
        "SELECT vec_id, embedding, label FROM embeddings "
        "WHERE label IS NOT NULL ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    v = np.array([r[1] for r in rows], dtype=np.float64)
    lab = np.array([r[2] for r in rows])
    nv = v / np.linalg.norm(v, axis=1, keepdims=True)
    s = nv @ nv.T
    out = []
    for i in range(len(ids)):
        if ids[i] >= 1000:  # the entry's bounded anchor side
            continue
        same = (lab == lab[i]) & (ids != ids[i])
        diff = lab != lab[i]
        if not same.any() or not diff.any():
            continue

        def best(mask):
            # score desc, id asc — lexicographic on (-score, id)
            cand = np.flatnonzero(mask)
            k = cand[np.lexsort((ids[cand], -s[i, cand]))[0]]
            return int(ids[k]), float(s[i, k])

        pi, ps = best(same)
        ni, ns = best(diff)
        out.append((int(ids[i]), pi, ps, ni, ns, ps - ns))
    return (
        ["anchor_id", "pos_id", "pos_score", "neg_id", "neg_score",
         "margin"],
        out,
    )


@query(
    "z92_contrastive_triplets",
    None,  # float cosine scores — tolerance mirror (SURVEY §2.6)
    doc="HARD-TRIPLET MINING (similarity.py::contrastive_triplets)"
    " — the embedding-model training-data step (FaceNet / sentence-"
    "encoder recipe): per labeled anchor, the most-similar SAME-"
    "label neighbor (hard positive) and most-similar DIFFERENT-"
    "label neighbor (hard negative) with margin = pos - neg cosine;"
    " margin <= 0 rows are the active triplets the loss learns"
    " from. Ties break on lowest neighbor id; NULL labels excluded"
    " both sides; singleton-label anchors drop with the join."
    " Scale: anchors bounded to the probe set (|anchors| x"
    " |corpus|, single conditional-extremes agg over pre-normalized"
    " vectors — the two-window form measured 2.4x slower); the"
    " 100 TB path buckets with LSH/IVF first and mines per bucket —"
    " hard pairs are near the anchor by definition. Oracle:"
    " NumPy cosine-matrix mirror with the same tiebreak, 1e-9"
    " relative",
    tol_oracle=_z92_triplet_mirror,
    tolerance=1e-9,
    tol_keys=("anchor_id",),
)
def z92_contrastive_triplets(spark, sf_dir):
    from topn_spark.operators.similarity import contrastive_triplets

    emb = load_table(spark, sf_dir, "embeddings")
    # anchors bounded to the probe set (the documented usage: cost is
    # |anchors| x |corpus|, neighbors still drawn from the whole
    # table); at the gate SFs every row is an anchor, so the oracle
    # output is identical — the bound only matters at bench scale
    return contrastive_triplets(
        emb, anchors=emb.where(F.col("vec_id") < 1000)
    ).orderBy("anchor_id")


@query(
    "z93_dedup_lineage",
    r"""WITH u AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0),
k AS (
  SELECT COALESCE(md5(text), 'NULL') AS h,
         MIN(doc_id) AS keeper_id,
         CAST(COUNT(*) AS BIGINT) AS cluster_size
  FROM u GROUP BY 1)
SELECT u.doc_id, k.keeper_id,
       u.doc_id = k.keeper_id AS is_keeper, k.cluster_size
FROM u JOIN k ON COALESCE(md5(u.text), 'NULL') = k.h
ORDER BY u.doc_id ASC""",
    doc="EXACT-DEDUP PROVENANCE MAP (operators/dedup.py::"
    "dedup_lineage) — the governance artifact a corpus rewrite must"
    " leave behind: x01/q31 KEEP one row per digest and drop the"
    " rest; takedown requests and licensing audits need the DROPPED"
    " ids resolvable, so every row maps to its cluster's canonical"
    " keeper (lowest id — dedup_exact's exact rule, so map and dedup"
    " agree by construction), with is_keeper and cluster_size"
    " observable and NULL text as its own sentinel cluster. Planted:"
    " the corpus plus an id-shifted copy of its doc_id%10 slice"
    " (cross-copy exact dups with distinct ids). Scale: one"
    " map-side-combinable per-digest hash agg + one equi-join back"
    " on the digest — the same shuffle exact dedup already pays;"
    " the keeper side is one row per digest (broadcast/AQE"
    " territory). Oracle: identical digest-group-join SQL in"
    " DuckDB, hash-exact",
)
def z93_dedup_lineage(spark, sf_dir):
    from topn_spark.operators.dedup import dedup_lineage

    docs = load_table(spark, sf_dir, "documents")
    u = docs.select("doc_id", "text").unionAll(
        docs.where(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    return dedup_lineage(u).orderBy("doc_id")


@query(
    "z94_curriculum_stages",
    r"""SELECT doc_id, n_chars,
  CAST(row_number() OVER (ORDER BY n_chars ASC, doc_id ASC)
       AS BIGINT) AS rank,
  CAST(ntile(5) OVER (ORDER BY n_chars ASC, doc_id ASC) AS INT)
    AS stage
FROM documents ORDER BY rank ASC""",
    doc="CURRICULUM-LEARNING STAGE ASSIGNMENT (pipeline.py::"
    "curriculum_stages; Bengio et al. 2009) — easy-to-hard data"
    " ordering: exact global rank by (n_chars, doc_id) — the classic"
    " short-to-long length curriculum — cut into 5 contiguous"
    " NTILE-semantics stages; a trainer feeds stage 1 first, and"
    " WITHIN a stage epoch_shuffle (z88) restores per-epoch"
    " randomness, so curriculum and shuffling compose. Scale: the"
    " two-phase exact global rank (rank_low_cardinality — value-"
    "range bucket counts + broadcast offsets, 64-way sort"
    " parallelism, never one global sort task; the x13/z68 shape)"
    " plus a literal ntile projection from (rank, total). Oracle:"
    " plain window row_number + ntile in DuckDB, hash-exact",
)
def z94_curriculum_stages(spark, sf_dir):
    from topn_spark.operators.pipeline import curriculum_stages

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars"
    )
    return curriculum_stages(
        docs, "n_chars", 5, id_col="doc_id"
    ).orderBy("rank")


#: z95 planted centroids: unit spike on dim (j) per cluster j — the
#: k x d model that rides into the task as literals.
_Z95_CENTROIDS = [
    [1.0 if d == j else 0.0 for d in range(64)] for j in range(4)
]


def _z95_cluster_sample_mirror(con):
    """z95 mirror: INDEPENDENT Python replication of kmeans_assign
    (left-to-right (a-b)^2 fold per centroid — the same IEEE op
    order as Spark's F.aggregate, so dist_sq is bit-exact — argmin
    with first-min tie to the lowest cluster id) + the md5(id)
    per-cluster k-smallest cap. Tolerance 0."""
    import hashlib

    rows = con.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id"
    ).fetchall()
    per = {}
    for vid, emb in rows:
        best, bd = 0, None
        for j, c in enumerate(_Z95_CENTROIDS):
            s = 0.0
            for a, b in zip(emb, c):
                d = float(a) - b
                s += d * d
            if bd is None or s < bd:
                bd, best = s, j
        h = hashlib.md5(str(vid).encode()).hexdigest()
        per.setdefault(best, []).append((h, vid, bd))
    out = []
    for j, members in per.items():
        members.sort()
        for rank, (_, vid, bd) in enumerate(members[:10], 1):
            out.append((int(vid), j, bd, rank))
    return ["vec_id", "cluster", "dist_sq", "sample_rank"], out


@query(
    "z95_cluster_balanced_sample",
    None,  # float dist_sq + model-based assignment — mirror oracle
    doc="DIVERSITY-BALANCED SAMPLING (similarity.py::"
    "cluster_balanced_sample) — the DataComp/SemDeDup-family"
    " selection half: nearest-centroid assignment (kmeans_assign,"
    " k x d model as literals, map-only) then a deterministic"
    " <=10-row uniform sample PER CLUSTER by smallest md5(id), so"
    " no embedding-space mode dominates the sample the way a global"
    " uniform draw lets the head cluster dominate a web corpus."
    " Planted: 4 unit-spike centroids. Scale: map-only assignment +"
    " one WindowGroupLimit-evaluated rank cut (at most k rows per"
    " cluster per input partition reach the shuffle). Oracle:"
    " independent Python fold-order-exact assignment + hashlib md5"
    " cap mirror, tolerance 0",
    tol_oracle=_z95_cluster_sample_mirror,
    tolerance=0.0,
    tol_keys=("vec_id",),
)
def z95_cluster_balanced_sample(spark, sf_dir):
    from topn_spark.operators.similarity import (
        cluster_balanced_sample,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    out = cluster_balanced_sample(emb, _Z95_CENTROIDS, 10)
    return out.select(
        "vec_id", "cluster", "dist_sq", "sample_rank"
    ).orderBy("vec_id")


@query(
    "z96_memorization_risk",
    r"""WITH base AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0),
t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
  FROM base),
g AS (
  SELECT DISTINCT doc_id, md5(array_to_string(w[i:i+7], ' ')) AS gm
  FROM t, UNNEST(range(1, len(w) - 6)) AS s(i)
  WHERE len(w) >= 8),
pd AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams
  FROM g GROUP BY doc_id),
d AS (
  SELECT gm, COUNT(*) AS dfreq, MIN(doc_id) AS only_doc
  FROM g GROUP BY gm),
u AS (
  SELECT only_doc AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_unique
  FROM d WHERE dfreq = 1 GROUP BY only_doc)
SELECT base.doc_id,
  COALESCE(pd.n_grams, 0) AS n_grams,
  COALESCE(u.n_unique, 0) AS n_unique,
  ROUND(CAST(COALESCE(u.n_unique, 0) AS DOUBLE)
        / NULLIF(CAST(COALESCE(pd.n_grams, 0) AS DOUBLE), 0), 6)
    AS uniq_ratio
FROM base
LEFT JOIN pd ON base.doc_id = pd.doc_id
LEFT JOIN u ON base.doc_id = u.doc_id
ORDER BY base.doc_id ASC""",
    doc="RARE-N-GRAM MEMORIZATION AUDIT (operators/dedup.py::"
    "memorization_risk; Carlini et al. 2021/23, Lee et al. 2022) —"
    " per document: distinct 8-gram count, how many of those grams"
    " occur in NO other document (corpus document-frequency 1), and"
    " the uniq_ratio — high marks content a model can only emit by"
    " memorizing (verbatim-traceable PII/keys), low marks shared"
    " template text; <n-token docs emit 0 grams and NULL ratio."
    " Planted: the corpus plus an id-shifted doc_id%10 copy, whose"
    " members' ratios collapse to 0 (every gram shared). Scale: the"
    " decontamination shape WITHOUT a join back — one DISTINCT-gram"
    " explode (md5'd to 16-byte keys pre-shuffle), ONE gram-keyed"
    " map-side-combinable (count, min(doc_id)) agg; a df-1 gram's"
    " min(doc_id) IS its only document, so per-doc unique counts"
    " re-aggregate the filtered gram table — no second corpus-sized"
    " term. Oracle: identical distinct-gram df SQL in DuckDB,"
    " hash-exact",
)
def z96_memorization_risk(spark, sf_dir):
    from topn_spark.operators.dedup import memorization_risk

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", "text").unionAll(
        docs.where(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    return memorization_risk(base, n=8).orderBy("doc_id")


def _z97_mmr_mirror(con):
    """z97 mirror: INDEPENDENT NumPy MMR replay — cosine relevance
    of each candidate to each query, then the same greedy
    lam*rel - (1-lam)*max-sim-to-selected loop with the lowest-id
    tiebreak. Float sums differ in order from Spark's fold, hence
    tolerance (1e-9 relative)."""
    import numpy as np

    rows = con.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    v = np.array([r[1] for r in rows], dtype=np.float64)
    nv = v / np.linalg.norm(v, axis=1, keepdims=True)
    qm = ids < 5
    cm = (ids % 25 == 7)
    qids, qv = ids[qm], nv[qm]
    cids, cv = ids[cm], nv[cm]
    sims = cv @ cv.T
    out = []
    for qi in range(len(qids)):
        rel = cv @ qv[qi]
        chosen, scores = [], []
        free = list(range(len(cids)))
        lam = 0.7
        while free and len(chosen) < 8:
            bi, bs = None, None
            for i in free:
                pen = (
                    max(float(sims[i, j]) for j in chosen)
                    if chosen
                    else 0.0
                )
                s = lam * float(rel[i]) - (1.0 - lam) * pen
                if bs is None or s > bs or (
                    s == bs and cids[i] < cids[bi]
                ):
                    bi, bs = i, s
            chosen.append(bi)
            scores.append(bs)
            free.remove(bi)
        for rank, (i, s) in enumerate(zip(chosen, scores), 1):
            out.append(
                (
                    int(qids[qi]),
                    int(cids[i]),
                    rank,
                    float(rel[i]),
                    s,
                )
            )
    return (
        ["query_id", "cand_id", "mmr_rank", "rel_score", "mmr_score"],
        out,
    )


@query(
    "z97_mmr_rerank",
    None,  # float cosine/greedy scores — tolerance mirror
    doc="MAXIMAL MARGINAL RELEVANCE RE-RANKING (similarity.py::"
    "mmr_rerank; Carbonell & Goldstein 1998) — the diversity pass"
    " between ANN shortlist and final top-k that stops a retrieval"
    " training set being ten near-copies of the best hit: greedy"
    " k-selection per query maximizing lam*rel - (1-lam)*max cosine"
    " to the already-selected set, lowest-id tiebreak, mmr_rank /"
    " mmr_score observable. Scale: ONE shuffle keyed by query into"
    " Arrow-batched applyInPandas; the sequential greedy loop runs"
    " per SHORTLIST (tens of rows by construction), groups"
    " embarrassingly parallel — never a corpus as one candidate"
    " set. Oracle: independent NumPy greedy replay, 1e-9 relative",
    tol_oracle=_z97_mmr_mirror,
    tolerance=1e-9,
    tol_keys=("query_id", "mmr_rank"),
)
def z97_mmr_rerank(spark, sf_dir):
    from topn_spark.operators.similarity import _norm, mmr_rerank

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("_qv"),
    )
    c = emb.where(F.col("vec_id") % 25 == 7).select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    dot = F.aggregate(
        F.zip_with("_qv", "embedding", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    cands = (
        F.broadcast(q)
        .crossJoin(c)
        .withColumn(
            "rel_score",
            dot / (_norm(F.col("_qv")) * _norm(F.col("embedding"))),
        )
        .select("query_id", "cand_id", "rel_score", "embedding")
    )
    out = mmr_rerank(cands, k=8, lam=0.7)
    return out.orderBy("query_id", "mmr_rank")


@query(
    "z98_conversation_paths",
    r"""WITH RECURSIVE msgs AS (
  SELECT (doc_id // 10) AS conv_id, doc_id AS msg_id,
    CASE WHEN doc_id % 10 = 0 THEN NULL
         WHEN doc_id % 10 <= 4 THEN doc_id - 1
         ELSE doc_id - 5 END AS parent_id,
    CASE WHEN (CASE WHEN doc_id % 10 <= 4 THEN doc_id % 10 + 1
                    ELSE doc_id % 10 - 3 END) % 2 = 1
         THEN 'prompter' ELSE 'assistant' END AS role
  FROM documents WHERE doc_id < 500),
p AS (
  SELECT conv_id, msg_id AS leaf_id, msg_id AS cur,
         parent_id AS nxt, 1 AS depth,
         CAST(msg_id AS VARCHAR) AS path_ids,
         role AS path_roles
  FROM msgs WHERE msg_id NOT IN
    (SELECT parent_id FROM msgs WHERE parent_id IS NOT NULL)
  UNION ALL
  SELECT p.conv_id, p.leaf_id, m.msg_id, m.parent_id, p.depth + 1,
         CAST(m.msg_id AS VARCHAR) || '>' || p.path_ids,
         m.role || '>' || p.path_roles
  FROM p JOIN msgs m ON p.nxt = m.msg_id)
SELECT conv_id, leaf_id, CAST(depth AS INT) AS depth, path_ids,
       path_roles, TRUE AS is_complete
FROM p WHERE nxt IS NULL
ORDER BY leaf_id ASC""",
    doc="MESSAGE-TREE FLATTENING (operators/sft.py::"
    "conversation_paths) — the OASST-style prep step: crowd"
    " conversation datasets are TREES (one prompt, several candidate"
    " replies, each with a subtree); a trainer consumes LINEAR"
    " threads, so every leaf emits its root-to-leaf path with depth,"
    " id/role signatures, and is_complete FALSE on dangling parents"
    " or cycles (observable, never silently rooted). Planted: 50"
    " ten-message trees — a 5-chain with one branch per chain node,"
    " 5 leaves per tree. Scale: ONE conversation-keyed shuffle into"
    " Arrow applyInPandas; trees are small by construction, so the"
    " per-group pointer walk is trivial and groups embarrassingly"
    " parallel — contrast the corpus-wide iterative self-join a"
    " global tree would need. Oracle: DuckDB WITH RECURSIVE walk of"
    " the same planted tree, hash-exact",
)
def z98_conversation_paths(spark, sf_dir):
    from topn_spark.operators.sft import conversation_paths

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 500
    )
    d = F.col("doc_id")
    i = d % 10
    parent = (
        F.when(i == 0, F.lit(None).cast("bigint"))
        .when(i <= 4, d - 1)
        .otherwise(d - 5)
    )
    depth1 = F.when(i <= 4, i + 1).otherwise(i - 3)
    role = F.when(depth1 % 2 == 1, F.lit("prompter")).otherwise(
        F.lit("assistant")
    )
    msgs = docs.select(
        (d / 10).cast("bigint").alias("conv_id"),
        d.alias("msg_id"),
        parent.alias("parent_id"),
        role.alias("role"),
    )
    return conversation_paths(msgs).orderBy("leaf_id")


@query(
    "z99_preference_length_bias",
    r"""WITH s AS (
  SELECT (doc_id // 6) AS prompt_id, doc_id AS sample_id,
    CAST((doc_id * 37) % 23 AS DOUBLE) AS score,
    repeat('r', CASE WHEN (doc_id * 37) % 23 > 11
                     THEN 40 + doc_id % 7 ELSE 10 + doc_id % 7 END)
      AS response
  FROM documents WHERE doc_id < 480),
r AS (
  SELECT *,
    ROW_NUMBER() OVER (PARTITION BY prompt_id
      ORDER BY score DESC, sample_id ASC) AS rc,
    ROW_NUMBER() OVER (PARTITION BY prompt_id
      ORDER BY score ASC, sample_id DESC) AS rr,
    COUNT(*) OVER (PARTITION BY prompt_id) AS n,
    MAX(score) OVER (PARTITION BY prompt_id)
      - MIN(score) OVER (PARTITION BY prompt_id) AS gap
  FROM s),
c AS (SELECT prompt_id, response AS chosen_response, n, gap
      FROM r WHERE rc = 1),
j AS (SELECT prompt_id, response AS rejected_response
      FROM r WHERE rr = 1),
lens AS (
  SELECT LENGTH(chosen_response) AS cl,
         LENGTH(rejected_response) AS rl
  FROM c JOIN j USING (prompt_id)
  WHERE n >= 2 AND gap > 0)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
  CAST(0 AS BIGINT) AS n_null,
  CAST(SUM(CASE WHEN cl > rl THEN 1 ELSE 0 END) AS BIGINT)
    AS n_chosen_longer,
  CAST(SUM(CASE WHEN cl < rl THEN 1 ELSE 0 END) AS BIGINT)
    AS n_rejected_longer,
  CAST(SUM(CASE WHEN cl = rl THEN 1 ELSE 0 END) AS BIGINT)
    AS n_tied_len,
  ROUND(CAST(SUM(cl) AS DOUBLE) / COUNT(*), 6) AS mean_chosen_chars,
  ROUND(CAST(SUM(rl) AS DOUBLE) / COUNT(*), 6)
    AS mean_rejected_chars,
  ROUND(CAST(SUM(cl - rl) AS DOUBLE) / COUNT(*), 6) AS mean_len_gap,
  ROUND(CAST(SUM(CASE WHEN cl > rl THEN 1 ELSE 0 END) AS DOUBLE)
        / COUNT(*), 6) AS frac_chosen_longer
FROM lens""",
    doc="PREFERENCE LENGTH-BIAS REPORT (operators/sft.py::"
    "preference_length_bias; Singhal et al. 2023) — the verbosity-"
    "bias number every DPO/reward release needs next to z85's margin"
    " report: when chosen responses are systematically LONGER, the"
    " trained reward learns verbosity, not quality. Over the z70"
    " preference_pairs frame: pair count, chosen-longer/shorter/tied"
    " splits (NULL-response pairs counted separately), ROUND-6 mean"
    " lengths and gap, frac_chosen_longer. Planted: 80 prompts of 6"
    " integer-scored samples whose high-score responses are"
    " deliberately longer (frac_chosen_longer pins at 1). Scale:"
    " map-only length projections into ONE map-side-combinable"
    " global agg — a scalar row. Oracle: identical pair construction"
    " (DuckDB arg_min/arg_max over the same (-score, id) ordering)"
    " + CASE aggregates, hash-exact",
)
def z99_preference_length_bias(spark, sf_dir):
    from topn_spark.operators.sft import (
        preference_length_bias,
        preference_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 480
    )
    d = F.col("doc_id")
    score = ((d * 37) % 23).cast("double")
    rlen = F.when(
        (d * 37) % 23 > 11, 40 + d % 7
    ).otherwise(10 + d % 7)
    samples = docs.select(
        (d / 6).cast("bigint").alias("prompt_id"),
        d.alias("sample_id"),
        score.alias("score"),
        F.repeat(F.lit("r"), rlen.cast("int")).alias("response"),
    )
    pairs = preference_pairs(samples)
    return preference_length_bias(pairs)


def _z100_divergence_mirror(con):
    """z100 mirror: INDEPENDENT Python JS divergence between the two
    slices' unigram distributions — same ASCII token rule, same
    0.5*KL(p||m)+0.5*KL(q||m) with the 0*ln0=0 convention. Float sum
    order differs from Spark's partial aggregation, hence tolerance
    (1e-9 relative)."""
    import math
    import re
    from collections import Counter

    def counts(sql):
        c = Counter()
        for (text,) in con.execute(sql).fetchall():
            if text is not None:
                c.update(re.findall(r"[a-z0-9]+", text.lower()))
        return c

    ca = counts("SELECT text FROM documents WHERE lang = 'en'")
    cb = counts("SELECT text FROM documents WHERE lang <> 'en'")
    na, nb = sum(ca.values()), sum(cb.values())
    js = 0.0
    for w in set(ca) | set(cb):
        p = ca.get(w, 0) / max(na, 1)
        q = cb.get(w, 0) / max(nb, 1)
        m = (p + q) / 2
        if p > 0:
            js += 0.5 * p * math.log(p / m)
        if q > 0:
            js += 0.5 * q * math.log(q / m)
    shared = sum(1 for w in ca if w in cb)
    return (
        ["n_tokens_a", "n_tokens_b", "vocab_a", "vocab_b",
         "vocab_shared", "js_divergence"],
        [(na, nb, len(ca), len(cb), shared, js)],
    )


@query(
    "z100_corpus_divergence",
    None,  # float log sums are order-dependent — tolerance mirror
    doc="CORPUS DISTRIBUTION-SHIFT REPORT (textstats.py::"
    "corpus_divergence) — the release-card number for 'how far did"
    " the data move': Jensen-Shannon divergence between two corpora's"
    " unigram distributions (symmetric, bounded by ln 2, defined"
    " across DIFFERENT vocabularies — the case plain KL cannot"
    " handle), plus per-side token/vocab totals and the shared-vocab"
    " count; here the en slice vs the non-en rest, a maximally-"
    "shifted pair. Scale: one map-side-combinable unigram hash agg"
    " per corpus (vocabulary-sized output), a model-sized FULL OUTER"
    " join on the token key, one global agg of per-token JS"
    " contributions; driver state = two scalars. Oracle: independent"
    " Python Counter mirror, 1e-9 relative",
    tol_oracle=_z100_divergence_mirror,
    tolerance=1e-9,
    tol_keys=("n_tokens_a",),
)
def z100_corpus_divergence(spark, sf_dir):
    from topn_spark.operators.textstats import corpus_divergence

    docs = load_table(spark, sf_dir, "documents")
    return corpus_divergence(
        docs.where(F.col("lang") == "en"),
        docs.where(F.col("lang") != "en"),
    )


@query(
    "z101_truncate_conversation",
    r"""WITH conv AS (
  SELECT doc_id AS conv_id,
    CASE doc_id % 5
      WHEN 0 THEN [{'role': 'system', 'content': 'sysABCDE'}]
        || list_transform(range(1, 7), j -> {
             'role': CASE WHEN j % 2 = 1 THEN 'user'
                          ELSE 'assistant' END,
             'content': repeat('a', 3 + (doc_id + j) % 5)})
      WHEN 1 THEN list_transform(range(1, 5), j -> {
             'role': CASE WHEN j % 2 = 1 THEN 'user'
                          ELSE 'assistant' END,
             'content': repeat('b', 10 + doc_id % 4)})
      WHEN 2 THEN NULL
      WHEN 3 THEN [{'role': 'system', 'content': repeat('s', 60)}]
      ELSE CAST([] AS STRUCT(role VARCHAR, content VARCHAR)[])
    END AS m
  FROM documents WHERE doc_id < 300),
t AS (
  SELECT conv_id, m,
    (len(m) >= 1 AND m[1].role = 'system') AS has_sys
  FROM conv WHERE m IS NOT NULL),
u AS (
  SELECT conv_id, m, has_sys,
    CASE WHEN has_sys THEN length(coalesce(m[1].content, ''))
         ELSE 0 END AS sys_chars,
    CASE WHEN has_sys THEN m[2:] ELSE m END AS body
  FROM t),
v AS (
  SELECT conv_id, m, has_sys, sys_chars, body,
    len(body) AS nb,
    40 - sys_chars AS budget
  FROM u),
w AS (
  SELECT *,
    nb + 1 - len(list_filter(range(1, nb + 1), i ->
      coalesce(list_sum(list_transform(body[i:],
        x -> length(coalesce(x.content, '')))), 0) <= budget))
      AS cut
  FROM v)
SELECT conv_id,
  coalesce(array_to_string(list_transform(
    (CASE WHEN has_sys THEN m[1:1]
          ELSE CAST([] AS STRUCT(role VARCHAR, content VARCHAR)[])
     END) || body[cut:],
    x -> x.role || '=' || coalesce(x.content, '')), '|'), '')
    AS fit_sig,
  CAST(cut - 1 AS BIGINT) AS n_turns_dropped,
  CAST(sys_chars + coalesce(list_sum(list_transform(body[cut:],
    x -> length(coalesce(x.content, '')))), 0) AS BIGINT)
    AS chars_kept,
  sys_chars > 40 AS over_budget
FROM w
UNION ALL
SELECT conv_id, NULL, NULL, NULL, NULL
FROM conv WHERE m IS NULL
ORDER BY conv_id ASC""",
    doc="CONTEXT-BUDGET CONVERSATION TRUNCATION (operators/sft.py::"
    "truncate_conversation) — the SFT-prep step for dialogues longer"
    " than the model context: keep the leading system message plus"
    " the LONGEST SUFFIX of remaining turns fitting max_chars (the"
    " sliding-context recipe — recent turns carry the signal, a"
    " suffix cut never splits a turn); over_budget flags a system"
    " prefix alone exceeding the budget, NULL conversations pass"
    " through NULL. Planted: five shapes — system+6 turns, no-system,"
    " NULL, 60-char system over the 40 budget, empty. Scale: pure"
    " Catalyst array algebra (suffix sums via aggregate-over-slice,"
    " O(turns²) per row over tens of turns), map-only, no UDF."
    " Oracle: identical list-algebra truncation in DuckDB,"
    " hash-exact over the rendered fit signature",
)
def z101_truncate_conversation(spark, sf_dir):
    from topn_spark.operators.sft import truncate_conversation

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 300
    )
    d = F.col("doc_id")
    mk = lambda role, content: F.struct(  # noqa: E731
        role.alias("role"), content.alias("content")
    )
    sys_turn = mk(F.lit("system"), F.lit("sysABCDE"))
    body6 = F.transform(
        F.sequence(F.lit(1), F.lit(6)),
        lambda j: mk(
            F.when(j % 2 == 1, F.lit("user")).otherwise(
                F.lit("assistant")
            ),
            F.repeat(F.lit("a"), (F.lit(3) + (d + j) % 5).cast("int")),
        ),
    )
    body4 = F.transform(
        F.sequence(F.lit(1), F.lit(4)),
        lambda j: mk(
            F.when(j % 2 == 1, F.lit("user")).otherwise(
                F.lit("assistant")
            ),
            F.repeat(F.lit("b"), (F.lit(10) + d % 4).cast("int")),
        ),
    )
    mtype = "array<struct<role:string,content:string>>"
    m = (
        F.when(d % 5 == 0, F.concat(F.array(sys_turn), body6))
        .when(d % 5 == 1, body4)
        .when(d % 5 == 2, F.lit(None).cast(mtype))
        .when(
            d % 5 == 3,
            F.array(mk(F.lit("system"), F.repeat(F.lit("s"), 60))),
        )
        .otherwise(F.array().cast(mtype))
    )
    conv = docs.select(d.alias("conv_id"), m.alias("messages"))
    out = truncate_conversation(conv, max_chars=40)
    fit = F.col("messages_fit")
    sig = F.array_join(
        F.transform(
            fit,
            lambda x: F.concat(
                x["role"], F.lit("="), F.coalesce(x["content"], F.lit(""))
            ),
        ),
        "|",
    )
    return out.select(
        "conv_id",
        F.when(fit.isNotNull(), sig).alias("fit_sig"),
        "n_turns_dropped",
        "chars_kept",
        "over_budget",
    ).orderBy("conv_id")


@query(
    "z102_json_output_qc",
    r"""WITH s AS (
  SELECT doc_id,
    CASE doc_id % 6
      WHEN 0 THEN '{"answer": "yes", "confidence": 0.9}'
      WHEN 1 THEN '{"answer": "no"}'
      WHEN 2 THEN 'not json at all'
      WHEN 3 THEN '[1, 2, 3]'
      WHEN 4 THEN '"just a string"'
      ELSE NULL
    END AS response
  FROM documents WHERE doc_id < 300),
q AS (
  SELECT doc_id, response,
    CASE WHEN response IS NULL THEN NULL
         ELSE json_valid(response) END AS is_valid_json,
    CASE WHEN response IS NOT NULL AND json_valid(response)
              AND json_type(response) = 'OBJECT'
         THEN json_keys(response) END AS keys
  FROM s)
SELECT doc_id, response, is_valid_json,
  CASE WHEN response IS NULL THEN NULL
       ELSE keys IS NOT NULL END AS is_object,
  CASE WHEN response IS NULL THEN NULL
       ELSE coalesce(array_to_string(
         list_filter(['answer', 'confidence'],
           k -> keys IS NULL OR NOT list_contains(keys, k)), ','),
         '')
  END AS missing_sig,
  CASE WHEN response IS NULL THEN NULL
       ELSE keys IS NOT NULL AND len(list_filter(
         ['answer', 'confidence'],
         k -> NOT list_contains(keys, k))) = 0
  END AS qc_pass
FROM q ORDER BY doc_id ASC""",
    doc="STRUCTURED-OUTPUT QC (operators/sft.py::json_output_qc) —"
    " the validity gate for JSON-mode SFT data (function-calling /"
    " tool-use / extraction labels): is_valid_json (parses at all),"
    " is_object, missing_keys in contract order (ALL required keys"
    " when the response is not an object — none are reachable), and"
    " qc_pass; NULL responses keep NULL flags. Planted: object-"
    "complete / object-missing-key / invalid / array / scalar / NULL"
    " stripes (edge dialects like trailing commas differ between"
    " parsers and are deliberately absent — the gate's contract is"
    " Spark's parser). Scale: per-row JSON expressions, map-only, no"
    " UDF. Oracle: DuckDB json_valid/json_type/json_keys + identical"
    " list algebra, hash-exact",
)
def z102_json_output_qc(spark, sf_dir):
    from topn_spark.operators.sft import json_output_qc

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 300
    )
    d = F.col("doc_id")
    resp = (
        F.when(d % 6 == 0, F.lit('{"answer": "yes", "confidence": 0.9}'))
        .when(d % 6 == 1, F.lit('{"answer": "no"}'))
        .when(d % 6 == 2, F.lit("not json at all"))
        .when(d % 6 == 3, F.lit("[1, 2, 3]"))
        .when(d % 6 == 4, F.lit('"just a string"'))
    )
    base = docs.select("doc_id", resp.alias("response"))
    out = json_output_qc(
        base, required_keys=("answer", "confidence")
    )
    return out.select(
        "doc_id",
        "response",
        "is_valid_json",
        "is_object",
        F.when(
            F.col("missing_keys").isNotNull(),
            F.array_join("missing_keys", ","),
        ).alias("missing_sig"),
        "qc_pass",
    ).orderBy("doc_id")


@query(
    "z103_truncation_artifacts",
    r"""WITH s AS (
  SELECT doc_id,
    CASE doc_id % 6
      WHEN 0 THEN 'A complete sentence.'
      WHEN 1 THEN 'this one was cut off mid thou'
      WHEN 2 THEN 'some code ```python print(1) and no closing fence'
      WHEN 3 THEN 'an open (parenthesis here.'
      WHEN 4 THEN 'it just trails away...'
      ELSE NULL
    END AS response
  FROM documents WHERE doc_id < 300),
q AS (
  SELECT doc_id, response, rtrim(response) AS t,
    CAST((length(response) - length(replace(response, '```', '')))
         / 3 AS BIGINT) AS fences,
    (length(response) - length(replace(response, '(', '')))
      - (length(response) - length(replace(response, ')', '')))
      AS paren_diff,
    (length(response) - length(replace(response, '[', '')))
      - (length(response) - length(replace(response, ']', '')))
      AS sq_diff,
    (length(response) - length(replace(response, '{', '')))
      - (length(response) - length(replace(response, '}', '')))
      AS br_diff
  FROM s)
SELECT doc_id, response,
  CASE WHEN response IS NULL THEN NULL
       WHEN length(t) = 0 THEN TRUE
       ELSE strpos('.!?"'')]}`', substr(t, length(t), 1)) = 0
  END AS ends_mid_sentence,
  CASE WHEN response IS NULL THEN NULL
       ELSE fences % 2 <> 0 END AS unbalanced_fence,
  CASE WHEN response IS NULL THEN NULL
       ELSE paren_diff <> 0 OR sq_diff <> 0 OR br_diff <> 0
  END AS unbalanced_brackets,
  CASE WHEN response IS NULL THEN NULL
       ELSE t LIKE '%...' OR t LIKE '%…' END AS trailing_ellipsis,
  CASE WHEN response IS NULL THEN NULL
       ELSE (CASE WHEN length(t) = 0 THEN TRUE
             ELSE strpos('.!?"'')]}`', substr(t, length(t), 1)) = 0
             END)
         OR fences % 2 <> 0
         OR paren_diff <> 0 OR sq_diff <> 0 OR br_diff <> 0
         OR t LIKE '%...' OR t LIKE '%…'
  END AS truncation_flag
FROM q ORDER BY doc_id ASC""",
    doc="TRUNCATED-GENERATION DETECTOR (operators/sft.py::"
    "truncation_artifacts) — the SFT label-QC rules for responses"
    " CUT OFF rather than completed (training on them teaches the"
    " model to stop mid-sentence): ends_mid_sentence (last"
    " non-space char not a terminator; empty unterminated),"
    " unbalanced ``` fences, mismatched ()/[]/{} counts (the cheap"
    " corpus-scan proxy), trailing ellipsis, OR-combined flag; NULL"
    " responses keep NULL flags. Planted: six stripes, one per"
    " artifact class. Scale: codegen'd length/replace/substr"
    " arithmetic, map-only, no UDF. Oracle: identical string ops in"
    " DuckDB, hash-exact",
)
def z103_truncation_artifacts(spark, sf_dir):
    from topn_spark.operators.sft import truncation_artifacts

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 300
    )
    d = F.col("doc_id")
    resp = (
        F.when(d % 6 == 0, F.lit("A complete sentence."))
        .when(d % 6 == 1, F.lit("this one was cut off mid thou"))
        .when(
            d % 6 == 2,
            F.lit("some code ```python print(1) and no closing fence"),
        )
        .when(d % 6 == 3, F.lit("an open (parenthesis here."))
        .when(d % 6 == 4, F.lit("it just trails away..."))
    )
    base = docs.select("doc_id", resp.alias("response"))
    return truncation_artifacts(base).orderBy("doc_id")


@query(
    "z104_control_token_scan",
    r"""WITH s AS (
  SELECT doc_id,
    CASE doc_id % 4
      WHEN 0 THEN 'a clean answer with no markup'
      WHEN 1 THEN 'leaked <|im_start|>assistant header twice '
                  || '<|im_start|>'
      WHEN 2 THEN 'stray terminator <|endoftext|> inside'
      ELSE NULL
    END AS response
  FROM documents WHERE doc_id < 300),
q AS (
  SELECT doc_id, response,
    CAST((length(response)
      - length(replace(response, '<|im_start|>', ''))) / 12
      AS BIGINT) AS n_im_start,
    CAST((length(response)
      - length(replace(response, '<|im_end|>', ''))) / 10
      AS BIGINT) AS n_im_end,
    CAST((length(response)
      - length(replace(response, '<|endoftext|>', ''))) / 13
      AS BIGINT) AS n_endoftext
  FROM s)
SELECT doc_id, response, n_im_start, n_im_end, n_endoftext,
  n_im_start + n_im_end + n_endoftext AS n_control_tokens,
  (n_im_start + n_im_end + n_endoftext) > 0 AS control_flag
FROM q ORDER BY doc_id ASC""",
    doc="TEMPLATE-INJECTION SCAN (operators/sft.py::"
    "control_token_scan) — content CONTAINING chat-template control"
    " tokens (upstream serialization bug, scraped chat log, or"
    " prompt injection; training on it teaches emitting/obeying"
    " stray control tokens): per-token occurrence counts +"
    " n_control_tokens + control_flag, NULL text observable."
    " Planted: clean / double-im_start / endoftext / NULL stripes."
    " Scale: one codegen'd length/replace count per token, map-only."
    " Oracle: identical arithmetic in DuckDB, hash-exact",
)
def z104_control_token_scan(spark, sf_dir):
    from topn_spark.operators.sft import control_token_scan

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 300
    )
    d = F.col("doc_id")
    resp = (
        F.when(d % 4 == 0, F.lit("a clean answer with no markup"))
        .when(
            d % 4 == 1,
            F.lit(
                "leaked <|im_start|>assistant header twice "
                "<|im_start|>"
            ),
        )
        .when(d % 4 == 2, F.lit("stray terminator <|endoftext|> inside"))
    )
    base = docs.select("doc_id", resp.alias("response"))
    return control_token_scan(base).orderBy("doc_id")


@query(
    "z105_prompt_echo",
    f"""WITH s AS (
  SELECT doc_id,
    'please summarize the quick brown fox jumps over the lazy dog'
      AS prompt,
    CASE doc_id % 4
      WHEN 0 THEN 'the quick brown fox jumps over the lazy dog'
      WHEN 1 THEN 'a concise novel answer about canine behavior '
                  || 'patterns entirely'
      WHEN 2 THEN 'ok sure'
      ELSE NULL
    END AS response
  FROM documents WHERE doc_id < 300),
g AS (
  SELECT doc_id, prompt, response,
    CASE WHEN len({_TOKS_DUCK.replace('text', 'prompt')}) >= 3
      THEN list_distinct([array_to_string(
        {_TOKS_DUCK.replace('text', 'prompt')}[i:i+2], ' ')
        for i in generate_series(1,
          len({_TOKS_DUCK.replace('text', 'prompt')}) - 2)])
      ELSE [] END AS pg,
    CASE WHEN len({_TOKS_DUCK.replace('text', 'response')}) >= 3
      THEN list_distinct([array_to_string(
        {_TOKS_DUCK.replace('text', 'response')}[i:i+2], ' ')
        for i in generate_series(1,
          len({_TOKS_DUCK.replace('text', 'response')}) - 2)])
      ELSE [] END AS rg
  FROM s)
SELECT doc_id, response,
  CASE WHEN prompt IS NULL OR response IS NULL THEN NULL
       ELSE ROUND(CAST(len(list_filter(rg,
              x -> list_contains(pg, x))) AS DOUBLE)
            / NULLIF(CAST(len(rg) AS DOUBLE), 0), 6)
  END AS echo_score,
  CASE WHEN prompt IS NULL OR response IS NULL
         OR len(rg) = 0 THEN NULL
       ELSE ROUND(CAST(len(list_filter(rg,
              x -> list_contains(pg, x))) AS DOUBLE)
            / CAST(len(rg) AS DOUBLE), 6) >= 0.5
  END AS echoed
FROM g ORDER BY doc_id ASC""",
    doc="PROMPT-PARROTING DETECTOR (operators/sft.py::"
    "prompt_echo_score) — the degenerate-SFT-pair rule: a response"
    " that mostly REPEATS the prompt carries no training signal;"
    " echo_score = fraction of the response's distinct word 3-grams"
    " also in the prompt (ROUND 6), echoed at >= 0.5; sub-3-token"
    " responses keep a NULL score (too short to judge). Planted:"
    " verbatim-echo / novel / too-short / NULL stripes. Scale:"
    " row-local distinct-shingle arrays + array_intersect — pure"
    " Catalyst, map-only (contrast z96, which needs corpus-wide"
    " frequencies). Oracle: identical list algebra in DuckDB,"
    " hash-exact",
)
def z105_prompt_echo(spark, sf_dir):
    from topn_spark.operators.sft import prompt_echo_score

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 300
    )
    d = F.col("doc_id")
    resp = (
        F.when(
            d % 4 == 0,
            F.lit("the quick brown fox jumps over the lazy dog"),
        )
        .when(
            d % 4 == 1,
            F.lit(
                "a concise novel answer about canine behavior "
                "patterns entirely"
            ),
        )
        .when(d % 4 == 2, F.lit("ok sure"))
    )
    base = docs.select(
        "doc_id",
        F.lit(
            "please summarize the quick brown fox jumps over the"
            " lazy dog"
        ).alias("prompt"),
        resp.alias("response"),
    )
    return prompt_echo_score(base).select(
        "doc_id", "response", "echo_score", "echoed"
    ).orderBy("doc_id")


@query(
    "z106_attrition_funnel",
    f"""WITH q AS (
  SELECT doc_id, source, text,
    ROUND(CAST(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g'))
          AS DOUBLE) / NULLIF(CAST(LENGTH(text) AS DOUBLE), 0), 6)
      AS alpha_ratio,
    ROUND(CAST(LENGTH(text)
          - LENGTH(regexp_replace(text, '[^ ]', '', 'g')) AS DOUBLE)
          / NULLIF(CAST(len({_TOKS_DUCK}) AS DOUBLE), 0), 6)
      AS mean_word_len,
    len({_TOKS_DUCK}) AS _nt
  FROM documents),
f AS (
  SELECT source,
    COALESCE(_nt >= 10 AND alpha_ratio >= 0.6
             AND mean_word_len BETWEEN 2.0 AND 12.0, FALSE)
      AS k1,
    COALESCE(doc_id = MIN(doc_id) OVER (
      PARTITION BY COALESCE(md5(text), 'NULL')), FALSE) AS k2,
    COALESCE(substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '80',
             FALSE) AS k3
  FROM q),
c AS (
  SELECT source,
    CAST(COUNT(*) AS BIGINT) AS s0,
    CAST(SUM(CASE WHEN k1 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
    CAST(SUM(CASE WHEN k1 AND k2 THEN 1 ELSE 0 END) AS BIGINT)
      AS s2,
    CAST(SUM(CASE WHEN k1 AND k2 AND k3 THEN 1 ELSE 0 END)
      AS BIGINT) AS s3
  FROM f GROUP BY source),
u AS (
  SELECT source, 0 AS stage, 'input' AS stage_name, s0 AS n_docs,
         s0 AS inp FROM c
  UNION ALL
  SELECT source, 1, 'quality_keep', s1, s0 FROM c
  UNION ALL
  SELECT source, 2, 'is_keeper', s2, s0 FROM c
  UNION ALL
  SELECT source, 3, 'sampled', s3, s0 FROM c)
SELECT source, CAST(stage AS INT) AS stage, stage_name, n_docs,
  ROUND(CAST(n_docs AS DOUBLE)
        / NULLIF(CAST(inp AS DOUBLE), 0), 6) AS frac_of_input
FROM u ORDER BY source ASC, stage ASC""",
    doc="PIPELINE ATTRITION FUNNEL (operators/pipeline.py::"
    "attrition_report) — THE table every data paper publishes"
    " (RefinedWeb Table 2, the FineWeb step plot): per source, how"
    " many documents survive each successive gate — here the real"
    " composition quality_keep (add_quality, the x03 rules) →"
    " exact-dedup keeper (dedup_lineage, the z93 rule) → md5"
    " hash-sample gate — as cumulative-AND counts and ROUND-6"
    " fractions of input, with stage 0 = raw and NULL flags counted"
    " as not-surviving (an abstaining gate admitted nothing). Scale:"
    " the flags are the upstream operators' own shapes; the funnel"
    " itself is ONE map-side-combinable agg computing every"
    " cumulative sum in the same pass + a literal stack unpivot —"
    " report-sized output. Oracle: identical x03 quality fragment +"
    " keeper window + CASE funnel in DuckDB, hash-exact",
)
def z106_attrition_funnel(spark, sf_dir):
    from topn_spark.operators.dedup import dedup_lineage
    from topn_spark.operators.pipeline import attrition_report
    from topn_spark.operators.textstats import add_quality

    docs = load_table(spark, sf_dir, "documents")
    flagged = add_quality(docs).select(
        "doc_id", "source", "quality_keep"
    )
    lineage = dedup_lineage(docs).select("doc_id", "is_keeper")
    sampled = (
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
        < "80"
    )
    base = flagged.join(lineage, "doc_id").withColumn(
        "sampled", sampled
    )
    return attrition_report(
        base,
        ["quality_keep", "is_keeper", "sampled"],
        group_col="source",
    ).orderBy("source", "stage")


@query(
    "z107_split_doc_pairs",
    r"""WITH d AS (
  SELECT doc_id,
    array_to_string(list_transform(
      CASE WHEN doc_id % 2 = 0 THEN range(0, 12)
           ELSE range(4, 20) END,
      i -> 'w' || i || 'g' || (doc_id // 2)), ' ') AS text
  FROM documents WHERE doc_id < 200),
t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
  FROM d),
k AS (
  SELECT doc_id,
    CASE WHEN len(w) >= 8
         THEN md5(array_to_string(w[1:8], ' ')) END AS head,
    CASE WHEN len(w) >= 8
         THEN md5(array_to_string(w[len(w)-7:len(w)], ' ')) END
      AS tail
  FROM t)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.tail AS boundary
FROM k a JOIN k b
  ON a.tail = b.head AND a.doc_id <> b.doc_id
ORDER BY id_a ASC, id_b ASC""",
    doc="SPLIT-DOCUMENT STITCHING CANDIDATES (operators/dedup.py::"
    "split_doc_pairs) — web corpora carry ONE article as several"
    " rows (pagination, scraper chunking, chunk_documents overlap):"
    " piece A's last k tokens equalling piece B's first k makes B"
    " the continuation candidate, with the boundary gram riding for"
    " audit; sub-k docs emit no keys, self-matches excluded."
    " Planted: 100 pairs — even doc = tokens 0..11, odd = 4..19 of"
    " the same group salt, so tail-8(even) == head-8(odd) exactly"
    " within each pair. Scale: two map-only md5 key projections +"
    " ONE tail->head equi-join (the exact-dedup join class, never"
    " all-pairs; a viral footer boundary is AQE skew-join"
    " territory). Oracle: identical slice/md5/join SQL in DuckDB,"
    " hash-exact",
)
def z107_split_doc_pairs(spark, sf_dir):
    from topn_spark.operators.dedup import split_doc_pairs

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 200
    )
    d = F.col("doc_id")
    g = (d / 2).cast("bigint").cast("string")
    rng = F.when(
        d % 2 == 0, F.sequence(F.lit(0), F.lit(11))
    ).otherwise(F.sequence(F.lit(4), F.lit(19)))
    text = F.array_join(
        F.transform(
            rng,
            lambda i: F.concat(
                F.lit("w"), i.cast("string"), F.lit("g"), g
            ),
        ),
        " ",
    )
    pieces = docs.select(d.alias("doc_id"), text.alias("text"))
    return split_doc_pairs(pieces, k=8).orderBy("id_a", "id_b")


@query(
    "z108_table_signals",
    r"""WITH s AS (
  SELECT doc_id,
    CASE doc_id % 6
      WHEN 0 THEN 'ordinary prose about nothing numeric at all'
      WHEN 1 THEN 'q1 2024 7581 9213 4417 total 21211 up 14 pct'
      WHEN 2 THEN '| name | qty | price |' || chr(10)
                  || '| bolt | 12 | 0.30 |' || chr(10)
                  || '| nut | 7 | 0.10 |'
      WHEN 3 THEN '1. first item' || chr(10) || '2. second item'
                  || chr(10) || 'a closing prose line'
      WHEN 4 THEN ''
      ELSE NULL
    END AS text
  FROM documents WHERE doc_id < 300),
q AS (
  SELECT doc_id, text,
    length(text) AS nc,
    length(regexp_replace(text, '[^0-9]', '', 'g')) AS nd,
    CAST(length(text) - length(replace(text, '|', ''))
      AS BIGINT) AS n_pipes,
    CAST(length(text) - length(replace(text, chr(9), ''))
      AS BIGINT) AS n_tabs,
    list_filter(string_split(text, chr(10)),
      ln -> length(trim(ln)) > 0) AS lines
  FROM s),
r AS (
  SELECT doc_id, text, n_pipes, n_tabs,
    ROUND(CAST(nd AS DOUBLE) / NULLIF(CAST(nc AS DOUBLE), 0), 6)
      AS digit_ratio,
    ROUND(CAST(len(list_filter(lines, ln ->
        regexp_matches(substr(ltrim(ln), 1, 1), '^[0-9]$')))
      AS DOUBLE) / NULLIF(CAST(len(lines) AS DOUBLE), 0), 6)
      AS numeric_line_frac,
    nc
  FROM q)
SELECT doc_id, text,
  CASE WHEN text IS NULL OR nc = 0 THEN NULL
       ELSE digit_ratio END AS digit_ratio,
  CASE WHEN text IS NULL OR nc = 0 THEN NULL
       ELSE n_pipes END AS n_pipes,
  CASE WHEN text IS NULL OR nc = 0 THEN NULL
       ELSE n_tabs END AS n_tabs,
  CASE WHEN text IS NULL OR nc = 0 THEN NULL
       ELSE numeric_line_frac END AS numeric_line_frac,
  CASE WHEN text IS NULL OR nc = 0 THEN NULL
       ELSE coalesce(digit_ratio, 0) >= 0.25 OR n_pipes >= 10
            OR coalesce(numeric_line_frac, 0) >= 0.5
  END AS table_like
FROM r ORDER BY doc_id ASC""",
    doc="TABLE-/DATA-DUMP DETECTION (operators/textstats.py::"
    "table_signals) — the quality-routing rule for documents that"
    " are mostly numbers or grid markup (price lists, CSV dumps:"
    " prose filters mis-score them, so recipes drop or route them):"
    " digit_ratio, pipe/tab counts, numeric-leading-line fraction,"
    " OR-combined table_like; NULL/empty text keeps NULL signals."
    " Planted: prose / digit-heavy / pipe-table / numbered-list /"
    " empty / NULL stripes. Scale: codegen'd regexp/length/split"
    " arithmetic, map-only. Oracle: identical string ops in DuckDB,"
    " hash-exact",
)
def z108_table_signals(spark, sf_dir):
    from topn_spark.operators.textstats import table_signals

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 300
    )
    d = F.col("doc_id")
    nl = "\n"
    text = (
        F.when(
            d % 6 == 0,
            F.lit("ordinary prose about nothing numeric at all"),
        )
        .when(
            d % 6 == 1,
            F.lit("q1 2024 7581 9213 4417 total 21211 up 14 pct"),
        )
        .when(
            d % 6 == 2,
            F.lit(
                "| name | qty | price |" + nl
                + "| bolt | 12 | 0.30 |" + nl
                + "| nut | 7 | 0.10 |"
            ),
        )
        .when(
            d % 6 == 3,
            F.lit(
                "1. first item" + nl + "2. second item" + nl
                + "a closing prose line"
            ),
        )
        .when(d % 6 == 4, F.lit(""))
    )
    base = docs.select("doc_id", text.alias("text"))
    return table_signals(base).orderBy("doc_id")


@query(
    "z109_canonical_url",
    r"""WITH s AS (
  SELECT doc_id,
    CASE doc_id % 8
      WHEN 0 THEN 'http://Site-' || (doc_id // 8)
                  || '.com/a/?utm_source=x&b=2&a=1#frag'
      WHEN 1 THEN 'http://site-' || (doc_id // 8) || '.com:80/a?a=1&b=2'
      WHEN 2 THEN 'https://x-' || (doc_id // 8) || '.org:443/'
      WHEN 3 THEN 'https://x-' || (doc_id // 8)
                  || '.org/p?gclid=99&ref=h&z=1'
      WHEN 4 THEN 'https://x-' || (doc_id // 8) || '.org'
      WHEN 5 THEN 'not a url ' || doc_id
      WHEN 6 THEN NULL
      ELSE 'http://site-' || (doc_id // 8) || '.com/a'
    END AS url
  FROM documents WHERE doc_id < 400),
p AS (
  SELECT doc_id, url,
    regexp_matches(url, '^[A-Za-z][A-Za-z0-9+.-]*://') AS valid,
    lower(regexp_extract(url,
      '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
    lower(regexp_extract(url,
      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS host0,
    regexp_extract(url,
      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path0,
    coalesce(regexp_extract(url,
      '^[A-Za-z][A-Za-z0-9+.-]*://[^?#]*\?([^#]*)', 1), '')
      AS query0
  FROM s),
h AS (
  SELECT doc_id, url, valid, scheme,
    CASE WHEN scheme = 'http' AND host0 LIKE '%:80'
         THEN substr(host0, 1, length(host0) - 3)
         WHEN scheme = 'https' AND host0 LIKE '%:443'
         THEN substr(host0, 1, length(host0) - 4)
         ELSE host0 END AS host,
    CASE WHEN length(path0) > 1 AND path0 LIKE '%/'
         THEN substr(path0, 1, length(path0) - 1)
         WHEN path0 = '' THEN '/'
         ELSE path0 END AS path,
    coalesce(array_to_string(list_sort(list_filter(
      string_split(query0, '&'),
      q -> length(q) > 0 AND NOT starts_with(q, 'utm_')
        AND string_split(q, '=')[1] NOT IN
          ('gclid', 'fbclid', 'ref', 'mc_cid', 'mc_eid'))), '&'),
      '') AS qc
  FROM p)
SELECT doc_id, url,
  CASE WHEN url IS NULL THEN NULL
       WHEN NOT valid THEN url
       ELSE scheme || '://' || host || path
            || CASE WHEN qc <> '' THEN '?' || qc ELSE '' END
  END AS canonical_url
FROM h ORDER BY doc_id ASC""",
    doc="URL CANONICALIZATION (operators/pipeline.py::"
    "canonical_url) — why naive URL-exact dedup under-merges: the"
    " same page arrives as http://Site.com/a/?utm_source=x#frag and"
    " http://site.com/a; lowercase scheme+host, strip fragment and"
    " default ports, drop tracking params (utm_*, click ids, ref),"
    " SORT surviving params, strip one trailing slash on non-root"
    " paths, normalize an EMPTY path to '/' (http://site.com and"
    " http://site.com/ are the same root page — both forms must"
    " merge); malformed URLs pass through unchanged (canonicalizing"
    " garbage forges collisions). Planted: eight stripes per group"
    " whose first/second/eighth variants collapse to ONE canonical"
    " key and whose bare-root/port-443-root variants collapse to"
    " another. Scale: chained codegen'd regexp/split/array projections,"
    " map-only. Oracle: identical regexp/list SQL in DuckDB,"
    " hash-exact",
)
def z109_canonical_url(spark, sf_dir):
    from topn_spark.operators.pipeline import canonical_url

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 400
    )
    d = F.col("doc_id")
    g = (d / 8).cast("bigint").cast("string")
    url = (
        F.when(
            d % 8 == 0,
            F.concat(
                F.lit("http://Site-"), g,
                F.lit(".com/a/?utm_source=x&b=2&a=1#frag"),
            ),
        )
        .when(
            d % 8 == 1,
            F.concat(
                F.lit("http://site-"), g, F.lit(".com:80/a?a=1&b=2")
            ),
        )
        .when(
            d % 8 == 2,
            F.concat(F.lit("https://x-"), g, F.lit(".org:443/")),
        )
        .when(
            d % 8 == 3,
            F.concat(
                F.lit("https://x-"), g,
                F.lit(".org/p?gclid=99&ref=h&z=1"),
            ),
        )
        .when(
            d % 8 == 4,
            F.concat(F.lit("https://x-"), g, F.lit(".org")),
        )
        .when(
            d % 8 == 5,
            F.concat(F.lit("not a url "), d.cast("string")),
        )
        .when(d % 8 == 6, F.lit(None).cast("string"))
        .otherwise(
            F.concat(F.lit("http://site-"), g, F.lit(".com/a"))
        )
    )
    base = docs.select("doc_id", url.alias("url"))
    return canonical_url(base).orderBy("doc_id")


@query(
    "z110_parallel_page_pairs",
    r"""WITH s AS (
  SELECT doc_id,
    CASE doc_id % 8
      WHEN 0 THEN 'https://en.site-' || (doc_id // 8) || '.com/about'
      WHEN 1 THEN 'https://fr.site-' || (doc_id // 8) || '.com/about'
      WHEN 2 THEN 'https://site-' || (doc_id // 8) || '.com/de/about'
      WHEN 3 THEN 'https://site-' || (doc_id // 8) || '.com/about'
      WHEN 4 THEN 'https://other-' || (doc_id // 8) || '.org/page'
      WHEN 5 THEN 'https://other-' || (doc_id // 8) || '.org/page'
      WHEN 6 THEN NULL
      ELSE 'not a url ' || doc_id
    END AS url,
    CASE doc_id % 8 WHEN 0 THEN 'en' WHEN 1 THEN 'fr'
      WHEN 2 THEN 'de' WHEN 3 THEN 'zh' WHEN 4 THEN 'en'
      WHEN 5 THEN 'en' WHEN 6 THEN 'ja' ELSE 'ko' END AS lang
  FROM documents WHERE doc_id < 400),
k AS (
  SELECT doc_id, lang,
    md5(regexp_replace(regexp_replace(url,
      '^([a-z][a-z0-9+.-]*://)(?:en|fr|de|es|zh|it|pt|ru|ja|ko)\.',
      '\1'),
      '^([a-z][a-z0-9+.-]*://[^/]*)/(?:en|fr|de|es|zh|it|pt|ru|ja|ko)(/|$)',
      '\1\2')) AS page_key
  FROM s WHERE url IS NOT NULL)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  a.lang AS lang_a, b.lang AS lang_b, a.page_key
FROM k a JOIN k b
  ON a.page_key = b.page_key AND a.doc_id < b.doc_id
     AND a.lang <> b.lang
ORDER BY id_a ASC, id_b ASC""",
    doc="BITEXT CANDIDATE MINING FROM URL STRUCTURE (operators/"
    "pipeline.py::parallel_page_pairs) — the ParaCrawl/WMT"
    " heuristic: a site publishes the SAME page under"
    " en.site.com/about and fr.site.com/about (or /en/ vs /fr/ path"
    " prefixes); canonicalize (z109), strip one language subdomain"
    " label and one language path segment, join documents sharing"
    " the language-neutral page key with DIFFERENT langs — the raw"
    " material of parallel corpora. Planted: 50 groups of"
    " subdomain-/path-/bare-variant pages (6 cross-lang pairs each),"
    " a same-lang duplicate pair the lang predicate excludes, NULL"
    " and malformed URLs. Scale: map-only canonicalize+key"
    " projections + ONE md5-key equi self-join (exact-dedup class;"
    " a template page across every locale is AQE skew territory)."
    " Oracle: identical regexp strips + join in DuckDB (inputs"
    " planted canonical, so the z109 chain is identity), hash-exact",
)
def z110_parallel_page_pairs(spark, sf_dir):
    from topn_spark.operators.pipeline import parallel_page_pairs

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 400
    )
    d = F.col("doc_id")
    g = (d / 8).cast("bigint").cast("string")
    url = (
        F.when(d % 8 == 0,
               F.concat(F.lit("https://en.site-"), g, F.lit(".com/about")))
        .when(d % 8 == 1,
              F.concat(F.lit("https://fr.site-"), g, F.lit(".com/about")))
        .when(d % 8 == 2,
              F.concat(F.lit("https://site-"), g, F.lit(".com/de/about")))
        .when(d % 8 == 3,
              F.concat(F.lit("https://site-"), g, F.lit(".com/about")))
        .when(d % 8 == 4,
              F.concat(F.lit("https://other-"), g, F.lit(".org/page")))
        .when(d % 8 == 5,
              F.concat(F.lit("https://other-"), g, F.lit(".org/page")))
        .when(d % 8 == 6, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("not a url "), d.cast("string")))
    )
    lang = (
        F.when(d % 8 == 0, F.lit("en")).when(d % 8 == 1, F.lit("fr"))
        .when(d % 8 == 2, F.lit("de")).when(d % 8 == 3, F.lit("zh"))
        .when(d % 8 == 4, F.lit("en")).when(d % 8 == 5, F.lit("en"))
        .when(d % 8 == 6, F.lit("ja")).otherwise(F.lit("ko"))
    )
    base = docs.select(
        "doc_id", url.alias("url"), lang.alias("lang")
    )
    return parallel_page_pairs(base).orderBy("id_a", "id_b")


@query(
    "z111_k_anonymity",
    r"""SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS group_size,
  COUNT(*) < 30 AS at_risk
FROM documents GROUP BY lang, source
ORDER BY lang ASC, source ASC""",
    doc="K-ANONYMITY RELEASE GATE (operators/pipeline.py::"
    "k_anonymity_check; Sweeney 2002) — the privacy audit a tabular"
    " training set or a corpus metadata sidecar needs before"
    " release: a quasi-identifier combination shared by fewer than"
    " k rows re-identifies a person under an outside join; one row"
    " per combination with group_size and at_risk = size < k (the"
    " generalize-or-drop worklist). Run here over the REAL (lang,"
    " source) metadata at k=30, no planting. Scale: ONE map-side-"
    "combinable hash agg over the quasi-identifier key — the"
    " word-count shape, output = distinct combinations. Oracle:"
    " identical GROUP BY in DuckDB, hash-exact",
)
def z111_k_anonymity(spark, sf_dir):
    from topn_spark.operators.pipeline import k_anonymity_check

    docs = load_table(spark, sf_dir, "documents")
    return k_anonymity_check(docs, ["lang", "source"], k=30).orderBy(
        "lang", "source"
    )


@query(
    "z112_group_zscore",
    r"""WITH s AS (
  SELECT (doc_id // 5) AS prompt_id, doc_id AS sample_id,
    CASE WHEN doc_id % 11 = 10 THEN NULL
         WHEN (doc_id // 5) % 9 = 8 THEN CAST(4 AS DOUBLE)
         ELSE CAST((doc_id * 13) % 17 AS DOUBLE) END AS score
  FROM documents WHERE doc_id < 400),
g AS (
  SELECT prompt_id,
    CAST(COUNT(score) AS BIGINT) AS n_valid,
    AVG(score) AS score_mean,
    STDDEV_SAMP(score) AS score_std
  FROM s GROUP BY prompt_id)
SELECT s.prompt_id, s.sample_id, s.score,
  g.n_valid,
  ROUND(g.score_mean, 6) AS mean_r,
  ROUND(g.score_std, 6) AS std_r,
  CASE WHEN s.score IS NOT NULL AND g.n_valid >= 2
            AND g.score_std IS NOT NULL AND g.score_std > 0
       THEN ROUND((s.score - g.score_mean) / g.score_std, 6)
  END AS z_r
FROM s JOIN g USING (prompt_id)
ORDER BY sample_id ASC""",
    doc="PER-PROMPT REWARD NORMALIZATION (operators/sft.py::"
    "group_zscore) — the step between reward scoring and pairing/"
    "weighting (GRPO-style advantages, best-of-n weighting: raw"
    " reward scales drift across prompts and RM versions; what"
    " matters is the score's position WITHIN its prompt's samples):"
    " (score - group mean)/group sample-stddev with auditable group"
    " stats; <2 valid scores or zero variance keep NULL z —"
    " observable, never forged as 0. Planted: integer scores (sums"
    " of squares exact in IEEE, so the ROUND-6 mean/std/z are"
    " engine-stable) with NULL stripes and one forced-constant"
    " prompt stripe. Scale: ONE map-side-combinable per-prompt agg"
    " + the equi-join back — the kto_labels shape, no window."
    " Oracle: identical AVG/STDDEV_SAMP/CASE SQL in DuckDB,"
    " hash-exact on the ROUND-6 projections",
)
def z112_group_zscore(spark, sf_dir):
    from topn_spark.operators.sft import group_zscore

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 400
    )
    d = F.col("doc_id")
    p = (d / 5).cast("bigint")
    score = (
        F.when(d % 11 == 10, F.lit(None).cast("double"))
        .when(p % 9 == 8, F.lit(4.0))
        .otherwise(((d * 13) % 17).cast("double"))
    )
    samples = docs.select(
        p.alias("prompt_id"), d.alias("sample_id"),
        score.alias("score"),
    )
    out = group_zscore(samples)
    return out.select(
        "prompt_id", "sample_id", "score", "n_valid",
        F.round("score_mean", 6).alias("mean_r"),
        F.round("score_std", 6).alias("std_r"),
        F.round("score_z", 6).alias("z_r"),
    ).orderBy("sample_id")


@query(
    "z113_pairwise_winrate",
    r"""WITH s AS (
  SELECT (doc_id // 8) AS prompt_id,
    'm' || (doc_id % 4) AS model, doc_id AS sample_id,
    CASE WHEN doc_id % 4 = 3 AND (doc_id // 8) % 3 = 0 THEN NULL
         ELSE CAST((doc_id * 7) % 29 AS DOUBLE)
           + CASE doc_id % 4 WHEN 0 THEN 10 ELSE 0 END
    END AS score
  FROM documents WHERE doc_id < 480),
best AS (
  SELECT prompt_id, model, MAX(score) AS s
  FROM s WHERE score IS NOT NULL GROUP BY prompt_id, model)
SELECT a.model AS model_a, b.model AS model_b,
  CAST(COUNT(*) AS BIGINT) AS n_prompts,
  CAST(SUM(CASE WHEN a.s > b.s THEN 1 ELSE 0 END) AS BIGINT)
    AS wins_a,
  CAST(SUM(CASE WHEN a.s < b.s THEN 1 ELSE 0 END) AS BIGINT)
    AS wins_b,
  CAST(SUM(CASE WHEN a.s = b.s THEN 1 ELSE 0 END) AS BIGINT)
    AS ties,
  ROUND((SUM(CASE WHEN a.s > b.s THEN 1 ELSE 0 END)
         + SUM(CASE WHEN a.s = b.s THEN 1 ELSE 0 END) / 2.0)
        / COUNT(*), 6) AS win_rate_a
FROM best a JOIN best b
  ON a.prompt_id = b.prompt_id AND a.model < b.model
GROUP BY a.model, b.model
ORDER BY model_a ASC, model_b ASC""",
    doc="PAIRWISE WIN-RATE MATRIX (operators/sft.py::"
    "pairwise_winrate) — the arena-style head-to-head readout for"
    " multi-model preference data, read before any Elo/Bradley-"
    "Terry fit: per model pair over SHARED scored prompts, wins/"
    "losses/ties and ROUND-6 win_rate_a with ties counting half;"
    " multiple samples of one model on a prompt reduce to its BEST"
    " score first (the best-of-n convention). Planted: 4 models x"
    " 60 prompts with model m0 given a +10 offset (dominates every"
    " pair) and an m3 NULL stripe (shared-prompt counts drop"
    " observably). Scale: one (prompt, model) max-agg, ONE prompt-"
    "keyed self-join that explodes in MODELS (a handful) never"
    " prompts, one k²-sized report agg. Oracle: identical max/join/"
    "CASE SQL in DuckDB, hash-exact",
)
def z113_pairwise_winrate(spark, sf_dir):
    from topn_spark.operators.sft import pairwise_winrate

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 480
    )
    d = F.col("doc_id")
    p = (d / 8).cast("bigint")
    score = F.when(
        (d % 4 == 3) & (p % 3 == 0), F.lit(None).cast("double")
    ).otherwise(
        ((d * 7) % 29).cast("double")
        + F.when(d % 4 == 0, F.lit(10.0)).otherwise(F.lit(0.0))
    )
    samples = docs.select(
        p.alias("prompt_id"),
        F.concat(F.lit("m"), (d % 4).cast("string")).alias("model"),
        d.alias("sample_id"),
        score.alias("score"),
    )
    return pairwise_winrate(samples).orderBy("model_a", "model_b")


@query(
    "z114_token_vocab",
    r"""WITH t AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
    AS token
  FROM documents WHERE doc_id < 400),
c AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY token)
SELECT token, token_id, n FROM (
  SELECT token,
    CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token ASC) + 1
      AS BIGINT) AS token_id,
    n
  FROM c
  UNION ALL
  SELECT v.token, CAST(v.sid AS BIGINT), CAST(0 AS BIGINT)
  FROM (VALUES ('<pad>', 0), ('</s>', 1)) AS v(token, sid))
ORDER BY token_id ASC""",
    doc="DENSE TOKEN-ID VOCABULARY (operators/binshard.py::"
    "token_vocab) — the id-assignment step between a string"
    " tokenizer (apply_bpe / bpe_loss_mask emit subtoken STRINGS)"
    " and trainer-native binary export (which needs integer ids):"
    " specials take ids 0..k-1 in the given order (pad first, so id"
    " 0 is the pad id), then corpus tokens by count DESC, token ASC"
    " — deterministic across runs/engines; a special also present"
    " in the corpus keeps ONE id. Planted: the real corpus under"
    " the engine token rule plus two unseen specials. Scale: one"
    " token explode into a map-side-combinable hash agg (output ="
    " vocabulary, sublinear in corpus size) then the two-phase"
    " bucketed exact rank — NO keyless window, the vocab sort stays"
    " parallel at any vocabulary size. Oracle: count + ROW_NUMBER"
    " + specials UNION in DuckDB, hash-exact",
)
def z114_token_vocab(spark, sf_dir):
    from topn_spark.operators.binshard import token_vocab
    from topn_spark.operators.textstats import tokens

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 400)
        .select(tokens("text").alias("tokens"))
    )
    return token_vocab(docs, specials=("<pad>", "</s>")).orderBy(
        "token_id"
    )


@query(
    "z115_encode_token_ids",
    r"""WITH d AS (
  SELECT doc_id,
    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
  FROM documents WHERE doc_id < 300),
t AS (SELECT unnest(toks) AS token FROM d),
c AS (SELECT token, COUNT(*) AS n FROM t GROUP BY token),
v AS (
  SELECT token,
    CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token ASC) - 1
      AS BIGINT) AS tid
  FROM c),
u AS (
  SELECT doc_id, r.i AS i, toks[r.i] AS token
  FROM d, UNNEST(range(1, len(toks) + 1)) AS r(i)),
e AS (
  SELECT doc_id, list(v.tid ORDER BY u.i) AS ids
  FROM u JOIN v USING (token) GROUP BY doc_id)
SELECT d.doc_id,
  CASE WHEN d.toks IS NULL THEN NULL
       ELSE COALESCE(e.ids, CAST([] AS BIGINT[])) END AS tokens
FROM d LEFT JOIN e USING (doc_id)
ORDER BY doc_id ASC""",
    doc="TOKEN-ID ENCODING (operators/binshard.py::"
    "encode_token_ids) — apply a z114 vocabulary to replace string-"
    "token arrays with integer-id arrays, position-exact: the map"
    " rides into tasks as a model-sized closure inside ONE Arrow"
    " pandas_udf projection (a per-token explode+equi-join would"
    " shuffle one row per token OCCURRENCE — the data-sized shape"
    " this avoids); OOV raises (a total byte-BPE vocab never"
    " misses — a miss means a stale artifact), NULL arrays stay"
    " NULL. Planted: the real corpus encoded under its own full"
    " vocabulary (no OOV by construction). Oracle: ordinality-"
    "preserving unnest + vocab join + ordered re-list in DuckDB,"
    " hash-exact including the full arrays",
)
def z115_encode_token_ids(spark, sf_dir):
    from topn_spark.operators.binshard import (
        encode_token_ids,
        token_vocab,
    )
    from topn_spark.operators.textstats import tokens

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 300)
        .select("doc_id", tokens("text").alias("tokens"))
    )
    vocab = {
        r["token"]: r["token_id"]
        for r in token_vocab(docs).collect()
    }
    return encode_token_ids(docs, vocab).orderBy("doc_id")


@query(
    "z116_bin_shard_round_trip",
    r"""WITH t AS (
  SELECT doc_id,
    list_append(list_transform(
      regexp_extract_all(lower(text), '[a-z0-9]+'),
      x -> CAST(length(x) AS BIGINT)), 0) AS toks,
    list_append(list_transform(
      regexp_extract_all(lower(text), '[a-z0-9]+'),
      x -> length(x) >= 4), false) AS msk
  FROM documents WHERE doc_id < 300
    AND len(regexp_extract_all(lower(text), '[a-z0-9]+')) > 0),
c AS (
  SELECT doc_id, toks, msk, CAST(len(toks) AS BIGINT) AS n,
    CAST(COALESCE(SUM(CAST(len(toks) AS BIGINT)) OVER (
      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
      AND 1 PRECEDING), 0) AS BIGINT) AS off
  FROM t),
s AS (
  SELECT doc_id, toks, msk, n, off, u.seq_id AS seq_id
  FROM c, UNNEST(range(off // 32, (off + n - 1) // 32 + 1))
    AS u(seq_id)),
p AS (
  SELECT seq_id,
    GREATEST(seq_id * 32, off) - seq_id * 32 AS seq_start,
    toks[CAST(GREATEST(seq_id * 32 - off, 0) + 1 AS BIGINT)
         :CAST(GREATEST(seq_id * 32 - off, 0)
           + LEAST((seq_id + 1) * 32, off + n)
           - GREATEST(seq_id * 32, off) AS BIGINT)] AS piece,
    msk[CAST(GREATEST(seq_id * 32 - off, 0) + 1 AS BIGINT)
        :CAST(GREATEST(seq_id * 32 - off, 0)
          + LEAST((seq_id + 1) * 32, off + n)
          - GREATEST(seq_id * 32, off) AS BIGINT)] AS mpiece
  FROM s),
q AS (
  SELECT seq_id,
    CAST(len(flatten(list(piece ORDER BY seq_start))) AS BIGINT)
      AS n_tokens,
    CAST(len(list_filter(flatten(list(mpiece ORDER BY seq_start)),
      x -> x)) AS BIGINT) AS n_supervised,
    flatten(list(piece ORDER BY seq_start)) AS tokens,
    flatten(list(mpiece ORDER BY seq_start)) AS loss_mask
  FROM p GROUP BY seq_id),
sh AS (
  SELECT *,
    CAST(CAST(('0x' || substring(md5(CAST(seq_id AS VARCHAR)
      || 'z116'), 1, 8)) AS BIGINT) % 8 AS INT) AS shard
  FROM q)
SELECT shard,
  CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY seq_id) - 1
    AS BIGINT) AS seq_index,
  seq_id, n_tokens, n_supervised, tokens, loss_mask
FROM sh ORDER BY seq_id ASC""",
    doc="TRAINER-NATIVE BINARY SHARD ROUND TRIP (operators/"
    "binshard.py::export_bin_shards/read_bin_shards) — the round-9"
    " task-list closer: packed token+mask sequences written as the"
    " memory-mapped trainer shape (little-endian .bin token stream,"
    " .idx sequence-offset index, .msk LSB-first loss-mask"
    " bitstream, byte-exact _manifest) and read back — this entry"
    " RUNS the export to disk and returns the read-back, so the"
    " oracle match proves the binary encode/decode is lossless"
    " INCLUDING the mask bits, the md5 shard assignment, and the"
    " in-shard write order. Planted: token-length ids (1..~20) with"
    " an unsupervised EOS id 0, packed at seq_len 32 in doc_id"
    " order, 8 shards. Scale: ONE repartition-by-shard shuffle into"
    " a streaming Arrow writer (bytes go straight to executor-local"
    " files, nothing driver-sized); read is one task per shard."
    " Oracle: the z73 dual-array slice arithmetic + z36 md5-mod"
    " shard rule + ROW_NUMBER write order in DuckDB, hash-exact"
    " including both full arrays",
)
def z116_bin_shard_round_trip(spark, sf_dir):
    import os

    from topn_spark.operators.binshard import (
        export_bin_shards,
        read_bin_shards,
    )
    from topn_spark.operators.pipeline import pack_masked_sequences
    from topn_spark.operators.textstats import tokens

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 300)
        .select("doc_id", tokens("text").alias("tokens"))
        .where(F.size("tokens") > 0)
        .select(
            "doc_id",
            F.transform(
                "tokens", lambda t: F.length(t).cast("bigint")
            ).alias("tokens"),
            F.transform(
                "tokens", lambda t: F.length(t) >= 4
            ).alias("loss_mask"),
        )
    )
    packed = pack_masked_sequences(
        docs,
        id_col="doc_id",
        order_col="doc_id",
        seq_len=32,
        sep_token=0,
    )
    out_dir = f"/tmp/topn_z116_{os.path.basename(sf_dir.rstrip('/'))}"
    export_bin_shards(packed, out_dir, 8, salt="z116")
    return read_bin_shards(spark, out_dir).orderBy("seq_id")


_Z117_MATRIX_SQL = r"""WITH s AS (
  SELECT (doc_id // 8) AS prompt_id,
    'm' || (doc_id % 4) AS model,
    CASE WHEN doc_id % 4 = 3 AND (doc_id // 8) % 3 = 0 THEN NULL
         ELSE CAST((doc_id * 7) % 29 AS DOUBLE)
           + CASE doc_id % 4 WHEN 0 THEN 10 ELSE 0 END
    END AS score
  FROM documents WHERE doc_id < 480),
best AS (
  SELECT prompt_id, model, MAX(score) AS s
  FROM s WHERE score IS NOT NULL GROUP BY prompt_id, model)
SELECT a.model AS model_a, b.model AS model_b,
  CAST(SUM(CASE WHEN a.s > b.s THEN 1 ELSE 0 END) AS BIGINT)
    AS wins_a,
  CAST(SUM(CASE WHEN a.s < b.s THEN 1 ELSE 0 END) AS BIGINT)
    AS wins_b,
  CAST(SUM(CASE WHEN a.s = b.s THEN 1 ELSE 0 END) AS BIGINT)
    AS ties
FROM best a JOIN best b
  ON a.prompt_id = b.prompt_id AND a.model < b.model
GROUP BY a.model, b.model"""


def _z117_bt_mm(con, smoothing=0.5, tol=1e-12, max_iter=1000):
    """Independent Bradley–Terry MM fit over the z113-planted win
    matrix (computed in DuckDB SQL): dict-keyed accumulation in a
    DIFFERENT order than the operator's sorted-list walk, same
    Hunter (2004) update, same per-sweep geometric-mean-1 anchor.
    Float summation order differs, hence tolerance (1e-9)."""
    import math

    rows = con.execute(_Z117_MATRIX_SQL).fetchall()
    w: dict = {}
    for ma, mb, wa, wb, t in rows:
        w[(ma, mb)] = w.get((ma, mb), 0.0) + wa + t / 2 + smoothing
        w[(mb, ma)] = w.get((mb, ma), 0.0) + wb + t / 2 + smoothing
    models = sorted({a for a, _ in w})
    pi = {m: 1.0 for m in models}
    for _ in range(max_iter):
        new = {}
        for i in models:
            wi = sum(v for (a, _), v in w.items() if a == i)
            den = sum(
                (w[(i, j)] + w[(j, i)]) / (pi[i] + pi[j])
                for j in models
                if (i, j) in w
            )
            new[i] = wi / den
        gm = math.exp(
            sum(math.log(v) for v in new.values()) / len(models)
        )
        new = {k: v / gm for k, v in new.items()}
        delta = max(
            abs(math.log(new[k]) - math.log(pi[k])) for k in models
        )
        pi = new
        if delta < tol:
            break
    wins = {
        i: sum(v for (a, _), v in w.items() if a == i)
        for i in models
    }
    games = {
        i: sum(
            w[(i, j)] + w[(j, i)] for j in models if (i, j) in w
        )
        for i in models
    }
    return pi, wins, games


def _z117_bt_exact(con):
    import math

    pi, wins, games = _z117_bt_mm(con)
    out = [
        (m, pi[m], 400.0 * math.log10(pi[m]), wins[m], games[m])
        for m in sorted(pi)
    ]
    return ["model", "strength", "rating", "wins_eff", "n_games"], out


@query(
    "z117_bradley_terry",
    None,
    tol_oracle=_z117_bt_exact,
    tolerance=1e-9,
    tol_keys=("model",),
    doc="BRADLEY–TERRY STRENGTH FIT (operators/sft.py::"
    "bradley_terry_fit) — the arena model comparison the z113"
    " win-rate matrix is the sufficient statistic for (Bradley &"
    " Terry 1952): strengths maximizing prod p_ab^w_ab with ties"
    " counting half, fitted by Hunter's (2004) MM iteration with a"
    " per-sweep geometric-mean-1 anchor (rating = 400*log10(s),"
    " Elo-scale centred at 0); smoothing=0.5 symmetric pseudo-wins"
    " (zero-win models otherwise RAISE — a -inf rating forged as a"
    " number is the silent failure). Planted: the z113 fixture —"
    " m0's +10 offset must dominate the fit, the m3 NULL stripe"
    " thins its games. Scale: the data-sized work happened in"
    " pairwise_winrate; the fit is a model-sized driver loop on the"
    " k² sufficient statistic — exactly why the win matrix exists."
    " Oracle: INDEPENDENT dict-keyed MM mirror over the same"
    " DuckDB-computed matrix, tolerance 1e-9 (summation order)",
)
def z117_bradley_terry(spark, sf_dir):
    from topn_spark.operators.sft import (
        bradley_terry_fit,
        pairwise_winrate,
    )

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 480
    )
    d = F.col("doc_id")
    p = (d / 8).cast("bigint")
    score = F.when(
        (d % 4 == 3) & (p % 3 == 0), F.lit(None).cast("double")
    ).otherwise(
        ((d * 7) % 29).cast("double")
        + F.when(d % 4 == 0, F.lit(10.0)).otherwise(F.lit(0.0))
    )
    samples = docs.select(
        p.alias("prompt_id"),
        F.concat(F.lit("m"), (d % 4).cast("string")).alias("model"),
        d.alias("sample_id"),
        score.alias("score"),
    )
    fit = bradley_terry_fit(
        pairwise_winrate(samples), smoothing=0.5
    )
    return fit.select(
        "model", "strength", "rating", "wins_eff", "n_games"
    ).orderBy("model")


def _z118_cal_exact(con):
    pi, _, _ = _z117_bt_mm(con)
    rows = con.execute(_Z117_MATRIX_SQL).fetchall()
    n_bins = 4
    bins: dict = {}
    for ma, mb, wa, wb, t in rows:
        games = float(wa + wb + t)
        weff = wa + t / 2.0
        pred = pi[ma] / (pi[ma] + pi[mb])
        b = min(n_bins - 1, int(pred * n_bins))
        acc = bins.setdefault(b, [0, 0.0, 0.0, 0.0])
        acc[0] += 1
        acc[1] += games
        acc[2] += pred * games
        acc[3] += weff
    tot = sum(a[1] for a in bins.values())
    out = []
    for b in sorted(bins):
        n_pairs, games, pw, ow = bins[b]
        pred = pw / games
        obs = ow / games
        out.append(
            (
                b, n_pairs, round(games, 6), round(pred, 6),
                round(obs, 6), round(abs(pred - obs), 6),
                round(abs(pred - obs) * games / tot, 6),
            )
        )
    return (
        ["bin", "n_pairs", "n_games", "mean_predicted", "observed",
         "abs_gap", "ece_contrib"],
        out,
    )


@query(
    "z118_bt_calibration",
    None,
    tol_oracle=_z118_cal_exact,
    tolerance=1e-6,
    tol_keys=("bin",),
    doc="BRADLEY–TERRY CALIBRATION REPORT (operators/sft.py::"
    "bt_calibration) — the ECE-shaped check that fitted strengths"
    " PREDICT observed head-to-heads (a fit can order models"
    " correctly and still be miscalibrated; reward-data weighting"
    " by predicted win probability inherits that error): every pair"
    " scored p = s_a/(s_a+s_b), bucketed into 4 equal probability"
    " bins; per bin pair/game counts, game-weighted mean predicted,"
    " observed ties-half win rate, |gap|, and ece_contrib (total"
    " ECE = SUM). Scale: broadcast model-sized ratings onto the k²"
    " matrix, one <=n_bins-group agg, 1-row total by broadcast —"
    " nothing data-sized. Oracle: independent Python binning over"
    " the mirror MM fit, tolerance 1e-6 (ROUND-6 projections over"
    " a 1e-9-matched fit)",
)
def z118_bt_calibration(spark, sf_dir):
    from topn_spark.operators.sft import (
        bradley_terry_fit,
        bt_calibration,
        pairwise_winrate,
    )

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 480
    )
    d = F.col("doc_id")
    p = (d / 8).cast("bigint")
    score = F.when(
        (d % 4 == 3) & (p % 3 == 0), F.lit(None).cast("double")
    ).otherwise(
        ((d * 7) % 29).cast("double")
        + F.when(d % 4 == 0, F.lit(10.0)).otherwise(F.lit(0.0))
    )
    samples = docs.select(
        p.alias("prompt_id"),
        F.concat(F.lit("m"), (d % 4).cast("string")).alias("model"),
        d.alias("sample_id"),
        score.alias("score"),
    )
    matrix = pairwise_winrate(samples)
    fit = bradley_terry_fit(matrix, smoothing=0.5)
    return bt_calibration(matrix, fit, n_bins=4).orderBy("bin")


def _z119_bucketed_triplets_exact(con):
    """Exact Python mirror of the LSH-bucketed triplet miner over
    the real embeddings (labels planted c0..c4 by vec_id*13 mod 5):
    SAME seeded hyperplanes (random.Random(seed+t).gauss), SAME
    sequential float64 fold order for norms/dots (bit-identical to
    Spark's aggregate fold), same (table, bucket) candidate sets and
    (-score, id) tie rule. Tolerance 1e-9 covers any residual
    platform rounding."""
    import math
    import random

    dim, n_bits, n_tables, seed = 64, 6, 3, 42
    rows = con.execute(
        "SELECT vec_id, embedding FROM embeddings WHERE vec_id < 500"
        " ORDER BY vec_id"
    ).fetchall()
    units, labels = {}, {}
    for vid, emb in rows:
        v = [float(x) for x in emb]
        sq = 0.0
        for x in v:
            sq += x * x
        nm = math.sqrt(sq)
        if not nm > 0:
            nm = 1.0
        units[vid] = [x / nm for x in v]
        labels[vid] = "c" + str((vid * 13) % 5)
    tables = []
    for t in range(n_tables):
        rng = random.Random(seed + t)
        planes = [
            [rng.gauss(0.0, 1.0) for _ in range(dim)]
            for _ in range(n_bits)
        ]
        buckets: dict = {}
        for vid, u in units.items():
            b = 0
            for j, p in enumerate(planes):
                d = 0.0
                for x, y in zip(u, p):
                    d += x * y
                if d > 0:
                    b += 1 << j
            buckets.setdefault(b, []).append(vid)
        tables.append(buckets)
    best_p: dict = {}
    best_n: dict = {}
    for buckets in tables:
        for members in buckets.values():
            for a in members:
                ua = units[a]
                for o in members:
                    if o == a:
                        continue
                    s = 0.0
                    for x, y in zip(ua, units[o]):
                        s += x * y
                    key = (-s, o)
                    tgt = best_p if labels[o] == labels[a] else best_n
                    if a not in tgt or key < tgt[a]:
                        tgt[a] = key
    out = []
    for a in sorted(set(best_p) & set(best_n)):
        ns_p, pid = best_p[a]
        ns_n, nid = best_n[a]
        out.append((a, pid, -ns_p, nid, -ns_n, ns_n - ns_p))
    return (
        ["anchor_id", "pos_id", "pos_score", "neg_id", "neg_score",
         "margin"],
        out,
    )


@query(
    "z119_bucketed_triplets",
    None,
    tol_oracle=_z119_bucketed_triplets_exact,
    tolerance=1e-9,
    tol_keys=("anchor_id",),
    doc="LSH-BUCKETED HARD-TRIPLET MINING (operators/similarity.py::"
    "contrastive_triplets_bucketed) — the SHIPPED 100 TB path the"
    " z92 brute baseline's docstring prescribed in prose: mine the"
    " hardest same/different-label neighbors WITHIN n_tables"
    " independent SRP-LSH buckets (hard pairs are by definition"
    " NEAR the anchor — bucketing loses only easy pairs), same"
    " (-score, lowest-id) tie contract as brute via the identical"
    " conditional-extremes hash agg. Planted: the real 64-dim"
    " embeddings with labels vec_id*13 mod 5; 3 tables x 6 bits,"
    " seed 42. Scale: map-only seeded bucket projections + ONE"
    " bucket-keyed equi self-join per table feeding the extremes"
    " agg — pairs bounded by bucket occupancy, the quadratic term"
    " is gone; skewed buckets are AQE skew-join territory, recall"
    " buys with n_tables/nprobe. Oracle: exact Python mirror (same"
    " seeded planes, same sequential fold order), tolerance 1e-9",
)
def z119_bucketed_triplets(spark, sf_dir):
    from topn_spark.operators.similarity import (
        contrastive_triplets_bucketed,
    )

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < 500)
        .select(
            "vec_id",
            "embedding",
            F.concat(
                F.lit("c"), ((F.col("vec_id") * 13) % 5).cast("string")
            ).alias("label"),
        )
    )
    return contrastive_triplets_bucketed(
        emb, dim=64, n_bits=6, n_tables=3, seed=42
    ).orderBy("anchor_id")


@query(
    "z120_multimodal_pack",
    r"""WITH base AS (
  SELECT doc_id,
    COALESCE(regexp_extract_all(lower(text), '[a-z0-9]+'),
             CAST([] AS VARCHAR[])) AS w
  FROM documents WHERE doc_id < 400),
t AS (
  SELECT doc_id,
    CASE doc_id % 3
      WHEN 0 THEN list_append(
        list_prepend('<img>', list_append(w, '<img>')), '</s>')
      WHEN 1 THEN list_append(w, '</s>')
      ELSE list_append(list_append(w, '<img>'), '</s>')
    END AS toks,
    CASE doc_id % 3
      WHEN 0 THEN [doc_id * 2, doc_id * 2 + 1]
      WHEN 1 THEN CAST([] AS BIGINT[])
      ELSE [doc_id * 2]
    END AS assets
  FROM base
  WHERE CASE doc_id % 3 WHEN 1 THEN len(w) > 0 ELSE TRUE END),
u AS (
  SELECT doc_id, toks, assets, r.i AS i, toks[r.i] AS tok,
    CAST(SUM(CASE WHEN toks[r.i] = '<img>' THEN 1 ELSE 0 END)
      OVER (PARTITION BY doc_id ORDER BY i) AS BIGINT) AS ph_ord
  FROM t, UNNEST(range(1, len(toks) + 1)) AS r(i)),
z AS (
  SELECT doc_id,
    list(tok ORDER BY i) AS toks,
    list(tok <> '<img>' AND tok <> '</s>' AND length(tok) >= 4
      ORDER BY i) AS msk,
    list(CASE WHEN tok = '<img>' THEN assets[ph_ord] END
      ORDER BY i) AS refs
  FROM u GROUP BY doc_id, assets),
c AS (
  SELECT doc_id, toks, msk, refs,
    CAST(len(toks) AS BIGINT) AS n,
    CAST(COALESCE(SUM(CAST(len(toks) AS BIGINT)) OVER (
      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
      AND 1 PRECEDING), 0) AS BIGINT) AS off
  FROM z),
s AS (
  SELECT doc_id, toks, msk, refs, n, off, u.seq_id AS seq_id
  FROM c, UNNEST(range(off // 32, (off + n - 1) // 32 + 1))
    AS u(seq_id)),
p AS (
  SELECT seq_id,
    GREATEST(seq_id * 32, off) - seq_id * 32 AS seq_start,
    toks[CAST(GREATEST(seq_id * 32 - off, 0) + 1 AS BIGINT)
         :CAST(GREATEST(seq_id * 32 - off, 0)
           + LEAST((seq_id + 1) * 32, off + n)
           - GREATEST(seq_id * 32, off) AS BIGINT)] AS piece,
    msk[CAST(GREATEST(seq_id * 32 - off, 0) + 1 AS BIGINT)
        :CAST(GREATEST(seq_id * 32 - off, 0)
          + LEAST((seq_id + 1) * 32, off + n)
          - GREATEST(seq_id * 32, off) AS BIGINT)] AS mpiece,
    refs[CAST(GREATEST(seq_id * 32 - off, 0) + 1 AS BIGINT)
         :CAST(GREATEST(seq_id * 32 - off, 0)
           + LEAST((seq_id + 1) * 32, off + n)
           - GREATEST(seq_id * 32, off) AS BIGINT)] AS rpiece
  FROM s)
SELECT seq_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(len(flatten(list(piece ORDER BY seq_start))) AS BIGINT)
    AS n_tokens,
  CAST(len(list_filter(flatten(list(mpiece ORDER BY seq_start)),
    x -> x)) AS BIGINT) AS n_supervised,
  CAST(len(list_filter(flatten(list(rpiece ORDER BY seq_start)),
    x -> x IS NOT NULL)) AS BIGINT) AS n_images,
  flatten(list(piece ORDER BY seq_start)) AS tokens,
  flatten(list(mpiece ORDER BY seq_start)) AS loss_mask,
  list_filter(flatten(list(rpiece ORDER BY seq_start)),
    x -> x IS NOT NULL) AS asset_ids
FROM p GROUP BY seq_id ORDER BY seq_id ASC""",
    doc="MULTIMODAL MASK+ASSET PACKING (operators/pipeline.py::"
    "pack_multimodal_sequences) — the VLM analogue of the r9"
    " mask-through-packing gap, closed: packing that preserves BOTH"
    " the loss mask and the placeholder->asset binding (z84's"
    " contract: the i-th <img> placeholder binds the i-th asset id;"
    " a conversation split across sequence boundaries must hand"
    " each sequence exactly the assets whose placeholders landed in"
    " it, in order — a broken binding splices the WRONG image into"
    " a placeholder, silently). Planted: three conversation shapes"
    " over the real corpus — leading+trailing image (assets 2d,"
    " 2d+1), text-only, trailing image — packed at seq_len 32 with"
    " an unsupervised EOS; placeholders/EOS never supervised."
    " Scale: identical to z73 masked packing — per-token refs built"
    " map-only (placeholder positions bound as a projected"
    " image-sized array), one triple zip through the same span"
    " arithmetic, manifest = one filter; no extra shuffle, no UDF."
    " Oracle: TRIPLE-array slice arithmetic + windowed placeholder"
    " ordinals in DuckDB, hash-exact incl. all three arrays",
)
def z120_multimodal_pack(spark, sf_dir):
    from topn_spark.operators.pipeline import (
        pack_multimodal_sequences,
    )
    from topn_spark.operators.textstats import tokens

    d = F.col("doc_id")
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(d < 400)
        .select(
            "doc_id",
            F.coalesce(
                tokens("text"), F.array().cast("array<string>")
            ).alias("w"),
        )
    )
    img = F.array(F.lit("<img>"))
    toks = (
        F.when(d % 3 == 0, F.concat(img, F.col("w"), img))
        .when(d % 3 == 1, F.col("w"))
        .otherwise(F.concat(F.col("w"), img))
    )
    assets = (
        F.when(d % 3 == 0, F.array(d * 2, d * 2 + 1))
        .when(d % 3 == 1, F.array().cast("array<bigint>"))
        .otherwise(F.array(d * 2))
    )
    planted = docs.select(
        "doc_id", toks.alias("tokens"), assets.alias("asset_ids")
    ).withColumn(
        "loss_mask",
        F.transform(
            "tokens",
            lambda t: (t != "<img>") & (F.length(t) >= 4),
        ),
    )
    return pack_multimodal_sequences(
        planted,
        id_col="doc_id",
        order_col="doc_id",
        seq_len=32,
        image_token="<img>",
        sep_token="</s>",
    ).orderBy("seq_id")


def _z121_bt_bootstrap_exact(con):
    """Independent mirror of the distributed Poisson bootstrap over
    the z113 plant: per-(prompt, pair) outcomes from DuckDB SQL, the
    SAME md5(prompt:b) inverse-CDF Poisson(1) weights, a dict-keyed
    MM fit per replicate (different accumulation order than the
    operator's sorted-list core), the same nearest-rank quantile
    rule. Tolerance 1e-9 (MM summation order)."""
    import hashlib
    import math

    from topn_spark.operators.sft import POISSON1_CDF

    rows = con.execute(
        r"""WITH s AS (
  SELECT (doc_id // 8) AS prompt_id,
    'm' || (doc_id % 4) AS model,
    CASE WHEN doc_id % 4 = 3 AND (doc_id // 8) % 3 = 0 THEN NULL
         ELSE CAST((doc_id * 7) % 29 AS DOUBLE)
           + CASE doc_id % 4 WHEN 0 THEN 10 ELSE 0 END
    END AS score
  FROM documents WHERE doc_id < 480),
best AS (
  SELECT prompt_id, model, MAX(score) AS sc
  FROM s WHERE score IS NOT NULL GROUP BY prompt_id, model)
SELECT a.prompt_id, a.model, b.model,
  CAST(CASE WHEN a.sc > b.sc THEN 1 ELSE 0 END AS DOUBLE),
  CAST(CASE WHEN a.sc < b.sc THEN 1 ELSE 0 END AS DOUBLE),
  CAST(CASE WHEN a.sc = b.sc THEN 1 ELSE 0 END AS DOUBLE)
FROM best a JOIN best b
  ON a.prompt_id = b.prompt_id AND a.model < b.model"""
    ).fetchall()
    n_boot, smoothing, salt = 50, 0.5, "z121"

    def pweight(p, b):
        if b == -1:
            return 1.0
        u = int(
            hashlib.md5(f"{p}:{b}{salt}".encode()).hexdigest()[:8],
            16,
        ) / 4294967296.0
        for kk, c in enumerate(POISSON1_CDF):
            if u < c:
                return float(kk)
        return float(len(POISSON1_CDF))

    def mm_fit(w):
        models = sorted({a for a, _ in w})
        pi = {m: 1.0 for m in models}
        wins = {
            i: sum(v for (a, _), v in w.items() if a == i)
            for i in models
        }
        for _ in range(1000):
            new = {}
            for i in models:
                den = sum(
                    (w[(i, j)] + w[(j, i)]) / (pi[i] + pi[j])
                    for j in models
                    if (i, j) in w
                )
                new[i] = wins[i] / den
            gm = math.exp(
                sum(math.log(v) for v in new.values()) / len(models)
            )
            new = {m: v / gm for m, v in new.items()}
            delta = max(
                abs(math.log(new[m]) - math.log(pi[m]))
                for m in models
            )
            pi = new
            if delta < 1e-12:
                break
        return pi, wins

    reps: dict = {}
    for b in range(-1, n_boot):
        w: dict = {}
        for p, ma, mb, wa, wb, t in rows:
            wt = pweight(p, b)
            w[(ma, mb)] = (
                w.get((ma, mb), 0.0) + wt * wa + wt * t / 2 + 0.0
            )
            w[(mb, ma)] = (
                w.get((mb, ma), 0.0) + wt * wb + wt * t / 2 + 0.0
            )
        # smoothing applies once per observed PAIR (both directions)
        pairs = {(a, c) for (a, c) in w}
        for key in pairs:
            w[key] += smoothing
        reps[b] = mm_fit(w)
    pi0, wins0 = reps[-1]
    models = sorted(pi0)
    # games = wins_eff(m) + losses_eff(m): recompute directly
    w0: dict = {}
    for p, ma, mb, wa, wb, t in rows:
        w0[(ma, mb)] = w0.get((ma, mb), 0.0) + wa + t / 2
        w0[(mb, ma)] = w0.get((mb, ma), 0.0) + wb + t / 2
    for key in {(a, c) for (a, c) in w0}:
        w0[key] += smoothing
    games = {
        m: sum(
            w0[(m, j)] + w0[(j, m)]
            for j in models
            if (m, j) in w0
        )
        for m in models
    }
    ratings = {
        m: sorted(
            400.0 * math.log10(reps[b][0][m]) for b in range(n_boot)
        )
        for m in models
    }
    i_lo = int(math.floor(0.025 * (n_boot - 1)))
    i_hi = int(math.ceil(0.975 * (n_boot - 1)))
    out = [
        (
            m,
            pi0[m],
            400.0 * math.log10(pi0[m]),
            ratings[m][i_lo],
            ratings[m][i_hi],
            games[m],
            n_boot,
        )
        for m in models
    ]
    return (
        ["model", "strength", "rating", "rating_lo", "rating_hi",
         "n_games", "n_boot"],
        out,
    )


@query(
    "z121_bt_bootstrap",
    None,
    tol_oracle=_z121_bt_bootstrap_exact,
    tolerance=1e-9,
    tol_keys=("model",),
    doc="BRADLEY–TERRY RATINGS WITH BOOTSTRAP CONFIDENCE INTERVALS"
    " (operators/sft.py::bradley_terry_bootstrap) — the arena-"
    "leaderboard shape (a rating without its interval is misread"
    " the moment two models sit 10 points apart on 50 prompts):"
    " prompt-level bootstrap run DISTRIBUTED via deterministic"
    " Poisson(1) resampling weights — each prompt's weight in"
    " replicate b is an inverse-CDF draw through the fixed"
    " POISSON1_CDF table from uniform md5(prompt:b:salt), so every"
    " run/engine reproduces the same replicates; replicate -1 is"
    " the original sample (point estimate = the z117 fit);"
    " nearest-rank 2.5%/97.5% quantiles. Planted: the z113 fixture,"
    " 50 replicates. Scale: the replicate explode happens on the"
    " already-reduced (prompt, pair) outcome rows and feeds a"
    " map-side-combinable agg — the shuffle carries (B+1)·k² rows,"
    " never data; B+1 driver MM fits on k² statistics. Oracle:"
    " independent Python mirror (same md5 weights, dict-keyed MM),"
    " tolerance 1e-9",
)
def z121_bt_bootstrap(spark, sf_dir):
    from topn_spark.operators.sft import bradley_terry_bootstrap

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 480
    )
    d = F.col("doc_id")
    p = (d / 8).cast("bigint")
    score = F.when(
        (d % 4 == 3) & (p % 3 == 0), F.lit(None).cast("double")
    ).otherwise(
        ((d * 7) % 29).cast("double")
        + F.when(d % 4 == 0, F.lit(10.0)).otherwise(F.lit(0.0))
    )
    samples = docs.select(
        p.alias("prompt_id"),
        F.concat(F.lit("m"), (d % 4).cast("string")).alias("model"),
        d.alias("sample_id"),
        score.alias("score"),
    )
    return bradley_terry_bootstrap(
        samples, n_boot=50, salt="z121"
    ).orderBy("model")


@query(
    "z122_epoch_order",
    r"""WITH t AS (
  SELECT doc_id,
    list_append(list_transform(
      regexp_extract_all(lower(text), '[a-z0-9]+'),
      x -> CAST(length(x) AS BIGINT)), 0) AS toks
  FROM documents WHERE doc_id < 300
    AND len(regexp_extract_all(lower(text), '[a-z0-9]+')) > 0),
c AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n,
    CAST(COALESCE(SUM(CAST(len(toks) AS BIGINT)) OVER (
      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
      AND 1 PRECEDING), 0) AS BIGINT) AS off
  FROM t),
q AS (
  SELECT DISTINCT u.seq_id AS seq_id
  FROM c, UNNEST(range(off // 32, (off + n - 1) // 32 + 1))
    AS u(seq_id)),
sh AS (
  SELECT seq_id,
    CAST(CAST(('0x' || substring(md5(CAST(seq_id AS VARCHAR)
      || 'z122s'), 1, 8)) AS BIGINT) % 4 AS INT) AS shard
  FROM q),
idx AS (
  SELECT shard,
    CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY seq_id) - 1
      AS BIGINT) AS seq_index
  FROM sh),
sp AS (
  SELECT shard,
    CAST(ROW_NUMBER() OVER (
      ORDER BY md5('0:' || CAST(shard AS VARCHAR) || 'z122'),
               shard) - 1 AS INT) AS shard_pos
  FROM (SELECT DISTINCT shard FROM idx))
SELECT i.shard, sp.shard_pos, 'seq' AS unit,
  CAST(ROW_NUMBER() OVER (PARTITION BY i.shard
    ORDER BY md5('0:' || CAST(i.shard AS VARCHAR) || ':'
      || CAST(i.seq_index AS VARCHAR) || 'z122'),
      i.seq_index) - 1 AS BIGINT) AS position,
  i.seq_index
FROM idx i JOIN sp ON i.shard = sp.shard
ORDER BY i.shard ASC, position ASC""",
    doc="PER-EPOCH BINARY CONSUMPTION ORDER (operators/binshard.py"
    "::export_epoch_order/read_epoch_order) — the dataloader's"
    " missing half: trainers consuming memory-mapped .bin/.idx"
    " shards need a fresh PERMUTATION per epoch without a"
    " corpus-sized global index; this materializes the standard"
    " two-level shuffle — a salted-md5 permutation OF the shards"
    " plus a salted-md5 within-shard permutation written as one"
    " little-endian uint32 file per shard per epoch (byte-identical"
    " on re-run; a new epoch/salt is a fresh permutation — the z88"
    " epoch_shuffle contract at the binary layer). The entry RUNS"
    " pack+export+epoch-export to disk and returns the read-back"
    " order. Scale: one task per shard writing its own permutation"
    " file (the verify shape); macro order is model-sized"
    " arithmetic. Oracle: identical md5 permutation arithmetic in"
    " DuckDB over the same shard layout, hash-exact",
)
def z122_epoch_order(spark, sf_dir):
    import os

    from topn_spark.operators.binshard import (
        export_bin_shards,
        export_epoch_order,
        read_epoch_order,
    )
    from topn_spark.operators.pipeline import pack_masked_sequences
    from topn_spark.operators.textstats import tokens

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 300)
        .select("doc_id", tokens("text").alias("tokens"))
        .where(F.size("tokens") > 0)
        .select(
            "doc_id",
            F.transform(
                "tokens", lambda t: F.length(t).cast("bigint")
            ).alias("tokens"),
            F.transform(
                "tokens", lambda t: F.length(t) >= 4
            ).alias("loss_mask"),
        )
    )
    packed = pack_masked_sequences(
        docs,
        id_col="doc_id",
        order_col="doc_id",
        seq_len=32,
        sep_token=0,
    )
    out_dir = f"/tmp/topn_z122_{os.path.basename(sf_dir.rstrip('/'))}"
    export_bin_shards(packed, out_dir, 4, salt="z122s")
    export_epoch_order(spark, out_dir, epoch=0, salt="z122")
    return read_epoch_order(spark, out_dir, epoch=0).orderBy(
        "shard", "position"
    )


def _z123_lcw_exact(con):
    """Independent mirror of the length-controlled win rate: same
    plant arithmetic from DuckDB rows, same best-of-n reduction
    (max score, tie -> shortest), same scale-only z, same ridge
    (l2=1) Newton with the 2x2 solve written differently (numpy
    linalg vs the operator's closed form). Tolerance 1e-5 on the
    ROUND-6 projections."""
    import math

    rows = con.execute(
        "SELECT doc_id FROM documents WHERE doc_id < 450"
    ).fetchall()
    samples = []
    for (d,) in rows:
        p, m = d // 9, d % 3
        ln = 100 + (d * 37) % 200 + (80 if m == 0 else 0)
        s = (
            0.004 * ln
            + ((d * 13) % 11) * 0.3
            + (0.5 if m == 0 else 0.0)
        )
        samples.append((p, f"m{m}", float(s), float(ln)))
    best: dict = {}
    for p, m, s, ln in samples:
        k = (p, m)
        cur = best.get(k)
        if cur is None or (-s, ln) < cur:
            best[k] = (-s, ln)
    pairs: dict = {}
    prompts = sorted({p for p, _ in best})
    models = sorted({m for _, m in best})
    for p in prompts:
        for i, ma in enumerate(models):
            for mb in models[i + 1:]:
                if (p, ma) in best and (p, mb) in best:
                    sa, la = -best[(p, ma)][0], best[(p, ma)][1]
                    sb, lb = -best[(p, mb)][0], best[(p, mb)][1]
                    pairs.setdefault((ma, mb), []).append(
                        (sa, la, sb, lb)
                    )
    out = []
    for k in sorted(pairs):
        data = pairs[k]
        used = [
            (1.0 if sa > sb else 0.0, la - lb)
            for sa, la, sb, lb in data
            if sa != sb
        ]
        n_ties = len(data) - len(used)
        n = len(used)
        wins = sum(y for y, _ in used)
        mean = sum(dx for _, dx in used) / n
        var = sum((dx - mean) ** 2 for _, dx in used) / (n - 1)
        sx = math.sqrt(var)
        zs = [
            (y, dx / sx if sx > 0 else 0.0) for y, dx in used
        ]
        b0 = b1 = 0.0
        n_iter, converged = 0, False
        for n_iter in range(1, 26):
            g0 = g1 = h00 = h01 = h11 = 0.0
            for y, z in zs:
                pr = 1.0 / (1.0 + math.exp(-(b0 + b1 * z)))
                w = pr * (1.0 - pr)
                g0 += y - pr
                g1 += (y - pr) * z
                h00 += w
                h01 += w * z
                h11 += w * z * z
            g0 -= b0
            g1 -= b1
            h00 += 1.0
            h11 += 1.0
            det = h00 * h11 - h01 * h01
            if sx <= 0:
                d0, d1 = (g0 / h00 if h00 > 0 else 0.0), 0.0
            elif det > 1e-12:
                d0 = (h11 * g0 - h01 * g1) / det
                d1 = (h00 * g1 - h01 * g0) / det
            else:
                d0, d1 = (g0 / h00 if h00 > 0 else 0.0), 0.0
            d0 = max(-10.0, min(10.0, d0))
            d1 = max(-10.0, min(10.0, d1))
            b0 += d0
            b1 += d1
            if max(abs(d0), abs(d1)) < 1e-10:
                converged = True
                break
        out.append(
            (
                k[0], k[1], n, n_ties,
                round(wins / n, 6),
                round(1.0 / (1.0 + math.exp(-b0)), 6),
                round(b1, 6),
                converged,
            )
        )
    return (
        ["model_a", "model_b", "n_pairs", "n_ties", "raw_winrate_a",
         "lc_winrate_a", "beta_len", "converged"],
        out,
    )


@query(
    "z123_length_controlled_winrate",
    None,
    tol_oracle=_z123_lcw_exact,
    tolerance=1e-5,
    tol_keys=("model_a", "model_b"),
    doc="LENGTH-CONTROLLED WIN RATE (operators/sft.py::"
    "length_controlled_winrate) — the arena correction for the"
    " best-documented judge bias (longer answers win regardless of"
    " quality; the length-controlled variant is the public-eval"
    " headline number): per model pair a ridge-regularized"
    " two-parameter logistic over shared non-tied prompts with the"
    " scale-only standardized length gap as covariate;"
    " lc_winrate_a = sigmoid(intercept) = the win probability at a"
    " ZERO length gap, beside the raw rate; ties counted"
    " observably; zero-variance pairs fit intercept-only; ridge"
    " keeps quasi-separated pairs finite. Planted: 3 models x 50"
    " prompts x 3 samples, m0 longer AND slightly better with"
    " deterministic noise — raw vs lc must split the two effects."
    " Scale: pair rows built ONCE by the z113 shapes and persisted;"
    " each Newton sweep is ONE map-side-combinable per-pair agg of"
    " five sufficient-statistic sums with k²-sized coefficients"
    " broadcast back; the driver solves k² independent 2x2 systems."
    " Oracle: independent Python Newton mirror, tolerance 1e-5",
)
def z123_length_controlled_winrate(spark, sf_dir):
    from topn_spark.operators.sft import length_controlled_winrate

    d = F.col("doc_id")
    docs = load_table(spark, sf_dir, "documents").where(d < 450)
    m = d % 3
    ln = (
        F.lit(100)
        + (d * 37) % 200
        + F.when(m == 0, F.lit(80)).otherwise(F.lit(0))
    ).cast("int")
    score = (
        F.lit(0.004) * ln.cast("double")
        + ((d * 13) % 11).cast("double") * 0.3
        + F.when(m == 0, F.lit(0.5)).otherwise(F.lit(0.0))
    )
    # response built via rpad: length is all that matters
    samples = docs.select(
        (d / 9).cast("bigint").alias("prompt_id"),
        F.concat(F.lit("m"), m.cast("string")).alias("model"),
        score.alias("score"),
        F.rpad(F.lit("x"), ln, "x").alias("response"),
    )
    # n_iter is per-pair but the mirror reports only converged —
    # dropped so the comparison covers the fit contract
    return length_controlled_winrate(samples).drop("n_iter").orderBy(
        "model_a", "model_b"
    )


_Z124_PACK_SQL = r"""WITH base AS (
  SELECT doc_id,
    list_transform(
      COALESCE(regexp_extract_all(lower(text), '[a-z0-9]+'),
               CAST([] AS VARCHAR[])),
      x -> CAST(length(x) AS BIGINT)) AS w
  FROM documents WHERE doc_id < 300),
t AS (
  SELECT doc_id,
    list_append(CASE doc_id % 3
      WHEN 0 THEN list_prepend(CAST(9999 AS BIGINT),
        list_append(w, CAST(9999 AS BIGINT)))
      WHEN 1 THEN w
      ELSE list_append(w, CAST(9999 AS BIGINT))
    END, CAST(0 AS BIGINT)) AS toks,
    CASE doc_id % 3
      WHEN 0 THEN [doc_id * 2, doc_id * 2 + 1]
      WHEN 1 THEN CAST([] AS BIGINT[])
      ELSE [doc_id * 2]
    END AS assets
  FROM base
  WHERE CASE doc_id % 3 WHEN 1 THEN len(w) > 0 ELSE TRUE END),
u AS (
  SELECT doc_id, toks, assets, r.i AS i, toks[r.i] AS tok,
    CAST(SUM(CASE WHEN toks[r.i] = 9999 THEN 1 ELSE 0 END)
      OVER (PARTITION BY doc_id ORDER BY i) AS BIGINT) AS ph_ord
  FROM t, UNNEST(range(1, len(toks) + 1)) AS r(i)),
z AS (
  SELECT doc_id,
    list(tok ORDER BY i) AS toks,
    list(tok <> 9999 AND tok >= 4 ORDER BY i) AS msk,
    list(CASE WHEN tok = 9999 THEN assets[ph_ord] END
      ORDER BY i) AS refs
  FROM u GROUP BY doc_id, assets),
c AS (
  SELECT doc_id, toks, msk, refs,
    CAST(len(toks) AS BIGINT) AS n,
    CAST(COALESCE(SUM(CAST(len(toks) AS BIGINT)) OVER (
      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
      AND 1 PRECEDING), 0) AS BIGINT) AS off
  FROM z),
s AS (
  SELECT doc_id, toks, msk, refs, n, off, u.seq_id AS seq_id
  FROM c, UNNEST(range(off // 32, (off + n - 1) // 32 + 1))
    AS u(seq_id)),
p AS (
  SELECT seq_id,
    GREATEST(seq_id * 32, off) - seq_id * 32 AS seq_start,
    toks[CAST(GREATEST(seq_id * 32 - off, 0) + 1 AS BIGINT)
         :CAST(GREATEST(seq_id * 32 - off, 0)
           + LEAST((seq_id + 1) * 32, off + n)
           - GREATEST(seq_id * 32, off) AS BIGINT)] AS piece,
    msk[CAST(GREATEST(seq_id * 32 - off, 0) + 1 AS BIGINT)
        :CAST(GREATEST(seq_id * 32 - off, 0)
          + LEAST((seq_id + 1) * 32, off + n)
          - GREATEST(seq_id * 32, off) AS BIGINT)] AS mpiece,
    refs[CAST(GREATEST(seq_id * 32 - off, 0) + 1 AS BIGINT)
         :CAST(GREATEST(seq_id * 32 - off, 0)
           + LEAST((seq_id + 1) * 32, off + n)
           - GREATEST(seq_id * 32, off) AS BIGINT)] AS rpiece
  FROM s),
q AS (
  SELECT seq_id,
    CAST(len(flatten(list(piece ORDER BY seq_start))) AS BIGINT)
      AS n_tokens,
    CAST(len(list_filter(flatten(list(mpiece ORDER BY seq_start)),
      x -> x)) AS BIGINT) AS n_supervised,
    flatten(list(piece ORDER BY seq_start)) AS tokens,
    flatten(list(mpiece ORDER BY seq_start)) AS loss_mask,
    list_filter(flatten(list(rpiece ORDER BY seq_start)),
      x -> x IS NOT NULL) AS asset_ids
  FROM p GROUP BY seq_id)"""


@query(
    "z124_multimodal_bin_round_trip",
    _Z124_PACK_SQL + r""",
sh AS (
  SELECT *,
    CAST(CAST(('0x' || substring(md5(CAST(seq_id AS VARCHAR)
      || 'z124'), 1, 8)) AS BIGINT) % 8 AS INT) AS shard
  FROM q)
SELECT shard,
  CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY seq_id) - 1
    AS BIGINT) AS seq_index,
  seq_id, n_tokens, n_supervised, tokens, loss_mask, asset_ids
FROM sh ORDER BY seq_id ASC""",
    doc="MULTIMODAL BINARY SHARD ROUND TRIP (operators/binshard.py"
    "::export_bin_shards assets_col + read_bin_shards) — the r11"
    " verdict's VLM-trainer gap, closed: z120's mask+binding-"
    "preserving packed sequences written to the memory-mapped layer"
    " with a third aligned stream — the .ast sidecar carrying each"
    " sequence's asset-ref ids in placeholder order (offsets + u64"
    " refs, crc'd in the manifest, recounted by verify) — and read"
    " back; the oracle match proves the binary encode/decode is"
    " lossless on ALL THREE streams (tokens, mask bits, asset"
    " refs) plus the md5 shard rule and write order. Planted:"
    " token-length ids with placeholder id 9999 in the three z120"
    " conversation shapes (leading+trailing/none/trailing image),"
    " packed at seq_len 32 with an unsupervised EOS 0, 8 shards."
    " Scale: the z116 shape exactly — ONE repartition-by-shard"
    " shuffle into a streaming Arrow byte writer; refs are"
    " image-count-sized. Oracle: z120's triple-array slice"
    " arithmetic + z116's md5-mod shard rule in DuckDB, hash-exact"
    " including all three arrays",
)
def z124_multimodal_bin_round_trip(spark, sf_dir):
    import os

    from topn_spark.operators.binshard import (
        export_bin_shards,
        read_bin_shards,
    )
    from topn_spark.operators.pipeline import (
        pack_multimodal_sequences,
    )
    from topn_spark.operators.textstats import tokens

    d = F.col("doc_id")
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(d < 300)
        .select(
            "doc_id",
            F.transform(
                F.coalesce(
                    tokens("text"), F.array().cast("array<string>")
                ),
                lambda t: F.length(t).cast("bigint"),
            ).alias("w"),
        )
    )
    img = F.array(F.lit(9999).cast("bigint"))
    toks = (
        F.when(d % 3 == 0, F.concat(img, F.col("w"), img))
        .when(d % 3 == 1, F.col("w"))
        .otherwise(F.concat(F.col("w"), img))
    )
    assets = (
        F.when(d % 3 == 0, F.array(d * 2, d * 2 + 1))
        .when(d % 3 == 1, F.array().cast("array<bigint>"))
        .otherwise(F.array(d * 2))
    )
    planted = docs.select(
        "doc_id", toks.alias("tokens"), assets.alias("asset_ids")
    ).withColumn(
        "loss_mask",
        F.transform(
            "tokens", lambda t: (t != 9999) & (t >= 4)
        ),
    )
    packed = pack_multimodal_sequences(
        planted,
        id_col="doc_id",
        order_col="doc_id",
        seq_len=32,
        image_token=9999,
        sep_token=0,
    )
    out_dir = f"/tmp/topn_z124_{os.path.basename(sf_dir.rstrip('/'))}"
    export_bin_shards(
        packed, out_dir, 8, assets_col="asset_ids", salt="z124"
    )
    return read_bin_shards(spark, out_dir).orderBy("seq_id")


@query(
    "z125_incremental_bin_export",
    r"""WITH t AS (
  SELECT doc_id,
    CASE WHEN doc_id = 137
      THEN list_prepend(CAST(7777 AS BIGINT), list_transform(
        regexp_extract_all(lower(text), '[a-z0-9]+'),
        x -> CAST(length(x) AS BIGINT)))
      ELSE list_transform(
        regexp_extract_all(lower(text), '[a-z0-9]+'),
        x -> CAST(length(x) AS BIGINT))
    END AS toks
  FROM documents WHERE doc_id < 250
    AND len(regexp_extract_all(lower(text), '[a-z0-9]+')) > 0),
m AS (
  SELECT doc_id, toks,
    list_transform(toks, x -> x >= 4) AS msk,
    CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)
      || 'z125'), 1, 8)) AS BIGINT) % 6 AS INT) AS shard
  FROM t)
SELECT shard,
  CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id) - 1
    AS BIGINT) AS seq_index,
  doc_id AS seq_id,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  CAST(len(list_filter(msk, x -> x)) AS BIGINT) AS n_supervised,
  toks AS tokens, msk AS loss_mask
FROM m ORDER BY seq_id ASC""",
    doc="INCREMENTAL BINARY RE-EXPORT (operators/binshard.py::"
    "export_bin_shards incremental=True) — the r11 verdict's other"
    " binary-layer gap: a corpus delta must not rewrite a 100 TB"
    " shard set. Every manifest row stores a logical content_sig"
    " (count + XOR of per-sequence xxhash64, accumulated FREE"
    " inside the export writer); an incremental run recomputes the"
    " signatures with ONE map-side-combinable aggregate (no file"
    " I/O), rewrites only shards whose signature changed, deletes"
    " orphans, and bumps export_version. This entry RUNS the full"
    " v1 export, then the incremental v2 export (one document"
    " altered — exactly one shard's signature changes), and returns"
    " the v2 read-back: the oracle match proves delta-export ="
    " declarative result, byte-for-byte (the only-affected-shard"
    " and no-op-writes-nothing properties are pytest-pinned)."
    " Planted: token-length ids for doc_id < 250, doc 137 prepended"
    " a 7777 marker in v2, 6 shards. Scale: the delta decision is"
    " one aggregate over the corpus; the write shuffle carries ONLY"
    " changed shards' rows. Oracle: md5-mod shard rule +"
    " ROW_NUMBER in DuckDB over the v2 corpus, hash-exact",
)
def z125_incremental_bin_export(spark, sf_dir):
    import os
    import shutil

    from topn_spark.operators.binshard import (
        export_bin_shards,
        read_bin_shards,
    )
    from topn_spark.operators.textstats import tokens

    d = F.col("doc_id")

    def corpus(v2: bool):
        base = (
            load_table(spark, sf_dir, "documents")
            .where(d < 250)
            .select(
                "doc_id",
                F.transform(
                    tokens("text"),
                    lambda t: F.length(t).cast("bigint"),
                ).alias("tokens"),
            )
            .where(F.size("tokens") > 0)
        )
        if v2:
            base = base.withColumn(
                "tokens",
                F.when(
                    d == 137,
                    F.concat(
                        F.array(F.lit(7777).cast("bigint")),
                        F.col("tokens"),
                    ),
                ).otherwise(F.col("tokens")),
            )
        return base.withColumn(
            "loss_mask",
            F.transform("tokens", lambda t: t >= 4),
        )

    out_dir = f"/tmp/topn_z125_{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(out_dir, ignore_errors=True)
    export_bin_shards(
        corpus(False), out_dir, 6, id_col="doc_id", salt="z125"
    )
    export_bin_shards(
        corpus(True), out_dir, 6, id_col="doc_id", salt="z125",
        incremental=True,
    )
    return read_bin_shards(spark, out_dir).orderBy("seq_id")


@query(
    "z126_bin_window_read",
    r"""WITH t AS (
  SELECT doc_id,
    list_transform(regexp_extract_all(lower(text), '[a-z0-9]+'),
      x -> CAST(length(x) AS BIGINT)) AS toks
  FROM documents WHERE doc_id < 200
    AND len(regexp_extract_all(lower(text), '[a-z0-9]+')) > 0),
m AS (
  SELECT doc_id AS seq_id, toks,
    list_transform(toks, x -> x >= 4) AS msk,
    CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)
      || 'z126'), 1, 8)) AS BIGINT) % 5 AS INT) AS shard
  FROM t),
ix AS (
  SELECT *,
    CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY seq_id) - 1
      AS BIGINT) AS seq_index
  FROM m),
pos AS (
  SELECT *,
    CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY
      md5('2:' || CAST(shard AS VARCHAR) || ':'
        || CAST(seq_index AS VARCHAR) || 'z126e'),
      seq_index) - 1 AS BIGINT) AS position
  FROM ix),
sh AS (
  SELECT shard, COUNT(*) AS n_seqs,
    md5('2:' || CAST(shard AS VARCHAR) || 'z126e') AS skey
  FROM pos GROUP BY shard),
sp AS (
  SELECT shard,
    CAST(ROW_NUMBER() OVER (ORDER BY skey, shard) - 1 AS INT)
      AS shard_pos,
    CAST(COALESCE(SUM(n_seqs) OVER (ORDER BY skey, shard
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS BIGINT) AS base
  FROM sh)
SELECT base + position AS global_pos, shard, shard_pos, position,
  seq_index, seq_id,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  CAST(len(list_filter(msk, x -> x)) AS BIGINT) AS n_supervised,
  toks AS tokens, msk AS loss_mask
FROM pos JOIN sp USING (shard)
WHERE base + position >= 40 AND base + position < 120
ORDER BY global_pos ASC""",
    doc="TRAINER-RESUME WINDOW READ (operators/binshard.py::"
    "read_bin_window) — the r11 verdict's resume gap: read"
    " sequences [40, 120) of epoch 2's global consumption order"
    " WITHOUT scanning the corpus — global position dereferences"
    " through the epoch's macro shard order, the per-shard .ep"
    " permutation file (seek to the slice), and the .idx offset"
    " table, then ONE seek+read per sequence in .bin/.msk; per-task"
    " bytes are proportional to the window (pytest proves it"
    " destructively by zeroing all out-of-window token bytes)."
    " This entry RUNS export + epoch-order export + the window"
    " read; the oracle recomputes the whole dereference chain —"
    " md5-mod shard assignment, within-shard ascending-id layout,"
    " salted-md5 within-shard permutation AND macro shard order,"
    " cumulative global offsets, the slice — in DuckDB, hash-exact"
    " including the token and mask arrays. Planted: token-length"
    " ids for doc_id < 200, 5 shards, epoch 2, salt'd permutation.",
)
def z126_bin_window_read(spark, sf_dir):
    import os
    import shutil

    from topn_spark.operators.binshard import (
        export_bin_shards,
        export_epoch_order,
        read_bin_window,
    )
    from topn_spark.operators.textstats import tokens

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 200)
        .select(
            "doc_id",
            F.transform(
                tokens("text"),
                lambda t: F.length(t).cast("bigint"),
            ).alias("tokens"),
        )
        .where(F.size("tokens") > 0)
        .withColumn(
            "loss_mask",
            F.transform("tokens", lambda t: t >= 4),
        )
    )
    out_dir = f"/tmp/topn_z126_{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(out_dir, ignore_errors=True)
    export_bin_shards(
        docs, out_dir, 5, id_col="doc_id", salt="z126"
    )
    export_epoch_order(spark, out_dir, 2, salt="z126e")
    return read_bin_window(spark, out_dir, 2, 40, 120).orderBy(
        "global_pos"
    )


@query(
    "z127_preference_bin_round_trip",
    r"""WITH t AS (
  SELECT doc_id AS pair_id,
    list_transform(regexp_extract_all(lower(text), '[a-z0-9]+'),
      x -> CAST(length(x) AS BIGINT)) AS ct
  FROM documents WHERE doc_id < 250
    AND len(regexp_extract_all(lower(text), '[a-z0-9]+')) > 0),
p AS (
  SELECT pair_id, ct,
    list_prepend(CAST(5 AS BIGINT),
      list_transform(ct, x -> LEAST(x, CAST(9 AS BIGINT)))) AS rt,
    list_transform(ct, x -> x >= 4) AS cm,
    CAST(CAST(('0x' || substring(md5(CAST(pair_id AS VARCHAR)
      || 'z127'), 1, 8)) AS BIGINT) % 6 AS INT) AS shard
  FROM t),
f AS (
  SELECT *, list_transform(rt, x -> x >= 3) AS rm FROM p)
SELECT shard,
  CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY pair_id) - 1
    AS BIGINT) AS pair_index,
  pair_id,
  CAST(len(ct) AS BIGINT) AS chosen_n_tokens,
  CAST(len(rt) AS BIGINT) AS rejected_n_tokens,
  CAST(len(list_filter(cm, x -> x)) AS BIGINT)
    AS chosen_n_supervised,
  CAST(len(list_filter(rm, x -> x)) AS BIGINT)
    AS rejected_n_supervised,
  ct AS chosen_tokens, rt AS rejected_tokens,
  cm AS chosen_mask, rm AS rejected_mask
FROM f ORDER BY pair_id ASC""",
    doc="PREFERENCE-PAIR BINARY ROUND TRIP (operators/binshard.py"
    "::export_preference_shards/read_preference_shards) — the r11"
    " verdict's post-training binary gap: DPO/KTO trainers consume"
    " PAIRED chosen/rejected token+mask streams memory-mapped, and"
    " exporting the sides independently loses the one thing the"
    " loss needs. Each pair lands as two sequences of the STANDARD"
    " .bin/.idx/.msk layout under seq_id = 2*pair_id + stream,"
    " sharded on the PAIR id — both halves in the same shard,"
    " physically adjacent (chosen at even index i, rejected at"
    " i+1): the adjacency IS the paired index, machine-checked by"
    " verify_preference_shards, and base-format tooling still"
    " reads the shards. The paired read is map-only (NO join — a"
    " reshape-by-join would shuffle the corpus to rediscover what"
    " adjacency encodes). Planted: chosen = token-length ids,"
    " rejected = capped lengths behind a 5-marker, masks >=4/>=3,"
    " 6 shards. Oracle: md5-mod-on-pair shard rule + ROW_NUMBER"
    " pair order in DuckDB, hash-exact on all four arrays",
)
def z127_preference_bin_round_trip(spark, sf_dir):
    import os
    import shutil

    from topn_spark.operators.binshard import (
        export_preference_shards,
        read_preference_shards,
    )
    from topn_spark.operators.textstats import tokens

    pairs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 250)
        .select(
            F.col("doc_id").alias("pair_id"),
            F.transform(
                tokens("text"),
                lambda t: F.length(t).cast("bigint"),
            ).alias("chosen_tokens"),
        )
        .where(F.size("chosen_tokens") > 0)
        .withColumn(
            "rejected_tokens",
            F.concat(
                F.array(F.lit(5).cast("bigint")),
                F.transform(
                    "chosen_tokens", lambda t: F.least(t, F.lit(9))
                ),
            ),
        )
        .withColumn(
            "chosen_mask",
            F.transform("chosen_tokens", lambda t: t >= 4),
        )
        .withColumn(
            "rejected_mask",
            F.transform("rejected_tokens", lambda t: t >= 3),
        )
    )
    out_dir = f"/tmp/topn_z127_{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(out_dir, ignore_errors=True)
    export_preference_shards(pairs, out_dir, 6, salt="z127")
    return read_preference_shards(spark, out_dir).orderBy("pair_id")


_Z128_MATRIX_SQL = r"""WITH s AS (
  SELECT (doc_id // 120) AS batch_id,
    (doc_id // 8) AS prompt_id,
    'm' || (doc_id % 4) AS model,
    CAST((doc_id * 7) % 29 AS DOUBLE)
      + CASE doc_id % 4 WHEN 0 THEN 10 ELSE 0 END
      + CASE doc_id % 4 WHEN 3 THEN 6.0 * (doc_id // 120)
        ELSE 0 END AS score
  FROM documents WHERE doc_id < 480),
best AS (
  SELECT batch_id, prompt_id, model, MAX(score) AS s
  FROM s GROUP BY batch_id, prompt_id, model)
SELECT a.batch_id, a.model AS model_a, b.model AS model_b,
  CAST(SUM(CASE WHEN a.s > b.s THEN 1 ELSE 0 END) AS BIGINT)
    AS wins_a,
  CAST(SUM(CASE WHEN a.s < b.s THEN 1 ELSE 0 END) AS BIGINT)
    AS wins_b,
  CAST(SUM(CASE WHEN a.s = b.s THEN 1 ELSE 0 END) AS BIGINT)
    AS ties
FROM best a JOIN best b
  ON a.batch_id = b.batch_id AND a.prompt_id = b.prompt_id
  AND a.model < b.model
GROUP BY a.batch_id, a.model, b.model"""


def _z128_decayed_bt_exact(con):
    """Independent mirror of the decayed Bradley–Terry leaderboard:
    per-batch win matrices from DuckDB SQL, the SAME
    0.5^((N-b)/half_life) weights applied to a dict-keyed effective-
    win accumulation (different summation order than the operator's
    Spark agg + sorted-list MM core), same Hunter MM + geometric-
    mean-1 anchor. Tolerance 1e-9 (float summation order)."""
    import math

    rows = con.execute(_Z128_MATRIX_SQL).fetchall()
    last, half_life, smoothing = 3, 1.0, 0.5
    w: dict = {}
    for b, ma, mb, wa, wb, t in rows:
        g = 0.5 ** ((last - b) / half_life)
        w[(ma, mb)] = (
            w.get((ma, mb), 0.0) + g * (wa + t / 2) + 0.0
        )
        w[(mb, ma)] = (
            w.get((mb, ma), 0.0) + g * (wb + t / 2) + 0.0
        )
    # smoothing applies per observed DIRECTED pair once, as in the
    # operator's matrix-level fit over the weighted sums
    for k in list(w):
        w[k] += smoothing
    models = sorted({a for a, _ in w})
    pi = {m: 1.0 for m in models}
    for _ in range(1000):
        new = {}
        for i in models:
            wi = sum(v for (a, _), v in w.items() if a == i)
            den = sum(
                (w[(i, j)] + w[(j, i)]) / (pi[i] + pi[j])
                for j in models
                if (i, j) in w
            )
            new[i] = wi / den
        gm = math.exp(
            sum(math.log(v) for v in new.values()) / len(models)
        )
        new = {k: v / gm for k, v in new.items()}
        delta = max(
            abs(math.log(new[k]) - math.log(pi[k])) for k in models
        )
        pi = new
        if delta < 1e-12:
            break
    wins = {
        i: sum(v for (a, _), v in w.items() if a == i)
        for i in models
    }
    games = {
        i: sum(w[(i, j)] + w[(j, i)] for j in models if (i, j) in w)
        for i in models
    }
    out = [
        (m, pi[m], 400.0 * math.log10(pi[m]), wins[m], games[m])
        for m in sorted(pi)
    ]
    return (
        ["model", "strength", "rating", "wins_eff", "n_games"],
        out,
    )


@query(
    "z128_decayed_bt_leaderboard",
    None,
    tol_oracle=_z128_decayed_bt_exact,
    tolerance=1e-9,
    tol_keys=("model",),
    doc="DECAYED (EXPONENTIAL-FORGETTING) ARENA LEADERBOARD"
    " (operators/sft.py::pairwise_winrate + bradley_terry_fit over"
    " half-life-weighted effective counts; the batch-level core of"
    " streaming/ingest.py::arena_monitor_batch half_life_batches) —"
    " the production leaderboard shape: a model swap must show in"
    " the ratings within ~a half-life instead of being diluted by"
    " months of stale wins, so batch b's win matrix is weighted"
    " 0.5^((N-b)/half_life) before the fit (the BT likelihood"
    " accepts weighted sufficient statistics directly; the fit"
    " core is float-transparent). Planted: the z117 fixture plus a"
    " batch dimension (4 batches of 120 docs) where m3 improves"
    " 6 points per batch — the decayed fit must rank m3 above its"
    " undecayed standing. Scale: per-batch matrices are the z113"
    " shapes; the decay+fit touches only (batches x k²) rows."
    " Oracle: INDEPENDENT dict-keyed weighted MM mirror over the"
    " same DuckDB-computed per-batch matrices, tolerance 1e-9",
)
def z128_decayed_bt_leaderboard(spark, sf_dir):
    from topn_spark.operators.sft import (
        bradley_terry_fit,
        pairwise_winrate,
    )

    d = F.col("doc_id")
    docs = load_table(spark, sf_dir, "documents").where(d < 480)
    samples = docs.select(
        (d / 120).cast("bigint").alias("batch_id"),
        (d / 8).cast("bigint").alias("prompt_id"),
        F.concat(F.lit("m"), (d % 4).cast("string")).alias("model"),
        (
            ((d * 7) % 29).cast("double")
            + F.when(d % 4 == 0, F.lit(10.0)).otherwise(F.lit(0.0))
            + F.when(
                d % 4 == 3, (d / 120).cast("bigint") * 6.0
            ).otherwise(F.lit(0.0))
        ).alias("score"),
    )
    mats = []
    for b in range(4):
        mats.append(
            pairwise_winrate(
                samples.where(F.col("batch_id") == b)
            ).withColumn("batch_id", F.lit(b).cast("bigint"))
        )
    hist = mats[0]
    for m in mats[1:]:
        hist = hist.unionByName(m)
    last, half_life = 3, 1.0
    w = F.pow(
        F.lit(0.5),
        (F.lit(last) - F.col("batch_id")) / F.lit(half_life),
    )
    decayed = hist.groupBy("model_a", "model_b").agg(
        *[
            F.sum(F.col(c) * w).alias(c)
            for c in ("wins_a", "wins_b", "ties")
        ]
    )
    return (
        bradley_terry_fit(decayed, smoothing=0.5)
        .select(
            "model", "strength", "rating", "wins_eff", "n_games"
        )
        .orderBy("model")
    )


@query(
    "z129_bin_data_card",
    r"""WITH t AS (
  SELECT doc_id,
    list_transform(regexp_extract_all(lower(text), '[a-z0-9]+'),
      x -> CAST(length(x) AS BIGINT)) AS toks
  FROM documents WHERE doc_id < 220
    AND len(regexp_extract_all(lower(text), '[a-z0-9]+')) > 0),
m AS (
  SELECT doc_id, toks,
    CAST(len(toks) AS BIGINT) AS n,
    CAST(len(list_filter(toks, x -> x >= 4)) AS BIGINT) AS nsup,
    CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)
      || 'z129'), 1, 8)) AS BIGINT) % 4 AS INT) AS shard
  FROM t)
SELECT
  CAST(COUNT(DISTINCT shard) AS BIGINT) AS n_shards,
  CAST(COUNT(*) AS BIGINT) AS n_seqs,
  CAST(SUM(n) AS BIGINT) AS n_tokens,
  CAST(SUM(nsup) AS BIGINT) AS n_supervised,
  ROUND(CAST(SUM(nsup) AS DOUBLE) / CAST(SUM(n) AS DOUBLE), 6)
    AS supervised_ratio,
  CAST(0 AS BIGINT) AS n_assets,
  'uint16' AS dtype,
  TRUE AS has_mask,
  FALSE AS has_assets,
  'seq' AS layout,
  CAST(1 AS BIGINT) AS export_version,
  CAST(2 * SUM(n) AS BIGINT) AS bin_bytes,
  CAST(SUM((n + 7) // 8) AS BIGINT) AS msk_bytes,
  CAST(0 AS BIGINT) AS ast_bytes,
  CAST(MIN(n) AS BIGINT) AS min_seq_len,
  CAST(MAX(n) AS BIGINT) AS max_seq_len,
  ROUND(CAST(SUM(n) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
    AS mean_seq_len,
  CAST([0, 1] AS INT[]) AS epochs_exported
FROM m""",
    doc="BINARY SHARD DATA CARD (operators/binshard.py::"
    "bin_shard_data_card) — the release-accounting family completed"
    " at the binary layer (the r11 forward-build item): a data card"
    " that describes the parquet corpus but not the exported shards"
    " documents the wrong artifact, so this one summarizes what the"
    " trainer is ACTUALLY fed — totals from the byte-exact"
    " _manifest, per-sequence length extremes re-read from the"
    " index-sized .idx tables (one task per shard), stream"
    " flags/dtype/export_version from _manifest_meta, and"
    " epochs_exported = epochs whose manifest AND per-shard .ep"
    " files are ALL present (a partial epoch export is not"
    " coverage — pytest-pinned). This entry RUNS export + two"
    " epoch-order exports and returns the one-row card; the oracle"
    " recomputes every field declaratively from the corpus"
    " (bin_bytes = 2 x tokens under uint16, msk_bytes = sum of"
    " ceil(len/8) — the format arithmetic itself). Planted:"
    " token-length ids for doc_id < 220, 4 shards, epochs 0 and 1.",
)
def z129_bin_data_card(spark, sf_dir):
    import os
    import shutil

    from topn_spark.operators.binshard import (
        bin_shard_data_card,
        export_bin_shards,
        export_epoch_order,
    )
    from topn_spark.operators.textstats import tokens

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 220)
        .select(
            "doc_id",
            F.transform(
                tokens("text"),
                lambda t: F.length(t).cast("bigint"),
            ).alias("tokens"),
        )
        .where(F.size("tokens") > 0)
        .withColumn(
            "loss_mask",
            F.transform("tokens", lambda t: t >= 4),
        )
    )
    out_dir = f"/tmp/topn_z129_{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(out_dir, ignore_errors=True)
    export_bin_shards(
        docs, out_dir, 4, id_col="doc_id", salt="z129"
    )
    export_epoch_order(spark, out_dir, 0, salt="z129")
    export_epoch_order(spark, out_dir, 1, salt="z129")
    return bin_shard_data_card(spark, out_dir)


def _z130_mm_fit(w):
    import math

    models = sorted({a for a, _ in w})
    pi = {m: 1.0 for m in models}
    for _ in range(1000):
        new = {}
        for i in models:
            wi = sum(v for (a, _), v in w.items() if a == i)
            den = sum(
                (w[(i, j)] + w[(j, i)]) / (pi[i] + pi[j])
                for j in models
                if (i, j) in w
            )
            new[i] = wi / den
        gm = math.exp(
            sum(math.log(v) for v in new.values()) / len(models)
        )
        new = {k: v / gm for k, v in new.items()}
        delta = max(
            abs(math.log(new[k]) - math.log(pi[k])) for k in models
        )
        pi = new
        if delta < 1e-12:
            break
    return pi


def _z130_cumulative_drift_exact(con):
    """Independent mirror of the cumulative arena monitor's final
    batch: per-batch matrices from DuckDB SQL, dict-keyed MM fits
    of the SUMMED matrix (batches <= 3) and of batch 0 alone,
    drift = cumulative rating - first-batch rating. Tolerance 1e-9
    (MM summation order)."""
    import math

    rows = con.execute(_Z128_MATRIX_SQL).fetchall()
    smoothing = 0.5

    def acc(batches):
        w: dict = {}
        seen = set()
        for b, ma, mb, wa, wb, t in rows:
            if b not in batches:
                continue
            w[(ma, mb)] = w.get((ma, mb), 0.0) + wa + t / 2
            w[(mb, ma)] = w.get((mb, ma), 0.0) + wb + t / 2
            seen.add((ma, mb))
        # smoothing once per direction of each pair ROW the fit
        # sees — the cumulative fit consumes ONE summed row per pair
        for k in list(w):
            w[k] += smoothing
        return w

    cum = _z130_mm_fit(acc({0, 1, 2, 3}))
    base = _z130_mm_fit(acc({0}))
    out = [
        (
            m,
            400.0 * math.log10(cum[m]),
            400.0 * math.log10(cum[m])
            - 400.0 * math.log10(base[m]),
        )
        for m in sorted(cum)
    ]
    return ["model", "rating", "drift"], out


@query(
    "z130_arena_cumulative_drift",
    None,
    tol_oracle=_z130_cumulative_drift_exact,
    tolerance=1e-9,
    tol_keys=("model",),
    doc="CUMULATIVE ARENA STATE + DRIFT SIGNAL (streaming/"
    "ingest.py::arena_monitor_batch cumulative=True) — the r11"
    " verdict task: a slow regression invisible in each batch's own"
    " noisy fit must surface, so the monitor fits the SUMMED win"
    " matrix over every committed batch <= N (the matrix partitions"
    " ARE the state — k²-sized, no second statestore) and emits"
    " drift = cumulative rating minus the same model's rating on"
    " the FIRST batch alone. Because the output is a pure function"
    " of partitions <= N, a replayed batch overwrites"
    " byte-identically: restart-idempotent with NO mutable state"
    " (pytest-pinned, plus the empty-batch skip contract). This"
    " entry RUNS the monitor over the four z128-planted batches"
    " (m3 improves 6 points per batch) and returns the final"
    " batch's cumulative partition — m3's drift must be the large"
    " positive outlier. Scale: per batch the z113 shapes; the"
    " cumulative read scans (batches x k²) matrix rows, never"
    " samples. Oracle: INDEPENDENT dict-keyed MM fits of the"
    " summed and first-batch matrices in DuckDB+Python, drift"
    " differenced the same way, tolerance 1e-9",
)
def z130_arena_cumulative_drift(spark, sf_dir):
    import os
    import shutil

    from topn_spark.streaming.ingest import arena_monitor_batch

    d = F.col("doc_id")
    docs = load_table(spark, sf_dir, "documents").where(d < 480)
    samples = docs.select(
        (d / 120).cast("bigint").alias("batch_id"),
        (d / 8).cast("bigint").alias("prompt_id"),
        F.concat(F.lit("m"), (d % 4).cast("string")).alias("model"),
        (
            ((d * 7) % 29).cast("double")
            + F.when(d % 4 == 0, F.lit(10.0)).otherwise(F.lit(0.0))
            + F.when(
                d % 4 == 3, (d / 120).cast("bigint") * 6.0
            ).otherwise(F.lit(0.0))
        ).alias("score"),
    )
    out_dir = f"/tmp/topn_z130_{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(out_dir, ignore_errors=True)
    for b in range(4):
        arena_monitor_batch(
            samples.where(F.col("batch_id") == b).drop("batch_id"),
            out_dir,
            b,
        )
    return (
        spark.read.parquet(f"{out_dir}/cumulative/batch_id=3")
        .select("model", "rating", "drift")
        .orderBy("model")
    )


@query(
    "z131_preference_window_read",
    r"""WITH t AS (
  SELECT doc_id AS pair_id,
    list_transform(regexp_extract_all(lower(text), '[a-z0-9]+'),
      x -> CAST(length(x) AS BIGINT)) AS ct
  FROM documents WHERE doc_id < 250
    AND len(regexp_extract_all(lower(text), '[a-z0-9]+')) > 0),
p AS (
  SELECT pair_id, ct,
    list_prepend(CAST(5 AS BIGINT),
      list_transform(ct, x -> LEAST(x, CAST(9 AS BIGINT)))) AS rt,
    list_transform(ct, x -> x >= 4) AS cm,
    CAST(CAST(('0x' || substring(md5(CAST(pair_id AS VARCHAR)
      || 'z131'), 1, 8)) AS BIGINT) % 4 AS INT) AS shard
  FROM t),
f AS (
  SELECT *, list_transform(rt, x -> x >= 3) AS rm FROM p),
ix AS (
  SELECT *,
    CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY pair_id) - 1
      AS BIGINT) AS pair_index
  FROM f),
pos AS (
  SELECT *,
    CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY
      md5('1:' || CAST(shard AS VARCHAR) || ':'
        || CAST(pair_index AS VARCHAR) || 'z131e'),
      pair_index) - 1 AS BIGINT) AS position
  FROM ix),
sh AS (
  SELECT shard, COUNT(*) AS n_units,
    md5('1:' || CAST(shard AS VARCHAR) || 'z131e') AS skey
  FROM pos GROUP BY shard),
sp AS (
  SELECT shard,
    CAST(ROW_NUMBER() OVER (ORDER BY skey, shard) - 1 AS INT)
      AS shard_pos,
    CAST(COALESCE(SUM(n_units) OVER (ORDER BY skey, shard
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS BIGINT) AS base
  FROM sh)
SELECT base + position AS global_pos, shard, shard_pos, position,
  pair_index, pair_id,
  CAST(len(ct) AS BIGINT) AS chosen_n_tokens,
  CAST(len(rt) AS BIGINT) AS rejected_n_tokens,
  CAST(len(list_filter(cm, x -> x)) AS BIGINT)
    AS chosen_n_supervised,
  CAST(len(list_filter(rm, x -> x)) AS BIGINT)
    AS rejected_n_supervised,
  ct AS chosen_tokens, rt AS rejected_tokens,
  cm AS chosen_mask, rm AS rejected_mask
FROM pos JOIN sp USING (shard)
WHERE base + position >= 10 AND base + position < 70
ORDER BY global_pos ASC""",
    doc="PAIRED TRAINER-RESUME WINDOW (operators/binshard.py::"
    "export_epoch_order unit='pair' + read_preference_window) — the"
    " DPO dataloader's missing half: a sequence-level epoch"
    " permutation over a preference shard set would tear every"
    " chosen/rejected pair apart, so pair-unit epochs permute PAIRS"
    " (n_seqs/2 units per shard, odd shards RAISE) and the window"
    " read dereferences pair p to its adjacent sequences 2p/2p+1"
    " with one .idx seek each — per-task bytes proportional to the"
    " window; unit mismatches in either direction RAISE"
    " (pytest-pinned). This entry RUNS preference export +"
    " pair-unit epoch export + the window read of pairs [10, 70) of"
    " epoch 1; the oracle recomputes the full chain — md5-mod-on-"
    "pair shard rule, ROW_NUMBER pair order, salted-md5 pair AND"
    " macro permutations, cumulative offsets, the slice — in"
    " DuckDB, hash-exact on all four arrays. Planted: the z127"
    " fixture, 4 shards, epoch 1.",
)
def z131_preference_window_read(spark, sf_dir):
    import os
    import shutil

    from topn_spark.operators.binshard import (
        export_epoch_order,
        export_preference_shards,
        read_preference_window,
    )
    from topn_spark.operators.textstats import tokens

    pairs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 250)
        .select(
            F.col("doc_id").alias("pair_id"),
            F.transform(
                tokens("text"),
                lambda t: F.length(t).cast("bigint"),
            ).alias("chosen_tokens"),
        )
        .where(F.size("chosen_tokens") > 0)
        .withColumn(
            "rejected_tokens",
            F.concat(
                F.array(F.lit(5).cast("bigint")),
                F.transform(
                    "chosen_tokens", lambda t: F.least(t, F.lit(9))
                ),
            ),
        )
        .withColumn(
            "chosen_mask",
            F.transform("chosen_tokens", lambda t: t >= 4),
        )
        .withColumn(
            "rejected_mask",
            F.transform("rejected_tokens", lambda t: t >= 3),
        )
    )
    out_dir = f"/tmp/topn_z131_{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(out_dir, ignore_errors=True)
    export_preference_shards(pairs, out_dir, 4, salt="z131")
    export_epoch_order(spark, out_dir, 1, salt="z131e", unit="pair")
    return read_preference_window(spark, out_dir, 1, 10, 70).orderBy(
        "global_pos"
    )


@query(
    "z132_streaming_bin_maintenance",
    r"""WITH t AS (
  SELECT doc_id,
    list_transform(regexp_extract_all(lower(text), '[a-z0-9]+'),
      x -> CAST(length(x) AS BIGINT)) AS toks
  FROM documents WHERE doc_id < 250
    AND len(regexp_extract_all(lower(text), '[a-z0-9]+')) > 0),
m AS (
  SELECT doc_id, toks,
    list_transform(toks, x -> x >= 4) AS msk,
    CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)
      || 'z132'), 1, 8)) AS BIGINT) % 6 AS INT) AS shard
  FROM t)
SELECT shard,
  CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id) - 1
    AS BIGINT) AS seq_index,
  doc_id AS seq_id,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  CAST(len(list_filter(msk, x -> x)) AS BIGINT) AS n_supervised,
  toks AS tokens, msk AS loss_mask
FROM m ORDER BY seq_id ASC""",
    doc="BATCH-PROPORTIONAL STREAMING SHARD MAINTENANCE (streaming/"
    "ingest.py::bin_export_batch + operators/binshard.py::"
    "export_bin_shards_delta) — the r12 verdict's top-ranked gap:"
    " the previous streaming wrapper re-scanned the FULL corpus"
    " store per micro-batch (200 TB of input per 1 GB commit at"
    " the design point; input passes ARE the cost model). Now each"
    " batch lands in the corpus store partitioned by the SAME"
    " deterministic md5-mod shard id the exporter uses, per-shard"
    " content signatures FOLD from the batch alone against the"
    " stored manifest (count+XOR is incrementally updatable under"
    " the append-only unique-id contract — one batch-sized"
    " aggregate, zero store input), and the rewrite reads ONLY the"
    " touched shards' partitions via Catalyst partition pruning"
    " (pytest proves it by POISONING every untouched partition);"
    " a post-write cross-check raises if the fold was unsound."
    " This entry RUNS three maintenance commits (doc_id [0,100),"
    " [100,180), [180,250)) and returns the final binary"
    " read-back: the oracle match proves three folded deltas ="
    " the declarative result over the whole corpus, hash-exact;"
    " byte-identity with a from-scratch export and the"
    " replay-converges contract are pytest-pinned. Scale: per"
    " commit = batch write + batch-sized agg + touched-shard"
    " rewrite, independent of corpus size.",
)
def z132_streaming_bin_maintenance(spark, sf_dir):
    import os
    import shutil

    from topn_spark.operators.binshard import read_bin_shards
    from topn_spark.operators.textstats import tokens
    from topn_spark.streaming.ingest import bin_export_batch

    d = F.col("doc_id")
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(d < 250)
        .select(
            "doc_id",
            F.transform(
                tokens("text"),
                lambda t: F.length(t).cast("bigint"),
            ).alias("tokens"),
        )
        .where(F.size("tokens") > 0)
        .withColumn(
            "loss_mask", F.transform("tokens", lambda t: t >= 4)
        )
    )
    base = f"/tmp/topn_z132_{os.path.basename(sf_dir.rstrip('/'))}"
    corpus, out = f"{base}_store", f"{base}_out"
    shutil.rmtree(corpus, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)
    for i, (lo, hi) in enumerate([(0, 100), (100, 180), (180, 250)]):
        bin_export_batch(
            docs.where((d >= lo) & (d < hi)),
            corpus, out, i, 6,
            id_col="doc_id", salt="z132",
        )
    return read_bin_shards(spark, out).orderBy("seq_id")


@query(
    "z133_epoch_version_lifecycle",
    r"""WITH t AS (
  SELECT doc_id,
    CASE WHEN doc_id = 57
      THEN list_prepend(CAST(8888 AS BIGINT), list_transform(
        regexp_extract_all(lower(text), '[a-z0-9]+'),
        x -> CAST(length(x) AS BIGINT)))
      ELSE list_transform(
        regexp_extract_all(lower(text), '[a-z0-9]+'),
        x -> CAST(length(x) AS BIGINT))
    END AS toks
  FROM documents WHERE doc_id < 200
    AND len(regexp_extract_all(lower(text), '[a-z0-9]+')) > 0),
m AS (
  SELECT doc_id AS seq_id, toks,
    list_transform(toks, x -> x >= 4) AS msk,
    CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)
      || 'z133'), 1, 8)) AS BIGINT) % 5 AS INT) AS shard
  FROM t),
ix AS (
  SELECT *,
    CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY seq_id) - 1
      AS BIGINT) AS seq_index
  FROM m),
pos AS (
  SELECT *,
    CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY
      md5('0:' || CAST(shard AS VARCHAR) || ':'
        || CAST(seq_index AS VARCHAR) || 'z133e'),
      seq_index) - 1 AS BIGINT) AS position
  FROM ix),
sh AS (
  SELECT shard, COUNT(*) AS n_seqs,
    md5('0:' || CAST(shard AS VARCHAR) || 'z133e') AS skey
  FROM pos GROUP BY shard),
sp AS (
  SELECT shard,
    CAST(ROW_NUMBER() OVER (ORDER BY skey, shard) - 1 AS INT)
      AS shard_pos,
    CAST(COALESCE(SUM(n_seqs) OVER (ORDER BY skey, shard
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS BIGINT) AS base
  FROM sh)
SELECT base + position AS global_pos, shard, shard_pos, position,
  seq_index, seq_id,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  CAST(len(list_filter(msk, x -> x)) AS BIGINT) AS n_supervised,
  toks AS tokens, msk AS loss_mask
FROM pos JOIN sp USING (shard)
WHERE base + position >= 30 AND base + position < 110
ORDER BY global_pos ASC""",
    doc="VERSION-STAMPED EPOCH LIFECYCLE (operators/binshard.py::"
    "export_epoch_order export_version stamp + _load_epoch guard +"
    " read_bin_window) — the r12 verdict task: a trainer resuming"
    " mid-epoch after a corpus version bump previously got a bare"
    " missing-file error; now every epoch manifest records WHICH"
    " export_version it is a view of, every epoch reader raises a"
    " remediation message ('order is at version N, store at M —"
    " re-run export_epoch_order') on mismatch or absence, and the"
    " data card counts only current-version epochs as exported."
    " This entry RUNS the full lifecycle: v1 export + epoch-0"
    " order, an incremental v2 export (doc 57 changes — the"
    " version bump deletes all epoch artifacts), epoch-0"
    " RE-export at v2, then the trainer-resume window [30,110) —"
    " returned content must equal the v2 dereference chain the"
    " oracle recomputes in DuckDB (md5 shard rule, ascending-id"
    " layout, salted-md5 permutations, cumulative offsets),"
    " hash-exact. The stale-epoch and missing-epoch raises are"
    " pytest-pinned. Scale: the guard reads one model-sized"
    " manifest; the window read stays seek-don't-scan.",
)
def z133_epoch_version_lifecycle(spark, sf_dir):
    import os
    import shutil

    from topn_spark.operators.binshard import (
        export_bin_shards,
        export_epoch_order,
        read_bin_window,
    )
    from topn_spark.operators.textstats import tokens

    d = F.col("doc_id")

    def corpus(v2: bool):
        base = (
            load_table(spark, sf_dir, "documents")
            .where(d < 200)
            .select(
                "doc_id",
                F.transform(
                    tokens("text"),
                    lambda t: F.length(t).cast("bigint"),
                ).alias("tokens"),
            )
            .where(F.size("tokens") > 0)
        )
        if v2:
            base = base.withColumn(
                "tokens",
                F.when(
                    d == 57,
                    F.concat(
                        F.array(F.lit(8888).cast("bigint")),
                        F.col("tokens"),
                    ),
                ).otherwise(F.col("tokens")),
            )
        return base.withColumn(
            "loss_mask", F.transform("tokens", lambda t: t >= 4)
        )

    out = f"/tmp/topn_z133_{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(out, ignore_errors=True)
    export_bin_shards(
        corpus(False), out, 5, id_col="doc_id", salt="z133"
    )
    export_epoch_order(spark, out, 0, salt="z133e")
    # the corpus moves: incremental export bumps export_version and
    # invalidates every epoch artifact
    export_bin_shards(
        corpus(True), out, 5, id_col="doc_id", salt="z133",
        incremental=True,
    )
    export_epoch_order(spark, out, 0, salt="z133e")  # re-derive @v2
    return read_bin_window(spark, out, 0, 30, 110).orderBy(
        "global_pos"
    )


@query(
    "z134_object_store_export",
    r"""WITH t AS (
  SELECT doc_id,
    list_transform(regexp_extract_all(lower(text), '[a-z0-9]+'),
      x -> CAST(length(x) AS BIGINT)) AS toks
  FROM documents WHERE doc_id < 200
    AND len(regexp_extract_all(lower(text), '[a-z0-9]+')) > 0),
m AS (
  SELECT doc_id, toks,
    list_transform(toks, x -> x >= 4) AS msk,
    CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)
      || 'z134'), 1, 8)) AS BIGINT) % 4 AS INT) AS shard
  FROM t)
SELECT shard,
  CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id) - 1
    AS BIGINT) AS seq_index,
  doc_id AS seq_id,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  CAST(len(list_filter(msk, x -> x)) AS BIGINT) AS n_supervised,
  toks AS tokens, msk AS loss_mask
FROM m ORDER BY seq_id ASC""",
    doc="OBJECT-STORAGE BINARY EXPORT (operators/binfs.py::"
    "ObjectStoreBinaryStore + the store= seam on every binshard"
    " entry point) — the r12 verdict's 'POSIX-only binary layer'"
    " gap: 100 TB trainer corpora overwhelmingly live on object"
    " storage, where there is no rename, no append, and no"
    " seek-write. Every byte of the binary layer now routes"
    " through a backend object restricted to object-store verbs"
    " (whole-object PUT via a local spool — the multipart-upload"
    " shape, ranged GET, list-by-prefix, delete; six primitives a"
    " real S3/GCS client implements), shipped INTO the executor"
    " write closures so tasks talk to storage directly. This entry"
    " RUNS export -> byte-level verify -> full read-back entirely"
    " through the object backend and returns the read frame —"
    " hash-exact vs the declarative oracle, proving the seam"
    " changes bytes nowhere; the posix-vs-object byte-identity and"
    " ranged-GET window reads are pytest-pinned. Scale: identical"
    " plan to z116 (ONE repartition-by-shard shuffle + streaming"
    " writer); atomicity moves from rename to single-object PUT.",
)
def z134_object_store_export(spark, sf_dir):
    import os
    import shutil

    from topn_spark.operators.binfs import ObjectStoreBinaryStore
    from topn_spark.operators.binshard import (
        export_bin_shards,
        read_bin_shards,
        verify_bin_shards,
    )
    from topn_spark.operators.textstats import tokens

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 200)
        .select(
            "doc_id",
            F.transform(
                tokens("text"),
                lambda t: F.length(t).cast("bigint"),
            ).alias("tokens"),
        )
        .where(F.size("tokens") > 0)
        .withColumn(
            "loss_mask", F.transform("tokens", lambda t: t >= 4)
        )
    )
    root = f"/tmp/topn_z134_{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(root, ignore_errors=True)
    st = ObjectStoreBinaryStore(root)
    out = "bucket/corpus-v1"
    export_bin_shards(
        docs, out, 4, id_col="doc_id", salt="z134", store=st
    )
    bad = (
        verify_bin_shards(spark, out, store=st)
        .where(~F.col("ok"))
        .count()
    )
    if bad:
        raise AssertionError(
            f"z134: {bad} shards failed object-store verify"
        )
    return read_bin_shards(spark, out, store=st).orderBy("seq_id")


@query(
    "z135_preference_data_card",
    r"""WITH t AS (
  SELECT doc_id AS pair_id,
    list_transform(regexp_extract_all(lower(text), '[a-z0-9]+'),
      x -> CAST(length(x) AS BIGINT)) AS ct
  FROM documents WHERE doc_id < 250
    AND len(regexp_extract_all(lower(text), '[a-z0-9]+')) > 0),
p AS (
  SELECT pair_id, ct,
    CAST(len(ct) AS BIGINT) AS cn,
    CAST(len(ct) + 1 AS BIGINT) AS rn,
    CAST(len(list_filter(ct, x -> x >= 4)) AS BIGINT) AS cs,
    CAST(1 + len(list_filter(ct, x -> x >= 3)) AS BIGINT) AS rs,
    CAST(CAST(('0x' || substring(md5(CAST(pair_id AS VARCHAR)
      || 'z135'), 1, 8)) AS BIGINT) % 4 AS INT) AS shard
  FROM t)
SELECT
  CAST(COUNT(DISTINCT shard) AS BIGINT) AS n_shards,
  CAST(2 * COUNT(*) AS BIGINT) AS n_seqs,
  CAST(SUM(cn + rn) AS BIGINT) AS n_tokens,
  CAST(SUM(cs + rs) AS BIGINT) AS n_supervised,
  ROUND(CAST(SUM(cs + rs) AS DOUBLE)
    / CAST(SUM(cn + rn) AS DOUBLE), 6) AS supervised_ratio,
  CAST(0 AS BIGINT) AS n_assets,
  'uint16' AS dtype,
  TRUE AS has_mask,
  FALSE AS has_assets,
  'pair' AS layout,
  CAST(1 AS BIGINT) AS export_version,
  CAST(2 * SUM(cn + rn) AS BIGINT) AS bin_bytes,
  CAST(SUM((cn + 7) // 8 + (rn + 7) // 8) AS BIGINT) AS msk_bytes,
  CAST(0 AS BIGINT) AS ast_bytes,
  CAST(MIN(cn) AS BIGINT) AS min_seq_len,
  CAST(MAX(rn) AS BIGINT) AS max_seq_len,
  ROUND(CAST(SUM(cn + rn) AS DOUBLE)
    / CAST(2 * COUNT(*) AS DOUBLE), 6) AS mean_seq_len,
  CAST([1] AS INT[]) AS epochs_exported,
  CAST(COUNT(*) AS BIGINT) AS n_pairs,
  CAST(SUM(cn) AS BIGINT) AS chosen_n_tokens,
  CAST(SUM(rn) AS BIGINT) AS rejected_n_tokens,
  CAST(SUM(cs) AS BIGINT) AS chosen_n_supervised,
  CAST(SUM(rs) AS BIGINT) AS rejected_n_supervised,
  ROUND(CAST(SUM(cs) AS DOUBLE) / CAST(SUM(cn) AS DOUBLE), 6)
    AS chosen_supervised_ratio,
  ROUND(CAST(SUM(rs) AS DOUBLE) / CAST(SUM(rn) AS DOUBLE), 6)
    AS rejected_supervised_ratio
FROM p""",
    doc="PREFERENCE-LAYOUT DATA CARD (operators/binshard.py::"
    "bin_shard_data_card layout dispatch) — release-accounting"
    " parity for every shipped shard flavor (the r12 verdict task:"
    " the card reported only the standard layout): a preference"
    " (layout='pair') shard set now reports the per-STREAM"
    " accounting a DPO release review needs — n_pairs and"
    " chosen/rejected token + supervised totals and ratios"
    " (a chosen/rejected supervised-ratio asymmetry is a masking"
    " bug upstream) — re-read from the index-sized .idx tables by"
    " the even/odd adjacency that IS the pair index, in the same"
    " one-task-per-shard pass as the length extremes. The card"
    " also records the layout itself and counts only"
    " CURRENT-export_version epochs as exported. This entry runs"
    " preference export (chosen = word-length ids, rejected = 5"
    " prepended to ids capped at 9) + a pair-unit epoch and"
    " returns the one-row card; the oracle recomputes every field"
    " from the corpus declaratively (bin_bytes = 2 x tokens under"
    " uint16, msk_bytes = per-sequence ceil(len/8) across both"
    " streams), hash-exact.",
)
def z135_preference_data_card(spark, sf_dir):
    import os
    import shutil

    from topn_spark.operators.binshard import (
        bin_shard_data_card,
        export_epoch_order,
        export_preference_shards,
    )
    from topn_spark.operators.textstats import tokens

    pairs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 250)
        .select(
            F.col("doc_id").alias("pair_id"),
            F.transform(
                tokens("text"),
                lambda t: F.length(t).cast("bigint"),
            ).alias("chosen_tokens"),
        )
        .where(F.size("chosen_tokens") > 0)
        .withColumn(
            "rejected_tokens",
            F.concat(
                F.array(F.lit(5).cast("bigint")),
                F.transform(
                    "chosen_tokens", lambda t: F.least(t, F.lit(9))
                ),
            ),
        )
        .withColumn(
            "chosen_mask",
            F.transform("chosen_tokens", lambda t: t >= 4),
        )
        .withColumn(
            "rejected_mask",
            F.transform("rejected_tokens", lambda t: t >= 3),
        )
    )
    out = f"/tmp/topn_z135_{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(out, ignore_errors=True)
    export_preference_shards(pairs, out, 4, salt="z135")
    export_epoch_order(spark, out, 1, salt="z135e", unit="pair")
    return bin_shard_data_card(spark, out)


def _z136_decayed_ci_exact(con):
    """Independent mirror of the streaming decayed leaderboard's
    bootstrap CIs: per-batch matrices from DuckDB SQL, the same
    0.5^((last-b)/half_life) weights accumulated into dict-keyed
    PAIR sums, an independent MM fit (the z130 mirror core), and
    the match-level Poisson bootstrap re-drawn with the documented
    seeding contract (seed = first 16 hex chars of
    md5('<a>|<b>:<replicate><salt>'), draws in (wins_a, wins_b,
    ties) order) through an independently-seeded numpy Generator.
    Tolerance 1e-9 (float summation order)."""
    import hashlib
    import math

    import numpy as np

    rows = con.execute(_Z128_MATRIX_SQL).fetchall()
    last, half_life, smoothing, n_boot = 1, 2.0, 0.5, 50
    pair: dict = {}
    for b, ma, mb, wa, wb, t in rows:
        if b > last:
            continue
        g = 0.5 ** ((last - b) / half_life)
        pa, pb, pt = pair.get((ma, mb), (0.0, 0.0, 0.0))
        pair[(ma, mb)] = (pa + g * wa, pb + g * wb, pt + g * t)

    def directed(p):
        w: dict = {}
        models = sorted({m for k in p for m in k})
        for i in models:
            for j in models:
                if i != j:
                    w[(i, j)] = smoothing * (
                        ((i, j) in p) + ((j, i) in p)
                    )
        for (ma, mb), (wa, wb, t) in p.items():
            w[(ma, mb)] += wa + t / 2.0
            w[(mb, ma)] += wb + t / 2.0
        return w

    w0 = directed(pair)
    pi = _z130_mm_fit(w0)
    models = sorted(pi)
    games = {
        i: sum(
            w0[(i, j)] + w0[(j, i)] for j in models if i != j
        )
        for i in models
    }
    ratings = {m: [] for m in models}
    for b in range(n_boot):
        rep = {}
        for (ma, mb), (wa, wb, t) in sorted(pair.items()):
            seed = int(
                hashlib.md5(
                    f"{ma}|{mb}:{b}".encode()
                ).hexdigest()[:16],
                16,
            )
            rng = np.random.default_rng(seed)
            rep[(ma, mb)] = (
                float(rng.poisson(wa)),
                float(rng.poisson(wb)),
                float(rng.poisson(t)),
            )
        bpi = _z130_mm_fit(directed(rep))
        for m in models:
            ratings[m].append(400.0 * math.log10(bpi[m]))
    i_lo = int(math.floor(0.025 * (n_boot - 1)))
    i_hi = int(math.ceil(0.975 * (n_boot - 1)))
    out = []
    for m in models:
        rs = sorted(ratings[m])
        out.append(
            (
                m, pi[m], 400.0 * math.log10(pi[m]),
                rs[i_lo], rs[i_hi], games[m], n_boot,
            )
        )
    cols = [
        "model", "strength", "rating", "rating_lo", "rating_hi",
        "n_games", "n_boot",
    ]
    return cols, out


@query(
    "z136_streaming_bootstrap_ci",
    None,
    tol_oracle=_z136_decayed_ci_exact,
    tolerance=1e-9,
    tol_keys=("model",),
    doc="STREAMING LEADERBOARD CONFIDENCE INTERVALS (operators/"
    "sft.py::bradley_terry_matrix_bootstrap + streaming/ingest.py::"
    "arena_monitor_batch bootstrap=n) — the r12 forward-build item:"
    " the CI op existed but never ran online, so the monitor's"
    " drift signal had no uncertainty (a 10-point drift on 50"
    " prompts is noise; the same drift outside its interval is an"
    " incident). The monitor's state is k²-sized win matrices —"
    " deliberately never samples — so the prompt-level bootstrap"
    " cannot run there; instead a MATCH-level Poisson bootstrap"
    " reduces per-match resampling to ONE deterministic Poisson"
    " draw per (pair, outcome, replicate) (a sum of n Poisson(1)"
    " weights is Poisson(n)), seeded from md5(pair||replicate) so"
    " a replayed batch rewrites byte-identically; weighted decayed"
    " counts feed Poisson's real-valued mean directly. The honest"
    " scope note (match-level CIs omit prompt-level correlation)"
    " is documented on the op. This entry streams two z128-planted"
    " batches through the monitor with half_life=2, bootstrap=50"
    " and returns decayed_ci/batch_id=1; the oracle independently"
    " re-derives the weighted matrix in DuckDB, re-draws every"
    " replicate through the documented seeding contract with its"
    " own numpy Generators, and re-fits with the independent"
    " dict-keyed MM core — tolerance 1e-9. Scale: n_boot+1 MM fits"
    " on k² driver state; nothing data-sized anywhere.",
)
def z136_streaming_bootstrap_ci(spark, sf_dir):
    import os
    import shutil

    from topn_spark.streaming.ingest import arena_monitor_batch

    d = F.col("doc_id")
    docs = load_table(spark, sf_dir, "documents").where(d < 240)
    samples = docs.select(
        (d / 120).cast("bigint").alias("batch_id"),
        (d / 8).cast("bigint").alias("prompt_id"),
        F.concat(F.lit("m"), (d % 4).cast("string")).alias("model"),
        (
            ((d * 7) % 29).cast("double")
            + F.when(d % 4 == 0, F.lit(10.0)).otherwise(F.lit(0.0))
            + F.when(
                d % 4 == 3, (d / 120).cast("bigint") * 6.0
            ).otherwise(F.lit(0.0))
        ).alias("score"),
    )
    out = f"/tmp/topn_z136_{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(out, ignore_errors=True)
    for b in range(2):
        arena_monitor_batch(
            samples.where(F.col("batch_id") == b).drop("batch_id"),
            out,
            b,
            half_life_batches=2.0,
            bootstrap=50,
        )
    return (
        spark.read.parquet(f"{out}/decayed_ci/batch_id=1")
        .orderBy("model")
    )


@query(
    "z137_streaming_preference_maintenance",
    r"""WITH t AS (
  SELECT doc_id AS pair_id,
    list_transform(regexp_extract_all(lower(text), '[a-z0-9]+'),
      x -> CAST(length(x) AS BIGINT)) AS ct
  FROM documents WHERE doc_id < 250
    AND len(regexp_extract_all(lower(text), '[a-z0-9]+')) > 0),
p AS (
  SELECT pair_id, ct,
    list_prepend(CAST(5 AS BIGINT),
      list_transform(ct, x -> LEAST(x, CAST(9 AS BIGINT)))) AS rt,
    list_transform(ct, x -> x >= 4) AS cm,
    CAST(CAST(('0x' || substring(md5(CAST(pair_id AS VARCHAR)
      || 'z137'), 1, 8)) AS BIGINT) % 5 AS INT) AS shard
  FROM t),
f AS (
  SELECT *, list_transform(rt, x -> x >= 3) AS rm FROM p)
SELECT shard,
  CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY pair_id) - 1
    AS BIGINT) AS pair_index,
  pair_id,
  CAST(len(ct) AS BIGINT) AS chosen_n_tokens,
  CAST(len(rt) AS BIGINT) AS rejected_n_tokens,
  CAST(len(list_filter(cm, x -> x)) AS BIGINT)
    AS chosen_n_supervised,
  CAST(len(list_filter(rm, x -> x)) AS BIGINT)
    AS rejected_n_supervised,
  ct AS chosen_tokens, rt AS rejected_tokens,
  cm AS chosen_mask, rm AS rejected_mask
FROM f ORDER BY pair_id ASC""",
    doc="STREAMING PREFERENCE SHARD MAINTENANCE (streaming/"
    "ingest.py::preference_bin_export_batch/_sink + binshard.py::"
    "export_preference_shards_delta) — the DPO analogue of z132: a"
    " preference data service accumulates (chosen, rejected) pairs"
    " continuously, and rescanning the pair store per micro-batch"
    " is the same corpus-sized anti-pattern the seq-layout delta"
    " closed. Each batch of NEW pairs stacks into the single"
    " 2*pair+stream encoding the batch exporter uses, lands in the"
    " corpus store partitioned by the PAIR-keyed shard id, and the"
    " shard set re-exports through the same signature-fold /"
    " partition-pruned-rewrite / cross-check / replay machinery —"
    " with both halves of every pair physically adjacent after any"
    " number of deltas (the rewrite re-sorts each touched shard by"
    " seq_id; verify_preference_shards recounts the invariant, and"
    " the e2e pytest also re-derives pair-unit epoch orders per"
    " commit and window-reads the grown set). This entry RUNS"
    " three maintenance commits (pair_id [0,100), [100,180),"
    " [180,250)) and returns the final pairwise read-back: the"
    " oracle match proves three folded pair-deltas = the"
    " declarative result over all pairs, hash-exact on all four"
    " arrays. Scale: per commit = batch write + batch-sized"
    " aggregate + touched-shard rewrite; with seqs_per_shard"
    " (pairs) range sharding, flat as the pair store grows.",
)
def z137_streaming_preference_maintenance(spark, sf_dir):
    import os
    import shutil

    from topn_spark.operators.binshard import read_preference_shards
    from topn_spark.operators.textstats import tokens
    from topn_spark.streaming.ingest import (
        preference_bin_export_batch,
    )

    d = F.col("doc_id")
    pairs = (
        load_table(spark, sf_dir, "documents")
        .where(d < 250)
        .select(
            d.alias("pair_id"),
            F.transform(
                tokens("text"),
                lambda t: F.length(t).cast("bigint"),
            ).alias("chosen_tokens"),
        )
        .where(F.size("chosen_tokens") > 0)
        .withColumn(
            "rejected_tokens",
            F.concat(
                F.array(F.lit(5).cast("bigint")),
                F.transform(
                    "chosen_tokens", lambda t: F.least(t, F.lit(9))
                ),
            ),
        )
        .withColumn(
            "chosen_mask",
            F.transform("chosen_tokens", lambda t: t >= 4),
        )
        .withColumn(
            "rejected_mask",
            F.transform("rejected_tokens", lambda t: t >= 3),
        )
    )
    base = f"/tmp/topn_z137_{os.path.basename(sf_dir.rstrip('/'))}"
    corpus, out = f"{base}_store", f"{base}_out"
    shutil.rmtree(corpus, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)
    pid = F.col("pair_id")
    for i, (lo, hi) in enumerate([(0, 100), (100, 180), (180, 250)]):
        preference_bin_export_batch(
            pairs.where((pid >= lo) & (pid < hi)),
            corpus, out, i, 5, salt="z137",
        )
    return read_preference_shards(spark, out).orderBy("pair_id")


@query(
    "z138_trainer_cursor_resume",
    r"""WITH t AS (
  SELECT doc_id,
    list_transform(regexp_extract_all(lower(text), '[a-z0-9]+'),
      x -> CAST(length(x) AS BIGINT)) AS toks
  FROM documents WHERE doc_id < 200
    AND len(regexp_extract_all(lower(text), '[a-z0-9]+')) > 0),
m AS (
  SELECT doc_id AS seq_id, toks,
    list_transform(toks, x -> x >= 4) AS msk,
    CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)
      || 'z138'), 1, 8)) AS BIGINT) % 4 AS INT) AS shard
  FROM t),
ix AS (
  SELECT *,
    CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY seq_id) - 1
      AS BIGINT) AS seq_index
  FROM m),
pos AS (
  SELECT *,
    CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY
      md5('0:' || CAST(shard AS VARCHAR) || ':'
        || CAST(seq_index AS VARCHAR) || 'z138e'),
      seq_index) - 1 AS BIGINT) AS position
  FROM ix),
sh AS (
  SELECT shard, COUNT(*) AS n_seqs,
    md5('0:' || CAST(shard AS VARCHAR) || 'z138e') AS skey
  FROM pos GROUP BY shard),
sp AS (
  SELECT shard,
    CAST(ROW_NUMBER() OVER (ORDER BY skey, shard) - 1 AS INT)
      AS shard_pos,
    CAST(COALESCE(SUM(n_seqs) OVER (ORDER BY skey, shard
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS BIGINT) AS base
  FROM sh)
SELECT base + position AS global_pos, shard, shard_pos, position,
  seq_index, seq_id,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  CAST(len(list_filter(msk, x -> x)) AS BIGINT) AS n_supervised,
  toks AS tokens, msk AS loss_mask
FROM pos JOIN sp USING (shard)
WHERE base + position < 120
ORDER BY global_pos ASC""",
    doc="TRAINER CURSOR RESUME HANDSHAKE (operators/binshard.py::"
    "resume_bin_window/commit_trainer_cursor/load_trainer_cursor) —"
    " the one-call consumption loop over a binary shard set:"
    " resume_bin_window reads the committed _cursor (epoch, next"
    " position, the export_version it was minted against), serves"
    " the next batch of the epoch's order via the seek-don't-scan"
    " window readers, and returns the frame plus the ADVANCED"
    " cursor, which the trainer commits only AFTER checkpointing —"
    " the two-phase shape that replays a window on crash instead"
    " of silently skipping it. Every failure is loud: a cursor"
    " minted at an older export_version raises the"
    " corpus-moved-under-you remediation (serving positions from a"
    " different permutation would repeat AND skip data), an"
    " exhausted epoch rolls to the next order or says to export"
    " it, and pair layouts dispatch to the pairwise reader so a"
    " DPO trainer cannot tear a pair (all pytest-pinned). This"
    " entry RUNS export + epoch export + THREE cursor-committed"
    " resume calls (40 units each) and returns their union — the"
    " oracle recomputes positions [0,120) of the epoch-0"
    " dereference chain in DuckDB, hash-exact: three handshakes ="
    " one contiguous slice, no repeat, no skip. Scale: cursor and"
    " epoch manifests are model-sized driver reads; window bytes"
    " are proportional to the batch.",
)
def z138_trainer_cursor_resume(spark, sf_dir):
    import os
    import shutil
    from functools import reduce

    from topn_spark.operators.binshard import (
        commit_trainer_cursor,
        export_bin_shards,
        export_epoch_order,
        resume_bin_window,
    )
    from topn_spark.operators.textstats import tokens

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 200)
        .select(
            "doc_id",
            F.transform(
                tokens("text"),
                lambda t: F.length(t).cast("bigint"),
            ).alias("tokens"),
        )
        .where(F.size("tokens") > 0)
        .withColumn(
            "loss_mask", F.transform("tokens", lambda t: t >= 4)
        )
    )
    out = f"/tmp/topn_z138_{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(out, ignore_errors=True)
    export_bin_shards(docs, out, 4, id_col="doc_id", salt="z138")
    export_epoch_order(spark, out, 0, salt="z138e")
    windows = []
    for _ in range(3):
        frame, cur = resume_bin_window(spark, out, 40)
        windows.append(frame)
        commit_trainer_cursor(out, cur)
    return reduce(lambda a, b: a.unionAll(b), windows).orderBy(
        "global_pos"
    )


@query(
    "z139_streaming_spec_maintenance",
    r"""WITH t AS (
  SELECT doc_id,
    list_transform(regexp_extract_all(lower(text), '[a-z0-9]+'),
      x -> CAST(length(x) AS BIGINT)) AS toks
  FROM documents WHERE doc_id < 240
    AND len(regexp_extract_all(lower(text), '[a-z0-9]+')) > 0),
m AS (
  SELECT doc_id, toks,
    list_transform(toks, x -> x >= 4) AS msk,
    CAST(doc_id // 50 AS INT) AS shard
  FROM t)
SELECT shard,
  CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id) - 1
    AS BIGINT) AS seq_index,
  doc_id AS seq_id,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  CAST(len(list_filter(msk, x -> x)) AS BIGINT) AS n_supervised,
  toks AS tokens, msk AS loss_mask
FROM m ORDER BY seq_id ASC""",
    doc="SPEC-ADDRESSABLE STREAMING SHARD MAINTENANCE (pipelines.py"
    "::BinExportSink + run_streaming_pipeline ${batchId} binding) —"
    " the deploy-spec audience (the reference's ETLBatchConfig +"
    " cdap-data-streams users) could not reach the"
    " batch-proportional maintenance path: a plain BinShardSink in"
    " a streaming spec replays a FULL export per micro-batch,"
    " overwriting the shard set with each batch's rows. The new"
    " BinExportSink stage runs bin_export_batch per replay, with"
    " the Structured Streaming batch id bound into the macro"
    " namespace as ${batchId} (the replay-stable id the"
    " exactly-once contract keys on) — so a JSON spec now declares"
    " the same fold / partition-pruned-rewrite / range-sharded"
    " maintenance the library API exposes, epochs re-derived per"
    " commit included. This entry RUNS two run_streaming_pipeline"
    " drains over a growing file-stream directory (doc_id [0,150)"
    " then [150,240), range sharding seqsPerShard=50) and returns"
    " the binary read-back: the oracle match proves spec-driven"
    " commits = the declarative full-corpus result under the"
    " range scheme (shard = id // 50), hash-exact. Scale: identical"
    " per-commit shape to z132 — the spec layer adds zero passes.",
)
def z139_streaming_spec_maintenance(spark, sf_dir):
    import os
    import shutil

    from topn_spark.operators.binshard import read_bin_shards
    from topn_spark.operators.textstats import tokens
    from topn_spark.pipelines import run_streaming_pipeline

    d = F.col("doc_id")
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(d < 240)
        .select(
            d.alias("seq_id"),
            F.transform(
                tokens("text"),
                lambda t: F.length(t).cast("bigint"),
            ).alias("tokens"),
        )
        .where(F.size("tokens") > 0)
        .withColumn(
            "loss_mask", F.transform("tokens", lambda t: t >= 4)
        )
    )
    base = f"/tmp/topn_z139_{os.path.basename(sf_dir.rstrip('/'))}"
    src, corpus, out, ck = (
        f"{base}_src", f"{base}_store", f"{base}_out", f"{base}_ck"
    )
    for p in (src, corpus, out, ck):
        shutil.rmtree(p, ignore_errors=True)
    schema = (
        "seq_id bigint, tokens array<bigint>,"
        " loss_mask array<boolean>"
    )
    spec = {
        "stages": [
            {
                "name": "in",
                "type": "batchsource",
                "plugin": "File",
                "properties": {"path": src, "schema": schema},
            },
            {
                "name": "maintain",
                "type": "batchsink",
                "plugin": "BinExportSink",
                "properties": {
                    "corpusPath": corpus,
                    "path": out,
                    "seqsPerShard": "50",
                    "batchId": "${batchId}",
                },
            },
        ],
        "connections": [{"from": "in", "to": "maintain"}],
    }
    sid = F.col("seq_id")
    for lo, hi in [(0, 150), (150, 240)]:
        docs.where((sid >= lo) & (sid < hi)).write.mode(
            "append"
        ).parquet(src)
        q = run_streaming_pipeline(spark, spec, ck)
        q.awaitTermination(300)
    return read_bin_shards(spark, out).orderBy("seq_id")
