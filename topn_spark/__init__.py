"""topn_spark — a PySpark-native analytics engine.

Built from scratch with the query and data-processing capabilities of
the CDAP ``data-integrations/topn`` batch aggregator (reference at
/root/reference), generalized into a full DataFrame/SQL surface and
LLM-data-pipeline extensions. Architecture is idiomatic Spark: declare
logical plans with the DataFrame/SQL API, let Catalyst/Tungsten pick
the physical strategy; Pandas UDFs only where built-ins genuinely
cannot express the semantics.

Public API
----------
- :func:`topn_spark.session.get_session` — SparkSession factory pinning
  the engine environment contract (UTC, nanos-timestamp shim, AQE).
- :func:`topn_spark.catalog.load_table` / ``register_views`` — table
  access over the Parquet test data, including the events-ts shim.
- :func:`topn_spark.operators.topn.topn` — the reference operator:
  global top-N by a numeric field (descending, null-smallest),
  reference-parity validation (see reference TopNConfig.java:62-104).
- :func:`topn_spark.operators.topn.topn_grouped` — per-group
  generalization via ranking windows.
- ``topn_spark.operators.dedup / similarity / textstats / multimodal``
  — LLM-pipeline extensions.
- ``topn_spark.streaming`` — Structured Streaming windows + stateful
  top-N.
- :data:`topn_spark.queries.QUERIES` — the declared oracle-query
  catalog (SURVEY.md §2.5).
"""

from topn_spark.errors import FailureCollector, ValidationError
from topn_spark.operators.asof import asof_join, asof_join_bucketed
from topn_spark.pipelines import (
    compile_pipeline,
    run_pipeline,
    run_streaming_pipeline,
)
from topn_spark.operators.dedup import (
    dedup_lineage,
    dup_cluster_report,
    memorization_risk,
    split_doc_pairs,
    lsh_pairs_md5,
    ngram_decontaminate,
    neardup_keep_best,
    connected_components,
    dedup_exact,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from topn_spark.operators.graph import bfs_hops, pagerank
from topn_spark.operators.layout import write_zordered, zorder_key
from topn_spark.operators.ranges import interval_overlap_join
from topn_spark.operators.pipeline import (
    assign_split,
    attrition_report,
    canonical_url,
    curriculum_stages,
    epoch_shuffle,
    chunk_by_tokens,
    chunk_documents,
    contamination_check,
    dedup_lines,
    fim_transform,
    hash_sample,
    histogram,
    merge_upsert,
    pack_sequences,
    pack_masked_sequences,
    packing_report,
    pack_token_sequences,
    packed_doc_spans,
    token_budget_mixture,
    token_windows,
    epoch_mixture,
    unpack_masked_sequences,
    unpack_sequences,
    export_packed_shards,
    scrub_pii,
    resample_ffill,
    resample_interpolate,
    sessionize,
    mixture_sample,
    robust_zscore,
    sample_k_per_group,
    stratified_split,
    stratified_sample,
    table_diff,
    token_heavy_hitters,
    url_features,
    domain_filter,
    weighted_sample_k,
    winsorize,
    zscore,
)
from topn_spark.operators.textstats import (
    load_bpe_gpt2,
    load_logreg,
    redact_pii,
    save_bpe_gpt2,
    save_logreg,
    add_repetition_signals,
    apply_bpe,
    bpe_train,
    duplicate_ngram_coverage,
    tfidf_top_terms,
)
from topn_spark.operators.langid import (
    char_array,
    char_ngrams,
    char_ngrams_from_chars,
    langid_model_table,
    langid_score,
    load_langid,
    save_langid,
    train_langid,
    update_langid,
)
from topn_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
    ivfpq_topk,
    kmeans_lloyd,
    knn_join,
    pq_adc_topk,
    pq_encode,
    pq_topk,
    pq_train_codebooks,
    semantic_dedup,
)
from topn_spark.operators.topn import (
    TopNConfig,
    ntile_from_rank,
    rank_low_cardinality,
    topn,
    topn_configured,
    topn_grouped,
    topn_grouped_salted,
)
from topn_spark.session import get_session

__all__ = [
    "FailureCollector",
    "ValidationError",
    "get_session",
    "compile_pipeline",
    "run_pipeline",
    "run_streaming_pipeline",
    "TopNConfig",
    "topn",
    "topn_configured",
    "topn_grouped",
    "topn_grouped_salted",
    "rank_low_cardinality",
    "ntile_from_rank",
    "asof_join",
    "asof_join_bucketed",
    "interval_overlap_join",
    "zorder_key",
    "write_zordered",
    "dedup_exact",
    "minhash_dedup_pairs",
    "ngram_jaccard_pairs",
    "ngram_decontaminate",
    "simhash",
    "connected_components",
    "pagerank",
    "bfs_hops",
    "cosine_topk",
    "ivf_topk",
    "ivfpq_topk",
    "kmeans_lloyd",
    "knn_join",
    "pq_train_codebooks",
    "pq_encode",
    "pq_adc_topk",
    "pq_topk",
    "semantic_dedup",
    "char_array",
    "char_ngrams",
    "char_ngrams_from_chars",
    "train_langid",
    "langid_model_table",
    "langid_score",
    "save_langid",
    "update_langid",
    "load_langid",
    "chunk_documents",
    "chunk_by_tokens",
    "fim_transform",
    "hash_sample",
    "assign_split",
    "sample_k_per_group",
    "dedup_lines",
    "url_features",
    "domain_filter",
    "weighted_sample_k",
    "stratified_sample",
    "stratified_split",
    "pack_sequences",
    "pack_masked_sequences",
    "packing_report",
    "pack_token_sequences",
    "unpack_masked_sequences",
    "unpack_sequences",
    "token_budget_mixture",
    "token_windows",
    "epoch_mixture",
    "packed_doc_spans",
    "export_packed_shards",
    "redact_pii",
    "scrub_pii",
    "lsh_pairs_md5",
    "neardup_keep_best",
    "save_logreg",
    "load_logreg",
    "save_bpe_gpt2",
    "load_bpe_gpt2",
    "token_heavy_hitters",
    "contamination_check",
    "histogram",
    "merge_upsert",
    "resample_ffill",
    "resample_interpolate",
    "sessionize",
    "epoch_shuffle",
    "curriculum_stages",
    "canonical_url",
    "attrition_report",
    "dedup_lineage",
    "dup_cluster_report",
    "memorization_risk",
    "split_doc_pairs",
    "winsorize",
    "zscore",
    "robust_zscore",
    "mixture_sample",
    "table_diff",
    "add_repetition_signals",
    "apply_bpe",
    "bpe_train",
    "duplicate_ngram_coverage",
    "tfidf_top_terms",
]

__version__ = "0.1.0"
