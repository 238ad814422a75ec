"""User-defined function surface: Arrow-batched Pandas UDFs, grouped
applyInPandas, and Python UDTFs (SURVEY.md §2.3 — the reference's only
extension point IS its host's UDA plugin API; here users get Spark's
full UDF/UDAF/UDTF model).

Rule of thumb encoded throughout this engine: built-in expressions
first (JVM codegen), Pandas UDF (Arrow batches, ~10-100x over row
Python) only when expression trees can't express it or get
pathological (e.g. very high-dim vector math), row-at-a-time UDF
never.
"""

from topn_spark.functions.vectorized import (
    cosine_to_query_udf,
    ngrams_udtf,
    zscore_by_group,
)

__all__ = ["cosine_to_query_udf", "zscore_by_group", "ngrams_udtf"]
