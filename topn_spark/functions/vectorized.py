"""Vectorized (Arrow) UDFs and a Python UDTF.

Each exists as the *escape hatch* counterpart of a built-in-expression
operator elsewhere in the engine, and tests assert they agree:

- ``cosine_to_query_udf`` ↔ operators/similarity.cosine_scores
  (zip_with/aggregate). At dim 64 the expression tree wins; at dim
  4096 the NumPy batch path wins — both are the same logical op.
- ``zscore_by_group`` ↔ the window formulation
  (x - avg over w) / stddev over w.
- ``ngrams_udtf`` ↔ operators/dedup.shingles (higher-order transform).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udtf


def cosine_to_query_udf(query_vec: list[float]):
    """Scalar Pandas UDF: cosine similarity of an array<float|double>
    column vs a constant query vector, computed as one NumPy matmul
    per Arrow batch."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q) or 1.0

    @pandas_udf(T.DoubleType())
    def cos(col: pd.Series) -> pd.Series:
        mat = np.vstack(col.to_numpy())
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0.0] = 1.0
        return pd.Series(mat @ q / (norms * qn))

    return cos


def zscore_by_group(
    df: DataFrame, keys: list[str], value_col: str, out_col: str = "zscore"
) -> DataFrame:
    """Grouped-map applyInPandas: per-group z-score of ``value_col``.

    Shuffles on ``keys`` and hands each group to a pandas function —
    the right shape for per-group model-ish logic that has no
    expression form. (This particular op *does* have a window form;
    tests assert the two agree.)
    """
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.DoubleType(), True)]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].astype(float)
        sd = v.std(ddof=1)
        pdf[out_col] = (v - v.mean()) / sd if sd and not np.isnan(sd) else np.nan
        return pdf

    return df.groupBy(*keys).applyInPandas(fn, schema=out_schema)


@udtf(returnType="pos int, ngram string")
class ngrams_udtf:
    """Python UDTF: explode a text into word 3-gram shingles with
    positions. SQL: ``SELECT t.* FROM docs, LATERAL ngrams(text) t``.

    Lateral table functions are the row-expanding extension point;
    prefer the higher-order-expression form (operators/dedup.shingles)
    when the expansion is expressible — this exists for logic that
    genuinely needs Python per row (parsers, tokenizers with state).
    """

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        toks = [t for t in "".join(
            c if c.isalnum() else " " for c in text.lower()
        ).split() if t]
        for i in range(len(toks) - 2):
            yield i, " ".join(toks[i : i + 3])
