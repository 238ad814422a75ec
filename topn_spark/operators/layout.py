"""Data-layout operators: multi-dimensional clustering for scan
pruning.

Parquet prunes row groups by column min/max statistics. Sorting a
table by one column gives perfect pruning on that column and none on
others; interleaving the bits of several columns (a Z-order /
Morton curve) gives good-enough locality on ALL of them — the
standard layout trick (Delta OPTIMIZE ZORDER BY, Hudi clustering)
re-expressed as plain Spark: compute the key, ``repartitionByRange``
+ ``sortWithinPartitions`` on it, write parquet.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[str], bits: int = 16) -> Column:
    """Morton (Z-order) interleave of the low ``bits`` of each column.

    Columns must be non-negative integers (hash or bucketize first
    for other types — e.g. ``xxhash64(col) & mask`` for strings).
    Total key width = ``bits * len(cols)`` must fit a signed 64-bit
    long (``bits * len(cols) <= 62``).

    Pure bit arithmetic in one fold — map-only, codegen-friendly,
    and portable SQL semantics (the same expression hash-matches a
    DuckDB oracle in the x56 catalog query).
    """
    n = len(cols)
    if n < 2:
        raise ValueError("zorder needs at least 2 columns")
    if bits * n > 62:
        raise ValueError(f"bits*cols = {bits * n} exceeds a 64-bit key")
    terms = " + ".join(
        f"(((CAST({c} AS BIGINT) >> i) & 1) << ({n} * i + {j}))"
        for j, c in enumerate(cols)
    )
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), CAST(0 AS BIGINT),"
        f" (acc, i) -> acc + {terms})"
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet physically clustered on the Z-order of
    ``cols``: range-partition by the key (balanced output files), sort
    within partitions (tight row-group min/max on every interleaved
    column), drop the key.

    Selective filters on ANY of ``cols`` then skip most row groups —
    at 100 TB this is the difference between scanning a file set and
    scanning a curve segment.
    """
    keyed = df.withColumn("_z", zorder_key(cols, bits))
    parts = (
        keyed.repartitionByRange(num_files, "_z")
        if num_files
        else keyed.repartitionByRange("_z")
    )
    parts.sortWithinPartitions("_z").drop("_z").write.mode(mode).parquet(
        path
    )


def file_skipping_report(path: str, cols: list[str]) -> dict:
    """Clustering-quality observability from parquet FOOTERS only:
    per-file min/max for each of ``cols`` plus an overlap fraction —
    for every column, the share of file pairs whose [min, max] ranges
    intersect (1.0 ≈ random layout: every file can match any point
    filter; → 0.0 ≈ perfectly clustered: a point filter prunes to
    ~one file). The number to watch after ``write_zordered`` or any
    re-layout: it predicts scan skipping BEFORE running a query, from
    metadata that costs O(files) driver-side reads of a few KB each —
    no data scan at any table size.

    Returns ``{"files": [{"file", "rows", "<col>_min", "<col>_max"},
    ...], "overlap_fraction": {col: float}}`` (min/max folded across
    row groups; a column missing statistics yields None and counts as
    overlapping-everything).
    """
    import glob as _glob
    import os

    import pyarrow.parquet as pq

    files = sorted(
        _glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )
    per_file = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        lo: dict = {c: None for c in cols}
        hi: dict = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for i in range(g.num_columns):
                c = g.column(i)
                name = c.path_in_schema
                if name not in lo:
                    continue
                st = c.statistics
                if st is None or not st.has_min_max:
                    continue
                lo[name] = (
                    st.min if lo[name] is None else min(lo[name], st.min)
                )
                hi[name] = (
                    st.max if hi[name] is None else max(hi[name], st.max)
                )
        row = {"file": os.path.relpath(f, path), "rows": md.num_rows}
        for c in cols:
            row[f"{c}_min"], row[f"{c}_max"] = lo[c], hi[c]
        per_file.append(row)

    overlap = {}
    for c in cols:
        spans = [
            (r[f"{c}_min"], r[f"{c}_max"])
            for r in per_file
        ]
        n = len(spans)
        if n < 2:
            overlap[c] = 0.0
            continue
        hits = 0
        for i in range(n):
            for j in range(i + 1, n):
                a, b = spans[i], spans[j]
                if (
                    a[0] is None or a[1] is None
                    or b[0] is None or b[1] is None
                    or (a[0] <= b[1] and b[0] <= a[1])
                ):
                    hits += 1
        overlap[c] = hits / (n * (n - 1) / 2)
    return {"files": per_file, "overlap_fraction": overlap}


def zorder_key_sql(cols: list[str], bits: int = 16) -> str:
    """The :func:`zorder_key` arithmetic as portable generated SQL
    (for oracles and engine cross-checks): identical bit placement —
    bit ``i`` of column ``j`` lands at key bit ``len(cols)*i + j``."""
    n = len(cols)
    terms = [
        f"((({c} >> {i}) & 1) * {1 << (n * i + j)})"
        for j, c in enumerate(cols)
        for i in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def quantize_uniform(
    col: Column | str, lo: float, hi: float, bits: int = 16
) -> Column:
    """Uniform quantization of a numeric column into ``[0, 2**bits)``
    (clamped) — the cheap map-only domain reduction in front of
    :func:`zorder_key` for floating or wide columns. Equi-depth
    (rank) quantization handles skew better but costs a quantile
    pass; uniform is exact arithmetic."""
    c = F.col(col) if isinstance(col, str) else col
    nb = 1 << bits
    q = F.floor(
        (c.cast("double") - F.lit(float(lo)))
        / F.lit(float(hi) - float(lo))
        * F.lit(nb)
    ).cast("long")
    return F.least(F.greatest(q, F.lit(0)), F.lit(nb - 1))


def block_stats(
    df: DataFrame,
    dims: list[str],
    block_col: Column,
) -> DataFrame:
    """Per-block count + min/max over ``dims`` for a given block
    assignment (the z-key's top bits, a partition id, ...) — the
    statistics parquet footers carry, materialized IN-ENGINE for
    layout evaluation at any scale (one hash agg keyed by block;
    contrast :func:`file_skipping_report`, which reads footers of an
    already-written table driver-side):
    ``(block, n, <dim>_min, <dim>_max, ...)``."""
    aggs = [F.count(F.lit(1)).alias("n")]
    for d in dims:
        aggs.append(F.min(d).alias(f"{d}_min"))
        aggs.append(F.max(d).alias(f"{d}_max"))
    return df.groupBy(block_col.alias("block")).agg(*aggs)


def pruning_fraction(stats: DataFrame, dim: str, lo, hi) -> DataFrame:
    """Fraction of blocks (and of rows) a range predicate
    ``dim BETWEEN lo AND hi`` must read under min/max skipping,
    from :func:`block_stats` output —
    ``(n_blocks, read_blocks, block_frac, row_frac)``. The layout
    quality metric: compare across layouts for the same predicate."""
    overlap = (F.col(f"{dim}_min") <= F.lit(hi)) & (
        F.col(f"{dim}_max") >= F.lit(lo)
    )
    return stats.agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum(overlap.cast("int")).alias("read_blocks"),
        (F.sum(overlap.cast("int")) / F.count(F.lit(1))).alias(
            "block_frac"
        ),
        (
            F.sum(F.when(overlap, F.col("n")).otherwise(0))
            / F.sum("n")
        ).alias("row_frac"),
    )
