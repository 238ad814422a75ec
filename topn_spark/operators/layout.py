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
