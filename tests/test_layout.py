"""Z-order layout: the interleave must be a correct Morton encoding
(bijective, locality-preserving) and the clustered write must place
close keys in the same files."""

from __future__ import annotations

from pyspark.sql import functions as F

from topn_spark.operators.layout import write_zordered, zorder_key


def _morton2(x: int, y: int, bits: int = 10) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_matches_python_reference(spark):
    rows = [(x, y) for x in range(0, 64, 7) for y in range(0, 64, 5)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn("z", zorder_key(["x", "y"], 10)).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _morton2(x, y), (x, y)


def test_zorder_rejects_bad_config(spark):
    import pytest

    with pytest.raises(ValueError):
        zorder_key(["a"], 10)
    with pytest.raises(ValueError):
        zorder_key(["a", "b", "c"], 21)


def test_zordered_write_clusters_both_dims(spark, tmp_path):
    # 32x32 grid written z-ordered into 4 range files: a point filter
    # on EITHER dimension must touch a strict subset of files.
    df = spark.createDataFrame(
        [(x, y) for x in range(32) for y in range(32)], "x long, y long"
    )
    path = str(tmp_path / "zp")
    write_zordered(df, path, ["x", "y"], bits=5, num_files=4)
    out = spark.read.parquet(path).withColumn(
        "f", F.input_file_name()
    )
    n_files = out.select("f").distinct().count()
    assert n_files == 4
    for col in ("x", "y"):
        touched = (
            out.where(F.col(col) < 8).select("f").distinct().count()
        )
        assert touched < n_files, f"filter on {col} touched all files"


def test_file_skipping_report_separates_clustered_from_random(
    spark, tmp_path
):
    from topn_spark.operators.layout import (
        file_skipping_report,
        write_zordered,
    )

    df = spark.range(0, 4000).selectExpr(
        "CAST(id % 64 AS INT) AS x",
        "CAST((id * 7) % 64 AS INT) AS y",
        "id AS payload",
    )
    zpath = str(tmp_path / "zordered")
    rpath = str(tmp_path / "random")
    write_zordered(df, zpath, ["x", "y"], num_files=8)
    df.repartition(8).write.parquet(rpath)  # hash layout: no locality

    zrep = file_skipping_report(zpath, ["x", "y"])
    rrep = file_skipping_report(rpath, ["x", "y"])
    assert len(zrep["files"]) == 8 and len(rrep["files"]) == 8
    assert sum(f["rows"] for f in zrep["files"]) == 4000
    # random layout: essentially every file pair overlaps on both dims
    assert rrep["overlap_fraction"]["x"] > 0.9
    assert rrep["overlap_fraction"]["y"] > 0.9
    # z-order: substantially tighter ranges on BOTH interleaved dims
    assert (
        zrep["overlap_fraction"]["x"]
        < rrep["overlap_fraction"]["x"] - 0.3
    )
    assert (
        zrep["overlap_fraction"]["y"]
        < rrep["overlap_fraction"]["y"] - 0.3
    )
    # footer stats present and ordered
    for f in zrep["files"]:
        assert f["x_min"] is not None and f["x_min"] <= f["x_max"]


def test_zorder_key_sql_matches_operator(spark):
    """The generated-SQL mirror (oracle building block) must be
    bit-identical to the Column expression."""
    from topn_spark.operators.layout import zorder_key_sql

    rows = [(x, y) for x in range(0, 40, 3) for y in range(0, 40, 3)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select(
        "x",
        "y",
        zorder_key(["x", "y"], 6).alias("z1"),
        F.expr(zorder_key_sql(["x", "y"], 6)).alias("z2"),
    ).collect()
    assert all(r.z1 == r.z2 for r in got)


def test_quantize_uniform_buckets_and_clamps(spark):
    from topn_spark.operators.layout import quantize_uniform

    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (49.9,), (99.9,), (100.0,), (250.0,)],
        "v double",
    )
    got = [
        r.q
        for r in df.select(
            quantize_uniform("v", 0.0, 100.0, bits=2).alias("q")
        ).collect()
    ]
    # 4 buckets of width 25; out-of-range clamps to the edge buckets
    assert got == [0, 0, 1, 3, 3, 3]


def test_block_stats_and_pruning_fraction(spark):
    from topn_spark.operators.layout import (
        block_stats,
        pruning_fraction,
    )

    grid = spark.createDataFrame(
        [(x, y) for x in range(32) for y in range(32)], "x long, y long"
    )
    zb = block_stats(
        grid.withColumn("z", zorder_key(["x", "y"], 5)),
        dims=["x", "y"],
        block_col=F.shiftright("z", 6),  # 16 blocks of 64 cells
    )
    # row-major layout: block = x >> 1 (16 blocks too)
    lin = block_stats(
        grid, dims=["x", "y"], block_col=F.shiftright("x", 1)
    )
    zf = pruning_fraction(zb, "y", 0, 7).collect()[0]
    lf = pruning_fraction(lin, "y", 0, 7).collect()[0]
    assert zf.n_blocks == 16 and lf.n_blocks == 16
    # z-order blocks are 8x8 tiles: a y-range over 1/4 of the domain
    # reads 1/4 of blocks; the x-sorted layout reads ALL blocks
    assert lf.block_frac == 1.0
    assert zf.block_frac == 0.25
    assert zf.row_frac == 0.25
