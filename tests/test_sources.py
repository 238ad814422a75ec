"""Source/sink round-trips + partition-pruning contract."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from topn_spark.catalog import load_table
from topn_spark.plans import formatted_plan
from topn_spark.sources import read, write


@pytest.fixture(scope="module")
def orders(spark):
    return load_table(spark, SF_SMALL, "orders").cache()


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("o_orderkey").collect()]


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip(spark, orders, tmp_path, fmt):
    p = str(tmp_path / fmt)
    write(orders, p, fmt=fmt, mode="overwrite")
    back = read(spark, p, fmt=fmt, schema=orders.schema)
    assert _sorted_rows(back) == _sorted_rows(orders)


def test_partitioned_write_prunes(spark, orders, tmp_path):
    p = str(tmp_path / "part")
    write(orders, p, fmt="parquet", mode="overwrite", partition_by=["o_orderstatus"])
    back = read(spark, p).where("o_orderstatus = 'F'")
    plan = formatted_plan(back)
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan
    assert back.count() == orders.where("o_orderstatus = 'F'").count()


def test_coalesce_files(spark, orders, tmp_path):
    import os

    p = str(tmp_path / "one")
    write(orders.repartition(8), p, mode="overwrite", coalesce_files=1)
    files = [f for f in os.listdir(p) if f.endswith(".parquet")]
    assert len(files) == 1


def test_bad_format_rejected(spark):
    with pytest.raises(ValueError):
        read(spark, "/nope", fmt="xml")


def test_bucket_by_requires_table(orders, tmp_path):
    with pytest.raises(ValueError):
        write(orders, str(tmp_path / "b"), bucket_by=(4, ["o_custkey"]))
