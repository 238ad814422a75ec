from __future__ import annotations

import pytest

from topn_spark.session import get_session

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_session(
        app_name="topn_spark_tests", shuffle_partitions=8, driver_memory="8g"
    )
    yield spark


@pytest.fixture(scope="session")
def people(spark):
    """F1 — the reference's end-to-end fixture (TopNTest.java:64-79)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("name", T.StringType(), False),
            T.StructField("id", T.LongType(), False),
            T.StructField("kg", T.DoubleType(), False),
            T.StructField("cm", T.FloatType(), False),
            T.StructField("age", T.IntegerType(), True),
        ]
    )
    rows = [
        ("Leo", 1, 11.1, 111.1, 11),
        ("Eve", 2, 22.2, 222.2, 22),
        ("Bob", 3, 33.3, 333.3, None),
        ("Alice", 4, 44.4, 444.4, 44),
    ]
    return spark.createDataFrame(rows, schema)
