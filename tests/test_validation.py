"""Validation parity with the reference's config tests
(TopNConfigTest.java:30-91; FIXTURES.md F2)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from topn_spark.errors import ValidationError
from topn_spark.operators.topn import MAX_TOP, topn, validate_topn

SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("id", T.LongType(), False),
        T.StructField("kg", T.DoubleType(), False),
        T.StructField("cm", T.FloatType(), False),
        T.StructField("date", T.DateType(), False),
        T.StructField("age", T.IntegerType(), True),
    ]
)


def failures(field, size):
    return validate_topn(SCHEMA, field, size).failures


def test_valid_config_passes():
    # TopNConfigTest.java:30-36
    for field in ("id", "kg", "cm", "age"):
        assert failures(field, 3) == []
    assert failures("id", MAX_TOP) == []


def test_nonexistent_field_rejected():
    # TopNConfigTest.java:38-45
    fs = failures("nope", 3)
    assert len(fs) == 1 and fs[0].property_name == "field"


def test_date_field_rejected():
    # TopNConfigTest.java:47-54 — DATE rejected though physically INT
    fs = failures("date", 3)
    assert len(fs) == 1 and fs[0].property_name == "field"


def test_string_field_rejected():
    # TopNConfigTest.java:56-63
    fs = failures("name", 3)
    assert len(fs) == 1 and fs[0].property_name == "field"


def test_size_below_one_rejected():
    # TopNConfigTest.java:65-72
    fs = failures("id", 0)
    assert len(fs) == 1 and fs[0].property_name == "size"


def test_size_above_max_rejected():
    # TopNConfigTest.java:74-81
    fs = failures("id", MAX_TOP + 1)
    assert len(fs) == 1 and fs[0].property_name == "size"


def test_multiple_failures_collected():
    # TopNConfigTest.java:83-91 — all failures in one pass
    fs = failures("nope", -5)
    assert {f.property_name for f in fs} == {"field", "size"}


def test_operator_raises_with_all_failures(people):
    with pytest.raises(ValidationError) as ei:
        topn(people, "missing", 0)
    assert len(ei.value.failures) == 2
