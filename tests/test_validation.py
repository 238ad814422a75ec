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


# ---------------------------------------------------------------------------
# Macro-deferred config (reference @Macro lifecycle: TopNConfig.java:39-54
# containsMacro guards at :64,:88,:97; TopN.java:74-82 prepareRun
# re-validation)
# ---------------------------------------------------------------------------

from topn_spark.operators.topn import TopNConfig, topn_configured  # noqa: E402


def test_macro_field_skips_deploy_validation():
    # TopNConfig.java:64 `if (!containsMacro(FIELD))`: an unresolved
    # ${macro} field passes deploy-time validation even though the
    # literal string is in no schema.
    cfg = TopNConfig(field="${sort_field}", size=3)
    assert cfg.contains_macro("field")
    assert cfg.validate(SCHEMA).failures == []


def test_macro_size_skips_deploy_validation():
    # TopNConfig.java:88 `if (!containsMacro(SIZE) && getTopSize() < 1)`
    cfg = TopNConfig(field="id", size="${n}")
    assert cfg.contains_macro("size")
    assert cfg.validate(SCHEMA).failures == []


def test_all_macro_config_passes_deploy():
    cfg = TopNConfig(
        field="${f}", size="${n}", ignore_null="${skip_nulls}"
    )
    assert cfg.validate(SCHEMA).failures == []


def test_non_macro_failures_still_caught_at_deploy():
    # Macro deferral must not loosen validation of literal properties
    # (TopNConfigTest.java:83-91 multi-failure parity).
    cfg = TopNConfig(field="nope", size=-5)
    fs = cfg.validate(SCHEMA).failures
    assert {f.property_name for f in fs} == {"field", "size"}


def test_resolve_substitutes_and_revalidates_clean():
    # TopN.java:74-82: substituted config re-validates at prepareRun.
    cfg = TopNConfig(field="${f}", size="${n}", ignore_null="${b}")
    resolved = cfg.resolve({"f": "id", "n": "3", "b": "true"})
    assert resolved.field == "id"
    assert resolved.top_size == 3
    assert resolved.top_ignore_null is True
    assert resolved.validate(SCHEMA).failures == []


def test_resolve_surfaces_post_substitution_failures():
    # A macro that substitutes to an invalid value must fail at the
    # prepareRun-equivalent check, not silently run.
    cfg = TopNConfig(field="${f}", size="${n}")
    resolved = cfg.resolve({"f": "nope", "n": "-1"})
    fs = resolved.validate(SCHEMA).failures
    assert {f.property_name for f in fs} == {"field", "size"}


def test_resolve_rejects_unresolvable_macro():
    cfg = TopNConfig(field="${f}", size=1)
    with pytest.raises(ValidationError) as ei:
        cfg.resolve({})
    assert ei.value.failures[0].property_name == "field"


def test_non_numeric_substituted_size_rejected():
    cfg = TopNConfig(field="id", size="${n}")
    fs = cfg.resolve({"n": "lots"}).validate(SCHEMA).failures
    assert len(fs) == 1 and fs[0].property_name == "size"


def test_bad_ignore_null_literal_rejected():
    cfg = TopNConfig(field="id", size=1, ignore_null="maybe")
    fs = cfg.validate(SCHEMA).failures
    assert len(fs) == 1 and fs[0].property_name == "ignoreNull"


def test_size_defaults_to_one_and_ignore_null_to_false():
    # TopNConfig.java:110-123 defaults
    cfg = TopNConfig(field="id")
    assert cfg.top_size == 1
    assert cfg.top_ignore_null is False
    assert cfg.validate(SCHEMA).failures == []


def test_topn_configured_end_to_end_with_macros(people):
    # Deploy validates (macros skipped) -> substitute -> re-validate ->
    # run: the reference's full two-phase lifecycle around the operator.
    cfg = TopNConfig(field="${f}", size="${n}", ignore_null="${b}")
    out = topn_configured(
        people, cfg, {"f": "age", "n": "2", "b": "true"}, tiebreak="id"
    )
    ages = [r.age for r in out.collect()]
    assert len(ages) == 2
    assert ages == sorted(ages, reverse=True)
    assert None not in ages


def test_topn_configured_rejects_bad_substitution(people):
    cfg = TopNConfig(field="${f}", size=1)
    with pytest.raises(ValidationError):
        topn_configured(people, cfg, {"f": "name"})
