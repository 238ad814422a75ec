"""Plan-inspection helpers: the engine's performance contract is
asserted, not hoped for.

Used by tests/test_plans.py to pin the physical shapes that matter at
100 TB: filters pushed into scans, column pruning, broadcast joins on
dims, WindowGroupLimit rank cuts, TakeOrderedAndProject bounded heaps,
whole-stage codegen coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted explain string (initial physical plan, pre-AQE)."""
    qe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return qe.explainString(mode)


def codegen_summary(df: DataFrame) -> str:
    """The codegen explain output ("Found N WholeStageCodegen
    subtrees" + generated code).

    Caveat: under AQE this reports 0 subtrees before the query has
    executed (stages materialize at runtime). For codegen assertions,
    execute the DataFrame first and look for ``*(n)`` stage prefixes
    in ``queryExecution().executedPlan()`` — see
    tests/test_plans.py::test_whole_stage_codegen_everywhere."""
    qe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "codegen"
    )
    return qe.explainString(mode)


def assert_plan_contains(df: DataFrame, *needles: str) -> None:
    plan = formatted_plan(df)
    missing = [n for n in needles if n not in plan]
    assert not missing, f"plan missing {missing}:\n{plan}"


def assert_plan_lacks(df: DataFrame, *needles: str) -> None:
    plan = formatted_plan(df)
    present = [n for n in needles if n in plan]
    assert not present, f"plan unexpectedly contains {present}:\n{plan}"
