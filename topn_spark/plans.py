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


def audit_scale(df: DataFrame) -> list[str]:
    """Mechanical scale-hazard lint of a DataFrame's physical plan.

    Returns ``WARN:``/``INFO:`` findings for the patterns that stay
    invisible at test scale and dominate at 100 TB:

    - ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` — O(n·m)
      compare cost and (for BNLJ) a full build-side broadcast;
    - windows with an empty ``PARTITION BY`` — the whole dataset
      serializes through one task;
    - ``SinglePartition`` exchanges not explained by a final limit or
      a partially-aggregated input — a mid-plan global funnel;
    - scans whose ``PushedFilters`` is empty while a Filter sits in
      the plan — predicate not reaching the format reader;
    - total shuffle (``Exchange``) count, as INFO.

    A clean plan returns ``[]`` (possibly plus INFO lines). The checks
    are heuristic on plan *shape* — a keyless window over a known-tiny
    bounded domain (e.g. a time-bucket table) trips the funnel check
    by design; the auditor surfaces candidates, the engineer confirms
    cardinality. This is a development/CI aid — the engine's own
    operators keep their plans clean via tests/test_plans.py; use it
    on user-composed queries.
    """
    plan = formatted_plan(df)
    findings: list[str] = []

    # Parse the tree header into id -> (name, child ids) so checks can
    # look at an operator's input without brittle section math.
    import re as _re

    nodes: dict[int, str] = {}
    children: dict[int, list[int]] = {}
    stack: list[tuple[int, int]] = []  # (indent, id)
    for line in plan.splitlines():
        m = _re.match(r"^([ +:*-]*)([A-Za-z][A-Za-z0-9_ ]*) \((\d+)\)\s*$", line)
        if not m:
            if line.startswith("("):
                break  # reached the per-node detail sections
            continue
        indent, name, nid = len(m.group(1)), m.group(2).strip(), int(m.group(3))
        nodes[nid] = name
        while stack and stack[-1][0] >= indent:
            stack.pop()
        if stack:
            children.setdefault(stack[-1][1], []).append(nid)
        stack.append((indent, nid))

    if "CartesianProduct" in plan:
        findings.append(
            "WARN: CartesianProduct — O(left x right) row pairs; add an "
            "equi-condition or broadcast+filter a bounded side"
        )
    if "BroadcastNestedLoopJoin" in plan:
        findings.append(
            "WARN: BroadcastNestedLoopJoin — non-equi join broadcasts a "
            "whole side and rescans it per probe row; consider "
            "time/range bucketing to make it an equi-join "
            "(operators/asof.py::asof_join_bucketed pattern)"
        )

    # A SinglePartition exchange is every "all rows through one task"
    # hazard in one signature: keyless windows, global sorts feeding
    # non-limit consumers. Benign shapes excluded: an exchange whose
    # input is a (partial) aggregate carries one row per upstream
    # partition, not the dataset; one exchange is expected when the
    # query ends in a global limit/order.
    single_ids = {
        int(m)
        for m in _re.findall(
            r"\((\d+)\) Exchange\nInput[^\n]*\nArguments: SinglePartition",
            plan,
        )
    }
    benign = {
        nid
        for nid in single_ids
        if any("Aggregate" in nodes.get(c, "") for c in children.get(nid, []))
    }
    n_single = len(single_ids - benign)
    has_global_limit = "GlobalLimit" in plan or "TakeOrderedAndProject" in plan
    if n_single > (1 if has_global_limit else 0):
        findings.append(
            f"WARN: {n_single} SinglePartition exchange(s) over "
            "unaggregated input — the whole dataset funnels through one "
            "task (keyless window / global sort); partition by a key or "
            "bucket the domain first"
        )

    if "PushedFilters: []" in plan and "Filter" in plan:
        findings.append(
            "INFO: a scan has no pushed filters while the plan filters "
            "rows — check the predicate is pushdown-eligible (no UDF / "
            "cast on the scan column)"
        )

    n_exchange = plan.count("Exchange")
    findings.append(f"INFO: {n_exchange} Exchange (shuffle) boundaries")
    return findings


def enable_runtime_bloom_filters(
    spark,
    application_side_scan_threshold: str = "0",
    creation_side_threshold: str | None = None,
) -> None:
    """Arm Spark's runtime row-level filtering (SPARK-32268) for
    shuffle joins with a selective build side.

    When a fact⋈dim join is too big to broadcast, the optimizer can
    inject a bloom filter built from the dim's (filtered) join keys
    as a semi-join reduction on the fact scan: fact rows failing
    ``might_contain(bloom, xxhash64(key))`` are dropped *before* the
    shuffle, which is the difference between shuffling 100 TB and
    shuffling the ~1% that joins. The feature is ON by default but
    gated by size thresholds tuned for clusters
    (``applicationSideScanSizeThreshold`` defaults to 10 GiB, so
    local-scale tests never see it trigger); this helper lowers the
    gates so plan tests — and small-cluster deployments with
    selective dims — get the injected filter deterministically.

    Broadcast-hash joins don't need it (the broadcast itself prunes
    at the probe); it matters exactly when the plan degrades to
    SortMergeJoin/ShuffledHashJoin.
    """
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
    )
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold",
        application_side_scan_threshold,
    )
    if creation_side_threshold is not None:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            creation_side_threshold,
        )
