"""As-of (temporal) join: for each left row, the most recent right row
at or before (backward) / the earliest at or after (forward) its
timestamp, optionally per key.

Spark has no native as-of join (SURVEY.md §2.3). Two formulations:

1. ``asof_join`` (here) — the **union-window technique**: union probe
   and build rows tagged by a marker, sort within each key partition
   by (time, marker), and carry build values forward with
   ``last(..., ignorenulls=True)``. One shuffle on the key, no
   nested-loop join, state O(1) per row — this is the 100 TB path.
   With ``by`` keys the window partitions parallelize perfectly;
   without keys the sort degenerates to a single partition (Spark
   windows need a partition key) — use formulation 2 instead.
2. ``asof_join_bucketed`` — keyless as-of at scale: range-bucket the
   time axis so every data-sized operation is an equi-join or bounded
   aggregate; backward and forward directions. q11
   (topn_spark/queries.py) runs on it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_by: str | None = None,
    right_by: str | None = None,
    value_cols: list[str] | None = None,
    direction: str = "backward",
    right_tiebreak: str | None = None,
    tolerance: float | int | None = None,
) -> DataFrame:
    """Left as-of join.

    Output = all ``left`` columns + each of ``value_cols`` from the
    matched right row (null when no match). ``direction='backward'``
    matches the greatest ``right_on`` ≤ ``left_on``; ``'forward'``
    the least ``right_on`` ≥ ``left_on`` (both inclusive).

    ``right_tiebreak``: column ordering right rows that share the
    same (by, time); the LAST row in that order wins, making the
    result deterministic (mirror of arg_max semantics).

    ``tolerance``: maximum allowed |left_on - matched right_on|
    (pandas merge_asof semantics) — in the column's native units, or
    SECONDS for timestamp keys. Matches farther than this are nulled.

    ``direction='nearest'`` matches the right row minimizing
    |right_on - left_on| (ties resolve backward, as in pandas). Both
    directional candidates are carried in the SAME union — one
    shuffle on the key, two within-partition sorts (one per scan
    direction) — then compared row-locally; sub-second timestamp gaps
    compare exactly (fractional-epoch doubles, not truncated
    seconds).
    """
    if direction == "nearest":
        return _asof_join_nearest(
            left, right, left_on, right_on, left_by, right_by,
            value_cols, right_tiebreak, tolerance,
        )
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    if (left_by is None) != (right_by is None):
        raise ValueError("left_by and right_by must be given together")
    value_cols = value_cols or [
        c for c in right.columns if c not in (right_on, right_by)
    ]

    left_cols = left.columns
    out_vals = [f"{c}_asof" if c in left_cols else c for c in value_cols]

    probe = left.select(
        *left_cols,
        *[F.lit(None).cast(right.schema[c].dataType).alias(o) for c, o in zip(value_cols, out_vals)],
        F.col(left_on).alias("_t"),
        F.lit(1).alias("_marker"),
        *( [F.col(left_by).alias("_by")] if left_by else [] ),
        *( [F.lit(None).cast(right.schema[right_tiebreak].dataType).alias("_tb")] if right_tiebreak else [] ),
    )
    build = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c).alias(o) for c, o in zip(value_cols, out_vals)],
        F.col(right_on).alias("_t"),
        F.lit(0).alias("_marker"),
        *( [F.col(right_by).alias("_by")] if right_by else [] ),
        *( [F.col(right_tiebreak).alias("_tb")] if right_tiebreak else [] ),
    )
    unioned = probe.unionByName(build)

    t_order = F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    order = [t_order, F.col("_marker").asc()]
    if right_tiebreak:
        order.insert(1, F.col("_tb").asc_nulls_last())
    w = (
        (Window.partitionBy("_by") if left_by else Window.partitionBy())
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # NULL probe keys match nothing (pandas semantics). Backward's asc
    # scan gets this free (nulls first ⇒ no build seen yet) but
    # forward's desc scan sorts NULL last, where the carry covers ALL
    # builds — gate on the probe timestamp in both for symmetry.
    fills = [
        F.when(
            F.col("_t").isNotNull(),
            F.last(o, ignorenulls=True).over(w),
        ).alias(o)
        for o in out_vals
    ]
    if tolerance is None:
        filled = unioned.select(*left_cols, "_marker", *fills)
        return filled.where(F.col("_marker") == 1).drop("_marker")

    # carry the matched right timestamp too, so the gap is checkable
    rt = F.when(F.col("_marker") == 0, F.col("_t"))
    filled = unioned.select(
        *left_cols,
        "_marker",
        "_t",
        F.last(rt, ignorenulls=True).over(w).alias("_matched_t"),
        *fills,
    )
    is_ts = str(filled.schema["_t"].dataType).startswith("Timestamp")
    t_num = (
        F.unix_timestamp("_t") if is_ts else F.col("_t").cast("double")
    )
    mt_num = (
        F.unix_timestamp("_matched_t")
        if is_ts
        else F.col("_matched_t").cast("double")
    )
    in_tol = F.abs(t_num - mt_num) <= F.lit(float(tolerance))
    out = filled.where(F.col("_marker") == 1).select(
        *left_cols,
        *[F.when(in_tol, F.col(o)).alias(o) for o in out_vals],
    )
    return out


def _asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_by: str | None,
    right_by: str | None,
    value_cols: list[str] | None,
    right_tiebreak: str | None,
    tolerance: float | int | None,
) -> DataFrame:
    """``direction='nearest'`` backend for ``asof_join`` — see there.

    Union-window like the directional forms, but each build row is
    wrapped in ONE struct candidate ``(matched_t, values...)`` and
    carried twice over the same keyed partition: a (t asc) scan
    yields the backward candidate, a (t desc) scan the forward one.
    The winner is picked per probe row by comparing absolute gaps —
    row-local arithmetic, no second join, no extra shuffle (one
    Exchange on the key feeds both sorts).
    """
    if (left_by is None) != (right_by is None):
        raise ValueError("left_by and right_by must be given together")
    value_cols = value_cols or [
        c for c in right.columns if c not in (right_on, right_by)
    ]
    left_cols = left.columns
    out_vals = [f"{c}_asof" if c in left_cols else c for c in value_cols]

    probe = left.select(
        *left_cols,
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(o)
            for c, o in zip(value_cols, out_vals)
        ],
        F.col(left_on).alias("_t"),
        F.lit(1).alias("_marker"),
        *([F.col(left_by).alias("_by")] if left_by else []),
        *(
            [
                F.lit(None)
                .cast(right.schema[right_tiebreak].dataType)
                .alias("_tb")
            ]
            if right_tiebreak
            else []
        ),
    )
    build = right.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
        ],
        *[F.col(c).alias(o) for c, o in zip(value_cols, out_vals)],
        F.col(right_on).alias("_t"),
        F.lit(0).alias("_marker"),
        *([F.col(right_by).alias("_by")] if right_by else []),
        *([F.col(right_tiebreak).alias("_tb")] if right_tiebreak else []),
    )
    unioned = probe.unionByName(build)

    cand = F.when(
        F.col("_marker") == 0,
        F.struct(
            F.col("_t").alias("_mt"),
            *[F.col(o).alias(o) for o in out_vals],
        ),
    )
    part = Window.partitionBy("_by") if left_by else Window.partitionBy()
    # backward scan: builds at equal t sort before the probe (marker
    # asc), tiebreak-asc so the LAST qualifying build wins — the
    # documented arg_max-mirror contract of the directional forms.
    ob = [F.col("_t").asc()]
    of = [F.col("_t").desc()]
    if right_tiebreak:
        ob.append(F.col("_tb").asc_nulls_last())
        of.append(F.col("_tb").asc_nulls_last())
    ob.append(F.col("_marker").asc())
    of.append(F.col("_marker").asc())
    wb = part.orderBy(*ob).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wf = part.orderBy(*of).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    scanned = unioned.select(
        *left_cols,
        "_marker",
        "_t",
        F.last(cand, ignorenulls=True).over(wb).alias("_bc"),
        F.last(cand, ignorenulls=True).over(wf).alias("_fc"),
    ).where(F.col("_marker") == 1)

    tnum = F.col("_t").cast("double")  # fractional epoch secs for ts
    gap_b = F.abs(tnum - F.col("_bc._mt").cast("double"))
    gap_f = F.abs(F.col("_fc._mt").cast("double") - tnum)
    best = (
        # a NULL probe timestamp matches nothing: in the desc scan NULL
        # sorts last so _fc would cover all builds — without this gate a
        # NULL-keyed probe would spuriously match the min-t build row,
        # inconsistent with the directional forms (and pandas)
        F.when(F.col("_t").isNull(), F.lit(None).cast(scanned.schema["_bc"].dataType))
        .when(F.col("_bc").isNull(), F.col("_fc"))
        .when(F.col("_fc").isNull(), F.col("_bc"))
        # strict <: equal gaps resolve backward (pandas semantics)
        .when(gap_f < gap_b, F.col("_fc"))
        .otherwise(F.col("_bc"))
    )
    picked = scanned.select(*left_cols, "_t", best.alias("_best"))
    keep = F.col("_best").isNotNull()
    if tolerance is not None:
        keep = keep & (
            F.abs(
                F.col("_t").cast("double")
                - F.col("_best._mt").cast("double")
            )
            <= F.lit(float(tolerance))
        )
    return picked.select(
        *left_cols,
        *[F.when(keep, F.col(f"_best.{o}")).alias(o) for o in out_vals],
    )


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_id: str,
    value_cols: list[str] | None = None,
    bucket: str = "day",
    direction: str = "backward",
) -> DataFrame:
    """Keyless as-of join that scales: time-bucket both sides so all
    data motion is equi-joins and bounded aggregates — the
    "range-bucket the time axis" strategy this module's header
    prescribes for keyless as-of at 100 TB.

    For each left row, finds the right row with the greatest
    ``right_on`` ≤ ``left_on`` (``direction="backward"``) or the least
    ``right_on`` ≥ ``left_on`` (``"forward"``, the exact mirror:
    min-structs, a following-window carry, and a clamp at the low end
    of the span) and appends ``{right_on}_asof`` plus ``value_cols``
    from it (nulls when no right row qualifies). ``left_id`` must
    uniquely identify left rows.

    Plan shape (no nested-loop join, no big broadcast, no global
    window over data rows, ONE scan of the probe side):

    1. hash-aggregate the right side to one best-row struct per
       bucket (map-side combined; output = #buckets rows);
    2. gap-fill the bucket axis (right span only) and running-max
       the per-bucket structs — a window over the *bucket table*
       only — keeping both the strictly-before and inclusive
       cumulative best;
    3. attach the 1-row right span to every probe via a constant-key
       broadcast hash join (equi key ⇒ no NLJ in the plan) and clamp
       the probe's bucket into the span, so probes past the right
       range read the inclusive cumulative max at the last bucket
       and no probe-side scan is needed to size the grid;
    4. equi-join the clamped probes to the dense bucket table
       (broadcast: #buckets rows) → best right row in any
       strictly-earlier bucket;
    5. left-equi-join probes to right rows of their own bucket and
       take a conditional ``max(when(right_on <= left_on, row))``
       together with the step-4 carry in ONE grouped aggregate per
       probe — no second probe scan, no probe-probe re-join.

    Lexicographic struct comparison (time field first) makes (2) and
    (5) plain ``max``/``greatest`` (``min``/``least`` forward);
    per-bucket row counts bound the only potentially-skewed join (5).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    back = direction == "backward"
    value_cols = value_cols or []
    out_t = f"{right_on}_asof"

    rbkt = F.date_trunc(bucket, F.col(right_on))
    agg_best = F.max if back else F.min
    best = agg_best(
        F.struct(F.col(right_on).alias("_t"), *[F.col(c) for c in value_cols])
    )
    per_bucket = right.groupBy(rbkt.alias("_bkt")).agg(best.alias("_best"))

    # Dense, cumulative bucket table (tiny: one row per right bucket).
    span = per_bucket.agg(
        F.min("_bkt").alias("_lo"), F.max("_bkt").alias("_hi")
    )
    grid = span.where(F.col("_lo").isNotNull()).select(
        F.explode(
            F.sequence("_lo", "_hi", F.expr(f"interval 1 {bucket}"))
        ).alias("_ck")
    )
    # backward: carry the best of strictly-earlier buckets forward;
    # forward: the best of strictly-later buckets backward.
    wcarry = (
        Window.partitionBy()
        .orderBy("_ck")
        .rowsBetween(
            *(
                (Window.unboundedPreceding, -1)
                if back
                else (1, Window.unboundedFollowing)
            )
        )
    )
    wcum = (
        Window.partitionBy()
        .orderBy("_ck")
        .rowsBetween(
            *(
                (Window.unboundedPreceding, 0)
                if back
                else (0, Window.unboundedFollowing)
            )
        )
    )
    dense = (
        grid.join(per_bucket.withColumnRenamed("_bkt", "_ck"), "_ck", "left")
        .select(
            "_ck",
            agg_best("_best").over(wcarry).alias("_carry_best"),
            agg_best("_best").over(wcum).alias("_cum_best"),
        )
    )

    pbkt = F.date_trunc(bucket, F.col(left_on))
    # The 1-row span attaches to every probe through an equi-key BHJ on
    # an always-1 key. The key must be NON-FOLDABLE: lit(1)=lit(1)
    # constant-folds to `true` and the join degenerates to the
    # BroadcastNestedLoopJoin this operator exists to avoid. col==col
    # is NOT enough — when the column is non-nullable,
    # SimplifyBinaryComparison folds it to true and FoldablePropagation
    # degrades the join the same way. Deriving the 1 from a
    # nondeterministic expression (monotonically_increasing_id()*0+1)
    # is fold-proof by construction regardless of schema nullability;
    # it is still value-stable (always 1), so task retries are safe.
    always_one = (F.monotonically_increasing_id() * 0 + 1).cast("int")
    probe = left.select("*", pbkt.alias("_jbkt"), always_one.alias("_one"))

    # (3) scalar span per probe row via the constant-key 1-row
    # broadcast BHJ; clamp the join key into the grid (null probe
    # times stay null: least()/greatest() would otherwise skip the
    # null and match the clamp bound). Backward clamps down into the
    # top of the span; forward clamps up into the bottom.
    clamp_bound = "_hi" if back else "_lo"
    clamp = F.least if back else F.greatest
    with_span = probe.join(
        F.broadcast(span.select(always_one.alias("_one"), "_lo", "_hi")),
        "_one",
        "left",
    ).withColumn(
        "_ck",
        F.when(
            F.col("_jbkt").isNotNull(),
            clamp(F.col("_jbkt"), F.col(clamp_bound)),
        ),
    )

    # (4) strictly-earlier (/later) buckets via the dense cumulative
    # table; probes clamped in from beyond the range use the
    # inclusive best at the clamp bound.
    past_range = (
        F.col("_jbkt") > F.col("_hi")
        if back
        else F.col("_jbkt") < F.col("_lo")
    )
    with_carry = with_span.join(
        F.broadcast(dense), "_ck", "left"
    ).withColumn(
        "_carry",
        F.when(past_range, F.col("_cum_best")).otherwise(
            F.col("_carry_best")
        ),
    )

    # (5) same-bucket refinement folded into one grouped aggregate:
    # left join keeps match-less probes, the conditional max/min
    # ignores right rows on the wrong side of the probe time,
    # greatest()/least() merges the step-4 carry (both operands share
    # the struct shape, time field first).
    cand = with_carry.join(
        right.select(
            rbkt.alias("_jbkt"),
            F.struct(
                F.col(right_on).alias("_t"),
                *[F.col(c) for c in value_cols],
            ).alias("_s"),
        ),
        "_jbkt",
        "left",
    )
    qualifies = (
        F.col("_s._t") <= F.col(left_on)
        if back
        else F.col("_s._t") >= F.col(left_on)
    )
    merge = F.greatest if back else F.least
    merged = cand.groupBy(left_id).agg(
        *[F.first(c).alias(c) for c in left.columns if c != left_id],
        merge(
            F.first("_carry"),
            agg_best(F.when(qualifies, F.col("_s"))),
        ).alias("_final"),
    )
    return merged.select(
        *left.columns,
        F.col("_final._t").alias(out_t),
        *[F.col(f"_final.{c}").alias(c) for c in value_cols],
    )
