"""Custom stateful streaming operator: per-key running top-N via
``applyInPandasWithState``.

``streaming_topn_sink`` (windows.py) maintains a GLOBAL top-N on the
driver; this operator keeps a top-N PER KEY inside Spark's state
store — state lives with the executors, scales with the key space,
and survives checkpoint/restart. The merge is the reference's bounded
heap (TopN.java:117-118) applied to (held state ∪ new batch rows) per
key per micro-batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def grouped_running_topn(
    stream: DataFrame,
    key_col: str,
    id_col: str,
    field: str,
    size: int,
) -> DataFrame:
    """Per-key running top-``size`` over a stream.

    Emits, on every micro-batch that touches a key, that key's current
    top rows as ``(key, version, ids array, values array)`` where
    ``version`` is the total row count processed for the key (a
    monotone watermark for "which emission is newest"). Values are
    held descending; nulls in ``field`` are ignored (they can never
    enter a top-N under null-smallest semantics unless fewer than
    ``size`` non-null rows exist — matching ignoreNull=False would
    need null tracking; this operator documents ignoreNull=True
    behavior).

    State per key is two ``size``-bounded lists — O(keys × size)
    across the cluster's state stores.
    """
    out_schema = (
        f"{key_col} string, version bigint, ids array<bigint>, "
        f"vals array<double>"
    )
    state_schema = "ids array<bigint>, vals array<double>, n bigint"

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ids, vals, seen = state.get
            ids, vals = list(ids), list(vals)
        else:
            ids, vals, seen = [], [], 0
        for pdf in pdfs:
            sub = pdf[[id_col, field]].dropna(subset=[field])
            seen += len(pdf)
            for i, v in zip(sub[id_col], sub[field]):
                ids.append(int(i))
                vals.append(float(v))
        # bounded-heap cut: keep top-`size` by value desc, id asc ties
        order = sorted(
            range(len(vals)), key=lambda j: (-vals[j], ids[j])
        )[:size]
        ids = [ids[j] for j in order]
        vals = [vals[j] for j in order]
        state.update((ids, vals, seen))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "version": [seen],
                "ids": [ids],
                "vals": [vals],
            }
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def grouped_running_topn_v2(
    stream: DataFrame,
    key_col: str,
    id_col: str,
    field: str,
    size: int,
) -> DataFrame:
    """Per-key running top-``size`` on the ``transformWithState``
    API (Spark 4) — same semantics and output shape as
    :func:`grouped_running_topn`, held in a typed ``ValueState``
    inside the RocksDB state store — transformWithState requires
    ``spark.sql.streaming.stateStore.providerClass`` to be the
    RocksDB provider, set before the query starts (runtime-settable;
    scope it per query, as the default HDFS-backed store remains
    right for the v1 operators).

    The v2 API is the forward path for custom stateful operators:
    typed state handles, timers, and TTL live on the handle instead
    of a single opaque tuple, and state survives schema evolution.
    Kept alongside the v1 operator so both engine surfaces are
    exercised.

    Environment gate: transformWithState's Python↔JVM state protocol
    is protobuf-based; without the ``protobuf`` package this raises
    immediately (instead of crashing the streaming worker mid-query).
    The v1 operator has no such dependency.
    """
    try:
        import google.protobuf  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "grouped_running_topn_v2 needs the 'protobuf' package "
            "(transformWithState state protocol); use "
            "grouped_running_topn (applyInPandasWithState) instead"
        ) from e
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    out_schema = (
        f"{key_col} string, version bigint, ids array<bigint>, "
        f"vals array<double>"
    )

    class _TopNProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "topn", "ids array<bigint>, vals array<double>, n bigint"
            )

        def handleInputRows(self, key, rows, timerValues):
            held = self._state.get() if self._state.exists() else None
            ids, vals, seen = (
                (list(held[0]), list(held[1]), held[2]) if held else ([], [], 0)
            )
            for pdf in rows:
                sub = pdf[[id_col, field]].dropna(subset=[field])
                seen += len(pdf)
                for i, v in zip(sub[id_col], sub[field]):
                    ids.append(int(i))
                    vals.append(float(v))
            order = sorted(
                range(len(vals)), key=lambda j: (-vals[j], ids[j])
            )[:size]
            ids = [ids[j] for j in order]
            vals = [vals[j] for j in order]
            self._state.update((ids, vals, seen))
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "version": [seen],
                    "ids": [ids],
                    "vals": [vals],
                }
            )

        def close(self) -> None:
            pass

    return stream.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=_TopNProcessor(),
        outputStructType=out_schema,
        outputMode="append",
        timeMode="None",
    )


def streaming_ewma(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
    z_threshold: float | None = 3.0,
) -> DataFrame:
    """Per-key streaming EWMA with online anomaly flagging: for each
    row (in event-time order within a key), emit the smoothed value
    ``ewma ← α·x + (1−α)·ewma`` plus an ``anomaly`` flag when the
    standardized residual ``|x − ewma_prev| / σ_prev`` exceeds
    ``z_threshold`` (σ tracked as an EW variance with the same α —
    the classic EWMA control chart). The streaming counterpart of
    batch ``pipeline.ewma``: same recurrence, state carried across
    micro-batches in the state store instead of an array fold.

    State per key is three floats + a count — O(keys) cluster-wide,
    checkpoint-durable. Within a micro-batch rows are sorted by
    ``ts_col`` before folding, so replaying N batches equals one big
    batch exactly (the replay-equivalence test contract); late rows
    ARRIVING in a later batch fold in arrival order — pair with a
    watermark + dropDuplicates upstream when the feed can reorder
    across batches.
    """
    out_schema = (
        f"{key_col} string, {ts_col} timestamp, x double, ewma double, "
        "z double, anomaly boolean"
    )
    state_schema = "m double, s2 double, n bigint"
    a = float(alpha)

    def fn(key, pdfs, state):
        if state.exists:
            m, s2, n = state.get
        else:
            m, s2, n = 0.0, 0.0, 0
        rows = {"ts": [], "x": [], "ewma": [], "z": [], "an": []}
        for pdf in pdfs:
            sub = pdf[[ts_col, value_col]].dropna(subset=[value_col])
            sub = sub.sort_values(ts_col)
            for t, x in zip(sub[ts_col], sub[value_col]):
                x = float(x)
                if n == 0:
                    z = None
                    an = False
                    m, s2 = x, 0.0
                else:
                    resid = x - m
                    sd = s2 ** 0.5
                    z = abs(resid) / sd if sd > 0 else None
                    an = (
                        z_threshold is not None
                        and z is not None
                        and z > z_threshold
                    )
                    m = a * x + (1 - a) * m
                    s2 = a * resid * resid + (1 - a) * s2
                n += 1
                rows["ts"].append(t)
                rows["x"].append(x)
                rows["ewma"].append(m)
                rows["z"].append(z)
                rows["an"].append(bool(an))
        state.update((m, s2, n))
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(rows["ts"]),
                ts_col: rows["ts"],
                "x": rows["x"],
                "ewma": rows["ewma"],
                "z": rows["z"],
                "anomaly": rows["an"],
            }
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
