"""Stateful streaming operators.

- ``streaming_dedup``: engine-native streaming deduplication
  (``dropDuplicatesWithinWatermark``) — the streaming twin of the batch
  exact-dedup; state is bounded by the watermark.
- ``streaming_user_totals``: custom stateful operator via
  ``applyInPandasWithState`` — per-user running totals carried in explicit
  state across micro-batches (the escape hatch for operators Spark's
  built-in streaming aggregates can't express).

Scale notes: state is partitioned by the group key across executors and
checkpointed. ``streaming_dedup``'s state IS bounded (the watermark evicts
expired keys). The user-totals twins deliberately run with NoTimeout /
timeMode "None" — running totals over ALL history are the point, and any
timeout would silently reset a user's totals — which means their state
grows with distinct-user cardinality, not time: bounded only by the key
domain. A production deployment that cannot bound the key domain caps it
explicitly (ProcessingTimeTimeout / state TTL on the TWS handle, emitting
final totals on expiry), trading the all-history semantics for bounded
state. The pandas state function receives Arrow batches per key — memory
is per-key, not per-partition.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def streaming_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Drop duplicate events (same user_id + event_id) within the watermark
    window — exactly-once semantics over at-least-once sources."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_id"]
    )


_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)
_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def _update_user_totals(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold each micro-batch into (count, sum) state; emit the running
    totals for the key after every batch."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def streaming_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful per-user running totals (applyInPandasWithState)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            # NoTimeout is a deliberate semantic choice: totals-over-all-
            # history; state size = O(distinct users). See module docstring
            # for the bounded-state production variant.
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- transformWithStateInPandas twin (Spark 4 stateful API) -------------------------
# The successor API to applyInPandasWithState: explicit typed state handles
# (value/list/map state), timers, and TTL — the shape new custom stateful
# operators should take. Same per-user running totals so both APIs are
# equivalence-checked against the batch aggregate by the tests.
# Sandbox boundary: the TWS state channel serializes via protobuf in the
# Python worker and this environment ships none, so the equivalence test
# skips here (the applyInPandasWithState twin runs end-to-end); the
# implementation is the production shape for protobuf-equipped clusters.

try:  # Spark >= 4.0
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserTotalsProcessor(StatefulProcessor):
        """ValueState-backed (count, sum) per user, emitted every batch."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            got = self._state.get() if self._state.exists() else None
            n, total = got if got is not None else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    def streaming_user_totals_tws(events: DataFrame) -> DataFrame:
        """Per-user running totals via the Spark 4 transformWithStateInPandas
        API (typed ValueState handle instead of a tuple-state function)."""
        return (
            events.select("user_id", "value")
            .groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=UserTotalsProcessor(),
                outputStructType=_OUT_SCHEMA,
                outputMode="Update",
                timeMode="None",
            )
        )

    TWS_AVAILABLE = True
except ImportError:  # pragma: no cover - older Spark
    TWS_AVAILABLE = False


# --- streaming EWMA twin (events_ewma_anomaly's stateful counterpart) ---------------

_EWMA_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("last_ewma", DoubleType()),
        StructField("max_abs_dev", DoubleType()),
    ]
)
_EWMA_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("ewma", DoubleType()),
        StructField("maxdev", DoubleType()),
    ]
)
_EWMA_ALPHA = 0.25  # dyadic; MUST match operators.events_analytics


def _update_ewma(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold each micro-batch (sorted by ts, event_id) into EWMA state —
    the identical left-fold the batch operator runs, so an availableNow
    pass over the same files reproduces the batch numbers exactly
    (Python float ops are the same IEEE doubles).

    The iterator yields one Arrow chunk per ~arrow.maxRecordsPerBatch rows,
    and chunk boundaries are NOT (ts, event_id) boundaries — so all chunks
    are concatenated and sorted ONCE before folding (sorting each chunk
    independently would fold across-chunk rows out of order). The state
    schema can't store NULL-able "never seen a value" directly, so the
    (n, ewma) pair encodes it: n == 0 means the stored ewma is the unused
    0.0 placeholder and the next real value must SEED the EWMA, not fold
    against the placeholder."""
    n, ewma, maxdev = state.get if state.exists else (0, 0.0, 0.0)
    seeded = n > 0
    chunks = [pdf.dropna(subset=["value"]) for pdf in pdfs]
    pdf = pd.concat(chunks) if chunks else pd.DataFrame(columns=["ts", "event_id", "value"])
    pdf = pdf.sort_values(["ts", "event_id"])
    for v in pdf["value"].astype(float):
        if not seeded:
            ewma, n, seeded = v, 1, True
        else:
            dev = abs(v - ewma)
            if dev > maxdev:
                maxdev = dev
            ewma = ewma + _EWMA_ALPHA * (v - ewma)
            n += 1
    state.update((n, ewma if seeded else 0.0, maxdev))
    ewma = ewma if seeded else None
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "last_ewma": [ewma],
            "max_abs_dev": [maxdev],
        }
    )


def streaming_ewma(events: DataFrame) -> DataFrame:
    """Per-user streaming EWMA + max one-step deviation: the stateful twin
    of the batch `events_ewma_anomaly` (state = 3 scalars per user; same
    NoTimeout all-history semantics and bounded-state caveats as
    streaming_user_totals)."""
    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_ewma,
            outputStructType=_EWMA_OUT,
            stateStructType=_EWMA_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- streaming Croston twin (orders_croston_intermittent's stateful counterpart) ----

_CROSTON_OUT = StructType(
    [
        StructField("part_key", LongType()),
        StructField("n_demand_months", LongType()),
        StructField("z_size", DoubleType()),
        StructField("p_interval", DoubleType()),
        StructField("croston_rate", DoubleType()),
    ]
)
_CROSTON_STATE = StructType(
    [
        StructField("nd", LongType()),
        StructField("z", DoubleType()),
        StructField("p", DoubleType()),
        StructField("first_ym", LongType()),
        StructField("last_ym", LongType()),
    ]
)
_CROSTON_ALPHA_F = 0.25  # dyadic; MUST match operators.round5_stats


def _update_croston(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold monthly demand CELLS (contract: exactly one row per
    (part, month), months non-decreasing across batches — the shape an
    upstream gold month-cell stream emits) into Croston [z, p] state.
    Chunk discipline per the EWMA twin: concatenate ALL Arrow chunks,
    sort once, then fold. Seeding matches the batch op: z seeds at the
    first demand month, p seeds at the SECOND (first observed interval);
    nd counts demand months."""
    nd, z, p, first_ym, last_ym = (
        state.get if state.exists else (0, 0.0, 0.0, -1, -1)
    )
    chunks = [pdf.dropna(subset=["qty"]) for pdf in pdfs]
    pdf = pd.concat(chunks) if chunks else pd.DataFrame(columns=["ym0", "qty"])
    pdf = pdf.sort_values(["ym0"])
    for ym, q in zip(pdf["ym0"].astype(int), pdf["qty"].astype(float)):
        if q <= 0.0:
            continue
        if nd == 0:
            z, first_ym = q, ym
        elif nd == 1:
            p = float(ym - last_ym)
            z = _CROSTON_ALPHA_F * q + (1.0 - _CROSTON_ALPHA_F) * z
        else:
            p = _CROSTON_ALPHA_F * float(ym - last_ym) + (1.0 - _CROSTON_ALPHA_F) * p
            z = _CROSTON_ALPHA_F * q + (1.0 - _CROSTON_ALPHA_F) * z
        last_ym = ym
        nd += 1
    state.update((nd, z, p, first_ym, last_ym))
    yield pd.DataFrame(
        {
            "part_key": [key[0]],
            "n_demand_months": [nd],
            "z_size": [z if nd > 0 else None],
            "p_interval": [p if nd > 1 else None],
            "croston_rate": [z / p if nd > 1 else None],
        }
    )


def streaming_croston(cells: DataFrame) -> DataFrame:
    """Per-part streaming Croston intermittent-demand state over a month-
    cell stream (columns: part_key, ym0, qty). Same all-history NoTimeout
    semantics and bounded-state caveats as streaming_user_totals; state is
    5 scalars per part."""
    return (
        cells.select(F.col("part_key"), F.col("ym0"), F.col("qty"))
        .groupBy("part_key")
        .applyInPandasWithState(
            _update_croston,
            outputStructType=_CROSTON_OUT,
            stateStructType=_CROSTON_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- streaming SpaceSaving heavy hitters (cms_heavy_hitters' stateful twin) -----------

SS_CAPACITY = 8  # counter-table capacity per key (the epsilon=1/K knob)

_SS_OUT = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_total", LongType()),
        StructField("ids", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
        StructField("errs", ArrayType(LongType())),
    ]
)
_SS_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("ids", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
        StructField("errs", ArrayType(LongType())),
    ]
)


def _update_spacesaving(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """SpaceSaving (Metwally et al.) over the per-event-type user stream:
    a fixed K-entry counter table where an unseen id evicts the minimum
    counter and inherits its count as overestimation error. Guarantees
    (checked by the twin test against exact batch counts): est >= true,
    est - err <= true, and every id with true count > n/K is present.
    Same chunk-concat + single-sort discipline as the EWMA twin — chunk
    boundaries are not (ts, event_id) boundaries, and the eviction choice
    depends on fold order, so the fold runs once over the sorted batch;
    min-counter ties break on (count, id) so replay is deterministic."""
    if state.exists:
        n, ids, counts, errs = state.get
        table = {i: (c, e) for i, c, e in zip(ids, counts, errs)}
    else:
        n, table = 0, {}
    chunks = list(pdfs)
    pdf = (
        pd.concat(chunks)
        if chunks
        else pd.DataFrame(columns=["ts", "event_id", "user_id"])
    )
    pdf = pdf.sort_values(["ts", "event_id"])
    for uid in pdf["user_id"].astype(int):
        n += 1
        if uid in table:
            c, e = table[uid]
            table[uid] = (c + 1, e)
        elif len(table) < SS_CAPACITY:
            table[uid] = (1, 0)
        else:
            evict_id, (mc, _me) = min(
                table.items(), key=lambda kv: (kv[1][0], kv[0])
            )
            del table[evict_id]
            table[uid] = (mc + 1, mc)
    items = sorted(table.items(), key=lambda kv: (-kv[1][0], kv[0]))
    ids = [i for i, _ in items]
    counts = [c for _, (c, _e) in items]
    errs = [e for _, (_c, e) in items]
    state.update((n, ids, counts, errs))
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "n_total": [n],
            "ids": [ids],
            "counts": [counts],
            "errs": [errs],
        }
    )


def streaming_heavy_hitters(
    events: DataFrame, output_mode: str = "update"
) -> DataFrame:
    """Per-event-type streaming SpaceSaving heavy hitters: the stateful
    twin of the batch `cms_heavy_hitters` sketch — state is a fixed
    K-entry counter table per key (BOUNDED by construction, unlike the
    running-totals twins), so this shape holds state constant at any
    stream length and any user cardinality. ``output_mode="append"``
    makes the frame file-sink-compatible (checkpoint recovery — memory
    sinks cannot restart; the latest row per key is the one with the
    highest n_total)."""
    return (
        events.select("event_type", "ts", "event_id", "user_id")
        .groupBy("event_type")
        .applyInPandasWithState(
            _update_spacesaving,
            outputStructType=_SS_OUT,
            stateStructType=_SS_STATE,
            outputMode=output_mode,
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
