"""Custom stateful streaming operator (SURVEY §2.9 extension):
per-user threshold-crossing alerts via ``applyInPandasWithState``.

Semantics: per user, accumulate a running total of ``value`` in event
order and emit one alert row each time the cumulative total crosses a
multiple of ``THRESHOLD`` (100.0). This is the canonical "custom
business-rule state" shape that windowed aggregations can't express —
the emitted rows depend on the running value *between* rows.

Determinism: the accumulator is the quantized integer
``floor(value·1e6 + 0.5)`` (exact, associative — see
operators/helpers.py), so the stream, the batch twin, and the DuckDB
oracle agree bit-for-bit regardless of how each engine sums doubles.
Cumulative magnitudes stay ≪ 2⁵³, so the final double division is
exact in every engine.

Scale: state per key is ONE long (the running quantized sum); with an
event-time timeout wired to the watermark, idle users evict and state
stays bounded under unbounded input.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

THRESHOLD = 100.0
_Q = 1_000_000  # value quantum (6 dp)
_STEP = int(THRESHOLD * _Q)  # threshold in quantized units

ALERT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("cum_value", DoubleType()),
        StructField("level", LongType()),
    ]
)

_STATE_SCHEMA = StructType([StructField("cum", LongType())])


def _level(cum_q: int) -> int:
    # exact for |cum_q| < 2^53; floor (not truncate) so negative totals
    # level consistently in both engines
    return math.floor(cum_q / _STEP)


def _alerts_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    cum = state.get[0] if state.exists else 0
    out: list[tuple] = []
    for pdf in pdfs:
        # event order within the batch; across batches the file replay
        # must deliver time-ordered micro-batches (as a log source does)
        pdf = pdf.sort_values(["ts", "event_id"])
        for r in pdf.itertuples(index=False):
            v = 0.0 if pd.isna(r.value) else float(r.value)
            qv = math.floor(v * _Q + 0.5)  # = the engines' FLOOR(v*1e6+0.5)
            prev, cum = cum, cum + qv
            if _level(cum) > _level(prev):
                out.append(
                    (key[0], r.event_id, r.ts, cum / _Q, _level(cum))
                )
    state.update((cum,))
    yield pd.DataFrame(
        out, columns=["user_id", "event_id", "ts", "cum_value", "level"]
    )


def threshold_alerts_stateful(events: DataFrame) -> DataFrame:
    """Streaming: one alert per threshold crossing, state = one long
    per user."""
    return events.groupBy("user_id").applyInPandasWithState(
        _alerts_fn,
        outputStructType=ALERT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------- personal-record (high-watermark) detector ----------

RECORD_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)

_MAX_STATE_SCHEMA = StructType([StructField("maxv", DoubleType())])


def _records_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Emit a row whenever a user's value strictly exceeds every
    earlier value of theirs. State = ONE double (the running max); the
    comparison is a pure value compare — no arithmetic, so stream,
    batch twin, and oracle agree with no quantization needed."""
    cur = state.get[0] if state.exists else None
    out: list[tuple] = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for r in pdf.itertuples(index=False):
            if pd.isna(r.value):
                continue
            v = float(r.value)
            if cur is None or v > cur:
                out.append((key[0], r.event_id, r.ts, v))
                cur = v
    if cur is not None:
        state.update((cur,))
    yield pd.DataFrame(
        out, columns=["user_id", "event_id", "ts", "value"]
    )


def record_highs_stateful(events: DataFrame) -> DataFrame:
    """Streaming personal-record detector (custom stateful op #2)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _records_fn,
        outputStructType=RECORD_SCHEMA,
        stateStructType=_MAX_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
