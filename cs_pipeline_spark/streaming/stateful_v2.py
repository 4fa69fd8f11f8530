"""Custom stateful operator on the Spark 4 ``transformWithState``
API (SURVEY §2.9 extension) — the successor of
``applyInPandasWithState`` with typed state handles and timers.

Op: per-user RUNNING STATS (count, exact quantized sum, max) emitted
once per micro-batch per active user — the live per-entity profile a
fraud/quality scorer reads. State = one ValueState holding three
longs; the quantized-integer sum keeps stream, batch twin, and DuckDB
oracle bit-identical (same argument as ``streaming/stateful.py``).

Container note: the runtime path needs ``google.protobuf`` (the
state-server wire format), which is absent here — ``HAS_TWS`` gates
the streaming replay test; the processor's logic is unit-tested
directly and the batch twin (``stream_user_profile``) carries the
oracle check either way.

Why the new API matters at scale: typed state handles (value/list/map)
let the state store track granular TTL per variable, and registered
timers give per-key scheduled emission without a synthetic heartbeat
stream — both are what a 100 TB streaming deployment needs to keep
RocksDB state bounded. Here one ValueState suffices; the batch twin
(``stream_user_profile``) is the driver-checkable surface.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

try:  # transformWithState needs protobuf for its state server
    import google.protobuf.descriptor  # noqa: F401

    HAS_TWS = True
except ImportError:  # pragma: no cover - container-dependent
    HAS_TWS = False

_Q = 1_000_000

PROFILE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("qsum", LongType()),
        StructField("qmax", LongType()),
    ]
)


class UserProfileProcessor(StatefulProcessor):
    """count / exact-sum / max per user, one output row per batch."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("profile", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, qsum, qmax = (
            self._state.get() if self._state.exists() else (0, 0, None)
        )
        for pdf in rows:
            vals = pdf["value"].dropna()
            n += len(pdf)
            for v in vals:
                qv = math.floor(float(v) * _Q + 0.5)
                qsum += qv
                qmax = qv if qmax is None or qv > qmax else qmax
        self._state.update((n, qsum, qmax))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [qsum / _Q],
                "max_value": [None if qmax is None else qmax / _Q],
            }
        )

    def close(self) -> None:
        pass


def user_profile_stateful(events: DataFrame) -> DataFrame:
    """Streaming: per-user running profile via transformWithState."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserProfileProcessor(),
        outputStructType=PROFILE_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
