"""Spark-4 ``transformWithStateInPandas`` twin of the session handler.

Same reference state machine as ``state.sessionize_updates`` (STATE-1..5,
`flights.py:14-137` / `models.py:110-270`) expressed through the
modern arbitrary-stateful-processing API: typed ``ValueState`` instead
of a packed tuple-with-schema, explicit processing-time timers instead
of ``GroupStateTimeout``, and a processor object whose lifecycle Spark
manages.  The per-row transition logic is IMPORTED from
``state.advance_session`` — one core, two APIs, no drift.

Operationally this path requires the RocksDB state store
(``spark.sql.streaming.stateStore.providerClass = ...RocksDBStateStoreProvider``)
— which is also the right choice at scale: state lives off-heap and
spills, so a 100 TB-feed session pool is bounded by disk, not executor
heap.  The legacy handler remains the default for HDFS-backed state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    TimerValues,
)

from .state import (
    EVENT_OUTPUT_SCHEMA,
    SESSION_TIMEOUT_MS,
    STATE_SCHEMA,
    advance_session,
    summary_row,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class SessionProcessor(StatefulProcessor):
    """Keyed session machine as a StatefulProcessor."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._sess = handle.getValueState("session", STATE_SCHEMA)

    def handleInputRows(
        self, key, rows, timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        hexident = key[0]
        prior = self._sess.get() if self._sess.exists() else None

        def _rows():
            for pdf in rows:
                yield from pdf.sort_values("gen_date_time").itertuples(index=False)

        admitted, new_state, out_rows = advance_session(
            hexident, tuple(prior) if prior is not None else None, _rows()
        )

        if admitted:
            self._sess.update(new_state)
            # Reset the eviction clock: drop any pending timer, arm a
            # fresh one MAX_AGE past now (parity with the legacy
            # setTimeoutDuration semantics).
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            self._handle.registerTimer(
                timerValues.getCurrentProcessingTimeInMs() + SESSION_TIMEOUT_MS
            )

        if out_rows:
            yield pd.DataFrame(out_rows)

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        if self._sess.exists():
            yield pd.DataFrame([summary_row(key[0], tuple(self._sess.get()))])
        self._sess.clear()

    def close(self) -> None:
        pass


def event_stream_tws(parsed: DataFrame) -> DataFrame:
    """``transformWithStateInPandas`` pipeline stage — drop-in twin of
    ``pipeline.event_stream``.  Start the query with the RocksDB
    provider (see ``ROCKSDB_PROVIDER``)."""
    return parsed.groupBy("hexident").transformWithStateInPandas(
        SessionProcessor(),
        outputStructType=EVENT_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="ProcessingTime",
    )
