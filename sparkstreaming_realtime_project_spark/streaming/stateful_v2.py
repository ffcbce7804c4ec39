"""Custom stateful operators on Spark 4's transformWithStateInPandas.

``stateful.py`` carries the applyInPandasWithState generation of the
extension operators; this module is the SAME first-seen dedup semantics
re-expressed on the new StatefulProcessor API (SPARK-49564 family) —
the forward-looking surface for bespoke per-key state machines:

- named, independently-typed state variables (value/list/map) instead
  of one monolithic state tuple;
- explicit event-time TIMERS (register/expire callbacks) instead of a
  single setTimeoutTimestamp — the Redis EXPIRE analog
  (DwdDauApp.scala:110-135) becomes a first-class object;
- the same state-store placement and Arrow batching as the old API, so
  the 100 TB story is unchanged: state partitioned by key, one Arrow
  batch of a key's rows per trigger through Python.

Kept side-by-side with the old-API operator (the parity test asserts
both produce identical output on the same replay) so the repo documents
the migration path rather than silently switching.

ENVIRONMENT GATE: the transformWithState Python worker speaks protobuf
to the JVM state server (pyspark/sql/streaming/proto/StateMessage_pb2);
``google.protobuf`` is not installed in this sandbox, so the parity
test skips when the import is unavailable (same opt-in pattern as the
Pillow decode path in operators/multimodal.py). The operator itself has
no import-time protobuf dependency — it runs unmodified wherever
protobuf is present. RocksDB state store provider required
(spark.sql.streaming.stateStore.providerClass)."""


from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)


def tws_available() -> bool:
    """True when the transformWithState worker's protobuf dependency is
    importable — the runtime gate for the v2 operators."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class _FirstSeenProcessor(StatefulProcessor):
    """Emit the earliest-timestamped row per key within the first trigger
    that sees the key; drop all later rows; evict state ``ttl_ms`` after
    the first event's time (event-time timer)."""

    def __init__(self, ts_col: str, ttl_ms: int):
        self._ts_col = ts_col
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._first = handle.getValueState("first_ts_ms", "first_ts_ms LONG")

    def handleInputRows(self, key, rows, timerValues: TimerValues):
        first = None
        for pdf in rows:
            if len(pdf) == 0:
                continue
            cand = pdf.sort_values(self._ts_col).head(1)
            if first is None or (
                cand[self._ts_col].iloc[0] < first[self._ts_col].iloc[0]
            ):
                first = cand
        if first is None or self._first.exists():
            return iter(())
        first_ts_ms = int(
            pd.Timestamp(first[self._ts_col].iloc[0]).value // 1_000_000
        )
        self._first.update((first_ts_ms,))
        self._handle.registerTimer(first_ts_ms + self._ttl_ms)
        return iter((first,))

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ):
        self._first.clear()
        return iter(())

    def close(self) -> None:
        pass


def first_seen_per_key_v2(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    ttl_hours: int = 25,
) -> DataFrame:
    """``stateful.first_seen_per_key`` on transformWithStateInPandas —
    identical semantics (earliest row in the first trigger wins, later
    arrivals dropped, state evicted ttl_hours after the first event),
    new-API state variables and timers. ``stream`` must carry a
    watermark on ``ts_col`` (event-time mode requires one)."""
    return stream.groupBy(*key_cols).transformWithStateInPandas(
        statefulProcessor=_FirstSeenProcessor(ts_col, ttl_hours * 3600 * 1000),
        outputStructType=stream.schema,
        outputMode="append",
        timeMode="eventTime",
    )
