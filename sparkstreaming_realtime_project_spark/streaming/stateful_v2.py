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


class _SessionizeProcessor(StatefulProcessor):
    """Gap sessionization as an explicit state machine with first-class
    TIMERS: in-batch gaps close sessions immediately; one registered
    event-time timer per open session closes it when the watermark
    passes end + gap. The v1 setTimeoutTimestamp REPLACES the pending
    timeout; v2 timers ACCUMULATE, so every input batch deletes the
    key's stale timers before registering the new close time —
    otherwise an old timer fires early and emits a still-open session."""

    def __init__(self, key_cols: list[str], ts_col: str, gap_ms: int):
        self._key_cols = key_cols
        self._ts_col = ts_col
        self._gap_ms = gap_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._sess = handle.getValueState(
            "session", "start_ms LONG, end_ms LONG, n LONG"
        )

    def _emit(self, key, rows):
        cols = self._key_cols + ["start_ms", "end_ms", "n_events"]
        return iter(
            (pd.DataFrame([list(key) + list(r) for r in rows], columns=cols),)
        )

    def handleInputRows(self, key, rows, timerValues: TimerValues):
        ts = sorted(
            int(pd.Timestamp(t).value // 1_000_000)
            for pdf in rows
            for t in pdf[self._ts_col]
        )
        if not ts:
            return iter(())
        closed = []
        if self._sess.exists():
            start, end, n = self._sess.get()
        else:
            start, end, n = ts[0], ts[0], 0
        for t in ts:
            if n > 0 and t - end > self._gap_ms:
                closed.append((start, end, n))
                start, end, n = t, t, 1
            else:
                start, end, n = min(start, t), max(end, t), n + 1
        self._sess.update((start, end, n))
        # materialize before deleting: listTimers() pages lazily from the
        # state server and mutation-during-iteration is unspecified in TWS
        for old in list(self._handle.listTimers()):
            self._handle.deleteTimer(old)
        wm = timerValues.getCurrentWatermarkInMs()
        self._handle.registerTimer(max(end + self._gap_ms, wm + 1))
        return self._emit(key, closed) if closed else iter(())

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ):
        if not self._sess.exists():
            return iter(())
        start, end, n = self._sess.get()
        self._sess.clear()
        return self._emit(key, [(start, end, n)])

    def close(self) -> None:
        pass


def sessionize_v2(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_minutes: int = 30,
) -> DataFrame:
    """``stateful.sessionize`` on transformWithStateInPandas — identical
    closed-session semantics (in-batch gap closes immediately; watermark
    passing end + gap closes by timer; open sessions never emitted;
    state evicted with the emission), with the close-by-time path on an
    explicit registered timer instead of setTimeoutTimestamp. Output:
    key cols + (start_ms, end_ms, n_events) epoch millis. ``stream``
    must carry a watermark on ``ts_col``."""
    from pyspark.sql.types import LongType, StructField, StructType

    key_fields = [stream.schema[k] for k in key_cols]
    out_schema = StructType(
        list(key_fields)
        + [
            StructField("start_ms", LongType()),
            StructField("end_ms", LongType()),
            StructField("n_events", LongType()),
        ]
    )
    return stream.groupBy(*key_cols).transformWithStateInPandas(
        statefulProcessor=_SessionizeProcessor(
            key_cols, ts_col, gap_minutes * 60 * 1000
        ),
        outputStructType=out_schema,
        outputMode="append",
        timeMode="eventTime",
    )


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
