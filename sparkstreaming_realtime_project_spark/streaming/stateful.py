"""Custom stateful streaming operators via applyInPandasWithState.

The reference's only hand-rolled state machines are the Redis dedup set
(DwdDauApp.scala:87-135, O1) and the 24 h join buffers — both covered by
built-ins (dropDuplicatesWithinWatermark, stream-stream join). This
module carries the EXTENSION surface for semantics the built-ins can't
express: arbitrary per-key state with explicit TTL, Arrow-batched.

Scale: state lives in Spark's state store partitioned by key (same
placement as the built-in dedup); one Arrow batch of a key's rows per
trigger flows through Python. Event-time timeouts bound state exactly
like the reference's Redis EXPIRE.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import DoubleType, LongType, StructField, StructType


def first_seen_per_key(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    ttl_hours: int = 25,
) -> DataFrame:
    """O1 as a CUSTOM stateful operator: emit the earliest-timestamped row
    per key, drop every later duplicate, evict state ``ttl_hours`` after
    the first event (the Redis ``SADD DAU:<date>`` + intended 24 h expiry,
    DwdDauApp.scala:110-135).

    Differences from dropDuplicatesWithinWatermark: the winner is the
    min-event-time row WITHIN each trigger (not an arbitrary row), and
    the TTL is an explicit event-time timeout rather than the watermark
    delay — the shape to copy for any bespoke per-key state machine.

    ACROSS triggers the first-arriving trigger's winner stands: once a
    key has state, later rows are dropped even if an earlier-timestamped
    row arrives in a later trigger (the ``state.exists`` short-circuit
    below — identical to the reference's SADD-then-check, which also
    keeps whichever event reached Redis first). A true global event-time
    min would have to buffer every key until its watermark expired,
    delaying all output by the full lateness bound; for dedup semantics
    the first-arrival winner is the right trade.

    ``stream`` must already carry a watermark on ``ts_col`` (event-time
    timeouts require one).
    """
    out_schema = stream.schema
    state_schema = StructType([StructField("first_ts_ms", LongType())])
    ts_idx = [f.name for f in out_schema.fields].index(ts_col)
    _ = ts_idx  # ts resolved by name below; index kept for clarity

    def fn(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return iter(())
        first = None
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            cand = pdf.sort_values(ts_col).head(1)
            if first is None or cand[ts_col].iloc[0] < first[ts_col].iloc[0]:
                first = cand
        if first is None or state.exists:
            return iter(())
        first_ts_ms = int(pd.Timestamp(first[ts_col].iloc[0]).value // 1_000_000)
        state.update((first_ts_ms,))
        state.setTimeoutTimestamp(first_ts_ms + ttl_hours * 3600 * 1000)
        return iter((first,))

    return stream.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def quota_per_key(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    quota: int,
    ttl_hours: int = 24,
) -> DataFrame:
    """Admit at most ``quota`` rows per key per TTL window — the ingest
    throttle of a continuously-fed training pipeline (cap documents per
    source/domain so one crawler dump can't flood a day's corpus; the
    per-key cap is the streaming analog of the batch df/bucket caps in
    the dedup operators).

    State is one counter per key, created at the first admitted row and
    evicted ``ttl_hours`` after that row's EVENT time — so the quota
    window is anchored to the data's clock, not the wall clock, and a
    replay admits exactly the same rows. Admission within a trigger is
    deterministic: rows sort by (ts, remaining columns' repr) and the
    first ``quota - used`` pass. Rows after the cap are DROPPED, not
    buffered — a quota, not a rate limiter.

    ``stream`` must already carry a watermark on ``ts_col``."""
    out_schema = stream.schema
    state_schema = StructType(
        [
            StructField("admitted", LongType()),
            StructField("first_ts_ms", LongType()),
        ]
    )

    def fn(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return iter(())
        rows = [pdf for pdf in pdf_iter if len(pdf)]
        if not rows:
            return iter(())
        batch = pd.concat(rows).sort_values(
            [ts_col] + [c for c in rows[0].columns if c != ts_col]
        )
        used, first_ts_ms = state.get if state.exists else (0, None)
        room = quota - used
        if room <= 0:
            return iter(())
        admit = batch.head(room)
        if first_ts_ms is None:
            first_ts_ms = int(
                pd.Timestamp(admit[ts_col].iloc[0]).value // 1_000_000
            )
        state.update((used + len(admit), first_ts_ms))
        # re-arm on every invocation with the SAME anchor: the eviction
        # point never moves, but relying on a previously-set timeout
        # surviving an update is GroupState-implementation trivia.
        state.setTimeoutTimestamp(first_ts_ms + ttl_hours * 3600 * 1000)
        return iter((admit,))

    return stream.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def sessionize(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization with CLOSED-session emission — the
    streaming twin of the batch ``session_window`` entry
    (o_session_window), expressed as an explicit per-key state machine
    so the close condition is visible and extensible (built-in session
    windows can't, e.g., cap session length or carry custom per-session
    aggregates).

    Semantics: per key, events closer than ``gap_minutes`` chain into
    one session. A session is emitted EXACTLY when it closes:
    - in-trigger, when a later event arrives more than the gap after the
      running session's end (the close is decided by data), or
    - by event-time timeout, when the watermark passes session_end + gap
      (the close is decided by time passing — state is evicted with the
      emission, so idle keys hold no state).
    Sessions still open at end-of-stream are never emitted (append-mode
    contract). Out-of-order events within the watermark merge into the
    running session (start/end expand to cover them); events older than
    the watermark are dropped by Spark before reaching the operator.

    Output: key cols + (start_ms, end_ms, n_events) as epoch millis —
    stable across engines/timezones, per the repo's no-raw-timestamp
    output rule.

    Scale: state is 3 longs per OPEN session (bounded by active keys,
    not history); sessions close and evict as the watermark advances.
    ``stream`` must already carry a watermark on ``ts_col``.
    """
    gap_ms = gap_minutes * 60 * 1000
    key_fields = [stream.schema[k] for k in key_cols]
    out_schema = StructType(
        list(key_fields)
        + [
            StructField("start_ms", LongType()),
            StructField("end_ms", LongType()),
            StructField("n_events", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("start_ms", LongType()),
            StructField("end_ms", LongType()),
            StructField("n", LongType()),
        ]
    )
    out_cols = [f.name for f in out_schema.fields]

    def fn(key, pdf_iter, state: GroupState):
        def emit(rows):
            return iter(
                (pd.DataFrame([list(key) + list(r) for r in rows],
                              columns=out_cols),)
            )

        if state.hasTimedOut:
            start, end, n = state.get
            state.remove()
            return emit([(start, end, n)])
        ts = sorted(
            int(pd.Timestamp(t).value // 1_000_000)
            for pdf in pdf_iter
            for t in pdf[ts_col]
        )
        if not ts:
            return iter(())
        closed = []
        if state.exists:
            start, end, n = state.get
        else:
            start, end, n = ts[0], ts[0], 0
        for t in ts:
            if n > 0 and t - end > gap_ms:
                closed.append((start, end, n))
                start, end, n = t, t, 1
            else:
                start, end, n = min(start, t), max(end, t), n + 1
        state.update((start, end, n))
        # the timeout must sit beyond the current watermark; a session
        # already older than the watermark closes at the next possible tick
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(end + gap_ms, wm + 1))
        return emit(closed) if closed else iter(())

    return stream.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def topk_per_group(
    stream: DataFrame,
    group_col: str,
    key_col: str,
    ts_col: str,
    k: int = 3,
    max_tracked: int = 64,
    ttl_hours: int = 25,
) -> DataFrame:
    """Streaming heavy hitters: per group, maintain a bounded counter
    table over ``key_col`` and emit the current top-``k`` (with a
    monotone ``seq`` so consumers can select the latest snapshot) after
    every trigger that touches the group — the continuously-updated
    "top sources / top skus" board the reference serves from ES with a
    terms aggregation, expressed as an incremental operator.

    Approximation contract (space-saving style): the table holds at most
    ``max_tracked`` counters; when new keys overflow it, only the
    ``max_tracked`` largest survive the trigger. Counts are EXACT while
    a group's distinct keys fit in ``max_tracked`` (size it ~10x k);
    beyond that, a key that re-enters after eviction restarts from its
    batch count, so tail counts under-estimate — the standard bounded-
    memory trade, never unbounded state.

    State is (keys, counts, seq) arrays partitioned by group in the
    state store; eviction is an event-time timeout ``ttl_hours`` after
    the latest seen event, so dead groups cost nothing. ``stream`` must
    already carry a watermark on ``ts_col``. Emission order within a
    snapshot is deterministic: (-count, key).
    """
    from pyspark.sql.types import ArrayType, IntegerType, StringType

    gf = next(f for f in stream.schema.fields if f.name == group_col)
    out_schema = StructType(
        [
            StructField(group_col, gf.dataType),
            StructField("seq", LongType()),
            StructField("rank", IntegerType()),
            StructField("key", StringType()),
            StructField("est_count", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("keys", ArrayType(StringType())),
            StructField("counts", ArrayType(LongType())),
            StructField("seq", LongType()),
        ]
    )

    def fn(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return iter(())
        group_val = key[0]
        counts: dict[str, int] = {}
        seq = 0
        if state.exists:
            ks, cs, seq = state.get
            counts = dict(zip(ks, cs))
        max_ts_ms = None
        saw = False
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            saw = True
            for kk, c in pdf[key_col].astype(str).value_counts().items():
                counts[kk] = counts.get(kk, 0) + int(c)
            bt = int(pd.Timestamp(pdf[ts_col].max()).value // 1_000_000)
            max_ts_ms = bt if max_ts_ms is None else max(max_ts_ms, bt)
        if not saw:
            return iter(())
        ranked = sorted(counts.items(), key=lambda it: (-it[1], it[0]))
        kept = ranked[:max_tracked]
        seq += 1
        state.update(([kk for kk, _ in kept], [c for _, c in kept], seq))
        state.setTimeoutTimestamp(max_ts_ms + ttl_hours * 3600 * 1000)
        top = kept[:k]
        return iter(
            (
                pd.DataFrame(
                    {
                        group_col: [group_val] * len(top),
                        "seq": [seq] * len(top),
                        "rank": list(range(1, len(top) + 1)),
                        "key": [kk for kk, _ in top],
                        "est_count": [c for _, c in top],
                    }
                ),
            )
        )

    return stream.groupBy(group_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def zscore_per_key(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    min_n: int = 5,
    ttl_hours: int = 24,
) -> DataFrame:
    """Streaming per-key anomaly scoring: each row's ``value`` is scored
    against the key's RUNNING history — z = (x - mean) / sample_std of
    everything scored before it — then folded into the state (Welford's
    online update: one (n, mean, M2) triple per key, numerically stable,
    never a buffer of values). The streaming analog of the batch
    x_anomaly_zscore entry, for the live side: drift alarms on ingest
    volume, metric spikes per device, quality-score shifts per source.

    Semantics: z is NULL until the key has ``min_n`` prior observations
    (and when the prior std is 0) — a cold key cannot be anomalous.
    Within a trigger rows are scored sequentially in (ts, repr) order,
    so each sees everything earlier in the batch; ACROSS triggers
    arrival order is fold order (a late row replayed into a later
    trigger scores against more history than its event time implies —
    the first_seen_per_key caveat, inherent to single-pass streaming).

    State is evicted ``ttl_hours`` after the latest folded EVENT time
    (sliding idle timeout — an active key's history persists, an idle
    key's is dropped). ``stream`` must already carry a watermark on
    ``ts_col``."""
    import math

    keys_schema = [stream.schema[c] for c in key_cols]
    out_schema = StructType(
        keys_schema
        + [
            stream.schema[ts_col],
            stream.schema[value_col],
            StructField("n_prior", LongType()),
            StructField("z", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("mean", DoubleType()),
            StructField("m2", DoubleType()),
            StructField("last_ms", LongType()),
        ]
    )

    def fn(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return iter(())
        rows = [pdf for pdf in pdf_iter if len(pdf)]
        if not rows:
            return iter(())
        batch = pd.concat(rows).sort_values(
            [ts_col] + [c for c in rows[0].columns if c != ts_col]
        )
        n, mean, m2, last_ms = (
            state.get if state.exists else (0, 0.0, 0.0, 0)
        )
        out_n, out_z = [], []
        for x in batch[value_col]:
            x = float(x)
            # a non-finite value (upstream parse failure -> NaN) is
            # scored NULL and NOT folded — one bad row must not poison
            # the key's moments into permanent NaN
            if not math.isfinite(x):
                out_n.append(n)
                out_z.append(None)
                continue
            if n >= min_n and n >= 2:
                sd = math.sqrt(m2 / (n - 1))
                out_z.append((x - mean) / sd if sd > 0 else None)
            else:
                out_z.append(None)
            out_n.append(n)
            n += 1
            d = x - mean
            mean += d / n
            m2 += d * (x - mean)
        out = batch[[*key_cols, ts_col, value_col]].copy()
        out["n_prior"] = pd.Series(out_n, index=batch.index, dtype="int64")
        out["z"] = pd.Series(out_z, index=batch.index, dtype="float64")
        # TTL anchors to the MAX event time ever folded — a late row in
        # a later trigger must not regress the eviction deadline
        batch_ms = int(pd.Timestamp(batch[ts_col].iloc[-1]).value // 1_000_000)
        last_ms = max(int(last_ms), batch_ms)
        state.update((n, mean, m2, last_ms))
        state.setTimeoutTimestamp(last_ms + ttl_hours * 3600 * 1000)
        return iter((out,))

    return stream.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
