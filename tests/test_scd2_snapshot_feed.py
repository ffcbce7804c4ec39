"""End-to-end CDC-from-snapshots: daily dim snapshots diffed into a
changefeed (operators.cdc.snapshot_diff), the feed applied batch-by-
batch to the incremental SCD2 store (streaming.scd2.scd2_apply_batch),
and the resulting history checked interval-by-interval — the backfill
shape the reference's OdsBaseDbApp implies (a source that can't emit
real CDC ships snapshots; diffing recovers the binlog) but never
finishes. Deletes ride as a tombstone value, the standard SCD2
encoding for a key leaving the dimension.

Also replays a batch (idempotence: a restarted batch overwrites itself
and the history is unchanged) — the K6/crash-recovery discipline.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sparkstreaming_realtime_project_spark.operators.cdc import snapshot_diff
from sparkstreaming_realtime_project_spark.streaming.scd2 import (
    read_scd2,
    scd2_apply_batch,
)

TOMBSTONE = "__DELETED__"


def _ts(day: int) -> dt.datetime:
    return dt.datetime(2024, 1, day, tzinfo=dt.timezone.utc)


def _us(day: int) -> int:
    return int(_ts(day).timestamp() * 1_000_000)


def _snapshot(spark, rows):
    return spark.createDataFrame(rows, "id string, v string")


def _feed(spark, old, new, day):
    """snapshot diff -> SCD2 change rows (key, value, ts, ord):
    I/U carry the new value, D carries the tombstone."""
    diff = snapshot_diff(old, new, ["id"], ["v"])
    return diff.select(
        F.col("id").alias("key"),
        F.when(F.col("op") == "D", F.lit(TOMBSTONE))
        .otherwise(F.col("new_v"))
        .alias("value"),
        F.lit(_ts(day)).alias("ts"),
        F.lit(0).alias("ord"),
    )


def test_snapshot_feed_builds_scd2_history(spark, tmp_path):
    store = str(tmp_path / "scd2_store")
    empty = _snapshot(spark, [])
    day1 = _snapshot(spark, [("a", "1"), ("b", "1"), ("c", "1")])
    day2 = _snapshot(spark, [("a", "2"), ("b", "1"), ("d", "1")])
    day3 = _snapshot(spark, [("a", "2"), ("b", "2"), ("d", "1")])

    snaps = [empty, day1, day2, day3]
    for i in range(3):
        scd2_apply_batch(
            _feed(spark, snaps[i], snaps[i + 1], i + 1),
            i,
            store,
            "key",
            "value",
            "ts",
            "ord",
        )

    hist = {
        (r["key"], r["valid_from_us"]): r
        for r in read_scd2(spark, store).collect()
    }
    # a: 1 over [d1, d2), then 2 current
    assert hist[("a", _us(1))]["value"] == "1"
    assert hist[("a", _us(1))]["valid_to_us"] == _us(2)
    assert hist[("a", _us(2))]["value"] == "2"
    assert hist[("a", _us(2))]["is_current"] == 1
    # b: 1 over [d1, d3), then 2 current
    assert hist[("b", _us(1))]["valid_to_us"] == _us(3)
    assert hist[("b", _us(3))]["value"] == "2"
    # c: 1 over [d1, d2), tombstone current from d2
    assert hist[("c", _us(1))]["valid_to_us"] == _us(2)
    assert hist[("c", _us(2))]["value"] == TOMBSTONE
    assert hist[("c", _us(2))]["is_current"] == 1
    # d: inserted d2, current, no earlier run
    assert hist[("d", _us(2))]["is_current"] == 1
    assert ("d", _us(1)) not in hist
    assert len(hist) == 7

    # applying the feed derived from identical snapshots adds nothing:
    # every key's diff is empty, the batch is a no-op
    scd2_apply_batch(
        _feed(spark, day3, day3, 4), 3, store, "key", "value", "ts", "ord"
    )
    again = {
        (r["key"], r["valid_from_us"]): r["value"]
        for r in read_scd2(spark, store).collect()
    }
    assert again == {k: v["value"] for k, v in hist.items()}


def test_snapshot_feed_batch_replay_idempotent(spark, tmp_path):
    store = str(tmp_path / "scd2_replay")
    empty = _snapshot(spark, [])
    day1 = _snapshot(spark, [("a", "1"), ("b", "1")])
    day2 = _snapshot(spark, [("a", "2")])

    f1 = _feed(spark, empty, day1, 1)
    f2 = _feed(spark, day1, day2, 2)
    scd2_apply_batch(f1, 0, store, "key", "value", "ts", "ord")
    scd2_apply_batch(f2, 1, store, "key", "value", "ts", "ord")
    before = sorted(map(tuple, read_scd2(spark, store).collect()))

    # a restarted batch 1 overwrites its own directory; the visible
    # history is unchanged
    scd2_apply_batch(f2, 1, store, "key", "value", "ts", "ord")
    after = sorted(map(tuple, read_scd2(spark, store).collect()))
    assert after == before
    # and the content is right: a flipped to 2, b deleted at d2
    vals = {
        (r["key"], r["valid_from_us"]): r["value"]
        for r in read_scd2(spark, store).collect()
    }
    assert vals[("a", _us(2))] == "2"
    assert vals[("b", _us(2))] == TOMBSTONE
