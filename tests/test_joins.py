"""Unit semantics for the temporal/range/skew join operators
(operators/joins.py) on hand-built frames: tie rules, strictness,
emit-exactly-once bucketization, and salted == plain equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreaming_realtime_project_spark.operators.joins import (
    asof_join,
    asof_join_directional,
    asof_join_nearest,
    interval_overlap_join,
    salted_join,
)


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


class TestAsofJoin:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [("a", 10, "L1"), ("a", 20, "L2"), ("b", 5, "L3"), ("c", 9, "L4")],
            "k string, ts long, tag string",
        )
        right = spark.createDataFrame(
            [("a", 10, "r@10"), ("a", 15, "r@15"), ("b", 7, "r@7")],
            "k string, ts long, val string",
        )
        return left, right

    def test_inclusive_picks_latest_at_or_before(self, spark):
        left, right = self._frames(spark)
        out = asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts",
            value_cols=["val"],
        )
        got = {(r.tag, r.val) for r in out.collect()}
        # L1@10 sees r@10 (inclusive); L2@20 sees r@15; b@5 predates r@7;
        # c has no right rows at all -> NULL
        assert got == {("L1", "r@10"), ("L2", "r@15"), ("L3", None), ("L4", None)}

    def test_strict_excludes_equal_ts(self, spark):
        left, right = self._frames(spark)
        out = asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts",
            value_cols=["val"], strict=True,
        )
        got = {(r.tag, r.val) for r in out.collect()}
        # L1@10 must NOT see the equal-ts r@10 under strict
        assert ("L1", None) in got
        assert ("L2", "r@15") in got

    def test_equal_ts_tie_takes_greatest_tiebreak(self, spark):
        left = spark.createDataFrame([("a", 10, "L")], "k string, ts long, tag string")
        right = spark.createDataFrame(
            [("a", 10, 1, "v1"), ("a", 10, 2, "v2"), ("a", 10, 0, "v0")],
            "k string, ts long, ver int, val string",
        )
        out = asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts",
            value_cols=["val"], tiebreak=["ver"],
        )
        assert [r.val for r in out.collect()] == ["v2"]

    def test_left_row_count_preserved(self, spark):
        left, right = self._frames(spark)
        out = asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts",
            value_cols=["val"],
        )
        assert out.count() == left.count()

    def test_null_right_ts_ignored(self, spark):
        left = spark.createDataFrame([("a", 10, "L")], "k string, ts long, tag string")
        right = spark.createDataFrame(
            [("a", None, "ghost"), ("a", 4, "real")],
            "k string, ts long, val string",
        )
        out = asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts",
            value_cols=["val"],
        )
        assert [r.val for r in out.collect()] == ["real"]


class TestIntervalOverlapJoin:
    def test_pairs_emitted_exactly_once_across_buckets(self, spark):
        # Both intervals span MANY buckets (width=10, len=100): a naive
        # bucket join surfaces the pair ~10x; the later-start rule must
        # collapse that to exactly one row without a distinct.
        probe = spark.createDataFrame([("g", 1, 0, 100)], "k string, id int, s long, e long")
        build = spark.createDataFrame([("g", 2, 5, 95)], "k string, id int, s long, e long")
        out = interval_overlap_join(
            probe, build, on=["k"], probe_start="s", probe_end="e",
            build_start="s", build_end="e", bucket_width=10,
        )
        assert out.count() == 1

    def test_non_overlapping_filtered(self, spark):
        probe = spark.createDataFrame([("g", 1, 0, 10)], "k string, id int, s long, e long")
        build = spark.createDataFrame(
            [("g", 2, 11, 20), ("g", 3, 10, 12), ("h", 4, 0, 10)],
            "k string, id int, s long, e long",
        )
        out = interval_overlap_join(
            probe, build, on=["k"], probe_start="s", probe_end="e",
            build_start="s", build_end="e", bucket_width=5,
        )
        # id=3 touches at the inclusive endpoint 10; id=2 starts after;
        # id=4 is another key entirely
        assert [r.b_id for r in out.collect()] == [3]

    def test_matches_theta_join_oracle(self, spark):
        import random

        rng = random.Random(7)
        rows = [
            ("k%d" % rng.randint(0, 2), i, (s := rng.randint(0, 200)), s + rng.randint(0, 40))
            for i, _ in enumerate(range(120))
        ]
        df = spark.createDataFrame(rows, "k string, id int, s long, e long")
        probe = df.filter(F.col("id") % 10 == 0)
        got = interval_overlap_join(
            probe, df, on=["k"], probe_start="s", probe_end="e",
            build_start="s", build_end="e", bucket_width=16,
        ).filter(F.col("p_id") != F.col("b_id"))
        want = (
            probe.selectExpr("k", "id p_id", "s ps", "e pe")
            .join(df.selectExpr("k", "id b_id", "s bs", "e be"), "k")
            .filter("ps <= be AND bs <= pe AND p_id != b_id")
        )
        assert _rows(got, "p_id", "b_id") == _rows(want, "p_id", "b_id")


class TestSaltedJoin:
    def test_inner_equals_plain_join(self, spark):
        left = spark.createDataFrame(
            [(1, "a"), (1, "b"), (2, "c"), (3, "d")], "k int, l string"
        )
        right = spark.createDataFrame([(1, "X"), (2, "Y")], "k int, r string")
        got = salted_join(left, right, on=["k"], salt=4)
        want = left.join(right, "k")
        assert _rows(got, "k", "l", "r") == _rows(want, "k", "l", "r")

    def test_left_outer_preserves_unmatched(self, spark):
        left = spark.createDataFrame([(1, "a"), (9, "z")], "k int, l string")
        right = spark.createDataFrame([(1, "X")], "k int, r string")
        got = salted_join(left, right, on=["k"], salt=3, how="left")
        assert _rows(got, "k", "l", "r") == [(1, "a", "X"), (9, "z", None)]

    def test_rejects_right_join(self, spark):
        left = spark.createDataFrame([(1, "a")], "k int, l string")
        import pytest

        with pytest.raises(ValueError):
            salted_join(left, left, on=["k"], how="right")


class TestAsofDirectional:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [(1, "a", 10), (2, "a", 20), (3, "b", 5), (4, "c", 9)],
            "lid long, k string, ts long",
        )
        right = spark.createDataFrame(
            [("a", 10, "r@10"), ("a", 15, "r@15"), ("a", 26, "r@26"),
             ("b", 7, "r@7")],
            "k string, ts long, val string",
        )
        return left, right

    def test_backward_matches_asof_join(self, spark):
        """direction='backward' must reproduce asof_join exactly."""
        left, right = self._frames(spark)
        a = _rows(
            asof_join(left, right, ["k"], "ts", "ts", ["val"]),
            "lid", "val",
        )
        b = _rows(
            asof_join_directional(
                left, right, ["k"], "ts", "ts", ["val"], direction="backward"
            ),
            "lid", "val",
        )
        assert a == b

    def test_forward_picks_next_at_or_after(self, spark):
        left, right = self._frames(spark)
        out = asof_join_directional(
            left, right, ["k"], "ts", "ts", ["val"],
            direction="forward", match_ts="mts",
        )
        got = {r["lid"]: (r["val"], r["mts"]) for r in out.collect()}
        assert got[1] == ("r@10", 10)   # equal ts visible (inclusive)
        assert got[2] == ("r@26", 26)   # next after 20
        assert got[3] == ("r@7", 7)
        assert got[4] == (None, None)   # no right rows for key c

    def test_tolerance_nulls_far_matches(self, spark):
        left, right = self._frames(spark)
        out = asof_join_directional(
            left, right, ["k"], "ts", "ts", ["val"],
            direction="forward", tolerance=2, match_ts="mts",
        )
        got = {r["lid"]: r["val"] for r in out.collect()}
        assert got[1] == "r@10"   # delta 0 <= 2
        assert got[2] is None     # next is 26, delta 6 > 2
        assert got[3] == "r@7"    # delta 2 <= 2

    def test_matches_pandas_merge_asof(self, spark):
        """Cross-check all three directions against pandas merge_asof on
        a random-ish keyed series (the public reference semantics)."""
        import pandas as pd

        lrows = [(i, f"k{i % 3}", (i * 37) % 100) for i in range(40)]
        # every 5th right value NULL: merge_asof keeps the MATCHED row's
        # NaN — a per-column ignorenulls fold would leak an older row's
        # value instead (the row-atomicity regression)
        rrows = [
            (f"k{j % 3}", (j * 23) % 100, None if j % 5 == 0 else float(j))
            for j in range(30)
        ]
        # pandas merge_asof requires unique sorted keys; drop duplicate
        # (key, ts) right rows to sidestep tie-rule differences
        seen = set()
        rdedup = []
        for k, ts, v in rrows:
            if (k, ts) not in seen:
                seen.add((k, ts))
                rdedup.append((k, ts, v))
        left = spark.createDataFrame(lrows, "lid long, k string, ts long")
        right = spark.createDataFrame(rdedup, "k string, ts long, val double")
        lpd = pd.DataFrame(lrows, columns=["lid", "k", "ts"]).sort_values("ts")
        rpd = pd.DataFrame(rdedup, columns=["k", "ts", "val"]).sort_values("ts")
        for direction in ("backward", "forward"):
            want = pd.merge_asof(
                lpd, rpd, on="ts", by="k", direction=direction, tolerance=15
            ).set_index("lid")["val"]
            out = asof_join_directional(
                left, right, ["k"], "ts", "ts", ["val"],
                direction=direction, tolerance=15,
            )
            got = {r["lid"]: r["val"] for r in out.collect()}
            for lid in got:
                w = want.loc[lid]
                assert (got[lid] is None and pd.isna(w)) or got[lid] == w, (
                    direction, lid, got[lid], w)
        want = pd.merge_asof(
            lpd, rpd, on="ts", by="k", direction="nearest", tolerance=15
        ).set_index("lid")["val"]
        out = asof_join_nearest(
            left, right, ["k"], "lid", "ts", "ts", ["val"], tolerance=15
        )
        got = {r["lid"]: r["val"] for r in out.collect()}
        for lid in got:
            w = want.loc[lid]
            assert (got[lid] is None and pd.isna(w)) or got[lid] == w, (
                "nearest", lid, got[lid], w)

    def test_nearest_tie_prefers_backward(self, spark):
        left = spark.createDataFrame([(1, "a", 10)], "lid long, k string, ts long")
        right = spark.createDataFrame(
            [("a", 8, "early"), ("a", 12, "late")], "k string, ts long, val string"
        )
        out = asof_join_nearest(
            left, right, ["k"], "lid", "ts", "ts", ["val"], match_ts="mts"
        ).collect()
        assert out[0]["val"] == "early" and out[0]["mts"] == 8


class TestAsofNullValueAtomicity:
    """A NULL value on the MATCHED right row must surface as NULL — not
    fall through to an older/farther right row's value (the matched row
    travels as one struct; per-column folds would mix rows)."""

    def test_backward_null_value_stays_null(self, spark):
        left = spark.createDataFrame([("a", 6)], "k string, ts long")
        right = spark.createDataFrame(
            [("a", 1, "old"), ("a", 5, None)], "k string, ts long, val string"
        )
        out = asof_join(left, right, ["k"], "ts", "ts", ["val"]).collect()
        assert out[0]["val"] is None  # matched row ts=5 carries NULL

    def test_forward_null_value_not_leaked_past_tolerance(self, spark):
        left = spark.createDataFrame([("a", 0)], "k string, ts long")
        right = spark.createDataFrame(
            [("a", 5, None), ("a", 100, "far")], "k string, ts long, val string"
        )
        out = asof_join_directional(
            left, right, ["k"], "ts", "ts", ["val"],
            direction="forward", tolerance=10, match_ts="mts",
        ).collect()
        assert out[0]["mts"] == 5
        assert out[0]["val"] is None  # 'far' (ts=100, outside tol) must not leak

    def test_nearest_null_value_row_atomic(self, spark):
        left = spark.createDataFrame([(1, "a", 10)], "lid long, k string, ts long")
        right = spark.createDataFrame(
            [("a", 9, None), ("a", 30, "later")], "k string, ts long, val string"
        )
        out = asof_join_nearest(
            left, right, ["k"], "lid", "ts", "ts", ["val"], match_ts="mts"
        ).collect()
        assert out[0]["mts"] == 9 and out[0]["val"] is None
