"""Tests for the round-7 tail: ordered.py (interval union, skyline,
EWMA, Markov), linkage.py, cdc.merge_changelog/snapshot_diff,
validate.l_diversity_report, graph.jaccard_link_prediction.

Each hand-computed case doubles as a regression for the round-7 ADVICE
bugs: interval_union must work with arbitrary caller column names (it
previously resolved the window against pre-rename names), skyline_2d
must work when the cost column is literally named "cost" (previously
AMBIGUOUS_REFERENCE), and linkage_pairs must score NULL comparisons as
0 (Fellegi-Sunter missing-field convention) with a NULL agree flag.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sparkstreaming_realtime_project_spark.operators.cdc import (
    merge_changelog,
    snapshot_diff,
)
from sparkstreaming_realtime_project_spark.operators.graph import (
    jaccard_link_prediction,
)
from sparkstreaming_realtime_project_spark.operators.linkage import (
    linkage_pairs,
)
from sparkstreaming_realtime_project_spark.operators.ordered import (
    ewma_deviation,
    interval_union,
    markov_transitions,
    skyline_2d,
)
from sparkstreaming_realtime_project_spark.operators.validate import (
    l_diversity_report,
)


def _d(s: str) -> dt.date:
    return dt.date.fromisoformat(s)


# ---------------------------------------------------------------- ordered


def test_interval_union_hand_computed(spark):
    # Arbitrary caller column names (ADVICE regression: the window used
    # to reference pre-rename names and failed at analysis time).
    df = spark.createDataFrame(
        [
            ("u1", _d("2024-01-01"), _d("2024-01-03")),
            ("u1", _d("2024-01-03"), _d("2024-01-05")),  # touches -> merges
            ("u1", _d("2024-01-07"), _d("2024-01-07")),
            ("u2", _d("2024-01-01"), _d("2024-01-02")),
            ("u2", _d("2024-01-03"), _d("2024-01-04")),  # adjacent day: NEW
        ],
        "user_id string, start_d date, end_d date",
    )
    rows = {
        r["user_id"]: r
        for r in interval_union(df, "user_id", "start_d", "end_d").collect()
    }
    assert rows["u1"]["n_intervals"] == 3
    assert rows["u1"]["n_islands"] == 2
    assert rows["u1"]["covered_days"] == 6  # 5 + 1
    assert rows["u1"]["longest_island_days"] == 5
    assert rows["u2"]["n_islands"] == 2
    assert rows["u2"]["covered_days"] == 4


def test_interval_union_internal_names_ok(spark):
    # Columns literally named key/s/e must not collide with internals.
    df = spark.createDataFrame(
        [("k", _d("2024-02-01"), _d("2024-02-02"))],
        "key string, s date, e date",
    )
    out = interval_union(df, "key", "s", "e").collect()
    assert len(out) == 1 and out[0]["covered_days"] == 2


def test_skyline_2d_hand_computed(spark):
    # cost column literally named "cost" (ADVICE regression:
    # AMBIGUOUS_REFERENCE against the frontier frame's internal alias).
    df = spark.createDataFrame(
        [
            ("a", 1, 5),
            ("a2", 1, 5),  # full tie with "a": both survive
            ("b", 2, 7),
            ("c", 2, 6),  # dominated by b (same cost, less gain)
            ("d", 3, 7),  # dominated by b (more cost, same gain)
        ],
        "item string, cost int, gain int",
    )
    kept = sorted(r["item"] for r in skyline_2d(df, "cost", "gain").collect())
    assert kept == ["a", "a2", "b"]


def test_skyline_matches_naive_dominance_antijoin(spark, sf_dir):
    from sparkstreaming_realtime_project_spark.sources.batch import load_table

    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    fast = skyline_2d(part, "p_retailprice", "p_size")
    o = part.select(
        F.col("p_retailprice").alias("oc"), F.col("p_size").alias("og")
    )
    naive = part.join(
        o,
        (F.col("oc") <= F.col("p_retailprice"))
        & (F.col("og") >= F.col("p_size"))
        & (
            (F.col("oc") < F.col("p_retailprice"))
            | (F.col("og") > F.col("p_size"))
        ),
        "left_anti",
    )
    got = sorted(r["p_partkey"] for r in fast.collect())
    want = sorted(r["p_partkey"] for r in naive.collect())
    assert got == want and len(got) > 0


def test_ewma_deviation_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 4.0)], "t int, v double"
    )
    rows = {
        r["t"]: r
        for r in ewma_deviation(df, "t", "v", alpha=0.5, k=8).collect()
    }
    assert 1 not in rows  # series head: no previous observation
    assert rows[2]["ewma"] == 1.0 and rows[2]["deviation"] == 1.0
    # lags [2,1]: (0.5*2 + 0.25*1) / 0.75 = 1.666... -> 1.6667
    assert rows[3]["ewma"] == 1.6667
    assert rows[3]["deviation"] == 2.3333


def test_ewma_keyed_partitions_independent(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("b", 1, 5.0), ("b", 2, 7.0)],
        "k string, t int, v double",
    )
    rows = {
        (r["k"], r["t"]): r
        for r in ewma_deviation(df, "t", "v", key_col="k").collect()
    }
    assert set(rows) == {("a", 2), ("b", 2)}
    assert rows[("a", 2)]["ewma"] == 10.0
    assert rows[("b", 2)]["deviation"] == 2.0


def test_markov_transitions_hand_computed(spark):
    df = spark.createDataFrame(
        [
            (1, 1, "A"), (1, 2, "B"), (1, 3, "A"), (1, 4, "B"),
            (2, 1, "A"), (2, 2, "A"),
        ],
        "uid int, ts int, ev string",
    )
    out = {
        (r["from_state"], r["to_state"]): r
        for r in markov_transitions(df, "uid", ["ts"], "ev").collect()
    }
    assert out[("A", "B")]["n"] == 2
    assert out[("A", "A")]["n"] == 1
    assert out[("B", "A")]["n"] == 1
    assert out[("A", "B")]["p"] == 0.666667
    assert out[("A", "A")]["p"] == 0.333333
    assert out[("B", "A")]["p"] == 1.0


# ---------------------------------------------------------------- linkage


def test_linkage_pairs_blocked_and_scored(spark):
    df = spark.createDataFrame(
        [
            (1, "b1", "smith", "NY"),
            (2, "b1", "smith", "LA"),
            (3, "b1", "jones", "NY"),
            (4, "b2", "smith", "NY"),  # other block: never paired with 1-3
        ],
        "rid int, blk string, name string, city string",
    )
    out = linkage_pairs(
        df,
        "rid",
        ["blk"],
        [
            ("name", F.col("a_name") == F.col("b_name"), 4, 2),
            ("city", F.col("a_city") == F.col("b_city"), 3, 1),
        ],
        threshold=-100,
    )
    rows = {(r["id_a"], r["id_b"]): r for r in out.collect()}
    # (1,2): name agrees (+4), city disagrees (-1) -> 3
    assert rows[(1, 2)]["score"] == 3
    assert rows[(1, 2)]["agree_name"] == 1
    assert rows[(1, 2)]["agree_city"] == 0
    # (1,3): name -2, city +3 -> 1 ; (2,3): -2 -1 -> -3
    assert rows[(1, 3)]["score"] == 1
    assert rows[(2, 3)]["score"] == -3
    # cross-block pairs never materialize; id_a < id_b always
    assert all(a < b for (a, b) in rows)
    assert set(rows) == {(1, 2), (1, 3), (2, 3)}


def test_linkage_pairs_null_comparison_scores_zero(spark):
    # ADVICE regression: a NULL predicate must contribute weight 0
    # (not the full disagree weight) and emit a NULL flag.
    df = spark.createDataFrame(
        [(1, "b", None, "NY"), (2, "b", "smith", "NY")],
        "rid int, blk string, name string, city string",
    )
    out = linkage_pairs(
        df,
        "rid",
        ["blk"],
        [
            ("name", F.col("a_name") == F.col("b_name"), 4, 2),
            ("city", F.col("a_city") == F.col("b_city"), 3, 1),
        ],
        threshold=0,
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["score"] == 3  # 0 (missing name) + 3 (city agrees)
    assert r["agree_name"] is None
    assert r["agree_city"] == 1


# ------------------------------------------------------------- changelog


def test_merge_changelog_last_wins_and_delete(spark):
    df = spark.createDataFrame(
        [
            ("k1", 1, "I", 1, "x"),
            ("k1", 2, "U", 5, "y"),
            ("k2", 1, "I", 9, "z"),
            ("k2", 2, "D", 0, ""),
        ],
        "k string, seq int, op string, v int, s string",
    )
    out = merge_changelog(df, "k", ["seq"], "op", "D", ["v", "s"]).collect()
    assert len(out) == 1
    assert out[0]["k"] == "k1" and out[0]["v"] == 5 and out[0]["s"] == "y"


def test_snapshot_diff_classifies_ops(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id int, v string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "x"), (4, "d")], "id int, v string"
    )
    rows = {
        r["id"]: r for r in snapshot_diff(old, new, ["id"], ["v"]).collect()
    }
    assert rows[1]["op"] == "D" and rows[1]["old_v"] == "a"
    assert rows[3]["op"] == "U" and rows[3]["new_v"] == "x"
    assert rows[4]["op"] == "I" and rows[4]["new_v"] == "d"
    assert 2 not in rows  # unchanged key drops out


def test_snapshot_diff_then_merge_reproduces_new_state(spark):
    # Round-trip: applying the diff changefeed over the old snapshot
    # (as a changelog) converges to the new snapshot.
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id int, v string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "x"), (4, "d")], "id int, v string"
    )
    feed = snapshot_diff(old, new, ["id"], ["v"]).select(
        "id", "op", F.coalesce("new_v", "old_v").alias("v")
    )
    base = old.select("id", F.lit("I").alias("op"), "v").withColumn(
        "seq", F.lit(0)
    )
    log = base.unionByName(feed.withColumn("seq", F.lit(1)))
    state = merge_changelog(log, "id", ["seq"], "op", "D", ["v"])
    got = sorted((r["id"], r["v"]) for r in state.collect())
    want = sorted((r["id"], r["v"]) for r in new.collect())
    assert got == want


# ------------------------------------------------------------- validate


def test_l_diversity_hand_computed(spark):
    df = spark.createDataFrame(
        [("g1", "x"), ("g1", "x"), ("g1", "x"), ("g2", "x"), ("g2", "y")],
        "q string, s string",
    )
    rows = {
        r["q"]: r
        for r in l_diversity_report(df, ["q"], "s", l=2).collect()
    }
    assert rows["g1"]["n"] == 3
    assert rows["g1"]["n_sensitive"] == 1 and rows["g1"]["at_risk"] == 1
    assert rows["g2"]["n_sensitive"] == 2 and rows["g2"]["at_risk"] == 0


# ------------------------------------------------------------ link pred


def test_jaccard_link_prediction_square(spark):
    # 4-cycle 1-2-3-4-1: the two diagonals are the only distance-2
    # non-edges; each shares both neighbors -> jacc = 2/(2+2-2) = 1.0.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src int, dst int"
    )
    rows = {
        (r["node_x"], r["node_y"]): r
        for r in jaccard_link_prediction(edges, min_common=2).collect()
    }
    assert set(rows) == {(1, 3), (2, 4)}
    assert rows[(1, 3)]["common"] == 2 and rows[(1, 3)]["jacc"] == 1.0


def test_jaccard_link_prediction_excludes_existing_edges(spark):
    # triangle + pendant: 1-2,2-3,1-3,3-4. Pair (1,4) and (2,4) share
    # neighbor 3 (common=1); pair (1,2) is an existing edge and must
    # not appear even though it has a common neighbor.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src int, dst int"
    )
    rows = {
        (r["node_x"], r["node_y"]): r
        for r in jaccard_link_prediction(edges, min_common=1).collect()
    }
    assert set(rows) == {(1, 4), (2, 4)}
    # deg(1)=2, deg(4)=1, common=1 -> 1/(2+1-1) = 0.5
    assert rows[(1, 4)]["jacc"] == 0.5


def test_jaccard_link_prediction_degree_join_broadcasts(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src int, dst int")
    plan = jaccard_link_prediction(edges)._jdf.queryExecution().toString()
    assert "BroadcastHashJoin" in plan or "broadcast" in plan.lower()


def test_linkage_em_learns_m_u_and_matches_numpy_replica(spark):
    import math

    # two obvious duplicate clusters (all features agree) in a sea of
    # non-matches (features mostly disagree)
    rows = []
    rid = 0
    for blk in range(6):
        for i in range(4):
            # cluster member: identical name/city within the block
            rows.append((rid, f"b{blk}", "dup", "X"))
            rid += 1
        for i in range(6):
            rows.append((rid, f"b{blk}", f"n{rid}", f"C{rid % 3}"))
            rid += 1
    df = spark.createDataFrame(rows, "rid int, blk string, name string, city string")
    from sparkstreaming_realtime_project_spark.operators.linkage import (
        linkage_em,
        linkage_pairs,
    )

    feats = [
        ("name", F.col("a_name") == F.col("b_name"), 1, 1),
        ("city", F.col("a_city") == F.col("b_city"), 1, 1),
    ]
    pairs = linkage_pairs(df, "rid", ["blk"], feats, threshold=-100)
    out = {
        r["feature"]: r
        for r in linkage_em(pairs, ["agree_name", "agree_city"]).collect()
    }
    # matches agree on both features; the learned m must exceed u
    assert out["agree_name"]["m"] > out["agree_name"]["u"]
    assert out["agree_city"]["m"] > out["agree_city"]["u"]
    assert out["agree_name"]["w_agree"] > 1.0

    # exact numpy replica of the fixed-point EM (same grid, same op
    # order) over the same pattern counts must agree to the last bit
    pat = (
        pairs.groupBy(
            F.col("agree_name").cast("int").alias("g0"),
            F.col("agree_city").cast("int").alias("g1"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
        .collect()
    )
    p, ms, us = 0.125, [0.75, 0.75], [0.25, 0.25]
    for _ in range(2):
        rn = sn = nn = 0.0
        rg = [0.0, 0.0]
        sg = [0.0, 0.0]
        for row in pat:
            pm, pu = p, 1.0 - p
            for j in range(2):
                g = row[f"g{j}"] == 1
                pm = pm * (ms[j] if g else 1.0 - ms[j])
                pu = pu * (us[j] if g else 1.0 - us[j])
            r = math.floor(pm / (pm + pu) * 4096.0 + 0.5) / 4096.0
            n = row["n"]
            rn += n * r
            sn += (1.0 - r) * n
            nn += n
            for j in range(2):
                g = row[f"g{j}"]
                rg[j] += n * r * g
                sg[j] += (1.0 - r) * n * g
        p = rn / nn
        ms = [rg[j] / rn for j in range(2)]
        us = [sg[j] / sn for j in range(2)]

    def _r(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    for j, name in enumerate(["agree_name", "agree_city"]):
        assert out[name]["m"] == _r(ms[j])
        assert out[name]["u"] == _r(us[j])
        assert out[name]["w_agree"] == _r(ms[j] / us[j])
        assert out[name]["w_disagree"] == _r((1.0 - ms[j]) / (1.0 - us[j]))


def test_t_closeness_hand_computed(spark):
    from sparkstreaming_realtime_project_spark.operators.validate import (
        t_closeness_report,
    )

    df = spark.createDataFrame(
        [("A", "x"), ("A", "x"), ("A", "x"), ("A", "y"), ("B", "x"), ("B", "y")],
        "q string, s string",
    )
    rows = {
        r["q"]: r
        for r in t_closeness_report(df, ["q"], "s", t_num=1, t_den=10).collect()
    }
    # global: p(x)=4/6, p(y)=2/6
    # A: (3/4, 1/4) -> EMD = 1/2*(1/12 + 1/12) = 1/12
    assert rows["A"]["emd"] == 0.083333
    assert rows["A"]["at_risk"] == 0  # 1/12 < 1/10, exactly via integers
    # B: (1/2, 1/2) -> EMD = 1/6 > 1/10
    assert rows["B"]["emd"] == 0.166667
    assert rows["B"]["at_risk"] == 1
    assert rows["A"]["n"] == 4 and rows["B"]["n"] == 2


def test_cluster_split_no_cross_split_leakage(spark, sf_dir):
    from pyspark.sql import functions as F2
    from sparkstreaming_realtime_project_spark.plans.catalog import (
        x_cluster_split,
    )

    out = x_cluster_split(spark, sf_dir)
    # every near-dup cluster must live entirely inside ONE split
    per_cluster = out.groupBy("cluster_id").agg(
        F2.countDistinct("split").alias("k")
    )
    assert per_cluster.filter(F2.col("k") > 1).count() == 0
    # and all three splits exist over the corpus (clusters are many)
    assert out.select("split").distinct().count() == 3


def test_shard_manifest_detects_mutation_and_is_order_free(spark):
    from sparkstreaming_realtime_project_spark.operators.corpus import (
        shard_manifest,
    )

    rows = [(i, f"text {i}", "en") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    base = {
        r["shard"]: (r["n_rows"], r["fingerprint"])
        for r in shard_manifest(df, "doc_id", ["text", "lang"], 4).collect()
    }
    assert sum(n for n, _ in base.values()) == 200

    # row order / partitioning never changes the manifest
    shuffled = df.orderBy(F.col("text").desc()).repartition(7)
    again = {
        r["shard"]: (r["n_rows"], r["fingerprint"])
        for r in shard_manifest(shuffled, "doc_id", ["text", "lang"], 4).collect()
    }
    assert again == base

    # a single mutated byte flips exactly that shard's fingerprint
    mutated = df.withColumn(
        "text",
        F.when(F.col("doc_id") == 7, F.lit("text 7!")).otherwise(F.col("text")),
    )
    mut = {
        r["shard"]: (r["n_rows"], r["fingerprint"])
        for r in shard_manifest(mutated, "doc_id", ["text", "lang"], 4).collect()
    }
    diff = [s for s in base if mut[s] != base[s]]
    assert len(diff) == 1
    assert mut[diff[0]][0] == base[diff[0]][0]  # same row count, new print

    # a dropped row flips count AND fingerprint of its shard only
    dropped = df.filter(F.col("doc_id") != 7)
    drp = {
        r["shard"]: (r["n_rows"], r["fingerprint"])
        for r in shard_manifest(dropped, "doc_id", ["text", "lang"], 4).collect()
    }
    diff2 = [s for s in base if drp[s] != base[s]]
    assert len(diff2) == 1 and drp[diff2[0]][0] == base[diff2[0]][0] - 1


def test_jaccard_link_prediction_center_degree_cap(spark):
    # star hub 0 -- {1..6} plus chain 1-2, 2-3: without a cap the hub
    # generates C(6,2)=15 wedges; capped at degree 3 the hub is skipped
    # as a center and only chain-centered wedges survive.
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 7)] + [(1, 2), (2, 3)],
        "src int, dst int",
    )
    uncapped = {
        (r["node_x"], r["node_y"]): r["common"]
        for r in jaccard_link_prediction(edges, min_common=1).collect()
    }
    capped = {
        (r["node_x"], r["node_y"]): r["common"]
        for r in jaccard_link_prediction(
            edges, min_common=1, max_center_degree=3
        ).collect()
    }
    # hub-centered pairs like (4,5) vanish under the cap
    assert (4, 5) in uncapped and (4, 5) not in capped
    # chain-centered wedge (1,3) through center 2 survives; its common
    # count drops from 2 (center 2 AND hub 0) to 1 (center 2 only)
    assert uncapped[(1, 3)] == 2 and capped[(1, 3)] == 1


def test_markov_surprise_hand_computed(spark):
    import math

    from sparkstreaming_realtime_project_spark.operators.ordered import (
        markov_surprise,
    )

    # corpus: u1 alternates A,B,A,B (A->B x2, B->A x1); u2 repeats
    # A,A,A (A->A x2). From A: p(A->B) = p(A->A) = 0.5; B->A p = 1.0.
    df = spark.createDataFrame(
        [
            (1, 1, "A"), (1, 2, "B"), (1, 3, "A"), (1, 4, "B"),
            (2, 1, "A"), (2, 2, "A"), (2, 3, "A"),
        ],
        "uid int, ts int, ev string",
    )
    rows = {
        r["uid"]: r
        for r in markov_surprise(df, "uid", ["ts"], "ev").collect()
    }
    # u1: (2 * -ln(0.5) + 1 * -ln(1.0)) / 3
    want1 = math.floor((2 * -math.log(0.5)) / 3 * 1e4 + 0.5) / 1e4
    assert rows[1]["n_transitions"] == 3
    assert rows[1]["surprise"] == want1
    # u2: both transitions at p=0.5 -> -ln(0.5); all mass on the rarer
    # path makes u2 the higher scorer
    want2 = math.floor(-math.log(0.5) * 1e4 + 0.5) / 1e4
    assert rows[2]["surprise"] == want2
    assert rows[2]["surprise"] > rows[1]["surprise"]


def test_benford_report_hand_computed(spark):
    import math

    from sparkstreaming_realtime_project_spark.operators.validate import (
        benford_report,
    )

    # 6 values starting with 1, 3 with 2, 1 with 9; one sub-1 row excluded
    vals = [1.5, 10.0, 123.0, 19.99, 1.0, 1999.0, 2.0, 25.0, 200.0, 9.9, 0.5]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    rows = {r["digit"]: r for r in benford_report(df, "v").collect()}
    # ALWAYS 9 rows: absent digits (the strongest fraud signal) appear
    # with n=0 and abs_dev == expected_share (round-9 ADVICE fix)
    assert set(rows) == {str(d) for d in range(1, 10)}
    assert rows["1"]["n"] == 6 and rows["2"]["n"] == 3 and rows["9"]["n"] == 1
    assert rows["1"]["share"] == 0.6
    p1 = math.log10(2.0)
    assert rows["1"]["expected_share"] == math.floor(p1 * 1e6 + 0.5) / 1e6
    want_dev = math.floor(abs(0.6 - p1) * 1e6 + 0.5) / 1e6
    assert rows["1"]["abs_dev"] == want_dev
    for d in ["3", "4", "5", "6", "7", "8"]:
        assert rows[d]["n"] == 0 and rows[d]["share"] == 0.0
        assert rows[d]["abs_dev"] == rows[d]["expected_share"]


def test_cusum_shift_hand_computed(spark):
    from sparkstreaming_realtime_project_spark.operators.ordered import (
        cusum_shift,
    )

    # target+slack = 5: d = v - 5. Series 5,5,9,9,9,2:
    # d: 0,0,4,4,4,-3 -> S: 0,0,4,8,12,9; alarm at S > 7
    df = spark.createDataFrame(
        [(1, 5), (2, 5), (3, 9), (4, 9), (5, 9), (6, 2)], "t int, v int"
    )
    rows = {
        r["t"]: r
        for r in cusum_shift(
            df, "t", "v", target=4, slack=1, threshold=7
        ).collect()
    }
    assert [rows[t]["cusum"] for t in range(1, 7)] == [0, 0, 4, 8, 12, 9]
    assert [rows[t]["alarm"] for t in range(1, 7)] == [0, 0, 0, 1, 1, 1]


def test_cusum_resets_after_deficit(spark):
    from sparkstreaming_realtime_project_spark.operators.ordered import (
        cusum_shift,
    )

    # deep deficit then recovery: max(0, ...) must clamp at zero, and
    # the prefix-minus-running-min identity must reproduce that clamp
    df = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 10), (4, 3)], "t int, v int"
    )
    rows = {
        r["t"]: r["cusum"]
        for r in cusum_shift(
            df, "t", "v", target=3, slack=0, threshold=100
        ).collect()
    }
    # d: -3,-3,7,0 -> S: 0,0,7,7 (NOT 1: the clamp forgot the deficit)
    assert [rows[t] for t in range(1, 5)] == [0, 0, 7, 7]


def test_linkage_em_null_flags_are_missing_not_disagree(spark):
    """Round-9 ADVICE fix: NULL agreement flags follow linkage_pairs'
    missing-data convention — factor 1 in both E-step likelihoods and
    excluded from the feature's M-step denominators. Verified against a
    pure-Python replica of the same fixed point."""
    import math

    from sparkstreaming_realtime_project_spark.operators.linkage import (
        linkage_em,
    )

    # hand-built pair frame: g0 always observed, g1 null on some pairs
    rows = (
        [(1, 1)] * 20 + [(1, None)] * 10 + [(0, 0)] * 60 + [(0, None)] * 10
    )
    pairs = spark.createDataFrame(rows, "agree_a int, agree_b int")
    out = {
        r["feature"]: r
        for r in linkage_em(pairs, ["agree_a", "agree_b"], iters=2).collect()
    }

    pat = {}
    for g0, g1 in rows:
        pat[(g0, g1)] = pat.get((g0, g1), 0) + 1
    p, ms, us = 0.125, [0.75, 0.75], [0.25, 0.25]
    for _ in range(2):
        rn = sn = nn = 0.0
        rg, sg = [0.0, 0.0], [0.0, 0.0]
        rnj, snj = [0.0, 0.0], [0.0, 0.0]
        for (g0, g1), n in pat.items():
            gs = (g0, g1)
            pm, pu = p, 1.0 - p
            for j in range(2):
                if gs[j] is None:
                    continue  # missing: factor 1 in both likelihoods
                pm *= ms[j] if gs[j] == 1 else 1.0 - ms[j]
                pu *= us[j] if gs[j] == 1 else 1.0 - us[j]
            r = math.floor(pm / (pm + pu) * 4096.0 + 0.5) / 4096.0
            rn += n * r
            sn += (1.0 - r) * n
            nn += n
            for j in range(2):
                if gs[j] is None:
                    continue
                rg[j] += n * r * gs[j]
                sg[j] += (1.0 - r) * n * gs[j]
                rnj[j] += n * r
                snj[j] += (1.0 - r) * n
        p = rn / nn
        ms = [rg[j] / rnj[j] for j in range(2)]
        us = [sg[j] / snj[j] for j in range(2)]

    def _r(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    for j, name in enumerate(["agree_a", "agree_b"]):
        assert out[name]["m"] == _r(ms[j])
        assert out[name]["u"] == _r(us[j])
    # the partially-observed feature still learns m > u from its
    # observed rows instead of being dragged down by the null mass
    assert out["agree_b"]["m"] > out["agree_b"]["u"]
