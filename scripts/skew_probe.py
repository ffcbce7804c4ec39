"""Skewed-graph probe for the degree-oriented wedge join: one celebrity
node of degree ~N on top of a constant-degree chain, scaled 1x/4x/16x.

The disjoint-copy probe in scale_probe.py grows the graph at CONSTANT
density, which never exercises the orientation bound under a hub — this
probe is the missing adversarial case for the claim in
operators/graph.py triangle_counts: orientation caps out-degree at
O(sqrt(m)) so wedge volume is O(m^1.5) even when one node touches
everything (a naive wedge join pivots C(N,2) pairs through the hub).

Graph at size N: chain edges (i, i+1) and chords (i, i+2), plus a hub
adjacent to every chain node — hub degree N, m ~ 3N. Exact triangle
count is closed-form (3N - 5: N-2 chain triangles, N-1 hub+adjacent,
N-2 hub+chord), so the probe checks CORRECTNESS under skew, not just
speed. Alongside wall-clock it reports the oriented wedge volume
sum(outdeg choose 2) vs the naive sum(deg choose 2) straight from the
degree tables — the direct certificate that orientation removed the
hub's quadratic pivot (naive grows ~N^2/2; oriented stays ~linear:
the hub sorts HIGHEST in the (degree, id) order, so every hub edge
points INTO it and the hub sources zero wedges).

Usage: python scripts/skew_probe.py [N ...]   (default 30000 120000 480000)
Results are appended to SCALE.md by hand.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from sparkstreaming_realtime_project_spark.operators import graph as gr
from sparkstreaming_realtime_project_spark.session import get_spark


def hub_chain_edges(spark, n: int):
    ids = spark.range(n).select(F.col("id").cast("long"))
    chain = ids.filter(F.col("id") < n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    chord = ids.filter(F.col("id") < n - 2).select(
        F.col("id").alias("src"), (F.col("id") + 2).alias("dst")
    )
    hub = ids.select(F.col("id").alias("src"), F.lit(n).cast("long").alias("dst"))
    return chain.unionByName(chord).unionByName(hub)


def wedge_volumes(edges):
    """(naive, oriented) wedge counts from the degree tables alone."""
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
        .persist()
    )
    naive = deg.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long")
    ).first()[0]
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    oriented_edges = und.join(da, "a").join(db, "b").select(
        F.when(
            (F.col("da") < F.col("db"))
            | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
            F.col("a"),
        )
        .otherwise(F.col("b"))
        .alias("o_src")
    )
    odeg = oriented_edges.groupBy("o_src").agg(F.count(F.lit(1)).alias("od"))
    oriented = odeg.agg(
        F.sum(F.col("od") * (F.col("od") - 1) / 2).cast("long")
    ).first()[0]
    und.unpersist()
    deg.unpersist()
    return int(naive), int(oriented)


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [30_000, 120_000, 480_000]
    spark = get_spark(app_name="skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup: JIT/codegen for the whole operator chain on a toy graph,
    # so the first measured size isn't charged the JVM cold start
    gr.triangle_counts(hub_chain_edges(spark, 2_000), "src", "dst", materialize=True).count()
    rows = []
    for n in sizes:
        edges = hub_chain_edges(spark, n).persist()
        edges.count()
        t0 = time.perf_counter()
        out = gr.triangle_counts(edges, "src", "dst", materialize=True)
        total = out.agg(F.sum("n_triangles").cast("long")).first()[0]
        wall = round(time.perf_counter() - t0, 2)
        # every triangle contributes 1 to each of its 3 member nodes
        expect = 3 * (3 * n - 5)
        naive, oriented = wedge_volumes(edges)
        edges.unpersist()
        rows.append(
            {
                "n": n,
                "hub_degree": n,
                "m_edges": 3 * n - 3,
                "triangle_s": wall,
                "node_triangle_sum": int(total),
                "expected_sum": expect,
                "correct": int(total) == expect,
                "naive_wedges": naive,
                "oriented_wedges": oriented,
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"probe": "skewed-hub triangles", "rows": rows}))


if __name__ == "__main__":
    main()
