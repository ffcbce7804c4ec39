"""Scaling probe for the distributed order-statistics primitives
(operators/distributed.py): prefix_sums and ntile_exact on synthetic
integer domains of 1M/4M/16M distinct keys, measured against the
single-task global window they replace.

Usage: python scripts/prefix_probe.py [rows ...]

Synthetic spark.range domains (not the testdata tables) because the
scaled-copy corpus construction keeps the documents value DOMAIN
constant — an honest probe of these primitives must grow the number of
DISTINCT keys, which is exactly what range(N) does. Wall-clock growth
~linear in N demonstrates the range-exchange shape; the global-window
baseline demonstrates what the primitive buys (one task does ALL the
work regardless of cores).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sparkstreaming_realtime_project_spark.operators.distributed import (
    ntile_exact,
    prefix_sums,
)
from sparkstreaming_realtime_project_spark.session import get_spark


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [1_000_000, 4_000_000, 16_000_000]
    spark = get_spark(app_name="prefix-probe")
    spark.sparkContext.setLogLevel("ERROR")
    report = []
    for n in sizes:
        # scrambled key order so the range exchange actually works
        df = spark.range(n).select(
            ((F.col("id") * 2654435761) % n).alias("k"),
            (F.col("id") % 7).alias("x"),
        )
        row = {"rows": n}
        row["prefix_sums_s"] = timed(
            lambda: prefix_sums(df, ["k"], ["x"])
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        spark.catalog.clearCache()
        row["ntile_exact_s"] = timed(
            lambda: ntile_exact(df, ["k", "x"], 5, "b")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        spark.catalog.clearCache()
        w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
        row["global_window_s"] = timed(
            lambda: df.select("k", F.sum("x").over(w).alias("c"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        report.append(row)
        print(json.dumps(row))
    print(json.dumps({"prefix_scaling": report}))


if __name__ == "__main__":
    main()
