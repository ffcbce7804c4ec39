"""Skew probe for the salted equi-join: one hot key holding a large
share of the fact side, joined against a medium dim side that is too
big to broadcast comfortably — plain sort-merge vs salted_join walls,
with AQE's skew split ON (the realistic baseline) and OFF (the
worst case salting exists for: aggregate-then-join pipelines and
engines/paths AQE's split doesn't reach).

Usage: python scripts/join_skew_probe.py [n_rows] [hot_share_pct]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from sparkstreaming_realtime_project_spark.operators.joins import salted_join
from sparkstreaming_realtime_project_spark.session import get_spark


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    hot_pct = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    n_keys = 100_000
    spark = get_spark(app_name="join-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # fact: hot_pct% of rows carry key 0, the rest spread uniformly
    fact = spark.range(n).select(
        F.when(
            F.col("id") % 100 < hot_pct, F.lit(0)
        ).otherwise((F.col("id") * 2654435761) % n_keys).alias("k"),
        (F.col("id") % 97).alias("x"),
    ).persist()
    fact.count()
    dim = spark.range(n_keys).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("d")
    ).persist()
    dim.count()
    # force the shuffle-join path: a broadcast dim would hide the skew
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe_skew = spark.conf.get("spark.sql.adaptive.skewJoin.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    report = []
    for aqe_skew in ("true", "false"):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", aqe_skew)
        row = {"rows": n, "hot_pct": hot_pct, "aqe_skew_split": aqe_skew}
        row["plain_s"] = timed(
            lambda: fact.join(dim, "k")
            .select(F.sum(F.col("x") + F.col("d")))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        row["salted_s"] = timed(
            lambda: salted_join(fact, dim, ["k"], salt=32)
            .select(F.sum(F.col("x") + F.col("d")))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        report.append(row)
        print(json.dumps(row))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", prev_aqe_skew)
    print(json.dumps({"join_skew": report}))


if __name__ == "__main__":
    main()
