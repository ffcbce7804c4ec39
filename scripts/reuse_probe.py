"""Probe: does ReuseExchange fire on a self-joined window subtree, and
does a higher-order-function lambda in the projection break it?

Round-14 finding: all three dedup heavyweights build their candidate
self-join sides as two full copies of the anchor/prefix/band chain —
no ReusedExchange anywhere — and every one of those chains contains a
transform()/filter() lambda. This probe isolates the lambda as the
culprit (NamedLambdaVariable exprIds are not normalized by plan
canonicalization, so the two sides never compare equal).
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from sparkstreaming_realtime_project_spark.session import get_spark


def probe(label, base):
    import re

    w = base.selectExpr(
        "*", "count(1) OVER (PARTITION BY g) AS n"
    ).filter("n <= 500").drop("n")
    j = w.alias("a").join(w.alias("b"), F.expr("a.g = b.g AND a.id < b.id"))
    j.collect()  # run it so AQE finalizes stages
    plan = j._jdf.queryExecution().executedPlan().toString()
    stages = re.findall(r"ShuffleQueryStage (\d+)", plan)
    print(
        f"{label:35s} ReusedExchange={'ReusedExchange' in plan}  "
        f"shuffle-stage refs={len(stages)} distinct={len(set(stages))}  "
        f"Window nodes={plan.count('Window')}"
    )


def main():
    spark = get_spark(app_name="reuse-probe")
    spark.sparkContext.setLogLevel("ERROR")
    plain = spark.range(1000).selectExpr("id", "CAST(id % 7 AS STRING) AS g")
    lam = spark.range(1000).selectExpr(
        "id",
        "concat_ws(',', transform(sequence(1, CAST(id % 3 + 1 AS INT)),"
        " x -> CAST(x * id % 7 AS STRING))) AS g",
    )
    probe("no lambda", plain)
    probe("transform() lambda", lam)
    cached = plain.persist()
    cached.count()
    probe("persisted base (hot cache)", cached)
    lazy_cached = spark.range(1000).selectExpr(
        "id", "CAST(id % 7 AS STRING) AS g"
    ).persist()
    probe("persisted base (cold cache)", lazy_cached)


if __name__ == "__main__":
    main()
