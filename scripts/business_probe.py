"""Scaling probe for the round-8 business-analytics family: basket
lift (pair-fanout growth, plus the hub-basket adversarial case) and RFM
segmentation (the fixed distributed-ntile plan).

Usage: python scripts/business_probe.py [sf_dir] [copies ...]

Corpus construction mirrors scale_probe.py's discipline — scaling keeps
the per-unit structure CONSTANT so growth factors are honest:

- baskets: copy k shifts order keys by k*maxO and keeps the part
  catalog fixed ("more customers, same catalog") — per-basket size
  distribution unchanged, so pair volume grows linearly with copies and
  a super-linear wall-clock would indict the plan, not the data;
- the hub case injects ONE synthetic basket with H distinct parts — the
  pathological crawler-cart. Uncapped, that single basket contributes
  H*(H-1)/2 pairs (~2M at H=2000, ~5e11 at H=1M); the entry's
  basket-size cap (catalog._LIFT_MAX_BASKET) excludes it. The probe
  measures BOTH shapes so the cap's value is a number, not an argument;
- RFM: copy k shifts customer keys by k*maxC — k x the customer domain,
  identical per-customer order counts. The fixed plan's three range
  exchanges should scale ~linearly; the old keyless-ntile plan would
  funnel the whole domain through one task.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from sparkstreaming_realtime_project_spark.plans.catalog import (
    _LIFT_MAX_BASKET,
    _LIFT_MIN_SUPPORT,
    _basket_lift_frame,
    _rfm_frame,
)
from sparkstreaming_realtime_project_spark.session import get_spark
from sparkstreaming_realtime_project_spark.sources.batch import load_table


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 2)


def scaled_baskets(spark, sf_dir: str, copies: int):
    e = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    max_o = e.agg(F.max("o")).first()[0] + 1
    parts = [
        e.select((F.col("o") + F.lit(k * max_o)).alias("o"), "p")
        for k in range(copies)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out, max_o * copies


def hub_basket(spark, hub_order: int, n_parts: int):
    return spark.range(n_parts).select(
        F.lit(hub_order).cast("long").alias("o"), F.col("id").alias("p")
    )


def scaled_orders(spark, sf_dir: str, copies: int):
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.to_date("o_orderdate").alias("od"), "o_totalprice"
    )
    max_c = o.agg(F.max("o_custkey")).first()[0] + 1
    parts = [
        o.select(
            (F.col("o_custkey") + F.lit(k * max_c)).alias("o_custkey"),
            "od",
            "o_totalprice",
        )
        for k in range(copies)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    copies = [int(c) for c in sys.argv[2:]] or [1, 4, 16]
    spark = get_spark(app_name="business-probe")
    spark.sparkContext.setLogLevel("ERROR")
    report = []
    for k in copies:
        row = {"copies": k}
        e, next_o = scaled_baskets(spark, sf_dir, k)
        e = e.persist()
        row["n_memberships"] = e.count()

        def run_lift():
            out = _basket_lift_frame(e, _LIFT_MIN_SUPPORT, _LIFT_MAX_BASKET)
            row["lift_rules"] = out.count()

        row["lift_s"] = timed(run_lift)

        o = scaled_orders(spark, sf_dir, k).persist()
        row["n_orders"] = o.count()

        def run_rfm():
            row["rfm_rows"] = _rfm_frame(o).count()

        row["rfm_s"] = timed(run_rfm)
        e.unpersist()
        o.unpersist()
        spark.catalog.clearCache()
        report.append(row)
        print(json.dumps(row))

    # hub-basket adversarial case at 1 copy: one crawler-cart order with
    # H distinct parts, capped vs uncapped (H=10k -> ~50M pairs through
    # ONE task uncapped — big enough to expose the straggler, small
    # enough to finish)
    H = 10_000
    e, next_o = scaled_baskets(spark, sf_dir, 1)
    hub = e.unionByName(hub_basket(spark, next_o + 1, H)).persist()
    hub.count()
    hub_row = {"hub_parts": H}

    def run_capped():
        out = _basket_lift_frame(hub, _LIFT_MIN_SUPPORT, _LIFT_MAX_BASKET)
        hub_row["capped_rules"] = out.count()

    def run_uncapped():
        out = _basket_lift_frame(hub, _LIFT_MIN_SUPPORT, 10**9)
        hub_row["uncapped_rules"] = out.count()

    hub_row["capped_s"] = timed(run_capped)
    hub_row["uncapped_s"] = timed(run_uncapped)
    hub_row["hub_pairs_uncapped"] = H * (H - 1) // 2
    hub.unpersist()
    print(json.dumps(hub_row))
    report.append(hub_row)
    print(json.dumps({"business_scaling": report}))


if __name__ == "__main__":
    main()
