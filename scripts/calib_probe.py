"""CALIB_REF provenance (ADVICE r12): measure the bench calibration
probe on an OTHERWISE-IDLE session — nothing but the probe itself runs
— and print the cold first reading plus a warm triplicate.

bench.py normalizes each query by min(flanking probes) against
CALIB_REF; this script is the recorded evidence for what that constant
should be on a quiet host. The historical confusion it settles: an old
bench.py comment recorded "~0.55 s quiet-host reference" for this same
probe — that figure was the FIRST probe of a session (JVM-global
warm-in: JIT compilation of the codegen'd sum pipeline, first
whole-stage codegen cache fill), not the steady state every mid-run
probe sees. The warm steady state is what CALIB_REF models, because
every probe bench.py uses for normalization runs mid-session.

Usage: python scripts/calib_probe.py [n_triplicates]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from sparkstreaming_realtime_project_spark.session import get_spark


def probe_once(spark) -> float:
    start = time.perf_counter()
    spark.range(0, 64_000_000, 1, 32).selectExpr(
        "sum(id * 2654435761 % 1000003) AS s"
    ).collect()
    return round(time.perf_counter() - start, 3)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="calib-probe")
    spark.sparkContext.setLogLevel("ERROR")
    cold = probe_once(spark)  # first-of-session: JVM warm-in included
    triplicates = []
    for _ in range(n):
        runs = [probe_once(spark) for _ in range(3)]
        triplicates.append({"runs": runs, "median": sorted(runs)[1]})
        time.sleep(1)
    print(json.dumps({
        "cold_first_probe": cold,
        "warm_triplicates": triplicates,
        "warm_median_of_medians": sorted(
            t["median"] for t in triplicates
        )[len(triplicates) // 2],
    }))


if __name__ == "__main__":
    main()
