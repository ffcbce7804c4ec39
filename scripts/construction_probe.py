"""Plan-CONSTRUCTION cost probe for the per-micro-batch builders
(VERDICT r13 #6): times DataFrame construction only (py4j round-trips,
no action, no Catalyst beyond what construction itself triggers) for
every builder that runs inside a foreachBatch body or the scrub
compositions. The r13 rule stands: convert a builder to parsed SQL only
if its construction exceeds ~50 ms per call — below that the conversion
buys nothing a micro-batch would notice.

Usage: python scripts/construction_probe.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from sparkstreaming_realtime_project_spark.operators import dedup as dd
from sparkstreaming_realtime_project_spark.operators import sketches as sk
from sparkstreaming_realtime_project_spark.session import get_spark
from sparkstreaming_realtime_project_spark.sources.batch import load_table


def timed_construction(label, build, n=5):
    runs = []
    for i in range(n + 1):
        t0 = time.perf_counter()
        build()
        if i:
            runs.append(time.perf_counter() - t0)
    med = sorted(runs)[len(runs) // 2]
    flag = "  <-- >50ms" if med > 0.05 else ""
    print(f"  {label:46s} {med * 1000:7.1f} ms{flag}")
    return med


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="construction-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    ev = load_table(spark, sf_dir, "events")

    print("== foreachBatch / scrub-composition builders, construction only ==")
    timed_construction(
        "suffix_anchors", lambda: dd.suffix_anchors(docs, "text", "doc_id", 8)
    )
    anchors = dd.suffix_anchors(docs, "text", "doc_id", 8)
    timed_construction(
        "suffix_runs_to_spans (fold)",
        lambda: dd.suffix_runs_to_spans(
            anchors.selectExpr(
                "doc_id AS doc_a", "doc_id AS doc_b", "pos AS pa",
                "pos AS pb", "pos AS diag",
            ),
            8, 16, ["doc_a", "doc_b"],
        ),
    )
    timed_construction(
        "scrub_coverage",
        lambda: dd.scrub_coverage(
            docs, "text", "doc_id",
            anchors.selectExpr("doc_id", "pos AS b_start", "pos AS b_end"),
        ),
    )
    timed_construction(
        "duplicate_spans",
        lambda: dd.duplicate_spans(docs, "text", "doc_id", 8, 2),
    )
    timed_construction(
        "scrub_repeated_spans",
        lambda: dd.scrub_repeated_spans(docs, "text", "doc_id", 8, 2),
    )
    timed_construction(
        "minhash_signature",
        lambda: dd.minhash_signature(
            dd.with_shingles(docs, "text", "doc_id", 3), 16
        ),
    )
    timed_construction(
        "band_keys",
        lambda: dd.band_keys(
            dd.minhash_signature(dd.with_shingles(docs, "text", "doc_id", 3), 16)
        ),
    )
    timed_construction(
        "hll_registers",
        lambda: sk.hll_registers(ev.select("user_id"), "user_id"),
    )
    timed_construction(
        "cms_sketch", lambda: sk.cms_sketch(ev, "user_id", 4, 128)
    )
    timed_construction(
        "mg_topk", lambda: sk.mg_topk(ev, "user_id", "event_type", 16)
    )
    timed_construction(
        "quantile_hist",
        lambda: sk.quantile_hist(ev, "value", 10.0, [0.5, 0.9]),
    )


if __name__ == "__main__":
    main()
