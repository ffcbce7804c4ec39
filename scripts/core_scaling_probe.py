"""Core-scaling probe at a COMPUTE-BOUND scale (VERDICT r13 #2).

At sf0.1 the bench queries finish in 0.3-2 s and are dominated by fixed
per-pass costs (plan construction, few-stage latency), so low-core vs
32-core ratios sit near 1 and the driver's `suspect_cpus_ignored`
heuristic fires even though `session.py` demonstrably honors
$SPARK_GRAFT_CPUS. This probe gives the scaling question real signal:
it amplifies the sf0.1 documents table K-fold with DISJOINT vocabularies
(scale_probe's construction: copy k prefixes every token with `k<k>_`,
so dup density stays constant and no cross-copy pairs appear) and times
the three dedup heavyweights end to end. At K=10 the pipelines are
shuffle/compute-bound, and wall-clock should track cores.

Usage:
    SPARK_GRAFT_CPUS=32 python scripts/core_scaling_probe.py [sf_dir] [K]
    SPARK_GRAFT_CPUS=8  python scripts/core_scaling_probe.py [sf_dir] [K]

Prints one JSON line {cpus, copies, n_docs, queries:{name: sec}}.
Record the 32-vs-8 pair in records/r14/ and BASELINE.md.
"""

from __future__ import annotations

import atexit
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from sparkstreaming_realtime_project_spark.operators import dedup as dd
from sparkstreaming_realtime_project_spark.session import get_spark
from sparkstreaming_realtime_project_spark.sources.batch import load_table


def scaled_documents(spark, sf_dir: str, copies: int):
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = base.agg(F.max("doc_id")).first()[0] + 1
    parts = []
    for k in range(copies):
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit(k * n)).alias("doc_id"),
                F.array_join(
                    F.transform(
                        F.split(F.lower(F.col("text")), r"\s+"),
                        lambda t, _k=k: F.concat(F.lit(f"k{_k}_"), t),
                    ),
                    " ",
                ).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_runs = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "3"))
    spark = get_spark(app_name="core-scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # materialize the amplified corpus to parquet so every pipeline
    # reads identical files and the generation cost is outside the
    # timed region
    path = tempfile.mkdtemp(prefix="spark_core_scaling_")
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    scaled_documents(spark, sf_dir, copies).repartition(64).write.mode(
        "overwrite"
    ).parquet(path)
    docs = spark.read.parquet(path)
    n_docs = docs.count()

    pipelines = {
        "x_dedup_minhash_lsh": lambda: dd.minhash_dedup_pairs(
            docs, "text", "doc_id", n=3, k=16, bands=4, threshold=0.8,
            max_bucket=50,
        ),
        "x_dedup_ngram_jaccard": lambda: dd.ngram_jaccard_dedup_pairs(
            docs, "text", "doc_id", n=3, threshold=0.8, max_df=50
        ),
        "x_suffix_span_pairs": lambda: dd.suffix_span_pairs(
            docs, "text", "doc_id", k=8, min_len=16, max_df=64
        ),
    }
    timings = {}
    for name, build in pipelines.items():
        spark.sparkContext.setJobDescription(f"core-scaling {name}")
        runs = []
        for i in range(n_runs + 1):
            t0 = time.perf_counter()
            out = build()
            out.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            out.unpersist() if hasattr(out, "unpersist") else None
            spark.catalog.clearCache()
            if i:
                runs.append(dt)
        timings[name] = round(sorted(runs)[len(runs) // 2], 3)
        spark.sparkContext.setJobDescription(None)
    print(
        json.dumps(
            {
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
                "copies": copies,
                "n_docs": n_docs,
                "queries": timings,
            }
        )
    )


if __name__ == "__main__":
    main()
