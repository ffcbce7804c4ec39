"""Component-level profiling of the three bench heavyweights (guide §1):
times plan construction and sub-pipeline noop materialization separately
so the optimization targets the phase that actually costs.

Usage: python scripts/stage_profile.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from sparkstreaming_realtime_project_spark.operators import dedup as dd
from sparkstreaming_realtime_project_spark.plans import catalog
from sparkstreaming_realtime_project_spark.session import get_spark
from sparkstreaming_realtime_project_spark.sources.batch import load_table


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, fn, n=3):
    """Median-of-n wall for fn(); clearCache between runs."""
    runs = []
    for _ in range(n + 1):  # first pass = warm, untimed
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
    med = sorted(runs[1:])[len(runs[1:]) // 2]
    print(f"  {label:44s} {med:6.3f}s  (runs: {' '.join(f'{r:.3f}' for r in runs)})")
    return med


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="stage-profile")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    MAX_DF, MAX_BUCKET, K, BANDS = 50, 50, 16, 4

    print("== x_dedup_ngram_jaccard components ==")
    timed(spark, "plan-construction only (no persist jobs)", lambda: dd.jaccard_pairs(
        dd.with_shingles(docs, "text", "doc_id", 3, materialize=False),
        0.8, max_df=MAX_DF).explain("formatted") and None or None)
    timed(spark, "shingled noop", lambda: noop(
        dd.with_shingles(docs, "text", "doc_id", 3, materialize=False)))
    timed(spark, "candidates+verify noop (no cache)", lambda: noop(
        dd.jaccard_pairs(
            dd.with_shingles(docs, "text", "doc_id", 3, materialize=False),
            0.8, max_df=MAX_DF)))
    timed(spark, "full entry (as benched)", lambda: noop(
        catalog.x_dedup_ngram_jaccard(spark, sf_dir)))

    print("== x_dedup_minhash_lsh components ==")
    sh = dd.with_shingles(docs, "text", "doc_id", 3, materialize=False)
    timed(spark, "signature noop", lambda: noop(dd.minhash_signature(sh, K)))
    timed(spark, "band candidates noop", lambda: noop(
        dd.lsh_candidate_pairs(dd.minhash_signature(sh, K), K, BANDS,
                               max_bucket=MAX_BUCKET)))
    timed(spark, "full entry (as benched)", lambda: noop(
        catalog.x_dedup_minhash_lsh(spark, sf_dir)))

    print("== x_suffix_span_pairs components ==")
    timed(spark, "anchors noop", lambda: noop(
        dd.suffix_anchors(docs, "text", "doc_id", 8)))
    timed(spark, "full no-materialize noop", lambda: noop(
        dd.suffix_span_pairs(docs, "text", "doc_id", k=8, min_len=16,
                             max_df=64, materialize=False)))
    timed(spark, "full entry (as benched)", lambda: noop(
        catalog.x_suffix_span_pairs(spark, sf_dir)))


if __name__ == "__main__":
    main()
