"""Batch sources: parquet table loaders for the driver testdata.

Scale notes: ``spark.read.parquet`` gives predicate pushdown, column
pruning and partition-size-bounded splits (``spark.sql.files.
maxPartitionBytes``) for free — at 100 TB the same call fans out to
thousands of input splits. Nothing here collects to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Resolved-relation cache, keyed by (applicationId, sf_dir, table): each
# spark.read.parquet call runs a driver-side footer/schema job (~0.1-0.2 s
# locally; a full file-listing round-trip against object storage at
# cluster scale). The testdata tables are immutable, so resolving each
# once per application is exactly what Spark's own catalog does for
# registered tables (HiveMetastoreCatalog caches relations) — repeated
# plan builds then reuse the resolved logical plan instead of re-listing
# files. Keyed by applicationId so a restarted context never sees stale
# handles.
_RELATION_CACHE: dict = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    # dt/hr-string derivations must render identically to the DuckDB
    # oracle's naive timestamps regardless of the caller's session tz.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Execution-profile pin, session-scoped like the tz pin: a vanilla
    # session carries Spark's global shuffle.partitions default (200),
    # which on a small-core harness turns every iterative operator
    # (PageRank, label propagation, Lloyd rounds) into hundreds of
    # near-empty tasks per round — x_pagerank measured 28 s -> 11 s at
    # sf0.01 under local[8] from this one setting. Only the UNTOUCHED
    # default is replaced (an explicit caller/cluster setting wins);
    # 2x parallelism keeps headroom for skew while AQE coalesces the
    # rest at runtime.
    if spark.conf.get("spark.sql.shuffle.partitions") == "200":
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(max(2 * spark.sparkContext.defaultParallelism, 16)),
        )
    if name == "events":
        # older testdata generations carried TIMESTAMP(NANOS), which
        # vanilla Spark rejects (PARQUET_TYPE_ILLEGAL). Read the column
        # as long nanos (legacy conf, session-scoped so it also works
        # inside the driver's own SparkSession) and truncate to
        # microseconds — identical to DuckDB's TIMESTAMP_NS ->
        # epoch_us truncation.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _RELATION_CACHE.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        cols = [
            # integer `div`, not `/`: float division loses ulps at 1e18 nanos
            F.timestamp_micros(F.expr(f"{c} div 1000")).alias("ts")
            if c == "ts"
            else F.col(c)
            for c in df.columns
        ]
        df = df.select(cols)
    # Parquet timestamps with isAdjustedToUTC=false surface as
    # TIMESTAMP_NTZ, which unix_millis/unix_micros and the windowing
    # functions reject. Under the pinned UTC session tz the NTZ ->
    # TIMESTAMP cast is a wall-clock identity, and epoch extraction then
    # treats the value as UTC — exactly DuckDB's naive-timestamp
    # epoch_us semantics, so oracle hashes are unaffected.
    ntz = [
        f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)
    ]
    if ntz:
        df = df.select(
            *[
                F.col(c).cast("timestamp").alias(c) if c in ntz else F.col(c)
                for c in df.columns
            ]
        )
    _RELATION_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
