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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    # dt/hr-string derivations must render identically to the DuckDB
    # oracle's naive timestamps regardless of the caller's session tz.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS), which vanilla Spark
        # rejects (PARQUET_TYPE_ILLEGAL). Read the column as long nanos
        # (legacy conf, session-scoped so it also works inside the
        # driver's own SparkSession) and truncate to microseconds —
        # identical to DuckDB's TIMESTAMP_NS -> epoch_us truncation.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
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
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
