"""Streaming sources (SURVEY §2.1 S1-S7).

Production path is Kafka; tests use file streams through the same Source
abstraction so every pipeline is exercised with ``availableNow`` triggers
without a broker. Structured Streaming's checkpoint replaces the
reference's entire Redis offset machinery (MyOffsetsUtils.scala:40-81,
S3/K6): offsets, state, and sink commits are tracked atomically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "latest",
    min_partitions: int | None = None,
) -> DataFrame:
    """S1/S2: Kafka source with stored-or-latest start.

    Explicit per-partition offsets (the reference's Redis map,
    MyKafkaUtils.scala:49-55) are only needed on first start — pass a JSON
    string as ``starting_offsets``; afterwards the checkpoint wins.
    Requires the spark-sql-kafka package on the classpath (not bundled in
    this container — untestable here, wiring kept faithful)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if min_partitions:
        reader = reader.option("minPartitions", str(min_partitions))
    return reader.load().select(
        F.col("key").cast("string"),
        F.col("value").cast("string"),
        "topic",
        "partition",
        "offset",
        F.col("timestamp").alias("kafka_ts"),
    )


def text_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Test/replay source with the Kafka value-column shape: each line of
    each file becomes a row with a single string ``value`` column —
    exactly what parse_log/parse_cdc consume. One file per intended
    micro-batch + ``maxFilesPerTrigger=1`` replays the reference's batch
    boundaries."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def file_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "json",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Test/replay source: directory of json/parquet files as a stream.
    Stands in for Kafka in every pipeline test (FIXTURES.md replay)."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)
