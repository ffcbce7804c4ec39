"""Multimodal pipeline plumbing tests (decode/resize/frame-sample stubs:
real Arrow batching, schema, fan-out — fake pixel work) and a
streaming-vs-batch parity check for windowed aggregation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkstreaming_realtime_project_spark.operators import multimodal as mm
from sparkstreaming_realtime_project_spark.plans import catalog
from sparkstreaming_realtime_project_spark.sources.batch import load_table


@pytest.fixture(scope="module")
def payloads(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    return mm.attach_binary_payload(docs, "text", modality="image").cache()


def test_resize_contract(payloads):
    out = mm.resize_images(payloads, 32, 32).collect()
    assert len(out) == 50
    for r in out:
        assert (r["width"], r["height"]) == (32, 32)
        assert r["resized_n_bytes"] == 32 * 32 == len(r["resized_payload"])


def test_resize_deterministic(payloads):
    a = {r["doc_id"]: bytes(r["resized_payload"]) for r in mm.resize_images(payloads, 8, 8).collect()}
    b = {r["doc_id"]: bytes(r["resized_payload"]) for r in mm.resize_images(payloads, 8, 8).collect()}
    assert a == b


def test_frame_sample_fanout(payloads):
    frames = mm.sample_frames(payloads, n_frames=4)
    assert frames.count() == 200  # 50 docs x 4 frames
    per_doc = frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("frame_sha256").alias("uniq"),
    )
    bad = per_doc.filter((F.col("n") != 4) | (F.col("uniq") != 4)).count()
    assert bad == 0


def test_strict_mode_raises(payloads):
    with pytest.raises(Exception) as exc:
        mm.resize_images(payloads, 8, 8, strict=True).collect()
    assert "NotImplementedError" in str(exc.value) or "resize stub" in str(exc.value)
    with pytest.raises(Exception):
        mm.sample_frames(payloads, strict=True).collect()
    with pytest.raises(Exception):
        mm.decode_features(payloads, strict=True).collect()


def test_decoder_param_validated_and_pil_is_optin(payloads):
    """decoder='pil' is the pluggable REAL pixel path: selected only by
    parameter (output must never depend on what happens to be installed),
    importing Pillow inside the task. Without Pillow in this container
    the job fails loudly instead of silently falling back to fake."""
    with pytest.raises(ValueError):
        mm.decode_features(payloads, decoder="bogus")
    with pytest.raises(ValueError):
        mm.resize_images(payloads, 8, 8, decoder="bogus")
    import importlib.util

    if importlib.util.find_spec("PIL") is None:
        with pytest.raises(Exception) as exc:
            mm.decode_features(payloads, decoder="pil").collect()
        assert "PIL" in str(exc.value)
    else:  # real decoder present: text bytes are not an image -> decode error
        with pytest.raises(Exception):
            mm.decode_features(payloads, decoder="pil").collect()


def test_streaming_window_matches_batch(spark, sf_dir, tmp_path):
    """The catalog's tumbling-window aggregate, run as a Structured
    Streaming query over the same events, produces the identical result
    set — the streaming execution of the batch plan, SURVEY §2.6."""
    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "events_micros")
    ev.write.parquet(src)  # re-encoded micros parquet (streamable)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("ct"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.unix_micros("w.start").alias("window_start_us"),
            "event_type",
            "ct",
            "sum_value",
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("win_parity")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)

    streamed = {
        tuple(r) for r in spark.table("win_parity").collect()
    }
    batch = {tuple(r) for r in catalog.o_window_tumbling(spark, sf_dir).collect()}
    assert streamed == batch
