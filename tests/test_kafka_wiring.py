"""Kafka wiring smoke tests (S1/S2/K1): no broker or spark-sql-kafka jar
exists in this container, so the production reader/writer cannot run —
but their CONSTRUCTION can be pinned: format and options must match what
a real deployment needs (subscribe topic, startingOffsets passthrough
including the reference's per-partition JSON map MyKafkaUtils.scala:49-55,
bootstrap servers, checkpointLocation). A recording stub stands in for
the reader/writer builder chain; kafka_frame (the value/topic/key shaping
that IS runnable) keeps its own real tests in test_streaming_pipelines."""

from __future__ import annotations

import json

from sparkstreaming_realtime_project_spark.sources import streams
from sparkstreaming_realtime_project_spark.streaming import sinks


class _RecordingBuilder:
    """Stands in for DataStreamReader/Writer: records format + options."""

    def __init__(self):
        self.fmt = None
        self.opts = {}

    def format(self, f):
        self.fmt = f
        return self

    def option(self, k, v):
        self.opts[k] = v
        return self

    def load(self):
        return _SelectSink(self)


class _SelectSink:
    """Post-load frame stub: kafka_stream's projection is applied to the
    connector's fixed output schema — accept and discard it."""

    def __init__(self, reader):
        self.reader = reader

    def select(self, *cols):
        return self


class _FakeSparkForRead:
    def __init__(self):
        self.reader = _RecordingBuilder()

    @property
    def readStream(self):
        return self.reader


def test_kafka_stream_reader_options_latest(spark):
    # spark fixture: the post-load projection builds Column expressions,
    # which need an active SparkContext even against the stub reader
    fake = _FakeSparkForRead()
    streams.kafka_stream(fake, "b1:9092,b2:9092", "ODS_BASE_LOG")
    assert fake.reader.fmt == "kafka"
    assert fake.reader.opts == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "ODS_BASE_LOG",
        "startingOffsets": "latest",
    }


def test_kafka_stream_offsets_json_passthrough(spark):
    """The reference's stored per-partition offset map (Redis,
    MyKafkaUtils.scala:49-55) maps to startingOffsets JSON — it must pass
    through VERBATIM, not be reformatted."""
    offsets = json.dumps({"ODS_BASE_LOG": {"0": 1234, "1": 5678}})
    fake = _FakeSparkForRead()
    _ = spark  # Column expressions need the active session
    streams.kafka_stream(
        fake, "b1:9092", "ODS_BASE_LOG", starting_offsets=offsets, min_partitions=8
    )
    assert fake.reader.opts["startingOffsets"] == offsets
    assert fake.reader.opts["minPartitions"] == "8"


class _FakeFrameForWrite:
    def __init__(self):
        self.writer = _RecordingBuilder()

    @property
    def writeStream(self):
        return self.writer


def test_kafka_topic_writer_options(monkeypatch):
    calls = {}
    fake_frame = _FakeFrameForWrite()

    def fake_kafka_frame(df, key_col=None):
        calls["df"], calls["key_col"] = df, key_col
        return fake_frame

    monkeypatch.setattr(sinks, "kafka_frame", fake_kafka_frame)
    sentinel = object()
    w = sinks.kafka_topic_writer(
        sentinel, "b1:9092", "/ck/dwd", key_col="mid"
    )
    assert w is fake_frame.writer
    assert calls == {"df": sentinel, "key_col": "mid"}
    assert fake_frame.writer.fmt == "kafka"
    assert fake_frame.writer.opts == {
        "kafka.bootstrap.servers": "b1:9092",
        "checkpointLocation": "/ck/dwd",
    }
