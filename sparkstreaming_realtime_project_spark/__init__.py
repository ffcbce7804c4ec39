"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference real-time warehouse
(Double-zhang/sparkStreaming_realtime_project), re-expressed Spark-first.

Layout
------
- ``session``    : SparkSession builder tuned for scale (AQE, shuffle sizing).
- ``schemas``    : StructTypes for the reference's bean/envelope schemas
                   (SURVEY.md §1) and the driver testdata tables.
- ``sources``    : batch parquet loaders + streaming source wrappers
                   (Kafka in prod, file source in tests) — SURVEY §2.1.
- ``functions``  : scalar function library (date/text/match/highlight) —
                   SURVEY §2.7 (F1–F10).
- ``operators``  : the operator inventory — projection/flatten (§2.3),
                   joins (§2.4), dedup / similarity / text-analysis /
                   multimodal extension ops (§4 north-star).
- ``plans``      : serving-layer queries (§2.5 A1–A6, §2.8 pagination) —
                   the publisher REST surface as DataFrame functions.
- ``streaming``  : Structured Streaming pipelines (§2.6 O1–O6) — the four
                   reference apps as watermarked incremental plans.
"""

__version__ = "0.1.0"
