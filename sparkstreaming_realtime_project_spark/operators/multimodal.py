"""Multimodal columns (north-star extension): opaque binary payloads with
typed metadata, processed by Arrow-batched pandas functions.

Convention (schemas.MULTIMODAL_META_SCHEMA): a multimodal table carries
``payload: binary`` + ``meta: struct(modality, mime, width, height,
duration_ms, sha256, n_bytes)``. Metadata derivation (hash, byte length,
modality tagging) is pure JVM expressions; the *decode* step (image
decode, resize, audio frames) is a ``mapInPandas`` operator whose Spark
plumbing — schema, batching, partition alignment — is real, while the
pixel-level work is stubbed: the image/audio libraries are not in this
container (NotImplementedError behind ``strict=True``, deterministic
fake features otherwise, clearly marked).

Scale notes: payloads never enter a shuffle — derive-then-drop. Any
grouping/join happens on the metadata columns; ``mapInPandas`` streams
Arrow batches so peak memory is one batch of payloads per core, tuned by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def attach_binary_payload(
    df: DataFrame, source_col: str, modality: str = "text", mime: str = "text/plain"
) -> DataFrame:
    """Build a multimodal row from a source column: payload + derived
    metadata. For real media the payload would come from the file/blob
    source; deriving from text keeps the pipeline testable here."""
    payload = F.encode(F.col(source_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.sha2(F.col("payload"), 256).alias("sha256"),
            F.octet_length(F.col("payload")).cast("long").alias("n_bytes"),
        ),
    )


DECODED_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def decode_features(
    df: DataFrame, id_col: str = "doc_id", strict: bool = False, feature_dim: int = 8
) -> DataFrame:
    """Decode/feature-extract stage as mapInPandas.

    STUB: real decode requires image/audio libs not present in this
    container. ``strict=True`` raises NotImplementedError (the production
    posture until a decoder is wired); otherwise emits deterministic fake
    features derived from the payload bytes so downstream plumbing
    (schema, batch shape, partitioning) is fully exercised.
    """

    def run(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "media decode stub: no image/audio codecs in this environment"
                )
            out = {
                "doc_id": pdf[id_col].astype("int64"),
                "modality": pdf["meta"].map(lambda m: m["modality"]),
                "n_bytes": pdf["meta"].map(lambda m: int(m["n_bytes"])),
            }
            # deterministic fake decode: dimensions + features from sha256
            dims_w, dims_h, feats = [], [], []
            for p in pdf["payload"]:
                digest = hashlib.sha256(bytes(p)).digest()
                dims_w.append(64 + digest[0] % 64)
                dims_h.append(64 + digest[1] % 64)
                feats.append(
                    [round(b / 255.0, 6) for b in digest[2 : 2 + feature_dim]]
                )
            out["width"] = pd.Series(dims_w, dtype="int32")
            out["height"] = pd.Series(dims_h, dtype="int32")
            out["features"] = pd.Series(feats)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=DECODED_FEATURE_SCHEMA)
