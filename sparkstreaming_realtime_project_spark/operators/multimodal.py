"""Multimodal columns (north-star extension): opaque binary payloads with
typed metadata, processed by Arrow-batched pandas functions.

Convention (schemas.MULTIMODAL_META_SCHEMA): a multimodal table carries
``payload: binary`` + ``meta: struct(modality, mime, width, height,
duration_ms, sha256, n_bytes)``. Metadata derivation (hash, byte length,
modality tagging) is pure JVM expressions; the *decode* step (image
decode, resize, audio frames) is a ``mapInPandas`` operator whose Spark
plumbing — schema, batching, partition alignment — is real. Three pixel
paths per operator: ``decoder="fake"`` (deterministic sha256-derived
output, the engine-replayable oracle default; NotImplementedError
behind ``strict=True``), ``decoder="png"`` (REAL decode/resize/encode
via the pure-stdlib PNG codec in functions/png.py — runs and is tested
in this container), and ``decoder="pil"`` (Pillow, opt-in, full-format
coverage where installed).

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
    BinaryType,
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
    df: DataFrame,
    id_col: str = "doc_id",
    strict: bool = False,
    feature_dim: int = 8,
    decoder: str = "fake",
) -> DataFrame:
    """Decode/feature-extract stage as mapInPandas.

    ``decoder`` picks the pixel path:

    - ``"fake"`` (default): deterministic features derived from the
      payload sha256 — no codecs needed, engine-replayable (the DuckDB
      oracle checks this path), exercises schema/batching/partitioning.
    - ``"pil"``: real image decode via Pillow when the payload IS image
      bytes — width/height from the decoded image, features = the
      ``feature_dim``-bin normalized grayscale histogram. Import happens
      INSIDE the task (executors need Pillow, the driver plan doesn't);
      missing Pillow or undecodable bytes raise in the task, surfacing
      as a job error rather than silent fake output. Opt-in by
      parameter, never auto-detected: output must not depend on what
      happens to be installed.

    - ``"png"``: real PNG decode via the pure-stdlib codec
      (``functions/png.py`` — zlib + struct, zero executor install
      footprint): width/height from IHDR, features = the same
      ``feature_dim``-bin normalized luminance histogram the PIL path
      computes. Undecodable bytes raise in the task. This is the real
      pixel path that runs in THIS environment and is exercised by
      tests; PIL stays opt-in for full-format coverage.

    ``strict=True`` with the fake decoder raises NotImplementedError —
    the production posture until a real decoder is chosen.
    """
    if decoder not in ("fake", "pil", "png"):
        raise ValueError(f"unknown decoder {decoder!r}")

    # One shared batch scaffold; each decoder contributes only its
    # per-payload pixel function bytes -> (width, height, features).
    # make_decode builds the function INSIDE the task so executor-side
    # imports (Pillow) happen there, not at plan time.

    def make_fake():
        import hashlib

        def decode(raw: bytes):
            digest = hashlib.sha256(raw).digest()
            return (
                64 + digest[0] % 64,
                64 + digest[1] % 64,
                [round(b / 255.0, 6) for b in digest[2 : 2 + feature_dim]],
            )

        return decode

    def make_png():
        from ..functions import png as _png

        def decode(raw: bytes):
            w, h, ch, px = _png.decode_png(raw)
            return w, h, _png.luma_histogram(w, h, ch, px, feature_dim)

        return decode

    def make_pil():
        import io

        from PIL import Image  # executor-side dependency

        def decode(raw: bytes):
            img = Image.open(io.BytesIO(raw))
            hist = img.convert("L").histogram()  # 256 bins
            step = 256 // feature_dim
            bins = [
                float(sum(hist[i * step : (i + 1) * step]))
                for i in range(feature_dim)
            ]
            total = sum(bins) or 1.0
            return img.width, img.height, [round(b / total, 6) for b in bins]

        return decode

    makers = {"fake": make_fake, "png": make_png, "pil": make_pil}
    maker = makers[decoder]
    fake = decoder == "fake"

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        decode = maker()
        for pdf in batches:
            if fake and strict:
                raise NotImplementedError(
                    "media decode stub: no image/audio codecs in this environment"
                )
            dims_w, dims_h, feats = [], [], []
            for p in pdf["payload"]:
                w, h, f = decode(bytes(p))
                dims_w.append(w)
                dims_h.append(h)
                feats.append(f)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "modality": pdf["meta"].map(lambda m: m["modality"]),
                    "n_bytes": pdf["meta"].map(lambda m: int(m["n_bytes"])),
                    "width": pd.Series(dims_w, dtype="int32"),
                    "height": pd.Series(dims_h, dtype="int32"),
                    "features": pd.Series(feats),
                }
            )

    return df.mapInPandas(run, schema=DECODED_FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("resized_payload", BinaryType()),
        StructField("resized_n_bytes", LongType()),
    ]
)


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    id_col: str = "doc_id",
    strict: bool = False,
    decoder: str = "fake",
) -> DataFrame:
    """Resize stage as mapInPandas over (payload, meta) rows.

    ``decoder="fake"`` (default): deterministic payload of
    target_w*target_h bytes tiled from the source sha256 — no codecs
    needed (the oracle-checked path; ``strict=True`` raises
    NotImplementedError, the production posture until a decoder is
    chosen). ``decoder="pil"``: real Pillow decode -> resize -> PNG
    re-encode; Pillow imports inside the task, errors surface as job
    failures. ``decoder="png"``: real decode -> nearest-neighbor resize
    -> deterministic PNG re-encode via the pure-stdlib codec
    (functions/png.py) — the real pixel path that runs in THIS
    environment. Opt-in by parameter, never auto-detected.

    The Spark plumbing is identical either way: Arrow batches of binary
    payloads in, binary payloads out, peak memory one batch per core; at
    100 TB this runs scan -> narrow map -> write with the payload never
    entering a shuffle."""
    if decoder not in ("fake", "pil", "png"):
        raise ValueError(f"unknown decoder {decoder!r}")

    # Same shared-scaffold shape as decode_features: each decoder is one
    # per-payload function bytes -> resized payload bytes, built inside
    # the task so executor-side imports happen there.

    def make_fake():
        import hashlib

        n = target_w * target_h

        def resize(raw: bytes) -> bytes:
            digest = hashlib.sha256(raw).digest()
            return (digest * (n // len(digest) + 1))[:n]

        return resize

    def make_png():
        from ..functions import png as _png

        def resize(raw: bytes) -> bytes:
            w, h, ch, px = _png.decode_png(raw)
            rz = _png.resize_nearest(w, h, ch, px, target_w, target_h)
            return _png.encode_png(
                bytes(rz), target_w, target_h, 0 if ch == 1 else 2
            )

        return resize

    def make_pil():
        import io

        from PIL import Image  # executor-side dependency

        def resize(raw: bytes) -> bytes:
            img = Image.open(io.BytesIO(raw))
            buf = io.BytesIO()
            img.resize((target_w, target_h)).save(buf, format="PNG")
            return buf.getvalue()

        return resize

    makers = {"fake": make_fake, "png": make_png, "pil": make_pil}
    maker = makers[decoder]
    fake = decoder == "fake"

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        resize = maker()
        for pdf in batches:
            if fake and strict:
                raise NotImplementedError(
                    "image resize stub: no codecs in this environment"
                )
            payloads = [resize(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": pd.Series([target_w] * len(pdf), dtype="int32"),
                    "height": pd.Series([target_h] * len(pdf), dtype="int32"),
                    "resized_payload": payloads,
                    "resized_n_bytes": pd.Series(
                        [len(d) for d in payloads], dtype="int64"
                    ),
                }
            )

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_sha256", StringType()),
    ]
)


def sample_frames(
    df: DataFrame,
    n_frames: int = 4,
    id_col: str = "doc_id",
    strict: bool = False,
) -> DataFrame:
    """Frame-sampling stage (video -> n_frames rows) as mapInPandas.

    One input row fans out to ``n_frames`` output rows — the 1:N shape a
    real video pipeline has. STUB frame extraction (``strict=True``
    raises); the deterministic fake derives each frame hash from
    sha256(payload || ':frame:' || frame_idx) so fan-out, schema, and
    ordering are exercised end to end (the suffix is UTF-8 text, so any
    engine with a string sha256 — e.g. the DuckDB oracle — replays it)."""

    def run(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "frame sampling stub: no video codecs in this environment"
                )
            ids, idxs, hashes = [], [], []
            for doc_id, p in zip(pdf[id_col], pdf["payload"]):
                for i in range(n_frames):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    hashes.append(
                        hashlib.sha256(
                            bytes(p) + f":frame:{i}".encode("utf-8")
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_sha256": hashes,
                }
            )

    return df.mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)


PNG_ROUNDTRIP_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_pixels", LongType()),
        StructField("pixel_sum", LongType()),
    ]
)


def png_roundtrip_report(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL PNG encode -> decode through the pure-stdlib codec, verified
    end to end by an external oracle: per payload, a grayscale image is
    synthesized (dims from sha256 bytes, pixels = the digest tiled to
    w*h), encoded to actual PNG bytes, decoded back, and the DECODED
    pixel sum emitted. The sum is an exact integer a SQL oracle
    recomputes from the 32 digest bytes alone — any corruption in the
    codec (filtering, zlib framing, tiling) breaks the match. This is
    the real-pixel-path complement to the fake-decoder entries: same
    mapInPandas plumbing, but the bytes on the wire are a valid PNG."""

    def run(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        from ..functions import png as _png

        for pdf in batches:
            ids, ws, hs, ns, sums = [], [], [], [], []
            for i, p in zip(pdf[id_col], pdf["payload"]):
                digest = hashlib.sha256(bytes(p)).digest()
                w = 64 + digest[0] % 64
                h = 64 + digest[1] % 64
                n = w * h
                pixels = (digest * (n // len(digest) + 1))[:n]
                data = _png.encode_png(pixels, w, h, color_type=0)
                dw, dh, dch, out = _png.decode_png(data)
                if (dw, dh, dch) != (w, h, 1):
                    raise ValueError("png roundtrip corrupted dimensions")
                ids.append(int(i))
                ws.append(dw)
                hs.append(dh)
                ns.append(n)
                sums.append(sum(out))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "n_pixels": pd.Series(ns, dtype="int64"),
                    "pixel_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return df.mapInPandas(run, schema=PNG_ROUNDTRIP_SCHEMA)


WAV_ROUNDTRIP_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_samples", LongType()),
        StructField("n_bytes", LongType()),
        StructField("duration_ms", LongType()),
        StructField("sample_sum", LongType()),
        StructField("sample_min", LongType()),
        StructField("sample_max", LongType()),
    ]
)


def wav_roundtrip_report(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL WAV encode -> decode through the pure-numpy RIFF codec
    (functions/wav.py), verified end to end: per payload, a mono PCM16
    clip is synthesized (rate and length from sha256 bytes, samples =
    the digest's 16 big-endian byte pairs recentered to int16 and tiled
    to length), encoded to actual RIFF/WAVE bytes, decoded back through
    the generic chunk walk, and exact integer stats of the DECODED
    samples emitted. Every output is an integer a SQL oracle recomputes
    from the 32 digest bytes alone — n_bytes pins the container layout
    (44-byte canonical header + 2 bytes/sample), duration_ms the
    fmt-chunk rate, sample_sum/min/max the data chunk payload — so any
    corruption in header packing, chunk walking, or sample
    (de)serialization breaks the match. The audio complement of
    png_roundtrip_report: same mapInPandas plumbing, real bytes on the
    wire."""

    def run(batches: Iterator) -> Iterator:
        import hashlib

        import numpy as np
        import pandas as pd

        from ..functions import wav as _wav

        for pdf in batches:
            out = {k.name: [] for k in WAV_ROUNDTRIP_SCHEMA.fields}
            for i, p in zip(pdf[id_col], pdf["payload"]):
                digest = hashlib.sha256(bytes(p)).digest()
                rate = 8000 * (1 + digest[0] % 3)
                n = 256 + ((digest[1] << 8 | digest[2]) % 1024)
                pat = np.frombuffer(digest, dtype=">u2").astype(np.int64) - 32768
                samples = np.tile(pat, n // 16 + 1)[:n].astype("<i2")
                data = _wav.encode_wav(samples, rate, n_channels=1)
                drate, dch, dsamp = _wav.decode_wav(data)
                if (drate, dch, len(dsamp)) != (rate, 1, n):
                    raise ValueError("wav roundtrip corrupted header")
                st = _wav.pcm_stats(dsamp)
                out["doc_id"].append(int(i))
                out["sample_rate"].append(rate)
                out["n_samples"].append(st["n_samples"])
                out["n_bytes"].append(len(data))
                out["duration_ms"].append(n * 1000 // rate)
                out["sample_sum"].append(st["sample_sum"])
                out["sample_min"].append(st["sample_min"])
                out["sample_max"].append(st["sample_max"])
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64") for k, v in out.items()}
            )

    return df.mapInPandas(run, schema=WAV_ROUNDTRIP_SCHEMA)


WAV_RESAMPLE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("in_rate", LongType()),
        StructField("out_rate", LongType()),
        StructField("n_in", LongType()),
        StructField("n_out", LongType()),
        StructField("out_n_bytes", LongType()),
        StructField("out_sum", LongType()),
    ]
)


def resample_audio(
    df: DataFrame, factor: int, id_col: str = "doc_id"
) -> DataFrame:
    """Audio downsample stage — the audio analog of resize_images: per
    payload, synthesize the same deterministic clip as
    wav_roundtrip_report, decode it, decimate by ``factor`` (stride
    slice; a real deployment swaps in a polyphase kernel, the Spark
    plumbing is identical), re-encode at rate/factor, and re-decode the
    RESULT for the emitted stats — so the numbers certify the full
    encode->decimate->encode->decode chain, and every one of them is an
    integer a SQL oracle replays from the digest bytes (the decimated
    stream of a 16-periodic pattern is 16/gcd-periodic with stride
    positions known in closed form)."""

    def run(batches: Iterator) -> Iterator:
        import hashlib

        import numpy as np
        import pandas as pd

        from ..functions import wav as _wav

        for pdf in batches:
            out = {k.name: [] for k in WAV_RESAMPLE_SCHEMA.fields}
            for i, p in zip(pdf[id_col], pdf["payload"]):
                digest = hashlib.sha256(bytes(p)).digest()
                rate = 8000 * (1 + digest[0] % 3)
                n = 256 + ((digest[1] << 8 | digest[2]) % 1024)
                pat = np.frombuffer(digest, dtype=">u2").astype(np.int64) - 32768
                samples = np.tile(pat, n // 16 + 1)[:n].astype("<i2")
                clip = _wav.encode_wav(samples, rate, n_channels=1)
                r0, _, s0 = _wav.decode_wav(clip)
                ds = _wav.decimate(s0, factor)
                out_clip = _wav.encode_wav(ds, r0 // factor, n_channels=1)
                r1, c1, s1 = _wav.decode_wav(out_clip)
                if (r1, c1) != (r0 // factor, 1) or len(s1) != len(ds):
                    raise ValueError("resample roundtrip corrupted header")
                st = _wav.pcm_stats(s1)
                out["doc_id"].append(int(i))
                out["in_rate"].append(r0)
                out["out_rate"].append(r1)
                out["n_in"].append(n)
                out["n_out"].append(st["n_samples"])
                out["out_n_bytes"].append(len(out_clip))
                out["out_sum"].append(st["sample_sum"])
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64") for k, v in out.items()}
            )

    return df.mapInPandas(run, schema=WAV_RESAMPLE_SCHEMA)
