"""Minimal WAV (RIFF/WAVE) codec — struct + numpy, no audio libraries.

Exists so the multimodal audio operators have a REAL byte path the way
``functions/png.py`` gives images one: ``operators/multimodal.py``
encodes and decodes actual RIFF/WAVE bytes with this module, while the
fake path stays the engine-replayable oracle default. (The reference
project pipes opaque event payloads through Kafka without decoding
them — `MyKafkaUtils.scala:38-114` treats the value as bytes; an
analytics engine for multimodal training data must additionally parse
the container formats those bytes actually use, WAV being the simplest
real one.)

Scope is the subset bulk speech/audio corpora actually ship:

- PCM (format tag 1), 16-bit signed little-endian samples
- mono or interleaved multi-channel
- decode walks the chunk list generically (``fmt `` before ``data``,
  unknown chunks — LIST/INFO/fact/cue — are skipped by their declared
  size, including the RIFF odd-size pad byte), so files from arbitrary
  writers parse; truncated or malformed containers raise ValueError —
  a decode error must surface, never produce garbage
- encode writes the canonical 44-byte header + data, so identical
  samples yield identical bytes (determinism is a feature: re-encoded
  payloads are content-addressable/dedupable)

Hot paths are numpy-vectorized: samples (de)serialize as one
``frombuffer``/``tobytes`` on an int16 array; decimation is a stride
slice; RMS/peak are array reductions. Per-element Python never touches
a sample (the mapInPandas 10-100x tax).
"""

from __future__ import annotations

import struct

import numpy as np

_PCM = 1
_BITS = 16


def encode_wav(
    samples: np.ndarray, sample_rate: int, n_channels: int = 1
) -> bytes:
    """int16 samples (frame-major, channel-interleaved) -> WAV bytes."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim != 1:
        raise ValueError("samples must be a flat interleaved array")
    if n_channels < 1 or len(s) % n_channels:
        raise ValueError(
            f"{len(s)} samples not a whole number of {n_channels}-channel frames"
        )
    if sample_rate <= 0:
        raise ValueError(f"bad sample rate {sample_rate}")
    data = s.tobytes()
    block_align = n_channels * _BITS // 8
    fmt = struct.pack(
        "<HHIIHH",
        _PCM,
        n_channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        _BITS,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """WAV bytes -> (sample_rate, n_channels, int16 interleaved array).

    Generic chunk walk: any chunk other than ``fmt ``/``data`` is
    skipped by its declared (pad-rounded) size; structural lies —
    short header, bad magic, declared sizes past EOF, data before fmt,
    non-PCM or non-16-bit streams — raise ValueError."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    riff_size = struct.unpack_from("<I", data, 4)[0]
    if 8 + riff_size > len(data):
        raise ValueError("RIFF size exceeds buffer")
    pos, end = 12, 8 + riff_size
    rate = channels = None
    samples = None
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body_at = pos + 8
        if body_at + size > end:
            raise ValueError(f"chunk {tag!r} size {size} exceeds buffer")
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            fmt_tag, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", data, body_at
            )
            if fmt_tag != _PCM:
                raise ValueError(f"unsupported format tag {fmt_tag}")
            if bits != _BITS:
                raise ValueError(f"unsupported bit depth {bits}")
        elif tag == b"data":
            if rate is None:
                raise ValueError("data chunk before fmt chunk")
            if size % 2:
                raise ValueError("odd data chunk for 16-bit samples")
            samples = np.frombuffer(data, dtype="<i2", count=size // 2, offset=body_at)
        pos = body_at + size + (size & 1)  # RIFF pads odd chunks
    if samples is None:
        raise ValueError("no data chunk")
    if len(samples) % channels:
        raise ValueError("data chunk not a whole number of frames")
    return int(rate), int(channels), samples


def decimate(samples: np.ndarray, factor: int) -> np.ndarray:
    """Naive 1/factor downsample (every factor-th sample). The stub
    stand-in for a real polyphase resampler — the Spark-side shape
    (payload in, shorter payload out) is what the operators test."""
    if factor < 1:
        raise ValueError(f"bad decimation factor {factor}")
    return np.asarray(samples, dtype="<i2")[::factor]


def pcm_stats(samples: np.ndarray) -> dict:
    """Exact integer stats over int16 samples (int64 accumulators —
    no float in sight, so an external SQL oracle matches bit-for-bit)."""
    s = np.asarray(samples, dtype=np.int64)
    if len(s) == 0:
        return {"n_samples": 0, "sample_sum": 0, "sample_min": 0, "sample_max": 0, "abs_peak": 0}
    return {
        "n_samples": int(len(s)),
        "sample_sum": int(s.sum()),
        "sample_min": int(s.min()),
        "sample_max": int(s.max()),
        "abs_peak": int(np.abs(s).max()),
    }
