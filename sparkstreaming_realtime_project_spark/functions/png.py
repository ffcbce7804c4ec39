"""Minimal PNG codec (zlib + struct + numpy — no third-party image libs).

Exists so the multimodal decode/resize operators have a REAL pixel path
that runs anywhere PySpark runs: ``decoder="png"`` in
``operators/multimodal.py`` decodes actual PNG bytes with this module
(the Pillow path stays opt-in for full-format coverage; the fake path
stays the engine-replayable oracle default).

Scope is deliberately tight — the subset every PNG writer emits and a
data pipeline actually meets in bulk screenshots/thumbnails:

- 8-bit grayscale (color type 0) and 8-bit RGB (color type 2)
- non-interlaced, all five scanline filters on decode (None/Sub/Up/
  Average/Paeth — real encoders use them all)
- encode always writes filter 0 rows and a fixed zlib level, so
  identical pixels yield identical bytes (determinism is a feature:
  re-encoded payloads are content-addressable/dedupable)
- chunk CRCs are VERIFIED on decode (a truncated or bit-flipped file
  raises ValueError — a decode error must surface, never produce
  garbage)

Hot paths are numpy-vectorized (the per-pixel work runs inside
mapInPandas batches, where per-element Python is the 10-100× tax):
defilter for types 0/1/2 is whole-row array math (Sub is a per-channel
cumulative sum mod 256), the luma histogram is one bincount, and the
nearest resize is one fancy-index gather. Filter types 3/4 (Average/
Paeth) keep a scalar inner loop because each pixel depends on the
just-reconstructed left neighbor — inherently serial in x; they never
occur on this module's own output (encode writes filter 0 only).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3}  # color type -> samples per pixel


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: bytes, width: int, height: int, color_type: int = 0) -> bytes:
    """Row-major 8-bit pixels -> PNG bytes (filter 0, zlib level 6)."""
    ch = _CHANNELS.get(color_type)
    if ch is None:
        raise ValueError(f"unsupported color type {color_type}")
    if len(pixels) != width * height * ch:
        raise ValueError(
            f"pixel buffer {len(pixels)} != {width}x{height}x{ch}"
        )
    stride = width * ch
    arr = np.frombuffer(bytes(pixels), dtype=np.uint8).reshape(height, stride)
    raw = np.concatenate(
        [np.zeros((height, 1), dtype=np.uint8), arr], axis=1
    ).tobytes()  # filter byte 0 prepended to every row in one shot
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, int, bytearray]:
    """PNG bytes -> (width, height, channels, row-major 8-bit pixels).

    Handles all five scanline filters; verifies every chunk's declared
    length and CRC; rejects interlaced images and bit depths / color
    types outside the supported subset with ValueError (a decode error
    must surface, never produce garbage)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = color_type = -1
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        if pos + 12 + length > len(data):
            raise ValueError(
                f"corrupt PNG: chunk {tag!r} declares {length} bytes past EOF"
            )
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"corrupt PNG: CRC mismatch in chunk {tag!r}")
        pos += 12 + length  # length + tag + payload + crc
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            if interlace:
                raise ValueError("interlaced PNG not supported")
            if comp or filt:
                raise ValueError("nonstandard compression/filter method")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if width < 0:
        raise ValueError("missing IHDR")
    ch = _CHANNELS[color_type]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("corrupt PNG: decompressed size mismatch")
    mat = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    ftypes = mat[:, 0]
    lines = mat[:, 1:]
    if (ftypes > 4).any():
        bad = int(ftypes[ftypes > 4][0])
        raise ValueError(f"unknown scanline filter {bad}")
    if not ftypes.any():
        # all rows filter 0 (what encode_png emits): plain memcpy
        return width, height, ch, bytearray(lines.tobytes())
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        f = int(ftypes[y])
        line = lines[y].astype(np.int32)
        if f == 0:
            cur = line
        elif f == 1:  # Sub: recon[x] = line[x] + recon[x-ch] — a
            # per-channel prefix sum; mod distributes over the sum, so
            # cumsum (in int64, overflow-free) then % 256 is exact
            cur = (
                line.reshape(width, ch)
                .cumsum(axis=0, dtype=np.int64)
                .reshape(stride)
                % 256
            )
        elif f == 2:  # Up: whole-row vector add against the prior row
            cur = (line + prev) % 256
        else:
            # Average (3) / Paeth (4): each pixel needs the RECONSTRUCTED
            # left neighbor — serial in x by construction, so scalar here
            ln = bytearray(lines[y].tobytes())
            pv = bytearray(out[y - 1].tobytes()) if y else bytearray(stride)
            if f == 3:
                for i in range(stride):
                    left = ln[i - ch] if i >= ch else 0
                    ln[i] = (ln[i] + ((left + pv[i]) >> 1)) & 0xFF
            else:
                for i in range(stride):
                    left = ln[i - ch] if i >= ch else 0
                    ul = pv[i - ch] if i >= ch else 0
                    ln[i] = (ln[i] + _paeth(left, pv[i], ul)) & 0xFF
            cur = np.frombuffer(bytes(ln), dtype=np.uint8).astype(np.int32)
        out[y] = cur.astype(np.uint8)
        prev = out[y].astype(np.int32)
    return width, height, ch, bytearray(out.tobytes())


def luma_histogram(
    width: int, height: int, channels: int, pixels: bytearray, bins: int
) -> list[float]:
    """Normalized ``bins``-bin luminance histogram — the SAME binning the
    PIL decode path computes (slice the 256-level histogram into
    ``256 // bins``-wide bins; when bins does not divide 256 the
    partial tail ABOVE ``bins * step`` is dropped and the counts
    normalize over what was kept, exactly like summing
    ``hist[i*step:(i+1)*step]`` slices). RGB collapses with PIL's exact
    rounded fixed-point ITU-R 601 luma, L = (R*19595 + G*38470 + B*7471
    + 0x8000) >> 16, so decoder='png' and decoder='pil' histograms agree
    bin-for-bin on RGB inputs (not just grayscale)."""
    if not 1 <= bins <= 256:
        raise ValueError(f"bins must be in [1, 256], got {bins}")
    step = 256 // bins
    cap = step * bins  # luma >= cap falls in PIL's dropped tail slice
    px = np.frombuffer(bytes(pixels), dtype=np.uint8)
    if channels == 1:
        l8 = px.astype(np.int64)
    else:
        rgb = px.reshape(-1, 3).astype(np.int64)
        l8 = (rgb[:, 0] * 19595 + rgb[:, 1] * 38470 + rgb[:, 2] * 7471 + 0x8000) >> 16
    counts = np.bincount(l8, minlength=256)[:cap].reshape(bins, step).sum(axis=1)
    total = int(counts.sum()) or 1.0
    return [round(c / total, 6) for c in counts.tolist()]


def resize_nearest(
    width: int,
    height: int,
    channels: int,
    pixels: bytearray,
    new_w: int,
    new_h: int,
) -> bytearray:
    """Nearest-neighbor resize (floor source index mapping) — the
    deterministic, interpolation-free choice: every engine/library
    implements it identically, so resized payloads stay reproducible.
    One numpy gather: row indices ``y*H//newH``, column ``x*W//newW``."""
    arr = np.frombuffer(bytes(pixels), dtype=np.uint8).reshape(
        height, width, channels
    )
    sy = (np.arange(new_h, dtype=np.int64) * height) // new_h
    sx = (np.arange(new_w, dtype=np.int64) * width) // new_w
    return bytearray(arr[sy][:, sx].tobytes())
