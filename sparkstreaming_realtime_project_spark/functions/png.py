"""Minimal pure-stdlib PNG codec (zlib + struct, no third-party deps).

Exists so the multimodal decode/resize operators have a REAL pixel path
that runs anywhere Python runs: ``decoder="png"`` in
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

Everything is bytes-in/bytes-out and row-major ``bytearray`` pixels —
cheap enough per payload for a mapInPandas batch loop, and zero install
footprint on executors.
"""

from __future__ import annotations

import struct
import zlib

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
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter type 0 = None
        raw += pixels[y * stride : (y + 1) * stride]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
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

    Handles all five scanline filters; rejects interlaced images and
    bit depths / color types outside the supported subset with
    ValueError (a decode error must surface, never produce garbage)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = color_type = -1
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
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
    out = bytearray(stride * height)
    prev = bytearray(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown scanline filter {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return width, height, ch, out


def luma_histogram(
    width: int, height: int, channels: int, pixels: bytearray, bins: int
) -> list[float]:
    """Normalized ``bins``-bin luminance histogram — the SAME binning the
    PIL decode path computes (slice the 256-level histogram into
    ``256 // bins``-wide bins; when bins does not divide 256 the
    partial tail ABOVE ``bins * step`` is dropped and the counts
    normalize over what was kept, exactly like summing
    ``hist[i*step:(i+1)*step]`` slices). RGB collapses with PIL's
    integer ITU-R 601 luma: L = (299R+587G+114B)/1000."""
    if not 1 <= bins <= 256:
        raise ValueError(f"bins must be in [1, 256], got {bins}")
    counts = [0] * bins
    step = 256 // bins
    cap = step * bins  # luma >= cap falls in PIL's dropped tail slice
    if channels == 1:
        for v in pixels:
            if v < cap:
                counts[v // step] += 1
    else:
        for i in range(0, len(pixels), 3):
            l8 = (
                pixels[i] * 299 + pixels[i + 1] * 587 + pixels[i + 2] * 114
            ) // 1000
            if l8 < cap:
                counts[l8 // step] += 1
    total = sum(counts) or 1.0
    return [round(c / total, 6) for c in counts]


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
    implements it identically, so resized payloads stay reproducible."""
    out = bytearray(new_w * new_h * channels)
    for y in range(new_h):
        sy = y * height // new_h
        src_row = sy * width * channels
        dst_row = y * new_w * channels
        for x in range(new_w):
            sx = x * width // new_w
            s = src_row + sx * channels
            d = dst_row + x * channels
            out[d : d + channels] = pixels[s : s + channels]
    return out
