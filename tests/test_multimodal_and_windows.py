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


# pure-stdlib PNG codec path ---------------------------------------------


def _gradient_png(w=20, h=12):
    """Deterministic RGB test image: horizontal R ramp, vertical G ramp,
    checkerboard B."""
    from sparkstreaming_realtime_project_spark.functions import png as pngc

    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes(
                [(x * 255) // max(w - 1, 1), (y * 255) // max(h - 1, 1),
                 255 if (x + y) % 2 else 0]
            )
    return pngc.encode_png(bytes(px), w, h, color_type=2), bytes(px)


def test_png_codec_roundtrip():
    from sparkstreaming_realtime_project_spark.functions import png as pngc

    data, px = _gradient_png()
    w, h, ch, out = pngc.decode_png(data)
    assert (w, h, ch) == (20, 12, 3)
    assert bytes(out) == px
    # grayscale too
    gpx = bytes(range(16)) * 16  # 16x16 gray
    gdata = pngc.encode_png(gpx, 16, 16, color_type=0)
    w, h, ch, out = pngc.decode_png(gdata)
    assert (w, h, ch, bytes(out)) == (16, 16, 1, gpx)
    # determinism: same pixels -> same bytes
    assert pngc.encode_png(gpx, 16, 16, 0) == gdata


def test_png_decoder_unfilters_all_scanline_filters():
    """Hand-filter each row with types 1-4 and check the decoder
    reconstructs the original pixels (real encoders emit all five)."""
    import struct
    import zlib

    from sparkstreaming_realtime_project_spark.functions import png as pngc

    w, h, ch = 7, 5, 3
    px = bytes((x * 41 + 7) % 256 for x in range(w * h * ch))
    stride = w * ch
    rows = [bytearray(px[y * stride : (y + 1) * stride]) for y in range(h)]
    filtered = bytearray()
    prev = bytearray(stride)
    for y, row in enumerate(rows):
        ftype = y % 5
        filtered.append(ftype)
        enc = bytearray(row)
        if ftype == 1:
            for i in range(stride - 1, ch - 1, -1):
                enc[i] = (row[i] - row[i - ch]) & 0xFF
        elif ftype == 2:
            for i in range(stride):
                enc[i] = (row[i] - prev[i]) & 0xFF
        elif ftype == 3:
            for i in range(stride):
                left = row[i - ch] if i >= ch else 0
                enc[i] = (row[i] - ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:
            for i in range(stride):
                left = row[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                enc[i] = (row[i] - pngc._paeth(left, prev[i], ul)) & 0xFF
        filtered += enc
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + pngc._chunk(b"IHDR", ihdr)
        + pngc._chunk(b"IDAT", zlib.compress(bytes(filtered)))
        + pngc._chunk(b"IEND", b"")
    )
    dw, dh, dch, out = pngc.decode_png(data)
    assert (dw, dh, dch) == (w, h, ch)
    assert bytes(out) == px


def _png_payload_frame(spark, n=6):
    from sparkstreaming_realtime_project_spark.functions import png as pngc

    rows = []
    for i in range(n):
        w, h = 8 + i, 6 + i
        px = bytes(((x + i * 13) % 256) for x in range(w * h))
        data = pngc.encode_png(px, w, h, color_type=0)
        rows.append((i, bytearray(data)))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    return df.withColumn(
        "meta",
        F.struct(
            F.lit("image").alias("modality"),
            F.lit("image/png").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.sha2(F.col("payload"), 256).alias("sha256"),
            F.octet_length(F.col("payload")).cast("long").alias("n_bytes"),
        ),
    )


def test_decode_features_png_real_decode(spark):
    """decoder='png' decodes REAL PNG bytes through the mapInPandas
    plumbing: IHDR dims come back, histogram is normalized, and a
    corrupt payload errors instead of faking."""
    df = _png_payload_frame(spark)
    out = {r["doc_id"]: r for r in
           mm.decode_features(df, decoder="png", feature_dim=8).collect()}
    for i, r in out.items():
        assert (r["width"], r["height"]) == (8 + i, 6 + i)
        # bins round to 1e-6 each, so the sum can be off by bins*5e-7
        assert abs(sum(r["features"]) - 1.0) < 8 * 5e-7 + 1e-9
    bad = spark.createDataFrame(
        [(0, bytearray(b"not a png"))], "doc_id long, payload binary"
    ).withColumn(
        "meta",
        F.struct(
            F.lit("image").alias("modality"), F.lit("x").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit("h").alias("sha256"), F.lit(9).cast("long").alias("n_bytes"),
        ),
    )
    with pytest.raises(Exception):
        mm.decode_features(bad, decoder="png").collect()


def test_resize_png_real_roundtrip(spark):
    """decoder='png' resize: output is VALID PNG at the target size whose
    pixels are the nearest-neighbor mapping of the source, and the
    re-encode is deterministic."""
    from sparkstreaming_realtime_project_spark.functions import png as pngc

    df = _png_payload_frame(spark, n=3)
    out = {r["doc_id"]: r for r in
           mm.resize_images(df, 4, 3, decoder="png").collect()}
    src = {r["doc_id"]: bytes(r["payload"]) for r in df.collect()}
    for i, r in out.items():
        w, h, ch, px = pngc.decode_png(bytes(r["resized_payload"]))
        assert (w, h, ch) == (4, 3, 1)
        sw, sh, sch, spx = pngc.decode_png(src[i])
        want = pngc.resize_nearest(sw, sh, sch, spx, 4, 3)
        assert bytes(px) == bytes(want)
    again = {r["doc_id"]: bytes(r["resized_payload"]) for r in
             mm.resize_images(df, 4, 3, decoder="png").collect()}
    assert {i: bytes(out[i]["resized_payload"]) for i in out} == again


def test_png_histogram_non_dividing_bins(spark):
    """feature_dim that doesn't divide 256 must not crash (PIL-identical
    tail-drop semantics): bins sum to ~1 and high-luma pixels land in
    the last KEPT bin, not out of range."""
    from sparkstreaming_realtime_project_spark.functions import png as pngc

    px = bytes([255, 250, 249, 0, 10, 100] * 4)  # includes tail lumas
    hist = pngc.luma_histogram(4, 6, 1, bytearray(px), 10)
    assert len(hist) == 10
    assert abs(sum(hist) - 1.0) < 10 * 5e-7 + 1e-9
    df = _png_payload_frame(spark, n=2)
    out = mm.decode_features(df, decoder="png", feature_dim=10).collect()
    assert all(len(r["features"]) == 10 for r in out)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pngc.luma_histogram(1, 1, 1, bytearray(b"\x00"), 300)


def test_png_crc_and_truncation_detected():
    """Corruption must SURFACE (never garbage): a bit-flip anywhere in a
    chunk breaks its CRC -> ValueError; a chunk length pointing past EOF
    -> ValueError; an untouched file still decodes."""
    from sparkstreaming_realtime_project_spark.functions import png as pngc

    data, px = _gradient_png()
    w, h, ch, out = pngc.decode_png(data)  # pristine decodes
    assert bytes(out) == px
    # flip one bit inside the IDAT payload (sizes stay consistent, so
    # only the CRC can catch it)
    idat_at = data.index(b"IDAT")
    corrupt = bytearray(data)
    corrupt[idat_at + 10] ^= 0x40
    with pytest.raises(ValueError, match="CRC mismatch"):
        pngc.decode_png(bytes(corrupt))
    # declared chunk length past EOF
    truncated = bytearray(data)
    truncated[idat_at - 4 : idat_at] = (2**24).to_bytes(4, "big")
    with pytest.raises(ValueError, match="past EOF"):
        pngc.decode_png(bytes(truncated))


def test_png_luma_matches_pil_fixed_point():
    """RGB luma uses PIL's exact rounded fixed-point convert('L')
    formula — (R*19595 + G*38470 + B*7471 + 0x8000) >> 16 — so
    decoder='png' and decoder='pil' histograms agree bin-for-bin on RGB
    inputs, not just grayscale."""
    from sparkstreaming_realtime_project_spark.functions import png as pngc

    data, px = _gradient_png()
    w, h, ch, out = pngc.decode_png(data)
    hist = pngc.luma_histogram(w, h, ch, out, 16)
    want = [0] * 16
    for i in range(0, len(px), 3):
        l8 = (px[i] * 19595 + px[i + 1] * 38470 + px[i + 2] * 7471 + 0x8000) >> 16
        want[l8 // 16] += 1
    total = sum(want)
    assert hist == [round(c / total, 6) for c in want]


def test_png_luma_pil_cross_check():
    """Pillow cross-check of the RGB luma histogram (opt-in, like
    decoder='pil'; the formula-level twin above always runs)."""
    try:
        import io

        from PIL import Image
    except ImportError:
        pytest.skip("Pillow not installed in this environment")
    from sparkstreaming_realtime_project_spark.functions import png as pngc

    data, px = _gradient_png()
    w, h, ch, out = pngc.decode_png(data)
    hist = pngc.luma_histogram(w, h, ch, out, 16)
    img = Image.open(io.BytesIO(data)).convert("L")
    pil_hist = img.histogram()
    pil_binned = [sum(pil_hist[i * 16 : (i + 1) * 16]) for i in range(16)]
    total = sum(pil_binned)
    assert hist == [round(c / total, 6) for c in pil_binned]


def test_wav_codec_roundtrip_and_chunk_walk():
    """encode->decode is sample-exact for mono and interleaved stereo;
    the decoder's generic chunk walk skips unknown (odd-sized, padded)
    chunks; structural corruption raises instead of returning garbage."""
    import struct

    import numpy as np

    from sparkstreaming_realtime_project_spark.functions import wav

    rng = np.random.default_rng(7)
    s = rng.integers(-32768, 32768, size=1000, dtype=np.int16)
    data = wav.encode_wav(s, 16000)
    assert len(data) == 44 + 2 * len(s)  # canonical header layout
    rate, ch, out = wav.decode_wav(data)
    assert (rate, ch) == (16000, 1) and np.array_equal(out, s)

    stereo = wav.encode_wav(s, 44100, n_channels=2)
    rate, ch, out = wav.decode_wav(stereo)
    assert (rate, ch) == (44100, 2) and np.array_equal(out, s)

    # unknown odd-sized chunk between fmt and data (writer adds INFO):
    # the walk must skip it by declared size + RIFF pad byte
    fmt_chunk, data_chunk = data[12 : 12 + 24], data[12 + 24 :]
    lst = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = (
        b"RIFF"
        + struct.pack("<I", 4 + len(fmt_chunk) + len(lst) + len(data_chunk))
        + b"WAVE" + fmt_chunk + lst + data_chunk
    )
    rate, ch, out = wav.decode_wav(spliced)
    assert (rate, ch) == (16000, 1) and np.array_equal(out, s)

    for bad in (data[:30], b"RIFX" + data[4:], data[:40]):
        with pytest.raises(ValueError):
            wav.decode_wav(bad)
    # data-before-fmt is a structural lie, not a skippable quirk
    with pytest.raises(ValueError):
        wav.decode_wav(
            b"RIFF" + struct.pack("<I", 4 + len(data_chunk)) + b"WAVE" + data_chunk
        )

    assert np.array_equal(wav.decimate(s, 4), s[::4])
    st = wav.pcm_stats(s)
    assert st["sample_sum"] == int(s.astype(np.int64).sum())
    assert st["abs_peak"] == int(np.abs(s.astype(np.int64)).max())


def test_wav_roundtrip_report_matches_digest_math(spark):
    """The mapInPandas report's integers equal a driver-side replay of
    the digest math — the same invariant the DuckDB oracle checks,
    pinned here against hand-rolled hashlib/numpy (no Spark, no SQL)."""
    import hashlib

    import numpy as np

    docs = spark.createDataFrame(
        [(1, "alpha"), (2, "beta beta"), (3, "")], "doc_id long, text string"
    )
    mmrows = {
        r["doc_id"]: r
        for r in mm.wav_roundtrip_report(
            mm.attach_binary_payload(docs, "text", modality="audio"), "doc_id"
        ).collect()
    }
    for did, text in [(1, "alpha"), (2, "beta beta"), (3, "")]:
        d = hashlib.sha256(text.encode()).digest()
        rate = 8000 * (1 + d[0] % 3)
        n = 256 + ((d[1] << 8 | d[2]) % 1024)
        p = np.frombuffer(d, dtype=">u2").astype(np.int64) - 32768
        want_sum = (n // 16) * int(p.sum()) + int(p[: n % 16].sum())
        r = mmrows[did]
        assert r["sample_rate"] == rate and r["n_samples"] == n
        assert r["n_bytes"] == 44 + 2 * n
        assert r["duration_ms"] == n * 1000 // rate
        assert r["sample_sum"] == want_sum
        assert r["sample_min"] == int(p.min())
        assert r["sample_max"] == int(p.max())


def test_wav_codec_cross_validates_against_stdlib_wave():
    """Independent-oracle check: bytes our encoder writes must decode
    correctly in Python's stdlib `wave` module (rate/channels/width/
    frames all agree), and bytes `wave` writes must decode correctly in
    our chunk walk — interop both directions, not just self-roundtrip."""
    import io
    import wave as stdwave

    import numpy as np

    from sparkstreaming_realtime_project_spark.functions import wav

    rng = np.random.default_rng(13)
    s = rng.integers(-32768, 32768, size=777, dtype=np.int16)

    # ours -> stdlib
    data = wav.encode_wav(s, 22050, n_channels=1)
    with stdwave.open(io.BytesIO(data), "rb") as r:
        assert r.getframerate() == 22050
        assert r.getnchannels() == 1
        assert r.getsampwidth() == 2
        assert r.getnframes() == len(s)
        back = np.frombuffer(r.readframes(len(s)), dtype="<i2")
    assert np.array_equal(back, s)

    # stdlib -> ours
    buf = io.BytesIO()
    with stdwave.open(buf, "wb") as wr:
        wr.setnchannels(2)
        wr.setsampwidth(2)
        wr.setframerate(8000)
        wr.writeframes(s[:776].tobytes())  # 388 stereo frames
    rate, ch, out = wav.decode_wav(buf.getvalue())
    assert (rate, ch) == (8000, 2)
    assert np.array_equal(out, s[:776])
