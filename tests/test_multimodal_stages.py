"""Resize / frame-sample mapInPandas stages + JSON quarantine ingest."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from square_etl_spark.io import json_ingest_quarantine
from square_etl_spark.operators.multimodal import (
    documents_as_media,
    resize_images,
    sample_frames,
)


def _media(spark):
    docs = spark.createDataFrame(
        [(1, "x" * 200), (2, "y" * 10), (3, "")],
        "doc_id long, text string",
    )
    return documents_as_media(docs)


def test_resize_contract(spark):
    out = {r.media_id: r for r in resize_images(_media(spark), 8, 4).collect()}
    assert set(out) == {1, 2, 3}
    for r in out.values():
        assert (r.width, r.height) == (8, 4)
        assert len(r.content) == 96  # every blob normalized to w*h*3
        assert r.channels == 1       # stub provenance (text blobs)
    assert bytes(out[2].content[:10]) == b"y" * 10  # content, then zero padding
    # schema excludes the original blob/meta — nothing heavy survives
    assert set(resize_images(_media(spark), 8, 4).columns) == {
        "media_id", "width", "height", "channels", "content",
    }


def test_frame_sampling_is_1_to_n(spark):
    out = sample_frames(_media(spark), every_n_bytes=64, max_frames=8).collect()
    per_asset = {}
    for r in out:
        per_asset.setdefault(r.media_id, []).append(r)
    assert len(per_asset[1]) == 3  # 200 bytes / 64 → 3 frames
    assert len(per_asset[2]) == 1  # short blob still yields one frame
    idxs = sorted(r.frame_idx for r in per_asset[1])
    assert idxs == [0, 1, 2]
    assert bytes(per_asset[1][0].frame) == b"x" * 64


def test_json_quarantine_splits_bad_rows(spark):
    raw = spark.createDataFrame(
        [
            (1, '{"k": 5, "state": "IN_STOCK"}'),
            (2, "not json at all {{{"),
            (3, None),  # null payload is NOT a parse failure
        ],
        "id long, raw_payload string",
    )
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("state", T.StringType()),
        ]
    )
    valid, rejects = json_ingest_quarantine(spark, raw, "raw_payload", schema)
    v = {r.id: r for r in valid.collect()}
    assert set(v) == {1, 3}
    assert v[1].k == 5 and v[1].state == "IN_STOCK"
    assert v[1].raw_payload is not None  # escape hatch preserved
    r = rejects.collect()
    assert [x.id for x in r] == [2]
    assert r[0].raw_payload.startswith("not json")


def test_declared_schema_tolerates_file_schema_evolution(spark, tmp_path):
    """Schema evolution posture (SURVEY.md §1.3): files written before a
    column existed read cleanly under the declared superset schema —
    the missing column is NULL — and the raw_payload escape hatch
    recovers fields that were never promoted to columns."""
    import os

    old = spark.createDataFrame(
        [(1, '{"k": 5, "new_field": "x"}')], "id long, raw_payload string"
    )
    new = spark.createDataFrame(
        [(2, '{"k": 6}', "promoted")], "id long, raw_payload string, status string"
    )
    path = os.path.join(tmp_path, "evolving")
    old.write.mode("overwrite").parquet(os.path.join(path, "batch=0"))
    new.write.mode("append").parquet(os.path.join(path, "batch=1"))

    declared = "id long, raw_payload string, status string"
    got = {r.id: r for r in spark.read.schema(declared).parquet(path).collect()}
    assert got[1].status is None          # pre-evolution file → NULL column
    assert got[2].status == "promoted"
    # raw_payload recovers what schema never had
    recovered = (
        spark.read.schema(declared)
        .parquet(path)
        .selectExpr("id", "get_json_object(raw_payload, '$.new_field') nf")
        .collect()
    )
    assert {r.id: r.nf for r in recovered} == {1: "x", 2: None}


# ---------------------------------------------------------------------------
# REAL codecs: binary PPM (P6) + 24-bit BMP, parsed pure-python+numpy to
# pixels and summarized as the 4x4 luminance-grid descriptor.
# ---------------------------------------------------------------------------


def _media_df(spark, blob, fmt, media_type="image"):
    from pyspark.sql import functions as F

    return spark.createDataFrame(
        [(1, bytearray(blob))], "media_id long, content binary"
    ).withColumn(
        "meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("string").alias("uri"),
        ),
    )


def test_decode_media_real_ppm_codec(spark):
    from square_etl_spark.operators.multimodal import decode_media

    # 8x8 PPM: left half black, right half white -> the 4x4 luminance
    # grid must be exactly [0, 0, 1, 1] on every row
    row = b"\x00\x00\x00" * 4 + b"\xff\xff\xff" * 4
    blob = b"P6\n8 8\n255\n" + row * 8
    out = decode_media(_media_df(spark, blob, "ppm")).collect()[0]
    assert out.ok is True
    assert out.features == [0.0, 0.0, 1.0, 1.0] * 4


def test_decode_media_real_bmp_codec(spark):
    from square_etl_spark.operators.multimodal import decode_media

    # 2x2 BMP (24bpp, bottom-up, 2-byte row padding):
    #   top:    red   green
    #   bottom: blue  white
    bottom = b"\xff\x00\x00" + b"\xff\xff\xff" + b"\x00\x00"  # BGR + pad
    top = b"\x00\x00\xff" + b"\x00\xff\x00" + b"\x00\x00"
    header = (
        b"BM"
        + (54 + 16).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + (2).to_bytes(4, "little", signed=True)   # width
        + (2).to_bytes(4, "little", signed=True)   # height (bottom-up)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")                # BI_RGB
        + b"\x00" * 20
    )
    blob = header + bottom + top
    out = decode_media(_media_df(spark, blob, "bmp")).collect()[0]
    assert out.ok is True
    r, g, b, w = 0.299, 0.587, 0.114, 1.0
    assert out.features == [r, r, g, g] * 2 + [b, b, w, w] * 2


def _encode_png(px, color_type, filters):
    """Minimal PNG ENCODER for the tests: 8-bit, non-interlaced, one
    explicit filter id per scanline (so the decoder's reconstruction of
    every filter type is exercised against spec-filtered bytes)."""
    import struct
    import zlib

    import numpy as np

    h, w = px.shape[:2]
    ch = 1 if px.ndim == 2 else px.shape[2]
    rows = px.reshape(h, w * ch).astype(np.int32)
    bpp = ch
    raw = bytearray()
    for y, f in zip(range(h), filters, strict=True):
        cur = rows[y]
        prev = rows[y - 1] if y > 0 else np.zeros_like(cur)
        line = np.zeros_like(cur)
        for x in range(len(cur)):
            a = int(cur[x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            c = int(prev[x - bpp]) if x >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            line[x] = (int(cur[x]) - pred) & 0xFF
        raw.append(f)
        raw.extend(line.astype(np.uint8).tobytes())

    def chunk(typ, data):
        return (
            len(data).to_bytes(4, "big")
            + typ + data
            + zlib.crc32(typ + data).to_bytes(4, "big")
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_parser_roundtrip_all_filters():
    """decode(encode(px)) == px for every scanline filter type
    (None/Sub/Up/Average/Paeth) and every supported color type —
    deterministic pseudo-random pixels so filter arithmetic (mod-256
    wraparound, bpp offsets) is fully exercised."""
    import numpy as np

    from square_etl_spark.operators.multimodal import _parse_png

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (5, 4, 3), dtype=np.uint8)
    for filters in ([0] * 5, [1] * 5, [2] * 5, [3] * 5, [4] * 5, [0, 1, 2, 3, 4]):
        got = _parse_png(_encode_png(px, 2, filters))
        assert np.array_equal(got, px), f"filters={filters}"
    # RGBA: alpha dropped, RGB planes exact
    rgba = rng.integers(0, 256, (3, 3, 4), dtype=np.uint8)
    assert np.array_equal(_parse_png(_encode_png(rgba, 6, [4, 3, 1])), rgba[..., :3])
    # grayscale: replicated to 3 channels
    gray = rng.integers(0, 256, (4, 2), dtype=np.uint8)
    got = _parse_png(_encode_png(gray, 0, [2, 4, 1, 3]))
    assert np.array_equal(got, np.repeat(gray[..., None], 3, axis=2))


def test_decode_media_real_png_codec(spark):
    """Exact-feature pin, like the PPM/BMP tests: an 8x8 PNG with the
    left half black / right half white (Paeth+Sub filtered rows) must
    produce the exact [0, 0, 1, 1] luminance grid on every row."""
    import numpy as np

    from square_etl_spark.operators.multimodal import decode_media

    px = np.zeros((8, 8, 3), np.uint8)
    px[:, 4:] = 255
    blob = _encode_png(px, 2, [4, 1, 4, 1, 4, 1, 4, 1])
    out = decode_media(_media_df(spark, blob, "png")).collect()[0]
    assert out.ok is True
    assert out.features == [0.0, 0.0, 1.0, 1.0] * 4


def test_decode_media_malformed_image_quarantines(spark):
    from square_etl_spark.operators.multimodal import decode_media

    out = decode_media(_media_df(spark, b"not an image at all", "ppm")).collect()[0]
    assert out.ok is False and out.features is None
    # and a malformed BMP likewise (row-level ok=false, not task failure)
    out = decode_media(_media_df(spark, b"BMgarbage", "bmp")).collect()[0]
    assert out.ok is False and out.features is None
    # malformed PNGs: bad signature, truncated chunk, corrupt zlib,
    # interlaced (unsupported) — all quarantine, none crash the task
    from square_etl_spark.operators.multimodal import _parse_png
    import struct
    import zlib

    import pytest

    good = _encode_png(
        __import__("numpy").zeros((2, 2, 3), "uint8"), 2, [0, 0]
    )
    for bad in [
        b"\x89PNG\r\n\x1a\nnope",
        good[:20],
        good.replace(zlib.compress(b"\x00" * 0), b"", 1)[:30],
    ]:
        with pytest.raises(ValueError):
            _parse_png(bad)
    # interlace flag set → explicit unsupported error
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    crc = zlib.crc32(b"IHDR" + ihdr).to_bytes(4, "big")
    interlaced = (
        b"\x89PNG\r\n\x1a\n"
        + len(ihdr).to_bytes(4, "big") + b"IHDR" + ihdr + crc
        + good[8 + 12 + 13 :]
    )
    with pytest.raises(ValueError, match="interlace"):
        _parse_png(interlaced)
    out = decode_media(_media_df(spark, b"\x89PNG\r\n\x1a\ngarbage", "png")).collect()[0]
    assert out.ok is False and out.features is None


def test_decode_media_stub_formats_still_flow(spark):
    # jpeg remains a STUB codec (PIL not in container): deterministic
    # fake features, row still flows (png graduated to a real codec)
    from square_etl_spark.operators.multimodal import FEATURE_DIM, decode_media

    out = decode_media(_media_df(spark, b"arbitrary bytes here", "jpeg")).collect()[0]
    assert out.ok is True and len(out.features) == FEATURE_DIM


# ---------------------------------------------------------------------------
# REAL audio codec: RIFF/WAVE integer PCM -> mono samples -> 16-window
# RMS energy profile.
# ---------------------------------------------------------------------------


def _encode_wav(data, bits=16, channels=1, rate=8000, extra_chunk=None):
    """Minimal WAV ENCODER for the tests. ``data`` is raw sample bytes."""
    import struct

    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate,
        rate * channels * bits // 8, channels * bits // 8, bits,
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    if extra_chunk is not None:  # odd-sized chunk exercises even-padding
        chunks += b"LIST" + len(extra_chunk).to_bytes(4, "little") + extra_chunk
        if len(extra_chunk) & 1:
            chunks += b"\x00"
    chunks += b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def test_wav_parser_stereo_mix_8bit_and_chunk_padding():
    import struct

    import numpy as np

    from square_etl_spark.operators.multimodal import _parse_wav

    # 16-bit stereo: L=+8192, R=-8192 -> mono mean exactly 0
    frames = 12
    data = b"".join(struct.pack("<hh", 8192, -8192) for _ in range(frames))
    samples, rate = _parse_wav(_encode_wav(data, 16, 2, 44100))
    assert rate == 44100 and len(samples) == frames
    assert np.allclose(samples, 0.0)
    # 8-bit unsigned mono: 128 is silence, 255 ~ +0.992, 0 = -1.0
    samples, _ = _parse_wav(_encode_wav(bytes([128, 255, 0]), 8, 1))
    assert np.allclose(samples, [0.0, 127 / 128.0, -1.0])
    # an odd-sized LIST chunk before data must be skipped (even-padded)
    samples, _ = _parse_wav(
        _encode_wav(bytes([128, 128]), 8, 1, extra_chunk=b"abc")
    )
    assert np.allclose(samples, [0.0, 0.0])


def test_decode_media_real_wav_codec(spark):
    """Exact-feature pin: a constant-amplitude +-0.5 square wave has RMS
    exactly 0.5 in every one of the 16 windows."""
    import struct

    from square_etl_spark.operators.multimodal import decode_media

    data = b"".join(
        struct.pack("<h", 16384 if i % 2 == 0 else -16384) for i in range(160)
    )
    out = decode_media(
        _media_df(spark, _encode_wav(data), "wav", media_type="audio")
    ).collect()[0]
    assert out.ok is True
    assert out.features == [0.5] * 16


def test_decode_media_malformed_wav_quarantines(spark):
    import struct

    import pytest

    from square_etl_spark.operators.multimodal import _parse_wav, decode_media

    # float PCM (format 3) is explicitly unsupported, not mis-decoded
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    float_wav = (
        b"RIFF" + (4 + 8 + len(fmt) + 8).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + (0).to_bytes(4, "little")
    )
    for bad in [b"RIFFgarbage", _encode_wav(b"", 16, 1), float_wav]:
        with pytest.raises(ValueError):
            _parse_wav(bad)
    out = decode_media(
        _media_df(spark, b"RIFFnope", "wav", media_type="audio")
    ).collect()[0]
    assert out.ok is False and out.features is None


# ---------------------------------------------------------------------------
# REAL video codec: uncompressed AVI (RIFF) -> DIB frames -> 16-window
# temporal luminance profile.
# ---------------------------------------------------------------------------


def _encode_avi(frames_rgb, bottom_up=True):
    """Minimal AVI ENCODER for the tests: RIFF('AVI ') with a hdrl list
    (zeroed avih/strh, real BITMAPINFOHEADER strf) and a movi list of
    00db DIB frames (bottom-up BGR, 4-byte row stride)."""
    import numpy as np

    h, w, _ = frames_rgb[0].shape
    stride = (w * 3 + 3) & ~3

    def chunk(cid, body):
        pad = b"\x00" if len(body) & 1 else b""
        return cid + len(body).to_bytes(4, "little") + body + pad

    def lst(ltype, body):
        return chunk(b"LIST", ltype + body)

    strf = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + (h if bottom_up else -h).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")          # BI_RGB
        + b"\x00" * 20
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", b"\x00" * 56)
        + lst(b"strl", chunk(b"strh", b"\x00" * 56) + chunk(b"strf", strf)),
    )
    movi_body = b""
    for f in frames_rgb:
        bgr = f[..., ::-1]
        if bottom_up:
            bgr = bgr[::-1]
        rows = np.zeros((h, stride), np.uint8)
        rows[:, : w * 3] = bgr.reshape(h, w * 3)
        movi_body += chunk(b"00db", rows.tobytes())
    body = b"AVI " + hdrl + lst(b"movi", movi_body)
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_avi_parser_roundtrip_and_orientation():
    import numpy as np

    from square_etl_spark.operators.multimodal import _parse_avi

    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 256, (3, 2, 3), dtype=np.uint8) for _ in range(4)]
    for bottom_up in (True, False):
        got = _parse_avi(_encode_avi(frames, bottom_up=bottom_up))
        assert len(got) == 4
        for a, b in zip(got, frames, strict=True):
            assert np.array_equal(a, b), f"bottom_up={bottom_up}"


def test_decode_media_real_avi_codec(spark):
    """Exact-feature pin: 4 frames fading black -> white give a
    monotone step temporal-luminance profile (4 windows per frame)."""
    import numpy as np

    from square_etl_spark.operators.multimodal import decode_media

    levels = [0, 85, 170, 255]
    frames = [np.full((2, 2, 3), v, np.uint8) for v in levels]
    out = decode_media(
        _media_df(spark, _encode_avi(frames), "avi", media_type="video")
    ).collect()[0]
    assert out.ok is True
    want = []
    for v in levels:
        want += [round(v / 255.0, 6)] * 4
    assert out.features == want


def test_decode_media_malformed_avi_quarantines(spark):
    import numpy as np

    import pytest

    from square_etl_spark.operators.multimodal import _parse_avi, decode_media

    good = _encode_avi([np.zeros((2, 2, 3), np.uint8)])
    # ~4000 nested LIST headers: must raise ValueError (nesting cap),
    # never RecursionError — that would escape the quarantine net and
    # kill the whole Spark task, not just the row.
    nested = b""
    for _ in range(4000):
        nested = b"LIST" + len(nested + b"movi").to_bytes(4, "little") + b"movi" + nested
    deep = b"RIFF" + len(nested + b"AVI ").to_bytes(4, "little") + b"AVI " + nested
    for bad in [b"RIFFxxxxAVI", good[:40], good[:-8], deep]:
        with pytest.raises(ValueError):
            _parse_avi(bad)
    out = decode_media(
        _media_df(spark, b"RIFF\x04\x00\x00\x00AVI ", "avi", media_type="video")
    ).collect()[0]
    assert out.ok is False and out.features is None


def test_resize_real_for_decodable_formats(spark):
    """meta.format in ppm/bmp/png -> REAL decode + nearest-neighbor
    resample to raw w*h*3 RGB bytes (not the stub's truncate/pad)."""
    import numpy as np

    row = b"\x00\x00\x00" * 4 + b"\xff\xff\xff" * 4
    blob = b"P6\n8 8\n255\n" + row * 8        # left half black, right white
    out = resize_images(_media_df(spark, blob, "ppm"), 4, 2).collect()[0]
    got = np.frombuffer(bytes(out.content), np.uint8).reshape(2, 4, 3)
    want = np.zeros((2, 4, 3), np.uint8)
    want[:, 2:] = 255                          # halves survive the resample
    assert np.array_equal(got, want)
    assert (out.width, out.height, out.channels) == (4, 2, 3)
    # undecodable bytes in a decodable format fall back to the stub,
    # SAME w*h*3 size contract, channels=1 provenance
    out = resize_images(_media_df(spark, b"P6 garbage", "ppm"), 4, 2).collect()[0]
    assert len(out.content) == 24 and out.channels == 1


def test_sample_frames_real_for_avi(spark):
    """meta.format == 'avi' -> REAL decoded RGB frames, evenly
    subsampled to max_frames when the clip is longer."""
    import numpy as np

    frames = [np.full((2, 2, 3), v, np.uint8) for v in range(6)]
    media = _media_df(spark, _encode_avi(frames), "avi", media_type="video")
    got = sorted(
        sample_frames(media, max_frames=3).collect(), key=lambda r: r.frame_idx
    )
    assert [r.frame_idx for r in got] == [0, 1, 2]
    # even subsample of 6 frames to 3: indices 0, 2, 4
    for r, src in zip(got, [0, 2, 4], strict=True):
        assert bytes(r.frame) == frames[src].tobytes()


# ---------------------------------------------------------------------------
# REAL GIF codec: LZW decode + palette lookup + interlace reorder.
# ---------------------------------------------------------------------------


def _lzw_encode(indices, min_code_size):
    """Real GIF-variant LZW ENCODER for the tests (emit-then-add, width
    bump when the added code reaches 2^width, 12-bit cap with CLEAR)."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1

    def fresh():
        return {bytes([i]): i for i in range(clear)}, end + 1, min_code_size + 1

    table, next_code, width = fresh()
    codes = [(clear, width)]
    w = b""
    for k in indices:
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        codes.append((table[w], width))
        if next_code < 4096:
            table[wk] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:  # table full: clear and restart
            codes.append((clear, width))
            table, next_code, width = fresh()
        w = bytes([k])
    if w:
        codes.append((table[w], width))
    codes.append((end, width))
    # pack LSB-first
    acc = bitlen = 0
    out = bytearray()
    for code, cw in codes:
        acc |= code << bitlen
        bitlen += cw
        while bitlen >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bitlen -= 8
    if bitlen:
        out.append(acc & 0xFF)
    return bytes(out)


def _encode_gif(rows, palette, min_code_size=2, interlace=False):
    """Minimal GIF89a ENCODER: global color table, one image block,
    optional interlace (rows stored in 4-pass order)."""
    import numpy as np

    h, w = rows.shape
    n = len(palette)
    ct_bits = max(1, (n - 1).bit_length())
    ct = bytearray()
    for r, g, b in palette:
        ct += bytes([r, g, b])
    ct += b"\x00" * (3 * ((1 << ct_bits) - n))
    header = (
        b"GIF89a"
        + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + bytes([0x80 | (ct_bits - 1), 0, 0])
        + ct
    )
    store = rows
    if interlace:
        order = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
        store = rows[order]
    lzw = _lzw_encode(store.reshape(-1).tolist(), min_code_size)
    sub = b""
    for i in range(0, len(lzw), 255):
        blockb = lzw[i : i + 255]
        sub += bytes([len(blockb)]) + blockb
    img = (
        b"\x2c" + b"\x00" * 4
        + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + bytes([0x40 if interlace else 0])
        + bytes([min_code_size]) + sub + b"\x00"
    )
    # a graphic-control extension before the image pins extension skipping
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    return header + ext + img + b"\x3b"


def test_gif_lzw_roundtrip_with_width_growth():
    """decode(encode(idx)) == idx on a random 4-color stream long
    enough to force several code-width bumps — validates the
    emit-then-add / grow-at-capacity synchronization both ways."""
    import numpy as np

    from square_etl_spark.operators.multimodal import _lzw_decode

    rng = np.random.default_rng(9)
    idx = rng.integers(0, 4, 5000).astype(np.uint8).tolist()
    assert list(_lzw_decode(_lzw_encode(idx, 2), 2)) == idx


def test_gif_parser_palette_and_interlace():
    import numpy as np

    from square_etl_spark.operators.multimodal import _parse_gif

    palette = [(0, 0, 0), (255, 255, 255), (255, 0, 0), (0, 255, 0)]
    rng = np.random.default_rng(4)
    rows = rng.integers(0, 4, (9, 5)).astype(np.uint8)  # odd h: all 4 passes
    want = np.array(palette, np.uint8)[rows]
    for interlace in (False, True):
        got = _parse_gif(_encode_gif(rows, palette, interlace=interlace))
        assert np.array_equal(got, want), f"interlace={interlace}"


def test_decode_media_real_gif_codec(spark):
    """Exact-feature pin like the other image codecs: 8x8 left-half
    black / right-half white GIF -> [0, 0, 1, 1] per grid row."""
    import numpy as np

    from square_etl_spark.operators.multimodal import decode_media

    rows = np.zeros((8, 8), np.uint8)
    rows[:, 4:] = 1
    blob = _encode_gif(rows, [(0, 0, 0), (255, 255, 255)])
    out = decode_media(_media_df(spark, blob, "gif")).collect()[0]
    assert out.ok is True
    assert out.features == [0.0, 0.0, 1.0, 1.0] * 4


def test_decode_media_malformed_gif_quarantines(spark):
    import numpy as np

    import pytest

    from square_etl_spark.operators.multimodal import _parse_gif, decode_media

    good = _encode_gif(
        np.zeros((2, 2), np.uint8), [(0, 0, 0), (255, 255, 255)]
    )
    for bad in [b"GIF89a", good[:20], good[:-6], b"GIF89x" + good[6:]]:
        with pytest.raises(ValueError):
            _parse_gif(bad)
    out = decode_media(_media_df(spark, b"GIF89a!!!", "gif")).collect()[0]
    assert out.ok is False and out.features is None


def test_all_parsers_valueerror_only_under_truncation_and_corruption():
    """Quarantine safety net: every codec must raise ValueError (the
    type decode_media converts to ok=false) — never IndexError /
    struct.error / numpy errors — for EVERY truncation point and under
    random single-byte corruption.  A non-ValueError escape would fail
    whole Spark tasks instead of quarantining rows."""
    import numpy as np

    from square_etl_spark.operators.multimodal import (
        _parse_avi,
        _parse_bmp,
        _parse_gif,
        _parse_png,
        _parse_ppm,
        _parse_wav,
    )

    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, (5, 4, 3), dtype=np.uint8)
    stride = (4 * 3 + 3) & ~3
    bmp_rows = np.zeros((5, stride), np.uint8)
    bmp_rows[:, :12] = px[::-1][..., ::-1].reshape(5, 12)
    bmp = (
        b"BM" + (54 + 5 * 16).to_bytes(4, "little") + b"\x00" * 4
        + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
        + (4).to_bytes(4, "little", signed=True)
        + (5).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + b"\x00" * 20
        + bmp_rows.tobytes()
    )
    cases = [
        (_parse_png, _encode_png(px, 2, [0, 1, 2, 3, 4])),
        (_parse_wav, _encode_wav(bytes(range(100)), 8, 1)),
        (_parse_avi, _encode_avi([px, px])),
        (_parse_ppm, b"P6\n4 5\n255\n" + px.tobytes()),
        (_parse_gif, _encode_gif(
            rng.integers(0, 2, (6, 6)).astype(np.uint8),
            [(0, 0, 0), (9, 9, 9)],
        )),
        (_parse_bmp, bmp),
    ]
    for parser, blob in cases:
        parser(blob)  # sanity: the full blob parses
        for cut in range(len(blob)):
            try:
                parser(blob[:cut])
            except ValueError:
                pass
        for _ in range(100):
            b = bytearray(blob)
            i = int(rng.integers(0, len(b)))
            b[i] = int(rng.integers(0, 256))
            try:
                parser(bytes(b))
            except ValueError:
                pass
