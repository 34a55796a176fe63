"""Multimodal column plumbing (extension surface — SURVEY.md §2.10).

Design: image/audio/video content is an opaque ``binary`` column plus
a typed metadata struct — the columnar layout that lets Catalyst prune
bytes out of any query that only touches metadata (Dremel-style
striping; a metadata-only scan never reads the blobs).  Decode /
feature-extract run as Arrow-batched ``mapInPandas`` stages.  Codecs:
PPM (binary P6) and 24-bit BMP images are REAL — parsed pure-python +
numpy to pixels and summarized as a 4×4 luminance-grid descriptor;
formats needing codec libraries this container doesn't ship (PNG/JPEG/
WAV/MP4 → PIL/torchaudio/ffmpeg) remain STUBBED and clearly marked.
The Spark-side contract — schemas, batch iteration, partitioning — is
real and tested for all of them.

At 100 TB: blobs live in the table (small assets) or as object-store
URIs (large assets) with the same metadata struct; either way the
decode stage is a map-only pass whose parallelism is file-split
driven, and ``spark.sql.files.maxPartitionBytes`` sizes the per-task
batch.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata struct carried next to every blob column.
MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # png|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("uri", T.StringType(), True),  # set when blob is external
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META, True),
    ]
)

#: decode output: fixed-size feature vector per asset.
FEATURE_DIM = 16
DECODED_SCHEMA = (
    f"media_id long, n_bytes long, ok boolean, features array<double>"
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Fixture adapter: treat document text bytes as opaque blobs so the
    multimodal plumbing is exercisable on the driver's tables (no real
    media ships in the fixtures)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("raw").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("string").alias("uri"),
        ).alias("meta"),
    )


def _parse_ppm(data: bytes):
    """REAL codec: binary PPM (P6) parser — stdlib + numpy only.
    Header: ``P6 <width> <height> <maxval>`` with whitespace/comment
    separators, then raw RGB triples.  Returns (h, w, 3) uint8."""
    import re

    import numpy as np

    m = re.match(
        rb"P6\s+(?:#[^\n]*\s+)*(\d+)\s+(?:#[^\n]*\s+)*(\d+)\s+(?:#[^\n]*\s+)*(\d+)\s",
        data,
    )
    if not m:
        raise ValueError("not a binary PPM (P6)")
    w, h, maxval = (int(g) for g in m.groups())
    if maxval != 255 or w <= 0 or h <= 0:
        raise ValueError(f"unsupported PPM geometry ({w}x{h}, maxval={maxval})")
    need = w * h * 3
    px = data[m.end() : m.end() + need]
    if len(px) < need:
        raise ValueError("truncated PPM pixel data")
    return np.frombuffer(px, np.uint8).reshape(h, w, 3)


def _parse_bmp(data: bytes):
    """REAL codec: 24-bit uncompressed BMP parser — stdlib + numpy
    only.  Handles the 4-byte row padding, bottom-up row order, and
    BGR→RGB.  Returns (h, w, 3) uint8."""
    import numpy as np

    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP")
    off = int.from_bytes(data[10:14], "little")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    compression = int.from_bytes(data[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24bpp uncompressed BMP (got bpp={bpp})")
    bottom_up, h = h > 0, abs(h)
    if w <= 0 or h <= 0:
        raise ValueError("bad BMP geometry")
    stride = (w * 3 + 3) & ~3
    if len(data) < off + stride * h:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(data[off : off + stride * h], np.uint8).reshape(h, stride)
    px = rows[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        px = px[::-1]
    return px[..., ::-1]  # BGR → RGB


def _grid_features(px) -> list[float]:
    """4×4 mean-luminance grid descriptor (FEATURE_DIM=16): a real,
    classic tiny-image feature.  Block bounds are integer-split with a
    ≥1-pixel floor so any geometry (even 1×1) fills all 16 cells."""
    import numpy as np

    h, w, _ = px.shape
    lum = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    grid = 4
    feats = []
    for i in range(grid):
        r0 = (i * h) // grid
        r1 = max(r0 + 1, ((i + 1) * h) // grid)
        for j in range(grid):
            c0 = (j * w) // grid
            c1 = max(c0 + 1, ((j + 1) * w) // grid)
            feats.append(round(float(lum[r0:r1, c0:c1].mean()) / 255.0, 6))
    return feats


def _decode_blob(content: bytes, media_type: str, fmt: str | None = None) -> list[float]:
    """bytes → fixed FEATURE_DIM float feature vector.

    REAL codecs (pure python + numpy, nothing beyond the container):
    ``format='ppm'`` (binary P6) and ``format='bmp'`` (24-bit
    uncompressed) are parsed to pixels and summarized as a 4×4
    luminance-grid descriptor.  Every other format keeps the STUB
    below — PNG/JPEG/WAV/MP4 need codec libraries (PIL, torchaudio,
    ffmpeg) this container doesn't ship; swap the stub for a real
    codec without touching any Spark plumbing.  Malformed PPM/BMP
    bytes raise ValueError → the decode stage marks the row ok=false
    (quarantine posture, not task failure).
    """
    if media_type not in ("image", "audio", "video"):
        raise NotImplementedError(f"no codec for media_type={media_type!r}")
    if media_type == "image" and fmt == "ppm":
        return _grid_features(_parse_ppm(bytes(content)))
    if media_type == "image" and fmt == "bmp":
        return _grid_features(_parse_bmp(bytes(content)))
    # STUB path: deterministic fake — bucket byte sums over windows
    if not content:
        return [0.0] * FEATURE_DIM
    step = max(1, len(content) // FEATURE_DIM)
    feats = []
    for i in range(FEATURE_DIM):
        window = content[i * step : (i + 1) * step] or b"\x00"
        feats.append(round(sum(window) / (255.0 * len(window)), 6))
    return feats


def decode_media(media: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Arrow-batched decode stage: binary blobs → feature vectors.

    ``mapInPandas`` streams Arrow record batches through Python once;
    each batch is decoded in bulk and yields a narrow result frame
    (features only — the blob column does NOT survive the stage, so
    downstream shuffles never carry bytes).  Failures are per-row
    (ok=false), matching the engine's quarantine posture (E1) rather
    than failing the task.
    """
    import pandas as pd

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {"media_id": [], "n_bytes": [], "ok": [], "features": []}
            for mid, blob, meta in zip(
                pdf["media_id"], pdf["content"], pdf["meta"], strict=True
            ):
                media_type = (meta or {}).get("media_type")
                fmt = (meta or {}).get("format")
                out["media_id"].append(mid)
                out["n_bytes"].append(len(blob) if blob is not None else 0)
                try:
                    feats = _decode_blob(bytes(blob or b""), media_type, fmt)
                    out["ok"].append(True)
                    out["features"].append(feats)
                except (NotImplementedError, ValueError):
                    out["ok"].append(False)
                    out["features"].append(None)
            yield pd.DataFrame(out)

    return media.mapInPandas(decode, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = "media_id long, width int, height int, content binary"


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Arrow-batched image resize stage (STUB codec).

    Real body needs PIL/opencv (not in this container): it would be
    ``Image.open(BytesIO(blob)).resize((w, h))`` per blob inside the
    batch loop.  The deterministic fake truncates/pads bytes to
    ``w*h`` so tests pin the contract: schema, per-batch iteration,
    blob-in/blob-out flow, and that the ORIGINAL blob does not survive
    the stage (downstream shuffles carry only resized bytes).
    """
    import pandas as pd

    target = width * height

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "content": []}
            for mid, blob in zip(pdf["media_id"], pdf["content"], strict=True):
                raw = bytes(blob or b"")
                # STUB: real codec decodes + resamples; fake keeps size contract
                resized = raw[:target].ljust(target, b"\x00")
                out["media_id"].append(mid)
                out["width"].append(width)
                out["height"].append(height)
                out["content"].append(resized)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = "media_id long, frame_idx int, frame binary"


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Frame-sampling stage for video blobs (STUB codec) — a 1-to-N
    ``mapInPandas`` expansion (each asset yields up to ``max_frames``
    rows), the multimodal analog of J4's explode.

    Real body would use ffmpeg/pyav keyframe extraction; the
    deterministic fake emits fixed-stride byte windows as "frames".
    The Spark contract being pinned: output cardinality is data-driven
    per input row (generator semantics), ordering within an asset is
    by frame_idx, and blobs never join the shuffle unless selected.
    """
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame": []}
            for mid, blob in zip(pdf["media_id"], pdf["content"], strict=True):
                raw = bytes(blob or b"")
                for i in range(min(max_frames, max(1, len(raw) // every_n_bytes))):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame"].append(raw[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FRAMES_SCHEMA)
