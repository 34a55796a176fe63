"""Multimodal column plumbing (extension surface — SURVEY.md §2.10).

Design: image/audio/video content is an opaque ``binary`` column plus
a typed metadata struct — the columnar layout that lets Catalyst prune
bytes out of any query that only touches metadata (Dremel-style
striping; a metadata-only scan never reads the blobs).  Decode /
feature-extract run as Arrow-batched ``mapInPandas`` stages; the codec
bodies are STUBBED here (no image/audio libraries in this container —
clearly marked below), but the Spark-side contract — schemas, batch
iteration, partitioning — is real and tested.

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


def _decode_blob(content: bytes, media_type: str) -> list[float]:
    """STUB — real implementation requires image/audio codecs (PIL,
    torchaudio, ffmpeg) that are not installed in this container.

    Contract: bytes → fixed FEATURE_DIM float feature vector.  The
    deterministic fake below hashes byte windows so tests can assert
    shapes, determinism, and partition behavior end-to-end; swap the
    body for a real codec without touching any Spark plumbing.
    """
    if media_type not in ("image", "audio", "video"):
        raise NotImplementedError(f"no codec for media_type={media_type!r}")
    # deterministic fake: bucket byte sums over FEATURE_DIM windows
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
                out["media_id"].append(mid)
                out["n_bytes"].append(len(blob) if blob is not None else 0)
                try:
                    feats = _decode_blob(bytes(blob or b""), media_type)
                    out["ok"].append(True)
                    out["features"].append(feats)
                except NotImplementedError:
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
