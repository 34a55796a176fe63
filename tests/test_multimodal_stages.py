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
        assert len(r.content) == 32  # every blob normalized to w*h
    assert bytes(out[2].content[:10]) == b"y" * 10  # content, then zero padding
    # schema excludes the original blob/meta — nothing heavy survives
    assert set(resize_images(_media(spark), 8, 4).columns) == {
        "media_id", "width", "height", "content",
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


def _media_df(spark, blob, fmt):
    from pyspark.sql import functions as F

    return spark.createDataFrame(
        [(1, bytearray(blob))], "media_id long, content binary"
    ).withColumn(
        "meta",
        F.struct(
            F.lit("image").alias("media_type"),
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


def test_decode_media_malformed_image_quarantines(spark):
    from square_etl_spark.operators.multimodal import decode_media

    out = decode_media(_media_df(spark, b"not an image at all", "ppm")).collect()[0]
    assert out.ok is False and out.features is None
    # and a malformed BMP likewise (row-level ok=false, not task failure)
    out = decode_media(_media_df(spark, b"BMgarbage", "bmp")).collect()[0]
    assert out.ok is False and out.features is None


def test_decode_media_stub_formats_still_flow(spark):
    from square_etl_spark.operators.multimodal import FEATURE_DIM, decode_media

    out = decode_media(_media_df(spark, b"arbitrary bytes here", "png")).collect()[0]
    assert out.ok is True and len(out.features) == FEATURE_DIM
