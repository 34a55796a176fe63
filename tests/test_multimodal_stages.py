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
