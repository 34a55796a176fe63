"""Similarity search + multimodal plumbing (SURVEY.md §2.10)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from square_etl_spark.io import load_table
from square_etl_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_media,
    documents_as_media,
)
from square_etl_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_lsh,
    cosine_topk_pandas,
    ivf_assign,
)


def _queries(spark, sf_dir, n=3):
    e = load_table(spark, sf_dir, "embeddings")
    return e.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def test_every_vector_is_its_own_nearest_neighbor(spark, sf_dir):
    # the LSH sanity property from SURVEY.md §7 hard-list #5
    e = load_table(spark, sf_dir, "embeddings")
    top = cosine_topk(e, _queries(spark, sf_dir), k=1).collect()
    for r in top:
        assert r.query_id == r.vec_id
        assert r.cosine_sim == 1.0


def test_lsh_topk_contains_self_and_subsets_bruteforce_buckets(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    q = _queries(spark, sf_dir)
    lsh = cosine_topk_lsh(e, q, k=3, bits=4, dim=64)
    by_query = {}
    for r in lsh.collect():
        by_query.setdefault(r.query_id, []).append(r)
    for qid, rows in by_query.items():
        assert rows[0].vec_id == qid or any(r.vec_id == qid for r in rows)


def test_pandas_topk_agrees_with_hof_topk(spark, sf_dir):
    # Arrow/numpy path must produce the same ranking as the JVM path
    e = load_table(spark, sf_dir, "embeddings")
    q = _queries(spark, sf_dir)
    hof = {
        (r.query_id, r.rank): (r.vec_id, r.cosine_sim)
        for r in cosine_topk(e, q, k=5).collect()
    }
    qrows = [(r.query_id, list(r.query_vec)) for r in q.collect()]
    pnd = {
        (r.query_id, r.rank): (r.vec_id, r.cosine_sim)
        for r in cosine_topk_pandas(e, qrows, k=5).collect()
    }
    assert hof == pnd


def test_ivf_assign_partitions_all_vectors(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    cents = e.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("centroid")
    )
    assigned = ivf_assign(e, cents)
    assert assigned.count() == e.count()  # every vector in exactly one cell
    assert assigned.select("cell").distinct().count() <= 4
    # a centroid lands in its own cell
    own = {r.vec_id: r.cell for r in assigned.filter(F.col("vec_id") < 4).collect()}
    assert all(own[v] == v for v in own)


def test_decode_media_shapes_and_determinism(spark, sf_dir):
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    out = decode_media(media)
    rows = out.collect()
    assert all(r.ok for r in rows)
    assert all(len(r.features) == FEATURE_DIM for r in rows)
    assert all(0.0 <= x <= 1.0 for r in rows for x in r.features)
    again = {r.media_id: r.features for r in decode_media(media).collect()}
    assert all(again[r.media_id] == r.features for r in rows)


def test_decode_media_unknown_type_quarantined_not_fatal(spark):
    media = spark.createDataFrame(
        [(1, bytearray(b"abc"), {"media_type": "hologram"})],
        "media_id long, content binary, meta map<string,string>",
    )
    rows = decode_media(media).collect()
    assert rows[0].ok is False and rows[0].features is None
    assert rows[0].n_bytes == 3


def test_quantize_int8_layout_and_range(spark, sf_dir):
    from square_etl_spark.io import load_table
    from square_etl_spark.operators.similarity import quantize_int8

    e = load_table(spark, sf_dir, "embeddings")
    codes, factors = quantize_int8(e, dim=64)
    assert codes.columns == ["vec_id", "codes", "qnorm"]
    assert len(factors) == 64 and all(f > 0 for f in factors)
    row = codes.agg(
        F.min(F.array_min("codes")), F.max(F.array_max("codes"))
    ).collect()[0]
    assert -127 <= row[0] and row[1] <= 127
    assert codes.filter(F.col("qnorm") <= 0).count() == 0


def test_quantized_topk_matches_brute_force(spark, sf_dir):
    """Int8 candidates + exact rescore must reproduce the brute-force
    top-k exactly on the fixtures (recall 1.0) — the property that lets
    the quantized query share the brute-force oracle."""
    from square_etl_spark.io import load_table
    from square_etl_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_quantized,
    )

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    brute = {tuple(r) for r in cosine_topk(e, q, k=5).collect()}
    quant = {tuple(r) for r in cosine_topk_quantized(e, q, k=5, dim=64).collect()}
    assert quant == brute
