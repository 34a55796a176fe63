"""Trained NB corpus classifier (operators/classify.py): fold law,
gate semantics, inference invariants, and the degenerate edges the
registered queries' fixtures never hit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from square_etl_spark.io import load_table
from square_etl_spark.operators import classify as cl


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_fold_law_counts_identical(spark, sf_dir):
    """fold(nb_counts(b0), nb_counts(b1)) ≡ nb_counts(b0 ∪ b1) —
    bit-for-bit, the incremental-twin contract."""
    d = _docs(spark, sf_dir).filter(F.col("doc_id") % 5 == 0)
    one_shot = cl.nb_counts(d)
    folded = cl.nb_counts_batched(
        d.withColumn("__b", F.col("doc_id") % 3), "__b", [0, 1, 2]
    )
    assert _sorted_rows(one_shot) == _sorted_rows(folded)


def test_fold_law_predictions_identical(spark, sf_dir):
    """Scoring through a folded state equals scoring through the
    one-shot state — what classify_nb_incremental's shared oracle
    certifies at driver scale."""
    d = _docs(spark, sf_dir)
    tr = d.filter(F.col("doc_id") % 3 != 0)
    te = d.filter((F.col("doc_id") % 3 == 0) & (F.col("doc_id") < 600))
    p1 = cl.nb_predictions(te, cl.nb_counts(tr))
    p2 = cl.nb_predictions(
        te,
        cl.nb_counts_batched(
            tr.withColumn("__b", F.col("doc_id") % 2), "__b", [0, 1]
        ),
    )
    assert _sorted_rows(p1) == _sorted_rows(p2)


def test_sentinel_rows_carry_doc_counts(spark, sf_dir):
    d = _docs(spark, sf_dir).limit(60)
    counts = cl.nb_counts(d)
    doc_rows = {
        r["label"]: r["c"]
        for r in counts.filter(F.col("w") == cl.DOC_COUNT_KEY).collect()
    }
    truth = {
        r["lang"]: r["n"]
        for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert doc_rows == truth


def test_predictions_cover_every_nonempty_doc_once(spark, sf_dir):
    d = _docs(spark, sf_dir)
    tr = d.filter(F.col("doc_id") % 3 != 0)
    te = d.filter(F.col("doc_id") % 3 == 0)
    preds = cl.nb_predictions(te, cl.nb_counts(tr))
    n_nonempty = te.filter(F.trim("text") != "").count()
    assert preds.count() == n_nonempty
    assert preds.select("doc_id").distinct().count() == n_nonempty


def test_margin_nonnegative_and_label_known(spark, sf_dir):
    d = _docs(spark, sf_dir)
    tr = d.filter(F.col("doc_id") % 3 != 0)
    preds = cl.nb_predictions(
        d.filter(F.col("doc_id") % 3 == 0), cl.nb_counts(tr)
    )
    labels = {r["lang"] for r in tr.select("lang").distinct().collect()}
    bad = preds.filter(
        (F.col("margin") < 0) | (~F.col("pred_label").isin(*labels))
    )
    assert bad.count() == 0


def test_zero_token_document_drops(spark, sf_dir):
    """A document with no tokens has no posterior — documented drop."""
    d = _docs(spark, sf_dir)
    tr = d.filter(F.col("doc_id") % 3 != 0)
    blank = spark.createDataFrame(
        [(999_001, "   "), (999_002, "spark merge")],
        "doc_id long, text string",
    )
    preds = cl.nb_predictions(blank, cl.nb_counts(tr))
    assert [r["doc_id"] for r in preds.collect()] == [999_002]


def test_gate_is_a_semijoin_consistent_with_predictions(spark, sf_dir):
    d = _docs(spark, sf_dir)
    tr = d.filter(F.col("doc_id") % 3 != 0)
    te = d.filter(F.col("doc_id") % 3 == 0)
    counts = cl.nb_counts(tr)
    kept = cl.nb_gate(te, counts, "en", min_margin=0.25)
    # schema passes through untouched
    assert kept.columns == te.columns
    want = {
        r["doc_id"]
        for r in cl.nb_predictions(te, counts)
        .filter((F.col("pred_label") == "en") & (F.col("margin") >= 0.25))
        .collect()
    }
    got = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert got == want and len(got) > 0


def test_unseen_vocabulary_scores_via_length_term(spark, sf_dir):
    """A doc of tokens the model never saw still gets a posterior —
    the Laplace mass folded into lrate·len, the rearrangement
    nb_model documents.  Prediction then falls to the prior-plus-rate
    argmax, identical for any unseen text of equal length."""
    d = _docs(spark, sf_dir)
    tr = d.filter(F.col("doc_id") % 3 != 0)
    probe = spark.createDataFrame(
        [(1, "qqqxx zzzyy"), (2, "wwwqq kkkzz")],
        "doc_id long, text string",
    )
    preds = cl.nb_predictions(probe, cl.nb_counts(tr)).collect()
    assert len(preds) == 2
    by_id = {r["doc_id"]: r for r in preds}
    assert by_id[1]["pred_label"] == by_id[2]["pred_label"]
    assert by_id[1]["score"] == by_id[2]["score"]


def test_smoothing_must_be_positive(spark, sf_dir):
    d = _docs(spark, sf_dir).limit(30)
    with pytest.raises(ValueError, match="smoothing"):
        cl.nb_predictions(d, cl.nb_counts(d), smoothing=0.0)


def test_train_summary_exact_integers(spark, sf_dir):
    d = _docs(spark, sf_dir).filter(F.col("doc_id") % 7 == 0)
    counts = cl.nb_counts(d)
    card = cl.nb_train_summary(counts, top_k=2).collect()
    assert {r["label"] for r in card} == {
        r["lang"] for r in d.select("lang").distinct().collect()
    }
    for r in card:
        assert r["n_docs"] > 0 and r["n_tokens"] > 0 and r["vocab_size"] > 0
        assert 1 <= len(r["top_tokens"].split(" ")) <= 2


def test_char_ngram_feature_space(spark, sf_dir):
    """char2/char3 featurizer: correct gram extraction (overlapping,
    lowercased), short-doc drop, fold law holds per feature space,
    unknown feature rejected."""
    from square_etl_spark.operators.classify import (
        _tokens,
        nb_counts,
        nb_counts_batched,
        nb_predictions,
    )

    df = spark.createDataFrame(
        [(1, "AbC"), (2, "x"), (3, "abab")],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["w"])
        for r in _tokens(df, "doc_id", "text", "char2").collect()
    }
    assert got == {
        (1, "ab"), (1, "bc"),
        (3, "ab"), (3, "ba"), (3, "ab"),  # set collapses the dup
    }
    # multiset check: 'abab' yields ab,ba,ab = 3 grams
    n3 = (
        _tokens(df, "doc_id", "text", "char2")
        .filter("doc_id = 3")
        .count()
    )
    assert n3 == 3
    # doc 2 is shorter than 3 chars -> no char3 features
    assert (
        _tokens(df, "doc_id", "text", "char3")
        .filter("doc_id = 2")
        .count()
        == 0
    )

    d = _docs(spark, sf_dir).filter(F.col("doc_id") % 6 == 0)
    one = nb_counts(d, feature="char3")
    folded = nb_counts_batched(
        d.withColumn("__b", F.col("doc_id") % 2),
        "__b",
        [0, 1],
        feature="char3",
    )
    assert _sorted_rows(one) == _sorted_rows(folded)

    # scoring runs end to end in the char space
    preds = nb_predictions(
        d.limit(20), one, feature="char3"
    )
    assert preds.count() > 0

    with pytest.raises(ValueError, match="feature"):
        _tokens(df, "doc_id", "text", "char4")


def test_versioned_model_artifacts_roundtrip(spark, sf_dir, tmp_path):
    """save/load of the NB model state: version pinning, online
    retrain via fold-then-save, scoring through a loaded artifact
    equals scoring through the live relation."""
    import os

    from square_etl_spark.operators.classify import (
        fold_nb_counts,
        load_nb_model,
        nb_counts,
        nb_predictions,
        save_nb_model,
    )

    d = _docs(spark, sf_dir)
    b0 = d.filter("doc_id % 2 = 0 and doc_id < 240")
    b1 = d.filter("doc_id % 2 = 1 and doc_id < 240")
    path = os.path.join(tmp_path, "nb_model")

    v1 = save_nb_model(nb_counts(b0), path)
    # online retrain: load v1, fold batch 1, save v2
    v2 = save_nb_model(
        fold_nb_counts(load_nb_model(spark, path), nb_counts(b1)), path
    )
    assert v2 == v1 + 1

    # v2 == one-shot over both batches
    want = _sorted_rows(nb_counts(b0.unionByName(b1)))
    assert _sorted_rows(load_nb_model(spark, path)) == want
    # v1 still pinned and readable
    assert _sorted_rows(load_nb_model(spark, path, version=v1)) == \
        _sorted_rows(nb_counts(b0))

    probe = d.filter("doc_id >= 240 and doc_id < 300")
    via_artifact = _sorted_rows(
        nb_predictions(probe, load_nb_model(spark, path))
    )
    live = _sorted_rows(nb_predictions(probe, nb_counts(b0.unionByName(b1))))
    assert via_artifact == live and len(live) > 0


def test_single_label_model_margin_null_and_gate_passes(spark):
    """One-class model: margin is NULL (no runner-up) and nb_gate
    passes matching predictions instead of NULL-dropping everything."""
    from square_etl_spark.operators.classify import (
        nb_counts,
        nb_gate,
        nb_predictions,
    )

    tr = spark.createDataFrame(
        [(1, "en", "spark merge join"), (2, "en", "sort table scan")],
        "doc_id long, lang string, text string",
    )
    probe = spark.createDataFrame(
        [(10, "spark table"), (11, "window value")],
        "doc_id long, text string",
    )
    counts = nb_counts(tr)
    preds = nb_predictions(probe, counts).collect()
    assert all(r["pred_label"] == "en" and r["margin"] is None for r in preds)
    kept = nb_gate(probe, counts, "en", min_margin=0.5)
    assert kept.count() == 2
    assert nb_gate(probe, counts, "fr").count() == 0
