"""Quarantine/invariant operators + registry contract checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from square_etl_spark.operators.quality import assert_invariant, quarantine_split
from square_etl_spark.queries import registry


def test_quarantine_split_first_matching_reason(spark):
    df = spark.createDataFrame(
        [(1, None, None), (2, "t", -1), (3, "t", 5)],
        "id long, typ string, val long",
    )
    valid, rejects = quarantine_split(
        df,
        [
            ("missing_type", F.col("typ").isNull()),
            ("bad_value", F.col("val").isNull() | (F.col("val") <= 0)),
        ],
    )
    assert [r.id for r in valid.collect()] == [3]
    got = {r.id: r.reject_reason for r in rejects.collect()}
    # row 1 violates both rules → FIRST reason wins
    assert got == {1: "missing_type", 2: "bad_value"}


def test_assert_invariant_raises_on_violation(spark):
    df = spark.createDataFrame([(1,), (-5,)], "v long")
    ok = assert_invariant(df.filter("v > 0"), F.col("v") > 0, "neg!")
    assert ok.count() == 1
    bad = assert_invariant(df, F.col("v") > 0, "negative value row")
    with pytest.raises(Exception, match="negative value row"):
        bad.count()


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_registry_contract():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 30
    assert set(oracles) <= set(qs)
    # every oracle-less query is a deliberate rows-only op
    rows_only = {s.name for s in registry() if s.oracle is None}
    assert rows_only == set(qs) - set(oracles)
    # names are unique and every spec is callable
    assert len({s.name for s in registry()}) == len(registry())


def test_queries_runnable_at_smallest_sf(spark, sf_dir):
    # smoke every registered query at sf0.001 (cheap end-to-end sweep)
    for spec in registry():
        n = spec.fn(spark, sf_dir).count()
        assert n >= 0, spec.name


def test_vanilla_session_confs_are_healed_by_load_table(spark):
    # the driver may hand entry()/queries() a session it built itself —
    # load_table must apply the confs our semantics require
    from square_etl_spark.io import load_table

    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        df = load_table(spark, "/root/testdata/sf0.001", "events")
        assert df.count() > 0
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.ansi.enabled", "true")


def test_expectation_report_counts_nulls_as_violations(spark):
    from pyspark.sql import functions as F

    from square_etl_spark.operators.quality import expectation_report

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None), (4, 2.0)],
        "id long, amount double",
    )
    rep = {
        r["rule"]: (r["violations"], r["n_rows"])
        for r in expectation_report(
            df,
            [
                ("amount_positive", F.col("amount") > 0),
                ("id_small", F.col("id") < 100),
            ],
        ).collect()
    }
    # -5.0 violates; NULL cannot be evaluated -> violation too
    assert rep["amount_positive"] == (2, 4)
    assert rep["id_small"] == (0, 4)


def test_expectation_report_is_single_scan(spark, sf_dir):
    from pyspark.sql import functions as F

    from square_etl_spark.io import load_table
    from square_etl_spark.operators.quality import expectation_report

    o = load_table(spark, sf_dir, "orders")
    rep = expectation_report(
        o,
        [
            ("price_positive", F.col("o_totalprice") > 0),
            ("key_nonnull", F.col("o_orderkey").isNotNull()),
        ],
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1  # k rules, ONE pass


def test_drift_psi_identical_snapshots_score_zero(spark):
    """PSI of a distribution against itself is 0; a hard shift scores
    well past the 0.25 'shifted' rule of thumb."""
    from pyspark.sql import functions as F

    from square_etl_spark.operators.quality import drift_psi

    ref = spark.range(1000).select((F.col("id") % 100).cast("double").alias("v"))
    same = drift_psi(ref, ref, "v", bins=10).collect()
    assert all(r["psi_total"] == 0.0 for r in same)
    assert len(same) == 10
    shifted = spark.range(1000).select(
        ((F.col("id") % 100) + 200).cast("double").alias("v")
    )
    out = drift_psi(ref, shifted, "v", bins=10).collect()
    # everything clamps into the top reference bin → massive drift
    assert out[0]["psi_total"] > 0.25
    top = {r["bin"]: r["n_cur"] for r in out}
    assert top[9] == 1000 and sum(v for k, v in top.items() if k < 9) == 0


def test_blocklist_gate_semantics(spark, sf_dir):
    """blocklist_gate: exact whole-token match (no substring bans),
    max_hits threshold, passthrough schema, empty-list rejection."""
    import pytest
    from pyspark.sql import functions as F

    from square_etl_spark.operators.text import blocklist_gate, blocklist_hits

    df = spark.createDataFrame(
        [
            (1, "the Assess report"),      # 'assess' is NOT 'ass'
            (2, "an ass appears here"),
            (3, "ASS and damn together"),  # case-folded, 2 distinct
            (4, "clean text entirely"),
            (5, "ass ass ass"),            # distinct count = 1
        ],
        "doc_id long, text string",
    )
    terms = ["ass", "damn"]
    hits = {
        r["doc_id"]: r["h"]
        for r in df.select(
            "doc_id", blocklist_hits("text", terms).alias("h")
        ).collect()
    }
    assert hits == {1: 0, 2: 1, 3: 2, 4: 0, 5: 1}

    kept0 = {r["doc_id"] for r in blocklist_gate(df, terms).collect()}
    assert kept0 == {1, 4}
    kept1 = {
        r["doc_id"] for r in blocklist_gate(df, terms, max_hits=1).collect()
    }
    assert kept1 == {1, 2, 4, 5}
    assert blocklist_gate(df, terms).columns == df.columns

    with pytest.raises(ValueError, match="non-empty"):
        blocklist_hits("text", [])
