"""JDBC upsert sink: SQL generation + batch-dedupe semantics.

The connection path needs a driver jar this container doesn't have, so
these tests pin everything up to the wire: statement text, identifier
safety, key-uniqueness of the staged batch, and the no-driver error.
"""

import pytest
from pyspark.sql import functions as F

from square_etl_spark.sinks.jdbc import (
    dedupe_batch,
    upsert_statement,
    write_jdbc_upsert,
)


def test_upsert_statement_shape():
    sql = upsert_statement(
        "pos.pos_payments",
        "pos.pos_payments_staging",
        ["tenant_id", "provider", "payment_id", "amount", "status"],
        ["tenant_id", "provider", "payment_id"],
    )
    assert "INSERT INTO pos.pos_payments AS t" in sql
    assert "FROM pos.pos_payments_staging" in sql
    assert "ON CONFLICT (tenant_id, provider, payment_id) DO UPDATE SET" in sql
    assert "amount = EXCLUDED.amount" in sql
    assert "status = EXCLUDED.status" in sql
    # key columns are never in the SET list
    assert "payment_id = EXCLUDED" not in sql
    # idempotence guard: no-op update rows are skipped server-side
    assert "t.amount IS DISTINCT FROM EXCLUDED.amount" in sql


def test_upsert_statement_pure_key_table():
    sql = upsert_statement("t", "t_staging", ["a", "b"], ["a", "b"])
    assert sql.endswith("DO NOTHING")


def test_upsert_statement_rejects_bad_identifiers():
    with pytest.raises(ValueError):
        upsert_statement("t; DROP TABLE x", "s", ["a"], ["a"])
    with pytest.raises(ValueError):
        upsert_statement("t", "s", ["a", 'b"'], ["a"])
    with pytest.raises(ValueError):
        upsert_statement("t", "s", ["a"], ["missing"])
    with pytest.raises(ValueError):
        upsert_statement("t", "s", ["a"], [])


def test_dedupe_batch_last_writer_wins(spark):
    df = spark.createDataFrame(
        [("k1", 1, "old"), ("k1", 3, "new"), ("k2", 2, "only")],
        "id string, ver int, payload string",
    )
    out = dedupe_batch(df, ["id"], order_col="ver").orderBy("id").collect()
    assert [(r.id, r.payload) for r in out] == [("k1", "new"), ("k2", "only")]


def test_dedupe_batch_deterministic_without_order_col(spark):
    df = spark.createDataFrame(
        [("k", 1, "a"), ("k", 1, "b")], "id string, ver int, payload string"
    )
    a = dedupe_batch(df, ["id"]).collect()
    b = dedupe_batch(df.repartition(8), ["id"]).collect()
    assert a == b  # partition-invariant winner


def test_write_jdbc_upsert_requires_driver(spark):
    df = spark.createDataFrame([("k", 1)], "id string, v int")
    with pytest.raises(RuntimeError, match="driver"):
        write_jdbc_upsert(df, "jdbc:postgresql://nowhere/db", "t", ["id"])


def test_write_jdbc_upsert_empty_batch_short_circuits(spark):
    # K3: empty batch returns the would-be SQL without needing a driver
    df = spark.createDataFrame([], "id string, v int").filter(F.lit(False))
    sql = write_jdbc_upsert(df, "jdbc:postgresql://nowhere/db", "t", ["id"])
    assert "ON CONFLICT (id)" in sql
