"""P1–P9 / F1–F9 semantics on tiny in-memory frames (SURVEY.md §5.4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from square_etl_spark.operators.projections import (
    coalesce_first,
    flatten_address,
    json_field,
    raw_payload,
    tolerant_double,
    valid_quantity_filter,
    with_default,
)


def test_tolerant_double_parse_semantics(spark):
    # reference: parseFloat + finiteness guard → drop row on garbage
    # (src/etl-square-orders.ts:61-68)
    df = spark.createDataFrame(
        [("abc",), ("0",), ("2.5",), (None,), ("-3",), ("1e2",)], ["q"]
    )
    parsed = df.select(tolerant_double("q").alias("v")).collect()
    assert [r.v for r in parsed] == [None, 0.0, 2.5, None, -3.0, 100.0]


def test_valid_quantity_filter_drops_nonpositive_and_garbage(spark):
    df = spark.createDataFrame(
        [(1, "abc"), (2, "0"), (3, "2.5"), (4, None), (5, "-1"), (6, "4")],
        ["id", "q"],
    )
    kept = valid_quantity_filter(df, "q").select("id").collect()
    assert sorted(r.id for r in kept) == [3, 6]


def test_coalesce_money_chain(spark):
    # total ?? amount (src/etl-square-payments.ts:29)
    df = spark.createDataFrame(
        [(100, None), (None, 50), (None, None), (7, 8)],
        "total long, amount long",
    )
    out = df.select(coalesce_first("total", "amount").alias("m")).collect()
    assert [r.m for r in out] == [100, 50, None, 7]


def test_with_default_unknown_state(spark):
    # state ?? "UNKNOWN" (src/etl-square-inventory.ts:55)
    df = spark.createDataFrame([("SOLD",), (None,)], "state string")
    out = df.select(with_default("state", "UNKNOWN").alias("s")).collect()
    assert [r.s for r in out] == ["SOLD", "UNKNOWN"]


def test_flatten_address_skips_nulls_and_yields_null_when_empty(spark):
    # [a,b,c].filter(Boolean).join(", ") with NULL (not '') when all
    # parts are null (src/etl-square-locations.ts:36-43; SURVEY §7 #4)
    df = spark.createDataFrame(
        [("1 Main St", None, "Springfield"), (None, None, None)],
        "line1 string, line2 string, city string",
    )
    out = df.select(flatten_address("line1", "line2", "city").alias("a")).collect()
    assert out[0].a == "1 Main St, Springfield"
    assert out[1].a is None


def test_raw_payload_roundtrip(spark):
    # to_json(struct(*)) must be recoverable via get_json_object
    # (raw_payload escape hatch, SURVEY.md §1.2)
    df = spark.createDataFrame([(1, "x"), (2, None)], "id long, name string")
    with_payload = df.withColumn("raw_payload", raw_payload(df))
    back = with_payload.select(
        json_field("raw_payload", "$.id").cast("long").alias("id2"),
        json_field("raw_payload", "$.name").alias("name2"),
    ).collect()
    assert [(r.id2, r.name2) for r in back] == [(1, "x"), (2, None)]


def test_observed_counts_piggyback_on_action(spark, sf_dir):
    # A2: metrics come out of the SAME job as the action — no extra pass
    from pyspark.sql import functions as F

    from square_etl_spark.io import load_table
    from square_etl_spark.operators.aggregations import observed

    li = load_table(spark, sf_dir, "lineitem")
    df, obs = observed(
        li, "stage",
        F.count(F.lit(1)).alias("n_fetched"),
        F.sum(F.when(F.col("l_quantity") > 0, 1).otherwise(0)).alias("n_valid"),
    )
    total = df.count()
    assert obs.get["n_fetched"] == total
    assert obs.get["n_valid"] <= total
