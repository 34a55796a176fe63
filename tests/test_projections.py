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


def test_conform_schema_fills_missing_drops_extra_widens_types(spark):
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    from square_etl_spark.operators.projections import conform_schema

    target = StructType([
        StructField("id", LongType()),
        StructField("amount", DoubleType()),
        StructField("currency", StringType()),
    ])
    # old-generation batch: int id (widen), no currency (fill),
    # legacy column (drop)
    batch = spark.createDataFrame(
        [(1, 2.5, "x")], "id int, amount double, legacy string"
    )
    out = conform_schema(batch, target, defaults={"currency": "USD"})
    # names + types conform; nullability is advisory in Spark (a lit
    # default is non-nullable, which only strengthens the contract)
    assert [(f.name, f.dataType) for f in out.schema.fields] == [
        (f.name, f.dataType) for f in target.fields
    ]
    row = out.collect()[0]
    assert (row.id, row.amount, row.currency) == (1, 2.5, "USD")


def test_conform_schema_extra_column_can_be_an_error(spark):
    import pytest
    from pyspark.sql.types import LongType, StructField, StructType

    from square_etl_spark.operators.projections import conform_schema

    target = StructType([StructField("id", LongType())])
    batch = spark.createDataFrame([(1, "junk")], "id long, surprise string")
    with pytest.raises(ValueError, match="surprise"):
        conform_schema(batch, target, on_extra="error")


def test_conform_schema_refuses_lossy_casts_unless_forced(spark):
    import pytest
    from pyspark.sql.types import IntegerType, StructField, StructType

    from square_etl_spark.operators.projections import conform_schema

    target = StructType([StructField("id", IntegerType())])
    batch = spark.createDataFrame([(2**40,)], "id long")
    with pytest.raises(ValueError, match="lossless"):
        conform_schema(batch, target)
    # forced: the caller owns the truncation
    forced = conform_schema(batch, target, unsafe_cast=True)
    assert [(f.name, f.dataType) for f in forced.schema.fields] == [
        (f.name, f.dataType) for f in target.fields
    ]


def test_conform_schema_then_merge_upsert(spark):
    """The evolution path end-to-end: an old-generation batch (missing
    the new column) conforms, then merges into the current target."""
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    from square_etl_spark.operators.projections import conform_schema
    from square_etl_spark.sinks.merge import merge_dataframes

    target_schema = StructType([
        StructField("k", LongType()),
        StructField("v", DoubleType()),
        StructField("tier", StringType()),
    ])
    target = spark.createDataFrame([(1, 1.0, "gold")], target_schema)
    old_batch = spark.createDataFrame([(1, 9.0), (2, 5.0)], "k long, v double")
    conformed = conform_schema(old_batch, target_schema)
    merged = merge_dataframes(target, conformed, ["k"], ["v"])
    got = {r.k: (r.v, r.tier) for r in merged.collect()}
    assert got == {1: (9.0, None), 2: (5.0, None)}


def test_conform_schema_decimal_widening_is_lossless(spark):
    import pytest
    from pyspark.sql.types import DecimalType, StructField, StructType

    from square_etl_spark.operators.projections import conform_schema

    wide = StructType([StructField("amt", DecimalType(38, 6))])
    batch = spark.createDataFrame([("12345.67",)], "amt string").select(
        F.col("amt").cast("decimal(10,2)")
    )
    out = conform_schema(batch, wide)
    assert out.schema.fields[0].dataType == DecimalType(38, 6)
    assert str(out.collect()[0][0]) == "12345.670000"
    # narrowing still refuses
    narrow = StructType([StructField("amt", DecimalType(8, 1))])
    with pytest.raises(ValueError, match="narrows"):
        conform_schema(batch.select(F.col("amt")), narrow)
