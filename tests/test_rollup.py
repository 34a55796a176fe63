"""Incremental rollup maintenance: the monoid property that makes
O(batch) materialized-view refresh exact (operators/aggregations)."""

from __future__ import annotations

from pyspark.sql import functions as F

from square_etl_spark.operators.aggregations import incremental_rollup


def _one_shot(df, keys, cols):
    return df.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in cols],
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )


def _as_set(df):
    return {tuple(r) for r in df.collect()}


def test_incremental_equals_one_shot_any_split(spark):
    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), ("b", 1, 5), ("a", 3, 1), ("b", 2, 7)],
        "k string, seq int, v long",
    ).drop("seq")
    want = _as_set(_one_shot(df, ["k"], ["v"]))
    # split into 1, 2, and 5 batches — all must converge identically
    for nsplit in (1, 2, 5):
        with_id = df.withColumn("__i", F.monotonically_increasing_id())
        rollup = None
        for i in range(nsplit):
            b = with_id.filter(F.col("__i") % nsplit == i).drop("__i")
            rollup = incremental_rollup(rollup, b, ["k"], ["v"])
        assert _as_set(rollup) == want, f"nsplit={nsplit}"


def test_incremental_rollup_new_keys_appear(spark):
    b1 = spark.createDataFrame([("a", 1)], "k string, v long")
    b2 = spark.createDataFrame([("b", 2), ("a", 3)], "k string, v long")
    r = incremental_rollup(
        incremental_rollup(None, b1, ["k"], ["v"]), b2, ["k"], ["v"]
    )
    assert _as_set(r) == {("a", 4, 2), ("b", 2, 1)}
