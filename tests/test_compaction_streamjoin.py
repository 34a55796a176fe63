"""Small-file compaction + watermarked stream-stream interval join."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from square_etl_spark.io import compact_table, load_table
from square_etl_spark.operators.joins import range_join_binned
from square_etl_spark.schemas import EVENTS


def _parquet_files(path):
    return [
        os.path.join(root, f)
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    ]


def test_compact_table_preserves_rows(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = os.path.join(tmp_path, "frag")
    # fragment: 64 tiny files
    ev.repartition(64).write.mode("overwrite").parquet(path)
    assert len(_parquet_files(path)) == 64
    before = {tuple(r) for r in spark.read.parquet(path).collect()}
    n_files = compact_table(spark, path, target_files=4)
    assert n_files == 4
    after = {tuple(r) for r in spark.read.parquet(path).collect()}
    assert after == before


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, tmp_path):
    """Watermarked stream-stream join with a time-range condition — the
    Structured Streaming twin of range_join_binned; results must agree
    with the batch operator on the same data."""
    ev = load_table(spark, sf_dir, "events")
    src = os.path.join(tmp_path, "src")
    ev.write.mode("overwrite").parquet(src)

    def side(df, typ, prefix):
        return df.filter(F.col("event_type") == typ).select(
            F.col("user_id").alias(f"{prefix}_user"),
            F.col("event_id").alias(f"{prefix}_id"),
            F.col("ts").alias(f"{prefix}_ts"),
        )

    stream = spark.readStream.schema(EVENTS).parquet(src)
    errors = side(stream, "error", "e").withWatermark("e_ts", "1 hour")
    clicks = side(stream, "click", "c").withWatermark("c_ts", "1 hour")
    joined = errors.join(
        clicks,
        F.expr(
            """
            e_user = c_user AND
            c_ts > e_ts - INTERVAL 10 MINUTES AND
            c_ts <= e_ts
            """
        ),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmp_path, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r.e_id, r.c_id) for r in spark.sql("select * from ssj").collect()
    }

    batch = range_join_binned(
        side(ev, "error", "e"),
        side(ev, "click", "c").withColumnRenamed("c_user", "e_user"),
        on=["e_user"],
        left_ts="e_ts",
        right_ts="c_ts",
        lower_s=-600.0,
        upper_s=0.0,
    )
    expected = {(r.e_id, r.c_id) for r in batch.collect()}
    assert streamed == expected
