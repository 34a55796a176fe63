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


def _consistent_reads(path, stop, results, errors):
    """Concurrent-reader loop (duckdb, fresh connection per read — no
    Spark in the thread): every SUCCESSFUL read of the swapped table
    must be one complete version (a single distinct tag and the full
    row count); the rename window may surface only as a clean
    file/IO error, never as a torn mix of two versions."""
    import glob

    import duckdb

    while not stop.is_set():
        files = glob.glob(os.path.join(path, "*.parquet"))
        if not files:
            errors.append("missing")
            continue
        try:
            con = duckdb.connect()
            rows = con.sql(
                "SELECT COUNT(*) n, COUNT(DISTINCT tag) t, MIN(tag) v "
                f"FROM read_parquet({files!r})"
            ).fetchone()
            con.close()
        except Exception:
            errors.append("io")  # vanished mid-read: the clean window
            continue
        results.append(rows)


def test_merge_upsert_swap_under_concurrent_reader(spark, tmp_path):
    """E3 atomic swap UNDER A CONCURRENT READER (r10 verdict item 8):
    while merge_upsert repeatedly swaps new versions in, a reader
    polling the path sees ONLY complete versions — every successful
    read returns all 50 keys carrying one single batch tag; version
    mixes (torn reads) never occur.  Clean file-not-found during the
    rename window is the documented behavior and is tolerated."""
    import threading

    from square_etl_spark.sinks.merge import merge_upsert

    path = os.path.join(tmp_path, "swap_target")
    first = spark.createDataFrame(
        [(i, 0) for i in range(50)], "id long, tag long"
    )
    merge_upsert(spark, path, first, ["id"], ["tag"])

    stop = threading.Event()
    results: list = []
    errors: list = []
    t = threading.Thread(
        target=_consistent_reads, args=(path, stop, results, errors)
    )
    t.start()
    try:
        for b in range(1, 7):
            batch = spark.createDataFrame(
                [(i, b) for i in range(50)], "id long, tag long"
            )
            merge_upsert(spark, path, batch, ["id"], ["tag"])
    finally:
        stop.set()
        t.join(timeout=30)
    assert results, "reader never completed a successful read"
    for n, distinct_tags, v in results:
        assert n == 50, f"partial snapshot: {n} rows"
        assert distinct_tags == 1, f"torn read: {distinct_tags} tags"
        assert 0 <= v <= 6
    # the final state is the last batch, complete
    final = spark.read.parquet(path)
    assert final.count() == 50
    assert final.agg(F.min("tag"), F.max("tag")).collect()[0] == (6, 6)


def test_compact_table_swap_under_concurrent_reader(spark, tmp_path):
    """compact_table now publishes through the same sibling-staging
    rename swap as merge_upsert (it used rmtree+move from /tmp — the
    exact crash window _swap_into closes, and a cross-filesystem
    non-atomic copy): repeated compaction under a polling reader
    yields only complete snapshots with the invariant content."""
    import threading

    path = os.path.join(tmp_path, "compact_target")
    df = spark.createDataFrame(
        [(i, 1) for i in range(200)], "id long, tag long"
    )
    df.repartition(16).write.mode("overwrite").parquet(path)

    stop = threading.Event()
    results: list = []
    errors: list = []
    t = threading.Thread(
        target=_consistent_reads, args=(path, stop, results, errors)
    )
    t.start()
    try:
        for target in (2, 8, 3, 6):
            n_files = compact_table(spark, path, target_files=target)
            assert n_files == target
    finally:
        stop.set()
        t.join(timeout=30)
    assert results, "reader never completed a successful read"
    for n, distinct_tags, _ in results:
        assert n == 200, f"partial snapshot: {n} rows"
        assert distinct_tags == 1
    after = {tuple(r) for r in spark.read.parquet(path).collect()}
    assert after == {(i, 1) for i in range(200)}


def test_versioned_pointer_concurrent_reader_and_vacuum(spark, tmp_path):
    """The versioned-table pointer flip (io.versioned_write) under a
    concurrent reader WITH vacuum running between publishes: a reader
    that resolves the pointer and reads that snapshot always gets one
    complete version (count and tag consistent); keep=2 means the
    resolved version can be vacuumed only if the reader raced ≥2
    publishes — tolerated as a clean error, never a torn table."""
    import glob
    import threading

    from square_etl_spark.io import (
        table_version,
        versioned_vacuum,
        versioned_write,
    )

    path = os.path.join(tmp_path, "vtab")
    counts = {}

    def publish(v):
        df = spark.createDataFrame(
            [(i, v) for i in range(10 * v)], "id long, tag long"
        )
        got = versioned_write(spark, df, path)
        assert got == v
        counts[v] = 10 * v

    publish(1)
    stop = threading.Event()
    bad: list = []
    oks: list = []

    def reader():
        import duckdb

        while not stop.is_set():
            v = table_version(path)
            files = glob.glob(os.path.join(path, f"v={v}", "*.parquet"))
            if not files:
                continue
            try:
                con = duckdb.connect()
                n, t, tag = con.sql(
                    "SELECT COUNT(*), COUNT(DISTINCT tag), MIN(tag) "
                    f"FROM read_parquet({files!r})"
                ).fetchone()
                con.close()
            except Exception:
                continue  # raced ≥2 publishes into a vacuum: clean error
            if t != 1 or tag != v or n != 10 * v:
                bad.append((v, n, t, tag))
            else:
                oks.append(v)

    t = threading.Thread(target=reader)
    t.start()
    try:
        for v in range(2, 8):
            publish(v)
            versioned_vacuum(path, keep=2, orphan_grace_seconds=0)
    finally:
        stop.set()
        t.join(timeout=30)
    assert oks, "reader never completed a successful read"
    assert bad == [], f"torn/inconsistent reads: {bad[:5]}"
