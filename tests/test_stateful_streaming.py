"""applyInPandasWithState sessionization: both close paths, parity
with the batch twin, and checkpointed incremental correctness."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from square_etl_spark.io import load_table
from square_etl_spark.operators.windows import sessionize
from square_etl_spark.schemas import EVENTS
from square_etl_spark.streaming.stateful import sessionize_stateful


def _run_stream(spark, src, ckpt, name, gap_s=1800.0):
    stream = spark.readStream.schema(EVENTS).parquet(src)
    out = sessionize_stateful(stream, gap_s=gap_s)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"select * from {name}").collect()


def test_stateful_sessions_match_batch_twin(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").filter("user_id < 10")
    src = os.path.join(tmp_path, "src")
    ev.write.mode("overwrite").parquet(src)

    got = _run_stream(spark, src, os.path.join(tmp_path, "ckpt"), "sess_a")
    batch = sessionize(ev, "ts", ["user_id"], 1800.0).collect()

    skeys = {(r.user_id, r.session_start, r.session_end, r.n_events) for r in got}
    bkeys = {(r.user_id, r.session_start, r.session_end, r.n_events) for r in batch}
    # every emitted session is a true session
    assert skeys <= bkeys
    # only each user's final (never-closeable) open session may be missing
    missing = bkeys - skeys
    last_per_user = {}
    for r in batch:
        cur = last_per_user.get(r.user_id)
        if cur is None or r.session_start > cur.session_start:
            last_per_user[r.user_id] = r
    allowed = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in last_per_user.values()
    }
    assert missing <= allowed
    # both close mechanisms fired on realistic data
    assert {r.closed_by for r in got} == {"gap", "timeout"}


def test_stateful_incremental_batches_keep_state(spark, sf_dir, tmp_path):
    # split one user's events at a mid-session point: the session that
    # straddles the file boundary must come out whole, not split —
    # i.e. state genuinely carries across micro-batches.  Sink is
    # foreachBatch→parquet (memory sink can't recover a checkpoint).
    ev = load_table(spark, sf_dir, "events").filter("user_id = 3").cache()
    src = os.path.join(tmp_path, "src")
    ckpt = os.path.join(tmp_path, "ckpt")
    out_dir = os.path.join(tmp_path, "out")

    def run_once():
        stream = spark.readStream.schema(EVENTS).parquet(src)
        out = sessionize_stateful(stream, gap_s=1800.0)

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out_dir)

        q = (
            out.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    first = ev.filter("ts < timestamp'2024-01-03'")
    rest = ev.filter("ts >= timestamp'2024-01-03'")
    first.write.mode("overwrite").parquet(src)
    run_once()
    rest.write.mode("append").parquet(src)
    run_once()
    got = spark.read.parquet(out_dir).collect()

    batch = sessionize(ev, "ts", ["user_id"], 1800.0).collect()
    bkeys = {(r.session_start, r.session_end, r.n_events) for r in batch}
    skeys = {(r.session_start, r.session_end, r.n_events) for r in got}
    assert skeys <= bkeys
    # no session was emitted twice across the two runs
    assert len(skeys) == len(got)


def test_stateful_funnel_matches_batch_twin_in_order(spark, sf_dir, tmp_path):
    """Three time-ordered micro-batches through funnel_stateful must
    reproduce the batch funnel exactly: same users, same stages, same
    stage timestamps — the in-order-delivery contract."""
    from square_etl_spark.operators.behavior import funnel_stage_times
    from square_etl_spark.streaming.stateful import funnel_stateful

    ev = load_table(spark, sf_dir, "events").filter("user_id < 20")
    src = os.path.join(tmp_path, "fsrc")
    os.makedirs(src)
    stages = ["view", "click", "purchase"]
    got = {}
    # grow ONE source directory batch by batch (time-ordered files) and
    # re-run availableNow against the SAME checkpoint — true
    # cross-micro-batch state carry, like the sessionize test above
    batches = [
        ev.filter("ts < '2024-01-08'"),
        ev.filter("ts >= '2024-01-08' and ts < '2024-01-16'"),
        ev.filter("ts >= '2024-01-16'"),
    ]
    out_dir = os.path.join(tmp_path, "fout")
    for i, b in enumerate(batches):
        b.coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(EVENTS).parquet(src)
        out = funnel_stateful(stream, stages)
        q = (
            out.writeStream.foreachBatch(
                lambda bdf, bid: bdf.write.mode("append").parquet(out_dir)
            )
            .outputMode("append")
            .option(
                "checkpointLocation", os.path.join(tmp_path, "fckpt")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    for r in spark.read.parquet(out_dir).collect():
        key = (r.user_id, r.stage)
        assert key not in got, "a stage must be emitted exactly once"
        got[key] = r.stage_ts

    batch = funnel_stage_times(ev, "ts", "user_id", "event_type", stages)
    want = {}
    for r in batch.collect():
        for i in range(1, 4):
            ts = r[f"stage_{i}_ts"]
            if ts is not None:
                want[(r.user_id, i)] = ts
    assert got == want


def test_stateful_funnel_does_not_rewind_on_late_stage_one(spark, tmp_path):
    """Documented set-once contract: a stage-1 event arriving in a
    LATER batch than the one that set stage 1 cannot retroactively
    improve the funnel."""
    import datetime as dt

    from square_etl_spark.streaming.stateful import funnel_stateful

    src = os.path.join(tmp_path, "lsrc")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    b0 = spark.createDataFrame(
        [(0, dt.datetime(2024, 1, 5), 1, "view", 0.0, "{}"),
         (1, dt.datetime(2024, 1, 6), 1, "click", 0.0, "{}")],
        schema,
    )
    b1 = spark.createDataFrame(  # earlier view, delivered late
        [(2, dt.datetime(2024, 1, 1), 1, "view", 0.0, "{}")], schema
    )
    os.makedirs(src)
    out_dir = os.path.join(tmp_path, "lout")
    for i, b in enumerate([b0, b1]):
        b.coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            funnel_stateful(stream, ["view", "click"])
            .writeStream.foreachBatch(
                lambda bdf, bid: bdf.write.mode("append").parquet(out_dir)
            )
            .outputMode("append")
            .option("checkpointLocation", os.path.join(tmp_path, "lckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    got = {
        (r.user_id, r.stage): r.stage_ts
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {
        (1, 1): dt.datetime(2024, 1, 5),  # NOT rewound to Jan 1
        (1, 2): dt.datetime(2024, 1, 6),
    }


def test_stateful_twap_skips_out_of_order_late_event(spark, tmp_path):
    """r07 advice: a late event inside the watermark arrives with
    t < last seen timestamp; folding it would add a NEGATIVE dt into
    num/den and silently corrupt the accumulators (den can go
    non-positive, nulling twap_finalize).  The monotonic guard must
    SKIP it — same posture as the funnel's set-once contract."""
    import datetime as dt

    from square_etl_spark.streaming.stateful import (
        twap_finalize,
        twap_stateful,
    )

    src = os.path.join(tmp_path, "twsrc")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    b0 = spark.createDataFrame(
        [(0, dt.datetime(2024, 1, 5), 1, "obs", 10.0, "{}"),
         (1, dt.datetime(2024, 1, 6), 1, "obs", 20.0, "{}")],
        schema,
    )
    b1 = spark.createDataFrame(  # earlier observation, delivered late
        [(2, dt.datetime(2024, 1, 1), 1, "obs", 99.0, "{}")], schema
    )
    os.makedirs(src)
    out_dir = os.path.join(tmp_path, "twout")
    for i, b in enumerate([b0, b1]):
        b.coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            twap_stateful(stream)
            .writeStream.foreachBatch(
                lambda bdf, bid: bdf.withColumn(
                    "batch_id", F.lit(bid)
                ).write.mode("append").parquet(out_dir)
            )
            .outputMode("append")
            .option("checkpointLocation", os.path.join(tmp_path, "twckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    acc = spark.read.parquet(out_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("batch_id").desc())
    latest = (
        acc.withColumn("rk", F.row_number().over(w))
        .filter("rk = 1")
        .drop("rk", "batch_id")
    )
    rows = twap_finalize(latest).collect()
    assert len(rows) == 1
    r = rows[0]
    # the Jan-1 late row contributed NOTHING: one Jan5→Jan6 interval
    assert r["n_intervals"] == 1
    assert r["total_seconds"] == 86400  # positive — no negative dt folded
    assert r["twap"] == 10.0


def test_stateful_twap_matches_batch_twin_bit_exact(spark, sf_dir, tmp_path):
    """Three time-ordered micro-batches through twap_stateful, then the
    shared Spark-column finalize, must reproduce the batch TWAP
    BIT-IDENTICALLY (exact integer accumulators + one arithmetic
    path) for every user whose intervals are complete in-stream."""
    from square_etl_spark.operators.windows import time_weighted_avg
    from square_etl_spark.streaming.stateful import (
        twap_finalize,
        twap_stateful,
    )

    ev = load_table(spark, sf_dir, "events").filter("user_id < 25")
    src = os.path.join(tmp_path, "tsrc")
    os.makedirs(src)
    out_dir = os.path.join(tmp_path, "tout")
    batches = [
        ev.filter("ts < '2024-01-08'"),
        ev.filter("ts >= '2024-01-08' and ts < '2024-01-16'"),
        ev.filter("ts >= '2024-01-16'"),
    ]
    for i, b in enumerate(batches):
        b.coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(EVENTS).parquet(src)
        out = twap_stateful(stream)
        q = (
            out.writeStream.foreachBatch(
                lambda bdf, bid: bdf.withColumn(
                    "batch_id", F.lit(bid)
                ).write.mode("append").parquet(out_dir)
            )
            .outputMode("append")
            .option("checkpointLocation", os.path.join(tmp_path, "tckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    acc = spark.read.parquet(out_dir)
    # update semantics: the LAST emitted accumulator row per user
    w = Window.partitionBy("user_id").orderBy(F.col("batch_id").desc())
    latest = (
        acc.withColumn("rk", F.row_number().over(w))
        .filter("rk = 1")
        .drop("rk", "batch_id")
    )
    got = {
        r["user_id"]: (r["twap"], r["total_seconds"], r["n_intervals"])
        for r in twap_finalize(latest).collect()
    }
    want = {
        r["user_id"]: (r["twap"], r["total_seconds"], r["n_intervals"])
        for r in time_weighted_avg(
            ev, "ts", ["user_id"], "value", tiebreak_cols=["event_id"]
        ).collect()
    }
    assert got == want


def test_native_session_window_stream_matches_batch(spark, sf_dir, tmp_path):
    """The BUILT-IN streaming session window (F.session_window +
    watermark, append mode) finalizes exactly the sessions the batch
    operator computes — the idiomatic-Spark twin of the
    applyInPandasWithState path above.  Finalization is watermark-
    driven, so two sentinel drains advance the watermark past every
    real session (watermark for batch N comes from batch N-1's max
    event time); sentinel rows are filtered from the comparison."""
    from square_etl_spark.operators.windows import sessionize_native

    ev = load_table(spark, sf_dir, "events").filter("user_id < 10").cache()
    src = os.path.join(tmp_path, "nsrc")
    ckpt = os.path.join(tmp_path, "nckpt")
    out_dir = os.path.join(tmp_path, "nout")

    def run_once():
        stream = spark.readStream.schema(EVENTS).parquet(src)
        out = sessionize_native(
            stream.withWatermark("ts", "0 seconds"),
            "ts",
            ["user_id"],
            "1800 seconds",
        )
        q = (
            out.writeStream.foreachBatch(
                lambda bdf, bid: bdf.write.mode("append").parquet(out_dir)
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def sentinel(days):
        cols = []
        for c in ev.columns:
            if c == "user_id":
                cols.append(F.lit(999_999).cast("long").alias(c))
            elif c == "ts":
                cols.append(
                    F.expr(
                        f"timestamp'2024-06-01' + interval {days} days"
                    ).alias(c)
                )
            else:
                cols.append(F.col(c))
        return ev.limit(1).select(*cols)

    ev.coalesce(1).write.mode("append").parquet(src)
    run_once()
    sentinel(10).coalesce(1).write.mode("append").parquet(src)
    run_once()
    sentinel(20).coalesce(1).write.mode("append").parquet(src)
    run_once()

    got = spark.read.parquet(out_dir).filter("user_id < 10")
    want = sessionize_native(ev, "ts", ["user_id"], "1800 seconds")
    key = lambda r: (r.user_id, r.session_start, r.session_end, r.n_events)
    got_k = sorted(map(key, got.collect()))
    assert got_k == sorted(map(key, want.collect()))
    assert len(got_k) == len(set(got_k))  # append mode: no re-emission
