"""Python Data Source: paginated JSON pages as parallel partitions,
with the time window negotiated through Catalyst filter pushdown —
the Spark-native form of the reference's cursor-paginated REST scan."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from square_etl_spark.io import load_table
from square_etl_spark.sources.paginated import PaginatedJsonDataSource


def _write_pages(spark, sf_dir, out_dir, page_rows=200):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("ts"),
        "user_id",
        "event_type",
        "value",
    )
    rows = [r.asDict() for r in ev.collect()]
    os.makedirs(out_dir, exist_ok=True)
    for i in range(0, len(rows), page_rows):
        with open(os.path.join(out_dir, f"page-{i // page_rows:05d}.json"), "w") as fh:
            for rec in rows[i : i + page_rows]:
                fh.write(json.dumps(rec) + "\n")
    return len(rows)


def test_pages_read_in_parallel_partitions(spark, sf_dir, tmp_path):
    pages = os.path.join(tmp_path, "pages")
    total = _write_pages(spark, sf_dir, pages)
    spark.dataSource.register(PaginatedJsonDataSource)
    df = spark.read.format("paginated_json").option("path", pages).load()
    assert df.count() == total == 1000
    # one partition per page file — the cursor loop, parallelized
    assert df.rdd.getNumPartitions() == len(os.listdir(pages)) == 5


def test_window_option_mirrors_url_params(spark, sf_dir, tmp_path):
    pages = os.path.join(tmp_path, "pages")
    _write_pages(spark, sf_dir, pages)
    spark.dataSource.register(PaginatedJsonDataSource)
    df = (
        spark.read.format("paginated_json")
        .option("path", pages)
        .option("begin", "2024-01-02T00:00:00")
        .option("end", "2024-01-03T00:00:00")
        .load()
    )
    expected = (
        load_table(spark, sf_dir, "events")
        .filter("ts >= timestamp'2024-01-02' and ts < timestamp'2024-01-03'")
        .count()
    )
    assert df.count() == expected


def test_catalyst_filter_reaches_the_source(spark, sf_dir, tmp_path):
    pages = os.path.join(tmp_path, "pages")
    _write_pages(spark, sf_dir, pages)
    spark.dataSource.register(PaginatedJsonDataSource)
    base = spark.read.format("paginated_json").option("path", pages).load()
    windowed = base.filter(
        (F.col("ts") >= "2024-01-02T00:00:00") & (F.col("ts") < "2024-01-03T00:00:00")
    ).filter(F.col("event_type") == "click")
    # accepted filters DISAPPEAR from the post-scan Filter node — the
    # observable proof they were pushed into (and enforced by) read()
    plan = windowed._jdf.queryExecution().executedPlan().toString()
    assert "2024-01-02" not in plan and "2024-01-03" not in plan
    assert "click" not in plan
    expected = (
        load_table(spark, sf_dir, "events")
        .filter("ts >= timestamp'2024-01-02' and ts < timestamp'2024-01-03'")
        .filter("event_type = 'click'")
        .count()
    )
    assert windowed.count() == expected


def _run_stream_once(spark, pages, out, ckpt):
    q = (
        spark.readStream.format("paginated_json")
        .option("path", pages)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_offsets_resume_exactly_once(spark, sf_dir, tmp_path):
    # the durable-cursor upgrade over the reference's stateless lookback
    # (SURVEY.md §2.8 T3): restarting from the checkpoint must consume
    # ONLY pages appended since the last committed offset — append-mode
    # output with no duplicates is the observable proof.
    pages = os.path.join(tmp_path, "pages")
    total = _write_pages(spark, sf_dir, pages)
    out = os.path.join(tmp_path, "out")
    ckpt = os.path.join(tmp_path, "ckpt")
    spark.dataSource.register(PaginatedJsonDataSource)

    _run_stream_once(spark, pages, out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == total == 1000

    # append one new page (the next cursor fetch) and resume
    extra = [
        {"event_id": 10_000 + i, "ts": "2024-01-09T00:00:00", "user_id": 1,
         "event_type": "click", "value": 1.0}
        for i in range(7)
    ]
    with open(os.path.join(pages, "page-99999.json"), "w") as fh:
        for rec in extra:
            fh.write(json.dumps(rec) + "\n")
    _run_stream_once(spark, pages, out, ckpt)

    got = spark.read.parquet(out)
    assert got.count() == total + 7  # old pages NOT re-read, no dupes
    assert got.select("event_id").distinct().count() == total + 7


def _events_as_wire(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("ts"),
        "user_id",
        "event_type",
        "value",
    )


def test_writer_round_trips_and_publishes_ordered_pages(spark, sf_dir, tmp_path):
    pages = os.path.join(tmp_path, "wpages")
    spark.dataSource.register(PaginatedJsonDataSource)
    ev = _events_as_wire(spark, sf_dir)
    ev.repartition(4).write.format("paginated_json").option("path", pages).mode(
        "overwrite"
    ).save()
    names = sorted(os.listdir(pages))
    assert names == [f"page-{i:05d}.json" for i in range(4)]  # no staging residue
    back = spark.read.format("paginated_json").option("path", pages).load()
    assert back.count() == ev.count() == 1000
    assert back.select("event_id").distinct().count() == 1000

    # append publishes AFTER the existing cursor range
    ev.limit(10).repartition(1).write.format("paginated_json").option(
        "path", pages
    ).mode("append").save()
    assert sorted(os.listdir(pages))[-1] == "page-00004.json"
    assert spark.read.format("paginated_json").option("path", pages).load().count() == 1010


def test_writer_empty_partitions_publish_no_pages(spark, sf_dir, tmp_path):
    # K3's empty-batch short-circuit, sink-side: 8 partitions of a
    # 3-row frame → only the non-empty ones become pages
    pages = os.path.join(tmp_path, "wpages")
    spark.dataSource.register(PaginatedJsonDataSource)
    ev = _events_as_wire(spark, sf_dir).limit(3)
    ev.repartition(8).write.format("paginated_json").option("path", pages).mode(
        "overwrite"
    ).save()
    assert 1 <= len(os.listdir(pages)) <= 3
    back = spark.read.format("paginated_json").option("path", pages).load()
    assert back.count() == 3


def test_writer_failed_job_publishes_nothing(spark, sf_dir, tmp_path):
    # E3 atomicity: a task failure mid-job must leave the directory
    # exactly as it was — no partial pages, no staging files
    pages = os.path.join(tmp_path, "wpages")
    spark.dataSource.register(PaginatedJsonDataSource)
    _events_as_wire(spark, sf_dir).limit(5).repartition(1).write.format(
        "paginated_json"
    ).option("path", pages).mode("overwrite").save()
    before = sorted(os.listdir(pages))

    from pyspark.sql.types import StringType

    @F.udf(StringType())
    def boom(s):
        raise RuntimeError("injected task failure")

    bad = _events_as_wire(spark, sf_dir).withColumn("ts", boom("ts"))
    import pytest as _pytest

    with _pytest.raises(Exception):
        bad.write.format("paginated_json").option("path", pages).mode(
            "append"
        ).save()
    assert sorted(os.listdir(pages)) == before


def test_stream_pages_in_pages_out(spark, sf_dir, tmp_path):
    # the full connector loop: stream-read pages from A, stream-write
    # pages into B, batch-read B — same rows, and a resumed run moves
    # only the newly appended page across.
    src = os.path.join(tmp_path, "src")
    dst = os.path.join(tmp_path, "dst")
    ckpt = os.path.join(tmp_path, "ckpt")
    total = _write_pages(spark, sf_dir, src)
    spark.dataSource.register(PaginatedJsonDataSource)

    def run_once():
        q = (
            spark.readStream.format("paginated_json")
            .option("path", src)
            .load()
            .writeStream.format("paginated_json")
            .option("path", dst)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    back = spark.read.format("paginated_json").option("path", dst).load()
    assert back.count() == total == 1000
    assert back.select("event_id").distinct().count() == 1000

    with open(os.path.join(src, "page-99998.json"), "w") as fh:
        fh.write(json.dumps({"event_id": 99_001, "ts": "2024-01-09T00:00:00",
                             "user_id": 1, "event_type": "click", "value": 2.0}) + "\n")
    run_once()
    back = spark.read.format("paginated_json").option("path", dst).load()
    assert back.count() == total + 1  # only the new page crossed, no dupes
    assert back.select("event_id").distinct().count() == total + 1


def test_boundary_rows_survive_le_and_strict_gt(spark, sf_dir, tmp_path):
    # the pushdown contract's sharp edges: <= must keep the boundary
    # row (source only accepts strict <), > must re-check strictness
    pages = os.path.join(tmp_path, "pages")
    os.makedirs(pages, exist_ok=True)
    with open(os.path.join(pages, "page-00000.json"), "w") as fh:
        for i, ts in enumerate(
            ["2024-01-01T00:00:00", "2024-01-02T00:00:00", "2024-01-03T00:00:00"]
        ):
            fh.write(
                json.dumps(
                    {"event_id": i, "ts": ts, "user_id": 1, "event_type": "x",
                     "value": 1.0}
                )
                + "\n"
            )
    spark.dataSource.register(PaginatedJsonDataSource)
    base = spark.read.format("paginated_json").option("path", pages).load()
    le = base.filter(F.col("ts") <= "2024-01-02T00:00:00")
    assert sorted(r.event_id for r in le.collect()) == [0, 1]
    gt = base.filter(F.col("ts") > "2024-01-01T00:00:00")
    assert sorted(r.event_id for r in gt.collect()) == [1, 2]


# ---------------------------------------------------------------------------
# S7: rate-limit retry policy (reference src/square.ts:69-73 — sleep
# and retry the same request on 429).  Injectable sleep/transport so
# the tests never wall-clock wait.
# ---------------------------------------------------------------------------


def test_rate_limit_retry_backoff_schedule():
    from square_etl_spark.sources.paginated import (
        RateLimitedError,
        RateLimitRetry,
    )

    sleeps = []
    calls = {"n": 0}

    def fetch():
        calls["n"] += 1
        if calls["n"] <= 3:
            raise RateLimitedError()
        return "ok"

    r = RateLimitRetry(max_attempts=5, base_delay_s=10.0, sleep=sleeps.append)
    assert r.call(fetch) == "ok"
    # exponential from the reference's fixed 10 s: 10, 20, 40
    assert sleeps == [10.0, 20.0, 40.0] and calls["n"] == 4


def test_rate_limit_retry_honors_retry_after_and_cap():
    from square_etl_spark.sources.paginated import (
        RateLimitedError,
        RateLimitRetry,
    )

    sleeps = []
    seq = [RateLimitedError(retry_after=2.5), RateLimitedError(), None]

    def fetch():
        e = seq.pop(0)
        if e is not None:
            raise e
        return 42

    r = RateLimitRetry(max_attempts=9, base_delay_s=50.0, max_delay_s=60.0,
                       sleep=sleeps.append)
    assert r.call(fetch) == 42
    # server hint wins over the schedule; the capped schedule resumes
    # at the attempt index (attempt 2 -> min(50*2, 60) = 60)
    assert sleeps == [2.5, 60.0]


def test_rate_limit_retry_clamps_hostile_retry_after():
    """A buggy/hostile Retry-After (e.g. 1e9 s) is clamped to
    max_delay_s — one response can't park a partition task forever,
    bypassing the bound the exponential path respects."""
    from square_etl_spark.sources.paginated import (
        RateLimitedError,
        RateLimitRetry,
    )

    sleeps = []
    seq = [RateLimitedError(retry_after=1e9), None]

    def fetch():
        e = seq.pop(0)
        if e is not None:
            raise e
        return "ok"

    r = RateLimitRetry(max_attempts=3, base_delay_s=1.0, max_delay_s=30.0,
                       sleep=sleeps.append)
    assert r.call(fetch) == "ok"
    assert sleeps == [30.0]


def test_rate_limit_retry_survives_negative_and_nan_hints():
    """A negative Retry-After must clamp to 0 (time.sleep(-1) raises
    ValueError and would kill the partition as a non-throttle error);
    NaN falls back to the base delay."""
    from square_etl_spark.sources.paginated import (
        RateLimitedError,
        RateLimitRetry,
    )

    sleeps = []
    seq = [RateLimitedError(retry_after=-1.0),
           RateLimitedError(retry_after=float("nan")), None]

    def fetch():
        e = seq.pop(0)
        if e is not None:
            raise e
        return "ok"

    r = RateLimitRetry(max_attempts=5, base_delay_s=2.0, max_delay_s=30.0,
                       sleep=sleeps.append)
    assert r.call(fetch) == "ok"
    assert sleeps == [0.0, 2.0]


def test_rate_limit_retry_exhaustion_is_loud_and_real_errors_propagate():
    import pytest

    from square_etl_spark.sources.paginated import (
        RateLimitedError,
        RateLimitRetry,
    )

    sleeps = []

    def always_limited():
        raise RateLimitedError()

    r = RateLimitRetry(max_attempts=3, sleep=sleeps.append)
    with pytest.raises(RateLimitedError):
        r.call(always_limited)
    assert len(sleeps) == 2  # attempts 1..2 slept; attempt 3 raised

    def broken():
        raise OSError("connection reset")

    with pytest.raises(OSError):  # not retried: backoff is for 429 only
        RateLimitRetry(sleep=sleeps.append).call(broken)


def test_fetch_all_pages_cursor_loop_retries_in_place():
    """A 429 mid-pagination retries THAT page; earlier pages are not
    re-fetched (the cursor position is preserved — the reason S7 lives
    in the fetch loop, not Spark task retry)."""
    from square_etl_spark.sources.paginated import (
        RateLimitedError,
        RateLimitRetry,
        fetch_all_pages,
    )

    pages = {None: ([1, 2], "c1"), "c1": ([3], "c2"), "c2": ([4, 5], None)}
    fetched = []
    limited = {"armed": True}

    def fetch_page(cursor):
        if cursor == "c1" and limited["armed"]:
            limited["armed"] = False
            raise RateLimitedError(retry_after=0.1)
        fetched.append(cursor)
        return pages[cursor]

    sleeps = []
    rows = list(fetch_all_pages(
        fetch_page, RateLimitRetry(sleep=sleeps.append)
    ))
    assert rows == [1, 2, 3, 4, 5]
    assert fetched == [None, "c1", "c2"]  # each page fetched once
    assert sleeps == [0.1]
