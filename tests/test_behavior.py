"""Event-behavior analytics (operators/behavior.py): funnel ordering
semantics, retention triangle arithmetic, streak islands, gap-fill —
plus the one-Exchange plan pins that make them 100 TB shapes."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from square_etl_spark.operators.behavior import (
    activity_streaks,
    funnel_stage_times,
    gapfill_daily,
    retention_cohorts,
)


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (u, dt.datetime(2024, 1, d, h), t, float(v))
            for (u, d, h, t, v) in rows
        ],
        "user_id long, ts timestamp, event_type string, value double",
    )


def test_funnel_requires_strict_stage_order(spark):
    # user 1: view→click→purchase in order = full funnel
    # user 2: purchase BEFORE click: stage 3 must not count
    # user 3: click but never viewed: only stage 1 absent → nothing counts
    df = _events(
        spark,
        [
            (1, 1, 1, "view", 0), (1, 1, 2, "click", 0), (1, 1, 3, "purchase", 0),
            (2, 1, 1, "view", 0), (2, 1, 3, "click", 0), (2, 1, 2, "purchase", 0),
            (3, 1, 5, "click", 0),
        ],
    )
    st = funnel_stage_times(df, "ts", "user_id", "event_type",
                            ["view", "click", "purchase"])
    got = {r["user_id"]: r for r in st.collect()}
    assert got[1]["stage_3_ts"] is not None
    assert got[2]["stage_2_ts"] is not None and got[2]["stage_3_ts"] is None
    assert got[3]["stage_1_ts"] is None and got[3]["stage_2_ts"] is None


def test_funnel_takes_earliest_qualifying_event(spark):
    # two clicks after the view: stage 2 time must be the EARLIER one
    df = _events(
        spark,
        [(1, 1, 1, "view", 0), (1, 1, 4, "click", 0), (1, 1, 2, "click", 0)],
    )
    st = funnel_stage_times(df, "ts", "user_id", "event_type",
                            ["view", "click"])
    row = st.collect()[0]
    assert row["stage_2_ts"] == dt.datetime(2024, 1, 1, 2)


def test_funnel_plan_is_single_hash_exchange(spark, sf_dir):
    from square_etl_spark.io import load_table

    e = load_table(spark, sf_dir, "events")
    st = funnel_stage_times(e, "ts", "user_id", "event_type",
                            ["view", "click", "purchase"])
    plan = st._jdf.queryExecution().executedPlan().toString()
    # three sequential stage windows + the per-key collapse must share
    # ONE hash partitioning on user_id — the funnel's scale contract
    assert plan.count("Exchange hashpartitioning") == 1


def test_retention_offset_zero_is_cohort_size(spark):
    # users 1,2 first touch in week of Jan 1; user 2 returns the next week
    df = _events(
        spark,
        [(1, 2, 1, "view", 0), (2, 3, 1, "view", 0), (2, 9, 1, "view", 0)],
    )
    out = retention_cohorts(df, "ts", "user_id").collect()
    by_offset = {r["week_offset"]: r for r in out}
    assert by_offset[0]["active_users"] == 2
    assert by_offset[0]["cohort_size"] == 2
    assert by_offset[1]["active_users"] == 1
    assert abs(by_offset[1]["retention"] - 0.5) < 1e-9


def test_streaks_islands_split_on_gaps(spark):
    # user 1 active Jan 1,2,3, then 5,6 → longest streak 3 from Jan 1
    # (two events on Jan 2 must not double-count the day)
    df = _events(
        spark,
        [(1, 1, 1, "view", 0), (1, 2, 1, "view", 0), (1, 2, 9, "click", 0),
         (1, 3, 1, "view", 0), (1, 5, 1, "view", 0), (1, 6, 1, "view", 0)],
    )
    row = activity_streaks(df, "ts", "user_id").collect()[0]
    assert row["streak_days"] == 3
    assert row["streak_start"] == "2024-01-01"


def test_streaks_tie_breaks_to_earliest(spark):
    # two 2-day streaks: Jan 1-2 and Jan 5-6 → earliest wins
    df = _events(
        spark,
        [(1, 1, 1, "view", 0), (1, 2, 1, "view", 0),
         (1, 5, 1, "view", 0), (1, 6, 1, "view", 0)],
    )
    row = activity_streaks(df, "ts", "user_id").collect()[0]
    assert row["streak_days"] == 2 and row["streak_start"] == "2024-01-01"


def test_gapfill_forward_fills_but_not_before_first(spark):
    from square_etl_spark.operators.aggregations import decimal_sum

    # user 1 observed Jan 2 (10.0) and Jan 4 (4.0); global calendar
    # Jan 1..4 (user 2 anchors Jan 1): Jan 1 NULL, Jan 3 carries 10.0
    df = _events(
        spark,
        [(1, 2, 1, "view", 10.0), (1, 4, 1, "view", 4.0),
         (2, 1, 1, "view", 7.0)],
    )
    out = gapfill_daily(df, "ts", "user_id", decimal_sum(F.col("value")))
    u1 = {r["day"]: r["v_filled"] for r in out.collect() if r["user_id"] == 1}
    assert u1["2024-01-01"] is None
    assert u1["2024-01-02"] == 10.0
    assert u1["2024-01-03"] == 10.0
    assert u1["2024-01-04"] == 4.0


def test_gapfill_sums_multiple_events_per_day(spark):
    from square_etl_spark.operators.aggregations import decimal_sum

    df = _events(spark, [(1, 1, 1, "view", 1.5), (1, 1, 2, "view", 2.25)])
    out = gapfill_daily(df, "ts", "user_id", decimal_sum(F.col("value")))
    assert out.collect()[0]["v_filled"] == 3.75


def test_gapfill_zero_fill_stays_null_before_first_touch(spark):
    from square_etl_spark.operators.aggregations import decimal_sum

    # same shape as the ffill test: user 1 first observed Jan 2, user 2
    # anchors the calendar at Jan 1 — zero-fill fills user 1's Jan 3
    # gap with 0.0 but must NOT fabricate a 0 for pre-first-touch Jan 1
    df = _events(
        spark,
        [(1, 2, 1, "view", 10.0), (1, 4, 1, "view", 4.0),
         (2, 1, 1, "view", 7.0)],
    )
    out = gapfill_daily(
        df, "ts", "user_id", decimal_sum(F.col("value")), fill="zero"
    )
    u1 = {r["day"]: r["v_filled"] for r in out.collect() if r["user_id"] == 1}
    assert u1["2024-01-01"] is None
    assert u1["2024-01-02"] == 10.0
    assert u1["2024-01-03"] == 0.0
    assert u1["2024-01-04"] == 4.0
    u2 = {r["day"]: r["v_filled"] for r in out.collect() if r["user_id"] == 2}
    assert u2["2024-01-01"] == 7.0
    assert u2["2024-01-02"] == 0.0  # after first touch → zero, not NULL
