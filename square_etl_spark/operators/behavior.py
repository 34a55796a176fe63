"""Event-behavior analytics (§2.10 extension — product-analytics layer).

The reference's event handling stops at conform-and-merge; any team
running it feeds the merged events into a product-analytics layer for
funnel conversion, cohort retention, activity streaks, and dense
time-series views.  These are the standard formulations of those four
shapes, written so every one is a deterministic, oracle-checkable
DataFrame program:

- ordering randomness is impossible: stage times are MIN() over
  explicit predicates, streak ranks order by (date, key), and every
  rate rounds from exact integer counts;
- float aggregation goes through decimal-intermediate sums
  (`aggregations.decimal_sum` discipline);
- all four are one-shuffle shapes on the event-key partitioning —
  the sequential funnel windows, the cohort first-touch window, and
  the streak islands all share PARTITION BY key, so Catalyst plans a
  single Exchange and reuses it across window passes.  At 100 TB the
  cost is one hash shuffle of the event table, which is the floor for
  any per-entity behavioral statistic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def funnel_stage_times(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    type_col: str,
    stages: list[str],
) -> DataFrame:
    """Per-key ordered-funnel stage timestamps.

    Stage 1's time is the key's earliest ``stages[0]`` event; stage
    i+1's time is the earliest ``stages[i+1]`` event STRICTLY AFTER
    the key's stage-i time (the classic "ordered funnel": a purchase
    before the first click does not convert the click stage).
    Returns one row per key with ``stage_1_ts .. stage_n_ts``
    (NULL = never reached).

    Each stage is a MIN-over-predicate window on the same PARTITION BY
    key — n logically sequential passes, ONE physical Exchange (the
    window partitioning is identical, so Catalyst sorts once and
    reuses it; pinned in test_plans).
    """
    if not stages:
        raise ValueError("stages must be a non-empty ordered list")
    w = Window.partitionBy(key_col)
    out = df
    prev: Column | None = None
    for i, stage in enumerate(stages, start=1):
        cond = F.col(type_col) == stage
        if prev is not None:
            cond = cond & (F.col(ts_col) > prev)
        out = out.withColumn(
            f"stage_{i}_ts", F.min(F.when(cond, F.col(ts_col))).over(w)
        )
        prev = F.col(f"stage_{i}_ts")
    stage_cols = [f"stage_{i}_ts" for i in range(1, len(stages) + 1)]
    # collapse to one row per key with a groupBy ON THE WINDOW KEY —
    # the stage columns are per-key constants, so MIN is a no-op
    # semantically, and grouping on the partitioning key lets Catalyst
    # reuse the window Exchange instead of adding a distinct shuffle.
    return out.groupBy(key_col).agg(
        *[F.min(c).alias(c) for c in stage_cols]
    )


def retention_cohorts(
    df: DataFrame,
    ts_col: str,
    key_col: str,
) -> DataFrame:
    """Weekly cohort-retention matrix.

    A key's cohort is the ISO week of its FIRST event (first-touch
    window over PARTITION BY key); each (key, active-week) pair then
    lands in one (cohort_week, week_offset) cell, counted distinct.
    Returns ``cohort_week`` (timestamp), ``week_offset`` (0 = the
    cohort week itself), ``active_users``, ``cohort_size``, and
    ``retention`` (rounded ratio) — the full retention triangle.

    One Exchange for the first-touch window, one grouped shuffle of
    the (key, week) pairs — the pairs relation is |keys| x |weeks|
    AFTER dedup, so at scale the distinct pushes map-side.
    """
    w = Window.partitionBy(key_col)
    weekly = (
        df.withColumn("first_ts", F.min(ts_col).over(w))
        .select(
            F.col(key_col).alias("k"),
            F.date_trunc("week", F.col("first_ts")).alias("cohort_week"),
            F.date_trunc("week", F.col(ts_col)).alias("active_week"),
        )
        .distinct()
    )
    cells = weekly.groupBy(
        "cohort_week",
        (
            F.floor(
                F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
            )
            .cast("long")
            .alias("week_offset")
        ),
    ).agg(F.count(F.lit(1)).alias("active_users"))
    size = Window.partitionBy("cohort_week")
    return cells.select(
        "cohort_week",
        "week_offset",
        "active_users",
        F.max(F.when(F.col("week_offset") == 0, F.col("active_users")))
        .over(size)
        .alias("cohort_size"),
    ).withColumn(
        "retention",
        F.round(F.col("active_users") / F.col("cohort_size"), 6),
    )


def activity_streaks(
    df: DataFrame,
    ts_col: str,
    key_col: str,
) -> DataFrame:
    """Longest consecutive-day activity streak per key
    (gaps-and-islands).

    Distinct active days per key; ``day - row_number`` is constant
    within a run of consecutive days (the island anchor), so one
    grouped count per (key, anchor) yields every streak, and a
    deterministic argmax (length DESC, start ASC) keeps the longest.
    Returns ``key, streak_days, streak_start`` (start as yyyy-MM-dd
    string — identical lexical form on any engine).

    All three windows + the island groupBy share PARTITION BY key:
    one Exchange end-to-end.
    """
    days = df.select(
        F.col(key_col).alias("k"), F.to_date(ts_col).alias("day")
    ).distinct()
    rn = F.row_number().over(Window.partitionBy("k").orderBy("day"))
    islands = days.withColumn("anchor", F.date_sub(F.col("day"), rn))
    streaks = islands.groupBy("k", "anchor").agg(
        F.count(F.lit(1)).alias("streak_days"),
        F.min("day").alias("start_day"),
    )
    best = F.row_number().over(
        Window.partitionBy("k").orderBy(
            F.col("streak_days").desc(), F.col("start_day").asc()
        )
    )
    return (
        streaks.withColumn("rk", best)
        .filter(F.col("rk") == 1)
        .select(
            F.col("k").alias(key_col),
            "streak_days",
            F.date_format("start_day", "yyyy-MM-dd").alias("streak_start"),
        )
    )


def gapfill_daily(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: Column,
    fill: str = "ffill",
) -> DataFrame:
    """Dense daily time series per key with forward-fill.

    Aggregates ``value_col`` (already a deterministic aggregate
    expression, e.g. a decimal sum) per (key, day), expands every key
    onto the GLOBAL [min_day, max_day] calendar (sequence + explode —
    the grid is |keys| x |days| rows by construction, which is the
    output's own size, not a blow-up), left-joins the actuals, and
    forward-fills gaps with the last observed value (LAST ... IGNORE
    NULLS over ROWS UNBOUNDED PRECEDING).  Days before a key's first
    observation stay NULL — fabricating zeros there would be lying.

    The calendar bounds come from a 1-row aggregate broadcast; the
    fill window partitions by key — again one Exchange.
    """
    daily = df.groupBy(
        F.col(key_col).alias("k"), F.to_date(ts_col).alias("day")
    ).agg(value_col.alias("v"))
    bounds = daily.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    calendar = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("day")
    )
    keys = daily.select("k").distinct()
    # bcast-ok: calendar grid = one row per day of the data's date span
    grid = keys.crossJoin(F.broadcast(calendar))
    joined = grid.join(daily, ["k", "day"], "left")
    if fill == "ffill":
        wf = (
            Window.partitionBy("k")
            .orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        joined = joined.withColumn(
            "v_filled", F.last("v", ignorenulls=True).over(wf)
        )
    else:  # zero-fill — but only AFTER a key's first observation: the
        # pre-first-touch contract above applies to both fill modes,
        # and a whole-partition MIN shares the ffill branch's single
        # per-key Exchange (no extra shuffle).
        wk = Window.partitionBy("k")
        first_day = F.min(
            F.when(F.col("v").isNotNull(), F.col("day"))
        ).over(wk)
        joined = joined.withColumn(
            "v_filled",
            F.when(
                F.col("day") >= first_day, F.coalesce("v", F.lit(0.0))
            ),
        )
    return joined.select(
        F.col("k").alias(key_col),
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "v_filled",
    )
