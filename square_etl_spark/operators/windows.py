"""Event-time windows (SURVEY.md §2.8).

The reference has no window *aggregates* — its only temporal construct
is the hourly lookback re-scan (T1/T2).  The engine adds the standard
tumbling/sliding aggregation surface over event time with built-in
``F.window`` (batch here; the same expressions run under Structured
Streaming with a watermark — see streaming/incremental.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def tumbling(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_cols: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Non-overlapping event-time buckets.  Epoch-aligned: the window
    start equals date_trunc for aligned durations, which is how the
    oracle SQL expresses the same bucketing."""
    return (
        df.groupBy(F.window(F.col(ts_col), duration).alias("win"), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.col("win.start"))
        .drop("win")
    )


def sliding(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_cols: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Overlapping windows: each event lands in duration/slide buckets.

    Spark expands the event into its covering windows before the
    groupBy — the same semantics the oracle expresses by unnesting the
    list of covering window starts per event.
    """
    return (
        df.groupBy(F.window(F.col(ts_col), duration, slide).alias("win"), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.col("win.start"))
        .drop("win")
    )


def sessionize(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    gap_s: float,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time
    since the key's previous event exceeds ``gap_s`` seconds.

    Classic two-window plan — lag to flag session starts, running sum
    of flags to number sessions — then one aggregate per (key,
    session).  All three steps share the same partitioning (the key),
    so Spark plans ONE shuffle; the window sort is reused.  Equal
    timestamps tie-break irrelevantly (gap 0 never opens a session).
    This is the batch twin of the streaming session window
    (``F.session_window`` / applyInPandasWithState in streaming/).
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).asc())
    sec = F.col(ts_col).cast("double")
    prev = F.lag(F.col(ts_col)).over(w)
    new_session = F.when(
        prev.isNull() | (sec - prev.cast("double") > gap_s), 1
    ).otherwise(0)
    numbered = df.withColumn(
        "session_id",
        F.sum(new_session)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    return numbered.groupBy(*key_cols, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


def sessionize_native(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    gap: str,
) -> DataFrame:
    """Gap-based sessionization via Spark's BUILT-IN session window
    (``F.session_window`` — the dynamic-gap analogue of ``F.window``).

    Same job — and the SAME semantics, including the boundary — as
    :func:`sessionize`, with a different physical plan:

    - **Plan**: no window functions at all — the session window is a
      GROUPING expression, so the whole operator is one shuffle on the
      session key followed by Spark's sort-based session merge
      (``MergingSessionsExec``), with partial session-merge on the map
      side (``spark.sql.streaming.sessionWindow.merge.sessions.in.
      local.partition`` not required — the final merge is exact either
      way).  The lag+prefix-sum twin also plans one Exchange but needs
      two full window passes over the sorted partition.
    - **Boundary**: sessions merge iff ``diff <= gap`` — an event
      EXACTLY ``gap`` after its predecessor stays in the session
      (measured, pinned in test_temporal_ops: a window ending at T
      absorbs an event starting at T), exactly :func:`sessionize`'s
      ``diff > gap`` new-session rule.  The two operators are
      interchangeable on ANY data, ties included.
    - **Streaming**: the SAME expression runs under Structured
      Streaming with a watermark — sessions finalize (append mode)
      once the watermark passes ``last_ts + gap``.  That built-in path
      is pinned against this batch result in test_stateful_streaming;
      the applyInPandasWithState twin (streaming/stateful.py) remains
      the escape hatch for custom per-session payloads.

    Scale shape: one Exchange on ``key_cols``; state in streaming mode
    is one (start, end) pair per OPEN session per key — bounded by the
    watermark, the same skew story as any keyed aggregation.

    Returns ``key_cols + (session_start, session_end, n_events)``
    where start/end are the min/max EVENT times (not the padded
    window end), matching :func:`sessionize`'s output contract.
    """
    return (
        df.groupBy(
            F.session_window(F.col(ts_col), gap).alias("__sw"), *key_cols
        )
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("__sw")
    )


def time_weighted_avg(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Time-weighted average per key — the TWAP/last-observation-
    carried-forward mean a point-in-time metric needs when samples are
    irregular (a plain AVG over-weights bursts of readings).

    Each observation holds its value until the key's NEXT observation
    (LEAD over the key-partitioned time order), weighting it by that
    interval's integer seconds; the key's last observation has no
    following interval and drops out (standard half-open convention —
    its value has no known duration).  Keys with a single observation
    therefore yield no row.

    Determinism: weights are exact BIGINT epoch-second differences,
    values round to 2 decimals, and the weighted sum accumulates as
    DECIMAL(38,6) so addition order cannot change the result — the
    same decimal-sum discipline as the flagship revenue query.  One
    Exchange on the key: the LEAD window and the grouped sum share the
    same partitioning.

    ``tiebreak_cols`` extends the time order to a TOTAL order —
    without it, same-timestamp rows make the LEAD pairing (and so the
    intervals) engine- and partitioning-dependent.

    Returns ``key_cols + (twap, total_seconds, n_intervals)``.
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col, *(tiebreak_cols or []))
    sec = F.unix_timestamp(F.col(ts_col))
    dt = (F.lead(sec).over(w) - sec).alias("__dt")
    v2 = F.round(F.col(value_col), 2)
    weighted = df.select(
        *key_cols, dt, v2.alias("__v")
    ).filter(F.col("__dt").isNotNull())
    wsum = F.sum(
        (F.col("__v") * F.col("__dt")).cast("decimal(38,6)")
    ).cast("double")
    tsec = F.sum("__dt").cast("long")
    return (
        weighted.groupBy(*key_cols)
        .agg(
            F.round(
                wsum / F.when(tsec > 0, tsec), 6
            ).alias("twap"),
            tsec.alias("total_seconds"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
    )
