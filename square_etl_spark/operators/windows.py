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
