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
