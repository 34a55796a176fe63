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
