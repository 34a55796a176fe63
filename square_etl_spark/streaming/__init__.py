"""Incremental / streaming runners — SURVEY.md §2.8."""

from square_etl_spark.streaming.incremental import (
    incremental_merge_run,
    stream_events_availablenow,
    windowed_stream_agg,
)

__all__ = [
    "incremental_merge_run",
    "stream_events_availablenow",
    "windowed_stream_agg",
]
