"""Sinks: idempotent keyed merge (upsert) — SURVEY.md §2.2."""

from square_etl_spark.sinks.merge import merge_dataframes, merge_upsert

__all__ = ["merge_dataframes", "merge_upsert"]
