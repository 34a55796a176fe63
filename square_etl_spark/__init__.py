"""square_etl_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference ETL
system ``Andreas540/square-etl`` (see SURVEY.md) as an idiomatic Spark
engine: explicit-schema parquet sources, declarative DataFrame/SQL
operators (Catalyst does pushdown/pruning/join-selection), a
merge/upsert sink library, incremental lookback-window runners, and
LLM-data-pipeline extensions (dedup, embedding similarity, text
analysis, multimodal column plumbing) designed for 100 TB scale.

Nothing in here is a translation of the reference's TypeScript; the
reference defines WHAT to compute (SURVEY.md §2 operator inventory),
and this package expresses it Spark-first.
"""

from square_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
