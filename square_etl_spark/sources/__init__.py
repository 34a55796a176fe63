"""Custom sources: Spark-native re-expressions of the reference's
REST-scan ingestion (SURVEY.md §2.1)."""

from square_etl_spark.sources.paginated import PaginatedJsonDataSource

__all__ = ["PaginatedJsonDataSource"]
