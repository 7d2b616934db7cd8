from systematic_review_classification_spark.sources.tables import TABLES, load

__all__ = ["TABLES", "load"]
