from pydala_spark.utils.logging import logged, get_logger

__all__ = ["logged", "get_logger"]
