from pydala_spark.utils.errors import ConfigError
from pydala_spark.utils.logging import logged, get_logger

__all__ = ["ConfigError", "logged", "get_logger"]
