from pydala_spark.dataset.reader import Dataset
from pydala_spark.dataset.writer import Writer
from pydala_spark.dataset.timefly import TimeFly
from pydala_spark.dataset.repartition import Repartition

__all__ = ["Dataset", "Writer", "TimeFly", "Repartition"]
