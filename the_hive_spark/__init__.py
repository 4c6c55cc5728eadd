"""the-hive-spark: a PySpark-native analytics engine with the query and
data-processing capabilities of niski84/the-hive, rebuilt Spark-first.

See SURVEY.md for the operator inventory this package implements.
"""

from the_hive_spark.session import get_spark

__all__ = ["get_spark"]
