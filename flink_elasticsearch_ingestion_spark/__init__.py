"""PySpark-native analytics engine with the query & data-processing
capabilities of zirota/flink-elasticsearch-ingestion (reference:
/root/reference, Clojure-on-Flink ES->ES copy pipeline), rebuilt
Spark-first: DataFrame/SQL declarative plans, Catalyst/AQE physical
planning, Structured Streaming for the streaming shell.

Layout
------
- ``session``    SparkSession factory tuned for local[N] and cluster scale
- ``config``     validated typed config (fixes reference core.clj:90-100 bugs)
- ``sources``    table loaders + pluggable sinks (parquet default, ES adapter)
- ``operators``  copy pipeline, relational surface, dedup, similarity, text
- ``functions``  scalar helpers (URL parsing, JSON shaping)
- ``streaming``  readStream/foreachBatch shell over identical batch logic
"""

from flink_elasticsearch_ingestion_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
