"""lime_etl_spark — a PySpark-native analytics + ETL-orchestration engine.

Re-expresses the capabilities of MarkStefanovic/lime-etl (reference at
/root/reference) Spark-first:

- ``domain`` / ``service`` / ``adapter``: the batch/job orchestration
  runtime (specs, dependency validation, retries, refresh skipping,
  post-run data tests, parquet-backed admin bookkeeping).
- ``operators``: the data operations ETL jobs perform, as pure
  DataFrame -> DataFrame functions (relational analytics, snapshot
  diff / upsert / SCD2, dedup family, similarity search, text
  analysis, event sessionization).
- ``sources`` / ``streaming``: batch readers/writers and structured
  streaming wrappers.
- ``plans``: the query registry that backs ``__spark_entry__.py``.
"""

from lime_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
