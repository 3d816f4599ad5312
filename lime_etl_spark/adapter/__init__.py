from lime_etl_spark.adapter.admin_store import BatchLogger, JobLogger, SparkAdminStore

__all__ = ["BatchLogger", "JobLogger", "SparkAdminStore"]
