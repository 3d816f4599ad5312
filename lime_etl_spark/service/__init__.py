from lime_etl_spark.service.admin_jobs import DeleteOldLogs
from lime_etl_spark.service.runner import run_batch, run_batches_in_parallel

__all__ = ["DeleteOldLogs", "run_batch", "run_batches_in_parallel"]
