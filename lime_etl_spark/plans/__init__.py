from lime_etl_spark.plans.registry import QuerySpec, all_queries, get, register

__all__ = ["QuerySpec", "all_queries", "get", "register"]
