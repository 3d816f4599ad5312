from lime_etl_spark.functions.numeric import dec, money_sum, to_double

__all__ = ["dec", "money_sum", "to_double"]
