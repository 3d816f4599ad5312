from lime_etl_spark.sources.layout import write_zordered, zvalue
from lime_etl_spark.sources.readers import TABLES, load_table, load_tables, register_views

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "write_zordered",
    "zvalue",
]
