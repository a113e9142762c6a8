from .sources import TABLES, load_table, load_tables, register_views
from .sinks import append_parquet, overwrite_parquet, idempotent_append, jdbc_append

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "append_parquet",
    "overwrite_parquet",
    "idempotent_append",
    "jdbc_append",
]
