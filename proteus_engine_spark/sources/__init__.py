from proteus_engine_spark.sources.tables import TABLE_NAMES, load_table, load_tables, register_views

__all__ = ["TABLE_NAMES", "load_table", "load_tables", "register_views"]
