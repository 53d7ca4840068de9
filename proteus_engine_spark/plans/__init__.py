from proteus_engine_spark.plans.sql_rewrite import proteus_sql, rewrite_group_windows

__all__ = ["proteus_sql", "rewrite_group_windows"]
