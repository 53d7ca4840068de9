from proteus_engine_spark.functions.catalog import FUNCTION_CATALOG, fn

__all__ = ["FUNCTION_CATALOG", "fn"]
