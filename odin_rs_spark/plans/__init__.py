from odin_rs_spark.plans.catalog import CATALOG, oracle_sql, queries

__all__ = ["CATALOG", "oracle_sql", "queries"]
