from minisql_engine_spark.plans.dialect import rewrite_query, run_sql

__all__ = ["rewrite_query", "run_sql"]
