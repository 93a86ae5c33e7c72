from minisql_engine_spark.operators import relational  # noqa: F401
