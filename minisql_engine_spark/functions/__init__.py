from minisql_engine_spark.functions.vectorized import (
    quality_score_pandas_udf,
    customer_order_features,
)

__all__ = ["quality_score_pandas_udf", "customer_order_features"]
