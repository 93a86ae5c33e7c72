from minisql_engine_spark.functions.vectorized import (
    quality_score_pandas_udf,
    customer_order_features,
    weighted_avg_price_udaf,
)
from minisql_engine_spark.functions.udtf_chunker import (
    ChunkDocument,
    chunk_documents,
)

__all__ = [
    "quality_score_pandas_udf",
    "customer_order_features",
    "weighted_avg_price_udaf",
    "ChunkDocument",
    "chunk_documents",
]
