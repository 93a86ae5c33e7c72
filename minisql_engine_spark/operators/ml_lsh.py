"""spark.ml LSH variants — the library path beside the md5-portable ones.

``operators.dedup`` implements MinHash/SimHash with md5-derived hash
families so the DuckDB oracle can verify them bit-for-bit. This module
is the complementary **library path** (SURVEY §2.4 table): MinHashLSH
over HashingTF shingle vectors via ``approxSimilarityJoin``, and
BucketedRandomProjectionLSH over embeddings via
``approxNearestNeighbors`` — the battle-tested spark.ml kernels you
would reach for when oracle portability is not a requirement.

Results are engine-specific (seeded Spark hashing) → rows-only checks
+ agreement tests against the portable implementations
(tests/test_ml_lsh.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ml_minhash_near_dups(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_distance_threshold: float = 0.5,
    num_hash_tables: int = 8,
    num_features: int = 1 << 18,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs via spark.ml MinHashLSH approxSimilarityJoin.

    Word-3-shingles → HashingTF sparse vectors → MinHash tables →
    distance join. Returns (id_a, id_b, jaccard_distance) pairs with
    distance ≤ threshold (note: DISTANCE = 1 − Jaccard).
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    from minisql_engine_spark.operators.dedup import (
        _norm,
        word_shingles,
    )

    toked = docs.select(
        F.col(id_col), F.split(_norm(F.col(text_col)), " ").alias("_toks")
    )
    shingled = toked.select(
        F.col(id_col), word_shingles(F.col("_toks")).alias("shingles")
    ).filter(F.size("shingles") > 0)

    tf = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=num_features
    )
    feats = tf.transform(shingled)
    lsh = MinHashLSH(
        inputCol="features",
        outputCol="hashes",
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(feats)
    joined = model.approxSimilarityJoin(
        feats, feats, threshold=jaccard_distance_threshold, distCol="jaccard_distance"
    )
    return (
        joined.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.round("jaccard_distance", 6).alias("jaccard_distance"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )


def ml_brp_nearest_neighbors(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Top-k neighbors of one vector via BucketedRandomProjectionLSH
    approxNearestNeighbors (Euclidean). Library ANN path; the exact
    cosine path lives in ``similarity.brute_force_topk``."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    vecs = embeddings.select(
        F.col(id_col), array_to_vector(F.col(vec_col)).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(vecs)
    key = vecs.filter(F.col(id_col) == query_id).head()
    if key is None:
        raise ValueError(f"query vector {query_id} not found")
    out = model.approxNearestNeighbors(vecs, key["features"], k + 1)
    return (
        out.filter(F.col(id_col) != query_id)
        .select(
            F.lit(query_id).alias("query_id"),
            F.col(id_col).alias("neighbor_id"),
            F.round("distCol", 6).alias("euclidean_distance"),
        )
        .limit(k)
    )
