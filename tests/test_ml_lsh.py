"""spark.ml LSH library-path tests: agreement with the md5-portable
implementations and sane ANN behavior."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pytest.importorskip("pyspark.ml")

from minisql_engine_spark.operators.ml_lsh import (  # noqa: E402
    ml_brp_nearest_neighbors,
    ml_minhash_near_dups,
)
from minisql_engine_spark.sources import load_table  # noqa: E402


def test_ml_minhash_agrees_with_portable(spark, sf_dir):
    """Every high-similarity pair the portable MinHash pipeline
    verifies (exact Jaccard ≥ 0.9) must also be found by spark.ml's
    approxSimilarityJoin at the same threshold, with matching
    distances (1 − jaccard)."""
    from minisql_engine_spark.operators.dedup import minhash_lsh_dedup

    docs = load_table(spark, sf_dir, "documents")
    portable = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_dedup(docs, threshold=0.5).collect()
    }
    ml = {
        (r["id_a"], r["id_b"]): r["jaccard_distance"]
        for r in ml_minhash_near_dups(
            docs, jaccard_distance_threshold=0.5
        ).collect()
    }
    strong = {p for p, j in portable.items() if j >= 0.9}
    found = strong & set(ml)
    assert strong == set() or len(found) / len(strong) >= 0.9
    for p in found:
        assert abs((1.0 - portable[p]) - ml[p]) < 1e-6


def test_ml_brp_ann_returns_k(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = ml_brp_nearest_neighbors(emb, query_id=0, k=5).collect()
    assert len(out) == 5
    assert all(r["neighbor_id"] != 0 for r in out)
    dists = [r["euclidean_distance"] for r in out]
    assert dists == sorted(dists)
