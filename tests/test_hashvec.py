"""Feature-hashed TF-IDF vectors — oracle parity, densify
consistency, and composition with the cosine family."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from minisql_engine_spark.operators.hashvec import (
    DIM,
    assemble_vectors,
    hashed_tfidf,
    hashed_tfidf_sql,
)
from minisql_engine_spark.sources import load_table
from tests.conftest import assert_matches_oracle


def test_hashed_tfidf_oracle(spark, duck, sf_dir):
    out = hashed_tfidf(load_table(spark, sf_dir, "documents"))
    oracle = hashed_tfidf_sql()
    assert_matches_oracle(out, duck.execute(oracle).fetchdf(), "hashvec")


def test_assemble_vectors_consistent(spark, sf_dir):
    """Densified vectors carry exactly the sparse weights, zeros
    elsewhere, for every document."""
    docs = load_table(spark, sf_dir, "documents").limit(50)
    sparse = hashed_tfidf(docs)
    dense = assemble_vectors(sparse)
    sp = {
        (r["doc_id"], r["bucket"]): r["weight"] for r in sparse.collect()
    }
    for r in dense.collect():
        assert len(r["vec"]) == DIM
        for b, v in enumerate(r["vec"]):
            assert v == sp.get((r["doc_id"], b), 0.0)


def test_hashvec_feeds_cosine_topk(spark, sf_dir):
    """The bridge claim: hashed vectors slot straight into the
    embedding cosine operator — a planted verbatim copy of doc 0 is
    its top-1 neighbor at similarity ~1."""
    from minisql_engine_spark.operators.similarity import (
        brute_force_topk,
    )

    docs = load_table(spark, sf_dir, "documents").limit(100)
    clone = docs.orderBy("doc_id").limit(1).select(
        F.lit(999_001).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    qid = docs.agg(F.min("doc_id")).collect()[0][0]
    vecs = assemble_vectors(hashed_tfidf(docs.unionByName(clone)))
    corpus = vecs.select(
        F.col("doc_id").alias("vec_id"), F.col("vec").alias("embedding")
    )
    top = brute_force_topk(corpus, [qid], k=1)
    rows = top.collect()
    assert len(rows) == 1
    assert rows[0]["neighbor_id"] == 999_001
    assert math.isclose(rows[0]["score"], 1.0, abs_tol=1e-9)


def test_hashed_tfidf_empty_and_dim(spark):
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, ""), (3, None), (4, "   ")],
        ["doc_id", "text"],
    )
    out = hashed_tfidf(docs, dim=8)
    rows = out.collect()
    # only doc 1 has tokens; buckets within [0, 8)
    assert {r["doc_id"] for r in rows} == {1}
    assert all(0 <= r["bucket"] < 8 for r in rows)
