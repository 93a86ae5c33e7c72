"""Exact TF-IDF — oracle parity and keyword-extraction contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from minisql_engine_spark.operators.tfidf import tfidf_terms, tfidf_terms_sql
from minisql_engine_spark.sources import load_table
from tests.conftest import assert_matches_oracle


def test_tfidf_matches_oracle(spark, duck, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n = docs.select("doc_id").distinct().count()
    out = tfidf_terms(docs)
    oracle = tfidf_terms_sql(n)
    assert_matches_oracle(out, duck.execute(oracle).fetchdf(), "tfidf")


def test_tfidf_topk_matches_oracle(spark, duck, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n = docs.select("doc_id").distinct().count()
    out = tfidf_terms(docs, top_k=3)
    oracle = tfidf_terms_sql(n, top_k=3)
    assert_matches_oracle(out, duck.execute(oracle).fetchdf(), "tfidf_top3")
    per_doc = out.groupBy("doc_id").agg(F.count("*").alias("k"))
    assert per_doc.agg(F.max("k")).first()[0] <= 3


def test_tfidf_monotonicity(spark):
    """A term appearing in every document gets the minimum idf; a
    unique term in one document outweighs it at equal tf."""
    rows = [
        (1, "alpha common common"),
        (2, "beta common"),
        (3, "gamma common"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    scores = {
        (r["doc_id"], r["token"]): r["tfidf"]
        for r in tfidf_terms(df).collect()
    }
    # unique 'alpha' (tf=1) must outweigh ubiquitous 'common' (tf=1 in doc 2)
    assert scores[(1, "alpha")] > scores[(2, "common")]
    # within doc 1, tf=2 'common' could beat 'alpha' only if idf gap
    # is small; just assert both present and positive
    assert all(v > 0 for v in scores.values())
