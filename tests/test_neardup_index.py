"""Incremental MinHash near-dup index: admission semantics,
idempotence, self-consistency of the rejection rule."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from minisql_engine_spark.operators.dedup import NUM_HASHES, minhash_signatures
from minisql_engine_spark.operators.neardup_index import (
    append_to_neardup_index,
    init_neardup_index,
    neardup_against_index,
    neardup_index_stats,
)
from minisql_engine_spark.sources import load_table

T = 0.7


@pytest.fixture()
def corpus_and_batch(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") < 300)
    fresh = docs.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 400))
    # near-dups of corpus docs: identical text under new ids (estimated
    # Jaccard 1.0 — always past any threshold) plus a lightly mutated
    # copy (one word appended: high but not complete overlap)
    exact_copies = corpus.limit(5).select(
        (F.col("doc_id") + 9000).alias("doc_id"), "text"
    )
    mutated = corpus.limit(3).select(
        (F.col("doc_id") + 9500).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzappendix")).alias("text"),
    )
    batch = fresh.unionByName(exact_copies).unionByName(mutated)
    return corpus, fresh, batch


def test_admission_rejects_near_dups(spark, corpus_and_batch, tmp_path):
    corpus, fresh, batch = corpus_and_batch
    path = str(tmp_path / "nidx")
    init_neardup_index(corpus, path)

    admitted = neardup_against_index(batch, path, threshold=T)
    ids = {r["doc_id"] for r in admitted.select("doc_id").collect()}
    # every identical copy is rejected (est Jaccard = 1)
    assert not any(i >= 9000 and i < 9500 for i in ids)
    # the rejection rule is self-consistent: every rejected doc really
    # has an indexed neighbor with >= T estimated Jaccard, and every
    # admitted one doesn't
    batch_sigs = {
        r["doc_id"]: [r[f"sig_{i}"] for i in range(NUM_HASHES)]
        for r in minhash_signatures(batch).collect()
    }
    index_sigs = [
        [r[f"sig_{i}"] for i in range(NUM_HASHES)]
        for r in spark.read.parquet(path).collect()
    ]

    def best_est(sig):
        return max(
            sum(a == b for a, b in zip(sig, isig)) / NUM_HASHES
            for isig in index_sigs
        )

    for did, sig in batch_sigs.items():
        if did in ids:
            assert best_est(sig) < T, f"admitted {did} has a close neighbor"
        else:
            assert best_est(sig) >= T, f"rejected {did} without a neighbor"


def test_append_then_idempotent(spark, corpus_and_batch, tmp_path):
    corpus, fresh, batch = corpus_and_batch
    path = str(tmp_path / "nidx")
    init_neardup_index(corpus, path)
    admitted = neardup_against_index(batch, path, threshold=T)
    n_admitted = admitted.count()
    append_to_neardup_index(admitted, path)
    # the same batch re-presented: everything collides with itself
    again = neardup_against_index(batch, path, threshold=T)
    assert again.count() == 0
    stats = neardup_index_stats(spark, path).collect()[0]
    assert stats["n_docs"] == corpus.count() + n_admitted


def test_shingleless_docs_pass_through_unindexed(spark, tmp_path):
    path = str(tmp_path / "nidx")
    init_neardup_index(
        spark.createDataFrame(
            [(1, "a longer seed document body with enough words to shingle")],
            "doc_id bigint, text string",
        ),
        path,
    )
    batch = spark.createDataFrame(
        [(2, ""), (3, "two words"), (4, None)],
        "doc_id bigint, text string",
    )
    admitted = neardup_against_index(batch, path, threshold=T)
    assert {r["doc_id"] for r in admitted.collect()} == {2, 3, 4}
    append_to_neardup_index(admitted, path)
    # none of them entered the index ("two words" < 3-token shingle floor)
    assert neardup_index_stats(spark, path).collect()[0]["n_docs"] == 1


def test_threshold_validation(spark, corpus_and_batch, tmp_path):
    corpus, _, batch = corpus_and_batch
    path = str(tmp_path / "nidx")
    init_neardup_index(corpus, path)
    with pytest.raises(ValueError):
        neardup_against_index(batch, path, threshold=0.0)
