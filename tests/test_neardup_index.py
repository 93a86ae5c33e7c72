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


def test_neardup_bloom_sidecar_param_mismatch_raises(
    spark, corpus_and_batch, tmp_path
):
    """A sidecar built under different num_hashes/band_size computes
    different band keys — every probe would miss and near-dups would
    be silently admitted. Both the probe and the append must refuse
    a mismatched sidecar loudly."""
    from minisql_engine_spark.operators.neardup_index import (
        append_to_neardup_index_with_bloom,
        init_neardup_bloom_sidecar,
    )

    corpus, _, batch = corpus_and_batch
    path = str(tmp_path / "nidx")
    bloom_path = str(tmp_path / "nidx.bloom")
    init_neardup_index(corpus, path)
    init_neardup_bloom_sidecar(spark, path, bloom_path, n_bits=1 << 14)

    with pytest.raises(ValueError, match="mismatch"):
        neardup_against_index(
            batch,
            path,
            threshold=T,
            bloom_path=bloom_path,
            band_size=4,  # sidecar was built at the default (2)
        )
    with pytest.raises(ValueError, match="mismatch"):
        neardup_against_index(
            batch,
            path,
            threshold=T,
            bloom_path=bloom_path,
            num_hashes=NUM_HASHES - 2,
        )
    admitted = neardup_against_index(
        batch, path, threshold=T, bloom_path=bloom_path
    )
    with pytest.raises(ValueError, match="mismatch"):
        append_to_neardup_index_with_bloom(
            admitted, path, bloom_path, num_hashes=NUM_HASHES - 2
        )


def test_neardup_bloom_sidecar_identical_admission(
    spark, corpus_and_batch, tmp_path
):
    """The band-key Bloom fast path admits EXACTLY what the exact
    path admits (no false negatives ⇒ outcomes identical), and the
    sidecar advances with the index in the same admission step — the
    3-batch identity pin mirroring test_dedup_index's."""
    from minisql_engine_spark.operators.neardup_index import (
        append_to_neardup_index_with_bloom,
        init_neardup_bloom_sidecar,
    )

    corpus, fresh, batch = corpus_and_batch
    exact_path = str(tmp_path / "n_exact")
    fast_path = str(tmp_path / "n_fast")
    bloom_path = str(tmp_path / "n_fast.bloom")
    init_neardup_index(corpus, exact_path)
    init_neardup_index(corpus, fast_path)
    init_neardup_bloom_sidecar(spark, fast_path, bloom_path, n_bits=1 << 14)

    batch2 = batch.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    for bt in (batch, batch2):
        exact = neardup_against_index(bt, exact_path, threshold=T)
        fast = neardup_against_index(
            bt, fast_path, threshold=T, bloom_path=bloom_path
        )
        got_e = {r["doc_id"] for r in exact.select("doc_id").collect()}
        got_f = {r["doc_id"] for r in fast.select("doc_id").collect()}
        assert got_e == got_f
        append_to_neardup_index(exact, exact_path)
        append_to_neardup_index_with_bloom(fast, fast_path, bloom_path)


def test_neardup_sidecar_learns_appended_band_keys(
    spark, corpus_and_batch, tmp_path
):
    """A replay of an admitted batch under new ids must admit NOTHING
    through the sidecar path — exactly what a sidecar lagging the
    index (wrong update order) gets wrong."""
    from minisql_engine_spark.operators.neardup_index import (
        append_to_neardup_index_with_bloom,
        init_neardup_bloom_sidecar,
    )

    corpus, fresh, _batch = corpus_and_batch
    path = str(tmp_path / "nidx")
    bloom_path = str(tmp_path / "nidx.bloom")
    init_neardup_index(corpus, path)
    init_neardup_bloom_sidecar(spark, path, bloom_path, n_bits=1 << 14)
    admitted = neardup_against_index(
        fresh, path, threshold=T, bloom_path=bloom_path
    )
    # the sidecar path equals the exact path (a handful of fresh docs
    # genuinely near-collide with the corpus — that is the operator
    # working, not the sidecar dropping rows)
    exact = neardup_against_index(fresh, path, threshold=T)
    assert {r["doc_id"] for r in admitted.select("doc_id").collect()} == {
        r["doc_id"] for r in exact.select("doc_id").collect()
    }
    append_to_neardup_index_with_bloom(admitted, path, bloom_path)
    replay = fresh.select((F.col("doc_id") + 70000).alias("doc_id"), "text")
    again = neardup_against_index(
        replay, path, threshold=T, bloom_path=bloom_path
    )
    assert again.count() == 0


def test_neardup_sidecar_fresh_batch_skips_index(
    spark, corpus_and_batch, tmp_path
):
    """A batch with no indexed near-dup routes only FPR-bounded band
    keys into the index read."""
    from minisql_engine_spark.operators.dedup import lsh_band_keys, minhash_signatures
    from minisql_engine_spark.operators.dedup_index import (
        _bloom_meta,
        _bloom_words,
    )
    from minisql_engine_spark.operators.membership import bloom_probe
    from minisql_engine_spark.operators.neardup_index import (
        _band_bloom_key,
        init_neardup_bloom_sidecar,
    )

    corpus, fresh, _batch = corpus_and_batch
    path = str(tmp_path / "nidx2")
    bloom_path = str(tmp_path / "nidx2.bloom")
    init_neardup_index(corpus, path)
    init_neardup_bloom_sidecar(spark, path, bloom_path, n_bits=1 << 14)
    meta = _bloom_meta(bloom_path)
    keys = (
        lsh_band_keys(minhash_signatures(fresh))
        .select(_band_bloom_key().alias("key"))
        .distinct()
    )
    probed = bloom_probe(
        keys, _bloom_words(spark, bloom_path, meta), "key",
        meta["n_bits"], meta["k"],
    )
    n = probed.count()
    maybe = probed.filter(F.col("maybe_present")).count()
    # band keys (unlike dedup_index's content hashes) can GENUINELY
    # collide below the Jaccard threshold, so the bound is
    # true-positives + the sizing FPR, not FPR alone
    from minisql_engine_spark.operators.neardup_index import (
        _index_band_keys,
    )

    true_present = keys.join(
        _index_band_keys(
            spark.read.parquet(path), meta["num_hashes"],
            meta["band_size"],
        ),
        "key",
        "left_semi",
    ).count()
    assert true_present <= maybe <= true_present + max(3, int(0.05 * n))


def test_compaction_preserves_decisions(spark, corpus_and_batch, tmp_path):
    """compact_neardup_index collapses replay-raced duplicate rows
    and slivers into one file, changing NO admission decision, and
    runs under the shared single-writer/abort rails."""
    import os

    from minisql_engine_spark.operators.neardup_index import (
        compact_neardup_index,
    )

    corpus, fresh, batch = corpus_and_batch
    path = str(tmp_path / "nidx")
    init_neardup_index(corpus, path)
    admitted = neardup_against_index(batch, path, threshold=T)
    append_to_neardup_index(admitted, path)
    # a replayed append (at-least-once delivery) races duplicate rows
    append_to_neardup_index(admitted, path)
    probe = fresh.limit(20)
    before = {
        r["doc_id"]
        for r in neardup_against_index(probe, path, threshold=T)
        .select("doc_id")
        .collect()
    }
    nb, na = compact_neardup_index(spark, path)
    assert na < nb
    after = {
        r["doc_id"]
        for r in neardup_against_index(probe, path, threshold=T)
        .select("doc_id")
        .collect()
    }
    assert before == after
    # the duplicate signature rows collapsed; distinct docs unchanged
    rows = spark.read.parquet(path)
    assert rows.count() == rows.distinct().count()
    # shared rails: a held lock fails fast
    lock = path + ".compact.lock"
    open(lock, "w").close()
    with pytest.raises(RuntimeError, match="single-writer"):
        compact_neardup_index(spark, path)
    os.unlink(lock)
