"""Streaming curation funnel: frozen-model scoring equivalence,
batch ≡ stream content equality, replay idempotence, audit sums."""

from __future__ import annotations

import os

import pytest

pytestmark = pytest.mark.driver_gate
from pyspark.sql import functions as F

from minisql_engine_spark.operators.dedup import _norm
from minisql_engine_spark.operators.dedup_index import init_dedup_index
from minisql_engine_spark.operators.lm_score import (
    lm_perplexity,
    lm_score_frozen,
    save_lm_model,
)
from minisql_engine_spark.sources import load_table
from minisql_engine_spark.streaming.curate import (
    curate_batch_frozen,
    stream_curate_funnel,
)


def _key_set(df):
    return {
        r["k"]
        for r in df.select(F.md5(_norm(F.col("text"))).alias("k"))
        .distinct()
        .collect()
    }


def test_frozen_model_reproduces_lm_perplexity(spark, sf_dir, tmp_path):
    """Scoring a corpus with a model frozen FROM that corpus must
    reproduce lm_perplexity row for row — same smoothing, same
    thresholds, same buckets (the frozen path is a generalization,
    not a fork)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    model = str(tmp_path / "lm")
    save_lm_model(docs, model)
    a = {
        r["doc_id"]: (r["n_tokens_lm"], r["xent_bits"], r["ppl"], r["bucket"])
        for r in lm_perplexity(docs).collect()
    }
    b = {
        r["doc_id"]: (r["n_tokens_lm"], r["xent_bits"], r["ppl"], r["bucket"])
        for r in lm_score_frozen(docs, model).collect()
    }
    assert a == b


def test_frozen_model_handles_unseen_tokens(spark, tmp_path):
    """Tokens absent from the reference take the Laplace floor: a
    gibberish doc scores FINITE, very high ppl (tail), instead of
    crashing or silently dropping rows."""
    ref = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
        + [(100 + i, "pack my box with five dozen liquor jugs") for i in range(20)],
        "doc_id bigint, text string",
    )
    model = str(tmp_path / "lm")
    save_lm_model(ref, model)
    unseen = spark.createDataFrame(
        [(1, "zzxqj wvvkp qqrrs")], "doc_id bigint, text string"
    )
    row = lm_score_frozen(unseen, model).collect()[0]
    assert row["bucket"] == "tail"
    assert row["ppl"] > 0


@pytest.fixture()
def staged_funnel(spark, sf_dir, tmp_path):
    """Seed corpus, frozen model (trained on the full documents
    reference), and a 3-file drop with in-stream + against-seed
    duplicates."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    model = str(tmp_path / "lm")
    save_lm_model(docs, model)
    seed = docs.filter(F.col("doc_id") < 100)
    f1 = docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 160))
    f2 = (
        f1.limit(10)
        .select((F.col("doc_id") + 5000).alias("doc_id"), "text")
        .unionByName(
            seed.limit(10).select(
                (F.col("doc_id") + 6000).alias("doc_id"), "text"
            )
        )
    )
    f3 = docs.filter((F.col("doc_id") >= 160) & (F.col("doc_id") < 240))
    drop = str(tmp_path / "drop")
    for part in (f1, f2, f3):
        part.coalesce(1).write.mode("append").parquet(drop)
    return docs, model, seed, drop


def test_stream_curate_matches_batch(spark, staged_funnel, tmp_path):
    docs, model, seed, drop = staged_funnel
    index = str(tmp_path / "idx")
    out = str(tmp_path / "out")
    audit = str(tmp_path / "audit")
    init_dedup_index(seed, index)

    schema = spark.read.parquet(drop).schema
    q = stream_curate_funnel(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop),
        model,
        index,
        out,
        audit,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    # batch twin over the whole drop at once: same gate + frozen
    # scoring, then the same content-dedup-against-seed semantics
    all_rows = spark.read.parquet(drop)
    kept = curate_batch_frozen(all_rows, model)
    expected = _key_set(kept) - _key_set(seed)

    admitted = spark.read.parquet(out)
    got = [
        r["content_hash"]
        for r in admitted.select("content_hash").collect()
    ]
    assert sorted(got) == sorted(set(got)), "a content admitted twice"
    assert set(got) == expected

    # audit: n_input sums to the stream's row count; n_admitted sums
    # to the corpus rows written; quality + ppl stages are monotone
    arows = spark.read.parquet(audit).collect()
    assert len(arows) == 3  # one per micro-batch
    assert sum(r["n_input"] for r in arows) == all_rows.count()
    assert sum(r["n_admitted"] for r in arows) == admitted.count()
    for r in arows:
        assert r["n_input"] >= r["n_quality_pass"] >= r["n_ppl_kept"]
        assert r["n_ppl_kept"] >= r["n_admitted"]
    # admitted token sum equals the corpus's frozen-LM token count
    assert sum(r["admitted_tokens"] for r in arows) == (
        admitted.agg(F.sum("n_tokens_lm")).collect()[0][0] or 0
    )

    # replay the whole drop as a NEW query: at-least-once delivery,
    # but the durable index admits nothing the second time
    out2 = str(tmp_path / "out2")
    q2 = stream_curate_funnel(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop),
        model,
        index,
        out2,
        str(tmp_path / "audit2"),
        str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination(180)
    n_replay = (
        spark.read.parquet(out2).count()
        if os.path.exists(out2) and os.listdir(out2)
        else 0
    )
    assert n_replay == 0


def test_micro_batch_retry_replaces_not_appends(
    spark, staged_funnel, tmp_path
):
    """foreachBatch is at-least-once: a crash after the output write
    but before the checkpoint commit re-runs the SAME batch_id. The
    sinks are batch_id-keyed overwrites, so the retry REPLACES its
    own partition — output content stays exactly-once (the ADVICE-r6
    duplication window)."""
    from minisql_engine_spark.streaming.curate import curate_micro_batch

    docs, model, seed, drop = staged_funnel
    index = str(tmp_path / "idx_retry")
    out = str(tmp_path / "out_retry")
    audit = str(tmp_path / "audit_retry")
    init_dedup_index(seed, index)

    batch = spark.read.parquet(drop).filter(
        (F.col("doc_id") >= 100) & (F.col("doc_id") < 160)
    )
    curate_micro_batch(batch, 0, model, index, out, audit)
    first = sorted(
        r["content_hash"]
        for r in spark.read.parquet(out).select("content_hash").collect()
    )
    first_audit = spark.read.parquet(audit).collect()
    assert first, "first run admitted nothing — fixture broken"
    assert len(first_audit) == 1

    # the worst retry window: crash AFTER the index append, so the
    # index already rejects the batch's own content. The committed
    # output partition is the decision record — the retry re-reads
    # it, neither duplicating (the pre-fix append bug) nor wiping
    # (what naive recompute+overwrite would do) the batch's rows.
    curate_micro_batch(batch, 0, model, index, out, audit)
    replay = sorted(
        r["content_hash"]
        for r in spark.read.parquet(out).select("content_hash").collect()
    )
    assert replay == first
    arows = spark.read.parquet(audit).collect()
    assert len(arows) == 1
    assert (
        arows[0]["n_admitted"] == first_audit[0]["n_admitted"] == len(first)
    )

    # and the index did not re-admit: a fresh batch of the same
    # content is fully rejected
    batch2 = batch.select((F.col("doc_id") + 70000).alias("doc_id"), "text")
    curate_micro_batch(batch2, 1, model, index, out, audit)
    again = spark.read.parquet(out).filter("batch_id = 1").count()
    assert again == 0
