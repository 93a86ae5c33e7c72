"""Streaming admission: content-exactly-once across micro-batches,
idempotent replay against the durable index."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from minisql_engine_spark.operators.dedup import _norm
from minisql_engine_spark.operators.dedup_index import (
    init_dedup_index,
    index_stats,
)
from minisql_engine_spark.sources import load_table
from minisql_engine_spark.streaming.ingest import stream_admit


def _key_set(df):
    return {
        r["k"]
        for r in df.select(F.md5(_norm(F.col("text"))).alias("k"))
        .distinct()
        .collect()
    }


@pytest.fixture()
def staged(spark, sf_dir, tmp_path):
    """Seed corpus + a 3-file drop folder with duplicates WITHIN the
    stream (file2 repeats file1 texts) and AGAINST the seed."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    seed = docs.filter(F.col("doc_id") < 100)
    f1 = docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 160))
    # repeats of f1 contents under new ids + repeats of the seed
    f2 = (
        f1.limit(10)
        .select((F.col("doc_id") + 5000).alias("doc_id"), "text")
        .unionByName(
            seed.limit(10).select(
                (F.col("doc_id") + 6000).alias("doc_id"), "text"
            )
        )
    )
    f3 = docs.filter((F.col("doc_id") >= 160) & (F.col("doc_id") < 200))
    drop = str(tmp_path / "drop")
    for i, part in enumerate([f1, f2, f3]):
        part.coalesce(1).write.mode("append").parquet(drop)
    return seed, f1, f3, drop


def test_stream_admission_content_exactly_once(spark, staged, tmp_path):
    seed, f1, f3, drop = staged
    index = str(tmp_path / "idx")
    out = str(tmp_path / "out")
    init_dedup_index(seed, index)

    schema = spark.read.parquet(drop).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop)
    )
    q = stream_admit(stream, index, out, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    admitted = spark.read.parquet(out)
    # exactly one representative per content never seen by the seed
    expected = (_key_set(f1) | _key_set(f3)) - _key_set(seed)
    got = [r["content_hash"] for r in admitted.select("content_hash").collect()]
    assert sorted(got) == sorted(set(got)), "a content was admitted twice"
    assert set(got) == expected
    # the index advanced by exactly the admitted keys
    n = index_stats(spark, index).collect()[0]["n_keys"]
    assert n == seed.select(F.md5(_norm(F.col("text")))).distinct().count() + len(
        expected
    )

    # replay the whole drop folder as a NEW query (fresh checkpoint):
    # at-least-once delivery, but the durable index makes admission
    # idempotent — nothing new lands
    q2 = stream_admit(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop),
        index,
        str(tmp_path / "out2"),
        str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination(120)
    out2 = str(tmp_path / "out2")
    n_replay = (
        spark.read.parquet(out2).count()
        if os.path.exists(out2) and os.listdir(out2)
        else 0
    )
    assert n_replay == 0
    assert index_stats(spark, index).collect()[0]["n_keys"] == n


def test_stream_neardup_admission(spark, sf_dir, tmp_path):
    """Micro-batched near-dup admission: exact re-crawls collide with
    the seeded index; replay under a fresh checkpoint admits nothing."""
    from minisql_engine_spark.operators.neardup_index import (
        init_neardup_index,
        neardup_index_stats,
    )
    from minisql_engine_spark.streaming.ingest import stream_admit_neardup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    seed = docs.filter(F.col("doc_id") < 100)
    fresh = docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 140))
    dups = seed.limit(8).select((F.col("doc_id") + 7000).alias("doc_id"), "text")
    drop = str(tmp_path / "drop")
    fresh.coalesce(1).write.mode("append").parquet(drop)
    dups.coalesce(1).write.mode("append").parquet(drop)

    index = str(tmp_path / "nidx")
    init_neardup_index(seed, index)
    n0 = neardup_index_stats(spark, index).collect()[0]["n_docs"]

    schema = spark.read.parquet(drop).schema
    q = stream_admit_neardup(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop),
        index,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    admitted = spark.read.parquet(str(tmp_path / "out"))
    ids = {r["doc_id"] for r in admitted.select("doc_id").collect()}
    assert not any(i >= 7000 for i in ids), "an exact re-crawl was admitted"
    # replay: a fresh query over the same folder admits nothing new
    n1 = neardup_index_stats(spark, index).collect()[0]["n_docs"]
    q2 = stream_admit_neardup(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop),
        index,
        str(tmp_path / "out2"),
        str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination(120)
    assert neardup_index_stats(spark, index).collect()[0]["n_docs"] == n1
    assert n1 > n0


def test_stream_admission_into_snapshot_table(spark, staged, tmp_path):
    """Versioned ingest: one append version per non-empty batch,
    content-exactly-once, time travel over the live table, replay
    admits nothing and commits no version."""
    from minisql_engine_spark.sources.snapshots import (
        current_version,
        read_snapshot,
    )
    from minisql_engine_spark.streaming.ingest import (
        stream_admit_snapshot,
    )

    seed, f1, f3, drop = staged
    index = str(tmp_path / "idx2")
    table = str(tmp_path / "tbl2")
    init_dedup_index(seed, index)

    schema = spark.read.parquet(drop).schema

    def run(ckpt):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(drop)
        )
        q = stream_admit_snapshot(
            stream,
            index,
            table,
            str(tmp_path / ckpt),
            constraints=["doc_id IS NOT NULL"],
        )
        q.awaitTermination(120)

    run("ck1")
    v = current_version(table)
    # 3 files: f2 is all duplicates → at most 2 non-empty versions...
    # f2 repeats f1 + seed contents ONLY, so exactly 2 commits
    assert v == 2
    admitted = read_snapshot(spark, table)
    expected = (_key_set(f1) | _key_set(f3)) - _key_set(seed)
    got = [
        r["content_hash"]
        for r in admitted.select("content_hash").collect()
    ]
    assert sorted(got) == sorted(set(got))
    assert set(got) == expected
    # version 1 holds only the first batch's admissions (time travel)
    assert read_snapshot(spark, table, version=1).count() < admitted.count()

    # full replay under a fresh checkpoint: nothing admitted, no
    # version committed
    run("ck2")
    assert current_version(table) == v
    assert read_snapshot(spark, table).count() == admitted.count()


def test_stream_admission_snapshot_with_bloom_sidecar(
    spark, staged, tmp_path
):
    """stream_admit_snapshot with bloom_path admits the IDENTICAL
    content/version series as the exact path, and a replay under a
    fresh checkpoint admits nothing and commits no version."""
    from minisql_engine_spark.operators.dedup_index import (
        init_bloom_sidecar,
    )
    from minisql_engine_spark.sources.snapshots import (
        current_version,
        read_snapshot,
    )
    from minisql_engine_spark.streaming.ingest import (
        stream_admit_snapshot,
    )

    seed, f1, f3, drop = staged
    schema = spark.read.parquet(drop).schema

    def run(index, table, ckpt, bloom):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(drop)
        )
        q = stream_admit_snapshot(
            stream,
            index,
            table,
            str(tmp_path / ckpt),
            constraints=["doc_id IS NOT NULL"],
            bloom_path=bloom,
        )
        q.awaitTermination(120)

    # exact path
    idx_e, tbl_e = str(tmp_path / "sbe_idx"), str(tmp_path / "sbe_tbl")
    init_dedup_index(seed, idx_e)
    run(idx_e, tbl_e, "sbe_ck", None)

    # sidecar path on fresh state
    idx_b, tbl_b = str(tmp_path / "sbb_idx"), str(tmp_path / "sbb_tbl")
    init_dedup_index(seed, idx_b)
    bloom = str(tmp_path / "sbb_idx.bloom")
    init_bloom_sidecar(spark, idx_b, bloom, n_bits=1 << 14)
    run(idx_b, tbl_b, "sbb_ck", bloom)

    def series(table):
        return sorted(
            (r["content_hash"], r["_v"])
            for v in range(1, current_version(table) + 1)
            for r in read_snapshot(spark, table, version=v)
            .selectExpr("content_hash", f"{v} AS _v")
            .collect()
        )

    assert current_version(tbl_b) == current_version(tbl_e)
    assert series(tbl_b) == series(tbl_e)

    # replay through the sidecar: nothing admitted, no version
    run(idx_b, tbl_b, "sbb_ck2", bloom)
    assert current_version(tbl_b) == current_version(tbl_e)


def test_stream_admission_with_bloom_sidecar(spark, staged, tmp_path):
    """The sidecar-routed stream admits the exact same content set as
    the exact path, stays content-exactly-once across micro-batches,
    and a full replay under a fresh checkpoint admits nothing."""
    from minisql_engine_spark.operators.dedup_index import (
        init_bloom_sidecar,
    )

    seed, f1, f3, drop = staged
    index = str(tmp_path / "bidx")
    out = str(tmp_path / "bout")
    init_dedup_index(seed, index)
    bloom = str(tmp_path / "bidx.bloom")
    init_bloom_sidecar(spark, index, bloom, n_bits=1 << 14)

    schema = spark.read.parquet(drop).schema
    q = stream_admit(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop),
        index,
        out,
        str(tmp_path / "bckpt"),
        bloom_path=bloom,
    )
    q.awaitTermination(120)

    admitted = spark.read.parquet(out)
    expected = (_key_set(f1) | _key_set(f3)) - _key_set(seed)
    got = [r["content_hash"] for r in admitted.select("content_hash").collect()]
    assert sorted(got) == sorted(set(got)), "a content was admitted twice"
    assert set(got) == expected

    # replay: the sidecar learned every admitted key in-step, so the
    # fast path alone (plus the exact join for collisions) re-admits
    # nothing under a fresh checkpoint
    q2 = stream_admit(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop),
        index,
        str(tmp_path / "bout2"),
        str(tmp_path / "bckpt2"),
        bloom_path=bloom,
    )
    q2.awaitTermination(120)
    out2 = str(tmp_path / "bout2")
    n_replay = (
        spark.read.parquet(out2).count()
        if os.path.exists(out2) and os.listdir(out2)
        else 0
    )
    assert n_replay == 0


def test_versioned_admission_cycle_driver_shape(spark, sf_dir, tmp_path, duck):
    """The r9 driver row end-to-end: content-addressed output matches
    the DuckDB chained-admission replay, every content appears once,
    and the in-query replay gate already ran (the cycle raises if the
    replay commits anything)."""
    from minisql_engine_spark.sources.snapshots import current_version
    from minisql_engine_spark.streaming.ingest import (
        versioned_admission_cycle,
        versioned_admission_sql,
    )
    from tests.conftest import assert_matches_oracle

    docs = load_table(spark, sf_dir, "documents")
    base = str(tmp_path / "vadm")
    out = versioned_admission_cycle(docs, base)
    assert_matches_oracle(
        out, duck.execute(versioned_admission_sql()).fetchdf(), "vadm"
    )
    rows = out.collect()
    hashes = [r["content_hash"] for r in rows]
    assert sorted(hashes) == sorted(set(hashes))
    assert all(r["replay_new_versions"] == 0 for r in rows)
    # versions on disk equal the claimed n_versions
    n_claimed = {r["n_versions"] for r in rows}
    assert n_claimed == {
        current_version(os.path.join(base, "run", "table"))
    }
