"""Incremental dedup index: batch-sequence invariants + compaction."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from minisql_engine_spark.operators.dedup import _norm
from minisql_engine_spark.operators.dedup_index import (
    append_to_index,
    compact_index,
    dedup_against_index,
    index_stats,
    init_dedup_index,
)
from minisql_engine_spark.sources import load_table


@pytest.fixture()
def batches(spark, sf_dir):
    """Three batches carved from documents, with cross-batch and
    in-batch duplicates injected: batch B repeats 10 of A's texts
    under new ids, and repeats one of its own texts twice."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    a = docs.filter(F.col("doc_id") < 200)
    b_fresh = docs.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 350))
    # 10 of A's texts re-appear in B under ids 10200..10209
    b_dup_of_a = a.limit(10).select(
        (F.col("doc_id") + 10200).alias("doc_id"), "text"
    )
    # one B text duplicated inside B
    b_self_dup = b_fresh.limit(1).select(
        (F.col("doc_id") + 20000).alias("doc_id"), "text"
    )
    b = b_fresh.unionByName(b_dup_of_a).unionByName(b_self_dup)
    c = docs.filter(F.col("doc_id") >= 350)
    return a, b, c


def _key_set(df):
    return {
        r["k"]
        for r in df.select(F.md5(_norm(F.col("text"))).alias("k"))
        .distinct()
        .collect()
    }


def test_batch_sequence_admits_one_rep_per_content(
    spark, sf_dir, batches, tmp_path
):
    a, b, c = batches
    path = str(tmp_path / "idx")
    init_dedup_index(a, path)

    surv_b = dedup_against_index(b, path)
    sb = surv_b.toPandas()
    # exactly the keys of B not already in A, one row each
    expected_b = _key_set(b) - _key_set(a)
    assert set(sb["content_hash"]) == expected_b
    assert len(sb) == len(expected_b)
    # the in-batch duplicate kept the min id
    append_to_index(surv_b, path)

    # idempotence: the same batch after append admits nothing
    assert dedup_against_index(b, path).count() == 0

    surv_c = dedup_against_index(c, path)
    expected_c = _key_set(c) - _key_set(a) - _key_set(b)
    assert set(r["content_hash"] for r in surv_c.select("content_hash").collect()) == expected_c
    append_to_index(surv_c, path)

    # index now holds exactly the distinct union of all keys
    union_keys = _key_set(a) | _key_set(b) | _key_set(c)
    stats = index_stats(spark, path).collect()[0]
    assert stats["n_keys"] == len(union_keys)
    assert stats["n_partitions"] == 16


def test_in_batch_min_id_rule(spark, tmp_path):
    path = str(tmp_path / "idx")
    init_dedup_index(
        spark.createDataFrame([(1, "seed text")], "doc_id bigint, text string"),
        path,
    )
    batch = spark.createDataFrame(
        [(7, "same body"), (3, "same body"), (9, "Seed   TEXT")],
        "doc_id bigint, text string",
    )
    surv = dedup_against_index(batch, path).toPandas()
    # "Seed   TEXT" normalizes into the seed content -> dropped;
    # the duplicated new content keeps id 3
    assert list(surv["doc_id"]) == [3]


def test_compaction_preserves_semantics(spark, sf_dir, batches, tmp_path):
    a, b, c = batches
    path = str(tmp_path / "idx")
    init_dedup_index(a, path)
    append_to_index(dedup_against_index(b, path), path)
    before = index_stats(spark, path).collect()[0]
    n_files_before = len(glob.glob(f"{path}/*/*.parquet"))

    compact_index(spark, path)
    after = index_stats(spark, path).collect()[0]
    assert after["n_keys"] == before["n_keys"]
    assert after["n_partitions"] == 16
    n_files_after = len(glob.glob(f"{path}/*/*.parquet"))
    assert n_files_after <= n_files_before
    # lookups unchanged after the swap
    assert dedup_against_index(b, path).count() == 0
    assert dedup_against_index(c, path).count() == c.select(
        F.md5(_norm(F.col("text")))
    ).distinct().count() - len(_key_set(c) & (_key_set(a) | _key_set(b)))


def test_bloom_sidecar_identical_admission(spark, batches, tmp_path):
    """The Bloom fast path must admit EXACTLY what the exact path
    admits across a multi-batch sequence (no false negatives ⇒ the
    sidecar can only add redundant lookups, never change outcomes)."""
    from minisql_engine_spark.operators.dedup_index import (
        append_to_index,
        append_to_index_with_bloom,
        dedup_against_index,
        dedup_with_bloom_sidecar,
        init_bloom_sidecar,
        init_dedup_index,
    )

    a, b, c = batches
    exact_path = str(tmp_path / "idx_exact")
    fast_path = str(tmp_path / "idx_fast")
    bloom_path = str(tmp_path / "idx_fast.bloom")
    init_dedup_index(a, exact_path)
    init_dedup_index(a, fast_path)
    init_bloom_sidecar(spark, fast_path, bloom_path, n_bits=1 << 14)

    for batch in (b, c):
        exact = dedup_against_index(batch, exact_path)
        fast = dedup_with_bloom_sidecar(batch, fast_path, bloom_path)
        got_e = {(r["doc_id"]) for r in exact.select("doc_id").collect()}
        got_f = {(r["doc_id"]) for r in fast.select("doc_id").collect()}
        assert got_e == got_f
        append_to_index(exact, exact_path)
        append_to_index_with_bloom(fast, fast_path, bloom_path)


def test_bloom_sidecar_skips_index_for_fresh_batch(spark, batches, tmp_path):
    """A batch with zero index overlap must route zero (or FPR-only)
    keys into the exact index join — the common-case scan skip."""
    from minisql_engine_spark.operators.dedup_index import (
        _bloom_meta,
        _keyed,
        init_bloom_sidecar,
        init_dedup_index,
    )
    from minisql_engine_spark.operators.membership import bloom_probe

    a, b, c = batches
    path = str(tmp_path / "idx")
    bloom_path = str(tmp_path / "idx.bloom")
    init_dedup_index(a, path)
    init_bloom_sidecar(spark, path, bloom_path, n_bits=1 << 14)
    meta = _bloom_meta(bloom_path)
    fresh_keys = (
        _keyed(c, "doc_id", "text")
        .select(F.col("content_hash").alias("key"))
        .distinct()
    )
    from minisql_engine_spark.operators.dedup_index import _bloom_words

    probed = bloom_probe(
        fresh_keys,
        _bloom_words(spark, bloom_path, meta),
        "key",
        meta["n_bits"],
        meta["k"],
    )
    n = probed.count()
    maybe = probed.filter(F.col("maybe_present")).count()
    # c shares no content with a: everything routed to the index is a
    # false positive, bounded well under the sizing FPR
    assert maybe / n < 0.05


def test_bloom_sidecar_learns_appended_keys(spark, batches, tmp_path):
    """Regression: the sidecar must learn the keys appended in the
    SAME admission step (the survivors lineage re-executes during the
    sidecar merge — if the index has already advanced, the anti-join
    evaluates survivors to empty and the sidecar silently lags,
    re-admitting any later duplicate of that batch)."""
    from minisql_engine_spark.operators.dedup_index import (
        append_to_index_with_bloom,
        dedup_with_bloom_sidecar,
        init_bloom_sidecar,
        init_dedup_index,
    )

    a, b, c = batches
    path = str(tmp_path / "idx")
    bloom_path = str(tmp_path / "idx.bloom")
    init_dedup_index(a, path)
    init_bloom_sidecar(spark, path, bloom_path, n_bits=1 << 14)
    admitted_b = dedup_with_bloom_sidecar(b, path, bloom_path)
    append_to_index_with_bloom(admitted_b, path, bloom_path)
    # a later batch that replays B's content under new ids must admit
    # NOTHING — this is exactly what a lagging sidecar gets wrong
    replay = b.select((F.col("doc_id") + 50000).alias("doc_id"), "text")
    again = dedup_with_bloom_sidecar(replay, path, bloom_path)
    assert again.count() == 0


def test_bucketed_admission_identity(spark, batches, tmp_path):
    """The bucketed-catalog layout admits EXACTLY what the broadcast
    directory layout admits across a multi-batch sequence."""
    from minisql_engine_spark.operators.dedup_index import (
        append_to_bucketed_index,
        dedup_against_bucketed_index,
        init_dedup_index_bucketed,
    )
    from minisql_engine_spark.sources.bucketing import drop_bucketed

    a, b, c = batches
    dir_path = str(tmp_path / "idx_dir")
    tbl = "dedup_idx_bucketed_test"
    drop_bucketed(spark, tbl)
    init_dedup_index(a, dir_path)
    init_dedup_index_bucketed(a, tbl)
    try:
        for batch in (b, c):
            exact = dedup_against_index(batch, dir_path)
            bucketed = dedup_against_bucketed_index(batch, tbl)
            got_e = {r["doc_id"] for r in exact.select("doc_id").collect()}
            got_b = {
                r["doc_id"] for r in bucketed.select("doc_id").collect()
            }
            assert got_e == got_b
            append_to_index(exact, dir_path)
            append_to_bucketed_index(bucketed, tbl)
    finally:
        drop_bucketed(spark, tbl)


def test_bucketed_admission_zero_exchange_on_index_side(
    spark, batches, tmp_path
):
    """With broadcast disabled (the too-big-to-broadcast batch), the
    admission anti join must read the bucketed index with NO Exchange
    above it — the scan reports Bucketed: true and the only shuffles
    in the plan belong to the batch side (its in-batch dedup window +
    its hash into the index's buckets)."""
    from minisql_engine_spark.operators.dedup_index import (
        dedup_against_bucketed_index,
        init_dedup_index_bucketed,
    )
    from minisql_engine_spark.sources.bucketing import drop_bucketed
    from tests.test_plans import plan_of

    a, b, _c = batches
    tbl = "dedup_idx_bucketed_plan"
    drop_bucketed(spark, tbl)
    init_dedup_index_bucketed(a, tbl)
    # materialize the batch so its side of the plan is ONE scan (the
    # fixture's union-of-limits shape would add its own Exchanges and
    # obscure the count)
    bpath = str(tmp_path / "batch")
    b.write.parquet(bpath)
    batch = spark.read.parquet(bpath)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(dedup_against_bucketed_index(batch, tbl))
        assert "SortMergeJoin" in plan, plan
        assert "Bucketed: true" in plan, plan
        # exactly two Exchanges in the TREE ("- Exchange" matches the
        # tree rendering only; the per-node detail sections repeat
        # every operator name), both batch-side: the in-batch dedup
        # window partitioning and the hash into the index's buckets.
        # The index subtree is Scan -> Filter -> Sort -> join: its
        # bucketing satisfies the join's distribution requirement, so
        # the corpus-sized side never reshuffles.
        assert plan.count("- Exchange") == 2, plan
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        drop_bucketed(spark, tbl)
