"""Persisted IVF index: layout, pruning, and parity with the
in-memory path."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from minisql_engine_spark.operators.ann_index import (
    append_to_ivf_index,
    ivf_index_topk,
    write_ivf_index,
)
from minisql_engine_spark.operators.similarity import (
    clear_centroid_cache,
    ivf_topk,
)
from minisql_engine_spark.sources import load_table

QUERY_IDS = [0, 1, 2, 3, 4]


@pytest.fixture(scope="module")
def index_path(tmp_path_factory):
    return str(tmp_path_factory.mktemp("ivf") / "index")


@pytest.fixture(scope="module")
def built(spark, sf_dir, index_path):
    emb = load_table(spark, sf_dir, "embeddings")
    write_ivf_index(emb, index_path, refine_iters=2)
    clear_centroid_cache()
    return index_path


def test_layout_is_cell_partitioned(built):
    cells = [
        d
        for d in os.listdir(os.path.join(built, "corpus"))
        if d.startswith("cell=")
    ]
    assert len(cells) > 1  # multiple cell directories materialized


def test_index_search_equals_in_memory(spark, sf_dir, built):
    """Searching the written index must reproduce ivf_topk exactly —
    same centroids (decimal-exact Lloyd replay), same tiebreaks."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(QUERY_IDS))
    from_index = sorted(
        tuple(r) for r in ivf_index_topk(spark, built, queries, k=10).collect()
    )
    in_memory = sorted(
        tuple(r)
        for r in ivf_topk(emb, QUERY_IDS, k=10, refine_iters=2).collect()
    )
    clear_centroid_cache()
    assert from_index == in_memory
    assert len(from_index) == len(QUERY_IDS) * 10


def test_search_scan_is_partition_pruned(spark, sf_dir, built):
    """The probed-cells filter must reach the corpus scan as a
    partition filter — the whole point of writing the inverted file
    as directory layout."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(QUERY_IDS))
    df = ivf_index_topk(spark, built, queries, k=5)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    clear_centroid_cache()
    assert "PartitionFilters" in plan
    # the corpus scan must carry a dynamic/explicit cell filter, not
    # scan all partitions: look for the cell column in a partition
    # filter expression
    assert any(
        "PartitionFilters" in line and "cell" in line
        for line in plan.splitlines()
    ), plan


def test_incremental_append_equals_full_build(spark, sf_dir, tmp_path):
    """Index half the corpus, append the other half against the
    frozen centroids: search results must equal an index built from
    the full corpus with the SAME centroids."""
    emb = load_table(spark, sf_dir, "embeddings")
    first = emb.filter(F.col("vec_id") % 2 == 0)
    second = emb.filter(F.col("vec_id") % 2 == 1)

    # seed-only centroids (refine_iters=0) so both halves see the
    # identical frozen quantizer: the seed derives from the 16 lowest
    # vec_ids, which are all in neither half exclusively — build the
    # index from the FULL corpus's seed by writing centroids first
    inc_path = str(tmp_path / "inc")
    write_ivf_index(emb.limit(0).unionByName(first), inc_path, refine_iters=0)
    # overwrite centroids with the full-corpus seed for determinism
    from minisql_engine_spark.operators.similarity import ivf_centroids

    ivf_centroids(emb).write.mode("overwrite").parquet(inc_path + "/centroids")
    # rebuild first half against those centroids, then append second
    import shutil

    shutil.rmtree(inc_path + "/corpus")
    append_to_ivf_index(first, inc_path)
    append_to_ivf_index(second, inc_path)

    full_path = str(tmp_path / "full")
    write_ivf_index(emb, full_path, refine_iters=0)

    queries = emb.filter(F.col("vec_id").isin(QUERY_IDS))
    a = sorted(
        tuple(r)
        for r in ivf_index_topk(spark, inc_path, queries, k=10).collect()
    )
    b = sorted(
        tuple(r)
        for r in ivf_index_topk(spark, full_path, queries, k=10).collect()
    )
    clear_centroid_cache()
    assert a == b
    assert len(a) == len(QUERY_IDS) * 10


def test_cell_stats_report_occupancy_and_drift(spark, sf_dir, built):
    from minisql_engine_spark.operators.ann_index import ivf_cell_stats
    from minisql_engine_spark.sources import load_table as _lt

    emb = _lt(spark, sf_dir, "embeddings")
    stats = ivf_cell_stats(spark, built).collect()
    assert sum(r["n_vectors"] for r in stats) == emb.count()
    # cosine distance to the assigned (nearest) centroid ∈ [0, 2]
    assert all(0.0 <= r["mean_dist"] <= 2.0 for r in stats)
    assert len(stats) > 1


def test_compaction_after_appends_preserves_search_parity(
    spark, sf_dir, tmp_path
):
    """VERDICT r3 #7: grow an index by appends against frozen
    centroids, compact when a cell exceeds its bound — the compacted
    index must (a) report the before/after drift record and (b) search
    exactly like the in-memory ivf_topk over the union corpus."""
    from minisql_engine_spark.operators.ann_index import (
        compact_ivf_index,
        ivf_cell_stats,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") < 1000)
    extra1 = emb.filter((F.col("vec_id") >= 1000) & (F.col("vec_id") < 1500))
    extra2 = emb.filter(F.col("vec_id") >= 1500)
    path = str(tmp_path / "grown")
    write_ivf_index(base, path, refine_iters=2)
    clear_centroid_cache()
    append_to_ivf_index(extra1, path)
    append_to_ivf_index(extra2, path)

    # under-threshold: a no-op with the before-stats still reported
    big = max(
        r["n_vectors"] for r in ivf_cell_stats(spark, path).collect()
    )
    rep0 = compact_ivf_index(spark, path, max_cell_size=big)
    assert rep0["compacted"] is False
    assert rep0["mean_dist_after"] is None
    assert rep0["max_cell_before"] == big

    # over-threshold: re-clusters, reports drift both sides
    rep = compact_ivf_index(spark, path, max_cell_size=big - 1)
    clear_centroid_cache()
    assert rep["compacted"] is True
    assert rep["mean_dist_before"] >= 0.0
    assert rep["mean_dist_after"] is not None
    # retraining the quantizer on the full corpus must not worsen the
    # fit it is optimizing (tiny slack for round(6) edges)
    assert rep["mean_dist_after"] <= rep["mean_dist_before"] + 1e-4

    # the compacted index IS a fresh full-corpus index: searching it
    # equals the in-memory build over the union
    from minisql_engine_spark.operators.similarity import ivf_topk

    queries = emb.filter(F.col("vec_id").isin(QUERY_IDS))
    from_index = sorted(
        tuple(r)
        for r in ivf_index_topk(spark, path, queries, k=10).collect()
    )
    in_memory = sorted(
        tuple(r)
        for r in ivf_topk(emb, QUERY_IDS, k=10, refine_iters=2).collect()
    )
    clear_centroid_cache()
    assert from_index == in_memory
