"""Persisted IVF index: the inverted file AS parquet partition layout.

``ivf_topk`` (similarity.py) rebuilds its index per query session; at
100 TB the index is built ONCE and written so that searches touch
only the probed fraction of the corpus. This module materializes the
IVF structure the way a lakehouse actually stores one:

* ``<path>/centroids/`` — the n_cells refined centroids (tiny);
* ``<path>/corpus/cell=<c>/…`` — every corpus vector WITH its
  precomputed norm, parquet-partitioned BY CELL ID.

The partition column is the inverted file: a search assigns the
query to its ``n_probe`` nearest centroids map-side (broadcast of the
tiny centroid table) and scans ``cell IN (…)`` — Spark's partition
pruning turns that into reading n_probe directories, i.e. ~n_probe /
n_cells of the corpus bytes, no index service required
(``test_ann_index.py`` asserts the pruned scan). Vector norms are
precomputed at build time, so search cost per candidate is one dot
product.

Same determinism contract as the in-memory path: centroids come from
``ivf_refined_centroids`` (decimal-exact Lloyd means), assignment
tiebreak is ``sim DESC, cell ASC``, scores are round(6) — a search
over the written index returns EXACTLY what ``ivf_topk`` returns on
the same corpus (asserted in tests).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minisql_engine_spark.operators.portable_round import (
    davg as _davg,
    fx6 as _fx6,
)

from minisql_engine_spark.operators.similarity import (
    N_CELLS,
    N_PROBE,
    as_double_sql,
    ivf_assignments,
    ivf_centroids,
    ivf_refined_centroids,
    norm_sql,
    score_sql,
)


def write_ivf_index(
    embeddings: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = N_CELLS,
    refine_iters: int = 2,
) -> None:
    """Build and persist the IVF index under ``path``."""
    if refine_iters > 0:
        cents = ivf_refined_centroids(
            embeddings, id_col, vec_col, n_cells, n_iter=refine_iters
        )
    else:
        cents = ivf_centroids(embeddings, id_col, vec_col, n_cells)
    cents.write.mode("overwrite").parquet(os.path.join(path, "centroids"))

    spark = embeddings.sparkSession
    cents_back = spark.read.parquet(os.path.join(path, "centroids"))
    assigned = ivf_assignments(
        embeddings, cents_back, id_col, vec_col, n_probe=1
    ).select(id_col, "cell")
    corpus = (
        embeddings.selectExpr(
            id_col, as_double_sql(vec_col) + " as v"
        )
        .withColumn("nv", F.expr(norm_sql("v")))
        .join(assigned, id_col)
    )
    # one directory per cell — the inverted file IS the layout
    corpus.write.mode("overwrite").partitionBy("cell").parquet(
        os.path.join(path, "corpus")
    )


def ivf_index_topk(
    spark: SparkSession,
    path: str,
    query_embeddings: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = N_PROBE,
) -> DataFrame:
    """Search the persisted index: (query_id, neighbor_id, score,
    rank). ``query_embeddings`` carries (id, vector) of the queries —
    typically a tiny DataFrame; it is broadcast, the corpus is read
    partition-pruned to the probed cells only."""
    from pyspark.sql.window import Window

    cents = spark.read.parquet(os.path.join(path, "centroids"))
    q_cells = ivf_assignments(
        query_embeddings, cents, id_col, vec_col, n_probe=n_probe
    ).select(F.col(id_col).alias("query_id"), "cell")
    qv = query_embeddings.selectExpr(
        f"{id_col} as query_id", as_double_sql(vec_col) + " as qv"
    ).withColumn("qn", F.expr(norm_sql("qv")))
    probes = q_cells.join(qv, "query_id")

    corpus = spark.read.parquet(os.path.join(path, "corpus"))
    scored = (
        corpus.join(F.broadcast(probes), "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.expr(score_sql("qv", "v", "qn", "nv")).alias("score"),
        )
        # no distinct needed: each corpus vector lives in exactly ONE
        # cell directory, so a (query, neighbor) pair joins at most
        # once even under multi-probe — and skipping it saves a
        # candidate-set shuffle
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def append_to_ivf_index(
    new_embeddings: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incrementally index new vectors into an EXISTING persisted
    index: assign against the FROZEN stored centroids and append into
    the cell partitions — no rebuild, no touching existing files
    (parquet partitioned append writes only the new cells' files).

    This is how IVF indexes are actually maintained at scale: the
    coarse quantizer (centroids) stays fixed between periodic
    re-trainings, so an append-only ingest pipeline can index
    continuously; because assignment is deterministic against the
    same centroids, an index built incrementally equals one built
    from scratch over the union (asserted in tests). Centroid drift
    from distribution shift is handled by scheduled re-builds
    (write_ivf_index), not per-batch."""
    import os

    spark = new_embeddings.sparkSession
    cents = spark.read.parquet(os.path.join(path, "centroids"))
    assigned = ivf_assignments(
        new_embeddings, cents, id_col, vec_col, n_probe=1
    ).select(id_col, "cell")
    corpus = (
        new_embeddings.selectExpr(
            id_col, as_double_sql(vec_col) + " as v"
        )
        .withColumn("nv", F.expr(norm_sql("v")))
        .join(assigned, id_col)
    )
    corpus.write.mode("append").partitionBy("cell").parquet(
        os.path.join(path, "corpus")
    )


def ivf_cell_stats(spark: SparkSession, path: str) -> DataFrame:
    """(cell, n_vectors, mean_dist): occupancy and mean cosine
    distance (1 − sim) of each cell's members to their centroid.

    ``mean_dist`` is the drift metric: appends assign against FROZEN
    centroids, so distribution shift shows up as rising mean distance
    (members far from their quantizer → worse pruned-search recall
    per byte scanned). One pass over the corpus joined to the
    broadcast-sized centroid table, one cell-keyed aggregate."""
    cents = (
        spark.read.parquet(os.path.join(path, "centroids"))
        .withColumnRenamed("cv", "_cv")
        .withColumn("_cn", F.expr(norm_sql("_cv")))
    )
    corpus = spark.read.parquet(os.path.join(path, "corpus"))
    dist = F.lit(1.0) - F.expr(score_sql("v", "_cv", "nv", "_cn"))
    return (
        corpus.join(F.broadcast(cents), "cell")
        .groupBy("cell")
        .agg(
            F.count("*").cast("bigint").alias("n_vectors"),
            _fx6(_davg(dist)).alias("mean_dist"),
        )
    )


def compact_ivf_index(
    spark: SparkSession,
    path: str,
    max_cell_size: int,
    id_col: str = "vec_id",
    refine_iters: int = 2,
) -> dict:
    """Re-cluster the index when any cell outgrows ``max_cell_size``
    (IVF maintenance: appends against frozen centroids eventually
    unbalance the inverted file — an oversized cell makes every probe
    of it scan too much).

    Compaction re-trains the coarse quantizer over the FULL stored
    corpus (decimal-exact Lloyd, same seeding rule) and rewrites the
    cell layout. Because stored vectors are the exact doubles the
    original embeddings cast to, a compacted index is bit-identical
    to one built fresh over the union corpus — searches keep the
    in-memory ``ivf_topk`` contract (asserted in tests). At lakehouse
    scale you would write ``<path>.new`` and swap a pointer; here the
    corpus is staged through a DataFrame checkpoint-free rewrite of
    the same directories.

    Returns ``{"compacted": bool, "max_cell_before": int,
    "mean_dist_before": float, "mean_dist_after": float | None}`` —
    the before/after drift record the maintenance job logs.
    """
    stats = ivf_cell_stats(spark, path).collect()  # n_cells rows — tiny
    max_cell = max((r["n_vectors"] for r in stats), default=0)
    total = sum(r["n_vectors"] for r in stats) or 1
    mean_before = round(
        sum(r["mean_dist"] * r["n_vectors"] for r in stats) / total, 6
    )
    if max_cell <= max_cell_size:
        return {
            "compacted": False,
            "max_cell_before": max_cell,
            "mean_dist_before": mean_before,
            "mean_dist_after": None,
        }
    # full stored corpus back into embedding shape; v is already the
    # double-cast of the original vectors, so retraining here equals
    # retraining on the source embeddings
    stored = (
        spark.read.parquet(os.path.join(path, "corpus"))
        .select(id_col, F.col("v").alias("embedding"))
        .localCheckpoint()  # sever lineage from the files being rewritten
    )
    write_ivf_index(
        stored, path, id_col=id_col, refine_iters=refine_iters
    )
    after = ivf_cell_stats(spark, path).collect()
    total_a = sum(r["n_vectors"] for r in after) or 1
    mean_after = round(
        sum(r["mean_dist"] * r["n_vectors"] for r in after) / total_a, 6
    )
    return {
        "compacted": True,
        "max_cell_before": max_cell,
        "mean_dist_before": mean_before,
        "mean_dist_after": mean_after,
    }
