"""Incremental SEMANTIC-dedup index: admit embedding batches against
a persisted, cell-partitioned vector index without re-clustering the
corpus.

The embedding member of the admission-family matrix — the same
production question as :mod:`dedup_index` (exact content) and
:mod:`neardup_index` (MinHash Jaccard), asked in embedding space:
"is anything ALREADY ADMITTED within cosine ``threshold`` of this
vector?" A crawl batch's semantic near-dups of the corpus are
dropped; the corpus is never re-clustered or re-compared.

What persists:

* **Frozen centroids** (``<path>/cents/``) — the Lloyd-refined
  k-means cells of the INIT corpus (:func:`similarity.
  ivf_refined_centroids`, the SemDeDup clustering). Freezing is what
  makes admission incremental AND deterministic: every batch assigns
  against the same cells, so any decision ever made is replayable.
  (Centroid drift is a reindex — :mod:`ann_index`'s compact/grow
  cycle owns that lifecycle; composing the two is a rebuild, not an
  admission.)
* **Vector index** (``<path>/vecs/cell=<k>/``) — (vec_id, embedding)
  of every admitted vector, parquet DIRECTORY-PARTITIONED BY CELL.
  Admission reads ONLY the cells the batch touches: the candidate
  scan is partition-pruned to the batch's cell set (plan-gated in
  ``test_semdedup_index.py``), so a small batch against a 100 TB
  index scans a bounded slice, never the corpus. Appends write new
  files under touched cell dirs only — object-store-friendly, no
  rewrite.

Admission of a batch (:func:`semdedup_against_index`):

1. assign each batch vector to its frozen cell (broadcast argmax —
   the :func:`similarity.ivf_assignments` hash-aggregate path);
2. candidates = batch ⋈ index ON cell — the only corpus-facing join,
   bounded by cell populations (≈ √n with the :func:`semdedup.
   auto_n_cells` rule), never |batch|×|corpus|;
3. verify = exact rounded cosine (the package's fx6 integer of the
   shared ``score_sql`` formula — oracle-exact, no float tie
   hazard). A batch vector with ANY verified neighbor ≥ ``threshold``
   is rejected; survivors append.

Same-cell restriction caveat (inherited from SemDeDup itself): at
the default ``n_probe=1`` a cross-cell neighbor is not a candidate —
the operator implements the paper's cluster-then-compare admission,
not exact ANN admission; the recall story is the cell count's and is
audited by the IVF/LSH recall rows. ``n_probe > 1`` (r14) closes
cell-border misses IVF-style: the batch side probes its p nearest
frozen cells (candidate work ×~p, still cell-bounded), decisions
become monotonically more conservative, and admitted vectors still
append under their home (rank-1) cell, so the stored layout is
n_probe-invariant.

Determinism and idempotence: first-batch-wins across batches (the
definition of incremental admission); decisions depend only on the
frozen cells and the persisted index, so replaying an admitted batch
rejects every vector (each collides with its own stored copy at
sim_fx6 = 10⁶ ≥ threshold) and appends nothing. In-batch semantic
dups are deliberately OUT of scope (two mutual near-dups both absent
from the index both admit) — resolve a batch internally with
:func:`semdedup.semantic_dedup` first; each operator stays
single-purpose, mirroring :mod:`neardup_index`'s contract.

Equivalence contract (the oracle): admission replays EXACTLY in SQL
— the DuckDB twin (:func:`semdedup_admission_sql`) re-derives the
frozen centroids from the init corpus (shared ``ivf_refine_ctes_sql``
chain), assigns batch and index sides by the same argmax, and
verifies the same fx6 cosines; chained batch sequences replay by
feeding each step's admitted set forward. Reference scope:
``sqlengine.py:1-753`` has no corpus surface; extension, SURVEY §2.4
dedup family (the embedding member beside ``dedup_index`` exact,
``neardup_index`` MinHash, and ``linkage_index`` record admission).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .semdedup import AUTO_N_CELLS_SQL, auto_n_cells
from .similarity import (
    DUCK_COS,
    as_double_sql,
    ivf_assignments,
    ivf_refine_ctes_sql,
    ivf_refined_centroids,
    norm_sql,
    score_sql,
)

_CENTS = "cents"
_VECS = "vecs"
FX = 10**6


def _cents_dir(path: str) -> str:
    return os.path.join(path, _CENTS)


def _vecs_dir(path: str) -> str:
    return os.path.join(path, _VECS)


def _rail_nonzero_norms(
    df: DataFrame, id_col: str, vec_col: str, where: str
) -> None:
    """Reject zero-norm vectors at the door. A zero vector's cosine
    is 0/0 = NaN, so its sim_fx6 against its own stored copy is not
    10⁶ — replay idempotence ('self-collision at 10⁶, appends
    nothing') would silently break, and NaN parity with the DuckDB
    twin is undefined. One batch-bounded aggregate; raises with the
    offending count so the caller fixes its embedding pipeline."""
    bad = (
        df.selectExpr(
            f"{id_col} as _rid", as_double_sql(vec_col) + " as _v"
        )
        .withColumn("_n", F.expr(norm_sql("_v")))
        .filter(F.col("_n") == 0.0)
        .limit(1_000_001)
        .count()
    )
    if bad:
        raise ValueError(
            f"{bad} zero-norm embedding(s) in {where}: cosine is "
            "undefined (NaN) for the zero vector, which breaks "
            "replay idempotence and oracle parity — drop or re-embed "
            "them before admission"
        )


def init_semdedup_index(
    embeddings: DataFrame,
    path: str,
    n_cells: int | None = None,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
) -> int:
    """Create the index from an initial corpus: freeze the Lloyd
    cells and store every init vector under its cell partition.
    Returns the resolved cell count (``n_cells=None`` → the
    :func:`semdedup.auto_n_cells` √n rule on the init corpus — the
    freeze point, so later batches never change it)."""
    _rail_nonzero_norms(embeddings, id_col, vec_col, "the init corpus")
    if n_cells is None:
        n_cells = auto_n_cells(embeddings.count())
    cents = ivf_refined_centroids(
        embeddings, id_col, vec_col, n_cells=n_cells, n_iter=n_iter,
        dims=dims,
    )
    cents.write.mode("overwrite").parquet(_cents_dir(path))
    # assign against the STORED table — the frozen on-disk truth is
    # what every later batch will read (parquet doubles are lossless,
    # so this is identity; the re-read just makes it structural)
    frozen = embeddings.sparkSession.read.parquet(_cents_dir(path))
    assign = ivf_assignments(
        embeddings, frozen, id_col, vec_col, n_probe=1
    ).select(id_col, "cell")
    (
        embeddings.select(id_col, vec_col)
        .join(assign, id_col)
        .select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"), "cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(_vecs_dir(path))
    )
    return n_cells


def semdedup_against_index(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    threshold_fx6: int = 400_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 1,
) -> DataFrame:
    """(vec_id, cell, n_neighbors, max_sim_fx6, admitted) per batch
    vector — the admission decision against the persisted index.
    ``n_neighbors`` counts verified index neighbors ≥ the threshold
    across the vector's ``n_probe`` nearest frozen cells;
    ``max_sim_fx6`` is the closest one (NULL when the probed cells
    hold no candidate at all); ``cell`` is always the HOME (rank-1)
    cell — the one an admitted vector appends under, regardless of
    ``n_probe``. The index scan is partition-pruned to the batch's
    probed cells (a ≤ n_cells-row collect — rails-bounded by
    construction, the same class as the centroid read).

    ``n_probe`` addresses the module-doc caveat (SemDeDup's
    cluster-then-compare misses cross-cell neighbors on cell
    borders): probing p cells multiplies candidate work by ~p while
    keeping it cell-bounded — decisions are monotonically MORE
    conservative (strictly more candidates can only reject more),
    and ``n_probe=1`` is exactly the paper's admission (the default;
    every certified hash is the p=1 decision set)."""
    if not 0 < threshold_fx6 <= FX:
        raise ValueError(
            f"threshold_fx6 must be in (0, 1e6], got {threshold_fx6}"
        )
    if n_probe < 1:
        raise ValueError(f"n_probe must be >= 1, got {n_probe}")
    _rail_nonzero_norms(batch, id_col, vec_col, "the admission batch")
    cents = spark.read.parquet(_cents_dir(path))
    # checkpoint the (batch-sized) assignment: it feeds the probed-
    # cell collect, the candidate join's batch side, AND the final
    # home join — without the cut the broadcast-argmax scoring of the
    # batch re-executes once per consumer (guide §5). LAZY: the cell
    # collect right below materializes the blocks, so the checkpoint
    # costs no extra scheduled job. keep_vec carries (v, nv) through
    # the assignment, so the candidate join's batch side reads them
    # HERE — the former `batch ⋈ probed` re-scanned and re-shuffled
    # the batch for vectors the assignment already held (guide §2.4;
    # nv is the identical norm expression, values bit-equal).
    assign = ivf_assignments(
        batch, cents, id_col, vec_col, n_probe=n_probe, keep_vec=True
    ).localCheckpoint(eager=False)
    if n_probe == 1:
        home = assign.select(F.col(id_col), "cell")
    else:
        home = assign.filter(F.col("cell_rank") == 1).select(
            F.col(id_col), "cell"
        )
    b = assign.select(F.col(id_col).alias("bid"), "cell", "v", "nv")
    cells = [r["cell"] for r in assign.select("cell").distinct().collect()]
    ix = (
        spark.read.parquet(_vecs_dir(path))
        .filter(F.col("cell").isin(cells))
        .selectExpr(
            "vec_id as iid",
            "cell",
            as_double_sql("embedding") + " as iv",
        )
        .withColumn("niv", F.expr(norm_sql("iv")))
    )
    sims = (
        b.join(ix, "cell")
        .select(
            "bid",
            F.round(
                F.expr(score_sql("v", "iv", "nv", "niv")) * FX
            )
            .cast("long")
            .alias("sim_fx6"),
        )
    )
    agg = sims.groupBy("bid").agg(
        F.sum(
            (F.col("sim_fx6") >= threshold_fx6).cast("long")
        ).alias("n_neighbors"),
        F.max("sim_fx6").alias("max_sim_fx6"),
    )
    return (
        home.select(F.col(id_col).alias("bid"), "cell")
        .join(agg, "bid", "left")
        .select(
            F.col("bid").alias(id_col),
            "cell",
            F.coalesce(F.col("n_neighbors"), F.lit(0))
            .cast("bigint")
            .alias("n_neighbors"),
            F.col("max_sim_fx6").cast("bigint").alias("max_sim_fx6"),
            (F.coalesce(F.col("n_neighbors"), F.lit(0)) == 0).alias(
                "admitted"
            ),
        )
        # no final orderBy: the decision table is a set (the driver
        # hash and every consumer are order-insensitive), and the sort
        # was a batch-sized range Exchange executed EAGERLY on every
        # admission via admit_semdedup_batch's localCheckpoint — a
        # determinism-only sort, removed per guide §2.4
    )


def append_to_semdedup_index(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    decisions: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Append the ADMITTED subset of ``batch`` (per ``decisions``
    from :func:`semdedup_against_index`) under its cell partitions;
    returns the number of appended vectors. New files only, touched
    cells only."""
    admitted = decisions.filter(F.col("admitted")).select(
        F.col(id_col), "cell"
    )
    rows = (
        batch.select(id_col, vec_col)
        .join(admitted, id_col)
        .select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
            "cell",
        )
    )
    # count the DECISION table (one row per distinct batch id, and
    # localCheckpoint-materialized by admit_semdedup_batch), not the
    # batch⋈admitted join — the former guard executed the batch scan
    # + join once for the count and AGAIN for the write (guide §2.4)
    n = admitted.count()
    if n:
        rows.write.mode("append").partitionBy("cell").parquet(
            _vecs_dir(path)
        )
    return n


def admit_semdedup_batch(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    threshold_fx6: int = 400_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 1,
) -> DataFrame:
    """Decide + append in one call; returns the decision table (the
    appended rows are exactly its ``admitted`` subset — under their
    HOME cells, whatever ``n_probe`` probed). The decision table is
    computed BEFORE the append (localCheckpoint; lazy — the append's
    admitted-count action materializes it ahead of any index write)
    so the returned frame can never see its own batch in the index."""
    decisions = semdedup_against_index(
        spark, path, batch, threshold_fx6, id_col, vec_col, n_probe
    ).localCheckpoint(eager=False)
    append_to_semdedup_index(
        spark, path, batch, decisions, id_col, vec_col
    )
    return decisions


def compact_semdedup_index(
    spark: SparkSession, path: str, n_partitions: int = 1
) -> tuple[int, int]:
    """Rewrite the vector index compacted; returns (files_before,
    files_after). Every admission appends at least one file under
    each touched cell, so a long-running stream accumulates slivers
    that every later candidate scan re-opens; compaction is the
    periodic rewrite — IDENTICAL layout and content (same
    partitioning, same rows, so admission decisions cannot change —
    test-pinned). ``n_partitions`` is the shuffle-partition count of
    the rewrite: ``repartition(n, "cell")`` hash-partitions whole
    cells across n tasks, so each cell still lands in exactly ONE
    task and ``partitionBy("cell")`` writes one file per cell
    regardless — the knob bounds rewrite parallelism/memory, not
    files per cell.

    SINGLE-WRITER, NO CONCURRENT ADMISSION — the shared
    :mod:`._compaction` contract (exclusive lock file, listing-verify
    swap abort on a concurrent append, two-rename swap with a
    briefly-missing-dir instant); schedule compaction when no
    admission or candidate scan is in flight."""
    from ._compaction import compact_swap

    vecs = _vecs_dir(path)

    def stage(staged: str) -> None:
        (
            spark.read.parquet(vecs)
            .repartition(n_partitions, "cell")
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(staged)
        )

    return compact_swap(vecs, stage, "semdedup index")


def semdedup_admission_sql(
    batch_table: str,
    index_table: str,
    cents_src_table: str = "embeddings",
    threshold_fx6: int = 400_000,
    n_cells: int | None = None,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    n_probe: int = 1,
) -> str:
    """DuckDB twin of :func:`semdedup_against_index` — re-derives the
    FROZEN centroids from ``cents_src_table`` (the init corpus; the
    shared ``ivf_refine_ctes_sql`` chain), assigns batch AND index
    sides by the same rounded-cosine argmax (the batch side probes
    its ``n_probe`` nearest cells; home = rank 1), and replays the
    fx6 verify. Chain multi-batch sequences by materializing each
    step's admitted rows into the next call's ``index_table``.
    ``n_cells=None`` derives the √n count from the init corpus
    in-query (``AUTO_N_CELLS_SQL`` — same freeze rule as init)."""
    if not 0 < threshold_fx6 <= FX:
        raise ValueError(
            f"threshold_fx6 must be in (0, 1e6], got {threshold_fx6}"
        )
    if n_probe < 1:
        raise ValueError(f"n_probe must be >= 1, got {n_probe}")
    if n_cells is None:
        n_cells = AUTO_N_CELLS_SQL
    cos_assign = DUCK_COS.format(a="e.v", b="c.cv")
    cos_b = DUCK_COS.format(a="bx.v", b="c.cv")
    cos_i = DUCK_COS.format(a="ix.v", b="c.cv")
    cos_pair = DUCK_COS.format(a="bp.v", b="ia.v")
    return (
        f"WITH e AS (SELECT {id_col} AS vec_id,"
        f" CAST({vec_col} AS DOUBLE[]) AS v FROM {cents_src_table}),"
        + ivf_refine_ctes_sql(n_iter, n_cells, dims)
        + f", cents AS (SELECT * FROM cents{n_iter}),"
        f" bx AS (SELECT {id_col} AS bid,"
        f"  CAST({vec_col} AS DOUBLE[]) AS v FROM {batch_table}),"
        f" ix AS (SELECT {id_col} AS iid,"
        f"  CAST({vec_col} AS DOUBLE[]) AS v FROM {index_table}),"
        " br AS (SELECT bx.bid, c.cell, bx.v,"
        f"  row_number() OVER (PARTITION BY bx.bid ORDER BY {cos_b}"
        "   DESC, c.cell) AS r FROM bx CROSS JOIN cents c),"
        f" bp AS (SELECT bid, cell, v FROM br WHERE r <= {int(n_probe)}),"
        " ba AS (SELECT bid, cell, v FROM br WHERE r = 1),"
        " ia AS (SELECT iid, cell, v FROM ("
        "   SELECT ix.iid, c.cell, ix.v,"
        f"   row_number() OVER (PARTITION BY ix.iid ORDER BY {cos_i}"
        "    DESC, c.cell) AS r FROM ix CROSS JOIN cents c)"
        "  WHERE r = 1),"
        " sims AS (SELECT bp.bid,"
        f"  CAST(round({cos_pair} * {FX}) AS BIGINT) AS sim_fx6"
        "  FROM bp JOIN ia ON ia.cell = bp.cell),"
        " agg AS (SELECT bid,"
        f"  CAST(sum(CASE WHEN sim_fx6 >= {int(threshold_fx6)}"
        "   THEN 1 ELSE 0 END) AS BIGINT) AS n_neighbors,"
        "  max(sim_fx6) AS max_sim_fx6"
        "  FROM sims GROUP BY bid)"
        f" SELECT ba.bid AS {id_col}, ba.cell,"
        "  COALESCE(agg.n_neighbors, 0) AS n_neighbors,"
        "  CAST(agg.max_sim_fx6 AS BIGINT) AS max_sim_fx6,"
        "  COALESCE(agg.n_neighbors, 0) = 0 AS admitted"
        " FROM ba LEFT JOIN agg ON agg.bid = ba.bid"
        f" ORDER BY {id_col}"
    )
