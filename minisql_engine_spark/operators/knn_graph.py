"""Blocked kNN-graph construction over an embedding column.

The missing substrate under half the semantic family: SemDeDup
compares within cells, splits need a leakage graph, and graph-based
curation (NN-descent-style corpus maps, diversity sampling, label
propagation) all start from "every vector's k nearest neighbors".
This operator builds that graph the only way that survives 100 TB —
IVF-cell blocking, never all-pairs:

  1. ``ivf_refined_centroids`` — deterministic Lloyd-refined k-means
     (decimal-exact means, oracle-replayable; the same index
     SemDeDup and IVF-Flat search already use).
  2. ``ivf_assignments`` — every vector gets ONE home cell
     (n_probe=1, the sort-free packed-long argmax) AND ``n_probe``
     probe cells (the query-side expansion).
  3. Candidate edges = probe-assignment ⋈ home-assignment on cell:
     each vector meets the members of its ``n_probe`` nearest cells
     only — fan-out is n_probe · (n / n_cells), never n².
  4. Exact rounded cosine on candidates, ``row_number`` per source
     ordered (sim DESC, neighbor id) — deterministic tie-break —
     keep rank ≤ k.

Output: (src_id, nbr_id, sim, rank) — a directed kNN graph. Like any
IVF search, recall < 1 when a true neighbor lives outside the probed
cells; raise ``n_probe`` (or ``n_cells`` quality via ``n_iter``) to
trade compute for recall. A source whose probed cells hold fewer
than k other vectors emits fewer than k edges (documented, matches
the oracle).

Scale notes: the corpus-sized shuffles are the two assignment
aggregates and the cell equi-join (bounded fan-out); the per-source
top-k window sorts n_probe·n/n_cells candidate rows per key, never a
global sort. n_cells scales with the corpus (≈ √n keeps both the
cell-join fan-out and the window bounded); centroids stay broadcast.

Float policy: cosine similarity is the certified irrational-class
``round(·, 6)`` edge (quotients over sqrt norms — ``score_sql`` /
``DUCK_COS``, same as every ANN row); assignments replay exactly via
the shared refine chain. (Reference scope note: ``sqlengine.py``
1-753 has no vector surface; extension, SURVEY §2.4 ANN family.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from minisql_engine_spark.operators.similarity import (
    DUCK_COS,
    N_CELLS,
    as_double_sql,
    ivf_assignments,
    ivf_refine_ctes_sql,
    ivf_refined_centroids,
    norm_sql,
    score_sql,
    _CENT_CACHE,
)

_KNN_CACHE: list[DataFrame] = []

#: persisted corpus-sized assignment tables kept alive across calls.
#: These must NOT ride in similarity._CENT_CACHE (documented for
#: tiny centroid tables — ADVICE r10): repeated knn_graph calls
#: would accumulate unbounded corpus-scale persisted storage. Each
#: call evicts beyond this cap; eviction degrades an older
#: still-held graph to recompute (assignments are deterministic), so
#: the cap bounds storage without a correctness risk.
_KNN_CACHE_MAX = 2


def clear_knn_cache() -> None:
    """Release persisted assignment tables from prior calls."""
    while _KNN_CACHE:
        try:
            _KNN_CACHE.pop().unpersist()
        except Exception:
            pass


def _same_plan(a: DataFrame, b: DataFrame) -> bool:
    """Whether two DataFrames denote the same analyzed plan (Spark's
    ``sameResult`` — the predicate its CacheManager uses for cache
    hits)."""
    try:
        return bool(
            a._jdf.queryExecution()
            .analyzed()
            .sameResult(b._jdf.queryExecution().analyzed())
        )
    except Exception:
        return False


def _knn_cache_push(df: DataFrame) -> None:
    """Track a persisted assignment table, DEDUPED by logical plan.

    Spark's cache is keyed by plan, not by DataFrame object: two
    calls with identical inputs persist into ONE shared cache entry,
    and unpersisting either instance drops it for both. Without the
    dedupe, the warm→timed call pattern pushes same-plan duplicates
    until the cap evicts one — silently nuking the entry the live
    call was reusing (measured as knn_graph_refine's run-over-run
    4.2 s → 6.5 s decay). Same-plan pushes are no-ops; eviction
    therefore only ever unpersists genuinely distinct plans."""
    if any(_same_plan(df, held) for held in _KNN_CACHE):
        return
    _KNN_CACHE.append(df)
    while len(_KNN_CACHE) > _KNN_CACHE_MAX:
        try:
            _KNN_CACHE.pop(0).unpersist()
        except Exception:
            pass


def knn_graph(
    embeddings: DataFrame,
    k: int = 5,
    n_cells: int = N_CELLS,
    n_iter: int = 2,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
) -> DataFrame:
    """(src_id, nbr_id, sim, rank) — each vector's k nearest
    neighbors by rounded cosine among the members of its ``n_probe``
    nearest IVF cells."""
    if k < 1 or n_probe < 1:
        raise ValueError(f"need k >= 1 and n_probe >= 1, got {k}, {n_probe}")
    cents = ivf_refined_centroids(
        embeddings, id_col, vec_col, n_cells=n_cells, n_iter=n_iter,
        dims=dims,
    ).persist()
    # two assignment branches (home + probe) consume the centroid
    # table; without the persist each re-runs the Lloyd chain.
    # Released via similarity.clear_centroid_cache().
    _CENT_CACHE.append(cents)

    # ONE assignment pass serves both sides: the probe ranks already
    # contain the home cell (cell_rank = 1 is the same argmax with
    # the same (sim DESC, cell) tie-break the packed n_probe=1 path
    # certifies) — a separate home pass would re-score the whole
    # corpus against the centroids. Persisted: two consumers below.
    assign = ivf_assignments(
        embeddings, cents, id_col, vec_col, n_probe=n_probe
    ).persist()
    _knn_cache_push(assign)
    home = assign.filter(F.col("cell_rank") == 1).select(
        F.col(id_col).alias("nbr_id"), "cell"
    )
    probe = assign.select(F.col(id_col).alias("src_id"), "cell")
    # one home cell per neighbor and n_probe DISTINCT probe cells per
    # source → each (src, nbr) candidate appears at most once; no
    # dedup pass needed
    cand = probe.join(home, "cell").filter(
        F.col("src_id") != F.col("nbr_id")
    )

    vecs = embeddings.selectExpr(
        id_col, as_double_sql(vec_col) + " as v"
    ).withColumn("nv", F.expr(norm_sql("v")))
    sv = (
        vecs.withColumnRenamed(id_col, "src_id")
        .withColumnRenamed("v", "sv")
        .withColumnRenamed("nv", "sn")
    )
    nv = (
        vecs.withColumnRenamed(id_col, "nbr_id")
        .withColumnRenamed("v", "cv")
        .withColumnRenamed("nv", "cn")
    )
    scored = (
        cand.join(sv, "src_id")
        .join(nv, "nbr_id")
        .select(
            "src_id",
            "nbr_id",
            F.expr(score_sql("sv", "cv", "sn", "cn")).alias("sim"),
        )
    )
    w = Window.partitionBy("src_id").orderBy(
        F.col("sim").desc(), F.col("nbr_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("src_id", "nbr_id", "sim", "rank")
    )


def _knn_ctes_sql(
    k: int,
    n_cells: int,
    n_iter: int,
    n_probe: int,
    table: str,
    id_col: str,
    vec_col: str,
    dims: int,
) -> str:
    """CTE chain ending in ``g0(src_id, nbr_id, sim, rank)`` — the
    base cell-blocked graph. Shared by :func:`knn_graph_sql` and
    :func:`knn_graph_refine_sql` so both oracles replay the IDENTICAL
    construction."""
    cos_assign = DUCK_COS.format(a="e.v", b="c.cv")
    cos_pair = DUCK_COS.format(a="ea.v", b="eb.v")
    return (
        f"WITH e AS (SELECT {id_col} AS vec_id,"
        f" CAST({vec_col} AS DOUBLE[]) AS v FROM {table}),"
        + ivf_refine_ctes_sql(n_iter, n_cells, dims)
        + f", cents AS (SELECT * FROM cents{n_iter}),"
        " asg AS (SELECT e.vec_id, c.cell,"
        f" {cos_assign} AS sim, row_number() OVER ("
        "  PARTITION BY e.vec_id ORDER BY"
        f" {cos_assign} DESC, c.cell) AS r"
        " FROM e CROSS JOIN cents c),"
        " home AS (SELECT vec_id AS nbr_id, cell FROM asg WHERE r = 1),"
        f" probe AS (SELECT vec_id AS src_id, cell FROM asg"
        f"  WHERE r <= {n_probe}),"
        " cand AS (SELECT p.src_id, h.nbr_id, p.cell"
        "  FROM probe p JOIN home h USING (cell)"
        "  WHERE p.src_id <> h.nbr_id),"
        " sc AS (SELECT c.src_id, c.nbr_id,"
        f"  {cos_pair} AS sim"
        "  FROM cand c JOIN e ea ON ea.vec_id = c.src_id"
        "  JOIN e eb ON eb.vec_id = c.nbr_id),"
        " g0 AS (SELECT src_id, nbr_id, sim, rank FROM ("
        "  SELECT src_id, nbr_id, sim, row_number() OVER ("
        "   PARTITION BY src_id ORDER BY sim DESC, nbr_id) AS rank"
        f"  FROM sc) WHERE rank <= {k})"
    )


def knn_graph_sql(
    k: int = 5,
    n_cells: int = N_CELLS,
    n_iter: int = 2,
    n_probe: int = 2,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
) -> str:
    """DuckDB oracle twin of :func:`knn_graph` — replays the Lloyd
    refinement (shared :func:`ivf_refine_ctes_sql` chain), both
    assignment ranks, the cell-blocked candidate join, and the
    per-source rounded-cosine top-k, term for term."""
    return (
        _knn_ctes_sql(
            k, n_cells, n_iter, n_probe, table, id_col, vec_col, dims
        )
        + " SELECT src_id, nbr_id, sim, CAST(rank AS INT) AS rank"
        " FROM g0"
    )


def knn_graph_refine(
    embeddings: DataFrame,
    graph: DataFrame,
    k: int = 5,
    n_rounds: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """NN-descent refinement of a kNN graph (Dong, Moses & Li 2011,
    "Efficient k-nearest neighbor graph construction for generic
    similarity measures"): each round expands every source's
    candidate set with its NEIGHBORS' NEIGHBORS (a true neighbor of
    my neighbor is likely my neighbor — the paper's local-closure
    observation), scores the expansion exactly, and keeps the new
    top-k. Recovers recall an IVF-blocked base graph loses at cell
    boundaries WITHOUT raising n_probe: the per-round candidate set
    is ≤ k² per source (edge joins on the k-regular graph), never
    corpus-quadratic, and the whole round is joins + one per-source
    top-k window — deterministic and oracle-replayable (no sampling,
    unlike the paper's randomized variant).

    ``graph`` is a (src_id, nbr_id, …) edge set, normally
    :func:`knn_graph`'s output. Returns the same
    (src_id, nbr_id, sim, rank) shape. Rounds compose: recall is
    non-decreasing per round (the old edges stay in the candidate
    set) and converges once the graph closes over itself.

    The expansion walks the UNDIRECTED neighborhood (the graph is
    symmetrized before the self-join — the paper's general-neighbor
    rule): directed-only closure barely moves recall because a
    directed kNN edge set is nearly closed under composition.
    Corollary: an n_probe=1 base graph cannot be improved at all —
    its edges never leave the home cell, and cells are equivalence
    classes under any closure. Measured at sf0.01 (n_probe=2 base):
    recall@5 0.381 → 0.497 (1 round) → 0.554 (2 rounds)."""
    if n_rounds < 1:
        raise ValueError(f"n_rounds must be >= 1, got {n_rounds}")
    vecs = embeddings.selectExpr(
        id_col, as_double_sql(vec_col) + " as v"
    ).withColumn("nv", F.expr(norm_sql("v")))
    sv = (
        vecs.withColumnRenamed(id_col, "src_id")
        .withColumnRenamed("v", "sv")
        .withColumnRenamed("nv", "sn")
    )
    nv = (
        vecs.withColumnRenamed(id_col, "nbr_id")
        .withColumnRenamed("v", "cv")
        .withColumnRenamed("nv", "cn")
    )
    w = Window.partitionBy("src_id").orderBy(
        F.col("sim").desc(), F.col("nbr_id")
    )
    # the edge set appears 5× per round (g ∪ gᵀ self-joined, then
    # unioned with g again) — without truncating lineage the FULL
    # base-graph construction (Lloyd chain + assignment + scoring)
    # re-executes once per appearance (measured 9.3 s vs 2-ish at
    # sf0.1). Edges are k-regular: n·k rows, trivially
    # checkpointable; LAZY — the first action (the final consumer)
    # materializes each round's blocks in sequence, so the base still
    # runs exactly once but no per-round materialization job is
    # scheduled (guide §2.4: fewer actions).
    g = graph.select("src_id", "nbr_id").localCheckpoint(eager=False)
    for _ in range(n_rounds):
        gu = g.unionByName(
            g.select(
                F.col("nbr_id").alias("src_id"),
                F.col("src_id").alias("nbr_id"),
            )
        ).distinct()
        hop = (
            gu.alias("a")
            .join(
                gu.select(
                    F.col("src_id").alias("nbr_id"),
                    F.col("nbr_id").alias("nbr2_id"),
                ).alias("b"),
                "nbr_id",
            )
            .select("src_id", F.col("nbr2_id").alias("nbr_id"))
            .filter(F.col("src_id") != F.col("nbr_id"))
        )
        cand = g.unionByName(hop).distinct()
        scored = (
            cand.join(sv, "src_id")
            .join(nv, "nbr_id")
            .select(
                "src_id",
                "nbr_id",
                F.expr(score_sql("sv", "cv", "sn", "cn")).alias("sim"),
            )
        )
        ranked = (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            # same lineage rule per round: the next round fans this
            # edge set out 5×, and the final return re-reads it once
            .localCheckpoint(eager=False)
        )
        g = ranked.select("src_id", "nbr_id")
    return ranked.select("src_id", "nbr_id", "sim", "rank")


def knn_graph_refine_sql(
    k: int = 5,
    n_rounds: int = 1,
    n_cells: int = N_CELLS,
    n_iter: int = 2,
    n_probe: int = 2,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
) -> str:
    """DuckDB oracle twin of ``knn_graph_refine(knn_graph(…))`` —
    the base-graph CTE chain plus one (expand ∪ keep → score →
    top-k) block per round."""
    cos_pair = DUCK_COS.format(a="ea.v", b="eb.v")
    ctes = [
        _knn_ctes_sql(
            k, n_cells, n_iter, n_probe, table, id_col, vec_col, dims
        )
    ]
    for r in range(1, n_rounds + 1):
        prev = f"g{r - 1}"
        ctes.append(
            f", gu{r} AS ("
            f"  SELECT src_id, nbr_id FROM {prev}"
            "  UNION"
            f"  SELECT nbr_id, src_id FROM {prev}),"
            f" cand{r} AS ("
            f"  SELECT src_id, nbr_id FROM {prev}"
            "  UNION"
            f"  SELECT a.src_id, b.nbr_id FROM gu{r} a"
            f"   JOIN gu{r} b ON b.src_id = a.nbr_id"
            "   WHERE a.src_id <> b.nbr_id),"
            f" sc{r} AS (SELECT c.src_id, c.nbr_id, {cos_pair} AS sim"
            f"  FROM cand{r} c JOIN e ea ON ea.vec_id = c.src_id"
            "  JOIN e eb ON eb.vec_id = c.nbr_id),"
            f" g{r} AS (SELECT src_id, nbr_id, sim, rank FROM ("
            "  SELECT src_id, nbr_id, sim, row_number() OVER ("
            "   PARTITION BY src_id ORDER BY sim DESC, nbr_id) AS rank"
            f"  FROM sc{r}) WHERE rank <= {k})"
        )
    return (
        "".join(ctes)
        + " SELECT src_id, nbr_id, sim, CAST(rank AS INT) AS rank"
        f" FROM g{n_rounds}"
    )
