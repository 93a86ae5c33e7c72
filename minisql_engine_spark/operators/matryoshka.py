"""Matryoshka prefix-dimension recall — how many dims do you need?

Matryoshka representation learning (Kusupati et al. 2022, public
preprint) trains embeddings whose PREFIXES are themselves usable
embeddings, so a pipeline can store/scan 8 or 16 of 64 dimensions
and pay proportionally less memory bandwidth — IF the recall holds.
This operator measures exactly that on the corpus at hand: for each
prefix length d, the exact cosine top-k under the first d components
is compared against the full-dimension top-k (the ground truth), per
query. It is the due-diligence audit run before adopting truncated
embeddings, and the prefix-dim spectrum complements the engine's
quantization spectrum (SQ8/PQ compress per-component precision;
matryoshka drops components).

Everything is exact and oracle-replayable: the rounded-cosine pair
formula is the package's proven `score_sql`/`DUCK_COS` twin applied
to SLICED vectors, ranking ties break (sim DESC, nbr), and recall is
an integer ratio in fx6.

Scale shape: queries broadcast against the corpus ONCE — the pair
relation materializes a sim per prefix length in the same pass
(slicing re-reads the same row bytes, no extra scan), then one
window per (dims, query) group and a self-equi-join on the
ground-truth top-k. Brute force by design: this is the AUDIT (run on
a sample of queries), not the serving path — serving stays on the
IVF/PQ/SQ8 rows.

Audit budget: ``query_mod`` alone keeps the query count PROPORTIONAL
to the corpus (pair count ~ n²/query_mod — quadratic at scale), so
``n_queries`` bounds it ABSOLUTELY: the n_queries ids with the
smallest deterministic decision hash (``sampling.sample_hash``, ties
by id) are audited, making the whole audit O(n·n_queries) at any
corpus size. The pick is a distributed top-k
(TakeOrderedAndProject — per-partition heads merged on the driver,
no global sort shuffle) and replays exactly in the oracle's
ORDER BY hash, id LIMIT n.

Reference scope: ``sqlengine.py:1-753`` has no vector surface;
extension, SURVEY §2.4 similarity-search family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .sampling import sample_hash, sample_hash_sql
from .similarity import DUCK_COS, as_double_sql

FX = 10**6
#: decision-hash seed for the n_queries audit pick — fixed and
#: versioned with the operator (changing it changes the sample)
MRL_SEED = "mrl-audit"


def _dot(x: str, y: str) -> str:
    return (
        f"aggregate(zip_with({x}, {y}, (x, y) -> x * y),"
        " 0.0d, (acc, x) -> acc + x)"
    )


def _prefix_norm(col: str, d: int) -> str:
    """sqrt(Σ v_i² over the d-prefix) — the per-VECTOR factor of
    :func:`_sliced_cos`, lifted out so it is computed once per row
    below the pair join instead of once per scored pair (the
    ``similarity.cosine_pre`` rule: same expressions, same operation
    order, so every rounded sim is bit-identical — this removes 2 of
    the 3 d-element folds from the n_queries × corpus hot multiply,
    guide §1.2 step 2)."""
    s = f"slice({col}, 1, {d})"
    return f"sqrt({_dot(s, s)})"


def _sliced_cos(d: int, nq: str, nc: str) -> str:
    """round(cos, 6) over the d-prefix from pre-materialized norms
    ``nq``/``nc`` (columns built with :func:`_prefix_norm`)."""
    return (
        f"round({_dot(f'slice(qv, 1, {d})', f'slice(cv, 1, {d})')}"
        f" / ({nq} * {nc}), 6)"
    )


def matryoshka_recall(
    embeddings: DataFrame,
    dims_list: tuple[int, ...] = (8, 16, 32),
    k: int = 10,
    query_mod: int = 50,
    full_dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int | None = None,
) -> DataFrame:
    """(vec_id, dims, n_hits, recall_fx6) per query and prefix
    length; the ``full_dims`` row rides along as the trivially-1.0
    sanity anchor. Queries are the deterministic
    ``vec_id % query_mod == 0`` sample, absolutely bounded to the
    ``n_queries`` smallest decision hashes when set (see module doc);
    self-matches excluded."""
    dims = tuple(sorted(set(dims_list)))
    if not dims or dims[-1] >= full_dims or dims[0] < 1:
        raise ValueError(
            f"dims_list must be within [1, {full_dims}), got {dims}"
        )
    if k < 1 or query_mod < 1:
        raise ValueError(f"need k >= 1, query_mod >= 1, got {k}, {query_mod}")
    if n_queries is not None and n_queries < 1:
        raise ValueError(f"n_queries must be >= 1, got {n_queries}")
    vecs = embeddings.selectExpr(
        id_col, as_double_sql(vec_col) + " as v"
    )
    q = vecs.filter(F.col(id_col) % query_mod == 0).select(
        F.col(id_col).alias("qid"), F.col("v").alias("qv")
    )
    if n_queries is not None:
        q = q.orderBy(
            sample_hash(F.col("qid"), MRL_SEED), F.col("qid")
        ).limit(n_queries)
    all_d = [*dims, full_dims]
    # prefix norms once per vector on BOTH sides of the pair join
    # (2 of the 3 folds leave the hot n_queries × corpus multiply)
    q = q.select(
        "qid",
        "qv",
        *[
            F.expr(_prefix_norm("qv", d)).alias(f"nq{d}")
            for d in all_d
        ],
    )
    c = vecs.select(
        F.col(id_col).alias("nbr"),
        F.col("v").alias("cv"),
        *[
            F.expr(_prefix_norm("v", d)).alias(f"nc{d}")
            for d in all_d
        ],
    )
    pairs = q.crossJoin(c).filter(F.col("qid") != F.col("nbr"))
    stacked = pairs.select(
        "qid",
        "nbr",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("dims"),
                        F.expr(
                            _sliced_cos(d, f"nq{d}", f"nc{d}")
                        ).alias("sim"),
                    )
                    for d in all_d
                ]
            )
        ).alias("e"),
    ).select("qid", "nbr", "e.dims", "e.sim")
    w = Window.partitionBy("dims", "qid").orderBy(
        F.col("sim").desc(), F.col("nbr")
    )
    # topk feeds THREE consumers (truth, hits, the distinct roster).
    # ReusedExchange already shares the window's input shuffle across
    # the branches, but the post-shuffle sort+window+filter re-runs
    # once per consumer — materializing the ≤ n_queries·|dims|·k-row
    # result caps that at one execution (guide §5 lineage rule, same
    # as clustering.py / doremi.py; measured ≈ equal at sf0.1, the
    # win is the avoided n·n_queries-row window re-sorts at scale)
    topk = (
        stacked.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k)
        .select("qid", "nbr", "dims")
        .localCheckpoint(eager=False)
    )
    truth = topk.filter(F.col("dims") == full_dims).select(
        "qid", "nbr"
    )
    hits = (
        topk.join(truth, ["qid", "nbr"], "left_semi")
        .groupBy("qid", "dims")
        .agg(F.count("*").cast("bigint").alias("n_hits"))
    )
    return (
        topk.select("qid", "dims")
        .distinct()
        .join(hits, ["qid", "dims"], "left")
        .select(
            F.col("qid").alias(id_col),
            "dims",
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            F.expr(
                f"COALESCE(n_hits, 0) * {FX}L DIV {k}L"
            ).alias("recall_fx6"),
        )
        .orderBy(id_col, "dims")
    )


def matryoshka_recall_sql(
    dims_list: tuple[int, ...] = (8, 16, 32),
    k: int = 10,
    query_mod: int = 50,
    full_dims: int = 64,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int | None = None,
) -> str:
    """DuckDB oracle twin of :func:`matryoshka_recall` — per-prefix
    sliced cosines via the shared DUCK_COS formula, the same (sim
    DESC, nbr) top-k, the same hash-order ``n_queries`` pick, and
    the integer recall edge."""
    dims = tuple(sorted(set(dims_list)))
    if not dims or dims[-1] >= full_dims or dims[0] < 1:
        raise ValueError(
            f"dims_list must be within [1, {full_dims}), got {dims}"
        )
    if k < 1 or query_mod < 1:
        raise ValueError(f"need k >= 1, query_mod >= 1, got {k}, {query_mod}")
    if n_queries is not None and n_queries < 1:
        raise ValueError(f"n_queries must be >= 1, got {n_queries}")
    budget = (
        f" ORDER BY {sample_hash_sql(id_col, MRL_SEED)}, {id_col}"
        f" LIMIT {n_queries}"
        if n_queries is not None
        else ""
    )
    all_d = [*dims, full_dims]
    per_d = " UNION ALL ".join(
        f"SELECT q.{id_col} AS qid, c.{id_col} AS nbr,"
        f" {d} AS dims,"
        " "
        + DUCK_COS.format(a=f"q.v[1:{d}]", b=f"c.v[1:{d}]")
        + " AS sim"
        " FROM qs q JOIN e c ON"
        f" q.{id_col} <> c.{id_col}"
        for d in all_d
    )
    return (
        f"WITH e AS (SELECT {id_col},"
        f" CAST({vec_col} AS DOUBLE[]) AS v,"
        f" {id_col} % {query_mod} = 0 AS qid_flag FROM {table}),"
        f" qs AS (SELECT {id_col}, v FROM e WHERE qid_flag{budget}),"
        f" st AS ({per_d}),"
        " tk AS (SELECT qid, nbr, dims FROM ("
        "  SELECT qid, nbr, dims, row_number() OVER ("
        "   PARTITION BY dims, qid ORDER BY sim DESC, nbr) AS r"
        f"  FROM st) WHERE r <= {k}),"
        f" gt AS (SELECT qid, nbr FROM tk WHERE dims = {full_dims}),"
        " ht AS (SELECT tk.qid, tk.dims,"
        "  CAST(count(*) AS BIGINT) AS n_hits"
        "  FROM tk JOIN gt ON gt.qid = tk.qid AND gt.nbr = tk.nbr"
        "  GROUP BY tk.qid, tk.dims),"
        " allq AS (SELECT DISTINCT qid, dims FROM tk)"
        f" SELECT allq.qid AS {id_col}, allq.dims,"
        "  COALESCE(ht.n_hits, 0) AS n_hits,"
        f"  COALESCE(ht.n_hits, 0) * {FX} // {k} AS recall_fx6"
        " FROM allq LEFT JOIN ht"
        "  ON ht.qid = allq.qid AND ht.dims = allq.dims"
        " ORDER BY allq.qid, allq.dims"
    )
