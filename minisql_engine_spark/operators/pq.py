"""Product-Quantization ANN (PQ-ADC) over embedding columns.

PQ (Jégou, Douze, Schmid — "Product Quantization for Nearest
Neighbor Search", TPAMI 2011) is the memory-side ANN technique the
IVF/LSH paths don't cover: split each D-dim vector into M contiguous
sub-vectors, k-means each subspace into K codes, and store each
vector as M small integers. A 64-dim float vector (256 B) becomes
16 codes (16 B) — the compression that actually lets a 100 TB
corpus' index fit in cluster memory. Queries never decompress: a
per-query M×K table of subspace distances is broadcast, and each
corpus vector's approximate distance is M table lookups summed
(Asymmetric Distance Computation).

Everything here is deterministic and SQL-replayable — the same
discipline as the IVF path (operators/similarity.py):

* seeding: the K lowest-id vectors' m-th sub-vectors are subspace
  m's initial codebook (code = id-rank), trivially replayable;
* training sample: codebooks are k-means'd over a deterministic
  md5-hash sample of the corpus (``train_sample_rate`` — the
  ``operators/sampling`` decision-hash idiom). Training on a sample
  is how PQ is actually deployed (no one Lloyds 100 TB to fit 512
  centroids); the sample is a pure row filter, so the oracle
  replays the same subset byte-for-byte. Encoding always covers the
  FULL corpus;
* Lloyd refinement: assignment = argmin of ROUNDED (6 dp) squared
  L2, ties to the lower code; the centroid update sums components
  as DECIMAL(38,12) — exact and order-independent across any
  shuffle/partitioning — then divides in double and rounds to 6;
* ADC: per-(query, m, code) distances rounded to 6, summed as
  DECIMAL(18,6) (exact over the M terms), ranked (distance asc,
  neighbor_id asc).

So unlike typical ANN systems, the ENTIRE index — seeding, subspace
k-means iterations, encoding, and the ADC ranking — is replayed by
the DuckDB oracle and hash-compared, not spot-checked.

Hot-path shape: sub-vectors live as ``sub_dim`` SCALAR double
columns, not arrays — the scoring distance is plain codegen
arithmetic (``round(nsv − 2·(s1·c1 + …) + ncv, 6)``) with the self
dot-products hoisted below the join, so the corpus × codebook
scoring rows never allocate an array or run an interpreted
higher-order fold. Argmin is the packed-long ``min_by`` hash
aggregate (no sort — the ``ivf_assignments`` trick). Codebooks are
M·K rows, always broadcast; nothing shuffles corpus × queries, and
nothing collects the corpus.

Reference scope: the reference engine (sqlengine.py:1-753) has no
vector operators; this is the §2.4 similarity-search scale path #4
(brute force / IVF / SRP-LSH / PQ).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .sampling import rate_threshold, sample_hash
from .similarity import as_double_sql, dot_sql

M_SUB = 8  # subspaces
K_CODES = 16  # codes per subspace
DIMS = 64  # embedding dimensionality
N_ITER = 2  # Lloyd steps per subspace
TRAIN_SEED = "pqtrain"


def l2_sql(a: str, b: str) -> str:
    """Rounded squared-L2 via three dot products — the identity
    |a−b|² = a·a − 2·a·b + b·b keeps both engines on dot-product
    primitives (Spark: zip_with/aggregate fold; DuckDB:
    list_dot_product), with round(·, 6) absorbing fold-order noise
    exactly like the cosine paths. Used on full-dimension vectors in
    the re-rank stage; the subspace hot path uses the scalar-column
    form below."""
    return (
        f"floor(({dot_sql(a, a)} - 2 * {dot_sql(a, b)}"
        f" + {dot_sql(b, b)}) * 1e6 + 0.5) / 1e6"
    )


_DUCK_L2 = (
    "floor((list_dot_product({a}, {a})"
    " - 2 * list_dot_product({a}, {b})"
    " + list_dot_product({b}, {b})) * 1e6 + 0.5) / 1e6"
)


def _s_cols(sub_dim: int, pre: str) -> list[str]:
    return [f"{pre}{d}" for d in range(1, sub_dim + 1)]


def _pair_dist_sql(sub_dim: int) -> str:
    """Scalar-column pair distance: value-identical to :func:`l2_sql`
    modulo the round-6 absorber (same ((nsv − 2d) + ncv)
    association), but pure codegen arithmetic — no arrays, no
    interpreted fold.

    Unguarded floor is safe here (unlike the generic
    ``portable_round.fx6`` surfaces): squared-L2 over unit-scale
    embedding subvectors is bounded ≪ 1e12, far from BIGINT
    saturation, and the identical string runs in both engines."""
    cross = " + ".join(f"s{d} * c{d}" for d in range(1, sub_dim + 1))
    return f"floor((nsv - 2 * ({cross}) + ncv) * 1e6 + 0.5) / 1e6"


#: code-id bit width of the packed argmin ordering (codes < 2^20,
#: far above any real K)
_CODE_BITS = 20


def _packed_argmin() -> "F.Column":
    """Argmin ordering as ONE long (hash agg, no sort): rounded
    d·1e6 in the high bits, the code id in the low ``_CODE_BITS`` —
    ``min_by(code, packed)`` ≡ ``ORDER BY d, code LIMIT 1``. The
    packing is exact while d·1e6 < 2^(63−_CODE_BITS), i.e. squared
    sub-vector L2 below ~4.4e6 (sub-vector components up to ~±700)
    — any normalized or bounded embedding family; normalize first
    for wilder magnitudes, or the multiplication overflows (raises
    under ANSI rather than mis-ranking silently)."""
    return (
        F.round(F.col("_d") * 1e6).cast("long")
        * F.lit(1 << _CODE_BITS).cast("long")
        + F.col("code").cast("long")
    )


def _subvectors(
    embeddings: DataFrame,
    id_col: str,
    vec_col: str,
    m_sub: int,
    sub_dim: int,
) -> DataFrame:
    """(id, m, s1..s{sub_dim}, nsv): each vector split into ``m_sub``
    sub-vectors stored as scalar columns, with the self dot-product
    ``nsv`` materialized once per (vector, subspace) — the
    norms-below-the-join trick from ``cosine_pre``."""
    nsq = " + ".join(f"s{d} * s{d}" for d in range(1, sub_dim + 1))
    return (
        embeddings.selectExpr(
            id_col, as_double_sql(vec_col) + " as _v"
        )
        .select(
            id_col,
            F.explode(
                F.sequence(F.lit(0), F.lit(m_sub - 1))
            ).alias("m"),
            F.col("_v"),
        )
        .selectExpr(
            id_col,
            "m",
            *[
                f"element_at(_v, m * {sub_dim} + {d}) as s{d}"
                for d in range(1, sub_dim + 1)
            ],
        )
        .selectExpr("*", f"({nsq}) as nsv")
    )


def _train_filter(id_col: str, rate: float):
    if not 0.0 < rate <= 1.0:
        raise ValueError(f"train_sample_rate must be in (0, 1], got {rate}")
    if rate == 1.0:
        return F.lit(True)
    return sample_hash(F.col(id_col), TRAIN_SEED) < F.lit(
        rate_threshold(rate)
    )


def _scalar_codebooks(
    embeddings: DataFrame,
    id_col: str,
    vec_col: str,
    m_sub: int,
    sub_dim: int,
    k_codes: int,
    n_iter: int,
    train_sample_rate: float,
) -> DataFrame:
    """(m, code, c1..c{sub_dim}, ncv) after ``n_iter`` Lloyd steps
    over the deterministic training sample. Both the seed set and the
    train sample filter the EMBEDDINGS first, below the subspace
    explode — no training pass ever builds sub-vectors it won't
    score."""
    # the training sub-vector table is re-read every Lloyd iteration —
    # checkpoint it once (lazy: the first iteration's aggregate
    # materializes the blocks) instead of re-running the explode +
    # scalar projection per round (guide §5)
    train = _subvectors(
        embeddings.filter(_train_filter(id_col, train_sample_rate)),
        id_col,
        vec_col,
        m_sub,
        sub_dim,
    ).localCheckpoint(eager=False)

    wseed = Window.partitionBy("m").orderBy(id_col)
    cb = (
        _subvectors(
            embeddings.orderBy(F.col(id_col)).limit(k_codes),
            id_col,
            vec_col,
            m_sub,
            sub_dim,
        )
        .withColumn("code", F.row_number().over(wseed) - 1)
        .selectExpr(
            "m",
            "code",
            *[f"s{d} as c{d}" for d in range(1, sub_dim + 1)],
            "nsv as ncv",
        )
        # lazy: iteration 1's aggregate materializes the seed blocks
        .localCheckpoint(eager=False)
    )

    dist = F.expr(_pair_dist_sql(sub_dim))
    packed = _packed_argmin()
    mean_cols = [
        F.expr(
            f"floor(cast(sum(cast(s{d} as decimal(38,12))) as double)"
            f" / count(*) * 1e6 + 0.5) / 1e6 as c{d}"
        )
        for d in range(1, sub_dim + 1)
    ]
    ncv_sql = " + ".join(f"c{d} * c{d}" for d in range(1, sub_dim + 1))
    s_cols = _s_cols(sub_dim, "s")
    for _ in range(n_iter):
        scored = train.join(F.broadcast(cb), "m").withColumn("_d", dist)
        # the sub-vector scalars ride as extra GROUP KEYS of the
        # argmin aggregate (functionally dependent on (id, m) — same
        # groups, same winner), so the means read them straight off
        # `best`: the former `train.join(best, [id, m])` re-shuffled
        # the training table per iteration for columns the aggregate
        # already held (guide §2.4; identical multiset per (m, code),
        # so the floor'd decimal means are bit-identical)
        best = scored.groupBy(id_col, "m", *s_cols).agg(
            F.min_by("code", packed).alias("code")
        )
        cb = (
            best.groupBy("m", "code")
            .agg(*mean_cols)
            .selectExpr("m", "code", *_s_cols(sub_dim, "c"), f"({ncv_sql}) as ncv")
            # lazy: the next iteration's aggregate (or the final
            # consumer) materializes the blocks — one job per round
            # saved, plan truncation unchanged
            .localCheckpoint(eager=False)
        )
    return cb


def _decompose_codebooks(codebooks: DataFrame, sub_dim: int) -> DataFrame:
    """Public (m, code, cv[, ncv]) form → scalar columns."""
    if "c1" in codebooks.columns:
        return codebooks
    ncv_sql = " + ".join(f"c{d} * c{d}" for d in range(1, sub_dim + 1))
    out = codebooks.selectExpr(
        "m",
        "code",
        *[f"element_at(cv, {d}) as c{d}" for d in range(1, sub_dim + 1)],
        *(["ncv"] if "ncv" in codebooks.columns else []),
    )
    if "ncv" not in codebooks.columns:
        out = out.selectExpr("*", f"({ncv_sql}) as ncv")
    return out


def pq_codebooks(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m_sub: int = M_SUB,
    k_codes: int = K_CODES,
    dims: int = DIMS,
    n_iter: int = N_ITER,
    train_sample_rate: float = 1.0,
) -> DataFrame:
    """(m, code, cv) codebooks: per-subspace k-means from the
    deterministic first-ids seed, ``n_iter`` Lloyd steps with
    decimal-exact means over the md5 training sample (module
    docstring). All M subspaces train in the SAME distributed job —
    the subspace id is just a grouping key, so adding subspaces
    widens the agg, it doesn't add passes."""
    if dims % m_sub:
        raise ValueError(f"dims={dims} not divisible by m_sub={m_sub}")
    sub_dim = dims // m_sub
    cb = _scalar_codebooks(
        embeddings, id_col, vec_col, m_sub, sub_dim, k_codes, n_iter,
        train_sample_rate,
    )
    cv = "array(" + ", ".join(_s_cols(sub_dim, "c")) + ") as cv"
    return cb.selectExpr("m", "code", cv, "ncv")


def pq_codes(
    embeddings: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m_sub: int = M_SUB,
    dims: int = DIMS,
) -> DataFrame:
    """(id, m, code): every corpus vector encoded against the
    codebooks — broadcast join + packed-long ``min_by`` hash agg,
    map-side partial combine, no sort, scalar codegen distance."""
    sub_dim = dims // m_sub
    sub = _subvectors(embeddings, id_col, vec_col, m_sub, sub_dim)
    return _encode(sub, codebooks, id_col, sub_dim)


def _encode(
    sub: DataFrame, codebooks: DataFrame, id_col: str, sub_dim: int
) -> DataFrame:
    cb = _decompose_codebooks(codebooks, sub_dim)
    return (
        sub.join(F.broadcast(cb), "m")
        .withColumn("_d", F.expr(_pair_dist_sql(sub_dim)))
        .groupBy(id_col, "m")
        .agg(F.min_by("code", _packed_argmin()).alias("code"))
    )


def pq_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m_sub: int = M_SUB,
    k_codes: int = K_CODES,
    dims: int = DIMS,
    n_iter: int = N_ITER,
    train_sample_rate: float = 1.0,
    rerank_factor: int | None = None,
) -> DataFrame:
    """PQ-ADC approximate top-k: train codebooks (on the hash
    sample), encode the corpus, broadcast each query's M×K distance
    table, rank by the exact decimal sum of M lookups. Returns
    ``(query_id, neighbor_id, adc_dist, rank)``.

    ``rerank_factor=r`` adds the standard refinement stage (Jégou
    §5.2 "IVFADC+R" shape): shortlist ``k·r`` by ADC, then exact
    full-dimension L2 over just the shortlist — the expensive exact
    distance touches k·r·|queries| rows instead of the corpus. Output
    then carries ``l2_dist`` and ranks by it (measured sf0.01,
    M=16/K=32: recall@10 vs exact L2 goes 0.475 → 0.850 mean at r=5;
    see PLANS_r5.md)."""
    sub_dim = dims // m_sub
    cb = _scalar_codebooks(
        embeddings, id_col, vec_col, m_sub, sub_dim, k_codes, n_iter,
        train_sample_rate,
    )
    sub = _subvectors(embeddings, id_col, vec_col, m_sub, sub_dim)
    codes = _encode(sub, cb, id_col, sub_dim)

    qsub = _subvectors(
        embeddings.filter(F.col(id_col).isin(query_ids)),
        id_col,
        vec_col,
        m_sub,
        sub_dim,
    ).withColumnRenamed(id_col, "query_id")
    # per-query subspace distance tables: Q·M·K rows — contract-tiny,
    # broadcast against the code table
    dtab = qsub.join(cb, "m").select(
        "query_id",
        "m",
        "code",
        F.expr(_pair_dist_sql(sub_dim)).alias("_d"),
    )
    adc = (
        codes.join(F.broadcast(dtab), ["m", "code"])
        .filter(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", F.col(id_col).alias("neighbor_id"))
        .agg(
            F.sum(F.col("_d").cast("decimal(18,6)"))
            .cast("double")
            .alias("adc_dist")
        )
    )
    return _rank_and_rerank(
        adc, embeddings, query_ids, k, rerank_factor, id_col, vec_col
    )


def _rank_and_rerank(
    adc: DataFrame,
    embeddings: DataFrame,
    query_ids: list[int],
    k: int,
    rerank_factor: int | None,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Shared tail of :func:`pq_topk` / :func:`ivf_pq_topk`: rank the
    (query_id, neighbor_id, adc_dist) table; with ``rerank_factor``,
    shortlist k·r by ADC then re-rank by exact full-dimension L2."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist"), F.col("neighbor_id")
    )
    ranked = adc.withColumn(
        "rank", F.row_number().over(w).cast("bigint")
    )
    if rerank_factor is None:
        return ranked.filter(F.col("rank") <= k)

    shortlist = ranked.filter(F.col("rank") <= k * rerank_factor).drop(
        "rank"
    )
    vecs = embeddings.selectExpr(
        id_col, as_double_sql(vec_col) + " as _fv"
    )
    qv = (
        vecs.filter(F.col(id_col).isin(query_ids))
        .withColumnRenamed(id_col, "query_id")
        .withColumnRenamed("_fv", "_qv")
    )
    nv = vecs.withColumnRenamed(id_col, "neighbor_id").withColumnRenamed(
        "_fv", "_nv"
    )
    exact = (
        shortlist.join(F.broadcast(qv), "query_id")
        .join(nv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            "adc_dist",
            F.expr(l2_sql("_qv", "_nv")).alias("l2_dist"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("l2_dist"), F.col("neighbor_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def pq_topk_gated(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    recall_gate: float = 0.6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **pq_kw,
) -> DataFrame:
    """:func:`pq_topk` (rerank mode) with the emb_ivf_topk in-row
    recall contract: each query's rows carry ``recall`` — overlap@k
    of the PQ result with the exact-L2 brute-force truth — and
    queries below ``recall_gate`` are dropped entirely, so a recall
    regression moves the driver's row-count check, not just a log
    line. The truth scan broadcasts the (tiny) query set against the
    corpus — one pass, no corpus self-join."""
    if pq_kw.get("rerank_factor") is None:
        raise ValueError("recall gating requires rerank_factor")
    from pyspark.sql.window import Window as _W

    # materialize once: ann feeds BOTH the recall semi-join and the
    # final output join — without this the whole PQ pipeline
    # (codebook Lloyd steps, corpus encode, ADC, re-rank) executes
    # twice per consumer tree. k·|queries| rows, trivially small.
    ann = pq_topk(
        embeddings, query_ids, k, id_col, vec_col, **pq_kw
    ).localCheckpoint(eager=False)  # lazy: first consumer materializes
    vecs = embeddings.selectExpr(
        id_col, as_double_sql(vec_col) + " as _fv"
    )
    qv = (
        vecs.filter(F.col(id_col).isin(query_ids))
        .withColumnRenamed(id_col, "query_id")
        .withColumnRenamed("_fv", "_qv")
    )
    nv = vecs.withColumnRenamed(id_col, "neighbor_id").withColumnRenamed(
        "_fv", "_nv"
    )
    scored = (
        nv.crossJoin(F.broadcast(qv))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.expr(l2_sql("_qv", "_nv")).alias("_d"),
        )
    )
    w = _W.partitionBy("query_id").orderBy(
        F.col("_d"), F.col("neighbor_id")
    )
    # same double-consumer shape: the brute-force truth feeds the
    # semi-join AND the per-query totals — one corpus scan, not two
    brute = (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=False)  # lazy: first consumer materializes
    )
    found = brute.join(
        ann.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "left_semi",
    )
    per_q = (
        brute.groupBy("query_id")
        .agg(F.count("*").alias("_n_true"))
        .join(
            found.groupBy("query_id").agg(F.count("*").alias("_n_found")),
            "query_id",
            "left",
        )
        .select(
            "query_id",
            (
                F.floor(
                    F.coalesce(F.col("_n_found"), F.lit(0))
                    / F.col("_n_true")
                    * F.lit(100.0)
                    + F.lit(0.5)
                ).cast("double")
                / F.lit(100.0)
            ).alias("recall"),
        )
    )
    return ann.join(
        F.broadcast(per_q.filter(F.col("recall") >= recall_gate)),
        "query_id",
    ).select(
        "query_id", "neighbor_id", "adc_dist", "l2_dist", "rank", "recall"
    )


def pq_topk_sql(
    query_ids: list[int],
    k: int = 10,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m_sub: int = M_SUB,
    k_codes: int = K_CODES,
    dims: int = DIMS,
    n_iter: int = N_ITER,
    train_sample_rate: float = 1.0,
    rerank_factor: int | None = None,
    recall_gate: float | None = None,
) -> str:
    """DuckDB oracle replaying the ENTIRE PQ pipeline of
    :func:`pq_topk` — seeding, training sample, every Lloyd step,
    encoding, ADC (and the re-rank when enabled). The oracle stays in
    list form (``list_dot_product``) — same values through the
    round-6 absorber, independent engine idioms.

    ``recall_gate`` (requires ``rerank_factor``) additionally replays
    the per-query recall@k vs the exact-L2 brute-force truth and
    keeps only queries at or above the gate — the emb_ivf_topk
    pattern: a recall regression drops that query's rows, moving the
    driver's row-count check."""
    if recall_gate is not None and rerank_factor is None:
        raise ValueError("recall_gate requires rerank_factor")
    sub_dim = dims // m_sub
    qlist = ", ".join(str(int(q)) for q in query_ids)
    # hoisted-self-dot pair distance — value-identical to _DUCK_L2
    # (same ((nsv − 2d) + ncv) association)
    l2 = ("floor((s.nsv - 2 * list_dot_product(s.sv, c.cv) + c.ncv)"
          " * 1e6 + 0.5) / 1e6")
    if train_sample_rate == 1.0:
        train_where = ""
    else:
        thr = rate_threshold(train_sample_rate)
        train_where = (
            f" WHERE substr(md5('{TRAIN_SEED}:' ||"
            f" CAST(vid AS VARCHAR)), 1, 8) < '{thr}'"
        )
    ctes = [
        f"e AS (SELECT {id_col} AS vid,"
        f" CAST({vec_col} AS DOUBLE[]) AS v FROM {table})",
        "mm AS (SELECT unnest(range(0, " + str(m_sub) + ")) AS m)",
        "sub AS (SELECT vid, m, sv,"
        " list_dot_product(sv, sv) AS nsv FROM ("
        "  SELECT vid, m,"
        f"  list_slice(v, m * {sub_dim} + 1, m * {sub_dim} + {sub_dim})"
        "  AS sv FROM e CROSS JOIN mm))",
        f"train AS (SELECT * FROM sub{train_where})",
        f"seed AS (SELECT vid FROM e ORDER BY vid LIMIT {k_codes})",
        "cb0 AS (SELECT m, row_number() OVER (PARTITION BY m"
        " ORDER BY vid) - 1 AS code, sv AS cv, nsv AS ncv"
        " FROM sub JOIN seed USING (vid))",
    ]
    for i in range(1, n_iter + 1):
        prev = f"cb{i - 1}"
        ctes.append(
            f"asg{i} AS (SELECT s.vid, s.m, c.code, {l2} AS d"
            f" FROM train s JOIN {prev} c USING (m))"
        )
        ctes.append(
            f"best{i} AS (SELECT vid, m, code FROM ("
            f" SELECT vid, m, code, row_number() OVER ("
            f"  PARTITION BY vid, m ORDER BY d, code) AS r"
            f" FROM asg{i}) WHERE r = 1)"
        )
        ctes.append(
            f"comp{i} AS (SELECT b.m, b.code, d.i AS dim,"
            f" s.sv[d.i] AS comp FROM best{i} b"
            " JOIN train s USING (vid, m),"
            f" (SELECT unnest(range(1, {sub_dim + 1})) AS i) d)"
        )
        ctes.append(
            f"mean{i} AS (SELECT m, code, dim,"
            " floor(CAST(sum(CAST(comp AS DECIMAL(38,12))) AS DOUBLE)"
            f" / count(*) * 1e6 + 0.5) / 1e6 AS mv"
            f" FROM comp{i} GROUP BY m, code, dim)"
        )
        ctes.append(
            f"cb{i} AS (SELECT m, code, cv,"
            " list_dot_product(cv, cv) AS ncv FROM ("
            " SELECT m, code, list(mv ORDER BY dim) AS cv"
            f" FROM mean{i} GROUP BY m, code))"
        )
    final = f"cb{n_iter}"
    ctes += [
        f"codes AS (SELECT vid, m, code FROM ("
        f" SELECT s.vid, s.m, c.code, row_number() OVER ("
        f"  PARTITION BY s.vid, s.m ORDER BY {l2}, c.code) AS r"
        f" FROM sub s JOIN {final} c USING (m)) WHERE r = 1)",
        f"dtab AS (SELECT s.vid AS query_id, s.m, c.code, {l2} AS d"
        f" FROM sub s JOIN {final} c USING (m)"
        f" WHERE s.vid IN ({qlist}))",
        "adc AS (SELECT query_id, t.vid AS neighbor_id,"
        " CAST(sum(CAST(d AS DECIMAL(18,6))) AS DOUBLE) AS adc_dist"
        " FROM codes t JOIN dtab USING (m, code)"
        " WHERE t.vid != query_id GROUP BY query_id, t.vid)",
    ]
    if rerank_factor is None:
        return (
            "WITH " + ", ".join(ctes) +
            " SELECT query_id, neighbor_id, adc_dist,"
            " CAST(rank AS BIGINT) AS rank FROM ("
            "  SELECT *, row_number() OVER (PARTITION BY query_id"
            "   ORDER BY adc_dist, neighbor_id) AS rank FROM adc)"
            f" WHERE rank <= {k}"
        )
    exact = _DUCK_L2.format(a="q.v", b="n.v")
    ctes += [
        "short AS (SELECT query_id, neighbor_id, adc_dist FROM ("
        " SELECT *, row_number() OVER (PARTITION BY query_id"
        "  ORDER BY adc_dist, neighbor_id) AS r FROM adc)"
        f" WHERE r <= {k * rerank_factor})",
        f"exact AS (SELECT query_id, neighbor_id, adc_dist, {exact}"
        " AS l2_dist FROM short JOIN e q ON q.vid = query_id"
        " JOIN e n ON n.vid = neighbor_id)",
    ]
    if recall_gate is None:
        return (
            "WITH " + ", ".join(ctes) +
            " SELECT query_id, neighbor_id, adc_dist, l2_dist,"
            " CAST(rank AS BIGINT) AS rank FROM ("
            "  SELECT *, row_number() OVER (PARTITION BY query_id"
            "   ORDER BY l2_dist, neighbor_id) AS rank FROM exact)"
            f" WHERE rank <= {k}"
        )
    bexact = _DUCK_L2.format(a="q.v", b="n.v")
    ctes += [
        "ann AS MATERIALIZED (SELECT query_id, neighbor_id, adc_dist,"
        " l2_dist, CAST(rank AS BIGINT) AS rank FROM ("
        "  SELECT *, row_number() OVER (PARTITION BY query_id"
        "   ORDER BY l2_dist, neighbor_id) AS rank FROM exact)"
        f" WHERE rank <= {k})",
        # the truth: exact-L2 top-k over the whole corpus (the metric
        # the re-rank stage optimizes — same rounded identity-form
        # distance as the re-rank itself)
        f"bscored AS (SELECT q.vid AS query_id, n.vid AS neighbor_id,"
        f" {bexact} AS d FROM e n CROSS JOIN"
        f" (SELECT vid, v FROM e WHERE vid IN ({qlist})) q"
        " WHERE n.vid != q.vid)",
        "brute AS (SELECT query_id, neighbor_id FROM (SELECT *,"
        " row_number() OVER (PARTITION BY query_id"
        "  ORDER BY d, neighbor_id) AS r FROM bscored)"
        f" WHERE r <= {k})",
        "rec AS (SELECT b.query_id,"
        " floor(CAST(count(a.neighbor_id) AS DOUBLE)"
        "  / CAST(count(*) AS DOUBLE) * 100.0 + 0.5) / 100.0 AS recall"
        " FROM brute b LEFT JOIN ann a ON a.query_id = b.query_id"
        "  AND a.neighbor_id = b.neighbor_id GROUP BY b.query_id)",
    ]
    return (
        "WITH " + ", ".join(ctes) +
        " SELECT ann.query_id, ann.neighbor_id, ann.adc_dist,"
        " ann.l2_dist, ann.rank, rec.recall"
        " FROM ann JOIN rec ON rec.query_id = ann.query_id"
        f" WHERE rec.recall >= {recall_gate}"
    )


def ivf_pq_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 4,
    m_sub: int = M_SUB,
    k_codes: int = K_CODES,
    dims: int = DIMS,
    n_iter: int = N_ITER,
    train_sample_rate: float = 1.0,
    rerank_factor: int | None = None,
) -> DataFrame:
    """IVF-PQ (Jégou's IVFADC — the billion-scale composition): the
    inverted file bounds WHICH vectors each query scores (cell
    equi-join, candidates ≈ n_probe·n/n_cells per query instead of
    n), and PQ bounds the BYTES per scored vector (M codes instead
    of the raw floats). At 100 TB both bounds are load-bearing: IVF
    keeps the scored row count sub-linear, PQ keeps the scored state
    RAM-resident.

    Composes the verified pieces unchanged: cells from
    ``similarity.ivf_centroids``/``ivf_assignments`` (first-ids
    seeding), codebooks/codes/ADC from this module. With
    ``n_probe == n_cells`` the candidate set is every pair, and the
    ranking is IDENTICAL to :func:`pq_topk` — the property
    ``tests/test_pq.py`` pins the composition with."""
    from .similarity import ivf_assignments, ivf_centroids

    sub_dim = dims // m_sub
    cents = ivf_centroids(embeddings, id_col, vec_col, n_cells)
    corpus_cells = ivf_assignments(
        embeddings, cents, id_col, vec_col, n_probe=1
    ).select(F.col(id_col).alias("neighbor_id"), "cell")
    query_cells = ivf_assignments(
        embeddings.filter(F.col(id_col).isin(query_ids)),
        cents,
        id_col,
        vec_col,
        n_probe=n_probe,
    ).select(F.col(id_col).alias("query_id"), "cell")
    cand = (
        corpus_cells.join(F.broadcast(query_cells), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )

    cb = _scalar_codebooks(
        embeddings, id_col, vec_col, m_sub, sub_dim, k_codes, n_iter,
        train_sample_rate,
    )
    sub = _subvectors(embeddings, id_col, vec_col, m_sub, sub_dim)
    codes = _encode(sub, cb, id_col, sub_dim)
    qsub = _subvectors(
        embeddings.filter(F.col(id_col).isin(query_ids)),
        id_col,
        vec_col,
        m_sub,
        sub_dim,
    ).withColumnRenamed(id_col, "query_id")
    dtab = qsub.join(cb, "m").select(
        "query_id",
        "m",
        "code",
        F.expr(_pair_dist_sql(sub_dim)).alias("_d"),
    )
    # ADC restricted to the IVF candidates: the code table joins the
    # candidate pairs FIRST (equi-join on neighbor id), so the
    # distance sum only ever touches probed-cell members
    adc = (
        cand.join(
            codes.withColumnRenamed(id_col, "neighbor_id"), "neighbor_id"
        )
        .join(F.broadcast(dtab), ["query_id", "m", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(
            F.sum(F.col("_d").cast("decimal(18,6)"))
            .cast("double")
            .alias("adc_dist")
        )
    )
    return _rank_and_rerank(
        adc, embeddings, query_ids, k, rerank_factor, id_col, vec_col
    )
