"""Product-Quantization ANN (PQ-ADC) over embedding columns.

PQ (Jégou, Douze, Schmid — "Product Quantization for Nearest
Neighbor Search", TPAMI 2011) is the memory-side ANN technique the
IVF/LSH paths don't cover: split each D-dim vector into M contiguous
sub-vectors, k-means each subspace into K codes, and store each vector as
M small integers. A 64-dim float vector (256 B) becomes 8 codes
(8 B) — a 32× compression that is what actually lets a 100 TB corpus'
index fit in cluster memory. Queries never decompress: a per-query
M×K table of subspace distances is broadcast, and each corpus
vector's approximate distance is M table lookups summed
(Asymmetric Distance Computation).

Everything here is deterministic and SQL-replayable — the same
discipline as the IVF path (operators/similarity.py):

* seeding: the K lowest-id vectors' m-th sub-vectors are subspace
  m's initial codebook (code = id-rank), trivially replayable;
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

Scale shape: codebooks are M·K rows (tiny, broadcast); corpus
assignment/encoding is a broadcast join + hash ``min_by`` aggregate
(map-side partial combine, no sort — the packed-long trick from
``ivf_assignments``); ADC is a broadcast join of the code table
against the (tiny) query distance tables followed by a partial-agg
sum. Nothing shuffles anything proportional to corpus × queries, and
nothing ever collects the corpus.

Reference scope: the reference engine (sqlengine.py:1-753) has no
vector operators; this is the §2.4 similarity-search scale path #4
(brute force / IVF / SRP-LSH / PQ).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .similarity import as_double_sql, dot_sql

M_SUB = 8  # subspaces
K_CODES = 16  # codes per subspace
DIMS = 64  # embedding dimensionality
N_ITER = 2  # Lloyd steps per subspace


def l2_sql(a: str, b: str) -> str:
    """Rounded squared-L2 via three dot products — the identity
    |a−b|² = a·a − 2·a·b + b·b keeps both engines on dot-product
    primitives (Spark: zip_with/aggregate fold; DuckDB:
    list_dot_product), with round(·, 6) absorbing fold-order noise
    exactly like the cosine paths."""
    return (
        f"round({dot_sql(a, a)} - 2 * {dot_sql(a, b)}"
        f" + {dot_sql(b, b)}, 6)"
    )


_DUCK_L2 = (
    "round(list_dot_product({a}, {a}) - 2 * list_dot_product({a}, {b})"
    " + list_dot_product({b}, {b}), 6)"
)


def _subvectors(
    embeddings: DataFrame,
    id_col: str,
    vec_col: str,
    m_sub: int,
    sub_dim: int,
) -> DataFrame:
    """(id, m, sv): each vector split into ``m_sub`` contiguous
    ``sub_dim``-wide double sub-vectors."""
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
        .select(
            id_col,
            "m",
            F.expr(f"slice(_v, m * {sub_dim} + 1, {sub_dim})").alias("sv"),
        )
    )


def pq_codebooks(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m_sub: int = M_SUB,
    k_codes: int = K_CODES,
    dims: int = DIMS,
    n_iter: int = N_ITER,
) -> DataFrame:
    """(m, code, cv) codebooks: per-subspace k-means from the
    deterministic first-ids seed, ``n_iter`` Lloyd steps with
    decimal-exact means (module docstring). All M subspaces train in
    the SAME distributed job — the subspace id is just a grouping
    key, so adding subspaces widens the agg, it doesn't add passes."""
    if dims % m_sub:
        raise ValueError(f"dims={dims} not divisible by m_sub={m_sub}")
    sub_dim = dims // m_sub
    sub = _subvectors(embeddings, id_col, vec_col, m_sub, sub_dim)

    seed_ids = embeddings.orderBy(F.col(id_col)).limit(k_codes).select(id_col)
    wseed = Window.partitionBy("m").orderBy(id_col)
    cb = (
        sub.join(F.broadcast(seed_ids), id_col)
        .withColumn("code", F.row_number().over(wseed) - 1)
        .select("m", "code", F.col("sv").alias("cv"))
        .localCheckpoint(eager=True)
    )

    dist = F.expr(l2_sql("sv", "cv"))
    # argmin via one packed long (hash agg, no sort): rounded d·1e6 is
    # an exact integer, codes < 2³² break ties upward — min_by packed
    # ≡ ORDER BY d, code LIMIT 1
    packed = (
        F.round(F.col("_d") * 1e6).cast("long") * F.lit(1 << 32).cast("long")
        + F.col("code").cast("long")
    )
    mean_cols = [
        F.expr(
            f"round(cast(sum(cast(element_at(sv, {d}) as"
            f" decimal(38,12))) as double) / count(*), 6) as c{d}"
        )
        for d in range(1, sub_dim + 1)
    ]
    cv_col = F.expr(
        "array(" + ", ".join(f"c{d}" for d in range(1, sub_dim + 1)) + ")"
    ).alias("cv")
    for _ in range(n_iter):
        scored = sub.join(F.broadcast(cb), "m").withColumn("_d", dist)
        best = scored.groupBy(id_col, "m").agg(
            F.min_by("code", packed).alias("code")
        )
        members = sub.join(best, [id_col, "m"])
        cb = (
            members.groupBy("m", "code")
            .agg(*mean_cols)
            .select("m", "code", cv_col)
            .localCheckpoint(eager=True)
        )
    return cb


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
    map-side partial combine, no sort."""
    sub_dim = dims // m_sub
    sub = _subvectors(embeddings, id_col, vec_col, m_sub, sub_dim)
    dist = F.expr(l2_sql("sv", "cv"))
    packed = (
        F.round(F.col("_d") * 1e6).cast("long") * F.lit(1 << 32).cast("long")
        + F.col("code").cast("long")
    )
    return (
        sub.join(F.broadcast(codebooks), "m")
        .withColumn("_d", dist)
        .groupBy(id_col, "m")
        .agg(F.min_by("code", packed).alias("code"))
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
    rerank_factor: int | None = None,
) -> DataFrame:
    """PQ-ADC approximate top-k: train codebooks, encode the corpus,
    broadcast each query's M×K distance table, rank by the exact
    decimal sum of M lookups. Returns
    ``(query_id, neighbor_id, adc_dist, rank)``.

    ``rerank_factor=r`` adds the standard refinement stage (Jégou
    §5.2 "IVFADC+R" shape): shortlist ``k·r`` by ADC, then exact
    full-dimension L2 over just the shortlist — the expensive exact
    distance touches k·r·|queries| rows instead of the corpus. Output
    then carries ``l2_dist`` and ranks by it (measured sf0.01,
    M=16/K=32: recall@10 vs exact L2 goes 0.475 → 0.850 mean at r=5;
    see PLANS_r5.md)."""
    sub_dim = dims // m_sub
    cb = pq_codebooks(
        embeddings, id_col, vec_col, m_sub, k_codes, dims, n_iter
    )
    codes = pq_codes(embeddings, cb, id_col, vec_col, m_sub, dims)

    qsub = _subvectors(
        embeddings.filter(F.col(id_col).isin(query_ids)),
        id_col,
        vec_col,
        m_sub,
        sub_dim,
    ).withColumnRenamed(id_col, "query_id")
    # per-query subspace distance tables: Q·M·K rows — contract-tiny,
    # broadcast against the code table
    dtab = (
        qsub.join(cb, "m")
        .select(
            "query_id",
            "m",
            "code",
            F.expr(l2_sql("sv", "cv")).alias("_d"),
        )
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
    rerank_factor: int | None = None,
) -> str:
    """DuckDB oracle replaying the ENTIRE PQ pipeline of
    :func:`pq_topk` — seeding, every Lloyd step, encoding, ADC."""
    sub_dim = dims // m_sub
    qlist = ", ".join(str(int(q)) for q in query_ids)
    l2 = _DUCK_L2.format(a="s.sv", b="c.cv")
    ctes = [
        f"e AS (SELECT {id_col} AS vid,"
        f" CAST({vec_col} AS DOUBLE[]) AS v FROM {table})",
        "mm AS (SELECT unnest(range(0, " + str(m_sub) + ")) AS m)",
        "sub AS (SELECT vid, m,"
        f" list_slice(v, m * {sub_dim} + 1, m * {sub_dim} + {sub_dim})"
        " AS sv FROM e CROSS JOIN mm)",
        f"seed AS (SELECT vid FROM e ORDER BY vid LIMIT {k_codes})",
        "cb0 AS (SELECT m, row_number() OVER (PARTITION BY m"
        " ORDER BY vid) - 1 AS code, sv AS cv"
        " FROM sub JOIN seed USING (vid))",
    ]
    for i in range(1, n_iter + 1):
        prev = f"cb{i - 1}"
        ctes.append(
            f"asg{i} AS (SELECT s.vid, s.m, c.code, {l2} AS d"
            f" FROM sub s JOIN {prev} c USING (m))"
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
            " JOIN sub s USING (vid, m),"
            f" (SELECT unnest(range(1, {sub_dim + 1})) AS i) d)"
        )
        ctes.append(
            f"mean{i} AS (SELECT m, code, dim,"
            " round(CAST(sum(CAST(comp AS DECIMAL(38,12))) AS DOUBLE)"
            f" / count(*), 6) AS mv FROM comp{i} GROUP BY m, code, dim)"
        )
        ctes.append(
            f"cb{i} AS (SELECT m, code, list(mv ORDER BY dim) AS cv"
            f" FROM mean{i} GROUP BY m, code)"
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
    return (
        "WITH " + ", ".join(ctes) +
        " SELECT query_id, neighbor_id, adc_dist, l2_dist,"
        " CAST(rank AS BIGINT) AS rank FROM ("
        "  SELECT *, row_number() OVER (PARTITION BY query_id"
        "   ORDER BY l2_dist, neighbor_id) AS rank FROM exact)"
        f" WHERE rank <= {k}"
    )
