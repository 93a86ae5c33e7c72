"""Johnson–Lindenstrauss random projection for embedding columns.

Dimensionality reduction is the standard pre-step before similarity
search at corpus scale: a sign (Rademacher) random projection
``y = R·x / √d'`` with R_ij ∈ {−1,+1} preserves pairwise distances
within (1±ε) for d' = O(log n / ε²) [Achlioptas, JCSS'03 — database-
friendly random projections], and shrinks every downstream shuffle,
index, and broadcast by d/d'.

Determinism (the property every operator in this package holds): the
projection matrix is *derived, not stored* — the sign of R_ij is the
top bit of ``md5("i:j")``'s first hex digit, so any executor (and the
DuckDB oracle) regenerates the identical matrix from the dimension
pair alone. No RNG state, no broadcast of a matrix blob, bit-stable
across runs and cluster sizes.

Plan shape: the d×d' sign matrix materializes as a tiny broadcast
relation (range × range cross join, 64×16 = 1 024 rows here); the
corpus side posexplodes to (vec_id, i, x_i) once, broadcast-joins the
signs, and ONE hash aggregate per (vec_id, j) accumulates the signed
sum as DECIMAL(38,12) — exact and order-independent across any
partitioning, the same commutativity policy as `exact_corr` /
`pq_topk`. The divide by √d' happens once per output component in
double, rounded to 6 (the package float-edge policy).

Output is long format (vec_id, j, comp) rather than re-assembled
arrays: it hash-compares directly, and the array re-assembly (one
more per-vec aggregate) is provided separately for pipeline use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Portable sign from a dimension pair: first hex digit of md5("i:j")
#: in [0,7] → +1, in [8,f] → −1 — exactly the top bit of the digest,
#: unbiased, and the same expression text runs in Spark and DuckDB.
_SIGN_SQL = (
    "CASE WHEN substr(md5(CAST(i AS STRING) || ':' || CAST(j AS STRING)), 1, 1)"
    " BETWEEN '0' AND '7' THEN 1 ELSE -1 END"
)
# Spark's substring is 1-based like DuckDB's substr; Spark accepts
# `substr` as an alias, so the expression string is shared verbatim.


def sign_matrix(spark: SparkSession, d: int, d_out: int) -> DataFrame:
    """(i, j, sign): the derived Rademacher matrix, d×d_out rows."""
    return (
        spark.range(d)
        .withColumnRenamed("id", "i")
        .crossJoin(spark.range(d_out).withColumnRenamed("id", "j"))
        .select(
            F.col("i").cast("int").alias("i"),
            F.col("j").cast("int").alias("j"),
            F.expr(_SIGN_SQL).cast("int").alias("sign"),
        )
    )


def jl_project(
    df: DataFrame,
    d_out: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, j, comp): each input vector projected to ``d_out``
    components, ``comp_j = round(Σ_i x_i·sign(i,j) / √d_out, 6)``.

    The signed sum accumulates DECIMAL(38,12) from the float→double
    exact casts, so the aggregate is order-independent; only the final
    single divide runs in double. One broadcast join + one hash
    aggregate — the shuffle carries n·d_out output groups, not the
    n·d exploded rows (partial aggregation collapses those map-side).
    """
    if d_out < 1:
        raise ValueError(f"need d_out >= 1, got {d_out}")
    spark = df.sparkSession
    d = df.select(F.size(vec_col).alias("d")).limit(1).collect()
    if not d:
        raise ValueError("empty input — cannot infer vector dimension")
    dim = d[0]["d"]
    signs = sign_matrix(spark, dim, d_out)
    comps = df.select(
        F.col(id_col),
        F.posexplode(vec_col).alias("i", "x"),
    )
    return (
        comps.join(F.broadcast(signs), "i")
        .groupBy(id_col, "j")
        .agg(
            F.sum(
                (F.col("x").cast("double") * F.col("sign")).cast(
                    "decimal(38,12)"
                )
            ).alias("_s")
        )
        .select(
            F.col(id_col),
            F.col("j"),
            F.round(
                F.col("_s").cast("double") / F.lit(float(d_out) ** 0.5), 6
            ).alias("comp"),
        )
        .orderBy(id_col, "j")
    )


def jl_project_vectors(
    df: DataFrame,
    d_out: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, reduced): the long-format projection re-assembled into an
    ordered ``array<double>`` for downstream similarity operators
    (`cosine_topk`, `pq_topk`, … accept any array column)."""
    long = jl_project(df, d_out, id_col=id_col, vec_col=vec_col)
    return long.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("j"), F.col("comp")))
        ).comp.alias("reduced")
    )


def jl_project_sql(
    table: str = "embeddings",
    d_out: int = 16,
    d_in: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB oracle twin of :func:`jl_project` — same derived sign
    matrix (shared ``_SIGN_SQL`` text), same decimal-exact signed sum,
    same single rounded divide."""
    return (
        f"WITH dims_i AS (SELECT unnest(range({d_in})) AS i),"
        f" dims_j AS (SELECT unnest(range({d_out})) AS j),"
        f" signs AS (SELECT i, j, {_SIGN_SQL} AS sign"
        "  FROM dims_i CROSS JOIN dims_j),"
        f" comps AS (SELECT {id_col},"
        f"  generate_subscripts({vec_col}, 1) - 1 AS i,"
        f"  unnest({vec_col}) AS x FROM {table})"
        f" SELECT c.{id_col}, s.j,"
        " round(CAST(sum(CAST(CAST(c.x AS DOUBLE) * s.sign AS DECIMAL(38,12)))"
        f"  AS DOUBLE) / sqrt({d_out}), 6) AS comp"
        " FROM comps c JOIN signs s ON c.i = s.i"
        f" GROUP BY c.{id_col}, s.j ORDER BY c.{id_col}, s.j"
    )
