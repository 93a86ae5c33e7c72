"""Johnson–Lindenstrauss random projection for embedding columns.

Dimensionality reduction is the standard pre-step before similarity
search at corpus scale: a sign (Rademacher) random projection
``y = R·x / √d'`` with R_ij ∈ {−1,+1} preserves pairwise distances
within (1±ε) for d' = O(log n / ε²) [Achlioptas, JCSS'03 — database-
friendly random projections], and shrinks every downstream shuffle,
index, and broadcast by d/d'.

Determinism (the property every operator in this package holds): the
projection matrix is *derived, not stored* — the sign of R_ij is the
top bit of ``md5("i:j")``'s first hex digit, so any process (and the
DuckDB oracle) regenerates the identical matrix from the dimension
pair alone. No RNG state, no broadcast of a matrix blob, bit-stable
across runs and cluster sizes.

Plan shape: a projection is per-ROW arithmetic — no shuffle belongs in
it at all. The d×d' signs are computed at plan-build time (Python
``hashlib.md5`` and SQL ``md5`` agree byte-for-byte on "i:j") and
embedded as +/− terms of d' fixed-order sum expressions over the
array elements: ONE whole-stage-codegen Project per vector, zero
exchanges, zero joins (first cut used posexplode → broadcast sign
join → decimal hash aggregate — 16× row inflation through the join
and a 51 M-row partial aggregate at sf0.1; 2.65 s vs 0.4 s for the
same math as a projection). Per-row left-to-right double summation is
order-fixed by the expression itself, so cross-engine bit-equality
needs no decimal detour — the oracle writes the identical term chain.

Output is long format (vec_id, j, comp) via one map-side posexplode
of the d' computed components: it hash-compares directly, and
`jl_project_vectors` re-assembles arrays for downstream similarity
operators.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def jl_sign(i: int, j: int) -> int:
    """+1 if the first hex digit of md5("i:j") is 0-7 else −1 — the
    same derivation the SQL engines replay (top bit of the digest)."""
    return 1 if hashlib.md5(f"{i}:{j}".encode()).hexdigest()[0] <= "7" else -1


def sign_matrix(spark: SparkSession, d: int, d_out: int) -> DataFrame:
    """(i, j, sign): the derived Rademacher matrix as a relation —
    for inspection/tests; `jl_project` embeds the same signs as plan
    constants instead of joining this."""
    rows = [
        (i, j, jl_sign(i, j)) for i in range(d) for j in range(d_out)
    ]
    return spark.createDataFrame(rows, "i int, j int, sign int")


def _component_terms(d: int, j: int, elem: "callable") -> str:
    """The fixed-order sum chain for output component j:
    ``±x_0 ± x_1 … ± x_{d-1}`` with elem(i) rendering the i-th array
    element as a double. Left-associative in both engines, so the
    double arithmetic is bit-identical."""
    parts = []
    for i in range(d):
        sign = "+" if jl_sign(i, j) > 0 else "-"
        parts.append(f"{sign} {elem(i)}")
    return " ".join(parts).lstrip("+ ")


def jl_project(
    df: DataFrame,
    d_out: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sort: bool = True,
) -> DataFrame:
    """(id, j, comp): each input vector projected to ``d_out``
    components, ``comp_j = round((Σ_i ±x_i) / √d_out, 6)`` with the
    sign pattern derived from md5 of the dimension pair.

    Pure map-side: one Project computes all components per row, one
    posexplode emits the long format — zero shuffles (the trailing
    orderBy is presentation only). Input vectors must have the
    uniform dimension of the first row (fixed-width embedding
    columns — the contract every similarity operator here shares).
    """
    if d_out < 1:
        raise ValueError(f"need d_out >= 1, got {d_out}")
    first = df.select(F.size(vec_col).alias("d")).limit(1).collect()
    if not first:
        raise ValueError("empty input — cannot infer vector dimension")
    dim = first[0]["d"]
    if not dim or dim < 1:
        raise ValueError(f"cannot project empty/NULL vectors (d={dim})")
    scale = float(d_out) ** 0.5

    # Each component is a FOLD over the signed elements, not an
    # inlined ±x_0 ± x_1 … term chain: multiplying by ±1.0 is exact
    # and left-to-right fold addition is the same IEEE order, so the
    # values are bit-identical to the chain form — but the plan
    # carries d_out small loops instead of d_out×d inlined terms,
    # which cut per-job Catalyst/codegen overhead ~3× at 64→16
    # (measured r7: the chain plan cost ~2.3 s PER JOB at sf0.1 on
    # 6k rows — optimizer time, not arithmetic). The DuckDB twin
    # folds through list_reduce with the same prepended-0.0 seed,
    # the bridge lsh_sig_ctes_sql proved bit-exact.
    def signs_array(j: int) -> str:
        return (
            "array("
            + ",".join(
                "1.0D" if jl_sign(i, j) > 0 else "-1.0D"
                for i in range(dim)
            )
            + ")"
        )

    comps = F.array(
        *[
            F.expr(
                f"round(aggregate(zip_with(cast({vec_col} as"
                f" array<double>), {signs_array(j)}, (x, s) -> x * s),"
                f" 0D, (acc, x) -> acc + x) / {scale!r}, 6)"
            )
            for j in range(d_out)
        ]
    )
    out = df.select(F.col(id_col), comps.alias("_c")).select(
        id_col, F.posexplode("_c").alias("j", "comp")
    )
    # presentation sort only — pass sort=False when feeding another
    # operator (jl_project_vectors regroups and must not pay it)
    return out.orderBy(id_col, "j") if sort else out


def jl_project_vectors(
    df: DataFrame,
    d_out: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, reduced): the projection as an ordered ``array<double>``
    for downstream similarity operators (`cosine_topk`, `pq_topk`, …
    accept any array column). Same per-row Project, no explode."""
    long = jl_project(df, d_out, id_col=id_col, vec_col=vec_col, sort=False)
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
    """DuckDB oracle twin of :func:`jl_project` — the same derived
    signs (computed here in Python from the same md5 rule), the same
    left-to-right fold order (list_reduce over a prepended 0.0 seed ≡
    Spark's ``aggregate(…, 0D, (acc,x) -> acc+x)``), the same single
    rounded divide."""
    scale = float(d_out) ** 0.5

    selects = []
    for j in range(d_out):
        signs = "[" + ",".join(
            "1.0" if jl_sign(i, j) > 0 else "-1.0" for i in range(d_in)
        ) + "]"
        fold = (
            "list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
            f" list_transform(CAST({vec_col} AS DOUBLE[]),"
            f" (x, i) -> x * ({signs}[i]))), (acc, x) -> acc + x)"
        )
        selects.append(
            f"SELECT {id_col}, {j} AS j,"
            f" round(({fold}) / {scale!r}, 6) AS comp FROM {table}"
        )
    return (
        " UNION ALL ".join(selects) + f" ORDER BY {id_col}, j"
    )
