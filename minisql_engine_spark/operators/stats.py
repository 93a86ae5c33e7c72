"""Distribution statistics over numeric columns.

``value_histogram`` is the fixed-bucket histogram a data-quality
dashboard wants over a 100 TB column: ONE pass, map-side bucket
assignment (pure arithmetic — portable to any engine, unlike
``width_bucket`` which DuckDB lacks), partial aggregation, and a
``n_buckets``-row result. Underflow/overflow get sentinel buckets -1
and ``n_buckets`` so no value is silently dropped — a histogram that
drops out-of-range rows hides exactly the anomalies it exists to
find.

Bucket arithmetic is double subtraction/division/floor — IEEE-
identical across engines, so the DuckDB oracle reproduces bucket
boundaries bit-for-bit (values exactly on a boundary land in the
same bucket in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def value_histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_buckets: int = 20,
) -> DataFrame:
    """(bucket, bucket_lo, bucket_hi, n) — counts per equal-width
    bucket of [lo, hi); bucket -1 = underflow, ``n_buckets`` =
    overflow, NULLs excluded."""
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    if n_buckets <= 0:
        raise ValueError(f"need n_buckets > 0, got {n_buckets}")
    width = (hi - lo) / n_buckets
    v = F.col(col).cast("double")
    bucket = (
        F.when(v < lo, F.lit(-1))
        .when(v >= hi, F.lit(n_buckets))
        .otherwise(F.floor((v - F.lit(lo)) / F.lit(width)))
        .cast("bigint")
    )
    return (
        df.filter(v.isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count("*").cast("bigint").alias("n"))
        .select(
            "bucket",
            (F.lit(lo) + F.col("bucket") * F.lit(width)).alias("bucket_lo"),
            (F.lit(lo) + (F.col("bucket") + 1) * F.lit(width)).alias(
                "bucket_hi"
            ),
            "n",
        )
        .orderBy("bucket")
    )


def value_histogram_sql(
    table: str,
    col: str,
    lo: float,
    hi: float,
    n_buckets: int = 20,
) -> str:
    """DuckDB oracle twin of :func:`value_histogram` — identical
    arithmetic, term for term."""
    width = (hi - lo) / n_buckets
    v = f"CAST({col} AS DOUBLE)"
    bucket = (
        f"CAST(CASE WHEN {v} < {lo!r} THEN -1"
        f" WHEN {v} >= {hi!r} THEN {n_buckets}"
        f" ELSE floor(({v} - {lo!r}) / {width!r}) END AS BIGINT)"
    )
    return (
        f"SELECT bucket, {lo!r} + bucket * {width!r} AS bucket_lo,"
        f" {lo!r} + (bucket + 1) * {width!r} AS bucket_hi,"
        " CAST(n AS BIGINT) AS n FROM ("
        f"  SELECT {bucket} AS bucket, count(*) AS n FROM {table}"
        f"  WHERE {col} IS NOT NULL GROUP BY 1) ORDER BY bucket"
    )


def exact_quantiles(
    df: DataFrame,
    col: str,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95, 0.99),
    group_by: str | None = None,
) -> DataFrame:
    """Exact linearly-interpolated quantiles (one column per prob,
    named ``p25``-style), optionally per group.

    Spark's ``percentile`` and DuckDB's ``quantile_cont`` implement
    the same rank interpolation ``a + (b − a)·frac`` over the sorted
    values, and it reproduces bit-for-bit on identical doubles
    (verified in tests) — so unlike sketch quantiles this surface IS
    oracle-checkable. Cost is a full sort of each group's values:
    right for data-quality audits at any scale (sort-based agg,
    spillable), wrong for interactive dashboards — use
    ``percentile_approx`` (KLL) there, gated like ``approx_distinct``.
    """
    cols = [
        F.expr(f"percentile({col}, {p!r})").alias(_pname(p))
        for p in probs
    ]
    if group_by is None:
        return df.agg(*cols)
    return df.groupBy(group_by).agg(*cols)


def exact_quantiles_sql(
    table: str,
    col: str,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95, 0.99),
    group_by: str | None = None,
) -> str:
    """DuckDB oracle twin of :func:`exact_quantiles`."""
    cols = ", ".join(
        f"quantile_cont({col}, {p!r}) AS {_pname(p)}" for p in probs
    )
    if group_by is None:
        return f"SELECT {cols} FROM {table}"
    return (
        f"SELECT {group_by}, {cols} FROM {table} GROUP BY {group_by}"
    )


def _pname(p: float) -> str:
    """0.25 → 'p25', 0.999 → 'p99_9'."""
    s = f"{p * 100:g}".replace(".", "_")
    return f"p{s}"


def exact_corr(
    df: DataFrame,
    cols: list[str],
) -> DataFrame:
    """(col_a, col_b, n, r) — pairwise Pearson correlation over
    ``cols``, ORDER-INDEPENDENT and oracle-bit-equal.

    Spark's ``corr`` (and DuckDB's) accumulate doubles in partition
    order, so the last ulp varies run to run under AQE/repartition.
    This formulation instead aggregates the five sufficient sums
    Σx, Σy, Σxy, Σx², Σy² as DECIMAL(38,12) — exact and commutative,
    the same policy as the IVF centroid means — and evaluates

        r = (n·Σxy − Σx·Σy) / sqrt(n·Σx² − (Σx)²) / sqrt(n·Σy² − (Σy)²)

    in double from those exact inputs, rounded to 6. Rows where any
    participating column is NULL are dropped pair-wise (the standard
    corr semantics). One single-row aggregate over the scan — all the
    pairs share it; no shuffle beyond the 1-row partial-agg exchange.

    Headroom: DECIMAL(38,12) holds |Σx²| < 10²⁶ — e.g. values to 10⁵
    over 10¹⁶ rows; products x·y of ≤2-decimal inputs are exact in
    double before the cast, so no rounding ambiguity enters."""
    from itertools import combinations

    pairs = list(combinations(cols, 2))
    aggs = []
    for a, b in pairs:
        x = F.col(a).cast("double")
        y = F.col(b).cast("double")
        both = x.isNotNull() & y.isNotNull()
        xs = F.when(both, x)
        ys = F.when(both, y)
        tag = f"{a}__{b}"
        d = "decimal(38,12)"
        aggs += [
            F.count(F.when(both, 1)).cast("bigint").alias(f"n_{tag}"),
            F.sum(xs.cast(d)).alias(f"sx_{tag}"),
            F.sum(ys.cast(d)).alias(f"sy_{tag}"),
            F.sum((xs * ys).cast(d)).alias(f"sxy_{tag}"),
            F.sum((xs * xs).cast(d)).alias(f"sxx_{tag}"),
            F.sum((ys * ys).cast(d)).alias(f"syy_{tag}"),
        ]
    wide = df.agg(*aggs)
    rows = []
    for a, b in pairs:
        tag = f"{a}__{b}"
        n = F.col(f"n_{tag}").cast("double")
        sx = F.col(f"sx_{tag}").cast("double")
        sy = F.col(f"sy_{tag}").cast("double")
        sxy = F.col(f"sxy_{tag}").cast("double")
        sxx = F.col(f"sxx_{tag}").cast("double")
        syy = F.col(f"syy_{tag}").cast("double")
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        # zero variance → r undefined (NULL, the standard corr
        # semantics); an unguarded divide is an ANSI-mode error
        r = F.when(
            (vx > 0) & (vy > 0),
            F.round(
                (n * sxy - sx * sy) / F.sqrt(vx) / F.sqrt(vy), 6
            ),
        )
        rows.append(
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.col(f"n_{tag}").alias("n"),
                r.alias("r"),
            )
        )
    return wide.select(
        F.explode(F.array(*rows)).alias("_p")
    ).select("_p.col_a", "_p.col_b", "_p.n", "_p.r")


def exact_corr_sql(table: str, cols: list[str]) -> str:
    """DuckDB oracle twin of :func:`exact_corr` — identical decimal
    sums and double arithmetic, term for term."""
    from itertools import combinations

    selects = []
    for a, b in combinations(cols, 2):
        d = "DECIMAL(38,12)"
        base = (
            f"SELECT CAST(count(*) AS BIGINT) AS n,"
            f" CAST(sum(CAST(x AS {d})) AS DOUBLE) AS sx,"
            f" CAST(sum(CAST(y AS {d})) AS DOUBLE) AS sy,"
            f" CAST(sum(CAST(x * y AS {d})) AS DOUBLE) AS sxy,"
            f" CAST(sum(CAST(x * x AS {d})) AS DOUBLE) AS sxx,"
            f" CAST(sum(CAST(y * y AS {d})) AS DOUBLE) AS syy"
            f" FROM (SELECT CAST({a} AS DOUBLE) AS x,"
            f"  CAST({b} AS DOUBLE) AS y FROM {table}"
            f"  WHERE {a} IS NOT NULL AND {b} IS NOT NULL)"
        )
        selects.append(
            f"SELECT '{a}' AS col_a, '{b}' AS col_b, n,"
            " CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx > 0"
            "  AND CAST(n AS DOUBLE) * syy - sy * sy > 0"
            " THEN round((CAST(n AS DOUBLE) * sxy - sx * sy)"
            "  / sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)"
            "  / sqrt(CAST(n AS DOUBLE) * syy - sy * sy), 6)"
            " END AS r"
            f" FROM ({base})"
        )
    return " UNION ALL ".join(selects)
