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
