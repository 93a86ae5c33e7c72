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

from minisql_engine_spark.operators.portable_round import fx6 as _fx6
from minisql_engine_spark.operators.portable_round import fx6g as _fx6g


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
    mode: str = "complete",
) -> DataFrame:
    """(col_a, col_b, n, r) — pairwise Pearson correlation over
    ``cols``, ORDER-INDEPENDENT and oracle-bit-equal.

    Spark's ``corr`` (and DuckDB's) accumulate doubles in partition
    order, so the last ulp varies run to run under AQE/repartition.
    This formulation instead aggregates the sufficient sums Σx, Σy,
    Σxy, Σx², Σy² as DECIMAL(38,12) — exact and commutative, the same
    policy as the IVF centroid means — and evaluates

        r = (n·Σxy − Σx·Σy) / sqrt(n·Σx² − (Σx)²) / sqrt(n·Σy² − (Σy)²)

    in double from those exact inputs, rounded to 6. Zero-variance
    pairs yield NULL (an unguarded divide is an ANSI-mode error).

    ``mode`` picks the NULL policy, which is ALSO the cost knob —
    decimal sums bypass whole-stage-codegen long arithmetic
    (measured ~0.27 s per sum over 600 k rows), so the aggregate
    count dominates:

    * ``"complete"`` (default): listwise deletion — rows with a NULL
      in ANY of ``cols`` drop once, so every pair SHARES the
      per-column Σx/Σx² (k + k + C(k,2) decimal sums; 14 for k=4,
      measured 9.4 s → ~4 s at sf0.1). The semantics of a standard
      correlation MATRIX (one consistent sample).
    * ``"pairwise"``: per-pair deletion — each pair keeps every row
      where ITS two columns are non-null (5·C(k,2) decimal sums).

    Both run as ONE single-row aggregate over the scan shared by all
    pairs; with no NULLs present the two modes agree exactly."""
    from itertools import combinations

    from minisql_engine_spark.fanout import fan_out

    if mode not in ("complete", "pairwise"):
        raise ValueError(f"mode must be complete|pairwise, got {mode}")
    pairs = list(combinations(cols, 2))
    d = "decimal(38,12)"

    if mode == "complete":
        ok = None
        for c in cols:
            nn = F.col(c).isNotNull()
            ok = nn if ok is None else (ok & nn)
        # the decimal casts + sums are the operator's dominant map
        # cost and commutative by construction — fan the (projected)
        # input out so the partial aggregate runs on every core
        # instead of inheriting a single-row-group scan's one task
        # (guide §2.5; no-op at scale, see fanout.py; sums exact and
        # order-independent, so the result is bit-identical)
        base = fan_out(df.filter(ok).select(*cols))
        aggs = [F.count(F.lit(1)).cast("bigint").alias("n_all")]
        for c in cols:
            x = F.col(c).cast("double")
            aggs += [
                F.sum(x.cast(d)).alias(f"s_{c}"),
                F.sum((x * x).cast(d)).alias(f"ss_{c}"),
            ]
        for a, b in pairs:
            x = F.col(a).cast("double")
            y = F.col(b).cast("double")
            aggs.append(F.sum((x * y).cast(d)).alias(f"sp_{a}__{b}"))
        wide = base.agg(*aggs)

        def parts(a, b):
            return (
                F.col("n_all"),
                F.col(f"s_{a}"), F.col(f"s_{b}"),
                F.col(f"sp_{a}__{b}"),
                F.col(f"ss_{a}"), F.col(f"ss_{b}"),
            )
    else:
        aggs = []
        for a, b in pairs:
            x = F.col(a).cast("double")
            y = F.col(b).cast("double")
            both = x.isNotNull() & y.isNotNull()
            xs = F.when(both, x)
            ys = F.when(both, y)
            tag = f"{a}__{b}"
            aggs += [
                F.count(F.when(both, 1)).cast("bigint").alias(f"n_{tag}"),
                F.sum(xs.cast(d)).alias(f"sx_{tag}"),
                F.sum(ys.cast(d)).alias(f"sy_{tag}"),
                F.sum((xs * ys).cast(d)).alias(f"sxy_{tag}"),
                F.sum((xs * xs).cast(d)).alias(f"sxx_{tag}"),
                F.sum((ys * ys).cast(d)).alias(f"syy_{tag}"),
            ]
        wide = fan_out(df.select(*cols)).agg(*aggs)

        def parts(a, b):
            tag = f"{a}__{b}"
            return (
                F.col(f"n_{tag}"),
                F.col(f"sx_{tag}"), F.col(f"sy_{tag}"),
                F.col(f"sxy_{tag}"),
                F.col(f"sxx_{tag}"), F.col(f"syy_{tag}"),
            )

    rows = []
    for a, b in pairs:
        nc, sxc, syc, sxyc, sxxc, syyc = parts(a, b)
        n = nc.cast("double")
        sx = sxc.cast("double")
        sy = syc.cast("double")
        sxy = sxyc.cast("double")
        sxx = sxxc.cast("double")
        syy = syyc.cast("double")
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        # zero variance → r undefined (NULL, the standard corr
        # semantics); an unguarded divide is an ANSI-mode error
        r = F.when(
            (vx > 0) & (vy > 0),
            F.round((n * sxy - sx * sy) / F.sqrt(vx) / F.sqrt(vy), 6),
        )
        rows.append(
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                nc.alias("n"),
                r.alias("r"),
            )
        )
    return wide.select(
        F.explode(F.array(*rows)).alias("_p")
    ).select("_p.col_a", "_p.col_b", "_p.n", "_p.r")


def exact_corr_sql(
    table: str, cols: list[str], mode: str = "complete"
) -> str:
    """DuckDB oracle twin of :func:`exact_corr` — identical decimal
    sums and double arithmetic, term for term, in both modes."""
    from itertools import combinations

    if mode not in ("complete", "pairwise"):
        raise ValueError(f"mode must be complete|pairwise, got {mode}")
    d = "DECIMAL(38,12)"
    rexpr = (
        "CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx > 0"
        "  AND CAST(n AS DOUBLE) * syy - sy * sy > 0"
        " THEN round((CAST(n AS DOUBLE) * sxy - sx * sy)"
        "  / sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)"
        "  / sqrt(CAST(n AS DOUBLE) * syy - sy * sy), 6)"
        " END AS r"
    )
    selects = []
    if mode == "complete":
        notnull = " AND ".join(f"{c} IS NOT NULL" for c in cols)
        aggs = ["CAST(count(*) AS BIGINT) AS n_all"]
        for c in cols:
            aggs += [
                f"CAST(sum(CAST(CAST({c} AS DOUBLE) AS {d}))"
                f" AS DOUBLE) AS s_{c}",
                f"CAST(sum(CAST(CAST({c} AS DOUBLE)"
                f" * CAST({c} AS DOUBLE) AS {d}))"
                f" AS DOUBLE) AS ss_{c}",
            ]
        for a, b in combinations(cols, 2):
            aggs.append(
                f"CAST(sum(CAST(CAST({a} AS DOUBLE)"
                f" * CAST({b} AS DOUBLE) AS {d}))"
                f" AS DOUBLE) AS sp_{a}__{b}"
            )
        wide = (
            f"SELECT {', '.join(aggs)} FROM {table} WHERE {notnull}"
        )
        for a, b in combinations(cols, 2):
            selects.append(
                f"SELECT '{a}' AS col_a, '{b}' AS col_b, n,"
                f" {rexpr}"
                f" FROM (SELECT n_all AS n, s_{a} AS sx, s_{b} AS sy,"
                f"  sp_{a}__{b} AS sxy, ss_{a} AS sxx, ss_{b} AS syy"
                f"  FROM wide_corr)"
            )
        return (
            f"WITH wide_corr AS MATERIALIZED ({wide}) "
            + " UNION ALL ".join(selects)
        )
    for a, b in combinations(cols, 2):
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
            f"SELECT '{a}' AS col_a, '{b}' AS col_b, n, {rexpr}"
            f" FROM ({base})"
        )
    return " UNION ALL ".join(selects)


def winsorize(
    df: DataFrame,
    col: str,
    p_lo: float = 0.01,
    p_hi: float = 0.99,
    group_by: str | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """All input columns plus ``<col>_w`` — values clipped to the
    exact [p_lo, p_hi] quantiles (optionally per group): the standard
    outlier treatment before training a regressor / computing means
    on heavy-tailed measures. NULLs pass through NULL.

    Plan: ONE percentile aggregate (per group — sort-based,
    spillable, the ``exact_quantiles`` shape) joined back — broadcast
    when ungrouped (single row), hash join on the group key
    otherwise; the clip itself is a map-side ``least/greatest``.
    Quantile arithmetic is the verified-portable interpolation shared
    with :func:`exact_quantiles`, so the oracle reproduces every clip
    bound bit-for-bit."""
    if not 0.0 <= p_lo < p_hi <= 1.0:
        raise ValueError(f"need 0 <= p_lo < p_hi <= 1, got {p_lo}, {p_hi}")
    out_col = out_col or f"{col}_w"
    bounds_cols = [
        F.expr(f"percentile({col}, {p_lo!r})").alias("_blo"),
        F.expr(f"percentile({col}, {p_hi!r})").alias("_bhi"),
    ]
    # explicit NULL guard: both engines' least/greatest IGNORE NULL
    # arguments (a NULL value would silently clip to the lower bound)
    clip = F.when(
        F.col(col).isNotNull(),
        _fx6g(
            F.least(
                F.greatest(F.col(col).cast("double"), F.col("_blo")),
                F.col("_bhi"),
            )
        ),
    ).alias(out_col)
    if group_by is None:
        bounds = df.agg(*bounds_cols)
        return df.crossJoin(F.broadcast(bounds)).select(
            *df.columns, clip
        )
    bounds = df.groupBy(group_by).agg(*bounds_cols)
    return df.join(bounds, group_by).select(*df.columns, clip)


def winsorize_sql(
    table: str,
    col: str,
    p_lo: float = 0.01,
    p_hi: float = 0.99,
    group_by: str | None = None,
    out_col: str | None = None,
) -> str:
    """DuckDB oracle twin of :func:`winsorize`."""
    if not 0.0 <= p_lo < p_hi <= 1.0:
        raise ValueError(f"need 0 <= p_lo < p_hi <= 1, got {p_lo}, {p_hi}")
    out_col = out_col or f"{col}_w"
    if group_by is None:
        return (
            f"WITH b AS (SELECT quantile_cont({col}, {p_lo!r}) AS blo,"
            f" quantile_cont({col}, {p_hi!r}) AS bhi FROM {table})"
            f" SELECT {table}.*,"
            f" CASE WHEN {col} IS NOT NULL THEN"
            f" CASE WHEN abs(least(greatest(CAST({col} AS DOUBLE),"
            f"  blo), bhi)) < 1e12"
            f" THEN floor(least(greatest(CAST({col} AS DOUBLE), blo),"
            f"  bhi) * 1e6 + 0.5) / 1e6"
            f" ELSE least(greatest(CAST({col} AS DOUBLE), blo), bhi)"
            f" END END AS {out_col} FROM {table} CROSS JOIN b"
        )
    return (
        f"WITH b AS (SELECT {group_by},"
        f" quantile_cont({col}, {p_lo!r}) AS blo,"
        f" quantile_cont({col}, {p_hi!r}) AS bhi FROM {table}"
        f" GROUP BY {group_by})"
        f" SELECT {table}.*,"
        f" CASE WHEN {col} IS NOT NULL THEN"
        f" CASE WHEN abs(least(greatest(CAST({col} AS DOUBLE),"
        f"  blo), bhi)) < 1e12"
        f" THEN floor(least(greatest(CAST({col} AS DOUBLE), blo),"
        f"  bhi) * 1e6 + 0.5) / 1e6"
        f" ELSE least(greatest(CAST({col} AS DOUBLE), blo), bhi)"
        f" END END AS {out_col} FROM {table} JOIN b USING ({group_by})"
    )


def mad_outliers(
    df: DataFrame,
    col: str,
    k: float = 3.5,
    group_by: str | None = None,
) -> DataFrame:
    """All input columns + ``(med, mad, is_outlier)`` — the robust
    (median / median-absolute-deviation) outlier flag, optionally per
    group: the heavy-tail-safe alternative to z-scores for curation
    audits (mean/stddev are themselves dragged by the outliers they
    should catch; the median/MAD breakdown point is 50%).

    ``is_outlier ⇔ |x − med| > k · MAD`` with the exact interpolated
    median both engines share (see :func:`exact_quantiles`); k = 3.5
    is the conventional consistency-scaled cutoff. Plan: TWO
    percentile aggregates (the median, then the median of absolute
    deviations — MAD is inherently two-pass) joined back, broadcast
    when ungrouped; the flag itself is a map-side projection. NULLs
    flag NULL. A zero-MAD group (>50% identical values) flags any
    deviation from the median, the standard degenerate-MAD rule.
    """
    x = F.col(col).cast("double")
    med_agg = F.expr(f"percentile({col}, 0.5)").alias("_med")
    if group_by is None:
        med = df.agg(med_agg)
        with_med = df.crossJoin(F.broadcast(med))
    else:
        med = df.groupBy(group_by).agg(med_agg)
        with_med = df.join(med, group_by)
    dev = with_med.withColumn("_adev", F.abs(x - F.col("_med")))
    mad_agg = F.expr("percentile(_adev, 0.5)").alias("_mad")
    if group_by is None:
        mad = dev.agg(mad_agg)
        scored = dev.crossJoin(F.broadcast(mad))
    else:
        mad = dev.groupBy(group_by).agg(mad_agg)
        scored = dev.join(mad, group_by)
    return scored.select(
        *df.columns,
        _fx6g(F.col("_med")).alias("med"),
        _fx6g(F.col("_mad")).alias("mad"),
        F.when(
            x.isNotNull(),
            F.when(F.col("_mad") > 0, F.abs(x - F.col("_med")) > k * F.col("_mad"))
            .otherwise(F.abs(x - F.col("_med")) > 0),
        ).alias("is_outlier"),
    )


def mad_outliers_sql(
    table: str,
    col: str,
    k: float = 3.5,
    group_by: str | None = None,
) -> str:
    """DuckDB oracle twin of :func:`mad_outliers` — same two
    percentile passes, same degenerate-MAD rule."""
    x = f"CAST({col} AS DOUBLE)"
    if group_by is None:
        return (
            f"WITH m AS (SELECT quantile_cont({col}, 0.5) AS _med FROM {table}),"
            f" d AS (SELECT {table}.*, _med, abs({x} - _med) AS _adev"
            f"  FROM {table} CROSS JOIN m),"
            " md AS (SELECT quantile_cont(_adev, 0.5) AS _mad FROM d)"
            f" SELECT d.* EXCLUDE (_med, _adev),"
            " CASE WHEN abs(_med) < 1e12 THEN floor(_med * 1e6 + 0.5) / 1e6"
        "  ELSE _med END AS med,"
        " CASE WHEN abs(_mad) < 1e12 THEN floor(_mad * 1e6 + 0.5) / 1e6"
        "  ELSE _mad END AS mad,"
            f" CASE WHEN {col} IS NOT NULL THEN"
            f"  CASE WHEN _mad > 0 THEN abs({x} - _med) > {k!r} * _mad"
            f"   ELSE abs({x} - _med) > 0 END END AS is_outlier"
            " FROM d CROSS JOIN md"
        )
    return (
        f"WITH m AS (SELECT {group_by}, quantile_cont({col}, 0.5) AS _med"
        f"  FROM {table} GROUP BY {group_by}),"
        f" d AS (SELECT {table}.*, _med, abs({x} - _med) AS _adev"
        f"  FROM {table} JOIN m USING ({group_by})),"
        f" md AS (SELECT {group_by}, quantile_cont(_adev, 0.5) AS _mad"
        f"  FROM d GROUP BY {group_by})"
        f" SELECT d.* EXCLUDE (_med, _adev),"
        " CASE WHEN abs(_med) < 1e12 THEN floor(_med * 1e6 + 0.5) / 1e6"
        "  ELSE _med END AS med,"
        " CASE WHEN abs(_mad) < 1e12 THEN floor(_mad * 1e6 + 0.5) / 1e6"
        "  ELSE _mad END AS mad,"
        f" CASE WHEN {col} IS NOT NULL THEN"
        f"  CASE WHEN _mad > 0 THEN abs({x} - _med) > {k!r} * _mad"
        f"   ELSE abs({x} - _med) > 0 END END AS is_outlier"
        f" FROM d JOIN md USING ({group_by})"
    )


def histogram_quantiles(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_buckets: int = 128,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95, 0.99),
) -> DataFrame:
    """Approximate quantiles FROM the fixed-bucket histogram — the
    mergeable scale path next to :func:`exact_quantiles`' full sort.

    The histogram is one map-side pass + an ``n_buckets``-row
    aggregate that merges across shards by adding counts (the same
    distributive-state property as the sketch family), so quantile
    monitoring over 100 TB costs one cheap aggregate instead of a
    per-group sort — at the price of ≤ one bucket width of error.
    Estimator: target rank ``p·N`` falls in the unique bucket with
    ``cum_prev < p·N ≤ cum``; linear interpolation inside it
    (sentinel under/overflow buckets clamp to [lo, hi]).

    Output rides the exact interpolated quantile along per prob:
    (prob, est, exact, abs_err, within_two_widths) — the error bound
    is part of the hashed result. (Two widths, not one: the exact
    estimator interpolates at rank ``p·(N−1)``, which can sit one
    bucket adjacent to the CDF-inversion bucket at boundaries.)

    All per-prob arithmetic runs on the ≤ ``n_buckets+2``-row
    histogram relation (broadcast-sized by construction); the single
    global window is over that tiny relation, never the data."""
    from pyspark.sql.window import Window

    if not all(0.0 < p <= 1.0 for p in probs):
        raise ValueError(f"probs must lie in (0, 1], got {probs}")
    width = (hi - lo) / n_buckets
    hist = value_histogram(df, col, lo, hi, n_buckets)
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "bucket",
        "n",
        F.sum("n").over(w).cast("double").alias("cum"),
    ).withColumn("cum_prev", F.col("cum") - F.col("n"))
    total = cum.agg(F.sum("n").cast("double").alias("ntot"))
    pl = F.array(*[F.lit(float(p)) for p in probs])
    targets = (
        total.select(F.explode(pl).alias("prob"), "ntot")
        .withColumn("_t", F.col("prob") * F.col("ntot"))
    )
    picked = targets.join(
        F.broadcast(cum),
        (F.col("cum_prev") < F.col("_t")) & (F.col("cum") >= F.col("_t")),
    )
    est = picked.select(
        "prob",
        F.when(F.col("bucket") < 0, F.lit(float(lo)))
        .when(F.col("bucket") >= n_buckets, F.lit(float(hi)))
        .otherwise(
            F.lit(float(lo))
            + F.col("bucket") * F.lit(width)
            + F.lit(width)
            * (F.col("_t") - F.col("cum_prev"))
            / F.col("n").cast("double")
        )
        .alias("_est"),
    )
    exact = df.agg(
        *[
            F.expr(f"percentile({col}, {p!r})").alias(f"_x{i}")
            for i, p in enumerate(probs)
        ]
    )
    exact_long = exact.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(float(p)).alias("prob"),
                        F.col(f"_x{i}").alias("_exact"),
                    )
                    for i, p in enumerate(probs)
                ]
            )
        ).alias("s")
    ).select("s.prob", "s._exact")
    err = F.abs(F.col("_est") - F.col("_exact"))
    return (
        est.join(F.broadcast(exact_long), "prob")
        .select(
            "prob",
            _fx6g(F.col("_est")).alias("est"),
            _fx6g(F.col("_exact")).alias("exact"),
            _fx6g(err).alias("abs_err"),
            (err <= 2.0 * width).alias("within_two_widths"),
        )
        .orderBy("prob")
    )


def histogram_quantiles_sql(
    table: str,
    col: str,
    lo: float,
    hi: float,
    n_buckets: int = 128,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95, 0.99),
) -> str:
    """DuckDB oracle twin of :func:`histogram_quantiles` — identical
    bucket, cumulative, target, and interpolation arithmetic."""
    width = (hi - lo) / n_buckets
    v = f"CAST({col} AS DOUBLE)"
    bucket = (
        f"CAST(CASE WHEN {v} < {lo!r} THEN -1"
        f" WHEN {v} >= {hi!r} THEN {n_buckets}"
        f" ELSE floor(({v} - {lo!r}) / {width!r}) END AS BIGINT)"
    )
    pvals = ", ".join(f"({p!r})" for p in probs)
    exact_cols = ", ".join(
        f"quantile_cont({col}, {p!r}) AS x{i}"
        for i, p in enumerate(probs)
    )
    exact_rows = " UNION ALL ".join(
        f"SELECT {p!r} AS prob, x{i} AS exact_v FROM ex"
        for i, p in enumerate(probs)
    )
    return (
        f"WITH hist AS (SELECT {bucket} AS bucket,"
        f"  CAST(count(*) AS BIGINT) AS n FROM {table}"
        f"  WHERE {col} IS NOT NULL GROUP BY 1),"
        " cum0 AS (SELECT bucket, n,"
        "  CAST(sum(n) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED"
        "   PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum FROM hist),"
        " cum AS (SELECT bucket, n, cum, cum - n AS cum_prev"
        "  FROM cum0),"
        " tot AS (SELECT CAST(sum(n) AS DOUBLE) AS ntot FROM hist),"
        f" probs AS (SELECT prob, prob * ntot AS t FROM"
        f"  (VALUES {pvals}) p(prob) CROSS JOIN tot),"
        " picked AS (SELECT prob, t, bucket, n, cum, cum_prev"
        "  FROM probs JOIN cum ON cum_prev < t AND cum >= t),"
        " est AS (SELECT prob,"
        f"  CASE WHEN bucket < 0 THEN {float(lo)!r}"
        f"   WHEN bucket >= {n_buckets} THEN {float(hi)!r}"
        f"   ELSE {float(lo)!r} + bucket * {width!r}"
        f"    + {width!r} * (t - cum_prev) / CAST(n AS DOUBLE)"
        "   END AS est_v FROM picked),"
        f" ex AS (SELECT {exact_cols} FROM {table}),"
        f" exl AS ({exact_rows})"
        " SELECT prob,"
        "  CASE WHEN abs(est_v) < 1e12 THEN floor(est_v * 1e6 + 0.5) / 1e6"
        "   ELSE est_v END AS est,"
        "  CASE WHEN abs(exact_v) < 1e12"
        "   THEN floor(exact_v * 1e6 + 0.5) / 1e6"
        "   ELSE exact_v END AS exact,"
        "  CASE WHEN abs(est_v - exact_v) < 1e12"
        "   THEN floor(abs(est_v - exact_v) * 1e6 + 0.5) / 1e6"
        "   ELSE abs(est_v - exact_v) END AS abs_err,"
        f"  (abs(est_v - exact_v) <= {2.0 * width!r})"
        "   AS within_two_widths"
        " FROM est JOIN exl USING (prob) ORDER BY prob"
    )
