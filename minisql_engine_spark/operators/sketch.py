"""Portable HyperLogLog distinct-count sketch (oracle-replayable).

Spark's native ``approx_count_distinct`` (HLL++) is the production
sketch, but its register layout is engine-internal — the driver entry
for it (``approx_distinct``) can only be rows-only-guarded. This
module is the portable twin: an HLL whose every register derives from
``md5`` through integer arithmetic both engines evaluate identically,
so the ENTIRE sketch — registers, estimator branch, relative error —
is replayed bit-for-bit by the DuckDB oracle and the driver hash-gate
covers the sketch family too (Flajolet et al. 2007 estimator with the
standard small-range linear-counting correction).

Construction (p register bits, m = 2^p registers, 60 md5 bits):

    h   = first 15 hex chars of md5(key)  → 60-bit positive int
    reg = h % m                 (register index)
    w   = h // m                (B = 60 − p remaining bits)
    rho = B − bit_length(w) + 1 (leading-zero rank; w = 0 → B + 1)

``bit_length(w) = length(bin(w))`` — Spark ``bin()`` and DuckDB
``bin()`` both print the minimal binary string, which makes the rank
exact integer arithmetic: no log2 doubles anywhere near a boundary.

The register relation (reg, max_rho) is the sketch: mergeable by
``max`` per register (the distributive-state property that makes it
an aggview measure at 100 TB — union of corpora = max of sketches,
proven by ``test_membership_sketch.py``), at most m rows, broadcast-
sized for any p ≤ 20.

Scale note: the full-precision estimate touches each key once (one
hash aggregate with map-side partials collapsing to ≤ m rows) —
exactly what a 1000-executor COUNT DISTINCT over 100 TB cannot afford
to do exactly (its exchange carries every distinct key; this one
carries ≤ m·partitions partial rows).

Float policy: the harmonic-sum estimator is evaluated in one
deterministic aggregate per engine and round(6)-ed at the comparison
edge (package rule; same stance as ``operators/lm_score.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from minisql_engine_spark.operators.portable_round import fx6g as _fx6g

#: 2^10 registers — 1.04/sqrt(m) ≈ 3.25% expected standard error.
DEFAULT_P = 10


def _alpha(m: int) -> float:
    # Flajolet's bias constant; m >= 128 branch (p >= 7).
    return 0.7213 / (1.0 + 1.079 / m)


def hll_sketch(
    df: DataFrame, key_expr: F.Column, p: int = DEFAULT_P
) -> DataFrame:
    """(reg, max_rho) register relation over the keys (≤ 2^p rows)."""
    m = 1 << p
    b = 60 - p
    h = F.conv(F.substring(F.md5(key_expr), 1, 15), 16, 10).cast(
        "bigint"
    )
    hashed = df.select(h.alias("_h"))
    # exact integer split: reg = low p bits, w = high bits
    reg = F.col("_h").bitwiseAND(F.lit(m - 1))
    w = F.shiftright(F.col("_h"), p)
    rho = F.when(w == 0, F.lit(b + 1)).otherwise(
        F.lit(b) - F.length(F.bin(w)) + 1
    )
    return (
        hashed.select(reg.alias("reg"), rho.alias("rho"))
        .groupBy("reg")
        .agg(F.max("rho").cast("int").alias("max_rho"))
    )


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union sketch = per-register max — the distributive merge."""
    return (
        a.unionByName(b)
        .groupBy("reg")
        .agg(F.max("max_rho").cast("int").alias("max_rho"))
    )


def hll_estimate(sketch: DataFrame, p: int = DEFAULT_P) -> DataFrame:
    """One-row (m, n_present, estimate) from a register relation.

    Raw estimator alpha·m²/Σ2^−M_j (absent registers contribute
    2^0 = 1 each); linear counting m·ln(m/zeros) below 2.5m when any
    register is empty — the standard small-range correction, and an
    exact branch decision both engines replay identically."""
    m = 1 << p
    agg = sketch.agg(
        F.count("*").cast("bigint").alias("n_present"),
        (
            F.sum(
                F.pow(F.lit(2.0), F.lit(63) - F.col("max_rho")).cast(
                    "decimal(38,0)"
                )
            ).cast("double")
            / F.lit(9223372036854775808.0)
        ).alias("_s"),
    )
    raw = (
        F.lit(_alpha(m) * m * m)
        / (F.col("_s") + (F.lit(m) - F.col("n_present")))
    )
    zeros = (F.lit(m) - F.col("n_present")).cast("double")
    est = F.when(
        (raw <= 2.5 * m) & (F.col("n_present") < m),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select(
        F.lit(m).cast("bigint").alias("m"),
        "n_present",
        _fx6g(est).alias("estimate"),
    )


def hll_distinct(
    df: DataFrame,
    key_expr: F.Column,
    p: int = DEFAULT_P,
) -> DataFrame:
    """One-row sketch-vs-exact report: (m, n_present, estimate,
    n_exact, rel_err_pct, within_10pct). The exact count rides along
    so the quality guard is part of the hashed result — a regression
    in either the sketch or the estimator moves the driver gate."""
    est = hll_estimate(hll_sketch(df, key_expr, p), p)
    exact = df.select(key_expr.alias("_k")).agg(
        F.count_distinct(F.col("_k")).cast("bigint").alias("n_exact")
    )
    rel = (
        (F.col("estimate") - F.col("n_exact"))
        / F.col("n_exact")
        * 100.0
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "m",
        "n_present",
        "estimate",
        "n_exact",
        _fx6g(rel).alias("rel_err_pct"),
        (F.abs(rel) <= 10.0).alias("within_10pct"),
    )


def hll_distinct_sql(
    table: str = "documents",
    key_sql: str = "token",
    from_clause: str | None = None,
    p: int = DEFAULT_P,
) -> str:
    """DuckDB oracle twin of :func:`hll_distinct` over an arbitrary
    key expression; ``from_clause`` defaults to the bare table."""
    m = 1 << p
    b = 60 - p
    src = from_clause or table
    alpha_m2 = repr(_alpha(m) * m * m)
    return (
        f"WITH keys AS (SELECT {key_sql} AS k FROM {src}),"
        " hashed AS (SELECT"
        "  ('0x' || substring(md5(k), 1, 15))::BIGINT AS h FROM keys),"
        f" regs AS (SELECT h % {m} AS reg,"
        f"  CASE WHEN h // {m} = 0 THEN {b + 1}"
        f"   ELSE {b} - length(bin(h // {m})) + 1 END AS rho"
        "  FROM hashed),"
        " sk AS (SELECT reg, CAST(max(rho) AS INTEGER) AS max_rho"
        "  FROM regs GROUP BY reg),"
        " agg AS (SELECT CAST(count(*) AS BIGINT) AS n_present,"
        "  CAST(sum(CAST(power(2.0, 63 - max_rho) AS DECIMAL(38,0)))"
        "   AS DOUBLE) / 9223372036854775808.0 AS s FROM sk),"
        f" est0 AS (SELECT n_present, {alpha_m2}"
        f"   / (s + ({m} - n_present)) AS raw FROM agg),"
        " est AS (SELECT n_present,"
        f"  CASE WHEN raw <= {2.5 * m} AND n_present < {m}"
        f"   THEN {float(m)!r} * ln({float(m)!r}"
        f"    / CAST({m} - n_present AS DOUBLE))"
        "   ELSE raw END AS e FROM est0),"
        " ex AS (SELECT CAST(count(DISTINCT k) AS BIGINT) AS n_exact"
        "  FROM keys),"
        # the Spark side derives rel_err from the ALREADY-round(6)ed
        # estimate (hll_estimate's output column) — mirror that here
        " fin AS (SELECT n_present,"
        "  CASE WHEN abs(e) < 1e12 THEN floor(e * 1e6 + 0.5) / 1e6"
        "   ELSE e END AS estimate, n_exact"
        "  FROM est CROSS JOIN ex)"
        f" SELECT CAST({m} AS BIGINT) AS m, n_present, estimate,"
        "  n_exact,"
        "  CASE WHEN abs((estimate - n_exact) / n_exact * 100.0) < 1e12"
        "   THEN floor((estimate - n_exact) / n_exact * 100.0"
        "    * 1e6 + 0.5) / 1e6"
        "   ELSE (estimate - n_exact) / n_exact * 100.0"
        "   END AS rel_err_pct,"
        "  (abs((estimate - n_exact) / n_exact * 100.0) <= 10.0)"
        "   AS within_10pct"
        " FROM fin"
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (portable, oracle-replayable)
# ---------------------------------------------------------------------------
#
# The third member of the sketch family (Bloom = membership, HLL =
# cardinality, CMS = frequency): d rows × w counters, every counter
# the SUM of the keys hashing into it, point estimate = min over the
# d rows — never an underestimate (every row's counter includes the
# key's own count), overestimate bounded by εN with ε = e/w per the
# Cormode-Muthukrishnan bound. Counters are a sparse (row_i, col,
# cnt) relation: ≤ d·w rows, broadcast-sized, mergeable by elementwise
# sum (distributive state — per-shard sketches add). Hash positions
# reuse the Bloom md5 bridge, so DuckDB replays every counter and the
# driver hash-gate certifies the ≥-exact theorem per key.

DEFAULT_CMS_W = 2048
DEFAULT_CMS_D = 4


def _cms_pos(key: F.Column, i: F.Column, w: int) -> F.Column:
    h = F.conv(
        F.substring(
            F.md5(F.concat(key, F.lit("#"), i.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    return h % F.lit(w)


def cms_build(
    items: DataFrame,
    key_col: str = "key",
    w: int = DEFAULT_CMS_W,
    d: int = DEFAULT_CMS_D,
) -> DataFrame:
    """(row_i, col, cnt) counter relation over item occurrences —
    one input row adds 1 to one counter per sketch row."""
    exploded = items.select(
        F.col(key_col).alias("_key"),
        F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("row_i"),
    )
    return (
        exploded.select(
            "row_i",
            _cms_pos(F.col("_key"), F.col("row_i"), w).alias("col"),
        )
        .groupBy("row_i", "col")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union sketch = per-counter sum (distributive merge)."""
    return (
        a.unionByName(b)
        .groupBy("row_i", "col")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )


def cms_estimate(
    keys: DataFrame,
    cms: DataFrame,
    key_col: str = "key",
    w: int = DEFAULT_CMS_W,
    d: int = DEFAULT_CMS_D,
) -> DataFrame:
    """Per key: est = min over the d rows' counters (missing counter
    = 0). The sketch broadcasts; the key side never shuffles."""
    exploded = keys.withColumn(
        "row_i", F.explode(F.array(*[F.lit(i) for i in range(d)]))
    ).withColumn("col", _cms_pos(F.col(key_col), F.col("row_i"), w))
    joined = exploded.join(F.broadcast(cms), ["row_i", "col"], "left")
    group_cols = list(keys.columns)
    return joined.groupBy(*group_cols).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("bigint"))).alias(
            "est"
        )
    )


def cms_frequency_report(
    items: DataFrame,
    key_col: str = "key",
    w: int = DEFAULT_CMS_W,
    d: int = DEFAULT_CMS_D,
) -> DataFrame:
    """Sketch-vs-exact frequency report over an occurrence relation
    (one row per occurrence): (key, est, exact, never_under). The
    ``never_under`` column is the CMS theorem made hash-checkable —
    a single False anywhere fails the driver gate in both engines.
    Size w below the key cardinality to see the bounded overestimate;
    the estimate NEVER drops below exact either way."""
    sketch = cms_build(items, key_col, w, d)
    exact = items.groupBy(key_col).agg(
        F.count("*").cast("bigint").alias("exact")
    )
    est = cms_estimate(exact, sketch, key_col, w, d)
    return est.select(
        key_col,
        "est",
        "exact",
        (F.col("est") >= F.col("exact")).alias("never_under"),
    ).orderBy(key_col)


def cms_frequency_report_sql(
    from_clause: str,
    key_col: str = "key",
    w: int = DEFAULT_CMS_W,
    d: int = DEFAULT_CMS_D,
) -> str:
    """DuckDB oracle twin of :func:`cms_frequency_report`;
    ``from_clause`` must yield the same one-row-per-occurrence
    relation with a ``{key_col}`` column."""
    ivals = ", ".join(f"({i})" for i in range(d))
    pos = (
        f"(('0x' || substring(md5({key_col} || '#' ||"
        f" CAST(i AS VARCHAR)), 1, 15))::BIGINT % {w})"
    )
    return (
        f"WITH occ AS (SELECT {key_col} FROM {from_clause}),"
        f" cms AS (SELECT i AS row_i, {pos} AS col,"
        "  CAST(count(*) AS BIGINT) AS cnt"
        f"  FROM occ CROSS JOIN (VALUES {ivals}) t(i)"
        "  GROUP BY 1, 2),"
        f" exact AS (SELECT {key_col},"
        "  CAST(count(*) AS BIGINT) AS exact"
        f"  FROM occ GROUP BY {key_col}),"
        f" probe AS (SELECT {key_col}, exact, i AS row_i, {pos} AS col"
        f"  FROM exact CROSS JOIN (VALUES {ivals}) t(i)),"
        f" est AS (SELECT {key_col}, exact,"
        "  min(COALESCE(cnt, 0)) AS est"
        "  FROM probe LEFT JOIN cms USING (row_i, col)"
        f"  GROUP BY {key_col}, exact)"
        f" SELECT {key_col}, est, exact, (est >= exact) AS never_under"
        f" FROM est ORDER BY {key_col}"
    )


def cms_token_frequency(
    docs: DataFrame,
    text_col: str = "text",
    w: int = DEFAULT_CMS_W,
    d: int = DEFAULT_CMS_D,
) -> DataFrame:
    """End-to-end frequency-sketch report over a documents table:
    sketch every token occurrence, estimate every distinct token, ride
    the exact count along — (token, est, exact, never_under). The
    ``never_under`` column is the CMS theorem made hash-checkable: a
    single False anywhere fails the driver gate in both engines."""
    from minisql_engine_spark.operators.text import (
        _norm_text,
        _ws_tokens,
    )

    toks = docs.select(
        F.explode(_ws_tokens(_norm_text(F.col(text_col)))).alias("token")
    )
    sketch = cms_build(toks, "token", w, d)
    exact = toks.groupBy("token").agg(
        F.count("*").cast("bigint").alias("exact")
    )
    est = cms_estimate(exact, sketch, "token", w, d)
    return est.select(
        "token",
        "est",
        "exact",
        (F.col("est") >= F.col("exact")).alias("never_under"),
    ).orderBy("token")


def cms_token_frequency_sql(
    table: str = "documents",
    text_col: str = "text",
    w: int = DEFAULT_CMS_W,
    d: int = DEFAULT_CMS_D,
) -> str:
    """DuckDB oracle twin of :func:`cms_token_frequency`."""
    ivals = ", ".join(f"({i})" for i in range(d))
    pos = (
        "(('0x' || substring(md5(token || '#' ||"
        f" CAST(i AS VARCHAR)), 1, 15))::BIGINT % {w})"
    )
    return (
        "WITH toks AS (SELECT unnest(string_split(regexp_replace("
        f"  lower(trim({text_col})), '\\s+', ' ', 'g'), ' ')) AS token"
        f"  FROM {table} WHERE trim({text_col}) <> ''),"
        f" cms AS (SELECT i AS row_i, {pos} AS col,"
        "  CAST(count(*) AS BIGINT) AS cnt"
        f"  FROM toks CROSS JOIN (VALUES {ivals}) t(i)"
        "  GROUP BY 1, 2),"
        " exact AS (SELECT token, CAST(count(*) AS BIGINT) AS exact"
        "  FROM toks GROUP BY token),"
        f" probe AS (SELECT token, exact, i AS row_i, {pos} AS col"
        f"  FROM exact CROSS JOIN (VALUES {ivals}) t(i)),"
        " est AS (SELECT token, exact,"
        "  min(COALESCE(cnt, 0)) AS est"
        "  FROM probe LEFT JOIN cms USING (row_i, col)"
        "  GROUP BY token, exact)"
        " SELECT token, est, exact, (est >= exact) AS never_under"
        " FROM est ORDER BY token"
    )


# ---------------------------------------------------------------------------
# Per-group HLL: approximate COUNT DISTINCT per group, mergeable state
# ---------------------------------------------------------------------------


def hll_group_sketch(
    df: DataFrame,
    group_col: str,
    key_expr: F.Column,
    p: int = DEFAULT_P,
) -> DataFrame:
    """(group, reg, max_rho) — one register relation per group value
    (≤ 2^p rows per group). This is the shape an incremental
    aggregate view stores: per-batch sketches merge by per-(group,
    reg) max (see :func:`hll_group_merge`), so "approx distinct users
    per segment over 100 TB" maintains in O(groups · m) state with
    zero re-reads of history — the thing exact COUNT DISTINCT
    fundamentally cannot do (its state is the key set itself)."""
    m = 1 << p
    b = 60 - p
    h = F.conv(F.substring(F.md5(key_expr), 1, 15), 16, 10).cast(
        "bigint"
    )
    hashed = df.select(F.col(group_col).alias("grp"), h.alias("_h"))
    reg = F.col("_h").bitwiseAND(F.lit(m - 1))
    w = F.shiftright(F.col("_h"), p)
    rho = F.when(w == 0, F.lit(b + 1)).otherwise(
        F.lit(b) - F.length(F.bin(w)) + 1
    )
    return (
        hashed.select("grp", reg.alias("reg"), rho.alias("rho"))
        .groupBy("grp", "reg")
        .agg(F.max("rho").cast("int").alias("max_rho"))
    )


def hll_group_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Per-(group, register) max — the distributive merge."""
    return (
        a.unionByName(b)
        .groupBy("grp", "reg")
        .agg(F.max("max_rho").cast("int").alias("max_rho"))
    )


def hll_group_estimate(
    sketch: DataFrame, p: int = DEFAULT_P
) -> DataFrame:
    """(grp, n_present, estimate) per group — same estimator and
    branch rule as :func:`hll_estimate`, evaluated group-wise."""
    m = 1 << p
    agg = sketch.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("n_present"),
        (
            F.sum(
                F.pow(F.lit(2.0), F.lit(63) - F.col("max_rho")).cast(
                    "decimal(38,0)"
                )
            ).cast("double")
            / F.lit(9223372036854775808.0)
        ).alias("_s"),
    )
    raw = (
        F.lit(_alpha(m) * m * m)
        / (F.col("_s") + (F.lit(m) - F.col("n_present")))
    )
    zeros = (F.lit(m) - F.col("n_present")).cast("double")
    est = F.when(
        (raw <= 2.5 * m) & (F.col("n_present") < m),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select(
        "grp",
        "n_present",
        _fx6g(est).alias("estimate"),
    ).orderBy("grp")


def hll_group_distinct_sql(
    table: str,
    group_col: str,
    key_sql: str,
    p: int = DEFAULT_P,
) -> str:
    """DuckDB oracle twin of sketch→estimate per group."""
    m = 1 << p
    b = 60 - p
    alpha_m2 = repr(_alpha(m) * m * m)
    return (
        f"WITH keys AS (SELECT {group_col} AS grp, {key_sql} AS k"
        f"  FROM {table}),"
        " hashed AS (SELECT grp,"
        "  ('0x' || substring(md5(k), 1, 15))::BIGINT AS h FROM keys),"
        f" regs AS (SELECT grp, h % {m} AS reg,"
        f"  CASE WHEN h // {m} = 0 THEN {b + 1}"
        f"   ELSE {b} - length(bin(h // {m})) + 1 END AS rho"
        "  FROM hashed),"
        " sk AS (SELECT grp, reg,"
        "  CAST(max(rho) AS INTEGER) AS max_rho"
        "  FROM regs GROUP BY grp, reg),"
        " agg AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_present,"
        "  CAST(sum(CAST(power(2.0, 63 - max_rho) AS DECIMAL(38,0)))"
        "   AS DOUBLE) / 9223372036854775808.0 AS s"
        "  FROM sk GROUP BY grp),"
        f" est0 AS (SELECT grp, n_present, {alpha_m2}"
        f"   / (s + ({m} - n_present)) AS raw FROM agg),"
        " est AS (SELECT grp, n_present,"
        f"  CASE WHEN raw <= {2.5 * m} AND n_present < {m}"
        f"   THEN {float(m)!r} * ln({float(m)!r}"
        f"    / CAST({m} - n_present AS DOUBLE))"
        "   ELSE raw END AS e FROM est0)"
        " SELECT grp, n_present,"
        "  CASE WHEN abs(e) < 1e12 THEN floor(e * 1e6 + 0.5) / 1e6"
        "   ELSE e END AS estimate"
        " FROM est ORDER BY grp"
    )
