"""Engine-portable float edges — the package-wide round-6 policy.

Round 8 proved that pairing Spark ``round(x, 6)`` with DuckDB
``round(x, 6)`` is NOT an identity: the two engines implement three
incompatible tie conventions (Spark/Java decimal-exact HALF_UP on the
binary double; DuckDB ``round`` scales by 1e6 and applies
``std::round`` on the scaled double; DuckDB's double→DECIMAL cast is
a third behavior). Generic values sit on a tie boundary with
probability ~0 — which is why most of the corpus was hash-green —
but ``embedding_drift`` (r8 driver hash miss) and the MMR
``0.5·(a−b)`` score shape (pinned in r8) proved "~0" is not 0.

The portable constructions, applied IDENTICALLY in Spark and every
DuckDB oracle twin:

``fx6`` / ``FX6_SQL``
    round-to-6 as ``floor(x·10⁶ + 0.5) / 10⁶`` in pure IEEE double
    ops. Two engines evaluate this bit-identically for identical
    inputs — no engine round() convention is involved. Ties round
    toward +∞ consistently; NULL-preserving; cannot emit ``-0.0``.
    Fuzz-pinned bit-exact vs DuckDB (boundary-heavy) in
    ``tests/test_drift.py::test_fx6_bitwise_twin_of_duckdb_fuzz``.

``dsum`` / ``DSUM_SQL``
    exact, order-independent sum of a per-row double term: cast each
    term to DECIMAL(38,12), sum exactly (commutative — immune to
    partition fold order and AQE re-plans), return as double. The
    certified ``stats.exact_corr`` sufficient-sums rule. Any
    round-6 edge whose input is a raw double SUM over more than a
    handful of rows is fold-order sensitive and MUST route the sum
    through ``dsum`` first (the exact failure mode of the r8
    ``embedding_drift`` centroid combine).

Residual (measure-zero, the documented boundary-distance argument):
libm transcendentals (``log2``/``ln``/``exp``/``pow``) may differ by
one ulp between the JVM and C runtimes; the DECIMAL(38,12) cast
absorbs anything below 5·10⁻¹³ of a cast boundary, and ``fx6``
absorbs anything below ~5·10⁻⁷ of a scaled-half boundary, so a flip
requires a value within one ulp of such a boundary — the same
residual class the driver-certified ``stats.exact_corr`` carries.

Enforcement: ``tests/test_round_policy.py`` scans the package source
and fails on any ``F.round(…, 6)`` edge outside this module's
constructions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


#: Domain bound for the floor construction. Spark's ``F.floor`` on
#: DOUBLE returns BIGINT, so ``x·10⁶`` beyond ``Long.MAX`` (~9.2e18)
#: would saturate (and NaN would collapse to 0) while DuckDB's floor
#: stays DOUBLE — the twins would diverge. :func:`fx6g` passes
#: values beyond the bound (and NaN/±Inf) through unchanged in BOTH
#: engines, which is exactly round-to-6 there: for |x| ≥ 2³⁴ ≈
#: 1.7e10 the double grid spacing already exceeds 2·10⁻⁶, so the
#: nearest 10⁻⁶ multiple representable as a double IS ``x`` itself.
#: NaN/±Inf fail the ``<`` test in both engines (each orders NaN
#: above all doubles) and pass through; NULL propagates.
FX6_BOUND = 1e12


def fx6(col: Column) -> Column:
    """Portable round-to-6: ``floor(x·10⁶ + 0.5) / 10⁶``.

    UNGUARDED — requires |x| < :data:`FX6_BOUND` and non-NaN, which
    every bounded-domain call site guarantees by construction
    (ratios ≤ 1, log-probabilities ≤ 64 bits, cosines, unit-scale
    distances). For generic/unbounded surfaces use :func:`fx6g`.
    Kept branch-free deliberately: the guard references its input
    THREE times, and fx6 inputs on hot paths are expensive per-row
    expressions (regexp counts, array filters) that Catalyst does
    not CSE across conditional branches — the guarded form tripled
    the quality-rule stage of the curation funnels (measured r10).
    """
    return (
        F.floor(col * F.lit(1e6) + F.lit(0.5)).cast("double")
        / F.lit(1e6)
    )


def fx6_sql(expr: str) -> str:
    """DuckDB twin of :func:`fx6`, same IEEE ops term for term."""
    return f"floor(({expr}) * 1e6 + 0.5) / 1e6"


def fx6g(col: Column) -> Column:
    """GUARDED portable round-to-6 for generic surfaces whose domain
    is not provably inside :data:`FX6_BOUND` (profiling min/max,
    winsorize clips, quantile estimates, sketch estimates, 2^H
    perplexities): |x| ≥ bound, NaN and ±Inf pass through unchanged
    in both engines (see the bound's docstring — passthrough IS the
    correct rounding there). The input is referenced three times, so
    feed it COLUMN REFERENCES (post-agg outputs), not expensive
    per-row expressions — use :func:`fx6` on bounded hot paths."""
    return F.when(
        F.abs(col) < F.lit(FX6_BOUND),
        F.floor(col * F.lit(1e6) + F.lit(0.5)).cast("double")
        / F.lit(1e6),
    ).otherwise(col)


def fx6g_sql(expr: str) -> str:
    """DuckDB twin of :func:`fx6g`."""
    return (
        f"CASE WHEN abs(({expr})) < 1e12"
        f" THEN floor(({expr}) * 1e6 + 0.5) / 1e6"
        f" ELSE ({expr}) END"
    )


def dsum(term: Column) -> Column:
    """Exact, order-independent sum of a per-row double term."""
    return F.sum(term.cast("decimal(38,12)")).cast("double")


def dsum_sql(expr: str) -> str:
    """DuckDB twin of :func:`dsum`."""
    return f"CAST(sum(CAST(({expr}) AS DECIMAL(38,12))) AS DOUBLE)"


def dsum_tf(term: Column, tf: Column) -> Column:
    """Frequency-weighted :func:`dsum` — BITWISE identical to
    ``dsum(term)`` over the exploded instances, because
    ``tf · round12(term)`` (decimal × integer, exact) equals the sum
    of ``tf`` copies of ``round12(term)``. Use when ``term`` is
    constant per group-key (a per-type log-probability, a per-bucket
    weight): pre-aggregating instances to (key, tf) shrinks both the
    join and the decimal rows — measured ~2× on the LM entropy sums.

    Types are chosen so no engine loses precision: Spark multiplies
    DECIMAL(25,12) × DECIMAL(12,0) → DECIMAL(38,12) exactly (25+12+1
    = 38, no allowPrecisionLoss rescale); DuckDB's width 25+12 = 37 ≤
    38. Requires |term| < 1e13 and tf < 1e12 — both guaranteed by
    the call sites (log-probabilities, per-doc counts)."""
    return F.sum(
        term.cast("decimal(25,12)") * tf.cast("decimal(12,0)")
    ).cast("double")


def dsum_tf_sql(expr: str, tf: str) -> str:
    """DuckDB twin of :func:`dsum_tf` (value-equal to the
    per-instance :func:`dsum_sql` replay — see dsum_tf)."""
    return (
        f"CAST(sum(CAST(({expr}) AS DECIMAL(25,12))"
        f" * CAST(({tf}) AS DECIMAL(12,0))) AS DOUBLE)"
    )


def davg(term: Column) -> Column:
    """Order-independent mean: exact decimal sum over exact count."""
    return dsum(term) / F.count(term).cast("double")


def davg_sql(expr: str) -> str:
    """DuckDB twin of :func:`davg`."""
    return (
        f"{dsum_sql(expr)} / CAST(count({expr}) AS DOUBLE)"
    )
