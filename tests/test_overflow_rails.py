"""Overflow-rail regression tests (ADVICE r11 findings 1-3).

The flagged expressions overflow int64 only at corpus sizes no test
can materialize (n_pos*n_neg > 4.6e12 rows for AUC), so the wide
DECIMAL(38,0)/HUGEINT arithmetic is pinned two ways:

1. SCALAR cross-engine evaluation — the exact production expression
   strings evaluated on literal aggregates at adversarial magnitudes
   where the old int64 form wrapped or aborted, asserted equal and
   exact between Spark and DuckDB.
2. BEHAVIORAL rails at reachable sizes — kappa's po/pe NULL exactly
   at KAPPA_N_CAP+1 rows in both engines, and the unimax division-
   form capped predicate proven equivalent to the paper's multiply
   form over randomized small instances.
"""

from __future__ import annotations

from fractions import Fraction

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from minisql_engine_spark.operators.classifier_eval import (
    FX,
    KAPPA_N_CAP,
    agreement_kappa,
    agreement_kappa_sql,
)

# n_pos = n_neg = 3e9: rank sum ~ 2n^2 = 7.2e19 and numerator*FX
# ~ 1.8e25 — both far past int64, well inside DECIMAL(38,0)/HUGEINT.
N_POS = 3_000_000_000
N_NEG = 3_000_000_000
N = N_POS + N_NEG
# perfect-separation rank sum: positives occupy ranks n_neg+1..n,
# rs2 = 2 * sum = 2 * n_pos * (n_neg + (n_pos+1+2*n_neg+... )) —
# use the closed form sum_{r=n_neg+1}^{n} r = n_pos*(n_neg) + n_pos*(n_pos+1)/2
RS2 = 2 * (N_POS * N_NEG) + N_POS * (N_POS + 1)
AUC_EXACT = (RS2 - N_POS * (N_POS + 1)) * FX // (2 * N_POS * N_NEG)


def test_auc_wide_numerator_scalar_parity(spark, duck):
    """The production AUC expression at n_pos=n_neg=3e9 (old int64
    path: numerator*FX ~ 1.8e25, silent wrap / ANSI abort). Perfect
    separation => exactly FX in both engines."""
    assert AUC_EXACT == FX  # pencil check of the closed form
    got_spark = spark.sql(
        f"SELECT CASE WHEN n_pos > 0 AND n_scored - n_pos > 0 THEN"
        f" (rs2_pos - CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1))"
        f" * {FX}"
        f" DIV (2 * CAST(n_pos AS DECIMAL(38,0))"
        f" * (n_scored - n_pos))"
        f" ELSE NULL END AS auc FROM (SELECT"
        f" CAST({RS2} AS DECIMAL(38,0)) AS rs2_pos,"
        f" {N_POS}L AS n_pos, {N}L AS n_scored)"
    ).collect()[0][0]
    got_duck = duck.execute(
        f"SELECT CASE WHEN n_pos > 0 AND n_scored - n_pos > 0 THEN"
        f" CAST((rs2_pos - CAST(n_pos AS HUGEINT) * (n_pos + 1))"
        f" * {FX}"
        f" // (2 * CAST(n_pos AS HUGEINT) * (n_scored - n_pos))"
        f" AS BIGINT) ELSE NULL END AS auc FROM (SELECT"
        f" CAST({RS2} AS HUGEINT) AS rs2_pos,"
        f" CAST({N_POS} AS BIGINT) AS n_pos,"
        f" CAST({N} AS BIGINT) AS n_scored)"
    ).fetchone()[0]
    assert int(got_spark) == AUC_EXACT
    assert int(got_duck) == AUC_EXACT


def test_auc_wide_numerator_random_scalars(spark, duck):
    """Midrange adversarial aggregates: both engines agree with an
    exact Fraction replay at magnitudes past the old int64 rail."""
    cases = [
        (4_600_000_000, 1_000_000_000, 7),  # just past old rail
        (123_456_789_012, 987_654_321, 3),
        (2**40, 2**39, 11),
    ]
    for n_pos, n_neg, slope in cases:
        n = n_pos + n_neg
        # an arbitrary consistent rank statistic: rs2 in its valid
        # range [n_pos*(n_pos+1), ...], offset deterministically
        rs2 = n_pos * (n_pos + 1) + 2 * (n_pos * n_neg // slope)
        exact = int(
            (Fraction(rs2 - n_pos * (n_pos + 1)) * FX)
            // (2 * n_pos * n_neg)
        )
        s = spark.sql(
            f"SELECT (CAST({rs2} AS DECIMAL(38,0))"
            f" - CAST({n_pos}L AS DECIMAL(38,0)) * ({n_pos}L + 1))"
            f" * {FX} DIV (2 * CAST({n_pos}L AS DECIMAL(38,0))"
            f" * ({n}L - {n_pos}L))"
        ).collect()[0][0]
        d = duck.execute(
            f"SELECT CAST((CAST({rs2} AS HUGEINT)"
            f" - CAST({n_pos} AS HUGEINT) * ({n_pos} + 1))"
            f" * {FX} // (2 * CAST({n_pos} AS HUGEINT)"
            f" * ({n} - {n_pos})) AS BIGINT)"
        ).fetchone()[0]
        assert int(s) == exact, (n_pos, n_neg)
        assert int(d) == exact, (n_pos, n_neg)


def test_kappa_po_pe_null_past_rail(spark, duck):
    """KAPPA_N_CAP+1 identical ratings: po/pe/kappa all NULL (the
    r11 advice: every emitted metric sits inside the rail), counts
    still exact — identically in both engines."""
    n = KAPPA_N_CAP + 1
    df = spark.range(n).selectExpr(
        "CAST(id % 2 AS STRING) AS rater_a",
        "CAST(id % 2 AS STRING) AS rater_b",
    )
    rows = {
        r["metric"]: r["value_units"]
        for r in agreement_kappa(df).collect()
    }
    assert rows["n"] == n and rows["n_agree"] == n
    assert rows["po_fx6"] is None
    assert rows["pe_fx6"] is None
    assert rows["kappa_fx6"] is None
    duck_rows = dict(
        duck.execute(
            agreement_kappa_sql(
                f"SELECT CAST(range % 2 AS VARCHAR) AS a,"
                f" CAST(range % 2 AS VARCHAR) AS b"
                f" FROM range({n})"
            )
        ).fetchall()
    )
    assert duck_rows["n"] == n and duck_rows["n_agree"] == n
    assert duck_rows["po_fx6"] is None
    assert duck_rows["pe_fx6"] is None
    assert duck_rows["kappa_fx6"] is None


@given(
    caps=st.lists(
        st.integers(min_value=1, max_value=10**6),
        min_size=1,
        max_size=12,
    ),
    budget=st.integers(min_value=1, max_value=10**7),
)
@settings(max_examples=200, deadline=None)
def test_unimax_division_form_equivalence(caps, budget):
    """The division-form capped test (production) == the paper's
    multiply form, for every domain of every random instance."""
    ks = sorted(caps)
    m = len(ks)
    p = 0
    for i, k in enumerate(ks, start=1):
        multiply_form = k * (m - i + 1) + p <= budget
        division_form = p <= budget and k <= (budget - p) // (
            m - i + 1
        )
        assert multiply_form == division_form, (ks, budget, i)
        p += k


def test_unimax_division_form_huge_scalars(spark, duck):
    """The production predicate at a 10^18-token domain (old
    multiply form: cap*(m-i+1) ~ 10^24, silent wrap / ANSI abort).
    cap >> budget => not capped, exactly, in both engines."""
    cap = 10**18
    budget = 10**15
    m, i, prefix = 1_000_000, 1, 0
    got_spark = spark.sql(
        f"SELECT CAST({prefix} AS DECIMAL(38,0)) <= {budget}L"
        f" AND {cap}L <="
        f" ({budget}L - CAST({prefix} AS DECIMAL(38,0)))"
        f" DIV ({m}L - {i}L + 1)"
    ).collect()[0][0]
    got_duck = duck.execute(
        f"SELECT CAST({prefix} AS HUGEINT) <= {budget}"
        f" AND {cap} <= ({budget} - CAST({prefix} AS HUGEINT))"
        f" // ({m} - {i} + 1)"
    ).fetchone()[0]
    assert got_spark is False
    assert got_duck is False


def test_unimax_epochs_audit_wide(spark, duck):
    """epochs_fx6 with alloc = cap at a 10^12-token domain and
    max_epochs=10^4: alloc*10^6 = 10^22 (old path wrapped); exact
    quotient = max_epochs * FX in both engines."""
    n_tokens = 10**12
    alloc = n_tokens * 10**4
    want = 10**4 * FX
    s = spark.sql(
        f"SELECT CAST({alloc} AS DECIMAL(38,0))"
        f" * {FX} DIV {n_tokens}L"
    ).collect()[0][0]
    d = duck.execute(
        f"SELECT CAST(CAST({alloc} AS HUGEINT)"
        f" * {FX} // {n_tokens} AS BIGINT)"
    ).fetchone()[0]
    assert int(s) == want
    assert int(d) == want
