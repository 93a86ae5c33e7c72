"""Property-based tests (hypothesis) for the r11 integer-exact
evaluation/composition operators — run against the DuckDB twins with
pure-Python reference folds. The Spark↔DuckDB value parity of each
twin is certified separately (oracle-parity suite + vanilla sweep),
so pinning the TWIN against an independent Python replay transitively
pins the engine without paying a SparkSession per hypothesis
example."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from minisql_engine_spark.operators.classifier_eval import (
    FX,
    agreement_kappa_sql,
    classifier_eval_sql,
)
from minisql_engine_spark.operators.unimax import (
    unimax_allocation_sql,
)


def _duck(df: pd.DataFrame, name: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.register(name, df)
    return con


# --------------------------------------------------------------------------
# UniMax: closed form ≡ the paper's iterative waterfilling, any caps
# --------------------------------------------------------------------------


@st.composite
def _corpora(draw):
    n_dom = draw(st.integers(min_value=1, max_value=8))
    toks = draw(
        st.lists(
            st.integers(min_value=1, max_value=40),
            min_size=n_dom,
            max_size=n_dom,
        )
    )
    budget = draw(st.integers(min_value=1, max_value=300))
    epochs = draw(st.integers(min_value=1, max_value=3))
    return toks, budget, epochs


@given(_corpora())
@settings(max_examples=60, deadline=None)
def test_unimax_matches_iterative_waterfilling(case):
    toks, budget, epochs = case
    rows = []
    for d, nt in enumerate(toks):
        rows.append((d, f"dom{d}", " ".join(["w"] * nt)))
    df = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    con = _duck(df, "documents")
    got = {
        r[0]: r[3]
        for r in con.execute(
            unimax_allocation_sql(budget, max_epochs=epochs)
        ).fetchall()
    }
    caps = {f"dom{d}": nt * epochs for d, nt in enumerate(toks)}
    # iterative waterfilling reference
    remaining = dict(caps)
    b = budget
    alloc: dict[str, int] = {}
    while remaining:
        share = b // len(remaining)
        over = {d: c for d, c in remaining.items() if c <= share}
        if not over:
            break
        for d, c in over.items():
            alloc[d] = c
            b -= c
            del remaining[d]
    if remaining:
        share, rem = b // len(remaining), b % len(remaining)
        order = sorted(remaining, key=lambda d: (caps[d], d))
        for i, d in enumerate(order):
            alloc[d] = share + (1 if i < rem else 0)
    assert got == alloc
    # mass conservation, exactly
    assert sum(got.values()) == min(budget, sum(caps.values()))


# --------------------------------------------------------------------------
# Cohen's kappa: the fixed-point edge vs exact rational arithmetic
# --------------------------------------------------------------------------


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.sampled_from(["a", "b", "c"]),
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=60, deadline=None)
def test_kappa_matches_exact_rational(pairs):
    from fractions import Fraction
    import math

    df = pd.DataFrame(pairs, columns=["a", "b"])
    con = _duck(df, "ratings_tbl")
    got = {
        r[0]: r[1]
        for r in con.execute(
            agreement_kappa_sql("SELECT a, b FROM ratings_tbl")
        ).fetchall()
    }
    n = len(pairs)
    agree = sum(1 for a, b in pairs if a == b)
    ca: dict[str, int] = {}
    cb: dict[str, int] = {}
    for a, b in pairs:
        ca[a] = ca.get(a, 0) + 1
        cb[b] = cb.get(b, 0) + 1
    s = sum(ca[k] * cb.get(k, 0) for k in ca)
    assert got["n"] == n and got["n_agree"] == agree
    assert got["po_fx6"] == agree * FX // n
    assert got["pe_fx6"] == s * FX // (n * n)
    if n * n == s:
        assert got["kappa_fx6"] is None
    else:
        # the engine's kappa+1 floor-edge, replayed in exact rationals
        k1 = Fraction(agree * n + n * n - 2 * s, n * n - s)
        want = math.floor(k1 * FX) - FX
        assert got["kappa_fx6"] == want
        # and it is within one unit of true kappa rounded
        true_k = Fraction(
            Fraction(agree, n) - Fraction(s, n * n),
            1 - Fraction(s, n * n),
        )
        assert abs(Fraction(got["kappa_fx6"], FX) - true_k) <= Fraction(
            1, FX
        )


# --------------------------------------------------------------------------
# AUC: midrank statistic vs a brute-force pair count
# --------------------------------------------------------------------------


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1),
            st.integers(min_value=0, max_value=20).map(
                lambda x: x * 50_000
            ),
        ),
        min_size=2,
        max_size=60,
    ).filter(
        lambda rows: 0 < sum(y for y, _ in rows) < len(rows)
    )
)
@settings(max_examples=60, deadline=None)
def test_auc_matches_bruteforce_pair_count(rows):
    """AUC ≡ P(pos > neg) + ½·P(pos = neg) — count every (pos, neg)
    pair directly and compare to the midrank statistic's floor edge
    (×2 units so ties stay integral)."""
    df = pd.DataFrame(rows, columns=["y", "s"])
    con = _duck(df, "scored_tbl")
    got = {
        r[0]: r[1]
        for r in con.execute(
            classifier_eval_sql("SELECT y, s FROM scored_tbl")
        ).fetchall()
    }
    pos = [s for y, s in rows if y == 1]
    neg = [s for y, s in rows if y == 0]
    wins2 = 0  # ×2 units: win = 2, tie = 1
    for p in pos:
        for q in neg:
            wins2 += 2 if p > q else (1 if p == q else 0)
    assert got["auc_fx6"] == wins2 * FX // (2 * len(pos) * len(neg))
