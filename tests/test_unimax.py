"""UniMax epoch-capped budget allocation — oracle parity, mass
conservation, the capped-prefix invariant, and a Python waterfilling
replay (the iterative loop from the paper must equal the closed
form)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from minisql_engine_spark.operators.unimax import (
    FX,
    unimax_allocation,
    unimax_allocation_sql,
)
from minisql_engine_spark.sources.parquet_catalog import load_table
from tests.conftest import assert_matches_oracle

BUDGET = 50_000


def test_unimax_oracle_corpus(spark, duck, sf_dir):
    out = unimax_allocation(
        load_table(spark, sf_dir, "documents"), BUDGET, max_epochs=2
    )
    assert_matches_oracle(
        out,
        duck.execute(
            unimax_allocation_sql(BUDGET, max_epochs=2)
        ).df(),
        "unimax",
    )


def test_unimax_mass_conservation_and_caps(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = unimax_allocation(docs, BUDGET, max_epochs=2).toPandas()
    total_cap = int(out.cap_tokens.sum())
    assert int(out.alloc_tokens.sum()) == min(BUDGET, total_cap)
    # nobody exceeds their cap; epochs audit respects the cap
    assert (out.alloc_tokens <= out.cap_tokens).all()
    assert (out.epochs_fx6 <= 2 * FX).all()
    # a budget beyond every cap -> everyone capped exactly
    big = unimax_allocation(docs, 10**9, max_epochs=2).toPandas()
    assert (big.alloc_tokens == big.cap_tokens).all()


def test_unimax_python_waterfilling_replay(spark, sf_dir):
    """The paper's ITERATIVE waterfilling (repeatedly give survivors
    an equal share, cap the overflowing, redistribute) must agree
    with the closed-form prefix rule on total and on who is capped;
    uncapped allocations agree to the floor-share (+1 remainder)."""
    docs = load_table(spark, sf_dir, "documents")
    out = {
        r["domain"]: r
        for r in unimax_allocation(
            docs, BUDGET, max_epochs=2
        ).collect()
    }
    caps = {d: out[d]["cap_tokens"] for d in out}
    # python waterfilling
    remaining = dict(caps)
    budget = BUDGET
    alloc = {}
    while remaining and budget > 0:
        share = budget // len(remaining)
        over = {d: c for d, c in remaining.items() if c <= share}
        if not over:
            break
        for d, c in over.items():
            alloc[d] = c
            budget -= c
            del remaining[d]
    # survivors get the floor share; engine adds +1 to the first
    # `rem` in (cap, domain) order
    share = budget // len(remaining) if remaining else 0
    rem = budget % len(remaining) if remaining else 0
    order = sorted(remaining, key=lambda d: (caps[d], d))
    for k, d in enumerate(order):
        alloc[d] = share + (1 if k < rem else 0)
    assert {d: out[d]["alloc_tokens"] for d in out} == alloc


def test_unimax_crafted_prefix_rule(spark, duck):
    """Hand-checked: caps [2,20] (epochs=2 on 1- and 10-token docs),
    budget 16 -> low domain capped at 2, high gets 14."""
    rows = [(1, "a", "one"), (2, "b", " ".join(["w"] * 10))]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r["domain"]: r["alloc_tokens"]
        for r in unimax_allocation(df, 16, max_epochs=2).collect()
    }
    assert got == {"a": 2, "b": 14}
    # and tiny-budget: nobody capped, equal split with remainder
    got2 = {
        r["domain"]: r["alloc_tokens"]
        for r in unimax_allocation(df, 3, max_epochs=2).collect()
    }
    assert got2 == {"a": 2, "b": 1}


def test_unimax_rejects_bad_params():
    with pytest.raises(ValueError, match="token_budget"):
        unimax_allocation_sql(0)
    with pytest.raises(ValueError, match="max_epochs"):
        unimax_allocation_sql(100, max_epochs=0)
