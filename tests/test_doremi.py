"""DoReMi-lite mixture reweighting — oracle parity, mass
conservation, monotone direction, and a pure-Python integer replay."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from minisql_engine_spark.operators.doremi import (
    DEN,
    EXC_CAP,
    SCALE,
    domain_losses,
    doremi_weights,
    doremi_weights_sql,
)
from minisql_engine_spark.sources.parquet_catalog import load_table
from tests.conftest import assert_matches_oracle


def test_doremi_oracle_corpus(spark, duck, sf_dir):
    out = doremi_weights(load_table(spark, sf_dir, "documents"), n_iter=4)
    assert_matches_oracle(
        out, duck.execute(doremi_weights_sql(n_iter=4)).df(), "doremi"
    )


def test_doremi_mass_conservation_and_direction(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = doremi_weights(docs, n_iter=4).toPandas()
    n_dom = out[out["round"] == 0].shape[0]
    # round 0 is uniform, every round's mass sums to SCALE (floor
    # renorm can undershoot by < 1 unit per domain, round 0 by DIV)
    for r, grp in out.groupby("round"):
        assert SCALE - n_dom <= grp.weight_units.sum() <= SCALE, r
    r0 = out[out["round"] == 0]
    assert r0.weight_units.nunique() == 1
    # weights move WITH excess loss: across rounds, a domain with
    # positive excess never loses mass relative to a zero-excess one
    last = out[out["round"] == out["round"].max()].set_index("domain")
    first = r0.set_index("domain")
    gained = last.weight_units - first.weight_units
    worst = last.loss_units.idxmax()
    best = last.loss_units.idxmin()
    assert gained[worst] >= gained[best]
    assert gained[worst] > 0 or last.excess_units.eq(0).all()


def test_doremi_python_integer_replay(spark, sf_dir):
    """The Spark trajectory equals a direct Python integer fold over
    the same per-domain losses — pins the UPDATE SEMANTICS, not just
    cross-engine agreement."""
    docs = load_table(spark, sf_dir, "documents")
    losses = {
        r["domain"]: r["loss_units"]
        for r in domain_losses(docs).collect()
    }
    out = doremi_weights(docs, n_iter=3).toPandas()
    doms = sorted(losses)
    w = {d: SCALE // len(doms) for d in doms}
    for t in range(1, 4):
        ref = sum(w[d] * losses[d] for d in doms) // SCALE
        exc = {
            d: min(max(losses[d] - ref, 0), EXC_CAP) for d in doms
        }
        w1 = {
            d: (w[d] * (DEN + (exc[d] * 1) // 2)) // DEN for d in doms
        }
        tot = sum(w1.values())
        w = {d: (w1[d] * SCALE) // tot for d in doms}
        got = out[out["round"] == t].set_index("domain")
        for d in doms:
            assert got.loc[d, "weight_units"] == w[d], (t, d)
            assert got.loc[d, "excess_units"] == exc[d], (t, d)


def test_doremi_rejects_bad_eta_and_rounds(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="n_iter"):
        doremi_weights(docs, n_iter=0)
    with pytest.raises(ValueError, match="eta"):
        doremi_weights(docs, eta_num=3, eta_den=2)


def test_doremi_eta_magnitude_rail(spark, sf_dir):
    """ADVICE r10: eta=10**13/(2*10**13) is a valid 1/2 by the ratio
    check but its intermediate excess_units * eta_num wraps Spark's
    non-ANSI bigint multiply. gcd reduction makes it exactly 1/2
    (floor-division invariant under common scaling); an IRREDUCIBLE
    huge eta_num must raise instead of silently wrapping."""
    from minisql_engine_spark.operators.doremi import _validate_eta

    assert _validate_eta(10**13, 2 * 10**13) == (1, 2)
    with pytest.raises(ValueError, match="overflow"):
        _validate_eta(10**13 + 1, 2 * (10**13 + 1) + 1)
    docs = load_table(spark, sf_dir, "documents")
    a = doremi_weights(docs, n_iter=2, eta_num=1, eta_den=2).toPandas()
    b = doremi_weights(
        docs, n_iter=2, eta_num=10**13, eta_den=2 * 10**13
    ).toPandas()
    pd.testing.assert_frame_equal(
        a.sort_values(["round", "domain"]).reset_index(drop=True),
        b.sort_values(["round", "domain"]).reset_index(drop=True),
    )


def test_doremi_crafted_two_domains(spark, duck):
    """Hand-crafted 2-domain corpus: the gibberish domain (rare
    tokens → high xent) gains weight every round; oracle replays."""
    rows = [
        (i, "common words common words common", "easy") for i in range(8)
    ] + [
        (100 + i, f"zq{i}x wk{i}v qq{i}j", "hard") for i in range(8)
    ]
    sdf = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    duck.register(
        "_dor", pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    )
    out = doremi_weights(sdf, n_iter=3)
    assert_matches_oracle(
        out,
        duck.execute(doremi_weights_sql(n_iter=3, table="_dor")).df(),
        "doremi-2dom",
    )
    w = out.filter(F.col("round") == 3).collect()
    byd = {r["domain"]: r["weight_units"] for r in w}
    assert byd["hard"] > byd["easy"]
    assert byd["hard"] > SCALE // 2


def test_doremi_feeds_mixture_sample(spark, sf_dir):
    """The composition point the module docstring promises: the final
    round's weight_units / SCALE drive mixture_sample, and the token
    allowances follow the LEARNED weights (worst-loss domain gets the
    larger share of the budget)."""
    from minisql_engine_spark.operators.mixture import mixture_sample

    docs = load_table(spark, sf_dir, "documents")
    traj = doremi_weights(docs, n_iter=4).toPandas()
    last = traj[traj["round"] == traj["round"].max()]
    weights = {
        r.domain: r.weight_units / SCALE for r in last.itertuples()
    }
    sel = mixture_sample(
        docs, weights, token_budget=5_000
    ).toPandas()
    got_alloc = (
        sel.groupby("source")["allowance_tokens"].first().to_dict()
    )
    # allowance ordering mirrors the learned weight ordering
    by_w = sorted(weights, key=weights.get)
    assert got_alloc[by_w[-1]] >= got_alloc[by_w[0]]
    # and matches the floor(w/Σw · budget) contract exactly
    tot = sum(weights.values())
    for s, a in got_alloc.items():
        assert a == int(weights[s] / tot * 5_000), s


def test_doremi_mixture_selection_oracle(spark, duck, sf_dir):
    """The composed closed-loop row: learn the weights AND spend the
    budget in one plan, replayed end-to-end by the oracle."""
    from minisql_engine_spark.operators.doremi import (
        doremi_mixture_selection,
        doremi_mixture_selection_sql,
    )

    out = doremi_mixture_selection(
        load_table(spark, sf_dir, "documents"), 5_000, n_iter=3
    )
    assert_matches_oracle(
        out,
        duck.execute(
            doremi_mixture_selection_sql(5_000, n_iter=3)
        ).df(),
        "doremi_sel",
    )


def test_doremi_mixture_selection_contracts(spark, sf_dir):
    """Integer allowances follow the learned weights; admission keeps
    the straddler and never admits past it; the allowance arithmetic
    is the exact fixed-point floor share (no float detour)."""
    from minisql_engine_spark.operators.doremi import (
        doremi_mixture_selection,
    )

    docs = load_table(spark, sf_dir, "documents")
    budget = 5_000
    sel = doremi_mixture_selection(docs, budget, n_iter=3).toPandas()
    traj = doremi_weights(docs, n_iter=3).toPandas()
    last = traj[traj["round"] == 3].set_index("domain")
    tot = int(last.weight_units.sum())
    # allowance = floor(weight_units · budget / Σunits), integer-exact
    for s, grp in sel.groupby("source"):
        want = int(last.loc[s].weight_units) * budget // tot
        assert grp.allowance_tokens.eq(want).all(), s
    # exclusive prefix below allowance (straddler kept), cum is a
    # true running sum
    assert (
        sel.cum_tokens - sel.n_tokens < sel.allowance_tokens
    ).all()
    # the worst-loss domain's allowance is >= the best-loss domain's
    alloc = sel.groupby("source")["allowance_tokens"].first()
    worst, best = last.loss_units.idxmax(), last.loss_units.idxmin()
    if worst in alloc.index and best in alloc.index:
        assert alloc[worst] >= alloc[best]


def test_doremi_mixture_selection_budget_rail():
    from minisql_engine_spark.operators.doremi import (
        BUDGET_CAP,
        doremi_mixture_selection_sql,
    )

    with pytest.raises(ValueError, match="token_budget"):
        doremi_mixture_selection_sql(0)
    with pytest.raises(ValueError, match="token_budget"):
        doremi_mixture_selection_sql(BUDGET_CAP + 1)
