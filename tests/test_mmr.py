"""MMR diversity re-ranking — greedy semantics, rounding twin, plan."""

from __future__ import annotations

import math
import random

import duckdb
import pytest

from minisql_engine_spark.operators.mmr import (
    _cos6,
    _round6,
    mmr_rerank,
    mmr_select,
)


def test_round6_matches_duckdb_round_fuzz():
    """_round6 is the exact twin of DuckDB's round(DOUBLE, 6) —
    including values landing precisely on the .5 scaled boundary
    (the 0.5*(a-b) MMR score shape) and negatives."""
    con = duckdb.connect()
    rng = random.Random(8)
    vals = [rng.uniform(-1, 1) for _ in range(2000)]
    # boundary-heavy values: halves of 6-decimal numbers
    vals += [
        ((i * 2 + 1) / 2) / 10**6 * s
        for i in range(500)
        for s in (1.0, -1.0)
    ]
    got = [
        r[0]
        for r in con.execute(
            "SELECT round(v, 6) FROM (SELECT unnest(?) AS v)", [vals]
        ).fetchall()
    ]
    for v, d in zip(vals, got):
        assert _round6(v) == d, v


def test_mmr_first_pick_is_argmax_rel_and_sizes():
    vecs = {
        1: [1.0, 0.0], 2: [0.9, 0.1], 3: [0.0, 1.0], 4: [0.5, 0.5],
    }
    rows = [(d, 0.1 * d, vecs[d]) for d in vecs]  # rel grows with id
    out = mmr_select(rows, k=3)
    assert [r[3] for r in out] == [1, 2, 3]
    assert out[0][0] == 4  # highest rel
    assert len(mmr_select(rows, k=99)) == 4  # capped at shortlist


def test_mmr_defers_near_duplicates():
    """Two near-identical vectors with top rels: plain top-2 would
    take both; MMR takes one, then the orthogonal doc."""
    rows = [
        (1, 0.90, [1.0, 0.0, 0.0]),
        (2, 0.89, [0.999, 0.001, 0.0]),  # clone of 1
        (3, 0.50, [0.0, 1.0, 0.0]),
    ]
    out = mmr_select(rows, k=2)
    assert [r[0] for r in out] == [1, 3]
    # and the clone is what rank-3 would pick up
    assert [r[0] for r in mmr_select(rows, k=3)] == [1, 3, 2]


def test_mmr_tiebreak_by_doc_id():
    v = [1.0, 0.0]
    w = [0.0, 1.0]
    rows = [(9, 0.5, v), (4, 0.5, w)]
    out = mmr_select(rows, k=2)
    assert out[0][0] == 4


def test_mmr_score_formula_step2():
    rows = [
        (1, 0.8, [1.0, 0.0]),
        (2, 0.6, [1.0, 0.0]),   # sim to 1 = 1.0
        (3, 0.3, [0.0, 1.0]),   # sim to 1 = 0.0
    ]
    out = {r[0]: r for r in mmr_select(rows, k=3)}
    assert out[1][2] == _round6(0.5 * (0.8 - 0.0))
    # doc 3 wins step 2: 0.5*(0.3-0) > 0.5*(0.6-1.0)
    assert out[3][3] == 2
    assert out[3][2] == _round6(0.5 * 0.3)
    assert out[2][2] == _round6(0.5 * (0.6 - 1.0))
    assert out[2][2] < 0  # negative MMR scores are legal


def test_cos6_symmetric_and_fold_order():
    a = [0.1, -0.7, 0.33, 2.0]
    b = [1.5, 0.2, -0.4, 0.05]
    assert _cos6(a, b) == _cos6(b, a)
    dot = 0.0
    for x, y in zip(a, b):
        dot += x * y
    na = math.sqrt(sum(x * x for x in a))
    assert abs(_cos6(a, a) - 1.0) < 2e-6
    assert na > 0


def test_mmr_rerank_distributed_equals_local(spark):
    rng = random.Random(42)
    rows = []
    for q in ("a", "b"):
        for d in range(12):
            rows.append(
                (q, d, _round6(rng.uniform(0, 1)),
                 [rng.uniform(-1, 1) for _ in range(8)])
            )
    df = spark.createDataFrame(
        rows, "query_id string, doc_id long, rel double, v array<double>"
    )
    got = {
        (r["query_id"], r["sel_rank"]): (r["doc_id"], r["mmr_score"])
        for r in mmr_rerank(df, k=5).collect()
    }
    for q in ("a", "b"):
        local = mmr_select(
            [(d, rel, v) for qq, d, rel, v in rows if qq == q], 5
        )
        for doc, rel, score, rank in local:
            assert got[(q, rank)] == (doc, score)


def test_mmr_rerank_uses_arrow_groups(spark):
    df = spark.createDataFrame(
        [("q", 1, 0.5, [1.0, 0.0]), ("q", 2, 0.4, [0.0, 1.0])],
        "query_id string, doc_id long, rel double, v array<double>",
    )
    plan = (
        mmr_rerank(df, k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "FlatMapGroupsInPandas" in plan
