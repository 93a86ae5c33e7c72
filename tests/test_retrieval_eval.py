"""IR evaluation metrics: nDCG@k / MRR@k / P@k / R@k, oracle-exact."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from minisql_engine_spark.operators.retrieval_eval import (
    MACRO,
    ir_metrics,
    ir_metrics_sql,
)
from tests.conftest import assert_matches_oracle


def _mk(spark, run_rows, qrel_rows):
    run = spark.createDataFrame(
        run_rows, "query_id string, doc_id long, rank long"
    )
    qrels = spark.createDataFrame(
        qrel_rows, "query_id string, doc_id long, rel long"
    )
    return run, qrels


def test_perfect_ranking_is_ndcg_one(spark):
    run, qrels = _mk(
        spark,
        [("q1", 1, 1), ("q1", 2, 2), ("q1", 3, 3)],
        [("q1", 1, 2), ("q1", 2, 1)],
    )
    row = {
        r["query_id"]: r for r in ir_metrics(run, qrels, k=3).collect()
    }
    assert row["q1"]["ndcg_at_k"] == 1.0
    assert row["q1"]["mrr_at_k"] == 1.0
    assert row["q1"]["recall_at_k"] == 1.0
    assert row["q1"]["precision_at_k"] == pytest.approx(2 / 3, abs=1e-6)


def test_known_ndcg_value_and_no_rel_query(spark):
    """Hand-computed: rel sequence (0, 2, 1) at ranks 1..3 vs ideal
    (2, 1): DCG = 3/log2(3) + 1/2, IDCG = 3 + 1/log2(3)."""
    run, qrels = _mk(
        spark,
        [("q1", 9, 1), ("q1", 1, 2), ("q1", 2, 3), ("q2", 9, 1)],
        [("q1", 1, 2), ("q1", 2, 1)],
    )
    out = {r["query_id"]: r for r in ir_metrics(run, qrels, k=3).collect()}
    dcg = 3 / math.log2(3) + 1 / 2
    idcg = 3 + 1 / math.log2(3)
    assert out["q1"]["ndcg_at_k"] == pytest.approx(dcg / idcg, abs=1e-6)
    assert out["q1"]["mrr_at_k"] == 0.5
    # q2 is unjudged (no qrels at all): EVERY metric is NULL so the
    # macro averages only judged queries (trec_eval convention)
    assert out["q2"]["ndcg_at_k"] is None
    assert out["q2"]["recall_at_k"] is None
    assert out["q2"]["mrr_at_k"] is None
    assert out["q2"]["precision_at_k"] is None
    assert out["q2"]["n_rel"] == 0
    # the macro MRR/P therefore equal q1's values, not half of them
    assert out[MACRO]["mrr_at_k"] == out["q1"]["mrr_at_k"]
    assert out[MACRO]["precision_at_k"] == out["q1"]["precision_at_k"]
    # macro averages skip the NULLs (trec_eval convention)
    assert out[MACRO]["ndcg_at_k"] == out["q1"]["ndcg_at_k"]


def test_ir_metrics_matches_duckdb_oracle(spark, duck):
    """Random-ish graded qrels + truncated runs: every per-query and
    macro value must hash-match the SQL replay."""
    run_rows = [
        (f"q{q}", d, i + 1)
        for q in range(4)
        for i, d in enumerate([(q * 7 + i * 3) % 15 for i in range(8)])
    ]
    # dedupe (query, doc) collisions keeping best rank, re-rank dense
    seen, rr = set(), []
    for q, d, rk in sorted(run_rows, key=lambda t: (t[0], t[2])):
        if (q, d) not in seen:
            seen.add((q, d))
            rr.append((q, d, len([x for x in rr if x[0] == q]) + 1))
    qrel_rows = [
        (f"q{q}", d, (q + d) % 3)
        for q in range(4)
        for d in range(15)
        if (q + d) % 3 > 0
    ]
    run, qrels = _mk(spark, rr, qrel_rows)
    out = ir_metrics(run, qrels, k=5)
    run_vals = ", ".join(f"('{q}', {d}, {rk})" for q, d, rk in rr)
    qrel_vals = ", ".join(
        f"('{q}', {d}, {rel})" for q, d, rel in qrel_rows
    )
    oracle = ir_metrics_sql(
        f"SELECT * FROM (VALUES {run_vals}) v(query_id, doc_id, rank)",
        f"SELECT * FROM (VALUES {qrel_vals}) v(query_id, doc_id, rel)",
        k=5,
    )
    assert_matches_oracle(out, duck.execute(oracle).fetchdf(), "ir")
