"""Product-Quantization ANN: DuckDB full-pipeline parity plus the
structural invariants (codebook shape, code range, compression,
re-rank recall) the hash can't prove on its own."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from minisql_engine_spark.operators.pq import (  # noqa: E402
    pq_codebooks,
    pq_codes,
    pq_topk,
    pq_topk_sql,
)
from tests.conftest import assert_matches_oracle  # noqa: E402

QIDS = [0, 1, 2, 3, 4]


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    from minisql_engine_spark.sources import load_table

    return load_table(spark, sf_dir, "embeddings")


@pytest.mark.parametrize(
    "kw",
    [
        dict(m_sub=8, k_codes=16),
        dict(m_sub=16, k_codes=32),
        dict(m_sub=16, k_codes=32, rerank_factor=5),
        dict(
            m_sub=16, k_codes=32, rerank_factor=5,
            train_sample_rate=0.25,
        ),
    ],
    ids=["m8k16-adc", "m16k32-adc", "m16k32-rerank5", "m16k32-rr5-ts25"],
)
def test_pq_matches_oracle(emb, duck, kw):
    assert_matches_oracle(
        pq_topk(emb, QIDS, k=10, **kw),
        duck.execute(pq_topk_sql(QIDS, k=10, **kw)).df(),
        f"pq {kw}",
    )


def test_codebook_shape_and_code_range(emb):
    cb = pq_codebooks(emb, m_sub=8, k_codes=16)
    rows = cb.collect()
    # ≤ M×K entries (codes may die if a cluster empties), every
    # centroid is a sub_dim-wide vector
    assert len(rows) <= 8 * 16
    assert {r.m for r in rows} == set(range(8))
    assert all(0 <= r.code < 16 for r in rows)
    assert all(len(r.cv) == 8 for r in rows)

    codes = pq_codes(emb, cb, m_sub=8)
    n = emb.count()
    # every vector encodes to exactly M codes, all in range
    per_vec = codes.groupBy("vec_id").count()
    assert per_vec.filter(F.col("count") != 8).count() == 0
    assert codes.count() == n * 8
    assert codes.filter((F.col("code") < 0) | (F.col("code") >= 16)).count() == 0


def test_pq_deterministic_across_runs(emb):
    a = sorted(map(tuple, pq_topk(emb, QIDS, k=5).collect()))
    b = sorted(map(tuple, pq_topk(emb, QIDS, k=5).collect()))
    assert a == b


def test_pq_rejects_indivisible_dims(emb):
    with pytest.raises(ValueError):
        pq_codebooks(emb, m_sub=7)


def test_pq_rerank_recall_beats_adc(emb):
    """The refinement stage must actually pay: re-ranked recall@10
    vs exact L2 ≥ ADC-only recall, and ≥ 0.6 mean on this corpus
    (measured 0.85; bar leaves slack for testdata regen)."""
    pdf = emb.toPandas()
    V = np.array([np.array(v, dtype=np.float64) for v in pdf.embedding])
    ids = pdf.vec_id.to_numpy()
    qids = list(range(10))
    gt = {}
    for q in qids:
        qi = np.where(ids == q)[0][0]
        d = ((V - V[qi]) ** 2).sum(axis=1)
        order = np.lexsort((ids, d))
        gt[q] = set([int(ids[i]) for i in order if ids[i] != q][:10])

    def recall(df):
        got = (
            df.select("query_id", "neighbor_id")
            .toPandas()
            .groupby("query_id")["neighbor_id"]
            .apply(set)
            .to_dict()
        )
        return sum(
            len(gt[q] & got.get(q, set())) / 10 for q in qids
        ) / len(qids)

    r_adc = recall(pq_topk(emb, qids, k=10, m_sub=16, k_codes=32))
    r_rr = recall(
        pq_topk(emb, qids, k=10, m_sub=16, k_codes=32, rerank_factor=5)
    )
    assert r_rr >= r_adc
    assert r_rr >= 0.6, (r_adc, r_rr)


def test_ivf_pq_full_probe_equals_plain_pq(emb):
    """With every cell probed the IVF candidate set is all pairs, so
    IVF-PQ's ADC ranking must be IDENTICAL to plain PQ — pins the
    composition to its parts."""
    from minisql_engine_spark.operators.pq import ivf_pq_topk

    full = ivf_pq_topk(
        emb, QIDS, k=10, n_cells=8, n_probe=8, m_sub=16, k_codes=32
    )
    plain = pq_topk(emb, QIDS, k=10, m_sub=16, k_codes=32)
    assert sorted(map(tuple, full.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_ivf_pq_bounds_candidates_and_keeps_recall(emb):
    """Partial probing must score strictly fewer pairs than all-pairs
    while agreeing with plain PQ on most of the top-k (the IVF loss
    at n_probe=half the cells stays small)."""
    from minisql_engine_spark.operators.pq import ivf_pq_topk
    from minisql_engine_spark.operators.similarity import (
        ivf_assignments,
        ivf_centroids,
    )

    n = emb.count()
    cents = ivf_centroids(emb, n_cells=8)
    corpus_cells = ivf_assignments(emb, cents, n_probe=1)
    probe_cells = (
        ivf_assignments(
            emb.filter(F.col("vec_id").isin(QIDS)), cents, n_probe=4
        )
        .select("vec_id", "cell")
    )
    cand = corpus_cells.withColumnRenamed("vec_id", "nid").join(
        probe_cells, "cell"
    )
    n_cand = cand.count()
    assert n_cand < len(QIDS) * n, (n_cand, len(QIDS) * n)

    part = ivf_pq_topk(
        emb, QIDS, k=10, n_cells=8, n_probe=4, m_sub=16, k_codes=32
    ).select("query_id", "neighbor_id").toPandas()
    plain = pq_topk(emb, QIDS, k=10, m_sub=16, k_codes=32).select(
        "query_id", "neighbor_id"
    ).toPandas()
    a = part.groupby("query_id")["neighbor_id"].apply(set).to_dict()
    b = plain.groupby("query_id")["neighbor_id"].apply(set).to_dict()
    overlap = sum(len(a.get(q, set()) & b[q]) / len(b[q]) for q in b) / len(b)
    assert overlap >= 0.5, overlap


def test_pq_gated_matches_oracle_and_drops_low_recall(emb, duck):
    """The r7 operating point: pq_topk_gated carries per-query
    recall@k vs exact-L2 truth in-row and drops gated-out queries;
    the SQL twin replays the gate. At the shipped operating point
    (fair queries, rerank 16) recall is 1.0, so an impossible gate
    must empty the result — both facts pinned."""
    from minisql_engine_spark.operators.pq import pq_topk_gated

    kw = dict(
        m_sub=16, k_codes=32, n_iter=2, rerank_factor=16,
        train_sample_rate=0.25,
    )
    qids = [100, 101, 102, 103, 104]
    out = pq_topk_gated(emb, qids, k=10, recall_gate=0.6, **kw)
    assert_matches_oracle(
        out,
        duck.execute(
            pq_topk_sql(qids, k=10, recall_gate=0.6, **kw)
        ).df(),
        "pq gated rr16",
    )
    rows = out.collect()
    assert {r["query_id"] for r in rows} == set(qids)
    assert all(r["recall"] >= 0.6 for r in rows)

    # gate bites: recall can't exceed 1.0, so a >1.0 gate drops all
    assert (
        pq_topk_gated(emb, qids, k=10, recall_gate=1.01, **kw).count()
        == 0
    )
    with pytest.raises(ValueError, match="rerank_factor"):
        pq_topk_gated(emb, qids, k=10, recall_gate=0.6, m_sub=16)
    with pytest.raises(ValueError, match="rerank_factor"):
        pq_topk_sql(qids, k=10, recall_gate=0.6, m_sub=16)
