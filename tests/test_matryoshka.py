"""Matryoshka prefix-recall audit — oracle parity, the full-dims
sanity anchor, recall monotonicity in expectation pinned exactly on
a crafted structured corpus, and parameter rails."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from minisql_engine_spark.operators.matryoshka import (
    FX,
    matryoshka_recall,
    matryoshka_recall_sql,
)
from minisql_engine_spark.sources.parquet_catalog import load_table
from tests.conftest import assert_matches_oracle


def test_matryoshka_oracle_corpus(spark, duck, sf_dir):
    out = matryoshka_recall(load_table(spark, sf_dir, "embeddings"))
    assert_matches_oracle(
        out, duck.execute(matryoshka_recall_sql()).df(), "matryoshka"
    )


def test_matryoshka_full_dims_anchor(spark, sf_dir):
    """The full-dimension rows are recall 1.0 by construction —
    the in-row invariant a consumer (and the driver hash) can pin."""
    out = matryoshka_recall(
        load_table(spark, sf_dir, "embeddings")
    ).toPandas()
    full = out[out.dims == 64]
    assert len(full) > 0
    assert (full.recall_fx6 == FX).all()
    assert set(out.dims) == {8, 16, 32, 64}
    # recall is n_hits/k exactly
    assert (out.recall_fx6 == out.n_hits * FX // 10).all()


def test_matryoshka_structured_corpus_holds_recall(spark):
    """A corpus that IS matryoshka-structured (all signal in the
    first 4 components, zero tail) gets recall 1.0 at EVERY prefix —
    the audit separates structured from isotropic embeddings."""
    import math

    rows = []
    for i in range(40):
        head = [
            math.cos(i * 0.7),
            math.sin(i * 0.7),
            math.cos(i * 1.3),
            math.sin(i * 1.3),
        ]
        rows.append((i, [float(x) for x in head] + [0.0] * 60))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = matryoshka_recall(
        df, dims_list=(8, 16), k=5, query_mod=10
    ).toPandas()
    assert (out.recall_fx6 == FX).all()


def test_matryoshka_rejects_bad_params():
    with pytest.raises(ValueError, match="dims_list"):
        matryoshka_recall_sql(dims_list=(64,))
    with pytest.raises(ValueError, match="dims_list"):
        matryoshka_recall_sql(dims_list=())
    with pytest.raises(ValueError, match="k >= 1"):
        matryoshka_recall_sql(k=0)


def test_matryoshka_n_queries_budget(spark, duck, sf_dir):
    """The absolute audit budget (VERDICT r11 task 4): exactly
    n_queries distinct query ids, the deterministic hash-order pick
    replays in the oracle, and the query set is a SUBSET of the
    query_mod sample (the knobs compose)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = matryoshka_recall(emb, query_mod=10, n_queries=7)
    pdf = out.toPandas()
    assert pdf.vec_id.nunique() == 7
    assert (pdf.vec_id % 10 == 0).all()
    assert_matches_oracle(
        out,
        duck.execute(
            matryoshka_recall_sql(query_mod=10, n_queries=7)
        ).df(),
        "matryoshka_n_queries",
    )


def test_matryoshka_n_queries_default_unchanged(spark, duck, sf_dir):
    """n_queries=None is byte-identical to the pre-knob operator:
    the restructured qs CTE at defaults equals the current driver
    row's certified values (oracle parity re-asserted)."""
    out = matryoshka_recall(load_table(spark, sf_dir, "embeddings"))
    assert_matches_oracle(
        out,
        duck.execute(matryoshka_recall_sql()).df(),
        "matryoshka_defaults",
    )


def test_matryoshka_n_queries_rail():
    with pytest.raises(ValueError, match="n_queries"):
        matryoshka_recall_sql(n_queries=0)
