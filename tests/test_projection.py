"""JL random projection: oracle parity, assembly, distance preservation."""

from __future__ import annotations

import math

import numpy as np
import pytest

from minisql_engine_spark.operators.projection import (
    jl_project,
    jl_project_sql,
    jl_project_vectors,
    sign_matrix,
)
from minisql_engine_spark.sources import load_table

from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("d_out", [8, 16])
def test_jl_project_oracle(spark, duck, sf_dir, d_out):
    emb = load_table(spark, sf_dir, "embeddings")
    out = jl_project(emb, d_out)
    oracle = duck.sql(jl_project_sql("embeddings", d_out, 64)).df()
    assert_matches_oracle(out, oracle, f"jl_project d_out={d_out}")


def test_sign_matrix_is_balanced_and_deterministic(spark):
    s1 = sign_matrix(spark, 64, 16).toPandas()
    s2 = sign_matrix(spark, 64, 16).toPandas()
    assert s1.equals(s2)
    assert set(s1["sign"]) == {-1, 1}
    # md5 top bit is unbiased: the 1024-entry matrix should be near
    # 50/50 (binomial 3σ ≈ 48)
    assert abs(int(s1["sign"].sum())) < 150


def test_vectors_assembly_matches_long(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    long = jl_project(emb, 8).toPandas()
    vecs = jl_project_vectors(emb, 8).toPandas()
    by_id = {r["vec_id"]: r["reduced"] for _, r in vecs.iterrows()}
    for vid, grp in long.groupby("vec_id"):
        expected = list(grp.sort_values("j")["comp"])
        assert list(by_id[vid]) == expected


def test_distance_preservation(spark, sf_dir):
    """JL sanity: with d'=16 the projected pairwise L2 distances must
    correlate strongly with the originals (not a bit-exactness claim —
    that's the oracle test — but the property the operator exists
    for)."""
    emb = load_table(spark, sf_dir, "embeddings").limit(80)
    rows = emb.toPandas()
    X = np.array([np.asarray(v, dtype=float) for v in rows["embedding"]])
    vecs = jl_project_vectors(emb, 16).toPandas().sort_values("vec_id")
    ids = list(rows["vec_id"])
    Y = np.array(
        [np.asarray(v, dtype=float) for v in vecs.set_index("vec_id").loc[ids]["reduced"]]
    )
    rng = np.random.default_rng(7)
    pairs = rng.choice(len(X), size=(200, 2))
    do = np.array([np.linalg.norm(X[a] - X[b]) for a, b in pairs])
    dp = np.array([np.linalg.norm(Y[a] - Y[b]) for a, b in pairs])
    mask = do > 0
    # Correlation of (do, dp) is NOT the right statistic here: this
    # corpus's pairwise distances concentrate (near-isotropic vectors),
    # so the between-pair variance is noise-sized.  The JL guarantee is
    # per-pair: each dp/do ≈ 1 within ε ~ sqrt(2/d').  Assert the
    # calibration (E[dp²] = do² under the 1/√d' scaling) and a bounded
    # tail.
    ratio = dp[mask] / do[mask]
    med = float(np.median(ratio))
    assert 0.7 < med < 1.4, f"median distance ratio off: {med}"
    frac_ok = float(np.mean(np.abs(ratio - 1.0) < 0.8))
    assert frac_ok > 0.85, f"too many distorted pairs: {1 - frac_ok:.0%}"


def test_empty_input_raises(spark):
    empty = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    with pytest.raises(ValueError):
        jl_project(empty, 8)
    with pytest.raises(ValueError):
        jl_project(empty.limit(0), 0)
