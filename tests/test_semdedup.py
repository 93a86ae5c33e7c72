"""SemDeDup cluster-then-compare semantic dedup — oracle parity,
group resolution, and the keep-rule contract."""

from __future__ import annotations

import pandas as pd

from minisql_engine_spark.operators.semdedup import (
    semantic_dedup,
    semantic_dedup_sql,
)
from minisql_engine_spark.sources.parquet_catalog import load_table
from tests.conftest import assert_matches_oracle


def test_semdedup_oracle_corpus(spark, duck, sf_dir):
    out = semantic_dedup(load_table(spark, sf_dir, "embeddings"))
    assert_matches_oracle(
        out, duck.execute(semantic_dedup_sql()).df(), "semdedup"
    )


def test_semdedup_covers_corpus_and_keeps_one_per_group(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = semantic_dedup(emb).toPandas()
    # every vector gets a roster row
    assert len(out) == emb.count()
    # exactly one kept member per component, and it is the min id
    g = out.groupby("component")
    assert (g["is_kept"].sum() == 1).all()
    kept = out[out.is_kept].set_index("component")["vec_id"]
    mins = g["vec_id"].min()
    assert (kept.sort_index() == mins.sort_index()).all()


def test_semdedup_transitive_groups(spark, duck):
    """A≈B and B≈C land in ONE component even when A·C is below
    threshold — the connected-components semantics the paper's
    per-cluster dedup needs."""
    import math

    def vec(theta):
        # unit vectors in a 2-D subspace of the 4-dim space
        return [math.cos(theta), math.sin(theta), 0.0, 0.0]

    rows = [
        (1, vec(0.00), 0),
        (2, vec(0.50), 0),   # cos(1,2)=.878, cos(2,3)=.878, cos(1,3)=.540
        (3, vec(1.00), 0),
        (4, [0.0, 0.0, 1.0, 0.0], 0),  # orthogonal — singleton
    ]
    sdf = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    duck.register(
        "_sem",
        pd.DataFrame(rows, columns=["vec_id", "embedding", "label"]),
    )
    out = semantic_dedup(
        sdf, threshold=0.8, n_cells=1, n_iter=1, dims=4
    )
    oracle = semantic_dedup_sql(
        threshold=0.8, n_cells=1, n_iter=1, dims=4, table="_sem"
    )
    assert_matches_oracle(out, duck.execute(oracle).df(), "semdedup-tri")
    got = {r.vec_id: (r.component, r.is_kept) for r in out.collect()}
    assert got[1] == (1, True)
    assert got[2] == (1, False)
    assert got[3] == (1, False)   # transitive via 2
    assert got[4] == (4, True)    # orthogonal singleton survives


def test_semantic_dedup_auto_cells(spark, duck, sf_dir):
    """n_cells=None resolves to the √n rule and stays oracle-exact
    when the twin is built with the SAME resolved count."""
    from minisql_engine_spark.operators.semdedup import (
        auto_n_cells,
        semantic_dedup,
        semantic_dedup_sql,
    )
    from minisql_engine_spark.sources.parquet_catalog import load_table
    from tests.conftest import assert_matches_oracle

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    resolved = auto_n_cells(n)
    assert resolved * resolved <= max(n, 16)  # √n rule (clamped)
    out = semantic_dedup(emb, n_cells=None)
    assert_matches_oracle(
        out,
        duck.execute(semantic_dedup_sql(n_cells=resolved)).df(),
        "semdedup_auto",
    )
    # the rule itself: monotone, clamped
    assert auto_n_cells(0) == 4
    assert auto_n_cells(10**9) == 4096
    assert auto_n_cells(2_000) <= auto_n_cells(20_000)


def test_auto_n_cells_sql_matches_isqrt(duck):
    """AUTO_N_CELLS_SQL (the oracle's in-query derivation) equals
    math.isqrt clamped, including at perfect-square boundaries —
    floor(sqrt(n)) in double is exact below the 4096² clamp."""
    from minisql_engine_spark.operators.semdedup import (
        AUTO_N_CELLS_SQL,
        auto_n_cells,
    )

    for n in [0, 1, 4, 15, 16, 17, 499, 500, 501, 2_000,
              4095 * 4095, 4095 * 4095 + 1, 4096 * 4096 - 1,
              4096 * 4096, 10**9]:
        got = duck.execute(
            "WITH e AS (SELECT * FROM range(" + str(n) + "))"
            " SELECT " + AUTO_N_CELLS_SQL
        ).fetchone()[0]
        assert got == auto_n_cells(n), n


def test_semantic_dedup_default_is_auto(spark, duck, sf_dir):
    """The DEFAULTS pair: semantic_dedup() with no n_cells equals
    the SQL twin with no n_cells — both derive √n from the corpus
    (the r13 scale-correct default the driver row runs)."""
    from minisql_engine_spark.operators.semdedup import (
        semantic_dedup,
        semantic_dedup_sql,
    )
    from minisql_engine_spark.sources.parquet_catalog import load_table
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(
        semantic_dedup(load_table(spark, sf_dir, "embeddings")),
        duck.execute(semantic_dedup_sql()).df(),
        "semdedup_default_auto",
    )


def test_keep_farthest_oracle(spark, duck, sf_dir):
    """Paper-exact SemDeDup keep rule on the corpus — full oracle
    parity at the auto-cell defaults, and the structural contracts:
    one kept member per component, every keeper minimizes
    (sim_fx6, vec_id) within its component."""
    from minisql_engine_spark.operators.semdedup import (
        semantic_dedup_keep_farthest,
        semantic_dedup_keep_farthest_sql,
    )
    from minisql_engine_spark.sources.parquet_catalog import load_table
    from tests.conftest import assert_matches_oracle

    emb = load_table(spark, sf_dir, "embeddings")
    out = semantic_dedup_keep_farthest(emb)
    assert_matches_oracle(
        out,
        duck.execute(semantic_dedup_keep_farthest_sql()).df(),
        "semdedup_keep_farthest",
    )
    pdf = out.toPandas()
    assert len(pdf) == emb.count()
    g = pdf.groupby("component")
    assert (g["is_kept"].sum() == 1).all()
    # the keeper IS the (sim ASC, id ASC) argmin of its component
    idx = pdf.sort_values(["sim_fx6", "vec_id"]).groupby(
        "component"
    ).head(1)
    want = set(idx.vec_id)
    assert set(pdf[pdf.is_kept].vec_id) == want


def test_keep_farthest_vs_min_id_semantics(spark, duck):
    """Crafted group where the farthest-from-centroid member has the
    LARGER id: min-id keeps 1, paper rule keeps 3 (its centroid
    cosine is lowest). Components identical between rules; the
    orthogonal singleton survives either way."""
    import math

    import pandas as pd

    from minisql_engine_spark.operators.semdedup import (
        semantic_dedup,
        semantic_dedup_keep_farthest,
        semantic_dedup_keep_farthest_sql,
    )
    from tests.conftest import assert_matches_oracle

    def vec(theta):
        return [math.cos(theta), math.sin(theta), 0.0, 0.0]

    # one cell (n_cells=1): after one Lloyd step the centroid is the
    # mean of all four vectors, whose planar angle is ≈0.464 rad.
    # 1(0.4) links 2(0.0) at cos(0.4)=.921 and 3(1.0) at cos(0.6)
    # =.825 — one transitive group (2·3 = cos(1.0)=.540 < .8).
    # Angular distance to the centroid: 1 → .064, 2 → .464,
    # 3 → .536 — id 3 is strictly farthest (no rounding tie; the
    # angles are deliberately asymmetric around the mean).
    rows = [
        (1, vec(0.40), 0),
        (2, vec(0.00), 0),
        (3, vec(1.00), 0),
        (4, [0.0, 0.0, 1.0, 0.0], 0),
    ]
    sdf = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    duck.register(
        "_semf",
        pd.DataFrame(rows, columns=["vec_id", "embedding", "label"]),
    )
    far = semantic_dedup_keep_farthest(
        sdf, threshold=0.8, n_cells=1, n_iter=1, dims=4
    )
    assert_matches_oracle(
        far,
        duck.execute(
            semantic_dedup_keep_farthest_sql(
                threshold=0.8, n_cells=1, n_iter=1, dims=4,
                table="_semf",
            )
        ).df(),
        "semdedup-farthest-crafted",
    )
    fgot = {r.vec_id: (r.component, r.is_kept) for r in far.collect()}
    mgot = {
        r.vec_id: (r.component, r.is_kept)
        for r in semantic_dedup(
            sdf, threshold=0.8, n_cells=1, n_iter=1, dims=4
        ).collect()
    }
    # identical components, different keeper
    assert {k: v[0] for k, v in fgot.items()} == {
        k: v[0] for k, v in mgot.items()
    }
    assert mgot[1][1] and not mgot[3][1]           # min-id keeps 1
    kept = [k for k, v in fgot.items() if v[1] and v[0] == 1]
    assert kept == [3]                              # paper keeps 3
    assert fgot[4][1]                               # singleton kept
