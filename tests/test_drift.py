"""Corpus drift monitor — JS divergence / OOV / quantile / mix shift."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from minisql_engine_spark.operators.drift import (
    corpus_drift,
    corpus_drift_sql,
)
from minisql_engine_spark.sources import load_table
from tests.conftest import assert_matches_oracle


def test_corpus_drift_oracle(spark, duck, sf_dir):
    """Even/odd doc_id split of the documents corpus — every one of
    the six metrics must hash-match the DuckDB replay."""
    docs = load_table(spark, sf_dir, "documents")
    out = corpus_drift(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
    )
    oracle = corpus_drift_sql(
        "documents", "doc_id % 2 = 0", "doc_id % 2 = 1"
    )
    assert_matches_oracle(out, duck.execute(oracle).fetchdf(), "drift")


def test_corpus_drift_identical_slices_are_zero(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(200)
    got = {
        r["metric"]: r["value"]
        for r in corpus_drift(docs, docs).collect()
    }
    assert got["js_divergence_tokens"] == 0.0
    assert got["oov_token_rate"] == 0.0
    assert got["new_token_types"] == 0.0
    assert got["len_p50_shift"] == 0.0
    assert got["len_p90_shift"] == 0.0
    assert got["source_mix_l1"] == 0.0


def test_corpus_drift_disjoint_slices(spark):
    """Disjoint vocabularies and sources: JS hits its base-2 upper
    bound 1, every B occurrence is OOV, and the mix L1 is 2."""
    a = spark.createDataFrame(
        [(1, "alpha beta alpha", 16, "s1"), (2, "beta gamma", 10, "s1")],
        ["doc_id", "text", "n_chars", "source"],
    )
    b = spark.createDataFrame(
        [(3, "delta epsilon", 13, "s2"), (4, "zeta zeta", 9, "s2")],
        ["doc_id", "text", "n_chars", "source"],
    )
    got = {r["metric"]: r["value"] for r in corpus_drift(a, b).collect()}
    assert got["js_divergence_tokens"] == pytest.approx(1.0)
    assert got["oov_token_rate"] == 1.0
    assert got["new_token_types"] == 3.0
    assert got["source_mix_l1"] == pytest.approx(2.0)
    assert got["len_p50_shift"] == pytest.approx(11.0 - 13.0)


def test_corpus_drift_empty_text_and_skew(spark):
    """Empty/whitespace docs contribute no tokens (the _ws_tokens
    contract) but still count for length and source metrics."""
    a = spark.createDataFrame(
        [(1, "x y", 3, "s1"), (2, "", 0, "s2"), (3, "  ", 2, "s2")],
        ["doc_id", "text", "n_chars", "source"],
    )
    b = spark.createDataFrame(
        [(4, "x y x", 5, "s1")],
        ["doc_id", "text", "n_chars", "source"],
    )
    got = {r["metric"]: r["value"] for r in corpus_drift(a, b).collect()}
    assert got["new_token_types"] == 0.0
    assert got["oov_token_rate"] == 0.0
    # A: sources s1:1/3, s2:2/3; B: s1:1 → L1 = |1-1/3| + |0-2/3|
    assert got["source_mix_l1"] == pytest.approx(4.0 / 3.0, abs=1e-6)


def test_drift_from_incremental_token_views(spark, sf_dir, tmp_path):
    """The production shape: vocabulary count views maintained
    batch-over-batch (sources/aggview) feed the drift monitor with
    ZERO document scans — and produce the exact token metrics the
    one-shot corpus_drift computes from raw documents."""
    from minisql_engine_spark.operators.drift import (
        drift_from_token_views,
        token_counts_batch,
    )
    from minisql_engine_spark.sources.aggview import (
        init_agg_view,
        read_agg_view,
        update_agg_view,
    )

    docs = load_table(spark, sf_dir, "documents")
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    m = {"n": ("count", None)}

    views = {}
    for name, half in (("a", half_a), ("b", half_b)):
        path = str(tmp_path / f"vocab_{name}")
        # maintain the vocabulary view over three ingest batches
        batches = [
            token_counts_batch(half.filter(F.col("doc_id") % 3 == i))
            for i in range(3)
        ]
        init_agg_view(batches[0], path, "t", m)
        for b in batches[1:]:
            update_agg_view(spark, path, b, "t", m)
        views[name] = read_agg_view(spark, path, m)

    got = {
        r["metric"]: r["value"]
        for r in drift_from_token_views(views["a"], views["b"]).collect()
    }
    want = {
        r["metric"]: r["value"]
        for r in corpus_drift(half_a, half_b).collect()
        if r["metric"]
        in ("js_divergence_tokens", "oov_token_rate", "new_token_types")
    }
    assert got == want


def test_embedding_drift_oracle(spark, duck, sf_dir):
    from minisql_engine_spark.operators.drift import (
        embedding_drift,
        embedding_drift_sql,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    out = embedding_drift(
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 == 1),
    )
    oracle = embedding_drift_sql(
        "embeddings", "vec_id % 2 = 0", "vec_id % 2 = 1"
    )
    assert_matches_oracle(out, duck.execute(oracle).fetchdf(), "embdrift")


def test_embedding_drift_identity_and_scale(spark, sf_dir):
    from minisql_engine_spark.operators.drift import embedding_drift

    emb = load_table(spark, sf_dir, "embeddings").limit(100)
    same = {
        r["metric"]: r["value"]
        for r in embedding_drift(emb, emb).collect()
    }
    assert same["centroid_cosine_dist"] == 0.0
    assert same["centroid_l2_dist"] == 0.0
    assert same["mean_sqnorm_shift"] == 0.0
    # doubling every vector: direction unchanged, energy quadruples
    doubled = emb.withColumn(
        "embedding", F.transform("embedding", lambda x: x * 2)
    )
    got = {
        r["metric"]: r["value"]
        for r in embedding_drift(emb, doubled).collect()
    }
    assert got["centroid_cosine_dist"] == pytest.approx(0.0, abs=1e-6)
    assert got["mean_sqnorm_shift"] > 0


def test_psi_drift_oracle(spark, duck, sf_dir):
    from minisql_engine_spark.operators.drift import (
        psi_drift,
        psi_drift_sql,
    )

    ev = load_table(spark, sf_dir, "events")
    out = psi_drift(
        ev.filter(F.col("event_id") % 2 == 0),
        ev.filter(F.col("event_id") % 2 == 1),
        "value",
        0.0,
        100.0,
        n_buckets=10,
    )
    oracle = psi_drift_sql(
        "events",
        "event_id % 2 = 0",
        "event_id % 2 = 1",
        "value",
        0.0,
        100.0,
        n_buckets=10,
    )
    assert_matches_oracle(out, duck.execute(oracle).fetchdf(), "psi")


def test_psi_identical_is_zero_and_shift_detected(spark):
    from minisql_engine_spark.operators.drift import psi_drift

    a = spark.createDataFrame([(float(i % 50),) for i in range(500)], ["v"])
    same = psi_drift(a, a, "v", 0.0, 50.0).collect()
    tot = [r for r in same if r["bucket"] == -100][0]
    assert tot["psi_term"] == 0.0
    # shifted distribution → PSI over the 0.25 'shifted' threshold
    b = spark.createDataFrame(
        [(float(i % 50) + 25.0,) for i in range(500)], ["v"]
    )
    shifted = psi_drift(a, b, "v", 0.0, 50.0).collect()
    tot2 = [r for r in shifted if r["bucket"] == -100][0]
    assert tot2["psi_term"] > 0.25


def test_fx6_bitwise_twin_of_duckdb_fuzz(spark):
    """The module's portable round edge ``_fx6`` (floor(x·1e6+0.5)/1e6,
    pure IEEE ops) must be BIT-identical between Spark and DuckDB —
    including values landing precisely on scaled .5 boundaries, the
    class that broke raw round(x,6) pairing in round 8 (embedding_drift
    driver hash miss). Values are staged through real DOUBLE columns in
    both engines (literals would parse as DECIMAL in DuckDB)."""
    import random
    import struct

    import duckdb as _duck

    from minisql_engine_spark.operators.drift import _fx6, _fx6_sql

    rng = random.Random(9)
    vals = [rng.uniform(-2, 2) for _ in range(2000)]
    # boundary-heavy: halves of 6-decimal numbers, exact binary
    # fractions, and tiny negatives (the -0.0 trap)
    vals += [
        ((i * 2 + 1) / 2) / 10**6 * s
        for i in range(500)
        for s in (1.0, -1.0)
    ]
    vals += [k / 2**9 for k in range(-64, 65)] + [-1e-9, -0.0, 0.0]

    sdf = spark.createDataFrame([(v,) for v in vals], ["v"])
    got_spark = [
        r["r"] for r in sdf.select(_fx6(F.col("v")).alias("r")).collect()
    ]
    con = _duck.connect()
    got_duck = [
        r[0]
        for r in con.execute(
            f"SELECT {_fx6_sql('v')} FROM (SELECT"
            " unnest(CAST(? AS DOUBLE[])) AS v)",
            [vals],
        ).fetchall()
    ]
    for v, a, b in zip(vals, got_spark, got_duck):
        assert struct.pack("<d", a) == struct.pack("<d", b), (v, a, b)
        assert struct.pack("<d", a) != struct.pack("<d", -0.0), v


def test_embedding_drift_order_independent(spark, duck, sf_dir):
    """The r8 regression shape: the centroid combine must not depend
    on partition fold order. Repartitioning the inputs arbitrarily
    must yield BIT-identical metric values (the _dsum exact-sum
    guarantee), and both must equal the DuckDB oracle exactly."""
    import struct

    from minisql_engine_spark.operators.drift import (
        embedding_drift,
        embedding_drift_sql,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.filter(F.col("vec_id") % 2 == 0)
    b = emb.filter(F.col("vec_id") % 2 == 1)

    def bits(df):
        return [
            (r["metric"], struct.pack("<d", r["value"]).hex())
            for r in df.collect()
        ]

    base = bits(embedding_drift(a, b))
    shuffled = bits(
        embedding_drift(a.repartition(17), b.repartition(3))
    )
    assert base == shuffled
    oracle = duck.execute(
        embedding_drift_sql(
            "embeddings", "vec_id % 2 = 0", "vec_id % 2 = 1"
        )
    ).fetchdf()
    want = [
        (m, struct.pack("<d", v).hex())
        for m, v in zip(oracle["metric"], oracle["value"])
    ]
    assert base == want


def test_fx6g_guarded_twin_extremes(spark, duck):
    """fx6g (the guarded tier) matches its DuckDB twin at the
    extremes the guard exists for: beyond FX6_BOUND, NaN, ±Inf —
    Spark's BIGINT floor would saturate/collapse these unguarded."""
    import math
    import struct

    from pyspark.sql import functions as F

    from minisql_engine_spark.operators.portable_round import (
        fx6g,
        fx6g_sql,
    )

    vals = [
        0.0, -0.0, 1.2345675, -1.2345665, 7812.5e-6,
        9.99e11, 1.0001e12, 9.3e18, -9.3e18, 123456789.1234565,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [
        r[0] for r in df.select(fx6g(F.col("x")).alias("y")).collect()
    ]
    duck.execute("CREATE OR REPLACE TABLE _fxg AS SELECT "
                 "unnest(?::DOUBLE[]) AS x", [vals])
    want = [
        r[0]
        for r in duck.execute(
            f"SELECT {fx6g_sql('x')} FROM _fxg"
        ).fetchall()
    ]
    for v, g, w in zip(vals, got, want):
        assert struct.pack("d", g) == struct.pack("d", w), v
    # NaN/Inf via SQL literals on both sides (param binding mangles
    # NaN): both engines order NaN above all doubles -> passthrough
    nan_spark = df.sparkSession.sql(
        "SELECT double('NaN') AS x"
    ).select(fx6g(F.col("x"))).collect()[0][0]
    assert math.isnan(nan_spark)
    nan_duck = duck.execute(
        f"SELECT {fx6g_sql(chr(39) + 'NaN' + chr(39) + '::DOUBLE')}"
    ).fetchall()[0][0]
    assert math.isnan(nan_duck)
    inf_spark = df.sparkSession.sql(
        "SELECT double('Infinity') AS x"
    ).select(fx6g(F.col("x"))).collect()[0][0]
    assert math.isinf(inf_spark)
