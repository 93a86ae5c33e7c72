"""keep_best_of_cluster — crafted parity (ties, NULL scores,
singleton clusters), and the full curation composition: semantic
duplicate clusters keep their highest-quality member with both the
clustering and the quality score replayed in the oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from minisql_engine_spark.operators.dedup import (
    keep_best_of_cluster,
    keep_best_of_cluster_sql,
)
from minisql_engine_spark.sources.parquet_catalog import load_table
from tests.conftest import assert_matches_oracle


def test_keep_best_crafted(spark, duck):
    """Hand-checked: cluster 1 keeps the top score, a score tie
    breaks to min id, NULL loses to any scored member, an all-NULL
    cluster falls back to min id, singletons are kept."""
    labels = [(1, 10), (2, 10), (3, 10),
              (4, 20), (5, 20),
              (6, 30), (7, 30),
              (8, 40)]
    scores = [(1, 5), (2, 9), (3, 9), (4, 7), (8, 1)]
    ldf = spark.createDataFrame(labels, "doc_id long, component long")
    sdf = spark.createDataFrame(scores, "doc_id long, s long")
    got = {
        r["doc_id"]: r["is_kept"]
        for r in keep_best_of_cluster(ldf, sdf).collect()
    }
    #  cluster 10: 2 and 3 tie at 9 -> min id 2
    #  cluster 20: 4 scored, 5 NULL -> 4
    #  cluster 30: all NULL -> min id 6
    #  cluster 40: singleton -> kept
    assert got == {1: False, 2: True, 3: False,
                   4: True, 5: False,
                   6: True, 7: False,
                   8: True}
    lsql = (
        "SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {c})" for i, c in labels)
        + ") AS t(doc_id, component)"
    )
    ssql = (
        "SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {s})" for i, s in scores)
        + ") AS t(doc_id, s)"
    )
    assert_matches_oracle(
        keep_best_of_cluster(ldf, sdf),
        duck.execute(keep_best_of_cluster_sql(lsql, ssql)).df(),
        "keep_best_crafted",
    )


def test_keep_best_extreme_negative_score_beats_null(spark, duck):
    """A legitimate score at the old NULL sentinel value (-(1<<62))
    must still BEAT a NULL-scored smaller-id member — NULLS LAST is
    structural (a has-score flag), not a numeric sentinel, so no
    real long can collide with 'unscored'. Pins ADVICE r12
    (dedup.py keep_best ordering)."""
    labels = [(1, 10), (2, 10), (3, 20), (4, 20)]
    scores = [(2, -(1 << 62)), (4, -(1 << 62) - 1)]
    ldf = spark.createDataFrame(labels, "doc_id long, component long")
    sdf = spark.createDataFrame(scores, "doc_id long, s long")
    got = {
        r["doc_id"]: r["is_kept"]
        for r in keep_best_of_cluster(ldf, sdf).collect()
    }
    # both clusters: the scored member wins despite the larger id
    assert got == {1: False, 2: True, 3: False, 4: True}
    lsql = (
        "SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {c})" for i, c in labels)
        + ") AS t(doc_id, component)"
    )
    ssql = (
        "SELECT * FROM (VALUES "
        + ", ".join(f"({i}, CAST({s} AS BIGINT))" for i, s in scores)
        + ") AS t(doc_id, s)"
    )
    assert_matches_oracle(
        keep_best_of_cluster(ldf, sdf),
        duck.execute(keep_best_of_cluster_sql(lsql, ssql)).df(),
        "keep_best_long_min",
    )


def test_keep_best_no_corpus_sized_broadcast(spark):
    """The per-cluster chooser join must not FORCE a broadcast: the
    build side has one row per cluster (corpus-cardinality for dedup
    labels), so a hinted broadcast would blow the driver at scale.
    Pins ADVICE r12 (dedup.py:750) at plan level — no
    ResolvedHint/broadcast marker above the aggregate in the
    ANALYZED plan (AQE may still pick a broadcast join physically
    when the cluster count proves tiny; that is its call, not a
    hint's)."""
    ldf = spark.createDataFrame(
        [(1, 10), (2, 10)], "doc_id long, component long"
    )
    sdf = spark.createDataFrame([(1, 5)], "doc_id long, s long")
    analyzed = keep_best_of_cluster(ldf, sdf)._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed
    assert "broadcast" not in analyzed.lower()


def test_keep_best_semantic_quality_composition(spark, duck, sf_dir):
    """The curation chain: semantic_dedup clusters × stopword
    quality scores → keep the best-quality member per semantic
    group, every stage oracle-replayed. Exactly one kept member per
    cluster; against plain min-id semantic_dedup, any divergence is
    a cluster whose best-quality member wasn't the min id."""
    from minisql_engine_spark.operators.classifier_eval import (
        stopword_score,
        stopword_score_sql,
    )
    from minisql_engine_spark.operators.semdedup import (
        semantic_dedup,
        semantic_dedup_sql,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    labels = semantic_dedup(emb).select(
        F.col("vec_id").alias("doc_id"), "component"
    )
    scores = stopword_score(docs)
    out = keep_best_of_cluster(labels, scores)
    oracle = keep_best_of_cluster_sql(
        "SELECT vec_id AS doc_id, component FROM ("
        + semantic_dedup_sql()
        + ")",
        stopword_score_sql(),
    )
    assert_matches_oracle(
        out, duck.execute(oracle).df(), "keep_best_semantic"
    )
    pdf = out.toPandas()
    per_cluster = pdf.groupby("component").is_kept.sum()
    assert (per_cluster == 1).all()
