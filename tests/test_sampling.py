"""Deterministic sampling operators — oracle parity + contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from minisql_engine_spark.operators.sampling import (
    hash_sample,
    hash_split,
    rate_threshold,
    sample_hash_sql,
    stratified_sample,
)
from minisql_engine_spark.sources import load_table
from tests.conftest import assert_matches_oracle


def test_rate_threshold_edges():
    assert rate_threshold(0.0) == "00000000"
    assert rate_threshold(1.0) == "ffffffff"
    assert rate_threshold(0.5) == "80000000"
    with pytest.raises(ValueError):
        rate_threshold(1.5)


def test_hash_sample_matches_oracle_and_rate(spark, duck, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = hash_sample(docs, 0.3, "doc_id").select("doc_id", "lang")
    oracle = (
        "SELECT doc_id, lang FROM documents WHERE "
        f"{sample_hash_sql('doc_id', 'sample')} < '{rate_threshold(0.3)}'"
    )
    ddf = duck.execute(oracle).fetchdf()
    assert_matches_oracle(out, ddf, "hash_sample")
    n_total = docs.count()
    frac = len(ddf) / n_total
    assert 0.2 < frac < 0.4, frac  # md5 uniformity at n=500


def test_hash_sample_is_idempotent(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = sorted(r[0] for r in hash_sample(docs, 0.2, "doc_id").select("doc_id").collect())
    b = sorted(r[0] for r in hash_sample(docs, 0.2, "doc_id").select("doc_id").collect())
    assert a == b
    # different seed → different (but valid) selection
    c = sorted(
        r[0]
        for r in hash_sample(docs, 0.2, "doc_id", seed="other")
        .select("doc_id")
        .collect()
    )
    assert a != c


def test_hash_sample_nested_rates(spark, sf_dir):
    """Threshold comparison makes samples NESTED: the 10% sample is a
    subset of the 30% sample under the same seed — handy for scaling
    ladders (train on 1%, 10%, 100% of the same corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    small = {r[0] for r in hash_sample(docs, 0.1, "doc_id").select("doc_id").collect()}
    big = {r[0] for r in hash_sample(docs, 0.3, "doc_id").select("doc_id").collect()}
    assert small <= big


def test_hash_split_partitions_every_row(spark, duck, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = hash_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).groupBy("split").agg(F.count("*").alias("n"))
    h = sample_hash_sql("doc_id", "split")
    oracle = (
        "SELECT split, count(*) AS n FROM (SELECT CASE"
        f" WHEN {h} < '{rate_threshold(0.8)}' THEN 'train'"
        f" WHEN {h} < '{rate_threshold(0.9)}' THEN 'val'"
        " ELSE 'test' END AS split FROM documents) GROUP BY split"
    )
    assert_matches_oracle(out, duck.execute(oracle).fetchdf(), "hash_split")
    rows = {r["split"]: r["n"] for r in out.collect()}
    assert sum(rows.values()) == docs.count()
    assert rows["train"] > rows["val"] and rows["train"] > rows["test"]


def test_hash_split_validates_fractions(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(docs, "doc_id", {"a": 0.5, "b": 0.2})
    with pytest.raises(ValueError, match="not be empty"):
        hash_split(docs, "doc_id", {})


def test_stratified_sample_quota_and_oracle(spark, duck, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = stratified_sample(docs, "lang", 5, "doc_id").select(
        "doc_id", "lang"
    )
    h = sample_hash_sql("doc_id", "strata")
    oracle = (
        "SELECT doc_id, lang FROM ("
        " SELECT doc_id, lang, row_number() OVER ("
        f"  PARTITION BY lang ORDER BY {h}, doc_id) AS r"
        " FROM documents) WHERE r <= 5"
    )
    assert_matches_oracle(out, duck.execute(oracle).fetchdf(), "stratified")
    per = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    sizes = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in per.items():
        assert n == min(5, sizes[lang]), (lang, n)
    assert set(per) == set(sizes)  # every stratum represented


def test_sampling_is_map_side(spark, sf_dir):
    """hash_sample/hash_split must stay shuffle-free map operators."""
    docs = load_table(spark, sf_dir, "documents")
    out = hash_split(hash_sample(docs, 0.5, "doc_id"), "doc_id", {"a": 1.0})
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    )
    assert "Exchange" not in plan


def test_weighted_sample_oracle(spark, duck, sf_dir):
    """Replicated-min-hash weighted sampling replays byte-for-byte:
    same priorities, same top-k, same tie-break."""
    from minisql_engine_spark.operators.sampling import (
        weighted_sample,
        weighted_sample_sql,
    )
    from minisql_engine_spark.sources import load_table
    from tests.conftest import assert_matches_oracle

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "w", (F.col("n_chars") % 5 + 1)
    )
    out = weighted_sample(docs, 40, "w")
    duck.execute(
        "CREATE OR REPLACE VIEW _wdocs AS"
        " SELECT *, n_chars % 5 + 1 AS w FROM documents"
    )
    ora = duck.execute(weighted_sample_sql("_wdocs", 40, "w")).fetchdf()
    assert_matches_oracle(out, ora, "weighted_sample")


def test_weighted_sample_odds(spark):
    """P(lighter item outranks heavier) must be w1/(w1+w2) — verified
    over many seeds with the exact same hash the operator uses (pure
    hashlib replication, no Spark needed for the distribution)."""
    import hashlib

    w1, w2 = 1, 4
    wins = 0
    n_seeds = 600
    for s in range(n_seeds):
        p1 = min(
            hashlib.md5(f"s{s}:1:{j}".encode()).hexdigest()
            for j in range(1, w1 + 1)
        )
        p2 = min(
            hashlib.md5(f"s{s}:2:{j}".encode()).hexdigest()
            for j in range(1, w2 + 1)
        )
        wins += p2 < p1
    frac = wins / n_seeds
    expect = w2 / (w1 + w2)  # 0.8
    assert abs(frac - expect) < 0.06


def test_weighted_sample_excludes_nonpositive(spark):
    from minisql_engine_spark.operators.sampling import weighted_sample

    rows = [(1, 3), (2, 0), (3, None), (4, 2)]
    sdf = spark.createDataFrame(rows, ["doc_id", "w"])
    got = {r["doc_id"] for r in weighted_sample(sdf, 10, "w").collect()}
    assert got == {1, 4}


def test_hash_sample_rate_one_is_identity(spark, sf_dir):
    """rate >= 1.0 keeps EVERY row — the strict '< threshold' filter
    with a clamped threshold would otherwise drop rows hashing to
    'ff…f' (~2^-32 of a production corpus)."""
    from minisql_engine_spark.operators.sampling import hash_sample
    from minisql_engine_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    assert hash_sample(docs, 1.0, "doc_id").count() == docs.count()
