"""Curriculum ordering — determinism, bucket monotonicity, oracle."""

from __future__ import annotations

import pytest

from minisql_engine_spark.operators.curriculum import (
    curriculum_order,
    curriculum_order_sql,
)
from minisql_engine_spark.sources import load_table
from tests.conftest import assert_matches_oracle


def test_oracle_parity_on_documents(spark, duck, sf_dir):
    out = curriculum_order(
        load_table(spark, sf_dir, "documents"), "n_chars", n_buckets=4
    )
    ddf = duck.execute(
        curriculum_order_sql("n_chars", n_buckets=4)
    ).fetchdf()
    assert_matches_oracle(out, ddf, "curriculum_order")


def test_buckets_monotone_in_position_and_score(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rows = curriculum_order(docs, "n_chars").orderBy("position").collect()
    buckets = [r["bucket"] for r in rows]
    assert buckets == sorted(buckets)  # easy -> hard, never back
    assert set(buckets) == {0, 1, 2}
    # positions are a dense 1..n permutation
    assert [r["position"] for r in rows] == list(range(1, len(rows) + 1))


def test_descending_reverses_buckets_only(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    asc = curriculum_order(docs, "n_chars", seed="s")
    desc = curriculum_order(docs, "n_chars", seed="s", ascending=False)
    a = {r["doc_id"]: r for r in asc.collect()}
    d = {r["doc_id"]: r for r in desc.collect()}
    n_b = max(r["bucket"] for r in a.values())
    for i in a:
        assert a[i]["bucket"] == d[i]["bucket"]  # bucket unchanged
        assert a[i]["priority"] == d[i]["priority"]
    first_desc = min(d.values(), key=lambda r: r["position"])
    assert first_desc["bucket"] == n_b


def test_rebuild_is_byte_identical_and_seed_moves_it(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    one = curriculum_order(docs, "n_chars", seed="a").collect()
    two = curriculum_order(docs, "n_chars", seed="a").collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, two))
    other = curriculum_order(docs, "n_chars", seed="b").collect()
    pos_a = {r["doc_id"]: r["position"] for r in one}
    pos_b = {r["doc_id"]: r["position"] for r in other}
    assert any(pos_a[i] != pos_b[i] for i in pos_a)


def test_rejects_single_bucket(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        curriculum_order(docs, "n_chars", n_buckets=1)
