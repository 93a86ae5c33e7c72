"""Duplicate-span detection — oracle parity + island-merge edges."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.driver_gate

import pandas as pd

from minisql_engine_spark.operators.span_dedup import (
    cut_spans,
    cut_spans_sql,
    duplicate_spans,
    duplicate_spans_sql,
)
from minisql_engine_spark.sources.parquet_catalog import load_table
from tests.conftest import assert_matches_oracle


def test_spans_oracle_corpus(spark, duck, sf_dir):
    out = duplicate_spans(load_table(spark, sf_dir, "documents"))
    assert_matches_oracle(
        out, duck.execute(duplicate_spans_sql()).df(), "spans"
    )


def _run(spark, duck, rows, k=3, min_count=2):
    sdf = spark.createDataFrame(rows, "doc_id bigint, text string")
    duck.register("_sp", pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = duplicate_spans(sdf, k=k, min_count=min_count)
    assert_matches_oracle(
        out,
        duck.execute(
            duplicate_spans_sql(k=k, min_count=min_count, table="_sp")
        ).df(),
        "spans-edge",
    )
    return {
        (r.doc_id, r.span_start, r.span_end): r.span_tokens
        for r in out.collect()
    }


def test_cross_doc_shared_run_is_one_maximal_span(spark, duck):
    """A 5-token run shared by two docs → overlapping k=3 windows
    merge into ONE maximal span covering all 5 tokens in each doc."""
    rows = [
        (1, "a b c d e x1 y1 z1"),
        (2, "q1 q2 a b c d e"),
        (3, "u1 u2 u3 u4"),
    ]
    got = _run(spark, duck, rows)
    assert got == {(1, 0, 5): 5, (2, 2, 7): 5}


def test_within_doc_repeat_counts_as_duplicate(spark, duck):
    """min_count counts OCCURRENCES, so a doc repeating its own
    3-gram is flagged even with no other doc involved."""
    rows = [(1, "a b c m1 m2 m3 a b c"), (2, "n1 n2 n3 n4")]
    got = _run(spark, duck, rows)
    assert got == {(1, 0, 3): 3, (1, 6, 9): 3}


def test_gap_splits_spans_and_adjacent_merge(spark, duck):
    """Two duplicated regions separated by unique tokens stay two
    spans; back-to-back duplicated windows merge."""
    rows = [
        (1, "a b c u1 u2 u3 u4 d e f"),
        (2, "a b c w1 w2 w3 w4 d e f"),
    ]
    got = _run(spark, duck, rows)
    assert got == {
        (1, 0, 3): 3, (1, 7, 10): 3,
        (2, 0, 3): 3, (2, 7, 10): 3,
    }


def test_short_docs_and_empty_produce_nothing(spark, duck):
    rows = [(1, "a b"), (2, ""), (3, None), (4, "a b")]
    # k=3: both "a b" docs are below the granularity floor
    assert _run(spark, duck, rows) == {}


def test_cut_spans_oracle_corpus(spark, duck, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = cut_spans(docs, duplicate_spans(docs))
    assert_matches_oracle(
        out, duck.execute(cut_spans_sql()).df(), "cut-spans"
    )


def test_cut_spans_removes_shared_run_keeps_rest(spark, duck):
    rows = [
        (1, "a b c d e x1 y1 z1"),
        (2, "q1 q2 a b c d e"),
        (3, "u1 u2 u3 u4"),
        (4, ""),
    ]
    sdf = spark.createDataFrame(rows, "doc_id bigint, text string")
    duck.register("_cs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = cut_spans(sdf, duplicate_spans(sdf, k=3))
    assert_matches_oracle(
        out,
        duck.execute(cut_spans_sql(k=3, table="_cs")).df(),
        "cut-edge",
    )
    got = {r.doc_id: (r.text, r.n_cut_tokens) for r in out.collect()}
    assert got == {
        1: ("x1 y1 z1", 5),
        2: ("q1 q2", 5),
        3: ("u1 u2 u3 u4", 0),
    }
