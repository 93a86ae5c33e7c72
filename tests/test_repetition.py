"""Gopher-family repetition signals: exact fractions, oracle parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from minisql_engine_spark.operators.repetition import (
    repetition_report,
    repetition_report_sql,
)
from minisql_engine_spark.sources import load_table
from tests.conftest import assert_matches_oracle


def test_crafted_fractions_exact(spark):
    docs = spark.createDataFrame(
        [
            # 4 lines, "spam" twice: dup_line_frac 2/4; chars: spam=4
            # twice, alpha=5, beta=4 -> dup_line_char_frac 8/17;
            # tokens: spam spam alpha beta (per line split irrelevant,
            # tokenizer sees the whole text)
            (1, "spam\nspam\nalpha\nbeta"),
            # one repeated line only -> both line fracs 1.0
            (2, "same line\nsame line"),
            # no repetition at all
            (3, "all words here differ fully"),
            # NULL text -> 0 lines, NULL fractions
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_report(docs, top_n=2, dup_n=2).collect()}
    assert out[1]["n_lines"] == 4
    assert out[1]["dup_line_frac"] == 0.5
    assert out[1]["dup_line_char_frac"] == pytest.approx(8 / 17, abs=1e-6)
    assert out[2]["dup_line_frac"] == 1.0
    assert out[2]["dup_line_char_frac"] == 1.0
    # "same line same line": 2-grams = [same line, line same, same
    # line] -> top 2/3, dup (2-1)/3
    assert out[2]["top_ngram_frac"] == pytest.approx(2 / 3, abs=1e-6)
    assert out[2]["dup_ngram_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert out[3]["dup_line_frac"] == 0.0
    assert out[3]["dup_ngram_frac"] == 0.0
    assert out[4]["n_lines"] == 0
    assert out[4]["dup_line_frac"] is None
    assert out[4]["top_ngram_frac"] is None


def test_repetition_oracle_parity_corpus(spark, duck, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = repetition_report(docs)
    assert_matches_oracle(
        out, duck.execute(repetition_report_sql()).fetchdf(), "rep"
    )


def test_repetition_oracle_parity_crafted(spark, duck):
    """Newline-heavy and degenerate docs through BOTH engines —
    the corpus has no newlines, so this pins the line machinery."""
    rows = [
        (1, "spam\nspam\n  spam  \nalpha beta gamma\nalpha beta gamma"),
        (2, "a a a a a a a a"),
        (3, "x y\n\n\nx y\nz"),
        (4, ""),
        (5, "one two three four five six seven"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    duck.execute("DROP TABLE IF EXISTS rep_docs")
    duck.execute(
        "CREATE TABLE rep_docs (doc_id BIGINT, text VARCHAR)"
    )
    duck.executemany(
        "INSERT INTO rep_docs VALUES (?, ?)", rows
    )
    out = repetition_report(docs, top_n=2, dup_n=3)
    oracle = repetition_report_sql(
        table="rep_docs", top_n=2, dup_n=3
    )
    assert_matches_oracle(
        out, duck.execute(oracle).fetchdf(), "rep_crafted"
    )
