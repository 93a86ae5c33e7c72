"""Gopher-style named quality rules — oracle parity + rule semantics."""

from __future__ import annotations

import pandas as pd

from minisql_engine_spark.operators.quality_rules import (
    quality_rule_report,
    quality_rule_report_sql,
    quality_rule_summary,
    quality_rule_summary_sql,
)
from minisql_engine_spark.sources.parquet_catalog import load_table
from tests.conftest import assert_matches_oracle


def test_rule_report_oracle_corpus(spark, duck, sf_dir):
    out = quality_rule_report(load_table(spark, sf_dir, "documents"))
    assert_matches_oracle(
        out, duck.execute(quality_rule_report_sql()).df(), "qr-report"
    )


def test_rule_summary_oracle_corpus(spark, duck, sf_dir):
    out = quality_rule_summary(load_table(spark, sf_dir, "documents"))
    assert_matches_oracle(
        out, duck.execute(quality_rule_summary_sql()).df(), "qr-summary"
    )


def test_rule_semantics_edges(spark, duck):
    rows = [
        (1, "the cat and the dog sat on the mat in peace today really"),
        (2, "!!! ### $$$ %%%"),          # symbols, no stopwords, short
        (3, ""),                          # empty → every rule fails
        (4, None),                        # NULL → every rule fails
        (5, "a b c d e f g h i j k l"),   # mean word length 1 → fails
        (6, "supercalifragilisticexpialidocious " * 12),  # words too long
        (7, "12 34 56 78 90 11 22 33 44 55"),  # no alphabetic tokens
    ]
    sdf = spark.createDataFrame(rows, "doc_id bigint, text string")
    duck.register("_qr", pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = quality_rule_report(sdf)
    assert_matches_oracle(
        out,
        duck.execute(quality_rule_report_sql(table="_qr")).df(),
        "qr-edges",
    )
    r = {x.doc_id: x for x in out.collect()}
    assert r[1].passes_all
    assert not r[2].r_word_count and not r[2].r_stopword_hits
    # empty and NULL keep their rows (gate accounts for every doc)
    # but fail everything
    for d in (3, 4):
        assert r[d].n_tokens_q == 0 and not r[d].passes_all
    assert not r[5].r_mean_word_len
    assert not r[6].r_mean_word_len
    assert not r[7].r_alpha_ratio and not r[7].r_mean_word_len


def test_summary_counts_match_report(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rep = quality_rule_report(docs).toPandas()
    s = quality_rule_summary(docs).collect()[0]
    assert s.n_docs == len(rep)
    assert s.n_pass == int(rep.passes_all.sum())
    assert s.fail_word_count == int((~rep.r_word_count).sum())
    assert s.fail_stopword_hits == int((~rep.r_stopword_hits).sum())
