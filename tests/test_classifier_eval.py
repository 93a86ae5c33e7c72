"""Classifier evaluation — oracle parity, hand-checked metrics on a
crafted corpus, midrank tie handling vs a Python replay, and the
planted-signal discrimination gate (the nb_doc_classifier
convention: the synthetic corpus is near-chance, so separation is
pinned where signal is planted)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from minisql_engine_spark.operators.classifier_eval import (
    FX,
    classifier_eval,
    classifier_eval_sql,
    stopword_score,
    stopword_score_sql,
)
from minisql_engine_spark.sources.parquet_catalog import load_table
from tests.conftest import assert_matches_oracle


def _scored(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return stopword_score(docs).join(
        docs.select(
            "doc_id", (F.col("lang") == "en").cast("int").alias("y")
        ),
        "doc_id",
    )


def test_classifier_eval_oracle_corpus(spark, duck, sf_dir):
    out = classifier_eval(
        _scored(spark, sf_dir),
        label_col="y",
        score_col="s",
        threshold_units=50_000,
    )
    scored_sql = (
        "SELECT CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y, t.s"
        " FROM (" + stopword_score_sql() + ") t"
        " JOIN documents d USING (doc_id)"
    )
    assert_matches_oracle(
        out,
        duck.execute(
            classifier_eval_sql(scored_sql, threshold_units=50_000)
        ).df(),
        "classifier_eval",
    )


def test_classifier_eval_hand_checked(spark):
    """6 rows, scores with a 3-way tie straddling both classes —
    every metric verified against pencil-and-paper midranks."""
    rows = [
        (1, 100_000), (1, 500_000), (1, 500_000),
        (0, 500_000), (0, 200_000), (0, 900_000),
    ]
    df = spark.createDataFrame(rows, "y int, s long")
    got = {
        r["metric"]: r["value_units"]
        for r in classifier_eval(
            df, label_col="y", score_col="s", threshold_units=500_000
        ).collect()
    }
    # ranks ascending: 100k->1, 200k->2, 500k tie -> midrank 4 (3,4,5),
    # 900k->6. ranksum_pos = 1 + 4 + 4 = 9; U = 9 - 3*4/2 = 3;
    # AUC = 3 / (3*3) = 1/3
    assert got["n_scored"] == 6 and got["n_pos"] == 3
    assert got["auc_fx6"] == FX // 3
    # threshold 500k: predicted positive = the 500k tie + 900k
    assert (got["tp"], got["fp"], got["fn"], got["tn"]) == (2, 2, 1, 1)
    assert got["precision_fx6"] == FX // 2
    assert got["recall_fx6"] == 2 * FX // 3
    # F1 = 2*2 / (2*2 + 2 + 1) = 4/7
    assert got["f1_fx6"] == 4 * FX // 7
    # ECE bins (width 100k): bin1={100k:y1} acc=1e6 conf=1e5 ->
    # term=900000; bin2={200k:y0} acc=0 conf=2e5 -> 200000;
    # bin5={500k,500k,500k} acc=2/3e6 conf=5e5 ->
    # 3*|666666-500000|=499998; bin9={900k:y0} acc=0 conf=9e5 ->
    # 900000; ece = (900000+200000+499998+900000) // 6
    assert got["ece_fx6"] == (900_000 + 200_000 + 499_998 + 900_000) // 6


def test_classifier_eval_python_midrank_replay(spark, sf_dir):
    """AUC equals a direct Python midrank computation over the same
    scored rows — pins the tie-handling arithmetic corpus-wide."""
    scored = _scored(spark, sf_dir)
    rows = [(r["y"], r["s"]) for r in scored.collect()]
    got = {
        r["metric"]: r["value_units"]
        for r in classifier_eval(
            scored, label_col="y", score_col="s"
        ).collect()
    }
    by_s: dict[int, list[int]] = {}
    for y, s in rows:
        by_s.setdefault(s, []).append(y)
    cum = 0
    rs2 = 0
    for s in sorted(by_s):
        grp = by_s[s]
        n, np_ = len(grp), sum(grp)
        rs2 += np_ * (2 * cum + n + 1)
        cum += n
    n_pos = sum(y for y, _ in rows)
    n_neg = len(rows) - n_pos
    want = (rs2 - n_pos * (n_pos + 1)) * FX // (2 * n_pos * n_neg)
    assert got["auc_fx6"] == want


def test_classifier_eval_planted_signal(spark):
    """Perfectly separable scores -> AUC 1.0, ECE reflects the
    mis-calibrated-but-discriminative regime; inverted scores ->
    AUC 0. The discrimination gate the soup corpus cannot provide."""
    pos = [(1, 800_000 + i) for i in range(50)]
    neg = [(0, 100_000 + i) for i in range(50)]
    df = spark.createDataFrame(pos + neg, "y int, s long")
    got = {
        r["metric"]: r["value_units"]
        for r in classifier_eval(df, "y", "s").collect()
    }
    assert got["auc_fx6"] == FX
    inv = spark.createDataFrame(
        [(1 - y, s) for y, s in pos + neg], "y int, s long"
    )
    got_inv = {
        r["metric"]: r["value_units"]
        for r in classifier_eval(inv, "y", "s").collect()
    }
    assert got_inv["auc_fx6"] == 0


def test_classifier_eval_degenerate_single_class(spark):
    """One class only: AUC is NULL (not fabricated), counts intact."""
    df = spark.createDataFrame(
        [(1, 10_000), (1, 20_000)], "y int, s long"
    )
    got = {
        r["metric"]: r["value_units"]
        for r in classifier_eval(df, "y", "s").collect()
    }
    assert got["auc_fx6"] is None
    assert got["n_neg"] == 0 and got["recall_fx6"] == 0


def test_classifier_eval_rejects_bad_params(spark):
    df = None
    with pytest.raises(ValueError, match="threshold_units"):
        classifier_eval_sql("SELECT 1 AS y, 1 AS s", threshold_units=-1)
    with pytest.raises(ValueError, match="n_bins"):
        classifier_eval_sql("SELECT 1 AS y, 1 AS s", n_bins=7)
