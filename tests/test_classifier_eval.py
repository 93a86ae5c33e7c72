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


def _kappa_vals(spark, rows):
    from minisql_engine_spark.operators.classifier_eval import (
        agreement_kappa,
    )

    df = spark.createDataFrame(rows, "rater_a string, rater_b string")
    return {
        r["metric"]: r["value_units"]
        for r in agreement_kappa(df).collect()
    }


def test_kappa_oracle_composed_raters(spark, duck, sf_dir):
    """The driver row's exact shape: NB prediction vs the stopword
    heuristic, full chain vs DuckDB."""
    from minisql_engine_spark.operators.classify import nb_classify_self
    from minisql_engine_spark.operators.classifier_eval import (
        agreement_kappa,
        agreement_kappa_sql,
        stopword_score_sql,
    )

    docs = load_table(spark, sf_dir, "documents")
    nb = nb_classify_self(docs).select("doc_id", "predicted")
    sw = stopword_score(docs).select(
        "doc_id",
        F.when(F.col("s") >= 50_000, F.lit("en"))
        .otherwise(F.lit("xx"))
        .alias("rater_b"),
    )
    out = agreement_kappa(
        nb.join(sw, "doc_id").select(
            F.col("predicted").alias("rater_a"), "rater_b"
        )
    )
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_for_kappa", "/root/repo/__spark_entry__.py"
    )
    em = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(em)
    assert_matches_oracle(
        out,
        duck.execute(
            em.oracle_sql()["classifier_agreement_kappa"]
        ).df(),
        "kappa",
    )


def test_kappa_hand_checked_and_sign(spark):
    """Cohen's worked-example arithmetic plus the NEGATIVE-kappa
    branch — the one where a naive DIV would diverge between engines
    (Spark truncates toward zero, DuckDB floors)."""
    # po=0.75, pe=0.5 -> kappa = 0.5
    got = _kappa_vals(
        spark, [("x", "x"), ("x", "y"), ("y", "y"), ("y", "y")]
    )
    assert (got["po_fx6"], got["pe_fx6"], got["kappa_fx6"]) == (
        750_000,
        500_000,
        500_000,
    )
    # perfect disagreement with symmetric marginals -> kappa = -1
    got = _kappa_vals(spark, [("x", "y"), ("y", "x")])
    assert got["kappa_fx6"] == -1_000_000
    # perfect agreement -> kappa = 1
    got = _kappa_vals(spark, [("x", "x"), ("y", "y")])
    assert got["kappa_fx6"] == 1_000_000
    # constant raters (pe = 1) -> NULL, not a fabricated value
    got = _kappa_vals(spark, [("x", "x"), ("x", "x")])
    assert got["kappa_fx6"] is None


def test_kappa_negative_parity_with_oracle(spark, duck):
    """The negative branch agrees across engines — the kappa+1
    construction is what makes floor-division portable here."""
    from minisql_engine_spark.operators.classifier_eval import (
        agreement_kappa,
        agreement_kappa_sql,
    )

    rows = [("x", "y"), ("y", "x"), ("x", "y"), ("y", "y")]
    df = spark.createDataFrame(rows, "rater_a string, rater_b string")
    vals = ",".join(f"('{a}','{b}')" for a, b in rows)
    assert_matches_oracle(
        agreement_kappa(df),
        duck.execute(
            agreement_kappa_sql(
                f"SELECT * FROM (VALUES {vals}) t(a, b)"
            )
        ).df(),
        "kappa_neg",
    )
