"""LSH banding recall audit — corpus oracle parity, the exact-dup
anchor (j=1.0 pairs are always candidates: identical signatures
share every band), the S-curve exposure on planted mid-threshold
pairs, and the query-budget bound."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from minisql_engine_spark.operators.dedup import (
    lsh_recall_audit,
    lsh_recall_audit_sql,
)
from minisql_engine_spark.sources.parquet_catalog import load_table
from tests.conftest import assert_matches_oracle

FX = 10**6


def test_lsh_recall_audit_oracle(spark, duck, sf_dir):
    out = lsh_recall_audit(
        load_table(spark, sf_dir, "documents"), n_queries=25
    )
    assert_matches_oracle(
        out,
        duck.execute(lsh_recall_audit_sql(n_queries=25)).df(),
        "lsh_recall_audit",
    )
    pdf = out.toPandas()
    assert len(pdf) == 25  # the budget holds exactly
    assert (pdf.n_detected <= pdf.n_true).all()


def test_lsh_recall_exact_dup_anchor(spark):
    """Exact duplicates (Jaccard 1.0) share EVERY band — the audit
    must report recall 1.0 for them; a planted j≈0.5 pair rides the
    S-curve (1-(1-j^2)^4 ≈ 0.68 detection probability with 4×2
    banding) and the audit exposes exactly whether the md5 family
    caught it — deterministically, and identically in the oracle."""
    base = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "one two three four five six seven eight nine ten",
        "red orange yellow green blue indigo violet pink",
    ]
    rows = []
    for i, t in enumerate(base):
        rows.append((i, t))
        rows.append((100 + i, t))  # exact copy
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = lsh_recall_audit(
        df, threshold_fx6=900_000, n_queries=10
    ).toPandas()
    # every query doc's only >=0.9 pair is its exact copy
    with_truth = out[out.n_true > 0]
    assert len(with_truth) == len(out) == 6
    assert (with_truth.n_true == 1).all()
    assert (with_truth.recall_fx6 == FX).all()


def test_lsh_recall_audit_custom_id_col(spark, duck, sf_dir):
    """Parity with a NON-default id column name — pins ADVICE r12
    (the oracle's cooc CTE once hardcoded ``b.doc_id``, breaking any
    ``id_col`` other than the default)."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select(F.col("doc_id").alias("rid"), "text")
    )
    duck.execute(
        "CREATE OR REPLACE VIEW docs_rid AS"
        " SELECT doc_id AS rid, text FROM documents"
    )
    assert_matches_oracle(
        lsh_recall_audit(docs, n_queries=10, id_col="rid"),
        duck.execute(
            lsh_recall_audit_sql(
                n_queries=10, table="docs_rid", id_col="rid"
            )
        ).df(),
        "lsh_recall_audit_rid",
    )


def test_lsh_recall_rails():
    with pytest.raises(ValueError, match="threshold_fx6"):
        lsh_recall_audit_sql(threshold_fx6=0)
    with pytest.raises(ValueError, match="n_queries"):
        lsh_recall_audit_sql(n_queries=0)
