"""DSIR hashed-n-gram importance weights — oracle parity + behavior."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from minisql_engine_spark.operators.dsir import (
    dsir_weights,
    dsir_weights_sql,
)
from minisql_engine_spark.sources.parquet_catalog import load_table
from tests.conftest import assert_matches_oracle


def test_dsir_oracle_corpus(spark, duck, sf_dir):
    out = dsir_weights(
        load_table(spark, sf_dir, "documents"), F.col("lang") == "en"
    )
    assert_matches_oracle(
        out, duck.execute(dsir_weights_sql("lang = 'en'")).df(), "dsir"
    )


def test_dsir_separates_target_like_text(spark, duck):
    """Docs written in the target's vocabulary score positive; docs in
    a disjoint vocabulary score negative; empty/NULL drop."""
    rows = [
        (1, "alpha beta alpha beta gamma", "t"),
        (2, "alpha gamma beta alpha", "t"),
        (3, "alpha beta gamma alpha beta", "r"),  # target-like raw doc
        (4, "xray yankee zulu xray yankee", "r"),  # off-domain raw doc
        (5, "zulu zulu xray yankee", "r"),
        (6, "", "r"),
        (7, None, "r"),
    ]
    sdf = spark.createDataFrame(rows, "doc_id bigint, text string, pool string")
    duck.register(
        "_dsir", pd.DataFrame(rows, columns=["doc_id", "text", "pool"])
    )
    # digits=1 (16 buckets): the default 256-bucket space would let
    # Laplace smoothing swamp a ~40-feature toy corpus and push every
    # weight negative — bucket count must stay well under the total
    # feature count for the ratios to carry signal
    out = dsir_weights(sdf, F.col("pool") == "t", digits=1)
    assert_matches_oracle(
        out,
        duck.execute(
            dsir_weights_sql("pool = 't'", table="_dsir", digits=1)
        ).df(),
        "dsir-edges",
    )
    got = {r.doc_id: r for r in out.collect()}
    assert set(got) == {1, 2, 3, 4, 5}  # empty + NULL dropped
    assert got[3].avg_logw > 0 and got[3].selected
    assert got[4].avg_logw < 0 and not got[4].selected
    assert got[5].avg_logw < 0
    # sanity: target docs themselves skew positive
    assert got[1].avg_logw > 0 and got[2].avg_logw > 0


def test_dsir_rejects_unbroadcastable_bucket_space(spark):
    import pytest

    sdf = spark.createDataFrame(
        [(1, "a", "t")], "doc_id bigint, text string, pool string"
    )
    with pytest.raises(ValueError):
        dsir_weights(sdf, F.col("pool") == "t", digits=5)
    with pytest.raises(ValueError):
        dsir_weights(sdf, F.col("pool") == "t", digits=0)


def test_dsir_weight_is_length_normalized_consistently(spark):
    """avg_logw of a doc repeated 3× ≈ avg_logw of the original —
    the per-feature mean removes the length bias of the raw sum."""
    rows = [
        (1, "alpha beta gamma", "t"),
        (2, "delta epsilon", "r"),
        (3, "delta epsilon delta epsilon delta epsilon", "r"),
    ]
    sdf = spark.createDataFrame(rows, "doc_id bigint, text string, pool string")
    got = {
        r.doc_id: r
        for r in dsir_weights(sdf, F.col("pool") == "t", digits=1).collect()
    }
    assert got[3].logw < got[2].logw  # raw sum IS length-biased
    # bigram mix differs slightly between the two, so compare loosely
    assert abs(got[3].avg_logw - got[2].avg_logw) < 0.5
