"""PMI collocation mining — oracle parity, a hand-checked crafted
corpus, min_count clipping, and determinism under re-partitioning."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from minisql_engine_spark.operators.collocations import (
    pmi_collocations,
    pmi_collocations_sql,
)
from minisql_engine_spark.sources.parquet_catalog import load_table
from tests.conftest import assert_matches_oracle


def test_pmi_oracle_corpus(spark, duck, sf_dir):
    out = pmi_collocations(load_table(spark, sf_dir, "documents"))
    assert_matches_oracle(
        out, duck.execute(pmi_collocations_sql()).df(), "pmi"
    )


def test_pmi_crafted_hand_checked(spark):
    """'new york' always adjacent, 'the' everywhere: the exclusive
    pair must out-PMI the promiscuous one, and the values match the
    closed form."""
    rows = [
        (1, "the new york the city"),
        (2, "new york the harbor"),
        (3, "the new york new york"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = pmi_collocations(df, k=10, min_count=2).toPandas()
    top = got.iloc[0]
    assert (top.tok_a, top.tok_b) == ("new", "york")
    # closed form: c_ab=4, c_new=4, c_york=4, T1=14, T2=11
    want = math.floor(
        (
            math.log2(4) + 2 * math.log2(14)
            - math.log2(4) - math.log2(4) - math.log2(11)
        )
        * 1e6
        + 0.5
    ) / 1e6
    assert top.pmi_fx6 == pytest.approx(want, abs=0)
    # ranks are dense from 1 and ordered by (pmi DESC, a, b)
    assert list(got["rank"]) == list(range(1, len(got) + 1))
    assert (
        got.sort_values(
            ["pmi_fx6", "tok_a", "tok_b"],
            ascending=[False, True, True],
        )["rank"].tolist()
        == got["rank"].tolist()
    )


def test_pmi_min_count_clips_hapax(spark):
    """A once-seen pair has the highest raw PMI but must be excluded
    by min_count — the rare-pair explosion every miner clips."""
    rows = [
        (1, "unique hapax common common"),
        (2, "common common common common"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = pmi_collocations(df, k=10, min_count=2).toPandas()
    assert not (
        (got.tok_a == "unique") & (got.tok_b == "hapax")
    ).any()
    got1 = pmi_collocations(df, k=10, min_count=1).toPandas()
    assert (
        (got1.tok_a == "unique") & (got1.tok_b == "hapax")
    ).any()


def test_pmi_partition_invariance(spark, sf_dir):
    """Same result from a 1-partition and a 16-partition input —
    the counts are hash aggregates and the edge is fx6-floored, so
    no shuffle order can move a value."""
    docs = load_table(spark, sf_dir, "documents")
    a = pmi_collocations(docs.coalesce(1)).toPandas()
    b = pmi_collocations(docs.repartition(16)).toPandas()
    pd.testing.assert_frame_equal(a, b)


def test_pmi_rejects_bad_params(spark):
    with pytest.raises(ValueError, match="min_count"):
        pmi_collocations_sql(min_count=0)
    with pytest.raises(ValueError, match="k >= 1"):
        pmi_collocations_sql(k=0)
