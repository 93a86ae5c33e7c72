"""SymSpell edit-distance similarity join — oracle parity (the oracle
is an independent all-pairs scan, so a pass empirically confirms the
deletion-neighborhood recall guarantee) + guard behavior."""

from __future__ import annotations

import warnings

import pandas as pd
import pytest

from minisql_engine_spark.operators.editsim import (
    edit_distance_pairs,
    edit_distance_pairs_sql,
)
from minisql_engine_spark.sources.parquet_catalog import load_table
from tests.conftest import assert_matches_oracle


def test_editsim_d1_customer_names(spark, duck, sf_dir):
    out = edit_distance_pairs(
        load_table(spark, sf_dir, "customer"), "c_name", 1,
        id_col="c_custkey",
    )
    assert_matches_oracle(
        out,
        duck.execute(
            edit_distance_pairs_sql("customer", "c_name", 1, "c_custkey")
        ).df(),
        "editsim-d1",
    )


WORDS = [
    (1, "kitten"), (2, "sitten"), (3, "sittin"), (4, "sitting"),
    (5, "kitten"),      # exact duplicate → distance-0 pair with 1
    (6, "mitten"), (7, "bobcat"), (8, ""), (9, None), (10, "a"),
    (11, "ab"), (12, "b"),
]


@pytest.mark.parametrize("d", [1, 2])
def test_editsim_small_words(spark, duck, d):
    sdf = spark.createDataFrame(WORDS, "id bigint, s string")
    duck.register("_ed", pd.DataFrame(WORDS, columns=["id", "s"]))
    out = edit_distance_pairs(sdf, "s", d, id_col="id")
    assert_matches_oracle(
        out,
        duck.execute(edit_distance_pairs_sql("_ed", "s", d, "id")).df(),
        f"editsim-d{d}",
    )
    got = {(r.id_a, r.id_b): r.dist for r in out.collect()}
    assert got[(1, 5)] == 0            # exact dup
    assert got[(1, 2)] == 1            # substitution
    assert got[(10, 11)] == 1          # insertion from "a"
    assert got[(8, 10)] == 1           # empty → 1-char
    if d == 2:
        assert got[(1, 3)] == 2        # kitten → sittin
        assert got[(2, 4)] == 2        # sitten → sitting
        assert (10, 12) in got         # "a" → "b" via distance 2? no —
        # substitution is distance 1; both reachable through ""
        assert got[(10, 12)] == 1


def test_editsim_max_group_guard_warns_and_drops(spark):
    rows = [(i, "same") for i in range(20)] + [(100, "samX")]
    sdf = spark.createDataFrame(rows, "id bigint, s string")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = edit_distance_pairs(
            sdf, "s", 1, id_col="id", max_group=5
        ).collect()
        assert any("excluded" in str(x.message) for x in w)
    # the mass-duplicate "same" group is dropped entirely
    assert out == []


def test_editsim_rejects_bad_distance(spark):
    sdf = spark.createDataFrame([(1, "x")], "id bigint, s string")
    with pytest.raises(ValueError):
        edit_distance_pairs(sdf, "s", 3, id_col="id")
    with pytest.raises(ValueError):
        edit_distance_pairs_sql("t", "s", 0, "id")
