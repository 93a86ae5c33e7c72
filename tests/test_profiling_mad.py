"""Table profiler + MAD outliers: oracle parity and edge semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from minisql_engine_spark.operators.profiling import (
    profile_table,
    profile_table_sql,
)
from minisql_engine_spark.operators.stats import mad_outliers, mad_outliers_sql
from minisql_engine_spark.sources import load_table

from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("table", ["orders", "events", "documents"])
def test_profile_table_oracle(spark, duck, sf_dir, table):
    df = load_table(spark, sf_dir, table)
    out = profile_table(df)
    oracle = duck.sql(profile_table_sql(table, df)).df()
    assert_matches_oracle(out, oracle, f"profile {table}")


def test_profile_counts_nulls_and_distinct(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (None, "a")],
        "x bigint, s string",
    )
    rows = {r["column"]: r for r in profile_table(df).collect()}
    assert rows["x"]["n_rows"] == 3
    assert rows["x"]["n_nulls"] == 1
    assert rows["x"]["n_distinct"] == 2
    assert rows["x"]["min_num"] == 1.0 and rows["x"]["max_num"] == 2.0
    assert rows["s"]["n_distinct"] == 1
    assert rows["s"]["min_str"] == "a" and rows["s"]["min_num"] is None


@pytest.mark.parametrize("group_by", [None, "event_type"])
def test_mad_outliers_oracle(spark, duck, sf_dir, group_by):
    ev = load_table(spark, sf_dir, "events")
    out = mad_outliers(ev, "value", group_by=group_by)
    oracle = duck.sql(mad_outliers_sql("events", "value", group_by=group_by)).df()
    assert_matches_oracle(out, oracle, f"mad group_by={group_by}")


def test_mad_flags_the_planted_outlier(spark):
    vals = [(i, 10.0 + (i % 5) * 0.1) for i in range(50)] + [(99, 1e6)]
    df = spark.createDataFrame(vals, "id bigint, v double")
    out = {r["id"]: r for r in mad_outliers(df, "v").collect()}
    assert out[99]["is_outlier"] is True
    assert sum(1 for r in out.values() if r["is_outlier"]) == 1


def test_mad_degenerate_zero_mad(spark):
    # >50% identical values → MAD 0 → any deviation flags
    df = spark.createDataFrame(
        [(i, 5.0) for i in range(10)] + [(10, 5.1), (11, None)],
        "id bigint, v double",
    )
    rows = {r["id"]: r for r in mad_outliers(df, "v").collect()}
    assert rows[10]["is_outlier"] is True
    assert rows[0]["is_outlier"] is False
    assert rows[11]["is_outlier"] is None
