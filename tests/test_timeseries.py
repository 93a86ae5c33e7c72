"""Resample + forward-fill: oracle parity and fill semantics."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from minisql_engine_spark.operators.timeseries import (
    resample_forward_fill,
    resample_forward_fill_sql,
)
from minisql_engine_spark.sources import load_table
from tests.conftest import assert_matches_oracle


def test_resample_matches_oracle(spark, duck, sf_dir):
    out = resample_forward_fill(
        load_table(spark, sf_dir, "events"), step_seconds=6 * 3600
    )
    oracle = resample_forward_fill_sql(step_seconds=6 * 3600)
    assert_matches_oracle(out, duck.execute(oracle).fetchdf(), "resample")


def test_grid_is_dense_per_key(spark, sf_dir):
    step = 24 * 3600
    out = resample_forward_fill(
        load_table(spark, sf_dir, "events"), step_seconds=step
    )
    rows = out.groupBy("user_id").agg(
        F.count("*").alias("n"),
        (
            (
                F.unix_timestamp(F.max("slot_ts"))
                - F.unix_timestamp(F.min("slot_ts"))
            )
            / step
            + 1
        ).alias("expected"),
    )
    bad = rows.filter(F.col("n") != F.col("expected")).count()
    assert bad == 0  # no missing grid slots for any key


def test_forward_fill_semantics(spark):
    ts = lambda s: datetime(2024, 1, 1, s)  # noqa: E731
    rows = [
        (1, ts(0), 10.0),
        (1, ts(0), 11.0),   # same slot, later tuple wins (value tiebreak)
        (1, ts(3), 30.0),   # 2 gap slots between
        (2, ts(5), 50.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = {
        (r["user_id"], r["slot_ts"].hour): (r["value"], r["is_observed"])
        for r in resample_forward_fill(df, step_seconds=3600).collect()
    }
    assert out[(1, 0)] == (11.0, True)
    assert out[(1, 1)] == (11.0, False)  # carried forward
    assert out[(1, 2)] == (11.0, False)
    assert out[(1, 3)] == (30.0, True)
    assert out[(2, 5)] == (50.0, True)
    assert len(out) == 5  # key 2 has a single-slot span
