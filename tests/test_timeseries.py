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


class TestRollingFeatures:
    def test_oracle_corpus(self, spark, duck, sf_dir):
        from minisql_engine_spark.operators.timeseries import (
            rolling_event_features,
            rolling_event_features_sql,
        )
        from minisql_engine_spark.sources.parquet_catalog import load_table
        from tests.conftest import assert_matches_oracle

        out = rolling_event_features(load_table(spark, sf_dir, "events"))
        assert_matches_oracle(
            out,
            duck.execute(rolling_event_features_sql()).df(),
            "rolling",
        )

    def test_ties_and_nulls(self, spark, duck):
        """Rows tied on (user, ts) share one frame; NULL values drop
        from count/sum; an all-NULL frame yields NULL sum and avg."""
        import datetime as dt

        import pandas as pd

        from minisql_engine_spark.operators.timeseries import (
            rolling_event_features,
            rolling_event_features_sql,
        )
        from tests.conftest import assert_matches_oracle

        b = dt.datetime(2024, 5, 1)
        rows = [
            (1, b, 1, 10.0),
            (2, b, 1, 20.0),                       # tie with event 1
            (3, b + dt.timedelta(seconds=200), 1, None),
            (4, b + dt.timedelta(seconds=400), 1, 5.0),
            (5, b, 2, None),                       # all-NULL user
        ]
        sdf = spark.createDataFrame(
            rows, "event_id bigint, ts timestamp, user_id bigint, value double"
        )
        duck.register(
            "_rl",
            pd.DataFrame(
                rows, columns=["event_id", "ts", "user_id", "value"]
            ),
        )
        out = rolling_event_features(sdf, window_s=(300,))
        assert_matches_oracle(
            out,
            duck.execute(
                rolling_event_features_sql(window_s=(300,), table="_rl")
            ).df(),
            "rolling-edge",
        )
        got = {r.event_id: r for r in out.collect()}
        # tied rows both see the full tie group
        assert got[1].n_5m == 2 and got[2].n_5m == 2
        assert got[1].sum_5m == 30.0
        # NULL value drops from the frame's count
        assert got[3].n_5m == 2
        # 400 s later: events at t=0 left the 300 s frame; the NULL at
        # t=200 contributes nothing
        assert got[4].n_5m == 1 and got[4].sum_5m == 5.0
        assert got[5].n_5m == 0 and got[5].sum_5m is None
        assert got[5].avg_5m is None
