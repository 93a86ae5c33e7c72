"""Winsorization (quantile clipping) — oracle parity + edges."""

from __future__ import annotations

import pandas as pd
import pytest

from minisql_engine_spark.operators.stats import winsorize, winsorize_sql
from minisql_engine_spark.sources.parquet_catalog import load_table
from tests.conftest import assert_matches_oracle


def test_winsorize_oracle_global_and_grouped(spark, duck, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    assert_matches_oracle(
        winsorize(ev, "value"),
        duck.execute(winsorize_sql("events", "value")).df(),
        "winsor-global",
    )
    assert_matches_oracle(
        winsorize(ev, "value", group_by="event_type"),
        duck.execute(
            winsorize_sql("events", "value", group_by="event_type")
        ).df(),
        "winsor-group",
    )


def test_winsorize_known_values_and_nulls(spark, duck):
    rows = [(i, float(i)) for i in range(1, 11)] + [(11, None)]
    sdf = spark.createDataFrame(rows, "id bigint, v double")
    duck.register("_wz", pd.DataFrame(rows, columns=["id", "v"]))
    out = winsorize(sdf, "v", p_lo=0.1, p_hi=0.9)
    assert_matches_oracle(
        out,
        duck.execute(winsorize_sql("_wz", "v", 0.1, 0.9)).df(),
        "winsor-edge",
    )
    got = {r.id: r.v_w for r in out.collect()}
    # quantiles over 10 non-NULL values: p10 = 1.9, p90 = 9.1
    assert got[1] == 1.9     # clipped up
    assert got[10] == 9.1    # clipped down
    assert got[5] == 5.0     # untouched interior
    assert got[11] is None   # NULL passes through (not clipped to p10)


def test_winsorize_rejects_bad_probs(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    with pytest.raises(ValueError):
        winsorize(ev, "value", p_lo=0.9, p_hi=0.1)
    with pytest.raises(ValueError):
        winsorize_sql("events", "value", p_lo=-0.1, p_hi=0.5)
