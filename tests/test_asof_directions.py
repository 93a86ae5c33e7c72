"""Forward / nearest as-of join directions."""

from __future__ import annotations

from datetime import datetime

from minisql_engine_spark.operators.asof import (
    asof_join_backward,
    asof_join_forward,
    asof_join_nearest,
)


def _ts(m):
    return datetime(2024, 1, 1, 0, m)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, _ts(10)), (1, _ts(30)), (2, _ts(5))], ["k", "lts"]
    )
    right = spark.createDataFrame(
        [(1, _ts(8), 80.0), (1, _ts(29), 290.0), (1, _ts(31), 310.0),
         (2, _ts(50), 500.0)],
        ["k", "rts", "v"],
    )
    return left, right


def test_forward_picks_earliest_at_or_after(spark):
    left, right = _frames(spark)
    out = {
        (r["k"], r["lts"].minute): r["asof_v"]
        for r in asof_join_forward(
            left, right, "k", "lts", "rts", ["v"]
        ).collect()
    }
    assert out[(1, 10)] == 290.0  # next right at :29
    assert out[(1, 30)] == 310.0
    assert out[(2, 5)] == 500.0


def test_forward_matches_equal_ts(spark):
    left, right = _frames(spark)
    eq = spark.createDataFrame([(1, _ts(29))], ["k", "lts"])
    out = asof_join_forward(eq, right, "k", "lts", "rts", ["v"]).collect()
    assert out[0]["asof_v"] == 290.0  # exact-ts right matches forward too


def test_nearest_picks_closer_side_and_tolerance(spark):
    left, right = _frames(spark)
    out = {
        (r["k"], r["lts"].minute): r["asof_v"]
        for r in asof_join_nearest(
            left, right, "k", "lts", "rts", ["v"]
        ).collect()
    }
    assert out[(1, 10)] == 80.0    # :8 (gap 2) beats :29 (gap 19)
    assert out[(1, 30)] == 290.0   # tie gap 1/1 → earlier right wins
    assert out[(2, 5)] == 500.0    # only a forward match exists

    bounded = {
        (r["k"], r["lts"].minute): r["asof_v"]
        for r in asof_join_nearest(
            left, right, "k", "lts", "rts", ["v"], tolerance_seconds=600
        ).collect()
    }
    assert bounded[(1, 10)] == 80.0
    assert bounded[(2, 5)] is None  # 45-minute gap exceeds tolerance
    assert len(bounded) == 3       # left rows always survive


def test_directions_agree_with_backward_on_past_only_data(spark):
    left, right = _frames(spark)
    past = right.filter("rts < timestamp '2024-01-01 00:09:00'")
    b = asof_join_backward(left, right, "k", "lts", "rts", ["v"])
    n = asof_join_nearest(left, past, "k", "lts", "rts", ["v"])
    got_b = {(r["k"], r["lts"]): r["asof_v"] for r in b.collect()}
    got_n = {(r["k"], r["lts"]): r["asof_v"] for r in n.collect()}
    # with only past rows, nearest == backward
    for key in got_n:
        if got_n[key] is not None:
            assert got_n[key] == 80.0
    assert got_b[(1, _ts(10))] == 80.0
