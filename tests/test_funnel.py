"""Windowed ordered event funnel — oracle parity + semantics."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from minisql_engine_spark.operators.funnel import (
    cohort_retention,
    cohort_retention_sql,
    event_funnel,
    event_funnel_sql,
)
from minisql_engine_spark.sources.parquet_catalog import load_table
from tests.conftest import assert_matches_oracle

STEPS = ["signup", "view", "click", "purchase"]


def test_funnel_oracle_corpus(spark, duck, sf_dir):
    out = event_funnel(
        load_table(spark, sf_dir, "events"), STEPS, within_s=604_800
    )
    assert_matches_oracle(
        out,
        duck.execute(event_funnel_sql(STEPS, within_s=604_800)).df(),
        "funnel",
    )


def _ev(base, offsets_types):
    return [
        (i, base + dt.timedelta(seconds=off), u, t)
        for i, (off, u, t) in enumerate(offsets_types)
    ]


def test_funnel_semantics_edges(spark, duck):
    """Strict ordering, first-step anchoring, and the window cutoff."""
    base = dt.datetime(2024, 1, 1)
    rows = _ev(
        base,
        [
            # user 1: clean A→B→C inside the window
            (0, 1, "a"), (10, 1, "b"), (20, 1, "c"),
            # user 2: B before A — chain stops at step 1
            (5, 2, "b"), (10, 2, "a"),
            # user 3: B lands exactly AT the anchor instant — strict
            # '>' rejects it, the later B qualifies
            (0, 3, "a"), (0, 3, "b"), (30, 3, "b"),
            # user 4: B past the window (anchor+100) — stops at 1
            (0, 4, "a"), (200, 4, "b"),
            # user 5: anchored at FIRST a; b fits only the second a's
            # window — counted as not converting (documented anchor)
            (0, 5, "a"), (150, 5, "a"), (170, 5, "b"),
            # user 6: never does step 1 — absent entirely
            (0, 6, "b"), (10, 6, "c"),
        ],
    )
    sdf = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    duck.register(
        "_fn",
        pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type"]
        ),
    )
    out = event_funnel(sdf, ["a", "b", "c"], within_s=100)
    assert_matches_oracle(
        out,
        duck.execute(
            event_funnel_sql(["a", "b", "c"], within_s=100, table="_fn")
        ).df(),
        "funnel-edges",
    )
    got = {r.user_id: r.furthest_step for r in out.collect()}
    assert got == {1: 3, 2: 1, 3: 2, 4: 1, 5: 1}
    r3 = {r.user_id: r for r in out.collect()}[3]
    assert r3.step_2_ts == base + dt.timedelta(seconds=30)


def test_cohort_retention_oracle_corpus(spark, duck, sf_dir):
    out = cohort_retention(load_table(spark, sf_dir, "events"))
    assert_matches_oracle(
        out, duck.execute(cohort_retention_sql()).df(), "cohort"
    )


def test_cohort_retention_semantics(spark, duck):
    """Offset-0 cell equals cohort size; later cells count only
    returning members; one activity row per (user, day)."""
    base = dt.datetime(2024, 3, 1, 12, 0)
    rows = _ev(
        base,
        [
            # users 1,2 start day 0; user 1 returns day 1 twice,
            # user 2 never returns; user 3 starts day 1
            (0, 1, "x"), (86_400, 1, "x"), (86_400 + 60, 1, "x"),
            (0, 2, "x"),
            (86_400, 3, "x"), (2 * 86_400, 3, "x"),
        ],
    )
    sdf = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    duck.register(
        "_ch",
        pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type"]
        ),
    )
    out = cohort_retention(sdf)
    assert_matches_oracle(
        out, duck.execute(cohort_retention_sql(table="_ch")).df(), "cohort-edge"
    )
    got = {
        (str(r.cohort_day), r.day_offset): r.n_users for r in out.collect()
    }
    assert got == {
        ("2024-03-01", 0): 2,
        ("2024-03-01", 1): 1,
        ("2024-03-02", 0): 1,
        ("2024-03-02", 1): 1,
    }


def test_funnel_rejects_empty_steps(spark, sf_dir):
    with pytest.raises(ValueError):
        event_funnel(load_table(spark, sf_dir, "events"), [], 10)
    with pytest.raises(ValueError):
        event_funnel_sql([], 10)
