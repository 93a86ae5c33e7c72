"""Incremental materialized aggregate view (IVM) — batch merge ==
full recompute, exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from minisql_engine_spark.sources import load_table
from minisql_engine_spark.sources.aggview import (
    agg_view_sql,
    init_agg_view,
    read_agg_view,
    update_agg_view,
)
from tests.conftest import assert_matches_oracle

MEASURES = {
    "n_events": ("count", None),
    "v_sum": ("dsum", "value"),
    "v_min": ("min", "value"),
    "v_max": ("max", "value"),
    "uid_sum": ("sum", "user_id"),
}


def test_aggview_equals_full_recompute(spark, duck, sf_dir, tmp_path):
    """Three event_id%3 batches merged incrementally must equal the
    one-shot full aggregate bit-for-bit (decimal-routed sums make the
    merge associative — a double sum would drift with batching)."""
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "view")
    init_agg_view(
        ev.filter(F.col("event_id") % 3 == 0), path, "event_type", MEASURES
    )
    for i in (1, 2):
        update_agg_view(
            spark,
            path,
            ev.filter(F.col("event_id") % 3 == i),
            "event_type",
            MEASURES,
        )
    out = read_agg_view(spark, path, MEASURES).orderBy("event_type")
    oracle = agg_view_sql("events", "event_type", MEASURES)
    assert_matches_oracle(out, duck.execute(oracle).fetchdf(), "aggview")


def test_aggview_null_and_new_group_semantics(spark, tmp_path):
    m = {
        "n": ("count", None),
        "s": ("dsum", "v"),
        "lo": ("min", "v"),
    }
    b1 = spark.createDataFrame(
        [("a", 1.5), ("a", None), ("b", None)], ["g", "v"]
    )
    b2 = spark.createDataFrame(
        [("a", 2.0), ("c", 7.0), ("b", None)], ["g", "v"]
    )
    path = str(tmp_path / "v2")
    init_agg_view(b1, path, "g", m)
    update_agg_view(spark, path, b2, "g", m)
    got = {
        r["g"]: (r["n"], r["s"], r["lo"])
        for r in read_agg_view(spark, path, m).collect()
    }
    assert got["a"] == (3, 3.5, 1.5)
    # all-NULL group keeps NULL sum/min (ANSI), count still counts rows
    assert got["b"] == (2, None, None)
    # group first seen in batch 2
    assert got["c"] == (1, 7.0, 7.0)


def test_aggview_batch_order_invariance(spark, sf_dir, tmp_path):
    """Merging batches in a different order lands on the identical
    state — the associativity/commutativity claim, observed."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_id") < 3000
    )
    parts = [ev.filter(F.col("event_id") % 3 == i) for i in range(3)]
    outs = []
    for order in ((0, 1, 2), (2, 0, 1)):
        path = str(tmp_path / f"v_{order[0]}")
        init_agg_view(parts[order[0]], path, "event_type", MEASURES)
        for i in order[1:]:
            update_agg_view(spark, path, parts[i], "event_type", MEASURES)
        outs.append(
            sorted(
                read_agg_view(spark, path, MEASURES).collect(),
                key=lambda r: r["event_type"],
            )
        )
    assert outs[0] == outs[1]


def test_update_agg_view_batch_id_replay_is_noop(spark, tmp_path):
    m = {"n": ("count", None), "s": ("sum", "v")}
    b = spark.createDataFrame([("a", 10), ("b", 1)], ["g", "v"])
    path = str(tmp_path / "txn")
    init_agg_view(b.limit(0), path, "g", m)
    assert update_agg_view(spark, path, b, "g", m, batch_id=0) is True
    # at-least-once delivery replays the same epoch — must not double
    assert update_agg_view(spark, path, b, "g", m, batch_id=0) is False
    assert update_agg_view(spark, path, b, "g", m, batch_id=1) is True
    got = {r["g"]: (r["n"], r["s"]) for r in read_agg_view(spark, path, m).collect()}
    assert got == {"a": (2, 20), "b": (2, 2)}


def test_stream_agg_view_exactly_once(spark, duck, sf_dir, tmp_path):
    """Micro-batched maintenance equals the one-shot recompute, and a
    full replay of the drop folder (fresh checkpoint, at-least-once
    semantics) leaves the view untouched — the epoch-id transaction."""
    from minisql_engine_spark.streaming.ingest import stream_agg_view

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_id") < 6000
    )
    drop = str(tmp_path / "drop")
    for i in range(3):
        ev.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(drop)

    path = str(tmp_path / "sview")
    init_agg_view(ev.limit(0), path, "event_type", MEASURES)

    schema = spark.read.parquet(drop).schema

    def run(ckpt):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(drop)
        )
        q = stream_agg_view(
            stream, path, str(tmp_path / ckpt), "event_type", MEASURES
        )
        q.awaitTermination(120)

    run("ckpt1")
    expected = sorted(
        _delta_equiv(spark, ev).collect(), key=lambda r: r["event_type"]
    )
    got = sorted(
        read_agg_view(spark, path, MEASURES).collect(),
        key=lambda r: r["event_type"],
    )
    assert got == expected
    # replay everything under a fresh checkpoint: batch ids restart at
    # 0, every epoch is <= the applied marker, the view must not move
    run("ckpt2")
    got2 = sorted(
        read_agg_view(spark, path, MEASURES).collect(),
        key=lambda r: r["event_type"],
    )
    assert got2 == expected


def _delta_equiv(spark, ev):
    """One-shot recompute with the read-edge types of read_agg_view."""
    from minisql_engine_spark.sources.aggview import _delta_agg

    full = _delta_agg(ev, "event_type", MEASURES)
    return full.select(
        "event_type",
        F.col("n_events"),
        F.col("v_sum").cast("double").alias("v_sum"),
        "v_min",
        "v_max",
        F.col("uid_sum").cast("bigint").alias("uid_sum"),
    )


def test_aggview_null_group_key_merges_to_one_row(spark, tmp_path):
    """GROUP BY collapses all NULL keys into ONE group; the
    state/delta merge must match NULL to NULL (null-safe join), not
    fork a second NULL-group row per batch (the r5 advisor finding:
    a plain full_outer on the key never matches NULLs)."""
    m = {"n": ("count", None), "s": ("dsum", "v")}
    b1 = spark.createDataFrame(
        [(None, 1.0), ("a", 2.0)], "g string, v double"
    )
    b2 = spark.createDataFrame(
        [(None, 3.0), (None, 4.0)], "g string, v double"
    )
    path = str(tmp_path / "nullg")
    init_agg_view(b1, path, "g", m)
    update_agg_view(spark, path, b2, "g", m)
    update_agg_view(spark, path, b2, "g", m)
    rows = {r["g"]: r for r in read_agg_view(spark, path, m).collect()}
    assert set(rows) == {None, "a"}          # exactly one NULL group
    assert rows[None]["n"] == 5
    assert abs(rows[None]["s"] - 15.0) < 1e-9
