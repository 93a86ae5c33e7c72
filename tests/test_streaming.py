"""True Structured-Streaming execution tests: the windowed operators
must produce IDENTICAL results under readStream (availableNow
trigger, watermark, memory sink) as in batch — Spark's unified-engine
guarantee, exercised for real."""

from __future__ import annotations

import os
import sys
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from minisql_engine_spark.sources import load_table  # noqa: E402
from minisql_engine_spark.streaming import (  # noqa: E402
    read_events_stream,
    session_event_agg,
    tumbling_event_agg,
)


def _run_stream_to_table(spark, stream_df, name: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def _sorted_rows(df):
    return sorted([tuple(r) for r in df.collect()])


def test_tumbling_stream_equals_batch(spark, sf_dir):
    batch = tumbling_event_agg(load_table(spark, sf_dir, "events"))
    stream = tumbling_event_agg(read_events_stream(spark, sf_dir))
    name = f"tumbling_{uuid.uuid4().hex[:8]}"
    result = _run_stream_to_table(spark, stream, name)
    assert _sorted_rows(result) == _sorted_rows(batch)


def test_session_stream_equals_batch(spark, sf_dir):
    batch = session_event_agg(load_table(spark, sf_dir, "events"))
    stream = session_event_agg(read_events_stream(spark, sf_dir))
    name = f"session_{uuid.uuid4().hex[:8]}"
    result = _run_stream_to_table(spark, stream, name)
    assert _sorted_rows(result) == _sorted_rows(batch)


def test_stream_is_streaming(spark, sf_dir):
    s = read_events_stream(spark, sf_dir)
    assert s.isStreaming


def test_stateful_user_stats_matches_batch(spark, sf_dir):
    """applyInPandasWithState through a real stream: final per-user
    state must equal the batch groupBy (exact integer-milli sums)."""
    from pyspark.sql import functions as F

    from minisql_engine_spark.streaming import stateful_user_stats

    batch = {
        r["user_id"]: (r["n"], r["s"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            (
                F.sum(F.round(F.col("value") * 1000, 0).cast("bigint")) / 1000.0
            ).alias("s"),
        )
        .collect()
    }
    stream = stateful_user_stats(read_events_stream(spark, sf_dir))
    name = f"stateful_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # last emitted row per user is the final state
    got = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in spark.table(name).collect()
    }
    assert got == batch


def test_stream_dedup_equals_batch(spark, sf_dir):
    """Streaming dedup over a doubled (replayed) source must recover
    exactly the batch-distinct rows — both state regimes."""
    import pyspark.sql.functions as F

    from minisql_engine_spark.streaming import stream_dedup_events

    batch = load_table(spark, sf_dir, "events")
    expect = batch.count()

    # replay the whole source twice (at-least-once delivery): union
    # in streaming means two file-source passes over the same dir
    s1 = read_events_stream(spark, sf_dir, with_watermark=None)
    replayed = s1.unionByName(s1)
    deduped = stream_dedup_events(replayed, keys=("event_id",))
    name = f"dedup_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table(name).count()
    assert got == expect

    # watermarked regime: state must still suppress dups that arrive
    # inside the watermark window (the replay lands in the same batch)
    s2 = read_events_stream(spark, sf_dir, with_watermark="1 hour")
    deduped2 = stream_dedup_events(
        s2.unionByName(s2), keys=("event_id",), within="1 hour"
    )
    name2 = f"dedupw_{uuid.uuid4().hex[:8]}"
    q2 = (
        deduped2.writeStream.format("memory")
        .queryName(name2)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    # every surviving row is unique by event_id and none were lost
    got2 = spark.table(name2)
    assert got2.select("event_id").distinct().count() == got2.count() == expect


def test_attribution_join_stream_equals_batch_and_oracle(spark, duck, sf_dir):
    """Stream-stream interval join (symmetric stateful join with
    watermark-bounded state) must equal the batch join AND the DuckDB
    oracle. Append mode: a pair is emitted once both sides arrived."""
    from minisql_engine_spark.streaming import attribution_join_events

    batch = attribution_join_events(load_table(spark, sf_dir, "events"))
    oracle = duck.execute(
        "WITH c AS (SELECT user_id, event_id AS click_id, ts AS click_ts"
        "  FROM events WHERE event_type = 'click'),"
        " p AS (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts"
        "  FROM events WHERE event_type = 'purchase')"
        " SELECT purchase_id, p.user_id, purchase_ts, click_id, click_ts,"
        "  (epoch_us(purchase_ts) - epoch_us(click_ts)) // 1000000"
        "   AS lag_seconds"
        " FROM p JOIN c ON p.user_id = c.user_id"
        " AND click_ts <= purchase_ts"
        " AND click_ts >= purchase_ts - INTERVAL 2 HOUR"
    ).fetchdf()
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(batch, oracle, "attribution_join")
    assert batch.count() > 0

    stream = attribution_join_events(read_events_stream(spark, sf_dir))
    assert stream.isStreaming
    name = f"attr_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert _sorted_rows(spark.table(name)) == _sorted_rows(batch)


def test_curate_stream_equals_batch_content(spark, sf_dir):
    """Streaming curation must agree with the batch run on every
    content-level fact — (content_hash, split, n_ws_tokens) — even
    though which duplicate doc_id survives is arrival-order-dependent
    (streaming keeps first arrival, batch an arbitrary/min row)."""
    from minisql_engine_spark.streaming import (
        curate_stream,
        read_documents_stream,
    )

    batch = curate_stream(
        load_table(spark, sf_dir, "documents"), min_tokens=10, langs=None
    )
    assert not batch.isStreaming

    stream = curate_stream(
        read_documents_stream(spark, sf_dir), min_tokens=10, langs=None
    )
    assert stream.isStreaming
    name = f"curate_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table(name)

    key = lambda df: sorted(  # noqa: E731
        (r["content_hash"], r["split"], r["n_ws_tokens"])
        for r in df.collect()
    )
    b, s = key(batch), key(got)
    assert b == s
    assert len(b) > 0
    # dedup really happened: hashes unique
    hashes = [h for h, _, _ in b]
    assert len(hashes) == len(set(hashes))
