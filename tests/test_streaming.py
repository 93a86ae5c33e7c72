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
