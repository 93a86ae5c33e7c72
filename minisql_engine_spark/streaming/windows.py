"""Structured-Streaming operators over the ``events`` table.

The reference engine is batch-only (SURVEY §1.5 / §2.2 streaming
row); these are the engine's streaming surface, written so the SAME
transformation runs in batch mode (for the DuckDB oracle) and in
streaming mode (``readStream`` + watermark + windowed state):

* tumbling / sliding windows — ``F.window``
* session windows            — ``F.session_window``
* watermarking for late data — ``withWatermark``

Batch/stream parity is the core design: each ``*_agg`` function takes
any DataFrame (static or streaming) — the driver oracle checks the
batch plan, and ``tests/test_streaming.py`` checks that the streaming
execution (availableNow trigger over the same parquet) produces the
identical result, which is exactly Spark's unified-engine guarantee.

Scale: windowed aggregation state is partitioned by (window, keys);
watermarks bound state size; ``spark.sql.shuffle.partitions`` governs
state-store parallelism on a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(
    spark: SparkSession, sf_dir: str, with_watermark: str | None = "10 minutes"
) -> DataFrame:
    """``readStream`` over the events parquet (file source).

    Uses the same nanos→timestamp repair as the batch loader
    (``sources.parquet_catalog.load_table``); schema comes from the
    batch read (file streams require an explicit schema).
    """
    import hashlib
    import os
    import tempfile

    from minisql_engine_spark.sources.parquet_catalog import load_table

    load_table(spark, sf_dir, "events")  # sets the nanos-read conf
    src = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(src).schema
    # The file stream source requires a directory; stage a symlink dir
    # (testdata is read-only). Deterministic per source path.
    tag = hashlib.md5(src.encode()).hexdigest()[:12]
    stage = os.path.join(tempfile.gettempdir(), f"minisql_stream_{tag}")
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    stream = spark.readStream.schema(raw_schema).parquet(stage)
    # same ns→µs repair as the batch path
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    elif ts_type == "timestamp_ntz":
        # Watermarks require TIMESTAMP (with local tz); the session tz
        # is pinned to UTC so the NTZ wall clock IS the instant — the
        # cast is value-preserving.
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    if with_watermark:
        stream = stream.withWatermark("ts", with_watermark)
    return stream


def tumbling_event_agg(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling-window per-type counts + exact value sums.

    Works identically on batch and streaming inputs; the decimal sum
    keeps results deterministic and oracle-comparable.
    """
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_event_agg(
    events: DataFrame, width: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding-window event counts + exact value sums (overlapping
    windows; same decimal-sum determinism as the tumbling form)."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_event_agg(
    events: DataFrame, gap: str = "5 minutes"
) -> DataFrame:
    """Per-user session windows (gap-based) — session count + span.

    ``F.session_window`` merges events within ``gap`` of each other;
    state is keyed by (user, session), watermark-bounded on streams.
    """
    return (
        events.groupBy(
            F.session_window("ts", gap).alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def stateful_user_stats(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``
    (the task's custom-operator escape hatch for semantics windowed
    aggs can't express): per-user running totals that persist across
    micro-batches in the state store.

    State = (n_events, sum_value_milli) per user, accumulated in
    integer milli-units so totals are exact and batch-comparable.
    Emits one updated row per user per micro-batch. Works only on
    streaming DataFrames; state is partitioned by user across the
    cluster and bounded by the user-id domain.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("sum_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("milli", LongType())]
    )

    def update(key, pdfs, state: GroupState):
        n, milli = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            milli += int((pdf["value"] * 1000).round().sum())
        state.update((n, milli))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [milli / 1000.0],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_dedup_events(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    within: str | None = None,
) -> DataFrame:
    """Streaming exact dedup — the ingest-side counterpart of
    ``operators.dedup.exact_dedup`` for at-least-once sources
    (replayed Kafka offsets, retried file drops).

    Two state regimes, chosen by ``within``:

    * ``within=None`` → ``dropDuplicates(keys)``: state grows with
      the number of distinct keys ever seen — correct for bounded
      key domains or availableNow backfills, unbounded on a forever
      stream.
    * ``within='10 minutes'`` etc. →
      ``dropDuplicatesWithinWatermark(keys)``: duplicates are only
      suppressed while they can still legally arrive (inside the
      event-time watermark), so state is EVICTED as the watermark
      advances — the only shape that survives an unbounded 100 TB/day
      stream. Requires an upstream ``withWatermark`` on the input.

    Batch/stream parity: on a static DataFrame ``dropDuplicates`` is
    the same operator, so the DuckDB oracle can check the batch
    result while the streaming test replays the identical parquet.
    """
    if within is not None:
        return events.dropDuplicatesWithinWatermark(list(keys))
    return events.dropDuplicates(list(keys))
