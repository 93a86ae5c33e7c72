"""Streaming admission against the persistent dedup index.

The production shape of continuous corpus ingestion: a document
stream lands in micro-batches, each batch is admitted against the
on-disk content-key index (:mod:`operators.dedup_index`) and the
admitted rows are appended BOTH to the output corpus and to the
index — so a re-crawled document is dropped whether its duplicate
arrived in this batch, the previous one, or last month's backfill.

Why ``foreachBatch`` and not ``dropDuplicates``: the built-in
streaming dedup keeps its key set in the state store, which is bounded
by the watermark (or unbounded in memory) and private to one query.
The index is durable, shared across queries/restarts/backfills, and
append-only parquet — the state IS the catalog artifact. Inside each
batch the call graph is the exact batch operators (in-batch min-id
dedup → anti-join → append), so batch and stream admission semantics
are identical BY CONSTRUCTION except ordering: the stream admits in
arrival order (first-batch-wins), the one-shot batch admits min-id —
the same documented difference as `curate_stream`, and why everything
downstream keys on content hash.

Exactly-once caveat (documented, test-pinned): foreachBatch is
at-least-once — a replayed micro-batch re-presents rows whose keys
are already indexed, and the anti-join drops them, so the OUTPUT
stays exactly-once per content even though the sink function may run
twice (idempotent admission is precisely what the index provides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from minisql_engine_spark.operators.dedup_index import (
    append_to_index,
    dedup_against_index,
)


def stream_admit(
    stream_docs: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    bloom_path: str | None = None,
):
    """Start (availableNow) the admission query: micro-batches are
    deduped against ``index_path``, survivors append to the
    ``out_path`` corpus parquet and their keys to the index. Returns
    the StreamingQuery (caller awaits termination).

    The index must already exist (``init_dedup_index`` — possibly on
    an empty frame) so a first-batch race can't observe a missing
    path. With ``bloom_path`` (an ``init_bloom_sidecar`` dir) each
    micro-batch routes through the Bloom fast path — only
    maybe-present keys pay the index join, and the sidecar advances
    in the same admission step (its keys come from the PERSISTED
    survivors, so the lineage-re-execution ordering hazard the batch
    API documents cannot occur here)."""

    def admit(batch_df: DataFrame, batch_id: int) -> None:
        if bloom_path is None:
            survivors = dedup_against_index(
                batch_df, index_path, id_col=id_col, text_col=text_col
            ).persist()
        else:
            from minisql_engine_spark.operators.dedup_index import (
                dedup_with_bloom_sidecar,
            )

            survivors = dedup_with_bloom_sidecar(
                batch_df,
                index_path,
                bloom_path,
                id_col=id_col,
                text_col=text_col,
            ).persist()
        try:
            survivors.write.mode("append").parquet(out_path)
            if bloom_path is None:
                append_to_index(survivors, index_path)
            else:
                from minisql_engine_spark.operators.dedup_index import (
                    append_to_index_with_bloom,
                )

                append_to_index_with_bloom(
                    survivors, index_path, bloom_path
                )
        finally:
            survivors.unpersist()

    return (
        stream_docs.writeStream.foreachBatch(admit)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def stream_admit_neardup(
    stream_docs: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint_path: str,
    threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Near-duplicate streaming admission — the MinHash twin of
    :func:`stream_admit`: each micro-batch is checked against the
    persisted signature index (:mod:`operators.neardup_index`),
    survivors append to the corpus and their signatures to the index.
    Same durability/idempotence story: a replayed batch re-collides
    with its own indexed signatures at estimated Jaccard 1 and admits
    nothing. The index must already exist (``init_neardup_index``)."""
    from minisql_engine_spark.operators.neardup_index import (
        append_to_neardup_index,
        neardup_against_index,
    )

    def admit(batch_df: DataFrame, batch_id: int) -> None:
        survivors = neardup_against_index(
            batch_df,
            index_path,
            threshold=threshold,
            id_col=id_col,
            text_col=text_col,
        )
        # neardup_against_index already localCheckpoints (its sig
        # cache lifecycle); write then index from the settled result
        survivors.write.mode("append").parquet(out_path)
        append_to_neardup_index(survivors, index_path, id_col=id_col)

    return (
        stream_docs.writeStream.foreachBatch(admit)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def stream_agg_view(
    stream_df: DataFrame,
    view_path: str,
    checkpoint_path: str,
    group_col: str,
    measures: dict,
):
    """Streaming incremental view maintenance — each micro-batch
    merges its delta aggregate into the persisted view
    (:mod:`sources.aggview`). Aggregation is NOT idempotent under
    at-least-once replay (unlike the admission anti-joins above), so
    the epoch id rides into :func:`~minisql_engine_spark.sources.
    aggview.update_agg_view` as the transaction id: a replayed
    micro-batch is a no-op and the view stays exactly-once, which the
    replay test pins by re-running the whole drop folder and
    asserting the view still equals the one-shot recompute.

    The view must already exist (``init_agg_view`` — possibly on an
    empty frame) so a first-batch race can't observe a missing path."""
    from minisql_engine_spark.sources.aggview import update_agg_view

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        update_agg_view(
            batch_df.sparkSession,
            view_path,
            batch_df,
            group_col,
            measures,
            batch_id=batch_id,
        )

    return (
        stream_df.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def stream_admit_snapshot(
    stream_docs: DataFrame,
    index_path: str,
    table_path: str,
    checkpoint_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    constraints: list | None = None,
):
    """Versioned streaming admission — :func:`stream_admit` landing in
    a SNAPSHOT TABLE instead of a bare parquet dir: each micro-batch's
    survivors commit as one append version (Delta's
    transaction-per-batch shape), optionally gated by CHECK
    ``constraints``, so readers get snapshot isolation and time travel
    over a live ingest and `compact_snapshot`/`vacuum_snapshots` are
    the maintenance story. Empty batches (everything deduped away)
    commit no version. The table commits BEFORE the index (same order
    as stream_admit's corpus write): a crash between the two re-admits
    the batch's content on replay rather than silently losing it. A
    ConstraintViolation aborts the batch and fails the query loudly —
    a poison batch must not be half-ingested."""
    from minisql_engine_spark.sources.snapshots import append_snapshot

    def admit(batch_df: DataFrame, batch_id: int) -> None:
        survivors = dedup_against_index(
            batch_df, index_path, id_col=id_col, text_col=text_col
        ).persist()
        try:
            if survivors.limit(1).count() > 0:
                append_snapshot(
                    survivors, table_path, constraints=constraints
                )
                append_to_index(survivors, index_path)
        finally:
            survivors.unpersist()

    return (
        stream_docs.writeStream.foreachBatch(admit)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
