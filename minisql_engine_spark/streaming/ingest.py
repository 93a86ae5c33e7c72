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
            )
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
            )
        # one partition before persist: a micro-batch is broadcast-
        # sized by contract, but its plan inherits the session's
        # shuffle partitioning (the in-batch dedup window), so an
        # unpersisted-as-is batch materializes AND WRITES dozens of
        # sliver files per version — file count every later reader
        # (constraint gate, replay, time travel) pays for
        survivors = survivors.coalesce(1).persist()
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


def stream_admit_semdedup(
    stream_vecs: DataFrame,
    index_path: str,
    checkpoint_path: str,
    threshold_fx6: int = 400_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Semantic streaming admission — the EMBEDDING twin of
    :func:`stream_admit` / :func:`stream_admit_neardup`: each
    micro-batch of vectors resolves against the persisted
    cell-partitioned semantic index
    (:mod:`operators.semdedup_index`) — frozen-cell argmax
    assignment, partition-pruned candidate scan, exact fx6-cosine
    verify — and its ADMITTED subset appends under the touched cell
    partitions. First-stream-wins across batches; a replayed batch
    self-collides at sim 10⁶ and appends nothing, so admission is
    idempotent under at-least-once delivery with no extra commit
    machinery (the index rows ARE the decision state). The index
    must already exist (``init_semdedup_index`` — the init corpus is
    the cell freeze point); decisions are micro-batch-order-
    dependent across near-dup pairs split over batches, exactly like
    the batch operator's contract."""
    from minisql_engine_spark.operators.semdedup_index import (
        admit_semdedup_batch,
    )

    def admit(batch_df: DataFrame, batch_id: int) -> None:
        admit_semdedup_batch(
            batch_df.sparkSession,
            index_path,
            batch_df,
            threshold_fx6,
            id_col=id_col,
            vec_col=vec_col,
        )

    return (
        stream_vecs.writeStream.foreachBatch(admit)
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
    bloom_path: str | None = None,
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
    a poison batch must not be half-ingested.

    ``bloom_path`` (optional) routes admission through the
    generation-versioned Bloom sidecar
    (:func:`operators.dedup_index.dedup_with_bloom_sidecar` /
    ``append_to_index_with_bloom``): keys the filter rules out never
    touch the exact index, so a mostly-new batch's admission join
    shrinks to the (true dups + bounded FPR) key set — the 100 TB
    lever, where the index scan is the corpus-sized cost. Admitted
    CONTENT is provably identical to the exact path (the sidecar has
    no false negatives; maybe-present keys still walk the exact
    join), and the sidecar advances before the index inside the same
    batch (crash ordering documented at the operator)."""
    from minisql_engine_spark.operators.dedup_index import (
        append_to_index_with_bloom,
        dedup_with_bloom_sidecar,
    )
    from minisql_engine_spark.sources.snapshots import append_snapshot

    def admit(batch_df: DataFrame, batch_id: int) -> None:
        if bloom_path is None:
            survivors = dedup_against_index(
                batch_df, index_path, id_col=id_col, text_col=text_col
            )
        else:
            survivors = dedup_with_bloom_sidecar(
                batch_df,
                index_path,
                bloom_path,
                id_col=id_col,
                text_col=text_col,
            )
        # one partition before persist — same sliver-file rationale
        # as stream_admit above
        survivors = survivors.coalesce(1).persist()
        try:
            if survivors.limit(1).count() > 0:
                append_snapshot(
                    survivors, table_path, constraints=constraints
                )
                if bloom_path is None:
                    append_to_index(survivors, index_path)
                else:
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


def versioned_admission_cycle(
    docs: DataFrame,
    base_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    use_bloom: bool = False,
) -> DataFrame:
    """Run the full VERSIONED streaming-admission life cycle (the
    driver-row shape of :func:`stream_admit_snapshot`, r8 VERDICT
    task 7) against real on-disk state under ``base_path`` (recreated
    each call — the maintenance cycle IS the operator):

    1. init the durable key index from a seed slice of ``docs``;
    2. stage a 3-file drop folder (one micro-batch per file, mtimes
       forced ascending so the availableNow file source processes
       them in a deterministic order) where file 1 re-presents seed
       content, file 2 re-presents file-1 content, and file 3
       re-presents file-2 content;
    3. run the stream: each batch's survivors commit as ONE snapshot
       version (table before index — crash-safe toward re-admission,
       never loss);
    4. REPLAY the whole drop folder as a fresh query (new checkpoint,
       same index/table): at-least-once delivery re-presents every
       batch, and the in-query gate requires the replay to admit
       NOTHING — zero new versions, zero new rows — or raise.

    Returns one row per admitted content — content-addressed, so the
    result is arrival-order-stable (the curate_stream rule):
    ``(content_hash, first_version, n_versions,
    replay_new_versions)`` where ``first_version`` is the snapshot
    version that admitted the content, ``n_versions`` the total
    version count, and ``replay_new_versions`` is the gated 0."""
    import hashlib
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from minisql_engine_spark.operators.dedup_index import (
        init_dedup_index,
    )
    from minisql_engine_spark.sources.snapshots import (
        current_version,
        list_versions,
        read_snapshot,
    )

    spark = docs.sparkSession
    # RUN state (index, table, checkpoints) must be fresh per call —
    # a carried index would admit nothing and change the result. The
    # staged DROP is a pure function of ``docs`` and persists across
    # calls (same artifact-amortization rule as the funnel driver
    # row); callers key ``base_path`` on the source's identity.
    drop = os.path.join(base_path, "drop")
    staged = os.path.join(base_path, "_STAGED")
    run_dir = os.path.join(base_path, "run")
    shutil.rmtree(run_dir, ignore_errors=True)
    if not os.path.exists(staged):
        shutil.rmtree(base_path, ignore_errors=True)
        os.makedirs(drop)
    index = os.path.join(run_dir, "index")
    table = os.path.join(run_dir, "table")

    d = docs.select(F.col(id_col), F.col(text_col))
    i = F.col(id_col)
    seed = d.filter(i < 150)
    b1 = d.filter((i >= 150) & (i < 250)).unionByName(
        d.filter(i < 5).select((i + 7000).alias(id_col), text_col)
    )
    b2 = d.filter((i >= 250) & (i < 350)).unionByName(
        d.filter((i >= 150) & (i < 155)).select(
            (i + 7100).alias(id_col), text_col
        )
    )
    b3 = d.filter((i >= 350) & (i < 450)).unionByName(
        d.filter((i >= 250) & (i < 255)).select(
            (i + 7200).alias(id_col), text_col
        )
    )
    init_dedup_index(seed, index, id_col, text_col)
    bloom = os.path.join(run_dir, "index.bloom") if use_bloom else None
    if use_bloom:
        from minisql_engine_spark.operators.dedup_index import (
            init_bloom_sidecar,
        )

        init_bloom_sidecar(spark, index, bloom, n_bits=1 << 17)

    # one parquet FILE per micro-batch, mtimes forced ascending so the
    # file source's batch order is deterministic
    if not os.path.exists(staged):
        t0 = 1_600_000_000
        for n, batch in ((1, b1), (2, b2), (3, b3)):
            stage = tempfile.mkdtemp(prefix="minisql_vstage_")
            batch.coalesce(1).write.mode("overwrite").parquet(stage)
            part = [
                f for f in os.listdir(stage) if f.endswith(".parquet")
            ][0]
            dst = os.path.join(drop, f"b{n}.parquet")
            shutil.move(os.path.join(stage, part), dst)
            os.utime(dst, (t0 + 60 * n, t0 + 60 * n))
            shutil.rmtree(stage, ignore_errors=True)
        with open(staged, "w") as fh:
            fh.write("ok")

    schema = spark.read.parquet(drop).schema

    def run(ckpt_name: str) -> None:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(drop)
        )
        q = stream_admit_snapshot(
            stream,
            index,
            table,
            os.path.join(run_dir, ckpt_name),
            id_col=id_col,
            text_col=text_col,
            constraints=[f"{id_col} IS NOT NULL"],
            bloom_path=bloom,
        )
        q.awaitTermination(300)

    run("ckpt1")
    v_before = current_version(table)
    n_before = read_snapshot(spark, table).count()
    run("ckpt2")  # full replay, fresh checkpoint, SAME index+table
    v_after = current_version(table)
    n_after = read_snapshot(spark, table).count()
    if (v_after, n_after) != (v_before, n_before):
        raise RuntimeError(
            "replay admitted content: versions "
            f"{v_before}->{v_after}, rows {n_before}->{n_after}"
        )

    versions = list_versions(table)
    parts = []
    for pos, v in enumerate(sorted(versions), start=1):
        parts.append(
            read_snapshot(spark, table, version=v)
            .select("content_hash")
            .withColumn("v", F.lit(pos).cast("bigint"))
        )
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    out = (
        union.groupBy("content_hash")
        .agg(F.min("v").alias("first_version"))
        .select(
            "content_hash",
            F.col("first_version").cast("bigint").alias("first_version"),
            F.lit(len(versions)).cast("bigint").alias("n_versions"),
            F.lit(0).cast("bigint").alias("replay_new_versions"),
        )
    )
    return out


def versioned_admission_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`versioned_admission_cycle`: the same
    batch derivation and chained admission rule (batch-k admissions
    feed batch k+1's key set — the dedup_index_admission_sql state-
    threading pattern), with ``first_version`` as the dense rank of
    the admitting batch among batches that admitted anything (only
    non-empty batches commit a version) and the replay contributing
    nothing by construction."""
    norm = f"regexp_replace(lower(trim({text_col})), '\\s+', ' ', 'g')"
    return (
        f"WITH d AS MATERIALIZED (SELECT {id_col} AS i, md5({norm}) AS h"
        f"  FROM {table}),"
        " seed_keys AS (SELECT DISTINCT h FROM d WHERE i < 150),"
        " b1 AS (SELECT i, h FROM d WHERE i >= 150 AND i < 250"
        "  UNION ALL SELECT i + 7000, h FROM d WHERE i < 5),"
        " b2 AS (SELECT i, h FROM d WHERE i >= 250 AND i < 350"
        "  UNION ALL SELECT i + 7100, h FROM d WHERE i >= 150 AND i < 155),"
        " b3 AS (SELECT i, h FROM d WHERE i >= 350 AND i < 450"
        "  UNION ALL SELECT i + 7200, h FROM d WHERE i >= 250 AND i < 255),"
        " adm1 AS MATERIALIZED (SELECT DISTINCT h FROM b1 b"
        "  WHERE NOT EXISTS (SELECT 1 FROM seed_keys k WHERE k.h = b.h)),"
        " keys1 AS MATERIALIZED (SELECT h FROM seed_keys"
        "  UNION SELECT h FROM adm1),"
        " adm2 AS MATERIALIZED (SELECT DISTINCT h FROM b2 b"
        "  WHERE NOT EXISTS (SELECT 1 FROM keys1 k WHERE k.h = b.h)),"
        " keys2 AS MATERIALIZED (SELECT h FROM keys1"
        "  UNION SELECT h FROM adm2),"
        " adm3 AS (SELECT DISTINCT h FROM b3 b"
        "  WHERE NOT EXISTS (SELECT 1 FROM keys2 k WHERE k.h = b.h)),"
        " adm AS (SELECT h, 1 AS b FROM adm1"
        "  UNION ALL SELECT h, 2 FROM adm2"
        "  UNION ALL SELECT h, 3 FROM adm3),"
        " nv AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n_versions"
        "  FROM adm)"
        " SELECT h AS content_hash,"
        "  CAST(dense_rank() OVER (ORDER BY b) AS BIGINT)"
        "   AS first_version,"
        "  nv.n_versions,"
        "  CAST(0 AS BIGINT) AS replay_new_versions"
        " FROM adm CROSS JOIN nv"
    )


def stream_admit_linkage(
    stream_records: DataFrame,
    index_path: str,
    checkpoint_path: str,
    batch_base: int = 1,
    id_col: str = "rec_id",
    block_col: str = "block",
    name_col: str = "name",
    exact_weights: dict[str, int] | None = None,
    name_weight: int = 3,
    max_name_dist: int = 2,
    threshold: int = 5,
):
    """Streaming entity resolution — the MDM twin of
    :func:`stream_admit`: each micro-batch of records resolves
    against the persisted linkage index
    (:mod:`operators.linkage_index`) and folds in, so a
    re-registration links to its entity whether the first
    registration arrived in this batch, the previous one, or a
    backfill — and a bridging record merges existing entities
    mid-stream.

    Idempotence under at-least-once delivery: already-labeled ids
    drop via an anti-join against the LABEL snapshot — the commit
    point, so an orphaned ``records/batch=k`` dir from a crashed
    admission is invisible to the check — and an all-dropped batch
    is skipped with NO writes, so a replay can neither double-label
    nor clobber a committed records dir. Records dirs are keyed
    ``batch_base + batch_id`` (init owns batch 0; give concurrent
    logical sources distinct bases). Restarting a stream on a FRESH
    checkpoint resets ``batch_id`` to 0, so it MUST use a new
    ``batch_base`` — the admission core rails this
    (:func:`operators.linkage_index._rail_committed_batch_dir`
    refuses to overwrite a records dir whose ids are already
    labeled), turning the silent-eviction hazard into a hard error.

    The index must already exist (:func:`init_linkage_index`,
    possibly on an empty frame) so a first-batch race can't observe
    a missing path. Semantics equal the batch operator's BY
    CONSTRUCTION (the call graph IS ``admit_linkage_batch``), and by
    its equivalence contract the stream's final labels equal one-shot
    ``record_linkage`` over everything ever admitted, regardless of
    micro-batch boundaries."""
    from pyspark.sql import functions as F

    from minisql_engine_spark.operators.linkage_index import (
        _labels_dir,
        admit_linkage_batch,
    )
    from minisql_engine_spark.sources.snapshots import read_snapshot

    def admit(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        labels = read_snapshot(spark, _labels_dir(index_path))
        fresh = batch_df.join(
            labels.select(F.col("rec_id").alias(id_col)),
            id_col,
            "left_anti",
        ).persist()
        try:
            if fresh.count() == 0:
                return
            admit_linkage_batch(
                spark,
                index_path,
                fresh,
                batch_base + int(batch_id),
                id_col=id_col,
                block_col=block_col,
                name_col=name_col,
                exact_weights=exact_weights,
                name_weight=name_weight,
                max_name_dist=max_name_dist,
                threshold=threshold,
            )
        finally:
            fresh.unpersist()

    return (
        stream_records.writeStream.foreachBatch(admit)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
