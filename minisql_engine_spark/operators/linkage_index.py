"""Incremental entity resolution: a persisted linkage index that
admits record batches without re-resolving the corpus.

A production MDM pipeline does not re-run entity resolution over
100 TB of records every time a registration batch lands; it keeps a
persisted index and resolves each batch AGAINST it:

1. **Record store** (``<path>/records/batch=<k>/``) — append-only
   parquet, one directory per admitted batch; holds the matching
   fields (id, block, name, exact-agreement columns). Appends never
   rewrite a byte (the ``dedup_index`` layout rule);
   :func:`compact_linkage_index` is the explicit maintenance step
   that consolidates the accumulated batch dirs (decision-identity
   preserved, single-writer locked, swap aborted if a concurrent
   admission lands — the semdedup-index compaction contract).
2. **Label table** (``<path>/labels/``) — (rec_id, entity), versioned
   via :mod:`sources.snapshots` manifest commits. Labels rewrite
   copy-on-write per admission: the skinny two-long table is ~0.1%
   of record bytes, and the ``merge_snapshot_pruned`` refinement
   applies when even that is too much (a batch's merges touch few
   entities, so most label files are byte-identical carries).

Admission of a batch is blocked-bounded end to end:

* candidate pairs form ONLY within a block — batch×batch (self-join,
  id ordering) and batch×index (equi-join on block; sides disjoint
  by the id rail) — and both paths score with the IDENTICAL
  agreement rule as :func:`linkage.record_linkage`
  (``linkage._weighted_edges``: cheap equality terms first, the
  O(len²) Levenshtein DP only on the decisive band);
* matched batch×index edges COLLAPSE the index side to its entity
  label (one super-node per existing entity), so the closure runs
  over new ids + touched entity labels only — never over old
  records;
* connected components (min-id) relabel: new records get their
  component, existing entities bridged by a new record MERGE to the
  component minimum (the full merge cascade), untouched entities
  carry unchanged.

**Equivalence contract** (the reason the construction is trusted and
the oracle is free): entity labels are min-member-ids, so collapsing
an old entity to its label preserves exactly the connectivity of the
old subgraph, and closure-of-union equals union-of-closures. After
ANY batch sequence the index labels are IDENTICAL to one-shot
``record_linkage`` over the union of all batches — asserted per
batch in ``test_linkage_index.py`` and replayed by the one-shot
DuckDB twin (``record_linkage_sql``) as the oracle.

Scale shape per batch: one block-key shuffle of the BATCH against
the index records (the index side can be bucketed by block to make
its side shuffle-free), a CC loop over match edges only (a tiny
fraction of the batch), one skinny-label COW write, one record
append. Nothing corpus-sized is rewritten or re-scored.

Reference scope: ``sqlengine.py:1-753`` has no corpus surface;
extension, SURVEY §2.4 dedup family (the incremental member beside
``dedup_index`` exact admission and ``ann_index`` IVF maintenance).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.snapshots import read_snapshot, write_snapshot
from .clustering import connected_components
from .linkage import _weighted_edges

_RECORDS = "records"
_LABELS = "labels"


def _records_dir(path: str) -> str:
    return os.path.join(path, _RECORDS)


def _labels_dir(path: str) -> str:
    return os.path.join(path, _LABELS)


def _match_cols(
    id_col: str,
    block_col: str,
    name_col: str,
    exact_weights: dict[str, int],
) -> list[str]:
    return [id_col, block_col, name_col, *exact_weights]


def init_linkage_index(
    records: DataFrame,
    path: str,
    id_col: str = "rec_id",
    block_col: str = "block",
    name_col: str = "name",
    exact_weights: dict[str, int] | None = None,
    name_weight: int = 3,
    max_name_dist: int = 2,
    threshold: int = 5,
) -> int:
    """Create the index from an initial corpus: one-shot
    :func:`linkage.record_linkage` resolves it, the matching fields
    land in ``records/batch=0``, labels commit as snapshot v1.
    Returns the label version."""
    from .linkage import record_linkage

    exact_weights = dict(exact_weights or {})
    cols = _match_cols(id_col, block_col, name_col, exact_weights)
    base = records.select(*cols)
    resolved = record_linkage(
        base,
        id_col=id_col,
        block_col=block_col,
        name_col=name_col,
        exact_weights=exact_weights,
        name_weight=name_weight,
        max_name_dist=max_name_dist,
        threshold=threshold,
    )
    base.write.mode("overwrite").parquet(
        os.path.join(_records_dir(path), "batch=0")
    )
    return write_snapshot(
        resolved.select(
            F.col("rec_id").cast("long").alias("rec_id"),
            F.col("entity").cast("long").alias("entity"),
        ),
        _labels_dir(path),
    )


def _read_records(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(_records_dir(path))


def _rail_committed_batch_dir(
    spark: SparkSession,
    path: str,
    batch_no: int,
    labels: DataFrame,
    id_col: str,
) -> None:
    """Refuse to overwrite a COMMITTED ``records/batch=k`` dir.

    Batch dirs are keyed by caller-supplied batch number; a stream
    restarted on a FRESH checkpoint re-counts from 0, and two
    sources sharing a base collide — either would overwrite a
    committed dir with different content, silently evicting records
    whose labels persist (future batches could never match them).
    A dir is committed iff any of its ids appear in the label
    snapshot (labels are the commit point); an orphan from a crashed
    admission has no labeled ids and stays safely overwritable.
    Checkpoint reset therefore requires a new ``batch_base``.

    A crash mid-write can leave the dir with no committed part file
    at all (only ``_temporary``/``_SUCCESS``) — ``read.parquet``
    would raise 'Unable to infer schema' and block the exact
    crashed-admission replay this carve-out exists for, so an empty
    or unreadable dir is treated as uncommitted."""
    d = os.path.join(_records_dir(path), f"batch={batch_no}")
    if not os.path.exists(d):
        return
    has_parts = any(
        f.endswith(".parquet")
        for root, _, fs in os.walk(d)
        if "_temporary" not in root
        for f in fs
    )
    if not has_parts:
        return  # crashed admission wrote nothing durable — overwritable
    committed = (
        spark.read.parquet(d)
        .select(F.col(id_col))
        .join(
            labels.select(F.col("rec_id").alias(id_col)),
            id_col,
            "left_semi",
        )
        .limit(1)
        .count()
    )
    if committed:
        raise ValueError(
            f"records/batch={batch_no} already committed (its ids "
            "are labeled) — a colliding batch number would evict "
            "committed records; restart streams on a fresh "
            "checkpoint with a NEW batch_base"
        )


def admit_linkage_batch(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    batch_no: int,
    id_col: str = "rec_id",
    block_col: str = "block",
    name_col: str = "name",
    exact_weights: dict[str, int] | None = None,
    name_weight: int = 3,
    max_name_dist: int = 2,
    threshold: int = 5,
) -> int:
    """Resolve ``batch`` against the index and fold it in; returns
    the new label version. Batch ids must be disjoint from the
    index's (checked — a re-presented id is an upsert, which is
    :mod:`sources.scd2`'s job, not the identity graph's)."""
    if batch_no < 0:
        raise ValueError(
            f"batch_no must be >= 0, got {batch_no} — negative "
            "numbers are reserved for the compacted store "
            "(compact_linkage_index writes batch=-1)"
        )
    exact_weights = dict(exact_weights or {})
    cols = _match_cols(id_col, block_col, name_col, exact_weights)
    # the batch projection is consumed by the rail, both edge sides,
    # the label union, and the append — checkpoint once (batch-sized
    # by definition) so none of them re-derives the input lineage.
    # LAZY: the rail aggregate (the first action, inside
    # _resolve_against) materializes the blocks, saving a scheduled
    # job per admission (guide §2.4)
    new = batch.select(*cols).localCheckpoint(eager=False)
    old = _read_records(spark, path)
    labels = read_snapshot(spark, _labels_dir(path))
    _rail_committed_batch_dir(
        spark, path, batch_no, labels, id_col
    )
    next_labels = _resolve_against(
        new,
        old,
        labels,
        cols,
        id_col,
        block_col,
        name_col,
        exact_weights,
        name_weight,
        max_name_dist,
        threshold,
    )
    new.write.mode("overwrite").parquet(
        os.path.join(_records_dir(path), f"batch={batch_no}")
    )
    return write_snapshot(next_labels, _labels_dir(path))


def _resolve_against(
    new: DataFrame,
    old: DataFrame,
    labels: DataFrame,
    cols: list[str],
    id_col: str,
    block_col: str,
    name_col: str,
    exact_weights: dict[str, int],
    name_weight: int,
    max_name_dist: int,
    threshold: int,
) -> DataFrame:
    """The layout-agnostic admission core: rails, edge building,
    closure, and the label union — shared by the directory layout
    (:func:`admit_linkage_batch`) and the bucketed-table layout
    (:func:`admit_linkage_batch_bucketed`). Returns the next label
    table's content (old relabeled ∪ new labeled)."""
    # both rails in ONE action: id-disjointness vs the index and
    # in-batch id uniqueness. Membership is checked against LABELS —
    # the commit point — not the record store: a crashed admission
    # can leave an orphaned records/batch=k dir whose labels never
    # committed, and a replay must see those ids as NOT admitted
    # (the streaming wrapper's exactly-once argument rests on this)
    rail = (
        new.join(
            labels.select(
                F.col("rec_id").alias(id_col), F.lit(1).alias("_in")
            ),
            id_col,
            "left",
        )
        .agg(
            F.count("*").alias("n"),
            F.countDistinct(id_col).alias("d"),
            F.count("_in").alias("n_dup"),
        )
        .collect()[0]
    )
    if rail["n_dup"]:
        raise ValueError(
            f"{rail['n_dup']} batch ids already in the index — "
            "admission resolves NEW records; re-presenting an id "
            "is an upsert"
        )
    if rail["n"] != rail["d"]:
        raise ValueError(
            f"{rail['n'] - rail['d']} duplicate {id_col} rows in batch"
        )

    a = new.select(*[F.col(c).alias(f"a_{c}") for c in cols])
    kw = dict(
        id_col=id_col,
        name_col=name_col,
        exact_weights=dict(exact_weights),
        name_weight=name_weight,
        max_name_dist=max_name_dist,
        threshold=threshold,
    )
    # batch×batch edges: the one-shot self-join rule
    within = _weighted_edges(
        a.join(
            new.select(*[F.col(c).alias(f"b_{c}") for c in cols]),
            (F.col(f"a_{block_col}") == F.col(f"b_{block_col}"))
            & (F.col(f"a_{id_col}") < F.col(f"b_{id_col}")),
        ),
        **kw,
    )
    # batch×index edges against RECORD ids first, entity mapping
    # AFTER the weight filter: the edge set is candidate-sized, so
    # the labels join touches edge keys only — the index records are
    # never shuffled on rec_id (and under the bucketed layout never
    # shuffled at all). Orphan records from a crashed admission have
    # no label and drop out of the inner join, exactly as before.
    cross_raw = _weighted_edges(
        a.join(
            old.select(*[F.col(c).alias(f"b_{c}") for c in cols]),
            F.col(f"a_{block_col}") == F.col(f"b_{block_col}"),
        ),
        **kw,
    )
    # collapse the old side to its ENTITY label — the closure below
    # never touches old record ids
    cross = cross_raw.join(
        labels.select(
            F.col("rec_id").alias("id_b"), F.col("entity")
        ),
        "id_b",
    ).select(
        "id_a", F.col("entity").alias("id_b"), "weight"
    )
    edges = within.unionByName(cross)

    comp = connected_components(edges, "id_a", "id_b")
    # new records: component if linked, else singleton of themselves
    new_labels = (
        new.select(F.col(id_col).cast("long").alias("rec_id"))
        .join(
            comp.select(F.col("id").alias("rec_id"), "component"),
            "rec_id",
            "left",
        )
        .select(
            "rec_id",
            F.coalesce(F.col("component"), F.col("rec_id")).alias(
                "entity"
            ),
        )
    )
    # old records: entities bridged into a component relabel to the
    # component min (the merge cascade); everything else carries
    relabel = comp.select(
        F.col("id").alias("entity"),
        F.col("component").alias("_new_entity"),
    )
    old_labels = (
        labels.join(F.broadcast(relabel), "entity", "left")
        .select(
            "rec_id",
            F.coalesce(F.col("_new_entity"), F.col("entity")).alias(
                "entity"
            ),
        )
    )
    return old_labels.unionByName(new_labels)


# ---------------------------------------------------------------------------
# Bucketed layout: the index side of admission is SCAN-ONLY
# ---------------------------------------------------------------------------
#
# The directory layout shuffles the index records into the block join
# once per admission. The bucketed layout removes that: the record
# store lives as a catalog table hash-bucketed on ``block`` (the
# ``dedup_index`` bucketing precedent), so the batch×index block join
# plans with NO Exchange on the index side — only the batch hashes
# into the index's buckets, and appends accumulate bucket files with
# the identical spec. Combined with the candidate-first entity
# mapping above (labels joined on edge keys only), NOTHING
# corpus-sized moves per admission: the index records are scanned in
# place, the labels scan once. At a fixed cluster this IS the layout
# a persisted MDM index would use.


def init_linkage_index_bucketed(
    records: DataFrame,
    table: str,
    labels_path: str,
    n_buckets: int = 16,
    id_col: str = "rec_id",
    block_col: str = "block",
    name_col: str = "name",
    exact_weights: dict[str, int] | None = None,
    name_weight: int = 3,
    max_name_dist: int = 2,
    threshold: int = 5,
) -> int:
    """:func:`init_linkage_index` with the record store as a catalog
    table bucketed on ``block``; labels stay snapshot-versioned at
    ``labels_path``. Returns the label version."""
    from ..sources.bucketing import write_bucketed
    from .linkage import record_linkage

    exact_weights = dict(exact_weights or {})
    cols = _match_cols(id_col, block_col, name_col, exact_weights)
    base = records.select(*cols)
    resolved = record_linkage(
        base,
        id_col=id_col,
        block_col=block_col,
        name_col=name_col,
        exact_weights=exact_weights,
        name_weight=name_weight,
        max_name_dist=max_name_dist,
        threshold=threshold,
    )
    write_bucketed(base, table, block_col, n_buckets, sort_by=block_col)
    return write_snapshot(
        resolved.select(
            F.col("rec_id").cast("long").alias("rec_id"),
            F.col("entity").cast("long").alias("entity"),
        ),
        _labels_dir(labels_path),
    )


def admit_linkage_batch_bucketed(
    spark: SparkSession,
    table: str,
    labels_path: str,
    batch: DataFrame,
    n_buckets: int = 16,
    id_col: str = "rec_id",
    block_col: str = "block",
    name_col: str = "name",
    exact_weights: dict[str, int] | None = None,
    name_weight: int = 3,
    max_name_dist: int = 2,
    threshold: int = 5,
) -> int:
    """:func:`admit_linkage_batch` for the bucketed layout: the index
    side of the block join is the bucketed table (scan-only, no
    Exchange — plan-gated in ``test_linkage_index.py``); admitted
    records append with the identical bucket spec.

    Crash semantics differ from the directory layout in one benign
    way: a crash between the append and the label commit leaves
    orphan rows that a replay re-appends (no per-batch dir to
    overwrite), so the record store can hold duplicate rows for a
    replayed batch. Labels stay exactly-once (the rail checks the
    label snapshot), and duplicates only duplicate edge candidates —
    deduped in the closure — so results are unaffected; compact by
    rewriting with the identical spec when storage warrants."""
    exact_weights = dict(exact_weights or {})
    cols = _match_cols(id_col, block_col, name_col, exact_weights)
    # lazy — the rail aggregate materializes it (same as the
    # directory-layout twin above)
    new = batch.select(*cols).localCheckpoint(eager=False)
    old = spark.table(table)
    labels = read_snapshot(spark, _labels_dir(labels_path))
    next_labels = _resolve_against(
        new,
        old,
        labels,
        cols,
        id_col,
        block_col,
        name_col,
        exact_weights,
        name_weight,
        max_name_dist,
        threshold,
    )
    (
        new.write.mode("append")
        .bucketBy(n_buckets, block_col)
        .sortBy(block_col)
        .format("parquet")
        .saveAsTable(table)
    )
    return write_snapshot(next_labels, _labels_dir(labels_path))


def compact_linkage_index(
    spark: SparkSession, path: str, n_partitions: int = 1
) -> tuple[int, int, int]:
    """Compact BOTH index surfaces; returns (records_files_before,
    records_files_after, label_version).

    * **Records**: every admission appends a ``records/batch=k`` dir
      (at least one file), so a long admission cadence accumulates
      dirs/files every candidate scan re-opens; compaction rewrites
      the store into ONE consolidated ``batch=-1`` dir (same rows,
      same schema — admission decisions depend on row content and
      labels only, so they cannot change). Caller batch numbers are
      ≥ 0 (railed in :func:`admit_linkage_batch`), so the reserved
      dir never collides, and post-compaction the committed-dir
      clobber rail is moot for consolidated records: a colliding
      batch number writes a FRESH dir and can no longer evict them.
    * **Labels**: delegated to :func:`sources.snapshots.
      compact_snapshot` — a new content-identical version with
      bin-packed files (older versions still time-travel until
      vacuumed).

    SINGLE-WRITER, NO CONCURRENT ADMISSION — the shared
    :mod:`._compaction` contract (exclusive lock file, listing-verify
    swap abort on a concurrent append, two-rename swap with a
    briefly-missing-dir instant); schedule compaction in an admission
    quiesce window."""
    from ..sources.snapshots import compact_snapshot
    from ._compaction import compact_swap

    records = _records_dir(path)

    def stage(staged: str) -> None:
        (
            spark.read.parquet(records)
            .drop("batch")
            .repartition(n_partitions)
            .write.mode("overwrite")
            .parquet(os.path.join(staged, "batch=-1"))
        )

    before, after = compact_swap(records, stage, "linkage record store")
    version = compact_snapshot(spark, _labels_dir(path))
    return before, after, version


def linkage_index_entities(
    spark: SparkSession, path: str
) -> DataFrame:
    """The :func:`linkage.record_linkage` output surface — (rec_id,
    entity, is_canonical, n_members) — from the CURRENT index state,
    so every downstream consumer (``entity_rollup``, the SCD2
    composition) plugs in unchanged."""
    labels = read_snapshot(spark, _labels_dir(path))
    sizes = labels.groupBy("entity").agg(
        F.count("*").cast("bigint").alias("n_members")
    )
    return labels.join(sizes, "entity").select(
        "rec_id",
        "entity",
        (F.col("entity") == F.col("rec_id")).alias("is_canonical"),
        "n_members",
    )
