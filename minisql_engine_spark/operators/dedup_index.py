"""Incremental exact-dedup index: dedup new batches against a
persisted corpus without re-reading the corpus text.

A production pipeline does not re-dedup 100 TB every time a crawl
batch lands; it keeps a *key index* — one 32-hex md5 of the normalized
content per distinct document ever admitted — and each new batch is

1. deduplicated **within itself** (the `exact_dedup` min-id rule),
2. anti-joined against the index (drop anything the corpus has seen),
3. its surviving keys **appended** to the index.

The index stores keys only: at 100 TB of text that is ~0.1% of the
corpus bytes, and the anti-join shuffles 32-hex strings, never
documents. The index is laid out as parquet directory-partitioned by
the first hex character of the key (16 uniform partitions by
construction — md5 is uniform): a batch's anti-join prunes nothing
(all partitions are hit) but appends touch only the partitions their
keys land in, and the layout is the stepping stone to the bucketed
layout (`sources/bucketing.py`) a fixed cluster would use to make the
join's index side shuffle-free. Appends write new files; nothing is
rewritten (object-store-friendly, no read-modify-write races within a
single writer).

Determinism: admission is order-dependent *across* batches by design
(the first batch to present a content wins — that is what "incremental"
means), but within a batch the min-id rule makes survivors exact and
reproducible, and `test_dedup_index.py` pins the invariant that any
batch sequence admits exactly one representative per distinct content.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import _norm

#: Partition column: first hex char of the key — 16 uniform buckets.
_PART = "key_prefix"


def _keyed(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Batch rows + their content key (the `exact_dedup` md5-of-_NORM
    rule, so index keys and one-shot dedup keys are interchangeable)."""
    return df.withColumn("content_hash", F.md5(_norm(F.col(text_col))))


def _index_keys(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def init_dedup_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Create the index from an initial corpus: one row per distinct
    content key. One hash-aggregate (map-side partial) then a
    partitioned write."""
    keys = (
        _keyed(df, id_col, text_col)
        .select("content_hash")
        .distinct()
        .withColumn(_PART, F.substring("content_hash", 1, 1))
    )
    # collapse the writer stage: few fat files per live hex partition
    # instead of (shuffle-partitions × 16) slivers — every admission
    # batch re-reads this index, so file count is the listing/footer
    # cost of the whole ingest path. Unlike append_to_index (batch-
    # sized by the micro-batch contract → coalesce(1)), init seeds
    # from an arbitrary, possibly corpus-scale corpus (ADVICE r10):
    # scale writer tasks with the seed so a large seed never funnels
    # the whole distinct key set through one task. ~4M keys/task at
    # 32-byte hashes keeps files in the 100MB+ range.
    # persist so sizing + write share ONE distinct pass (keys are
    # 32-byte hashes; MEMORY_AND_DISK spills if the seed is huge)
    keys = keys.persist()
    try:
        n_writers = max(1, keys.count() // 4_000_000)
        keys.coalesce(n_writers).write.mode("overwrite").partitionBy(
            _PART
        ).parquet(path)
    finally:
        keys.unpersist()


def dedup_against_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The batch's admissible rows: in-batch dedup (min-id per key)
    then an anti-join against the stored keys. Returns the original
    batch columns plus ``content_hash``; does NOT mutate the index —
    call :func:`append_to_index` with the result once the batch is
    durably admitted (two-step so a failed downstream write never
    poisons the index)."""
    spark = df.sparkSession
    keyed = _keyed(df, id_col, text_col)
    in_batch = (
        keyed.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("content_hash").orderBy(F.col(id_col))
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    # The index must NEVER shuffle on admission (it is the corpus-
    # sized side). A plain `batch ANTI JOIN index` would sort-merge —
    # shuffling the whole index per batch. Instead the (small) batch
    # key set broadcasts INTO the index scan as a semi-filter, and the
    # surviving index keys (≤ |batch|) broadcast back into the anti
    # join: the index is scan-only, both joins are broadcast-hash
    # (plan-gated in test_plans.py). For a batch too large to
    # broadcast, chunk it upstream — that is the micro-batch contract
    # (`streaming/ingest.py`).
    batch_keys = in_batch.select("content_hash").distinct()
    seen_matching = (
        _index_keys(spark, path)
        .select("content_hash")
        .join(F.broadcast(batch_keys), "content_hash", "left_semi")
    )
    return in_batch.join(
        F.broadcast(seen_matching), "content_hash", "left_anti"
    )


def append_to_index(survivors: DataFrame, path: str) -> None:
    """Append the admitted keys (the `dedup_against_index` output) to
    the index — new files only, partition-local."""
    (
        survivors.select("content_hash")
        .distinct()
        .withColumn(_PART, F.substring("content_hash", 1, 1))
        # one file per touched hex partition per append (not
        # shuffle-partitions × 16 slivers): the index is re-read by
        # EVERY subsequent batch, so append file count compounds into
        # the whole stream's listing/footer cost. coalesce — the
        # survivors set is batch-sized, a writer shuffle costs more
        # than it saves.
        .coalesce(1)
        .write.mode("append")
        .partitionBy(_PART)
        .parquet(path)
    )


def index_stats(spark: SparkSession, path: str) -> DataFrame:
    """(n_keys, n_partitions): index health — distinct keys and live
    hex partitions (16 once any realistic volume has flowed)."""
    keys = _index_keys(spark, path)
    return keys.agg(
        F.countDistinct("content_hash").cast("bigint").alias("n_keys"),
        F.countDistinct(_PART).cast("bigint").alias("n_partitions"),
    )


def compact_index(spark: SparkSession, path: str) -> None:
    """Rewrite the index with one file per partition and duplicate
    keys collapsed (concurrent historical appends can have raced the
    same key in — harmless for correctness since the anti-join only
    asks existence, but compaction keeps lookups one-file-per-bucket).

    SINGLE-WRITER, NO CONCURRENT ADMISSION — the shared
    :mod:`._compaction` contract (exclusive lock file, listing-verify
    swap abort: an ``append_to_index`` landing mid-compaction aborts
    the swap instead of having its freshly-appended keys silently
    dropped, which would break the anti-join's first-batch-wins
    idempotence)."""
    from ._compaction import compact_swap

    def stage(staged: str) -> None:
        (
            _index_keys(spark, path)
            .select("content_hash", _PART)
            .distinct()
            .repartition(_PART)
            .write.mode("overwrite")
            .partitionBy(_PART)
            .parquet(staged)
        )

    compact_swap(path, stage, "dedup index")


# ---------------------------------------------------------------------------
# Bucketed index layout: zero-Exchange admission for non-broadcast batches
# ---------------------------------------------------------------------------
#
# The directory layout above relies on the batch being broadcastable
# (the micro-batch contract). When a batch is too large to broadcast —
# a backfill, a merged day of crawl — the admission join falls back to
# sort-merge, and a plain parquet index would then SHUFFLE the entire
# corpus-sized key set per batch. The bucketed layout removes that
# cliff: the index lives as a catalog table hash-bucketed (and
# sort-ordered) on ``content_hash``, so the anti join plans with NO
# Exchange on the index side — only the batch shuffles, into the
# index's bucketing (plan-gated in test_dedup_index.py). This is the
# "at a fixed cluster both would bucket by key" claim made concrete.


def init_dedup_index_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Create the key index as a catalog table bucketed + sorted on
    ``content_hash`` (the write-side shuffle is paid once; every
    admission after is Exchange-free on the index side)."""
    from ..sources.bucketing import write_bucketed

    keys = _keyed(df, id_col, text_col).select("content_hash").distinct()
    write_bucketed(
        keys, table, "content_hash", n_buckets, sort_by="content_hash"
    )


def dedup_against_bucketed_index(
    df: DataFrame,
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """:func:`dedup_against_index` for the bucketed layout and the
    too-big-to-broadcast batch: in-batch min-id dedup, then a direct
    anti join against the bucketed key table. The index side is
    scan-only (its bucketing satisfies the join's distribution
    requirement); the single Exchange in the plan is the batch
    hashing into the index's buckets."""
    spark = df.sparkSession
    keyed = _keyed(df, id_col, text_col)
    in_batch = (
        keyed.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("content_hash").orderBy(F.col(id_col))
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return in_batch.join(spark.table(table), "content_hash", "left_anti")


def append_to_bucketed_index(
    survivors: DataFrame, table: str, n_buckets: int = 16
) -> None:
    """Append admitted keys with the SAME bucket spec (bucket files
    accumulate per bucket; compaction is a rewrite with the identical
    spec when file counts warrant)."""
    (
        survivors.select("content_hash")
        .distinct()
        .write.mode("append")
        .bucketBy(n_buckets, "content_hash")
        .sortBy("content_hash")
        .format("parquet")
        .saveAsTable(table)
    )


# ---------------------------------------------------------------------------
# Bloom sidecar: skip the index read for definitely-new keys
# ---------------------------------------------------------------------------
#
# At 100 TB the index is big and most batches are mostly NEW content:
# paying an index scan per batch to discover "no duplicates" is the
# common-case waste. The sidecar is the index's Bloom filter
# (operators/membership.py — ~10 bits/key vs 32 hex chars/key, i.e.
# ~3% of the index bytes) persisted beside it: admission probes the
# batch against the sidecar first, and only maybe-present keys pay
# the exact index join — when a batch has none (the mostly-new common
# case minus FPR), the index is never read at all. No false negatives
# means the outcome is IDENTICAL to the exact path (pinned by
# test_dedup_index.py); false positives only cost a redundant exact
# lookup.
#
# Consistency contract (single admission writer, same as the index):
# the sidecar must advance in the same admission step as the index —
# `append_to_index(..., bloom_path=...)` updates both. A sidecar that
# LAGS the index would claim indexed keys are definitely-new and
# re-admit duplicates; a sidecar AHEAD of the index is harmless (pure
# false positives). Rebuild any suspect sidecar with
# `init_bloom_sidecar` — one scan of the keys-only index.

import json as _json
import os as _os

_BLOOM_META = "_bloom_meta.json"


def _write_bloom_meta(bloom_path: str, meta: dict) -> None:
    # atomic pointer flip: tmp file + rename
    tmp = _os.path.join(bloom_path, _BLOOM_META + ".tmp")
    with open(tmp, "w") as f:
        _json.dump(meta, f)
    _os.replace(tmp, _os.path.join(bloom_path, _BLOOM_META))


def _bloom_meta(bloom_path: str) -> dict:
    with open(_os.path.join(bloom_path, _BLOOM_META)) as f:
        return _json.load(f)


def _bloom_words(spark: SparkSession, bloom_path: str, meta: dict):
    return spark.read.parquet(
        _os.path.join(bloom_path, f"gen-{meta['gen']}")
    )


def init_bloom_sidecar(
    spark: SparkSession,
    index_path: str,
    bloom_path: str,
    n_bits: int = 1 << 20,
    k: int = 5,
) -> None:
    """Build the sidecar from the current index keys (sizing: n_bits
    ≈ 10 × expected total keys keeps FPR < 1%).

    Layout: the (word, bits) relation lives in a GENERATION subdir
    (``gen-N``) and ``_bloom_meta.json`` is the atomic pointer — a
    data path is never reused across updates, so Spark's shared
    file-status cache (which outlives an in-place directory swap and
    serves vanished file listings) can never see a stale sidecar."""
    from minisql_engine_spark.operators.membership import bloom_build

    _os.makedirs(bloom_path, exist_ok=True)
    bloom_build(
        _index_keys(spark, index_path).select(
            F.col("content_hash").alias("key")
        ),
        "key",
        n_bits,
        k,
    ).write.mode("overwrite").parquet(
        _os.path.join(bloom_path, "gen-1")
    )
    _write_bloom_meta(bloom_path, {"n_bits": n_bits, "k": k, "gen": 1})


def dedup_with_bloom_sidecar(
    df: DataFrame,
    path: str,
    bloom_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """:func:`dedup_against_index` with the sidecar fast path: keys
    the filter rules out skip the exact index entirely; only
    maybe-present keys (true dups + the bounded FPR) pay the index
    semi-join. Result is provably identical to the exact path."""
    from minisql_engine_spark.operators.membership import bloom_probe

    meta = _bloom_meta(bloom_path)
    spark = df.sparkSession
    keyed = _keyed(df, id_col, text_col)
    in_batch = (
        keyed.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("content_hash").orderBy(F.col(id_col))
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    probed = bloom_probe(
        in_batch.select(F.col("content_hash").alias("key")).distinct(),
        _bloom_words(spark, bloom_path, meta),
        "key",
        meta["n_bits"],
        meta["k"],
    )
    maybe_keys = probed.filter(F.col("maybe_present")).select(
        F.col("key").alias("content_hash")
    )
    # definitely-new keys are admitted without touching the index;
    # maybe-present keys walk the exact scan-only admission join
    seen_matching = (
        _index_keys(spark, path)
        .select("content_hash")
        .join(F.broadcast(maybe_keys), "content_hash", "left_semi")
    )
    return in_batch.join(
        F.broadcast(seen_matching), "content_hash", "left_anti"
    )


def append_to_index_with_bloom(
    survivors: DataFrame, path: str, bloom_path: str
) -> None:
    """One admission step advances BOTH structures (the consistency
    contract above): the sidecar commits a new generation (OR-merge
    of the current words with the survivors' partial filter —
    ≤ n_bits/32 rows, constant-size regardless of corpus size), then
    the keys append to the index partitions.

    Order matters twice over. The sidecar must advance BEFORE the
    index: (a) crash between the two leaves the sidecar AHEAD of the
    index, which is harmless (those keys route to the exact join, the
    index lacks them, the retry re-admits), while the reverse leaves
    it LAGGING — the direction that re-admits duplicates; and (b) the
    survivors lineage contains the anti-join against the index and
    RE-EXECUTES during the merge — if the index had already advanced,
    survivors would evaluate to empty and the sidecar would silently
    never learn the batch's keys (the regression
    ``test_bloom_sidecar_learns_appended_keys`` pins)."""
    from minisql_engine_spark.operators.membership import (
        bloom_build,
        bloom_merge,
    )

    import shutil

    meta = _bloom_meta(bloom_path)
    spark = survivors.sparkSession
    merged = bloom_merge(
        _bloom_words(spark, bloom_path, meta),
        bloom_build(
            survivors.select(F.col("content_hash").alias("key")).distinct(),
            "key",
            meta["n_bits"],
            meta["k"],
        ),
    )
    new_gen = meta["gen"] + 1
    merged.write.mode("overwrite").parquet(
        _os.path.join(bloom_path, f"gen-{new_gen}")
    )
    _write_bloom_meta(bloom_path, {**meta, "gen": new_gen})
    # the index append RE-EXECUTES the survivors lineage, which still
    # reads the PRIOR sidecar generation — old gens are swept only
    # after every consumer of them has run (a crash before the sweep
    # just leaves garbage for the next append to collect)
    append_to_index(survivors, path)
    for entry in _os.listdir(bloom_path):
        if entry.startswith("gen-") and entry != f"gen-{new_gen}":
            shutil.rmtree(
                _os.path.join(bloom_path, entry), ignore_errors=True
            )


# ---------------------------------------------------------------------------
# Driver-checkable admission cycle (r7): the init → admit → append →
# re-present → admit sequence as one replayable operator
# ---------------------------------------------------------------------------


def _admission_batches(docs: DataFrame, id_col: str, text_col: str):
    """Three deterministic batches derived from the corpus table —
    the same derivation the SQL twin performs, so the whole cycle is
    hash-comparable: a seed corpus, then two crawl drops salted with
    (a) copies of seed content (the index must reject), (b) in-batch
    duplicate pairs (the min-id rule must collapse), and (c) content
    admitted one batch earlier (the APPENDED index must reject)."""
    i, t = F.col(id_col), F.col(text_col)
    seed = docs.filter(i < 250).select(id_col, text_col)
    b1 = (
        docs.filter((i >= 250) & (i < 350))
        .select(id_col, text_col)
        .unionByName(
            docs.filter(i < 5).select(
                (i + 9000).alias(id_col), text_col
            )
        )
        .unionByName(
            docs.filter((i >= 250) & (i < 255)).select(
                (i + 9100).alias(id_col), text_col
            )
        )
    )
    b2 = (
        docs.filter((i >= 350) & (i < 450))
        .select(id_col, text_col)
        .unionByName(
            docs.filter((i >= 250) & (i < 260)).select(
                (i + 9200).alias(id_col), text_col
            )
        )
        .unionByName(
            docs.filter((i >= 5) & (i < 10)).select(
                (i + 9300).alias(id_col), text_col
            )
        )
    )
    return seed, b1, b2


def dedup_index_admission_cycle(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Run the full incremental-admission life cycle against a REAL
    on-disk index at ``path`` (recreated each call — the maintenance
    cycle IS the operator, like the IVM driver row): init on the
    seed, admit batch 1, append, admit batch 2 against the advanced
    index, append. Returns ``(batch, doc_id, content_hash)`` of every
    admitted row — the driver-facing proof that batch-2 re-presents
    of batch-1 content are rejected by the index batch 1 just built,
    while genuinely fresh content flows through."""
    seed, b1, b2 = _admission_batches(docs, id_col, text_col)
    init_dedup_index(seed, path, id_col, text_col)
    out = []
    for n, batch in ((1, b1), (2, b2)):
        admitted = dedup_against_index(
            batch, path, id_col=id_col, text_col=text_col
        # freeze BEFORE the index moves — LAZY is sufficient: the
        # append's own write job is the first action and it computes
        # (and stores) the blocks against the index's file listing
        # captured at plan time, before any new file lands
        ).localCheckpoint(eager=False)
        append_to_index(admitted, path)
        out.append(
            admitted.select(
                F.lit(n).cast("bigint").alias("batch"),
                F.col(id_col),
                "content_hash",
            )
        )
    return out[0].unionByName(out[1])


def dedup_index_admission_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`dedup_index_admission_cycle`: the same
    batch derivation and admission rule as chained MATERIALIZED CTEs
    (batch-1 admissions feed batch 2's key set — state threading in
    SQL, the incr_agg_events pattern). NOT EXISTS (not NOT IN)
    mirrors Spark's anti-join NULL-key semantics."""
    norm = f"regexp_replace(lower(trim({text_col})), '\\s+', ' ', 'g')"
    return (
        f"WITH d AS MATERIALIZED (SELECT {id_col} AS i, md5({norm}) AS h"
        f"  FROM {table}),"
        " seed_keys AS (SELECT DISTINCT h FROM d WHERE i < 250),"
        " b1 AS ("
        "  SELECT i, h FROM d WHERE i >= 250 AND i < 350"
        "  UNION ALL SELECT i + 9000, h FROM d WHERE i < 5"
        "  UNION ALL SELECT i + 9100, h FROM d WHERE i >= 250 AND i < 255),"
        " b1_in AS (SELECT i, h FROM ("
        "   SELECT i, h, row_number() OVER (PARTITION BY h ORDER BY i)"
        "    AS rn FROM b1) WHERE rn = 1),"
        " adm1 AS MATERIALIZED (SELECT i, h FROM b1_in b WHERE NOT EXISTS"
        "  (SELECT 1 FROM seed_keys k WHERE k.h = b.h)),"
        " keys1 AS MATERIALIZED (SELECT h FROM seed_keys"
        "  UNION SELECT h FROM adm1),"
        " b2 AS ("
        "  SELECT i, h FROM d WHERE i >= 350 AND i < 450"
        "  UNION ALL SELECT i + 9200, h FROM d WHERE i >= 250 AND i < 260"
        "  UNION ALL SELECT i + 9300, h FROM d WHERE i >= 5 AND i < 10),"
        " b2_in AS (SELECT i, h FROM ("
        "   SELECT i, h, row_number() OVER (PARTITION BY h ORDER BY i)"
        "    AS rn FROM b2) WHERE rn = 1),"
        " adm2 AS (SELECT i, h FROM b2_in b WHERE NOT EXISTS"
        "  (SELECT 1 FROM keys1 k WHERE k.h = b.h))"
        f" SELECT CAST(1 AS BIGINT) AS batch, i AS {id_col},"
        "  h AS content_hash FROM adm1"
        f" UNION ALL SELECT CAST(2 AS BIGINT), i, h FROM adm2"
    )
