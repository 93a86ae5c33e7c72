"""Incremental MinHash near-dup index: admit new batches against a
persisted signature index without re-reading corpus text.

The near-duplicate twin of :mod:`dedup_index`: where that module asks
"has this EXACT content been admitted?", this one asks "is anything
ALREADY ADMITTED within MinHash-estimated Jaccard ``t`` of this doc?"
— the admission rule streaming crawl pipelines actually run (a batch
doc near-duplicating the corpus is dropped; the corpus is never
re-clustered).

What persists is the *signature index*, not text: per admitted doc its
``num_hashes`` MinHash components (32-hex strings — the engine-portable
lexicographic-min-md5 family shared with ``minhash_lsh_dedup``). Band
keys are DERIVED from signatures at read time (md5 of each band's
slice — recomputing 16 md5s beats storing + maintaining a second
table). Admission is the standard two stage:

1. **candidates** — batch band keys ⋈ index band keys on (band, key):
   the only corpus-sized join, bounded by LSH bucket collisions, never
   |batch|×|corpus|;
2. **verify** — estimated Jaccard = fraction of agreeing signature
   components, computed pair-restricted from the two signature rows.
   A batch doc with any verified neighbor ≥ ``threshold`` is rejected.

In-batch near-dups resolve first (min-id representative per LSH
cluster via the existing ``minhash_lsh_dedup`` machinery would be the
full treatment; here the batch is assumed exact-deduped — compose with
``dedup_index`` upstream — and only CROSS-batch similarity is decided,
keeping each operator single-purpose).

Scale: the index stores ``num_hashes`` hex strings per admitted doc
(~0.5 KB/doc at 16 hashes — ~0.05% of a 1 MB doc). Admission shuffles
band keys (md5-uniform, no skew) and verifies only collided pairs. At
a fixed cluster the index parquet would be bucketed by doc_id so the
verify join's index side never reshuffles (`sources/bucketing.py`);
the directory layout here keeps appends object-store-friendly
(new files only, no rewrite).

Determinism: first-batch-wins across batches (the definition of
incremental admission); within a batch the decision depends only on
the persisted index, so re-running a batch is idempotent — every doc
either re-collides with the neighbor that rejected it or (if admitted)
collides with its own signatures at estimated Jaccard 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import (
    BAND_SIZE,
    NUM_HASHES,
    lsh_band_keys,
    minhash_signatures,
)


def _sig_cols(num_hashes: int) -> list[str]:
    return [f"sig_{i}" for i in range(num_hashes)]


def init_neardup_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = NUM_HASHES,
) -> None:
    """Create the signature index from an initial corpus."""
    sigs = minhash_signatures(
        df, id_col=id_col, text_col=text_col, num_hashes=num_hashes
    ).withColumnRenamed(id_col, "indexed_id")
    sigs.write.mode("overwrite").parquet(path)


def _est_jaccard(num_hashes: int) -> F.Column:
    """Fraction of agreeing components between the batch row's sig_i
    and the index row's isig_i."""
    agree = sum(
        F.when(F.col(f"sig_{i}") == F.col(f"isig_{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    )
    return agree.cast("double") / F.lit(float(num_hashes))


def _check_bloom_params(
    meta: dict, num_hashes: int, band_size: int
) -> None:
    """A sidecar built under different MinHash/banding parameters
    computes DIFFERENT band keys — every probe would miss, silently
    emptying ``batch_keys`` and admitting every near-duplicate (a
    false-negative path the no-false-negatives contract forbids).
    Fail loudly instead."""
    if (
        meta.get("num_hashes") != num_hashes
        or meta.get("band_size") != band_size
    ):
        raise ValueError(
            "bloom sidecar parameter mismatch: sidecar has "
            f"num_hashes={meta.get('num_hashes')} "
            f"band_size={meta.get('band_size')}, caller passed "
            f"num_hashes={num_hashes} band_size={band_size}; "
            "probing with mismatched band keys would silently admit "
            "near-duplicates — rebuild the sidecar or fix the args"
        )


def neardup_against_index(
    df: DataFrame,
    path: str,
    threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = NUM_HASHES,
    band_size: int = BAND_SIZE,
    materialize: bool = True,
    bloom_path: str | None = None,
) -> DataFrame:
    """(batch columns…, content signature columns): the batch rows
    with NO indexed neighbor at estimated Jaccard ≥ ``threshold``.
    Does not mutate the index; pass the result to
    :func:`append_to_neardup_index` once durably admitted (the same
    two-step contract as ``dedup_index``).

    ``materialize=False`` returns the lazy plan (no signature persist
    or checkpoint — used by plan-shape tests and compositions that
    manage caching themselves).

    ``bloom_path`` (optional) is the band-key Bloom sidecar built by
    :func:`init_neardup_bloom_sidecar`: the batch's band keys probe
    the filter first, and only maybe-present keys restrict the index
    read — a mostly-new batch whose keys all miss never opens the
    signature index at all. No false negatives → the admission
    decision is IDENTICAL to the exact path (a band key the filter
    rules out cannot exist in the index, so it contributes no
    candidate either way); false positives only cost redundant exact
    verification."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"need 0 < threshold <= 1, got {threshold}")
    spark = df.sparkSession
    sigs = minhash_signatures(
        df, id_col=id_col, text_col=text_col, num_hashes=num_hashes
    )
    if materialize:
        sigs = sigs.persist()
        sigs.count()
    try:
        index = spark.read.parquet(path)
        isigs = index.select(
            "indexed_id",
            *[
                F.col(f"sig_{i}").alias(f"isig_{i}")
                for i in range(num_hashes)
            ],
        )
        batch_bands = lsh_band_keys(
            sigs, id_col=id_col, num_hashes=num_hashes, band_size=band_size
        )
        index_bands = lsh_band_keys(
            index.withColumnRenamed("indexed_id", "_iid"),
            id_col="_iid",
            num_hashes=num_hashes,
            band_size=band_size,
        )
        # The index must never shuffle on admission: the (small) batch
        # band keys broadcast INTO the index-band derivation as a
        # semi-filter, so the index is scan-only and the collided rows
        # (bounded by LSH bucket hits against one batch) broadcast
        # back — the same no-index-shuffle plan as dedup_index.
        batch_keys = batch_bands.select("band", "band_key").distinct()
        if bloom_path is not None:
            from minisql_engine_spark.operators.membership import (
                bloom_probe,
            )

            from .dedup_index import _bloom_meta, _bloom_words

            meta = _bloom_meta(bloom_path)
            _check_bloom_params(meta, num_hashes, band_size)
            probed = bloom_probe(
                batch_keys.select(_band_bloom_key().alias("key")),
                _bloom_words(spark, bloom_path, meta),
                "key",
                meta["n_bits"],
                meta["k"],
            )
            batch_keys = batch_keys.join(
                F.broadcast(
                    probed.filter(F.col("maybe_present")).select("key")
                ),
                _band_bloom_key() == F.col("key"),
                "left_semi",
            )
        index_hits = index_bands.join(
            F.broadcast(batch_keys), ["band", "band_key"], "left_semi"
        )
        candidates = (
            batch_bands.join(
                F.broadcast(index_hits), ["band", "band_key"]
            )
            .select(id_col, F.col("_iid").alias("indexed_id"))
            .distinct()
        )
        # signature fetch for the verify: again filter the corpus-
        # sized signature table by the (small) candidate id set before
        # any join
        cand_ids = candidates.select("indexed_id").distinct()
        isigs_hit = isigs.join(
            F.broadcast(cand_ids), "indexed_id", "left_semi"
        )
        rejected = (
            candidates.join(sigs, id_col)
            .join(F.broadcast(isigs_hit), "indexed_id")
            .filter(_est_jaccard(num_hashes) >= threshold)
            .select(id_col)
            .distinct()
        )
        # LEFT join: a doc with no shingles (empty/short text) has no
        # signature row — it carries NULL sigs, is never rejected
        # (nothing to collide with), and append skips indexing it.
        admitted = df.join(
            sigs.select(id_col, *_sig_cols(num_hashes), "n_sh"),
            id_col,
            "left",
        ).join(F.broadcast(rejected), id_col, "left_anti")
        # materialize before unpersist releases the signature cache
        out = admitted.localCheckpoint(eager=True) if materialize else admitted
    finally:
        if materialize:
            sigs.unpersist()
    return out


def append_to_neardup_index(
    admitted: DataFrame,
    path: str,
    id_col: str = "doc_id",
    num_hashes: int = NUM_HASHES,
) -> None:
    """Append admitted docs' signatures (new files only); shingle-less
    docs (NULL sigs) are admitted but have nothing to index."""
    (
        admitted.filter(F.col("sig_0").isNotNull())
        .select(
            F.col(id_col).alias("indexed_id"),
            *_sig_cols(num_hashes),
            "n_sh",
        )
        .write.mode("append")
        .parquet(path)
    )


def compact_neardup_index(
    spark: SparkSession, path: str, n_partitions: int = 1
) -> tuple[int, int]:
    """Rewrite the signature store compacted (duplicate signature
    rows from replayed appends collapsed — harmless for decisions,
    which ask band-key existence, but each sliver is a listing/footer
    cost every admission pays); returns (files_before, files_after).
    Decisions cannot change: the candidate join depends on the
    distinct signature content only. SINGLE-WRITER, NO CONCURRENT
    ADMISSION — the shared :mod:`._compaction` contract (exclusive
    lock file, listing-verify swap abort, two-rename swap). The
    Bloom sidecar is generation-dir'd separately and unaffected."""
    from ._compaction import compact_swap

    def stage(staged: str) -> None:
        (
            spark.read.parquet(path)
            .distinct()
            .repartition(n_partitions)
            .write.mode("overwrite")
            .parquet(staged)
        )

    return compact_swap(path, stage, "neardup index")


def neardup_index_stats(spark: SparkSession, path: str) -> DataFrame:
    """(n_docs,): indexed corpus size."""
    return (
        spark.read.parquet(path)
        .agg(F.countDistinct("indexed_id").cast("bigint").alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# Bloom sidecar over BAND KEYS: skip the index read for mostly-new batches
# ---------------------------------------------------------------------------
#
# The near-dup twin of dedup_index's sidecar (same generation-dir +
# atomic-meta machinery, reused from there): the filter holds the
# index's LSH band keys (~10 bits per (doc, band) vs 32 hex chars), so
# a batch whose band keys all miss admits without a single index byte
# read — the mostly-new common case at 100 TB. Consistency contract is
# identical: the sidecar advances BEFORE the index in the same
# admission step (a lagging sidecar would hide indexed band keys and
# re-admit near-dups; an ahead sidecar only adds false positives).


def _band_bloom_key() -> F.Column:
    """The sidecar key for a (band, band_key) row — one string, so
    the probe is the shared single-key bloom machinery."""
    return F.concat_ws(":", F.col("band").cast("string"), F.col("band_key"))


def _index_band_keys(
    index: DataFrame, num_hashes: int, band_size: int
) -> DataFrame:
    bands = lsh_band_keys(
        index.withColumnRenamed("indexed_id", "_iid"),
        id_col="_iid",
        num_hashes=num_hashes,
        band_size=band_size,
    )
    return bands.select(_band_bloom_key().alias("key")).distinct()


def init_neardup_bloom_sidecar(
    spark: SparkSession,
    index_path: str,
    bloom_path: str,
    n_bits: int = 1 << 20,
    k: int = 5,
    num_hashes: int = NUM_HASHES,
    band_size: int = BAND_SIZE,
) -> None:
    """Build the band-key sidecar from the current signature index
    (one scan; sizing: n_bits ≈ 10 × expected (doc, band) rows)."""
    import os as _os

    from minisql_engine_spark.operators.membership import bloom_build

    from .dedup_index import _write_bloom_meta

    _os.makedirs(bloom_path, exist_ok=True)
    keys = _index_band_keys(
        spark.read.parquet(index_path), num_hashes, band_size
    )
    bloom_build(keys, "key", n_bits, k).write.mode("overwrite").parquet(
        _os.path.join(bloom_path, "gen-1")
    )
    _write_bloom_meta(
        bloom_path,
        {
            "n_bits": n_bits,
            "k": k,
            "gen": 1,
            "num_hashes": num_hashes,
            "band_size": band_size,
        },
    )


def append_to_neardup_index_with_bloom(
    admitted: DataFrame,
    path: str,
    bloom_path: str,
    id_col: str = "doc_id",
    num_hashes: int = NUM_HASHES,
) -> None:
    """One admission step advances BOTH structures, sidecar first
    (the dedup_index ordering argument verbatim: an ahead sidecar is
    harmless false positives; a lagging one re-admits near-dups —
    and the admitted lineage may re-read the prior sidecar
    generation, so old gens are swept only after the index append)."""
    import os as _os
    import shutil

    from minisql_engine_spark.operators.membership import (
        bloom_build,
        bloom_merge,
    )

    from .dedup_index import (
        _bloom_meta,
        _bloom_words,
        _write_bloom_meta,
    )

    meta = _bloom_meta(bloom_path)
    # band_size comes FROM the sidecar meta here; only the caller's
    # num_hashes can disagree with what the sidecar was built under
    if meta.get("num_hashes") != num_hashes:
        raise ValueError(
            "bloom sidecar parameter mismatch: sidecar has "
            f"num_hashes={meta.get('num_hashes')}, caller passed "
            f"{num_hashes}; appending mixed-parameter band keys would "
            "poison the sidecar — rebuild it or fix the args"
        )
    spark = admitted.sparkSession
    new_keys = _index_band_keys(
        admitted.filter(F.col("sig_0").isNotNull()).select(
            F.col(id_col).alias("indexed_id"), *_sig_cols(num_hashes)
        ),
        num_hashes,
        meta["band_size"],
    )
    merged = bloom_merge(
        _bloom_words(spark, bloom_path, meta),
        bloom_build(new_keys, "key", meta["n_bits"], meta["k"]),
    )
    new_gen = meta["gen"] + 1
    merged.write.mode("overwrite").parquet(
        _os.path.join(bloom_path, f"gen-{new_gen}")
    )
    _write_bloom_meta(bloom_path, {**meta, "gen": new_gen})
    append_to_neardup_index(admitted, path, id_col, num_hashes)
    for entry in _os.listdir(bloom_path):
        if entry.startswith("gen-") and entry != f"gen-{new_gen}":
            shutil.rmtree(
                _os.path.join(bloom_path, entry), ignore_errors=True
            )
