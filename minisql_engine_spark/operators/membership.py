"""Portable Bloom-filter membership index (approximate admission).

The reference engine (``sqlengine.py:1-753``) has no membership
surface; this is the approximate-admission structure a 100 TB ingest
pipeline puts in front of its exact dedup index
(``operators/dedup_index.py``): an exact md5-key index costs ~32 bytes
per document forever, while a Bloom filter at ~10 bits/key answers
"definitely new" for the overwhelmingly-common case with a bounded
false-positive rate — only maybe-present keys pay the exact index
lookup. The filter is a plain (word, bits) relation, so it broadcasts
into the batch scan and unions by ``bit_or`` (building shards
independently per partition and OR-merging is exactly the distributed
build).

Portability stance (the package rule): every hash position derives
from ``md5(key || ':' || i)`` through the hex→int bridge Spark
``conv(hex,16,10)`` ≡ DuckDB ``('0x'||hex)::BIGINT`` (the
``operators/hashvec.py`` pattern), so the DuckDB oracle replays the
filter bit-for-bit — no false negatives is a *theorem* of the
construction, and the driver hash-match proves both engines build the
same bitmap. Words are 32 bits wide (stored in BIGINT): every mask
``1 << bit`` stays positive, sidestepping DuckDB's overflow error on
``1::BIGINT << 63`` and any signed-shift divergence.

Plan shape: build = one explode(k) + one hash aggregate (map-side
partials; at most ``n_bits/32`` output rows). Probe = explode(k) +
broadcast-hash left join against the word relation + per-key
``bool_and`` re-collapse. Nothing corpus-sized ever sorts or
re-shuffles; the filter itself is the only broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Defaults sized for ~10 bits/key at the driver scales; both are
#: plain parameters — at 100 TB you size n_bits from the expected key
#: count (m ≈ 1.44·n·log2(1/fpr)) and keep k = ln2·m/n.
DEFAULT_N_BITS = 65536
DEFAULT_K = 5


def _positions(key: F.Column, i: F.Column, n_bits: int) -> F.Column:
    """Hash position i of ``key`` in [0, n_bits): 60 portable bits of
    md5, reduced mod n_bits. Positive on both engines."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(key, F.lit(":"), i.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    return h % F.lit(n_bits)


def bloom_build(
    keys: DataFrame,
    key_col: str = "key",
    n_bits: int = DEFAULT_N_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Build the (word, bits) Bloom relation over ``keys[key_col]``.

    ``word = pos // 32``, ``bits = bit_or(1 << (pos % 32))`` — a
    sparse bitmap of at most ``n_bits/32`` rows that unions with any
    other build over the same (n_bits, k) by ``bloom_merge``.
    """
    exploded = keys.select(
        F.col(key_col).alias("_key"),
        F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("_i"),
    )
    pos = exploded.select(
        _positions(F.col("_key"), F.col("_i"), n_bits).alias("_p")
    )
    # exact integer word/bit split (shiftright/bitwiseAND, never a
    # double divide — the operators/timeseries.py `div` lesson)
    return pos.groupBy(F.shiftright(F.col("_p"), 5).alias("word")).agg(
        F.bit_or(
            # pyspark's shiftleft only takes a literal shift — the
            # column-shift spelling goes through expr()
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_p % 32 AS INT))")
        ).alias("bits")
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two Bloom relations built with identical (n_bits, k):
    OR the words — the distributed / incremental build primitive."""
    return (
        a.unionByName(b)
        .groupBy("word")
        .agg(F.bit_or(F.col("bits")).alias("bits"))
    )


def bloom_probe(
    batch: DataFrame,
    bloom: DataFrame,
    key_col: str = "key",
    n_bits: int = DEFAULT_N_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Per input row: ``maybe_present`` = all k bits set.

    The Bloom relation broadcasts (≤ n_bits/32 rows by construction);
    a missing word row means those 32 bits are all zero. Never a
    false negative; false positives are the documented trade.
    """
    exploded = batch.withColumn(
        "_i", F.explode(F.array(*[F.lit(i) for i in range(k)]))
    ).withColumn("_p", _positions(F.col(key_col), F.col("_i"), n_bits))
    probed = exploded.join(
        F.broadcast(bloom),
        F.shiftright(F.col("_p"), 5) == F.col("word"),
        "left",
    ).withColumn(
        "_hit",
        F.expr(
            "(COALESCE(bits, CAST(0 AS BIGINT)) &"
            " shiftleft(CAST(1 AS BIGINT), CAST(_p % 32 AS INT))) != 0"
        ),
    )
    group_cols = [c for c in batch.columns]
    return probed.groupBy(*group_cols).agg(
        F.bool_and(F.col("_hit")).alias("maybe_present")
    )


def bloom_admission(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bits: int = DEFAULT_N_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """End-to-end admission demo over one documents table: index the
    content keys of the ``doc_id % 5 != 0`` slice, probe every
    document, and report per document whether the filter would route
    it to the exact index (``maybe_present``), whether it truly is
    indexed (``present``), and whether the filter paid a false
    positive. ``maybe_present AND NOT present`` rows are the only
    wasted exact-index lookups; ``NOT maybe_present`` rows skip the
    index entirely — guaranteed-correctly, which the oracle's
    bit-identical replay certifies."""
    key = F.md5(F.col(text_col))
    idx_keys = (
        docs.filter(F.col(id_col) % 5 != 0)
        .select(key.alias("key"))
        .distinct()
    )
    bloom = bloom_build(idx_keys, "key", n_bits, k)
    batch = docs.select(F.col(id_col), key.alias("key"))
    probed = bloom_probe(batch, bloom, "key", n_bits, k)
    return (
        probed.join(
            idx_keys.withColumn("_in", F.lit(True)), "key", "left"
        )
        .select(
            id_col,
            "maybe_present",
            F.coalesce(F.col("_in"), F.lit(False)).alias("present"),
            (
                F.col("maybe_present")
                & ~F.coalesce(F.col("_in"), F.lit(False))
            ).alias("is_false_positive"),
        )
        .orderBy(id_col)
    )


def _positions_sql(key_expr: str, i_expr: str, n_bits: int) -> str:
    return (
        f"(('0x' || substring(md5({key_expr} || ':' ||"
        f" CAST({i_expr} AS VARCHAR)), 1, 15))::BIGINT % {n_bits})"
    )


def bloom_admission_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bits: int = DEFAULT_N_BITS,
    k: int = DEFAULT_K,
) -> str:
    """DuckDB oracle twin of :func:`bloom_admission` — replays the
    identical md5-derived bitmap, masks, and probe."""
    ivals = ", ".join(f"({i})" for i in range(k))
    p = _positions_sql("key", "i", n_bits)
    return (
        f"WITH idx AS (SELECT DISTINCT md5({text_col}) AS key"
        f"  FROM {table} WHERE {id_col} % 5 <> 0),"
        f" hpos AS (SELECT {p} AS p FROM idx"
        f"  CROSS JOIN (VALUES {ivals}) t(i)),"
        " words AS (SELECT p // 32 AS word,"
        "  bit_or(1::BIGINT << CAST(p % 32 AS INTEGER)) AS bits"
        "  FROM hpos GROUP BY 1),"
        f" batch AS (SELECT {id_col}, md5({text_col}) AS key"
        f"  FROM {table}),"
        f" bh AS (SELECT {id_col}, key, {p} AS p FROM batch"
        f"  CROSS JOIN (VALUES {ivals}) t(i)),"
        f" probe AS (SELECT {id_col}, key,"
        "  bool_and((COALESCE(bits, 0)"
        "   & (1::BIGINT << CAST(p % 32 AS INTEGER))) <> 0)"
        "  AS maybe_present"
        "  FROM bh LEFT JOIN words ON words.word = bh.p // 32"
        f"  GROUP BY {id_col}, key)"
        f" SELECT p.{id_col}, p.maybe_present,"
        "  (i.key IS NOT NULL) AS present,"
        "  (p.maybe_present AND i.key IS NULL) AS is_false_positive"
        " FROM probe p LEFT JOIN idx i USING (key)"
        f" ORDER BY p.{id_col}"
    )
