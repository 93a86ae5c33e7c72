"""Sequence packing — concat-and-chunk documents into fixed
token-budget training sequences.

LLM pretraining does not feed documents; it feeds fixed-length token
sequences. The standard transform (GPT-2/3, T5 "packing", Llama) is
concat-and-chunk: lay documents end-to-end in a deterministic order and
slice the stream every ``capacity`` tokens. A document whose tokens
straddle a boundary contributes a piece to each adjacent sequence.
This module computes the resulting (sequence, document, token-range)
assignment relationally — no tokenizer loop, no driver state.

Why not bin-packing (first-fit-decreasing)? FFD is inherently
sequential per bin and non-associative — it cannot be expressed as a
window/agg and would serialize at scale. Concat-and-chunk is what the
large pipelines actually run (zero padding waste except the final
sequence per shard), and it is pure window arithmetic:

1. **Shard** each doc by a hex prefix of ``md5(seed:doc_id)`` — the
   same decision-hash idiom as ``operators/sampling.py``, kept as a
   STRING so both engines avoid hex→int conversion. ``shard_chars``
   hex chars → ``16^shard_chars`` shards; at 100 TB use 3–4 chars
   (4096–65536 shards) so each shard's window sort is a few GB.
   Sequences are shard-local (cross-shard order is irrelevant to
   training — shards map 1:1 to output files), so the ONLY shuffle is
   the hash partition on ``shard``, and every shard packs
   independently on its own executor. Nothing global, nothing on the
   driver.
2. **Offset** = exclusive running sum of token counts within the shard
   (window ``sum - n_tokens``), ordered by ``doc_id`` for
   reproducibility.
3. **Slice**: doc spans sequences ``off div cap .. (off+n-1) div cap``
   — an ``F.sequence`` explode of at most ``ceil(n/cap)+1`` rows per
   doc; begin/end token offsets inside the doc are pure integer
   arithmetic, exact in both engines (no doubles anywhere).

Token counts use the whitespace tokenizer from ``operators/text.py``
(portable regex semantics); swap ``token_count_col`` in for a real BPE
count column when one exists upstream.

Reference scope: the reference engine (sqlengine.py:1-753) has no
corpus operators at all; this is a §2.4 training-pipeline addition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .text import _ws_tokens

#: Portable DuckDB twin of the whitespace token count.
WS_COUNT_SQL = (
    "CAST(CASE WHEN trim({text}) = '' THEN 0"
    " ELSE len(regexp_split_to_array(trim({text}), '\\s+')) END AS BIGINT)"
)


def pack_sequences(
    docs: DataFrame,
    capacity: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "pack",
    shard_chars: int = 1,
    count_col: str | None = None,
) -> DataFrame:
    """Assign every document's tokens to fixed-``capacity`` training
    sequences (concat-and-chunk; see module docstring).

    Returns one row per (document, sequence) piece:
    ``(shard, seq_id, doc_id, n_tokens, tok_begin, tok_end,
    piece_tokens)`` where ``[tok_begin, tok_end)`` is the half-open
    token range of the doc owned by shard-local sequence ``seq_id``.
    Empty documents produce no rows. Deterministic for a given seed:
    re-runs, re-partitions, and the SQL oracle agree byte-for-byte.

    ``count_col`` overrides the whitespace token count with a
    precomputed per-doc count column (e.g. real BPE counts — see
    :func:`bpe_pack_sequences`); ``text_col`` is then unused.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    cap = int(capacity)
    did = F.col(id_col)
    shard = F.substring(
        F.md5(F.concat(F.lit(f"{seed}:"), did.cast("string"))),
        1,
        shard_chars,
    )
    n_tok = (
        F.col(count_col).cast("bigint")
        if count_col is not None
        else F.size(_ws_tokens(F.col(text_col))).cast("bigint")
    )
    base = docs.select(
        did.alias("doc_id"),
        shard.alias("shard"),
        n_tok.alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)

    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    off = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("tok_off")
    placed = base.select("*", off)

    first_seq = F.expr(f"tok_off div {cap}")
    last_seq = F.expr(f"(tok_off + n_tokens - 1) div {cap}")
    pieces = placed.select(
        "*",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    seq = F.col("seq_id")
    tok_begin = F.greatest(F.lit(0).cast("bigint"), seq * cap - F.col("tok_off"))
    tok_end = F.least(
        F.col("n_tokens"), (seq + 1) * cap - F.col("tok_off")
    )
    return pieces.select(
        "shard",
        seq.alias("seq_id"),
        "doc_id",
        "n_tokens",
        tok_begin.alias("tok_begin"),
        tok_end.alias("tok_end"),
        (tok_end - tok_begin).alias("piece_tokens"),
    )


def pack_sequences_sql(
    table: str,
    capacity: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "pack",
    shard_chars: int = 1,
    count_sql: str | None = None,
) -> str:
    """DuckDB oracle twin of :func:`pack_sequences` — identical
    integer arithmetic, window, and explode. ``count_sql`` overrides
    the whitespace count expression (a column name or SQL expression
    over ``table``'s rows), mirroring ``count_col``."""
    cap = int(capacity)
    n_tok = (
        count_sql
        if count_sql is not None
        else WS_COUNT_SQL.format(text=text_col)
    )
    return (
        "WITH b AS ("
        f" SELECT {id_col} AS doc_id,"
        f"  substr(md5('{seed}:' || CAST({id_col} AS VARCHAR)), 1,"
        f"   {shard_chars}) AS shard,"
        f"  {n_tok} AS n_tokens"
        f" FROM {table}),"
        " o AS ("
        "  SELECT doc_id, shard, n_tokens,"
        "   sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id"
        "    ROWS UNBOUNDED PRECEDING) - n_tokens AS tok_off"
        "  FROM b WHERE n_tokens > 0),"
        " s AS ("
        "  SELECT doc_id, shard, n_tokens, tok_off,"
        f"   unnest(range(CAST(tok_off // {cap} AS BIGINT),"
        f"    CAST((tok_off + n_tokens - 1) // {cap} + 1 AS BIGINT)))"
        "   AS seq_id"
        "  FROM o)"
        " SELECT shard, seq_id, doc_id, n_tokens,"
        # sum() OVER yields HUGEINT in DuckDB — cast every derived
        # integer back to BIGINT so the hash compare sees identical
        # dtypes
        f"  CAST(greatest(0, seq_id * {cap} - tok_off) AS BIGINT)"
        "   AS tok_begin,"
        f"  CAST(least(n_tokens, (seq_id + 1) * {cap} - tok_off)"
        "   AS BIGINT) AS tok_end,"
        f"  CAST(least(n_tokens, (seq_id + 1) * {cap} - tok_off)"
        f"   - greatest(0, seq_id * {cap} - tok_off) AS BIGINT)"
        "   AS piece_tokens"
        " FROM s"
    )


def packing_stats(packed: DataFrame, capacity: int) -> DataFrame:
    """Per-shard packing summary over :func:`pack_sequences` output:
    ``(shard, n_seqs, n_docs, total_tokens, fill_ratio)``. Every
    sequence except each shard's last is exactly full by
    construction, so ``fill_ratio = total / (n_seqs · capacity)``
    measures only the final-sequence remainder — the packing waste a
    trainer would pad."""
    cap = int(capacity)
    return packed.groupBy("shard").agg(
        (F.max("seq_id") + 1).alias("n_seqs"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("piece_tokens").alias("total_tokens"),
        (
            F.sum("piece_tokens").cast("double")
            / ((F.max("seq_id") + 1) * cap)
        ).alias("fill_ratio"),
    )


def packing_stats_sql(
    table: str,
    capacity: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "pack",
    shard_chars: int = 1,
) -> str:
    """DuckDB twin of :func:`packing_stats` composed over the
    :func:`pack_sequences_sql` pipeline."""
    cap = int(capacity)
    inner = pack_sequences_sql(
        table, cap, id_col, text_col, seed, shard_chars
    )
    return (
        f"WITH packed AS ({inner})"
        " SELECT shard,"
        "  max(seq_id) + 1 AS n_seqs,"
        "  count(DISTINCT doc_id) AS n_docs,"
        "  CAST(sum(piece_tokens) AS BIGINT) AS total_tokens,"
        f"  CAST(sum(piece_tokens) AS DOUBLE)"
        f"   / ((max(seq_id) + 1) * {cap}) AS fill_ratio"
        " FROM packed GROUP BY shard"
    )


def write_training_shards(
    packed: DataFrame,
    path: str,
    capacity: int,
    mode: str = "overwrite",
) -> None:
    """Materialize :func:`pack_sequences` output as the layout a
    training job reads: parquet partitioned by ``shard`` (each shard
    is one pruneable directory — the unit a data-loader worker
    claims), rows sorted by (seq_id, tok_begin) within each file so a
    sequential read replays sequences in order, plus a ``_manifest``
    dataset (:func:`packing_stats` per shard: n_seqs, n_docs,
    total_tokens, fill_ratio) for loader scheduling and budget
    audits. One shuffle (the partitionBy write); the manifest is a
    16-row-ish aggregate. The packed table is persisted across the
    two actions so the packing pipeline (scan → shard shuffle →
    window → explode) runs once, not once per write."""
    packed = packed.persist()
    try:
        (
            packed.repartition("shard")
            .sortWithinPartitions("shard", "seq_id", "tok_begin")
            .write.mode(mode)
            .partitionBy("shard")
            .parquet(path)
        )
        (
            packing_stats(packed, capacity)
            .coalesce(1)
            .write.mode(mode)
            .parquet(path.rstrip("/") + "_manifest")
        )
    finally:
        packed.unpersist()


def read_training_shard(spark, path: str, shard: str) -> DataFrame:
    """One shard of a :func:`write_training_shards` layout — the
    ``shard=`` partition filter prunes every other directory at the
    source (verified via PartitionFilters in tests)."""
    return spark.read.parquet(path).filter(F.col("shard") == shard)


def bpe_pack_sequences(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    capacity: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "pack",
    shard_chars: int = 1,
) -> DataFrame:
    """The tokenizer→packer closed loop: pack by REAL subword token
    counts from the production trie BPE apply (:func:`bpe.
    bpe_apply_trie`) instead of the whitespace proxy — what a
    pretraining pipeline actually needs, since sequence budgets are
    spent in TOKENIZER tokens and whitespace counts under-fill
    capacity by the corpus fertility ratio (the quantity
    ``tokenizer_fertility_by_lang`` measures). One extra corpus pass
    (the Arrow trie apply + a per-doc count aggregate); the packing
    arithmetic, sharding, and determinism contract are unchanged."""
    from .bpe import bpe_apply_trie

    toks = bpe_apply_trie(docs.select(id_col, text_col), merges)
    counts = toks.select(
        F.col(id_col),
        F.size("bpe_tokens").cast("bigint").alias("_n_bpe"),
    )
    return pack_sequences(
        counts,
        capacity,
        id_col=id_col,
        seed=seed,
        shard_chars=shard_chars,
        count_col="_n_bpe",
    )


def bpe_pack_sequences_sql(
    table: str,
    merges: list[tuple[str, str]],
    capacity: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "pack",
    shard_chars: int = 1,
) -> str:
    """DuckDB twin of :func:`bpe_pack_sequences` — the apply-identity
    chain (``bpe_apply_sql``) grouped to per-doc counts, then the
    packing twin over the counted relation."""
    from .bpe import bpe_apply_sql

    counts = (
        f"(SELECT {id_col}, CAST(count(*) AS BIGINT) AS _n_bpe"
        f" FROM ({bpe_apply_sql(table, merges, id_col=id_col, text_col=text_col)})"
        f" GROUP BY {id_col})"
    )
    return pack_sequences_sql(
        counts,
        capacity,
        id_col=id_col,
        seed=seed,
        shard_chars=shard_chars,
        count_sql="_n_bpe",
    )
