"""Tokenizer→packer closed loop — pack by REAL BPE token counts:
oracle parity over the corpus (the apply-identity chain grouped to
counts, then the packing twin), mass conservation (every BPE token
lands in exactly one piece), and the fertility gap vs whitespace
packing (subword counts exceed word counts, so budgets differ)."""

from __future__ import annotations

from pyspark.sql import functions as F

from minisql_engine_spark.operators.bpe import bpe_apply_trie
from minisql_engine_spark.operators.packing import (
    bpe_pack_sequences,
    bpe_pack_sequences_sql,
    pack_sequences,
)
from minisql_engine_spark.sources.parquet_catalog import load_table
from tests.conftest import assert_matches_oracle

_MERGES = [("t", "h"), ("th", "e"), ("a", "n"), ("an", "d"),
           ("i", "n"), ("o", "n")]
_CAP = 64


def test_bpe_pack_oracle(spark, duck, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    out = bpe_pack_sequences(docs, _MERGES, _CAP)
    assert_matches_oracle(
        out,
        duck.execute(
            bpe_pack_sequences_sql("documents", _MERGES, _CAP)
        ).df(),
        "bpe_pack",
    )


def test_bpe_pack_mass_conservation(spark, sf_dir):
    """Σ piece_tokens per doc == that doc's trie token count, and
    every sequence except each shard's last is exactly full."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    out = bpe_pack_sequences(docs, _MERGES, _CAP).toPandas()
    counts = (
        bpe_apply_trie(docs, _MERGES)
        .select("doc_id", F.size("bpe_tokens").alias("n"))
        .toPandas()
        .set_index("doc_id")
        .n
    )
    per_doc = out.groupby("doc_id").piece_tokens.sum().astype("int64")
    assert per_doc.equals(
        counts.loc[per_doc.index]
        .rename("piece_tokens")
        .astype("int64")
    )
    # full sequences: every (shard, seq) except the shard max holds
    # exactly _CAP tokens
    per_seq = out.groupby(["shard", "seq_id"]).piece_tokens.sum()
    last = out.groupby("shard").seq_id.max()
    for (shard, seq), tot in per_seq.items():
        if seq != last[shard]:
            assert tot == _CAP, (shard, seq, tot)


def test_bpe_counts_differ_from_whitespace(spark, sf_dir):
    """The loop exists because subword counts ≠ word counts: the BPE
    packing needs MORE sequences than whitespace packing on the same
    corpus (fertility > 1), so a whitespace-budgeted pipeline
    under-fills real token budgets."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    ws = pack_sequences(docs, _CAP).toPandas()
    bpe = bpe_pack_sequences(docs, _MERGES, _CAP).toPandas()
    assert bpe.n_tokens.sum() > ws.n_tokens.sum()
    n_seq_ws = ws.groupby("shard").seq_id.max().add(1).sum()
    n_seq_bpe = bpe.groupby("shard").seq_id.max().add(1).sum()
    assert n_seq_bpe > n_seq_ws
