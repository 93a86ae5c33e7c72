"""Cross-split contamination detection (benchmark decontamination).

Evaluation integrity requires that held-out documents share no long
n-gram spans with the training split — the decontamination step of
the large-LM training literature (n-gram overlap between corpus and
benchmarks). This operator measures exactly that between any two
splits of a corpus:

1. each document explodes into its distinct word ``n``-grams, carried
   as md5 HASHES — the shuffle moves 32-hex keys, never text spans;
2. train-side grams deduplicate corpus-wide (one hash aggregate) —
   the join side is the distinct training vocabulary of n-grams, not
   per-document occurrences;
3. an equi-join on the gram hash counts, per eval document, how many
   of its distinct n-grams also appear anywhere in train; documents
   exceeding ``max_overlap`` are the contamination report.

Scale: both sides shuffle once on the gram hash (uniform by
construction — md5); the train side is bounded by vocabulary, not
corpus size; no pairwise document comparison ever happens (contrast
MinHash near-dup: this is containment-against-a-SET, which an
equi-join answers directly).

Choice of n: 8-grams (the common published choice ranges 8-13) —
long enough that a collision implies copied text, short enough to
catch partial quotes. Deterministic, oracle-replayable (same
tokenization as the dedup stack, md5 gram keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from minisql_engine_spark.operators.text import _norm_text, _ws_tokens

DEFAULT_N = 8


def _gram_hashes(
    docs: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, gram) — md5 of each DISTINCT word n-gram per document."""
    from minisql_engine_spark.fanout import fan_out

    # tokenize + one md5 per n-gram position is the dominant map
    # stage — fan the (id, text) projection out so it runs on every
    # core instead of the single-row-group scan's one task (guide
    # §2.5; no-op at scale, see fanout.py)
    toked = fan_out(docs.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col),
        _ws_tokens(_norm_text(F.col(text_col))).alias("_t"),
    )
    grams = toked.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size("_t") >= n,
                F.array_distinct(
                    F.transform(
                        F.sequence(
                            F.lit(1), F.size("_t") - F.lit(n - 1)
                        ),
                        lambda i: F.md5(
                            F.array_join(F.slice("_t", i, n), " ")
                        ),
                    )
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gram"),
    )
    return grams


def cross_split_contamination(
    docs: DataFrame,
    split_col: str = "split",
    train_split: str = "train",
    eval_split: str = "test",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_N,
    max_overlap: int = 0,
) -> DataFrame:
    """(doc_id, n_grams, n_contaminated, contamination_ratio) for
    every eval-split document whose distinct-``n``-gram overlap with
    the ENTIRE train split exceeds ``max_overlap``. Empty result =
    clean eval set."""
    train_grams = (
        _gram_hashes(
            docs.filter(F.col(split_col) == train_split), id_col, text_col, n
        )
        .select("gram")
        .distinct()
    )
    eval_grams = _gram_hashes(
        docs.filter(F.col(split_col) == eval_split), id_col, text_col, n
    # two consumers (the train semi-join + the per-doc totals) — lazy
    # checkpoint so the eval gram build runs once; the first
    # consumer's job materializes the blocks (guide §5/§2.4)
    ).localCheckpoint(eager=False)
    hits = eval_grams.join(train_grams, "gram", "left_semi")
    per_doc = eval_grams.groupBy(id_col).agg(
        F.count("*").alias("n_grams")
    )
    contaminated = hits.groupBy(id_col).agg(
        F.count("*").alias("n_contaminated")
    )
    return (
        per_doc.join(contaminated, id_col, "left")
        .select(
            id_col,
            "n_grams",
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            (
                F.coalesce("n_contaminated", F.lit(0)).cast("double")
                / F.col("n_grams")
            ).alias("contamination_ratio"),
        )
        .filter(F.col("n_contaminated") > max_overlap)
        .orderBy(F.col("contamination_ratio").desc(), id_col)
    )
