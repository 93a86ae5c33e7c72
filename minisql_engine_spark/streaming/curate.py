"""Streaming corpus curation: the ingest-side of pipeline.curate_corpus.

A crawl drop-folder (or Kafka topic) of documents flows through the
SAME gates as the batch pipeline — token/quality filter, language
filter, PII redaction, exact dedup, deterministic split — as one
continuous streaming query. All gates are stateless map-side
projections, so the only stateful operator is the dedup:

* backfill / bounded-key mode (``within=None``):
  ``dropDuplicates`` on the content hash — state is the distinct-
  hash set (32 hex chars per distinct doc, not bodies);
* unbounded-ingest mode (``within='…'`` + an event-time column):
  ``dropDuplicatesWithinWatermark`` — state evicted as the watermark
  advances (see ``stream_dedup_events``).

Batch≡stream caveat, designed around: streaming dedup keeps the
FIRST-arriving copy, batch keeps the min-id copy — so which doc_id
survives is arrival-order-dependent. Every content-level decision is
therefore keyed on the CONTENT HASH, not the id: the split
assignment uses ``hash_split(key=content_hash)``, making (content,
split) pairs identical between batch and stream no matter which
physical copy survived (asserted in tests). This is the right rule
at 100 TB generally: content-addressed decisions are replay-stable;
id-addressed ones are not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the documents parquet (file source),
    schema taken from the batch read."""
    import hashlib
    import os
    import tempfile

    src = os.path.join(sf_dir, "documents.parquet")
    schema = spark.read.parquet(src).schema
    tag = hashlib.md5(src.encode()).hexdigest()[:12]
    stage = os.path.join(tempfile.gettempdir(), f"minisql_docstream_{tag}")
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "documents.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    return spark.readStream.schema(schema).parquet(stage)


def curate_stream(
    docs: DataFrame,
    text_col: str = "text",
    min_tokens: int = 20,
    langs: tuple[str, ...] | None = None,
    lang_col: str = "lang",
    redact: bool = True,
    split_fractions: dict[str, float] | None = None,
    seed: str = "curate",
) -> DataFrame:
    """Gate → redact → hash → dedup → split, batch/stream-unified:
    pass a static DataFrame and the identical plan runs in batch (the
    parity tests do exactly that). Returns (doc_id, text,
    n_ws_tokens, content_hash, split)."""
    from minisql_engine_spark.operators.redaction import redact_pii
    from minisql_engine_spark.operators.sampling import hash_split
    from minisql_engine_spark.operators.text import with_token_counts

    split_fractions = split_fractions or {
        "train": 0.8, "val": 0.1, "test": 0.1,
    }
    kept = with_token_counts(docs, text_col).filter(
        F.col("n_ws_tokens") >= min_tokens
    )
    if langs is not None:
        kept = kept.filter(F.col(lang_col).isin(*langs))
    if redact:
        kept = redact_pii(kept, text_col).drop(text_col).withColumnRenamed(
            "redacted", text_col
        )
    hashed = kept.withColumn(
        "content_hash",
        F.md5(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")),
    )
    deduped = hashed.dropDuplicates(["content_hash"])
    # content-addressed split — see module docstring
    return hash_split(
        deduped, "content_hash", split_fractions, seed=seed
    ).select("doc_id", text_col, "n_ws_tokens", "content_hash", "split")
