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


# ---------------------------------------------------------------------------
# Streaming LLM-curation funnel (r6): quality gate + frozen-LM buckets
# + durable-index admission per micro-batch
# ---------------------------------------------------------------------------
#
# The foreachBatch twin of the batch curation front end. Stages are
# either stateless (gate, frozen-model scoring — the CCNet production
# shape: model + tercile thresholds trained once on a reference
# corpus, so every micro-batch buckets against the SAME thresholds)
# or keyed on durable state (dedup-index admission), which is why
# streaming the corpus in N micro-batches admits exactly the content
# the one-shot batch run admits (content-for-content pin +
# replay-admits-nothing + audit-sum equality in
# tests/test_streaming_curate.py).

from minisql_engine_spark.operators.dedup_index import (  # noqa: E402
    append_to_index,
    dedup_against_index,
)
from minisql_engine_spark.operators.lm_score import (  # noqa: E402
    lm_score_frozen,
)
from minisql_engine_spark.operators.quality_rules import (  # noqa: E402
    quality_rule_report,
)


def curate_batch_frozen(
    docs: DataFrame,
    model_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    report: DataFrame | None = None,
) -> DataFrame:
    """The stateless front of the funnel under the frozen model:
    quality gate → frozen-LM scoring → tail tercile dropped. Shared
    verbatim by the one-shot batch path and every micro-batch (the
    batch≡stream guarantee is this sharing, not a re-implementation).
    Returns the input columns + (n_tokens_lm, ppl, bucket).

    ``report`` optionally supplies a precomputed
    ``quality_rule_report(docs)`` so a caller that also needs the
    per-rule verdicts (the micro-batch audit) evaluates the rule
    projection once, not twice."""
    if report is None:
        report = quality_rule_report(docs, id_col, text_col)
    gated = docs.join(
        report.filter("passes_all").select(id_col),
        id_col,
    )
    scored = lm_score_frozen(gated, model_path, id_col, text_col)
    return gated.join(
        scored.filter(F.col("bucket") != "tail").select(
            id_col, "n_tokens_lm", "ppl", "bucket"
        ),
        id_col,
    )


def stream_curate_funnel(
    stream_docs: DataFrame,
    model_path: str,
    index_path: str,
    out_path: str,
    audit_path: str,
    checkpoint_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Start (availableNow) the streaming curation query; returns the
    StreamingQuery. The index must already exist
    (``init_dedup_index``, possibly on an empty frame); the frozen
    model comes from ``save_lm_model``. Audit rows land one-per-
    micro-batch at ``audit_path``: (batch_id, n_input,
    n_quality_pass, n_ppl_kept, n_admitted, admitted_tokens).

    Delivery: foreachBatch is at-least-once — a crash after the
    output write but before the checkpoint commit re-runs the SAME
    batch_id. Both sinks are therefore batch_id-keyed partition
    directories written with overwrite (a retry replaces its own
    batch's rows, never appends beside them), so output content is
    exactly-once even though execution is at-least-once. The index
    append stays idempotent by content (re-presented hashes are
    already indexed). Readers `spark.read.parquet(out_path)` and see
    a discovered ``batch_id`` partition column alongside the data
    columns."""

    def curate(batch_df: DataFrame, batch_id: int) -> None:
        curate_micro_batch(
            batch_df,
            batch_id,
            model_path,
            index_path,
            out_path,
            audit_path,
            id_col,
            text_col,
        )

    return (
        stream_docs.writeStream.foreachBatch(curate)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def curate_micro_batch(
    batch_df: DataFrame,
    batch_id: int,
    model_path: str,
    index_path: str,
    out_path: str,
    audit_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """One micro-batch of the funnel — module-level so the retry
    contract is directly testable. This is exactly what
    stream_curate_funnel's foreachBatch runs.

    Retry idempotence: the batch's output partition is the DECISION
    RECORD. On first run the survivors are computed and committed to
    ``out_path/batch_id=N``; a retry of the same batch_id finds the
    committed partition and re-reads it instead of recomputing —
    because after the index append the same computation would yield
    EMPTY (the index now rejects the batch's own content) and an
    overwrite would silently erase the batch's output. Downstream
    steps (index append, audit) derive from the record, so every
    crash window re-converges: index re-append of the same keys is
    documented-harmless (existence-only anti-join), and the audit
    partition overwrite replaces itself."""
    import os as _os

    batch_df = batch_df.persist()
    report = quality_rule_report(batch_df, id_col, text_col).persist()
    kept = curate_batch_frozen(
        batch_df, model_path, id_col, text_col, report=report
    ).persist()
    out_dir = _os.path.join(out_path, f"batch_id={int(batch_id)}")
    committed = _os.path.exists(_os.path.join(out_dir, "_SUCCESS"))
    survivors = (
        batch_df.sparkSession.read.parquet(out_dir)
        if committed
        else dedup_against_index(
            kept, index_path, id_col=id_col, text_col=text_col
        )
    ).persist()
    try:
        if not committed:
            survivors.write.mode("overwrite").parquet(out_dir)
        # audit stats BEFORE the index append: the survivors
        # lineage contains the anti-join against the index and
        # would re-execute to EMPTY once the index has advanced
        # (the same ordering hazard the Bloom sidecar documents).
        # All five audit numbers come from ONE action: the three
        # single-row aggregates (rule report, ppl-kept, survivors —
        # each persisted above, so no stage recomputes) cross-join
        # into the one audit row and write directly, replacing three
        # driver collects + a literal-rebuild write with a single
        # job per micro-batch (guide §2.4: fewer actions). batch_id
        # still travels as the partition directory (discovered on
        # read), not a data column — the overwrite keys on it.
        audit = (
            report.agg(
                F.count("*").cast("bigint").alias("n_input"),
                F.coalesce(
                    F.sum(F.col("passes_all").cast("int")), F.lit(0)
                )
                .cast("bigint")
                .alias("n_quality_pass"),
            )
            .crossJoin(
                kept.agg(
                    F.count("*").cast("bigint").alias("n_ppl_kept")
                )
            )
            .crossJoin(
                survivors.agg(
                    F.count("*").cast("bigint").alias("n_admitted"),
                    F.coalesce(F.sum("n_tokens_lm"), F.lit(0))
                    .cast("bigint")
                    .alias("admitted_tokens"),
                )
            )
        )
        audit.coalesce(1).write.mode("overwrite").parquet(
            _os.path.join(audit_path, f"batch_id={int(batch_id)}")
        )
        append_to_index(survivors, index_path)
    finally:
        survivors.unpersist()
        kept.unpersist()
        report.unpersist()
        batch_df.unpersist()
