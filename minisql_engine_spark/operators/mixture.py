"""Token-budget mixture sampling — compose a training corpus from
weighted sources.

Pretraining corpora are mixtures: "15% code, 30% web, 5% books …" of a
TOKEN budget, not a row budget (docs vary 100×+ in length, so row-rate
sampling badly misses token targets). Given per-source weights and a
total token budget, this operator deterministically selects documents
until each source's token allowance is filled:

1. Each doc gets a **priority** = ``md5(seed:doc_id)`` — the decision-
   hash idiom of ``operators/sampling.py``: a reproducible shuffle
   order with no RNG state, stable under re-runs, re-partitions, AQE
   re-plans, and replayable by the SQL oracle.
2. Within each source, docs are taken in priority order while the
   exclusive running token sum is below the source's allowance
   ``floor(weight · budget)`` — i.e. the straddling doc is KEPT, so
   every source with enough data lands within one document of its
   target (never a silent undershoot).
3. Output carries the audit trail: per-doc token count, the running
   total, and the allowance it was admitted under.

Scale: one shuffle (hash partition on ``source``) and a per-source
window sort on the 8-byte priority prefix — sources sort independently
across executors, nothing global. A very large single source is the
same regime as any window sort at scale: its partition spills, or you
pre-shard the source key upstream. The selection itself adds no joins,
no driver state, and no second scan.

Reference scope: corpus-mixture composition is a §2.4 training-
pipeline addition (the reference engine, sqlengine.py:1-753, has no
corpus operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .sampling import sample_hash, sample_hash_sql
from .packing import WS_COUNT_SQL
from .text import _ws_tokens


def _allowances(
    weights: dict[str, float], token_budget: int
) -> dict[str, int]:
    if not weights:
        raise ValueError("weights must not be empty")
    bad = [s for s, w in weights.items() if w < 0]
    if bad:
        raise ValueError(f"negative weights for {bad}")
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    return {
        s: int(w / total * token_budget) for s, w in weights.items()
    }


def mixture_sample(
    docs: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "mixture",
    priority_col: str | None = None,
) -> DataFrame:
    """Deterministically select docs per source up to
    ``floor(weight/Σweights · token_budget)`` tokens (straddler kept;
    see module docstring). Sources absent from ``weights`` are
    dropped. Returns ``(source, doc_id, n_tokens, cum_tokens,
    allowance_tokens)`` for every selected doc.

    ``priority_col`` switches admission from pure md5 order to
    quality-first: docs fill each source's allowance in
    (priority DESC NULLS LAST, md5, id) order — the composition point
    for DSIR importance weights or quality scores ("spend the token
    budget on the best-scored documents first"). The md5 stays as the
    deterministic tie-break, so equal-priority docs keep the unbiased
    hash order."""
    allow = _allowances(weights, int(token_budget))
    expr = None
    for s in sorted(allow):
        cond = F.col(source_col) == s
        expr = (
            F.when(cond, F.lit(allow[s]))
            if expr is None
            else expr.when(cond, F.lit(allow[s]))
        )
    alloc = expr.otherwise(F.lit(None).cast("bigint"))

    pri_cols = (
        [F.col(priority_col).cast("double").alias("_pri")]
        if priority_col is not None
        else []
    )
    base = docs.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("doc_id"),
        F.size(_ws_tokens(F.col(text_col))).cast("bigint").alias("n_tokens"),
        alloc.alias("allowance_tokens"),
        *pri_cols,
    ).filter(F.col("allowance_tokens").isNotNull())

    order = [sample_hash(F.col("doc_id"), seed), F.col("doc_id")]
    if priority_col is not None:
        # explicit NULLS LAST: Spark's DESC default matches DuckDB's,
        # but the contract should not hinge on two engines' defaults
        order = [F.col("_pri").desc_nulls_last()] + order
    w = (
        Window.partitionBy("source")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return (
        base.select(
            "source",
            "doc_id",
            "n_tokens",
            cum.alias("cum_tokens"),
            "allowance_tokens",
        )
        .filter(
            F.col("cum_tokens") - F.col("n_tokens")
            < F.col("allowance_tokens")
        )
    )


def mixture_sample_sql(
    table: str,
    weights: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "mixture",
    priority_col: str | None = None,
) -> str:
    """DuckDB oracle twin of :func:`mixture_sample`."""
    allow = _allowances(weights, int(token_budget))
    case = " ".join(
        f"WHEN '{s}' THEN CAST({allow[s]} AS BIGINT)"
        for s in sorted(allow)
    )
    pri = sample_hash_sql(id_col, seed)
    n_tok = WS_COUNT_SQL.format(text=text_col)
    return (
        "WITH b AS ("
        f" SELECT {source_col} AS source, {id_col} AS doc_id,"
        f"  {n_tok} AS n_tokens,"
        f"  CASE {source_col} {case} ELSE NULL END AS allowance_tokens,"
        f"  {pri} AS pri"
        + (
            f", CAST({priority_col} AS DOUBLE) AS qpri"
            if priority_col is not None
            else ""
        )
        + f" FROM {table}),"
        " c AS ("
        "  SELECT source, doc_id, n_tokens,"
        "   CAST(sum(n_tokens) OVER (PARTITION BY source"
        "    ORDER BY "
        + ("qpri DESC NULLS LAST, " if priority_col is not None else "")
        + "pri, doc_id ROWS UNBOUNDED PRECEDING)"
        "    AS BIGINT) AS cum_tokens,"
        "   allowance_tokens"
        "  FROM b WHERE allowance_tokens IS NOT NULL)"
        " SELECT source, doc_id, n_tokens, cum_tokens, allowance_tokens"
        " FROM c WHERE cum_tokens - n_tokens < allowance_tokens"
    )


def mixture_report(selected: DataFrame) -> DataFrame:
    """Per-source audit over :func:`mixture_sample` output:
    ``(source, n_docs, tokens_kept, allowance_tokens, overshoot_tokens)``
    — ``overshoot`` is the straddling doc's spill past the allowance
    (0 when the source ran out of data first)."""
    kept = F.max("cum_tokens")
    return selected.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        kept.alias("tokens_kept"),
        F.max("allowance_tokens").alias("allowance_tokens"),
        F.greatest(
            F.lit(0).cast("bigint"),
            kept - F.max("allowance_tokens"),
        ).alias("overshoot_tokens"),
    )


def mixture_report_sql(
    table: str,
    weights: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "mixture",
) -> str:
    """DuckDB twin of :func:`mixture_report` over the
    :func:`mixture_sample_sql` pipeline."""
    inner = mixture_sample_sql(
        table, weights, token_budget, source_col, id_col, text_col, seed
    )
    return (
        f"WITH sel AS ({inner})"
        " SELECT source, count(*) AS n_docs,"
        "  max(cum_tokens) AS tokens_kept,"
        "  max(allowance_tokens) AS allowance_tokens,"
        "  CAST(greatest(0, max(cum_tokens) - max(allowance_tokens))"
        "   AS BIGINT) AS overshoot_tokens"
        " FROM sel GROUP BY source"
    )
