"""Unigram language-model perplexity scoring (CCNet-style quality
bucketing).

The reference engine (``sqlengine.py:1-753``) has no statistical
quality surface; this implements the classic LM-filtering stage of a
pretraining pipeline (CCNet / Wenzek et al. 2020: score every document
under a language model, split the corpus into head/middle/tail
perplexity buckets, keep the head). A real pipeline scores with a
trained KenLM; the engine's job is the *distributed scoring and
bucketing plan*, which is identical for any factorized LM — so the
model here is a corpus-trained unigram LM whose probabilities are
themselves computed relationally, keeping the whole operator exact and
DuckDB-replayable (same stance as ``operators/tfidf.py`` vs HashingTF).

Model (Laplace-smoothed over the corpus's own vocabulary):

    p(t)   = (c(t) + 1) / (T + V)      c = corpus count, T = Σc,
                                       V = |vocabulary|
    H(d)   = −(1/n_d) Σ_{tokens of d} log2 p(t)   bits/token
    ppl(d) = 2^H(d)

Buckets: head / middle / tail at the corpus ppl terciles, computed with
the same portable interpolated-quantile arithmetic as
``operators/stats.exact_quantiles`` and applied via a single-row
broadcast join — NOT a global ``ntile`` window, which would funnel the
whole corpus through one partition at scale.

Plan shape: tokens explode once; c(t) is one token-keyed hash
aggregate; (T, V) a single-row aggregate off it; per-doc Σlog2 p joins
tokens→counts on token (Zipf-hot tokens are fine: the join fans out,
the per-doc aggregate re-collapses with map-side partials); tercile
thresholds are one sort-based percentile over the per-doc rows
(spillable ObjectHashAggregate, same as stats_quantiles) cross-joined
back as one broadcast row. No window over the full corpus, nothing
quadratic.

Float policy: round(6) at the comparison edges (package rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from minisql_engine_spark.operators.text import _norm_text, _ws_tokens


def lm_perplexity(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens_lm, xent_bits, ppl, bucket) for every
    document with ≥1 token — unigram-LM cross-entropy, perplexity,
    and head/middle/tail tercile bucket."""
    toks = docs.select(
        F.col(id_col),
        F.explode(_ws_tokens(_norm_text(F.col(text_col)))).alias("token"),
    )
    counts = toks.groupBy("token").agg(
        F.count("*").cast("bigint").alias("c")
    )
    totals = counts.agg(
        F.sum("c").cast("bigint").alias("t_total"),
        F.count("*").cast("bigint").alias("v_size"),
    )
    # log2 p(token) under Laplace smoothing; denominator rides the
    # broadcast single-row totals
    logp = F.log2(
        (F.col("c").cast("double") + F.lit(1.0))
        / (F.col("t_total") + F.col("v_size")).cast("double")
    )
    per = (
        toks.join(counts, "token")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_tokens_lm"),
            (-F.sum(logp) / F.count("*").cast("double")).alias("_h"),
        )
        .select(
            id_col,
            "n_tokens_lm",
            F.round(F.col("_h"), 6).alias("xent_bits"),
            F.round(F.pow(F.lit(2.0), F.col("_h")), 6).alias("ppl"),
        )
    )
    # tercile thresholds over the rounded ppl (portable interpolated
    # percentile — identical arithmetic to stats.exact_quantiles)
    thr = per.agg(
        F.expr("percentile(ppl, 0.3333333333333333)").alias("_t1"),
        F.expr("percentile(ppl, 0.6666666666666666)").alias("_t2"),
    )
    return per.crossJoin(F.broadcast(thr)).select(
        id_col,
        "n_tokens_lm",
        "xent_bits",
        "ppl",
        F.when(F.col("ppl") <= F.col("_t1"), F.lit("head"))
        .when(F.col("ppl") <= F.col("_t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def lm_perplexity_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB oracle twin of :func:`lm_perplexity` — same smoothing,
    same decomposition, same tercile arithmetic.

    DuckDB's ``quantile_cont`` uses the same ``lo + (hi-lo)·frac``
    linear interpolation as Spark's ``percentile`` (both at index
    ``p·(n-1)``), so the thresholds agree bit-for-bit on the already-
    rounded ppl values (the same pairing ``stats.exact_quantiles``
    oracle-verifies)."""
    return (
        f"WITH toks AS (SELECT {id_col}, unnest(string_split("
        f"  regexp_replace(lower(trim({text_col})), '\\s+', ' ', 'g'),"
        f"  ' ')) AS token FROM {table} WHERE trim({text_col}) <> ''),"
        " counts AS (SELECT token, CAST(count(*) AS BIGINT) AS c"
        "  FROM toks GROUP BY token),"
        " totals AS (SELECT CAST(sum(c) AS BIGINT) AS t_total,"
        "  CAST(count(*) AS BIGINT) AS v_size FROM counts),"
        f" per0 AS (SELECT {id_col},"
        "  CAST(count(*) AS BIGINT) AS n_tokens_lm,"
        "  -sum(log2((CAST(c AS DOUBLE) + 1.0)"
        "    / CAST(t_total + v_size AS DOUBLE)))"
        "   / CAST(count(*) AS DOUBLE) AS h"
        "  FROM toks JOIN counts USING (token) CROSS JOIN totals"
        f"  GROUP BY {id_col}),"
        f" per AS (SELECT {id_col}, n_tokens_lm,"
        "  round(h, 6) AS xent_bits,"
        "  round(power(2.0, h), 6) AS ppl FROM per0),"
        " thr AS (SELECT"
        "  quantile_cont(ppl, 0.3333333333333333) AS t1,"
        "  quantile_cont(ppl, 0.6666666666666666) AS t2 FROM per)"
        f" SELECT {id_col}, n_tokens_lm, xent_bits, ppl,"
        "  CASE WHEN ppl <= t1 THEN 'head'"
        "       WHEN ppl <= t2 THEN 'middle'"
        "       ELSE 'tail' END AS bucket"
        " FROM per CROSS JOIN thr"
    )
