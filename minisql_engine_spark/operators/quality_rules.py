"""Named quality-rule gate — Gopher-style document filtering.

``text.with_quality_score`` blends signals into one number; real
curation pipelines instead apply NAMED pass/fail rules so every drop
is attributable and per-rule hit rates are monitorable (the Gopher
paper's §A.1.1 filter list — Rae et al. 2021, public preprint — and
C4's heuristics are the canonical examples). This module evaluates a
configurable rule set as one map-side projection and reports both the
per-document verdict and the corpus-level per-rule failure counts.

Default rules (thresholds are constructor parameters; the defaults
are Gopher's scaled to the test corpus's short documents):

  word_count      min_words ≤ n_tokens ≤ max_words
  mean_word_len   3 ≤ (chars−spaces)/n_tokens ≤ 10
  symbol_ratio    non-alnum-non-space chars / chars ≤ 0.1
  alpha_ratio     tokens containing a letter / tokens ≥ 0.8
  stopword_hits   ≥ min_stop_hits English stopword occurrences

Exactness: every rule is an integer count + at most one division,
compared after the portable ``fx6`` round (integer ratios DO land
on exact scaled-half ties — e.g. 1/128 → 7812.5e-6 — the class the
package round policy exists for; see operators/portable_round.py)
— so the
boolean verdicts replay bit-for-bit in the DuckDB oracle.

Plan shape: ``quality_rule_report`` is a single Project over the scan
(zero shuffles, whole-stage codegen — the ideal curation-stage shape,
same as pii_redaction); ``quality_rule_summary`` adds one single-row
aggregate (map-side partials) for the monitoring counters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from minisql_engine_spark.operators.portable_round import fx6 as _fx6

from minisql_engine_spark.operators.text import LANG_MARKERS, _ws_tokens

MIN_WORDS = 10
MAX_WORDS = 10_000
MIN_STOP_HITS = 2

_RULES = (
    "r_word_count",
    "r_mean_word_len",
    "r_symbol_ratio",
    "r_alpha_ratio",
    "r_stopword_hits",
)


#: (id_col, text_col, thresholds) -> the built Column list. Columns
#: are immutable name-based expression trees, safe to reuse across
#: DataFrames; building them costs ~0.1 s of py4j round-trips and a
#: streaming funnel calls this once per micro-batch (r9 profile).
_REPORT_COLS: dict = {}


def quality_rule_report(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = MIN_WORDS,
    max_words: int = MAX_WORDS,
    min_stop_hits: int = MIN_STOP_HITS,
) -> DataFrame:
    """(doc_id, n_tokens_q, r_* booleans ×5, passes_all) — the named
    pass/fail verdict per document. NULL text fails every rule (and
    ``passes_all``) rather than dropping, so the gate's output keeps
    corpus cardinality — a filter stage must account for every row."""
    key = (id_col, text_col, min_words, max_words, min_stop_hits)
    memo = _REPORT_COLS.get(key)
    if memo is not None:
        return docs.select(*memo)
    text = F.col(text_col)
    # coalesce the ARRAY (not the size): size(NULL) is -1 under
    # Spark's legacy sizeOfNull, so a NULL document would leak a
    # negative count through coalesce-on-size
    toks = F.coalesce(
        _ws_tokens(text), F.array().cast("array<string>")
    )
    n_tokens = F.size(toks).cast("bigint")
    n_chars = F.coalesce(F.length(text), F.lit(0)).cast("bigint")
    n_sym = F.coalesce(
        F.size(F.regexp_extract_all(text, F.lit(r"[^A-Za-z0-9\s]"), 0)),
        F.lit(0),
    ).cast("bigint")
    n_alpha_tok = F.coalesce(
        F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))), F.lit(0)
    ).cast("bigint")
    n_stop = F.coalesce(
        F.size(
            F.regexp_extract_all(
                F.lower(text), F.lit(LANG_MARKERS["en"]), 0
            )
        ),
        F.lit(0),
    ).cast("bigint")
    safe_tokens = F.greatest(n_tokens, F.lit(1))
    mean_wl = _fx6(
        (n_chars - (n_tokens - 1)).cast("double") / safe_tokens
    )
    sym_ratio = _fx6(
        n_sym.cast("double") / F.greatest(n_chars, F.lit(1))
    )
    alpha_ratio = _fx6(n_alpha_tok.cast("double") / safe_tokens)

    rules = {
        "r_word_count": (n_tokens >= min_words)
        & (n_tokens <= max_words),
        "r_mean_word_len": (n_tokens > 0)
        & (mean_wl >= 3.0)
        & (mean_wl <= 10.0),
        "r_symbol_ratio": (n_chars > 0) & (sym_ratio <= 0.1),
        "r_alpha_ratio": (n_tokens > 0) & (alpha_ratio >= 0.8),
        "r_stopword_hits": n_stop >= min_stop_hits,
    }
    passes = None
    for c in rules.values():
        passes = c if passes is None else (passes & c)
    cols = [
        F.col(id_col),
        n_tokens.alias("n_tokens_q"),
        *[c.alias(n) for n, c in rules.items()],
        passes.alias("passes_all"),
    ]
    _REPORT_COLS[key] = cols
    return docs.select(*cols)


def quality_rule_summary(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kw,
) -> DataFrame:
    """One row: total docs, per-rule failure counts, and the pass
    count — the monitoring surface a curation run records per batch."""
    rep = quality_rule_report(docs, id_col, text_col, **kw)
    aggs = [F.count("*").cast("bigint").alias("n_docs")]
    for r in _RULES:
        aggs.append(
            F.sum(F.when(~F.col(r), 1).otherwise(0))
            .cast("bigint")
            .alias(f"fail_{r[2:]}")
        )
    aggs.append(
        F.sum(F.when(F.col("passes_all"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_pass")
    )
    return rep.agg(*aggs)


def _rules_sql(
    text_col: str,
    min_words: int,
    max_words: int,
    min_stop_hits: int,
) -> str:
    """Shared rule-expression CTE body for the oracle twins."""
    stop_re = LANG_MARKERS["en"]
    return (
        f" m AS (SELECT *, CASE WHEN trim({text_col}) IS NULL"
        f"   OR trim({text_col}) = '' THEN 0"
        f"   ELSE len(string_split(regexp_replace(lower(trim({text_col})),"
        "    '\\s+', ' ', 'g'), ' ')) END AS n_tokens,"
        f"  CAST(COALESCE(len({text_col}), 0) AS BIGINT) AS n_chars,"
        f"  CAST(COALESCE(len(regexp_extract_all({text_col},"
        "   '[^A-Za-z0-9\\s]')), 0) AS BIGINT) AS n_sym,"
        "  CASE WHEN trim({t}) IS NULL OR trim({t}) = '' THEN 0"
        "   ELSE len([x for x in string_split(regexp_replace("
        "    lower(trim({t})), '\\s+', ' ', 'g'), ' ')"
        "    if regexp_matches(x, '[A-Za-z]')]) END AS n_alpha_tok,"
        f"  CAST(COALESCE(len(regexp_extract_all(lower({text_col}),"
        f"   '{stop_re}')), 0) AS BIGINT) AS n_stop"
        "  FROM {{table}}),"
        " r AS (SELECT *,"
        "  floor(CAST(n_chars - (n_tokens - 1) AS DOUBLE)"
        "   / greatest(n_tokens, 1) * 1e6 + 0.5) / 1e6 AS mean_wl,"
        "  floor(CAST(n_sym AS DOUBLE) / greatest(n_chars, 1)"
        "   * 1e6 + 0.5) / 1e6 AS sym_ratio,"
        "  floor(CAST(n_alpha_tok AS DOUBLE) / greatest(n_tokens, 1)"
        "   * 1e6 + 0.5) / 1e6 AS alpha_ratio FROM m),"
        " v AS (SELECT *,"
        f"  n_tokens >= {min_words} AND n_tokens <= {max_words}"
        "   AS r_word_count,"
        "  n_tokens > 0 AND mean_wl >= 3.0 AND mean_wl <= 10.0"
        "   AS r_mean_word_len,"
        "  n_chars > 0 AND sym_ratio <= 0.1 AS r_symbol_ratio,"
        "  n_tokens > 0 AND alpha_ratio >= 0.8 AS r_alpha_ratio,"
        f"  n_stop >= {min_stop_hits} AS r_stopword_hits FROM r)"
    ).format(t=text_col)


def quality_rule_report_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = MIN_WORDS,
    max_words: int = MAX_WORDS,
    min_stop_hits: int = MIN_STOP_HITS,
) -> str:
    """DuckDB oracle twin of :func:`quality_rule_report`."""
    body = _rules_sql(text_col, min_words, max_words, min_stop_hits)
    return (
        "WITH" + body.replace("{table}", table) + f" SELECT {id_col},"
        " CAST(n_tokens AS BIGINT) AS n_tokens_q,"
        " r_word_count, r_mean_word_len, r_symbol_ratio,"
        " r_alpha_ratio, r_stopword_hits,"
        " r_word_count AND r_mean_word_len AND r_symbol_ratio"
        "  AND r_alpha_ratio AND r_stopword_hits AS passes_all"
        " FROM v"
    )


def quality_rule_summary_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = MIN_WORDS,
    max_words: int = MAX_WORDS,
    min_stop_hits: int = MIN_STOP_HITS,
) -> str:
    """DuckDB oracle twin of :func:`quality_rule_summary`."""
    body = _rules_sql(text_col, min_words, max_words, min_stop_hits)
    fails = ", ".join(
        f"CAST(sum(CASE WHEN NOT {r} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS fail_{r[2:]}"
        for r in _RULES
    )
    return (
        "WITH" + body.replace("{table}", table)
        + " SELECT CAST(count(*) AS BIGINT) AS n_docs, "
        + fails
        + ", CAST(sum(CASE WHEN r_word_count AND r_mean_word_len"
        "  AND r_symbol_ratio AND r_alpha_ratio AND r_stopword_hits"
        "  THEN 1 ELSE 0 END) AS BIGINT) AS n_pass"
        " FROM v"
    )
