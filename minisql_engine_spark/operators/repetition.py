"""Repetition quality signals — the Gopher/MassiveText rule family.

Rae et al. (Gopher, 2021) and subsequent open datasets (RefinedWeb,
FineWeb, Dolma) filter web documents on INTRA-document repetition:
boilerplate pages repeat lines, template farms repeat paragraphs,
and degenerate generations repeat n-grams. This module computes the
standard signals per document, exactly and DuckDB-replayably — the
repetition sibling of ``operators/quality_rules`` (length/symbol/
stopword rules), ready to AND into a curation gate. (Reference
scope note: ``sqlengine.py`` has no text analysis; extension,
SURVEY §2.4 quality family.)

Signals (all exact integer ratios through the portable ``fx6``
edge — integer ratios are the tie-prone rational class of
``operators/portable_round.py``):

  ``dup_line_frac``        duplicated lines / lines — a line is
                           duplicated when its (trimmed) text occurs
                           more than once; the fraction counts EVERY
                           occurrence of such lines (the Gopher
                           definition), so a page of one repeated
                           line scores 1.0.
  ``dup_line_char_frac``   characters inside duplicated lines /
                           total line characters — weighs long
                           boilerplate heavier than short one-liners.
  ``top_ngram_frac``       occurrences of the document's most
                           frequent word n-gram / total n-gram
                           occurrences (n = ``top_n``, default 2) —
                           the "top n-gram mass" degeneracy signal;
                           ties broken lexicographically smallest so
                           both engines pick the same winner.
  ``dup_ngram_frac``       occurrences beyond the first of every
                           repeated word n-gram / total n-gram
                           occurrences (n = ``dup_n``, default 5) —
                           Gopher's "duplicate 5-gram fraction".

NULL/empty semantics: a document with no lines (NULL/blank text)
emits 0 lines and NULL fractions (not 0.0 — "no evidence" must not
pass a `frac <= threshold` gate silently); likewise too-short
documents emit NULL n-gram fractions. Every row of the input
survives to the output (the quality_rules cardinality contract).

Plan shape (scale notes): lines and n-grams explode ONCE each into
(doc, token) rows; per-(doc, unit) counts are hash aggregates with
map-side partials; the per-doc reductions are second hash
aggregates. Nothing is quadratic, nothing collects, state is
per-document-vocabulary-sized. At 100 TB this is two explode +
aggregate pipelines over the corpus — the same shape as the
certified tf-idf/LM scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from minisql_engine_spark.operators.portable_round import (
    fx6 as _fx6,
    fx6_sql as _fx6_sql,
)
from minisql_engine_spark.operators.text import _norm_text, _ws_tokens


def repetition_report(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 2,
    dup_n: int = 5,
) -> DataFrame:
    """(id, n_lines, dup_line_frac, dup_line_char_frac,
    top_ngram_frac, dup_ngram_frac) — see module docstring."""
    from minisql_engine_spark.fanout import fan_out

    # one shared fanned-out (id, text) slice: the line split and both
    # n-gram branches are map-heavy and all inherited the single-
    # row-group scan's one task (guide §2.5; no-op at scale, see
    # fanout.py). All branches read the SAME exchange (ReusedExchange).
    base = fan_out(docs.select(F.col(id_col), F.col(text_col)))
    ids = base.select(F.col(id_col)).distinct()

    # --- line-level signals ------------------------------------------------
    lines = (
        base.select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), r"\n")).alias("_l0"),
        )
        .select(F.col(id_col), F.trim(F.col("_l0")).alias("line"))
        .filter(F.col("line") != "")
    )
    per_line = lines.groupBy(id_col, "line").agg(
        F.count("*").cast("bigint").alias("c"),
        F.length("line").cast("bigint").alias("chars"),
    )
    line_stats = per_line.groupBy(id_col).agg(
        F.sum("c").cast("bigint").alias("n_lines"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("dup_lines"),
        F.sum(F.col("c") * F.col("chars")).cast("bigint").alias("n_chars"),
        F.sum(
            F.when(F.col("c") > 1, F.col("c") * F.col("chars")).otherwise(
                0
            )
        )
        .cast("bigint")
        .alias("dup_chars"),
    )

    # --- n-gram signals ----------------------------------------------------
    def ngram_stats(n: int, top: bool) -> DataFrame:
        toks = base.select(
            F.col(id_col),
            _ws_tokens(_norm_text(F.col(text_col))).alias("_t"),
        ).filter(F.size("_t") >= n)
        grams = toks.select(
            F.col(id_col),
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(1), F.size("_t") - F.lit(n - 1)
                    ),
                    lambda i: F.array_join(
                        F.slice(F.col("_t"), i, n), " "
                    ),
                )
            ).alias("g"),
        )
        per_g = grams.groupBy(id_col, "g").agg(
            F.count("*").cast("bigint").alias("c")
        )
        if top:
            # the winner's SHARE only depends on max(c), so ties need
            # no winner choice at all — group the max-count rows away
            mx = per_g.groupBy(id_col).agg(
                F.max("c").alias("_mc"),
                F.sum("c").cast("bigint").alias("_tot"),
            )
            return (
                per_g.join(mx, id_col)
                .filter(F.col("c") == F.col("_mc"))
                .groupBy(id_col, "_mc", "_tot")
                .agg(F.min("g").alias("_g"))
                .select(
                    F.col(id_col),
                    _fx6(
                        F.col("_mc").cast("double")
                        / F.col("_tot").cast("double")
                    ).alias("top_ngram_frac"),
                )
            )
        return per_g.groupBy(id_col).agg(
            _fx6(
                F.sum(
                    F.when(F.col("c") > 1, F.col("c") - 1).otherwise(0)
                ).cast("double")
                / F.sum("c").cast("double")
            ).alias("dup_ngram_frac")
        )

    top_stats = ngram_stats(top_n, top=True)
    dup_stats = ngram_stats(dup_n, top=False)

    return (
        ids.join(line_stats, id_col, "left")
        .join(top_stats, id_col, "left")
        .join(dup_stats, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_lines"), F.lit(0))
            .cast("bigint")
            .alias("n_lines"),
            F.when(
                F.col("n_lines") > 0,
                _fx6(
                    F.col("dup_lines").cast("double")
                    / F.col("n_lines").cast("double")
                ),
            ).alias("dup_line_frac"),
            F.when(
                F.col("n_chars") > 0,
                _fx6(
                    F.col("dup_chars").cast("double")
                    / F.col("n_chars").cast("double")
                ),
            ).alias("dup_line_char_frac"),
            F.col("top_ngram_frac"),
            F.col("dup_ngram_frac"),
        )
    )


def repetition_report_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 2,
    dup_n: int = 5,
) -> str:
    """DuckDB oracle twin of :func:`repetition_report` — identical
    line trimming, tokenization, n-gram windows, tie-breaks, and fx6
    edges, term for term."""
    norm = (
        f"regexp_replace(lower(trim({text_col})), '\\s+', ' ', 'g')"
    )

    def gram_cte(tag: str, n: int) -> str:
        return (
            f"{tag}_tok AS (SELECT {id_col},"
            f"  string_split({norm}, ' ') AS t FROM {table}"
            f"  WHERE trim({text_col}) <> ''"
            f"   AND len(string_split({norm}, ' ')) >= {n}),"
            f" {tag}_g AS (SELECT {id_col},"
            f"  array_to_string(t[i : i + {n - 1}], ' ') AS g"
            f"  FROM (SELECT {id_col}, t,"
            f"   unnest(range(1, len(t) - {n - 2})) AS i"
            f"   FROM {tag}_tok)),"
            f" {tag}_pg AS (SELECT {id_col}, g,"
            f"  CAST(count(*) AS BIGINT) AS c FROM {tag}_g"
            f"  GROUP BY {id_col}, g)"
        )

    return (
        f"WITH ids AS (SELECT DISTINCT {id_col} FROM {table}),"
        f" lines0 AS (SELECT {id_col},"
        f"  trim(unnest(string_split({text_col}, chr(10)))) AS line"
        f"  FROM {table}),"
        " pl AS (SELECT"
        f"  {id_col}, line, CAST(count(*) AS BIGINT) AS c,"
        "  CAST(len(line) AS BIGINT) AS chars"
        f"  FROM lines0 WHERE line <> '' GROUP BY {id_col}, line),"
        " ls AS (SELECT"
        f"  {id_col},"
        "  CAST(sum(c) AS BIGINT) AS n_lines,"
        "  CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)"
        "   AS dup_lines,"
        "  CAST(sum(c * chars) AS BIGINT) AS n_chars,"
        "  CAST(sum(CASE WHEN c > 1 THEN c * chars ELSE 0 END)"
        "   AS BIGINT) AS dup_chars"
        f"  FROM pl GROUP BY {id_col}),"
        + gram_cte("tg", top_n)
        + ","
        + gram_cte("dg", dup_n)
        + ","
        " tmx AS (SELECT"
        f"  {id_col}, max(c) AS mc, CAST(sum(c) AS BIGINT) AS tot"
        f"  FROM tg_pg GROUP BY {id_col}),"
        " ts AS (SELECT"
        f"  p.{id_col},"
        f"  {_fx6_sql('CAST(m.mc AS DOUBLE) / CAST(m.tot AS DOUBLE)')}"
        "   AS top_ngram_frac"
        f"  FROM tg_pg p JOIN tmx m ON m.{id_col} = p.{id_col}"
        "   AND p.c = m.mc"
        f"  GROUP BY p.{id_col}, m.mc, m.tot),"
        " ds AS (SELECT"
        f"  {id_col},"
        + _fx6_sql(
            "CAST(sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END)"
            " AS DOUBLE) / CAST(sum(c) AS DOUBLE)"
        )
        + "   AS dup_ngram_frac"
        f"  FROM dg_pg GROUP BY {id_col})"
        " SELECT"
        f"  ids.{id_col},"
        "  COALESCE(ls.n_lines, 0) AS n_lines,"
        "  CASE WHEN ls.n_lines > 0 THEN "
        + _fx6_sql(
            "CAST(ls.dup_lines AS DOUBLE) / CAST(ls.n_lines AS DOUBLE)"
        )
        + " END AS dup_line_frac,"
        "  CASE WHEN ls.n_chars > 0 THEN "
        + _fx6_sql(
            "CAST(ls.dup_chars AS DOUBLE) / CAST(ls.n_chars AS DOUBLE)"
        )
        + " END AS dup_line_char_frac,"
        "  ts.top_ngram_frac,"
        "  ds.dup_ngram_frac"
        " FROM ids"
        f" LEFT JOIN ls ON ls.{id_col} = ids.{id_col}"
        f" LEFT JOIN ts ON ts.{id_col} = ids.{id_col}"
        f" LEFT JOIN ds ON ds.{id_col} = ids.{id_col}"
    )
