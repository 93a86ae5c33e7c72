"""Corpus-wide line-level deduplication — the C4 / CCNet rule.

Web-scale corpora repeat LINES far more than whole documents:
boilerplate navigation, cookie banners, license headers, forum
signatures. C4 (Raffel et al. 2020, public preprint) deduplicates at
the line granularity — any line occurring more than once in the
corpus is kept at its FIRST occurrence and removed everywhere else —
and CCNet (Wenzek et al. 2020) dedups paragraphs by hash the same
way. This module is that operator over a DataFrame corpus:

1. explode documents into (doc, pos, line) instances,
2. hash each line's trimmed content (md5 — the `dedup.py` key rule),
3. per hash, ONE partial-aggregatable groupBy computes the corpus
   count and the first owner ``min(struct(doc, pos))`` — a window
   (`row_number` per hash) would sort every occurrence group and die
   on hot boilerplate lines with millions of instances; min-struct
   combines map-side and is skew-immune,
4. an instance survives iff its line is blank (always kept), rarer
   than ``min_count``, or it IS the first occurrence,
5. survivors reassemble per document in original line order, with
   per-doc audit counts.

Scale shape: two corpus shuffles (instances→hash for the join,
survivors→doc for reassembly) plus the hash-keyed aggregate —
exactly the C4 pipeline's MapReduce shape; nothing is collected,
nothing is quadratic, hot lines cost one combiner cell each.

Reference scope: ``sqlengine.py:1-753`` has no corpus surface;
extension, SURVEY §2.4 dedup family (sits beside ``dedup.py``'s
whole-document keys and ``span_dedup.py``'s k-gram spans: line
granularity is the boilerplate-removal point between them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def line_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """(doc_id, n_lines, n_kept, cleaned_text) — the corpus after
    duplicate-line removal. A line instance is dropped iff its
    trimmed content occurs ``min_count``-or-more times corpus-wide
    AND this instance is not the first occurrence (first = smallest
    (doc, pos) — the deterministic keep-first rule). Blank lines are
    structural, not content: always kept. Documents that lose every
    line still appear, with ``n_kept = 0`` and empty text."""
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    lines = docs.select(
        F.col(id_col).alias("_d"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias(
            "pos", "line"
        ),
    )
    keyed = lines.withColumn("lh", F.md5(F.trim(F.col("line"))))
    content = keyed.filter(F.trim(F.col("line")) != "")
    stats = content.groupBy("lh").agg(
        F.count("*").alias("_n"),
        F.min(
            F.struct(F.col("_d").alias("d"), F.col("pos").alias("p"))
        ).alias("_own"),
    )
    kept = (
        keyed.join(stats, "lh", "left")
        .filter(
            F.col("_n").isNull()  # blank: excluded from stats
            | (F.col("_n") < min_count)
            | (
                (F.col("_own.d") == F.col("_d"))
                & (F.col("_own.p") == F.col("pos"))
            )
        )
        .groupBy("_d")
        .agg(
            F.count("*").cast("bigint").alias("n_kept"),
            # per-group collect is DOCUMENT-bounded (one doc's kept
            # lines), never corpus-bounded — same rail as the other
            # per-record assembly sites
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col("pos"), F.col("line"))
                        )
                    ),
                    lambda s: s["line"],
                ),
            ).alias("cleaned_text"),
        )
    )
    totals = lines.groupBy("_d").agg(
        F.count("*").cast("bigint").alias("n_lines")
    )
    return (
        totals.join(kept, "_d", "left")
        .select(
            F.col("_d").alias(id_col),
            "n_lines",
            F.coalesce(F.col("n_kept"), F.lit(0).cast("bigint")).alias(
                "n_kept"
            ),
            F.coalesce(F.col("cleaned_text"), F.lit("")).alias(
                "cleaned_text"
            ),
        )
    )


def line_dedup_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
) -> str:
    """DuckDB oracle twin of :func:`line_dedup`. The first-owner rule
    replays as a per-hash ``row_number`` (value-identical to the
    engine's skew-safe min-struct aggregate — both pick the smallest
    (doc, pos))."""
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    return (
        f"WITH ln AS (SELECT {id_col} AS d, ls.i - 1 AS pos,"
        f"  ls.line FROM {table},"
        f"  LATERAL (SELECT unnest(string_split({text_col}, chr(10)))"
        "   AS line, unnest(range(1, len(string_split("
        f"{text_col}, chr(10))) + 1)) AS i) ls),"
        " keyed AS (SELECT d, pos, line, md5(trim(line)) AS lh,"
        "  trim(line) = '' AS blank FROM ln),"
        " marked AS (SELECT d, pos, line, blank,"
        "  CASE WHEN blank THEN NULL ELSE count(*) OVER"
        "   (PARTITION BY CASE WHEN blank THEN NULL ELSE lh END)"
        "   END AS n,"
        "  CASE WHEN blank THEN NULL ELSE row_number() OVER"
        "   (PARTITION BY CASE WHEN blank THEN NULL ELSE lh END"
        "    ORDER BY d, pos) END AS rn"
        "  FROM keyed),"
        " kept AS (SELECT d, pos, line FROM marked"
        f"  WHERE blank OR n < {min_count} OR rn = 1),"
        " ka AS (SELECT d, CAST(count(*) AS BIGINT) AS n_kept,"
        "  string_agg(line, chr(10) ORDER BY pos) AS cleaned_text"
        "  FROM kept GROUP BY d),"
        " ta AS (SELECT d, CAST(count(*) AS BIGINT) AS n_lines"
        "  FROM ln GROUP BY d)"
        f" SELECT ta.d AS {id_col}, ta.n_lines,"
        "  COALESCE(ka.n_kept, 0) AS n_kept,"
        "  COALESCE(ka.cleaned_text, '') AS cleaned_text"
        " FROM ta LEFT JOIN ka ON ka.d = ta.d"
    )
