"""SQL front door: reference-dialect shim over ``spark.sql``.

The reference parses a tiny SQL subset with a pyparsing grammar
(``sqlengine.py:12-74``, operator O3). Catalyst's ANSI parser strictly
supersedes it, so the engine's SQL front door is ``spark.sql`` plus
this ~50-line *textual* shim for the two non-ANSI forms the reference
accepts (SURVEY §7.1 front door 2):

* ``select distinct(C) from t``  →  ``select distinct C from t``
  (single-column form only; the multi-column zip form is
  non-relational — SURVEY Q8 — and raises a clear error);
* ``--`` line comments and a trailing ``;`` are stripped (the
  reference tolerates both, ``sqlengine.py:60-66``);
* everything else passes through verbatim — aggregates
  ``max/min/sum/avg(col)``, the word comparators, mixed case all
  already parse in Spark SQL (``avg`` alias ``average`` is rewritten).

No custom parser, no plan rewriting: Catalyst does binding
(unknown/ambiguous columns → AnalysisException, reference O4/O22),
optimization and execution.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_DISTINCT_CALL = re.compile(r"\bdistinct\s*\(\s*([A-Za-z_][\w.]*)\s*\)", re.I)
_AVERAGE_CALL = re.compile(r"\baverage\s*\(", re.I)


class DialectError(ValueError):
    """Raised for reference-dialect forms with no relational meaning."""


def _strip_comments(query: str) -> str:
    """Remove ``--`` line comments, respecting single-quoted string
    literals (a ``--`` inside '...' is data, not a comment)."""
    out: list[str] = []
    in_str = False
    i, n = 0, len(query)
    while i < n:
        ch = query[i]
        if in_str:
            out.append(ch)
            if ch == "'":
                if i + 1 < n and query[i + 1] == "'":  # escaped ''
                    out.append("'")
                    i += 1
                else:
                    in_str = False
        elif ch == "'":
            in_str = True
            out.append(ch)
        elif ch == "-" and i + 1 < n and query[i + 1] == "-":
            while i < n and query[i] != "\n":
                i += 1
            out.append(" ")
            continue
        else:
            out.append(ch)
        i += 1
    return "".join(out)


def _dialect_distinct_calls(q: str) -> list[re.Match]:
    """``distinct(col)`` occurrences in reference-dialect position —
    i.e. as a SELECT-list item (preceded by ``select`` or a comma),
    NOT nested inside another call like ``count(distinct(x))``, which
    is valid ANSI and must pass through untouched."""
    hits = []
    for m in _DISTINCT_CALL.finditer(q):
        before = q[: m.start()].rstrip()
        if before.lower().endswith("select") or before.endswith(","):
            hits.append(m)
    return hits


def rewrite_query(query: str) -> str:
    """Rewrite a reference-dialect query into ANSI Spark SQL."""
    q = _strip_comments(query).strip().rstrip(";").strip()
    q = _AVERAGE_CALL.sub("avg(", q)  # sqlengine.py:631 alias

    matches = _dialect_distinct_calls(q)
    if len(matches) > 1:
        # select distinct(a), distinct(b) — the reference zips
        # per-column distinct lists (sqlengine.py:662-678), which is
        # not a relation. Refuse loudly (SURVEY §7.4 policy).
        raise DialectError(
            "multi-column distinct(a), distinct(b) has no relational "
            "meaning; issue one DISTINCT query per column instead"
        )
    if matches:
        m = matches[0]
        q = q[: m.start()] + f"DISTINCT {m.group(1)}" + q[m.end():]
    return q


def run_sql(spark: SparkSession, query: str) -> DataFrame:
    """Execute a reference-dialect or ANSI SQL string."""
    return spark.sql(rewrite_query(query))
