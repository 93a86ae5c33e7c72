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
_COMMENT = re.compile(r"--[^\n]*")


class DialectError(ValueError):
    """Raised for reference-dialect forms with no relational meaning."""


def rewrite_query(query: str) -> str:
    """Rewrite a reference-dialect query into ANSI Spark SQL."""
    q = _COMMENT.sub(" ", query).strip().rstrip(";").strip()
    q = _AVERAGE_CALL.sub("avg(", q)  # sqlengine.py:631 alias

    matches = _DISTINCT_CALL.findall(q)
    if len(matches) > 1:
        # select distinct(a), distinct(b) — the reference zips
        # per-column distinct lists (sqlengine.py:662-678), which is
        # not a relation. Refuse loudly (SURVEY §7.4 policy).
        raise DialectError(
            "multi-column distinct(a), distinct(b) has no relational "
            "meaning; issue one DISTINCT query per column instead"
        )
    if matches:
        q = _DISTINCT_CALL.sub(rf"DISTINCT \1", q, count=1)
    return q


def run_sql(spark: SparkSession, query: str) -> DataFrame:
    """Execute a reference-dialect or ANSI SQL string."""
    return spark.sql(rewrite_query(query))
