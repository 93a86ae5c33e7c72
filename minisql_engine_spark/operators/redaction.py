"""PII redaction for training-data curation.

Web-scale corpora leak emails, phone numbers, IP addresses, and
id-like digit runs; training pipelines scrub them BEFORE
tokenization. ``redact_pii`` rewrites the text column with typed
placeholder tokens (``<EMAIL>``, ``<IP>``, …) and reports per-pattern
hit counts, so the same pass that scrubs also feeds a PII-prevalence
dashboard and a "too much PII → drop the document" gate.

Pattern contract: every default regex is written in the common subset
of Java's regex (Spark) and RE2 (DuckDB) — character classes,
bounded repetition, word boundaries; no backreferences, no lookahead.
That keeps the operator oracle-verifiable byte-for-byte AND portable
to other engines. Patterns are ordered (email before phone, IP before
generic digit runs) and applied sequentially, so one span is consumed
by exactly one placeholder; counts are taken on the ORIGINAL text.

Scale: one map-side Project per document — chained
``regexp_replace`` + ``regexp_count`` JVM expressions inside
whole-stage codegen; no shuffle, no Python, composes with any scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (name, regex, placeholder) — order matters; see module docstring.
DEFAULT_PATTERNS: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ip",
        r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
        "<IP>",
    ),
    (
        "phone",
        r"\b[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}\b",
        "<PHONE>",
    ),
    (
        "idnum",  # long digit runs: account/card/ssn-ish
        r"\b[0-9]{9,16}\b",
        "<IDNUM>",
    ),
)


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: tuple[tuple[str, str, str], ...] = DEFAULT_PATTERNS,
    out_col: str = "redacted",
    count_prefix: str = "n_",
) -> DataFrame:
    """Adds ``out_col`` (scrubbed text), one ``n_<name>`` hit-count
    column per pattern, and ``n_pii_total``."""
    out = df
    redacted = F.col(text_col)
    total = F.lit(0).cast("bigint")
    for name, rx, token in patterns:
        n = F.regexp_count(F.col(text_col), F.lit(rx)).cast("bigint")
        out = out.withColumn(f"{count_prefix}{name}", n)
        total = total + n
        redacted = F.regexp_replace(redacted, rx, token)
    return out.withColumn(out_col, redacted).withColumn(
        "n_pii_total", total
    )


def redact_pii_sql(
    text_col: str = "text",
    patterns: tuple[tuple[str, str, str], ...] = DEFAULT_PATTERNS,
    count_prefix: str = "n_",
) -> str:
    """DuckDB SELECT-list twin of :func:`redact_pii` (counts +
    redacted + total) for oracle queries. DuckDB's
    ``regexp_replace(..., 'g')`` matches Spark's replace-all
    default; ``len(regexp_extract_all(...))`` is its regexp_count."""
    cols = []
    redacted = text_col
    totals = []
    for name, rx, token in patterns:
        rx_sql = rx.replace("'", "''")
        cols.append(
            f"CAST(len(regexp_extract_all({text_col}, '{rx_sql}'))"
            f" AS BIGINT) AS {count_prefix}{name}"
        )
        totals.append(
            f"len(regexp_extract_all({text_col}, '{rx_sql}'))"
        )
        redacted = f"regexp_replace({redacted}, '{rx_sql}', '{token}', 'g')"
    cols.append(f"{redacted} AS redacted")
    cols.append(f"CAST({' + '.join(totals)} AS BIGINT) AS n_pii_total")
    return ", ".join(cols)
