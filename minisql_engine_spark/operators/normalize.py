"""Unicode text normalization — the zeroth step of multilingual
corpus curation.

Web text mixes composed and decomposed codepoint sequences ("é" as
U+00E9 vs "e"+U+0301), compatibility ligatures ("ﬁ"), fullwidth
forms, and assorted invisible characters; every downstream
content-hash, n-gram, and dedup decision silently fragments unless
the corpus is normalized FIRST (two visually identical documents with
different codepoint sequences get different md5s). This module is the
Spark-side normalizer:

* :func:`normalize_text` — NFC/NFKC/NFD/NFKD via ``unicodedata`` in
  Arrow ``mapInPandas`` batches (Spark has no built-in Unicode
  normalization; this is exactly the "Python only in vectorized
  batch form" contract);
* ``strip_controls=True`` additionally removes the invisible
  troublemakers (zero-width space/joiner/non-joiner, BOM, soft
  hyphen, C0/C1 controls except \\t \\n \\r) — the fastText /
  CCNet-style cleanup;
* :func:`normalize_text_sql` — DuckDB oracle twin for the NFC form
  (DuckDB ships ``nfc_normalize``), so the workhorse configuration
  is hash-verifiable engine-to-engine; the other forms are
  pytest-verified against ``unicodedata`` directly.

Scale: pure map-side (no shuffle), Arrow-batched; at 100 TB this is
one pass fused with ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Invisible characters removed by ``strip_controls`` (beyond C0/C1).
_INVISIBLES = (
    "​"  # zero-width space
    "‌"  # zero-width non-joiner
    "‍"  # zero-width joiner
    "⁠"  # word joiner
    "﻿"  # BOM / zero-width no-break space
    "­"  # soft hyphen
)


def _clean(s: str) -> str:
    return "".join(
        ch
        for ch in s
        if ch not in _INVISIBLES
        and (ch in "\t\n\r" or not (ord(ch) < 32 or 127 <= ord(ch) < 160))
    )


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_norm",
    form: str = "NFC",
    strip_controls: bool = False,
) -> DataFrame:
    """All input columns + ``out_col`` = the Unicode-normalized text.
    ``form`` ∈ NFC | NFKC | NFD | NFKD; NULL text stays NULL."""
    import unicodedata

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, StringType())]
    )

    def run(batches):
        for pdf in batches:
            out = []
            for s in pdf[text_col]:
                if s is None:
                    out.append(None)
                    continue
                t = unicodedata.normalize(form, s)
                if strip_controls:
                    t = _clean(t)
                out.append(t)
            pdf = pdf.copy()
            pdf[out_col] = out
            yield pdf

    return df.mapInPandas(run, schema)


def normalize_text_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "text_norm",
) -> str:
    """DuckDB oracle twin of the NFC configuration (no control
    stripping): ``nfc_normalize`` is DuckDB's implementation of the
    same Unicode normalization ``unicodedata.normalize('NFC', …)``
    performs."""
    return (
        f"SELECT {id_col}, CASE WHEN {text_col} IS NULL THEN NULL"
        f" ELSE nfc_normalize({text_col}) END AS {out_col}"
        f" FROM {table}"
    )
