"""Corpus-wide line-level dedup (C4/CCNet rule) — oracle parity,
keep-first semantics, blank-line policy, and a Python replay."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from minisql_engine_spark.operators.line_dedup import (
    line_dedup,
    line_dedup_sql,
)
from minisql_engine_spark.sources.parquet_catalog import load_table
from tests.conftest import assert_matches_oracle

_STAGING_SQL = (
    "SELECT doc_id, concat_ws(chr(10), text,"
    " lead(text, 1) OVER w, lead(text, 2) OVER w) AS text"
    " FROM documents"
    " WINDOW w AS (PARTITION BY source ORDER BY doc_id)"
)


def _staged(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    return docs.select(
        F.col("doc_id"),
        F.concat_ws(
            "\n",
            F.col("text"),
            F.lead("text", 1).over(w),
            F.lead("text", 2).over(w),
        ).alias("text"),
    )


def test_line_dedup_oracle_staged_corpus(spark, duck, sf_dir):
    """The driver row's exact shape: staged boilerplate corpus (every
    text a line of up to 3 staged docs), full pipeline vs DuckDB."""
    out = line_dedup(_staged(spark, sf_dir))
    sql = (
        "WITH staged AS ("
        + _STAGING_SQL
        + "),"
        + line_dedup_sql(table="staged")[len("WITH ") :]
    )
    assert_matches_oracle(out, duck.execute(sql).df(), "line_dedup")


def test_line_dedup_crafted_semantics(spark, duck):
    """Pin the rule on a corpus where every branch is hand-checkable:
    first occurrence kept, later duplicates dropped, within-doc
    repeats collapse to the first, blanks always survive, all-dup
    docs stay with empty text."""
    rows = [
        (1, "alpha beta\ncommon line\n\ngamma"),
        (2, "common line\ndelta\nalpha beta"),
        (3, "common line\ncommon line\nunique here\n   "),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        line_dedup(df)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "n_lines": [4, 3, 4, 1],
            "n_kept": [4, 1, 2, 1],
            "cleaned_text": [
                "alpha beta\ncommon line\n\ngamma",
                "delta",
                "unique here\n   ",
                "",
            ],
        }
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # and the oracle agrees on the same crafted corpus
    duck.register("_line_crafted", pd.DataFrame(rows, columns=["doc_id", "text"]))
    exp = duck.execute(line_dedup_sql(table="_line_crafted")).df()
    assert_matches_oracle(line_dedup(df), exp, "line_dedup_crafted")


def test_line_dedup_python_replay(spark, sf_dir):
    """The engine's keep decisions equal a direct Python fold over the
    same staged lines — pins the RULE, not just cross-engine
    agreement."""
    staged = _staged(spark, sf_dir)
    rows = staged.orderBy("doc_id").collect()
    first: dict[str, tuple] = {}
    count: dict[str, int] = {}
    instances = []
    for r in rows:
        for pos, line in enumerate(r.text.split("\n")):
            key = line.strip()
            instances.append((r.doc_id, pos, key))
            if key != "":
                count[key] = count.get(key, 0) + 1
                first.setdefault(key, (r.doc_id, pos))
    kept = {}
    for d, pos, key in instances:
        ok = (
            key == ""
            or count[key] < 2
            or first[key] == (d, pos)
        )
        kept[d] = kept.get(d, 0) + (1 if ok else 0)
    got = {
        r["doc_id"]: r["n_kept"]
        for r in line_dedup(staged).collect()
    }
    assert got == kept


def test_line_dedup_rejects_min_count():
    with pytest.raises(ValueError, match="min_count"):
        line_dedup_sql(min_count=1)
