"""Cross-split contamination detection."""

from __future__ import annotations

from pyspark.sql import SparkSession

from minisql_engine_spark.operators.contamination import (
    cross_split_contamination,
)
from tests.conftest import assert_matches_oracle


def _df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text", "split"])


BASE = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"


def test_detects_copied_span(spark):
    rows = [
        (1, BASE + " kilo lima", "train"),
        # doc 2 contains an 10-token span from doc 1 → 8-gram hits
        (2, "intro words " + BASE + " outro", "test"),
        (3, "completely different text with many many unique tokens here", "test"),
    ]
    out = {
        r["doc_id"]: r
        for r in cross_split_contamination(_df(spark, rows)).collect()
    }
    assert 2 in out and 3 not in out
    assert out[2]["n_contaminated"] == 3  # 3 of the shifted 8-grams survive
    assert 0 < out[2]["contamination_ratio"] <= 1


def test_clean_splits_empty_report(spark):
    rows = [
        (1, BASE, "train"),
        (2, "zulu yankee xray whiskey victor uniform tango sierra romeo quebec", "test"),
    ]
    assert cross_split_contamination(_df(spark, rows)).count() == 0


def test_short_docs_produce_no_grams(spark):
    rows = [
        (1, "too short", "train"),
        (2, "also short", "test"),
    ]
    assert cross_split_contamination(_df(spark, rows)).count() == 0


def test_matches_oracle_on_synthetic(spark, duck):
    rows = [
        (1, BASE + " kilo lima mike", "train"),
        (2, "november oscar papa " + BASE, "test"),
        (3, BASE.upper(), "test"),  # normalization: counts as copied
        (4, "separate clean eval doc with entirely fresh vocabulary words", "test"),
    ]
    out = cross_split_contamination(_df(spark, rows))
    values = ", ".join(
        "({}, '{}', '{}')".format(i, t, s) for i, t, s in rows
    )
    oracle = (
        "WITH docs AS (SELECT * FROM (VALUES "
        + values
        + ") AS t(doc_id, text, split)),"
        " tk AS (SELECT doc_id, split, string_split("
        "  regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t"
        "  FROM docs),"
        " grams AS (SELECT doc_id, split,"
        "  unnest(list_distinct([md5(array_to_string(t[i:i+7], ' '))"
        "   for i in range(1, len(t) - 6)])) AS gram"
        "  FROM tk WHERE len(t) >= 8),"
        " tr AS (SELECT DISTINCT gram FROM grams WHERE split = 'train'),"
        " ev AS (SELECT doc_id, gram FROM grams WHERE split = 'test'),"
        " per_doc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams"
        "  FROM ev GROUP BY doc_id),"
        " hits AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_contaminated"
        "  FROM ev WHERE gram IN (SELECT gram FROM tr) GROUP BY doc_id)"
        " SELECT p.doc_id, n_grams,"
        "  COALESCE(n_contaminated, 0) AS n_contaminated,"
        "  CAST(COALESCE(n_contaminated, 0) AS DOUBLE) / n_grams"
        "   AS contamination_ratio"
        " FROM per_doc p LEFT JOIN hits h ON p.doc_id = h.doc_id"
        " WHERE COALESCE(n_contaminated, 0) > 0"
        " ORDER BY contamination_ratio DESC, p.doc_id"
    )
    assert_matches_oracle(out, duck.execute(oracle).fetchdf(), "contam")


def test_shuffle_carries_hashes_not_text(spark):
    rows = [(1, BASE + " kilo", "train"), (2, BASE + " lima", "test")]
    df = cross_split_contamination(_df(spark, rows))
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # join keys are the md5 gram columns; full text never appears in
    # an exchange's partitioning expression
    assert "hashpartitioning(gram" in plan
