"""PII redaction, vocabulary stats, and histogram operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from minisql_engine_spark.operators.redaction import (
    redact_pii,
    redact_pii_sql,
)
from minisql_engine_spark.operators.stats import (
    value_histogram,
    value_histogram_sql,
)
from minisql_engine_spark.operators.text import vocabulary_stats
from minisql_engine_spark.sources import load_table
from tests.conftest import assert_matches_oracle

PII_ROWS = [
    (1, "contact me at alice.smith+x@example.co.uk for details"),
    (2, "server at 192.168.1.17 answered, backup 10.0.0.1 did not"),
    (3, "call 555-867-5309 or 555 123 4567 after hours"),
    (4, "card 4111111111111111 and account 123456789 leaked"),
    (5, "clean text with no identifiers whatsoever"),
    (6, "mixed: bob@corp.io from 8.8.8.8 card 5500005555555559"),
]


def test_redaction_replaces_and_counts(spark):
    df = spark.createDataFrame(PII_ROWS, ["id", "text"])
    out = {r["id"]: r for r in redact_pii(df).collect()}
    assert out[1]["redacted"] == "contact me at <EMAIL> for details"
    assert out[1]["n_email"] == 1 and out[1]["n_pii_total"] == 1
    assert out[2]["redacted"] == (
        "server at <IP> answered, backup <IP> did not"
    )
    assert out[2]["n_ip"] == 2
    assert "<PHONE>" in out[3]["redacted"]
    assert "555-867-5309" not in out[3]["redacted"]
    assert out[4]["redacted"] == "card <IDNUM> and account <IDNUM> leaked"
    assert out[5]["redacted"] == out[5]["text"]
    assert out[5]["n_pii_total"] == 0
    assert out[6]["n_email"] == out[6]["n_ip"] == out[6]["n_idnum"] == 1
    assert out[6]["n_pii_total"] == 3


def test_redaction_matches_oracle(spark, duck):
    """The pattern set must behave identically under Java regex
    (Spark) and RE2 (DuckDB) — the portability contract."""
    df = spark.createDataFrame(PII_ROWS, ["id", "text"])
    out = redact_pii(df).drop("text")
    values = ", ".join(
        "({}, '{}')".format(i, t.replace("'", "''")) for i, t in PII_ROWS
    )
    oracle = (
        f"SELECT id, {redact_pii_sql()} FROM"
        f" (VALUES {values}) AS t(id, text)"
    )
    assert_matches_oracle(out, duck.execute(oracle).fetchdf(), "redact")


def test_redaction_is_map_side(spark):
    df = spark.createDataFrame(PII_ROWS, ["id", "text"])
    out = redact_pii(df)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    )
    assert "Exchange" not in plan


def test_vocabulary_stats_oracle(spark, duck, sf_dir):
    out = vocabulary_stats(load_table(spark, sf_dir, "documents"))
    oracle = (
        "WITH toks AS (SELECT doc_id, unnest(string_split("
        " regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '))"
        "  AS token FROM documents WHERE trim(text) <> '')"
        " SELECT token, CAST(count(*) AS BIGINT) AS tf,"
        " CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq"
        " FROM toks GROUP BY token"
    )
    assert_matches_oracle(out, duck.execute(oracle).fetchdf(), "vocab")


def test_char_entropy_oracle_corpus(spark, duck, sf_dir):
    from minisql_engine_spark.operators.text import (
        char_entropy,
        char_entropy_sql,
    )

    out = char_entropy(load_table(spark, sf_dir, "documents"))
    oracle = char_entropy_sql()
    assert_matches_oracle(out, duck.execute(oracle).fetchdf(), "entropy")


def test_char_entropy_edges(spark, duck):
    """Edge rows the corpus doesn't exercise (ADVICE r4): empty doc,
    NULL text, single-char repeat (entropy exactly 0), multi-byte
    unicode — Spark and DuckDB must agree on every one."""
    from minisql_engine_spark.operators.text import (
        char_entropy,
        char_entropy_sql,
    )

    rows = [
        (1, ""),                      # empty → n=0, entropy 0
        (2, None),                    # NULL text → like empty
        (3, "aaaaaaa"),               # one symbol → entropy exactly 0
        (4, "héllo wörld — ünïcode"),  # multi-byte chars count as 1
        (5, "abab"),                  # two symbols, uniform → 1 bit
    ]
    sdf = spark.createDataFrame(rows, ["doc_id", "text"])
    out = char_entropy(sdf)
    duck.execute(
        "CREATE OR REPLACE TABLE _ent(doc_id BIGINT, text VARCHAR)"
    )
    duck.executemany("INSERT INTO _ent VALUES (?, ?)", rows)
    oracle = char_entropy_sql(table="_ent")
    assert_matches_oracle(out, duck.execute(oracle).fetchdf(), "entropy_edge")
    got = {r["doc_id"]: (r["n_chars_e"], r["entropy_bits"])
           for r in out.collect()}
    assert got[1] == (0, 0.0)
    assert got[2] == (0, 0.0)
    assert got[3] == (7, 0.0)
    assert got[5] == (4, 1.0)
    duck.execute("DROP TABLE _ent")


def test_vocabulary_topk_bounded(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    top = vocabulary_stats(docs, top_k=10).collect()
    assert len(top) == 10
    tfs = [r["tf"] for r in top]
    assert tfs == sorted(tfs, reverse=True)
    assert all(r["doc_freq"] <= r["tf"] for r in top)


def test_histogram_matches_oracle(spark, duck, sf_dir):
    out = value_histogram(
        load_table(spark, sf_dir, "orders"), "o_totalprice", 0.0, 400_000.0, 16
    )
    oracle = value_histogram_sql("orders", "o_totalprice", 0.0, 400_000.0, 16)
    assert_matches_oracle(out, duck.execute(oracle).fetchdf(), "histogram")


def test_histogram_sentinel_buckets(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (5.0,), (9.999,), (10.0,), (200.0,), (None,)],
        "v double",
    )
    rows = {r["bucket"]: r["n"] for r in value_histogram(df, "v", 0, 10, 2).collect()}
    # half-open buckets: [0,5) gets 0.0; [5,10) gets 5.0 and 9.999;
    # 10.0 and 200.0 overflow; NULL excluded
    assert rows == {-1: 1, 0: 1, 1: 2, 2: 2}


def test_histogram_validates(spark):
    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError, match="hi > lo"):
        value_histogram(df, "v", 5, 5)
    with pytest.raises(ValueError, match="n_buckets"):
        value_histogram(df, "v", 0, 1, 0)


def test_histogram_total_is_nonnull_count(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    hist = value_histogram(orders, "o_totalprice", 0.0, 100_000.0, 8)
    assert hist.agg(F.sum("n")).first()[0] == orders.filter(
        F.col("o_totalprice").isNotNull()
    ).count()


def test_exact_quantiles_global_oracle(spark, duck, sf_dir):
    from minisql_engine_spark.operators.stats import (
        exact_quantiles,
        exact_quantiles_sql,
    )

    out = exact_quantiles(
        load_table(spark, sf_dir, "lineitem"), "l_extendedprice"
    )
    oracle = exact_quantiles_sql("lineitem", "l_extendedprice")
    assert_matches_oracle(out, duck.execute(oracle).fetchdf(), "quantiles")


def test_exact_quantiles_grouped_oracle(spark, duck, sf_dir):
    from minisql_engine_spark.operators.stats import (
        exact_quantiles,
        exact_quantiles_sql,
    )

    out = exact_quantiles(
        load_table(spark, sf_dir, "orders"),
        "o_totalprice",
        probs=(0.5, 0.9),
        group_by="o_orderpriority",
    )
    oracle = exact_quantiles_sql(
        "orders", "o_totalprice", probs=(0.5, 0.9),
        group_by="o_orderpriority",
    )
    assert_matches_oracle(
        out, duck.execute(oracle).fetchdf(), "grouped_quantiles"
    )


@pytest.mark.parametrize("n,mc", [(1, 1), (2, 1), (3, 2)])
def test_ngram_counts_oracle(spark, duck, sf_dir, n, mc):
    from minisql_engine_spark.operators.text import (
        ngram_counts,
        ngram_counts_sql,
    )

    out = ngram_counts(
        load_table(spark, sf_dir, "documents"), n, min_count=mc
    )
    oracle = duck.execute(ngram_counts_sql(n=n, min_count=mc)).fetchdf()
    assert_matches_oracle(out, oracle, f"ngram n={n}")


def test_ngram_counts_edges(spark):
    from minisql_engine_spark.operators.text import ngram_counts

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "short"), (4, ""), (5, None)],
        "doc_id long, text string",
    )
    rows = {
        r.gram: (r["count"], r.doc_freq)
        for r in ngram_counts(df, 3).collect()
    }
    # docs shorter than n and empty/NULL docs contribute nothing;
    # the one trigram appears once per doc that holds it
    assert rows == {"a b c": (2, 2)}
    with pytest.raises(ValueError):
        ngram_counts(df, 0)


def test_exact_corr_oracle(spark, duck, sf_dir):
    from minisql_engine_spark.operators.stats import (
        exact_corr,
        exact_corr_sql,
    )
    from minisql_engine_spark.sources.parquet_catalog import load_table

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    li = load_table(spark, sf_dir, "lineitem")
    for mode in ("complete", "pairwise"):
        out = exact_corr(li, cols, mode=mode)
        assert_matches_oracle(
            out,
            duck.execute(exact_corr_sql("lineitem", cols, mode=mode)).df(),
            f"corr-{mode}",
        )


def test_exact_corr_known_values(spark):
    import pytest as _pytest

    from minisql_engine_spark.operators.stats import exact_corr

    rows = [
        (1.0, 2.0, -1.0, 5.0),
        (2.0, 4.0, -2.0, 5.0),
        (3.0, 6.0, -3.0, None),
        (4.0, 8.0, -4.0, 5.0),
    ]
    sdf = spark.createDataFrame(rows, "a double, b double, c double, d double")
    # pairwise: each pair keeps its own non-NULL rows
    pw = {
        (r.col_a, r.col_b): (r.n, r.r)
        for r in exact_corr(sdf, ["a", "b", "c", "d"], mode="pairwise").collect()
    }
    assert pw[("a", "b")] == (4, 1.0)     # perfectly correlated
    assert pw[("a", "c")] == (4, -1.0)    # perfectly anti-correlated
    # d constant on its non-NULL rows → zero variance → NULL r,
    # and the NULL row drops pair-wise (n=3)
    assert pw[("a", "d")] == (3, None)
    # complete: the row with NULL d drops from EVERY pair
    cm = {
        (r.col_a, r.col_b): (r.n, r.r)
        for r in exact_corr(sdf, ["a", "b", "c", "d"]).collect()
    }
    assert cm[("a", "b")] == (3, 1.0)
    assert cm[("a", "d")] == (3, None)
    with _pytest.raises(ValueError):
        exact_corr(sdf, ["a", "b"], mode="bogus")
