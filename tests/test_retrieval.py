"""BM25 retrieval and unigram-LM perplexity — oracle parity + edges."""

from __future__ import annotations

import pandas as pd
import pytest

from minisql_engine_spark.operators.lm_score import (
    lm_perplexity,
    lm_perplexity_sql,
)
from minisql_engine_spark.operators.retrieval import (
    bm25_topk,
    bm25_topk_sql,
)
from minisql_engine_spark.sources.parquet_catalog import load_table
from tests.conftest import assert_matches_oracle

QUERIES = [
    ("q1", "hash join spark"),
    ("q2", "window sort order"),
    ("q3", "customer query fast scan"),
]


def test_bm25_oracle_corpus(spark, duck, sf_dir):
    out = bm25_topk(load_table(spark, sf_dir, "documents"), QUERIES, k=10)
    assert_matches_oracle(
        out, duck.execute(bm25_topk_sql(QUERIES, k=10)).df(), "bm25"
    )


def test_bm25_edges(spark, duck):
    """Empty/NULL docs never match; unknown query terms score nothing;
    duplicate query terms count once; ties break by doc_id."""
    rows = [
        (1, "alpha beta beta"),
        (2, "alpha alpha alpha beta"),
        (3, ""),
        (4, None),
        (5, "gamma"),
        (6, "alpha beta beta"),  # exact tie with doc 1
    ]
    sdf = spark.createDataFrame(rows, "doc_id bigint, text string")
    duck.register(
        "_bm", pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    qs = [("qa", "beta beta zzz-unknown"), ("qb", "nosuchterm")]
    out = bm25_topk(sdf, qs, k=3)
    oracle = bm25_topk_sql(qs, k=3, table="_bm")
    assert_matches_oracle(out, duck.execute(oracle).df(), "bm25-edges")
    got = {
        (r.query_id, r.doc_id): r.rank for r in out.collect()
    }
    # qb matches nothing at all
    assert not any(q == "qb" for q, _ in got)
    # tie between doc 1 and doc 6 broken by id: 1 outranks 6
    assert got[("qa", 1)] < got[("qa", 6)]


def test_bm25_idf_orders_rarity(spark):
    """A doc matching a rare term outscores one matching a common
    term with identical tf/length — the idf ordering property."""
    rows = [(i, "common filler") for i in range(1, 9)]
    rows += [(9, "rare filler"), (10, "other words here")]
    sdf = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = bm25_topk(sdf, [("q", "rare common")], k=10).collect()
    score = {r.doc_id: r.score for r in out}
    assert score[9] > score[1]


def test_lm_perplexity_oracle_corpus(spark, duck, sf_dir):
    out = lm_perplexity(load_table(spark, sf_dir, "documents"))
    assert_matches_oracle(
        out, duck.execute(lm_perplexity_sql()).df(), "lm-ppl"
    )


def test_lm_perplexity_edges(spark, duck):
    """Empty/NULL docs drop; single-token corpus has ppl = smoothed
    uniform; buckets split head/middle/tail on terciles."""
    rows = [
        (1, "a a a a"),
        (2, "a b c d"),
        (3, "b b a a"),
        (4, ""),
        (5, None),
        (6, "z z z q"),
    ]
    sdf = spark.createDataFrame(rows, "doc_id bigint, text string")
    # distinct name + unregister: the session-scoped duck connection is
    # shared, and a lingering registered replacement view named `_lm`
    # shadows test_lm_bigram's CREATE TABLE _lm when tests run in a
    # non-alphabetical order (pre-existing isolation bug, surfaced by
    # targeted runs this round)
    duck.register("_lm_edges", pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = lm_perplexity(sdf)
    assert_matches_oracle(
        out,
        duck.execute(lm_perplexity_sql(table="_lm_edges")).df(),
        "lm-edges",
    )
    duck.unregister("_lm_edges")
    rows_out = {r.doc_id: r for r in out.collect()}
    assert set(rows_out) == {1, 2, 3, 6}  # empty + NULL dropped
    assert {r.bucket for r in rows_out.values()} <= {
        "head",
        "middle",
        "tail",
    }
    # doc 1 repeats the corpus's most frequent token — lowest ppl
    assert rows_out[1].ppl == min(r.ppl for r in rows_out.values())
    assert rows_out[1].bucket == "head"


def test_lm_perplexity_uniform_single_doc(spark):
    """One doc, all-distinct tokens: p = 2/(n+V) each, ppl exact."""
    sdf = spark.createDataFrame(
        [(1, "a b c d")], "doc_id bigint, text string"
    )
    row = lm_perplexity(sdf).collect()[0]
    # c(t)=1, T=4, V=4 → p = 2/8 = 0.25 → H = 2 bits → ppl = 4
    assert row.xent_bits == pytest.approx(2.0)
    assert row.ppl == pytest.approx(4.0)


# --- RRF fusion -------------------------------------------------------------


def _ranked(spark, rows):
    return spark.createDataFrame(
        rows, "query_id string, doc_id long, rank int"
    )


def test_rrf_matches_python_replay(spark):
    from minisql_engine_spark.operators.retrieval import (
        RRF_K,
        RRF_UNIT,
        rrf_fuse,
    )

    a = [("q", 1, 1), ("q", 2, 2), ("q", 3, 3)]
    b = [("q", 3, 1), ("q", 4, 2), ("q", 1, 3)]
    got = {
        r["doc_id"]: (r["rrf_units"], r["n_lists"])
        for r in rrf_fuse(
            [_ranked(spark, a), _ranked(spark, b)], k=10
        ).collect()
    }
    want: dict = {}
    for rows in (a, b):
        for _, d, rk in rows:
            u, n = want.get(d, (0, 0))
            want[d] = (u + RRF_UNIT // (RRF_K + rk), n + 1)
    assert got == want


def test_rrf_list_order_invariant_and_consensus_wins(spark):
    from minisql_engine_spark.operators.retrieval import rrf_fuse

    a = [("q", 1, 1), ("q", 7, 2)]
    b = [("q", 2, 1), ("q", 7, 2)]
    ab = rrf_fuse([_ranked(spark, a), _ranked(spark, b)], k=5).collect()
    ba = rrf_fuse([_ranked(spark, b), _ranked(spark, a)], k=5).collect()
    assert sorted(map(tuple, ab)) == sorted(map(tuple, ba))
    top = min(ab, key=lambda r: r["fused_rank"])
    # doc 7 appears in BOTH lists at rank 2: 2/(k+2) > 1/(k+1)
    assert top["doc_id"] == 7 and top["n_lists"] == 2


def test_rrf_tiebreak_by_doc_id(spark):
    from minisql_engine_spark.operators.retrieval import rrf_fuse

    a = [("q", 9, 1), ("q", 4, 2)]
    b = [("q", 4, 1), ("q", 9, 2)]
    out = rrf_fuse([_ranked(spark, a), _ranked(spark, b)], k=5).collect()
    assert [r["doc_id"] for r in sorted(out, key=lambda r: r["fused_rank"])] == [4, 9]


def test_rrf_requires_a_list(spark):
    from minisql_engine_spark.operators.retrieval import rrf_fuse

    with pytest.raises(ValueError):
        rrf_fuse([], k=5)


def _hn_spark_inputs(spark, sf_dir):
    from pyspark.sql import functions as F

    from minisql_engine_spark.operators.text import _norm_text, _ws_tokens

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    qdocs = docs.filter(F.col("doc_id") % 97 == 0)
    qid = F.concat(F.lit("q"), F.col("doc_id").cast("string")).alias(
        "query_id"
    )
    queries = qdocs.select(
        qid,
        F.array_join(
            F.slice(_ws_tokens(_norm_text(F.col("text"))), 1, 8), " "
        ).alias("query_text"),
    )
    h = F.md5(_norm_text(F.col("text"))).alias("h")
    positives = (
        qdocs.select(qid, h)
        .join(docs.select(h, "doc_id"), "h")
        .select("query_id", "doc_id")
    )
    return docs, queries, positives


_HN_NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
_HN_CTES = (
    "WITH q AS (SELECT 'q' || CAST(doc_id AS VARCHAR) AS query_id,"
    f" array_to_string((string_split({_HN_NORM}, ' '))[1:8], ' ')"
    " AS query_text FROM documents WHERE doc_id % 97 = 0),"
    " pos AS (SELECT 'q' || CAST(a.doc_id AS VARCHAR) AS query_id,"
    "  b.doc_id FROM documents a JOIN documents b"
    f"  ON md5(regexp_replace(lower(trim(a.text)), '\\s+', ' ', 'g'))"
    f"   = md5(regexp_replace(lower(trim(b.text)), '\\s+', ' ', 'g'))"
    "  WHERE a.doc_id % 97 = 0),"
)


def test_hard_negatives_oracle_corpus(spark, duck, sf_dir):
    """DPR-style BM25 hard-negative mining on the corpus: queries are
    each 97th doc's first 8 tokens, positives are the source doc plus
    its exact-content duplicates — both derived identically in both
    engines; full hash parity, and the structural contracts: no
    positive ever surfaces, neg_rank is dense 1..k per query, and
    every negative's score is within the depth window's range."""
    from minisql_engine_spark.operators.retrieval import (
        hard_negatives,
        hard_negatives_sql,
    )

    docs, queries, positives = _hn_spark_inputs(spark, sf_dir)
    out = hard_negatives(docs, queries, positives, k=5, depth=20)
    oracle = _HN_CTES + hard_negatives_sql("q", "pos", k=5, depth=20)
    assert_matches_oracle(
        out, duck.execute(oracle).df(), "hard_negatives"
    )
    pdf = out.toPandas()
    pos_pdf = positives.toPandas()
    pos_set = set(zip(pos_pdf.query_id, pos_pdf.doc_id))
    assert not any(
        (q, d) in pos_set for q, d in zip(pdf.query_id, pdf.doc_id)
    )
    for _, g in pdf.groupby("query_id"):
        assert list(g.neg_rank) == list(range(1, len(g) + 1))
        assert (g.score.diff().dropna() <= 0).all()


def test_hard_negatives_rails_and_saturation(spark):
    """k/depth rails raise; a query whose whole depth window is
    positive yields no rows (the caller's mine-deeper signal)."""
    from pyspark.sql import functions as F

    from minisql_engine_spark.operators.retrieval import hard_negatives

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha beta"), (3, "gamma delta")],
        "doc_id long, text string",
    )
    queries = [("qa", "alpha beta")]
    all_pos = spark.createDataFrame(
        [("qa", 1), ("qa", 2)], "query_id string, doc_id long"
    )
    with pytest.raises(ValueError, match="k <= depth"):
        hard_negatives(docs, queries, all_pos, k=5, depth=2)
    out = hard_negatives(docs, queries, all_pos, k=2, depth=3)
    # docs 1,2 are positive; doc 3 shares no query term -> no negs
    assert out.count() == 0


def test_contrastive_triplets_oracle_corpus(spark, duck, sf_dir):
    """Triplet assembly downstream of the mining: full hash parity on
    the corpus, plus the structural contracts — every (query,
    positive) pairs with exactly its k mined negatives, neg_id never
    appears in the positive set, and the rank-based hardness flag is
    internally consistent (a positive below depth makes every
    negative hard; pos_rank=1 positives only yield hard negatives if
    a negative out-ranked them, which rank 1 forbids)."""
    from minisql_engine_spark.operators.retrieval import (
        contrastive_triplets,
        contrastive_triplets_sql,
        hard_negatives,
    )

    docs, queries, positives = _hn_spark_inputs(spark, sf_dir)
    out = contrastive_triplets(docs, queries, positives, k=3, depth=15)
    oracle = _HN_CTES + contrastive_triplets_sql(
        "q", "pos", k=3, depth=15
    )
    assert_matches_oracle(
        out, duck.execute(oracle).df(), "contrastive_triplets"
    )
    pdf = out.toPandas()
    pos_pdf = positives.toPandas()
    pos_set = set(zip(pos_pdf.query_id, pos_pdf.doc_id))
    assert not any(
        (q, n) in pos_set for q, n in zip(pdf.query_id, pdf.neg_id)
    )
    # per (query, positive): exactly the query's mined-negative count
    negs = hard_negatives(
        docs, queries, positives, k=3, depth=15
    ).toPandas()
    n_by_q = negs.groupby("query_id").size().to_dict()
    for (q, p), g in pdf.groupby(["query_id", "pos_id"]):
        assert len(g) == n_by_q.get(q, 0)
        assert set(g.neg_id) == set(
            negs[negs.query_id == q].doc_id
        )
    # hardness-flag consistency
    below = pdf[pdf.pos_rank == 0]
    assert below.is_hard.all()
    rank1 = pdf[pdf.pos_rank == 1]
    assert (~rank1.is_hard).all()
