"""PMI collocation mining — corpus-wide phrase discovery.

Phrase detection is a standard pretraining preprocessing step (the
word2vec phrases pass — Mikolov et al. 2013, public preprint — and
every keyword/terminology miner since): find token PAIRS that
co-occur far more than chance, by pointwise mutual information

    PMI(a,b) = log₂ ( p(ab) / (p(a) · p(b)) )
             = log₂ c_ab + 2·log₂ T₁ − log₂ c_a − log₂ c_b − log₂ T₂

with unigram probabilities c/T₁ and adjacent-bigram probabilities
c_ab/T₂. The expanded log form is what both engines evaluate —
integer counts cast to double, a FIXED five-term expression tree (no
aggregate re-ordering), so the doubles agree bitwise and the
portable fx6 floor edge makes the score hash-stable (the
``lm_score`` convention).

A ``min_count`` floor keeps the rare-pair PMI explosion out (PMI is
maximal for hapax pairs — every miner clips; word2vec's δ discount
serves the same purpose), and the result is the deterministic top-k
by (pmi DESC, a, b).

Scale shape: the ``lm_bigram`` machinery — one positional explode,
a per-doc lag window (doc-sized partitions), two hash aggregates
(unigram + bigram counts, map-side partials), a vocabulary-sized
join of bigrams to their two unigram counts, then a top-k window
over the min_count-filtered candidates only. Nothing quadratic,
no corpus-sized window.

Reference scope: ``sqlengine.py:1-753`` has no corpus surface;
extension, SURVEY §2.4 text-analysis family (sits beside ``tfidf``
keyword extraction — tf-idf ranks tokens per doc, PMI ranks PAIRS
corpus-wide).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .portable_round import fx6 as _fx6
from .portable_round import fx6_sql as _fx6_sql
from .text import _norm_text, _ws_tokens

#: |PMI| is bounded by log2 of corpus size — far inside the fx6
#: bounded-domain contract (|x| < 1e12)
_PMI = (
    "log2(CAST(c_ab AS DOUBLE)) + 2 * log2(CAST(t1 AS DOUBLE))"
    " - log2(CAST(ca AS DOUBLE)) - log2(CAST(cb AS DOUBLE))"
    " - log2(CAST(t2 AS DOUBLE))"
)


def pmi_collocations(
    docs: DataFrame,
    k: int = 50,
    min_count: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(tok_a, tok_b, c_ab, pmi_fx6, rank) — the corpus's top-``k``
    adjacent-pair collocations by PMI among pairs seen at least
    ``min_count`` times. Deterministic (pmi DESC, tok_a, tok_b)
    ranking."""
    if k < 1 or min_count < 1:
        raise ValueError(
            f"need k >= 1 and min_count >= 1, got {k}, {min_count}"
        )
    toks = docs.select(
        F.col(id_col),
        F.posexplode(_ws_tokens(_norm_text(F.col(text_col)))).alias(
            "pos", "token"
        ),
    )
    c1 = toks.groupBy("token").agg(
        F.count("*").cast("bigint").alias("c1")
    )
    t1 = c1.agg(F.sum("c1").cast("bigint").alias("t1"))
    w = Window.partitionBy(id_col).orderBy("pos")
    pairs = (
        toks.withColumn("prev", F.lag("token").over(w))
        .filter(F.col("prev").isNotNull())
        .groupBy(
            F.col("prev").alias("tok_a"),
            F.col("token").alias("tok_b"),
        )
        .agg(F.count("*").cast("bigint").alias("c_ab"))
    )
    t2 = pairs.agg(F.sum("c_ab").cast("bigint").alias("t2"))
    cand = (
        pairs.filter(F.col("c_ab") >= min_count)
        .join(
            c1.select(
                F.col("token").alias("tok_a"), F.col("c1").alias("ca")
            ),
            "tok_a",
        )
        .join(
            c1.select(
                F.col("token").alias("tok_b"), F.col("c1").alias("cb")
            ),
            "tok_b",
        )
        .crossJoin(F.broadcast(t1))
        .crossJoin(F.broadcast(t2))
        .select(
            "tok_a",
            "tok_b",
            "c_ab",
            _fx6(F.expr(_PMI)).alias("pmi_fx6"),
        )
    )
    wr = Window.orderBy(
        F.col("pmi_fx6").desc(), F.col("tok_a"), F.col("tok_b")
    )
    return (
        cand.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select(
            "tok_a",
            "tok_b",
            "c_ab",
            "pmi_fx6",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def pmi_collocations_sql(
    k: int = 50,
    min_count: int = 3,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB oracle twin of :func:`pmi_collocations` — the same
    positional explode, lag pairing, counts, five-term log
    expression, fx6 edge, and (pmi DESC, a, b) top-k."""
    if k < 1 or min_count < 1:
        raise ValueError(
            f"need k >= 1 and min_count >= 1, got {k}, {min_count}"
        )
    return (
        "WITH tk AS (SELECT"
        f"  {id_col}, string_split(regexp_replace(lower(trim("
        f"{text_col})), '\\s+', ' ', 'g'), ' ') AS t"
        f"  FROM {table} WHERE trim({text_col}) <> ''),"
        f" toks AS (SELECT {id_col}, i - 1 AS pos, t[i] AS token"
        f"  FROM (SELECT {id_col}, t,"
        "   unnest(range(1, len(t) + 1)) AS i FROM tk)),"
        " c1 AS (SELECT token, CAST(count(*) AS BIGINT) AS c1"
        "  FROM toks GROUP BY token),"
        " tt1 AS (SELECT CAST(sum(c1) AS BIGINT) AS t1 FROM c1),"
        f" wp AS (SELECT {id_col}, pos, token,"
        f"  lag(token) OVER (PARTITION BY {id_col} ORDER BY pos)"
        "   AS prev FROM toks),"
        " pr AS (SELECT prev AS tok_a, token AS tok_b,"
        "  CAST(count(*) AS BIGINT) AS c_ab"
        "  FROM wp WHERE prev IS NOT NULL GROUP BY prev, token),"
        " tt2 AS (SELECT CAST(sum(c_ab) AS BIGINT) AS t2 FROM pr),"
        " cand AS (SELECT tok_a, tok_b, c_ab,"
        "  " + _fx6_sql(
            "log2(CAST(c_ab AS DOUBLE))"
            " + 2 * log2(CAST(t1 AS DOUBLE))"
            " - log2(CAST(ca.c1 AS DOUBLE))"
            " - log2(CAST(cb.c1 AS DOUBLE))"
            " - log2(CAST(t2 AS DOUBLE))"
        )
        + " AS pmi_fx6"
        f"  FROM pr JOIN c1 ca ON ca.token = pr.tok_a"
        "  JOIN c1 cb ON cb.token = pr.tok_b"
        "  CROSS JOIN tt1 CROSS JOIN tt2"
        f"  WHERE c_ab >= {min_count})"
        " SELECT tok_a, tok_b, c_ab, pmi_fx6, CAST(rank AS INT) AS rank"
        " FROM (SELECT *, row_number() OVER ("
        "  ORDER BY pmi_fx6 DESC, tok_a, tok_b) AS rank FROM cand)"
        f" WHERE rank <= {k}"
    )
