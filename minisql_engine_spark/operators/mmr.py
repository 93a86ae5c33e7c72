"""Maximal-marginal-relevance (MMR) diversity re-ranking.

Top-k retrieval returns near-duplicates of the best hit; a
training-data or eval-set pipeline wants the *diverse* top-k. MMR
(Carbonell & Goldstein, SIGIR'98) greedily selects

    argmax_d  lam * rel(d) - (1 - lam) * max_{s in S} sim(d, s)

over the remaining candidates, where S is the already-selected set.
The selection is inherently sequential in k — but it is PER-QUERY
LOCAL over a shortlist (the candidates some first-stage retriever
already capped at ~tens of rows), so the correct Spark shape is a
grouped Arrow ``applyInPandas``: each query's shortlist is one small
pandas group, the greedy loop runs vectorized inside it, and the
corpus never enters the plan. This is the engine's canonical
custom-operator path (multimodal decode, pandas_group_features) —
Python on shortlist-sized batches, never row-at-a-time, never
corpus-sized.

Determinism / oracle contract: ``rel`` and every pairwise ``sim``
are round-6 cosines (dot products accumulated with an explicit
left-to-right fold — the same IEEE addition order as Spark's
``aggregate`` and the DuckDB replays, see similarity.DUCK_COS — and
rounded HALF_UP exactly like Spark's ``round``); the greedy score is
the bit-identical double expression ``0.5 * (rel - maxsim)`` for
``lam = 1/2`` (the only lam the oracle ships; the general form is
``(lam_num * rel - (lam_den - lam_num) * maxsim) / lam_den``); ties
break by doc_id ascending. A DuckDB oracle therefore replays the
ENTIRE greedy selection as unrolled per-step CTEs — see the driver
entry — argmax, tie-breaks and all.

Scale notes (100 TB): cost is |q| x shortlist^2 pairwise sims, all
inside Arrow batches; the only shuffle is the groupBy(query_id)
that ``applyInPandas`` implies, over shortlist-sized rows.

Reference contrast: ``sqlengine.py`` has no retrieval surface.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_OUT_SCHEMA = StructType(
    [
        StructField("query_id", StringType()),
        StructField("doc_id", LongType()),
        StructField("rel", DoubleType()),
        StructField("mmr_score", DoubleType()),
        StructField("sel_rank", IntegerType()),
    ]
)


def _round6(x: float) -> float:
    """DuckDB's round(col, 6) for DOUBLE: scale by 1e6 (ONE double
    multiply), nearest-integer on the scaled double, divide back.
    Python's built-in round() on a float is exactly that nearest-int
    step (half-even ties — an exact tie needs the scaled product to
    land on .5 precisely, which none of the corpus values do; the
    decimal-exact rounding used elsewhere in the package is NOT the
    right twin here because 0.5*(a-b) scores sit on or a hair off the
    7th-digit boundary where the conventions split — measured 9/40
    rows). DuckDB's nearest-int step is std::round = half AWAY from
    zero, and exact .5 scaled values really occur (4/40 rows: the
    halving makes them dyadic), so the tie branch is load-bearing.
    floor + exact fractional compare, not floor(s + 0.5): adding 0.5
    can round the sum upward past an integer and overshoot, while
    s - floor(s) is an exact double subtraction."""
    s = x * 1e6
    f = math.floor(s)
    frac = s - f
    if frac > 0.5 or (frac == 0.5 and s > 0):
        f += 1
    return f / 1e6


def _cos6(a: list, b: list) -> float:
    """Round-6 cosine with explicit left-to-right folds — the
    package's cross-engine dot-product convention."""
    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dot += x * y
        na += x * x
        nb += y * y
    return _round6(dot / (math.sqrt(na) * math.sqrt(nb)))


def mmr_select(
    rows: list[tuple[int, float, list]], k: int
) -> list[tuple[int, float, float, int]]:
    """Greedy MMR over one query's shortlist (lam = 1/2).

    ``rows`` is (doc_id, rel, vector); returns (doc_id, rel,
    mmr_score, sel_rank). Exposed for the pytest oracle."""
    remaining = {d: (rel, v) for d, rel, v in rows}
    sims: dict = {}

    def maxsim(d: int, selected: list) -> float:
        if not selected:
            return 0.0
        best = None
        for s in selected:
            key = (min(d, s), max(d, s))
            if key not in sims:
                sims[key] = _cos6(remaining_all[d][1], remaining_all[s][1])
            v = sims[key]
            if best is None or v > best:
                best = v
        return best

    remaining_all = dict(remaining)
    selected: list = []
    out = []
    for step in range(1, min(k, len(rows)) + 1):
        best_d = None
        best_score = None
        for d in sorted(remaining):
            rel = remaining[d][0]
            score = 0.5 * (rel - maxsim(d, selected))
            if best_score is None or score > best_score:
                best_d, best_score = d, score
        out.append(
            (best_d, remaining[best_d][0], _round6(best_score), step)
        )
        selected.append(best_d)
        del remaining[best_d]
    return out


def mmr_rerank(
    candidates: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    rel_col: str = "rel",
    vec_col: str = "v",
) -> DataFrame:
    """(query_id, doc_id, rel, mmr_score, sel_rank) — diverse top-k
    per query from a shortlist carrying (query_id, id_col, rel_col,
    vec_col). ``rel`` must already be the round-6 relevance (e.g.
    ``brute_force_topk``'s score) and vectors DOUBLE arrays."""
    import pandas as pd

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = pdf["query_id"].iloc[0]
        rows = [
            (int(d), float(r), list(v))
            for d, r, v in zip(
                pdf[id_col], pdf[rel_col], pdf[vec_col]
            )
        ]
        sel = mmr_select(rows, k)
        return pd.DataFrame(
            {
                "query_id": [qid] * len(sel),
                "doc_id": [s[0] for s in sel],
                "rel": [s[1] for s in sel],
                "mmr_score": [s[2] for s in sel],
                "sel_rank": [s[3] for s in sel],
            }
        )

    sel = candidates.select(
        candidates["query_id"].cast("string").alias("query_id"),
        candidates[id_col].cast("long").alias(id_col),
        candidates[rel_col].cast("double").alias(rel_col),
        candidates[vec_col].alias(vec_col),
    )
    return sel.groupBy("query_id").applyInPandas(fn, _OUT_SCHEMA)


def mmr_ctes_sql(k: int, cand_cte: str = "mcand") -> str:
    """DuckDB CTE chain replaying :func:`mmr_select` (lam = 1/2) as
    unrolled greedy steps. Expects an upstream CTE
    ``{cand_cte}(query_id VARCHAR, doc_id, rel DOUBLE, v DOUBLE[])``
    holding each query's shortlist; defines ``msel{k}(query_id,
    doc_id, rel, score, sel_rank)`` — the selected set after ``k``
    steps. Every argmax, tie-break, and the ``0.5 * (rel - maxsim)``
    double expression are the bit-identical twins of the pandas
    loop."""
    # pairwise sims must be ulp-identical to the pandas loop's
    # left-to-right fold: list_dot_product's summation order is NOT
    # guaranteed to match (measured: 1e-6 flips at round-6 boundaries
    # on 5/40 shortlist pairs), so use the sequential list_reduce
    # bridge proven bit-identical in the LSH replay
    # (similarity.lsh_sig_ctes_sql).
    def fold_dot(a: str, b: str) -> str:
        return (
            "list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
            f" list_transform({a}, (x, i) -> x * {b}[i])),"
            " (acc, x) -> acc + x)"
        )

    sim = (
        f"round({fold_dot('a.v', 'b.v')}"
        f" / (sqrt({fold_dot('a.v', 'a.v')})"
        f" * sqrt({fold_dot('b.v', 'b.v')})), 6)"
    )
    parts = [
        f"msims AS MATERIALIZED (SELECT a.query_id, a.doc_id AS d1,"
        f" b.doc_id AS d2, {sim} AS sim"
        f" FROM {cand_cte} a JOIN {cand_cte} b"
        " ON a.query_id = b.query_id AND a.doc_id != b.doc_id)",
        "msel1 AS MATERIALIZED (SELECT query_id, doc_id, rel,"
        " 0.5 * (rel - 0.0) AS score, 1 AS sel_rank FROM ("
        "  SELECT *, row_number() OVER (PARTITION BY query_id"
        "   ORDER BY 0.5 * (rel - 0.0) DESC, doc_id) AS r"
        f"  FROM {cand_cte}) WHERE r = 1)",
    ]
    for t in range(2, k + 1):
        parts.append(
            f"mrem{t} AS (SELECT c.query_id, c.doc_id, c.rel,"
            " 0.5 * (c.rel - mx.maxsim) AS score"
            f" FROM {cand_cte} c"
            " JOIN (SELECT s.query_id, s.d1 AS doc_id,"
            "   max(s.sim) AS maxsim FROM msims s"
            f"   JOIN msel{t - 1} u ON u.query_id = s.query_id"
            "    AND u.doc_id = s.d2 GROUP BY s.query_id, s.d1) mx"
            "  ON mx.query_id = c.query_id AND mx.doc_id = c.doc_id"
            " WHERE NOT EXISTS (SELECT 1 FROM"
            f"  msel{t - 1} u2 WHERE u2.query_id = c.query_id"
            "  AND u2.doc_id = c.doc_id)"
            # mx's join already restricts to docs with >=1 selected
            # neighbor sim; every remaining doc qualifies because
            # msims is complete over the shortlist
            ")"
        )
        parts.append(
            f"msel{t} AS MATERIALIZED ("
            f" SELECT * FROM msel{t - 1} UNION ALL"
            f" SELECT query_id, doc_id, rel, score, {t} AS sel_rank"
            " FROM ("
            "  SELECT *, row_number() OVER (PARTITION BY query_id"
            "   ORDER BY score DESC, doc_id) AS r"
            f"  FROM mrem{t}) WHERE r = 1)"
        )
    return ", ".join(parts)
