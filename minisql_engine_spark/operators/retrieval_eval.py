"""IR evaluation metrics — nDCG@k, MRR@k, precision@k, recall@k.

The missing fourth piece of the retrieval family (BM25 ranking, RRF
fusion, MMR re-ranking — and now the EVALUATION of any of them):
a training-data pipeline that mines documents by retrieval needs the
standard TREC metrics to tune k1/b, fusion depth, or embedding
models, and an eval harness is only trustworthy if its arithmetic is
replayable — so, like everything in this package, every number here
is DuckDB-oracle-exact. (Reference scope note: ``sqlengine.py``
1-753 has no retrieval surface at all; extension, SURVEY §2.4
retrieval family.)

Definitions (graded relevance, the burst/"exp" DCG form):

    DCG@k  = Σ_{i ≤ k} (2^rel_i − 1) / log2(i + 1)
    IDCG@k = DCG@k of that query's OWN qrels sorted rel-descending
    nDCG@k = DCG@k / IDCG@k           (NULL when the query has no
                                       relevant documents)
    MRR@k  = 1 / rank of the first rel>0 hit (0.0 when no hit ≤ k;
                                       NULL when the query is unjudged)
    P@k    = |hits ≤ k| / k           (NULL when the query is unjudged)
    R@k    = |hits ≤ k| / |relevant|  (NULL when none relevant)

Unjudged queries (no qrels at all, n_rel = 0) emit NULL for every
metric — trec_eval averages only over judged queries, so scoring
them 0.0 would deflate the macro row. NULLs are skipped by the
macro average (count() over the non-NULL rows).

Float policy (operators/portable_round.py): 2^rel is an exact power
of two, log2(i+1) is the irrational-class denominator, per-query
sums ride ``dsum`` (order-independent), every emitted metric goes
through the portable ``fx6`` edge — MRR and P@k are integer ratios,
exactly the tie-prone rational class the policy exists for.

Plan shape (scale notes): ``run`` arrives already top-k per query
(k·|queries| rows — tiny); ``qrels`` joins it on (query, doc) with a
broadcast of the run when queries are few, and the only other qrels
pass is one (query) aggregate for |relevant| and IDCG (a window over
per-query qrels restricted to the top-k rels). Nothing is ever
collected; the macro row is one more tiny aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from minisql_engine_spark.operators.portable_round import (
    dsum as _dsum,
    dsum_sql as _dsum_sql,
    fx6 as _fx6,
    fx6_sql as _fx6_sql,
)

MACRO = "_macro_"


def ir_metrics(
    run: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """(query_id, n_rel, ndcg_at_k, mrr_at_k, precision_at_k,
    recall_at_k) per query, plus one ``query_id = '_macro_'`` row with
    the macro averages over queries (NULL metrics skipped, the
    standard trec_eval convention). ``run`` holds ranked lists
    (rank 1 = best); ``qrels`` graded integer relevance — pairs
    absent from ``qrels`` count as rel 0."""
    q = F.col(query_col).cast("string").alias("q")
    r = (
        run.filter(F.col(rank_col) <= k)
        .select(
            q,
            F.col(doc_col).alias("d"),
            F.col(rank_col).cast("bigint").alias("rank"),
        )
    )
    qr = qrels.select(
        F.col(query_col).cast("string").alias("q"),
        F.col(doc_col).alias("d"),
        F.col(rel_col).cast("bigint").alias("rel"),
    ).filter(F.col("rel") > 0)

    # gains of the ranked lists (absent qrel pair -> rel 0)
    scored = r.join(qr, ["q", "d"], "left").select(
        "q",
        "rank",
        F.coalesce(F.col("rel"), F.lit(0)).alias("rel"),
    )
    gain = (
        F.pow(F.lit(2.0), F.col("rel").cast("double")) - F.lit(1.0)
    ) / F.log2(F.col("rank").cast("double") + F.lit(1.0))
    per_q = scored.groupBy("q").agg(
        _dsum(gain).alias("_dcg"),
        F.min(F.when(F.col("rel") > 0, F.col("rank"))).alias("_first"),
        F.sum((F.col("rel") > 0).cast("int"))
        .cast("bigint")
        .alias("_hits"),
    )

    # ideal DCG: each query's own qrels, rel-descending, top k
    iw = Window.partitionBy("q").orderBy(
        F.col("rel").desc(), F.col("d")
    )
    ideal = (
        qr.withColumn("irank", F.row_number().over(iw))
        .filter(F.col("irank") <= k)
        .groupBy("q")
        .agg(
            _dsum(
                (
                    F.pow(F.lit(2.0), F.col("rel").cast("double"))
                    - F.lit(1.0)
                )
                / F.log2(F.col("irank").cast("double") + F.lit(1.0))
            ).alias("_idcg")
        )
    )
    n_rel = qr.groupBy("q").agg(
        F.count("*").cast("bigint").alias("n_rel")
    )

    per = (
        per_q.join(ideal, "q", "left")
        .join(n_rel, "q", "left")
        .select(
            F.col("q").alias(query_col),
            F.coalesce(F.col("n_rel"), F.lit(0))
            .cast("bigint")
            .alias("n_rel"),
            F.when(
                F.col("_idcg") > 0,
                _fx6(F.col("_dcg") / F.col("_idcg")),
            ).alias("ndcg_at_k"),
            F.when(
                F.col("n_rel") > 0,
                _fx6(
                    F.coalesce(
                        F.lit(1.0) / F.col("_first").cast("double"),
                        F.lit(0.0),
                    )
                ),
            ).alias("mrr_at_k"),
            F.when(
                F.col("n_rel") > 0,
                _fx6(
                    F.col("_hits").cast("double") / F.lit(float(k))
                ),
            ).alias("precision_at_k"),
            F.when(
                F.col("n_rel") > 0,
                _fx6(
                    F.col("_hits").cast("double")
                    / F.col("n_rel").cast("double")
                ),
            ).alias("recall_at_k"),
        )
    )
    # NOTE (optimization r14, measured and rejected): an eager
    # localCheckpoint on `per` before the macro union LOOKS like it
    # should halve the run ⋈ qrels subtree, but the union's two
    # branches already share every Exchange via ReusedExchange inside
    # the single plan, so the "double execution" costs only the tiny
    # post-shuffle stages — the checkpoint's serial barrier measured
    # 4.4 → 5.7 s on the driver row and was reverted.
    macro = per.agg(
        F.lit(MACRO).alias(query_col),
        F.sum("n_rel").cast("bigint").alias("n_rel"),
        _fx6(_dsum(F.col("ndcg_at_k")) / F.count("ndcg_at_k")).alias(
            "ndcg_at_k"
        ),
        _fx6(_dsum(F.col("mrr_at_k")) / F.count("mrr_at_k")).alias(
            "mrr_at_k"
        ),
        _fx6(
            _dsum(F.col("precision_at_k")) / F.count("precision_at_k")
        ).alias("precision_at_k"),
        _fx6(
            _dsum(F.col("recall_at_k")) / F.count("recall_at_k")
        ).alias("recall_at_k"),
    )
    return per.unionByName(macro).orderBy(query_col)


def ir_metrics_sql(
    run_cte: str,
    qrels_cte: str,
    k: int = 10,
    query_col: str = "query_id",
) -> str:
    """DuckDB twin of :func:`ir_metrics` — identical gains, exact
    DECIMAL sums, and portable fx6 edges, term for term. ``run_cte``
    must yield (query_id, doc_id, rank) and ``qrels_cte``
    (query_id, doc_id, rel); both are embedded as named CTEs. The
    result selects the same six columns."""
    gain = (
        "(power(2.0, CAST(rel AS DOUBLE)) - 1.0)"
        " / log2(CAST(rank AS DOUBLE) + 1.0)"
    )
    igain = (
        "(power(2.0, CAST(rel AS DOUBLE)) - 1.0)"
        " / log2(CAST(irank AS DOUBLE) + 1.0)"
    )
    return (
        f"WITH ir_run AS MATERIALIZED ({run_cte}),"
        f" ir_qr0 AS MATERIALIZED ({qrels_cte}),"
        " ir_qr AS (SELECT CAST(query_id AS VARCHAR) AS q, doc_id AS d,"
        "  CAST(rel AS BIGINT) AS rel FROM ir_qr0 WHERE rel > 0),"
        " ir_sc AS (SELECT CAST(r.query_id AS VARCHAR) AS q, r.rank,"
        "  COALESCE(qr.rel, 0) AS rel"
        f"  FROM ir_run r LEFT JOIN ir_qr qr"
        "   ON qr.q = CAST(r.query_id AS VARCHAR) AND qr.d = r.doc_id"
        f"  WHERE r.rank <= {k}),"
        " ir_pq AS (SELECT q,"
        f"  {_dsum_sql(gain)} AS dcg,"
        "  min(CASE WHEN rel > 0 THEN rank END) AS first_hit,"
        "  CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        "   AS hits"
        "  FROM ir_sc GROUP BY q),"
        " ir_ideal AS (SELECT q,"
        f"  {_dsum_sql(igain)} AS idcg FROM ("
        "   SELECT q, rel, row_number() OVER (PARTITION BY q"
        "    ORDER BY rel DESC, d) AS irank FROM ir_qr)"
        f"  WHERE irank <= {k} GROUP BY q),"
        " ir_nrel AS (SELECT q, CAST(count(*) AS BIGINT) AS n_rel"
        "  FROM ir_qr GROUP BY q),"
        " ir_per AS (SELECT"
        f"  p.q AS {query_col},"
        "  COALESCE(n.n_rel, 0) AS n_rel,"
        "  CASE WHEN i.idcg > 0 THEN"
        f"   {_fx6_sql('p.dcg / i.idcg')} END AS ndcg_at_k,"
        "  CASE WHEN COALESCE(n.n_rel, 0) > 0 THEN"
        f"   {_fx6_sql('COALESCE(1.0 / CAST(p.first_hit AS DOUBLE), 0.0)')}"
        "   END AS mrr_at_k,"
        "  CASE WHEN COALESCE(n.n_rel, 0) > 0 THEN"
        f"   {_fx6_sql(f'CAST(p.hits AS DOUBLE) / {float(k)!r}')}"
        "   END AS precision_at_k,"
        "  CASE WHEN COALESCE(n.n_rel, 0) > 0 THEN"
        f"   {_fx6_sql('CAST(p.hits AS DOUBLE) / CAST(n.n_rel AS DOUBLE)')}"
        "   END AS recall_at_k"
        "  FROM ir_pq p LEFT JOIN ir_ideal i ON i.q = p.q"
        "  LEFT JOIN ir_nrel n ON n.q = p.q),"
        " ir_macro AS (SELECT"
        f"  '{MACRO}' AS {query_col},"
        "  CAST(sum(n_rel) AS BIGINT) AS n_rel,"
        f"  {_fx6_sql(_dsum_sql('ndcg_at_k') + ' / count(ndcg_at_k)')}"
        "   AS ndcg_at_k,"
        f"  {_fx6_sql(_dsum_sql('mrr_at_k') + ' / count(mrr_at_k)')}"
        "   AS mrr_at_k,"
        f"  {_fx6_sql(_dsum_sql('precision_at_k') + ' / count(precision_at_k)')}"
        "   AS precision_at_k,"
        f"  {_fx6_sql(_dsum_sql('recall_at_k') + ' / count(recall_at_k)')}"
        "   AS recall_at_k"
        "  FROM ir_per)"
        f" SELECT * FROM ir_per UNION ALL SELECT * FROM ir_macro"
        f" ORDER BY {query_col}"
    )
