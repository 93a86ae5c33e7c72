"""Leakage-safe dataset splits: train/val/test at CLUSTER granularity.

Random per-document splits leak: near-duplicate documents land on
both sides of the train/test boundary and the held-out set stops
measuring generalization (the published failure mode behind
train-test contamination in web-scale corpora). The fix is to split
at the granularity of near-duplicate CLUSTERS — every document in a
cluster goes to the same split — and to make the assignment a pure
function of stable content identity, not of row order or partition
layout.

``leakage_safe_split`` composes the engine's existing machinery:

* verified near-dup PAIRS (any detector: MinHash+LSH, SimHash,
  n-gram Jaccard, embedding cosine) →
  ``clustering.connected_components`` → each clustered doc's
  canonical representative (min reachable id);
* singletons (docs in no pair) are their own representative;
* split = bucket of ``md5(representative)`` — deterministic,
  uniform, stable under re-sharding, growth of the corpus, and id
  scheme (the md5-derived-bucket family every sketch in this engine
  uses, so the SQL oracle replays the assignment exactly).

Default buckets 8/1/1 of 10 → 80/10/10. The leakage guarantee is
structural — both ends of every pair share a representative by
construction — and the driver entry re-checks it anyway (a pair
straddling two splits raises), so a future change to the
representative derivation cannot silently regress.

Scale notes (100 TB): the component map is PAIR-GRAPH-sized (near
dups only — orders of magnitude smaller than the corpus) and is
broadcast into the corpus-side left join; md5 + bucket arithmetic
are per-row JVM expressions; nothing shuffles the corpus.

Cites the reference only for contrast: ``sqlengine.py`` has no
sampling/split surface; extension (SURVEY.md §2.4 dedup family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from minisql_engine_spark.operators.clustering import connected_components

#: total hash buckets and the train/val boundary defaults
N_BUCKETS = 10


def split_of_bucket(bucket, train_buckets: int, val_buckets: int):
    """CASE expression mapping a bucket ordinal to its split name."""
    return (
        F.when(bucket < F.lit(train_buckets), F.lit("train"))
        .when(bucket < F.lit(train_buckets + val_buckets), F.lit("val"))
        .otherwise(F.lit("test"))
    )


def assign_bucket(rep, n_buckets: int = N_BUCKETS):
    """Deterministic bucket in [0, n_buckets) from the representative
    id: first 8 hex chars of md5(rep as string) read as an integer,
    mod n_buckets. ``conv`` is exact for 8 hex digits (< 2^32)."""
    return (
        F.conv(F.substring(F.md5(rep.cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % n_buckets
    )


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    n_buckets: int = N_BUCKETS,
    train_buckets: int = 8,
    val_buckets: int = 1,
) -> DataFrame:
    """(id_col, rep, bucket, split) for every document: ``rep`` is
    the near-dup cluster representative (min reachable id; the doc's
    own id for singletons), ``split`` the md5-bucket assignment of
    ``rep`` — so both ends of every verified pair always share a
    split."""
    comp = connected_components(pairs, id_a=id_a, id_b=id_b)
    out = (
        docs.select(id_col)
        .join(
            F.broadcast(comp.withColumnRenamed("id", id_col)),
            id_col,
            "left",
        )
        .select(
            id_col,
            F.coalesce(F.col("component"), F.col(id_col))
            .cast("long")
            .alias("rep"),
        )
        .withColumn("bucket", assign_bucket(F.col("rep"), n_buckets))
    )
    return out.select(
        id_col,
        "rep",
        "bucket",
        split_of_bucket(F.col("bucket"), train_buckets, val_buckets)
        .alias("split"),
    )


def split_bucket_sql(rep_expr: str, n_buckets: int = N_BUCKETS) -> str:
    """DuckDB twin of :func:`assign_bucket`: hex-digit fold of the
    first 8 md5 chars (doubles hold integers < 2^53 exactly; the sum
    is < 2^32) mod ``n_buckets``."""
    return (
        "(CAST(list_sum([(strpos('0123456789abcdef',"
        f" substr(md5(CAST({rep_expr} AS VARCHAR)), i, 1)) - 1)"
        " * power(16, 8 - i) for i in range(1, 9)]) AS BIGINT)"
        f" % {n_buckets})"
    )
