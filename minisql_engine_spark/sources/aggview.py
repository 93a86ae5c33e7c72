"""Incremental materialized aggregate view — batch-over-batch stats
without rescanning the corpus.

The lakehouse sibling of the incremental dedup indexes
(``operators/dedup_index.py``, ``operators/neardup_index.py``): a
persisted per-group aggregate table that each new ingest batch UPDATES
with a delta aggregate instead of recomputing over all admitted data.
At 100 TB the full recompute is a corpus scan; the incremental update
scans only the batch and joins a group-cardinality-sized state table —
the classic incremental view maintenance (IVM) contract for
distributive aggregates.

Supported measure kinds (all distributive, so ``merge(state, delta)``
is exact and the view provably equals the full recompute):

  ``count``  row count — merged by ``+`` (absent side = 0).
  ``sum``    integral sum — state is DECIMAL(38,0) so the merge can
             never overflow mid-stream; read edge returns BIGINT.
  ``dsum``   floating sum — routed through DECIMAL(25,6) exactly like
             ``operators/relational.exact_sum``: decimal addition is
             associative, so batch-split == full recompute BIT-FOR-BIT
             (a double sum would drift with batch boundaries); read
             edge returns DOUBLE.
  ``min``/``max`` — merged by least/greatest (both engines skip NULLs
             and return NULL only when every input is NULL).

NULL policy matches ANSI: a group whose measure column is entirely
NULL holds a NULL sum/min/max (the merge keeps NULL only when BOTH
sides are NULL), and ``count`` counts rows, never NULLs away.

AVG is intentionally not a state kind — it is not distributive;
derive it at read time as ``dsum/count`` (exact inputs, one double
divide — the ``exact_avg`` rule).

Durability follows ``operators/dedup_index.compact_index``: updates
write a sibling temp dir then swap, so a crash mid-update never leaves
a half-written view. Single-writer contract, like the snapshot tables
(``sources/snapshots.py``).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: transaction marker INSIDE the view directory — underscore-prefixed
#: so parquet readers treat it as hidden metadata (the _SUCCESS rule),
#: and swapped atomically WITH the data it describes.
_TXN_FILE = "_applied_batch.json"


def _read_txn(path: str) -> int:
    p = os.path.join(path, _TXN_FILE)
    if not os.path.exists(p):
        return -1
    with open(p) as f:
        return int(json.load(f)["last_applied_batch"])


def _write_txn(dirpath: str, batch_id: int) -> None:
    with open(os.path.join(dirpath, _TXN_FILE), "w") as f:
        json.dump({"last_applied_batch": int(batch_id)}, f)

#: measure kinds → True when the merge identity is 0 (additive kinds)
_ADDITIVE = {"count", "sum", "dsum"}
_KINDS = ("count", "sum", "dsum", "min", "max")

#: decimal state types (see module docstring)
_SUM_STATE = "decimal(38,0)"
_DSUM_STATE = "decimal(25,6)"


def _check(measures: dict[str, tuple[str, str | None]]) -> None:
    for out, (kind, col) in measures.items():
        if kind not in _KINDS:
            raise ValueError(
                f"measure {out!r}: unknown kind {kind!r}; use {_KINDS}"
            )
        if kind != "count" and not col:
            raise ValueError(f"measure {out!r}: kind {kind!r} needs a column")


def _delta_agg(
    df: DataFrame,
    group_col: str,
    measures: dict[str, tuple[str, str | None]],
) -> DataFrame:
    """One batch's aggregate in STATE types (the mergeable form)."""
    aggs: list[Column] = []
    for out, (kind, col) in measures.items():
        if kind == "count":
            aggs.append(F.count("*").cast("bigint").alias(out))
        elif kind == "sum":
            aggs.append(F.sum(F.col(col).cast(_SUM_STATE)).alias(out))
        elif kind == "dsum":
            aggs.append(F.sum(F.col(col).cast(_DSUM_STATE)).alias(out))
        elif kind == "min":
            aggs.append(F.min(col).alias(out))
        else:
            aggs.append(F.max(col).alias(out))
    return df.groupBy(F.col(group_col)).agg(*aggs)


def init_agg_view(
    df: DataFrame,
    path: str,
    group_col: str,
    measures: dict[str, tuple[str, str | None]],
) -> None:
    """Create (or overwrite) the view from an initial batch."""
    _check(measures)
    _delta_agg(df, group_col, measures).write.mode("overwrite").parquet(
        path
    )


def update_agg_view(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    group_col: str,
    measures: dict[str, tuple[str, str | None]],
    batch_id: int | None = None,
) -> bool:
    """Merge one batch's delta into the stored view (tmp-then-swap).

    The batch is the ONLY corpus-scale input: the stored side has one
    row per group, so the full-outer merge join is state-sized — at a
    fixed cluster both sides would bucket by the group key and the
    merge never reshuffles the batch's raw rows.

    ``batch_id`` makes the update TRANSACTIONAL for at-least-once
    streams (aggregation, unlike index admission, is not idempotent —
    a replayed batch would double-count): pass the foreachBatch epoch
    id and the update is applied exactly once — a replay of an
    already-applied id is a no-op (returns False). The marker file
    lives INSIDE the view directory and swaps atomically with the
    data it describes, so a crash between merge and marker cannot
    desynchronize them. Ids are compared by ``<=`` against the last
    applied id — valid because foreachBatch epoch ids are
    monotonically increasing within one checkpoint lineage; on
    checkpoint loss, reset the view too (the standard transactional-
    sink contract)."""
    _check(measures)
    if batch_id is not None and batch_id <= _read_txn(path):
        return False
    delta = _delta_agg(batch, group_col, measures)
    stored = spark.read.parquet(path)
    a = stored.select(
        F.col(group_col).alias("_g"),
        *[F.col(o).alias(f"_a_{o}") for o in measures],
    )
    b = delta.select(
        F.col(group_col).alias("_g"),
        *[F.col(o).alias(f"_b_{o}") for o in measures],
    )
    # null-safe key merge: GROUP BY puts all NULL keys in ONE group,
    # so the state/delta join must match NULL to NULL — a plain
    # full_outer on "_g" never matches NULLs and would fork a second
    # NULL-group row every batch, diverging from the recompute oracle.
    merged_cols: list[Column] = [
        F.coalesce(a["_g"], b["_g"]).alias(group_col)
    ]
    for out, (kind, _col) in measures.items():
        av, bv = F.col(f"_a_{out}"), F.col(f"_b_{out}")
        if kind == "count":
            m = F.coalesce(av, F.lit(0)) + F.coalesce(bv, F.lit(0))
        elif kind in _ADDITIVE:
            # NULL only when both sides are NULL (ANSI sum semantics)
            m = (
                F.when(av.isNull(), bv)
                .when(bv.isNull(), av)
                .otherwise(av + bv)
            )
        elif kind == "min":
            m = F.least(av, bv)
        else:
            m = F.greatest(av, bv)
        merged_cols.append(m.alias(out))
    merged = a.join(
        b, a["_g"].eqNullSafe(b["_g"]), "full_outer"
    ).select(*merged_cols)

    tmp = path.rstrip("/") + ".update-tmp"
    merged.write.mode("overwrite").parquet(tmp)
    if batch_id is not None:
        _write_txn(tmp, batch_id)
    bak = path.rstrip("/") + ".update-old"
    shutil.move(path, bak)
    shutil.move(tmp, path)
    shutil.rmtree(bak)
    return True


def read_agg_view(
    spark: SparkSession,
    path: str,
    measures: dict[str, tuple[str, str | None]],
) -> DataFrame:
    """The view with read-edge casts applied: ``sum`` → BIGINT,
    ``dsum`` → DOUBLE (exact decimal state cast once at the edge —
    the ``exact_sum`` rule), others unchanged."""
    _check(measures)
    df = spark.read.parquet(path)
    cols = []
    for c in df.columns:
        if c in measures and measures[c][0] == "sum":
            cols.append(F.col(c).cast("bigint").alias(c))
        elif c in measures and measures[c][0] == "dsum":
            cols.append(F.col(c).cast("double").alias(c))
        else:
            cols.append(F.col(c))
    return df.select(*cols)


def agg_view_sql(
    table: str,
    group_col: str,
    measures: dict[str, tuple[str, str | None]],
) -> str:
    """DuckDB twin: the FULL recompute the incremental view must
    equal — identical decimal routing, term for term. This is the IVM
    correctness oracle, not a replay of the merge."""
    _check(measures)
    aggs = []
    for out, (kind, col) in measures.items():
        if kind == "count":
            aggs.append(f"CAST(count(*) AS BIGINT) AS {out}")
        elif kind == "sum":
            aggs.append(
                f"CAST(sum(CAST({col} AS DECIMAL(38,0))) AS BIGINT)"
                f" AS {out}"
            )
        elif kind == "dsum":
            aggs.append(
                f"CAST(sum(CAST({col} AS DECIMAL(25,6))) AS DOUBLE)"
                f" AS {out}"
            )
        else:
            aggs.append(f"{kind}({col}) AS {out}")
    return (
        f"SELECT {group_col}, {', '.join(aggs)} FROM {table}"
        f" GROUP BY {group_col} ORDER BY {group_col}"
    )
