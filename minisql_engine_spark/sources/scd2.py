"""Slowly-changing-dimension (SCD Type 2) maintenance on snapshot
tables — the warehouse pattern for dimensions whose history matters.

A Type-2 dimension keeps one row per (key, validity interval):
attribute changes CLOSE the current row (``valid_to`` = change time,
``is_current`` = false) and INSERT a new current row, so any past
state is recoverable with an as-of predicate. This module maintains
that shape on top of :mod:`snapshots` (immutable files + manifest
commits), which adds a second, orthogonal time axis for free:
*business* time travel via ``valid_from``/``valid_to`` inside one
version, *system* time travel via snapshot versions — the
bi-temporal pair real lakehouse dimensions carry.

Semantics per :func:`scd2_apply` batch (change time ``ts``):

* a key whose batch attributes differ (null-safely) from its current
  row → current row closes at ``ts``, new current row opens at ``ts``;
* a brand-new key → one open row from ``ts``;
* a key re-presented with IDENTICAL attributes → untouched (applies
  are idempotent per content, like the dedup indexes);
* history rows are immutable — they carry through every apply.

Scale: the updates side is dimension-batch-sized and broadcasts;
history (the big side at 100 TB of history) is never shuffled — it
carries through a union. Copy-on-write of the dimension per apply
(dimensions are small next to facts); the pruned-file refinement of
``merge_snapshot_pruned`` applies if a dimension ever isn't.

Timestamps are caller-supplied integers (event-time ticks) — no
wall-clock reads, so applies are deterministic and replay-exact, and
the DuckDB oracle (:func:`scd2_apply_sql`) replays an apply
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .snapshots import (
    _commit,
    current_version,
    read_snapshot,
    write_snapshot,
)

_META = ("valid_from", "valid_to", "is_current")


def _attr_cols(df: DataFrame, key_col: str) -> list[str]:
    return [c for c in df.columns if c != key_col and c not in _META]


def scd2_init(
    df: DataFrame, path: str, key_col: str, ts: int
) -> int:
    """Create the dimension: every row open from ``ts``. ``df`` must
    be one row per key (raises otherwise — a dimension with duplicate
    current keys is corrupt from birth)."""
    if not _attr_cols(df, key_col):
        raise ValueError(
            f"dimension has no attribute columns beyond {key_col!r} — "
            "an SCD2 dimension tracks attribute history; a key-only "
            "table has nothing to version"
        )
    n, d = df.count(), df.select(key_col).distinct().count()
    if n != d:
        raise ValueError(
            f"{n - d} duplicate {key_col} rows in the initial dimension"
        )
    rows = df.select(
        "*",
        F.lit(ts).cast("bigint").alias("valid_from"),
        F.lit(None).cast("bigint").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return write_snapshot(rows, path)


def scd2_apply(
    spark: SparkSession,
    base_path: str,
    updates: DataFrame,
    key_col: str,
    ts: int,
) -> int:
    """Apply one change batch at time ``ts``; commits and returns the
    new snapshot version. ``updates`` columns = key + attributes (one
    row per key; last-writer-wins within a batch is rejected rather
    than guessed). Version pinned up front → concurrent commits
    collide on the manifest claim (lost-update safety)."""
    cur_v = current_version(base_path)
    if cur_v is None:
        raise FileNotFoundError(f"no dimension at {base_path}")
    base = read_snapshot(spark, base_path, cur_v)
    attrs = _attr_cols(updates, key_col)
    if not attrs:
        # scd2_init refuses key-only dimensions, but the snapshot
        # could have been hand-built; without this a None `differs`
        # crashes the filter expressions below with a TypeError
        raise ValueError(
            "update batch has no attribute columns beyond "
            f"{key_col!r} — nothing to version"
        )
    expected = set(_attr_cols(base, key_col))
    if set(attrs) != expected:
        raise ValueError(
            f"update attributes {sorted(attrs)} != dimension"
            f" attributes {sorted(expected)}"
        )
    n, d = updates.count(), updates.select(key_col).distinct().count()
    if n != d:
        raise ValueError(
            f"{n - d} duplicate {key_col} rows in the update batch"
        )

    cur = base.filter(F.col("is_current"))
    hist = base.filter(~F.col("is_current"))
    u = F.broadcast(
        updates.select(
            F.col(key_col).alias("_k"),
            *[F.col(c).alias(f"_u_{c}") for c in attrs],
        )
    )
    joined = cur.join(u, cur[key_col] == F.col("_k"), "left")
    differs = None
    for c in attrs:
        d_ = ~F.col(c).eqNullSafe(F.col(f"_u_{c}"))
        differs = d_ if differs is None else (differs | d_)
    # current rows: unchanged (no update row, or identical attrs)
    # carry; changed rows close at ts
    unchanged = joined.filter(
        F.col("_k").isNull() | ~differs
    ).select(*base.columns)
    closed = joined.filter(
        F.col("_k").isNotNull() & differs
    ).select(
        *[c for c in base.columns if c not in ("valid_to", "is_current")],
        F.lit(ts).cast("bigint").alias("valid_to"),
        F.lit(False).alias("is_current"),
    ).select(*base.columns)
    # inserted rows: changed keys (new attribute values) + new keys
    changed_keys = joined.filter(
        F.col("_k").isNotNull() & differs
    ).select(F.col(key_col).alias("_ck"))
    new_rows = (
        updates.join(
            F.broadcast(cur.select(F.col(key_col).alias("_ck"))),
            updates[key_col] == F.col("_ck"),
            "left_anti",
        )
        .unionByName(
            updates.join(
                F.broadcast(changed_keys),
                updates[key_col] == F.col("_ck"),
                "left_semi",
            )
        )
        .select(
            "*",
            F.lit(ts).cast("bigint").alias("valid_from"),
            F.lit(None).cast("bigint").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
        .select(*base.columns)
    )
    out = hist.unionByName(unchanged).unionByName(closed).unionByName(
        new_rows
    )
    _commit(out, base_path, cur_v + 1)
    return cur_v + 1


def scd2_current(spark: SparkSession, path: str) -> DataFrame:
    return read_snapshot(spark, path).filter(F.col("is_current"))


def scd2_as_of(spark: SparkSession, path: str, ts: int) -> DataFrame:
    """The dimension as business time ``ts`` saw it: rows whose
    validity interval covers ``ts`` (half-open [from, to))."""
    df = read_snapshot(spark, path)
    return df.filter(
        (F.col("valid_from") <= ts)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > ts))
    )


def scd2_apply_sql(
    base_table: str,
    updates_table: str,
    key_col: str,
    attrs: list[str],
    ts: int,
) -> str:
    """DuckDB oracle replaying ONE apply: history ∪ unchanged-current
    ∪ closed ∪ inserted, identical null-safe change detection."""
    differs = " OR ".join(
        f"(c.{a} IS DISTINCT FROM u.{a})" for a in attrs
    )
    alist = ", ".join(attrs)
    return (
        f"WITH cur AS (SELECT * FROM {base_table} WHERE is_current),"
        f" hist AS (SELECT * FROM {base_table} WHERE NOT is_current),"
        f" j AS (SELECT c.*, u.{key_col} AS _k,"
        f"  ({differs}) AS _diff"
        f"  FROM cur c LEFT JOIN {updates_table} u USING ({key_col})),"
        " unchanged AS (SELECT * EXCLUDE (_k, _diff) FROM j"
        "  WHERE _k IS NULL OR NOT _diff),"
        f" closed AS (SELECT {key_col}, {alist},"
        f"  valid_from, CAST({ts} AS BIGINT) AS valid_to,"
        "  FALSE AS is_current"
        "  FROM j WHERE _k IS NOT NULL AND _diff),"
        f" inserted AS (SELECT u.{key_col},"
        + ", ".join(f" u.{a}" for a in attrs)
        + f", CAST({ts} AS BIGINT) AS valid_from,"
        "  CAST(NULL AS BIGINT) AS valid_to, TRUE AS is_current"
        f"  FROM {updates_table} u LEFT JOIN j ON u.{key_col} = j._k"
        "  WHERE j._k IS NULL OR j._diff)"
        " SELECT * FROM hist UNION ALL SELECT * FROM unchanged"
        " UNION ALL SELECT * FROM closed UNION ALL SELECT * FROM inserted"
    )


def scd2_enrich_asof(
    facts: DataFrame,
    dim: DataFrame,
    key_col: str,
    ts_col: str,
) -> DataFrame:
    """Enrich each fact row with the dimension version valid AT ITS
    OWN timestamp — THE query SCD2 exists for. One range-predicate
    join on half-open [valid_from, valid_to) intervals; because the
    intervals partition time per key, each fact matches exactly one
    version. The dimension side broadcasts (dimensions are small —
    at 100 TB the FACTS are big; history is never shuffled), so the
    plan is a broadcast nested-loop/hash range join with zero fact
    movement."""
    dcols = [c for c in dim.columns if c != key_col]
    d = dim.select(
        F.col(key_col).alias("_dk"),
        *[F.col(c) for c in dcols],
    )
    cond = (
        (facts[key_col] == d["_dk"])
        & (d["valid_from"] <= facts[ts_col])
        & (d["valid_to"].isNull() | (d["valid_to"] > facts[ts_col]))
    )
    return facts.join(F.broadcast(d), cond).drop(
        "_dk", "valid_to", "is_current"
    )
