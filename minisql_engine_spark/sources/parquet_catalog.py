"""Parquet table catalog — the engine's primary source.

Reference parity: the reference eagerly loads every ``*.csv`` in a
directory into global in-memory columns and serves all queries from
that dict (``sqlengine.py:99-154, 733-747`` — operator O1/O2 in
SURVEY §2.1). Spark-first equivalent: lazily ``spark.read.parquet``
each table and register it as a temp view; Catalyst's column pruning +
predicate pushdown then subsume the reference's columnar
late-materialization trick (SURVEY §1.2, §4.1).

Scale notes: nothing is materialized at load; the vectorized Parquet
reader gets filter/column pushdown from the plan, partition sizing is
governed by ``spark.sql.files.maxPartitionBytes`` (128 MB default —
right for a 1000-executor scan of 100 TB), and small dimension tables
are broadcast by Catalyst at join time.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# The driver-testdata star schema (TESTDATA.md).
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _nanos_timestamp_fields(path: str) -> list[str]:
    """Names of TIMESTAMP(NANOS) columns in a parquet file/dir footer.

    Footer-only inspection via pyarrow — no data read. Directories are
    probed through their first part-file (layouts are homogeneous).
    """
    try:
        import pyarrow.parquet as pq
        import pyarrow.types as pat
    except ImportError:  # pragma: no cover — pyarrow is baked in
        return []
    probe = path
    if os.path.isdir(path):
        parts = sorted(
            f for f in os.listdir(path)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        if not parts:
            return []
        probe = os.path.join(path, parts[0])
    try:
        schema = pq.read_schema(probe)
    except Exception:
        return []
    return [
        f.name
        for f in schema
        if pat.is_timestamp(f.type) and f.type.unit == "ns"
    ]


# Memoized lazy DataFrames, per session (weak — a stopped session's
# entries die with it) then keyed by (dir, table). A DataFrame is an
# immutable logical plan, so handing the same object to every caller
# is safe — and spark.read.parquet costs a py4j round-trip plus JVM
# file listing (~50-100 ms), which a 7-table TPC-H query would
# otherwise pay 7× on every plan build. NOTE the memoized plan pins
# the file listing taken at first read; after overwriting a table
# path in-place, call clear_table_cache().
import weakref

_TABLE_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def clear_table_cache() -> None:
    """Drop memoized table handles (tests / layout changes)."""
    _TABLE_CACHE.clear()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazily open one parquet table under ``sf_dir`` (memoized).

    Handles TIMESTAMP(NANOS) parquet columns (e.g. ``events.ts``),
    which Spark's vectorized reader rejects by default: ONLY when the
    footer actually declares a nanos field we read nanos as LongType
    (``spark.sql.legacy.parquet.nanosAsLong``) and restore a proper
    microsecond TimestampType column for every such field — generic
    over table/column names, semantics preserved, still fully
    pushdown/prune-friendly. Tables without nanos columns never touch
    the legacy conf, so other reads in the session are unaffected.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    per_session = _TABLE_CACHE.setdefault(spark, {})
    key = (sf_dir, name)
    cached = per_session.get(key)
    if cached is not None:
        return cached

    path = os.path.join(sf_dir, f"{name}.parquet")
    nanos_cols = _nanos_timestamp_fields(path)
    if nanos_cols:
        # Session-level by necessity (the lazy plan reads the conf at
        # execution); repair below is generic so any nanos table read
        # through this loader comes back as proper timestamps.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    by_name = {f.name: f for f in df.schema.fields}
    for col in nanos_cols:
        fld = by_name.get(col)
        if fld is not None and isinstance(fld.dataType, LongType):
            df = df.withColumn(
                col, F.timestamp_micros(F.expr(f"`{col}` div 1000"))
            )
    # Parquet files written with isAdjustedToUTC=false surface as
    # TIMESTAMP_NTZ, which watermarks / unix_micros / interval
    # arithmetic reject. The session tz is pinned to UTC
    # (session.py), so the NTZ wall clock IS the instant and the
    # LTZ cast is value-preserving; pushdown/pruning are unaffected
    # (the cast sits above the scan, filters on other columns still
    # reach the reader).
    for fld in df.schema.fields:
        if isinstance(fld.dataType, TimestampNTZType):
            df = df.withColumn(
                fld.name, F.col(fld.name).cast("timestamp")
            )
    per_session[key] = df
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Lazily open every parquet table under ``sf_dir``.

    Missing files are skipped so the loader works on partial layouts
    (the reference tolerates an empty CSV the same way,
    ``sqlengine.py:133-135``).
    """
    out: dict[str, DataFrame] = {}
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = load_table(spark, sf_dir, name)
    return out


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register each table as a temp view (the engine's catalog.

    Mirrors the reference's metadata catalog (``sqlengine.py:106-120``)
    via ``spark.catalog``; views make both front doors work — the
    DataFrame API and ``spark.sql`` strings.
    """
    dfs = load_tables(spark, sf_dir, tables)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
