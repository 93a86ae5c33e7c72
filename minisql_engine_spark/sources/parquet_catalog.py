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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazily open one parquet table under ``sf_dir``.

    Handles TIMESTAMP(NANOS) parquet columns (the ``events`` table),
    which Spark's vectorized reader rejects by default: we read nanos
    as LongType (``spark.sql.legacy.parquet.nanosAsLong``) and restore
    a proper microsecond TimestampType column — semantics preserved,
    still fully pushdown/prune-friendly.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    path = os.path.join(sf_dir, f"{name}.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if name == "events":
        ts_field = next((f for f in df.schema.fields if f.name == "ts"), None)
        if ts_field is not None and isinstance(ts_field.dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
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
