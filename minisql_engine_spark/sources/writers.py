"""Sinks/sources: partitioned parquet, CSV, JSON-lines, ORC.

The reference is strictly read-only (tables appear by dropping files
in a directory, ``README.md:16``; SURVEY §2.2 DDL/DML row) — writes
are part of completing it into a usable engine. Thin, opinionated
wrappers over ``df.write``:

* parquet is the primary format (columnar, statistics, pushdown on
  re-read);
* ``partition_by`` columns become directory partitions → partition
  pruning on read (the 100 TB layout lever: choose low-cardinality,
  filter-heavy keys like date buckets);
* ``max_records_per_file`` guards against giant files from skewed
  partitions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.parquet(path)


def write_csv(
    df: DataFrame, path: str, mode: str = "overwrite", header: bool = True
) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def read_back(spark: SparkSession, path: str) -> DataFrame:
    """Re-open a written dataset (partition columns are restored)."""
    return spark.read.parquet(path)


# ---------------------------------------------------------------------------
# JSON-lines — the LLM-pipeline interchange format
# ---------------------------------------------------------------------------


def write_jsonl(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
    compression: str | None = "gzip",
) -> None:
    """One JSON object per line (Spark's native ``json`` sink).

    The interchange format of document/training-data pipelines:
    line-splittable (every worker can start at any newline), so a
    100 TB dump stays fully parallel on re-read — with ``gzip`` each
    FILE is one split, so pair compression with ``partition_by`` /
    ``maxRecordsPerFile`` sizing rather than giant single files.
    """
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema=None,
) -> DataFrame:
    """Read JSON-lines. ALWAYS pass ``schema`` in production: without
    one Spark runs a full inference pass over the data (a second
    100 TB scan before the first real job), and a single malformed
    row can silently widen a column to string. With an explicit
    schema, corrupt rows land in ``_corrupt_record`` instead
    (PERMISSIVE mode) and the read is one pass.
    """
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


# ---------------------------------------------------------------------------
# ORC — the other columnar format (Hive-ecosystem interop)
# ---------------------------------------------------------------------------


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Columnar ORC sink — same pushdown/pruning story as parquet
    (Spark's vectorized ORC reader honors filters and column
    selection), for pipelines whose downstream is Hive/Trino."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
