"""Sinks: partitioned parquet / CSV writers.

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
