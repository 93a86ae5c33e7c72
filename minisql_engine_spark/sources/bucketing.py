"""Bucketed tables: co-located, shuffle-free joins.

The single biggest repeated-join lever at 100 TB (SURVEY §7 /
BASELINE.json scale mandate): hash-bucketing fact tables on their
join key at write time makes every subsequent equi-join on that key
shuffle-FREE — both sides are already partitioned identically, so
Catalyst plans a SortMergeJoin with no Exchange on either side
(verified by plan assertion in tests/test_bucketing.py).

Spark bucketing requires the table catalog (``saveAsTable``); data
lands in the session's warehouse dir (``spark.sql.warehouse.dir``).
Use for dimensions/facts that are joined repeatedly on a stable key —
the write-side shuffle is paid once instead of per query.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str] | str,
    n_buckets: int = 16,
    sort_by: Sequence[str] | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-ordered)
    catalog table. Sorting within buckets additionally removes the
    sort from future sort-merge joins."""
    keys = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    w = df.write.mode(mode).bucketBy(n_buckets, *keys)
    if sort_by:
        sorts = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        w = w.sortBy(*sorts)
    w.format("parquet").saveAsTable(table)


def drop_bucketed(spark: SparkSession, table: str) -> None:
    """Drop a bucketed catalog table AND its warehouse location.

    A managed-table location can survive as an orphan when a previous
    session died between write and catalog commit; ``saveAsTable`` then
    fails with LOCATION_ALREADY_EXISTS even in overwrite mode. Cleanup
    goes through the Hadoop FileSystem API so it works on any
    Hadoop-compatible store (local, HDFS, S3A), not just local disk.

    Deletion is guarded, never guessed: for a cataloged table the REAL
    location comes from ``DESCRIBE TABLE EXTENDED`` (correct in any
    database) and is removed only for MANAGED tables — an external
    table's data is never touched. For the catalog-less orphan case
    the ``{warehouse}/{table}`` fallback applies only to unqualified
    (default-database) names and only if the directory exists."""
    managed_location: str | None = None
    if spark.catalog.tableExists(table):
        info = {
            r["col_name"]: r["data_type"]
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
        }
        if info.get("Type", "").upper() == "MANAGED":
            managed_location = info.get("Location")
        spark.sql(f"DROP TABLE IF EXISTS {table}")
    jvm = spark._jvm
    if managed_location is not None:
        # DROP TABLE usually removed the data already; sweep leftovers
        path = jvm.org.apache.hadoop.fs.Path(managed_location)
    elif "." not in table:
        wh = spark.conf.get("spark.sql.warehouse.dir")
        path = jvm.org.apache.hadoop.fs.Path(f"{wh}/{table.lower()}")
    else:
        return  # qualified name, not in catalog: no safe path to guess
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(path):
        fs.delete(path, True)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str]
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key —
    plans with zero Exchange when bucket counts match."""
    return spark.table(left_table).join(spark.table(right_table), on=list(on))
