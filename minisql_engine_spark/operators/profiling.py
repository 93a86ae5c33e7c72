"""Exact table profiling: the DESCRIBE/SUMMARY surface, oracle-exact.

One row per column — row count, null count, exact distinct count, and
typed min/max (numeric columns as doubles, strings under binary
collation; arrays/binary/timestamps profile counts only) — the data-
quality audit every ingestion step runs before heavier curation.

Plan: one aggregate per column over a SINGLE-COLUMN pruned scan,
unioned. Deliberately not the single-pass multi-distinct aggregate:
N exact ``count(DISTINCT …)`` in one aggregate plans through an
``Expand`` that multiplies every row (N+1)× before the shuffle,
while N independent single-column scans each read one parquet column
chunk and run embarrassingly parallel — at 100 TB the pruned scans
are the cheaper and more elastic shape (and the first thing a
profiler must not do is read the full width of the table N times).

``dtype`` is taken from the DataFrame schema; the generated oracle
embeds the same names as literals (the oracle checks the DATA stats —
DuckDB has no opinion on Spark type names).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from minisql_engine_spark.operators.portable_round import fx6g as _fx6g
from minisql_engine_spark.operators.portable_round import fx6g_sql as _fx6g_sql
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def _kind(dt: T.DataType) -> str:
    if isinstance(dt, _NUMERIC):
        return "num"
    if isinstance(dt, T.StringType):
        return "str"
    return "other"


def profile_table(df: DataFrame) -> DataFrame:
    """(column, dtype, n_rows, n_nulls, n_distinct, min_num, max_num,
    min_str, max_str) — one row per column, ordered by column name."""
    parts = []
    for field in df.schema.fields:
        c, kind = field.name, _kind(field.dataType)
        x = F.col(c)
        num = x.cast("double") if kind == "num" else F.lit(None).cast("double")
        s = x if kind == "str" else F.lit(None).cast("string")
        parts.append(
            df.select(c).agg(
                F.lit(c).alias("column"),
                F.lit(field.dataType.simpleString()).alias("dtype"),
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                (F.count(F.lit(1)) - F.count(x)).cast("bigint").alias("n_nulls"),
                F.countDistinct(x).cast("bigint").alias("n_distinct"),
                _fx6g(F.min(num)).alias("min_num"),
                _fx6g(F.max(num)).alias("max_num"),
                F.min(s).alias("min_str"),
                F.max(s).alias("max_str"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("column")


_NUM_NAMES = (
    "tinyint",
    "smallint",
    "int",
    "bigint",
    "float",
    "double",
    "decimal",
)


def _kind_of_name(dtype: str) -> str:
    if dtype == "string":
        return "str"
    if any(dtype == n or dtype.startswith("decimal") for n in _NUM_NAMES):
        return "num"
    return "other"


def profile_table_sql_from_schema(
    table: str, fields: "list[tuple[str, str]]"
) -> str:
    """DuckDB oracle twin from a static (name, spark-dtype-string)
    list — usable where no SparkSession exists (the driver registry
    builds oracle strings at import time). The ``dtype`` literal
    echoes the Spark name; the oracle verifies the DATA statistics.

    Count-distinct caveat shared with the Spark side: both engines
    exclude NULL from ``count(DISTINCT …)`` and compare strings under
    binary collation, so every stat is portable."""
    selects = []
    for c, dtype in fields:
        kind = _kind_of_name(dtype)
        num = f"CAST({c} AS DOUBLE)" if kind == "num" else "CAST(NULL AS DOUBLE)"
        s = c if kind == "str" else "CAST(NULL AS VARCHAR)"
        selects.append(
            f'SELECT \'{c}\' AS "column", \'{dtype}\' AS dtype,'
            f" CAST(count(*) AS BIGINT) AS n_rows,"
            f" CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,"
            f" CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,"
            f" {_fx6g_sql(f'min({num})')} AS min_num,"
            f" {_fx6g_sql(f'max({num})')} AS max_num,"
            f" min({s}) AS min_str, max({s}) AS max_str"
            f" FROM {table}"
        )
    return " UNION ALL ".join(selects) + ' ORDER BY "column"'


def profile_table_sql(table: str, df: DataFrame) -> str:
    """DuckDB oracle twin built from a live DataFrame's schema (test
    convenience over :func:`profile_table_sql_from_schema`)."""
    return profile_table_sql_from_schema(
        table,
        [(f.name, f.dataType.simpleString()) for f in df.schema.fields],
    )
