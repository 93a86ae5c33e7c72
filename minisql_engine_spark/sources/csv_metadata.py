"""Reference-parity CSV database loader.

The reference's only schema source is ``metadata.txt`` with
``<begin_table>/<table_name>/<attr…>/<end_table>`` blocks
(``sqlengine.py:99-120``); tables are headerless CSV files named
``<table>.csv``, quoted or unquoted (``sqlengine.py:128-148``,
dialects at ``:131``), every cell an integer — a non-integer cell
becomes the string sentinel ``"NULL"`` in the reference
(``sqlengine.py:144-147``), which we fix to a real SQL NULL
(SURVEY Q9); an empty file yields an empty table
(``sqlengine.py:133-135``).

Spark-first: one ``spark.read.csv`` per table with an explicit
all-LongType schema read as strings then cast — a failed ``CAST`` in
try-mode yields NULL, exactly the ANSI repair of the reference's
sentinel. Table names are lowercased like the reference
(``sqlengine.py:115, 130``); identifier matching stays
case-insensitive via Spark's default ``spark.sql.caseSensitive=false``
(SURVEY §1.4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType


class CsvSchemaError(ValueError):
    """A CSV row's column count contradicts the metadata declaration
    (reference behavior: hard error, ``sqlengine.py:152-154`` — NOT a
    silent NULL-fill, which hides data corruption)."""


def parse_metadata(metadata_path: str) -> dict[str, list[str]]:
    """Parse the ``<begin_table>`` block format → {table: [columns…]}.

    Mirrors ``sqlengine.py:106-120`` (operator O2) including
    lowercasing of table names; column names keep their declared case
    (identifier resolution is case-insensitive anyway).
    """
    if not os.path.exists(metadata_path):
        raise FileNotFoundError(f"metadata file not found: {metadata_path}")
    tables: dict[str, list[str]] = {}
    current: str | None = None
    expecting_name = False
    with open(metadata_path, encoding="utf-8") as fh:
        for raw in fh:
            line = raw.strip()
            if not line:
                continue
            if line == "<begin_table>":
                expecting_name = True
                current = None
            elif line == "<end_table>":
                current = None
            elif expecting_name:
                current = line.lower()
                tables[current] = []
                expecting_name = False
            elif current is not None:
                tables[current].append(line)
    return tables


def _validate_column_counts(
    spark: SparkSession, path: str, table: str, expected: int
) -> None:
    """Error on the first CSV row whose column count contradicts the
    metadata (the reference errors too, ``sqlengine.py:152-154``;
    Spark's schema'd CSV reader would silently NULL-fill/truncate).

    Distributed and early-exiting: a text scan + ``limit(1)`` stops
    at the first offending row instead of scanning the whole file.
    Comma-split counting is exact for the reference's integer CSVs
    (no embedded commas — cells are integers, quoted or not)."""
    bad = (
        spark.read.text(path)
        .filter(F.length(F.trim(F.col("value"))) > 0)
        .select(F.size(F.split("value", ",")).alias("n"))
        .filter(F.col("n") != expected)
        .limit(1)
        .collect()
    )
    if bad:
        raise CsvSchemaError(
            f"table '{table}': CSV row has {bad[0]['n']} columns but "
            f"metadata declares {expected}"
        )


def load_csv_database(
    spark: SparkSession,
    data_dir: str,
    metadata_name: str = "metadata.txt",
    register: bool = True,
    validate: bool = True,
) -> dict[str, DataFrame]:
    """Load every metadata-declared table from headerless integer CSVs.

    Returns {table_name: DataFrame(LongType columns)}. LongType (not
    Int) keeps SUM overflow-safe at 100 TB scale (SURVEY §1.3).
    Missing CSV files are skipped; empty CSVs produce empty DataFrames.
    ``validate=True`` (default) raises :class:`CsvSchemaError` when a
    row's column count contradicts the metadata — one extra
    early-exit scan per table, the right trade for the (small)
    reference-parity catalog; the scale path is the parquet catalog.
    """
    schema_map = parse_metadata(os.path.join(data_dir, metadata_name))
    out: dict[str, DataFrame] = {}
    for table, cols in schema_map.items():
        path = os.path.join(data_dir, f"{table}.csv")
        if not os.path.exists(path):
            continue
        if validate:
            _validate_column_counts(spark, path, table, len(cols))
        raw_schema = StructType(
            [StructField(c, StringType(), nullable=True) for c in cols]
        )
        raw = spark.read.csv(
            path,
            schema=raw_schema,
            header=False,
            quote='"',
            ignoreLeadingWhiteSpace=True,
            ignoreTrailingWhiteSpace=True,
        )
        # try_cast: non-integer cell -> NULL (ANSI repair of the
        # reference's "NULL"-string sentinel, sqlengine.py:144-147).
        df = raw.select(
            *[F.col(c).try_cast("bigint").alias(c) for c in cols]
        )
        out[table] = df
        if register:
            df.createOrReplaceTempView(table)
    return out
