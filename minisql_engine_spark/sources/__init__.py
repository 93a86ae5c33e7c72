from minisql_engine_spark.sources.parquet_catalog import (
    TABLES,
    load_table,
    load_tables,
    register_views,
)
from minisql_engine_spark.sources.csv_metadata import load_csv_database
from minisql_engine_spark.sources.zorder import (
    file_prune_fraction,
    with_zvalue,
    write_zordered,
)
from minisql_engine_spark.sources.writers import (
    read_jsonl,
    read_orc,
    write_csv,
    write_jsonl,
    write_orc,
    write_parquet,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "load_csv_database",
    "read_jsonl",
    "read_orc",
    "write_csv",
    "write_jsonl",
    "write_orc",
    "write_parquet",
    "with_zvalue",
    "write_zordered",
    "file_prune_fraction",
]
