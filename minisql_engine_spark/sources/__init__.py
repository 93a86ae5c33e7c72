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
from minisql_engine_spark.sources.snapshots import (
    delete_from_snapshot,
    list_versions,
    merge_snapshot,
    read_snapshot,
    write_snapshot,
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
    "delete_from_snapshot",
    "list_versions",
    "merge_snapshot",
    "read_snapshot",
    "write_snapshot",
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
