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
    ConcurrentCommitError,
    ConstraintViolation,
    add_snapshot_column,
    append_snapshot,
    compact_snapshot,
    delete_from_snapshot,
    list_versions,
    merge_snapshot,
    merge_snapshot_pruned,
    read_snapshot,
    vacuum_snapshots,
    write_snapshot,
)
from minisql_engine_spark.sources.aggview import (
    agg_view_sql,
    init_agg_view,
    read_agg_view,
    update_agg_view,
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
    "ConcurrentCommitError",
    "ConstraintViolation",
    "add_snapshot_column",
    "append_snapshot",
    "compact_snapshot",
    "delete_from_snapshot",
    "list_versions",
    "merge_snapshot",
    "merge_snapshot_pruned",
    "read_snapshot",
    "vacuum_snapshots",
    "write_snapshot",
    "agg_view_sql",
    "init_agg_view",
    "read_agg_view",
    "update_agg_view",
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
