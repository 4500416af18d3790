"""Sinks: partitioned/bucketed writers + table-maintenance (compaction,
z-order layout)."""

from .compaction import (
    compact_parquet,
    compaction_plan,
    list_data_files,
    write_zordered_parquet,
    zorder_value,
)
from .writers import (
    read_back,
    write_bucketed_table,
    write_csv,
    write_json,
    write_partitioned_parquet,
)

__all__ = [
    "compact_parquet",
    "compaction_plan",
    "list_data_files",
    "read_back",
    "write_bucketed_table",
    "write_csv",
    "write_json",
    "write_partitioned_parquet",
    "write_zordered_parquet",
    "zorder_value",
]
