from .io import (read_table, read_csv, read_json, write_partitioned,
                 merge_upsert, iceberg_available)
from .housekeeping import table_file_stats, housekeeping_recommendations

__all__ = ["read_table", "read_csv", "read_json", "write_partitioned",
           "merge_upsert", "iceberg_available", "table_file_stats",
           "housekeeping_recommendations"]
