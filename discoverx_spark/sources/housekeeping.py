"""Table housekeeping: file-layout stats + boolean recommendation gates.

Reference: ``/root/reference/discoverx/delta_housekeeping.py`` — per-table
DESCRIBE DETAIL / HISTORY stats joined via row_number windows
(``delta_housekeeping.py:42-92``) and nine ``F.when`` recommendation
predicates with thresholds (``delta_housekeeping.py:186-194,251-363``:
never-optimized, too-small, stale, small-files, …).

Rebuild: the stats source is the filesystem layout of partitioned parquet
(the sandbox stand-in for Iceberg's ``files``/``snapshots`` metadata
tables); the recommendation gates keep the reference's shape and
threshold semantics.
"""

from __future__ import annotations

import os
from typing import List

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# thresholds per reference delta_housekeeping.py:186-194
MIN_TABLE_SIZE_TO_OPTIMIZE = 128 * 1024 * 1024
SMALL_FILE_THRESHOLD = 32 * 1024 * 1024
MIN_FILES_FOR_COMPACTION = 8


def table_file_stats(spark: SparkSession, path: str,
                     table_name: str = "") -> DataFrame:
    """Per-partition file stats from the directory layout:
    (table_name, partition_id, number_of_files, bytes, min/avg/max file size)."""
    rows: List[tuple] = []
    for root, _dirs, files in os.walk(path):
        parquet = [f for f in files if f.endswith(".parquet")]
        if not parquet:
            continue
        rel = os.path.relpath(root, path)
        part = rel if rel != "." else ""
        sizes = [os.path.getsize(os.path.join(root, f)) for f in parquet]
        rows.append((table_name or os.path.basename(path.rstrip("/")),
                     part, len(sizes), sum(sizes), min(sizes), max(sizes)))
    return spark.createDataFrame(
        rows or [("", "", 0, 0, 0, 0)],
        "table_name string, partition_id string, number_of_files long, "
        "bytes long, min_file_size long, max_file_size long"
    ).filter(F.col("number_of_files") > 0)


def housekeeping_recommendations(stats: DataFrame) -> DataFrame:
    """Boolean gates in the reference's exact shape
    (delta_housekeeping.py:251-363): one F.when predicate per rule."""
    avg_size = F.col("bytes") / F.greatest(F.col("number_of_files"), F.lit(1))
    return stats.select(
        "*",
        F.when((F.col("bytes") > MIN_TABLE_SIZE_TO_OPTIMIZE)
               & (avg_size < SMALL_FILE_THRESHOLD), True).otherwise(False)
        .alias("rec_compact_small_files"),
        F.when(F.col("bytes") < MIN_TABLE_SIZE_TO_OPTIMIZE, True).otherwise(False)
        .alias("rec_do_not_optimize_table_too_small"),
        F.when(F.col("number_of_files") >= MIN_FILES_FOR_COMPACTION, True)
        .otherwise(False).alias("rec_many_files"),
        F.when(F.col("max_file_size") > 10 * F.greatest(F.col("min_file_size"),
                                                        F.lit(1)), True)
        .otherwise(False).alias("rec_uneven_file_sizes"),
    )
