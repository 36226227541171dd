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
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# thresholds per reference delta_housekeeping.py:186-194
MIN_TABLE_SIZE_TO_OPTIMIZE = 128 * 1024 * 1024
SMALL_FILE_THRESHOLD = 32 * 1024 * 1024
MIN_FILES_FOR_COMPACTION = 8
MIN_DAYS_NOT_OPTIMIZED = 7
MIN_DAYS_NOT_VACUUMED = 31
MAX_OPTIMIZE_FREQ = 2
MAX_VACUUM_FREQ = 2
MIN_FILES_FOR_ZORDER = 8


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


def table_summary_stats(spark: SparkSession, path: str,
                        table_name: str = "") -> DataFrame:
    """Table-level file stats incl. the p50 file size the reference's
    small-files gate keys on (delta_housekeeping.py to_analyze):
    (table_name, number_of_files, bytes, min/max/p50 file size)."""
    import statistics

    sizes: List[int] = []
    for root, _dirs, files in os.walk(path):
        sizes.extend(os.path.getsize(os.path.join(root, f))
                     for f in files if f.endswith(".parquet"))
    name = table_name or os.path.basename(path.rstrip("/"))
    row = ((name, len(sizes), sum(sizes), min(sizes), max(sizes),
            int(statistics.median(sizes))) if sizes
           else (name, 0, 0, None, None, None))
    return spark.createDataFrame(
        [row], "table_name string, number_of_files long, bytes long, "
               "min_file_size long, max_file_size long, p50_file_size long")


def nan_to_null(df: DataFrame, columns: Optional[List[str]] = None) -> DataFrame:
    """NaN→NULL repair on float/double columns (reference
    delta_housekeeping.py:204-210: pandas NaN artifacts must not leak into
    boolean gates — NaN compares false everywhere and poisons averages)."""
    from pyspark.sql import types as T

    float_types = (T.FloatType, T.DoubleType)
    target = [f.name for f in df.schema.fields
              if isinstance(f.dataType, float_types)
              and (columns is None or f.name in columns)]
    for c in target:
        df = df.withColumn(
            c, F.when(F.isnan(F.col(c)), F.lit(None)).otherwise(F.col(c)))
    return df


def maintenance_history_latest(history: DataFrame) -> DataFrame:
    """Fold a maintenance-operation log (table_name, operation, ts) into the
    reference's per-table shape (delta_housekeeping.py:42-92): latest and
    second-latest OPTIMIZE / VACUUM timestamps via row_number windows, the
    two operation streams combined with a FULL OUTER join (a table may have
    seen only one kind of maintenance)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("table_name", "operation").orderBy(F.desc("ts"))
    # operation isin pre-filter per reference delta_housekeeping.py:42
    ranked = (history.filter(F.col("operation").isin(["OPTIMIZE", "VACUUM"]))
              .withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") <= 2))

    def top2(op: str, prefix: str) -> DataFrame:
        return (ranked.filter(F.col("operation") == op)
                .groupBy("table_name")
                .agg(F.max(F.when(F.col("rn") == 1, F.col("ts")))
                     .alias(f"max_{prefix}_timestamp"),
                     F.max(F.when(F.col("rn") == 2, F.col("ts")))
                     .alias(f"2nd_{prefix}_timestamp")))

    return top2("OPTIMIZE", "optimize").join(
        top2("VACUUM", "vacuum"), on="table_name", how="full_outer")


def housekeeping_recommendations_full(stats: DataFrame,
                                      history: Optional[DataFrame] = None,
                                      as_of: Optional[str] = None,
                                      z_order_by: Optional[DataFrame] = None
                                      ) -> DataFrame:
    """The reference's complete nine-gate recommendation set
    (delta_housekeeping.py:251-363) over table-level stats + maintenance
    history.  ``as_of`` fixes "today" for deterministic tests (the
    reference uses datetime.today(), delta_housekeeping.py:278);
    ``z_order_by`` is (table_name, z_order_by string like '["c1","c2"]').
    Left-outer joins keep tables with no history (all history gates then
    fire from the NULL branch, as in the reference)."""
    df = stats
    if history is not None:
        df = df.join(maintenance_history_latest(history),
                     on="table_name", how="left")
    else:
        for c in ("max_optimize_timestamp", "2nd_optimize_timestamp",
                  "max_vacuum_timestamp", "2nd_vacuum_timestamp"):
            df = df.withColumn(c, F.lit(None).cast("timestamp"))
    if z_order_by is not None:
        df = df.join(z_order_by, on="table_name", how="left")
    else:
        df = df.withColumn("z_order_by", F.lit("[]"))
    df = nan_to_null(df)

    today = F.lit(as_of).cast("date") if as_of else F.current_date()
    max_opt = F.col("max_optimize_timestamp")
    max_vac = F.col("max_vacuum_timestamp")
    opt_freq = F.when(max_opt.isNotNull()
                      & F.col("2nd_optimize_timestamp").isNotNull(),
                      F.date_diff(max_opt, F.col("2nd_optimize_timestamp")))
    vac_freq = F.when(max_vac.isNotNull()
                      & F.col("2nd_vacuum_timestamp").isNotNull(),
                      F.date_diff(max_vac, F.col("2nd_vacuum_timestamp")))
    zorder_arr = F.split(F.when(
        max_opt.isNull() | F.col("p50_file_size").isNull()
        | (F.col("z_order_by") == "[]"), None)
        .otherwise(F.regexp_replace(F.col("z_order_by"), r'[\[\]"]', "")), ",")

    gate = lambda cond: F.when(cond, F.lit(True)).otherwise(F.lit(False))
    return df.select(
        "*",
        gate(max_opt.isNull() & F.col("bytes").isNotNull()
             & (F.col("bytes") > MIN_TABLE_SIZE_TO_OPTIMIZE))
        .alias("rec_not_optimized"),
        gate(max_opt.isNotNull() & F.col("bytes").isNotNull()
             & (F.col("bytes") < MIN_TABLE_SIZE_TO_OPTIMIZE))
        .alias("rec_do_not_need_optimize"),
        gate(F.date_diff(today, max_opt) > MIN_DAYS_NOT_OPTIMIZED)
        .alias("rec_not_optimized_last_days"),
        gate(opt_freq < MAX_OPTIMIZE_FREQ).alias("rec_optimized_too_freq"),
        gate(max_vac.isNull()).alias("rec_not_vacuumed"),
        gate(F.date_diff(today, max_vac) > MIN_DAYS_NOT_VACUUMED)
        .alias("rec_not_vacuumed_last_days"),
        gate(vac_freq < MAX_VACUUM_FREQ).alias("rec_vacuumed_too_freq"),
        gate(max_opt.isNotNull() & F.col("p50_file_size").isNotNull()
             & (F.col("number_of_files") > 1)
             & (F.col("p50_file_size") < SMALL_FILE_THRESHOLD))
        .alias("rec_to_analyze"),
        gate((F.size(zorder_arr) > 0)
             & (F.col("number_of_files") < MIN_FILES_FOR_ZORDER))
        .alias("rec_zorder_not_effective"),
    )


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
