"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship quality-filter pipeline over the
sf0.001 documents table (each document treated as a single-turn
transcript).  ``queries()`` / ``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 with DuckDB oracles where the semantics are
ANSI-SQL-expressible (UDF-backed pipeline entries are rows-only).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from discoverx_spark.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-document quality-filter decisions on sf0.001."""
    from pyspark.sql import functions as F

    from discoverx_spark.pipeline import decide

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    turns = docs.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
    return decide(turns)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
