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

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

from discoverx_spark.queries import QUERIES  # noqa: E402

_SHIPPED = set()


def _ensure_workers_can_import(spark: SparkSession) -> None:
    """Python workers unpickle UDFs by module reference, so they must be
    able to ``import discoverx_spark`` even when the driver process was
    launched without this repo on PYTHONPATH — ship the package as a zip
    via addPyFile (the spark-submit --py-files mechanism)."""
    key = spark.sparkContext.applicationId
    if key in _SHIPPED:
        return
    try:
        import tempfile
        import zipfile

        # unique per process: a stale zip from an earlier run would ship an
        # outdated package to the workers (observed: AttributeError on a
        # function added after the zip was first built)
        zpath = os.path.join(tempfile.gettempdir(),
                             f"discoverx_spark_pkg_{os.getpid()}.zip")
        if not os.path.exists(zpath):
            with zipfile.ZipFile(zpath, "w") as z:
                pkg = os.path.join(_REPO, "discoverx_spark")
                for root, _dirs, files in os.walk(pkg):
                    for f in files:
                        if f.endswith(".py"):
                            full = os.path.join(root, f)
                            z.write(full, os.path.relpath(full, _REPO))
        spark.sparkContext.addPyFile(zpath)
        _SHIPPED.add(key)
    except Exception:
        pass  # best effort; direct PYTHONPATH still works


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-document quality-filter decisions on sf0.001."""
    from pyspark.sql import functions as F

    from discoverx_spark.pipeline import decide

    _ensure_workers_can_import(spark)
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

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_workers_can_import(spark)
            return fn(spark, sf_dir)
        return run

    return {name: wrap(fn) for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
