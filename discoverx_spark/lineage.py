"""Per-partition lineage, metrics, and resumable execution.

Reference analogs: the persisted+resumable scan state of
``/root/reference/discoverx/scanner.py:78-126`` (results table with
``effective_timestamp``, MERGE upsert) and the per-unit error isolation of
``scanner.py:241-243`` (a failed unit records its error and the scan
continues).  Re-targeted at partitions of one huge table per SURVEY §7 M4:

* ``lineage`` table — one row per (partition, run): status done/failed,
  row counts, error text, effective_timestamp.  Timestamps appear ONLY
  here, never in decision logic (determinism invariant, SURVEY §7 hard
  part 5).
* ``metrics`` table — per-partition per-class match fractions
  (``scanner.py:325`` score semantics: matched rows / rows).
* resume — on restart, partitions whose lineage says ``done`` are skipped;
  because every partition job is a pure function of its input split and
  the config, a resumed run produces byte-identical decisions.

Each completed partition appends its lineage/metrics rows as new parquet
files (append mode = atomic-enough commit per partition on real object
stores this maps to a manifest commit; Iceberg's snapshot append is the
production target).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pipeline import PipelineConfig, decide
from .scrub import PII_CLASSES

# row schema as WRITTEN by _append_lineage (the timestamp is added at
# append time); the public constants derive from it so they cannot drift
_LINEAGE_ROW_SCHEMA = ("partition_id string, status string, rows_in long, "
                       "rows_kept long, rows_dropped long, error string, "
                       "snapshot_id long")
LINEAGE_SCHEMA = _LINEAGE_ROW_SCHEMA + ", effective_timestamp timestamp"
METRICS_SCHEMA = ("partition_id string, class_name string, score double, "
                  "effective_timestamp timestamp")


def bucket_transcripts(df: DataFrame, n_buckets: int = 16) -> DataFrame:
    """Add the physical partition key: ``part_id = pmod(xxhash64(conv_id), n)``
    — conversations never straddle partitions, so per-partition processing
    keeps conv-level semantics local (no cross-partition shuffle on resume)."""
    return df.withColumn(
        "part_id", F.pmod(F.xxhash64(F.col("conv_id")), F.lit(n_buckets)).cast("int"))


def write_bucketed(df: DataFrame, path: str, n_buckets: int = 16,
                   mode: str = "overwrite") -> None:
    (bucket_transcripts(df, n_buckets)
     .repartition("part_id")
     .sortWithinPartitions("conv_id", "turn_idx")
     .write.mode(mode).partitionBy("part_id").parquet(path))


def list_partitions(path: str) -> List[str]:
    """Partition values from the directory layout (stand-in for an Iceberg
    partitions metadata table)."""
    out = []
    for name in sorted(os.listdir(path)):
        if name.startswith("part_id="):
            out.append(name.split("=", 1)[1])
    return out


@dataclass
class RunReport:
    processed: List[str]
    skipped: List[str]
    failed: Dict[str, str]


class ResumableRunner:
    """Checkpointed partition loop for the quality-filter pipeline."""

    def __init__(self, spark: SparkSession, state_dir: str):
        self.spark = spark
        self.state_dir = state_dir
        self.lineage_path = os.path.join(state_dir, "lineage")
        self.metrics_path = os.path.join(state_dir, "metrics")

    # -- state ------------------------------------------------------------
    def lineage(self) -> Optional[DataFrame]:
        # ONLY a missing path means "fresh start" — swallowing every
        # exception here would turn a transient read failure into a
        # silent full reprocess (with duplicate lineage/metrics appends).
        # mergeSchema: a state_dir written before snapshot-id tracking has
        # 6-column files alongside new 7-column appends; without schema
        # merge an arbitrary footer wins and the snapshot_id column
        # nondeterministically disappears, silently reprocessing every
        # partition on pinned resume
        from .scanner import _read_parquet_if_exists

        return _read_parquet_if_exists(self.spark, self.lineage_path,
                                       mergeSchema="true")

    def metrics(self, latest_only: bool = True) -> Optional[DataFrame]:
        """Per-(partition, class) metrics.  ``latest_only`` (default)
        keeps the newest row per key: a crash between the metrics append
        and the 'done' lineage append makes the retried partition append
        its metrics a second time, and latest-wins is what consumers
        want (the reprocessed values are authoritative and, the pipeline
        being deterministic, identical)."""
        from .scanner import _read_parquet_if_exists

        m = _read_parquet_if_exists(self.spark, self.metrics_path)
        if m is None:
            return None
        if latest_only:
            from pyspark.sql.window import Window
            w = Window.partitionBy("partition_id", "class_name") \
                .orderBy(F.desc("effective_timestamp"))
            m = (m.withColumn("_rn", F.row_number().over(w))
                 .filter(F.col("_rn") == 1).drop("_rn"))
        return m

    def completed_partitions(self, snapshot_id: Optional[int] = None) -> set:
        """Partitions with a 'done' lineage row.  With ``snapshot_id``
        given, only rows recorded against that input-table snapshot count
        (time-travel-shaped resume: when the source Iceberg/parquet table
        advances to a new snapshot, work done against older snapshots is
        stale and gets reprocessed; legacy NULL-snapshot rows likewise
        don't count)."""
        lin = self.lineage()
        if lin is None:
            return set()
        if snapshot_id is not None:
            if "snapshot_id" not in lin.columns:
                return set()
            lin = lin.filter(F.col("snapshot_id") == int(snapshot_id))
        rows = (lin.groupBy("partition_id")
                .agg(F.max(F.when(F.col("status") == "done", 1).otherwise(0)).alias("ok"))
                .filter(F.col("ok") == 1).collect())
        return {r["partition_id"] for r in rows}

    def _append_lineage(self, partition_id: str, status: str, rows_in: int,
                        rows_kept: int, error: Optional[str],
                        snapshot_id: Optional[int] = None) -> None:
        row = [(partition_id, status, rows_in, rows_kept,
                rows_in - rows_kept, error,
                None if snapshot_id is None else int(snapshot_id))]
        (self.spark.createDataFrame(row, _LINEAGE_ROW_SCHEMA)
         .withColumn("effective_timestamp", F.current_timestamp())
         .coalesce(1).write.mode("append").parquet(self.lineage_path))

    def _append_metrics(self, metrics_df: DataFrame) -> None:
        (metrics_df.withColumn("effective_timestamp", F.current_timestamp())
         .coalesce(1).write.mode("append").parquet(self.metrics_path))

    # -- execution ----------------------------------------------------------
    def run(self, input_path: str, output_path: str,
            cfg: PipelineConfig = PipelineConfig(),
            partitions: Optional[List[str]] = None,
            fail_on: Optional[Callable[[str], bool]] = None,
            snapshot_id: Optional[int] = None) -> RunReport:
        """Process every pending partition of a ``part_id=``-layout dataset:
        decisions written to ``output_path/part_id=<v>``, lineage + metrics
        appended per partition.  ``fail_on`` is a test hook injecting
        per-partition failures (error-isolation path).

        ``snapshot_id`` pins the run to an input-table snapshot (e.g.
        ``ParquetTableFormat.current_snapshot_id`` or Iceberg's): resume
        then skips only partitions completed against the SAME snapshot,
        so advancing the source table invalidates stale work
        automatically."""
        todo = partitions if partitions is not None else list_partitions(input_path)
        done = self.completed_partitions(snapshot_id)
        report = RunReport(processed=[], skipped=[], failed={})
        for part in todo:
            if part in done:
                report.skipped.append(part)
                continue
            try:
                if fail_on is not None and fail_on(part):
                    raise RuntimeError(f"injected failure for partition {part}")
                src = self.spark.read.parquet(
                    os.path.join(input_path, f"part_id={part}"))
                decisions = decide(src, cfg).sortWithinPartitions(
                    "conv_id", "turn_idx").localCheckpoint(eager=True)
                rows_in = decisions.count()
                rows_kept = decisions.filter(F.col("keep")).count()
                decisions.write.mode("overwrite").parquet(
                    os.path.join(output_path, f"part_id={part}"))
                self._append_metrics(self._partition_metrics(decisions, part))
                self._append_lineage(part, "done", rows_in, rows_kept, None,
                                     snapshot_id)
                report.processed.append(part)
            except Exception as e:  # per-partition isolation (scanner.py:241-243)
                msg = str(e)[:500]
                report.failed[part] = msg
                try:
                    self._append_lineage(part, "failed", 0, 0, msg,
                                         snapshot_id)
                except Exception:
                    pass
        return report

    @staticmethod
    def _partition_metrics(decisions: DataFrame, partition_id: str) -> DataFrame:
        """Per-class matched-row fraction + keep rate (scanner.py:325 score
        semantics) — one aggregate pass."""
        aggs = [F.avg((F.coalesce(F.col("pii_counts").getItem(c), F.lit(0)) > 0)
                      .cast("int")).alias(f"s_{i}")
                for i, c in enumerate(PII_CLASSES)]
        aggs.append(F.avg(F.col("keep").cast("int")).alias("s_keep"))
        one = decisions.agg(*aggs)
        cells = F.array(
            *[F.struct(F.lit(c).alias("class_name"),
                       F.col(f"s_{i}").cast("double").alias("score"))
              for i, c in enumerate(PII_CLASSES)],
            F.struct(F.lit("keep_rate").alias("class_name"),
                     F.col("s_keep").cast("double").alias("score")),
        )
        return (one.select(F.explode(cells).alias("cell"))
                .select(F.lit(partition_id).alias("partition_id"),
                        "cell.class_name", "cell.score"))
