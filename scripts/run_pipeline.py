#!/usr/bin/env python
"""spark-submit entrypoint for the transcripts quality-filter pipeline.

Usage (cluster):
    zip -r discoverx_spark.zip discoverx_spark
    spark-submit --py-files discoverx_spark.zip scripts/run_pipeline.py \
        --input  /data/transcripts \
        --output /data/decisions \
        --state  /data/scan_state \
        [--generate-convs 100000] [--buckets 64] [--max-perplexity 16]

Local smoke:
    python scripts/run_pipeline.py --generate-convs 1000 \
        --input /tmp/qc/in --output /tmp/qc/out --state /tmp/qc/state

Resumable: re-running with the same --state skips completed partitions
(per-partition lineage); output bytes are identical either way.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True,
                   help="part_id=-partitioned transcripts parquet dir")
    p.add_argument("--output", required=True)
    p.add_argument("--state", required=True, help="lineage/metrics dir")
    p.add_argument("--generate-convs", type=int, default=0,
                   help="generate a synthetic input first (testing)")
    p.add_argument("--buckets", type=int, default=16)
    p.add_argument("--min-tokens", type=int, default=2)
    p.add_argument("--max-chars", type=int, default=20000)
    p.add_argument("--max-perplexity", type=float, default=16.0)
    p.add_argument("--allowed-langs", default="en")
    p.add_argument("--master", default=None,
                   help="override master (default: from spark-submit)")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    builder = (SparkSession.builder.appName("transcript-qc")
               .config("spark.sql.adaptive.enabled", "true")
               .config("spark.sql.adaptive.skewJoin.enabled", "true")
               .config("spark.sql.execution.arrow.pyspark.enabled", "true"))
    if args.master:
        builder = builder.master(args.master)
    spark = builder.getOrCreate()

    from discoverx_spark.lineage import ResumableRunner, write_bucketed
    from discoverx_spark.pipeline import PipelineConfig
    from discoverx_spark.transcripts import generate_transcripts

    if args.generate_convs:
        df = generate_transcripts(spark, args.generate_convs, seed=42)
        write_bucketed(df, args.input, n_buckets=args.buckets)

    cfg = PipelineConfig(
        min_tokens=args.min_tokens, max_chars=args.max_chars,
        max_perplexity=args.max_perplexity,
        allowed_langs=tuple(args.allowed_langs.split(",")))
    runner = ResumableRunner(spark, args.state)
    report = runner.run(args.input, args.output, cfg)
    print(f"processed={report.processed} skipped={report.skipped} "
          f"failed={list(report.failed)}")
    met = runner.metrics()
    if met is not None:
        met.filter(met.class_name == "keep_rate").show()
    spark.stop()
    return 1 if report.failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
