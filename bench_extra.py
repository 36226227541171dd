#!/usr/bin/env python
"""Headline-only bench twin for optimization iteration (guide §1.4).

``bench.py`` is frozen for measurement; this file reuses its exact
session config and min-of-N noop-sink methodology but times ONLY the
headline queries (no scaling phase), optionally a subset:

    python bench_extra.py [query ...] [--reps N] [--explain DIR]

``--explain DIR`` additionally writes ``<query>.txt`` with the
``.explain('formatted')`` output of each timed query.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (frozen harness: reuse session + HEADLINE list)

SF_DIR = bench.SF_DIR
CPUS = bench.CPUS


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="subset of headline queries")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain", default=None,
                    help="directory for .explain('formatted') dumps")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    names = args.names or bench.HEADLINE
    from discoverx_spark import queries as qmod
    from discoverx_spark.queries import QUERIES

    spark = bench.make_session(CPUS, "bench-extra")
    spark.sparkContext.setLogLevel("ERROR")
    if not args.no_warm:
        bench.warm_python_workers(spark, CPUS)

    if args.explain:
        os.makedirs(args.explain, exist_ok=True)

    timings: dict[str, float] = {}
    samples: dict[str, list] = {n: [] for n in names}
    for rep in range(args.reps):
        for name in names:
            fn = QUERIES[name][0] if name in QUERIES \
                else getattr(qmod, f"q_{name}")
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.perf_counter()
            bench.force(fn(spark, SF_DIR))
            dt = round(time.perf_counter() - t0, 3)
            samples[name].append(dt)
            timings[name] = min(timings.get(name, dt), dt)
            if args.explain and rep == 0:
                df = fn(spark, SF_DIR)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
                with open(os.path.join(args.explain, f"{name}.txt"), "w") as f:
                    f.write(plan)
    spark.stop()
    total = round(sum(timings.values()), 3)
    print(json.dumps({"metric": "bench_extra_total_sec", "value": total,
                      "unit": "sec", "queries": timings,
                      "samples": samples, "sf_dir": SF_DIR}))


if __name__ == "__main__":
    main()
