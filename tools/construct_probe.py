#!/usr/bin/env python
"""Round-12 construction probe (VERDICT r11 item 5).

Measures, per HEADLINE query, the WARM DataFrame-construction cost:
``specs[name].fn(spark, sf_dir)`` timed WITHOUT any action on the
result. The first call per query is discarded (it pays memoized
artifact builds); the reported number is the min of N repeats after
that, i.e. what every bench invocation pays before a single byte of
the noop write runs.

Because eager localCheckpoints RUN during construction, the probe also
counts the Spark jobs each construction launches (statusTracker over a
per-construction job group): a query with high construction time and
ZERO jobs is pure py4j/analysis overhead — the selectExpr-conversion
target list; one with jobs is doing real (checkpoint/artifact) work.

Usage: python tools/construct_probe.py [--repeats 3] [--sf-dir ...]
Prints one JSON line per query, sorted by descending warm best.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--queries", default=None, help="comma list; default HEADLINE")
    args = ap.parse_args()

    from bench import HEADLINE
    from deloton_solo_spark.registry import all_queries
    from deloton_solo_spark.session import RUNTIME_CONFS, STATIC_CONFS
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    b = (
        SparkSession.builder.appName("construct-probe")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in {**STATIC_CONFS, **RUNTIME_CONFS}.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    sc = spark.sparkContext
    spark.range(1000).selectExpr("sum(id)").collect()

    specs = all_queries()
    names = (
        [n.strip() for n in args.queries.split(",") if n.strip()]
        if args.queries
        else list(HEADLINE)
    )
    rows = []
    for name in names:
        fn = specs[name].fn
        try:
            fn(spark, args.sf_dir)  # cold call: artifact builds, discarded
        except Exception as e:
            rows.append({"query": name, "error": str(e)[:120]})
            continue
        times, jobs = [], []
        for i in range(args.repeats):
            group = f"construct:{name}:{i}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            fn(spark, args.sf_dir)
            times.append(round(time.time() - t0, 3))
            jobs.append(len(sc.statusTracker().getJobIdsForGroup(group)))
            sc.setJobGroup(None, None)
        rows.append(
            {
                "query": name,
                "construct_best": min(times),
                "construct_times": times,
                "jobs_during_construct": jobs[-1],
            }
        )
    rows.sort(key=lambda r: -r.get("construct_best", 0))
    for r in rows:
        print(json.dumps(r), flush=True)
    total = sum(r.get("construct_best", 0) for r in rows)
    print(json.dumps({"total_warm_construct_best_sec": round(total, 1)}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
