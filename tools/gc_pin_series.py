#!/usr/bin/env python
"""GC-logged N-run pin series (VERDICT r9 task 1 — the chunk_dedup
treatment, packaged): run ONE query N times against a data dir inside a
fresh session whose driver JVM writes unified GC logs, and report per-
run wall time plus the GC pause total attributed to each run's window.

A stable wall band with single-digit GC share pins "the ratio is real";
a wide band with GC spikes pins "heap residency / machine noise" — the
discrimination VERDICT r8/r9 asked for on chunk_dedup and
substring_dedup_rewrite.

Usage:
  python tools/gc_pin_series.py --query substring_dedup_rewrite \
      --data-dir /tmp/.../scale_probe_x100 [--runs 5] [--warm 1]

Prints one JSON line:
  {"query": ..., "runs": [{"wall_sec": ..., "gc_pause_sec": ...,
   "gc_share": ...}, ...], "band": [min,max], "gc_log": path}

Must be run as a FRESH process (the GC options attach at JVM launch).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--query", required=True)
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--warm", type=int, default=1)
    args = ap.parse_args()

    gc_log = f"/tmp/gc_pin_{os.getpid()}.log"
    from pyspark.sql import SparkSession

    from deloton_solo_spark.session import (
        RUNTIME_CONFS,
        apply_runtime_confs,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    master = f"local[{cpus}]" if cpus else "local[*]"
    builder = (
        SparkSession.builder.appName("gc-pin-series")
        .master(master)
        .config("spark.sql.shuffle.partitions", cpus or "32")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g")
        )
        .config(
            "spark.driver.extraJavaOptions",
            f"-Xlog:gc:file={gc_log}:time,uptime",
        )
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = apply_runtime_confs(builder.getOrCreate())
    # uptime anchor: GC log times are JVM-uptime seconds; read the
    # exact JVM start epoch from the runtime MXBean so run windows and
    # GC timestamps share one clock (a wall-clock guess would bleed
    # pause attribution across adjacent runs by the JVM startup time)
    up_ms = (
        spark._jvm.java.lang.management.ManagementFactory.getRuntimeMXBean()
        .getUptime()
    )
    jvm_t0 = time.time() - up_ms / 1000.0
    from deloton_solo_spark.registry import all_queries

    fn = all_queries()[args.query].fn
    for _ in range(args.warm):
        fn(spark, args.data_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    windows = []
    for _ in range(args.runs):
        t0 = time.time()
        fn(spark, args.data_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        windows.append((t0 - jvm_t0, time.time() - jvm_t0))
    spark.stop()

    pauses: list[tuple[float, float]] = []
    pat = re.compile(
        r"\[(\d+\.\d+)s\].*GC\(\d+\) Pause.*?(\d+\.\d+)ms"
    )
    if os.path.exists(gc_log):
        for line in open(gc_log):
            m = pat.search(line)
            if m:
                pauses.append(
                    (float(m.group(1)), float(m.group(2)) / 1000.0)
                )
    runs = []
    for lo, hi in windows:
        gc_s = sum(p for t, p in pauses if lo <= t <= hi)
        wall = hi - lo
        runs.append(
            {
                "wall_sec": round(wall, 3),
                "gc_pause_sec": round(gc_s, 3),
                "gc_share": round(gc_s / wall, 4) if wall > 0 else 0.0,
            }
        )
    walls = [r["wall_sec"] for r in runs]
    print(
        json.dumps(
            {
                "query": args.query,
                "data_dir": args.data_dir,
                "runs": runs,
                "band": [min(walls), max(walls)],
                "gc_log": gc_log,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
