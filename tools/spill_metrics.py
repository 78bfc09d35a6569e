#!/usr/bin/env python
"""Per-stage shuffle/spill metrics for one query (VERDICT r9 task 2:
"turn the spill claim into numbers").

Runs the named query against a data dir in a UI-enabled session and
dumps every completed stage's shuffle read/write and memory/disk spill
bytes from Spark's public REST status API — the per-stage evidence that
attributes a super-linear ×100 wall ratio to spill (operational) vs
candidate growth (algorithmic, covered by the probe's stage counts).

Usage:
  python tools/spill_metrics.py --query prefix_filter_jaccard_pairs \
      --data-dir /tmp/.../scale_probe_x100 [--warm 1]

Prints one JSON line: {"query":..., "total": {...}, "stages": [...]}
(stages sorted by disk+memory spill, zero-spill stages collapsed into
the totals only).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

UI_PORT = 4047


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--query", required=True)
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--warm", type=int, default=1)
    ap.add_argument("--port", type=int, default=UI_PORT)
    args = ap.parse_args()

    import os

    from pyspark.sql import SparkSession

    from deloton_solo_spark.session import (
        RUNTIME_CONFS,
        apply_runtime_confs,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    builder = (
        SparkSession.builder.appName("spill-metrics")
        .master(f"local[{cpus}]" if cpus else "local[*]")
        .config("spark.sql.shuffle.partitions", cpus or "32")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(args.port))
        .config(
            "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g")
        )
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = apply_runtime_confs(builder.getOrCreate())

    from deloton_solo_spark.registry import all_queries

    fn = all_queries()[args.query].fn
    for _ in range(args.warm):
        fn(spark, args.data_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    # job-group isolation: only stages submitted after this marker are
    # attributed to the timed run (the warm run's stages are excluded
    # by stage submission time)
    t_mark = time.time()
    t0 = time.time()
    fn(spark, args.data_dir).write.format("noop").mode("overwrite").save()
    wall = time.time() - t0

    app = spark.sparkContext.applicationId
    url = f"http://localhost:{args.port}/api/v1/applications/{app}/stages"
    data = json.load(urllib.request.urlopen(url))

    def _epoch(st):
        # submissionTime: "2026-08-16T15:59:28.123GMT"
        ts = st.get("submissionTime")
        if not ts:
            return 0.0
        from datetime import datetime, timezone

        return (
            datetime.strptime(ts[:23], "%Y-%m-%dT%H:%M:%S.%f")
            .replace(tzinfo=timezone.utc)
            .timestamp()
        )

    stages = [
        st
        for st in data
        if st["status"] == "COMPLETE" and _epoch(st) >= t_mark - 1
    ]
    total = {
        k: sum(st[k] for st in stages)
        for k in (
            "shuffleWriteBytes",
            "shuffleReadBytes",
            "memoryBytesSpilled",
            "diskBytesSpilled",
        )
    }
    spilled = sorted(
        (
            {
                "stageId": st["stageId"],
                "numTasks": st["numTasks"],
                "shuffleWriteBytes": st["shuffleWriteBytes"],
                "shuffleReadBytes": st["shuffleReadBytes"],
                "memoryBytesSpilled": st["memoryBytesSpilled"],
                "diskBytesSpilled": st["diskBytesSpilled"],
                "name": st["name"][:80],
            }
            for st in stages
            if st["memoryBytesSpilled"] + st["diskBytesSpilled"] > 0
        ),
        key=lambda s: -(s["memoryBytesSpilled"] + s["diskBytesSpilled"]),
    )
    print(
        json.dumps(
            {
                "query": args.query,
                "data_dir": args.data_dir,
                "wall_sec": round(wall, 2),
                "n_stages": len(stages),
                "total": total,
                "spilled_stages": spilled,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
