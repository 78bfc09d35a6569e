#!/usr/bin/env python
"""Round-11 optimization measurement harness (guide §1: measure first).

For each named query:
  * warm its plan shape once at sf0.001 (same steady-state discipline
    as bench.py),
  * time N repeats at the target SF with the noop sink,
  * capture ``.explain("formatted")`` to ``plans/r11/<q>_<tag>.txt``,
  * attribute time to stages via the UI REST API (tasks, runtime,
    shuffle bytes) so "where does the time go" is measured, not
    guessed.

Usage:
  python tools/opt_measure.py --tag before --queries winnowing_fingerprint_pairs,bpe_train_merges
  python tools/opt_measure.py --tag after  --queries ... --repeats 3

Prints one JSON line per query: {"query": ..., "times": [...], "best": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def stage_table(ui_port: int) -> list[dict]:
    try:
        with urllib.request.urlopen(
            f"http://localhost:{ui_port}/api/v1/applications", timeout=5
        ) as r:
            apps = json.load(r)
        app_id = apps[0]["id"]
        with urllib.request.urlopen(
            f"http://localhost:{ui_port}/api/v1/applications/{app_id}"
            "/stages?status=complete",
            timeout=5,
        ) as r:
            stages = json.load(r)
    except Exception as e:  # UI off / port taken — attribution optional
        return [{"error": str(e)}]
    out = []
    for s in stages:
        out.append(
            {
                "stageId": s["stageId"],
                "attemptId": s.get("attemptId", 0),
                "numTasks": s["numTasks"],
                "executorRunTime_ms": s["executorRunTime"],
                "shuffleRead_b": s.get("shuffleReadBytes", 0),
                "shuffleWrite_b": s.get("shuffleWriteBytes", 0),
                "input_b": s.get("inputBytes", 0),
                "name": s["name"].split("\n")[0][:120],
                "desc": (s.get("description") or "")[:80],
            }
        )
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--tag", default=None, help="write plans/<round>/<q>_<tag>.txt")
    ap.add_argument(
        "--plans-round",
        default="r12",
        help="subdir of plans/ for --tag captures (r11, r12, ...)",
    )
    ap.add_argument("--stages", action="store_true", help="dump per-stage attribution")
    ap.add_argument("--ui-port", type=int, default=4049)
    args = ap.parse_args()

    from deloton_solo_spark.registry import all_queries
    from deloton_solo_spark.session import RUNTIME_CONFS, STATIC_CONFS

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    b = (
        SparkSession.builder.appName("opt-measure")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "true" if args.stages else "false")
        .config("spark.ui.port", str(args.ui_port))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in {**STATIC_CONFS, **RUNTIME_CONFS}.items():
        b = b.config(k, v)
    spark = b.getOrCreate()

    specs = all_queries()
    names = [n.strip() for n in args.queries.split(",") if n.strip()]
    warm_sf = os.path.join(
        os.path.dirname(args.sf_dir.rstrip("/")), "sf0.001"
    )

    # session-level warmup identical in spirit to bench.py
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(64).repartition(int(cpus)).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    plans_dir = (
        Path(__file__).resolve().parent.parent / "plans" / args.plans_round
    )
    plans_dir.mkdir(parents=True, exist_ok=True)

    for name in names:
        fn = specs[name].fn
        if os.path.isdir(warm_sf):
            fn(spark, warm_sf).write.format("noop").mode("overwrite").save()
        seen_before = (
            {s["stageId"] for s in stage_table(args.ui_port) if "stageId" in s}
            if args.stages
            else set()
        )
        from bench import _cpu_ticks, _steal_pct

        ticks0 = _cpu_ticks()
        times = []
        for i in range(args.repeats):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.time()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        steal = _steal_pct(ticks0, _cpu_ticks())
        if args.tag:
            from deloton_solo_spark.plans.inspect import plan_text

            plan = plan_text(fn(spark, args.sf_dir))
            (plans_dir / f"{name}_{args.tag}.txt").write_text(plan)
        rec = {
            "query": name,
            "times": times,
            "best": min(times),
            "steal_pct": steal,
            "load1": round(os.getloadavg()[0], 2),
        }
        print(json.dumps(rec), flush=True)
        if args.stages:
            rows = [
                s
                for s in stage_table(args.ui_port)
                if "stageId" in s and s["stageId"] not in seen_before
            ]
            rows.sort(key=lambda s: -s["executorRunTime_ms"])
            for s in rows[:12]:
                print(
                    f"    stage {s['stageId']:>4} tasks={s['numTasks']:>3} "
                    f"run={s['executorRunTime_ms']/1e3:7.2f}s "
                    f"in={s['input_b']/1e6:7.1f}MB "
                    f"sr={s['shuffleRead_b']/1e6:6.1f}MB "
                    f"sw={s['shuffleWrite_b']/1e6:6.1f}MB  {s['desc'] or s['name']}",
                    flush=True,
                )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
