"""r11 optimization gate: catalog.spread_scan.

The local harness tables are single parquet files with one row group, so
every scan is one task; spread_scan hash-repartitions such scans to the
session's defaultParallelism so compute-heavy fused projections use every
core. The gate must be SCALE-ADAPTIVE (optimization guide §2): it fires
only when the source yields fewer partitions than the session's default
parallelism — on an already-parallel input it must be an exact no-op (no
exchange enters the plan), which is the 100 TB behavior (thousands of
input files ≥ cores).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from deloton_solo_spark.catalog import load_table, spread_scan

SF_DIR = "/root/testdata/sf0.001"


def test_underparallel_scan_is_spread(spark):
    docs = load_table(spark, SF_DIR, "documents")
    assert docs.rdd.getNumPartitions() == 1, "fixture layout changed"
    out = spread_scan(docs, "doc_id")
    assert (
        out.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    # deterministic hash partitioning, not round-robin, when a key is given
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(doc_id" in plan, plan[:500]


def test_already_parallel_input_is_untouched(spark):
    target = spark.sparkContext.defaultParallelism
    wide = load_table(spark, SF_DIR, "documents").repartition(
        target, F.col("doc_id")
    )
    out = spread_scan(wide, "doc_id")
    # the SAME DataFrame object back — no second exchange appended
    assert out is wide


def test_spread_preserves_rows(spark):
    docs = load_table(spark, SF_DIR, "documents")
    a = sorted(r.doc_id for r in docs.select("doc_id").collect())
    b = sorted(
        r.doc_id
        for r in spread_scan(docs, "doc_id").select("doc_id").collect()
    )
    assert a == b
