"""Table catalog: load the driver's parquet tables, normalized.

Replaces the reference's implicit schema model (tables pre-exist in
Postgres, schemas derived from dict keys at insert time,
sql_wrapper.py:41) with explicit, typed DataFrames. Covers:

- S4 ``table_scan``  (api.py:23,30) — full scans become
  ``spark.read.parquet`` with Catalyst column pruning / predicate
  pushdown reaching the parquet reader.
- S7 ``catalog_list_tables`` (test.ipynb cell-3) —
  ``spark.catalog.listTables`` over registered temp views.

Scale note: at 100 TB these would be partitioned/bucketed external
tables; the loaders keep all reads as plain parquet scans so partition
pruning and row-group filter pushdown apply unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import apply_runtime_confs

#: Tables the driver ships at /root/testdata/sf*/ (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimension tables — always broadcast-joinable.
DIM_TABLES = frozenset({"region", "nation", "customer", "supplier", "part"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table, normalizing types.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS); Spark reads it
    (with ``nanosAsLong``) as a long of epoch-nanos, which we convert to a
    proper TimestampType truncated to micros (matching what DuckDB /
    pandas see).
    """
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every table as a temp view; returns the names."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return list(TABLES)


def cache_hot_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """The sane replacement for the reference's stale module-global
    cache (api.py:30-35, SURVEY.md §3.3): an explicit, refreshable
    `.cache()` on a hot base table. Subsequent plans read
    InMemoryTableScan instead of re-scanning parquet; `unpersist()` or
    re-calling refreshes. At cluster scale this is executor-memory
    columnar caching (MEMORY_AND_DISK), sized per table."""
    df = load_table(spark, sf_dir, name).cache()
    df.count()  # materialize now, like the reference's import-time load
    return df
