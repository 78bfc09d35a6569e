"""Sources/sinks/mutation surface — SURVEY.md §2.1 (S5, S6, S7, S9).

The reference's sink is a Postgres batch INSERT with ``ON CONFLICT DO
NOTHING`` (sql_wrapper.py:39-55) and a keyed DELETE (api.py:185-188);
on immutable columnar storage these become dedup-before-append and
anti-join rewrite respectively — both implemented here as library
functions plus oracle-checked queries.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import TABLES, load_table, register_views
from ..registry import query

DELETE_KEYS = (1, 2, 3)


# Library: S5 -------------------------------------------------------------
def idempotent_append(df: DataFrame, path: str, keys: list[str]) -> None:
    """S5: append rows whose key is not already present — the Parquet
    equivalent of INSERT … ON CONFLICT DO NOTHING (sql_wrapper.py:44-46).

    Implementation: left-anti join the incoming batch against the
    existing keys, then append. At scale the existing-side read prunes
    to the key columns only; with Delta available this becomes
    ``MERGE WHEN NOT MATCHED THEN INSERT`` inside ``foreachBatch``
    (SURVEY.md §4 upsert row).
    """
    spark = df.sparkSession
    batch = df.dropDuplicates(keys)
    try:
        existing = spark.read.parquet(path).select(*keys)
        batch = batch.join(existing, on=keys, how="left_anti")
    except Exception:
        pass  # first write — nothing to conflict with
    batch.write.mode("append").parquet(path)


# Library: S6 -------------------------------------------------------------
def run_multi_statements(spark: SparkSession, sql_text: str) -> DataFrame:
    """S6: split on ';', execute each statement, return the last
    resultset (sql_wrapper.py:27-37)."""
    result = None
    for stmt in filter(None, (s.strip() for s in sql_text.split(";"))):
        result = spark.sql(stmt)
    if result is None:
        raise ValueError("no statements in input")
    return result


# Library: S9 -------------------------------------------------------------
def delete_by_keys(df: DataFrame, keys_df: DataFrame, on: list[str]) -> DataFrame:
    """S9: DELETE WHERE key IN (…) → left-anti join rewrite
    (api.py:185-188; SURVEY.md S9). With Delta: ``DELETE WHERE``."""
    return df.join(keys_df, on=on, how="left_anti")


# Queries -----------------------------------------------------------------
@query(
    "sql_delete_by_key",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           CAST(o_orderdate AS VARCHAR) AS o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey NOT IN {DELETE_KEYS!r}
    """,
    tags=("sink", "mutation"),
)
def sql_delete_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 as a query: orders minus a key list via left-anti join."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_orderdate", F.col("o_orderdate").cast("string")
    )
    keys = spark.createDataFrame(
        [(k,) for k in DELETE_KEYS], "o_orderkey long"
    )
    return delete_by_keys(orders, F.broadcast(keys), ["o_orderkey"]).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )


@query(
    "multi_statement_sql",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n
    FROM orders WHERE o_totalprice > 100000
    GROUP BY o_custkey
    """,
    tags=("source", "sql"),
)
def multi_statement_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: multi-statement SQL string — intermediate statements create
    temp views, last resultset returned (sql_wrapper.py:27-37)."""
    register_views(spark, sf_dir)
    return run_multi_statements(
        spark,
        """
        CREATE OR REPLACE TEMPORARY VIEW __expensive AS
            SELECT o_custkey FROM orders WHERE o_totalprice > 100000;
        SELECT o_custkey, COUNT(*) AS n FROM __expensive GROUP BY o_custkey;
        """,
    )


@query(
    "catalog_list_tables",
    oracle="SELECT * FROM (VALUES "
    + ", ".join(f"('{t}')" for t in sorted(TABLES))
    + ") AS t(table_name) ORDER BY table_name",
    tags=("source", "catalog"),
)
def catalog_list_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7: INFORMATION_SCHEMA-style table listing (test.ipynb cell-3) —
    registers the testdata tables, then lists them via
    ``spark.catalog.listTables``."""
    register_views(spark, sf_dir)
    names = sorted(
        t.name for t in spark.catalog.listTables() if t.name in TABLES
    )
    return spark.createDataFrame(
        [(n,) for n in names], "table_name string"
    ).orderBy("table_name")


@query(
    "jdbc_upsert_sink",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders WHERE o_orderkey <= 500
    """,
    tags=("sink", "mutation"),
)
def jdbc_upsert_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 as a query (SURVEY.md §2.1 ``jdbc_upsert_sink`` — the
    reference's INSERT … ON CONFLICT DO NOTHING): write the same batch
    twice through
    ``idempotent_append`` into a scratch dir; the second append is a
    no-op (ON CONFLICT DO NOTHING semantics), so reading back returns
    exactly one copy."""
    batch = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 500)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
    path = tempfile.mkdtemp(prefix="deloton_sink_")
    shutil.rmtree(path, ignore_errors=True)
    idempotent_append(batch, path, ["o_orderkey"])
    idempotent_append(batch, path, ["o_orderkey"])  # duplicate delivery
    return spark.read.parquet(path)
