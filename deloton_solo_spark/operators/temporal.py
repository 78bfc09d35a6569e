"""Temporal join operators — as-of and range joins (extension; the
build brief names them as operators Spark lacks natively).

Both are implemented as compositions of existing DataFrame ops using
the standard scalable shapes — no theta-join explosion, no UDFs:

- **as-of** (X12): the union-merge pattern. Tag both sides, union,
  one per-key ordered window forward-fills the right side's columns,
  keep left rows. One shuffle on the join key; per-key state is
  bounded. (A sort-merge theta join would re-scan right rows per left
  row; this is O(n log n) per key.)
- **range** (X13): the bucketed-bin pattern. Quantize time into bins
  the width of the query interval; each probe row can only match bins
  {b-1, b}, so an explode(2) + equi-join on (key, bin) + exact-filter
  replaces the unbounded inequality join. Shuffle carries (key, bin) —
  co-partitioned, skew-safe under AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

_BIN_DAYS = 30
_BIN_SECS = _BIN_DAYS * 86400


def _shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem + its order's custkey: (custkey, l_orderkey,
    l_linenumber, ship_ts)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_custkey").alias("custkey"),
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.col("l_shipdate").alias("ship_ts"),
    )


# X12 ---------------------------------------------------------------------
@query(
    "asof_join_shipments",
    oracle="""
    WITH l AS (
      SELECT o1.o_custkey AS custkey, li.l_orderkey, li.l_linenumber,
             li.l_shipdate AS ship_ts,
             row_number() OVER () AS rid  -- (l_orderkey, l_linenumber)
                                          -- is NOT unique in the data;
                                          -- keep one output per input ROW
      FROM lineitem li JOIN orders o1 ON li.l_orderkey = o1.o_orderkey
    ),
    cand AS (
      SELECT l.l_orderkey, l.l_linenumber, l.custkey,
             strftime(l.ship_ts, '%Y-%m-%d') AS ship_date,
             o2.o_orderkey AS asof_orderkey,
             o2.o_totalprice AS asof_totalprice,
             row_number() OVER (
               PARTITION BY l.rid
               ORDER BY o2.o_orderdate DESC, o2.o_orderkey DESC) AS rn
      FROM l JOIN orders o2
        ON o2.o_custkey = l.custkey AND o2.o_orderdate <= l.ship_ts
    )
    SELECT l_orderkey, l_linenumber, custkey, ship_date,
           asof_orderkey, asof_totalprice
    FROM cand WHERE rn = 1
    """,
    tags=("temporal", "join", "extension"),
)
def asof_join_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12: for each shipment, the customer's most recent order with
    o_orderdate <= l_shipdate (ties → highest orderkey) — an as-of
    join via union-merge: one window pass instead of a per-row
    backward scan. The DuckDB oracle states the same semantics as a
    correlated top-1, so the scalable plan is checked against the
    naive definition."""
    ship = _shipments(spark, sf_dir)
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("asof_orderkey"),
        F.col("o_totalprice").alias("asof_totalprice"),
    )
    left = ship.select(
        "custkey",
        F.col("ship_ts").alias("ts"),
        "l_orderkey",
        "l_linenumber",
        F.lit(None).cast("long").alias("asof_orderkey"),
        F.lit(None).cast("double").alias("asof_totalprice"),
        F.lit(1).alias("side"),
    )
    right = o.select(
        "custkey",
        "ts",
        F.lit(None).cast("long").alias("l_orderkey"),
        F.lit(None).cast("int").alias("l_linenumber"),
        "asof_orderkey",
        "asof_totalprice",
        F.lit(0).alias("side"),
    )
    # side=0 before side=1 at equal ts → the <= is inclusive; among
    # equal-ts orders, ascending orderkey → last() picks the highest.
    w = (
        Window.partitionBy("custkey")
        .orderBy("ts", "side", "asof_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        left.unionByName(right)
        .select(
            "*",
            F.last("asof_orderkey", ignorenulls=True)
            .over(w)
            .alias("__ok"),
            F.last("asof_totalprice", ignorenulls=True)
            .over(w)
            .alias("__tp"),
        )
        .filter((F.col("side") == 1) & F.col("__ok").isNotNull())
        .select(
            "l_orderkey",
            "l_linenumber",
            "custkey",
            F.date_format("ts", "yyyy-MM-dd").alias("ship_date"),
            F.col("__ok").alias("asof_orderkey"),
            F.col("__tp").alias("asof_totalprice"),
        )
    )


# X13 ---------------------------------------------------------------------
@query(
    "range_join_shipments",
    oracle=f"""
    SELECT o.o_orderkey,
           COUNT(*) AS n_ship_{_BIN_DAYS}d,
           ROUND(CAST(SUM(CAST(li.l_quantity AS DECIMAL(18,2))) AS DOUBLE),
                 4) AS qty_{_BIN_DAYS}d
    FROM orders o
    JOIN (
      SELECT o1.o_custkey AS custkey, li.l_quantity, li.l_shipdate
      FROM lineitem li JOIN orders o1 ON li.l_orderkey = o1.o_orderkey
    ) li
      ON li.custkey = o.o_custkey
     AND o.o_orderdate <= li.l_shipdate
     AND li.l_shipdate < o.o_orderdate + INTERVAL {_BIN_DAYS} DAYS
    GROUP BY o.o_orderkey
    """,
    tags=("temporal", "join", "extension"),
)
def range_join_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13: per order, the customer's shipments falling inside
    [o_orderdate, o_orderdate + {BIN}d) — a range join via bin
    quantization: probe rows explode into the only two bins an
    interval of exactly one bin width can straddle, then an equi-join
    on (custkey, bin) + exact range filter. The oracle states the
    naive inequality join."""
    ship = _shipments(spark, sf_dir).select(
        "custkey",
        "l_quantity",
        "ship_ts",
        F.floor(F.unix_timestamp("ship_ts") / _BIN_SECS).alias("bin"),
    )
    probe = ship.select(
        "custkey",
        "l_quantity",
        "ship_ts",
        F.explode(F.array(F.col("bin") - 1, F.col("bin"))).alias("bin"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        "o_orderkey",
        "o_orderdate",
        F.floor(F.unix_timestamp("o_orderdate") / _BIN_SECS).alias("bin"),
    )
    joined = o.join(probe, ["custkey", "bin"]).filter(
        (F.col("o_orderdate") <= F.col("ship_ts"))
        & (
            F.col("ship_ts")
            < F.col("o_orderdate") + F.expr(f"INTERVAL {_BIN_DAYS} DAYS")
        )
    )
    return joined.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias(f"n_ship_{_BIN_DAYS}d"),
        F.round(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"), 4
        ).alias(f"qty_{_BIN_DAYS}d"),
    )
