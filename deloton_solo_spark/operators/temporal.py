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


# X69 — calendar-spine resample + forward fill ----------------------------
@query(
    "daily_resample_ffill",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id, "value"
      FROM events
    ),
    daily AS (
      SELECT user_id, day, "value" AS v FROM (
        SELECT *, row_number() OVER (
          PARTITION BY user_id, day ORDER BY ts DESC, event_id DESC) AS rn
        FROM e
      ) WHERE rn = 1
    ),
    span AS (
      SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM e GROUP BY user_id
    ),
    spine AS (
      SELECT user_id, CAST(gs AS DATE) AS day
      FROM span, UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS g(gs)
    )
    SELECT s.user_id, strftime(s.day, '%Y-%m-%d') AS day,
           last_value(d.v IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill
    FROM spine s
    LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
    """,
    tags=("temporal", "resample", "extension"),
)
def daily_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X69: resample each user's event stream onto a daily calendar
    spine and forward-fill gap days with the last observed value — the
    time-series regularization step (pandas ``resample().ffill()``)
    every telemetry pipeline needs, in pure DataFrame ops.

    Plan: per-(user, day) last-observation via a ranking window (bounded
    partitions), the spine generated with ``sequence()`` per user (no
    driver loop, no cross join with a global calendar), left join on
    (user, day), then a per-user ``last(ignorenulls=True)`` running
    window. Everything is partitioned by user_id — bounded state per
    key at any corpus size."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("day"),
        "ts",
        "event_id",
        "value",
    )
    w1 = Window.partitionBy("user_id", "day").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    daily = (
        ev.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") == 1)
        .select("user_id", "day", F.col("value").alias("v"))
    )
    span = ev.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = span.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    j = spine.join(daily, ["user_id", "day"], "left")
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.last("v", ignorenulls=True).over(w2).alias("value_ffill"),
    )


# X130 — gap-fill with linear interpolation -------------------------------
@query(
    "gap_fill_interpolate",
    oracle="""
    WITH e AS (
      SELECT event_type,
             CAST(FLOOR(epoch_us(ts) / 60000000) AS BIGINT) AS m,
             "value"
      FROM events
    ),
    obs AS (
      SELECT event_type, m,
             CAST(ROUND(
               CAST(SUM(CAST("value" AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*), 4) AS DOUBLE) AS v
      FROM e GROUP BY event_type, m
    ),
    span AS (
      SELECT event_type, MIN(m) AS m0, MAX(m) AS m1 FROM e
      GROUP BY event_type
    ),
    spine AS (
      SELECT event_type, CAST(gs AS BIGINT) AS m
      FROM span, UNNEST(generate_series(m0, m1)) AS g(gs)
    ),
    j AS (
      SELECT s.event_type, s.m, o.v,
             last_value(o.v IGNORE NULLS) OVER (
               PARTITION BY s.event_type ORDER BY s.m
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN o.v IS NOT NULL THEN s.m END
                        IGNORE NULLS) OVER (
               PARTITION BY s.event_type ORDER BY s.m
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pm,
             first_value(o.v IGNORE NULLS) OVER (
               PARTITION BY s.event_type ORDER BY s.m
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN o.v IS NOT NULL THEN s.m END
                         IGNORE NULLS) OVER (
               PARTITION BY s.event_type ORDER BY s.m
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nm
      FROM spine s LEFT JOIN obs o
        ON s.event_type = o.event_type AND s.m = o.m
    )
    SELECT event_type,
           strftime(to_timestamp(m * 60), '%Y-%m-%d %H:%M') AS minute,
           (v IS NOT NULL) AS observed,
           CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NULL THEN nv
             WHEN nv IS NULL THEN pv
             ELSE CAST(ROUND(CAST(
               pv + (nv - pv) * (m - pm) / (nm - pm)
               AS DECIMAL(28,10)), 4) AS DOUBLE)
           END AS value_interp
    FROM j
    """,
    tags=("temporal", "resample", "extension"),
)
def gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X130: gap-fill the per-(event_type, minute) value series by
    LINEAR INTERPOLATION — the regularization step between
    forward-fill (X69, step function) and model-based imputation:
    every minute in each type's observed span gets a value, missing
    minutes sit on the straight line between their bracketing
    observations (edges clamp to the nearest observation). The
    ``observed`` flag keeps real and imputed rows distinguishable
    downstream.

    Plan: per-(type, minute) mean via one partial agg (decimal-exact,
    4 dp); the spine is ``sequence()`` per type (no global calendar
    cross join); bracketing observations come from two running
    ``last/first(ignorenulls)`` window pairs over the SPINE, whose
    size is time-range-bounded (minutes in span × types), not
    corpus-bounded — at 100 TB the event count grows but the spine
    does not, and the per-type window state is one scalar. The
    interpolation formula is written once, the same IEEE order on both
    engines, rounded to 4 dp through DECIMAL."""
    from ..functions.epoch import epoch_us

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(epoch_us("ts") / 60_000_000).cast("bigint").alias("m"),
        "value",
    )
    obs = ev.groupBy("event_type", "m").agg(
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1)),
            4,
        )
        .cast("double")
        .alias("v")
    )
    span = ev.groupBy("event_type").agg(
        F.min("m").alias("m0"), F.max("m").alias("m1")
    )
    spine = span.select(
        "event_type", F.explode(F.sequence("m0", "m1")).alias("m")
    )
    j = spine.join(obs, ["event_type", "m"], "left")
    back = (
        Window.partitionBy("event_type")
        .orderBy("m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("event_type")
        .orderBy("m")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    m_obs = F.when(F.col("v").isNotNull(), F.col("m"))
    j = j.select(
        "event_type",
        "m",
        "v",
        F.last("v", ignorenulls=True).over(back).alias("pv"),
        F.last(m_obs, ignorenulls=True).over(back).alias("pm"),
        F.first("v", ignorenulls=True).over(fwd).alias("nv"),
        F.first(m_obs, ignorenulls=True).over(fwd).alias("nm"),
    )
    interp = (
        F.col("pv")
        + (F.col("nv") - F.col("pv"))
        * (F.col("m") - F.col("pm"))
        / (F.col("nm") - F.col("pm"))
    )
    return j.select(
        "event_type",
        F.date_format(
            F.timestamp_seconds(F.col("m") * 60), "yyyy-MM-dd HH:mm"
        ).alias("minute"),
        F.col("v").isNotNull().alias("observed"),
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(
            F.round(interp.cast("decimal(28,10)"), 4).cast("double")
        )
        .alias("value_interp"),
    )
