"""Relational query surface — the reference's Flask API re-expressed.

Reference: /root/reference/deloton_stuff/api.py (queries Q1-Q10 in
SURVEY.md §2.4) plus the implied-but-never-implemented ``rider_stats``
aggregate (api.py:69,76 docstrings) and an aggregation headliner.

Role mapping (FIXTURES.md §A): ``users`` → ``customer`` (categorical
filter col ``c_mktsegment`` plays ``gender``; numeric range col
``c_acctbal`` plays ``age``), ``rides`` → ``orders`` (date-part filters
on ``o_orderdate``; measure ``o_totalprice``).

Scale notes (100 TB):
- customer⋈orders is dim⋈fact → explicit ``broadcast(customer_proj)``
  so no shuffle of the fact side (verified in .explain: BroadcastHashJoin).
- All filters are plain column predicates → Catalyst pushes them into the
  parquet scan (PushedFilters) and prunes columns (ReadSchema).
- Aggregates are partial (map-side combine) automatically via
  ``groupBy().agg()`` — no ``collect()`` anywhere.

Float-parity note: money sums/averages are computed exactly via
DECIMAL(18,2) accumulation then cast back to DOUBLE, so Spark and the
DuckDB oracle produce bit-identical values regardless of summation order
(double-sum reassociation would otherwise differ in low bits).

Timestamps are cast to string at the output edge, mirroring the
reference's P13 ``timestamp_to_string`` (api.py:24,31,35,43,53).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

# Shared projections ------------------------------------------------------

_ORDERS_STR_TS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders with o_orderdate stringified (P13 edge cast)."""
    return (
        load_table(spark, sf_dir, "orders")
        .withColumn("o_orderdate", F.col("o_orderdate").cast("string"))
        .select(*_ORDERS_STR_TS)
    )


_ORDERS_ORACLE = """
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           CAST(o_orderdate AS VARCHAR) AS o_orderdate, o_orderpriority
    FROM orders
"""


def _users_rides_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """users⋈rides core: broadcast the dim side (api.py:32-33)."""
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    return F.broadcast(customer).join(
        _orders(spark, sf_dir), F.col("c_custkey") == F.col("o_custkey"), "inner"
    )


_JOIN_COLS = ["c_mktsegment", "c_acctbal"] + _ORDERS_STR_TS

_JOIN_ORACLE_BODY = f"""
    FROM customer c INNER JOIN ({_ORDERS_ORACLE}) o ON c.c_custkey = o.o_custkey
"""


# Q1 ----------------------------------------------------------------------
@query(
    "inner_equi_join",
    oracle=f"""
    SELECT c.c_mktsegment, c.c_acctbal, o.* {_JOIN_ORACLE_BODY}
    """,
    tags=("relational", "join"),
)
def inner_equi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1: SELECT t1.gender, t1.age, t2.* FROM users JOIN rides
    (api.py:32-33). Broadcast hash join — zero fact-side shuffle."""
    return _users_rides_join(spark, sf_dir).select(*_JOIN_COLS)


# Q2 ----------------------------------------------------------------------
@query(
    "join_filter_eq",
    oracle=f"""
    SELECT c.c_mktsegment, c.c_acctbal, o.* {_JOIN_ORACLE_BODY}
    WHERE c.c_mktsegment = 'BUILDING'
    """,
    tags=("relational", "join", "filter"),
)
def join_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2: join + WHERE gender='male' (api.py:37-45). Catalyst pushes the
    predicate below the join into the dim scan."""
    return (
        _users_rides_join(spark, sf_dir)
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(*_JOIN_COLS)
    )


# Q3 ----------------------------------------------------------------------
@query(
    "filter_eq_int",
    oracle=f"SELECT * FROM ({_ORDERS_ORACLE}) o WHERE o_custkey = 7",
    tags=("relational", "filter"),
)
def filter_eq_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: rides[rides.user_id == id] (api.py:65,79,143). Pushed to the
    parquet scan as PushedFilters: [EqualTo(o_custkey,7)]."""
    return _orders(spark, sf_dir).filter(F.col("o_custkey") == 7)


# Q4 ----------------------------------------------------------------------
@query(
    "filter_eq_str",
    oracle="SELECT * FROM customer WHERE c_mktsegment = 'MACHINERY'",
    tags=("relational", "filter"),
)
def filter_eq_str(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4: users[users.gender == g] (api.py:86)."""
    return load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "MACHINERY"
    )


# Q5 ----------------------------------------------------------------------
@query(
    "filter_range_between",
    oracle="SELECT * FROM customer WHERE c_acctbal BETWEEN 1000 AND 5000",
    tags=("relational", "filter"),
)
def filter_range_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5: age-range filter parsed from "lo-hi" (api.py:110-120)."""
    return load_table(spark, sf_dir, "customer").filter(
        F.col("c_acctbal").between(1000, 5000)
    )


# Q6 ----------------------------------------------------------------------
@query(
    "filter_date_parts",
    oracle=f"""
    SELECT * FROM ({_ORDERS_ORACLE}) o
    WHERE CAST(o_orderdate AS TIMESTAMP) >= TIMESTAMP '1996-03-01'
      AND CAST(o_orderdate AS TIMESTAMP) <  TIMESTAMP '1996-04-01'
    """,
    tags=("relational", "filter"),
)
def filter_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: filter rides by year/month/day (api.py:148-181). The reference
    compares string-sliced date parts; we filter on the timestamp as a
    range predicate so partition pruning / row-group min-max skipping
    apply at scale (SURVEY.md Q6 note)."""
    orders = load_table(spark, sf_dir, "orders")
    out = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    return out.withColumn("o_orderdate", F.col("o_orderdate").cast("string")).select(
        *_ORDERS_STR_TS
    )


# Q7 ----------------------------------------------------------------------
@query(
    "column_projection",
    oracle="""
    SELECT o_orderkey, CAST(o_orderdate AS VARCHAR) AS o_orderdate,
           o_totalprice, o_custkey
    FROM orders
    """,
    tags=("relational", "projection"),
)
def column_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: explicit column list (api.py:103,105). Catalyst column pruning
    → parquet ReadSchema contains only these 4 columns."""
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderdate").cast("string").alias("o_orderdate"),
        "o_totalprice",
        "o_custkey",
    )


# Q8 ----------------------------------------------------------------------
@query(
    "full_projection",
    oracle="SELECT * FROM customer",
    tags=("relational", "projection"),
)
def full_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: SELECT * passthrough (/riders, api.py:70-74)."""
    return load_table(spark, sf_dir, "customer").select("*")


# Q9 ----------------------------------------------------------------------
@query(
    "conditional_branch_query",
    oracle=f"""
    SELECT o.* {_JOIN_ORACLE_BODY} WHERE c.c_mktsegment = 'AUTOMOBILE'
    """,
    tags=("relational", "join"),
)
def conditional_branch_query(
    spark: SparkSession, sf_dir: str, segment: str = "AUTOMOBILE"
) -> DataFrame:
    """Q9: request-arg chooses between pre-filtered frames
    (api.py:97-107) — a driver-side plan-level branch."""
    if segment == "AUTOMOBILE":
        base = _users_rides_join(spark, sf_dir).filter(
            F.col("c_mktsegment") == "AUTOMOBILE"
        )
    else:
        base = _users_rides_join(spark, sf_dir).filter(
            F.col("c_mktsegment") == segment
        )
    return base.select(*_ORDERS_STR_TS)


# Q10 ---------------------------------------------------------------------
@query(
    "isin_list_filter",
    oracle="SELECT * FROM customer WHERE c_mktsegment IN ('BUILDING','MACHINERY')",
    tags=("relational", "filter"),
)
def isin_list_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: one-or-many area values (api.py:123-137, designed but
    commented out in the reference)."""
    return load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )


# rider_stats -------------------------------------------------------------
@query(
    "rider_stats",
    oracle="""
    SELECT o_custkey AS user_id,
           COUNT(o_orderkey) AS num_rides,
           CAST(ROUND(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                                AS DOUBLE) / COUNT(o_orderkey)
                           AS DECIMAL(28,10)), 4) AS DOUBLE)
               AS avg_totalprice
    FROM orders GROUP BY o_custkey
    """,
    tags=("relational", "agg"),
)
def rider_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The API's promised-but-missing per-rider aggregate: "avg. heart
    rate, number of rides" (api.py:69,76 docstrings; SURVEY.md §2.5).
    Partial aggregation map-side; single shuffle on the group key."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"))
        .agg(
            F.count("o_orderkey").alias("num_rides"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                / F.count("o_orderkey"),
                4,
            )
            .cast("double")
            .alias("avg_totalprice"),
        )
    )


# Aggregation headliner (flagship) ---------------------------------------
@query(
    "agg_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
               AS sum_disc_price,
           COUNT(*) AS count_order,
           CAST(ROUND(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                                AS DOUBLE) / COUNT(*)
                           AS DECIMAL(28,10)), 4) AS DOUBLE) AS avg_qty,
           CAST(ROUND(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                                AS DOUBLE) / COUNT(*)
                           AS DECIMAL(28,10)), 4) AS DOUBLE) AS avg_price
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("relational", "agg", "flagship"),
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H-Q1-style pricing summary over lineitem —
    exercises scan (S4), projection (Q7), partial agg + group shuffle
    (T5's mean semantics at fact-table scale). Only 4 columns read
    (column pruning); sums are DECIMAL-exact for oracle parity."""
    li = load_table(spark, sf_dir, "lineitem")
    dec_qty = F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
    dec_price = F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_qty.alias("sum_qty"),
            dec_price.alias("sum_base_price"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
            F.round(
                F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                / F.count(F.lit(1)),
                4,
            )
            .cast("double")
            .alias("avg_qty"),
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                / F.count(F.lit(1)),
                4,
            )
            .cast("double")
            .alias("avg_price"),
        )
    )


# top-k -------------------------------------------------------------------
@query(
    "topk_customers_by_spend",
    oracle="""
    SELECT o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
    FROM orders GROUP BY o_custkey
    ORDER BY total_spend DESC, o_custkey LIMIT 10
    """,
    tags=("relational", "agg", "topk"),
)
def topk_customers_by_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by aggregate — absent from the reference (SURVEY.md §2.5),
    added as a first-class op. Spark plans this as TakeOrderedAndProject
    (per-partition top-k then merge — no global sort shuffle)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_spend")
        )
        .orderBy(F.col("total_spend").desc(), F.col("o_custkey"))
        .limit(10)
    )


# Runtime-filter (Bloom-style) pruned join --------------------------------
#: membership-table width for the hashed prefilter (k=1 Bloom filter).
_BLOOM_M = 1 << 16


@query(
    "bloom_prune_join",
    oracle="""
    SELECT l.l_returnflag AS returnflag,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY l.l_returnflag
    """,
    tags=("relational", "join", "runtime-filter"),
)
def bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-table join pruned by an explicit runtime membership filter:
    the selective dimension side (urgent orders) is compacted into a
    hashed bucket set (a k=1 Bloom filter — deterministic, no false
    negatives), the fact scan probes it via a broadcast semi-join
    BEFORE the real join, and the exact join then removes the hash
    false positives. Result provably identical to the plain join, so
    the oracle is the naive SQL.

    Scale shape: this is the manual form of Spark's own
    InjectRuntimeFilter/DPP — at 100 TB the prefilter drops most
    non-matching fact rows at the scan side of the shuffle instead of
    shuffling them to the join. Both joins broadcast the (small)
    dimension side; the fact table is never shuffled at all."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    buckets = orders.select(
        F.pmod(F.xxhash64("o_orderkey"), F.lit(_BLOOM_M)).alias("b")
    ).distinct()
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    pruned = li.join(
        F.broadcast(buckets),
        F.pmod(F.xxhash64("l_orderkey"), F.lit(_BLOOM_M)) == F.col("b"),
        "leftsemi",
    )
    out = pruned.join(
        F.broadcast(orders), F.col("l_orderkey") == F.col("o_orderkey")
    )
    return out.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,4)"
            )
        )
        .cast("double")
        .alias("revenue"),
    )


# X152 — referential-integrity audit ---------------------------------------
@query(
    "referential_integrity_audit",
    oracle="""
    WITH checks AS (
      SELECT 'lineitem.l_orderkey -> orders.o_orderkey' AS relationship,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_child,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
              WHERE l.l_orderkey IS NULL) AS n_null_fk,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
              WHERE l.l_orderkey IS NOT NULL
                AND NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey))
               AS n_orphans
      UNION ALL
      SELECT 'orders.o_custkey -> customer.c_custkey',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
             (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
              WHERE o_custkey IS NULL),
             (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
              WHERE o.o_custkey IS NOT NULL
                AND NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey))
      UNION ALL
      SELECT 'customer.c_nationkey -> nation.n_nationkey',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM customer),
             (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
              WHERE c_nationkey IS NULL),
             (SELECT CAST(COUNT(*) AS BIGINT) FROM customer c
              WHERE c.c_nationkey IS NOT NULL
                AND NOT EXISTS (SELECT 1 FROM nation n
                                WHERE n.n_nationkey = c.c_nationkey))
      UNION ALL
      SELECT 'lineitem.l_suppkey -> supplier.s_suppkey',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
              WHERE l_suppkey IS NULL),
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
              WHERE l.l_suppkey IS NOT NULL
                AND NOT EXISTS (SELECT 1 FROM supplier s
                                WHERE s.s_suppkey = l.l_suppkey))
    )
    SELECT relationship, n_child, n_null_fk, n_orphans,
           n_orphans = 0 AND n_null_fk = 0 AS intact
    FROM checks
    """,
    tags=("quality", "relational", "extension"),
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X152: REFERENTIAL-INTEGRITY audit — the dbt-test / constraint-
    validation pass a lakehouse runs because parquet enforces nothing:
    for each declared FK relationship, the child count, NULL-FK count,
    and ORPHAN count (non-null FK with no parent), plus the intact
    verdict. On this testdata all four edges hold — the audit proves
    it rather than assumes it; on a feed with late-arriving dims the
    orphan counts are the retry queue.

    Plan: each relationship is one LEFT ANTI join on the key (hash
    shuffle on ints; the nation/supplier parents broadcast under AQE)
    feeding a count — never a row-level materialization; the four
    audits union into one report frame. At 100 TB each anti-join is
    the bucketed-table shape and the audit is one pass per edge."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier")

    def check(
        rel: str, child: DataFrame, fk: str, parent: DataFrame, pk: str
    ) -> DataFrame:
        n_child = child.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_child")
        )
        n_null = child.filter(F.col(fk).isNull()).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_null_fk")
        )
        orphans = (
            child.filter(F.col(fk).isNotNull())
            .join(parent, child[fk] == parent[pk], "left_anti")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_orphans"))
        )
        return (
            n_child.crossJoin(n_null)
            .crossJoin(orphans)
            .select(
                F.lit(rel).alias("relationship"),
                "n_child",
                "n_null_fk",
                "n_orphans",
                (
                    (F.col("n_orphans") == 0) & (F.col("n_null_fk") == 0)
                ).alias("intact"),
            )
        )

    return (
        check(
            "lineitem.l_orderkey -> orders.o_orderkey",
            li, "l_orderkey", orders, "o_orderkey",
        )
        .unionAll(
            check(
                "orders.o_custkey -> customer.c_custkey",
                orders, "o_custkey", cust, "c_custkey",
            )
        )
        .unionAll(
            check(
                "customer.c_nationkey -> nation.n_nationkey",
                cust, "c_nationkey", nat, "n_nationkey",
            )
        )
        .unionAll(
            check(
                "lineitem.l_suppkey -> supplier.s_suppkey",
                li, "l_suppkey", supp, "s_suppkey",
            )
        )
    )


# X153 — candidate-key uniqueness profiling --------------------------------
@query(
    "key_uniqueness_profile",
    oracle="""
    WITH p AS (
      SELECT 'orders(o_orderkey)' AS candidate_key,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_rows,
             (SELECT CAST(COUNT(DISTINCT o_orderkey) AS BIGINT)
              FROM orders) AS n_distinct
      UNION ALL
      SELECT 'lineitem(l_orderkey, l_linenumber)',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
             (SELECT CAST(COUNT(*) AS BIGINT) FROM
              (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem))
      UNION ALL
      SELECT 'lineitem(l_orderkey, l_linenumber, l_partkey, l_suppkey)',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
             (SELECT CAST(COUNT(*) AS BIGINT) FROM
              (SELECT DISTINCT l_orderkey, l_linenumber, l_partkey,
                      l_suppkey FROM lineitem))
      UNION ALL
      SELECT 'events(event_id)',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM events),
             (SELECT CAST(COUNT(DISTINCT event_id) AS BIGINT) FROM events)
      UNION ALL
      SELECT 'documents(doc_id)',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM documents),
             (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) FROM documents)
    )
    SELECT candidate_key, n_rows, n_distinct,
           n_rows - n_distinct AS n_dup_rows,
           n_distinct = n_rows AS is_unique
    FROM p
    """,
    tags=("quality", "relational", "extension"),
)
def key_uniqueness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X153: CANDIDATE-KEY uniqueness profiling — the constraint-
    discovery audit that decides what may serve as row identity,
    merge key, or bucketing column: per declared candidate, total
    rows vs distinct key values and the verdict. It documents the
    trap this repo's verify skill warns about from data:
    (l_orderkey, l_linenumber) is NOT unique in the synthetic
    lineitem, while the widened (+ partkey, suppkey) candidate is —
    exactly the check that would have caught it before an oracle
    used it as identity.

    Plan: each candidate is one distinct-count aggregate (partial
    agg + one exchange on the key columns); candidates evaluate
    independently and union into the report. No row-level
    materialization; at 100 TB swap COUNT(DISTINCT) for the
    registered HLL sketch and the report shape is unchanged."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")

    def prof(label: str, df: DataFrame, cols: list[str]) -> DataFrame:
        n = df.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        d = (
            df.select(*cols)
            .distinct()
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_distinct"))
        )
        return n.crossJoin(d).select(
            F.lit(label).alias("candidate_key"),
            "n_rows",
            "n_distinct",
            (F.col("n_rows") - F.col("n_distinct")).alias("n_dup_rows"),
            (F.col("n_distinct") == F.col("n_rows")).alias("is_unique"),
        )

    return (
        prof("orders(o_orderkey)", orders, ["o_orderkey"])
        .unionAll(
            prof(
                "lineitem(l_orderkey, l_linenumber)",
                li,
                ["l_orderkey", "l_linenumber"],
            )
        )
        .unionAll(
            prof(
                "lineitem(l_orderkey, l_linenumber, l_partkey, l_suppkey)",
                li,
                ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"],
            )
        )
        .unionAll(prof("events(event_id)", ev, ["event_id"]))
        .unionAll(prof("documents(doc_id)", docs, ["doc_id"]))
    )


# X179 — physical-plan sizing advisor ---------------------------------------
#: planner constants: broadcast threshold and shuffle-partition target.
ADV_BROADCAST_BYTES = 10 * 1024 * 1024
ADV_PARTITION_BYTES = 128 * 1024 * 1024
#: fixed per-value width assumed for numeric/temporal columns (8 bytes)
#: plus a per-string overhead of 4 bytes — the planner's estimate, not
#: parquet's encoded size (stats feed a COST model, not an allocator).
ADV_FIXED = 8
ADV_STR_OVERHEAD = 4

#: table -> (numeric/temporal column count, string columns)
_ADV_TABLES = {
    "region": (1, ["r_name"]),
    "nation": (2, ["n_name"]),
    "customer": (3, ["c_name", "c_mktsegment"]),
    "supplier": (3, ["s_name"]),
    "orders": (4, ["o_orderstatus", "o_orderpriority"]),
    "lineitem": (9, ["l_returnflag", "l_linestatus"]),
    "events": (4, ["event_type", "props"]),
    "documents": (2, ["text", "lang", "source"]),
}


def _advisor_oracle() -> str:
    blocks = []
    for t, (n_num, strs) in _ADV_TABLES.items():
        strlen = " + ".join(
            f"COALESCE(length({c}), 0) + {ADV_STR_OVERHEAD}" for c in strs
        )
        blocks.append(f"""
    SELECT '{t}' AS table_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST({n_num * ADV_FIXED} * COUNT(*)
                + COALESCE(SUM({strlen}), 0) AS BIGINT) AS est_bytes
    FROM {t}""")
        # COALESCE(SUM(...), 0): an empty table must report 0 bytes
    union = "\n    UNION ALL\n".join(blocks)
    return f"""
    WITH est AS ({union})
    SELECT table_name, n_rows, est_bytes,
           GREATEST(CAST(1 AS BIGINT),
                    CAST(CEIL(CAST(est_bytes AS DOUBLE)
                              / {ADV_PARTITION_BYTES}) AS BIGINT))
             AS recommended_partitions,
           est_bytes < {ADV_BROADCAST_BYTES} AS broadcast_eligible
    FROM est
    """


@query(
    "physical_plan_advisor",
    oracle=_advisor_oracle(),
    tags=("relational", "optimizer", "extension"),
)
def physical_plan_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X179: PHYSICAL-PLAN sizing advisor — the statistics pass behind
    every tuning decision this repo's scale notes make by hand: per
    table, row count, estimated in-memory bytes (8 B per
    numeric/temporal value + measured string lengths + overhead),
    the shuffle-partition count that lands ~128 MB per partition, and
    broadcast eligibility under the 10 MB hint threshold. The same
    arithmetic an ANALYZE TABLE/CBO pass materializes; on this
    testdata it states which sides of every registered join are
    legitimately broadcast.

    Plan: one count+sum aggregate per table (string lengths fold into
    the scan projection); eight scans produce an 8-row report. All
    integer arithmetic except the partition ceil."""
    frames = []
    for t, (n_num, strs) in _ADV_TABLES.items():
        df = load_table(spark, sf_dir, t)
        strlen = None
        for c in strs:
            term = F.coalesce(F.length(F.col(c)), F.lit(0)) + F.lit(
                ADV_STR_OVERHEAD
            )
            strlen = term if strlen is None else strlen + term
        est = df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.coalesce(F.sum(strlen), F.lit(0))
            .cast("bigint")
            .alias("str_bytes"),
        ).select(
            F.lit(t).alias("table_name"),
            "n_rows",
            (
                F.lit(n_num * ADV_FIXED) * F.col("n_rows")
                + F.col("str_bytes")
            )
            .cast("bigint")
            .alias("est_bytes"),
        )
        frames.append(est)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out.select(
        "table_name",
        "n_rows",
        "est_bytes",
        F.greatest(
            F.lit(1).cast("bigint"),
            F.ceil(
                F.col("est_bytes").cast("double") / ADV_PARTITION_BYTES
            ).cast("bigint"),
        ).alias("recommended_partitions"),
        (F.col("est_bytes") < ADV_BROADCAST_BYTES).alias(
            "broadcast_eligible"
        ),
    )
