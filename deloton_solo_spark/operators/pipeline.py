"""The composed ingest pipeline — the reference's entire
``data_cleanser`` (main.py:69-184) as ONE declarative Spark plan,
oracle-checked end-to-end (SURVEY.md §5 test 2, §7 step 3).

Quirk parity (all verified against the loop, main.py:96-175):
- every non-marker line emits a state-carrying row (main.py:153),
  including the user-fetch and user-blob lines themselves;
- rows emitted before a ride's user blob carry ``user_id`` NULL
  (``user_dict['user_id'] is None``), forming a NULL group;
- per-USER grouping (trailing list element, main.py:162-164), not
  per-ride — the reference's intent/bug, kept;
- per group: start_time = the **2nd** emitted value, duration = the
  last, avg of resistance/rpm/power/hrt (main.py:171);
- groups are dropped ``[1:-1]`` in first-appearance order
  (main.py:175) — the NULL group appears first (ride 0's user-fetch
  line) and is always the one dropped at the head;
- user-table rows dedup on FIRST occurrence globally — the
  ``existing_user`` set is never reset at ride boundaries
  (main.py:85,131).

Scale shape: marker prefix-sum (distributed two-phase), per-ride and
per-user windows (bounded groups), one tiny ranking window over one row
per user. No global single-partition sort anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import parsing as P
from ..functions.ridelog import RIDE_LOG_CTE, well_formed_ride_log
from ..functions.windows import prefix_sum
from ..registry import query

# DuckDB rounds the BINARY double (x.70374999… → .7037) while Spark
# rounds its decimal representation (x.70375 → .7038); recovering the
# quotient into DECIMAL(28,10) before ROUND makes ties agree.
_AVG = (
    "CAST(ROUND(CAST(CAST(SUM(CAST({c} AS DECIMAL(18,2))) AS DOUBLE)"
    "/COUNT(*) AS DECIMAL(28,10)), 4) AS DOUBLE) AS avg_{c}"
)


def emitted_rows(log: DataFrame) -> DataFrame:
    """main.py:96-153: the per-line state machine → one row per
    non-marker line with forward-filled ride state.

    Perf shape: every regex/JSON parse runs in ONE codegen'd projection
    BEFORE the forward-fill window — WindowExec is interpreted and does
    no subexpression elimination, so ``when(cond, parse(log))`` inside
    ``last(...).over(...)`` re-ran the regex per fill column; the window
    now only carries small pre-parsed scalars."""
    c = F.col("log")
    is_marker = c.contains(P.MARKERS["new_ride"])
    r = prefix_sum(
        log.withColumn("__m", is_marker.cast("long")),
        F.col("__m"),
        "msg_idx",
        "ride",
    )
    wr = (
        Window.partitionBy("ride")
        .orderBy("msg_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )

    def ffill(val: F.Column, default=None) -> F.Column:
        out = F.last(val, ignorenulls=True).over(wr)
        return F.coalesce(out, F.lit(default)) if default is not None else out

    d, t = P.split_datetime_parts(c)
    is_fetch = c.contains(P.MARKERS["user_fetch"])
    is_blob = c.contains(P.MARKERS["user_data"])
    is_ride = c.contains(P.MARKERS["ride"])
    is_tel = c.contains(P.MARKERS["telemetry"])
    uid = P.user_struct(c).getField("user_id")
    parsed = r.select(
        "msg_idx",
        "ride",
        F.col("__m").alias("is_marker"),
        F.when(is_fetch, d).alias("_sd"),
        F.when(is_fetch, t).alias("_st"),
        F.when(is_blob, uid).alias("_uid"),
        F.when(is_ride, P.nth_last_num(c, 2)).alias("_dur"),
        F.when(is_ride, P.nth_last_num(c, 1).cast("int")).alias("_res"),
        F.when(is_tel, P.nth_last_num(c, 3).cast("int")).alias("_hrt"),
        F.when(is_tel, P.nth_last_num(c, 2)).alias("_rpm"),
        F.when(is_tel, P.nth_last_num(c, 1)).alias("_pow"),
    )
    return (
        parsed.select(
            "msg_idx",
            "ride",
            "is_marker",
            ffill(F.col("_sd")).alias("start_datetime"),
            ffill(F.col("_st")).alias("start_time"),
            ffill(F.col("_uid")).alias("user_id"),
            ffill(F.col("_dur"), 0.0).alias("duration"),
            ffill(F.col("_res"), 0).alias("resistance"),
            ffill(F.col("_hrt"), 0).alias("hrt"),
            ffill(F.col("_rpm"), 0.0).alias("rpm"),
            ffill(F.col("_pow"), 0.0).alias("power"),
        )
        .filter(F.col("is_marker") == 0)
        .drop("is_marker")
    )


# Composed rides pipeline -------------------------------------------------
@query(
    "ride_ingest_pipeline",
    oracle=f"""
    WITH ridelog AS ({RIDE_LOG_CTE}),
    c AS (
      SELECT msg_idx, log,
             CASE WHEN log LIKE '%beginning of a new ride%'
                  THEN 1 ELSE 0 END AS is_marker,
             SUM(CASE WHEN log LIKE '%beginning of a new ride%'
                      THEN 1 ELSE 0 END)
               OVER (ORDER BY msg_idx
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ride
      FROM ridelog
    ),
    f AS (
      SELECT msg_idx, is_marker,
        last_value(CASE WHEN log LIKE '%Getting user data%'
                        THEN split_part(log, ' ', 1) END IGNORE NULLS)
          OVER wr AS start_datetime,
        last_value(CASE WHEN log LIKE '%Getting user data%'
                        THEN split_part(log, ' ', 2) END IGNORE NULLS)
          OVER wr AS start_time,
        last_value(CASE WHEN log LIKE '%data = {{%'
                        THEN CAST(json_extract_string(
                               replace(regexp_extract(log, '\\{{.*\\}}'),
                                       '''', '"'),
                               '$.user_id') AS BIGINT) END IGNORE NULLS)
          OVER wr AS user_id,
        COALESCE(last_value(CASE WHEN log LIKE '%Ride - %'
              THEN CAST((regexp_extract_all(log, '\\d+\\.?\\d*'))[-2] AS DOUBLE)
              END IGNORE NULLS) OVER wr, 0.0) AS duration,
        COALESCE(last_value(CASE WHEN log LIKE '%Ride - %'
              THEN CAST((regexp_extract_all(log, '\\d+\\.?\\d*'))[-1] AS INT)
              END IGNORE NULLS) OVER wr, 0) AS resistance,
        COALESCE(last_value(CASE WHEN log LIKE '%Telemetry - %'
              THEN CAST((regexp_extract_all(log, '\\d+\\.?\\d*'))[-3] AS INT)
              END IGNORE NULLS) OVER wr, 0) AS hrt,
        COALESCE(last_value(CASE WHEN log LIKE '%Telemetry - %'
              THEN CAST((regexp_extract_all(log, '\\d+\\.?\\d*'))[-2] AS DOUBLE)
              END IGNORE NULLS) OVER wr, 0.0) AS rpm,
        COALESCE(last_value(CASE WHEN log LIKE '%Telemetry - %'
              THEN CAST((regexp_extract_all(log, '\\d+\\.?\\d*'))[-1] AS DOUBLE)
              END IGNORE NULLS) OVER wr, 0.0) AS power
      FROM c
      WINDOW wr AS (PARTITION BY ride ORDER BY msg_idx
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    g AS (
      SELECT user_id, msg_idx, duration, resistance, rpm, power, hrt,
             nth_value(start_datetime || ' ' || start_time, 2) OVER wu AS st2,
             last_value(duration) OVER wu AS dur_last
      FROM f WHERE is_marker = 0
      WINDOW wu AS (PARTITION BY user_id ORDER BY msg_idx
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ),
    a AS (
      SELECT user_id,
             ANY_VALUE(st2) AS start_time,
             ANY_VALUE(dur_last) AS duration,
             {_AVG.format(c="resistance")},
             {_AVG.format(c="rpm")},
             {_AVG.format(c="power")},
             {_AVG.format(c="hrt")},
             MIN(msg_idx) AS first_idx
      FROM g GROUP BY user_id
    ),
    r AS (
      SELECT *, row_number() OVER (ORDER BY first_idx) AS rn,
             COUNT(*) OVER () AS n
      FROM a
    )
    SELECT user_id, start_time, duration,
           avg_resistance, avg_rpm, avg_power, avg_hrt
    FROM r WHERE rn > 1 AND rn < n
    """,
    tags=("pipeline", "sessionize"),
)
def ride_ingest_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1-T6 composed: the full rides-table construction
    (main.py:96-175) as one Spark plan over the well-formed log."""
    e = emitted_rows(well_formed_ride_log(spark, sf_dir))
    # r11: the per-user window's exchange is ~2.7 MB, so AQE coalesces
    # it to ONE partition and the whole window+aggregate chain ran
    # single-task (measured: 1.0-1.3 s stages). An explicit repartition
    # on the window key is not coalescible and the window/groupBy reuse
    # its partitioning — same plan shape at real scale, where the
    # exchange would exceed the advisory size anyway.
    e = e.repartition(
        e.sparkSession.sparkContext.defaultParallelism, "user_id"
    )
    wu = (
        Window.partitionBy("user_id")
        .orderBy("msg_idx")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    st = F.concat(F.col("start_datetime"), F.lit(" "), F.col("start_time"))

    def dec_avg(c: str) -> F.Column:
        # decimal division end-to-end — the double quotient's shortest
        # repr can fall on EITHER side of a .00005 tie (55.68375 prints
        # as 55.683749999999996), so round before leaving decimal
        return (
            F.round(
                F.sum(F.col(c).cast("decimal(18,2)")) / F.count(F.lit(1)),
                4,
            )
            .cast("double")
            .alias(f"avg_{c}")
        )

    a = (
        e.select(
            "user_id",
            "msg_idx",
            "duration",
            "resistance",
            "rpm",
            "power",
            "hrt",
            F.nth_value(st, 2).over(wu).alias("st2"),
            F.last("duration").over(wu).alias("dur_last"),
        )
        .groupBy("user_id")
        .agg(
            F.any_value(F.col("st2")).alias("start_time"),
            F.any_value(F.col("dur_last")).alias("duration"),
            dec_avg("resistance"),
            dec_avg("rpm"),
            dec_avg("power"),
            dec_avg("hrt"),
            F.min("msg_idx").alias("first_idx"),
        )
    )
    # Drop first/last group WITHOUT a ranking window: first_idx is
    # unique per group, so rank 1 == MIN and rank n == MAX — a scalar
    # aggregate broadcast back as a filter (the drop_first_last_group
    # rewrite; the user dimension grows with the corpus, so ranking it
    # through a global window was not scale-bounded).
    edges = a.agg(
        F.min("first_idx").alias("__lo"), F.max("first_idx").alias("__hi")
    )
    return (
        a.join(F.broadcast(edges))
        .filter(
            (F.col("first_idx") != F.col("__lo"))
            & (F.col("first_idx") != F.col("__hi"))
        )
        .select(
            "user_id",
            "start_time",
            "duration",
            "avg_resistance",
            "avg_rpm",
            "avg_power",
            "avg_hrt",
        )
    )


# Composed users pipeline -------------------------------------------------
@query(
    "users_ingest_pipeline",
    oracle=f"""
    WITH ridelog AS ({RIDE_LOG_CTE}),
    blobs AS (
      SELECT msg_idx,
             replace(regexp_extract(log, '\\{{.*\\}}'), '''', '"') AS j
      FROM ridelog WHERE log LIKE '%data = {{%'
    ),
    u AS (
      SELECT msg_idx,
             CAST(json_extract_string(j, '$.user_id') AS BIGINT) AS user_id,
             json_extract_string(j, '$.name') AS raw_name,
             json_extract_string(j, '$.gender') AS gender,
             json_extract_string(j, '$.address') AS address,
             CAST(json_extract_string(j, '$.date_of_birth') AS BIGINT) AS dob,
             CAST(json_extract_string(j, '$.height_cm') AS BIGINT) AS height,
             CAST(json_extract_string(j, '$.weight_kg') AS BIGINT) AS weight,
             CAST(json_extract_string(j, '$.account_create_date') AS BIGINT)
                 AS acd,
             json_extract_string(j, '$.original_source') AS original_source,
             row_number() OVER (PARTITION BY
                 CAST(json_extract_string(j, '$.user_id') AS BIGINT)
                 ORDER BY msg_idx) AS rn
      FROM blobs
    )
    SELECT user_id,
           regexp_replace(raw_name, '^(Mr|Ms|Dr|Mrs|Miss)( |$)', '') AS name,
           gender,
           {P.AGE_ANCHOR_YEAR}
             - EXTRACT(YEAR FROM make_timestamp(dob * 1000)) AS age,
           height, weight,
           strftime(make_timestamp(acd * 1000), '%Y-%m-%d %H:%M:%S')
               AS account_created,
           original_source,
           (string_split(address, ','))[-1] AS postcode
    FROM u WHERE rn = 1
    """,
    tags=("pipeline", "parsing", "dedup"),
)
def users_ingest_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4-P8 + T4 composed: the users-table construction
    (main.py:127-138) — parse each blob, keep the globally-first
    occurrence per user, cleanse."""
    log = well_formed_ride_log(spark, sf_dir).filter(
        F.col("log").contains(P.MARKERS["user_data"])
    )
    u = log.select("msg_idx", P.user_struct(F.col("log")).alias("u"))
    w = Window.partitionBy("u.user_id").orderBy("msg_idx")
    return (
        u.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("u.user_id").alias("user_id"),
            P.strip_title(F.col("u.name")).alias("name"),
            F.col("u.gender").alias("gender"),
            P.age_from_epoch_ms(F.col("u.date_of_birth"))
            .cast("long")
            .alias("age"),
            F.col("u.height_cm").alias("height"),
            F.col("u.weight_kg").alias("weight"),
            P.epoch_ms_to_ts_str(F.col("u.account_create_date")).alias(
                "account_created"
            ),
            F.col("u.original_source").alias("original_source"),
            P.postcode(F.col("u.address")).alias("postcode"),
        )
    )
