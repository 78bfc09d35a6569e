"""Parsing / scalar-function queries — SURVEY.md §2.2 (P1-P13).

Each query runs the reference's log-line cleanser semantics over the
deterministic synthetic log (functions/logsim.py) or directly over the
driver tables, with a DuckDB oracle computing the identical result from
the identical synthesized log.

All expressions are built-in Spark SQL functions inside whole-stage
codegen — the hot parse path has zero Python. At 100 TB the parse is an
embarrassingly parallel narrow map over the Kafka/file scan: no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import parsing as P
from ..functions.logsim import LOG_CTE, synthetic_log
from ..registry import query

_NUMS = r"regexp_extract_all(log, '\d+\.?\d*')"


# P1 ----------------------------------------------------------------------
@query(
    "regex_timestamp_extract",
    oracle=f"""
    WITH log AS ({LOG_CTE})
    SELECT msg_idx,
           regexp_extract(log, '\\d{{4}}-\\d{{2}}-\\d{{2}} \\d{{2}}:\\d{{2}}:\\d{{2}}')
               AS ts_str
    FROM log
    """,
    tags=("parsing",),
)
def regex_timestamp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: timestamp prefix extraction (main.py:23,54-55)."""
    log = synthetic_log(spark, sf_dir)
    return log.select(
        "msg_idx",
        F.date_format(P.ts_extract(F.col("log")), "yyyy-MM-dd HH:mm:ss").alias(
            "ts_str"
        ),
    )


# P2 ----------------------------------------------------------------------
@query(
    "line_type_dispatch",
    oracle=f"""
    WITH log AS ({LOG_CTE})
    SELECT msg_idx,
           CASE
             WHEN log LIKE '%Telemetry - %' THEN 'telemetry'
             WHEN log LIKE '%Ride - %' THEN 'ride'
             WHEN log LIKE '%data = {{%' THEN 'user_data'
             WHEN log LIKE '%Getting user data%' THEN 'user_fetch'
             WHEN log LIKE '%beginning of a new ride%' THEN 'new_ride'
             ELSE 'other'
           END AS line_type
    FROM log
    """,
    tags=("parsing",),
)
def line_type_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: five-way dispatch by substring containment (main.py:99,118,
    127,140,146)."""
    log = synthetic_log(spark, sf_dir)
    return log.select("msg_idx", P.line_type(F.col("log")).alias("line_type"))


# P9 + P10 (+P2) — the telemetry/ride parse ------------------------------
@query(
    "parse_log_pipeline",
    oracle=f"""
    WITH log AS ({LOG_CTE})
    SELECT msg_idx,
           CASE WHEN log LIKE '%Ride - %'
                THEN CAST(({_NUMS})[-2] AS DOUBLE) END AS duration,
           CASE WHEN log LIKE '%Ride - %'
                THEN CAST(({_NUMS})[-1] AS INT) END AS resistance,
           CASE WHEN log LIKE '%Telemetry - %'
                THEN CAST(({_NUMS})[-3] AS INT) END AS hrt,
           CASE WHEN log LIKE '%Telemetry - %'
                THEN CAST(({_NUMS})[-2] AS DOUBLE) END AS rpm,
           CASE WHEN log LIKE '%Telemetry - %'
                THEN CAST(({_NUMS})[-1] AS DOUBLE) END AS power
    FROM log
    """,
    tags=("parsing",),
)
def parse_log_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9/P10: positional numeric-token extraction — last two tokens of a
    Ride line are (duration, resistance); last three of a Telemetry line
    are (hrt, rpm, power) (main.py:74,140-150) — then typed casts
    (main.py:153)."""
    log = synthetic_log(spark, sf_dir)
    c = F.col("log")
    is_ride = c.contains(P.MARKERS["ride"])
    is_tel = c.contains(P.MARKERS["telemetry"])
    return log.select(
        "msg_idx",
        F.when(is_ride, P.nth_last_num(c, 2)).alias("duration"),
        F.when(is_ride, P.nth_last_num(c, 1).cast("int")).alias("resistance"),
        F.when(is_tel, P.nth_last_num(c, 3).cast("int")).alias("hrt"),
        F.when(is_tel, P.nth_last_num(c, 2)).alias("rpm"),
        F.when(is_tel, P.nth_last_num(c, 1)).alias("power"),
    )


# P3 + P11 ----------------------------------------------------------------
@query(
    "split_datetime_parts",
    oracle=f"""
    WITH log AS ({LOG_CTE})
    SELECT msg_idx,
           split_part(log, ' ', 1) AS ride_date,
           split_part(log, ' ', 2) AS ride_time,
           split_part(log, ' ', 1) || ' ' || split_part(log, ' ', 2)
               AS start_datetime,
           EXTRACT(YEAR FROM CAST(split_part(log, ' ', 1) AS DATE)) AS y,
           EXTRACT(MONTH FROM CAST(split_part(log, ' ', 1) AS DATE)) AS m,
           EXTRACT(DAY FROM CAST(split_part(log, ' ', 1) AS DATE)) AS d
    FROM log WHERE log LIKE '%Getting user data%'
    """,
    tags=("parsing",),
)
def split_datetime_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/P11: date/time tokens of the user-fetch line (main.py:118-123)
    + concat back (main.py:153)."""
    log = synthetic_log(spark, sf_dir).filter(
        F.col("log").contains(P.MARKERS["user_fetch"])
    )
    d, t = P.split_datetime_parts(F.col("log"))
    dt = F.to_date(d)
    return log.select(
        "msg_idx",
        d.alias("ride_date"),
        t.alias("ride_time"),
        F.concat_ws(" ", d, t).alias("start_datetime"),
        F.year(dt).cast("long").alias("y"),
        F.month(dt).cast("long").alias("m"),
        F.dayofmonth(dt).cast("long").alias("d"),
    )


# P4 ----------------------------------------------------------------------
@query(
    "struct_literal_parse",
    oracle=f"""
    WITH log AS ({LOG_CTE}),
    blobs AS (
      SELECT msg_idx,
             replace(regexp_extract(log, '\\{{.*\\}}'), '''', '"') AS j
      FROM log WHERE log LIKE '%data = {{%'
    )
    SELECT msg_idx,
           CAST(json_extract_string(j, '$.user_id') AS BIGINT) AS user_id,
           json_extract_string(j, '$.name') AS name,
           json_extract_string(j, '$.gender') AS gender,
           json_extract_string(j, '$.address') AS address,
           CAST(json_extract_string(j, '$.date_of_birth') AS BIGINT)
               AS date_of_birth,
           CAST(json_extract_string(j, '$.height_cm') AS BIGINT) AS height_cm,
           CAST(json_extract_string(j, '$.weight_kg') AS BIGINT) AS weight_kg,
           CAST(json_extract_string(j, '$.account_create_date') AS BIGINT)
               AS account_create_date,
           json_extract_string(j, '$.original_source') AS original_source
    FROM blobs
    """,
    tags=("parsing",),
)
def struct_literal_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: the embedded Python-dict literal → typed struct
    (main.py:73,127-129) — the one semantic gap vs JSON, handled by
    quote normalization + from_json (SURVEY.md §7 risk #2)."""
    log = synthetic_log(spark, sf_dir).filter(
        F.col("log").contains(P.MARKERS["user_data"])
    )
    u = P.user_struct(F.col("log"))
    return log.select("msg_idx", u.alias("u")).select(
        "msg_idx",
        F.col("u.user_id").alias("user_id"),
        F.col("u.name").alias("name"),
        F.col("u.gender").alias("gender"),
        F.col("u.address").alias("address"),
        F.col("u.date_of_birth").alias("date_of_birth"),
        F.col("u.height_cm").alias("height_cm"),
        F.col("u.weight_kg").alias("weight_kg"),
        F.col("u.account_create_date").alias("account_create_date"),
        F.col("u.original_source").alias("original_source"),
    )


# P5 + P6 + P7 + P8 — the users-row ETL ----------------------------------
@query(
    "user_etl_clean",
    oracle=f"""
    WITH log AS ({LOG_CTE}),
    blobs AS (
      SELECT msg_idx,
             replace(regexp_extract(log, '\\{{.*\\}}'), '''', '"') AS j
      FROM log WHERE log LIKE '%data = {{%'
    ),
    u AS (
      SELECT msg_idx,
             CAST(json_extract_string(j, '$.user_id') AS BIGINT) AS user_id,
             json_extract_string(j, '$.name') AS raw_name,
             json_extract_string(j, '$.address') AS address,
             CAST(json_extract_string(j, '$.date_of_birth') AS BIGINT) AS dob,
             CAST(json_extract_string(j, '$.account_create_date') AS BIGINT) AS acd
      FROM blobs
    )
    SELECT msg_idx, user_id,
           regexp_replace(raw_name, '^(Mr|Ms|Dr|Mrs|Miss)( |$)', '') AS name,
           {P.AGE_ANCHOR_YEAR}
               - EXTRACT(YEAR FROM make_timestamp(dob * 1000)) AS age,
           (string_split(address, ','))[-1] AS postcode,
           strftime(make_timestamp(acd * 1000), '%Y-%m-%d %H:%M:%S')
               AS account_created
    FROM u
    """,
    tags=("parsing",),
)
def user_etl_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5-P8: the users-row construction — honorific strip
    (main.py:133-135), calendar-year age quirk (main.py:130), postcode =
    last comma-segment (main.py:136-137), epoch-ms → timestamp string
    (main.py:137)."""
    log = synthetic_log(spark, sf_dir).filter(
        F.col("log").contains(P.MARKERS["user_data"])
    )
    u = P.user_struct(F.col("log"))
    return log.select("msg_idx", u.alias("u")).select(
        "msg_idx",
        F.col("u.user_id").alias("user_id"),
        P.strip_title(F.col("u.name")).alias("name"),
        P.age_from_epoch_ms(F.col("u.date_of_birth")).cast("long").alias("age"),
        P.postcode(F.col("u.address")).alias("postcode"),
        P.epoch_ms_to_ts_str(F.col("u.account_create_date")).alias(
            "account_created"
        ),
    )


# Shared CTE: the parsed user blob (P4) feeding the single-op P5-P8
# queries below. Kept as one string so the Spark and DuckDB sides stay in
# lockstep with user_etl_clean above.
_BLOBS_CTE = f"""
    WITH log AS ({LOG_CTE}),
    blobs AS (
      SELECT msg_idx,
             replace(regexp_extract(log, '\\{{.*\\}}'), '''', '"') AS j
      FROM log WHERE log LIKE '%data = {{%'
    )
"""


def _user_blob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(msg_idx, u: struct) — parsed user dict per click line."""
    log = synthetic_log(spark, sf_dir).filter(
        F.col("log").contains(P.MARKERS["user_data"])
    )
    return log.select("msg_idx", P.user_struct(F.col("log")).alias("u"))


# P5 ----------------------------------------------------------------------
@query(
    "age_from_epoch_ms",
    oracle=f"""
    {_BLOBS_CTE}
    SELECT msg_idx,
           {P.AGE_ANCHOR_YEAR}
             - EXTRACT(YEAR FROM make_timestamp(
                 CAST(json_extract_string(j, '$.date_of_birth') AS BIGINT)
                 * 1000)) AS age
    FROM blobs
    """,
    tags=("parsing",),
)
def age_from_epoch_ms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: age = calendar-year difference from an epoch-ms birth date —
    not birthday-accurate, parity quirk kept (main.py:130)."""
    return _user_blob(spark, sf_dir).select(
        "msg_idx",
        P.age_from_epoch_ms(F.col("u.date_of_birth")).cast("long").alias("age"),
    )


# P6 ----------------------------------------------------------------------
@query(
    "strip_title_prefix",
    oracle=f"""
    {_BLOBS_CTE}
    SELECT msg_idx,
           regexp_replace(json_extract_string(j, '$.name'),
                          '^(Mr|Ms|Dr|Mrs|Miss)( |$)', '') AS name
    FROM blobs
    """,
    tags=("parsing",),
)
def strip_title_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: drop a leading honorific token (main.py:75,133-135)."""
    return _user_blob(spark, sf_dir).select(
        "msg_idx", P.strip_title(F.col("u.name")).alias("name")
    )


# P7 ----------------------------------------------------------------------
@query(
    "postcode_from_address",
    oracle=f"""
    {_BLOBS_CTE}
    SELECT msg_idx,
           (string_split(json_extract_string(j, '$.address'), ','))[-1]
               AS postcode
    FROM blobs
    """,
    tags=("parsing",),
)
def postcode_from_address(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: postcode = last comma-segment of the address
    (main.py:136-137)."""
    return _user_blob(spark, sf_dir).select(
        "msg_idx", P.postcode(F.col("u.address")).alias("postcode")
    )


# P8 ----------------------------------------------------------------------
@query(
    "epoch_ms_to_timestamp_str",
    oracle=f"""
    {_BLOBS_CTE}
    SELECT msg_idx,
           strftime(make_timestamp(
               CAST(json_extract_string(j, '$.account_create_date') AS BIGINT)
               * 1000), '%Y-%m-%d %H:%M:%S') AS account_created
    FROM blobs
    """,
    tags=("parsing",),
)
def epoch_ms_to_timestamp_str(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: epoch-millis → 'YYYY-MM-DD HH:MM:SS' string (main.py:137);
    UTC pinned (SURVEY.md §7 risk #3)."""
    return _user_blob(spark, sf_dir).select(
        "msg_idx",
        P.epoch_ms_to_ts_str(F.col("u.account_create_date")).alias(
            "account_created"
        ),
    )


# P9 ----------------------------------------------------------------------
@query(
    "positional_number_extract",
    oracle=f"""
    WITH log AS ({LOG_CTE})
    SELECT msg_idx,
           ({_NUMS})[-1] AS tok_last,
           ({_NUMS})[-2] AS tok_2nd_last,
           ({_NUMS})[-3] AS tok_3rd_last
    FROM log
    """,
    tags=("parsing",),
)
def positional_number_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: re.findall numeric tokens picked by negative index
    (main.py:74,141-150) — raw string tokens, casts are P10."""
    log = synthetic_log(spark, sf_dir)
    toks = P.nums(F.col("log"))
    return log.select(
        "msg_idx",
        F.element_at(toks, -1).alias("tok_last"),
        F.element_at(toks, -2).alias("tok_2nd_last"),
        F.element_at(toks, -3).alias("tok_3rd_last"),
    )


# P10 ---------------------------------------------------------------------
@query(
    "type_casts",
    oracle=f"""
    WITH log AS ({LOG_CTE})
    SELECT msg_idx,
           CAST(({_NUMS})[-2] AS DOUBLE) AS as_double,
           CAST(CAST(({_NUMS})[-1] AS DOUBLE) AS INT) AS as_int
    FROM log WHERE log LIKE '%Ride - %'
    """,
    tags=("parsing",),
)
def type_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10: float(duration), int(resistance) casts on extracted tokens
    (main.py:153)."""
    log = synthetic_log(spark, sf_dir).filter(
        F.col("log").contains(P.MARKERS["ride"])
    )
    c = F.col("log")
    return log.select(
        "msg_idx",
        P.nth_last_num(c, 2).alias("as_double"),
        P.nth_last_num(c, 1).cast("int").alias("as_int"),
    )


# P11 ---------------------------------------------------------------------
@query(
    "string_concat",
    oracle=f"""
    WITH log AS ({LOG_CTE})
    SELECT msg_idx,
           split_part(log, ' ', 1) || ' ' || split_part(log, ' ', 2)
               AS start_datetime
    FROM log WHERE log LIKE '%Getting user data%'
    """,
    tags=("parsing",),
)
def string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11: ``start_datetime + ' ' + start_time`` (main.py:153)."""
    log = synthetic_log(spark, sf_dir).filter(
        F.col("log").contains(P.MARKERS["user_fetch"])
    )
    d, t = P.split_datetime_parts(F.col("log"))
    return log.select(
        "msg_idx", F.concat_ws(" ", d, t).alias("start_datetime")
    )


# P12 ---------------------------------------------------------------------
@query(
    "substr_date_parts",
    oracle="""
    SELECT o_orderkey,
           substr(CAST(o_orderdate AS VARCHAR), 1, 4) AS start_year,
           substr(CAST(o_orderdate AS VARCHAR), 6, 2) AS start_month,
           substr(CAST(o_orderdate AS VARCHAR), 9, 2) AS start_day
    FROM orders
    """,
    tags=("parsing",),
)
def substr_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12: string-slice date parts (api.py:24-27)."""
    s = F.col("o_orderdate").cast("string")
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.substring(s, 1, 4).alias("start_year"),
        F.substring(s, 6, 2).alias("start_month"),
        F.substring(s, 9, 2).alias("start_day"),
    )


# P13 ---------------------------------------------------------------------
@query(
    "timestamp_to_string",
    oracle="""
    SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str FROM events
    """,
    tags=("parsing",),
)
def timestamp_to_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P13: timestamp → string at the serialization edge
    (api.py:24,31,35,43,53)."""
    return load_table(spark, sf_dir, "events").select(
        "event_id", F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str")
    )
