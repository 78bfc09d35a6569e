"""Deterministic synthetic "deloton" log built from the events table.

The reference ingests a Kafka topic of ``{"log": "<line>"}`` messages in
five line shapes (FIXTURES.md B1; main.py:99,118,127,140,146). The
driver's testdata has no such topic, so the parsing/sessionization
queries synthesize an equivalent log *inside the query*, deterministically
from ``events`` — and the DuckDB oracle synthesizes the identical log
with the same SQL-expressible mapping, keeping the whole pipeline
oracle-checkable end-to-end.

Mapping (event_type → line shape):
- signup   → ride-boundary marker line             (main.py:99)
- view     → "Getting user data from server"       (main.py:118)
- click    → "data = {...}" python-dict user blob  (main.py:127)
- purchase → "Ride - duration = V; resistance = K" (main.py:140)
- error    → "Telemetry - hrt = K; rpm = V; power = 2V" (main.py:146)

``msg_idx`` = event_id (the Kafka-offset stand-in; order-sensitivity per
SURVEY.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .epoch import epoch_ms

#: Timestamp string with microseconds — explicit pattern on both engines
#: so trailing-zero trimming can't diverge.
_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"

MARKER_TEXT = "--------- beginning of a new ride ---------"


def synthetic_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(msg_idx, user_id, event_type, ts, log) — the simulated stream."""
    ev = load_table(spark, sf_dir, "events")
    ts_s = F.date_format("ts", _TS_FMT_SPARK)
    ms = epoch_ms("ts")
    k = F.get_json_object("props", "$.k")
    uid = F.col("user_id")
    line = (
        F.when(
            F.col("event_type") == "signup",
            F.concat(ts_s, F.lit(f" [SYSTEM] {MARKER_TEXT}")),
        )
        .when(
            F.col("event_type") == "view",
            F.concat(ts_s, F.lit(" [INFO]: Getting user data from server")),
        )
        .when(
            F.col("event_type") == "click",
            F.concat(
                ts_s,
                F.lit(" [SYSTEM] data = {'user_id': "),
                uid,
                F.lit(", 'name': 'Mr User "),
                uid,
                F.lit("', 'gender': 'male', 'address': '"),
                uid,
                F.lit(" High St,Lowtown,AB1 2CD', 'date_of_birth': "),
                ms,
                F.lit(", 'height_cm': 180, 'weight_kg': 80, "),
                F.lit("'account_create_date': "),
                ms,
                F.lit(", 'original_source': 'offline'}"),
            ),
        )
        .when(
            F.col("event_type") == "purchase",
            F.concat(
                ts_s,
                F.lit(" [INFO]: Ride - duration = "),
                F.col("value"),
                F.lit("; resistance = "),
                k,
            ),
        )
        .otherwise(
            F.concat(
                ts_s,
                F.lit(" [INFO]: Telemetry - hrt = "),
                k,
                F.lit("; rpm = "),
                F.col("value"),
                F.lit("; power = "),
                F.col("value") * 2,
            )
        )
    )
    return ev.select(
        F.col("event_id").alias("msg_idx"),
        "user_id",
        "event_type",
        "ts",
        line.alias("log"),
    )


#: DuckDB CTE producing the byte-identical log. Consumers prepend
#: ``WITH log AS ({LOG_CTE}), ...``.
LOG_CTE = f"""
    SELECT event_id AS msg_idx, user_id, event_type, ts,
        CASE event_type
          WHEN 'signup' THEN strftime(ts, '{_TS_FMT_DUCK}')
              || ' [SYSTEM] {MARKER_TEXT}'
          WHEN 'view' THEN strftime(ts, '{_TS_FMT_DUCK}')
              || ' [INFO]: Getting user data from server'
          WHEN 'click' THEN strftime(ts, '{_TS_FMT_DUCK}')
              || ' [SYSTEM] data = {{''user_id'': ' || CAST(user_id AS VARCHAR)
              || ', ''name'': ''Mr User ' || CAST(user_id AS VARCHAR)
              || ''', ''gender'': ''male'', ''address'': ''' || CAST(user_id AS VARCHAR)
              || ' High St,Lowtown,AB1 2CD'', ''date_of_birth'': '
              || CAST(epoch_ms(ts) AS VARCHAR)
              || ', ''height_cm'': 180, ''weight_kg'': 80, '
              || '''account_create_date'': ' || CAST(epoch_ms(ts) AS VARCHAR)
              || ', ''original_source'': ''offline''}}'
          WHEN 'purchase' THEN strftime(ts, '{_TS_FMT_DUCK}')
              || ' [INFO]: Ride - duration = ' || CAST(value AS VARCHAR)
              || '; resistance = ' || json_extract_string(props, '$.k')
          ELSE strftime(ts, '{_TS_FMT_DUCK}')
              || ' [INFO]: Telemetry - hrt = ' || json_extract_string(props, '$.k')
              || '; rpm = ' || CAST(value AS VARCHAR)
              || '; power = ' || CAST(value * 2 AS VARCHAR)
        END AS log
    FROM events
"""
