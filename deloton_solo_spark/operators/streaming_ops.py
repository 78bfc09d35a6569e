"""Streaming pipeline queries — real Structured Streaming runs,
oracle-checked (SURVEY.md §2.6).

Each query executes an actual ``readStream`` → transform →
``writeStream`` pipeline with ``Trigger.AvailableNow`` inside the query
function (scratch dirs for source/sink/checkpoint), then returns the
materialized sink as a DataFrame. The DuckDB oracle computes the same
result relationally — so the correctness gate covers the streaming
engine path end-to-end, not just the batch twins.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.logsim import LOG_CTE, synthetic_log
from ..operators.sources import WIRE_CTE, kafka_wire
from ..registry import query
from ..streaming.pipeline import (
    file_wire_stream,
    ingest_available_now,
    parse_wire_stream,
    run_stream_to_parquet,
    sessionize_stream,
)


def _scratch(prefix: str) -> str:
    path = tempfile.mkdtemp(prefix=prefix)
    shutil.rmtree(path, ignore_errors=True)
    return path


# §2.6 ingest: S1/S2/S3/S5 as one streaming run ---------------------------
@query(
    "streaming_ingest_pipeline",
    oracle=f"""
    WITH log AS ({LOG_CTE}), wire AS ({WIRE_CTE})
    SELECT "partition", "offset",
           CAST("key" AS BIGINT) AS user_id,
           strftime(CAST(regexp_extract(
               json_extract_string("value", '$.log'),
               '\\d{{4}}-\\d{{2}}-\\d{{2}} \\d{{2}}:\\d{{2}}:\\d{{2}}')
             AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS line_ts,
           CASE
             WHEN json_extract_string("value", '$.log') LIKE '%Telemetry - %'
               THEN 'telemetry'
             WHEN json_extract_string("value", '$.log') LIKE '%Ride - %'
               THEN 'ride'
             WHEN json_extract_string("value", '$.log') LIKE '%data = {{%'
               THEN 'user_data'
             WHEN json_extract_string("value", '$.log') LIKE '%Getting user data%'
               THEN 'user_fetch'
             WHEN json_extract_string("value", '$.log')
                    LIKE '%beginning of a new ride%'
               THEN 'new_ride'
             ELSE 'other'
           END AS line_type
    FROM wire
    """,
    tags=("streaming", "source", "sink"),
)
def streaming_ingest_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6: the reference's whole ingest loop as Structured Streaming —
    wire-format replay (S1) → bounded AvailableNow drain (S2,
    main.py:45-66) → envelope decode + parse (S3, main.py:53) →
    idempotent foreachBatch upsert sink (S5, sql_wrapper.py:44-46).

    The pipeline runs TWICE with independent checkpoints (simulated
    redelivery of every message); the upsert keeps the sink exact-once,
    which is what the oracle asserts."""
    src, out = _scratch("stream_src_"), _scratch("stream_out_")
    kafka_wire(synthetic_log(spark, sf_dir)).coalesce(4).write.json(src)
    for attempt in range(2):
        parsed = parse_wire_stream(file_wire_stream(spark, src)).select(
            "partition",
            "offset",
            "user_id",
            F.date_format("line_ts", "yyyy-MM-dd HH:mm:ss").alias("line_ts"),
            "line_type",
        )
        ingest_available_now(
            parsed, out, _scratch(f"stream_ckpt{attempt}_"), keys=["offset"]
        )
    return spark.read.parquet(out)


# X5 streaming twin -------------------------------------------------------
@query(
    "streaming_sessionize",
    oracle="""
    WITH d AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts)
                       - lag(epoch_us(ts)) OVER
                           (PARTITION BY user_id ORDER BY ts, event_id)
                       > 30 * 60 * 1000000
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), s AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS session_seq
      FROM d
    )
    SELECT user_id,
           epoch_ms(MIN(ts)) AS session_start_ms,
           epoch_ms(MAX(ts)) AS session_end_ms,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, session_seq
    """,
    tags=("streaming", "sessionize", "extension"),
)
def streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 as true streaming: ``session_window`` + watermark over an
    events replay, append mode, AvailableNow.

    Append mode only emits a session once the watermark passes its
    close, and the watermark itself only advances between micro-batch
    runs — so after the data drain, two sentinel rounds (far-future
    rows under a sentinel key) push the watermark past every real
    session and flush the state store. That is the deterministic replay
    form of "the stream keeps running and late sessions eventually
    finalize"; the sentinel key is dropped from the result."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    src, out = _scratch("sess_src_"), _scratch("sess_out_")
    ckpt = _scratch("sess_ckpt_")
    schema = "user_id bigint, ts timestamp, event_id bigint"
    ev.coalesce(4).write.json(src)
    max_ts = ev.agg(F.max("ts")).collect()[0][0]

    def _run() -> None:
        stream = spark.readStream.schema(schema).json(src)
        run_stream_to_parquet(sessionize_stream(stream), out, ckpt)

    _run()
    for round_no, days in enumerate((10, 20)):
        sentinel = spark.createDataFrame(
            [(-1, max_ts, -1)], schema
        ).withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {days} DAYS"))
        sentinel.write.mode("append").json(src)
        _run()
    return spark.read.parquet(out).filter(F.col("user_id") >= 0)
