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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.logsim import LOG_CTE, synthetic_log
from ..functions.ridelog import RIDE_LOG_CTE, well_formed_ride_log
from ..operators import events as _events
from ..operators.sources import WIRE_CTE, kafka_wire
from ..registry import query
from ..streaming.pipeline import (
    file_wire_stream,
    ingest_available_now,
    parse_wire_stream,
    run_stream_to_parquet,
    sessionize_stream,
)
from ..streaming.stateful import parse_lines_for_state, rides_stream


def _scratch(prefix: str) -> str:
    # Stable path per purpose (ADVICE r3: no mkdtemp leak across reruns);
    # cleared on entry so each replay starts from empty source/checkpoint
    # state — a reused streaming checkpoint would resume and emit nothing.
    from ..session import scratch_dir

    path = scratch_dir(prefix.rstrip("_"))
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
    # Single-row scalar collect: computes the replay's high-water mark
    # to build watermark-flushing sentinels. Deterministic and inherent
    # to the bounded-replay test design, but it costs a full source scan
    # — a production pipeline tracks this in ingest metadata instead.
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


# Streaming dedup: state-backed dropDuplicates over a replay ------------
@query(
    "streaming_dedup",
    oracle="""
    SELECT event_id, user_id, event_type FROM events
    """,
    tags=("streaming", "dedup"),
)
def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (X1's streaming twin): the replay emits
    every event TWICE (at-least-once delivery); ``dropDuplicates`` on
    the key holds seen-keys in the state store so redelivered rows
    never reach the sink — across micro-batches too (two AvailableNow
    rounds on one checkpoint, the second re-delivering everything).
    The oracle is simply the distinct input. At 100 TB you bound the
    state with ``withWatermark`` + ``dropDuplicatesWithinWatermark``;
    unbounded here since the replay is finite."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    src, out = _scratch("sdedup_src_"), _scratch("sdedup_out_")
    ckpt = _scratch("sdedup_ckpt_")
    schema = "event_id bigint, user_id bigint, event_type string"
    dup = ev.unionAll(ev)

    def _run() -> None:
        stream = spark.readStream.schema(schema).json(src)
        run_stream_to_parquet(
            stream.dropDuplicates(["event_id"]), out, ckpt
        )

    dup.coalesce(4).write.json(src)
    _run()
    dup.coalesce(2).write.mode("append").json(src)  # full redelivery
    _run()
    return spark.read.parquet(out)


# Bounded-state streaming dedup: watermark-evicted seen-keys --------------
@query(
    "streaming_dedup_bounded",
    oracle="""
    SELECT event_id, user_id, event_type FROM events
    """,
    tags=("streaming", "dedup", "extension"),
)
def streaming_dedup_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of ``streaming_dedup``: ``withWatermark`` +
    ``dropDuplicatesWithinWatermark`` bounds the seen-keys state store
    to the watermark horizon instead of growing forever.

    Replay contract: every event is delivered twice in the first drain
    (at-least-once duplication inside one batch → deduped by state) and
    the entire stream is re-delivered in a second drain on the same
    checkpoint. By then the persisted watermark has passed most event
    times, so redelivered rows are dropped as late data *without any
    state lookup* — which is exactly why the state can be evicted: a
    key older than the watermark can never produce an accepted
    duplicate again. Either path keeps the sink exactly-once, which is
    what the oracle (the distinct input) asserts."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    src, out = _scratch("sdedupb_src_"), _scratch("sdedupb_out_")
    ckpt = _scratch("sdedupb_ckpt_")
    schema = "event_id bigint, user_id bigint, event_type string, ts timestamp"
    dup = ev.unionAll(ev)

    def _run() -> None:
        stream = spark.readStream.schema(schema).json(src)
        deduped = (
            stream.withWatermark("ts", "30 minutes")
            .dropDuplicatesWithinWatermark(["event_id"])
            .drop("ts")
        )
        run_stream_to_parquet(deduped, out, ckpt)

    dup.coalesce(4).write.json(src)
    _run()
    dup.coalesce(2).write.mode("append").json(src)  # full redelivery
    _run()
    return spark.read.parquet(out)


# Custom stateful operator: applyInPandasWithState ------------------------
_N_STATE_PARTS = 4

@query(
    "stateful_ride_rollup",
    oracle=f"""
    WITH ridelog AS ({RIDE_LOG_CTE}),
    l AS (
      SELECT msg_idx AS "offset",
             CAST((msg_idx // 20) % {_N_STATE_PARTS} AS INT) AS "partition",
             log
      FROM ridelog
    ),
    c AS (
      SELECT *,
             CAST(SUM(CASE WHEN log LIKE '%beginning of a new ride%'
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY "partition" ORDER BY "offset"
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS ride_seq
      FROM l
    ),
    e AS (
      SELECT "partition", ride_seq, "offset",
        last_value(CASE WHEN log LIKE '%Getting user data%'
            THEN split_part(log, ' ', 1) || ' ' || split_part(log, ' ', 2)
            END IGNORE NULLS) OVER wg AS start_time,
        last_value(CASE WHEN log LIKE '%data = {{%'
            THEN CAST(json_extract_string(
                   replace(regexp_extract(log, '\\{{.*\\}}'), '''', '"'),
                   '$.user_id') AS BIGINT) END IGNORE NULLS)
          OVER wg AS user_id,
        last_value(CASE WHEN log LIKE '%Ride - %'
            THEN CAST((regexp_extract_all(log, '\\d+\\.?\\d*'))[-2] AS DOUBLE)
            END IGNORE NULLS) OVER wg AS duration,
        last_value(CASE WHEN log LIKE '%Ride - %'
            THEN CAST((regexp_extract_all(log, '\\d+\\.?\\d*'))[-1] AS INT)
            END IGNORE NULLS) OVER wg AS resistance,
        CASE WHEN log LIKE '%Telemetry - %'
             THEN CAST((regexp_extract_all(log, '\\d+\\.?\\d*'))[-3] AS DOUBLE)
             END AS hrt,
        CASE WHEN log LIKE '%Telemetry - %'
             THEN CAST((regexp_extract_all(log, '\\d+\\.?\\d*'))[-2] AS DOUBLE)
             END AS rpm,
        CASE WHEN log LIKE '%Telemetry - %'
             THEN CAST((regexp_extract_all(log, '\\d+\\.?\\d*'))[-1] AS DOUBLE)
             END AS power
      FROM c WHERE log NOT LIKE '%beginning of a new ride%'
      WINDOW wg AS (PARTITION BY "partition", ride_seq ORDER BY "offset"
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    )
    SELECT "partition", ride_seq,
           ANY_VALUE(user_id) AS user_id,
           ANY_VALUE(start_time) AS start_time,
           ANY_VALUE(duration) AS duration,
           ANY_VALUE(resistance) AS resistance,
           AVG(hrt) AS avg_hrt,
           AVG(rpm) AS avg_rpm,
           AVG(power) AS avg_power,
           COUNT(*) AS n_lines
    FROM e
    GROUP BY "partition", ride_seq
    """,
    tags=("streaming", "stateful", "sessionize"),
)
def stateful_ride_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom stateful streaming operator end-to-end: the ride
    state machine as ``applyInPandasWithState`` (streaming/stateful.py)
    over a partitioned file replay of the well-formed log.

    Two AvailableNow rounds against one checkpoint: round 1 streams the
    log (rides closed by later markers in the same partition emit as
    they close — state persists in the store between batches); round 2
    streams one sentinel marker per partition, closing each partition's
    trailing ride. The oracle computes the identical per-ride rollup
    relationally."""
    log = well_formed_ride_log(spark, sf_dir)
    lines = log.select(
        ((F.col("msg_idx") / 20).cast("long") % _N_STATE_PARTS)
        .cast("int")
        .alias("partition"),
        F.col("msg_idx").alias("offset"),
        "log",
    )
    src, out = _scratch("state_src_"), _scratch("state_out_")
    ckpt = _scratch("state_ckpt_")
    lines.coalesce(4).write.json(src)
    # Single-row scalar collect: computes the replay's high-water mark
    # to build watermark-flushing sentinels. Deterministic and inherent
    # to the bounded-replay test design, but it costs a full source scan
    # — a production pipeline tracks this in ingest metadata instead.
    max_off = lines.agg(F.max("offset")).collect()[0][0]

    def _run() -> None:
        stream = spark.readStream.schema(
            "partition int, offset long, log string"
        ).json(src)
        rides = rides_stream(parse_lines_for_state(stream))
        run_stream_to_parquet(rides, out, ckpt)

    _run()
    sentinels = spark.createDataFrame(
        [
            (p, max_off + 1 + p,
             "2099-01-01 00:00:00.000000 [SYSTEM] --------- beginning of"
             " a new ride ---------")
            for p in range(_N_STATE_PARTS)
        ],
        "partition int, offset long, log string",
    )
    sentinels.write.mode("append").json(src)
    _run()
    return spark.read.parquet(out)


# Streaming windowed trending top-K ---------------------------------------
_TREND_K = 3


@query(
    "streaming_trending_topk",
    oracle=f"""
    WITH w AS (
      SELECT date_trunc('hour', ts) AS window_start, event_type,
             COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT epoch_ms(window_start) AS window_start_ms, event_type, n_events
    FROM (
      SELECT *, row_number() OVER (PARTITION BY window_start
                                   ORDER BY n_events DESC, event_type) AS rn
      FROM w
    ) WHERE rn <= {_TREND_K}
    """,
    tags=("streaming", "window", "extension"),
)
def streaming_trending_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending events: per-hour tumbling-window counts per event type
    computed INCREMENTALLY by Structured Streaming (watermark + window
    agg, append mode, AvailableNow replay), then the per-window top-K
    ranked from the materialized sink — the standard split where the
    unbounded part runs as bounded-state streaming and the tiny
    trending rank is a batch query over finalized windows.

    Append mode only emits a window once the watermark passes its end,
    and the watermark advances between micro-batch runs — so after the
    drain, two sentinel rounds (far-future rows under a sentinel type)
    flush every real window from the state store; the sentinel is
    dropped from the result (same replay discipline as
    streaming_sessionize). 1-hour tumbling windows are epoch-aligned,
    so the oracle's date_trunc('hour') is the identical bucketing."""
    from ..functions.epoch import epoch_ms

    ev = load_table(spark, sf_dir, "events").select("ts", "event_type")
    src, out = _scratch("trend_src_"), _scratch("trend_out_")
    ckpt = _scratch("trend_ckpt_")
    schema = "ts timestamp, event_type string"
    ev.coalesce(4).write.json(src)
    # Single-row scalar collect: computes the replay's high-water mark
    # to build watermark-flushing sentinels. Deterministic and inherent
    # to the bounded-replay test design, but it costs a full source scan
    # — a production pipeline tracks this in ingest metadata instead.
    max_ts = ev.agg(F.max("ts")).collect()[0][0]

    def _run() -> None:
        stream = (
            spark.readStream.schema(schema)
            .json(src)
            .withWatermark("ts", "2 hours")
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                F.col("window.start").alias("window_start"),
                "event_type",
                "n_events",
            )
        )
        run_stream_to_parquet(stream, out, ckpt)

    _run()
    for round_no, days in enumerate((10, 20)):
        sentinel = spark.createDataFrame(
            [(max_ts, "__sentinel__")], schema
        ).withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {days} DAYS"))
        sentinel.write.mode("append").json(src)
        _run()
    from pyspark.sql import Window

    sink = spark.read.parquet(out).filter(
        F.col("event_type") != "__sentinel__"
    )
    w = Window.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), "event_type"
    )
    return (
        sink.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TREND_K)
        .select(
            epoch_ms("window_start").alias("window_start_ms"),
            "event_type",
            "n_events",
        )
    )


# Stream-stream interval join: click→purchase attribution -----------------
@query(
    "streaming_attribution_join",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS lag_s
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click'
     AND p.event_type = 'purchase'
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 1 HOUR
    """,
    tags=("streaming", "join", "extension"),
)
def streaming_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STREAM interval join — the Structured Streaming capability
    batch twins can't fake: every click joined to every purchase by the
    same user within the following hour, both sides unbounded streams.

    Both sides carry a watermark and the join condition carries the
    time-range bound — that pair is what lets the engine EVICT buffered
    state (a click older than watermark - 1h can never match again), so
    state stays bounded on an infinite stream. Inner joins emit eagerly
    on match (no watermark wait), so one AvailableNow drain suffices;
    matching works across micro-batches through the state store. At
    100 TB state is partitioned by the equi-key (user_id) — the same
    shuffle shape as the batch join.

    The oracle is the batch self-join: stream-stream inner join
    semantics are exactly batch-join semantics, delivered incrementally.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    src, out = _scratch("attr_src_"), _scratch("attr_out_")
    ckpt = _scratch("attr_ckpt_")
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string"
    # split the replay across files so clicks and purchases of the same
    # user land in different micro-batch inputs (cross-batch matching).
    ev.coalesce(8).write.json(src)

    stream = spark.readStream.schema(schema).json(src)
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            """
            c_user = p_user
            AND purchase_ts >= click_ts
            AND purchase_ts <= click_ts + INTERVAL 1 HOUR
            """
        ),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        F.floor(
            (F.unix_micros("purchase_ts") - F.unix_micros("click_ts"))
            / F.lit(1_000_000)
        ).alias("lag_s"),
    )
    run_stream_to_parquet(joined, out, ckpt)
    return spark.read.parquet(out)


# Stream-static broadcast enrich ------------------------------------------
@query(
    "streaming_static_enrich",
    oracle="""
    SELECT e.event_id, e.user_id, e.event_type,
           c.c_mktsegment AS segment, n.n_name AS nation
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE e.event_type IN ('click', 'purchase')
    """,
    tags=("streaming", "join", "extension"),
)
def streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC join — enrich a live event stream with dimension
    attributes (customer segment, nation). Stateless per micro-batch:
    the static side is broadcast to every executor once and each batch
    hash-joins against it — no state store, no watermark, the plan
    every streaming ETL enrichment should compile to. At 100 TB the
    static side refreshes by swapping the snapshot the stream reads."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    dim = (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("segment"),
            F.col("n_name").alias("nation"),
        )
    )
    src, out = _scratch("enrich_src_"), _scratch("enrich_ckpt_")
    ckpt = _scratch("enrich_ckpt2_")
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string"
    ev.coalesce(4).write.json(src)
    stream = spark.readStream.schema(schema).json(src)
    enriched = (
        stream.filter(F.col("event_type").isin("click", "purchase"))
        .join(F.broadcast(dim), "user_id")
        .select("event_id", "user_id", "event_type", "segment", "nation")
    )
    run_stream_to_parquet(enriched, out, ckpt)
    return spark.read.parquet(out)


# Stream-stream LEFT OUTER interval join ----------------------------------
@query(
    "streaming_attribution_outer",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS lag_s
    FROM events c
    LEFT JOIN events p
      ON c.user_id = p.user_id
     AND p.event_type = 'purchase'
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 1 HOUR
    WHERE c.event_type = 'click'
    """,
    tags=("streaming", "join", "extension"),
)
def streaming_attribution_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join — the semantics inner
    joins can't give: every click appears, matched or not. An outer
    row's absence-of-match is only decidable once the watermark passes
    the click's join window (no future purchase can arrive), so
    unmatched clicks are emitted ON STATE EVICTION — the part of the
    streaming join engine the inner variant never exercises.

    Replay form: after the data drain, two sentinel rounds (far-future
    click+purchase under a sentinel user) advance the watermark past
    every real click's window, flushing all pending outer results; the
    sentinel user is dropped from the sink. The oracle is the batch
    LEFT JOIN."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    src, out = _scratch("attro_src_"), _scratch("attro_out_")
    ckpt = _scratch("attro_ckpt_")
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string"
    ev.coalesce(8).write.json(src)
    # Single-row scalar collect: computes the replay's high-water mark
    # to build watermark-flushing sentinels. Deterministic and inherent
    # to the bounded-replay test design, but it costs a full source scan
    # — a production pipeline tracks this in ingest metadata instead.
    max_ts = ev.agg(F.max("ts")).collect()[0][0]

    def _run() -> None:
        stream = spark.readStream.schema(schema).json(src)
        clicks = (
            stream.filter(F.col("event_type") == "click")
            .select(
                F.col("event_id").alias("click_id"),
                F.col("user_id").alias("c_user"),
                F.col("ts").alias("click_ts"),
            )
            .withWatermark("click_ts", "1 hour")
        )
        purchases = (
            stream.filter(F.col("event_type") == "purchase")
            .select(
                F.col("event_id").alias("purchase_id"),
                F.col("user_id").alias("p_user"),
                F.col("ts").alias("purchase_ts"),
            )
            .withWatermark("purchase_ts", "1 hour")
        )
        joined = clicks.join(
            purchases,
            F.expr(
                """
                c_user = p_user
                AND purchase_ts >= click_ts
                AND purchase_ts <= click_ts + INTERVAL 1 HOUR
                """
            ),
            "leftOuter",
        ).select(
            F.col("c_user").alias("user_id"),
            "click_id",
            "purchase_id",
            F.floor(
                (F.unix_micros("purchase_ts") - F.unix_micros("click_ts"))
                / F.lit(1_000_000)
            ).alias("lag_s"),
        )
        run_stream_to_parquet(joined, out, ckpt)

    _run()
    for round_no, days in enumerate((10, 20)):
        sentinel = spark.createDataFrame(
            [(-1, max_ts, -1, "click"), (-2, max_ts, -1, "purchase")], schema
        ).withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {days} DAYS"))
        sentinel.write.mode("append").json(src)
        _run()
    return spark.read.parquet(out).filter(F.col("user_id") >= 0)


# Streaming HLL: sketch mergeability as streaming correctness -------------
@query(
    "streaming_hll_merge",
    oracle=None,  # twin of hll_explicit_registers; see _STREAM_HLL_NOTE
    tags=("streaming", "sketch", "extension"),
)
def streaming_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of X77 ``hll_explicit_registers``: the register
    grid (event_type × bucket → MAX rho) is maintained INCREMENTALLY by
    a complete-mode streaming aggregation over a multi-batch replay,
    then the HLL estimate is computed from the final registers.

    This is the mergeability property of the sketch made into a
    streaming correctness test: MAX is commutative/associative and
    batch-insensitive, so however the replay is micro-batched the
    registers — and therefore the estimate — are bit-identical to the
    batch operator's. The local parity test asserts exactly that
    (streaming result == batch X77 result); the driver check is
    rows-only since the estimate logic already has its oracle on the
    batch side.

    Scale shape: streaming state = the fixed 64-cell register grid per
    group (the sketch's defining property); each micro-batch partially
    aggregates map-side before touching state."""
    from .analytics import _HLL_ALPHA, _HLL_M, _HLL_MAX_RHO_POW

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    src = _scratch("shll_src_")
    ckpt = _scratch("shll_ckpt_")
    ev.coalesce(8).write.json(src)  # 8 files → several micro-batches

    h = F.md5(F.concat(F.lit("hll-"), F.col("user_id").cast("string")))
    bucket = (
        F.conv(F.substring(h, 1, 2), 16, 10).cast("int") % _HLL_M
    ).alias("bucket")
    v = F.conv(F.substring(h, 3, 13), 16, 10).cast("bigint")
    rho = F.when(v == 0, F.lit(53)).otherwise(F.lit(53) - F.length(F.bin(v)))

    stream = (
        spark.readStream.schema("event_type string, user_id bigint")
        .option("maxFilesPerTrigger", 2)
        .json(src)
    )
    regs_q = (
        stream.select("event_type", bucket, rho.alias("rho"))
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("m_j"))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("shll_registers")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    regs_q.awaitTermination()
    regs = spark.table("shll_registers")
    s = regs.groupBy("event_type").agg(
        (
            F.sum(
                F.pow(F.lit(2), F.lit(53) - F.col("m_j")).cast("bigint")
            ).cast("bigint")
            + (_HLL_M - F.count(F.lit(1)).cast("bigint"))
            * F.lit(_HLL_MAX_RHO_POW).cast("bigint")
        ).alias("denom"),
        F.count(F.lit(1)).cast("bigint").alias("n_filled"),
    )
    raw = (
        F.lit(_HLL_ALPHA * _HLL_M * _HLL_M)
        * F.lit(float(_HLL_MAX_RHO_POW))
        / F.col("denom")
    )
    n_empty = F.lit(_HLL_M) - F.col("n_filled")
    corrected = F.when(
        (raw <= 2.5 * _HLL_M) & (n_empty > 0),
        F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / n_empty),
    ).otherwise(raw)
    return s.select(
        "event_type",
        F.round(corrected.cast("decimal(28,10)"), 4)
        .cast("double")
        .alias("est_users"),
    )


# Streaming curation front-end: the classifier as a stream projection ----
def _streaming_quality_oracle() -> str:
    from .textstats import classifier_sql

    return classifier_sql()


@query(
    "streaming_quality_filter",
    oracle=_streaming_quality_oracle(),
    tags=("streaming", "quality", "extension"),
)
def streaming_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quality classifier (``quality_classifier_score``) run as a
    STREAMING projection over a documents replay — the curation
    front-end in the ingest path: score-at-ingest instead of
    score-in-batch, so low-quality documents can be routed/dropped
    before they ever land in the corpus.

    Stateless streaming: the classifier is a pure per-row projection
    (no watermark, no state store), so it rides the source parallelism
    exactly like the batch plan — this query proves the SAME column
    expressions serve both engines (same oracle as the batch twin).
    Drained with AvailableNow over two micro-batch rounds to show
    batch-boundary independence."""
    from .textstats import classifier_frame

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src, out = _scratch("squal_src_"), _scratch("squal_out_")
    ckpt = _scratch("squal_ckpt_")
    schema = "doc_id bigint, text string"
    half = docs.filter(F.col("doc_id") % 2 == 0)
    rest = docs.filter(F.col("doc_id") % 2 == 1)

    def _run() -> None:
        stream = spark.readStream.schema(schema).json(src)
        run_stream_to_parquet(classifier_frame(stream), out, ckpt)

    half.coalesce(4).write.json(src)
    _run()
    rest.coalesce(4).write.mode("append").json(src)
    _run()
    return spark.read.parquet(out)


# Streaming OHLC bars: min_by/max_by in windowed streaming state ---------
@query(
    "streaming_minute_bars",
    oracle="""
    WITH m AS (
      SELECT event_type, value, ts, event_id,
             date_trunc('minute', ts) AS minute
      FROM events
    ),
    o AS (
      SELECT event_type, minute, value, ts, event_id,
             row_number() OVER (PARTITION BY event_type, minute
                                ORDER BY ts, event_id) AS rn_open,
             row_number() OVER (PARTITION BY event_type, minute
                                ORDER BY ts DESC, event_id DESC) AS rn_close
      FROM m
    )
    SELECT event_type,
           strftime(minute, '%Y-%m-%d %H:%M') AS minute,
           ANY_VALUE(CASE WHEN rn_open = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           ANY_VALUE(CASE WHEN rn_close = 1 THEN value END) AS close,
           COUNT(*) AS n
    FROM o GROUP BY event_type, strftime(minute, '%Y-%m-%d %H:%M')
    """,
    tags=("streaming", "timeseries", "extension"),
)
def streaming_minute_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X29's streaming twin: per-minute OHLC bars maintained
    INCREMENTALLY — watermarked 1-minute tumbling windows whose state
    per (type, bar) is five scalars, with open/close computed by
    ``min_by``/``max_by`` over the deterministic (ts, event_id) order
    (the batch form's ranking windows don't exist in streaming; the
    argmin/argmax form is the streaming-native equivalent and is
    order-insensitive, so micro-batch arrival order cannot change the
    result). Same oracle as the batch query — the two forms must agree
    bar for bar.

    Append mode + sentinel watermark advancement flush the state after
    the bounded replay (the established replay discipline); sentinel
    rows are dropped from the result."""
    ev = load_table(spark, sf_dir, "events").select(
        "ts", "event_id", "event_type", "value"
    )
    src, out = _scratch("bars_src_"), _scratch("bars_out_")
    ckpt = _scratch("bars_ckpt_")
    schema = (
        "ts timestamp, event_id bigint, event_type string, value double"
    )
    ev.coalesce(4).write.json(src)
    # Single-row scalar collect: the replay's high-water mark for the
    # watermark-flushing sentinels (see note at the other replays).
    max_ts = ev.agg(F.max("ts")).collect()[0][0]

    def _run() -> None:
        key = F.struct(F.col("ts"), F.col("event_id"))
        stream = (
            spark.readStream.schema(schema)
            .json(src)
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 minute"), "event_type")
            .agg(
                F.min_by("value", key).alias("open"),
                F.max("value").alias("high"),
                F.min("value").alias("low"),
                F.max_by("value", key).alias("close"),
                F.count(F.lit(1)).alias("n"),
            )
            .select(
                F.col("window.start").alias("minute_ts"),
                "event_type",
                "open",
                "high",
                "low",
                "close",
                "n",
            )
        )
        run_stream_to_parquet(stream, out, ckpt)

    _run()
    for days in (10, 20):
        sentinel = spark.createDataFrame(
            [(max_ts, -1, "__sentinel__", 0.0)], schema
        ).withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {days} DAYS"))
        sentinel.write.mode("append").json(src)
        _run()
    return (
        spark.read.parquet(out)
        .filter(F.col("event_type") != "__sentinel__")
        .select(
            "event_type",
            F.date_format("minute_ts", "yyyy-MM-dd HH:mm").alias("minute"),
            "open",
            "high",
            "low",
            "close",
            "n",
        )
    )


# Streaming admission control: per-source quota state at ingest ----------
#: max documents admitted per source across the whole stream.
ADMIT_CAP = 12


def _admission_kernel_factory(cap: int):
    import pandas as pd

    def admit(key, pdfs, state):
        # state = (admitted_count,) per source; rows within a micro-
        # batch are concatenated and sorted by doc_id once (the engine
        # groups by key but does NOT order rows — same discipline as
        # the ride state machine)
        taken = state.get[0] if state.exists else 0
        pdf = pd.concat(list(pdfs)).sort_values("doc_id")
        room = max(0, cap - taken)
        admitted = pdf.head(room)
        state.update((taken + len(admitted),))
        yield pd.DataFrame(
            {
                "source": admitted["source"],
                "doc_id": admitted["doc_id"],
                "admit_seq": range(taken + 1, taken + len(admitted) + 1),
            }
        )

    return admit


@query(
    "streaming_admission_cap",
    oracle=f"""
    SELECT source, doc_id, CAST(rk AS BIGINT) AS admit_seq FROM (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source
               ORDER BY CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END,
                        doc_id) AS rk
      FROM documents
    ) WHERE rk <= {ADMIT_CAP}
    """,
    tags=("streaming", "sampling", "curation", "extension"),
)
def streaming_admission_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ADMISSION CONTROL: at most ``ADMIT_CAP`` documents per
    source accepted at ingest, with the per-source quota held as
    streaming STATE across micro-batches (``applyInPandasWithState``
    keyed by source) — the streaming-native form of
    ``domain_cap_sample`` when you cannot buffer the corpus and rank:
    first-come first-admitted, later arrivals bounce off a full quota.

    Replay contract (what makes this oracle-exact): two AvailableNow
    drains on one checkpoint — micro-batch 1 carries the even doc_ids,
    micro-batch 2 the odd — and within a batch each source's rows are
    processed in doc_id order. Admission order is therefore
    (batch_no, doc_id) per source, which is exactly the oracle's
    ranking. The emitted ``admit_seq`` is the quota counter as it was
    consumed, proving the state survived the batch boundary.

    Scale shape: state is ONE integer per source (the smallest possible
    stateful operator); the only wide op is the groupBy(source) routing
    exchange carrying (source, doc_id) — never text. Under
    at-least-once delivery a redelivered doc would consume a second
    quota slot — production pairs this with the upstream streaming
    dedup (``streaming_dedup``) or the idempotent sink, exactly as the
    ingest pipeline composes them."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    src, out = _scratch("admit_src_"), _scratch("admit_out_")
    ckpt = _scratch("admit_ckpt_")
    schema = "doc_id bigint, source string"

    def _run() -> None:
        # The replay contract needs each AvailableNow drain to land in
        # ONE micro-batch (admission order = (batch, doc_id) per
        # source). Pin maxFilesPerTrigger well above the files-per-drain
        # count so a default change or a larger SF can never silently
        # split a drain and diverge from the oracle ranking.
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1000)
            .json(src)
            .groupBy("source")
            .applyInPandasWithState(
                _admission_kernel_factory(ADMIT_CAP),
                outputStructType=(
                    "source string, doc_id bigint, admit_seq bigint"
                ),
                stateStructType="taken int",
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )
        run_stream_to_parquet(stream, out, ckpt)

    docs.filter(F.col("doc_id") % 2 == 0).coalesce(4).write.json(src)
    _run()
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(4).write.mode(
        "append"
    ).json(src)
    _run()
    return spark.read.parquet(out)


# Composed streaming curation: filter → dedup → admission, two hops ------
def _sdedup_keeper_kernel(key, pdfs, state):
    # per content-hash state: has this hash been admitted already?
    # Within a micro-batch the kernel sees EVERY row of its hash, so
    # the winner (min doc_id) is deterministic regardless of task
    # order — unlike dropDuplicates, whose within-batch winner is
    # arrival-order arbitrary.
    import pandas as pd

    if state.exists:
        # hash already represented by an earlier batch's winner
        yield pd.DataFrame(
            {"doc_id": [], "source": [], "score": []}
        ).astype({"doc_id": "int64", "source": "object", "score": "float64"})
        return
    pdf = pd.concat(list(pdfs)).sort_values("doc_id")
    state.update((True,))
    yield pdf.head(1)[["doc_id", "source", "score"]]


def _streaming_curation_oracle() -> str:
    from .textstats import classifier_sql

    return f"""
    WITH scored AS ({classifier_sql(extra_cols=", source",
                                    feature_cols=False)}),
    kept AS (
      SELECT s.doc_id, s.source, s.score, md5(d.text) AS h
      FROM scored s JOIN documents d ON s.doc_id = d.doc_id
      WHERE s.verdict
    ),
    dd AS (
      SELECT doc_id, source, score FROM (
        SELECT doc_id, source, score,
               row_number() OVER (
                 PARTITION BY h
                 ORDER BY CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END,
                          doc_id) AS rn
        FROM kept
      ) WHERE rn = 1
    )
    SELECT source, doc_id, score, CAST(admit_seq AS BIGINT) AS admit_seq
    FROM (
      SELECT source, doc_id, score,
             row_number() OVER (PARTITION BY source
                                ORDER BY doc_id) AS admit_seq
      FROM dd
    ) WHERE admit_seq <= {ADMIT_CAP}
    """


@query(
    "streaming_curation_pipeline",
    oracle=_streaming_curation_oracle(),
    tags=("streaming", "curation", "dedup", "quality", "extension"),
)
def streaming_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END curation front-end AT INGEST, as a two-hop
    streaming pipeline (the streaming twin of the batch
    ``curation_pipeline``):

    hop 1 — quality classifier as a stateless projection → verdict
    filter → EXACT DEDUP with per-content-hash state (a custom
    ``applyInPandasWithState`` keeper kernel: within a micro-batch the
    kernel sees every row of its hash and picks the min-doc_id winner
    deterministically — ``dropDuplicates``' within-batch winner is
    arrival-order arbitrary, which would break oracle exactness) →
    intermediate parquet hop;
    hop 2 — per-source ADMISSION quota (``streaming_admission_cap``'s
    state kernel) over the deduped survivors → final sink.

    Multi-hop is the production topology: each hop owns one stateful
    operator and its own checkpoint, and the intermediate sink makes
    the pipeline replayable/inspectable between stages (the Kappa-style
    alternative to chaining stateful operators inside one query).

    Replay contract: hop 1 drains twice (even then odd doc_ids), so
    dedup winners order by (batch, doc_id); hop 2 drains once, so
    admission order is doc_id — both stated exactly by the oracle.

    Scale shape: the classifier fuses into the source scan; both state
    kernels hold O(1) state per key (a seen-bit per hash, an int per
    source); exchanges carry (hash/source, doc_id, score) — text never
    leaves hop 1's narrow front-end."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from .textstats import classifier_frame

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    src, mid, out = (
        _scratch("scur_src_"),
        _scratch("scur_mid_"),
        _scratch("scur_out_"),
    )
    ckpt1, ckpt2 = _scratch("scur_ckpt1_"), _scratch("scur_ckpt2_")
    schema = "doc_id bigint, text string, source string"

    def _hop1() -> None:
        # single-micro-batch-per-drain pinned (see streaming_admission_cap)
        s = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1000)
            .json(src)
        )
        scored = classifier_frame(
            s.withColumn("h", F.md5("text")),
            extra=("source", "h"),
            feature_cols=False,
        )
        kept = scored.filter(F.col("verdict")).select(
            "h", "doc_id", "source", "score"
        )
        dd = kept.groupBy("h").applyInPandasWithState(
            _sdedup_keeper_kernel,
            outputStructType="doc_id bigint, source string, score double",
            stateStructType="seen boolean",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        run_stream_to_parquet(dd, mid, ckpt1)

    docs.filter(F.col("doc_id") % 2 == 0).coalesce(4).write.json(src)
    _hop1()
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(4).write.mode(
        "append"
    ).json(src)
    _hop1()

    def _admit(key, pdfs, state):
        import pandas as pd

        taken = state.get[0] if state.exists else 0
        pdf = pd.concat(list(pdfs)).sort_values("doc_id")
        room = max(0, ADMIT_CAP - taken)
        admitted = pdf.head(room)
        state.update((taken + len(admitted),))
        yield pd.DataFrame(
            {
                "source": admitted["source"],
                "doc_id": admitted["doc_id"],
                "score": admitted["score"],
                "admit_seq": range(taken + 1, taken + len(admitted) + 1),
            }
        )

    def _hop2() -> None:
        # single-micro-batch-per-drain pinned (see streaming_admission_cap)
        s = (
            spark.readStream.schema(
                "doc_id bigint, source string, score double"
            )
            .option("maxFilesPerTrigger", 1000)
            .parquet(mid)
        )
        adm = s.groupBy("source").applyInPandasWithState(
            _admit,
            outputStructType=(
                "source string, doc_id bigint, score double, "
                "admit_seq bigint"
            ),
            stateStructType="taken int",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        run_stream_to_parquet(adm, out, ckpt2)

    _hop2()
    return spark.read.parquet(out)


# Streaming near-dup screen: ingest batches vs a persisted band index ----
from .dedup import INCR_MH_ORACLE as _INCR_MH_ORACLE  # noqa: E402


@query(
    "streaming_neardup_screen",
    oracle=_INCR_MH_ORACLE,
    tags=("streaming", "dedup", "incremental", "extension"),
)
def streaming_neardup_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING twin of ``incremental_minhash_update`` — near-dup
    admission screening AT INGEST: new documents arrive as a stream and
    each micro-batch is screened against the standing corpus's
    persisted MinHash band index (src0, materialized once to parquet).
    Banding inside the stream is ``_mh_band_structs`` — one narrow
    per-row expression, NO streaming shuffle or state — and the screen
    itself runs in ``foreachBatch`` (the production pattern for
    per-trigger batch logic): explode bands, hash-join the broadcast
    index, per-doc candidate count, append to the sink.

    Stateless per document, so the result is independent of how the
    replay splits into micro-batches; two AvailableNow drains (even
    then odd doc_ids) prove the multi-batch path. Oracle: identical
    semantics to the batch screen (INCR_MH_ORACLE).

    Scale shape: per-batch cost ∝ batch size × band collisions, never
    corpus size; the index is the only corpus-derived input and at
    deploy it refreshes by snapshot swap (streaming_static_enrich's
    discipline)."""
    from .dedup import _mh_band_structs, _mh_bands_of_sig, _mh_sig

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("source") == "src0")
    batch = docs.filter(F.col("source") != "src0").select("doc_id", "text")

    from ..session import scratch_dir

    idx_path = scratch_dir("stream_mh_index")
    _mh_bands_of_sig(_mh_sig(corpus)).write.mode("overwrite").parquet(
        idx_path
    )
    index = spark.read.parquet(idx_path).withColumnRenamed(
        "doc_id", "corpus_doc"
    )

    src, out = _scratch("ndscreen_src_"), _scratch("ndscreen_out_")
    ckpt = _scratch("ndscreen_ckpt_")

    def _screen(bdf: DataFrame, _epoch: int) -> None:
        bands = bdf.select(
            "doc_id", F.explode(_mh_band_structs()).alias("b")
        ).select("doc_id", "b.band", "b.bkey")
        cand = (
            # no broadcast hint: the band index is corpus-cardinality
            # (docs × bands) — AQE picks the strategy, matching the
            # batch twin incremental_minhash_update
            bands.join(index, ["band", "bkey"])
            .groupBy("doc_id")
            .agg(
                F.countDistinct("corpus_doc")
                .cast("bigint")
                .alias("n_corpus_candidates")
            )
        )
        n = F.coalesce("n_corpus_candidates", F.lit(0)).cast("bigint")
        res = (
            bdf.select("doc_id")
            .join(cand, "doc_id", "left")
            .select(
                "doc_id",
                n.alias("n_corpus_candidates"),
                (n > 0).alias("is_near_dup_of_corpus"),
            )
        )
        res.write.mode("append").parquet(out)

    def _run() -> None:
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1000)
            .json(src)
        )
        (
            stream.writeStream.foreachBatch(_screen)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    batch.filter(F.col("doc_id") % 2 == 0).coalesce(4).write.json(src)
    _run()
    batch.filter(F.col("doc_id") % 2 == 1).coalesce(4).write.mode(
        "append"
    ).json(src)
    _run()
    return spark.read.parquet(out)


# Streaming EWMA: windowed bars → stateful bounded-recurrence kernel -----
def _ewma_kernel(key, pdfs, state):
    """Per event_type: maintain the last ``EWMA_DEPTH - 1`` closed bars
    and emit the renormalized {EWMA_DEPTH}-deep EWMA for each arriving
    bar. Bars within a micro-batch are sorted by minute (zero-padded
    'yyyy-MM-dd HH:mm' sorts chronologically); across micro-batches the
    replay is run-bounded, and a window that flushed in run N is
    strictly earlier than every window run N+1 flushes — so the state
    deque always grows in time order. Arithmetic parity with the batch
    twin: identical exact-binary weights, products and additions in the
    same j = 0..depth-1 order as the batch lag chain (IEEE doubles both
    sides), and the decimal-repr HALF_UP 4-dp rounding Spark's
    double→decimal cast performs."""
    import pandas as pd
    from decimal import ROUND_HALF_UP, Decimal

    from ..operators.temporal import EWMA_DEPTH, _ewma_weights

    ws = _ewma_weights()
    if state.exists:
        minutes, bars = state.get
        hist = list(zip(minutes, bars))  # newest first
    else:
        hist = []
    pdf = pd.concat(list(pdfs)).sort_values("minute")
    out = []
    for row in pdf.itertuples(index=False):
        seq = [float(row.bar)] + [b for _, b in hist]
        num = 0.0
        den = 0.0
        n = 0
        for j in range(EWMA_DEPTH):
            if j < len(seq):
                num = num + seq[j] * ws[j]
                den = den + ws[j]
                n += 1
            else:
                num = num + 0.0
                den = den + 0.0
        x = num / den
        ewma = float(
            Decimal(repr(x)).quantize(Decimal("0.0001"), ROUND_HALF_UP)
        )
        out.append((key[0], row.minute, float(row.bar), n, ewma))
        hist = [(row.minute, float(row.bar))] + hist
        hist = hist[: EWMA_DEPTH - 1]
    state.update(([m for m, _ in hist], [b for _, b in hist]))
    yield pd.DataFrame(
        out, columns=["event_type", "minute", "bar", "n_bars_used", "ewma"]
    )


def _streaming_ewma_oracle() -> str:
    from .temporal import _ewma_oracle

    return _ewma_oracle()


@query(
    "streaming_ewma",
    oracle=_streaming_ewma_oracle(),
    tags=("streaming", "timeseries", "extension"),
)
def streaming_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ewma_smoothing``'s STREAMING twin — and the streaming family's
    first RECURRENCE kernel: a two-hop pipeline where hop 1 closes
    per-minute value bars under a watermark (five-scalar windowed
    state, ``streaming_minute_bars``' shape) and hop 2 carries the
    EWMA recurrence itself as keyed state (``applyInPandasWithState``
    per event_type, state = the last {EWMA_DEPTH}-1 closed bars) — the
    live-dashboard form of the batch lag-chain.

    Ordering contract (what makes the recurrence correct under
    replay): append-mode window emission is monotone — a window
    flushed by run N is strictly earlier than any window run N+1
    flushes — and hop 2 drains once per hop-1 run with
    maxFilesPerTrigger pinned above the per-run file count, so each
    micro-batch holds whole runs and the in-batch minute sort restores
    total order. Same oracle as the batch twin: the two engines AND
    the two execution modes must agree bar for bar.

    Scale: hop-1 state is five scalars per open (type, minute); hop-2
    state is {EWMA_DEPTH}-1 doubles per TYPE — O(1) per key, the
    smallest recurrence state possible; only exchange is the keyed
    routing."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    ev = load_table(spark, sf_dir, "events").select(
        "ts", "event_type", "value"
    )
    src = _scratch("sewma_src_")
    bars_out, ckpt1 = _scratch("sewma_bars_"), _scratch("sewma_ckpt1_")
    out, ckpt2 = _scratch("sewma_out_"), _scratch("sewma_ckpt2_")
    schema = "ts timestamp, event_type string, value double"
    ev.coalesce(4).write.json(src)
    # Single-row scalar collect: the replay's high-water mark for the
    # watermark-flushing sentinels. Production form: track the ingest
    # high-water mark in pipeline metadata, never re-scan the source.
    max_ts = ev.agg(F.max("ts")).collect()[0][0]

    def _run_hop1() -> None:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1000)
            .json(src)
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 minute"), "event_type")
            .agg(
                F.sum(F.col("value").cast("decimal(18,2)"))
                .cast("double")
                .alias("bar")
            )
            .select(
                F.date_format("window.start", "yyyy-MM-dd HH:mm").alias(
                    "minute"
                ),
                "event_type",
                "bar",
            )
        )
        run_stream_to_parquet(stream, bars_out, ckpt1)

    def _run_hop2() -> None:
        bstream = (
            spark.readStream.schema(
                "minute string, event_type string, bar double"
            )
            .option("maxFilesPerTrigger", 1000)
            .parquet(bars_out)
            .groupBy("event_type")
            .applyInPandasWithState(
                _ewma_kernel,
                outputStructType=(
                    "event_type string, minute string, bar double, "
                    "n_bars_used bigint, ewma double"
                ),
                stateStructType="minutes array<string>, bars array<double>",
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )
        run_stream_to_parquet(bstream, out, ckpt2)

    _run_hop1()
    _run_hop2()
    for days in (10, 20):
        sentinel = spark.createDataFrame(
            [(max_ts, "__sentinel__", 0.0)], schema
        ).withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {days} DAYS"))
        sentinel.write.mode("append").json(src)
        _run_hop1()
        _run_hop2()
    return (
        spark.read.parquet(out)
        .filter(F.col("event_type") != "__sentinel__")
        .select("event_type", "minute", "bar", "n_bars_used", "ewma")
    )


# Streaming lag features: row-emitting keyed history kernel ---------------
def _lag_kernel(key, pdfs, state):
    """Per user_id: carry the last 3 (us, value) observations and emit
    ONE OUTPUT ROW PER INPUT ROW with lag1-3 / delta1 / gap_us — the
    first row-emitting (flatMap-shaped) stateful kernel in the family
    (the others emit per-key aggregates). Rows within the micro-batch
    are sorted by (us, event_id), matching the batch twin's window
    order; history edges emit None (object-dtype columns so Arrow
    writes NULL, not NaN — a float64 ndarray would silently turn the
    mask into NaN and split the engines)."""
    import pandas as pd

    if state.exists:
        uss, vals = state.get
        hist = list(zip(uss, vals))  # newest first
    else:
        hist = []
    pdf = pd.concat(list(pdfs)).sort_values(["us", "event_id"])
    out = []
    for row in pdf.itertuples(index=False):
        lag = [v for _, v in hist[:3]]
        l1 = lag[0] if len(lag) >= 1 else None
        l2 = lag[1] if len(lag) >= 2 else None
        l3 = lag[2] if len(lag) >= 3 else None
        out.append(
            (
                int(row.event_id),
                int(key[0]),
                float(row.value),
                l1,
                l2,
                l3,
                (float(row.value) - l1) if l1 is not None else None,
                (int(row.us) - hist[0][0]) if hist else None,
            )
        )
        hist = [(int(row.us), float(row.value))] + hist
        hist = hist[:3]
    state.update(([u for u, _ in hist], [v for _, v in hist]))
    df = pd.DataFrame(
        out,
        columns=[
            "event_id",
            "user_id",
            "value",
            "lag1",
            "lag2",
            "lag3",
            "delta1",
            "gap_us",
        ],
        dtype=object,
    )
    yield df


def _streaming_lag_oracle() -> str:
    from ..registry import all_queries

    return all_queries()["lag_feature_matrix"].oracle


@query(
    "streaming_lag_features",
    oracle=_streaming_lag_oracle(),
    tags=("streaming", "sequence", "extension"),
)
def streaming_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``lag_feature_matrix``'s STREAMING twin — feature engineering AT
    INGEST: each arriving event immediately gets its last-3-values /
    first-difference / inter-arrival features from O(1) keyed state
    (3 (us, value) pairs per user), the online form a real-time model
    consumes instead of re-running the batch window. Same oracle as
    the batch twin, plus an engine-to-engine equality test.

    Ordering contract: the replay is pinned to a SINGLE micro-batch
    (maxFilesPerTrigger above the source file count — the round-4
    single-batch-replay convention), and the kernel sorts its rows by
    (us, event_id), the batch window's exact order; at deploy, the
    same kernel is correct for any arrival batching whose batches
    respect event-time order per key (late rows would need the
    watermark + reorder-buffer hop of streaming_ewma's topology).

    Scale: state is three pairs per user — O(1) per key; the only
    exchange is the keyed routing; output is one row per event (the
    feature store append)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..functions.epoch import epoch_us

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        epoch_us("ts").alias("us"),
        "value",
    )
    src = _scratch("slag_src_")
    out, ckpt = _scratch("slag_out_"), _scratch("slag_ckpt_")
    ev.coalesce(4).write.json(src)

    stream = (
        spark.readStream.schema(
            "event_id bigint, user_id bigint, us bigint, value double"
        )
        .option("maxFilesPerTrigger", 1000)
        .json(src)
        .groupBy("user_id")
        .applyInPandasWithState(
            _lag_kernel,
            outputStructType=(
                "event_id bigint, user_id bigint, value double, "
                "lag1 double, lag2 double, lag3 double, "
                "delta1 double, gap_us bigint"
            ),
            stateStructType="uss array<long>, vals array<double>",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    run_stream_to_parquet(stream, out, ckpt)
    return spark.read.parquet(out).select(
        "event_id",
        "user_id",
        "value",
        "lag1",
        "lag2",
        "lag3",
        "delta1",
        "gap_us",
    )


# X213 — streaming arrival-order inversion monitor ---------------------------
def _inversion_kernel(key, pdfs, state):
    """Per user_id: carry (last_us, n_events, n_inversions,
    max_backstep) and emit the user's running monitor row once per
    micro-batch. Rows within the batch are sorted by event_id — the
    ARRIVAL sequence, the whole point of the monitor (sorting by us
    would define the inversions away). The rate is rounded through the
    decimal-repr HALF_UP two-step (10 dp then 6 dp) that matches
    Spark's F.round(cast DECIMAL(28,10), 6) and the DuckDB oracle."""
    import pandas as pd
    from decimal import ROUND_HALF_UP, Decimal

    if state.exists:
        last_us, n_ev, n_inv, max_back = state.get
    else:
        last_us, n_ev, n_inv, max_back = None, 0, 0, 0
    pdf = pd.concat(list(pdfs)).sort_values("event_id")
    for us in pdf["us"]:
        us = int(us)
        if last_us is not None and us < last_us:
            n_inv += 1
            back = last_us - us
            if back > max_back:
                max_back = back
        n_ev += 1
        last_us = us
    state.update((last_us, n_ev, n_inv, max_back))
    rate = float(
        Decimal(repr(n_inv / max(n_ev - 1, 1)))
        .quantize(Decimal("0.0000000001"), ROUND_HALF_UP)
        .quantize(Decimal("0.000001"), ROUND_HALF_UP)
    )
    yield pd.DataFrame(
        [(int(key[0]), n_ev, n_inv, rate, max_back)],
        columns=[
            "user_id",
            "n_events",
            "n_inversions",
            "inversion_rate",
            "max_backstep_us",
        ],
    )


@query(
    "streaming_inversion_monitor",
    oracle=_events.INVERSION_ORACLE,
    tags=("streaming", "audit", "extension"),
)
def streaming_inversion_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``event_order_inversion_report``'s STREAMING twin — the
    out-of-orderness MONITOR running at ingest: per user, O(1) keyed
    state (last arrival-order timestamp + three counters) updated per
    micro-batch, emitting the live inversion rate and worst backstep
    that size the downstream watermarks. A producer whose clock starts
    drifting shows up HERE, batches before the batch audit would run.

    Ordering contract: single-micro-batch replay (maxFilesPerTrigger
    above the source file count, the round-4 convention) with the
    kernel sorting by event_id — the ARRIVAL sequence; at deploy the
    kernel is correct for any batching that preserves per-key arrival
    order (Kafka's per-partition guarantee).

    Scale: state is four scalars per user; the only exchange is the
    keyed routing; output is one row per (user, micro-batch) — the
    monitoring table's upsert stream. Same oracle as the batch twin:
    both engines AND both execution modes must agree row for row."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..functions.epoch import epoch_us

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", epoch_us("ts").alias("us")
    )
    src = _scratch("sinv_src_")
    out, ckpt = _scratch("sinv_out_"), _scratch("sinv_ckpt_")
    ev.coalesce(4).write.json(src)

    stream = (
        spark.readStream.schema("event_id bigint, user_id bigint, us bigint")
        .option("maxFilesPerTrigger", 1000)
        .json(src)
        .groupBy("user_id")
        .applyInPandasWithState(
            _inversion_kernel,
            outputStructType=(
                "user_id bigint, n_events bigint, n_inversions bigint, "
                "inversion_rate double, max_backstep_us bigint"
            ),
            stateStructType=(
                "last_us long, n_ev long, n_inv long, max_back long"
            ),
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    run_stream_to_parquet(stream, out, ckpt)
    return spark.read.parquet(out)


# X238 — streaming CUSUM level-shift monitor -------------------------------------
def _cusum_kernel_factory(mu: float, sigma: float, slack: float, alarm: float):
    def _kernel(key, pdfs, state):
        """Single-chart CUSUM: state is (P, minP) as 1e-6-scaled
        integers — the running sum and running min of 6-dp decimal
        deviations are EXACT integer arithmetic, the same
        zero-accumulation-freedom prefix the batch twin gets from
        decimal windows. Bars sort by day inside each micro-batch;
        cross-batch order is the hop-1 monotone-emission contract."""
        import pandas as pd
        from decimal import ROUND_HALF_UP, Decimal

        if state.exists:
            p_i, minp_i = state.get
        else:
            p_i, minp_i = 0, 0
        thresh = mu + slack * sigma
        out = []
        pdf = pd.concat(list(pdfs)).sort_values("day")
        for row in pdf.itertuples(index=False):
            x = row.cents / 100.0
            dv = int(
                Decimal(repr(x - thresh))
                .quantize(Decimal("0.000001"), ROUND_HALF_UP)
                .scaleb(6)
            )
            p_i += dv
            if p_i < minp_i:
                minp_i = p_i
            s_i = p_i - min(minp_i, 0)
            s = s_i / 1e6
            out.append((row.day, x, s, s > alarm * sigma))
        state.update((p_i, minp_i))
        yield pd.DataFrame(
            out, columns=["day", "revenue", "s_stat", "is_alarm"]
        )

    return _kernel


@query(
    "streaming_cusum_monitor",
    oracle=_events.CUSUM_ORACLE,
    tags=("streaming", "statistics", "extension"),
)
def streaming_cusum_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``changepoint_cusum_report``'s STREAMING twin — the
    control-chart monitor at ingest: hop 1 closes per-day revenue
    bars under a watermark (cents as exact integer sums; the
    streaming_ewma two-hop topology with far-future sentinel rounds
    flushing the final windows), hop 2 carries TWO scaled integers of
    state TOTAL (running prefix P and its min, 1e-6-scaled, one
    chart) and emits each day's S statistic + alarm as the bar
    closes. μ/σ are calibration constants from one pre-stream
    aggregate — the replay sentinel convention; production ships them
    in chart config from a calibration window.

    Same oracle as the batch twin: both engines AND both execution
    modes must agree day for day, alarm for alarm.

    Scale: hop-1 state is one long per open day window; hop-2 state
    is O(1) for the chart; exchanges are the day-window agg and a
    single-key route."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("timestamp").alias("ts"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    # Calibration constants — EXACTLY the batch twin's expressions
    # (decimal-exact sums -> one shared IEEE expression), one 1-row
    # aggregate before the stream starts (replay sentinel convention;
    # production: chart config from a calibration window).
    daily = orders.groupBy(F.to_date("ts").alias("d")).agg(
        (F.sum("cents").cast("decimal(38,2)") / 100)
        .cast("decimal(38,2)")
        .alias("x")
    )
    mu_c = F.sum("x").cast("double") / F.count(F.lit(1))
    strow = daily.agg(
        mu_c.alias("mu"),
        F.sqrt(
            F.greatest(
                F.sum(
                    F.round(
                        (
                            F.col("x").cast("double")
                            * F.col("x").cast("double")
                        ).cast("decimal(28,6)"),
                        6,
                    ).cast("decimal(28,6)")
                )
                .cast("decimal(38,6)")
                .cast("double")
                / F.count(F.lit(1))
                - mu_c * mu_c,
                F.lit(0.0),
            )
        ).alias("sigma"),
    ).collect()[0]
    mu, sigma = float(strow["mu"]), float(strow["sigma"])
    # Single-row scalar collect: the replay's high-water mark for the
    # watermark-flushing sentinels. Production form: track the ingest
    # high-water mark in pipeline metadata, never re-scan the source.
    max_ts = orders.agg(F.max("ts")).collect()[0][0]

    src = _scratch("scusum_src_")
    bars_out, ckpt1 = _scratch("scusum_bars_"), _scratch("scusum_ckpt1_")
    out, ckpt2 = _scratch("scusum_out_"), _scratch("scusum_ckpt2_")
    schema = "ts timestamp, cents long, tag string"
    orders.withColumn("tag", F.lit("real")).coalesce(4).write.json(src)

    def _run_hop1() -> None:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1000)
            .json(src)
            .withWatermark("ts", "1 day")
            .groupBy(F.window("ts", "1 day"), "tag")
            .agg(F.sum("cents").cast("long").alias("cents"))
            .select(
                F.date_format("window.start", "yyyy-MM-dd").alias("day"),
                "tag",
                "cents",
            )
        )
        run_stream_to_parquet(stream, bars_out, ckpt1)

    def _run_hop2() -> None:
        bstream = (
            spark.readStream.schema("day string, tag string, cents long")
            .option("maxFilesPerTrigger", 1000)
            .parquet(bars_out)
            .filter(F.col("tag") == "real")
            .withColumn("chart", F.lit(1))
            .groupBy("chart")
            .applyInPandasWithState(
                _cusum_kernel_factory(
                    mu,
                    sigma,
                    _events.CUSUM_SLACK_SIGMA,
                    _events.CUSUM_ALARM_SIGMA,
                ),
                outputStructType=(
                    "day string, revenue double, s_stat double, "
                    "is_alarm boolean"
                ),
                stateStructType="p long, minp long",
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )
        run_stream_to_parquet(bstream, out, ckpt2)

    _run_hop1()
    _run_hop2()
    for days in (10, 20):
        sentinel = spark.createDataFrame(
            [(max_ts, 0, "__sentinel__")], schema
        ).withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {days} DAYS"))
        sentinel.write.mode("append").json(src)
        _run_hop1()
        _run_hop2()
    return spark.read.parquet(out).select(
        "day", "revenue", "s_stat", "is_alarm"
    )


# X267 — streaming interval-union with islands-in-state ----------------------
def _interval_union_kernel(key, pdfs, state):
    """applyInPandasWithState kernel: per user, hold the MERGED island
    set (starts/ends/counts arrays) as state; every batch re-sweeps
    state islands + new intervals (islands are disjoint and few, so
    the re-sweep is island-count-bounded, not history-bounded); a
    flush row emits the final islands and clears the state. Merging
    is order-insensitive, so at-least-once/out-of-order delivery
    across micro-batches cannot change the result."""
    import pandas as pd

    uid = key[0]
    pdf = pd.concat(list(pdfs))
    starts, ends, counts = (
        (list(state.get[0]), list(state.get[1]), list(state.get[2]))
        if state.exists
        else ([], [], [])
    )
    ivs = [
        (int(s), int(e), 1)
        for s, e in zip(
            pdf.loc[~pdf["flush"], "s"], pdf.loc[~pdf["flush"], "e"]
        )
    ]
    ivs += list(zip(starts, ends, counts))
    ivs.sort(key=lambda x: (x[0], x[1]))
    merged: list[list[int]] = []
    for s, e, c in ivs:
        if merged and s <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], e)
            merged[-1][2] += c
        else:
            merged.append([s, e, c])
    if pdf["flush"].any():
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [uid] * len(merged),
                "island_start_us": [m[0] for m in merged],
                "island_end_us": [m[1] for m in merged],
                "n_events": [m[2] for m in merged],
            }
        )
    else:
        state.update(
            (
                [int(m[0]) for m in merged],
                [int(m[1]) for m in merged],
                [int(m[2]) for m in merged],
            )
        )
        yield pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "island_start_us": pd.Series([], dtype="int64"),
                "island_end_us": pd.Series([], dtype="int64"),
                "n_events": pd.Series([], dtype="int64"),
            }
        )


@query(
    "streaming_interval_union",
    oracle=f"""
    WITH iv AS (
      SELECT user_id, event_id, epoch_us(ts) AS s,
             epoch_us(ts) + {_events.IUC_BASE_US}
               + CAST(floor(GREATEST(value, 0.0) * 1000000.0) AS BIGINT)
               AS e
      FROM events
    ),
    sweep AS (
      SELECT user_id, s, e,
             MAX(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS prev_e
      FROM iv
    ),
    isl AS (
      SELECT user_id, s, e,
             SUM(CASE WHEN prev_e IS NULL OR s > prev_e THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY s, e,
                     CASE WHEN prev_e IS NULL OR s > prev_e
                          THEN 0 ELSE 1 END
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
      FROM sweep
    )
    SELECT user_id,
           CAST(MIN(s) AS BIGINT) AS island_start_us,
           CAST(MAX(e) AS BIGINT) AS island_end_us,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM isl GROUP BY user_id, island
    """,
    tags=("streaming", "sequence", "extension"),
)
def streaming_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X267: the STREAMING twin of `interval_union_coverage` (X257),
    emitting the merged islands themselves — per-user interval-union
    state maintained ACROSS micro-batches with a custom
    ``applyInPandasWithState`` kernel: state = the user's current
    disjoint island set (three bigint arrays), each batch re-sweeps
    state + arrivals (order-insensitive merge — at-least-once and
    out-of-order delivery across batches cannot change the result),
    and a flush round emits the final islands.

    Replay contract: two data drains (even event_ids, then odd — so
    islands genuinely MERGE across the batch boundary) + one flush
    drain carrying one row per user (batch-derived; a live pipeline
    flushes by watermark timeout instead — same kernel, different
    trigger). The oracle is X257's batch sweep at per-island grain.

    Scale shape: the only wide op is the groupBy(user_id) routing
    exchange carrying (user_id, s, e) bigints; state is
    O(open islands) per user — bounded by the user's GAP structure,
    not history (merged islands collapse); the flush frame is
    user-count-sized. The kernel is Arrow-batched, never row-at-a-time
    Python."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        _events.epoch_us("ts").alias("s"),
        (
            _events.epoch_us("ts")
            + F.lit(_events.IUC_BASE_US)
            + F.floor(
                F.greatest(F.col("value"), F.lit(0.0)) * 1000000.0
            ).cast("bigint")
        ).alias("e"),
    )
    src, out = _scratch("siu_src_"), _scratch("siu_out_")
    ckpt = _scratch("siu_ckpt_")
    schema = "user_id bigint, event_id bigint, s bigint, e bigint, flush boolean"

    def _run() -> None:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1000)
            .json(src)
            .groupBy("user_id")
            .applyInPandasWithState(
                _interval_union_kernel,
                outputStructType=(
                    "user_id bigint, island_start_us bigint, "
                    "island_end_us bigint, n_events bigint"
                ),
                stateStructType=(
                    "starts array<bigint>, ends array<bigint>, "
                    "counts array<bigint>"
                ),
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )
        run_stream_to_parquet(stream, out, ckpt)

    base = ev.withColumn("flush", F.lit(False))
    base.filter(F.col("event_id") % 2 == 0).coalesce(4).write.json(src)
    _run()
    base.filter(F.col("event_id") % 2 == 1).coalesce(4).write.mode(
        "append"
    ).json(src)
    _run()
    flush = ev.select("user_id").distinct().select(
        "user_id",
        F.lit(-1).cast("bigint").alias("event_id"),
        F.lit(0).cast("bigint").alias("s"),
        F.lit(0).cast("bigint").alias("e"),
        F.lit(True).alias("flush"),
    )
    flush.coalesce(2).write.mode("append").json(src)
    _run()
    return spark.read.parquet(out)
