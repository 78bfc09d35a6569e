"""Streaming robustness: corrupt records degrade to NULL (never kill
the stream), and checkpoint resume processes exactly the delta.

These are the operational properties §2.6 claims: at-least-once
delivery + idempotent sink = exact-once output, and one malformed
message must not take down a 100 TB ingest.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from deloton_solo_spark.streaming.pipeline import (
    file_wire_stream,
    ingest_available_now,
    parse_wire_stream,
)


def _scratch(prefix: str) -> str:
    p = tempfile.mkdtemp(prefix=prefix)
    shutil.rmtree(p, ignore_errors=True)
    return p


def _write_wire(spark, rows, src, mode="append"):
    spark.createDataFrame(
        rows,
        "topic string, partition int, offset long, key string, "
        "value string, ts timestamp",
    ).write.mode(mode).json(src)


def test_corrupt_envelope_degrades_to_null_not_crash(spark):
    src, out = _scratch("rob_src_"), _scratch("rob_out_")
    good = '{"log": "2024-01-01 10:00:00.000000 [INFO]: Getting user data from server"}'
    rows = [
        ("deloton", 0, 0, "1", good, None),
        ("deloton", 0, 1, "1", "NOT JSON AT ALL {{{", None),
        ("deloton", 0, 2, "1", '{"wrong_field": 1}', None),
    ]
    _write_wire(spark, rows, src)
    parsed = parse_wire_stream(file_wire_stream(spark, src)).select(
        "offset",
        "user_id",
        F.date_format("line_ts", "yyyy-MM-dd HH:mm:ss").alias("line_ts"),
        "line_type",
    )
    ingest_available_now(parsed, out, _scratch("rob_ckpt_"), keys=["offset"])
    got = {
        r.offset: r.asDict() for r in spark.read.parquet(out).collect()
    }
    assert set(got) == {0, 1, 2}  # nothing dropped, nothing crashed
    assert got[0]["line_type"] == "user_fetch"
    assert got[0]["line_ts"] == "2024-01-01 10:00:00"
    assert got[1]["line_ts"] is None and got[1]["line_type"] == "other"
    assert got[2]["line_ts"] is None and got[2]["line_type"] == "other"


def test_checkpoint_resume_processes_only_the_delta(spark):
    src, out = _scratch("delta_src_"), _scratch("delta_out_")
    ckpt = _scratch("delta_ckpt_")

    def run():
        parsed = parse_wire_stream(file_wire_stream(spark, src)).select(
            "offset", "line_type"
        )
        ingest_available_now(parsed, out, ckpt, keys=["offset"])

    batch1 = [
        ("deloton", 0, i, "1", '{"log": "x Ride - duration = 1; resistance = 2"}', None)
        for i in range(5)
    ]
    _write_wire(spark, batch1, src)
    run()
    assert spark.read.parquet(out).count() == 5

    # same checkpoint, new files appear → only the delta is read
    batch2 = [
        ("deloton", 0, 100 + i, "1", '{"log": "x Telemetry - hrt = 1; rpm = 2; power = 3"}', None)
        for i in range(3)
    ]
    _write_wire(spark, batch2, src)
    run()
    df = spark.read.parquet(out)
    assert df.count() == 8  # 5 + 3, no reprocessing duplicates
    assert df.filter(F.col("line_type") == "telemetry").count() == 3

    # rerun with NO new data: a no-op
    run()
    assert spark.read.parquet(out).count() == 8
