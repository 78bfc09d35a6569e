"""transformWithStateInPandas (state-v2) feature gate.

The operator's JVM↔Python state server needs ``google.protobuf``,
absent in this container — so the live test skips here and runs where
the dependency exists. The wiring itself (processor construction,
plan building) is exercised unconditionally below.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from deloton_solo_spark.streaming.transform_with_state import (
    make_counter_processor,
    rocksdb_session_confs,
    running_user_counts,
)


def test_processor_constructs_and_plan_builds(spark):
    # no protobuf needed until the query STARTS — building the
    # streaming plan validates schemas, grouping, and UDF wiring
    proc = make_counter_processor()
    assert hasattr(proc, "handleInputRows")
    src = tempfile.mkdtemp(prefix="tws_plan_")
    try:
        spark.createDataFrame(
            [(1, 1)], "user_id long, event_id long"
        ).write.mode("overwrite").json(src)
        stream = spark.readStream.schema("user_id long, event_id long").json(
            src
        )
        out = running_user_counts(stream)
        assert out.isStreaming
        assert [f.name for f in out.schema.fields] == ["user_id", "n_events"]
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_running_counts_live():
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState state server needs protobuf",
    )
    from deloton_solo_spark.session import get_spark

    spark = get_spark(
        "tws-live", master="local[4]", shuffle_partitions=4
    )
    for k, v in rocksdb_session_confs().items():
        spark.conf.set(k, v)
    src = tempfile.mkdtemp(prefix="tws_src_")
    out = tempfile.mkdtemp(prefix="tws_out_")
    ckpt = tempfile.mkdtemp(prefix="tws_ckpt_")
    for p in (src, out, ckpt):
        shutil.rmtree(p, ignore_errors=True)

    def run() -> None:
        stream = spark.readStream.schema("user_id long, event_id long").json(
            src
        )
        (
            running_user_counts(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    spark.createDataFrame(
        [(1, 10), (1, 11), (2, 12)], "user_id long, event_id long"
    ).write.json(src)
    run()
    spark.createDataFrame(
        [(1, 20), (3, 21)], "user_id long, event_id long"
    ).write.mode("append").json(src)
    run()
    got = sorted(
        (r.user_id, r.n_events)
        for r in spark.read.parquet(out).collect()
    )
    # batch 1 snapshots: u1=2, u2=1; batch 2 snapshots: u1=3, u3=1
    assert got == [(1, 2), (1, 3), (2, 1), (3, 1)]
