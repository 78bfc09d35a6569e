"""Delta-native MERGE/DELETE feature gate (VERDICT r8 task 8).

The container ships no table format (checked 2026-08-16, round 9:
``import delta`` fails; installs disallowed), so the NATIVE
``MERGE WHEN NOT MATCHED`` / ``DELETE WHERE`` paths skip here and run
where delta-spark exists — the state-v2/Kafka gate convention
(BASELINE.md gate rows). The default S5/S9 implementations (parquet
dedup-append, anti-join delete) are oracle-gated unconditionally via
``jdbc_upsert_sink`` / ``sql_delete_by_key``; THIS file proves the
native paths land on the identical end state when the format is
present.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from deloton_solo_spark.operators.sinks import delta_available


def test_probe_reports_absence_cleanly():
    # the probe itself must never raise — it is the gate
    assert delta_available() in (True, False)


@pytest.mark.skipif(
    not delta_available(),
    reason="delta-spark absent in this container "
    "(probe-gated native MERGE/DELETE; re-checked 2026-08-16 r9)",
)
def test_delta_merge_and_delete_match_pattern_sinks(spark):
    from pyspark.sql import functions as F

    from deloton_solo_spark.operators.sinks import (
        delete_by_keys,
        delta_delete_where,
        delta_merge_upsert,
        idempotent_append,
    )

    batch = spark.createDataFrame(
        [(i, i % 7, float(i) * 1.5) for i in range(1, 101)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    tmp = tempfile.mkdtemp(prefix="delta_gate_")
    dpath, ppath = f"{tmp}/delta", f"{tmp}/parquet"
    try:
        # seed both sinks, then deliver the SAME batch again (the
        # duplicate-delivery contract) through each upsert path
        batch.write.format("delta").save(dpath)
        delta_merge_upsert(spark, dpath, batch, ["o_orderkey"])
        idempotent_append(batch, ppath, ["o_orderkey"])
        idempotent_append(batch, ppath, ["o_orderkey"])
        native = spark.read.format("delta").load(dpath)
        pattern = spark.read.parquet(ppath)
        assert sorted(native.collect()) == sorted(pattern.collect())

        # native DELETE WHERE vs the anti-join rewrite
        delta_delete_where(spark, dpath, "o_custkey = 3")
        keys = batch.filter(F.col("o_custkey") == 3).select("o_orderkey")
        survived = delete_by_keys(pattern, keys, ["o_orderkey"])
        assert sorted(
            spark.read.format("delta").load(dpath).collect()
        ) == sorted(survived.collect())
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
