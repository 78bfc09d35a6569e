"""Provenance-aware bench-artifact drift gate (VERDICT r10 task 1).

Three rounds in a row the round driver's end-of-round snapshot re-ran
bench.py and overwrote BENCH_detail_r{N}.json AFTER the builder sealed
BASELINE.md against it, leaving the tree's prose gate red (r7 phantom
regression, r9 interim drift, r10 snapshot clobber). The fix: bench.py
writes builder-sealed runs (explicit $SPARK_GRAFT_ROUND, clean
contamination record) to BENCH_detail_r{NN}_sealed.json too, and
tools/counts.py enforces prose-match only against the newest sealed
artifact — driver snapshots are ignored. These tests simulate the
overwrite against a fixture tree so the gate's behavior is pinned
without Spark.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from tools.counts import _authoritative_bench_detail, check  # noqa: E402

COUNTS = {"registered": 3, "oracle_exact": 2, "bench_headline": 2}


def _docs(root, total="100.0 s", anchor="20.0 s"):
    (root / "SURVEY.md").write_text(
        "3 registered queries across the surface, 2 with exact oracles\n"
    )
    (root / "README.md").write_text(
        "3 registered queries, 2 with exact DuckDB oracles\n"
    )
    (root / "BASELINE.md").write_text(
        f"| r11 | **2 queries** total {total}, anchor {anchor} |\n"
    )


def _detail(root, name, total, anchor, *, round_env, sealed=None):
    prov = {"round_env": round_env}
    if sealed is not None:
        prov["sealed"] = sealed
    (root / name).write_text(
        json.dumps(
            {
                "value": total,
                "value_r1_29q_subset": anchor,
                "provenance": prov,
            }
        )
    )


def test_sealed_artifact_survives_driver_overwrite(tmp_path):
    """The r10 failure mode: prose quotes the builder's sealed run;
    the driver's snapshot overwrites the plain artifact with different
    numbers. The gate must stay green by reading the sealed twin."""
    _docs(tmp_path, total="100.0 s", anchor="20.0 s")
    _detail(
        tmp_path,
        "BENCH_detail_r11_sealed.json",
        100.0,
        20.0,
        round_env="11",
        sealed=True,
    )
    # driver snapshot clobbers the PLAIN name with other numbers
    _detail(
        tmp_path,
        "BENCH_detail_r11.json",
        187.0,
        25.1,
        round_env="inferred:11",
    )
    assert check(COUNTS, root=tmp_path) == []


def test_drift_against_sealed_numbers_still_caught(tmp_path):
    """The gate still has teeth: prose that does NOT quote the sealed
    run's numbers fails even with a driver snapshot present."""
    _docs(tmp_path, total="999.0 s", anchor="99.0 s")
    _detail(
        tmp_path,
        "BENCH_detail_r11_sealed.json",
        100.0,
        20.0,
        round_env="11",
        sealed=True,
    )
    errors = check(COUNTS, root=tmp_path)
    assert any("100.0 s" in e for e in errors)
    assert any("20.0 s" in e for e in errors)


def test_driver_only_tree_skips_bench_gate(tmp_path):
    """A tree holding only driver snapshots (no sealed run yet this
    round) must not enforce prose against numbers the builder never
    sealed — the exact red-at-tree state the judge adjudicated in r10."""
    _docs(tmp_path, total="100.0 s", anchor="20.0 s")
    _detail(
        tmp_path,
        "BENCH_detail_r11.json",
        187.0,
        25.1,
        round_env="inferred:11",
    )
    assert _authoritative_bench_detail(tmp_path) is None
    assert check(COUNTS, root=tmp_path) == []


def test_explicit_round_env_counts_as_sealed_pre_r11(tmp_path):
    """Pre-r11 builder runs have no sealed twin but DO carry an
    explicit round_env — they remain authoritative."""
    _detail(
        tmp_path, "BENCH_detail_r10.json", 182.3, 28.6, round_env="10"
    )
    _detail(
        tmp_path,
        "BENCH_detail_r09.json",
        183.3,
        27.4,
        round_env="inferred:9",
    )
    p = _authoritative_bench_detail(tmp_path)
    assert p is not None and p.name == "BENCH_detail_r10.json"


def test_rounds_sort_numerically_not_lexicographically(tmp_path):
    """ADVICE r10: sorted() picked r99 over r100. Rounds compare as
    parsed ints."""
    _detail(
        tmp_path,
        "BENCH_detail_r99_sealed.json",
        1.0,
        1.0,
        round_env="99",
        sealed=True,
    )
    _detail(
        tmp_path,
        "BENCH_detail_r100_sealed.json",
        2.0,
        2.0,
        round_env="100",
        sealed=True,
    )
    p = _authoritative_bench_detail(tmp_path)
    assert p is not None and p.name == "BENCH_detail_r100_sealed.json"


def test_sealed_twin_beats_plain_same_round(tmp_path):
    _detail(
        tmp_path, "BENCH_detail_r11.json", 9.0, 9.0, round_env="11"
    )
    _detail(
        tmp_path,
        "BENCH_detail_r11_sealed.json",
        1.0,
        1.0,
        round_env="11",
        sealed=True,
    )
    p = _authoritative_bench_detail(tmp_path)
    assert p is not None and p.name == "BENCH_detail_r11_sealed.json"


def test_live_tree_gate_green():
    """The real repo tree must satisfy the gate (this is the assertion
    that was red at the r10 tree)."""
    from tools.counts import ROOT

    assert _authoritative_bench_detail(ROOT) is not None


def test_competitor_marker_basenames():
    """ADVICE r10: contamination markers must not substring-match the
    joined cmdline (vim foo.java, paths containing 'pyspark')."""
    from bench import _competitor_marker

    # true competitors
    assert _competitor_marker(["java", "-cp", "spark/*", "X"]) == "java"
    assert _competitor_marker(["/usr/lib/jvm/bin/java", "-Xmx8g"]) == "java"
    assert (
        _competitor_marker(["python", "tools/driver_sim.py", "--x"])
        == "driver_sim"
    )
    assert _competitor_marker(["python3", "-m", "pytest", "-q"]) == "pytest"
    assert _competitor_marker(["pytest", "tests/"]) == "pytest"
    assert (
        _competitor_marker(["python", "/root/repo/bench.py"]) == "bench"
    )
    assert (
        _competitor_marker(["python", "tools/scale_probe_100x.py"])
        == "scale_probe_100x"
    )
    # innocents that the old substring match false-flagged
    assert _competitor_marker(["vim", "foo.java"]) is None
    assert _competitor_marker(["node", "/opt/java-tools/bench.py.js"]) is None
    assert (
        _competitor_marker(["less", "/docs/pyspark_guide.md"]) is None
    )
    assert _competitor_marker(["cat", "BENCH_detail_r10.json"]) is None
    assert _competitor_marker(["python", "my_analysis.py"]) is None
    assert _competitor_marker([]) is None
