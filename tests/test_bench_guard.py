"""Bench contamination auto-guard (VERDICT r9 task 4).

r9's provenance stamp caught three contaminated runs only after the
fact; ``bench.scan_contamination`` now runs before the timers start
and again at the end, and stamps ``contaminated`` into the committed
artifact. These tests drive the scanner against a FAKE /proc tree so
they are deterministic on any machine, plus one live-tree sanity run.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from bench import _ancestors, scan_contamination  # noqa: E402


def _fake_proc(tmp_path, procs):
    """procs: {pid: (ppid, cmdline_argv)} -> proc_root path."""
    for pid, (ppid, argv) in procs.items():
        d = tmp_path / str(pid)
        d.mkdir()
        (d / "status").write_text(f"Name:\tx\nPPid:\t{ppid}\n")
        (d / "cmdline").write_bytes("\0".join(argv).encode() + b"\0")
    return str(tmp_path)


def test_competing_jvm_is_flagged(tmp_path):
    root = _fake_proc(
        tmp_path,
        {
            4242: (1, ["java", "-cp", "spark/*", "SparkSubmit"]),
            4243: (1, ["/usr/bin/bash"]),
        },
    )
    scan = scan_contamination(proc_root=root, max_load1=1e9)
    assert scan["contaminated"] is True
    assert any("competing" in r for r in scan["reasons"])
    assert scan["competitors"][0]["pid"] == 4242
    # the innocent shell is not listed
    assert all(c["pid"] != 4243 for c in scan["competitors"])


def test_orphaned_driver_sim_is_flagged(tmp_path):
    root = _fake_proc(
        tmp_path,
        {9001: (1, ["python", "tools/driver_sim.py", "--sf-dir", "x"])},
    )
    scan = scan_contamination(proc_root=root, max_load1=1e9)
    assert scan["contaminated"] is True


def test_own_ancestry_and_children_exempt(tmp_path):
    me = os.getpid()
    root = _fake_proc(
        tmp_path,
        {
            # a fake parent-of-self entry would need the real chain; the
            # scanner walks the REAL ancestors of self for exemption and
            # the fake tree's ancestry for scanned pids. A child whose
            # PPid chain reaches us must be exempt:
            7001: (me, ["java", "-cp", "spark/*", "OurOwnExecutor"]),
            # and self must never self-flag even if listed:
            me: (1, ["python", "bench.py"]),
        },
    )
    scan = scan_contamination(proc_root=root, max_load1=1e9)
    assert scan["contaminated"] is False
    assert scan["competitors"] == []


def test_clean_tree_is_clean(tmp_path):
    root = _fake_proc(tmp_path, {5555: (1, ["/usr/bin/vim", "notes.md"])})
    scan = scan_contamination(proc_root=root, max_load1=1e9)
    assert scan["contaminated"] is False
    assert scan["reasons"] == []


def test_load_threshold_flags(tmp_path):
    root = _fake_proc(tmp_path, {})
    scan = scan_contamination(proc_root=root, max_load1=-1.0)
    assert scan["contaminated"] is True
    assert any("loadavg1" in r for r in scan["reasons"])


def test_live_proc_walks(tmp_path):
    """Sanity on the real /proc: the scan returns the stamp shape and
    never flags the pytest process driving it (self-exemption)."""
    scan = scan_contamination(max_load1=1e9)
    assert set(scan) == {
        "contaminated",
        "reasons",
        "competitors",
        "loadavg_1m",
    }
    me = os.getpid()
    assert all(c["pid"] != me for c in scan["competitors"])


def test_ancestor_chain_includes_self():
    chain = _ancestors(os.getpid())
    assert os.getpid() in chain
    assert 1 in chain or len(chain) >= 1
