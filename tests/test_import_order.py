"""Direct-import robustness: every operator module must be importable
on its own in a FRESH interpreter (no prior package imports), because
user code does exactly that (`from deloton_solo_spark.operators.sampling
import N_SHARDS`). The hazard is the composed-oracle import cycle:
sampling → dedup → corpus, where corpus embeds registered oracle TEXTS
at import time — so the fragments it references must be registered
before the chain fires (round-8 fix: dataset_mixture moved above the
cycle trigger in sampling.py)."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import pytest

#: repo root derived from this file — the subprocess must find the
#: package regardless of where pytest was invoked from.
REPO_ROOT = Path(__file__).resolve().parents[1]

#: the modules that participate in composed-oracle import chains
CYCLE_MODULES = ["sampling", "dedup", "corpus", "textstats", "similarity"]


@pytest.mark.parametrize("mod", CYCLE_MODULES)
def test_operator_module_imports_standalone(mod):
    code = (
        f"import sys; sys.path.insert(0, {str(REPO_ROOT)!r});"
        f"import deloton_solo_spark.operators.{mod};"
        "from deloton_solo_spark.registry import all_queries;"
        "assert len(all_queries()) > 300"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(REPO_ROOT),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
