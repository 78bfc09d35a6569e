"""Physical-plan inspection utilities — the engine's own explain
tooling (used by tests/test_plan_shapes.py and by hand during tuning).

`audit(df)` condenses `.explain("formatted")` into the handful of
properties that decide whether a plan survives a 100× scale-up:
shuffle count, broadcast usage, scan pruning, python stages, and
single-partition hazards.
"""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def plan_text(df: DataFrame) -> str:
    """The formatted physical plan as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _nodes(plan: str, name: str) -> int:
    return len(re.findall(rf"\(\d+\) {name}\b", plan))


@dataclass
class PlanAudit:
    exchanges: int
    broadcasts: int
    sort_merge_joins: int
    broadcast_hash_joins: int
    python_stages: int
    single_partition_exchanges: int
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)

    @property
    def shuffle_free(self) -> bool:
        return self.exchanges == 0

    @property
    def jvm_only(self) -> bool:
        return self.python_stages == 0


def audit(df: DataFrame) -> PlanAudit:
    """Summarize the scale-relevant properties of a plan."""
    p = plan_text(df)
    return PlanAudit(
        exchanges=_nodes(p, "Exchange"),
        broadcasts=_nodes(p, "BroadcastExchange"),
        sort_merge_joins=_nodes(p, "SortMergeJoin"),
        broadcast_hash_joins=_nodes(p, "BroadcastHashJoin"),
        python_stages=_nodes(p, "BatchEvalPython")
        + _nodes(p, "ArrowEvalPython")
        + _nodes(p, "MapInPandas"),
        single_partition_exchanges=len(
            re.findall(r"Arguments: SinglePartition", p)
        ),
        pushed_filters=re.findall(r"PushedFilters: \[([^\]]*)\]", p),
        read_schemas=re.findall(r"ReadSchema: (\S+)", p),
    )


_WINDOW_SPEC_RE = re.compile(r"windowspecdefinition\(")


def unpartitioned_window_specs(plan: str) -> list[str]:
    """The single-partition hazard detector: first arguments of
    ``windowspecdefinition`` calls whose partition list is EMPTY (the
    first argument is already an ORDER expression or the frame spec).
    Such a window moves its entire input to one task — the plan shape
    that dies at 100×; tests/test_window_sweep.py sweeps every
    registered query with this and maintains the documented tiny-input
    allowlist."""
    hits = []
    for m in _WINDOW_SPEC_RE.finditer(plan):
        i, depth, arg = m.end(), 0, []
        while i < len(plan):
            c = plan[i]
            if c == "(":
                depth += 1
            elif c == ")":
                if depth == 0:
                    break
                depth -= 1
            elif c == "," and depth == 0:
                break
            arg.append(c)
            i += 1
        first = "".join(arg)
        if (
            " ASC" in first
            or " DESC" in first
            or first.startswith("specifiedwindowframe")
        ):
            hits.append(first)
    return hits


def global_window_input_counts(df: DataFrame) -> list[int]:
    """Execute-and-measure companion to ``unpartitioned_window_specs``:
    the ACTUAL input row count of every unpartitioned logical Window in
    ``df``'s optimized plan (windows preserve cardinality, so the
    child's count IS the rows one WindowExec task would buffer).

    tests/test_window_sweep.py uses this to assert each allowlisted
    global window really is bounded to its documented row count —
    a refactor that silently turns a "tiny carry" into a corpus-wide
    window now fails with a measured number instead of shipping.
    """
    jdf = df._jdf
    spark = df.sparkSession
    plan = jdf.queryExecution().optimizedPlan()
    kids = []
    stack = [plan]
    while stack:
        node = stack.pop()
        if (
            node.getClass().getSimpleName() == "Window"
            and node.partitionSpec().isEmpty()
        ):
            kids.append(node.child())
        for i in range(node.children().length()):
            stack.append(node.children().apply(i))
    ds = spark._jvm.org.apache.spark.sql.classic.Dataset
    return [int(ds.ofRows(spark._jsparkSession, k).count()) for k in kids]
