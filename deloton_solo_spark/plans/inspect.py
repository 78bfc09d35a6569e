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
