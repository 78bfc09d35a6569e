"""Defensive epoch extraction.

``unix_micros``/``unix_millis`` require TIMESTAMP and throw
DATATYPE_MISMATCH on TIMESTAMP_NTZ — the exact failure mode of the
round-2 testdata regeneration (VERDICT.md round 2, item 1). Every epoch
extraction in the engine routes through these helpers, which cast first:
with the session pinned to UTC (session.py) the cast preserves wall-clock
values, so semantics are identical for TIMESTAMP, TIMESTAMP_NTZ, DATE,
and parseable strings. The cast is a no-op in the plan when the input is
already TIMESTAMP (Catalyst folds ``cast(ts as timestamp)`` away), so
there is zero runtime cost on the normalized path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _as_ts(c: ColumnOrName) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("timestamp")


def epoch_us(c: ColumnOrName) -> Column:
    """Microseconds since the epoch, casting to TIMESTAMP first."""
    return F.unix_micros(_as_ts(c))


def epoch_ms(c: ColumnOrName) -> Column:
    """Milliseconds since the epoch, casting to TIMESTAMP first."""
    return F.unix_millis(_as_ts(c))
