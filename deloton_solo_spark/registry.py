"""Query registry: name → (PySpark impl, DuckDB oracle SQL twin).

Driver contract (``__spark_entry__.py``): every operator from SURVEY.md §2
gets a ``queries()`` entry; those with an ANSI-SQL-expressible semantics
also get an ``oracle_sql()`` entry the driver runs in DuckDB and
hash-compares (row count + schema + order-insensitive value hash, columns
sorted by name). Implementations alias every computed column identically
on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB-runnable SQL, or None → rows-only check
    tags: tuple[str, ...] = ()


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    """Import every operator module (side effect: registration) and
    return the full registry."""
    from .operators import (  # noqa: F401
        analytics,
        corpus,
        dedup,
        events,
        multimodal,
        parsing,
        pipeline,
        relational,
        sampling,
        sessionize,
        similarity,
        sinks,
        sources,
        streaming_ops,
        temporal,
        textstats,
        tpch,
    )

    return dict(_REGISTRY)
