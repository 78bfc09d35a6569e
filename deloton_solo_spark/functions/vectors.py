"""Vector math over ``array<float>`` columns — pure Spark SQL
higher-order functions, no UDFs (JVM-side, whole-stage codegen).

Used by the similarity-search and embedding-dedup operators over the
driver's ``embeddings.embedding`` column (FIXTURES.md §A).

All math is done in DOUBLE after an element cast so results match the
DuckDB oracle (``list_inner_product`` on ``DOUBLE[]``) bit-for-bit up to
rounding at 4 decimals.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(col: Column) -> Column:
    """array<float> → array<double> (exact element widening)."""
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product via zip_with + aggregate (left-fold, deterministic
    order — matters for float parity with the oracle)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; inputs should already be double arrays."""
    return dot(a, b) / (norm(a) * norm(b))


def cosine_oracle_sql(a: str, b: str) -> str:
    """DuckDB expression computing the same cosine (double math)."""
    return (
        f"list_inner_product({a}, {b}) / "
        f"(sqrt(list_inner_product({a}, {a})) * "
        f"sqrt(list_inner_product({b}, {b})))"
    )
