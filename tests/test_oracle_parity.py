"""Local mirror of the driver's correctness gate: run every registered
query in Spark AND its DuckDB oracle on the same parquet, compare
row-count + (column-name-sorted, row-sorted) values.

Exact equality is required for non-float columns; float columns must
agree to 1e-9 (the queries are designed so values are actually
bit-identical — decimal-exact sums, rounded ratios — so this should
never be exercised)."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from deloton_solo_spark.registry import all_queries

from .conftest import SF_DIR

SPECS = all_queries()
ORACLE_NAMES = sorted(n for n, s in SPECS.items() if s.oracle)
ROWS_ONLY_NAMES = sorted(n for n, s in SPECS.items() if not s.oracle)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]) or pd.api.types.is_integer_dtype(
            df[c]
        ):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("string")
        else:
            df[c] = df[c].astype("object").where(df[c].notna(), None)
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(
        drop=True
    )


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(duck_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
    )
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]):
            bad = [
                (i, x, y)
                for i, (x, y) in enumerate(zip(a[c], b[c]))
                if not (
                    (math.isnan(x) and math.isnan(y))
                    or x == y
                    or abs(x - y) <= 1e-9 * max(1.0, abs(x), abs(y))
                )
            ]
            assert not bad, f"{name}.{c}: first diffs {bad[:5]}"
        else:
            mism = a[c].compare(b[c])
            assert mism.empty, f"{name}.{c}: {mism.head()}"


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, duck, name):
    spec = SPECS[name]
    spark_pdf = spec.fn(spark, SF_DIR).toPandas()
    duck_pdf = duck.execute(spec.oracle).df()
    assert_frames_match(spark_pdf, duck_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_queries_run(spark, name):
    spec = SPECS[name]
    df = spec.fn(spark, SF_DIR)
    assert df.count() >= 0
    assert df.schema is not None
