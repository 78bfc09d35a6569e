"""Type-level schema parity for every oracle (the driver may compare
schemas, not just values — and pandas value-compare can silently coerce).

DuckDB habits that WILL drift if unchecked: SUM(int) → HUGEINT,
``to_json`` → JSON type, ``//`` on DOUBLE → DOUBLE, rank() → BIGINT
(Spark: INT). Every oracle must DESCRIBE to the exact dtype family the
Spark query produces.
"""

from __future__ import annotations

import duckdb
import pytest

from deloton_solo_spark.registry import all_queries

from .conftest import SF_DIR, make_duck

SPECS = all_queries()
ORACLE_NAMES = sorted(n for n, s in SPECS.items() if s.oracle)

#: DuckDB type → acceptable Spark dtypes.
TYPE_MAP = {
    "BIGINT": {"bigint"},
    "INTEGER": {"int"},
    "SMALLINT": {"smallint"},
    "DOUBLE": {"double"},
    "FLOAT": {"float"},
    "VARCHAR": {"string"},
    "TIMESTAMP": {"timestamp", "timestamp_ntz"},
    "DATE": {"date"},
    "BOOLEAN": {"boolean"},
}


@pytest.fixture(scope="module")
def duck_schema_con():
    con = make_duck(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_schema_types_match(spark, duck_schema_con, name):
    spec = SPECS[name]
    desc = duck_schema_con.execute(f"DESCRIBE {spec.oracle}").df()
    duck_types = dict(zip(desc.column_name, desc.column_type))
    spark_types = dict(spec.fn(spark, SF_DIR).dtypes)
    assert set(duck_types) == set(spark_types), (
        f"{name}: columns {sorted(duck_types)} != {sorted(spark_types)}"
    )
    for col, dt in duck_types.items():
        allowed = TYPE_MAP.get(dt)
        assert allowed is not None, (
            f"{name}.{col}: oracle yields {dt} — not an allowed driver "
            f"type (HUGEINT/JSON/DECIMAL must be cast in the oracle SQL)"
        )
        assert spark_types[col] in allowed, (
            f"{name}.{col}: duck={dt} vs spark={spark_types[col]}"
        )
