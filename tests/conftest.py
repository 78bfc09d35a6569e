from __future__ import annotations

import duckdb
import pytest

# Test ordering (VERDICT r2 item 8): the plan-shape guards run BEFORE
# oracle parity, so a plan regression (an unpartitioned window, a lost
# broadcast, a BatchEvalPython creeping into a hot path) fails named as
# a PLAN regression — instead of surfacing later as a mysteriously slow
# bench or a parity timeout. Policy: no new entry in
# test_window_sweep.ALLOWED_GLOBAL_WINDOWS without a written reason at
# the entry site.
_GUARD_MODULES = ("test_plan_shapes", "test_window_sweep")


def pytest_collection_modifyitems(items):
    items.sort(
        key=lambda it: 0
        if any(g in it.nodeid for g in _GUARD_MODULES)
        else 1
    )

from deloton_solo_spark.catalog import TABLES, assert_schemas
from deloton_solo_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MID = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("deloton-tests", master="local[8]", shuffle_partitions=8)
    # Schema-drift pre-flight: one clear failure naming the drifted
    # column beats 50 scattered DATATYPE_MISMATCH test errors (the
    # round-2 failure mode). Runs once per session.
    assert_schemas(s, SF_DIR)
    yield s
    s.stop()


def make_duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Mimic the driver's DuckDB side: each table pre-registered as a
    view over the parquet file."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="session")
def duck():
    con = make_duck(SF_DIR)
    yield con
    con.close()
