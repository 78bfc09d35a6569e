"""Approximate-sketch accuracy bounds (operators without SQL oracles).

The driver only checks these rows-only; locally we hold them to their
documented error bounds against exact ground truth.
"""

from __future__ import annotations

from deloton_solo_spark.operators.analytics import distinct_users_hll

from .conftest import SF_DIR


def test_hll_within_documented_error(spark):
    rows = distinct_users_hll(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        err = abs(r.n_users_hll - r.n_users_exact) / max(r.n_users_exact, 1)
        # rsd 1.5% → hold to 5% (≈3 sigma) deterministic bound
        assert err <= 0.05, (r.event_type, r.n_users_hll, r.n_users_exact)
