"""Plan-regression sweep: NO query may plan a window over an
unpartitioned, unbounded input — the single-task pattern that dies at
100× scale (the whole dataset funnels through one WindowExec task).

Every registered batch query is explained and scanned for
``windowspecdefinition`` nodes with an empty partition list. Queries on
the allowlist carry a documented reason their global window is bounded
to a tiny input (post-limit ranking, per-group single rows,
pre-aggregated scalars) — anything else failing here is a regression.
"""

from __future__ import annotations

import pytest

from deloton_solo_spark.plans.inspect import (
    plan_text,
    unpartitioned_window_specs,
)
from deloton_solo_spark.registry import all_queries

from .conftest import SF_DIR

#: name -> why a partition-less window is acceptable THERE.
ALLOWED_GLOBAL_WINDOWS = {
    # ranks the ≤100 rows surviving orderBy().limit(K) — input bounded
    # by the constant K, never by corpus size
    "token_frequency_rank": "rank attached after limit(100)",
    # ntile over per-customer pre-aggregated rows (documented in
    # operators/analytics.py — input already reduced by a partial agg)
    "ntile_customer_value": "window input pre-aggregated per customer",
    # percent_rank/cume_dist over per-customer pre-aggregated rows —
    # same bounded-dimension input as ntile_customer_value
    "customer_percentiles": "window input pre-aggregated per customer",
    # three ntile quartile windows over per-customer pre-aggregated
    # rows — same bounded-dimension input as ntile_customer_value
    "rfm_segmentation": "window input pre-aggregated per customer",
    # prefix-sum carry: the second phase windows over ONE row per
    # bucket (32 rows at any scale) — functions/windows.py
    "session_boundary_reset": "carry window over one row per bucket",
    "ride_id_running_counter": "carry window over one row per bucket",
    "ride_ingest_pipeline": "carry window over one row per bucket",
    "forward_fill_state": "carry window over one row per bucket",
    "doc_pack_assign": "carry window over one row per bucket",
    # reuses doc_pack_assign's prefix-sum fragment (same carry window)
    "pack_efficiency_report": "carry window over one row per bucket",
    # ranks one row per GROUP (rides), not per event row
    "drop_first_last_group": "window over one row per ride group",
    # rank + cumulative-coverage windows run AFTER orderBy().limit(V) —
    # input bounded by the constant V=100, never by corpus size
    "vocab_coverage": "rank/cumsum windows attached after limit(100)",
    # rank-id assignment runs AFTER orderBy().limit(VOCAB_V=24) —
    # input bounded by the constant V, never by corpus size
    "vocab_rank_ids": "rank window attached after limit(24)",
    # embeds the vocab_rank_ids fragment (same bounded window)
    "bpe_encode_rank_ids": "rank window attached after limit(24)",
    # prefix-sum carry over per-partition COUNTS — one row per range
    # partition (SNM_RANK_PARTS=8 rows at any scale)
    "sorted_neighborhood_pairs": "carry window over one row per bucket",
    # two _snm_cand passes, same carry-window shape per pass
    "snm_multipass_pairs": "carry window over one row per bucket",
    # distributed prefix-MAX carry over per-partition maxima — one row
    # per range partition (SKY_PARTS=8 rows at any scale)
    "skyline_pareto_orders": "carry window over one row per bucket",
    # reuses doc_pack_assign's prefix-sum fragment (same carry window)
    "doc_pack_rewrite": "carry window over one row per bucket",
    # ECDF prefix carry over per-partition (ca, cb) sums — one row per
    # range partition (KS_PARTS=8 rows at any scale)
    "ks_test_report": "carry window over one row per bucket",
    # exclusive rank prefix over the per-value tie table — same
    # two-phase prefix-sum shape as ks_test_report's ECDF
    "mann_whitney_u_test": "carry window over one row per bucket",
    # AUC rank-sum reuses the same tie-table prefix carry
    "classifier_auc_report": "carry window over one row per bucket",
    # global-CDF lookup table reuses the same tie-table prefix carry
    "quantile_normalize_scores": "carry window over one row per bucket",
    # CUSUM running sum/min over the per-DAY aggregate — input is
    # calendar-bounded (~2.4k rows for this span at ANY fact scale)
    "changepoint_cusum_report": "window over calendar-bounded day aggregate",
    # rank over the per-NATION aggregate (≤25 rows — the
    # ntile_customer_value bounded-dimension precedent)
    "topn_with_other_rollup": "window over per-nation pre-aggregated rows",
    # fusion ranks attach AFTER the two legs' orderBy().limit(K) —
    # window inputs bounded by the constants BM25_TOP=20 / TOP_K=10
    "hybrid_search_rrf": "rank windows attached after limit(20)",
    # rolling frame over the JOINED minute-bar series of one type pair
    # — input is bar cardinality (one row per minute, time-range-
    # bounded), the same bound streaming_minute_bars/ewma rely on
    "rolling_correlation_bars": "window over per-minute bars",
    # revenue-rank carry over per-partition counts — one row per range
    # partition (GINI_PARTS=8 rows at any scale)
    "market_concentration_report": "carry window over one row per bucket",
}

def _sweepable():
    # streaming queries RUN real jobs inside the query fn and return a
    # plain parquet read (no window can hide there); the iterative
    # graph queries execute a driver loop — both are excluded from the
    # cheap construct-and-explain sweep.
    skip_tags = {"streaming", "graph"}
    return sorted(
        name
        for name, spec in all_queries().items()
        if not skip_tags & set(spec.tags)
    )


@pytest.mark.parametrize("name", _sweepable())
def test_no_unpartitioned_window_over_unbounded_input(spark, name):
    plan = plan_text(all_queries()[name].fn(spark, SF_DIR))
    specs = unpartitioned_window_specs(plan)
    if name in ALLOWED_GLOBAL_WINDOWS:
        # a stale allowlist entry would mask future regressions
        assert specs, (
            f"{name} is allowlisted but has no global window anymore — "
            "remove the stale entry"
        )
        return
    assert not specs, (
        f"{name} plans a window with NO partition columns — the whole "
        f"input funnels through one task at scale: {specs[:2]}"
    )
