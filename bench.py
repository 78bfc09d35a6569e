#!/usr/bin/env python
"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to full materialization with the noop sink (count()
alone would let Spark skip narrow-map work via column pruning).

Tuning notes (local[$SPARK_GRAFT_CPUS]):
- shuffle partitions = CPU count: right for <1 GB local runs; at real
  cluster scale you size to ~128 MB/partition instead.
- AQE on: coalesces tiny shuffle partitions, handles skew joins.
"""

from __future__ import annotations

import json
import os
import time

from deloton_solo_spark.registry import all_queries
from deloton_solo_spark.session import get_spark

# The round-1 era query set, frozen by NAME: the cross-round subtotal
# below sums exactly these, so later insertions/reorderings in HEADLINE
# cannot silently change what the 30.1 s-baseline comparison measures.
R1_QUERIES = (
    "agg_pricing_summary",
    "inner_equi_join",
    "join_filter_eq",
    "rider_stats",
    "topk_customers_by_spend",
    "filter_date_parts",
    "parse_log_pipeline",
    "struct_literal_parse",
    "session_boundary_reset",
    "forward_fill_state",
    "groupby_agg_per_user",
    "sessionize_events",
    "ride_ingest_pipeline",
    "users_ingest_pipeline",
    "asof_join_shipments",
    "range_join_shipments",
    "rollup_revenue_by_nation",
    "window_rank_orders",
    "exact_dedup",
    "near_dedup_ngram_jaccard",
    "simhash_fingerprint",
    "similarity_topk",
    "similarity_topk_lsh",
    "similarity_topk_ivf",
    "text_stats",
    "token_count",
    "lang_id",
    "doc_fingerprint",
    "multimodal_meta",
)

# The round-4 era 46-query set, frozen by NAME for the same
# tamper-proof cross-round comparison R1_QUERIES provides (VERDICT r4
# task 5): round-5+ growth cannot change what the r4 subtotal sums.
R4_QUERIES = tuple(R1_QUERIES) + (
    "bm25_retrieval",
    "textrank_keywords",
    "minhash_band_pairs",
    "similarity_topk_pq",
    "chunk_dedup",
    "curation_pipeline",
    "bpe_pair_counts",
    "bpe_train_merges",
    "fuzzy_dedup_editdistance",
    "doc_pack_assign",
    "gopher_quality_filter",
    "quality_classifier_score",
    "domain_cap_sample",
    "tfidf_top_terms",
    "bigram_surprisal",
    "multimodal_phash_dedup",
    "chunk_dedup_rewrite",
)

# The round-5 era 48-query set, frozen by NAME (same discipline):
# round-6+ growth cannot change what the r5 subtotal sums.
R5_QUERIES = tuple(R4_QUERIES) + (
    # round-5 additions: the genuinely NEW plan shapes (anchor-gram
    # diagonal islands; persisted-index screen)
    "substring_dedup",
    "incremental_minhash_update",
)

# round-6 additions: new plan shapes only (grid-cell overlap join;
# double-pass range-partitioned ranking; banded calibrate; Morton
# rewrite; narrow HOF entropy; closed-form lag EWMA)
HEADLINE = list(R5_QUERIES) + [
    "incremental_substring_update",
    "interval_overlap_join",
    "snm_multipass_pairs",
    "minhash_calibration_report",
    "zorder_layout",
    "char_entropy_filter",
    "ewma_smoothing",
    "weighted_sample_topk",
    "hll_set_algebra",
    "equi_depth_histogram",
    # round-6 second wave: distributed prefix-MAX frontier; Apriori
    # broadcast-pruned pair join; TakeOrdered postings cut; pack-keyed
    # shard materialization; fixed-size-bit-array probe join
    "skyline_pareto_orders",
    "frequent_pair_mining",
    "inverted_index_postings",
    "doc_pack_rewrite",
    "bloom_calibration_report",
    "mad_robust_anomaly",
    "contrastive_negatives",
    "join_size_estimate_report",
    "benford_digit_audit",
    "padding_waste_report",
    "referential_integrity_audit",
    "key_uniqueness_profile",
    # round-6 third wave: bottom-k sketch; exact-arithmetic OLS;
    # session path strings; fold-partial jackknife
    "kmv_distinct_sketch",
    "trend_regression_per_type",
    "session_path_topk",
    "funnel_latency_quantiles",
    "jackknife_mean_ci",
    # round-6 fourth wave: unit-of-randomization experiment readout;
    # single-window feature matrix; explicit windowed median; dual-
    # branch PSI
    "ab_experiment_report",
    "lag_feature_matrix",
    "rolling_median_bars",
    "psi_drift_report",
    # round-6 fifth wave: duration-weighted agg; constant-grid profile;
    # raw-text round trip; staged-audit sink
    "time_weighted_avg",
    "hour_of_week_seasonality",
    "text_lines_source",
    "wap_publish_sink",
    # round-6 sixth wave: margins-spine chi2; distributed-ECDF KS;
    # broadcast-matrix sequence scoring; frontier-join BFS
    "chi2_independence_test",
    "ks_test_report",
    "markov_sequence_likelihood",
    "bfs_reachability",
    # round-6 seventh wave: strided narrow-map chunker (hybrid_search_rrf
    # stays out: family-replay of bm25 + similarity_topk, both already
    # timed)
    "doc_chunk_overlap",
    "pq_distortion_report",
    "physical_plan_advisor",
    # round-6 ninth wave: seasonal-baseline residual scoring; cohort
    # cumulative windows; star-schema funnel enrich; SLA percentiles
    "seasonal_residual_anomaly",
    "cohort_ltv_curve",
    "funnel_by_segment",
    "shipping_sla_report",
    "rolling_correlation_bars",
    "churn_feature_table",
    "multimodal_audio_energy",
    "market_concentration_report",
    # round-6 tenth wave: the TPC-H decision-support suite (X188-X194)
    # — canonical multi-join shapes: semi-join with correlated
    # predicate, 6-way star, bilateral slice, argmax-join, top-k
    "shipping_priority_topk",
    "order_priority_check",
    "local_supplier_volume",
    "bilateral_trade_volume",
    "returned_items_report",
    "promo_revenue_share",
    "top_supplier_revenue",
    "nation_market_share",
    "late_shipment_priority",
    "small_qty_order_revenue",
    "large_volume_customers",
    "disjunctive_predicate_revenue",
    "late_sole_supplier_ranking",
    "idle_customer_balance",
    # round-6 eleventh wave: per-slice tokenizer economics; order-free
    # 12-dp log-sum Pareto MLE (curriculum_bucket_assign stays out:
    # same percentile-ladder plan equi_depth_histogram already times)
    "tokenizer_fertility_report",
    "doclen_power_law_fit",
    # window-min HOF fingerprint selection + bucketed pair join
    # (mann_whitney_u_test stays out: same prefix-carry plan shape
    # ks_test_report already times). winnowing_span_rewrite joined in
    # r9: both queries now read ONE persisted fingerprint index
    # (dedup._winnow_index) — the first consumer pays the build, the
    # second measures the artifact-reuse contract, so timing the pair
    # together is the point.
    "winnowing_fingerprint_pairs",
    "winnowing_span_rewrite",
    # distinct-shingle novelty join; checkpointed HOF-norm stats
    # broadcast-back; hash-keyed count window (event_order_inversion_
    # report stays out: same partitioned-lag plan lag_feature_matrix
    # already times)
    "batch_novelty_scores",
    "embedding_norm_audit",
    "dedup_soft_weights",
    # scan-bound predicate aggregate (Q6); triple-margin G² join
    # (streaming_inversion_monitor stays out: streaming replays are
    # correctness-gated, not benched, per the family convention)
    "forecast_revenue_change",
    "collocation_llr_bigrams",
    # variance-optimal quota rank; QI distinct-agg; multi-table
    # conditional-count union (source_reputation_score stays out:
    # family replay of the classifier + gopher plans already timed)
    "neyman_allocation_sample",
    "k_anonymity_audit",
    "data_contract_audit",
    # 64-group posexplode dimension profile (ann_recall_report and
    # ab_srm_check stay out: family replays of similarity_topk{,_lsh}
    # and the X163 arm hash, all already timed)
    "embedding_dimension_profile",
    # aggregated-frame calendar self-join; FK-cascade semi-join
    # pricing; narrow sentence HOF (temperature_mixture_sample stays
    # out: identical plan shape to neyman_allocation_sample)
    "revenue_yoy_report",
    "gdpr_erasure_cascade",
    "sentence_split_stats",
    # iterative distributed matvec: 3 unrolled power rounds over the
    # checkpointed exploded table (multimodal_scene_cut stays out:
    # family replay of the X186 audio kernel already timed)
    "embedding_top_pc_power_iter",
    # bounded fan-out sliding-distinct
    "rolling_active_users",
    # tie-table range-join CDF lookup; spine-completed Fano grid
    "quantile_normalize_scores",
    "event_burstiness_report",
    # bounded lag fan-out equi-join ACF; exact-decimal CUSUM prefix
    "autocorrelation_report",
    "changepoint_cusum_report",
    # OTHER-bucket fold over a dimension-bounded rank
    # (embedding_debias_toppc stays out: replays the X230 trainer
    # already timed, plus one matvec exchange)
    "topn_with_other_rollup",
    # round-7 wave: two-level count-of-counts distribution (zero-
    # preserving left join + histogram-of-counts); df-ordered prefix
    # index join (the PPJoin shape — candidate join over prefix tokens
    # only, exact array_intersect verify)
    "customer_order_distribution",
    "prefix_filter_jaccard_pairs",
    # zero-shuffle narrow array dedup (scan-bound by design); positional
    # postings equi-join phrase merge
    "intra_doc_chunk_dedup",
    "phrase_search_positional",
    # materialized-aggregate delta merge (partial-agg full-outer IVM)
    "incremental_agg_maintenance",
    # censoring-aware day-table reduction + exact-decimal hazard prefix
    "survival_hazard_curve",
    # round-8 wave: IVF-probed cross-label mining over the shared
    # persisted semantic-index artifacts; distributed-prefix-sum global
    # token index + first-occurrence vocabulary growth ladder
    "hard_negative_mining",
    "heaps_law_curve",
    # unrolled greedy MMR re-rank over constant-size per-query pools
    "mmr_diversified_topk",
    # skew diagnosis (TakeOrdered histogram + broadcast totals) and the
    # salted two-level hot-key aggregation it recommends
    "join_skew_report",
    "salted_hot_key_agg",
    # degree-ordered triangle census of the kNN graph (Cohen/Suri
    # orientation bounds the wedge join on hubs)
    "knn_triangle_census",
    # round-8 second wave: B-fold Poisson-resample explode collapsed by
    # map-side combine to B rows/task (the distributed bootstrap); and
    # the variable-interval running-MAX sweep (union-of-intervals merge)
    "bootstrap_mean_ci",
    "interval_union_coverage",
    # weighted Bellman-Ford relax-combine rounds; range-partitioned
    # grouped prefix-sum weighted median (per-group cumulative weight
    # without per-group window state)
    "cheapest_supply_path",
    "weighted_median_price",
    # majority-vote frontier rounds over the shared kNN frame (anti-join
    # + per-node ranking window per round)
    "label_propagation_audit",
    # train-and-score in one plan: dictionary-model broadcast into the
    # exploded-token scoring join, doc×lang spine agg
    "naive_bayes_lang_confusion",
    # Lindley-reflection closed form: the clamp recursion as two
    # per-user cumulative windows + one aggregate
    "clamped_balance_walk",
    # geometric-lag pair sampling: 4 index equi-joins + per-type median
    "theil_sen_trend",
    # round-9 ops: one-pass tokenize→language ladder (water-filling);
    # 3-way split + per-type rank window (conformal); zero-exchange
    # HOF quantization audit (shard_stitch_pairs stays out: same
    # fingerprint equi-join family the winnowing pair already times,
    # and it is empty-by-design on a clean corpus)
    "token_budget_waterfill",
    "conformal_calibration_report",
    "int8_quantization_audit",
    # round-9 second wave: the Q13 count-of-counts shape on text; the
    # doc-grain bucket-carry prefix-sum grid selection
    # (shard_manifest_report stays out: two-md5 + 16-key agg, the
    # chunk_dedup/exact_dedup exchange family already timed)
    "good_turing_unseen_mass",
    "pps_systematic_sample",
    # round 10: the KN LM shares X119's vocabulary-broadcast shape but
    # adds the continuation/fertility stat tables (worth timing); the
    # release gate times the manifest CONSUMER path (two manifest
    # passes + 16-row drift join + the X220-style audit folds).
    # perplexity_kn_vs_addone stays out: it replays both LM gates
    # verbatim (family-replay rule).
    "perplexity_filter_kn",
    "corpus_release_gate",
]
# Round-8 second wave, kept out by the family-replay rule:
# doc_shuffle_index (distributed_row_number rank plan — rfm_segmentation
# / ntile already time it; the 16-key agg is noise),
# bh_fdr_mean_shift (two-pass quantile cut + (type,half) moment agg —
# the ks_test_report / jackknife plans; the BH windows rank ~5 rows),
# power_analysis_report (two-level (user,type)->type moment aggs — the
# rider_stats / ab plans),
# two_proportion_ztest (user-keyed 0/1 agg + 1-row scalar math — the
# same shelf),
# cuped_variance_reduction (same quantile cut + user-keyed moment aggs —
# the ab_experiment_report plan with one more broadcast scalar),
# streaming_interval_union (streaming replays are correctness-gated,
# not benched, per the family convention),
# dp_noisy_counts (low-cardinality agg + scalar projection — text_stats'
# plan), winsorized_robust_stats (percentile agg + broadcast-back —
# customer_percentiles' plan), rater_agreement_kappa (single full-scan
# regex agg — char_entropy_filter's scan), functional_dependency_audit
# (count-distinct partial agg — key_uniqueness_profile's plan), and
# temporal_split_embargo (two-pass quantile cut + 3-key agg — the
# equi_depth_histogram / text_stats plans).
# classifier_confusion_report / classifier_auc_report /
# calibration_bins_report / classifier_lift_table stay out of HEADLINE:
# each replays the quality_classifier_score + gopher_quality_filter
# single-projection plans already timed (family-replay rule), plus
# carry/ladder shapes ks_test_report and equi_depth_histogram time.
# dedup_transitivity_audit and dataset_card_report stay out of HEADLINE
# for the same family-replay reason as dedup_family_overlap_report: they
# re-time plans (minhash_band_pairs; gopher + exact_dedup) that are
# already in the gate.
# Cold-build attribution (VERDICT r11 item 8, accepted + documented):
# the per-(session, corpus) parquet artifacts are paid by their FIRST
# timed consumer in HEADLINE order — shingle_index by
# near_dedup_ngram_jaccard (#20), the MinHash signature index by
# minhash_band_pairs (#32), the winnowing fp index by
# winnowing_fingerprint_pairs, the codebook/assignment/kNN artifacts by
# similarity_topk_ivf / knn_triangle_census. A warm consumer's steady
# cost is what repeats measure (SPARK_GRAFT_BENCH_REPEATS min-of-N
# mode, r12): e.g. minhash_band_pairs 3.4 s cold / 0.9 s steady at
# sf0.1. This is ingest-time cost at deploy, paid once per corpus —
# and the sf0.001 warmup cannot pre-build sf0.1 artifacts (different
# corpus fingerprint), so a cold bench run always pays it inside the
# timed loop, never outside it.
# NOT in HEADLINE by choice, not omission: semantic_dedup and
# cluster_balanced_sample each pay the same ~2 s per-invocation Lloyd
# training that similarity_topk_ivf already times — three copies of one
# codepath added ~6 s of redundant measurement and pushed worst-case
# variance against the 2x bench gate. Both stay covered by the
# correctness gate at both SFs, and semantic_dedup's scaling is
# measured explicitly by tools/scale_smoke.py (SCALE.md). The same
# redundant-prefix rule keeps out vocab_rank_ids / bpe_encode_rank_ids /
# bpe_encode_corpus / bpe_decode_roundtrip (each replays the 4-round BPE
# trainer that bpe_train_merges already times) and
# cross_modal_alignment_audit (another Lloyd-training copy).


#: Script stems that mark a *python* process as a bench competitor —
#: the Spark-driving tools whose orphaned JVMs caused r9's three
#: excluded runs. Matched against the basename of the script argument,
#: never the raw joined cmdline (ADVICE r10: substring matching
#: false-flagged editors on foo.java and paths containing "java").
_COMPETITOR_PY_STEMS = frozenset(
    {
        "driver_sim",
        "pytest",
        "scale_probe_100x",
        "scale_smoke",
        "bench",
        "gc_pin_series",
        "spill_metrics",
    }
)


def _competitor_marker(argv: list[str]) -> str | None:
    """Return the marker that makes ``argv`` a bench competitor, else
    None. A competitor is (a) any JVM (exe basename starts with
    "java"), (b) a Spark launcher (pyspark / spark-submit / ...), or
    (c) a python process running one of the Spark-driving tools in
    :data:`_COMPETITOR_PY_STEMS` (by script basename or ``-m`` module).
    Matching on basenames keeps `vim foo.java` or a path containing
    "pyspark" from false-flagging the run (ADVICE r10)."""
    argv = [a for a in argv if a]
    if not argv:
        return None
    exe = os.path.basename(argv[0])
    if exe.startswith("java"):
        return "java"
    if exe.startswith(("pyspark", "spark-submit", "spark-shell")):
        return exe
    if exe == "pytest":
        return "pytest"
    if exe.startswith("python"):
        rest = argv[1:]
        for i, a in enumerate(rest):
            if a == "-m" and i + 1 < len(rest):
                mod = rest[i + 1]
                if mod == "pytest" or mod.startswith("pyspark"):
                    return mod
        script = next((a for a in rest if not a.startswith("-")), "")
        base = os.path.basename(script)
        stem = base[:-3] if base.endswith(".py") else base
        if stem in _COMPETITOR_PY_STEMS:
            return stem
    return None


def _cpu_ticks(proc_root: str = "/proc") -> tuple[int, int]:
    """(steal_ticks, total_ticks) from the aggregate /proc/stat cpu line.

    Host-level CPU steal is invisible to the process scan (r11's five
    sealed runs were all ``contaminated: false`` while ambient loadavg
    sat at 2-5 with ZERO local processes — VERDICT r11 item 2). The
    hypervisor debits stolen time to the `steal` field, so a delta of
    steal/total across the timed region IS the missing signal.
    """
    try:
        with open(f"{proc_root}/stat") as fh:
            fields = fh.readline().split()
    except OSError:
        return (0, 0)
    vals = [int(x) for x in fields[1:]]
    steal = vals[7] if len(vals) > 7 else 0
    return (steal, sum(vals))


def _steal_pct(t0: tuple[int, int], t1: tuple[int, int]) -> float | None:
    """Percent of CPU time stolen between two _cpu_ticks snapshots."""
    d_total = t1[1] - t0[1]
    if d_total <= 0:
        return None
    return round(100.0 * (t1[0] - t0[0]) / d_total, 3)


def _ancestors(pid: int, proc_root: str = "/proc") -> set[int]:
    """PID plus its parent chain (so the harness shell / driver that
    LAUNCHED this bench is never flagged as a competitor)."""
    out: set[int] = set()
    while pid > 0 and pid not in out:
        out.add(pid)
        try:
            with open(f"{proc_root}/{pid}/status") as fh:
                ppid = next(
                    (
                        int(line.split()[1])
                        for line in fh
                        if line.startswith("PPid:")
                    ),
                    0,
                )
        except OSError:
            break
        pid = ppid
    return out


def scan_contamination(
    proc_root: str = "/proc", max_load1: float | None = None
) -> dict:
    """Preventive contamination scan (VERDICT r9 task 4).

    r9's provenance stamp caught three contaminated runs only AFTER
    their numbers were on disk; this scan runs BEFORE the timers start
    (and again at the end) so an unclean run is labeled at birth:
    competing JVM / Spark-driving python processes and a hot 1-minute
    loadavg each add a reason, and any reason flips the committed
    artifact's ``contaminated`` flag to true. With
    ``SPARK_GRAFT_BENCH_STRICT=1`` the run refuses to start instead.

    Self and the full parent chain are exempt (the bench's own JVM
    child and the shell that launched it are not competitors).
    """
    me = os.getpid()
    exempt = _ancestors(me, proc_root)
    competitors: list[dict] = []
    try:
        pids = [int(p) for p in os.listdir(proc_root) if p.isdigit()]
    except OSError:
        pids = []
    for pid in pids:
        if pid in exempt:
            continue
        try:
            with open(f"{proc_root}/{pid}/cmdline", "rb") as fh:
                argv = fh.read().decode("utf-8", "replace").split("\0")
        except OSError:
            continue
        cmd = " ".join(a for a in argv if a)
        if not cmd:
            continue
        # children of the bench itself (the Spark JVM, python workers)
        # are launched AFTER the start-scan, so they only matter for
        # the end-scan — there, anything whose ancestry includes us is
        # ours, not a competitor.
        if me in _ancestors(pid, proc_root):
            continue
        if _competitor_marker(argv) is not None:
            competitors.append({"pid": pid, "cmd": cmd[:160]})
    if max_load1 is None:
        max_load1 = float(
            os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD", "8.0")
        )
    load1 = os.getloadavg()[0]
    reasons = []
    if competitors:
        reasons.append(f"{len(competitors)} competing spark/jvm processes")
    if load1 > max_load1:
        reasons.append(f"loadavg1 {load1:.2f} > {max_load1}")
    return {
        "contaminated": bool(reasons),
        "reasons": reasons,
        "competitors": competitors[:10],
        "loadavg_1m": round(load1, 2),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Contamination pre-flight BEFORE the session spins up: a run that
    # starts dirty can never silently become the committed artifact.
    pre_scan = scan_contamination()
    ticks_start = _cpu_ticks()
    if pre_scan["contaminated"]:
        import sys

        print(
            "bench: CONTAMINATED start: " + "; ".join(pre_scan["reasons"]),
            file=sys.stderr,
        )
        if os.environ.get("SPARK_GRAFT_BENCH_STRICT") == "1":
            print(
                "bench: refusing to run (SPARK_GRAFT_BENCH_STRICT=1)",
                file=sys.stderr,
            )
            raise SystemExit(2)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("deloton-bench")
    # Schema-drift pre-flight: if the driver regenerated testdata with
    # different physical types, fail here with one clear message instead
    # of mid-bench (the round-2 failure mode — VERDICT.md r2 item 3).
    from deloton_solo_spark.catalog import assert_schemas

    assert_schemas(spark, sf_dir)
    specs = all_queries()
    timings: dict[str, float] = {}
    # JVM/codegen/parquet-reader warmup so q1 isn't charged for one-time
    # JIT + classloading costs (measured: first parquet agg pays ~5 s of
    # warmup that subsequent queries do not).
    spark.range(1000).selectExpr("sum(id)").collect()
    from deloton_solo_spark.catalog import load_table

    load_table(spark, sf_dir, "region").groupBy("r_name").count().write.format(
        "noop"
    ).mode("overwrite").save()
    # warm the big scans (file listing + parquet footers) and the
    # Python worker pool (mapInPandas startup) — both steady-state on a
    # long-lived cluster, both otherwise charged to the first query
    # that needs them.
    for t in ("lineitem", "documents", "embeddings"):
        load_table(spark, sf_dir, t).limit(1).count()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    # Steady-state measurement: run each headline query once at sf0.001
    # first. A query's FIRST-ever execution pays one-time JVM costs —
    # whole-stage-codegen compilation, JIT warmup, classloading — that a
    # long-lived cluster pays once per plan shape, not once per query.
    # The tiny-SF pre-run compiles the identical plan shape (same
    # schema, same generated code, different files), so the timed sf0.1
    # runs below measure plan analysis + optimization + ALL data work,
    # without the one-time compile. Measured: cold total ~37 s vs
    # steady-state ~24 s at sf0.1; per-query deltas are pure codegen
    # (e.g. near_dedup_ngram_jaccard 3.3 s cold / 1.5 s steady).
    # Derive the warmup dir from sf_dir (sibling sf0.001) so a relocated
    # data root still benches; if no tiny sibling exists, skip the
    # steady-state pre-run with a note (timings then include one-time
    # codegen, ~+11 s total — see BASELINE.md).
    warm_sf = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(warm_sf):
        for name in HEADLINE:
            specs[name].fn(spark, warm_sf).write.format("noop").mode(
                "overwrite"
            ).save()
    else:
        import sys

        print(
            f"bench: warmup dir {warm_sf} missing; timings are cold-start",
            file=sys.stderr,
        )
    # Optional min-of-N (VERDICT r11 item 2): re-run ONLY the timed loop
    # N times and keep each query's minimum, bounding host-steal noise in
    # sealed artifacts. Default 1 = the driver's methodology, unchanged.
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "1")))
    runs: list[dict[str, float]] = []
    ticks_loop0 = _cpu_ticks()
    t_total = time.time()
    for _ in range(repeats):
        run: dict[str, float] = {}
        for name in HEADLINE:
            fn = specs[name].fn
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            run[name] = round(time.time() - t0, 3)
        runs.append(run)
    loop_wall = time.time() - t_total
    ticks_loop1 = _cpu_ticks()
    timings = {name: min(run[name] for run in runs) for name in HEADLINE}
    total = round(sum(timings.values()), 3) if repeats > 1 else round(
        loop_wall, 3
    )
    # the original 29-query set (rounds 1-3) — reported as a subtotal so
    # cross-round comparisons against the 30.1 s driver baseline stay
    # apples-to-apples while the HEADLINE keeps growing
    r1_subset = round(sum(timings[n] for n in R1_QUERIES), 3)
    r4_subset = round(sum(timings[n] for n in R4_QUERIES), 3)
    r5_subset = round(sum(timings[n] for n in R5_QUERIES), 3)
    # The full per-query dict outgrew the driver's 2000-char stdout tail
    # capture (round 6 lost its official record to truncation — VERDICT
    # r6 item 1). Stdout gets a compact line guaranteed well under that
    # limit: totals, the three frozen cross-round anchors, and only the
    # top-10 heaviest queries. The complete per-query detail goes to a
    # committed BENCH_detail_r{N}.json. N comes from
    # $SPARK_GRAFT_ROUND when set (explicit — ADVICE r7: re-running
    # bench AFTER the round's BENCH_r{N}.json is committed must not
    # mislabel the detail as r{N+1}); the glob inference (1 + highest
    # existing driver BENCH_r*.json) is only the fallback.
    import glob
    import re

    round_env = os.environ.get("SPARK_GRAFT_ROUND")
    if round_env and round_env.isdigit():
        n_round = int(round_env)
    else:
        rounds = [
            int(m.group(1))
            for p in glob.glob(os.path.join(os.path.dirname(__file__), "BENCH_r*.json"))
            if (m := re.match(r"BENCH_r(\d+)\.json$", os.path.basename(p)))
        ]
        n_round = (max(rounds) if rounds else 0) + 1
    detail_path = os.path.join(
        os.path.dirname(__file__),
        f"BENCH_detail_r{n_round:02d}.json",
    )
    # Run provenance (VERDICT r8 task 5): two machines' runs sharing a
    # filename made an apples-to-oranges +22% "regression" readable in
    # r8 — stamp WHO ran this (host/pid/load/sha/time) so every
    # round-over-round comparison can name whose run it compares.
    import platform
    import subprocess

    try:
        git_sha = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(__file__) or ".",
            timeout=10,
        ).stdout.strip()
    except Exception:
        git_sha = "unknown"
    # End-scan pairs with the pre-flight: a competitor that appeared
    # MID-run (the r9 failure mode) is caught here, and either scan
    # firing marks the artifact contaminated.
    end_scan = scan_contamination()
    # Host-steal gate (VERDICT r11 item 2): percent of CPU stolen by the
    # hypervisor across the TIMED loop. Above the threshold the run is
    # contaminated even with zero local competitors — exactly the r11
    # failure mode the /proc process scan could not see.
    steal_timed = _steal_pct(ticks_loop0, ticks_loop1)
    steal_total = _steal_pct(ticks_start, _cpu_ticks())
    max_steal = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_STEAL", "5.0"))
    if steal_timed is not None and steal_timed > max_steal:
        end_scan["reasons"].append(
            f"cpu steal {steal_timed:.1f}% > {max_steal}% over timed loop"
        )
        end_scan["contaminated"] = True
    contaminated = pre_scan["contaminated"] or end_scan["contaminated"]
    # "Sealed" = the builder ran this with an EXPLICIT
    # $SPARK_GRAFT_ROUND and a clean contamination record. The round
    # driver's end-of-round snapshot re-runs bench WITHOUT the env var
    # (round_env becomes "inferred:N") and has three times overwritten
    # the builder's BENCH_detail_r{N}.json after BASELINE.md was sealed
    # against it (r7 phantom regression, r9 interim drift, r10 snapshot
    # clobber — VERDICT r10 task 1). A sealed run is therefore ALSO
    # written to BENCH_detail_r{NN}_sealed.json, a name the driver never
    # writes, and tools/counts.py enforces prose-match against the
    # sealed artifact only.
    sealed = bool(round_env and round_env.isdigit()) and not contaminated
    provenance = {
        "host": platform.node(),
        "pid": os.getpid(),
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "loadavg_1m_at_end": round(os.getloadavg()[0], 2),
        "git_sha": git_sha,
        "unix_time": int(time.time()),
        "round_env": round_env or f"inferred:{n_round}",
        "sealed": sealed,
        "contaminated": contaminated,
        "contamination_pre": pre_scan,
        "contamination_end": end_scan,
        "steal_pct_timed_loop": steal_timed,
        "steal_pct_process": steal_total,
        "max_steal_pct": max_steal,
        "repeats": repeats,
    }
    detail = {
        "metric": "headline_queries_total_time",
        "value": total,
        "unit": "sec",
        "n_queries": len(HEADLINE),
        "value_r1_29q_subset": r1_subset,
        "value_r4_46q_subset": r4_subset,
        "value_r5_48q_subset": r5_subset,
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "provenance": provenance,
    }
    if repeats > 1:
        # min-of-N mode: keep every run's raw numbers so the min is
        # auditable (and the first pass — the driver-comparable one —
        # is never lost).
        detail["queries_by_run"] = runs
        detail["value_run1"] = round(sum(runs[0].values()), 3)
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1, sort_keys=True)
        fh.write("\n")
    if sealed:
        sealed_path = detail_path.replace(".json", "_sealed.json")
        with open(sealed_path, "w") as fh:
            json.dump(detail, fh, indent=1, sort_keys=True)
            fh.write("\n")
    top10 = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "n_queries": len(HEADLINE),
                "value_r1_29q_subset": r1_subset,
                "value_r4_46q_subset": r4_subset,
                "value_r5_48q_subset": r5_subset,
                "queries": top10,
                "queries_note": "top-10 heaviest; full dict in "
                + os.path.basename(detail_path),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "contaminated": contaminated,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
