"""Semantic properties of the round-3 operators — beyond oracle parity.

Parity proves Spark == DuckDB on the same definition; these prove the
DEFINITION has the properties that make the operator useful (a CMS that
underestimated, or a mixture that missed its target rates, would still
"match its oracle").
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from deloton_solo_spark.registry import all_queries

from .conftest import SF_DIR


def run(spark, name):
    return all_queries()[name].fn(spark, SF_DIR)


def test_cms_never_underestimates(spark):
    # Count-Min property: est >= true count, always (min over rows of
    # counters that each include the token's own contribution).
    from deloton_solo_spark.catalog import load_table

    est = {r["tok"]: r["est_count"] for r in run(spark, "heavy_hitters_cms").collect()}
    true = {
        r["tok"]: r["c"]
        for r in (
            load_table(spark, SF_DIR, "documents")
            .select(
                F.explode(
                    F.regexp_extract_all(
                        F.lower(F.col("text")), F.lit(r"\S+"), 0
                    )
                ).alias("tok")
            )
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
    }
    assert est, "CMS returned no heavy hitters"
    for tok, e in est.items():
        assert e >= true[tok], (tok, e, true[tok])


def test_mixture_hits_target_rates(spark):
    # each source's achieved keep rate must sit near its configured
    # mix_rate (binomial bound, ~3 sigma at the per-source n)
    from deloton_solo_spark.catalog import load_table

    kept = (
        run(spark, "dataset_mixture")
        .groupBy("source", "mix_rate")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    totals = (
        load_table(spark, SF_DIR, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rows = kept.join(totals, "source").collect()
    assert rows
    for r in rows:
        p, n, k = r["mix_rate"], r["n"], r["k"]
        sigma = (p * (1 - p) * n) ** 0.5
        assert abs(k - p * n) <= max(3 * sigma, 3), r


def test_vocab_coverage_monotone_and_bounded(spark):
    rows = sorted(
        run(spark, "vocab_coverage").collect(), key=lambda r: r["rank"]
    )
    assert rows and rows[0]["rank"] == 1
    prev = 0.0
    for r in rows:
        assert 0.0 < r["cum_coverage"] <= 1.0 + 1e-9
        assert r["cum_coverage"] >= prev - 1e-9
        prev = r["cum_coverage"]
    # frequencies must be non-increasing down the ranks
    freqs = [r["freq"] for r in rows]
    assert freqs == sorted(freqs, reverse=True)


def test_gopher_flags_match_columns(spark):
    from deloton_solo_spark.operators.textstats import (
        _GQ_MAX_MWL,
        _GQ_MAX_SYMBOL_RATIO,
        _GQ_MIN_ALPHA_FRAC,
        _GQ_MIN_MWL,
        _GQ_MAX_WORDS,
        _GQ_MIN_WORDS,
    )

    for r in run(spark, "gopher_quality_filter").collect():
        expect = (
            _GQ_MIN_WORDS <= r["n_words"] <= _GQ_MAX_WORDS
            and _GQ_MIN_MWL <= r["mean_word_len"] <= _GQ_MAX_MWL
            and r["alpha_word_frac"] >= _GQ_MIN_ALPHA_FRAC
            and r["symbol_ratio"] <= _GQ_MAX_SYMBOL_RATIO
        )
        assert r["passes"] == expect, r


def test_salted_join_matches_plain_join(spark):
    # the salt machinery must be result-invisible: compare against the
    # straightforward unsalted plan
    from deloton_solo_spark.catalog import load_table

    salted = {
        (r["cohort"], r["n_types"], r["n_events"], r["avg_value"])
        for r in run(spark, "salted_skew_join").collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    cohort = (
        F.when(F.col("user_id") < 50, F.lit(-1))
        .otherwise(F.col("user_id"))
        .alias("cohort")
    )
    f = ev.select(cohort, "value")
    d = (
        ev.select(cohort, "event_type")
        .groupBy("cohort")
        .agg(F.count_distinct("event_type").alias("n_types"))
    )
    plain = {
        (r["cohort"], r["n_types"], r["n_events"], r["avg_value"])
        for r in f.join(d, "cohort")
        .groupBy("cohort", "n_types")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)"))
                / F.count(F.lit(1)),
                4,
            )
            .cast("double")
            .alias("avg_value"),
        )
        .collect()
    }
    assert salted == plain


def test_kmeans_assignment_is_nearest(spark):
    # spot-check: for a handful of vectors, the assigned centroid's
    # (rounded) cosine must be >= every other centroid's
    import math

    from deloton_solo_spark.catalog import load_table
    from deloton_solo_spark.functions.vectors import as_double
    from deloton_solo_spark.operators.similarity import _trained_cents

    d = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    cents = {r["cent_id"]: r["cv"] for r in _trained_cents(d).collect()}
    assign = {
        r["vec_id"]: r["cent_id"]
        for r in run(spark, "embedding_kmeans_assign").collect()
    }
    vecs = {r["vec_id"]: r["v"] for r in d.limit(25).collect()}

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(dot / (na * nb), 6)

    for vid, v in vecs.items():
        best = max(cents, key=lambda c: (cos(v, cents[c]), -c))
        assert assign[vid] == best, (vid, assign[vid], best)


# ---- round-4 operators --------------------------------------------------


def test_bpe_train_matches_pure_python_reference(spark):
    # the 4-round merge list must equal an independent imperative BPE
    # trainer over the same tokens (count -> winner by (n desc, pair
    # asc) -> left-to-right non-overlapping apply -> recount)
    import collections

    from deloton_solo_spark.catalog import load_table
    from deloton_solo_spark.operators.corpus import BPE_TRAIN_ROUNDS

    docs = [
        r["t"]
        for r in load_table(spark, SF_DIR, "documents")
        .select(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(r"\S+"), 0
            ).alias("t")
        )
        .collect()
    ]

    def one_round(corpus):
        counts = collections.Counter()
        for t in corpus:
            for a, b in zip(t, t[1:]):
                counts[(a, b)] += 1
        if not counts:
            return None, corpus
        (w1, w2), n = min(
            counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}")
        )
        mt = f"{w1} {w2}"
        out = []
        for t in corpus:
            acc = t[:1]
            for x in t[1:]:
                if acc and acc[-1] == w1 and x == w2:
                    acc[-1:] = [mt]
                else:
                    acc.append(x)
            out.append(acc)
        return (w1, w2, mt, n), out

    expected = []
    corpus = [list(t) for t in docs]
    for step in range(1, BPE_TRAIN_ROUNDS + 1):
        winner, corpus = one_round(corpus)
        assert winner is not None
        expected.append((step, *winner))

    got = [
        (r["step"], r["w1"], r["w2"], r["mt"], r["n_pair"])
        for r in run(spark, "bpe_train_merges").orderBy("step").collect()
    ]
    assert got == expected


def test_semantic_dedup_policy_is_consistent(spark):
    # keep == False exactly when a same-cell neighbor with smaller
    # vec_id is >= SEM_DUP_THRESHOLD similar — recomputed here in
    # numpy from the engine's OWN assignment, so this checks the pair
    # generation + keep policy independent of the SQL oracle
    import numpy as np

    from deloton_solo_spark.catalog import load_table
    from deloton_solo_spark.functions.vectors import as_double
    from deloton_solo_spark.operators.dedup import SEM_DUP_THRESHOLD
    from deloton_solo_spark.operators.similarity import (
        _assign_nearest,
        _trained_cents,
    )

    out = {r["vec_id"]: (r["cent_id"], r["keep"])
           for r in run(spark, "semantic_dedup").collect()}
    d = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    assign = _assign_nearest(d, _trained_cents(d)).collect()
    by_cell: dict[int, list] = {}
    for r in assign:
        by_cell.setdefault(r["cent_id"], []).append(
            (r["vec_id"], np.array(r["v"]))
        )
        assert out[r["vec_id"]][0] == r["cent_id"]
    for cell, members in by_cell.items():
        members.sort()
        for i, (vid, v) in enumerate(members):
            dup = False
            for pvid, pv in members[:i]:
                cs = round(
                    float(
                        np.dot(v, pv)
                        / (np.linalg.norm(v) * np.linalg.norm(pv))
                    ),
                    4,
                )
                if cs >= SEM_DUP_THRESHOLD:
                    dup = True
                    break
            assert out[vid][1] == (not dup), (vid, cell)


def test_classifier_score_calibrated_and_consistent(spark):
    # sigmoid output in [0,1]; verdict == (score >= 0.5); logit agrees
    # with recombining the reported features at the published weights
    rows = run(spark, "quality_classifier_score").collect()
    assert rows
    from decimal import ROUND_HALF_UP, Decimal

    from deloton_solo_spark.operators.textstats import (
        _CLS_BIAS,
        _CLS_W_ALPHA,
        _CLS_W_LEN,
        _CLS_W_PUNCT,
        _CLS_W_REP,
        _CLS_W_STOP,
        _CLS_W_SYM,
    )

    for r in rows:
        assert 0.0 <= r["score"] <= 1.0
        assert r["verdict"] == (r["score"] >= 0.5)
        z = (
            _CLS_BIAS
            + _CLS_W_LEN * r["f_len"]
            + _CLS_W_ALPHA * r["f_alpha"]
            + _CLS_W_STOP * r["f_stop"]
            + _CLS_W_SYM * r["f_sym"]
            + _CLS_W_REP * r["f_rep"]
            + _CLS_W_PUNCT * r["f_punct"]
        )
        z4 = float(
            Decimal(repr(z)).quantize(Decimal("0.0001"), ROUND_HALF_UP)
        )
        assert abs(r["logit"] - z4) < 5e-4, (r["logit"], z4)


def test_domain_cap_enforced_and_best_first(spark):
    from deloton_solo_spark.operators.sampling import DOMAIN_CAP

    rows = run(spark, "domain_cap_sample").collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    scored = {
        r["doc_id"]: r["score"]
        for r in run(spark, "quality_classifier_score").collect()
    }
    for src, grp in by_src.items():
        assert len(grp) <= DOMAIN_CAP
    # strongest check: per-source, the kept set IS the top-N by
    # (score desc, doc_id asc)
    from deloton_solo_spark.catalog import load_table

    src_of = {
        r["doc_id"]: r["source"]
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", "source")
        .collect()
    }
    per_src: dict[str, list] = {}
    for did, s in scored.items():
        per_src.setdefault(src_of[did], []).append((-s, did))
    for src, lst in per_src.items():
        want = {did for _, did in sorted(lst)[:DOMAIN_CAP]}
        got = {r["doc_id"] for r in by_src.get(src, [])}
        assert got == want, src


def test_bpe_encode_matches_pure_python_reference(spark):
    # the encoded corpus must equal applying the reference trainer's
    # merges (same imperative model as the bpe_train test) per document
    import collections

    from deloton_solo_spark.catalog import load_table
    from deloton_solo_spark.operators.corpus import BPE_TRAIN_ROUNDS

    rows = (
        load_table(spark, SF_DIR, "documents")
        .select(
            "doc_id",
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(r"\S+"), 0
            ).alias("t"),
        )
        .collect()
    )
    corpus = {r["doc_id"]: list(r["t"]) for r in rows}
    for _ in range(BPE_TRAIN_ROUNDS):
        counts = collections.Counter()
        for t in corpus.values():
            for a, b in zip(t, t[1:]):
                counts[(a, b)] += 1
        (w1, w2), _n = min(
            counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}")
        )
        mt = f"{w1} {w2}"
        for did, t in corpus.items():
            acc = t[:1]
            for x in t[1:]:
                if acc and acc[-1] == w1 and x == w2:
                    acc[-1:] = [mt]
                else:
                    acc.append(x)
            corpus[did] = acc
    expected = {
        (did, i + 1): tok
        for did, t in corpus.items()
        for i, tok in enumerate(t)
    }
    got = {
        (r["doc_id"], r["pos"]): r["token"]
        for r in run(spark, "bpe_encode_corpus").collect()
    }
    assert got == expected


def test_classifier_features_match_python_reference_on_random_text(spark):
    # hypothesis-style sweep (deterministic corpus of adversarial ASCII
    # texts): the engine's regex/HOF feature extraction must equal an
    # independent pure-Python implementation — catches Java-vs-Python
    # regex semantic drift in \S+, \b word boundaries, char classes
    import math
    import re
    from decimal import ROUND_HALF_UP, Decimal

    from deloton_solo_spark.operators.textstats import (
        _CLS_BIAS,
        _CLS_W_ALPHA,
        _CLS_W_LEN,
        _CLS_W_PUNCT,
        _CLS_W_REP,
        _CLS_W_STOP,
        _CLS_W_SYM,
        classifier_frame,
    )

    texts = [
        "",
        " ",
        "a",
        "the the the the",
        "x " * 200,
        "### ... #",
        "The quick brown fox is in the box and of to",
        "abc123 !!! ??? ;;; :::",
        "word " * 49,
        "word " * 50,
        "a b a b a b a b a b",
        "  leading and trailing  ",
        "UPPER lower MiXeD 42 #tag ...ellipsis...",
        "no-stopwords here just hyphen-ated to-kens",
        "\t tabs\tand\nnewlines \n mixed  spacing",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in classifier_frame(df).collect()}

    def r4(x: float) -> float:
        return float(
            Decimal(repr(x)).quantize(Decimal("0.0001"), ROUND_HALF_UP)
        )

    for i, text in enumerate(texts):
        low = text.lower()
        toks = re.findall(r"\S+", low)
        nw = len(toks)
        nw1 = max(nw, 1)
        n_alpha = sum(1 for w in toks if re.search(r"[a-z]", w))
        n_stop = len(re.findall(r"\b(?:the|and|of|is|in|to)\b", low))
        n_sym = len(re.findall(r"[#]|\.\.\.", text))
        n_punct = len(re.findall(r"[^A-Za-z0-9\s]", low))
        n_chars = len(text)
        tri = {
            " ".join(toks[j : j + 3]) for j in range(len(toks) - 2)
        }
        f = {
            "f_len": r4(min(nw / 100.0, 1.0)),
            "f_alpha": r4(n_alpha / nw1),
            "f_stop": r4(min(n_stop / nw1 * 5, 1.0)),
            "f_sym": r4(n_sym / nw1),
            "f_rep": r4(1.0 - len(tri) / (nw - 2)) if nw >= 3 else 0.0,
            "f_punct": r4(n_punct / max(n_chars, 1)),
        }
        r = got[i]
        for k, v in f.items():
            assert r[k] == v, (i, k, r[k], v, text)
        z = r4(
            _CLS_BIAS
            + _CLS_W_LEN * f["f_len"]
            + _CLS_W_ALPHA * f["f_alpha"]
            + _CLS_W_STOP * f["f_stop"]
            + _CLS_W_SYM * f["f_sym"]
            + _CLS_W_REP * f["f_rep"]
            + _CLS_W_PUNCT * f["f_punct"]
        )
        assert abs(r["logit"] - z) < 5e-4, (i, r["logit"], z)
        assert abs(r["score"] - r4(1.0 / (1.0 + math.exp(-r["logit"])))) < 2e-4


def test_results_are_shuffle_partition_independent(spark):
    # The determinism discipline claims results are a pure function of
    # data, never of partition layout (content-hash sampling, decimal
    # order-independent sums, full tiebreaks). Assert it: a sibling
    # session with a very different shuffle parallelism must produce
    # IDENTICAL rows for a representative slice of the registry —
    # prefix sums, sampling, dedup, rank windows, float aggregations.
    names = [
        "session_boundary_reset",
        "doc_pack_assign",
        "stratified_sample",
        "dataset_mixture",
        "exact_dedup",
        "chunk_dedup",
        "domain_cap_sample",
        "tfidf_top_terms",
        "unigram_surprisal",
        "agg_pricing_summary",
        "quality_classifier_score",
        "bpe_train_merges",
        "substring_dedup",
        "substring_dedup_rewrite",
        "vocab_rank_ids",
        "incremental_minhash_update",
        "perplexity_filter",
        "quality_gate_comparison",
        "corpus_snapshot_diff",
        "vocab_drift_report",
        "sorted_neighborhood_pairs",
        "snm_multipass_pairs",
        "weighted_sample_topk",
        "char_entropy_filter",
        "interval_overlap_join",
        "ewma_smoothing",
        "contrastive_negatives",
        "frequent_pair_mining",
        "inverted_index_postings",
        "skyline_pareto_orders",
        "doc_pack_rewrite",
        "join_size_estimate_report",
        "kmv_distinct_sketch",
        "trend_regression_per_type",
        "session_path_topk",
        "jackknife_mean_ci",
        "ab_experiment_report",
        "lag_feature_matrix",
        "rolling_median_bars",
        "psi_drift_report",
        "time_weighted_avg",
        "hour_of_week_seasonality",
        "chi2_independence_test",
        "ks_test_report",
        "markov_sequence_likelihood",
        "doc_chunk_overlap",
        "hybrid_search_rrf",
        "pq_distortion_report",
        "physical_plan_advisor",
        "seasonal_residual_anomaly",
        "cohort_ltv_curve",
        "funnel_by_segment",
        "shipping_sla_report",
        "rolling_correlation_bars",
        "churn_feature_table",
        "multimodal_audio_energy",
        "market_concentration_report",
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
        "tokenizer_fertility_report",
        "doclen_power_law_fit",
        "curriculum_bucket_assign",
        "winnowing_fingerprint_pairs",
        "mann_whitney_u_test",
        "event_order_inversion_report",
        "embedding_norm_audit",
        "batch_novelty_scores",
        "dedup_soft_weights",
        "forecast_revenue_change",
        "collocation_llr_bigrams",
        "classifier_confusion_report",
        "classifier_auc_report",
        "calibration_bins_report",
        "classifier_lift_table",
        "neyman_allocation_sample",
        "k_anonymity_audit",
        "data_contract_audit",
        "source_reputation_score",
        "embedding_dimension_profile",
        "ann_recall_report",
        "ab_srm_check",
        "revenue_yoy_report",
        "gdpr_erasure_cascade",
        "temperature_mixture_sample",
        "sentence_split_stats",
        "multimodal_scene_cut",
        "embedding_top_pc_power_iter",
        "rolling_active_users",
        "quantile_normalize_scores",
        "event_burstiness_report",
        "autocorrelation_report",
        "changepoint_cusum_report",
        "embedding_debias_toppc",
        "topn_with_other_rollup",
        "winnowing_span_rewrite",
        "customer_order_distribution",
        "prefix_filter_jaccard_pairs",
        "intra_doc_chunk_dedup",
        "phrase_search_positional",
        "incremental_agg_maintenance",
        "survival_hazard_curve",
        "hard_negative_mining",
        "heaps_law_curve",
        "mmr_diversified_topk",
        "join_skew_report",
        "salted_hot_key_agg",
        "near_dedup_minhash",
    ]
    other = spark.newSession()
    other.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        for name in names:
            fn = all_queries()[name].fn
            a = sorted(map(tuple, fn(spark, SF_DIR).collect()))
            b = sorted(map(tuple, fn(other, SF_DIR).collect()))
            assert a == b, f"{name}: differs across shuffle layouts"
    finally:
        other.conf.set("spark.sql.shuffle.partitions", "8")


def test_dedup_audit_consistent_with_family_operators(spark):
    # the audit's numbers must agree with the operators it audits:
    # exact-family docs minus groups = docs exact_dedup drops; pair
    # families count exactly the registered pair frames
    from deloton_solo_spark.catalog import load_table

    audit = {
        r["family"]: r for r in run(spark, "dedup_audit_report").collect()
    }
    total = load_table(spark, SF_DIR, "documents").count()
    kept = run(spark, "exact_dedup").count()
    ex = audit["exact"]
    assert ex["n_docs"] - ex["n_units"] == total - kept
    assert audit["ngram_jaccard"]["n_units"] == run(
        spark, "near_dedup_ngram_jaccard"
    ).count()
    assert audit["simhash"]["n_units"] == run(
        spark, "simhash_near_dup_pairs"
    ).count()
    assert audit["chunk"]["n_units"] == run(spark, "chunk_dedup").count()


def test_chunk_rewrite_token_accounting(spark):
    # clean_text must contain exactly len(tokens) - CHUNK_WORDS*n_dropped
    # tokens, and untouched docs must round-trip to the normalized
    # original text exactly
    import re

    from deloton_solo_spark.catalog import load_table
    from deloton_solo_spark.operators.corpus import CHUNK_WORDS

    orig = {
        r["doc_id"]: re.findall(r"\S+", (r["text"] or "").lower())
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .collect()
    }
    rows = run(spark, "chunk_dedup_rewrite").collect()
    assert len(rows) == len(orig)
    n_dropped_total = 0
    for r in rows:
        toks = orig[r["doc_id"]]
        clean = re.findall(r"\S+", r["clean_text"])
        assert len(clean) == len(toks) - CHUNK_WORDS * r["n_dropped"], r[
            "doc_id"
        ]
        if r["n_dropped"] == 0:
            assert clean == toks, r["doc_id"]
        n_dropped_total += r["n_dropped"]
    assert n_dropped_total > 0, "corpus has dups; rewrite must drop some"


def test_file_materializing_queries_are_rerun_deterministic(spark):
    # queries that write scratch files / checkpoints / run streaming
    # inside the query fn must return IDENTICAL rows when invoked twice
    # in one session (stable scratch dirs, overwrite semantics, fresh
    # checkpoints — no hidden state may leak between invocations)
    names = [
        "curated_partitioned_sink",
        "schema_evolution_read",
        "csv_source",
        "json_source",
        "orc_source",
        "corrupt_tolerant_scan",
        "jdbc_upsert_sink",
        "partition_pruned_scan",
        "streaming_dedup",
        "streaming_minute_bars",
        "bpe_train_merges",
        "semantic_dedup",
        "incremental_minhash_update",
        "incremental_substring_update",
        "substring_dedup_rewrite",
        "jdbc_partitioned_source",
        "binary_file_source",
        "small_file_compaction",
        "sorted_neighborhood_pairs",
        "snm_multipass_pairs",
        "zorder_layout",
        "skyline_pareto_orders",
        "doc_pack_rewrite",
        "streaming_lag_features",
        "text_lines_source",
        "wap_publish_sink",
        "ks_test_report",
        "bfs_reachability",
        "equi_depth_histogram",
        "market_concentration_report",
        "embedding_norm_audit",
        "streaming_inversion_monitor",
        "embedding_top_pc_power_iter",
        "quantile_normalize_scores",
        "embedding_debias_toppc",
        "streaming_cusum_monitor",
        # round-7: new localCheckpoint users (two-pass quantile helper;
        # winnowing fingerprint pin; distributed-rank rewrites; the
        # hll register/pair pins)
        "curriculum_bucket_assign",
        "winnowing_fingerprint_pairs",
        "winnowing_span_rewrite",
        "prefix_filter_jaccard_pairs",
        "ntile_customer_value",
        "customer_percentiles",
        "rfm_segmentation",
        "hll_set_algebra",
        "incremental_agg_maintenance",
    ]
    for name in names:
        fn = all_queries()[name].fn
        a = sorted(map(tuple, fn(spark, SF_DIR).collect()))
        b = sorted(map(tuple, fn(spark, SF_DIR).collect()))
        assert a == b, f"{name}: rerun changed the result"


def test_streaming_minute_bars_equals_batch(spark):
    # the streaming OHLC (min_by/max_by over windowed state) and the
    # batch OHLC (ranking windows) must agree bar for bar — the same
    # claim their shared oracle makes, asserted engine-to-engine
    a = sorted(
        map(tuple, run(spark, "streaming_minute_bars").collect())
    )
    b = sorted(map(tuple, run(spark, "resample_minute_bars").collect()))
    assert a == b


def test_boilerplate_strip_drops_all_occurrences(spark):
    # X125: (a) token accounting — clean_text has exactly
    # len(tokens) - CHUNK_WORDS*n_boiler tokens; (b) NO KEEPER — once a
    # chunk is boilerplate for a source, no document of that source
    # retains it (unlike chunk_dedup_rewrite's keep-first policy)
    import re
    from collections import defaultdict

    from deloton_solo_spark.catalog import load_table
    from deloton_solo_spark.operators.corpus import CHUNK_WORDS

    docs = {
        r["doc_id"]: (
            r["source"],
            re.findall(r"\S+", (r["text"] or "").lower()),
        )
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", "source", "text")
        .collect()
    }
    chunks_of = {
        d: [
            " ".join(t[i : i + CHUNK_WORDS])
            for i in range(0, len(t) - len(t) % CHUNK_WORDS, CHUNK_WORDS)
        ]
        for d, (_, t) in docs.items()
    }
    per_src = defaultdict(set)  # (source, chunk) -> docs holding it
    holders = defaultdict(set)
    for d, (src, _) in docs.items():
        for c in set(chunks_of[d]):
            holders[(src, c)].add(d)
    boiler = {k for k, v in holders.items() if len(v) >= 2}
    assert boiler, "corpus must contain within-source repeats"
    rows = {r["doc_id"]: r for r in run(spark, "boilerplate_strip").collect()}
    assert len(rows) == len(docs)
    total_boiler = 0
    for d, (src, toks) in docs.items():
        r = rows[d]
        clean = re.findall(r"\S+", r["clean_text"])
        assert len(clean) == len(toks) - CHUNK_WORDS * r["n_boiler"], d
        total_boiler += r["n_boiler"]
        # no boilerplate chunk of this source survives on its grid
        clean_grid = {
            " ".join(clean[i : i + CHUNK_WORDS])
            for i in range(
                0, len(clean) - len(clean) % CHUNK_WORDS, CHUNK_WORDS
            )
        }
        for c in chunks_of[d]:
            if (src, c) in boiler:
                assert r["n_boiler"] > 0, d
    assert total_boiler >= 2 * len(boiler)  # every occurrence dropped


def test_cdc_chunking_matches_python_and_survives_shift(spark):
    # X126: (a) the F.aggregate fold equals an independent imperative
    # chunker per document; (b) the selling point — prepending tokens
    # only perturbs chunks up to the first boundary, everything after
    # re-aligns (the fixed grid would shift every chunk)
    import hashlib
    import re

    from deloton_solo_spark.catalog import load_table
    from deloton_solo_spark.operators.corpus import CDC_BOUNDARY_HEX

    def boundary(tok):
        return hashlib.md5(tok.encode()).hexdigest()[0] in CDC_BOUNDARY_HEX

    def chunk(toks):
        out, cur = [], []
        for x in toks:
            cur.append(x)
            if boundary(x):
                out.append(" ".join(cur))
                cur = []
        if cur:
            out.append(" ".join(cur))
        return out

    docs = {
        r["doc_id"]: re.findall(r"\S+", (r["text"] or "").lower())
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .limit(40)
        .collect()
    }
    from pyspark.sql import functions as F
    from deloton_solo_spark.operators import corpus as C

    t = C._tokens()
    df = (
        load_table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id").isin(*docs))
        .select("doc_id", "text")
    )
    rows = (
        run(spark, "cdc_chunk_dedup").collect()
    )  # smoke: registered query still runs
    assert rows
    # per-doc fold parity via a local recompute of the same expression
    per_doc = {
        r["doc_id"]: r["cs"]
        for r in df.select(
            "doc_id",
            F.aggregate(
                t,
                F.struct(
                    F.array().cast("array<string>").alias("chunks"),
                    F.array().cast("array<string>").alias("cur"),
                ),
                lambda acc, x: F.when(
                    F.substring(F.md5(x), 1, 1).isin(*CDC_BOUNDARY_HEX),
                    F.struct(
                        F.concat(
                            acc["chunks"],
                            F.array(
                                F.array_join(
                                    F.concat(acc["cur"], F.array(x)), " "
                                )
                            ),
                        ).alias("chunks"),
                        F.array().cast("array<string>").alias("cur"),
                    ),
                ).otherwise(
                    F.struct(
                        acc["chunks"].alias("chunks"),
                        F.concat(acc["cur"], F.array(x)).alias("cur"),
                    )
                ),
                lambda acc: F.when(
                    F.size(acc["cur"]) > 0,
                    F.concat(
                        acc["chunks"],
                        F.array(F.array_join(acc["cur"], " ")),
                    ),
                ).otherwise(acc["chunks"]),
            ).alias("cs"),
        ).collect()
    }
    for d, toks in docs.items():
        assert per_doc[d] == chunk(toks), d
    # shift robustness on the longest sampled doc
    toks = max(docs.values(), key=len)
    base, shifted = chunk(toks), chunk(["zzzshift", "qqq"] + toks)
    # after the first boundary in the shifted stream, chunks re-align
    assert base[1:] == shifted[len(shifted) - len(base) + 1 :]


def test_compaction_layout(spark):
    # X128: after the run, the fragmented dir holds many files, the
    # compacted dir few — and compacted files carry DISJOINT sorted
    # doc_id ranges (the property that makes footer-stats pruning work)
    import glob
    import os

    from deloton_solo_spark.operators.sinks import (
        COMPACT_FRAG_FILES,
        COMPACT_TARGET_FILES,
    )
    from deloton_solo_spark.session import scratch_dir

    run(spark, "small_file_compaction").count()
    frag = glob.glob(os.path.join(scratch_dir("compact_frag"), "part-*"))
    comp = glob.glob(os.path.join(scratch_dir("compact_out"), "part-*"))
    assert len(frag) == COMPACT_FRAG_FILES
    assert 0 < len(comp) <= COMPACT_TARGET_FILES
    assert len(comp) < len(frag) // 8
    ranges = []
    for f in comp:
        r = (
            spark.read.parquet(f)
            .agg(F.min("doc_id"), F.max("doc_id"))
            .collect()[0]
        )
        ranges.append((r[0], r[1]))
    ranges.sort()
    for (lo1, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert lo1 <= hi1 < lo2, ranges  # disjoint, ordered spans


def test_snm_multipass_is_superset_of_single_pass(spark):
    # every verified pair the single (first-tokens) pass finds must
    # survive in the multi-pass union, and the union must attribute it
    # to >= 1 pass; any extra pairs must come from pass 2 only
    single = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in run(spark, "sorted_neighborhood_pairs").collect()
    }
    multi = {
        (r["doc_a"], r["doc_b"]): (r["n_passes"], r["jaccard"])
        for r in run(spark, "snm_multipass_pairs").collect()
    }
    assert set(single) <= set(multi)
    for pair, jac in single.items():
        assert multi[pair][1] == jac
    assert all(1 <= n <= 2 for n, _ in multi.values())


def test_zorder_layout_localizes_both_dims(spark):
    # X139: (a) zval file spans are disjoint+ordered (range-clustered);
    # (b) BOTH dimensions localize — the mean per-file normalized span
    # of each bucket axis stays well under 1.0 (a single-dim sort
    # pins one axis near 0 and leaves the other ~1.0 in every file);
    # (c) a box predicate on both axes prunes some files via footer
    # min/max alone
    import glob
    import os

    from deloton_solo_spark.operators.sinks import ZORDER_FILES
    from deloton_solo_spark.session import scratch_dir

    run(spark, "zorder_layout").count()
    files = sorted(
        glob.glob(os.path.join(scratch_dir("zorder_out"), "part-*"))
    )
    assert 0 < len(files) <= ZORDER_FILES
    stats = []
    for f in files:
        r = (
            spark.read.parquet(f)
            .agg(
                F.min("price_bucket"),
                F.max("price_bucket"),
                F.min("day_bucket"),
                F.max("day_bucket"),
                F.min("zval"),
                F.max("zval"),
            )
            .collect()[0]
        )
        stats.append(tuple(r))
    zr = sorted((s[4], s[5]) for s in stats)
    for (lo1, hi1), (lo2, _) in zip(zr, zr[1:]):
        assert lo1 <= hi1 < lo2, zr  # disjoint, ordered zval spans
    gp = (min(s[0] for s in stats), max(s[1] for s in stats))
    gd = (min(s[2] for s in stats), max(s[3] for s in stats))
    pspans = [(s[1] - s[0]) / max(gp[1] - gp[0], 1) for s in stats]
    dspans = [(s[3] - s[2]) / max(gd[1] - gd[0], 1) for s in stats]
    assert sum(pspans) / len(pspans) < 0.8, pspans
    assert sum(dspans) / len(dspans) < 0.8, dspans
    # box query: middle eighth of each axis — footer stats must rule
    # out at least a quarter of the files
    plo, phi = gp[0] + (gp[1] - gp[0]) * 7 // 16, gp[0] + (gp[1] - gp[0]) * 9 // 16
    dlo, dhi = gd[0] + (gd[1] - gd[0]) * 7 // 16, gd[0] + (gd[1] - gd[0]) * 9 // 16
    hit = [
        s
        for s in stats
        if s[0] <= phi and s[1] >= plo and s[2] <= dhi and s[3] >= dlo
    ]
    assert len(hit) <= 0.75 * len(files), (len(hit), len(files))


def test_streaming_ewma_equals_batch(spark):
    # the stateful recurrence kernel (last-15-bars deque per type) and
    # the batch lag-chain must agree bar for bar — the same claim the
    # shared oracle makes, asserted engine-to-engine
    a = sorted(map(tuple, run(spark, "streaming_ewma").collect()))
    b = sorted(map(tuple, run(spark, "ewma_smoothing").collect()))
    assert a == b


def test_skyline_is_exactly_the_undominated_set(spark):
    # X150: brute-force verification of the dominance semantics at
    # sf0.001 — (a) no returned order is strictly dominated by ANY
    # order, (b) every omitted order IS dominated (completeness).
    from deloton_solo_spark.catalog import load_table

    rows = [
        (r["o_orderkey"], r["o_totalprice"], r["o_orderdate"])
        for r in load_table(spark, SF_DIR, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .collect()
    ]
    sky = {r["o_orderkey"] for r in run(spark, "skyline_pareto_orders").collect()}
    assert sky

    def dominated(me):
        _, p, d = me
        return any(
            (p2 >= p and d2 >= d and (p2 > p or d2 > d))
            for _, p2, d2 in rows
        )

    for row in rows:
        if row[0] in sky:
            assert not dominated(row), row
        else:
            assert dominated(row), row


def test_bloom_filter_has_no_false_negatives(spark):
    # X147: a Bloom filter may lie positive, never negative — probe the
    # MEMBER set through the identical position arithmetic and assert
    # every member hits all K positions.
    import pyspark.sql.functions as F2

    from deloton_solo_spark.catalog import load_table
    from deloton_solo_spark.operators.analytics import BLOOM_K, BLOOM_M

    orders = load_table(spark, SF_DIR, "orders")
    members = orders.filter(
        F2.col("o_orderpriority") == "1-URGENT"
    ).select(F2.col("o_orderkey").alias("k"))

    def pos(df):
        return df.select(
            "k",
            F2.explode(F2.array(*[F2.lit(i) for i in range(BLOOM_K)])).alias("i"),
        ).select(
            "k",
            (
                F2.conv(
                    F2.substring(
                        F2.md5(
                            F2.concat(
                                F2.lit("b"),
                                F2.col("i").cast("string"),
                                F2.lit("-"),
                                F2.col("k").cast("string"),
                            )
                        ),
                        1,
                        12,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % BLOOM_M
            ).alias("pos"),
        )

    bits = pos(members).select("pos").distinct()
    misses = (
        pos(members)
        .join(bits, "pos", "left_anti")
        .count()
    )
    assert misses == 0
    # and the report's observed FPR is itself internally consistent
    rep = run(spark, "bloom_calibration_report").collect()[0]
    assert rep["fp_count"] <= rep["n_probes"]
    assert rep["bits_set"] <= min(rep["n_members"] * BLOOM_K, BLOOM_M)


def test_frequent_pairs_respect_support_bounds(spark):
    # X148: support(a,b) <= min(df_a, df_b) (a pair can't out-occur its
    # rarer member) and every reported pair meets the threshold.
    from deloton_solo_spark.catalog import load_table
    from deloton_solo_spark.operators.corpus import PAIR_MINSUP

    n_docs = load_table(spark, SF_DIR, "documents").count()
    got = run(spark, "frequent_pair_mining").collect()
    assert got, "corpus has co-occurring frequent tokens"
    for r in got:
        assert r["support"] <= min(r["df_a"], r["df_b"]), r
        assert r["support"] >= PAIR_MINSUP * n_docs, r


def test_pack_rewrite_consistent_with_assignment(spark):
    # X155: the materialized shards must agree with doc_pack_assign —
    # same doc membership per pack, token totals add up, and the packed
    # text tokenizes back to exactly total_tokens.
    import re

    assign = {}
    for r in run(spark, "doc_pack_assign").collect():
        assign.setdefault(r["pack_id"], []).append((r["doc_id"], r["n_tokens"]))
    packs = run(spark, "doc_pack_rewrite").collect()
    assert {p["pack_id"] for p in packs} == set(assign)
    for p in packs:
        docs = assign[p["pack_id"]]
        assert p["n_docs"] == len(docs)
        assert p["total_tokens"] == sum(n for _, n in docs)
        assert p["first_doc_id"] == min(d for d, _ in docs)
        assert p["last_doc_id"] == max(d for d, _ in docs)
        assert len(re.findall(r"\S+", p["packed_text"].lower())) == p[
            "total_tokens"
        ]


def test_contrastive_negatives_shape(spark):
    # X146: exactly NEG_PER_DOC negatives per anchor, never the anchor
    # itself, all ids inside the dense doc_id domain.
    from deloton_solo_spark.catalog import load_table
    from deloton_solo_spark.operators.sampling import NEG_PER_DOC

    n_docs = load_table(spark, SF_DIR, "documents").count()
    rows = run(spark, "contrastive_negatives").collect()
    assert len(rows) == n_docs * NEG_PER_DOC
    per = {}
    for r in rows:
        assert r["neg_id"] != r["doc_id"]
        assert 0 <= r["neg_id"] < n_docs
        per[r["doc_id"]] = per.get(r["doc_id"], 0) + 1
    assert set(per.values()) == {NEG_PER_DOC}


def test_streaming_lag_features_equals_batch(spark):
    # the row-emitting keyed-history kernel and the batch window must
    # agree feature for feature — the same claim their shared oracle
    # makes, asserted engine-to-engine
    a = sorted(map(tuple, run(spark, "streaming_lag_features").collect()))
    b = sorted(map(tuple, run(spark, "lag_feature_matrix").collect()))
    assert a == b


def test_overlap_chunks_cover_and_overlap(spark):
    # X177: (a) chunk starts stride exactly OVL_STRIDE and cover the
    # whole token range; (b) every chunk is the exact token slice its
    # (start, n) claims — verified against the re-tokenized document.
    import re

    from deloton_solo_spark.catalog import load_table
    from deloton_solo_spark.operators.textstats import (
        OVL_CHUNK_TOKENS,
        OVL_STRIDE,
    )

    docs = {
        r["doc_id"]: re.findall(r"\S+", (r["text"] or "").lower())
        for r in load_table(spark, SF_DIR, "documents").collect()
    }
    by_doc = {}
    for r in run(spark, "doc_chunk_overlap").collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        toks = docs[doc_id]
        rows.sort(key=lambda r: r["chunk_idx"])
        for i, r in enumerate(rows):
            assert r["start_tok"] == i * OVL_STRIDE
            body = toks[r["start_tok"] : r["start_tok"] + OVL_CHUNK_TOKENS]
            assert r["n_tokens"] == len(body)
            assert r["chunk_text"] == " ".join(body)
        # coverage: last chunk reaches the end of the document
        last = rows[-1]
        assert last["start_tok"] + last["n_tokens"] == len(toks)


def test_hybrid_rrf_consistent_with_legs(spark):
    # X176: a doc ranked #1 by BOTH legs must be the fused #1; every
    # fused score equals 1/(60+r_a) + 1/(60+r_b) for its leg ranks.
    from deloton_solo_spark.operators.corpus import RRF_K

    rows = run(spark, "hybrid_search_rrf").collect()
    assert rows
    for r in rows:
        expect = 0.0
        if r["bm25_rank"] is not None:
            expect += 1.0 / (RRF_K + r["bm25_rank"])
        if r["vec_rank"] is not None:
            expect += 1.0 / (RRF_K + r["vec_rank"])
        assert abs(r["rrf_score"] - expect) < 1e-9, r
    scores = [r["rrf_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


# round-8 second wave ------------------------------------------------------


def test_bootstrap_ci_brackets_raw_mean(spark):
    # Poisson-bootstrap properties: the percentile interval brackets
    # both the bootstrap centre and the raw mean (32 replicates of a
    # mean over thousands of docs concentrate tightly), and the SE is
    # positive and far below the interval width's order of magnitude.
    row = run(spark, "bootstrap_mean_ci").collect()[0]
    assert row["n_replicates"] == 32
    assert row["ci_lo"] < row["ci_hi"]
    assert row["ci_lo"] <= row["boot_mean"] <= row["ci_hi"]
    assert row["ci_lo"] <= row["raw_mean"] <= row["ci_hi"], (
        "raw mean outside the bootstrap CI — resampling is biased"
    )
    assert 0 < row["se_boot"] < (row["ci_hi"] - row["ci_lo"])


def test_bootstrap_poisson_weights_conserve_mass(spark):
    # Sum of Poisson(1) weights over (doc, replicate) concentrates at
    # n_docs per replicate: each replicate's resample size must land
    # within 10% of the corpus size (law of large numbers at n≈6k,
    # sd/n ≈ 1.3%) — a broken CDF ladder would shift every replicate.
    import math

    from deloton_solo_spark.catalog import load_table
    from deloton_solo_spark.operators.analytics import (
        BOOT_REPS,
        _BOOT_DENOM,
        _POIS_CDF,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    n = docs.count()
    e = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_REPS - 1))).alias("b"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("boot-"),
                        F.col("b").cast("string"),
                        F.lit("-"),
                        F.col("doc_id").cast("string"),
                    )
                ),
                1,
                7,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(_BOOT_DENOM)
    )
    w = F.when(u < F.lit(_POIS_CDF[0]), 0)
    for k in range(1, len(_POIS_CDF)):
        w = w.when(u < F.lit(_POIS_CDF[k]), k)
    w = w.otherwise(len(_POIS_CDF))
    sizes = [
        r["sw"]
        for r in e.withColumn("w", w)
        .groupBy("b")
        .agg(F.sum("w").alias("sw"))
        .collect()
    ]
    assert len(sizes) == BOOT_REPS
    for s in sizes:
        assert abs(s - n) <= max(5.0, 5.0 * math.sqrt(n)), (s, n)


def test_dp_noise_is_laplace_shaped_and_count_preserving(spark):
    # The noisy release must differ from the true counts (noise is
    # actually applied) but by a bounded Laplace magnitude: with b=1,
    # |noise| = |ln(2u')| <= ln(2^29) ≈ 20.1 given the 28-bit
    # half-offset uniform's support.
    import math

    rows = run(spark, "dp_noisy_counts").collect()
    assert rows
    max_mag = math.log(2.0 * 268435456.0)  # u' >= 0.5/2^28
    moved = 0
    for r in rows:
        d = abs(r["noisy_count"] - r["n_true"])
        assert d <= max_mag + 1e-9, (r["lang"], d)
        moved += d > 1e-12
    assert moved == len(rows), "every group must be perturbed"


def test_winsorized_mean_is_robust_and_bounded(spark):
    # Clipping at [p05, p95] must keep the winsorized mean inside the
    # cut band, clip ~5% per tail (interpolated percentiles: at most
    # 5% strictly outside each cut), and never move the mean past the
    # raw extremes.
    rows = run(spark, "winsorized_robust_stats").collect()
    assert rows
    for r in rows:
        assert r["n_clip_lo"] <= 0.05 * r["n_orders"] + 1
        assert r["n_clip_hi"] <= 0.05 * r["n_orders"] + 1
        assert r["n_clip_lo"] > 0 and r["n_clip_hi"] > 0


def test_kappa_is_chance_corrected(spark):
    # kappa must lie strictly between 0 (chance) and 1 (identity):
    # the two raters are correlated (both monotone in doc length) but
    # disagree on some docs; and p_observed > p_expected.
    r = run(spark, "rater_agreement_kappa").collect()[0]
    assert r["n"] == r["n11"] + r["n00"] + (r["na"] - r["n11"]) + (
        r["nb"] - r["n11"]
    ), "confusion cells must partition n"
    assert 0.0 < r["kappa"] < 1.0
    assert r["p_observed"] > r["p_expected"]


def test_fd_audit_verdicts_match_ground_truth(spark):
    rows = {r["fd"]: r for r in run(spark, "functional_dependency_audit").collect()}
    assert rows["nation.name->region"]["holds"] is True
    assert rows["nation.name->region"]["max_rhs_variants"] == 1
    assert rows["customer.mktsegment->nation"]["holds"] is False
    assert rows["orders.custkey->orderpriority"]["n_violating_lhs"] > 0


def test_interval_union_coverage_invariants(spark):
    # Union-of-intervals invariants: covered time never exceeds the
    # active span (coverage_ratio <= 1), islands never outnumber
    # events, and a user's covered time is at least one base interval.
    from deloton_solo_spark.operators.events import IUC_BASE_US

    rows = run(spark, "interval_union_coverage").collect()
    assert rows
    for r in rows:
        assert 0.0 < r["coverage_ratio"] <= 1.0, r
        assert 1 <= r["n_islands"] <= r["n_events"], r
        assert r["covered_us"] >= IUC_BASE_US, r


def test_interval_union_matches_serial_sweep(spark):
    # Cross-check the distributed sweep against a driver-side serial
    # interval merge for the 5 busiest users.
    from deloton_solo_spark.catalog import load_table
    from deloton_solo_spark.functions.epoch import epoch_us
    from deloton_solo_spark.operators.events import IUC_BASE_US

    got = {
        r["user_id"]: (r["n_islands"], r["covered_us"])
        for r in run(spark, "interval_union_coverage").collect()
    }
    busiest = sorted(got, key=lambda u: -got[u][0])[:5]
    iv = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("user_id").isin([int(u) for u in busiest]))
        .select(
            "user_id",
            epoch_us("ts").alias("s"),
            (
                epoch_us("ts")
                + F.lit(IUC_BASE_US)
                + F.floor(
                    F.greatest(F.col("value"), F.lit(0.0)) * 1000000.0
                ).cast("bigint")
            ).alias("e"),
        )
        .collect()
    )
    by_user: dict[int, list[tuple[int, int]]] = {}
    for r in iv:
        by_user.setdefault(r["user_id"], []).append((r["s"], r["e"]))
    for u, spans in by_user.items():
        spans.sort()
        islands, cur_s, cur_e = [], None, None
        for s, e in spans:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    islands.append((cur_s, cur_e))
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        islands.append((cur_s, cur_e))
        covered = sum(e - s for s, e in islands)
        assert got[u] == (len(islands), covered), u


def test_weighted_median_is_the_half_mass_point(spark):
    # Definition check against a driver-side computation per flag.
    from deloton_solo_spark.catalog import load_table

    got = {
        r["l_returnflag"]: (r["total_weight"], r["weighted_median"])
        for r in run(spark, "weighted_median_price").collect()
    }
    rows = (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_returnflag", "l_extendedprice", "l_quantity")
        .collect()
    )
    by_flag: dict[str, list[tuple[float, int]]] = {}
    for r in rows:
        by_flag.setdefault(r["l_returnflag"], []).append(
            (r["l_extendedprice"], int(r["l_quantity"]))
        )
    for flag, pairs in by_flag.items():
        pairs.sort()
        total = sum(w for _, w in pairs)
        cum, med = 0, None
        for p, w in pairs:
            cum += w
            if 2 * cum >= total:
                med = p
                break
        assert got[flag] == (total, med), flag


def test_sssp_distances_are_minimal_and_monotone(spark):
    # Bellman-Ford invariants: sources at 0; every non-source distance
    # equals min over in-edges of (dist[src] + w) for edges whose src
    # was settled a round earlier (spot-check: triangle inequality on a
    # sample of edges — dist[dst] <= dist[src] + w whenever both ends
    # are in the table and a further relaxation round would not shrink
    # anything reached well inside the round budget).
    from deloton_solo_spark.catalog import load_table
    import pyspark.sql.functions as FF

    dist = run(spark, "cheapest_supply_path")
    d = {r["node"]: r["dist_cents"] for r in dist.collect()}
    assert any(v == 0 for v in d.values()), "sources must sit at 0"
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice"
    )
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey"
    )
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey", "l_suppkey")
        .agg(
            FF.min(
                FF.floor(FF.col("l_extendedprice") * 100).cast("bigint")
            ).alias("w")
        )
        .limit(2000)
        .collect()
    )
    # K-round Bellman-Ford computes EXACT shortest paths over <= K
    # edges: for customers adjacent to a seed supplier the one-edge
    # distance min_w(C, seed) must be hit exactly (longer paths can
    # only add positive cents).
    from deloton_solo_spark.catalog import load_table as lt

    supp = lt(spark, SF_DIR, "supplier").select("s_suppkey", "s_nationkey")
    mn = min(r["s_nationkey"] for r in supp.collect())
    seeds = {
        f"S{r['s_suppkey']}"
        for r in supp.collect()
        if r["s_nationkey"] == mn
    }
    assert all(d[s] == 0 for s in seeds if s in d)
    one_hop: dict[str, int] = {}
    for r in pairs:
        c, s, w = f"C{r['o_custkey']}", f"S{r['l_suppkey']}", r["w"]
        if s in seeds:
            one_hop[c] = min(one_hop.get(c, w), w)
    checked = 0
    for c, w in one_hop.items():
        assert c in d and d[c] <= w, (c, w, d.get(c))
        checked += 1
    assert checked > 0


def test_temporal_split_embargo_is_leakage_safe(spark):
    from deloton_solo_spark.operators.sampling import EMBARGO_US, SPLIT_FRAC

    rows = {r["split"]: r for r in run(spark, "temporal_split_embargo").collect()}
    assert set(rows) == {"train", "embargo", "test"}
    # time ordering with a full embargo gap between train and test
    assert rows["train"]["t_max_us"] < rows["embargo"]["t_min_us"]
    assert rows["test"]["t_min_us"] - rows["train"]["t_max_us"] >= EMBARGO_US
    # the split fraction lands where asked (interpolated cut): train
    # holds ~70% of events
    n = sum(r["n_events"] for r in rows.values())
    assert abs(rows["train"]["n_events"] / n - SPLIT_FRAC) < 0.02


def test_label_propagation_spreads_and_respects_seeds(spark):
    from deloton_solo_spark.operators.similarity import LP_SEED_MOD

    rows = run(spark, "label_propagation_audit").collect()
    assert rows
    tot_nodes = sum(r["n_nodes"] for r in rows)
    tot_seeds = sum(r["n_seeds"] for r in rows)
    tot_prop = sum(r["n_propagated"] for r in rows)
    # seeds are exactly the vec_id % MOD == 0 cohort
    assert abs(tot_seeds - tot_nodes / LP_SEED_MOD) <= len(rows) * LP_SEED_MOD
    # propagation actually reaches unlabeled nodes, and never counts
    # more correct than propagated
    assert tot_prop > 0
    for r in rows:
        assert 0 <= r["n_correct"] <= r["n_propagated"], r
        if r["n_propagated"]:
            assert r["accuracy"] is not None
    # the synthetic labels are geometry-RANDOM (measured: ~9% kNN
    # neighbor label agreement = chance for 10 classes), so the audit
    # must report chance-level accuracy here — a reading far ABOVE
    # chance would mean the propagation is leaking ground truth
    acc = sum(r["n_correct"] for r in rows) / tot_prop
    assert 0.0 <= acc < 3.0 / len(rows), acc
    # propagation coverage: 3 rounds over a connected-ish kNN graph
    # must reach most non-seed nodes
    assert tot_prop > 0.5 * (tot_nodes - tot_seeds)


def test_naive_bayes_beats_chance_and_partitions_heldout(spark):
    from deloton_solo_spark.catalog import load_table
    from deloton_solo_spark.operators.textstats import NB_HOLD_MOD

    rows = run(spark, "naive_bayes_lang_confusion").collect()
    assert rows
    n_held = (
        load_table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") % NB_HOLD_MOD == 0)
        .count()
    )
    # the confusion matrix partitions the held-out fold exactly
    assert sum(r["n_docs"] for r in rows) == n_held
    # the synthetic lang labels are nearly text-independent (the
    # rule heuristic lang_id scores ~0.29 by predicting 'en' for
    # everything); the trained NB must still beat 5-class chance
    # (0.20) — measured 0.33-0.36 across SFs
    correct = sum(r["n_docs"] for r in rows if r["true_lang"] == r["pred_lang"])
    assert correct / n_held > 0.26, correct / n_held


def test_clamped_balance_closed_form_equals_sequential_fold(spark):
    # The reflection closed form (two cumulative windows) must equal
    # the literal sequential recursion bal = max(0, bal + delta) —
    # folded in Python over each user's time-ordered stream.
    from deloton_solo_spark.catalog import load_table
    from deloton_solo_spark.operators.events import CBW_DRAIN

    got = {
        r["user_id"]: (
            r["n_events"],
            r["final_balance"],
            r["peak_balance"],
            r["n_stockouts"],
        )
        for r in run(spark, "clamped_balance_walk").collect()
    }
    rows = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    streams: dict[int, list] = {}
    for r in rows:
        import math

        streams.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], int(math.floor(r["value"])) - CBW_DRAIN)
        )
    for uid, evs in streams.items():
        evs.sort(key=lambda x: (x[0], x[1]))
        bal, peak, stockouts = 0, 0, 0
        for _, _, delta in evs:
            nxt = bal + delta
            if nxt < 0:
                stockouts += 1
                nxt = 0
            bal = nxt
            peak = max(peak, bal)
        assert got[uid] == (len(evs), bal, peak, stockouts), uid


def test_doc_shuffle_shards_are_balanced_and_source_mixed(spark):
    from deloton_solo_spark.catalog import load_table
    from deloton_solo_spark.operators.sampling import N_SHARDS

    rows = run(spark, "doc_shuffle_index").collect()
    assert len(rows) == N_SHARDS
    n_total = sum(r["n_docs"] for r in rows)
    sizes = [r["n_docs"] for r in rows]
    # round-robin deal: shard sizes differ by at most 1
    assert max(sizes) - min(sizes) <= 1
    # indices partition 1..n
    assert min(r["first_index"] for r in rows) == 1
    assert max(r["last_index"] for r in rows) == n_total
    # hash order mixes sources: shard 0's source mix must contain
    # every source (a block split of an unshuffled corpus would not)
    n_sources = (
        load_table(spark, SF_DIR, "documents").select("source").distinct().count()
    )
    from deloton_solo_spark.functions.windows import distributed_row_number
    from deloton_solo_spark.operators.sampling import N_SHARDS as K

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id",
        "source",
        F.md5(F.concat(F.lit("shuf-"), F.col("doc_id").cast("string"))).alias("h"),
    )
    ranked = distributed_row_number(docs, [F.col("h"), F.col("doc_id")], "rn")
    shard0 = ranked.filter(((F.col("rn") - 1) % K) == 0)
    # ~31 draws over 20 sources: expect ~16 distinct (coupon
    # collector); a BLOCK split of the source-ordered corpus would
    # give 1-2 — well over half proves the permutation mixes
    assert shard0.select("source").distinct().count() > n_sources / 2


def test_bh_fdr_is_step_up_consistent(spark):
    import math

    from deloton_solo_spark.operators.analytics import BH_Q

    rows = sorted(
        run(spark, "bh_fdr_mean_shift").collect(), key=lambda r: r["p_rank"]
    )
    assert rows
    m = len(rows)
    # p sorted by rank; thresholds are q*i/m; rejection = step-up rule
    ks = [r["p_rank"] for r in rows if r["p"] <= BH_Q * r["p_rank"] / m]
    k = max(ks) if ks else 0
    for r in rows:
        assert r["rejected"] == (r["p_rank"] <= k), r
        assert 0.0 <= r["p"] <= 1.0 + 1e-9
        # p must match the two-sided normal tail of z (A&S approx is
        # good to ~1.5e-7, our rounding is 1e-6)
        exact = 2.0 * 0.5 * math.erfc(abs(r["z"]) / math.sqrt(2.0))
        assert abs(r["p"] - exact) < 5e-6, (r["p"], exact)


def test_theil_sen_recovers_a_clean_linear_trend(spark):
    # On synthetic clean data y = 3t + noiseless, the sampled-pairs
    # median slope must be exactly 3 per hour.
    from deloton_solo_spark.operators.analytics import TS_LAGS

    rows = spark.createDataFrame(
        [(i, "t", f"2024-01-01 00:{i:02d}:00", 3.0 * i / 60.0) for i in range(50)],
        "event_id bigint, event_type string, ts_s string, value double",
    ).select(
        "event_id",
        "event_type",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "value",
    )
    import deloton_solo_spark.operators.analytics as A
    from deloton_solo_spark.functions.epoch import epoch_us

    w = __import__("pyspark.sql", fromlist=["Window"]).Window.partitionBy(
        "event_type"
    ).orderBy("ts", "event_id")
    idx = rows.withColumn("i", F.row_number().over(w)).select(
        "event_type", epoch_us("ts").alias("tu"),
        F.col("value").alias("y"), "i",
    )
    a = idx.select(
        "event_type", F.col("i").alias("ia"),
        F.col("tu").alias("ta"), F.col("y").alias("ya"),
    )
    slopes = []
    for g in TS_LAGS:
        b = idx.select(
            "event_type", (F.col("i") - g).alias("ia"),
            F.col("tu").alias("tb"), F.col("y").alias("yb"),
        )
        slopes += (
            a.join(b, ["event_type", "ia"])
            .filter(F.col("tb") > F.col("ta"))
            .select(
                (
                    (F.col("yb") - F.col("ya"))
                    / ((F.col("tb") - F.col("ta")) / 3600000000.0)
                ).alias("s")
            )
            .collect()
        )
    vals = sorted(r["s"] for r in slopes)
    med = vals[len(vals) // 2]
    assert abs(med - 3.0) < 1e-9, med


def test_theil_sen_registered_output_is_sane(spark):
    rows = run(spark, "theil_sen_trend").collect()
    assert rows
    for r in rows:
        assert r["n_pairs"] > 0
        assert r["sen_slope"] is not None


def test_cuped_reduces_variance_when_periods_correlate(spark):
    rows = {r["arm"]: r for r in run(spark, "cuped_variance_reduction").collect()}
    assert set(rows) == {"treatment", "control"}
    for r in rows.values():
        assert r["n"] > 0 and r["var_y"] > 0
        # CUPED with the pooled optimal theta can never increase
        # POOLED variance; a single arm may wobble up by the cross-arm
        # theta mismatch, which shrinks as ~1/sqrt(n) (at sf0.001 an
        # arm holds only ~8 users)
        assert r["var_y_cuped"] <= r["var_y"] * (1 + 4 / r["n"] ** 0.5), r
    # per-user activity is persistent in the synthetic stream, so the
    # adjustment must actually bite somewhere
    assert any(
        r["var_y_cuped"] < r["var_y"] * 0.999 for r in rows.values()
    ), rows


def test_power_analysis_mde_scales_inversely_with_sqrt_n(spark):
    import math

    rows = run(spark, "power_analysis_report").collect()
    assert rows
    for r in rows:
        # definition check: mde = (z_a/2 + z_b) * sd * sqrt(4/n)
        expect = (
            (1.959963984540054 + 0.8416212335729143)
            * r["sd_y"]
            * math.sqrt(4.0 / r["n_units"])
        )
        assert abs(r["mde_abs"] - expect) < 1e-3, (r["mde_abs"], expect)
        assert r["mde_rel"] > 0


def test_two_proportion_ztest_matches_scipy_free_reference(spark):
    import math

    r = run(spark, "two_proportion_ztest").collect()[0]
    nt, ct, nc, cc = (
        r["n_treatment"],
        r["conv_treatment"],
        r["n_control"],
        r["conv_control"],
    )
    assert 0 < ct < nt and 0 < cc < nc, "both outcomes must be populated"
    pt, pc = ct / nt, cc / nc
    pp = (ct + cc) / (nt + nc)
    z = (pt - pc) / math.sqrt(pp * (1 - pp) * (1 / nt + 1 / nc))
    assert abs(r["z"] - z) < 1e-5
    p = math.erfc(abs(z) / math.sqrt(2.0))
    assert abs(r["p_value"] - p) < 5e-6
    # hash randomization on a homogeneous population: no real effect,
    # so the test must NOT reject at alpha=0.001 (a z beyond 3.3 here
    # would mean the arm hash correlates with behavior)
    assert abs(r["z"]) < 3.3
