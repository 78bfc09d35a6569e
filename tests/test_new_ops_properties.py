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
