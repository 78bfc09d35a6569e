"""Round-9 operator properties — independent (pure-Python) references
for the four new ops, beyond their DuckDB oracle gates:

- token_budget_waterfill: the mid-ladder water-level segment on a
  constructed skewed corpus (the sf fixtures exercise the i*=0
  branch; this pins the segment arithmetic).
- shard_stitch_pairs: genuinely SPLIT fixtures must pair tail→head;
  boilerplate openings hotter than STITCH_MAX_DF must be suppressed
  (the sf corpus yields zero rows by design).
- conformal_calibration_report: q_hat equals the independently
  recomputed k-th order statistic; coverage equals its recount.
- int8_quantization_audit: quantized levels recomputed in Python for
  a vector sample reproduce scale/cos/max-err after rounding.
"""

from __future__ import annotations

import os
import tempfile
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from deloton_solo_spark.catalog import load_table
from deloton_solo_spark.registry import all_queries

from .conftest import SF_DIR


def run(spark, name, sf=SF_DIR):
    return all_queries()[name].fn(spark, sf)


# ---- X271 water-filling -----------------------------------------------------


def test_waterfill_mid_ladder_segment(spark):
    # langs with 100 / 300 / 5000 tokens; budget = 2700 → the level
    # lands inside the top segment: c = 300 + (2700 - 700) = 2300
    rows = []
    did = 0
    for lang, n_tok in (("aa", 100), ("bb", 300), ("cc", 5000)):
        for chunk in (n_tok // 2, n_tok - n_tok // 2):
            text = " ".join(["w"] * chunk)
            rows.append((did, text, lang, "src", len(text)))
            did += 1
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )
    with tempfile.TemporaryDirectory() as td:
        docs.write.parquet(os.path.join(td, "documents.parquet"))
        got = {
            r["lang"]: (
                r["total_tokens"], r["alloc_tokens"], r["at_cap"],
                r["water_level"],
            )
            for r in run(spark, "token_budget_waterfill", td).collect()
        }
    assert got == {
        "aa": (100, 100, False, 2300),
        "bb": (300, 300, False, 2300),
        "cc": (5000, 2300, True, 2300),
    }


def test_waterfill_allocation_never_exceeds_budget(spark):
    rows = run(spark, "token_budget_waterfill").collect()
    total = sum(r["total_tokens"] for r in rows)
    alloc = sum(r["alloc_tokens"] for r in rows)
    assert alloc <= total // 2
    # and the level is maximal: one more token per capped lang busts it
    n_capped = sum(1 for r in rows if r["at_cap"])
    if n_capped:
        assert alloc + n_capped > total // 2


# ---- X272 shard stitch ------------------------------------------------------


def test_stitch_detects_split_documents(spark):
    from deloton_solo_spark.operators.dedup import STITCH_K

    toks = [f"t{i}" for i in range(50)]
    # A ends with the same 8 tokens B starts with (a true split);
    # C/D share nothing
    a = " ".join(toks[:30])
    b = " ".join(toks[30 - STITCH_K:])
    c = " ".join(f"c{i}" for i in range(40))
    d = " ".join(f"d{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, a, "en", "s", len(a)), (2, b, "en", "s", len(b)),
         (3, c, "en", "s", len(c)), (4, d, "en", "s", len(d))],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    with tempfile.TemporaryDirectory() as td:
        docs.write.parquet(os.path.join(td, "documents.parquet"))
        got = [
            (r["doc_a"], r["doc_b"])
            for r in run(spark, "shard_stitch_pairs", td).collect()
        ]
    assert got == [(1, 2)]


def test_stitch_hot_boundary_cap(spark):
    from deloton_solo_spark.operators.dedup import (
        STITCH_K,
        STITCH_MAX_DF,
    )

    # every doc OPENS with the same boilerplate and one doc's tail
    # matches it — the boundary hash has df > STITCH_MAX_DF and must
    # be suppressed, so zero pairs survive
    boiler = " ".join(f"b{i}" for i in range(STITCH_K))
    rows = []
    for i in range(STITCH_MAX_DF + 10):
        body = " ".join(f"u{i}x{j}" for j in range(2 * STITCH_K))
        rows.append((i, f"{boiler} {body}", "en", "s", 1))
    tail_doc = " ".join(f"z{j}" for j in range(2 * STITCH_K)) + " " + boiler
    rows.append((999, tail_doc, "en", "s", 1))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )
    with tempfile.TemporaryDirectory() as td:
        docs.write.parquet(os.path.join(td, "documents.parquet"))
        assert run(spark, "shard_stitch_pairs", td).count() == 0


def test_stitch_empty_on_fixture_corpus(spark):
    # declared semantics: the synthetic corpus has copies, not splits
    assert run(spark, "shard_stitch_pairs").count() == 0


# ---- X273 conformal ---------------------------------------------------------


def _r6(x: float) -> float:
    return float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    )


def test_conformal_q_and_coverage_recount(spark):
    from deloton_solo_spark.operators.analytics import (
        _CONF_CAL,
        _CONF_TRAIN,
        CONF_ALPHA_DEN,
        CONF_ALPHA_NUM,
    )

    rows = (
        load_table(spark, SF_DIR, "events")
        .select(
            "event_type",
            F.col("value").cast("decimal(18,2)").cast("double").alias("y"),
            "event_id",
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("conf-"), F.col("event_id").cast("string")
                    )
                ),
                1,
                1,
            ).alias("nib"),
        )
        .collect()
    )
    by_type: dict[str, dict[str, list]] = {}
    for r in rows:
        part = (
            "train"
            if r["nib"] in _CONF_TRAIN
            else "cal" if r["nib"] in _CONF_CAL else "test"
        )
        by_type.setdefault(r["event_type"], {"train": [], "cal": [],
                                             "test": []})[part].append(
            (r["event_id"], r["y"])
        )
    got = {
        r["event_type"]: r
        for r in run(spark, "conformal_calibration_report").collect()
    }
    for et, parts in by_type.items():
        mu = _r6(sum(y for _, y in parts["train"]) / len(parts["train"]))
        cal = sorted(
            (_r6(abs(y - mu)), eid) for eid, y in parts["cal"]
        )
        n_cal = len(cal)
        k = (
            (CONF_ALPHA_DEN - CONF_ALPHA_NUM) * (n_cal + 1)
            + CONF_ALPHA_DEN
            - 1
        ) // CONF_ALPHA_DEN
        q = cal[k - 1][0] if k <= n_cal else None
        test_scores = [_r6(abs(y - mu)) for _, y in parts["test"]]
        cov = _r6(
            sum(1 for s in test_scores if q is None or s <= q)
            / len(test_scores)
        )
        g = got[et]
        assert g["mu_hat"] == mu, et
        assert g["q_hat"] == q, et
        assert g["coverage"] == cov, et
        # the conformal guarantee itself, with finite-sample slack
        assert cov >= 1 - (CONF_ALPHA_NUM / CONF_ALPHA_DEN) - 0.08, (et, cov)


# ---- X274 int8 quantization -------------------------------------------------


def test_int8_quantization_recomputes(spark):
    from deloton_solo_spark.operators.similarity import INT8_LEVELS

    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in load_table(spark, SF_DIR, "embeddings")
        .limit(20)
        .collect()
    }
    got = {
        r["vec_id"]: r
        for r in run(spark, "int8_quantization_audit").collect()
    }
    for vid, v in vecs.items():
        amax = max(abs(x) for x in v)
        sc = amax / INT8_LEVELS
        q = [
            max(
                min(
                    float(
                        Decimal(repr(x / sc)).quantize(
                            Decimal("1"), ROUND_HALF_UP
                        )
                    ),
                    float(INT8_LEVELS),
                ),
                float(-INT8_LEVELS),
            )
            for x in v
        ]
        dq = [qi * sc for qi in q]
        dot = sum(a * b for a, b in zip(v, dq))
        import math

        cos = dot / (
            math.sqrt(sum(a * a for a in v))
            * math.sqrt(sum(b * b for b in dq))
        )
        g = got[vid]
        assert abs(g["scale"] - sc) < 5e-7, vid
        assert abs(g["cos_quantized"] - cos) < 5e-5, vid
        assert abs(
            g["max_abs_err"] - max(abs(a - b) for a, b in zip(v, dq))
        ) < 5e-7, vid
        # int8 on 64-dim unit-ish vectors must retain cosine ≈ 1
        assert g["cos_quantized"] >= 0.999, (vid, g["cos_quantized"])


# ---- X275 Good-Turing ---------------------------------------------------------


def test_good_turing_recounts_in_python(spark):
    import collections
    import re as _re

    docs = load_table(spark, SF_DIR, "documents").select(
        "lang", "text"
    ).collect()
    by_lang: dict[str, collections.Counter] = {}
    for r in docs:
        by_lang.setdefault(r["lang"], collections.Counter()).update(
            _re.findall(r"\S+", r["text"].lower())
        )
    got = {
        r["lang"]: r for r in run(spark, "good_turing_unseen_mass").collect()
    }
    for lang, cnt in by_lang.items():
        n = sum(cnt.values())
        n1 = sum(1 for c in cnt.values() if c == 1)
        n2 = sum(1 for c in cnt.values() if c == 2)
        g = got[lang]
        assert g["n_tokens"] == n and g["vocab"] == len(cnt)
        assert g["n_singletons"] == n1 and g["n_doubletons"] == n2
        assert abs(g["p_unseen"] - n1 / n) < 1e-6
        if n1:
            assert abs(g["r_star_1"] - 2 * n2 / n1) < 1e-6
        else:
            assert g["r_star_1"] is None


# ---- X276 PPS systematic ------------------------------------------------------


def test_pps_grid_selection_recounts(spark):
    from deloton_solo_spark.operators.sampling import PPS_N

    docs = sorted(
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "n_chars")
        .collect(),
        key=lambda r: r["doc_id"],
    )
    total = sum(r["n_chars"] for r in docs)
    step = total // PPS_N
    off = step // 2
    want = {}
    cum = 0
    for r in docs:
        lo, cum = cum, cum + r["n_chars"]
        hits = len(
            [k for k in range((cum // step) + 2) if lo <= off + k * step < cum]
        )
        if hits:
            want[r["doc_id"]] = (r["n_chars"], cum, hits)
    got = {
        r["doc_id"]: (r["weight"], r["cum_weight"], r["n_hits"])
        for r in run(spark, "pps_systematic_sample").collect()
    }
    assert got == want
    # PPS property: total multiplicity ≈ PPS_N (exact up to edge grid
    # points falling beyond the last interval)
    assert abs(sum(h for _, _, h in got.values()) - PPS_N) <= 1


# ---- X277 shard manifest ------------------------------------------------------


def test_manifest_is_order_and_partition_invariant(spark):
    base = run(spark, "shard_manifest_report")
    a = {tuple(r) for r in base.collect()}
    # recompute from a reshuffled, repartitioned copy of documents —
    # the manifest must be bit-identical (the exactly-once claim)
    import hashlib

    docs = load_table(spark, SF_DIR, "documents").collect()
    rows = sorted(docs, key=lambda r: hashlib.md5(str(r["doc_id"]).encode()).hexdigest())
    from deloton_solo_spark.operators.sinks import MANIFEST_SHARDS

    want: dict[int, list] = {}
    for r in rows:
        h_doc = int(hashlib.md5(f"m-{r['doc_id']}".encode()).hexdigest()[:4], 16) % MANIFEST_SHARDS
        h = int(hashlib.md5(r["text"].encode()).hexdigest()[:13], 16)
        e = want.setdefault(h_doc, [0, 0, 0])
        e[0] += 1
        e[1] += r["n_chars"]
        e[2] += h
    b = {
        (s, v[0], v[1], str(v[2])) for s, v in want.items()
    }
    assert a == b
