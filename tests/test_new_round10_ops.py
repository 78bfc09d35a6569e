"""Round-10 operator properties — independent (pure-Python) references
for the new ops and the ADVICE r9 fixes, beyond their DuckDB oracle
gates:

- perplexity_filter_kn: KN ppl recomputed in Python on a constructed
  corpus (interpolated absolute-discount formula + the decimal
  rounding ladder); short docs unrated.
- perplexity_kn_vs_addone: cells partition the rated docs; gaps
  recount against the two registered gates.
- corpus_release_gate: admits the fixture corpus; refuses a corrupted
  release with the exact failed-check count; a single-character edit
  moves exactly its shard's fingerprint.
- shard_manifest_report wide-sum fix (ADVICE r9): >4k docs forced
  into ONE shard sums past 2^63 without wrapping or ANSI overflow.
- pps_systematic_sample stride clamp (ADVICE r9): a degenerate corpus
  with total weight < PPS_N selects every document (step=1 limit)
  instead of NULL-dividing to an empty sample.
"""

from __future__ import annotations

import hashlib
import math
import os
import tempfile
from decimal import ROUND_HALF_UP, Decimal

from deloton_solo_spark.catalog import load_table
from deloton_solo_spark.registry import all_queries

from .conftest import SF_DIR


def run(spark, name, sf=SF_DIR):
    return all_queries()[name].fn(spark, sf)


def _write_docs(spark, td, rows):
    """rows: (doc_id, text, lang, source) — n_chars derived."""
    docs = spark.createDataFrame(
        [(d, t, lang, src, len(t)) for d, t, lang, src in rows],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    docs.write.parquet(os.path.join(td, "documents.parquet"))


# ---- X278 Kneser-Ney perplexity filter -----------------------------------


def _kn_reference(texts: dict[int, str], d: float, ppl_max: float):
    """Pure-Python interpolated-KN bigram LM over the corpus, with the
    operator's decimal rounding ladder reproduced exactly."""
    pairs: dict[int, list[tuple[str, str]]] = {}
    big: dict[tuple[str, str], int] = {}
    for did, text in texts.items():
        toks = text.lower().split()
        ps = list(zip(toks, toks[1:]))
        pairs[did] = ps
        for p in ps:
            big[p] = big.get(p, 0) + 1
    c1: dict[str, int] = {}
    fert: dict[str, int] = {}
    nrev: dict[str, int] = {}
    for (w1, w2), c in big.items():
        c1[w1] = c1.get(w1, 0) + c
        fert[w1] = fert.get(w1, 0) + 1
        nrev[w2] = nrev.get(w2, 0) + 1
    t_types = len(big)
    out = {}
    for did, ps in pairs.items():
        if not ps:
            continue
        s = Decimal(0)
        for w1, w2 in ps:
            p = max(big[(w1, w2)] - d, 0.0) / c1[w1] + (
                (d * fert[w1]) / c1[w1]
            ) * (nrev[w2] / t_types)
            s += Decimal(str(-math.log(p))).quantize(
                Decimal("1e-8"), rounding=ROUND_HALF_UP
            )
        ppl = float(
            Decimal(str(math.exp(float(s) / len(ps)))).quantize(
                Decimal("1e-4"), rounding=ROUND_HALF_UP
            )
        )
        out[did] = (ppl, ppl <= ppl_max)
    return out


def test_kn_perplexity_pure_python(spark):
    from deloton_solo_spark.operators.corpus import KN_DISCOUNT, KN_PPL_MAX

    texts = {
        0: "a b a c a b",
        1: "a b b c",
        2: "x y x y x z",
        3: "c a b a",
    }
    with tempfile.TemporaryDirectory() as td:
        _write_docs(
            spark, td, [(d, t, "en", "s") for d, t in texts.items()]
        )
        got = {
            r["doc_id"]: (r["ppl"], r["keep"])
            for r in run(spark, "perplexity_filter_kn", td).collect()
        }
    assert got == _kn_reference(texts, KN_DISCOUNT, KN_PPL_MAX)


def test_kn_short_docs_unrated(spark):
    with tempfile.TemporaryDirectory() as td:
        _write_docs(
            spark,
            td,
            [(0, "only", "en", "s"), (1, "two tokens here", "en", "s")],
        )
        rated = {
            r["doc_id"]
            for r in run(spark, "perplexity_filter_kn", td).collect()
        }
    assert rated == {1}


def test_kn_matches_on_fixture_both_verdicts(spark):
    rows = run(spark, "perplexity_filter_kn").collect()
    keeps = {r["keep"] for r in rows}
    assert keeps == {True, False}, "KN_PPL_MAX must populate both verdicts"


# ---- X279 KN vs add-one disagreement report ------------------------------


def test_kn_vs_addone_cells_partition_rated_docs(spark):
    kn = {
        r["doc_id"]: (r["ppl"], r["keep"])
        for r in run(spark, "perplexity_filter_kn").collect()
    }
    ao = {
        r["doc_id"]: (r["ppl"], r["keep"])
        for r in run(spark, "perplexity_filter").collect()
    }
    assert set(kn) == set(ao)
    want: dict[tuple[bool, bool], list] = {}
    for did in kn:
        cell = (kn[did][1], ao[did][1])
        e = want.setdefault(cell, [0, Decimal(0)])
        e[0] += 1
        e[1] += Decimal(str(ao[did][0] - kn[did][0])).quantize(
            Decimal("1e-4"), rounding=ROUND_HALF_UP
        )
    report = run(spark, "perplexity_kn_vs_addone").collect()
    got = {
        (r["keep_kn"], r["keep_addone"]): (r["n_docs"], r["avg_ppl_gap"])
        for r in report
    }
    assert set(got) == set(want)
    for cell, (n, gsum) in want.items():
        assert got[cell][0] == n
        avg = float(
            Decimal(str(float(gsum) / n)).quantize(
                Decimal("1e-4"), rounding=ROUND_HALF_UP
            )
        )
        assert abs(got[cell][1] - avg) < 1e-9
    assert sum(n for n, _ in got.values()) == len(kn)


# ---- X280 corpus release gate --------------------------------------------


def test_release_gate_admits_fixture(spark):
    rows = {
        r["check_name"]: (r["metric"], r["passed"])
        for r in run(spark, "corpus_release_gate").collect()
    }
    assert set(rows) == {
        "staged_rows",
        "null_keys",
        "dup_keys",
        "empty_docs",
        "chars_contract",
        "declared_adds",
        "undeclared_drift",
        "missing_declared_drift",
        "release_admitted",
    }
    assert all(p for _, p in rows.values())
    assert rows["release_admitted"] == (0, True)
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert rows["staged_rows"][0] == n_docs


def test_release_gate_refuses_corrupted_release(spark):
    # a duplicated key and one n_chars lie → exactly dup_keys and
    # chars_contract fail; the manifest drift stays fully declared
    # (both corruptions survive the %17 filter into the synthetic
    # previous release identically, so no undeclared shard movement)
    rows = [
        (i, f"doc body {i} {'w ' * (i % 7)}", "en", "s")
        for i in range(1, 41)
        if i % 13 != 0 and i % 17 != 0
    ]
    rows.append((2, "doc body 2 ", "en", "s"))  # dup of doc_id 2
    with tempfile.TemporaryDirectory() as td:
        docs = spark.createDataFrame(
            [(d, t, lang, src, len(t)) for d, t, lang, src in rows]
            + [(41, "doc body 41 w w w w ", "en", "s", 999)],  # chars lie
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        )
        docs.write.parquet(os.path.join(td, "documents.parquet"))
        got = {
            r["check_name"]: (r["metric"], r["passed"])
            for r in run(spark, "corpus_release_gate", td).collect()
        }
    assert got["dup_keys"] == (1, False)
    assert got["chars_contract"] == (1, False)
    assert got["undeclared_drift"][1] is True
    assert got["release_admitted"] == (2, False)


def test_manifest_fp_moves_on_single_char_edit(spark):
    from deloton_solo_spark.operators.sinks import (
        MANIFEST_SHARDS,
        _manifest_frame,
    )

    docs = load_table(spark, SF_DIR, "documents")
    edited = docs.selectExpr(
        "doc_id",
        "CASE WHEN doc_id = 1 THEN text || '.' ELSE text END AS text",
        "n_chars",
    )
    base = {r["shard"]: r["content_fp"] for r in _manifest_frame(docs).collect()}
    moved = {
        r["shard"]: r["content_fp"] for r in _manifest_frame(edited).collect()
    }
    hit = int(hashlib.md5(b"m-1").hexdigest()[:4], 16) % MANIFEST_SHARDS
    assert base[hit] != moved[hit]
    assert all(base[s] == moved[s] for s in base if s != hit)


# ---- ADVICE r9: manifest wide-sum + PPS stride clamp ----------------------


def test_manifest_sum_survives_bigint_overflow(spark):
    """>4k docs in ONE shard push the fingerprint sum past 2^63 — the
    DECIMAL(38,0) pre-agg cast must produce the exact wide integer
    (the old BIGINT accumulator wrapped, or threw under ANSI)."""
    from deloton_solo_spark.operators.sinks import (
        MANIFEST_SHARDS,
        _manifest_frame,
    )

    target = 0
    ids = []
    i = 0
    while len(ids) < 4200:
        if (
            int(hashlib.md5(f"m-{i}".encode()).hexdigest()[:4], 16)
            % MANIFEST_SHARDS
            == target
        ):
            ids.append(i)
        i += 1
    docs = spark.createDataFrame(
        [(d, f"text of {d}", 9) for d in ids],
        "doc_id long, text string, n_chars long",
    )
    got = _manifest_frame(docs).collect()
    assert len(got) == 1 and got[0]["shard"] == target
    want = sum(
        int(hashlib.md5(f"text of {d}".encode()).hexdigest()[:13], 16)
        for d in ids
    )
    assert want > 2**63, "fixture must actually exceed BIGINT range"
    assert got[0]["content_fp"] == str(want)


def test_pps_degenerate_corpus_selects_all(spark):
    from deloton_solo_spark.operators.sampling import PPS_N

    rows = [(0, "abcde", "en", "s"), (1, "abc", "en", "s"), (2, "ab", "en", "s")]
    total = sum(len(t) for _, t, _, _ in rows)
    assert total < PPS_N
    with tempfile.TemporaryDirectory() as td:
        _write_docs(spark, td, rows)
        got = {
            r["doc_id"]: (r["weight"], r["n_hits"])
            for r in run(spark, "pps_systematic_sample", td).collect()
        }
    # step clamps to 1 → the grid hits every unit of weight: every doc
    # selected, with multiplicity equal to its weight
    assert got == {0: (5, 5), 1: (3, 3), 2: (2, 2)}
