"""Round-11 operator properties (beyond the DuckDB oracle gate):

- bpe_decode_roundtrip: the round-trip claim itself — decode(encode(d))
  equals the normalized document for EVERY document at sf0.001 (the
  oracle only checks the flag is computed identically; this asserts it
  is TRUE), plus a constructed corpus where a merged token fires so the
  telescoping merge-inverse is exercised, and an empty/whitespace doc
  that must round-trip to ''.
"""

from __future__ import annotations

import os
import tempfile

from deloton_solo_spark.registry import all_queries

from .conftest import SF_DIR


def run(spark, name, sf=SF_DIR):
    return all_queries()[name].fn(spark, sf)


def test_roundtrip_holds_for_every_document(spark):
    rows = run(spark, "bpe_decode_roundtrip").collect()
    assert rows, "corpus is non-empty"
    bad = [r.doc_id for r in rows if not r.roundtrip_ok]
    assert bad == [], f"round-trip broke for docs {bad[:5]}"


def test_decode_inverts_merges_on_constructed_corpus(spark):
    """A corpus dominated by one bigram guarantees the trainer's first
    winner merges it, so the decoder must invert a real merge (and the
    whitespace normalization must be the only loss)."""
    with tempfile.TemporaryDirectory() as td:
        texts = [
            (1, "red bike  red bike red bike ride"),
            (2, "RED Bike red\tbike"),
            (3, "   "),
            (4, "solo"),
        ]
        spark.createDataFrame(
            [(d, t, "en", "unit", len(t)) for d, t in texts],
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        ).write.parquet(os.path.join(td, "documents.parquet"))
        out = {
            r.doc_id: r for r in run(spark, "bpe_decode_roundtrip", td).collect()
        }
    assert all(out[d].roundtrip_ok for d in (1, 2, 3, 4))
    assert out[1].decoded_text == "red bike red bike red bike ride"
    assert out[2].decoded_text == "red bike red bike"
    # "red bike" merges into ONE token at some training round, so the
    # token count must be below the whitespace count for doc 1
    assert out[1].n_tokens < 7
    assert out[3].decoded_text == "" and out[3].n_tokens == 0
    assert out[4].decoded_text == "solo" and out[4].n_tokens == 1
