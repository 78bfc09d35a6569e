"""Multimodal decode feature gate: the deterministic stand-in is the
oracle-checked path in this container; where PIL exists the SAME
mapInPandas plumbing must run the real decoder on real bytes.
"""

from __future__ import annotations

import pytest

from deloton_solo_spark.operators.multimodal import (
    decode_image,
    real_decode_meta_batches,
)

PIL = pytest.importorskip("PIL", reason="no imaging library in container")


def _tiny_pngs() -> list[tuple[int, bytes, int, int]]:
    import io

    from PIL import Image

    out = []
    for doc_id, (w, h) in enumerate([(3, 2), (7, 5), (1, 1)]):
        img = Image.new("RGB", (w, h), (doc_id * 40, 0, 255 - doc_id * 40))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        out.append((doc_id, buf.getvalue(), w, h))
    return out


def test_decode_image_real_branch_roundtrips():
    for _doc_id, payload, w, h in _tiny_pngs():
        img = decode_image(payload)
        assert (img.width, img.height) == (w, h)


def test_real_decode_kernel_over_mapinpandas(spark):
    rows = [(d, p) for d, p, _w, _h in _tiny_pngs()]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r.doc_id: (r.width, r.height)
        for r in df.mapInPandas(
            real_decode_meta_batches,
            "doc_id long, n_bytes long, width long, height long",
        ).collect()
    }
    assert got == {0: (3, 2), 1: (7, 5), 2: (1, 1)}
