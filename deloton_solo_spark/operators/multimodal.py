"""Multimodal columns: opaque binary payloads + typed metadata, with
decode / feature-extract plumbing over ``mapInPandas`` (Arrow batches).

Per the build brief: image/audio/video decode libraries are not in this
container, so the decode step is a clearly-marked stub
(``fake_decode_meta``) with a deterministic output — but the Spark-side
plumbing (binary column, schema, Arrow batch shape, partition-parallel
mapInPandas) is real and oracle-checked on the deterministic parts.

At 100 TB: binary payloads stay columnar (parquet binary), metadata is
extracted once near the scan, and the pandas stage is the Arrow fast
path — batches of thousands of rows per python call, never row-at-a-time.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

META_SCHEMA = "doc_id long, n_bytes long, width long, height long"


def decode_image(payload: bytes) -> object:
    """Real image decode — requires an image library not present in
    this environment."""
    raise NotImplementedError(
        "image decode requires an imaging library (PIL/cv2) not baked "
        "into this container; use fake_decode_meta for plumbing tests"
    )


def fake_decode_meta(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a decoder: derives (n_bytes, width,
    height) purely from the payload length. Replace with a real decoder
    where the codec libraries exist; the Spark plumbing is unchanged."""
    n = len(payload)
    return n, n % 640, (n * 7) % 480


def decode_meta_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: Arrow-batched 'decode' producing metadata."""
    for pdf in batches:
        meta = pdf["payload"].map(fake_decode_meta)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": meta.map(lambda m: m[0]),
                "width": meta.map(lambda m: m[1]),
                "height": meta.map(lambda m: m[2]),
            }
        )


@query(
    "multimodal_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           octet_length(encode(text)) % 640 AS width,
           (octet_length(encode(text)) * 7) % 480 AS height
    FROM documents
    """,
    tags=("multimodal", "extension"),
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline: text → binary payload (stand-in for an
    image/audio blob) → mapInPandas 'decode' extracting typed metadata.
    The fake decoder is deterministic in payload length, so the whole
    Arrow round-trip is oracle-checked."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return docs.mapInPandas(decode_meta_batches, META_SCHEMA)
