"""Dataset-curation operators — the sampling / splitting / privacy
surface of a training-data pipeline (X20-X22).

Determinism discipline: every sampling decision is a pure function of
row content (md5 of a stable key), never of partition layout or RNG
state — so results are identical across cluster sizes, retries, and
engines, and the DuckDB oracle can state them exactly. (Spark's
``df.sample`` is seed-stable only for a fixed partitioning; content
hashing is the shape that survives repartitioning at 100 TB.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

SAMPLE_PER_STRATUM = 50
#: held-out fraction = 1/16: documents whose md5 first nibble is '0'.
TEST_NIBBLE = "0"


# X20 — stratified sampling ----------------------------------------------
@query(
    "stratified_sample",
    oracle=f"""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rn
      FROM documents
    ) WHERE rn <= {SAMPLE_PER_STRATUM}
    """,
    tags=("sampling", "extension"),
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X20: N docs per language stratum, chosen by content-hash order —
    a balanced evaluation sample that is stable across runs and
    cluster layouts. Per-stratum ranking window (bounded state); at
    100 TB, pre-filter with an approximate per-stratum hash threshold
    so the window only ranks ~N×safety rows per stratum."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")))
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= SAMPLE_PER_STRATUM)
        .drop("rn")
    )


# X21 — deterministic train/test split ------------------------------------
@query(
    "train_test_split",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                     = '{TEST_NIBBLE}'
                THEN 'test' ELSE 'train' END AS split
    FROM documents
    """,
    tags=("sampling", "extension"),
)
def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X21: deterministic train/test assignment (1/16 held out) by
    content hash of the document key. Pure narrow map — no shuffle, no
    RNG; the same document lands in the same split on every engine,
    run, and data layout (the property that prevents train/test
    leakage across pipeline versions)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    split = F.when(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
        == TEST_NIBBLE,
        F.lit("test"),
    ).otherwise(F.lit("train"))
    return docs.select("doc_id", split.alias("split"))


# X22 — PII pseudonymization ----------------------------------------------
@query(
    "pseudonymize_users",
    oracle="""
    SELECT md5('pepper-42' || CAST(c_custkey AS VARCHAR)) AS key_token,
           md5('pepper-42' || c_name) AS name_token,
           c_nationkey, c_mktsegment, c_acctbal
    FROM customer
    """,
    tags=("sampling", "privacy", "extension"),
)
def pseudonymize_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X22: irreversible PII pseudonymization — identifying columns
    replaced by peppered hashes (stable join keys, no plaintext),
    analytic columns kept. Narrow map over the scan; the pepper would
    be a secret at deploy time (constant here for oracle parity)."""
    c = load_table(spark, sf_dir, "customer")
    pepper = F.lit("pepper-42")
    return c.select(
        F.md5(F.concat(pepper, F.col("c_custkey").cast("string"))).alias(
            "key_token"
        ),
        F.md5(F.concat(pepper, F.col("c_name"))).alias("name_token"),
        "c_nationkey",
        "c_mktsegment",
        "c_acctbal",
    )
