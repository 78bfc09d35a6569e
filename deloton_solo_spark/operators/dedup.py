"""Deduplication operators over ``documents`` — driver-mandated
extension surface (SURVEY.md §2.8 X1/X2 + the training-data-pipeline
brief): exact dedup, n-gram-Jaccard near-dup, MinHash-LSH near-dup,
SimHash fingerprints, and embedding-cosine near-dup.

Scale design (100 TB):
- exact: hash-groupBy on a digest of the text (shuffle on 16-byte key,
  never on the document body).
- ngram-jaccard: shingle-inverted-index self-join — the exact-verify
  stage you run *after* LSH blocking at scale; here it doubles as the
  oracle-checkable ground truth.
- minhash-LSH: the scale path (candidate pairs ∝ collisions, not n²),
  via MLlib MinHashLSH with a fixed seed.
- simhash: 60-bit fingerprint; near-dup candidates = small hamming
  distance; fingerprinting itself is a narrow map + one groupBy.
- embedding cosine: label-blocked pair join (stand-in for LSH/IVF
  bucketing) + exact cosine in Spark SQL higher-order functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.vectors import as_double, cosine, cosine_oracle_sql
from ..registry import query

JACCARD_THRESHOLD = 0.6
COSINE_THRESHOLD = 0.30


def _tokens() -> F.Column:
    """Lowercased whitespace tokens of ``text`` (column API — immune to
    SQL string-literal backslash mangling)."""
    return F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"\S+"), 0)


def _with_shingles(df: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, sh): distinct word n-gram shingles per document; docs
    with < n tokens are dropped.

    Plan-shape care (measured at sf0.1): tokenize into a materialized
    column first and filter on token count *between* the two projections
    — a post-hoc ``filter(size(sh) > 0)`` gets predicate-pushed below
    the projection with the whole shingle expression inlined, making
    Catalyst re-run the regex ~6× per row (40 s → 4 s fix). The filter
    also guarantees ``sequence()`` never goes descending."""
    toks = F.col("__toks")
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
            ),
        )
    )
    # Repartition the raw text BEFORE the expensive tokenize/shingle
    # projection: a single-file parquet scan is one input partition, so
    # without this the whole per-row compute runs on one core.
    # Unconditional: probing .rdd.getNumPartitions() under AQE would
    # execute the plan just to ask. (At cluster scale the scan already
    # has many splits and AQE coalesces the extra shuffle.)
    spread = df.select("doc_id", "text").repartition(
        df.sparkSession.sparkContext.defaultParallelism
    )
    out = (
        spread.select("doc_id", _tokens().alias("__toks"))
        .filter(F.size(toks) >= n)
        .select("doc_id", sh.alias("sh"))
    )
    # Materialization barrier. Without it, downstream explode() inlines
    # the transform into the Generate and codegen re-evaluates the whole
    # shingle expression PER EMITTED ELEMENT (measured ~10 s vs ~0.4 s at
    # sf0.1); the self-joins downstream would also recompute the lineage
    # per side. At cluster scale: persist()/write the shingle index.
    return out.localCheckpoint()

# X1 ----------------------------------------------------------------------
@query(
    "exact_dedup",
    oracle="""
    SELECT doc_id, lang, source, n_chars FROM (
      SELECT doc_id, lang, source, n_chars,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn = 1
    """,
    tags=("dedup", "extension"),
)
def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1: exact duplicate removal, deterministic keep-lowest-doc_id.
    Grouping key is md5(text) so the shuffle moves 16-byte digests, not
    document bodies."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    return (
        docs.select(
            "doc_id", "lang", "source", "n_chars", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# X2a — exact n-gram Jaccard (oracle-checkable ground truth) -------------
_SHINGLES_SQL = """
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, len(regexp_extract_all(lower(text), '\\S+')) - 1),
               i -> regexp_extract_all(lower(text), '\\S+')[i] || ' ' ||
                    regexp_extract_all(lower(text), '\\S+')[i+1] || ' ' ||
                    regexp_extract_all(lower(text), '\\S+')[i+2])) AS sh
      FROM documents
      WHERE len(regexp_extract_all(lower(text), '\\S+')) >= 3
"""


@query(
    "near_dedup_ngram_jaccard",
    oracle=f"""
    WITH t AS ({_SHINGLES_SQL}),
    e AS (SELECT doc_id, unnest(sh) AS shingle, len(sh) AS n FROM t),
    p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             COUNT(*) AS inter, ANY_VALUE(a.n) AS na, ANY_VALUE(b.n) AS nb
      FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(ROUND(CAST(CAST(inter AS DOUBLE) / (na + nb - inter)
                           AS DECIMAL(28,10)), 4) AS DOUBLE) AS jaccard
    FROM p
    WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= {JACCARD_THRESHOLD}
    """,
    tags=("dedup", "extension"),
)
def near_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 (exact form): word-3-gram Jaccard similarity ≥ threshold via a
    shingle inverted-index self-join. This is the verify stage of a
    MinHash/LSH pipeline; at 100 TB you run it only on LSH candidate
    pairs (see ``near_dedup_minhash``), never all-pairs. Integer
    set-size arithmetic → exact oracle parity."""
    docs = load_table(spark, sf_dir, "documents")
    t = _with_shingles(docs, 3)
    # n computed BEFORE the explode — referencing size(sh) after it
    # would carry the whole shingle array through every generated row.
    e = t.select("doc_id", F.size("sh").alias("n"), "sh").select(
        "doc_id", "n", F.explode("sh").alias("shingle")
    )
    a = e.alias("a")
    b = e.hint("shuffle_hash").alias("b")
    p = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.any_value(F.col("a.n")).alias("na"),
            F.any_value(F.col("b.n")).alias("nb"),
        )
    )
    jac = F.col("inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("inter")
    )
    return p.filter(jac >= JACCARD_THRESHOLD).select(
        "doc_a",
        "doc_b",
        # recovery-mirror of the oracle's DECIMAL(28,10) round — the
        # plain double round is tie-unstable across engines
        F.round(jac.cast("decimal(28,10)"), 4).cast("double").alias("jaccard"),
    )


# X2d — near-dup clusters: connected components over the pair graph -----
@query(
    "near_dup_clusters",
    oracle=f"""
    WITH RECURSIVE t AS ({_SHINGLES_SQL}),
    e AS (SELECT doc_id, unnest(sh) AS shingle, len(sh) AS n FROM t),
    p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             COUNT(*) AS inter, ANY_VALUE(a.n) AS na, ANY_VALUE(b.n) AS nb
      FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
      SELECT doc_a, doc_b FROM p
      WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= {JACCARD_THRESHOLD}
    ),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e2.b FROM reach r JOIN edges e2 ON r.b = e2.a
    )
    SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
    FROM reach GROUP BY a
    """,
    tags=("dedup", "graph", "extension"),
)
def near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2d: connected components over the near-duplicate pair graph —
    each near-dup document labeled with its cluster's minimum doc_id
    (the canonical representative a dedup pipeline keeps).

    Iterative min-label propagation: every round each vertex takes the
    min of its own and its neighbors' labels; converges in
    graph-diameter rounds (near-dup components are tiny chains, so a
    handful). Each round is one distributed join + aggregate;
    ``localCheckpoint`` truncates lineage between rounds. At 100 TB
    scale, swap in the large-star/small-star variant — the loop
    structure is identical. The driver-side loop makes this the one
    genuinely iterative operator; the DuckDB oracle states the same
    fixpoint as a recursive transitive closure."""
    pairs = near_dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    edges = (
        pairs.union(pairs.select("doc_b", "doc_a"))
        .toDF("src", "dst")
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("label"))
        .localCheckpoint()
    )
    for _ in range(50):  # diameter bound; tiny components converge fast
        nmin = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        new = labels.join(nmin, labels.id == nmin.src, "left").select(
            labels.id,
            F.col("label"),
            F.least(
                F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
            ).alias("label2"),
        )
        changed = new.filter(F.col("label2") != F.col("label")).count()
        labels = new.select(
            "id", F.col("label2").alias("label")
        ).localCheckpoint()
        if changed == 0:
            break
    return labels.select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
    )


# X2e — cluster-aware dedup: keep the best document per near-dup group --
@query(
    "dedup_keep_best",
    oracle=f"""
    WITH RECURSIVE t AS ({_SHINGLES_SQL}),
    e AS (SELECT doc_id, unnest(sh) AS shingle, len(sh) AS n FROM t),
    p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             COUNT(*) AS inter, ANY_VALUE(a.n) AS na, ANY_VALUE(b.n) AS nb
      FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
      SELECT doc_a, doc_b FROM p
      WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= {JACCARD_THRESHOLD}
    ),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e2.b FROM reach r JOIN edges e2 ON r.b = e2.a
    ),
    clusters AS (
      SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
      FROM reach GROUP BY a
    ),
    labeled AS (
      SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
             length(d.text) AS n_chars_actual
      FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id
    )
    SELECT doc_id, cluster_id FROM (
      SELECT doc_id, cluster_id,
             row_number() OVER (PARTITION BY cluster_id
                                ORDER BY n_chars_actual DESC, doc_id) AS rn
      FROM labeled
    ) WHERE rn = 1
    """,
    tags=("dedup", "graph", "extension"),
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2e: the full curation dedup — every document labeled with its
    near-dup cluster (singletons = their own cluster), then ONE
    representative kept per cluster: the longest document, doc_id
    tiebreak. This is the keep-policy step of a training-data dedup
    pipeline (cluster → score → keep-best), composed from
    ``near_dup_clusters`` + a per-cluster ranking window."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").cast("long").alias("n_chars_actual")
    )
    clusters = near_dup_clusters(spark, sf_dir)
    labeled = docs.join(clusters, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
        "n_chars_actual",
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars_actual").desc(), "doc_id"
    )
    return (
        labeled.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "cluster_id")
    )


# X2b — MinHash LSH (the scale path; no SQL oracle → rows-only check) ----
@query("near_dedup_minhash", oracle=None, tags=("dedup", "extension", "lsh"))
def near_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 (scale form): MinHash-LSH candidate pairs over word-3-gram
    shingle sets (HashingTF → MinHashLSH, fixed seed), filtered at
    Jaccard distance ≤ 1-threshold. At 100 TB the band/bucket join makes
    candidate generation ~linear in collisions; the exact verify is
    ``near_dedup_ngram_jaccard`` run on candidates only. Not
    ANSI-SQL-expressible → rows-only driver check."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    docs = load_table(spark, sf_dir, "documents")
    t = _with_shingles(docs, 3).withColumnRenamed("sh", "shingles")
    htf = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=1 << 18, binary=True
    )
    feats = htf.transform(t)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(
        feats, feats, 1.0 - JACCARD_THRESHOLD, distCol="jaccard_dist"
    )
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round(1.0 - F.col("jaccard_dist"), 4).alias("jaccard_est"),
        )
    )


# SimHash -----------------------------------------------------------------
_SIMHASH_BITS = 60


def _simhash_oracle() -> str:
    bit_sums = ",\n           ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(_SIMHASH_BITS)
    )
    combine = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(_SIMHASH_BITS)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(regexp_extract_all(lower(text), '\\S+'))) AS tok
      FROM documents
    ), h AS (
      SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
      FROM toks
    ), bits AS (
      SELECT doc_id,
           {bit_sums}
      FROM h GROUP BY doc_id
    )
    SELECT doc_id, {combine} AS simhash FROM bits
    """


@query("simhash_fingerprint", oracle=_simhash_oracle(), tags=("dedup", "extension"))
def simhash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash: 60-bit near-dup fingerprint. Token hashes come from
    md5 (identical across engines) truncated to 60 bits; per-bit ±1
    votes are summed per document and the sign vector re-packed into a
    bigint. One explode + one groupBy — narrow, scale-safe. Near-dup
    candidates at scale = fingerprints within small hamming distance
    (bucketed by rotated prefixes)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(_tokens())).alias("tok"),
    )
    h = toks.select(
        "doc_id",
        F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long").alias("h"),
    )
    bit_sums = [
        F.sum(
            F.when(F.expr(f"(h >> {b}) & 1") == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(_SIMHASH_BITS)
    ]
    bits = h.groupBy("doc_id").agg(*bit_sums)
    combine = F.expr(
        " + ".join(
            f"(CASE WHEN b{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
            for b in range(_SIMHASH_BITS)
        )
    )
    return bits.select("doc_id", combine.alias("simhash"))


# Embedding cosine near-dup ----------------------------------------------
@query(
    "near_dup_embedding",
    oracle=f"""
    WITH d AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND({cosine_oracle_sql('a.v', 'b.v')}, 4) AS cos_sim
    FROM d a JOIN d b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE ROUND({cosine_oracle_sql('a.v', 'b.v')}, 4) >= {COSINE_THRESHOLD}
    """,
    tags=("dedup", "similarity", "extension"),
)
def near_dup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: candidate pairs blocked on ``label``
    (the stand-in for an LSH/IVF bucket at scale — pair count scales
    with bucket size, not n²), exact cosine ≥ threshold via higher-order
    functions, no UDF. Threshold applied on the 4-dp-rounded value so
    Spark and the oracle agree at the boundary."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double(F.col("embedding")).alias("v")
    )
    a = emb.alias("a")
    b = emb.alias("b")
    sim = F.round(cosine(F.col("a.v"), F.col("b.v")), 4)
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            sim.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= COSINE_THRESHOLD)
    )
