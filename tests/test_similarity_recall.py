"""Recall-floor property tests for the approximate similarity paths
(VERDICT.md round-2 items 5 and 6).

The driver's embeddings table is pure random gaussian noise (measured:
same-label and cross-label mean cosine are both ~0.0), which is the
worst case for ANY sublinear ANN method — so recall guarantees are
asserted on synthetic corpora with planted cluster structure, the
workload LSH/IVF are actually built for, at 1× and 10× the driver's
corpus size. The floors pin two claims:

1. The size-adaptive LSH (planes from COUNT(*), multi-table union)
   keeps recall above a floor AS N GROWS — the round-2 parameterization
   (4 fixed planes tuned to 500 vectors) could not.
2. The Lloyd-trained IVF codebook recalls at least as well as the
   untrained every-Nth-vector seed it replaced.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from deloton_solo_spark.operators import similarity as S

DIM = S.DIM
N_QUERIES = S.N_QUERIES


def _write_clustered(path, n, n_clusters, seed=7):
    """n vectors in n_clusters tight gaussian clusters (intra-cluster
    cosine ≈ 0.9) — deterministic."""
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, DIM)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.randint(0, n_clusters, size=n)
    # per-dim std 0.03 → noise norm ≈ 0.24 vs unit centers → intra-
    # cluster cosine ≈ 0.94, cross-cluster ≈ 0 (realistic near-dup /
    # paraphrase-cluster structure).
    noise = rng.randn(n, DIM) * 0.03
    vecs = centers[assign] + noise
    table = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(assign.astype(np.int32), pa.int32()),
        }
    )
    pq.write_table(table, str(path / "embeddings.parquet"))


def _recall(spark, sf_dir, approx_fn):
    """Mean per-query recall of ``approx_fn`` vs the exact top-k."""
    exact = S.similarity_topk(spark, sf_dir).toPandas()
    approx = approx_fn(spark, sf_dir).toPandas()
    recalls = []
    for qid, grp in exact.groupby("query_id"):
        want = set(grp.vec_id)
        got = set(approx[approx.query_id == qid].vec_id)
        recalls.append(len(want & got) / len(want))
    return sum(recalls) / len(recalls)


@pytest.mark.parametrize("n", [500, 5000], ids=["1x", "10x"])
def test_lsh_recall_floor_holds_as_n_grows(spark, tmp_path, n):
    """The adaptive rule must hold the floor at 10× the driver corpus —
    where the old fixed-4-plane setup degraded to huge buckets (no
    pruning) and any fixed-large-plane setup loses recall."""
    _write_clustered(tmp_path, n, n_clusters=max(10, n // 20))
    rec = _recall(spark, str(tmp_path), S.similarity_topk_lsh)
    assert rec >= 0.60, f"LSH recall {rec:.2f} at n={n}"


def test_lsh_planes_rule():
    """The p-from-n rule: occupancy target respected, clamped, monotone."""
    assert S._n_planes(100) == 4
    assert S._n_planes(500) == 5
    assert S._n_planes(5000) == 9
    assert S._n_planes(10**9) == S.MAX_PLANES
    prev = 0
    for n in [1, 10, 100, 1000, 10**4, 10**5, 10**6]:
        p = S._n_planes(n)
        assert p >= prev and 4 <= p <= S.MAX_PLANES
        prev = p
    assert S._n_tables(4) == 2 and S._n_tables(9) == 3
    assert S._n_tables(12) == S.N_TABLES_MAX


def test_ivf_trained_recall_not_worse_than_seed(spark, tmp_path):
    """Lloyd training must not lose recall vs the untrained seed
    codebook it replaced (VERDICT r2 item 5's 'Done' bar)."""
    _write_clustered(tmp_path, 1000, n_clusters=40)
    sf = str(tmp_path)

    def seed_ivf(spark_, sf_dir):
        # The round-2 untrained variant: probe/assign against the raw
        # every-CENT_MOD-th-vector seed, no Lloyd rounds.
        import pyspark.sql.functions as F

        from deloton_solo_spark.catalog import load_table
        from deloton_solo_spark.functions.vectors import as_double

        d = load_table(spark_, sf_dir, "embeddings").select(
            "vec_id", as_double(F.col("embedding")).alias("v")
        )
        seed = d.filter(
            F.col("vec_id") % S.CENT_MOD == S.CENT_RESIDUE
        ).select(F.col("vec_id").alias("cent_id"), F.col("v").alias("cv"))
        return S._ivf_search(d, seed)

    trained = _recall(spark, sf, S.similarity_topk_ivf)
    untrained = _recall(spark, sf, seed_ivf)
    assert trained >= untrained - 1e-9, (trained, untrained)
    assert trained >= 0.60, f"trained IVF recall {trained:.2f}"


def test_pq_adc_recall_vs_exact_mips(spark):
    """PQ-ADC (X81) ranks by max inner product; its 50-candidate ADC
    stage must retain most of the true dot-product top-k before the
    exact re-rank (which then orders them perfectly)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from deloton_solo_spark.catalog import load_table
    from deloton_solo_spark.functions.vectors import as_double, dot

    from .conftest import SF_DIR as sf

    d = load_table(spark, sf, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    q = d.filter(F.col("vec_id") < S.N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("dot_sim"), "vec_id"
    )
    exact = (
        q.crossJoin(d)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(dot(F.col("qv"), F.col("v")), 4).alias("dot_sim"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= S.TOP_K)
        .toPandas()
    )
    approx = S.similarity_topk_pq(spark, sf).toPandas()
    recalls = []
    for qid, grp in exact.groupby("query_id"):
        want = set(grp.vec_id)
        got = set(approx[approx.query_id == qid].vec_id)
        recalls.append(len(want & got) / len(want))
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.6, f"PQ-ADC recall {mean_recall:.2f}"


def test_mmr_greedy_invariants(spark):
    """MMR (X248): 5 distinct ranks per query; rank 1 is the plain
    top-1 (λ=1 and λ=0.5 agree when S is empty); and the marginal
    score is non-increasing from rank 2 on — at step i+1 every
    remaining candidate's redundancy can only have grown and the
    step-i winner is gone, so the greedy maxima are monotone (rank 1
    uses the red=0 convention, which negative cosines can beat)."""
    from collections import defaultdict

    from deloton_solo_spark.operators.similarity import (
        MMR_K,
        mmr_diversified_topk,
        similarity_topk,
    )

    from .conftest import SF_DIR

    rows = mmr_diversified_topk(spark, SF_DIR).collect()
    # rank-1 must equal the plain top-1 = max (cos_sim desc, vec_id)
    best = {}
    for r in similarity_topk(spark, SF_DIR).collect():
        cur = best.get(r.query_id)
        key = (-r.cos_sim, r.vec_id)
        if cur is None or key < cur[0]:
            best[r.query_id] = (key, r.vec_id)
    by_q = defaultdict(list)
    for r in rows:
        by_q[r.query_id].append(r)
    assert by_q, "no queries"
    for qid, sel in by_q.items():
        sel.sort(key=lambda r: r.sel_rank)
        assert [r.sel_rank for r in sel] == list(range(1, MMR_K + 1))
        assert len({r.vec_id for r in sel}) == MMR_K
        assert sel[0].vec_id == best[qid][1]
        # monotone from rank 2 on: S only grows, so every remaining
        # candidate's redundancy is non-decreasing and the winner was
        # removed. Rank 1 is excluded — its conventional red = 0, and
        # a NEGATIVE true redundancy at rank 2 can beat it.
        scores = [r.mmr_score for r in sel][1:]
        assert all(
            a >= b - 1e-12 for a, b in zip(scores, scores[1:])
        ), (qid, scores)
