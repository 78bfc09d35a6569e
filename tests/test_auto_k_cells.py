"""AUTO-k codebook sizing (VERDICT r8 task 3 — the SemDeDup recipe in
code): k = max(K_CELLS, ceil(n / TARGET_CELL)) derived from the corpus
count, so every within-cell pair stage stays Σ|cell|² ≈ TARGET_CELL·n
— linear by construction. The test SFs sit below the crossover
(n ≤ 8192) where the rule reduces bit-exactly to the r8 fixed-k seed
(covered by the full oracle matrix); THIS file exercises the large-n
modulus branch on a synthetic 20k-vector corpus, including engine
lockstep of the seed set against the oracle's kp + c0 CTEs."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from deloton_solo_spark.operators.similarity import (
    CENT_RESIDUE,
    K_CELLS,
    TARGET_CELL,
    _seed_cents,
    _trained_cents_sql,
)

N_BIG = 20_000
DIM = 4


def _synth(spark):
    # deterministic small-int vectors: exact in DOUBLE on both engines
    return spark.range(N_BIG).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                ((F.col("id") * (7 + j) + j) % 97).cast("double")
                for j in range(DIM)
            ]
        ).alias("v"),
    )


def test_small_corpus_keeps_legacy_seed(spark):
    # below the crossover the seed must be EXACTLY the r8 rule:
    # smallest K_CELLS ids with vec_id % 50 == 7
    small = _synth(spark).filter(F.col("vec_id") < 2000)
    got = sorted(
        r["cent_id"] for r in _seed_cents(small).collect()
    )
    want = [i for i in range(2000) if i % 50 == 7][:K_CELLS]
    assert got == want


def test_large_corpus_seed_count_tracks_n(spark):
    d = _synth(spark)
    seeds = _seed_cents(d).collect()
    k_target = -(-N_BIG // TARGET_CELL)  # 313
    assert k_target > K_CELLS, "fixture must cross the auto-k boundary"
    # modulus rule yields ~k seeds (within ±5%), far above K_CELLS
    assert abs(len(seeds) - k_target) <= 0.05 * k_target + 8, len(seeds)
    # implied average cell size is pinned near TARGET_CELL
    assert N_BIG / len(seeds) <= TARGET_CELL * 1.1


def test_seed_set_matches_oracle_c0(spark):
    # engine lockstep: the oracle's kp + c0 CTE chain must select the
    # IDENTICAL seed ids on the same large corpus (the branch the
    # sf-matrix never reaches)
    d = _synth(spark)
    spark_ids = sorted(r["cent_id"] for r in _seed_cents(d).collect())

    pdf = pd.DataFrame(
        {
            "vec_id": range(N_BIG),
            "v": [
                [float((i * (7 + j) + j) % 97) for j in range(DIM)]
                for i in range(N_BIG)
            ],
        }
    )
    con = duckdb.connect()
    con.register("synth", pdf)
    sql = (
        "WITH d AS (SELECT vec_id, v::DOUBLE[] AS v FROM synth),"
        + _trained_cents_sql()
        + "\nSELECT cent_id FROM c0 ORDER BY cent_id"
    )
    oracle_ids = [r[0] for r in con.execute(sql).fetchall()]
    assert spark_ids == oracle_ids


def test_seed_rule_constants_are_consistent():
    # the crossover arithmetic the docstrings quote
    assert K_CELLS * TARGET_CELL == 8192
    assert CENT_RESIDUE < TARGET_CELL  # residue survives the modulus
