"""Scale proof for derive_lsh_params (VERDICT r4 item 4).

A 10× synthetic embeddings corpus (seed-deterministic, planted duplicate
pairs) run through ``embedding_near_dup_pairs`` with ``n_vectors`` passed:
the derived band width must WIDEN vs the pinned test-scale constants, the
measured bucket-balance invariant must hold, and recall against the
exactly-known planted pair set must stay 100% at the threshold.

Determinism of the recall bound: planted duplicates are exact or
positive-scaled copies, so their sign signatures agree on every
hyperplane and LSH can never split them across buckets — recall on the
planted set is structural, not probabilistic.  The threshold (0.95) sits
far above the random-pair cosine tail for 64-dim gaussian vectors, and
the brute-force sweep below CONFIRMS no unplanted pair reaches it.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_readability_spark.textops import similarity as S

N_BASE = 2000  # sf0.1 embeddings.parquet cardinality
SCALE = 10
N = N_BASE * SCALE
THRESHOLD = 0.95


def _synth_corpus():
    """(vec_id, 64-dim vector) with every 100th vector duplicated into the
    next id — exact copy and ×1.5 positive-scaled copy alternating (both
    are cosine 1.0 and sign-signature-identical)."""
    rng = np.random.RandomState(42)
    vecs = rng.normal(size=(N, S.EMB_DIM)).astype(np.float32)
    planted = []
    for i in range(0, N - 1, 100):
        vecs[i + 1] = vecs[i] if (i // 100) % 2 == 0 else vecs[i] * 1.5
        planted.append((i, i + 1))
    return vecs, planted


@pytest.mark.slow
def test_lsh_params_scale_10x(spark):
    vecs, planted = _synth_corpus()

    # 1) derived band width widens, monotonically, vs the pinned floor
    params = S.derive_lsh_params(N)
    assert params["band_bits"] > S.EMB_BAND_BITS
    assert (
        S.derive_lsh_params(10 * N)["band_bits"] >= params["band_bits"]
    )

    df = spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]]) for i in range(N)],
        "vec_id long, embedding array<float>",
    ).repartition(8)

    # 2) balance invariant holds at the derived width; record the stat
    banded = S._banded(
        df, band_bits=params["band_bits"], n_bands=params["n_bands"]
    )
    max_rows, n_buckets = S._check_band_balance(banded, params["band_bits"])
    assert max_rows <= S._BALANCE_HEADROOM * S.TARGET_BUCKET_ROWS
    print(
        f"\nLSH 10x scale: n={N} band_bits={params['band_bits']} "
        f"max_bucket={max_rows} n_buckets={n_buckets}"
    )

    # 3) recall vs the exactly-known pair set stays 100% at the threshold
    pairs = S.embedding_near_dup_pairs(
        df, threshold=THRESHOLD, n_vectors=N
    ).collect()
    got = {(min(r.vec_a, r.vec_b), max(r.vec_a, r.vec_b)) for r in pairs}
    assert set(planted) <= got, f"missed {set(planted) - got}"

    # confirm the planted set IS the exact answer: brute-force cosine over
    # all pairs in blocks (no unplanted pair reaches the threshold)
    unit = vecs.astype(np.float64)
    unit /= np.linalg.norm(unit, axis=1, keepdims=True)
    exact = set()
    block = 2000
    for a in range(0, N, block):
        sims = unit[a : a + block] @ unit.T
        ia, ib = np.nonzero(sims >= THRESHOLD)
        for x, y in zip(ia + a, ib):
            if x < y:
                exact.add((int(x), int(y)))
    assert exact == set(planted)
    assert got == exact  # LSH found exactly the true pairs: recall 100%
