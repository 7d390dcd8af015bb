"""q23 sign-LSH blocking: exact all-pairs recall bounds (ADVICE round 2).

The q23 oracle was redefined to the bucketed candidate set, so the driver
harness alone can no longer see pairs the blocking misses. These tests bound
the miss rate against an EXACT all-pairs oracle, in both regimes:

* the true near-dup regime (planted duplicates at cosine >= 0.99): the 8-bit
  sign screen must catch the vast majority — this is what the operator is for,
* the low-threshold regime the driver query runs at (cosine >= 0.30 on the
  synthetic embeddings): recall is ~2% BY CONSTRUCTION of sign-LSH
  ((1 - theta/pi)^8 at theta ~ 72 deg) — pinned here so the documented loss
  (queries_text.q23_embed_near_dup docstring) stays measured, not asserted.
"""

import numpy as np
import pyarrow.parquet as pq


def _sign_bucket(emb: np.ndarray) -> np.ndarray:
    """Replicates queries_text._sign_bucket_col: 8-bit sign of dims 0..7."""
    bits = (emb[:, :8] > 0).astype(np.int64)
    return (bits * (1 << np.arange(8))).sum(axis=1)


def _pair_sets(emb: np.ndarray, thr: float):
    """(exact all-pairs mask, same-bucket mask) over the upper triangle."""
    norm = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    cos = norm @ norm.T
    iu = np.triu_indices(emb.shape[0], 1)
    bucket = _sign_bucket(emb)
    return cos[iu] >= thr, bucket[iu[0]] == bucket[iu[1]]


def test_near_dup_regime_recall_high():
    """Planted near-dups (base + tiny noise, cosine >= 0.99): the screen the
    query implements catches >= 60% single-band (theory: 0.955^8 ~ 69%) —
    the regime the operator exists for."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(300, 64))
    dup = base + 0.02 * rng.normal(size=base.shape)  # cosine ~ 0.9998
    emb = np.concatenate([base, dup])
    true, cand = _pair_sets(emb, 0.99)
    n_true = int(true.sum())
    assert n_true >= 300  # every (base_i, dup_i) pair qualifies
    recall = int((true & cand).sum()) / n_true
    assert recall >= 0.60, f"near-dup regime recall {recall:.3f}"


def test_low_threshold_regime_recall_pinned():
    """The driver query's 0.30 threshold on the synthetic table: recall vs
    exact all-pairs is tiny (sign-LSH at theta ~ 72 deg) — pin the measured
    value so the documented loss can never drift silently."""
    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    emb = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    true, cand = _pair_sets(emb, 0.30)
    n_true = int(true.sum())
    assert n_true > 500  # the regime is dense with moderately-similar pairs
    recall = int((true & cand).sum()) / n_true
    # measured 0.0185 on this data; assert the documented ORDER of magnitude
    assert recall < 0.10, f"low-threshold recall unexpectedly high: {recall:.3f}"
    assert recall > 0.001, f"blocking broken entirely: {recall:.4f}"
