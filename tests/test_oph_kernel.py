"""One-permutation-hashing MinHash kernel (functions/hashing.py
oph_signature_np) — pure numpy, no Spark session needed.

OPH per Li, Owen, Zhang (NIPS 2012) with rotation densification per
Shrivastava & Li (ICML 2014): one hash per shingle, min per hash-space
bin, empty bins borrow circularly from the next filled bin.
"""

import numpy as np

from onto_text_tag_spark.functions.hashing import MOD_PRIME, oph_signature_np

P = MOD_PRIME
RNG = np.random.default_rng(7)


def _rand_set(n):
    return np.unique(RNG.integers(0, P, n, dtype=np.uint64))


def test_empty_input_is_identity():
    sig = oph_signature_np(np.array([], dtype=np.uint64), 64)
    assert (sig == np.uint64(P)).all()


def test_deterministic_and_order_invariant():
    u = _rand_set(500)
    a = oph_signature_np(u, 64)
    b = oph_signature_np(u[::-1].copy(), 64)
    assert (a == b).all()


def test_no_empty_slots_after_densification():
    # far fewer shingles than bins -> most bins empty pre-densification
    u = _rand_set(5)
    sig = oph_signature_np(u, 64)
    assert (sig != np.uint64(P)).all()
    assert set(sig.tolist()) <= set(u.tolist())


def test_slot_agreement_estimates_jaccard():
    """Mean slot agreement over trials tracks true Jaccard within a few
    estimator sigmas (sigma ~ sqrt(J(1-J)/64) ~ 0.05)."""
    for true_j in (0.5, 0.8, 0.9):
        errs = []
        for _ in range(200):
            n = 400
            m = int(round(2 * n * true_j / (1 + true_j)))
            d = n - m
            shared = RNG.integers(0, P, m, dtype=np.uint64)
            a = np.concatenate([shared, RNG.integers(0, P, d, dtype=np.uint64)])
            b = np.concatenate([shared, RNG.integers(0, P, d, dtype=np.uint64)])
            est = (oph_signature_np(a, 64) == oph_signature_np(b, 64)).mean()
            errs.append(est - m / (m + 2 * d))
        errs = np.asarray(errs)
        assert abs(errs.mean()) < 0.02, (true_j, errs.mean())
        assert errs.std() < 0.08, (true_j, errs.std())


def test_identical_sets_agree_exactly():
    u = _rand_set(300)
    assert (oph_signature_np(u, 64) == oph_signature_np(u.copy(), 64)).all()
