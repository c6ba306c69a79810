"""Fr blackbox algebraic property tests.

Twin of /root/reference/tests/fr_blackbox.rs: 2000 checks per property,
samples drawn from the SAME deterministic XorShift stream (seed 0..15,
tests/common.rs:7-9) via 64 uniform bytes reduced mod p (common.rs:15-29).
Here each property is ONE vectorized check over the whole 2000-lane batch.
"""

import numpy as np

from jubjub_tpu import oracle
from jubjub_tpu.fields import Fr

from helpers import NUM_BLACK_BOX_CHECKS, bytes_to_arr, ints

E = Fr
P = E.SPEC.p


def _stream(n):
    rng = oracle.new_test_rng()
    return [int.from_bytes(rng.fill_bytes(64), "little") % P for _ in range(n)]


def _new_random_batch(n):
    """Samples built through the DUT's own from_bytes_wide (not the oracle)."""
    rng = oracle.new_test_rng()
    raw = [rng.fill_bytes(64) for _ in range(n)]
    return E.from_bytes_wide(bytes_to_arr(raw)), \
        [int.from_bytes(b, "little") % P for b in raw]


def test_sampling_matches_reference_stream():
    a, expect = _new_random_batch(NUM_BLACK_BOX_CHECKS)
    assert ints(a) == expect


def test_to_and_from_bytes():
    a, _ = _new_random_batch(NUM_BLACK_BOX_CHECKS)
    rt, ok = E.from_bytes(a.to_bytes())
    assert np.asarray(ok).all()
    assert np.asarray(rt == a).all()


def _abc():
    vals = _stream(3 * NUM_BLACK_BOX_CHECKS)
    mk = lambda i: E.from_int(vals[i::3])
    return mk(0), mk(1), mk(2)


def test_additive_associativity():
    a, b, c = _abc()
    assert np.asarray(((a + b) + c) == (a + (b + c))).all()


def test_additive_identity():
    a, _ = _new_random_batch(NUM_BLACK_BOX_CHECKS)
    z = E.zero(a.shape)
    assert np.asarray((a + z) == a).all()
    assert np.asarray((z + a) == a).all()


def test_subtract_additive_identity():
    a, _ = _new_random_batch(NUM_BLACK_BOX_CHECKS)
    z = E.zero(a.shape)
    assert np.asarray((a - z) == a).all()
    assert np.asarray((z - (-a)) == a).all()


def test_additive_inverse():
    a, _ = _new_random_batch(NUM_BLACK_BOX_CHECKS)
    z = E.zero(a.shape)
    assert np.asarray((a + (-a)) == z).all()
    assert np.asarray(((-a) + a) == z).all()


def test_additive_commutativity():
    a, b, _ = _abc()
    assert np.asarray((a + b) == (b + a)).all()


def test_multiplicative_associativity():
    a, b, c = _abc()
    assert np.asarray(((a * b) * c) == (a * (b * c))).all()


def test_multiplicative_identity():
    a, _ = _new_random_batch(NUM_BLACK_BOX_CHECKS)
    o = E.one(a.shape)
    assert np.asarray((a * o) == a).all()
    assert np.asarray((o * a) == a).all()


def test_multiplicative_inverse():
    a, vals = _new_random_batch(NUM_BLACK_BOX_CHECKS)
    assert all(vals)  # stream contains no zero draw
    inv, ok = a.invert()
    assert np.asarray(ok).all()
    o = E.one(a.shape)
    assert np.asarray((a * inv) == o).all()
    assert np.asarray((inv * a) == o).all()


def test_multiplicative_commutativity():
    a, b, _ = _abc()
    assert np.asarray((a * b) == (b * a)).all()


def test_multiply_additive_identity():
    a, _ = _new_random_batch(NUM_BLACK_BOX_CHECKS)
    z = E.zero(a.shape)
    assert np.asarray((a * z) == z).all()
    assert np.asarray((z * a) == z).all()
