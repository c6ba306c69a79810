"""Native host codec tests: C++/NumPy parity, round-trips, and the
xorshift stream's bit-exactness vs the pure-Python oracle model."""

import numpy as np

from jubjub_tpu import native, oracle
from jubjub_tpu.fields.spec import MASK, NLIMBS, int_to_limbs, limbs_to_int


def _random_blob(n=257, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=n * 32, dtype=np.uint8)


def test_bytes_to_limbs_native_numpy_parity():
    raw = _random_blob()
    via_public = native.bytes_to_limbs(raw)      # native if available
    via_numpy = native._np_bytes_to_limbs(raw.reshape(-1))
    assert np.array_equal(via_public, via_numpy)
    # spot-check against the scalar spec helper
    v0 = int.from_bytes(raw[:32].tobytes(), "little") & ((1 << 256) - 1)
    assert tuple(via_public[:, 0]) == int_to_limbs(v0)


def test_limbs_to_bytes_native_numpy_parity_and_roundtrip():
    raw = _random_blob(131, seed=9)
    limbs = native.bytes_to_limbs(raw)
    assert limbs.shape == (NLIMBS, 131) and (limbs >= 0).all() \
        and (limbs <= MASK).all()
    back_pub = native.limbs_to_bytes(limbs)
    back_np = native._np_limbs_to_bytes(limbs)
    assert np.array_equal(back_pub, back_np)
    assert np.array_equal(back_pub.reshape(-1), raw)


def test_ints_to_limbs_matches_spec():
    vals = [0, 1, oracle.Q - 1, oracle.R, (1 << 256) - 1, 0xDEADBEEF]
    arr = native.ints_to_limbs(vals)
    for i, v in enumerate(vals):
        assert limbs_to_int(arr[:, i]) == v


def test_xorshift_native_matches_oracle():
    seed = bytes(range(16))  # the reference blackbox seed (tests/common.rs:7-9)
    want = oracle.XorShiftRng(seed).fill_bytes(1024)
    got = native.xorshift_bytes(seed, 1024)
    assert got == want


def test_native_tier_is_active():
    """The C++ tier must actually build on this machine (g++ is baked in);
    if this fails the package still works via NumPy, but the native wiring
    claim would be false — fail loudly instead."""
    native._load()
    assert native.HAVE_NATIVE
