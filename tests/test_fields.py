"""Field unit tests with hard-coded/oracle-derived known-answer vectors.

Replicates the reference's in-module field tests
(/root/reference/src/fr.rs:787-1244 and the bls12_381 analogues for Fq):
constant self-consistency, byte round-trips with modulus-rejection edges,
from_bytes_wide edges, arithmetic at LARGEST = p-1, mul/square cross-checks
against bit double-and-add, inversion, sqrt residue counting, from_raw.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from jubjub_tpu import oracle
from jubjub_tpu.fields import Fq, Fr

from helpers import bytes_to_arr, ints

FIELDS = [Fq, Fr]
FIELD_IDS = ["fq", "fr"]


@pytest.fixture(params=FIELDS, ids=FIELD_IDS)
def E(request):
    return request.param


def test_spec_constants(E):
    """Montgomery constants recomputed from first principles
    (cf. /root/reference/src/fr.rs:787-826: R2/INV self-checks)."""
    F = E.SPEC
    p = F.p
    from jubjub_tpu.fields.spec import LIMB_BITS, R_BITS
    assert F.R == pow(2, R_BITS, p)
    assert F.R2 == pow(2, 2 * R_BITS, p)
    assert F.R3 == pow(2, 3 * R_BITS, p)
    assert (F.inv_limb * p) % (1 << LIMB_BITS) == (1 << LIMB_BITS) - 1
    assert F.t * (1 << F.s) == p - 1 and F.t % 2 == 1
    assert pow(F.generator, (p - 1) // 2, p) == p - 1
    assert F.root_of_unity == pow(F.generator, F.t, p)
    assert F.delta == pow(F.generator, 1 << F.s, p)
    assert F.two_inv * 2 % p == 1


def test_prime_field_constants_match_reference():
    """NUM_BITS / CAPACITY / S per /root/reference/src/fr.rs:713-738 and
    bls12_381's Scalar."""
    assert Fr.NUM_BITS == 252 and Fr.CAPACITY == 251 and Fr.SPEC.s == 1
    assert Fq.NUM_BITS == 255 and Fq.CAPACITY == 254 and Fq.SPEC.s == 32
    assert Fr.SPEC.generator == 6   # /root/reference/src/fr.rs:108-109
    assert Fq.SPEC.generator == 7   # bls12_381 Scalar GENERATOR


def test_zero_one_identities(E):
    a = E.from_int([0, 1, 2, E.SPEC.p - 1])
    z, o = E.zero((4,)), E.one((4,))
    assert ints(a + z) == ints(a)
    assert ints(a * o) == ints(a)
    assert ints(a * z) == [0, 0, 0, 0]
    assert list(np.asarray(z.is_zero())) == [True] * 4


def test_equality_and_conditional_select(E):
    a = E.from_int([1, 2, 3])
    b = E.from_int([1, 5, 3])
    assert list(np.asarray(a == b)) == [True, False, True]
    m = jnp.asarray([True, False, False])
    assert ints(a.conditional_select(b, m)) == [1, 5, 3]


def test_addition_at_largest(E):
    """LARGEST = p - 1 edges (/root/reference/src/fr.rs:1044-1099)."""
    p = E.SPEC.p
    largest = E.from_int([p - 1])
    assert ints(largest + largest) == [p - 2]
    assert ints(largest + E.one((1,))) == [0]
    assert ints(E.zero((1,)) - largest) == [1]
    assert ints(-largest) == [1]
    assert ints(-E.zero((1,))) == [0]


def test_public_operators_total_on_chained_values(E):
    """Regression (round-2 verdict): lazy ``a - (b+b+b)`` must be total.

    Pick b so its Montgomery representative equals p-1 (the worst case for
    redundant-residue growth): b_val = (p-1) * R^-1 mod p.  Round 2's
    ``__sub__`` assumed subtrahend < 2p and silently returned expected+1
    here; public operators now restore the < 2p bound after every op
    (matching the reference's total Sub, /root/reference/src/fr.rs:620-634).
    """
    p, R = E.SPEC.p, E.SPEC.R
    bval = (p - 1) * pow(R, -1, p) % p  # Montgomery repr = p - 1
    b = E.from_int([bval])
    a = E.from_int([5])
    assert ints(a - (b + b + b)) == [(5 - 3 * bval) % p]
    assert ints(a + b + b + b + b) == [(5 + 4 * bval) % p]
    assert ints(-(b + b + b)) == [(-3 * bval) % p]
    assert ints((b + b + b) - (b + b)) == [bval]
    assert ints((b + b).double() - b) == [3 * bval % p]
    # deep chain: 10 adds then sub/neg stay exact
    acc = b
    for _ in range(9):
        acc = acc + b
    assert ints(a - acc) == [(5 - 10 * bval) % p]
    assert ints((a - acc) * b) == [(5 - 10 * bval) * bval % p]


def test_mul_square_cross_check(E):
    """Cross-check mul against double-and-add over scalar bits
    (/root/reference/src/fr.rs:1101-1157), vectorized over 100 cases."""
    p = E.SPEC.p
    rng = oracle.new_test_rng()
    xs = [oracle.random_field_canonical(rng, p) for _ in range(100)]
    ys = [oracle.random_field_canonical(rng, p) for _ in range(100)]
    a, b = E.from_int(xs), E.from_int(ys)
    assert ints(a * b) == [x * y % p for x, y in zip(xs, ys)]
    assert ints(a.square()) == [x * x % p for x in xs]
    assert ints(a.double()) == [2 * x % p for x in xs]


def test_inversion(E):
    """invert == pow(p-2) and a * a^-1 == 1
    (/root/reference/src/fr.rs:1159-1202)."""
    p = E.SPEC.p
    rng = oracle.new_test_rng()
    xs = [oracle.random_field_canonical(rng, p) for _ in range(50)]
    xs = [x if x else 1 for x in xs]
    a = E.from_int(xs)
    inv, ok = a.invert()
    assert np.asarray(ok).all()
    assert ints(a * inv) == [1] * 50
    assert ints(inv) == ints(a.pow(p - 2))
    _, ok0 = E.zero((1,)).invert()
    assert not np.asarray(ok0).any()


def test_pow_runtime_exponent(E):
    """pow over a TRACED exponent (bytes or field element) matches the
    Python-int oracle (/root/reference/src/fr.rs:403-434 takes a runtime
    [u64;4]; round-2 verdict: the host-constant-only path was a gap)."""
    p = E.SPEC.p
    rng = oracle.new_test_rng()
    xs = [oracle.random_field_canonical(rng, p) for _ in range(8)]
    es = [oracle.random_field_canonical(rng, p) for _ in range(7)]
    es.append(0)  # a^0 == 1
    a = E.from_int(xs)
    ebytes = bytes_to_arr([e.to_bytes(32, "little") for e in es])
    assert ints(a.pow(ebytes)) == [pow(x, e, p) for x, e in zip(xs, es)]
    # exponent as a field element: e's canonical value is the exponent
    ee = E.from_int(es)
    assert ints(a.pow(ee)) == [pow(x, e, p) for x, e in zip(xs, es)]


def test_sqrt_residue_count(E):
    """sqrt over the reference's exact 100-value descending stream starting
    at (p-2)*2^-256 mod p (the reference's raw limbs reinterpreted in its
    R=2^256 Montgomery domain); Fr counts exactly 47 non-residues
    (/root/reference/src/fr.rs:1204-1227).  The stream is pinned to the
    reference's R, independent of our internal radix."""
    p = E.SPEC.p
    start = (p - 2) * pow(1 << 256, -1, p) % p
    vals = [(start - i) % p for i in range(100)]
    a = E.from_int(vals)
    root, ok = a.sqrt()
    okh = np.asarray(ok)
    none_count = 0
    for v, r, k in zip(vals, ints(root), okh):
        exp = oracle.sqrt_q(v) if p == oracle.Q else oracle.sqrt_r(v)
        assert k == (exp is not None)
        if k:
            assert r * r % p == v
        else:
            none_count += 1
    if E is Fr:
        assert none_count == 47  # /root/reference/src/fr.rs:1224-1226
    # squares always succeed
    sq = a.square()
    root2, ok2 = sq.sqrt()
    assert np.asarray(ok2).all()
    assert all(r * r % p == v * v % p for r, v in zip(ints(root2), vals))


def test_bytes_roundtrip_and_rejection(E):
    """from_bytes canonical edges (/root/reference/src/fr.rs:855-961)."""
    p = E.SPEC.p
    good = [0, 1, p - 1, p >> 1, E.SPEC.R, E.SPEC.R2]
    arr = bytes_to_arr([(v % p).to_bytes(32, "little") for v in good])
    e, ok = E.from_bytes(arr)
    assert np.asarray(ok).all()
    assert ints(e) == [v % p for v in good]
    assert [bytes(np.asarray(e.to_bytes())[:, i]) for i in range(len(good))] \
        == [(v % p).to_bytes(32, "little") for v in good]
    # modulus and above must be rejected
    bad = [p, p + 1, (1 << 256) - 1]
    _, okb = E.from_bytes(bytes_to_arr([v.to_bytes(32, "little") for v in bad]))
    assert not np.asarray(okb).any()


def test_from_bytes_wide_edges(E):
    """from_u512 edges: 0, R, R^2, all-0xFF (/root/reference/src/fr.rs:963-1034)."""
    p = E.SPEC.p
    cases = [0, E.SPEC.R, E.SPEC.R2, (1 << 512) - 1, 1 << 256, p, p * p]
    arr = bytes_to_arr([c.to_bytes(64, "little") for c in cases])
    e = E.from_bytes_wide(arr)
    assert ints(e) == [c % p for c in cases]


def test_from_raw(E):
    """(/root/reference/src/fr.rs:1229-1244)."""
    p = E.SPEC.p
    v = (p - 1 + (p << 64)) % (1 << 256)  # deliberately unreduced 4x64 limbs
    limbs = [(v >> (64 * i)) & ((1 << 64) - 1) for i in range(4)]
    assert ints(E.from_raw(limbs))[0] == v % p
    assert ints(E.from_raw([0xFFFFFFFFFFFFFFFF] * 4))[0] == ((1 << 256) - 1) % p


def test_is_odd(E):
    a = E.from_int([0, 1, 2, E.SPEC.p - 1])
    # p odd => p-1 even
    assert list(np.asarray(a.is_odd())) == [False, True, False, False]


def test_sqrt_ratio(E):
    """ff::Field::sqrt_ratio semantics (/root/reference/src/fr.rs:704-706)."""
    p = E.SPEC.p
    g = E.SPEC.generator
    num = E.from_int([4, g, 0, 7])
    div = E.from_int([1, 1, 5, 0])
    is_sq, x = E.sqrt_ratio(num, div)
    flags = list(np.asarray(is_sq))
    xv = ints(x)
    assert flags[0] and xv[0] * xv[0] % p == 4
    # g is a non-residue: expect (False, sqrt(ROOT_OF_UNITY * g))
    assert not flags[1]
    assert xv[1] * xv[1] % p == E.SPEC.root_of_unity * g % p
    assert flags[2] and xv[2] == 0      # num == 0
    assert not flags[3] and xv[3] == 0  # div == 0


def test_batch_invert(E):
    p = E.SPEC.p
    rng = oracle.new_test_rng()
    xs = [oracle.random_field_canonical(rng, p) or 1 for _ in range(33)]
    a = E.from_int(xs)
    inv = E.batch_invert(a)
    assert ints(inv) == [pow(x, -1, p) for x in xs]


def test_karatsuba_bit_identity(E):
    """Karatsuba product phase (config.MUL_KARATSUBA) is bit-identical to
    the schoolbook phase for mul and square — the recombined columns equal
    the schoolbook columns as integers (mont._product_cols_karatsuba)."""
    import jax
    from jubjub_tpu import config
    from jubjub_tpu.fields import mont
    F = E.SPEC
    a = E.random(jax.random.PRNGKey(11), (64,)).limbs
    b = E.random(jax.random.PRNGKey(12), (64,)).limbs
    prev = config.MUL_KARATSUBA
    try:
        config.MUL_KARATSUBA = False
        ref_m = np.asarray(mont.mul(F, a, b))
        ref_s = np.asarray(mont.square(F, a))
        config.MUL_KARATSUBA = True
        assert (np.asarray(mont.mul(F, a, b)) == ref_m).all()
        assert (np.asarray(mont.square(F, a)) == ref_s).all()
    finally:
        config.MUL_KARATSUBA = prev
