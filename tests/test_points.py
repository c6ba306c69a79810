"""Curve group tests, mirroring /root/reference/src/lib.rs:1456-1804.

Covers: d/-d non-square, Niels identity consistency, scalar-mul
associativity, batch_normalize vs naive, EIGHT_TORSION, generator
re-derivation, small-order/identity semantics, and multiplication
consistency across all point representations.
"""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from jubjub_tpu import oracle
from jubjub_tpu.fields import Fq, Fr
from jubjub_tpu.curve import (AffineNielsPoint, AffinePoint,
                              ExtendedNielsPoint, ExtendedPoint,
                              batch_normalize, clear_cofactor,
                              eight_torsion_host, full_generator,
                              generator_table, into_subgroup, mul_affine,
                              mul_const_scalar, mul_extended, multiply_bits,
                              random_extended, reduce_sum, select_point,
                              subgroup_generator, SubgroupPoint)

from helpers import aff_ints, bytes_to_arr, ints, jit_scalar_mul


def test_d_is_non_square():
    """(/root/reference/src/lib.rs:1461-1466)."""
    d = Fq.from_int([oracle.EDWARDS_D, (-oracle.EDWARDS_D) % oracle.Q])
    _, ok = d.sqrt()
    assert not np.asarray(ok).any()


def test_affine_niels_point_identity():
    """(/root/reference/src/lib.rs:1468-1502)."""
    g = full_generator((2,)).to_extended()
    ident_a = AffineNielsPoint.identity((2,))
    ident_e = ExtendedNielsPoint.identity((2,))
    assert np.asarray((g.add_affine_niels(ident_a)) == g).all()
    assert np.asarray((g.add_extended_niels(ident_e)) == g).all()
    assert np.asarray((g.sub_affine_niels(ident_a)) == g).all()
    assert np.asarray((g.sub_extended_niels(ident_e)) == g).all()


def test_assoc():
    """(p * 1000) * 3938 == p * 3_938_000
    (/root/reference/src/lib.rs:1504-1527)."""
    p = mul_const_scalar(full_generator().to_extended(), 1000)
    lhs = mul_const_scalar(p, 3938)
    rhs = mul_const_scalar(full_generator().to_extended(), 3938000)
    assert np.asarray(lhs == rhs).all()
    # also via Fr scalars
    lhs2 = mul_extended(p, Fr.from_int(3938))
    assert np.asarray(lhs2 == rhs).all()


def test_batch_normalize():
    """vs naive per-element normalization
    (/root/reference/src/lib.rs:1529-1575)."""
    base = full_generator((10,)).to_extended()
    ks = list(range(1, 11))
    pts = mul_extended(base, Fr.from_int(ks))
    aff = batch_normalize(pts)
    expect = [oracle.mul(oracle.GENERATOR, k) for k in ks]
    assert aff_ints(aff) == expect
    assert np.asarray(aff.is_on_curve()).all()
    # scalar (unbatched) path
    one = mul_const_scalar(full_generator().to_extended(), 7)
    assert aff_ints(batch_normalize(one))[0] == oracle.mul(oracle.GENERATOR, 7)


def test_eight_torsion():
    """All 8 small-order points, reference order
    (/root/reference/src/lib.rs:1588-1696)."""
    tor = eight_torsion_host()
    # reference-order entry 0 is [r]G, entry 7 is the identity
    assert tor[7] == oracle.IDENTITY
    assert tor[0] == oracle.mul(oracle.GENERATOR, oracle.R)
    pts = AffinePoint(
        u=Fq.from_int([t[0] for t in tor]),
        v=Fq.from_int([t[1] for t in tor]),
    )
    ext = pts.to_extended()
    assert np.asarray(ext.is_small_order()).all()
    assert np.asarray(pts.is_on_curve()).all()
    # identity semantics: only the last is the identity
    assert list(np.asarray(ext.is_identity())) == [False] * 7 + [True]
    # torsion-free: only the identity
    assert list(np.asarray(ext.is_torsion_free())) == [False] * 7 + [True]


def test_small_order_vs_identity():
    """(0, -1) has small order but is not the identity
    (/root/reference/src/lib.rs:1730-1754)."""
    p = AffinePoint.from_raw_unchecked(0, oracle.Q - 1, ())
    e = p.to_extended()
    assert bool(np.asarray(e.is_small_order()))
    assert not bool(np.asarray(e.is_identity()))
    assert not bool(np.asarray(e.is_prime_order()))


def test_find_curve_generator():
    """The hard-coded generator is on the curve, has order 8r, and v=11
    (/root/reference/src/lib.rs:1380-1396, :1698-1728)."""
    g = full_generator()
    assert bool(np.asarray(g.is_on_curve()))
    assert ints(g.v)[0] == 11
    e = g.to_extended()
    assert not bool(np.asarray(e.is_small_order()))
    assert not bool(np.asarray(e.is_torsion_free()))
    # [r]G has small order; [8r]G is the identity
    rg = mul_const_scalar(e, oracle.R)
    assert bool(np.asarray(rg.is_small_order()))
    assert bool(np.asarray(rg.mul_by_cofactor().is_identity()))


def test_mul_consistency_across_representations():
    """a * b == c scalar triple; all point types and both ladder styles agree
    (/root/reference/src/lib.rs:1756-1804)."""
    # arbitrary fixed scalars with c = a*b mod r (the reference uses its own
    # fixed a, b pair; any pair exercises the same consistency property)
    a = 0x2D79DD3ABA2E2971DE43AB28CB1AC5CC949C099416C5A5E31AC1D4ABC9D0B069 % oracle.R
    b = 0x6B9E98835B34E1FBFD7CBBEBCB2C251683FD8435A346D90B5CD8BD45E0B7BEA5 % oracle.R
    c = a * b % oracle.R
    g = full_generator()
    ge = g.to_extended()
    smul = jit_scalar_mul()

    p_ab = smul(mul_extended(ge, Fr.from_int(a)), Fr.from_int(b))
    p_c = smul(ge, Fr.from_int(c))
    expect = oracle.mul(oracle.GENERATOR, c)
    assert aff_ints(p_ab)[0] == expect
    assert aff_ints(p_c)[0] == expect

    # affine-niels (7M) path
    p_aff = batch_normalize(mul_affine(g, Fr.from_int(c)))
    assert aff_ints(p_aff)[0] == expect

    # bit-serial parity path
    kb = bytes_to_arr([c.to_bytes(32, "little")])
    gb = full_generator((1,)).to_extended()
    p_bits = batch_normalize(multiply_bits(gb, kb))
    assert aff_ints(p_bits)[0] == expect


def test_mul_by_zero_and_identity():
    ge = full_generator((3,)).to_extended()
    z = mul_extended(ge, Fr.from_int([0, 0, 0]))
    assert np.asarray(z.is_identity()).all()
    ident = ExtendedPoint.identity((3,))
    m = mul_extended(ident, Fr.from_int([5, 7, 9]))
    assert np.asarray(m.is_identity()).all()


def test_subgroup_point_ops():
    """(/root/reference/src/lib.rs:1119-1239, :1287-1316)."""
    sg = SubgroupPoint.generator((2,))
    s2 = sg + sg
    d2 = sg.double()
    assert np.asarray(s2 == d2).all()
    assert np.asarray((s2 - sg) == sg).all()
    k = Fr.from_int([3, 4])
    m = sg * k
    exp = [oracle.mul(oracle.SUBGROUP_GENERATOR, i) for i in (3, 4)]
    assert aff_ints(batch_normalize(m.inner)) == exp
    assert np.asarray((-sg + sg).is_identity()).all()


def test_clear_cofactor_and_into_subgroup():
    """(/root/reference/src/lib.rs:1340-1354)."""
    ge = full_generator((2,)).to_extended()
    sg = clear_cofactor(ge)
    assert np.asarray(sg.inner.is_torsion_free()).all()
    s, ok = into_subgroup(ge)
    assert not np.asarray(ok).any()
    assert np.asarray(s.inner.is_identity()).all()  # masked to identity
    s2, ok2 = into_subgroup(sg.inner)
    assert np.asarray(ok2).all()
    assert np.asarray(s2.inner == sg.inner).all()


def test_fixed_base_table_matches_variable_base():
    tbl = generator_table()
    ks = [1, 2, 12345, oracle.R - 1]
    k = Fr.from_int(ks)
    fixed = batch_normalize(tbl.mul(k))
    expect = [oracle.mul(oracle.SUBGROUP_GENERATOR, kk) for kk in ks]
    assert aff_ints(fixed) == expect


def test_random_points():
    key = jax.random.PRNGKey(42)
    rp = random_extended(key, (16,))
    aff = batch_normalize(rp)
    assert np.asarray(aff.is_on_curve()).all()
    # not all in subgroup (torsion mixed in): overwhelming probability
    assert not np.asarray(rp.is_torsion_free()).all()
    sp = SubgroupPoint.random(key, (4,))
    assert np.asarray(sp.inner.is_torsion_free()).all()


def test_reduce_sum_and_neg():
    ks = [1, 2, 3, 4, 5, 6, 7]
    pts = mul_extended(full_generator((7,)).to_extended(), Fr.from_int(ks))
    tot = reduce_sum(pts, 0)
    assert aff_ints(batch_normalize(tot))[0] == oracle.mul(oracle.GENERATOR, 28)
    # Sum with negation
    neg_tot = reduce_sum(-pts, 0)
    assert np.asarray((tot + neg_tot).is_identity()).all()
