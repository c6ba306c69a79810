"""Pallas kernel tests (interpreter mode on CPU; same code compiles to
Mosaic on TPU).  Verifies bit-identity with the jnp reference path."""

import jax
import jax.numpy as jnp
import jax.random as jr
import pytest

from jubjub_tpu.fields import Fq, Fr, mont
from jubjub_tpu.fields.element import FQ_SPEC as F
from jubjub_tpu.ops import pallas_mont


def test_pallas_mont_mul_matches():
    a = Fq.random(jr.PRNGKey(0), (256,)).limbs
    b = Fq.random(jr.PRNGKey(1), (256,)).limbs
    ref = mont.mul(F, a, b)
    got = pallas_mont.mont_mul(F, a, b, 128)
    assert bool(jnp.all(ref == got))


def test_pallas_mont_square_matches():
    a = Fq.random(jr.PRNGKey(2), (256,)).limbs
    ref = mont.square(F, a)
    got = pallas_mont.mont_square(F, a, 128)
    assert bool(jnp.all(ref == got))


def test_mxu_reduce_bit_identity():
    """_mont_reduce_matmul is bit-identical to _mont_reduce_rows: the same
    mul/square inputs must produce the same lazy (< 2p) limb planes."""
    a = Fq.random(jr.PRNGKey(7), (256,)).limbs
    b = Fq.random(jr.PRNGKey(8), (256,)).limbs
    ref_mul = mont.mul(F, a, b)
    ref_sq = mont.square(F, a)
    with mont.use_mxu_reduce(F):
        got_mul = mont.mul(F, a, b)
        got_sq = mont.square(F, a)
    assert bool(jnp.all(ref_mul == got_mul))
    assert bool(jnp.all(ref_sq == got_sq))
    # and for Fr (different INV/modulus constants)
    from jubjub_tpu.fields.element import FR_SPEC
    ar = Fr.random(jr.PRNGKey(9), (64,)).limbs
    br = Fr.random(jr.PRNGKey(10), (64,)).limbs
    ref_r = mont.mul(FR_SPEC, ar, br)
    with mont.use_mxu_reduce(FR_SPEC):
        got_r = mont.mul(FR_SPEC, ar, br)
    assert bool(jnp.all(ref_r == got_r))


def test_fixed_base_fused_matches_oracle():
    """The headline bench kernel (fixed_base_mul_fused) vs the Python-int
    oracle, via the Pallas CPU interpreter — exact scalar-mul equality, not
    just an on-curve check."""
    from jubjub_tpu import oracle
    from jubjub_tpu.curve.points import batch_normalize
    from jubjub_tpu.curve.scalar_mul import affine_niels_chunk_table_host
    from jubjub_tpu.ops.pallas_fixed_base import fixed_base_mul_fused

    ks = [0, 1, 2, 0xDEADBEEF, oracle.R - 1,
          0x0123456789ABCDEF0123456789ABCDEF0123456789ABCDEF0123456789ABCDE]
    k = Fr.from_int(ks)
    table = affine_niels_chunk_table_host(oracle.SUBGROUP_GENERATOR, 8)
    out = batch_normalize(fixed_base_mul_fused(table, k))
    us, vs = out.u.to_ints(), out.v.to_ints()
    for i, kv in enumerate(ks):
        eu, ev = oracle.mul(oracle.SUBGROUP_GENERATOR, kv % oracle.R)
        assert (us[i], vs[i]) == (eu, ev), f"lane {i}"


def test_signed_window_digits_wide_recoding():
    """Signed recoding reconstructs the scalar with |digit| <= 2^(w-1)."""
    import numpy as np
    from jubjub_tpu import oracle
    from jubjub_tpu.curve.scalar_mul import (signed_digit_windows,
                                             signed_window_digits_wide)
    for wbits in (8, 9):
        ks = [0, 1, 128, 255, 256, oracle.R - 1, (1 << 252) // 3,
              int.from_bytes(b"\xff" * 31 + b"\x0f", "little") % oracle.R]
        digs = np.asarray(signed_window_digits_wide(Fr.from_int(ks), wbits))
        assert digs.shape[0] == signed_digit_windows(wbits)
        half = 1 << (wbits - 1)
        assert digs.min() >= -(half - 1) and digs.max() <= half
        for i, kv in enumerate(ks):
            got = sum(int(digs[w, i]) << (wbits * w)
                      for w in range(digs.shape[0]))
            assert got == kv % oracle.R, f"wbits={wbits} lane {i}"


def test_fixed_base_fused_signed_matches_oracle():
    """The signed-digit variant of the headline kernel vs the oracle."""
    from jubjub_tpu import oracle
    from jubjub_tpu.curve.points import batch_normalize
    from jubjub_tpu.curve.scalar_mul import affine_niels_chunk_table_host
    from jubjub_tpu.ops.pallas_fixed_base import fixed_base_mul_fused

    ks = [0, 1, 128, oracle.R - 1, 0xDEADBEEF,
          0x0123456789ABCDEF0123456789ABCDEF0123456789ABCDEF0123456789ABCDE]
    k = Fr.from_int(ks)
    table = affine_niels_chunk_table_host(oracle.SUBGROUP_GENERATOR, 8, True)
    out = batch_normalize(fixed_base_mul_fused(table, k, signed=True))
    us, vs = out.u.to_ints(), out.v.to_ints()
    for i, kv in enumerate(ks):
        eu, ev = oracle.mul(oracle.SUBGROUP_GENERATOR, kv % oracle.R)
        assert (us[i], vs[i]) == (eu, ev), f"lane {i}"


@pytest.mark.skipif("jax.default_backend() != 'tpu'")
def test_pallas_ladder_matches():
    """Full fused ladder vs the scan ladder.

    TPU-only: the interpreter would execute ~5M traced ops per lane on CPU
    (hours).  The same bit-identity check runs on real hardware in the
    bench/verification flow."""
    from jubjub_tpu.curve import full_generator, mul_extended
    from jubjub_tpu.ops.pallas_ladder import mul_extended_fused

    B = 8
    k = Fr.random(jr.PRNGKey(3), (B,))
    g = mul_extended(full_generator((B,)).to_extended(),
                     Fr.from_int(list(range(2, B + 2))))
    ref = mul_extended(g, k)
    got = mul_extended_fused(g, k, block=8)
    for name in ("u", "v", "z", "t1", "t2"):
        assert bool(jnp.all(getattr(ref, name).limbs
                            == getattr(got, name).limbs)), name


@pytest.mark.skipif("jax.default_backend() != 'tpu'")
def test_pallas_ladder_signed_matches():
    """Signed-digit fused ladder vs the scan ladder: same group element
    (different projective representative -> compare via ct_eq)."""
    from jubjub_tpu.curve import full_generator, mul_extended
    from jubjub_tpu.ops.pallas_ladder import mul_extended_fused

    B = 8
    k = Fr.random(jr.PRNGKey(4), (B,))
    g = mul_extended(full_generator((B,)).to_extended(),
                     Fr.from_int(list(range(3, B + 3))))
    ref = mul_extended(g, k)
    got = mul_extended_fused(g, k, block=8, signed=True)
    assert bool(jnp.all(ref.ct_eq(got)))
