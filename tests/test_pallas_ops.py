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
