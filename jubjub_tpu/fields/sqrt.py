"""Square roots, constant-pattern for both field shapes.

Two strategies, selected by the 2-adicity ``s`` of the field (the reference
gets Fr's from src/fr.rs:384-399 and Fq's from the external bls12_381 crate):

  - s == 1 (Fr): p == 3 (mod 4) -> single exponentiation a^((p+1)/4).
  - s large (Fq, s = 32): Tonelli-Shanks recast as a Pohlig-Hellman discrete
    log in the 2-Sylow subgroup.  Writing b = a^t = c^e (c = root of unity of
    order 2^s), each bit of e is extracted with a fixed squaring ladder and
    the root is a^((t+1)/2) * c^(-e/2).  Every lane follows the same
    instruction stream (fixed s*(s-1)/2 masked squarings), the TPU analogue
    of bls12_381's constant-time loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import mont
from .spec import NLIMBS, FieldSpec


def _sqrt_p34(F: FieldSpec, a: jnp.ndarray):
    """s == 1 case (/root/reference/src/fr.rs:384-399)."""
    res = mont.pow_const(F, a, (F.p + 1) // 4)
    ok = mont.eq(F, mont.square(F, res), a)
    return res, ok


def _sylow_consts(F: FieldSpec):
    """Trace-time constant planes for the 2-Sylow discrete log."""
    cinv = F.root_of_unity_inv
    cinv_pows = []      # cinv^(2^i), i = 0..s-1
    x = cinv
    for _ in range(F.s):
        cinv_pows.append(x)
        x = x * x % F.p
    # cinv^(2^(i-1)) for i >= 1 (dummy 1 at i=0): the e_i-bit correction to
    # the root candidate.
    half_pows = [1] + cinv_pows[: F.s - 1]
    stack = lambda vals: jnp.asarray(
        np.stack([F.np_mont(v) for v in vals]))  # (s, 16)
    return stack(cinv_pows), stack(half_pows)


def _sqrt_tonelli_shanks(F: FieldSpec, a: jnp.ndarray):
    s = F.s
    batch = a.shape[1:]
    w = mont.pow_const(F, a, (F.t - 1) // 2)
    x = mont.mul(F, a, w)        # a^((t+1)/2): root candidate modulo 2-Sylow part
    b = mont.mul(F, x, w)        # a^t = c^e in the 2-Sylow subgroup
    minus_one = mont.const_mont(F, F.p - 1, batch)

    cinv_pows, half_pows = _sylow_consts(F)
    bshape = (1,) * len(batch)

    def outer(i, carry):
        d, corr, odd = carry
        # sgn = d^(2^(s-1-i)) in {+1, -1}; masked fixed-length square ladder.
        def inner(j, t):
            return mont.select(j < s - 1 - i, mont.square(F, t), t)
        sgn = jax.lax.fori_loop(0, s - 1, inner, d)
        ei = mont.eq(F, sgn, minus_one)  # bit i of e
        d = mont.select(ei, mont.mul(F, d, cinv_pows[i].reshape((NLIMBS,) + bshape)), d)
        corr = mont.select(ei & (i > 0),
                           mont.mul(F, corr, half_pows[i].reshape((NLIMBS,) + bshape)),
                           corr)
        odd = odd | (ei & (i == 0))
        return d, corr, odd

    init = (b, mont.one(F, batch), jnp.zeros(batch, bool))
    _, corr, odd = jax.lax.fori_loop(0, s, outer, init)

    res = mont.mul(F, x, corr)   # a^((t+1)/2) * c^(-e/2)
    zero_in = mont.is_zero(F, a)
    ok = (~odd) | zero_in        # QR iff e even; sqrt(0) = 0
    res = mont.select(zero_in, jnp.zeros_like(res), res)
    return res, ok


def sqrt(F: FieldSpec, a: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(sqrt(a), is_square). Non-residues yield ok=False (value undefined)."""
    if F.s == 1:
        return _sqrt_p34(F, a)
    return _sqrt_tonelli_shanks(F, a)


def sqrt_ratio(F: FieldSpec, num: jnp.ndarray, div: jnp.ndarray):
    """ff::Field::sqrt_ratio semantics (used via ff::helpers by the reference,
    /root/reference/src/fr.rs:704-706): returns (is_square, x) where
    x = sqrt(num/div) if num/div is square, else sqrt(G_root * num/div);
    div == 0 gives (False, 0); num == 0 gives (True, 0)."""
    div_inv, div_ok = mont.invert(F, div)
    ratio = mont.mul(F, num, div_inv)
    root, is_sq = sqrt(F, ratio)
    alt = mont.mul_const(F, ratio, F.root_of_unity)  # ROOT_OF_UNITY * ratio
    alt_root, _ = sqrt(F, alt)                       # is square iff ratio is not
    num_zero = mont.is_zero(F, num)
    x = mont.select(is_sq, root, alt_root)
    x = mont.select(num_zero | ~div_ok, jnp.zeros_like(x), x)
    return (is_sq | num_zero) & div_ok, x
