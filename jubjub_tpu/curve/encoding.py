"""Canonical 32-byte point encoding, batched, with ZIP-216 semantics.

Encoding: little-endian bytes of v with sign-of-u (its canonical parity) in
the MSB of byte 31 (/root/reference/src/lib.rs:455-464).

Decoding solves u^2 = (v^2 - 1) / (1 + d v^2), takes a square root, fixes the
sign, and — when ZIP 216 is enabled — rejects the two non-canonical
"negative zero" encodings (/root/reference/src/lib.rs:469-534).

This implementation is batched by construction: the per-element field
inversion is replaced with one ``batch_invert`` across the whole batch, the
structure of the reference's alloc-gated ``batch_from_bytes``
(/root/reference/src/lib.rs:536-627).  The denominator ``1 + d v^2`` is never
zero because -1/d is a non-residue (proof cited at lib.rs:507-510), so the
batch inversion's nonzero precondition always holds for canonical v.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import oracle
from ..fields import Fq, mont, sqrt as sqrt_mod
from ..fields.element import FQ_SPEC
from .points import AffinePoint, select_point


def affine_to_bytes(p: AffinePoint) -> jnp.ndarray:
    """uint8 (32, *batch) (/root/reference/src/lib.rs:455-464)."""
    b = p.v.to_bytes()
    sign = (mont.to_canonical(FQ_SPEC, p.u.limbs)[0] & 1).astype(jnp.uint8)
    return b.at[31].set(b[31] | (sign << 7))


def affine_from_bytes(b, zip_216_enabled: bool = True
                      ) -> tuple[AffinePoint, jnp.ndarray]:
    """(point, ok) — invalid lanes decode to the identity with ok=False
    (/root/reference/src/lib.rs:492-534)."""
    b = jnp.asarray(b, jnp.uint8)
    batch = b.shape[1:]
    sign = (b[31] >> 7).astype(jnp.int32)
    b = b.at[31].set(b[31] & 0x7F)

    v, v_ok = Fq.from_bytes(b)
    # Mask garbage limbs from non-canonical v so downstream math stays in
    # range (result is discarded via ok anyway).
    v = v.conditional_select(Fq.zero(batch), v_ok)

    v2 = v.square()
    d = Fq.from_int(oracle.EDWARDS_D, batch)
    num = v2 - Fq.one(batch)                     # v^2 - 1
    den = v2 * d + Fq.one(batch)                 # d v^2 + 1, never zero

    from ..fields.spec import NLIMBS
    flat = den.limbs.reshape((NLIMBS, -1))
    den_inv = Fq(mont.batch_invert(FQ_SPEC, flat, axis=1).reshape(den.limbs.shape))
    u2 = num * den_inv

    u, sq_ok = Fq(u2.limbs).sqrt()

    # Fix sign: flip u if its parity differs from the sign bit
    # (/root/reference/src/lib.rs:516-520).
    flip = u.is_odd() != (sign == 1)
    u = u.conditional_select(-u, ~flip)

    ok = v_ok & sq_ok
    if zip_216_enabled:
        # Reject non-canonical sign-of-zero (/root/reference/src/lib.rs:522-531).
        ok = ok & ~(u.is_zero() & (sign == 1))

    p = AffinePoint(u=u, v=v)
    return select_point(ok, p, AffinePoint.identity(batch)), ok
