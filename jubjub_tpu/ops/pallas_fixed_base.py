"""Fused Pallas kernel: wide-window fixed-base scalar multiplication.

The Pedersen-hash-style fixed-base path (BASELINE config 4).  For a
host-known base B, ``k*B = sum_w [digit_w(k) * 2^(8w)]B`` needs only 32
unified additions (7M each, /root/reference/src/lib.rs:944-968) and ZERO
doublings — the doubling work is baked into the precomputed table.

The per-lane 256-entry table lookup is the part a VPU select tree cannot
afford (255 selects x 3 coords); here it runs on the MXU as a one-hot
matmul: digits one-hot-encode to a (256, n) bf16 matrix, the window's
table slice is a (120, 256) bf16 matrix of 7-bit limb chunks, and one
``dot_general`` selects all 3 coordinates' 40 chunks at once.  Both the
one-hot entries and the chunk values (<= 127) are exact in bf16, and each
output element contracts exactly one nonzero product, so the f32 result is
exact and converts losslessly to int32.

The group arithmetic is the same ``points.py`` code as everywhere else, so
results match the XLA path (``FixedBaseTable.mul``) as group elements.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..curve.points import AffineNielsPoint, ExtendedPoint
from ..fields import Fq, Fr
from ..fields.spec import NLIMBS
from .pallas_mont import _interpret

LANE = 128
DEFAULT_BLOCK = 2048  # batch lanes per kernel instance


def _fixed_base_kernel(dig_ref, tbl_ref, ou, ov, oz, ot1, ot2,
                       signed: bool = False):
    from ..fields import mont
    from ..fields.element import FQ_SPEC
    nwin, nrows, tsize = tbl_ref.shape
    bshape = dig_ref.shape[1:]          # (R, 128)
    n = bshape[0] * bshape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (tsize, n), 0)

    def lookup(w):
        """Window w's table entry via the one-hot MXU matmul.

        Signed mode: the table holds magnitudes [1]B..[tsize]B; the one-hot
        row is |d|-1, negation is a Niels coordinate swap + one bounded
        field negation of t2d (cf. the Neg impl lifted through to_niels,
        /root/reference/src/lib.rs:92-104), and d == 0 is a masked identity
        override.  Halving the one-hot width (the measured cost driver of
        wide windows) is the point."""
        draw = dig_ref[w]
        if signed:
            mag = jnp.abs(draw)
            d = (mag - 1).reshape(1, n)   # zero lanes pick col 0, masked below
        else:
            d = draw.reshape(1, n)
        onehot = (iota == d).astype(jnp.bfloat16)
        sel = jax.lax.dot_general(
            tbl_ref[w], onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        sel = sel.astype(jnp.int32).reshape((2, 3, NLIMBS) + bshape)
        limbs = sel[0] + (sel[1] << 7)   # exact 13-bit limbs
        if not signed:
            return AffineNielsPoint(v_plus_u=Fq(limbs[0]),
                                    v_minus_u=Fq(limbs[1]),
                                    t2d=Fq(limbs[2]))
        neg = draw < 0
        zero = draw == 0
        vpu = jnp.where(neg, limbs[1], limbs[0])
        vmu = jnp.where(neg, limbs[0], limbs[1])
        # table t2d is canonical (< p), so k=1 covers the negation (<= p)
        t2d = jnp.where(neg, mont.neg(FQ_SPEC, limbs[2], k=1), limbs[2])
        onel = mont.one(FQ_SPEC, bshape)
        return AffineNielsPoint(
            v_plus_u=Fq(jnp.where(zero, onel, vpu)),
            v_minus_u=Fq(jnp.where(zero, onel, vmu)),
            t2d=Fq(jnp.where(zero, 0, t2d)))

    def seed_acc(np_: AffineNielsPoint) -> ExtendedPoint:
        """Affine Niels -> Extended directly (saves the identity+P add).

        With s = v+u, d = v-u: (U:V:Z) = (2(s-d) : 2(s+d) : 4) ~ (u:v:1),
        and T1 = s-d = 2u, T2 = s+d = 2v satisfy T1*T2 = 4uv = UV/Z.
        Linear ops only — no field multiplications.  Bounds: s,d < p
        (canonical table entries; the signed overrides stay <= p), so
        t1 < 3p, t2 < 2p; every output is conditionally reduced below 2p,
        restoring the coordinate bound the add formulas assume."""
        s, d = np_.v_plus_u, np_.v_minus_u
        t1 = s.lazy_sub(d, 2)            # == 2u (mod p), < 3p
        t2 = s.lazy_add(d)               # == 2v (mod p), < 2p
        return ExtendedPoint(
            u=t1.lazy_double().reduce_once(3).reduce_once(2),  # <6p -> <2p
            v=t2.lazy_double().reduce_once(2),                 # <4p -> <2p
            z=Fq(mont.const_mont(FQ_SPEC, 4, bshape)),
            t1=t1.reduce_once(2),                              # <3p -> <2p
            t2=t2)

    # On TPU the windows are UNROLLED (static w): every tbl_ref[w]/dig_ref[w]
    # access is a static slice and Mosaic can overlap window w+1's MXU lookup
    # with window w's VPU field arithmetic (the fori_loop form serializes
    # them).  Under the CPU interpreter (tests) the unrolled form multiplies
    # XLA:CPU compile time ~30x, so keep the loop there — same results.
    if _interpret():
        def body(w, carry):
            acc = ExtendedPoint(*[Fq(x) for x in carry])
            acc = acc.add_affine_niels(lookup(w))
            return (acc.u.limbs, acc.v.limbs, acc.z.limbs,
                    acc.t1.limbs, acc.t2.limbs)

        seed = seed_acc(lookup(0))
        init = (seed.u.limbs, seed.v.limbs, seed.z.limbs,
                seed.t1.limbs, seed.t2.limbs)
        u, v, z, t1, t2 = jax.lax.fori_loop(1, nwin, body, init)
        ou[:], ov[:], oz[:], ot1[:], ot2[:] = u, v, z, t1, t2
        return
    acc = seed_acc(lookup(0))
    for w in range(1, nwin):
        acc = acc.add_affine_niels(lookup(w))
    ou[:] = acc.u.limbs
    ov[:] = acc.v.limbs
    oz[:] = acc.z.limbs
    ot1[:] = acc.t1.limbs
    ot2[:] = acc.t2.limbs


@functools.partial(jax.jit, static_argnums=(2, 3))
def _fixed_base_flat(table, digits, block, signed=False):
    """table: (nwin, 120, tsize) bf16; digits: (nwin, N) int32 -> 5x(20, N)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nwin, nrows, tsize = table.shape
    n = digits.shape[1]
    assert n % LANE == 0
    rows = n // LANE
    blk_rows = max(block // LANE, 1)
    while rows % blk_rows:
        blk_rows //= 2
    if blk_rows % 8 and blk_rows != rows:
        blk_rows = rows

    d3 = digits.reshape(nwin, rows, LANE)
    specd = pl.BlockSpec((nwin, blk_rows, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    spect = pl.BlockSpec((nwin, nrows, tsize), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    spec16 = pl.BlockSpec((NLIMBS, blk_rows, LANE), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fixed_base_kernel, signed=signed),
        grid=(rows // blk_rows,),
        in_specs=[specd, spect],
        out_specs=[spec16] * 5,
        out_shape=[jax.ShapeDtypeStruct((NLIMBS, rows, LANE), jnp.int32)] * 5,
        interpret=_interpret(),
    )(d3, table)
    return [x.reshape(NLIMBS, n) for x in out]


def fixed_base_mul_fused(table, scalar: Fr, wbits: int = 8,
                         block: int = DEFAULT_BLOCK,
                         signed: bool = False) -> ExtendedPoint:
    """k*B via the fused wide-window kernel.

    ``table`` comes from ``curve.scalar_mul.affine_niels_chunk_table_host``
    (built with the matching ``signed`` flag).
    """
    from ..curve.scalar_mul import (signed_window_digits_wide,
                                    window_digits_wide)
    shape = scalar.shape
    n = 1
    for d in shape:
        n *= d
    recode = signed_window_digits_wide if signed else window_digits_wide
    digits = recode(scalar, wbits).reshape(-1, n)
    pad = (-n) % LANE
    if pad:
        digits = jnp.concatenate(
            [digits, jnp.broadcast_to(digits[:, :1], (digits.shape[0], pad))],
            axis=1)
    u, v, z, t1, t2 = _fixed_base_flat(table, digits, block, signed)
    mk = lambda a: Fq(a[:, :n].reshape((NLIMBS,) + shape))
    return ExtendedPoint(u=mk(u), v=mk(v), z=mk(z), t1=mk(t1), t2=mk(t2))
