"""Fused Pallas kernel: the entire windowed scalar-mul ladder in VMEM.

One ``pallas_call`` per batch block runs the whole 252-bit ladder — the
16-entry Niels table build (15 additions), then 63 iterations of four
doublings + select-tree + unified addition — with the accumulator, the
table, and every intermediate resident in VMEM.  The XLA-level version
(curve/scalar_mul.py) pays HBM round-trips between fusion boundaries inside
its ``lax.scan``; this kernel removes them.

The arithmetic is literally the same code: the kernel body instantiates the
``points.py`` dataclasses over values read from VMEM refs and calls the same
``double``/``add_extended_niels`` methods, so results are bit-identical.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..curve.points import ExtendedNielsPoint, ExtendedPoint
from ..curve.scalar_mul import NWINDOWS, signed_window_digits, window_digits
from ..fields import Fq, Fr, mont
from ..fields.element import FQ_SPEC
from ..fields.spec import NLIMBS
from .pallas_mont import _interpret

DEFAULT_BLOCK = 1024  # batch lanes per kernel instance (8 sublane rows x 128)
LANE = 128           # TPU lane width: batch is tiled 2-D (rows, 128) so every
                     # per-limb row op fills all 8 sublanes (a 1-D (blk,) batch
                     # would occupy one sublane = 1/8 of the VPU)
_COORDS = ("v_plus_u", "v_minus_u", "z", "t2d")


def _ladder_kernel(pu, pv, pz, pt1, pt2, digits, ou, ov, oz, ot1, ot2,
                   *scratch):
    tbl = scratch[:4]   # 4 niels coords, each (16, 16, R, 128) VMEM
    bshape = pu.shape[1:]  # (R, 128) 2-D tiled batch

    base = ExtendedPoint(u=Fq(pu[:]), v=Fq(pv[:]), z=Fq(pz[:]),
                         t1=Fq(pt1[:]), t2=Fq(pt2[:]))
    base_n = base.to_niels()

    # table[0] = identity, table[i] = niels([i]P)
    ident = ExtendedNielsPoint.identity(bshape)
    for c, ref in zip(_COORDS, tbl):
        ref[0] = getattr(ident, c).limbs
        ref[1] = getattr(base_n, c).limbs

    # table[i] = [i]P via a fori_loop (body traced once — the unrolled
    # version multiplied Mosaic compile time several-fold)
    def build(i, carry):
        acc = ExtendedPoint(*[Fq(x) for x in carry])
        acc = acc.add_extended_niels(base_n)
        an = acc.to_niels()
        for c, ref in zip(_COORDS, tbl):
            ref[i] = getattr(an, c).limbs
        return (acc.u.limbs, acc.v.limbs, acc.z.limbs,
                acc.t1.limbs, acc.t2.limbs)

    jax.lax.fori_loop(
        2, 16, build,
        (base.u.limbs, base.v.limbs, base.z.limbs, base.t1.limbs,
         base.t2.limbs))

    def select(digit):
        """15-select binary tree per coordinate (constant access pattern)."""
        coords = {}
        for c, ref in zip(_COORDS, tbl):
            rows = [ref[e] for e in range(16)]
            bit = 0
            while len(rows) > 1:
                b = (digit >> bit) & 1
                rows = [jnp.where(b == 1, hi, lo)
                        for lo, hi in zip(rows[0::2], rows[1::2])]
                bit += 1
            coords[c] = Fq(rows[0])
        return ExtendedNielsPoint(**coords)

    def body(i, carry):
        s = ExtendedPoint(*[Fq(x) for x in carry])
        for _ in range(4):
            s = s.double()
        digit = digits[NWINDOWS - 1 - i]
        s = s.add_extended_niels(select(digit))
        return (s.u.limbs, s.v.limbs, s.z.limbs, s.t1.limbs, s.t2.limbs)

    ident_e = ExtendedPoint.identity(bshape)
    init = (ident_e.u.limbs, ident_e.v.limbs, ident_e.z.limbs,
            ident_e.t1.limbs, ident_e.t2.limbs)
    u, v, z, t1, t2 = jax.lax.fori_loop(0, NWINDOWS, body, init)
    ou[:] = u
    ov[:] = v
    oz[:] = z
    ot1[:] = t1
    ot2[:] = t2


def _ladder_kernel_signed(pu, pv, pz, pt1, pt2, digits, ou, ov, oz, ot1, ot2,
                          *scratch):
    """Signed-window variant: digits in [-8, 8] (64 rows, row 63 = the final
    carry in {0, 1}).  The Niels table holds only [1]P..[8]P — half the VMEM
    scratch and table-build cost of the unsigned kernel — and negation is a
    coordinate swap plus one bounded field negation (cf. the Neg impl,
    /root/reference/src/lib.rs:92-104, lifted through to_niels).

    Output is the same group element as the unsigned ladder but (in general) a
    different projective representative: compare with ct_eq / batch_normalize,
    not limb equality."""
    tbl = scratch[:4]   # 4 niels coords, each (8, NLIMBS, R, 128) VMEM
    bshape = pu.shape[1:]

    base = ExtendedPoint(u=Fq(pu[:]), v=Fq(pv[:]), z=Fq(pz[:]),
                         t1=Fq(pt1[:]), t2=Fq(pt2[:]))
    base_n = base.to_niels()
    for c, ref in zip(_COORDS, tbl):
        ref[0] = getattr(base_n, c).limbs  # [1]P

    def build(i, carry):
        acc = ExtendedPoint(*[Fq(x) for x in carry])
        acc = acc.add_extended_niels(base_n)  # [i+1]P
        an = acc.to_niels()
        for c, ref in zip(_COORDS, tbl):
            ref[i] = getattr(an, c).limbs
        return (acc.u.limbs, acc.v.limbs, acc.z.limbs,
                acc.t1.limbs, acc.t2.limbs)

    jax.lax.fori_loop(
        1, 8, build,
        (base.u.limbs, base.v.limbs, base.z.limbs, base.t1.limbs,
         base.t2.limbs))

    ident_n = ExtendedNielsPoint.identity(bshape)

    def select(digit):
        """|digit| in [0, 8] -> niels(sign(digit) * [|digit|]P).

        3-bit select tree over the 8 real entries (7 selects/coord vs 15 for
        the unsigned 16-entry table), then a masked negation (swap
        v_plus_u/v_minus_u, negate t2d) and a masked identity override."""
        neg = digit < 0
        is_zero = digit == 0
        idx = jnp.maximum(jnp.abs(digit) - 1, 0)  # [0, 7]
        coords = {}
        for c, ref in zip(_COORDS, tbl):
            rows = [ref[e] for e in range(8)]
            bit = 0
            while len(rows) > 1:
                b = (idx >> bit) & 1
                rows = [jnp.where(b == 1, hi, lo)
                        for lo, hi in zip(rows[0::2], rows[1::2])]
                bit += 1
            coords[c] = rows[0]
        vpu = jnp.where(neg, coords["v_minus_u"], coords["v_plus_u"])
        vmu = jnp.where(neg, coords["v_plus_u"], coords["v_minus_u"])
        # table t2d < 2p (mul output), so k=2 covers the negation
        t2d = jnp.where(neg, mont.neg(FQ_SPEC, coords["t2d"], k=2),
                        coords["t2d"])
        picked = ExtendedNielsPoint(v_plus_u=Fq(vpu), v_minus_u=Fq(vmu),
                                    z=Fq(coords["z"]), t2d=Fq(t2d))
        return jax.tree_util.tree_map(
            lambda i_, p_: jnp.where(is_zero, i_, p_), ident_n, picked)

    def body(i, carry):
        s = ExtendedPoint(*[Fq(x) for x in carry])
        for _ in range(4):
            s = s.double()
        s = s.add_extended_niels(select(digits[NWINDOWS - 1 - i]))
        return (s.u.limbs, s.v.limbs, s.z.limbs, s.t1.limbs, s.t2.limbs)

    # Fold the carry digit (row 63, in {0, 1}) into the accumulator init:
    # acc = carry ? [1]P : identity — no extra window of doublings.
    ident_e = ExtendedPoint.identity(bshape)
    top = digits[NWINDOWS] == 1
    init = tuple(
        jnp.where(top, b_, i_) for b_, i_ in zip(
            (base.u.limbs, base.v.limbs, base.z.limbs, base.t1.limbs,
             base.t2.limbs),
            (ident_e.u.limbs, ident_e.v.limbs, ident_e.z.limbs,
             ident_e.t1.limbs, ident_e.t2.limbs)))
    u, v, z, t1, t2 = jax.lax.fori_loop(0, NWINDOWS, body, init)
    ou[:] = u
    ov[:] = v
    oz[:] = z
    ot1[:] = t1
    ot2[:] = t2


@functools.partial(jax.jit, static_argnums=(2, 3))
def _ladder_flat_signed(point_limbs, digits, block, windows):
    """Signed-digit ladder: digits (windows, N) int32 in [-8, 8]."""
    n = point_limbs[0].shape[1]
    assert n % LANE == 0
    rows = n // LANE
    blk_rows = max(block // LANE, 1)
    while rows % blk_rows:
        blk_rows //= 2
    if blk_rows % 8 and blk_rows != rows:
        blk_rows = rows

    p3 = tuple(x.reshape(NLIMBS, rows, LANE) for x in point_limbs)
    d3 = digits.reshape(windows, rows, LANE)

    spec16 = pl.BlockSpec((NLIMBS, blk_rows, LANE), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)
    specd = pl.BlockSpec((windows, blk_rows, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _ladder_kernel_signed,
        grid=(rows // blk_rows,),
        in_specs=[spec16] * 5 + [specd],
        out_specs=[spec16] * 5,
        out_shape=[jax.ShapeDtypeStruct((NLIMBS, rows, LANE), jnp.int32)] * 5,
        interpret=_interpret(),
        scratch_shapes=[pltpu.VMEM((8, NLIMBS, blk_rows, LANE), jnp.int32)
                        for _ in range(4)],
    )(*p3, d3)
    return [x.reshape(NLIMBS, n) for x in out]


@functools.partial(jax.jit, static_argnums=(2,))
def _ladder_flat(point_limbs, digits, block):
    """point_limbs: 5-tuple of (16, N); digits: (63, N) -> (u, v, z).

    N must be a multiple of 128; the batch is viewed as (N//128, 128) so all
    per-limb ops inside the kernel are full (8, 128) vreg tiles."""
    n = point_limbs[0].shape[1]
    assert n % LANE == 0
    rows = n // LANE
    blk_rows = max(block // LANE, 1)
    while rows % blk_rows:
        blk_rows //= 2
    if blk_rows % 8 and blk_rows != rows:
        # Mosaic needs the sublane block dim to be 8-aligned (or whole).
        blk_rows = rows

    p3 = tuple(x.reshape(NLIMBS, rows, LANE) for x in point_limbs)
    d3 = digits.reshape(NWINDOWS, rows, LANE)

    spec16 = pl.BlockSpec((NLIMBS, blk_rows, LANE), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)
    specd = pl.BlockSpec((NWINDOWS, blk_rows, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _ladder_kernel,
        grid=(rows // blk_rows,),
        in_specs=[spec16] * 5 + [specd],
        out_specs=[spec16] * 5,
        out_shape=[jax.ShapeDtypeStruct((NLIMBS, rows, LANE), jnp.int32)] * 5,
        interpret=_interpret(),
        scratch_shapes=[pltpu.VMEM((16, NLIMBS, blk_rows, LANE), jnp.int32)
                        for _ in range(4)],
    )(*p3, d3)
    return [x.reshape(NLIMBS, n) for x in out]


def mul_extended_fused(p: ExtendedPoint, scalar: Fr,
                       block: int | None = None,
                       signed: bool | None = None) -> ExtendedPoint:
    """Drop-in fused replacement for curve.scalar_mul.mul_extended;
    bit-identical output with ``signed=False`` (same formulas, same window
    schedule).  ``signed=True`` runs the signed-digit kernel instead: half
    the Niels table build and a 3-bit select tree — the same group element
    in a (generally) different projective representative."""
    from .. import config
    block = config.LADDER_BLOCK if block is None else block
    signed = config.LADDER_SIGNED if signed is None else signed
    shape = p.shape
    n = 1
    for d in shape:
        n *= d
    pad = (-n) % LANE
    flat = tuple(x.reshape(NLIMBS, n) for x in
                 (p.u.limbs, p.v.limbs, p.z.limbs, p.t1.limbs, p.t2.limbs))
    nrows = NWINDOWS + 1 if signed else NWINDOWS
    recode = signed_window_digits if signed else window_digits
    digits = recode(scalar).reshape(nrows, n)
    if pad:
        # Pad with copies of lane 0 (any valid point/scalar data works; the
        # padded lanes are dropped below).
        flat = tuple(jnp.concatenate([x, jnp.broadcast_to(x[:, :1], (NLIMBS, pad))],
                                     axis=1) for x in flat)
        digits = jnp.concatenate(
            [digits, jnp.broadcast_to(digits[:, :1], (nrows, pad))], axis=1)
    if signed:
        u, v, z, t1, t2 = _ladder_flat_signed(flat, digits, block, nrows)
    else:
        u, v, z, t1, t2 = _ladder_flat(flat, digits, block)
    mk = lambda a: Fq(a[:, :n].reshape((NLIMBS,) + shape))
    return ExtendedPoint(u=mk(u), v=mk(v), z=mk(z), t1=mk(t1), t2=mk(t2))
