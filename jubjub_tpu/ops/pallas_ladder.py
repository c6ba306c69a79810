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
from ..curve.scalar_mul import NWINDOWS, window_digits
from ..fields import Fq, Fr
from ..fields.element import FQ_SPEC
from ..fields.spec import NLIMBS
from .pallas_mont import _interpret

DEFAULT_BLOCK = 512  # blk=512 beats 1024 on v5e (better grid parallelism)
_COORDS = ("v_plus_u", "v_minus_u", "z", "t2d")


def _ladder_kernel(pu, pv, pz, pt1, pt2, digits, ou, ov, oz, ot1, ot2,
                   *scratch):
    tbl = scratch[:4]   # 4 niels coords, each (16, 16, BT) VMEM
    BT = pu.shape[1]

    base = ExtendedPoint(u=Fq(pu[:]), v=Fq(pv[:]), z=Fq(pz[:]),
                         t1=Fq(pt1[:]), t2=Fq(pt2[:]))
    base_n = base.to_niels()

    # table[0] = identity, table[i] = niels([i]P)
    ident = ExtendedNielsPoint.identity((BT,))
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

    ident_e = ExtendedPoint.identity((BT,))
    init = (ident_e.u.limbs, ident_e.v.limbs, ident_e.z.limbs,
            ident_e.t1.limbs, ident_e.t2.limbs)
    u, v, z, t1, t2 = jax.lax.fori_loop(0, NWINDOWS, body, init)
    ou[:] = u
    ov[:] = v
    oz[:] = z
    ot1[:] = t1
    ot2[:] = t2


@functools.partial(jax.jit, static_argnums=(2,))
def _ladder_flat(point_limbs, digits, block):
    """point_limbs: 5-tuple of (16, N); digits: (63, N) -> (u, v, z)."""
    n = point_limbs[0].shape[1]
    blk = block
    while n % blk:
        blk //= 2

    spec16 = pl.BlockSpec((NLIMBS, blk), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    specd = pl.BlockSpec((NWINDOWS, blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _ladder_kernel,
        grid=(n // blk,),
        in_specs=[spec16] * 5 + [specd],
        out_specs=[spec16] * 5,
        out_shape=[jax.ShapeDtypeStruct((NLIMBS, n), jnp.int32)] * 5,
        interpret=_interpret(),
        scratch_shapes=[pltpu.VMEM((16, NLIMBS, blk), jnp.int32)
                        for _ in range(4)],
    )(*point_limbs, digits)
    return out


def mul_extended_fused(p: ExtendedPoint, scalar: Fr,
                       block: int = DEFAULT_BLOCK) -> ExtendedPoint:
    """Drop-in fused replacement for curve.scalar_mul.mul_extended;
    bit-identical output (same formulas, same window schedule)."""
    shape = p.shape
    n = 1
    for d in shape:
        n *= d
    flat = tuple(x.reshape(NLIMBS, n) for x in
                 (p.u.limbs, p.v.limbs, p.z.limbs, p.t1.limbs, p.t2.limbs))
    digits = window_digits(scalar).reshape(NWINDOWS, n)
    u, v, z, t1, t2 = _ladder_flat(flat, digits, block)
    mk = lambda a: Fq(a.reshape((NLIMBS,) + shape))
    return ExtendedPoint(u=mk(u), v=mk(v), z=mk(z), t1=mk(t1), t2=mk(t2))
