"""Fused Pallas kernel: MSM window sums, VMEM-resident.

The XLA formulation of ``parallel.msm.window_sums`` broadcasts each chunk's
16-entry multiples table across all 63 windows, materializing
(16, NLIMBS, 63, chunk) intermediates in HBM — measured 76k points/s at
2^20 on a v5e chip, ~50x below the VPU ceiling.  This kernel keeps the
whole per-block computation in VMEM, the same recipe that took the
variable-base ladder from 105k to 10M+ ops/s.

Shape strategy (v2): every lane-row slot of a block is an INDEPENDENT
accumulator — no in-kernel narrowing.  A block of R x 128 points and a
group of W windows:

    for w in group:  acc[w] += select(table, digits[w])   # (NLIMBS,R,128)

is one full-width unified addition per window per block (the VPU's native
tile), and the R*128 partial accumulators per window are tree-reduced once
at the XLA level afterwards.  The 63 windows are split into groups along a
second grid axis so the per-group accumulators fit VMEM next to the
16-entry Niels multiples table; each group revisits the point blocks
(extra HBM reads are negligible next to the arithmetic).

Cost per point: ~63 unified additions + one table-build share — the same
arithmetic as the reference-style per-chunk windowing, with zero HBM
round-trips inside a block.  Results are the same group elements as
``parallel.msm.window_sums`` (identical formulas and tables; the reduction
order of the commutative partial sums differs, so compare group-equal).
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
from ..fields.spec import NLIMBS
from .pallas_mont import _interpret

LANE = 128
BLOCK_ROWS = 8   # points per block = BLOCK_ROWS * 128
WGROUP = 16      # windows per grid group; 63 pads to 64 = 4 groups
_COORDS = ("v_plus_u", "v_minus_u", "z", "t2d")


def _window_sums_kernel(pu, pv, pz, pt1, pt2, digits, ou, ov, oz, ot1, ot2,
                        *scratch):
    tbl = scratch[:4]   # niels coords, each (16, NLIMBS, R, 128) VMEM
    bshape = pu.shape[1:]          # (R, 128)

    base = ExtendedPoint(u=Fq(pu[:]), v=Fq(pv[:]), z=Fq(pz[:]),
                         t1=Fq(pt1[:]), t2=Fq(pt2[:]))
    base_n = base.to_niels()
    ident_n = ExtendedNielsPoint.identity(bshape)
    for c, ref in zip(_COORDS, tbl):
        ref[0] = getattr(ident_n, c).limbs
        ref[1] = getattr(base_n, c).limbs

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
        """Binary select tree: digit (R, 128) -> Niels entry (NLIMBS, R, 128)."""
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

    first = pl.program_id(1) == 0  # first point block of this window group
    ident_e = ExtendedPoint.identity(bshape)
    nwin = digits.shape[0]

    def window(w, _):
        sel = select(digits[w])
        prev = ExtendedPoint(u=Fq(ou[w]), v=Fq(ov[w]), z=Fq(oz[w]),
                             t1=Fq(ot1[w]), t2=Fq(ot2[w]))
        prev = jax.tree_util.tree_map(
            lambda p_, i_: jnp.where(first, i_, p_), prev, ident_e)
        acc = prev.add_extended_niels(sel)   # full (R, 128) width
        ou[w] = acc.u.limbs
        ov[w] = acc.v.limbs
        oz[w] = acc.z.limbs
        ot1[w] = acc.t1.limbs
        ot2[w] = acc.t2.limbs
        return 0

    jax.lax.fori_loop(0, nwin, window, 0)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _window_sums_flat(point_limbs, digits, block_rows, wgroup):
    """point_limbs: 5x(NLIMBS, N); digits: (64, N) ->
    5x(64, NLIMBS, block_rows, 128) per-lane-row partial accumulators."""
    n = point_limbs[0].shape[1]
    nwin_pad = digits.shape[0]
    assert n % LANE == 0 and nwin_pad % wgroup == 0
    rows = n // LANE
    blk = block_rows
    while rows % blk:
        blk //= 2

    p3 = tuple(x.reshape(NLIMBS, rows, LANE) for x in point_limbs)
    d3 = digits.reshape(nwin_pad, rows, LANE)

    spec16 = pl.BlockSpec((NLIMBS, blk, LANE), lambda g, b: (0, b, 0),
                          memory_space=pltpu.VMEM)
    specd = pl.BlockSpec((wgroup, blk, LANE), lambda g, b: (g, b, 0),
                         memory_space=pltpu.VMEM)
    speco = pl.BlockSpec((wgroup, NLIMBS, blk, LANE),
                         lambda g, b: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _window_sums_kernel,
        grid=(nwin_pad // wgroup, rows // blk),
        in_specs=[spec16] * 5 + [specd],
        out_specs=[speco] * 5,
        out_shape=[jax.ShapeDtypeStruct((nwin_pad, NLIMBS, blk, LANE),
                                        jnp.int32)] * 5,
        interpret=_interpret(),
        scratch_shapes=[pltpu.VMEM((16, NLIMBS, blk, LANE), jnp.int32)
                        for _ in range(4)],
    )(*p3, d3)
    return out


def window_sums_fused(points: ExtendedPoint, scalars: Fr,
                      block_rows: int = BLOCK_ROWS,
                      wgroup: int = WGROUP) -> ExtendedPoint:
    """Per-window digit-weighted sums W_w = sum_i digit_w(k_i) * P_i.

    Drop-in replacement for ``parallel.msm.window_sums`` on TPU: returns an
    ExtendedPoint batch of shape (63,).  ``len(points)`` is padded to a
    lane multiple with identity points (zero contribution)."""
    from ..curve.points import reduce_sum
    (n,) = points.shape
    pad = (-n) % LANE
    if pad:
        ident = ExtendedPoint.identity((pad,))
        points = jax.tree_util.tree_map(
            lambda a, i: jnp.concatenate([a, i], axis=1), points, ident)
        scalars = Fr(jnp.concatenate(
            [scalars.limbs, jnp.zeros_like(scalars.limbs[:, :pad])], axis=1))
        n += pad
    flat = tuple(x.reshape(NLIMBS, n) for x in
                 (points.u.limbs, points.v.limbs, points.z.limbs,
                  points.t1.limbs, points.t2.limbs))
    digits = window_digits(scalars).reshape(NWINDOWS, n)
    wpad = (-NWINDOWS) % wgroup
    if wpad:
        # padded windows see all-zero digits -> identity accumulators
        digits = jnp.concatenate(
            [digits, jnp.zeros((wpad, n), digits.dtype)], axis=0)
    u, v, z, t1, t2 = _window_sums_flat(flat, digits, block_rows, wgroup)
    mk = lambda a: Fq(a[:NWINDOWS].transpose(1, 0, 2, 3)
                      .reshape(NLIMBS, NWINDOWS, -1))
    lanes = ExtendedPoint(u=mk(u), v=mk(v), z=mk(z), t1=mk(t1), t2=mk(t2))
    # reduce the per-lane-row partials per window: (63, R*128) -> (63,)
    return reduce_sum(lanes, axis=1)


def msm_fused(points: ExtendedPoint, scalars: Fr) -> ExtendedPoint:
    """Single-device MSM via the fused window-sums kernel + Horner spine."""
    from ..parallel.msm import horner_spine
    return horner_spine(window_sums_fused(points, scalars))
