"""Fused Pallas kernel: streaming per-lane point prefix scan.

Building block of the sorted-scan (bucket-free Pippenger) MSM in
``parallel/pippenger.py``.  Input is a digit-sorted stream of Niels points
arranged so that lane slot ``l`` of the (R, 128) tile owns the contiguous
sorted run ``[l*run, (l+1)*run)``; the kernel walks the ``run`` steps
sequentially, keeping one extended-point accumulator per lane slot in VMEM
scratch, and emits the running prefix after every step:

    stream[s, l] = sum_{s' <= s} P_sorted[l*run + s']

Every step is ONE full-width (R, 128) unified addition — n group adds total
for n points, the Pippenger bucket-accumulation rate — with zero HBM
round-trips for the accumulators.  Bucket sums are then recovered OUTSIDE
the kernel as prefix differences at the digit boundaries (no scatter
anywhere; see parallel/pippenger.py for the suffix-sum identity).

No reference counterpart (zkcrypto/jubjub has no MSM); the per-addition
arithmetic is the same HWCD unified formula as everywhere else
(/root/reference/src/lib.rs:883-920).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..curve.points import ExtendedNielsPoint, ExtendedPoint
from ..fields import Fq, mont
from ..fields.element import FQ_SPEC
from ..fields.spec import NLIMBS
from .pallas_mont import _interpret

LANE = 128
_NCOORDS = ("v_plus_u", "v_minus_u", "z", "t2d")
_ECOORDS = ("u", "v", "z", "t1", "t2")


def _scan_kernel(vpu, vmu, zz, t2d, ou, ov, oz, ot1, ot2, *acc,
                 steps_per_block: int):
    """One grid step: consume a (S, NLIMBS, R, 128) block of sorted Niels
    points, advance the per-lane accumulators, write the prefix stream."""
    bshape = vpu.shape[2:]  # (R, 128)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        ident = ExtendedPoint.identity(bshape)
        for name, ref in zip(_ECOORDS, acc):
            ref[:] = getattr(ident, name).limbs

    def step(s, carry):
        p = ExtendedPoint(*[Fq(x) for x in carry])
        niels = ExtendedNielsPoint(
            v_plus_u=Fq(vpu[s]), v_minus_u=Fq(vmu[s]),
            z=Fq(zz[s]), t2d=Fq(t2d[s]))
        nxt = p.add_extended_niels(niels)
        ou[s] = nxt.u.limbs
        ov[s] = nxt.v.limbs
        oz[s] = nxt.z.limbs
        ot1[s] = nxt.t1.limbs
        ot2[s] = nxt.t2.limbs
        return (nxt.u.limbs, nxt.v.limbs, nxt.z.limbs,
                nxt.t1.limbs, nxt.t2.limbs)

    carry = jax.lax.fori_loop(
        0, steps_per_block, step, tuple(ref[:] for ref in acc))
    for ref, val in zip(acc, carry):
        ref[:] = val


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def prefix_scan_stream(niels_coords, rows: int, steps_per_block: int = 8,
                       interpret: bool | None = None):
    """niels_coords: 4 x (run, NLIMBS, rows, 128) digit-sorted Niels planes
    -> 5 x (run, NLIMBS, rows, 128) extended-point prefix stream.

    ``rows*128`` independent lanes each scan their own ``run``-point
    sorted segment; grid steps are sequential (TPU guarantee) so the VMEM
    scratch accumulators carry across blocks."""
    interpret = _interpret() if interpret is None else interpret
    run = niels_coords[0].shape[0]
    sblk = steps_per_block
    while run % sblk:
        sblk //= 2

    spec_in = pl.BlockSpec((sblk, NLIMBS, rows, LANE),
                           lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_scan_kernel, steps_per_block=sblk),
        grid=(run // sblk,),
        in_specs=[spec_in] * 4,
        out_specs=[spec_in] * 5,
        out_shape=[jax.ShapeDtypeStruct((run, NLIMBS, rows, LANE), jnp.int32)
                   for _ in range(5)],
        scratch_shapes=[pltpu.VMEM((NLIMBS, rows, LANE), jnp.int32)
                        for _ in range(5)],
        interpret=interpret,
    )(*niels_coords)
    return out
