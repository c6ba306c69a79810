"""Pallas TPU kernels for the Montgomery field core and the scalar-mul ladder.

The jnp implementations in ``fields.mont`` are correct and XLA-fusable, but
the hot loops leave scheduling to the compiler across hundreds of small ops.
These kernels pin the whole computation into VMEM: one ``pallas_call``
covers an entire batched field op (or the entire 252-bit ladder), with
operands, tables, and the accumulator resident on-chip.

The kernel bodies *reuse* the exact arithmetic from ``fields.mont`` —
Pallas kernels are jnp programs over VMEM refs, so the same carry-save
Montgomery code runs inside, guaranteeing bit-identical results.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import mont
from ..fields.spec import NLIMBS, FieldSpec

DEFAULT_BLOCK = 2048  # batch lanes per kernel instance (multiple of 128)
LANE = 128            # batch is tiled (rows, 128): full (8, 128) vreg tiles


def _interpret() -> bool:
    """Run kernels through the Pallas interpreter off-TPU (tests on CPU)."""
    return jax.default_backend() != "tpu"


def _flatten_pad(a: jnp.ndarray):
    """(16, *batch) -> (16, rows, 128) padded view + original flat size."""
    n = 1
    for d in a.shape[1:]:
        n *= d
    a2 = a.reshape(NLIMBS, n)
    pad = (-n) % LANE
    if pad:
        a2 = jnp.concatenate(
            [a2, jnp.broadcast_to(a2[:, :1], (NLIMBS, pad))], axis=1)
    return a2.reshape(NLIMBS, (n + pad) // LANE, LANE), n


def _row_block(rows: int, requested: int) -> int:
    b = max(min(requested // LANE, rows), 1)
    while rows % b:
        b //= 2
    if b % 8 and b != rows:
        # Mosaic needs the sublane block dim to be 8-aligned (or whole).
        b = rows
    return max(b, 1)


@functools.partial(jax.jit, static_argnums=(0, 3))
def mont_mul(F: FieldSpec, a: jnp.ndarray, b: jnp.ndarray,
             block: int = DEFAULT_BLOCK) -> jnp.ndarray:
    """Fused Montgomery multiply: same results as fields.mont.mul."""
    shape = a.shape
    a3, n = _flatten_pad(a)
    b3, _ = _flatten_pad(jnp.broadcast_to(b, shape))
    rows = a3.shape[1]
    blk = _row_block(rows, block)

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = mont.mul(F, a_ref[:], b_ref[:])

    spec = pl.BlockSpec((NLIMBS, blk, LANE), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(rows // blk,),
        in_specs=[spec] * 2,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((NLIMBS, rows, LANE), jnp.int32),
        interpret=_interpret(),
    )(a3, b3)
    return out.reshape(NLIMBS, rows * LANE)[:, :n].reshape(shape)


@functools.partial(jax.jit, static_argnums=(0, 2))
def mont_square(F: FieldSpec, a: jnp.ndarray,
                block: int = DEFAULT_BLOCK) -> jnp.ndarray:
    shape = a.shape
    a3, n = _flatten_pad(a)
    rows = a3.shape[1]
    blk = _row_block(rows, block)

    def kernel(a_ref, o_ref):
        o_ref[:] = mont.square(F, a_ref[:])

    spec = pl.BlockSpec((NLIMBS, blk, LANE), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(rows // blk,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((NLIMBS, rows, LANE), jnp.int32),
        interpret=_interpret(),
    )(a3)
    return out.reshape(NLIMBS, rows * LANE)[:, :n].reshape(shape)
