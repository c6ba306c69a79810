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

DEFAULT_BLOCK = 512  # batch lanes per kernel instance


def _interpret() -> bool:
    """Run kernels through the Pallas interpreter off-TPU (tests on CPU)."""
    return jax.default_backend() != "tpu"


def _batched(shape):
    """Flatten helper: (16, *batch) -> (16, N) view shape."""
    n = 1
    for d in shape[1:]:
        n *= d
    return n


def _pick_block(n: int, requested: int) -> int:
    b = min(requested, n)
    while n % b:
        b //= 2
    return max(b, 1)


@functools.partial(jax.jit, static_argnums=(0, 3))
def mont_mul(F: FieldSpec, a: jnp.ndarray, b: jnp.ndarray,
             block: int = DEFAULT_BLOCK) -> jnp.ndarray:
    """Fused Montgomery multiply: same results as fields.mont.mul."""
    shape = a.shape
    n = _batched(shape)
    a2 = a.reshape(NLIMBS, n)
    b2 = b.reshape(NLIMBS, n)
    blk = _pick_block(n, block)

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = mont.mul(F, a_ref[:], b_ref[:])

    out = pl.pallas_call(
        kernel,
        grid=(n // blk,),
        in_specs=[pl.BlockSpec((NLIMBS, blk), lambda i: (0, i),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((NLIMBS, blk), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NLIMBS, n), jnp.int32),
        interpret=_interpret(),
    )(a2, b2)
    return out.reshape(shape)


@functools.partial(jax.jit, static_argnums=(0, 2))
def mont_square(F: FieldSpec, a: jnp.ndarray,
                block: int = DEFAULT_BLOCK) -> jnp.ndarray:
    shape = a.shape
    n = _batched(shape)
    a2 = a.reshape(NLIMBS, n)
    blk = _pick_block(n, block)

    def kernel(a_ref, o_ref):
        o_ref[:] = mont.square(F, a_ref[:])

    out = pl.pallas_call(
        kernel,
        grid=(n // blk,),
        in_specs=[pl.BlockSpec((NLIMBS, blk), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((NLIMBS, blk), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NLIMBS, n), jnp.int32),
        interpret=_interpret(),
    )(a2)
    return out.reshape(shape)
