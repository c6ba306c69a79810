"""Shared test helpers: int <-> limb conversion, oracle RNG streams, and
module-level jitted kernels (compiled once per session)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jubjub_tpu import oracle
from jubjub_tpu.fields import Fq, Fr
from jubjub_tpu.curve import batch_normalize, mul_extended, multiply_bits

NUM_BLACK_BOX_CHECKS = 2000  # reference: tests/common.rs:5


def ints(elem):
    """FieldElement -> list of Python ints (always a list)."""
    v = elem.to_ints()
    return v if isinstance(v, list) else [v]


def aff_ints(p):
    """AffinePoint -> list of (u, v) int pairs."""
    us, vs = ints(p.u), ints(p.v)
    return list(zip(us, vs))


def bytes_to_arr(bs: list[bytes]) -> jnp.ndarray:
    """List of 32/64-byte strings -> uint8 (L, N)."""
    return jnp.asarray(np.stack([np.frombuffer(b, np.uint8) for b in bs], axis=1))


def sample_canonical(rng, modulus, n):
    """n values from the reference blackbox stream (tests/common.rs:15-29)."""
    return [oracle.random_field_canonical(rng, modulus) for _ in range(n)]


def sample_wide_bytes(rng, n):
    return [rng.fill_bytes(64) for _ in range(n)]


# -- jitted kernels shared across tests -------------------------------------

@jax.jit
def fq_mul(a: Fq, b: Fq) -> Fq:
    return a * b


@jax.jit
def fr_mul(a: Fr, b: Fr) -> Fr:
    return a * b


@functools.cache
def jit_scalar_mul():
    @jax.jit
    def f(pe, k):
        return batch_normalize(mul_extended(pe, k))
    return f


@functools.cache
def jit_multiply_bits():
    @jax.jit
    def f(pe, kb):
        return batch_normalize(multiply_bits(pe, kb))
    return f
