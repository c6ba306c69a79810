"""jubjub_tpu: a TPU-native implementation of the Jubjub elliptic curve.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
zkcrypto/jubjub Rust crate (mounted read-only at /root/reference): two prime
fields, four point representations, constant-pattern scalar multiplication,
batch normalization/inversion, canonical 32-byte point encoding (with the
ZIP-216 consensus quirk), plus TPU-only extensions (batched kernels, Pallas
fused hot loops, multi-chip MSM over a jax.sharding.Mesh).

Design: field elements are planes of 20x13-bit limbs in int32 lanes, kept in
Montgomery form; points are structs-of-arrays of such planes; every operation
is batched and data-independent ("constant pattern").
"""

from .fields import Fq, Fr
from .curve import (AffineNielsPoint, AffinePoint, ExtendedNielsPoint,
                    ExtendedPoint, SubgroupPoint, batch_normalize,
                    full_generator, subgroup_generator)
from . import oracle

# Reference type aliases (/root/reference/src/lib.rs:64-71)
Base = Fq
Scalar = Fr

__version__ = "0.1.0"

__all__ = [
    "Fq", "Fr", "Base", "Scalar", "oracle", "AffineNielsPoint", "AffinePoint",
    "ExtendedNielsPoint", "ExtendedPoint", "SubgroupPoint", "batch_normalize",
    "full_generator", "subgroup_generator", "__version__",
]
