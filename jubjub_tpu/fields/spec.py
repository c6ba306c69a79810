"""Field specification: compile-time constants for a generic prime field.

The TPU representation of a field element is a plane of 20 limbs x 13 bits
stored in ``int32`` (limb axis leading: shape ``(NLIMBS, *batch)``), kept in
Montgomery form with ``R = 2^260`` (= 2^(13*20)).  Thirteen-bit limbs are the
*split-free* radix: every 13x13-bit product (< 2^26) is accumulated directly
into a uint32 carry-save column with a single add — no lo/hi extraction per
product — and the worst-case column sum (~40 products in a Montgomery
multiply) still fits uint32 (40 * 2^26 < 2^32).  The wider 16-bit radix needs
2 extracts + 2 adds per product; 13 bits does the same work in 1 add, which
is ~35% fewer VPU ops per field multiplication.  This replaces the
reference's 4 x u64 + u128 carries (/root/reference/src/util.rs:1-20,
/root/reference/src/fr.rs:19-23) with a layout the VPU can vectorize over
the batch dimension.

A ``FieldSpec`` is a plain immutable Python object: everything in it is a
trace-time constant (Python ints / tuples), never traced data.
"""

from __future__ import annotations

import numpy as np

LIMB_BITS = 13
NLIMBS = 20
MASK = (1 << LIMB_BITS) - 1
NBYTES = 32
R_BITS = LIMB_BITS * NLIMBS  # 260: the Montgomery shift
assert R_BITS >= 256
# Column-sum overflow guard: a Montgomery mul accumulates at most 2*NLIMBS
# products of (2^LIMB_BITS - 1)^2 into one uint32 column.
assert 2 * NLIMBS * (MASK * MASK) < (1 << 32)


def int_to_limbs(x: int, n: int = NLIMBS) -> tuple[int, ...]:
    """Little-endian LIMB_BITS-bit limbs of a nonnegative integer."""
    return tuple((x >> (LIMB_BITS * i)) & MASK for i in range(n))


def limbs_to_int(limbs) -> int:
    return sum(int(l) << (LIMB_BITS * i) for i, l in enumerate(limbs))


class FieldSpec:
    """All trace-time constants for one prime field GF(p), p < 2^256.

    Mirrors the constant block of the reference scalar-field implementation
    (/root/reference/src/fr.rs:76-135) but parameterized so that Fq and Fr are
    two instances of the same code — the reference instead relies on the twin
    crate ``bls12_381::Scalar`` for Fq (/root/reference/src/lib.rs:62).
    """

    def __init__(self, name: str, modulus: int, generator: int):
        assert modulus % 2 == 1 and modulus < (1 << 256)
        self.name = name
        self.p = modulus
        self.num_bits = modulus.bit_length()
        self.capacity = self.num_bits - 1

        # Montgomery constants, R = 2^260 (the reference's domain is R=2^256,
        # /root/reference/src/fr.rs:214-236; the domain is internal, so any R
        # covering the modulus gives identical canonical/byte behavior).
        self.R = (1 << R_BITS) % modulus
        self.R2 = self.R * self.R % modulus
        self.R3 = self.R2 * self.R % modulus
        # -p^{-1} mod 2^LIMB_BITS: per-digit Montgomery factor (reference uses
        # the u64 analogue INV, /root/reference/src/fr.rs:211-214).
        self.inv_limb = (-pow(modulus, -1, 1 << LIMB_BITS)) & MASK

        self.p_limbs = int_to_limbs(modulus)
        self.r_limbs = int_to_limbs(self.R)
        self.r2_limbs = int_to_limbs(self.R2)
        self.r3_limbs = int_to_limbs(self.R3)

        # 2-adicity: p - 1 = 2^s * t with t odd (drives the sqrt strategy:
        # s=1 -> simple exponentiation, s=32 -> Tonelli-Shanks).
        s = 0
        t = modulus - 1
        while t % 2 == 0:
            t >>= 1
            s += 1
        self.s = s
        self.t = t

        self.generator = generator  # multiplicative generator (non-residue)
        assert pow(generator, (modulus - 1) // 2, modulus) == modulus - 1
        self.root_of_unity = pow(generator, t, modulus)  # order 2^s
        self.root_of_unity_inv = pow(self.root_of_unity, -1, modulus)
        self.delta = pow(generator, 1 << s, modulus)
        self.two_inv = pow(2, -1, modulus)

    # -- numpy constant planes (trace-time; become XLA constants) ----------

    def np_limbs(self, x: int) -> np.ndarray:
        """(16,) int32 plane of ``x mod p`` (standard form, NOT Montgomery)."""
        return np.array(int_to_limbs(x % self.p), dtype=np.int32)

    def np_mont(self, x: int) -> np.ndarray:
        """(16,) int32 plane of ``x`` in Montgomery form."""
        return np.array(int_to_limbs(x % self.p * self.R % self.p), dtype=np.int32)

    def __repr__(self) -> str:  # pragma: no cover
        return f"FieldSpec({self.name}, p={hex(self.p)})"

    # FieldSpec instances are compile-time singletons; identity semantics are
    # correct and make them safe to close over in jitted functions.
    def __hash__(self) -> int:
        return hash((self.name, self.p))

    def __eq__(self, other) -> bool:
        return isinstance(other, FieldSpec) and (self.name, self.p) == (other.name, other.p)
