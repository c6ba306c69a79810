"""Batched field-element wrapper classes: the `ff` trait surface in Python.

``Fq`` and ``Fr`` wrap a Montgomery limb plane (int32, shape ``(NLIMBS, *batch)``)
and expose the reference's API: operators, ``square``/``double``/``invert``/
``sqrt``/``pow``, byte round-trips, and the ``PrimeField`` constants
(reference trait impls: /root/reference/src/fr.rs:680-785; Fq's come from the
bls12_381 crate, re-exported at /root/reference/src/lib.rs:62).

Everything is batch-first: one ``Fq`` value holds an arbitrary batch of field
elements, and all ops vectorize.  Fallible ops return ``(value, ok_mask)``
pairs — the branchless analogue of the reference's ``CtOption``.

Instances are JAX pytrees, so they flow through ``jit``/``vmap``/``lax.scan``.
"""

from __future__ import annotations

from typing import ClassVar

import jax
import jax.numpy as jnp
import numpy as np

from .. import oracle
from . import mont
from . import sqrt as sqrt_mod
from .spec import MASK, NLIMBS, FieldSpec, int_to_limbs, limbs_to_int

FQ_SPEC = FieldSpec("Fq", oracle.Q, oracle.GENERATOR_FQ)
FR_SPEC = FieldSpec("Fr", oracle.R, oracle.GENERATOR_FR)


class FieldElement:
    """Common machinery; concrete fields are the ``Fq``/``Fr`` subclasses."""

    SPEC: ClassVar[FieldSpec]
    __slots__ = ("limbs",)

    def __init__(self, limbs: jnp.ndarray):
        self.limbs = limbs

    # -- constructors ------------------------------------------------------

    @classmethod
    def zero(cls, shape=()):
        return cls(mont.zero(cls.SPEC, shape))

    @classmethod
    def one(cls, shape=()):
        return cls(mont.one(cls.SPEC, shape))

    @classmethod
    def from_int(cls, x, shape=()):
        """Constant(s) -> field element(s). Accepts an int or a sequence."""
        F = cls.SPEC
        if isinstance(x, (list, tuple)):
            arr = np.stack([F.np_mont(int(v)) for v in x], axis=-1)
            return cls(jnp.asarray(arr))
        return cls(mont.const_mont(F, int(x), shape))

    @classmethod
    def from_raw(cls, limbs_u64):
        """Four little-endian u64 limbs -> element, reduced mod p
        (/root/reference/src/fr.rs:347-349)."""
        val = sum(int(l) << (64 * i) for i, l in enumerate(limbs_u64))
        return cls.from_int(val)

    @classmethod
    def from_bytes(cls, b) -> tuple["FieldElement", jnp.ndarray]:
        """Canonical LE bytes, uint8 (32, *batch) -> (element, ok)."""
        limbs, ok = mont.from_bytes(cls.SPEC, jnp.asarray(b, jnp.uint8))
        return cls(limbs), ok

    @classmethod
    def from_bytes_wide(cls, b) -> "FieldElement":
        """512-bit LE bytes, uint8 (64, *batch), reduced mod p."""
        return cls(mont.from_bytes_wide(cls.SPEC, jnp.asarray(b, jnp.uint8)))

    @classmethod
    def random(cls, key, shape=()) -> "FieldElement":
        """Uniform elements from a jax PRNG key (64 uniform bytes reduced,
        same construction as ff::Field::random / tests/common.rs:15-29)."""
        bits = jax.random.bits(key, (64,) + tuple(shape), dtype=jnp.uint8)
        return cls.from_bytes_wide(bits)

    # -- shape / conversion ------------------------------------------------

    @property
    def shape(self):
        return self.limbs.shape[1:]

    def to_bytes(self) -> jnp.ndarray:
        """uint8 (32, *batch) canonical little-endian encoding."""
        return mont.to_bytes(self.SPEC, self.limbs)

    def to_ints(self):
        """Host-side: batch of Python ints (flattens the batch)."""
        canon = np.asarray(mont.to_canonical(self.SPEC, self.limbs))
        flat = canon.reshape(NLIMBS, -1)
        vals = [limbs_to_int(flat[:, i]) for i in range(flat.shape[1])]
        if self.shape == ():
            return vals[0]
        return vals

    # -- arithmetic --------------------------------------------------------
    #
    # Public-operator contract: every FieldElement produced by the public API
    # holds a redundant residue < 2p (the lazy bound of a Montgomery mul).
    # ``__add__``/``__sub__``/``__neg__``/``double`` restore that bound with
    # one conditional subtraction of 2p, so arbitrary user chains like
    # ``a - (b + b + b)`` are total — matching the reference's total
    # operators (/root/reference/src/fr.rs:620-647).  The audited point
    # formulas use the ``lazy_*`` variants below, which skip the
    # normalization and track bounds statically (fields/mont.py contract).

    def _new(self, limbs):
        return type(self)(limbs)

    def __add__(self, other):
        s = mont.add(self.SPEC, self.limbs, other.limbs)  # < 4p
        return self._new(mont.cond_sub_kp(self.SPEC, s, 2))

    def __sub__(self, other):
        d = mont.sub(self.SPEC, self.limbs, other.limbs, k=2)  # < 4p
        return self._new(mont.cond_sub_kp(self.SPEC, d, 2))

    def lazy_add(self, other):
        """self + other without normalization (bound c_a + c_b; lazy-reduction
        internal — see the contract note in fields/mont.py)."""
        return self._new(mont.add(self.SPEC, self.limbs, other.limbs))

    def lazy_sub(self, other, k: int):
        """self - other + k*p for a subtrahend bounded by k*p (lazy-reduction
        internal; see the contract note in fields/mont.py)."""
        return self._new(mont.sub(self.SPEC, self.limbs, other.limbs, k=k))

    def lazy_double(self, other=None):
        """2*self without normalization (bound 2*c)."""
        return self._new(mont.double_el(self.SPEC, self.limbs))

    def neg_bounded(self, k: int):
        """k*p - self for self < k*p (lazy negation with explicit bound)."""
        return self._new(mont.neg(self.SPEC, self.limbs, k=k))

    def reduce_once(self, k: int):
        """Conditional subtract of k*p: maps [0, 2k*p) to [0, k*p)."""
        return self._new(mont.cond_sub_kp(self.SPEC, self.limbs, k))

    def __neg__(self):
        n = mont.neg(self.SPEC, self.limbs, k=2)  # <= 2p
        return self._new(mont.cond_sub_kp(self.SPEC, n, 2))

    def __mul__(self, other):
        if isinstance(other, int):
            return self._new(mont.mul_const(self.SPEC, self.limbs, other))
        return self._new(mont.mul(self.SPEC, self.limbs, other.limbs))

    __rmul__ = __mul__

    def square(self):
        return self._new(mont.square(self.SPEC, self.limbs))

    def double(self):
        d = mont.double_el(self.SPEC, self.limbs)  # < 4p
        return self._new(mont.cond_sub_kp(self.SPEC, d, 2))

    def invert(self) -> tuple["FieldElement", jnp.ndarray]:
        """(1/self, ok); 0 -> (0, False) (/root/reference/src/fr.rs:438-540)."""
        inv, ok = mont.invert(self.SPEC, self.limbs)
        return self._new(inv), ok

    def sqrt(self) -> tuple["FieldElement", jnp.ndarray]:
        root, ok = sqrt_mod.sqrt(self.SPEC, self.limbs)
        return self._new(root), ok

    def pow(self, e):
        """self^e (/root/reference/src/fr.rs:403-434).

        ``e`` may be a host int (trace-time window schedule, covers the
        reference's addition-chain uses), another FieldElement (its
        canonical integer value is the exponent), or a uint8 (32, *batch)
        little-endian byte array — the latter two are RUNTIME exponents,
        handled by a constant-pattern 256-step masked ladder
        (``mont.pow_traced``), matching the reference's ``pow`` over a
        runtime [u64;4]."""
        if isinstance(e, int):
            return self._new(mont.pow_const(self.SPEC, self.limbs, e))
        if isinstance(e, FieldElement):
            ebits = mont.to_canonical(e.SPEC, e.limbs)
        else:
            ebits = mont.limbs_from_le_bytes(jnp.asarray(e, jnp.uint8))
        return self._new(mont.pow_traced(self.SPEC, self.limbs, ebits))

    pow_vartime = pow

    @classmethod
    def sqrt_ratio(cls, num: "FieldElement", div: "FieldElement"):
        is_sq, x = sqrt_mod.sqrt_ratio(cls.SPEC, num.limbs, div.limbs)
        return is_sq, cls(x)

    @classmethod
    def batch_invert(cls, elems: "FieldElement", axis: int = -1):
        """One-inversion batch inverse along a batch axis (all nonzero);
        ff::BatchInverter analogue (/root/reference/src/lib.rs:1084-1107)."""
        return cls(mont.batch_invert(cls.SPEC, elems.limbs, axis=axis))

    # -- predicates --------------------------------------------------------

    def ct_eq(self, other) -> jnp.ndarray:
        return mont.eq(self.SPEC, self.limbs, other.limbs)

    __eq__ = ct_eq  # batched equality mask

    def __hash__(self):  # pragma: no cover
        raise TypeError("batched field elements are unhashable")

    def is_zero(self) -> jnp.ndarray:
        return mont.is_zero(self.SPEC, self.limbs)

    def is_odd(self) -> jnp.ndarray:
        """Parity of the canonical representative
        (/root/reference/src/fr.rs:724-726)."""
        return (mont.to_canonical(self.SPEC, self.limbs)[0] & 1) == 1

    def is_even(self) -> jnp.ndarray:
        return ~self.is_odd()

    def to_le_bits(self) -> jnp.ndarray:
        """PrimeFieldBits::to_le_bits: (256, *batch) bool, LSB first
        (/root/reference/src/fr.rs:740-785)."""
        from .spec import LIMB_BITS
        canon = mont.to_canonical(self.SPEC, self.limbs)  # (NLIMBS, *batch)
        bits = [(canon[p // LIMB_BITS] >> (p % LIMB_BITS)) & 1
                for p in range(256)]
        return jnp.stack(bits).astype(bool)

    @classmethod
    def char_le_bits(cls) -> jnp.ndarray:
        """PrimeFieldBits::char_le_bits: the modulus, LSB first."""
        p = cls.SPEC.p
        return jnp.asarray([bool((p >> i) & 1) for i in range(256)])

    def conditional_select(self, other, mask):
        """mask ? self : other, broadcast over the batch."""
        return self._new(mont.select(mask, self.limbs, other.limbs))

    def __repr__(self):  # pragma: no cover
        vals = self.to_ints()
        if isinstance(vals, list):
            return f"{type(self).__name__}({[hex(v) for v in vals]})"
        return f"{type(self).__name__}({hex(vals)})"


class Fq(FieldElement):
    """Base field GF(q), q = BLS12-381 scalar modulus
    (/root/reference/src/lib.rs:62-68)."""
    SPEC = FQ_SPEC
    MODULUS = oracle.Q
    NUM_BITS = 255
    CAPACITY = 254
    S = 32


class Fr(FieldElement):
    """Jubjub scalar field GF(r) (/root/reference/src/fr.rs)."""
    SPEC = FR_SPEC
    MODULUS = oracle.R
    NUM_BITS = 252
    CAPACITY = 251
    S = 1


for _cls in (Fq, Fr):
    jax.tree_util.register_pytree_node(
        _cls,
        lambda e: ((e.limbs,), None),
        (lambda cls: (lambda aux, children: cls(children[0])))(_cls),
    )

# PrimeField-style derived constants (values checked against the reference's
# constant blocks in tests).
for _cls in (Fq, Fr):
    _cls.TWO_INV = _cls.SPEC.two_inv
    _cls.GENERATOR = _cls.SPEC.generator
    _cls.ROOT_OF_UNITY = _cls.SPEC.root_of_unity
    _cls.ROOT_OF_UNITY_INV = _cls.SPEC.root_of_unity_inv
    _cls.DELTA = _cls.SPEC.delta
