"""Prime-order subgroup newtype and the group-trait API surface.

``SubgroupPoint`` mirrors /root/reference/src/lib.rs:1119-1239 (a newtype
over ``ExtendedPoint`` closed under the group ops), together with the
``group``-crate trait behaviors: cofactor clearing, subgroup membership,
random sampling, and the wNAF window-size recommendation
(/root/reference/src/lib.rs:1241-1454).

Random sampling differs *mechanically* from the reference (which rejection-
samples candidate v coordinates, lib.rs:1244-1267): on TPU we draw a uniform
scalar k and a uniform 3-bit torsion index j and return [k]G8 + T[j], which
is exactly uniform over the full group (or [k]G8 over the subgroup) with a
fixed instruction stream — no data-dependent retry loop.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .. import oracle
from ..fields import Fq, Fr
from .points import (AffinePoint, ExtendedPoint, _pytree, select_point,
                     subgroup_generator)
from .scalar_mul import _take_entry_const, generator_table, mul_extended


def eight_torsion_host() -> list[tuple[int, int]]:
    """The 8 small-order points in reference order: entry i is [i+1]T for
    T = [r]G, so the last entry is the identity
    (cf. EIGHT_TORSION, /root/reference/src/lib.rs:1589-1677)."""
    t = oracle.mul(oracle.GENERATOR, oracle.R)
    return [oracle.mul(t, i + 1) for i in range(8)]


def _torsion_table():
    import numpy as np
    from ..fields.spec import int_to_limbs
    pts = eight_torsion_host()
    F = Fq.SPEC
    arrs = {"u": [], "v": []}
    for (u, v) in pts:
        arrs["u"].append(int_to_limbs(u * F.R % F.p))
        arrs["v"].append(int_to_limbs(v * F.R % F.p))
    mk = lambda k: Fq(jnp.asarray(np.array(arrs[k], dtype=np.int32)))  # (8, 16)
    return AffinePoint(u=mk("u"), v=mk("v"))


@_pytree
@dataclass
class SubgroupPoint:
    """Point guaranteed (by construction) to lie in the prime-order subgroup
    (/root/reference/src/lib.rs:1119-1147)."""

    inner: ExtendedPoint

    @classmethod
    def identity(cls, shape=()):
        return cls(ExtendedPoint.identity(shape))

    @classmethod
    def generator(cls, shape=()):
        """Full generator * cofactor (/root/reference/src/lib.rs:1304-1306)."""
        return cls(subgroup_generator(shape).to_extended())

    @classmethod
    def from_raw_unchecked(cls, u, v, shape=()):
        """(/root/reference/src/lib.rs:1148-1159)."""
        return cls(AffinePoint.from_raw_unchecked(u, v, shape).to_extended())

    @property
    def shape(self):
        return self.inner.shape

    def __add__(self, other):
        o = other.inner if isinstance(other, SubgroupPoint) else other
        return SubgroupPoint(self.inner + o)

    def __sub__(self, other):
        o = other.inner if isinstance(other, SubgroupPoint) else other
        return SubgroupPoint(self.inner - o)

    def __neg__(self):
        return SubgroupPoint(-self.inner)

    def __mul__(self, scalar):
        return SubgroupPoint(mul_extended(self.inner, scalar))

    __rmul__ = __mul__

    def double(self):
        return SubgroupPoint(self.inner.double())

    def ct_eq(self, other):
        o = other.inner if isinstance(other, SubgroupPoint) else other
        return self.inner.ct_eq(o)

    __eq__ = ct_eq

    def __hash__(self):  # pragma: no cover
        raise TypeError("batched points are unhashable")

    def is_identity(self):
        return self.inner.is_identity()

    def to_affine(self):
        return self.inner.to_affine()

    def to_bytes(self):
        return self.inner.to_affine().to_bytes()

    @classmethod
    def from_bytes(cls, b):
        """GroupEncoding: decode AND subgroup-check
        (/root/reference/src/lib.rs:1420-1430)."""
        aff, ok = AffinePoint.from_bytes(b)
        ext = aff.to_extended()
        ok = ok & ext.is_torsion_free()
        sel = select_point(ok, ext, ExtendedPoint.identity(ext.shape))
        return cls(sel), ok

    @classmethod
    def from_bytes_unchecked(cls, b):
        """Curve-checked but NOT subgroup-checked
        (/root/reference/src/lib.rs:1431-1433)."""
        aff, ok = AffinePoint.from_bytes(b)
        return cls(aff.to_extended()), ok

    @classmethod
    def random(cls, key, shape=()):
        """Uniform subgroup point: [k]G8 for uniform k
        (distributionally equal to /root/reference/src/lib.rs:1290-1298)."""
        k = Fr.random(key, shape)
        return cls(generator_table().mul(k))


# -- CofactorGroup surface on ExtendedPoint ---------------------------------

def clear_cofactor(p: ExtendedPoint) -> SubgroupPoint:
    """[8]P lands in the subgroup (/root/reference/src/lib.rs:1343-1345)."""
    return SubgroupPoint(p.mul_by_cofactor())


def into_subgroup(p: ExtendedPoint) -> tuple[SubgroupPoint, jnp.ndarray]:
    """CtOption analogue: (SubgroupPoint(p), is_torsion_free)
    (/root/reference/src/lib.rs:1347-1350)."""
    ok = p.is_torsion_free()
    return SubgroupPoint(select_point(ok, p, ExtendedPoint.identity(p.shape))), ok


def random_extended(key, shape=()) -> ExtendedPoint:
    """Uniform full-group point: [k]G8 + T[j], k uniform scalar, j uniform
    3-bit torsion index (distributionally equal to
    /root/reference/src/lib.rs:1244-1267)."""
    k_key, j_key = jax.random.split(key)
    base = SubgroupPoint.random(k_key, shape).inner
    j = jax.random.randint(j_key, shape, 0, 8)
    tor = _take_entry_const(_torsion_table(), j)  # AffinePoint (16, *shape)
    return base.add_affine_niels(tor.to_niels())


def recommended_wnaf_window(num_scalars: int) -> int:
    """WnafGroup::recommended_wnaf_for_num_scalars
    (/root/reference/src/lib.rs:1318-1336)."""
    for (size, window) in [(13, 4), (22, 5), (45, 6), (160, 7),
                           (416, 8), (1893, 9), (4096, 10)]:
        if num_scalars < size:
            return window
    return 11
