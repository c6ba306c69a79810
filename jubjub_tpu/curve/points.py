"""Jubjub point representations and group law, batched struct-of-arrays.

Four public representations, mirroring /root/reference/src/lib.rs:
  - ``AffinePoint {u, v}``                       (lib.rs:78-125)
  - ``ExtendedPoint {u, v, z, t1, t2}``          (lib.rs:127-181), invariant
    ``T1 * T2 = UV/Z``
  - ``AffineNielsPoint {v_plus_u, v_minus_u, t2d}``     (lib.rs:251-322)
  - ``ExtendedNielsPoint {v_plus_u, v_minus_u, z, t2d}`` (lib.rs:324-396)
plus the private ``CompletedPoint`` intermediate (lib.rs:1032-1061).

Formulas:
  - doubling: "dbl-2008-bbjlp" (lib.rs:739-828)
  - unified addition: Hisil-Wong-Carter-Dawson, 8M extended / 7M affine-niels
    (lib.rs:883-1030) — complete on this curve because d is non-square.

Every point holds a *batch*: each coordinate is an ``Fq`` whose limb plane has
shape (NLIMBS, *batch).  All predicates return boolean masks of the batch shape.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .. import oracle
from ..fields import Fq, Fr, mont
from ..fields.element import FQ_SPEC


def _pytree(cls):
    names = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_pytree_node(
        cls,
        lambda x: (tuple(getattr(x, n) for n in names), None),
        lambda aux, ch: cls(*ch),
    )
    return cls


def _d2(shape):
    """2d as a broadcast constant (/root/reference/src/lib.rs:407-412)."""
    return Fq.from_int(oracle.EDWARDS_D2, shape)


def _mulk(*pairs):
    """k independent field products in ONE stacked ``mont.mul`` call.

    The group-law formulas need several independent products at each step
    (e.g. HWCD's A, B, C, D).  Evaluating them as one multiplication over a
    stacked operand plane (NLIMBS, k, *batch) keeps results bit-identical
    while tracing/compiling ~k-fold fewer ops and giving the VPU larger
    tiles.  Returns the k products as Fq values."""
    xs = [p[0].limbs for p in pairs]
    ys = [p[1].limbs for p in pairs]
    shape = jnp.broadcast_shapes(*[a.shape for a in xs + ys])
    xs = [jnp.broadcast_to(a, shape) for a in xs]
    ys = [jnp.broadcast_to(a, shape) for a in ys]
    m = mont.mul(FQ_SPEC, jnp.stack(xs, axis=1), jnp.stack(ys, axis=1))
    return [Fq(m[:, i]) for i in range(len(pairs))]


def _squarek(*els):
    """k independent squarings in ONE stacked ``mont.square`` call."""
    xs = [e.limbs for e in els]
    shape = jnp.broadcast_shapes(*[a.shape for a in xs])
    xs = [jnp.broadcast_to(a, shape) for a in xs]
    s = mont.square(FQ_SPEC, jnp.stack(xs, axis=1))
    return [Fq(s[:, i]) for i in range(len(els))]


def _select(mask, a, b):
    """mask ? a : b over any point pytree (mask shaped like the batch)."""
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(mask, x, y), a, b)


@_pytree
@dataclass
class AffinePoint:
    """Affine coordinates (u, v); identity is (0, 1)
    (/root/reference/src/lib.rs:78-125, :416-421)."""

    u: Fq
    v: Fq

    @classmethod
    def identity(cls, shape=()):
        return cls(u=Fq.zero(shape), v=Fq.one(shape))

    @classmethod
    def from_raw_unchecked(cls, u, v, shape=()):
        """Host ints -> point, no curve check
        (/root/reference/src/lib.rs:662-664)."""
        return cls(u=Fq.from_int(u, shape), v=Fq.from_int(v, shape))

    @property
    def shape(self):
        return self.u.shape

    def __neg__(self):
        return AffinePoint(u=-self.u, v=self.v)

    def to_extended(self) -> "ExtendedPoint":
        """(u, v) -> (u, v, 1, u, v) (/root/reference/src/lib.rs:640-648)."""
        one = Fq.one(self.shape)
        return ExtendedPoint(u=self.u, v=self.v, z=one, t1=self.u, t2=self.v)

    def to_niels(self) -> "AffineNielsPoint":
        """(/root/reference/src/lib.rs:652-658).  Lazy bounds: coords < 2p,
        so v+u < 4p and v-u+2p < 4p — both inside the mul precondition."""
        return AffineNielsPoint(
            v_plus_u=self.v.lazy_add(self.u),
            v_minus_u=self.v.lazy_sub(self.u, 2),
            t2d=self.u * self.v * _d2(self.shape),
        )

    def is_identity(self):
        return self.u.is_zero() & self.v.ct_eq(Fq.one(self.shape))

    def is_on_curve(self):
        """Batch mask: -u^2 + v^2 == 1 + d u^2 v^2
        (reference's test-only is_on_curve_vartime, lib.rs:669-675; on TPU the
        batched check is constant-pattern, so it is not 'vartime' here)."""
        u2, v2 = _squarek(self.u, self.v)
        d = Fq.from_int(oracle.EDWARDS_D, self.shape)
        return (v2 - u2).ct_eq(Fq.one(self.shape) + d * u2 * v2)

    is_on_curve_vartime = is_on_curve

    def is_small_order(self):
        return self.to_extended().is_small_order()

    def is_torsion_free(self):
        return self.to_extended().is_torsion_free()

    def is_prime_order(self):
        e = self.to_extended()
        return e.is_torsion_free() & ~e.is_identity()

    def get_u(self) -> Fq:
        return self.u

    def get_v(self) -> Fq:
        return self.v

    def ct_eq(self, other) -> jnp.ndarray:
        return self.u.ct_eq(other.u) & self.v.ct_eq(other.v)

    __eq__ = ct_eq

    def __hash__(self):  # pragma: no cover
        raise TypeError("batched points are unhashable")

    def __add__(self, other):
        return self.to_extended() + other

    def __sub__(self, other):
        return self.to_extended() - other

    def __mul__(self, scalar):
        """AffinePoint * Fr via the 7M affine-niels path
        (/root/reference/src/lib.rs:1109-1117)."""
        from .scalar_mul import mul_affine
        return mul_affine(self, scalar)

    __rmul__ = __mul__

    def mul_by_cofactor(self):
        return self.to_extended().mul_by_cofactor()

    # encoding lives in curve.encoding; convenience passthroughs:
    def to_bytes(self):
        from .encoding import affine_to_bytes
        return affine_to_bytes(self)

    @classmethod
    def from_bytes(cls, b, zip_216_enabled: bool = True):
        from .encoding import affine_from_bytes
        return affine_from_bytes(b, zip_216_enabled=zip_216_enabled)

    @classmethod
    def from_bytes_pre_zip216_compatibility(cls, b):
        """Consensus-critical legacy decoder (/root/reference/src/lib.rs:474-490)."""
        from .encoding import affine_from_bytes
        return affine_from_bytes(b, zip_216_enabled=False)

    @classmethod
    def batch_from_bytes(cls, b, zip_216_enabled: bool = True):
        """Alias: decoding is natively batched here
        (/root/reference/src/lib.rs:536-627)."""
        from .encoding import affine_from_bytes
        return affine_from_bytes(b, zip_216_enabled=zip_216_enabled)


@_pytree
@dataclass
class CompletedPoint:
    """Intermediate (U:Z, V:T) point (/root/reference/src/lib.rs:1032-1050)."""

    u: Fq
    v: Fq
    z: Fq
    t: Fq

    def into_extended(self) -> "ExtendedPoint":
        """Homogenize with 3 muls (one stacked call); T1/T2 stay unmultiplied
        (/root/reference/src/lib.rs:1052-1060)."""
        u, v, z = _mulk((self.u, self.t), (self.v, self.z), (self.z, self.t))
        return ExtendedPoint(u=u, v=v, z=z, t1=self.u, t2=self.v)


@_pytree
@dataclass
class ExtendedPoint:
    """Extended twisted Edwards coordinates
    (/root/reference/src/lib.rs:127-145)."""

    u: Fq
    v: Fq
    z: Fq
    t1: Fq
    t2: Fq

    @classmethod
    def identity(cls, shape=()):
        """(0, 1, 1, 0, 0) (/root/reference/src/lib.rs:680-688)."""
        return cls(u=Fq.zero(shape), v=Fq.one(shape), z=Fq.one(shape),
                   t1=Fq.zero(shape), t2=Fq.zero(shape))

    @classmethod
    def from_affine(cls, p: AffinePoint):
        return p.to_extended()

    @property
    def shape(self):
        return self.u.shape

    def ct_eq(self, other) -> jnp.ndarray:
        """(u/z, v/z) == (u'/z', v'/z') via cross-multiplication
        (/root/reference/src/lib.rs:153-163)."""
        uz, zu, vz, zv = _mulk((self.u, other.z), (other.u, self.z),
                               (self.v, other.z), (other.v, self.z))
        return uz.ct_eq(zu) & vz.ct_eq(zv)

    __eq__ = ct_eq

    def __hash__(self):  # pragma: no cover
        raise TypeError("batched points are unhashable")

    def __neg__(self):
        """(/root/reference/src/lib.rs:195-206). t1 carries the widest lazy
        bound (< 6p from double's completed u), so negate with k=6."""
        return ExtendedPoint(u=-self.u, v=self.v, z=self.z,
                             t1=self.t1.neg_bounded(6), t2=self.t2)

    def is_identity(self) -> jnp.ndarray:
        """u == 0 && v == z (identity regardless of torsion normalization,
        /root/reference/src/lib.rs:691-696)."""
        return self.u.is_zero() & self.v.ct_eq(self.z)

    def is_small_order(self) -> jnp.ndarray:
        """Double twice and check u == 0 (/root/reference/src/lib.rs:699-705)."""
        return self.double().double().u.is_zero()

    def is_torsion_free(self) -> jnp.ndarray:
        """Multiply by r and compare with identity
        (/root/reference/src/lib.rs:709-711)."""
        from .scalar_mul import mul_const_scalar
        return mul_const_scalar(self, oracle.R).is_identity()

    def is_prime_order(self) -> jnp.ndarray:
        return self.is_torsion_free() & ~self.is_identity()

    def mul_by_cofactor(self) -> "ExtendedPoint":
        """[8]P by three doublings (/root/reference/src/lib.rs:713-724)."""
        return self.double().double().double()

    def to_niels(self) -> "ExtendedNielsPoint":
        """(/root/reference/src/lib.rs:726-735).  Lazy bounds: u,v < 2p,
        t1 < 6p, t2 < 4p, so t1*t2 stays under the 32p^2 mul precondition."""
        return ExtendedNielsPoint(
            v_plus_u=self.v.lazy_add(self.u),
            v_minus_u=self.v.lazy_sub(self.u, 2),
            z=self.z,
            t2d=self.t1 * self.t2 * _d2(self.shape),
        )

    def double(self) -> "ExtendedPoint":
        """dbl-2008-bbjlp, 3M + 4S (/root/reference/src/lib.rs:739-828).

        Lazy-reduction bounds (multiples of p; see fields/mont.py): inputs
        u,v,z < 2p; uu,vv,zz2,uv2 < 2p/4p; completed u < 6p, v,z < 4p,
        t < 8p reduced once to < 4p so every into_extended product stays
        under the 32p^2 mul precondition."""
        uu, vv, zz, uv2 = _squarek(self.u, self.v, self.z,
                                   self.u.lazy_add(self.v))
        zz2 = zz.lazy_double()
        vv_plus_uu = vv.lazy_add(uu)
        vv_minus_uu = vv.lazy_sub(uu, 2)
        return CompletedPoint(
            u=uv2.lazy_sub(vv_plus_uu, 4),
            v=vv_plus_uu,
            z=vv_minus_uu,
            t=zz2.lazy_sub(vv_minus_uu, 4).reduce_once(4),
        ).into_extended()

    # -- HWCD unified additions (/root/reference/src/lib.rs:883-1030) ------

    def add_extended_niels(self, o: "ExtendedNielsPoint") -> "ExtendedPoint":
        # Lazy bounds: a,b,c < 2p; d doubled then reduced once back to < 2p,
        # so completed coords are < 4p and into_extended products < 16p^2.
        a, b, tt, zz = _mulk((self.v.lazy_sub(self.u, 2), o.v_minus_u),
                             (self.v.lazy_add(self.u), o.v_plus_u),
                             (self.t1, self.t2), (self.z, o.z))
        c = tt * o.t2d
        d = zz.lazy_double().reduce_once(2)
        return CompletedPoint(u=b.lazy_sub(a, 2), v=b.lazy_add(a),
                              z=d.lazy_add(c),
                              t=d.lazy_sub(c, 2)).into_extended()

    def sub_extended_niels(self, o: "ExtendedNielsPoint") -> "ExtendedPoint":
        a, b, tt, zz = _mulk((self.v.lazy_sub(self.u, 2), o.v_plus_u),
                             (self.v.lazy_add(self.u), o.v_minus_u),
                             (self.t1, self.t2), (self.z, o.z))
        c = tt * o.t2d
        d = zz.lazy_double().reduce_once(2)
        return CompletedPoint(u=b.lazy_sub(a, 2), v=b.lazy_add(a),
                              z=d.lazy_sub(c, 2),
                              t=d.lazy_add(c)).into_extended()

    def add_affine_niels(self, o: "AffineNielsPoint") -> "ExtendedPoint":
        a, b, tt = _mulk((self.v.lazy_sub(self.u, 2), o.v_minus_u),
                         (self.v.lazy_add(self.u), o.v_plus_u),
                         (self.t1, self.t2))
        c = tt * o.t2d
        d = self.z.lazy_double().reduce_once(2)
        return CompletedPoint(u=b.lazy_sub(a, 2), v=b.lazy_add(a),
                              z=d.lazy_add(c),
                              t=d.lazy_sub(c, 2)).into_extended()

    def sub_affine_niels(self, o: "AffineNielsPoint") -> "ExtendedPoint":
        a, b, tt = _mulk((self.v.lazy_sub(self.u, 2), o.v_plus_u),
                         (self.v.lazy_add(self.u), o.v_minus_u),
                         (self.t1, self.t2))
        c = tt * o.t2d
        d = self.z.lazy_double().reduce_once(2)
        return CompletedPoint(u=b.lazy_sub(a, 2), v=b.lazy_add(a),
                              z=d.lazy_sub(c, 2),
                              t=d.lazy_add(c)).into_extended()

    def __add__(self, other):
        if isinstance(other, ExtendedNielsPoint):
            return self.add_extended_niels(other)
        if isinstance(other, AffineNielsPoint):
            return self.add_affine_niels(other)
        if isinstance(other, AffinePoint):
            return self.add_affine_niels(other.to_niels())
        if isinstance(other, ExtendedPoint):
            return self.add_extended_niels(other.to_niels())
        return NotImplemented

    def __sub__(self, other):
        if isinstance(other, ExtendedNielsPoint):
            return self.sub_extended_niels(other)
        if isinstance(other, AffineNielsPoint):
            return self.sub_affine_niels(other)
        if isinstance(other, AffinePoint):
            return self.sub_affine_niels(other.to_niels())
        if isinstance(other, ExtendedPoint):
            return self.sub_extended_niels(other.to_niels())
        return NotImplemented

    def __mul__(self, scalar):
        from .scalar_mul import mul_extended
        return mul_extended(self, scalar)

    __rmul__ = __mul__

    def multiply_bits(self, scalar_bytes):
        """Bit-serial double-and-add over a 252-bit LE byte scalar, exact
        parity with /root/reference/src/lib.rs:356-385."""
        from .scalar_mul import multiply_bits
        return multiply_bits(self, scalar_bytes)

    def to_affine(self) -> AffinePoint:
        """Projective -> affine; batched with ONE inversion
        (Curve::to_affine + batch_normalize,
        /root/reference/src/lib.rs:840-858, :1077-1107)."""
        return batch_normalize(self)

    def sum(self, axis: int) -> "ExtendedPoint":
        """Reduce a batch axis by point addition (Sum impl,
        /root/reference/src/lib.rs:183-193) via a log-depth tree."""
        return reduce_sum(self, axis)

    # GroupEncoding for ExtendedPoint (/root/reference/src/lib.rs:1407-1418):
    # curve-checked decode, NO subgroup check.
    def to_bytes(self):
        return self.to_affine().to_bytes()

    @classmethod
    def from_bytes(cls, b):
        aff, ok = AffinePoint.from_bytes(b)
        return aff.to_extended(), ok


@_pytree
@dataclass
class AffineNielsPoint:
    """Precomputed affine point for cheap (7M) re-addition
    (/root/reference/src/lib.rs:251-269)."""

    v_plus_u: Fq
    v_minus_u: Fq
    t2d: Fq

    @classmethod
    def identity(cls, shape=()):
        return cls(v_plus_u=Fq.one(shape), v_minus_u=Fq.one(shape),
                   t2d=Fq.zero(shape))

    def multiply_bits(self, scalar_bytes):
        """(/root/reference/src/lib.rs:272-301)."""
        from .scalar_mul import multiply_bits_affine_niels
        return multiply_bits_affine_niels(self, scalar_bytes)

    def __mul__(self, scalar):
        """AffineNielsPoint * Fr -> ExtendedPoint
        (/root/reference/src/lib.rs:304-312)."""
        return self.multiply_bits(scalar.to_bytes())

    __rmul__ = __mul__


@_pytree
@dataclass
class ExtendedNielsPoint:
    """Precomputed extended point for cheap (8M) re-addition
    (/root/reference/src/lib.rs:324-354)."""

    v_plus_u: Fq
    v_minus_u: Fq
    z: Fq
    t2d: Fq

    @classmethod
    def identity(cls, shape=()):
        return cls(v_plus_u=Fq.one(shape), v_minus_u=Fq.one(shape),
                   z=Fq.one(shape), t2d=Fq.zero(shape))

    def multiply_bits(self, scalar_bytes):
        from .scalar_mul import multiply_bits
        return multiply_bits(self, scalar_bytes, from_niels=True)

    def __mul__(self, scalar):
        """ExtendedNielsPoint * Fr -> ExtendedPoint
        (/root/reference/src/lib.rs:388-396)."""
        return self.multiply_bits(scalar.to_bytes())

    __rmul__ = __mul__


def select_point(mask, a, b):
    """Batched conditional select over any matching point types
    (conditional_select, /root/reference/src/lib.rs:106-125, :314-343)."""
    return _select(mask, a, b)


def batch_normalize(p: ExtendedPoint) -> AffinePoint:
    """Extended -> affine for a whole batch with ONE field inversion
    (/root/reference/src/lib.rs:1077-1107).  Works for any batch shape,
    including scalars."""
    shape = p.shape
    if shape == ():
        expanded = jax.tree_util.tree_map(lambda x: x[:, None], p)
        aff = batch_normalize(expanded)
        return jax.tree_util.tree_map(lambda x: x[:, 0], aff)
    from ..fields.spec import NLIMBS
    zl = p.z.limbs.reshape((NLIMBS, -1))
    zinv = Fq(mont.batch_invert(FQ_SPEC, zl, axis=1).reshape(p.z.limbs.shape))
    return AffinePoint(u=p.u * zinv, v=p.v * zinv)


def reduce_sum(p: ExtendedPoint, axis: int,
               sequential: bool = False) -> ExtendedPoint:
    """Point-addition reduction over one batch axis (axis is removed).

    Default is a log-depth tree (minimal runtime depth).  ``sequential=True``
    folds with a ``lax.scan`` instead: one traced addition body regardless of
    n, where the tree traces log2(n) additions at distinct shapes — the
    compile-light form used by the multi-chip dry run (XLA:CPU pays tens of
    seconds per traced point-op)."""
    axis = axis % len(p.shape)
    larr = axis + 1  # limb axis is 0 on the raw arrays
    n = p.shape[axis]
    if sequential and n > 1:
        first = jax.tree_util.tree_map(
            lambda x: jax.lax.index_in_dim(x, 0, axis=larr, keepdims=False), p)
        rest = jax.tree_util.tree_map(
            lambda x: jnp.moveaxis(
                jax.lax.slice_in_dim(x, 1, n, axis=larr), larr, 0), p)

        def body(acc, x):
            return acc.add_extended_niels(x.to_niels()), None

        acc, _ = jax.lax.scan(body, first, rest)
        return acc
    while n > 1:
        half = n // 2
        lo = jax.tree_util.tree_map(
            lambda x: jax.lax.slice_in_dim(x, 0, half, axis=larr), p)
        hi = jax.tree_util.tree_map(
            lambda x: jax.lax.slice_in_dim(x, half, 2 * half, axis=larr), p)
        s = lo.add_extended_niels(hi.to_niels())
        if n % 2:
            rest = jax.tree_util.tree_map(
                lambda x: jax.lax.slice_in_dim(x, 2 * half, n, axis=larr), p)
            s = jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a, b], axis=larr), s, rest)
        p = s
        n = p.shape[axis]
    return jax.tree_util.tree_map(lambda x: jnp.squeeze(x, axis=larr), p)


# -- Named constant points --------------------------------------------------

def full_generator(shape=()) -> AffinePoint:
    """Full-curve generator: lowest positive v with even u
    (/root/reference/src/lib.rs:1380-1396)."""
    return AffinePoint.from_raw_unchecked(
        oracle.GENERATOR_U, oracle.GENERATOR_V, shape)


def subgroup_generator(shape=()) -> AffinePoint:
    """Prime-order-subgroup generator = full generator * cofactor
    (/root/reference/src/lib.rs:1304-1306)."""
    return AffinePoint.from_raw_unchecked(*oracle.SUBGROUP_GENERATOR, shape)
