"""Scalar multiplication: constant-pattern, batched, windowed.

The reference runs a bit-serial MSB-first double-and-add over the 252
meaningful scalar bits (/root/reference/src/lib.rs:272-295, :356-379).  The
TPU-native primary path is a 4-bit fixed-window ladder: 63 windows of
(4 doublings + one table-select + one unified addition), with the 16-entry
table selected by a batched gather.  Same results bit-for-bit, ~4x fewer
additions, and the whole ladder is a single ``lax.scan`` so the traced
program stays small.  The bit-serial variant is kept for exact API parity
(``multiply_bits``).

Fixed-base multiplication uses per-window precomputed tables (63 x 16 affine
Niels points, built host-side with the Python oracle): no doublings at all,
just 63 gathered additions — the Pedersen-hash-style path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import oracle
from ..fields import Fq, Fr, mont
from ..fields.element import FQ_SPEC, FR_SPEC
from .points import (AffineNielsPoint, AffinePoint, ExtendedNielsPoint,
                     ExtendedPoint, select_point)

NWINDOWS = 63  # 252 bits / 4 (the top 4 bits of an Fr canonical repr are 0,
               # cf. /root/reference/src/lib.rs:365-367)


# ---------------------------------------------------------------------------
# Window digit extraction
# ---------------------------------------------------------------------------

def window_digits(scalar: Fr) -> jnp.ndarray:
    """Canonical 4-bit windows of a scalar, LSB-first: (63, *batch) int32."""
    from ..fields.spec import LIMB_BITS, NLIMBS
    canon = mont.to_canonical(FR_SPEC, scalar.limbs)  # (NLIMBS, *batch)
    digs = []
    for w in range(NWINDOWS):
        bitpos = 4 * w
        k, off = bitpos // LIMB_BITS, bitpos % LIMB_BITS
        v = canon[k] >> off
        if off + 4 > LIMB_BITS and k + 1 < NLIMBS:
            v = v | (canon[k + 1] << (LIMB_BITS - off))
        digs.append(v & 0xF)
    return jnp.stack(digs)


def _const_digits(k: int) -> np.ndarray:
    return np.array([(k >> (4 * w)) & 0xF for w in range(NWINDOWS)],
                    dtype=np.int32)


def window_digits_wide(scalar: Fr, wbits: int) -> jnp.ndarray:
    """LSB-first ``wbits``-bit windows of a canonical scalar:
    (ceil(252/wbits), *batch) int32.  Generalizes ``window_digits`` (4-bit)
    for the wide-window fixed-base path and Pippenger bucket widths: a
    window may straddle several 13-bit limbs (wbits <= 18 keeps the
    assembled window + the top limb shift inside int32)."""
    from ..fields.spec import LIMB_BITS, NLIMBS
    assert 1 <= wbits <= 18
    canon = mont.to_canonical(FR_SPEC, scalar.limbs)  # (NLIMBS, *batch)
    nwin = -(-252 // wbits)
    digs = []
    for w in range(nwin):
        bitpos = wbits * w
        k, off = bitpos // LIMB_BITS, bitpos % LIMB_BITS
        v = canon[k] >> off
        got = LIMB_BITS - off
        j = k + 1
        while got < wbits and j < NLIMBS:
            v = v | (canon[j] << got)
            got += LIMB_BITS
            j += 1
        digs.append(v & ((1 << wbits) - 1))
    return jnp.stack(digs)


def signed_digit_windows(wbits: int) -> int:
    """Number of signed ``wbits``-bit windows for a 252-bit scalar, including
    the extra carry window when the top window can overflow past 2^(w-1)."""
    nwin = -(-252 // wbits)
    top_bits = 252 - wbits * (nwin - 1)
    if (1 << top_bits) + 1 > (1 << (wbits - 1)):
        nwin += 1  # incoming carry can push the top window past +half
    return nwin


def signed_window_digits_wide(scalar: Fr, wbits: int) -> jnp.ndarray:
    """Signed ``wbits``-bit windows: (signed_digit_windows(wbits), *batch)
    int32 digits in [-(2^(w-1)-1), 2^(w-1)] with k = sum_w d_w * 2^(w*wbits).

    Signed recoding halves the table/one-hot width of the wide-window
    fixed-base path (magnitudes 1..2^(w-1) instead of digits 0..2^w-1) at
    the price of one masked Niels negation per window — the wNAF trick
    (group::Wnaf in the reference ecosystem) kept fixed-width so the
    instruction stream stays constant-pattern."""
    digs = window_digits_wide(scalar, wbits)
    half = 1 << (wbits - 1)
    nwin = signed_digit_windows(wbits)
    out = []
    carry = jnp.zeros_like(digs[0])
    for w in range(digs.shape[0]):
        t = digs[w] + carry
        big = t > half  # t in [half+1, 2^w] recodes to t - 2^w, carry 1
        out.append(jnp.where(big, t - (1 << wbits), t))
        carry = big.astype(jnp.int32)
    if nwin > digs.shape[0]:
        out.append(carry)  # final carry window (digit in {0, 1})
    return jnp.stack(out)


def signed_window_digits(scalar: Fr) -> jnp.ndarray:
    """Signed 4-bit windows: (64, *batch) int32 digits in [-8, 8] with
    k = sum_w d_w * 16^w.  Digit 63 is the final carry, in {0, 1}.

    Signed recoding halves the Niels table (8 multiples instead of 16) at
    the cost of a conditional negation, which for Niels points is just a
    coordinate swap plus one field negation — the same trick the reference
    ecosystem uses in wNAF form (group::Wnaf), kept fixed-width here so the
    instruction stream stays constant-pattern."""
    digs = window_digits(scalar)
    out = []
    carry = jnp.zeros_like(digs[0])
    for w in range(NWINDOWS):
        t = digs[w] + carry
        big = t > 8
        out.append(jnp.where(big, t - 16, t))
        carry = big.astype(jnp.int32)
    out.append(carry)
    return jnp.stack(out)


# ---------------------------------------------------------------------------
# Niels tables
# ---------------------------------------------------------------------------

def _stack_points(points):
    """List of matching point pytrees -> one pytree with a new leading axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *points)


def _take_entry(table, idx):
    """table: point pytree with leading table axis (T, 16, *batch);
    idx: (*batch) int32 -> selected point (16, *batch).

    Implemented as a binary select tree on the index bits (the TPU-friendly
    form of the reference's conditional_select chain,
    /root/reference/src/lib.rs:335-343): T-1 vectorized selects, no gather —
    per-lane gathers lower poorly on the VPU."""
    def g(arr):
        n = arr.shape[0]
        assert n & (n - 1) == 0, "table size must be a power of two"
        rows = [arr[i] for i in range(n)]
        bit = 0
        while len(rows) > 1:
            b = (idx >> bit) & 1
            rows = [jnp.where(b == 1, hi, lo)
                    for lo, hi in zip(rows[0::2], rows[1::2])]
            bit += 1
        return rows[0]
    return jax.tree_util.tree_map(g, table)


def _take_entry_const(table, idx):
    """Constant table pytree (T, 16limbs) gathered by batched idx (*batch)."""
    def g(arr):
        return jnp.moveaxis(arr[idx], -1, 0)
    return jax.tree_util.tree_map(g, table)


def extended_niels_table(p: ExtendedPoint):
    """[0]P..[15]P as stacked ExtendedNielsPoints (leading axis 16)."""
    pn = p.to_niels()

    def step(acc, _):
        return acc.add_extended_niels(pn), acc.to_niels()

    # outputs: niels(P), niels(2P), ..., niels(15P); carry discarded
    _, mults = jax.lax.scan(step, p, None, length=15)
    ident = ExtendedNielsPoint.identity(p.shape)
    return jax.tree_util.tree_map(
        lambda i, m: jnp.concatenate([i[None], m], axis=0), ident, mults)


def extended_niels_table8(p: ExtendedPoint):
    """[1]P..[8]P as stacked ExtendedNielsPoints (leading axis 8), the
    signed-window table."""
    pn = p.to_niels()

    def step(acc, _):
        return acc.add_extended_niels(pn), acc.to_niels()

    _, mults = jax.lax.scan(step, p, None, length=8)  # niels(P)..niels(8P)
    return mults


def negate_niels(entry, neg):
    """Batched conditional Niels negation: -(vpu, vmu, [z,] t2d) =
    (vmu, vpu, [z,] -t2d) (cf. the Neg impls,
    /root/reference/src/lib.rs:92-104 lifted through to_niels)."""
    vpu = entry.v_plus_u.conditional_select(entry.v_minus_u, ~neg)
    vmu = entry.v_minus_u.conditional_select(entry.v_plus_u, ~neg)
    t2d = entry.t2d.conditional_select(-entry.t2d, ~neg)
    if isinstance(entry, ExtendedNielsPoint):
        return ExtendedNielsPoint(v_plus_u=vpu, v_minus_u=vmu, z=entry.z,
                                  t2d=t2d)
    return AffineNielsPoint(v_plus_u=vpu, v_minus_u=vmu, t2d=t2d)


def _niels_ints(pt) -> tuple[int, int, int]:
    """Oracle affine point -> (v+u, v-u, 2d*u*v) Montgomery integers."""
    F = FQ_SPEC
    u, v = pt
    return ((v + u) % oracle.Q * F.R % oracle.Q,
            (v - u) % oracle.Q * F.R % oracle.Q,
            u * v % oracle.Q * oracle.EDWARDS_D2 % oracle.Q * F.R % oracle.Q)


def affine_niels_table_host(base: tuple[int, int]):
    """Host-side fixed-base table: 63 windows x 16 multiples, affine Niels.

    Built with the Python oracle (exact integers) and packed into limb
    planes by the native codec (jubjub_tpu.native.ints_to_limbs); returns a
    constant pytree of shape (63, 16, NLIMBS) per coordinate.
    Entry [w][d] = [d * 16^w]B."""
    from ..fields.spec import NLIMBS
    from ..native import ints_to_limbs
    vals = []
    for w in range(NWINDOWS):
        base_w = oracle.mul(base, pow(16, w, 1 << 256))
        for d in range(16):
            pt = oracle.mul(base_w, d) if d else oracle.IDENTITY
            vals.extend(_niels_ints(pt))
    # (NLIMBS, 63*16*3) -> [coord][w][d][limb].  NumPy-backed on purpose:
    # the table is a trace-time constant, and keeping it off-device means a
    # first use from inside a jit trace cannot leak a tracer into the
    # lru-cached FixedBaseTable (jnp converts np constants safely anywhere).
    arr = ints_to_limbs(vals).reshape(NLIMBS, NWINDOWS, 16, 3)
    arr = arr.transpose(3, 1, 2, 0)  # (3, 63, 16, NLIMBS)
    return AffineNielsPoint(
        v_plus_u=Fq(np.ascontiguousarray(arr[0])),
        v_minus_u=Fq(np.ascontiguousarray(arr[1])),
        t2d=Fq(np.ascontiguousarray(arr[2])),
    )


# ---------------------------------------------------------------------------
# Variable-base multiplication
# ---------------------------------------------------------------------------

def _windowed_ladder(table, digits, shape, affine: bool):
    """MSB-first 4-bit ladder: acc = 16*acc + table[digit]."""
    add = (ExtendedPoint.add_affine_niels if affine
           else ExtendedPoint.add_extended_niels)

    def body(acc, digit):
        for _ in range(4):
            acc = acc.double()
        return add(acc, _take_entry(table, digit)), None

    acc, _ = jax.lax.scan(body, ExtendedPoint.identity(shape), digits[::-1])
    return acc


def mul_extended(p: ExtendedPoint, scalar) -> ExtendedPoint:
    """ExtendedPoint * Fr (/root/reference/src/lib.rs:873-881)."""
    if isinstance(scalar, int):
        return mul_const_scalar(p, scalar)
    digits = window_digits(scalar)
    return _windowed_ladder(extended_niels_table(p), digits, p.shape, False)


def mul_affine(p: AffinePoint, scalar) -> ExtendedPoint:
    """AffinePoint * Fr via the 7M affine-niels additions
    (/root/reference/src/lib.rs:1109-1117)."""
    if isinstance(scalar, int):
        return mul_const_scalar(p.to_extended(), scalar)
    digits = window_digits(scalar)
    table = _affine_niels_table(p)
    return _windowed_ladder(table, digits, p.shape, True)


def _affine_niels_table(p: AffinePoint):
    """[0]P..[15]P as AffineNielsPoints.

    Multiples of an affine point are not affine in projective form, so build
    the table in extended coordinates and batch-normalize once (one
    inversion over 15 points)."""
    pn = p.to_niels()

    def step(acc, _):
        return acc + pn, acc

    _, mults_ext = jax.lax.scan(step, p.to_extended(), None, length=15)
    # scan stacks along a NEW leading axis: leaves are (15, 16limbs, *batch).
    # Field math needs the limb axis leading, so move it there and back.
    limb_first = jax.tree_util.tree_map(
        lambda a: jnp.moveaxis(a, 0, 1), mults_ext)       # (16, 15, *batch)
    from .points import batch_normalize
    niels = batch_normalize(limb_first).to_niels()        # batch (15, *batch)
    table = jax.tree_util.tree_map(
        lambda a: jnp.moveaxis(a, 1, 0), niels)           # (15, 16, *batch)
    ident = AffineNielsPoint.identity(p.shape)
    return jax.tree_util.tree_map(
        lambda i, m: jnp.concatenate([i[None], m], axis=0), ident, table)


def mul_const_scalar(p: ExtendedPoint, k: int) -> ExtendedPoint:
    """Point times a host-constant scalar (used for cofactor/order checks,
    e.g. is_torsion_free's multiply-by-r, /root/reference/src/lib.rs:709-711)."""
    k %= 1 << 256
    table = extended_niels_table(p)
    digits = jnp.asarray(_const_digits(k))
    if k >> 252:
        # general 256-bit constant: one extra window
        extra = jnp.asarray(np.array([(k >> 252) & 0xF], np.int32))
        digits = jnp.concatenate([digits, extra])
    return _windowed_ladder(table, digits, p.shape, False)


def multiply_bits(p, scalar_bytes, from_niels: bool = False) -> ExtendedPoint:
    """Bit-serial MSB-first double-and-add, exact loop parity with
    /root/reference/src/lib.rs:356-379 (skips the top 4 always-zero bits).

    ``scalar_bytes``: uint8 (32, *batch) little-endian."""
    niels = p if from_niels else p.to_niels()
    shape = niels.z.shape if from_niels else p.shape
    b = jnp.asarray(scalar_bytes, jnp.uint8).astype(jnp.int32)
    bits = []
    for byte in range(31, -1, -1):
        for bit in range(7, -1, -1):
            if byte == 31 and bit > 3:
                continue  # top 4 bits of a canonical Fr repr are zero
            bits.append((b[byte] >> bit) & 1)
    bits = jnp.stack(bits)  # (252, *batch), MSB first
    ident = ExtendedNielsPoint.identity(shape)

    def body(acc, bit):
        acc = acc.double()
        sel = select_point(bit == 1, niels, ident)
        return acc.add_extended_niels(sel), None

    acc, _ = jax.lax.scan(body, ExtendedPoint.identity(shape), bits)
    return acc


def multiply_bits_affine_niels(p: AffineNielsPoint, scalar_bytes) -> ExtendedPoint:
    """AffineNielsPoint::multiply parity (/root/reference/src/lib.rs:272-301)."""
    shape = p.t2d.shape
    b = jnp.asarray(scalar_bytes, jnp.uint8).astype(jnp.int32)
    bits = []
    for byte in range(31, -1, -1):
        for bit in range(7, -1, -1):
            if byte == 31 and bit > 3:
                continue
            bits.append((b[byte] >> bit) & 1)
    bits = jnp.stack(bits)
    ident = AffineNielsPoint.identity(shape)

    def body(acc, bit):
        acc = acc.double()
        sel = select_point(bit == 1, p, ident)
        return acc.add_affine_niels(sel), None

    acc, _ = jax.lax.scan(body, ExtendedPoint.identity(shape), bits)
    return acc


# ---------------------------------------------------------------------------
# Fixed-base multiplication (no reference counterpart; Pedersen-style tables)
# ---------------------------------------------------------------------------

def affine_niels_chunk_table_host(base: tuple[int, int], wbits: int = 8,
                                  signed: bool = False):
    """Wide-window fixed-base table packed for the one-hot MXU lookup.

    Unsigned: entry [w][d] = affine Niels coords of [d * 2^(wbits*w)]B for
    d in [0, 2^wbits).  Signed: entry [w][m-1] = [m * 2^(wbits*w)]B for
    magnitudes m in [1, 2^(wbits-1)] — half the columns; the kernel handles
    sign by Niels coordinate swap + t2d negation, and digit 0 by a masked
    identity override.

    Each 13-bit Montgomery limb is split into a low-7/high-6 chunk so a
    bf16 one-hot matmul reconstructs it exactly (values <= 127 are exact in
    bf16 and the one-hot contraction touches exactly one column).

    Returns a bf16 array (nwindows, 120, tsize): rows are
    [chunk(2)][coord(3: v+u, v-u, t2d)][limb(20)] flattened.

    Only HOST (NumPy) data is cached; the jnp conversion happens per call
    so that a first call from inside a jit trace cannot poison the cache
    with a tracer (jnp ops on np constants are safe anywhere).
    """
    import jax.numpy as jnp
    return jnp.asarray(_chunk_table_np(base, wbits, signed)).astype(jnp.bfloat16)


@functools.lru_cache(maxsize=8)
def _chunk_table_np(base: tuple[int, int], wbits: int,
                    signed: bool) -> np.ndarray:
    from ..fields.spec import NLIMBS
    from ..native import ints_to_limbs
    nwin = signed_digit_windows(wbits) if signed else -(-252 // wbits)
    tsize = 1 << (wbits - 1) if signed else 1 << wbits

    vals = []
    for w in range(nwin):
        base_w = oracle.mul(base, 1 << (wbits * w))
        pt = base_w if signed else oracle.IDENTITY
        for col in range(tsize):
            if col:
                pt = oracle.add(pt, base_w)  # next multiple incrementally
            vals.extend(_niels_ints(pt))
    # (NLIMBS, nwin*tsize*3) -> (nwin, 3, NLIMBS, tsize)
    limbs = ints_to_limbs(vals).reshape(NLIMBS, nwin, tsize, 3)
    limbs = limbs.transpose(1, 3, 0, 2)

    lo = limbs & 0x7F
    hi = limbs >> 7
    packed = np.concatenate([lo, hi], axis=1)  # (nwin, 6, 20, tsize)
    return np.ascontiguousarray(packed.reshape(nwin, 6 * NLIMBS, tsize))


class FixedBaseTable:
    """Precomputed-window multiplier for a fixed host-known base point.

    k*B = sum_w [digit_w(k) * 16^w]B: 63 gathered 7M additions, zero
    doublings.  Tables are trace-time constants (host-built via the oracle).
    The fused TPU path (``mul_fused``) widens the windows to 8 bits — 32
    additions per scalar-mul — with the 256-entry lookup done as a one-hot
    bf16 matmul on the MXU (ops/pallas_fixed_base.py).
    """

    def __init__(self, base: tuple[int, int]):
        self.base = base
        self.table = affine_niels_table_host(base)  # (63, 16, 16limbs)

    def mul_fused(self, scalar: Fr, wbits: int | None = None,
                  signed: bool | None = None,
                  block: int | None = None) -> ExtendedPoint:
        """Fused-kernel fixed-base multiply (bit-equal group element to
        ``mul``; different projective representative).  Signed window
        digits (the config default) halve the one-hot/table width for one
        masked Niels negation per window — measurably faster.  Defaults
        come from ``jubjub_tpu.config``."""
        from .. import config
        from ..ops.pallas_fixed_base import fixed_base_mul_fused
        wbits = config.FIXED_BASE_WBITS if wbits is None else wbits
        signed = config.FIXED_BASE_SIGNED if signed is None else signed
        return fixed_base_mul_fused(
            affine_niels_chunk_table_host(self.base, wbits, signed),
            scalar, wbits, block=block or config.FIXED_BASE_BLOCK,
            signed=signed)

    def mul(self, scalar: Fr) -> ExtendedPoint:
        digits = window_digits(scalar)  # (63, *batch)
        shape = scalar.shape
        # the cached table is NumPy-backed (tracer-safety); lift to jnp here
        # so the scan below can index it with traced window indices
        table = jax.tree_util.tree_map(jnp.asarray, self.table)

        def body(acc, wd):
            w, digit = wd
            tw = jax.tree_util.tree_map(lambda a: a[w], table)  # (16, 16limbs)
            entry = _take_entry_const(tw, digit)  # (16limbs, *batch)
            return acc.add_affine_niels(entry), None

        ws = jnp.arange(NWINDOWS)
        acc, _ = jax.lax.scan(body, ExtendedPoint.identity(shape), (ws, digits))
        return acc


@functools.lru_cache(maxsize=4)
def generator_table() -> FixedBaseTable:
    return FixedBaseTable(oracle.SUBGROUP_GENERATOR)


@functools.lru_cache(maxsize=4)
def full_generator_table() -> FixedBaseTable:
    return FixedBaseTable(oracle.GENERATOR)
