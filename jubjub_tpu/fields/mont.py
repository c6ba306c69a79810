"""Vectorized Montgomery arithmetic on 20x13-bit limb planes.

Every function operates on int32 arrays of shape ``(NLIMBS, *batch)`` — limb
axis leading, arbitrary batch shape trailing — holding canonical Montgomery
residues (each limb in ``[0, 2^13)``, value ``< p``).  All control flow is
static; the same instruction stream runs for every input ("constant pattern"),
the TPU analogue of the reference's constant-time contract
(/root/reference/src/lib.rs:12-17).

The 13-bit radix is *split-free*: every 13x13 product (< 2^26) lands in a
uint32 carry-save column with one add, and worst-case column sums (< 40
products) stay under 2^32 (see fields/spec.py for the bound).

Algorithm parity with the reference:
  - ``mul``/``_mont_reduce_rows``: schoolbook product + HAC 14.32 Montgomery
    reduction (/root/reference/src/fr.rs:544-616), radix 2^13 instead of 2^64,
    carry-save uint32 columns instead of u128 carries.
  - ``add``/``sub``/``neg``: /root/reference/src/fr.rs:620-665.
  - ``square``: upper-triangle doubling (/root/reference/src/fr.rs:353-381).
  - ``pow_const``: fixed-window exponentiation; replaces both the bit-serial
    ``pow`` (/root/reference/src/fr.rs:403-414) and the addition-chain
    ``invert`` (/root/reference/src/fr.rs:438-540) — exponents are trace-time
    constants so the schedule is data-independent either way.
  - byte I/O: /root/reference/src/fr.rs:268-349.
  - ``batch_invert``: ff::BatchInverter (used at
    /root/reference/src/lib.rs:1084-1107) re-shaped as parallel prefix/suffix
    scans so inversion of N elements costs one ``invert`` + O(N) muls with
    O(log N) depth.

Lazy reduction contract (no reference counterpart — the u64 layout can't):
values are REDUNDANT residues: 13-bit-normalized planes whose integer value
is < c*p for a small per-site bound c, not necessarily < p.  ``mul``/
``square`` emit c=2; ``add`` emits c_a+c_b; ``sub(a,b,k)`` (requires k >= c_b)
emits c_a+k.  The mul/square precondition is c_a*c_b <= 32 (so the column
value stays < p*2^260; 2^260/p ~ 35.3), and any value must stay < 2^260
(c <= 35).  Point formulas keep bounds <= 8 with one ``cond_sub_kp`` per
group op; ``to_canonical``/``eq``/``is_zero``/byte-encoding are the canonical
boundaries where exact representatives are restored.
"""

from __future__ import annotations

import contextlib
import contextvars
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .spec import LIMB_BITS, MASK, NLIMBS, FieldSpec, int_to_limbs

_U32 = jnp.uint32
_I32 = jnp.int32
NACC = 2 * NLIMBS + 1  # 41 carry-save columns for a full product


# ---------------------------------------------------------------------------
# Constants / constructors
# ---------------------------------------------------------------------------

def zero(F: FieldSpec, batch_shape=()) -> jnp.ndarray:
    return jnp.zeros((NLIMBS,) + tuple(batch_shape), _I32)


def const_mont(F: FieldSpec, x: int, batch_shape=()) -> jnp.ndarray:
    """Montgomery form of the integer ``x`` broadcast over a batch.

    Built limb-by-limb from scalar immediates (XLA constant-folds this to a
    single constant; inside Pallas kernels it avoids the forbidden captured
    constant array)."""
    from .spec import int_to_limbs
    limbs = int_to_limbs(x % F.p * F.R % F.p)
    shape = tuple(batch_shape)
    return jnp.stack([jnp.full(shape, int(l), _I32) for l in limbs])


def one(F: FieldSpec, batch_shape=()) -> jnp.ndarray:
    return const_mont(F, 1, batch_shape)


# ---------------------------------------------------------------------------
# Carry machinery
# ---------------------------------------------------------------------------

def _carry_norm(rows: list[jnp.ndarray]) -> tuple[list[jnp.ndarray], jnp.ndarray]:
    """Exact carry propagation of nonnegative column sums (int32 or uint32).

    Returns (LIMB_BITS-bit int32 limbs, final carry).  Sequential in the limb
    axis, fully vectorized over the batch.
    """
    out = []
    carry = jnp.zeros_like(rows[0])
    for r in rows:
        t = r + carry
        out.append((t & MASK).astype(_I32))
        carry = t >> LIMB_BITS
    return out, carry


def _cond_sub_p(F: FieldSpec, limbs: list[jnp.ndarray], top: jnp.ndarray) -> jnp.ndarray:
    """Given a normalized value ``v = limbs + top*2^256 < 2p``, return v mod p.

    Mirrors the trailing conditional subtraction of the reference reduction
    (/root/reference/src/fr.rs:587, :645-647).
    """
    borrow = jnp.zeros_like(limbs[0])
    diff = []
    for i in range(NLIMBS):
        t = limbs[i] - int(F.p_limbs[i]) - borrow
        diff.append(t & MASK)
        borrow = (t >> LIMB_BITS) & 1
    geq = top >= borrow  # v >= p
    return jnp.stack([jnp.where(geq, d, l) for d, l in zip(diff, limbs)])


# ---------------------------------------------------------------------------
# Add / sub / neg
# ---------------------------------------------------------------------------

def add(F: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Lazy add: carry-normalize only (no mod reduction; bound c_a + c_b).

    Valid while the running value stays < 2^260 (callers keep bounds <= 16p,
    see the lazy-reduction contract)."""
    s = a + b  # limbs <= 2*(2^13-1), exact in int32
    limbs, _ = _carry_norm([s[i] for i in range(NLIMBS)])
    return jnp.stack(limbs)  # value < 2^260: top carry is always 0


def sub(F: FieldSpec, a: jnp.ndarray, b: jnp.ndarray, k: int = 2) -> jnp.ndarray:
    """Lazy subtract: a + k*p - b in one fused carry chain.

    ``k`` is a static headroom bound with k*p >= b (callers pass the bound
    multiple of the subtrahend; default 2 covers any single lazy mul/reduce
    output).  Result bound: < (c_a + k)*p.  Replaces the reference's
    borrow-then-conditional-add-p (/root/reference/src/fr.rs:620-634)."""
    from .spec import int_to_limbs
    assert k * F.p < (1 << (LIMB_BITS * NLIMBS))
    kp = int_to_limbs(k * F.p)
    carry = jnp.zeros_like(a[0])
    limbs = []
    for i in range(NLIMBS):
        t = a[i] + int(kp[i]) - b[i] + carry
        limbs.append(t & MASK)
        carry = t >> LIMB_BITS  # arithmetic shift handles the transient borrow
    return jnp.stack(limbs)  # a + k*p - b >= 0 and < 2^260: carry is 0


def neg(F: FieldSpec, a: jnp.ndarray, k: int = 2) -> jnp.ndarray:
    """k*p - a: congruent to -a mod p (cf. /root/reference/src/fr.rs:651-665;
    the canonical boundary maps the redundant zero back to 0)."""
    return sub(F, jnp.zeros_like(a), a, k=k)


def cond_sub_kp(F: FieldSpec, x: jnp.ndarray, k: int) -> jnp.ndarray:
    """One conditional reduction step: x - k*p if x >= k*p, else x.

    Brings a value < 2k*p back under k*p (used at the few spots in the point
    formulas where lazy bounds would overflow the mul precondition)."""
    from .spec import int_to_limbs
    kp = int_to_limbs(k * F.p)
    borrow = jnp.zeros_like(x[0])
    diff = []
    for i in range(NLIMBS):
        t = x[i] - int(kp[i]) - borrow
        diff.append(t & MASK)
        borrow = (t >> LIMB_BITS) & 1
    geq = borrow == 0  # x >= k*p
    return jnp.stack([jnp.where(geq, d, x[i]) for i, d in enumerate(diff)])


def double_el(F: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return add(F, a, a)


# ---------------------------------------------------------------------------
# Multiplication / squaring / Montgomery reduction
# ---------------------------------------------------------------------------

def _mont_reduce_rows(F: FieldSpec, cols: list[jnp.ndarray],
                      canonical: bool = False) -> jnp.ndarray:
    """Reduce 41 uint32 carry-save columns: returns (v / 2^260) mod p.

    By default the result is *lazily* reduced: a 13-bit-normalized value in
    ``[0, 2p)`` (the final conditional subtraction is skipped — the classic
    redundant-representation optimization the reference cannot apply to its
    fixed u64 layout).  Pass ``canonical=True`` for the exact representative
    in ``[0, p)``.  See the "Lazy reduction" note at the top of this module.

    Radix-2^13 analogue of HAC Algorithm 14.32
    (/root/reference/src/fr.rs:544-588): 20 rounds of
    ``k = cols[i] * (-p^-1) mod 2^13; cols += k*p << 13i; carry``, then a
    final normalization + conditional subtract.  Each k*p_j product (< 2^26)
    is accumulated with a single add — no lo/hi split — and column sums stay
    < 2^32 (bound in fields/spec.py).  Columns are a Python list of per-row
    uint32 arrays — row-wise accumulation benchmarks faster than padded
    full-plane adds, and the scalar-immediate multiplies keep the code
    Pallas-kernel-safe (no captured constant arrays)."""
    assert len(cols) == NACC
    inv = np.uint32(F.inv_limb)
    for rnd in range(NLIMBS):
        if F.inv_limb == MASK:
            # p == 1 (mod 2^13) => -p^-1 == -1: k = -c mod 2^13 (saves a mul;
            # holds for Fq, whose low 32 bits are 0x00000001)
            k = (jnp.zeros_like(cols[rnd]) - cols[rnd]) & MASK
        else:
            k = (cols[rnd] * inv) & MASK  # low LIMB_BITS of cols[rnd] * inv
        for j in range(NLIMBS):
            pj = int(F.p_limbs[j])
            if pj == 0:
                continue  # structural zero limb of p
            term = k if pj == 1 else k * np.uint32(pj)
            cols[rnd + j] = cols[rnd + j] + term
        # low 13 bits of cols[rnd] are now 0 mod 2^13; fold the carry up
        cols[rnd + 1] = cols[rnd + 1] + (cols[rnd] >> LIMB_BITS)
    limbs, top = _carry_norm(cols[NLIMBS:NACC])
    # value < 2p < 2^256 < 2^260: `limbs` has NLIMBS+1 entries, the last one
    # (bits >= 260) is always 0; keep it exact anyway.
    assert len(limbs) == NLIMBS + 1
    if not canonical:
        return jnp.stack(limbs[:NLIMBS])  # redundant form, < 2p
    top_col = limbs[NLIMBS] + (top << LIMB_BITS).astype(_I32)
    return _cond_sub_p(F, limbs[:NLIMBS], top_col)


def _zero_cols(a: jnp.ndarray, b: jnp.ndarray) -> list[jnp.ndarray]:
    shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    return [jnp.zeros(shape, _U32)] * NACC


# ---------------------------------------------------------------------------
# MXU Montgomery reduction: the per-round k*p work as constant-matrix matmuls
# ---------------------------------------------------------------------------
#
# The HAC 14.32 rounds (/root/reference/src/fr.rs:544-588) interleave the
# quotient-digit computation with the fold of k*MODULUS.  On TPU the fold is
# the multiply-heavy half, and BOTH of its operands-against-constants are
# matrix products with matrices known at trace time:
#
#     k  = (V mod R) * p'  mod R        p' = -p^-1 mod 2^260   (Toeplitz)
#     T  = V + k * p                    p  Toeplitz, T = 0 mod R
#     out = T / R  (top 20 limbs)       out < 2p (same lazy bound as rows)
#
# so the ~840 per-lane VPU multiplies of the row reduction become two int8
# MXU matmuls against (3*20, 40) / (3*41, 40) constant matrices: each 13-bit
# limb splits into a 7-bit and a 6-bit int8 chunk, and the three shift blocks
# (2^0, 2^7, 2^14) of the product are recombined on the VPU.  All column
# bounds stay < 2^31 (20 terms of 127*127 / 127*63 / 63*63 per block).
# Outputs are BIT-IDENTICAL to the row reduction.
#
# Pallas kernels cannot capture constant arrays, so kernels load the two
# matrices from input refs and install them with ``matmul_tables``; at XLA
# level ``use_mxu_reduce`` installs them as ordinary jnp constants.
#
# Status note (measured, v5e): inside fused Pallas kernels Mosaic lowers
# these small-K s8 dots to VPU loops, which is SLOWER than the row
# reduction (539k vs 1.14M ladder ops/s) — so the hot kernels keep
# ``_mont_reduce_rows``.  The matmul path's standing value is its ~2x
# smaller traced program: XLA-level consumers on compile-time-critical
# paths (the multi-chip dry run, CPU tests) opt in via ``use_mxu_reduce``.

_MM_TABLES: contextvars.ContextVar = contextvars.ContextVar(
    "jubjub_mm_tables", default=None)


def _toeplitz(vals, nrows: int, ncols: int) -> np.ndarray:
    M = np.zeros((nrows, ncols), np.int64)
    for n in range(nrows):
        for i in range(ncols):
            j = n - i
            if 0 <= j < len(vals):
                M[n, i] = vals[j]
    return M


def _shift_blocks(M: np.ndarray) -> np.ndarray:
    """13-bit matrix (nrows, 20) -> int8 shift-block matrix (3*nrows, 40).

    Row blocks are the 2^0 / 2^7 / 2^14 partial products of the 7/6-bit
    chunk decomposition; columns pair with [x & 0x7f, x >> 7] chunks."""
    lo = (M & 0x7F).astype(np.int8)
    hi = (M >> 7).astype(np.int8)
    nrows = M.shape[0]
    W = np.zeros((3 * nrows, 2 * NLIMBS), np.int8)
    W[0 * nrows:1 * nrows, :NLIMBS] = lo
    W[1 * nrows:2 * nrows, :NLIMBS] = hi
    W[1 * nrows:2 * nrows, NLIMBS:] = lo
    W[2 * nrows:3 * nrows, NLIMBS:] = hi
    return W


@functools.lru_cache(maxsize=4)
def mont_matrices(F: FieldSpec) -> tuple[np.ndarray, np.ndarray]:
    """(WK8, WP8) int8 constant matrices for the MXU reduction."""
    R_mod = 1 << (LIMB_BITS * NLIMBS)
    pprime = (-pow(F.p, -1, R_mod)) % R_mod
    MK = _toeplitz(int_to_limbs(pprime), NLIMBS, NLIMBS)
    MP = _toeplitz(F.p_limbs, NACC, NLIMBS)
    return _shift_blocks(MK), _shift_blocks(MP)


@contextlib.contextmanager
def matmul_tables(wk, wp):
    """Install traced (WK8, WP8) values (e.g. Pallas VMEM ref loads) so that
    mul/square inside the scope use the MXU reduction."""
    token = _MM_TABLES.set((wk, wp))
    try:
        yield
    finally:
        _MM_TABLES.reset(token)


@contextlib.contextmanager
def use_mxu_reduce(F: FieldSpec):
    """XLA-level scope: same MXU reduction with jnp-constant matrices."""
    wk, wp = mont_matrices(F)
    with matmul_tables(jnp.asarray(wk), jnp.asarray(wp)):
        yield


def _carry_norm_exact(rows: list[jnp.ndarray]) -> list[jnp.ndarray]:
    """Exact int32 carry propagation (values nonnegative, < 2^31)."""
    out = []
    carry = jnp.zeros_like(rows[0], dtype=_I32)
    for r in rows:
        t = r.astype(_I32) + carry
        out.append(t & MASK)
        carry = t >> LIMB_BITS
    return out


def _mm_chunks(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """(20, *batch) 13-bit limbs -> (40, n) int8 chunk planes."""
    lo = x & 0x7F
    hi = x >> 7
    return jnp.concatenate([lo, hi], axis=0).reshape(2 * NLIMBS, n).astype(jnp.int8)


def _mm_apply(w: jnp.ndarray, x8: jnp.ndarray, nrows: int, shape) -> jnp.ndarray:
    """w (3*nrows, 40) int8 @ x8 (40, n) int8 -> recombined (nrows, *shape)."""
    out = jax.lax.dot_general(w, x8, (((1,), (0,)), ((), ())),
                              preferred_element_type=_I32)
    out = out.reshape((3, nrows) + tuple(shape))
    return out[0] + (out[1] << 7) + (out[2] << 14)


def _mont_reduce_matmul(F: FieldSpec, cols: list[jnp.ndarray],
                        wk: jnp.ndarray, wp: jnp.ndarray) -> jnp.ndarray:
    """MXU Montgomery reduce of 41 carry-save columns; lazy result < 2p.

    Bit-identical to ``_mont_reduce_rows(..., canonical=False)``."""
    assert len(cols) == NACC
    shape = cols[0].shape
    n = 1
    for d in shape:
        n *= d
    V = _carry_norm_exact(cols)                      # 41 exact 13-bit limbs
    vlo8 = _mm_chunks(jnp.stack(V[:NLIMBS]), n)
    kcols = _mm_apply(wk, vlo8, NLIMBS, shape)       # k's carry-save columns
    k = jnp.stack(_carry_norm_exact([kcols[i] for i in range(NLIMBS)]))
    kp = _mm_apply(wp, _mm_chunks(k, n), NACC, shape)
    T = [kp[i] + V[i] for i in range(NACC)]          # = V + k*p, 0 mod 2^260
    R_ = _carry_norm_exact(T)
    return jnp.stack(R_[NLIMBS:NACC - 1])            # (V + k*p) / 2^260 < 2p


def _reduce_dispatch(F: FieldSpec, cols: list[jnp.ndarray],
                     canonical: bool = False) -> jnp.ndarray:
    tables = _MM_TABLES.get()
    if tables is not None and not canonical:
        return _mont_reduce_matmul(F, cols, *tables)
    return _mont_reduce_rows(F, cols, canonical=canonical)


def mul(F: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product a*b*2^-260 mod p (/root/reference/src/fr.rs:592-616).

    Valid for any 13-bit-normalized inputs with a*b < p * 2^260 (in particular
    canonical residues, and the raw < 2^256 halves used by from_bytes_wide).

    The product phase is schoolbook (400 limb products) or one level of
    subtractive Karatsuba (300 products; ``config.MUL_KARATSUBA``) — the two
    produce BIT-IDENTICAL column values (proof at ``_product_cols_karatsuba``),
    so the flag is purely a performance A/B.
    """
    if _use_karatsuba():
        return _reduce_dispatch(F, _product_cols_karatsuba(a, b))
    au = a.astype(_U32)
    bu = b.astype(_U32)
    cols = _zero_cols(a, b)
    for i in range(NLIMBS):
        prod = au[i] * bu  # (NLIMBS, *batch) uint32, exact (< 2^26)
        for j in range(NLIMBS):
            cols[i + j] = cols[i + j] + prod[j]
    return _reduce_dispatch(F, cols)


def _use_karatsuba() -> bool:
    """Trace-time resolution of config.MUL_KARATSUBA (None = TPU auto)."""
    from .. import config
    flag = config.MUL_KARATSUBA
    if flag is None:
        return jax.default_backend() == "tpu"
    return flag


def _product_cols_karatsuba(a: jnp.ndarray, b: jnp.ndarray) -> list[jnp.ndarray]:
    """Schoolbook-identical product columns via subtractive Karatsuba.

    Split a = a0 + a1*2^(13*H), b likewise (H = NLIMBS//2 = 10 limbs).  With
        z0 = a0*b0,  z2 = a1*b1,  m = (a0-a1)*(b0-b1)
    the cross columns are z0 + z2 - m = columns of a0*b1 + a1*b0 — exactly
    the schoolbook cross terms, so every output column EQUALS the schoolbook
    column (same integers, same <40*2^26 bound; fields/spec.py) and the
    downstream Montgomery reduction is unchanged.  Exactness of the signed
    intermediates (all in int32):
      - a0_i - a1_i in (-2^13, 2^13); products in (-2^26, 2^26)
      - m columns: <= H terms -> |.| < 10*2^26 < 2^30
      - z0/z2 columns: <= H nonneg terms < 10*2^26 < 2^30
      - cross column z0c + z2c - mc: intermediate sum < 2^31, final value
        in [0, 20*2^26] (it is a sum of <= 2H nonneg 13x13 products)
    Cost: 3*H^2 = 300 limb products vs NLIMBS^2 = 400 (~8% of fused-kernel
    time per docs/performance.md's measured cost model).
    """
    H = NLIMBS // 2
    assert NLIMBS == 2 * H
    ai = a.astype(_I32)
    bi = b.astype(_I32)
    a0, a1 = ai[:H], ai[H:]
    b0, b1 = bi[:H], bi[H:]
    da = a0 - a1   # signed, |.| < 2^13
    db = b0 - b1

    def _half_product(x, y):
        """Columns of a 10x10 limb product: 19 signed int32 columns."""
        shape = jnp.broadcast_shapes(x.shape[1:], y.shape[1:])
        cols = [jnp.zeros(shape, _I32)] * (2 * H - 1)
        for i in range(H):
            prod = x[i] * y
            for j in range(H):
                cols[i + j] = cols[i + j] + prod[j]
        return cols

    z0 = _half_product(a0, b0)
    z2 = _half_product(a1, b1)
    m = _half_product(da, db)
    # cross[c] = z0[c] + z2[c] - m[c]  (== columns of a0*b1 + a1*b0, >= 0)
    cross = [z0[c] + z2[c] - m[c] for c in range(2 * H - 1)]

    out = _zero_cols(a, b)
    for c in range(2 * H - 1):
        out[c] = out[c] + z0[c].astype(_U32)
        out[c + H] = out[c + H] + cross[c].astype(_U32)
        out[c + 2 * H] = out[c + 2 * H] + z2[c].astype(_U32)
    return out


def mul_const(F: FieldSpec, a: jnp.ndarray, c: int) -> jnp.ndarray:
    """a * c for a small constant c (via Montgomery mul by c*R mod p)."""
    return mul(F, a, const_mont(F, c, a.shape[1:]))


def square(F: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Optimized squaring: double the upper triangle
    (/root/reference/src/fr.rs:353-381).

    ``config.MUL_KARATSUBA`` swaps in the subtractive-Karatsuba product
    phase (3 half-squares, 165 limb products vs 210) — bit-identical column
    values, same argument as ``_product_cols_karatsuba`` with m = (a0-a1)^2
    nonnegative and cross = 2*a0*a1 columns <= 20*2^26."""
    if _use_karatsuba():
        return _reduce_dispatch(F, _square_cols_karatsuba(a))
    au = a.astype(_U32)
    cols = _zero_cols(a, a)
    for i in range(NLIMBS):
        d = au[i] * au[i]
        cols[2 * i] = cols[2 * i] + d
        if i + 1 < NLIMBS:
            prod = (au[i] * au[i + 1:]) << 1  # doubled cross terms, < 2^27;
            for jj, j in enumerate(range(i + 1, NLIMBS)):
                cols[i + j] = cols[i + j] + prod[jj]
    # column c collects <= NLIMBS/2 doubled cross products (< 2^27) plus one
    # diagonal and the reduce's k*p terms: still < 2^32 (spec.py bound).
    return _reduce_dispatch(F, cols)


def _square_cols_karatsuba(a: jnp.ndarray) -> list[jnp.ndarray]:
    """Schoolbook-identical square columns via subtractive Karatsuba:
    z0 = a0^2, z2 = a1^2, cross = z0 + z2 - (a0-a1)^2 == columns of 2*a0*a1.
    Half-square columns: <= 5 doubled cross terms (< 2^27) + one diagonal
    -> < 2^30; intermediate z0c + z2c < 2^31; cross >= 0 <= 20*2^26."""
    H = NLIMBS // 2
    ai = a.astype(_I32)
    a0, a1 = ai[:H], ai[H:]
    da = a0 - a1

    def _half_square(x):
        shape = x.shape[1:]
        cols = [jnp.zeros(shape, _I32)] * (2 * H - 1)
        for i in range(H):
            cols[2 * i] = cols[2 * i] + x[i] * x[i]
            if i + 1 < H:
                prod = (x[i] * x[i + 1:]) << 1
                for jj, j in enumerate(range(i + 1, H)):
                    cols[i + j] = cols[i + j] + prod[jj]
        return cols

    z0 = _half_square(a0)
    z2 = _half_square(a1)
    m = _half_square(da)
    cross = [z0[c] + z2[c] - m[c] for c in range(2 * H - 1)]

    out = _zero_cols(a, a)
    for c in range(2 * H - 1):
        out[c] = out[c] + z0[c].astype(_U32)
        out[c + H] = out[c + H] + cross[c].astype(_U32)
        out[c + 2 * H] = out[c + 2 * H] + z2[c].astype(_U32)
    return out


# ---------------------------------------------------------------------------
# Montgomery domain conversion
# ---------------------------------------------------------------------------

def to_canonical(F: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery -> standard representative (cf. to_bytes' reduction,
    /root/reference/src/fr.rs:296-308)."""
    au = a.astype(_U32)
    z = jnp.zeros_like(au[0])
    cols = [au[i] for i in range(NLIMBS)] + [z] * (NACC - NLIMBS)
    return _mont_reduce_rows(F, cols, canonical=True)


def from_canonical(F: FieldSpec, x: jnp.ndarray) -> jnp.ndarray:
    """Standard representative (< p) -> Montgomery form: mont_mul(x, R^2)."""
    return mul(F, x, const_mont(F, F.R, x.shape[1:]))


# ---------------------------------------------------------------------------
# Predicates
# ---------------------------------------------------------------------------

def eq(F: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a == b mod p. Under lazy reduction limb planes are redundant, so
    equality is (a - b) == 0 after one canonical reduction.

    PRECONDITION: ``b``'s lazy bound must be <= 8p (the fixed ``k=8``
    headroom added before the borrow-free subtraction).  Every current
    caller satisfies it — public operator values are < 2p and point
    coordinates stay <= 6p (see curve/points.py bound comments) — but a
    caller holding a wider internal lazy value must ``reduce_once`` first;
    the subtraction would otherwise underflow and compare garbage."""
    return is_zero(F, sub(F, a, b, k=8))


def is_zero(F: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """a == 0 mod p (canonicalizes: the redundant forms of 0 are 0, p, 2p...)."""
    return jnp.all(to_canonical(F, a) == 0, axis=0)


def select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """mask ? a : b, with mask shaped like the batch (broadcast across limbs)."""
    return jnp.where(mask, a, b)


# ---------------------------------------------------------------------------
# Fixed-exponent exponentiation / inversion
# ---------------------------------------------------------------------------

def pow_const(F: FieldSpec, a: jnp.ndarray, e: int) -> jnp.ndarray:
    """a^e for a trace-time-constant exponent, 4-bit fixed windows.

    Replaces the reference's bit-serial ``pow`` (/root/reference/src/fr.rs:403-414)
    and its hand-rolled addition-chain ``invert`` — with a static exponent the
    window schedule is already data-independent, and the windowed form keeps
    the traced program small (a fori_loop over 64 window digits).
    """
    assert e >= 0
    if e == 0:
        return one(F, a.shape[1:])
    # 4-bit table: t[0] = 1, t[i] = a^i
    table = [one(F, a.shape[1:]), a]
    for _ in range(14):
        table.append(mul(F, table[-1], a))
    tbl = jnp.stack(table)  # (16, 16, *batch)

    ndigits = 64
    digits = np.array([(e >> (4 * (ndigits - 1 - i))) & 0xF for i in range(ndigits)],
                      dtype=np.int32)
    first = int(np.argmax(digits != 0))  # skip leading zero windows (static)
    digits_dev = jnp.asarray(digits)

    def body(i, acc):
        for _ in range(4):
            acc = square(F, acc)
        return mul(F, acc, tbl[digits_dev[i]])

    acc = tbl[int(digits[first])]
    return jax.lax.fori_loop(first + 1, ndigits, body, acc)


def pow_traced(F: FieldSpec, a: jnp.ndarray, e: jnp.ndarray) -> jnp.ndarray:
    """a^e for a RUNTIME (traced, possibly batched) 256-bit exponent.

    ``e`` is a standard-form 13-bit limb plane (NLIMBS, *batch) holding the
    exponent as an integer < 2^256 (NOT reduced mod p-1, matching the
    reference's ``Fr::pow`` over a raw [u64;4], /root/reference/src/fr.rs:
    403-414).  Constant-pattern square-and-multiply: 256 fixed iterations of
    one square and one masked multiply — the TPU analogue of the reference's
    ``conditional_assign`` ladder; the instruction stream is independent of
    the exponent bits."""
    shape = jnp.broadcast_shapes(a.shape[1:], e.shape[1:])
    acc = one(F, shape)

    def body(i, acc):
        acc = square(F, acc)
        j = 255 - i
        limb = jax.lax.dynamic_index_in_dim(e, j // LIMB_BITS, axis=0,
                                            keepdims=False)
        bit = (limb >> (j % LIMB_BITS)) & 1
        return select(bit == 1, mul(F, acc, a), acc)

    return jax.lax.fori_loop(0, 256, body, acc)


def invert(F: FieldSpec, a: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(a^-1, is_invertible). a == 0 maps to (0, False)
    (cf. /root/reference/src/fr.rs:438-540)."""
    return pow_const(F, a, F.p - 2), ~is_zero(F, a)


# ---------------------------------------------------------------------------
# Byte I/O (little-endian 32-byte encodings)
# ---------------------------------------------------------------------------

def limbs_from_le_bytes(b: jnp.ndarray) -> jnp.ndarray:
    """uint8 (32, *batch) -> int32 (NLIMBS, *batch) standard-form limbs.

    Generic bit repack: limb i holds bits [13i, 13i+13) of the little-endian
    256-bit value (the top limb holds the final 9 bits)."""
    bi = b.astype(_I32)
    limbs = []
    for i in range(NLIMBS):
        bitpos = LIMB_BITS * i
        j, off = bitpos // 8, bitpos % 8
        v = bi[j] >> off
        if j + 1 < 32:
            v = v | (bi[j + 1] << (8 - off))
        if off + LIMB_BITS > 16 and j + 2 < 32:
            v = v | (bi[j + 2] << (16 - off))
        limbs.append(v & MASK)
    return jnp.stack(limbs)


def limbs_to_le_bytes(x: jnp.ndarray) -> jnp.ndarray:
    """int32 (NLIMBS, *batch) 13-bit limbs -> uint8 (32, *batch)."""
    out = []
    for j in range(32):
        bitpos = 8 * j
        k, off = bitpos // LIMB_BITS, bitpos % LIMB_BITS
        v = x[k] >> off
        if off + 8 > LIMB_BITS and k + 1 < NLIMBS:
            v = v | (x[k + 1] << (LIMB_BITS - off))
        out.append((v & 0xFF).astype(jnp.uint8))
    return jnp.stack(out)


def lt_p(F: FieldSpec, x: jnp.ndarray) -> jnp.ndarray:
    """Canonicity check: standard-form limb value < p
    (/root/reference/src/fr.rs:268-292)."""
    borrow = jnp.zeros_like(x[0])
    for i in range(NLIMBS):
        t = x[i] - int(F.p_limbs[i]) - borrow
        borrow = (t >> LIMB_BITS) & 1
    return borrow == 1


def from_bytes(F: FieldSpec, b: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Canonical LE bytes -> (Montgomery limbs, ok). Non-canonical inputs
    yield ok=False (limbs then carry garbage; callers must mask)."""
    x = limbs_from_le_bytes(b)
    ok = lt_p(F, x)
    return mul(F, x, const_mont(F, F.R, b.shape[1:] if b.ndim > 1 else ())), ok


def to_bytes(F: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return limbs_to_le_bytes(to_canonical(F, a))


def from_bytes_wide(F: FieldSpec, b: jnp.ndarray) -> jnp.ndarray:
    """512-bit LE bytes (64, *batch) reduced mod p: d0*R^2 + d1*R^3 in the
    Montgomery domain (/root/reference/src/fr.rs:312-343)."""
    d0 = limbs_from_le_bytes(b[:32])
    d1 = limbs_from_le_bytes(b[32:])
    batch = b.shape[1:]
    lo = mul(F, d0, const_mont(F, F.R, batch))   # = Mont(d0)
    # Mont(d1 * 2^256) = d1 * 2^256 * R: multiply by Mont(2^256 * R).
    hi = mul(F, d1, const_mont(F, (1 << 256) * F.R, batch))
    # normalize < 4p back under 2p: public values keep the < 2p bound
    return cond_sub_kp(F, add(F, lo, hi), 2)


def from_u64(F: FieldSpec, v: int, batch_shape=()) -> jnp.ndarray:
    """Constant small integer -> Montgomery form
    (/root/reference/src/fr.rs:42-46)."""
    return const_mont(F, v, batch_shape)


# ---------------------------------------------------------------------------
# Batch inversion (prefix/suffix product scans)
# ---------------------------------------------------------------------------

def batch_invert(F: FieldSpec, a: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Invert every element along a batch axis with ONE field inversion.

    TPU-native replacement for ff::BatchInverter
    (/root/reference/src/lib.rs:1084-1107): instead of the sequential
    forward/backward passes, compute inclusive prefix and suffix products with
    ``lax.associative_scan`` (log-depth), then
    ``a_i^-1 = prefix_{i-1} * suffix_{i+1} * (prod all)^-1``.
    All elements must be nonzero (same contract as the reference).
    """
    if axis < 0:
        axis = a.ndim + axis
    assert axis != 0, "axis 0 is the limb axis"

    combine = lambda x, y: mul(F, x, y)
    prefix = jax.lax.associative_scan(combine, a, axis=axis)
    suffix = jax.lax.associative_scan(combine, a, axis=axis, reverse=True)

    n = a.shape[axis]
    total = jax.lax.index_in_dim(prefix, n - 1, axis=axis, keepdims=False)
    total_inv, _ = invert(F, total)

    ones = one(F, a.shape[1:axis] + (1,) + a.shape[axis + 1:])
    sl = [slice(None)] * a.ndim
    sl[axis] = slice(0, n - 1)
    prefix_shift = jnp.concatenate([ones, prefix[tuple(sl)]], axis=axis)
    sl[axis] = slice(1, n)
    suffix_shift = jnp.concatenate([suffix[tuple(sl)], ones], axis=axis)

    return mul(F, mul(F, prefix_shift, suffix_shift),
               jnp.expand_dims(total_inv, axis))
