"""Fused Pallas kernel: MSM window sums, VMEM-resident.

The XLA formulation of ``parallel.msm.window_sums`` broadcasts each chunk's
16-entry multiples table across all 63 windows, materializing
(16, NLIMBS, 63, chunk) intermediates in HBM — measured 76k points/s at
2^20 on a v5e chip, ~50x below the VPU ceiling.  This kernel keeps the
whole per-block computation in VMEM, the same recipe that took the
variable-base ladder from 105k to 10M+ ops/s.

Shape strategy: every lane-row slot of a block is an INDEPENDENT
accumulator — no in-kernel narrowing.  For a block of R x 128 points and a
group of W windows:

    for w in group:  acc[w] += select(table, digits[w])   # (NLIMBS,R,128)

is one full-width unified addition per window per block (the VPU's native
tile), and the R*128 partial accumulators per window are tree-reduced once
at the XLA level afterwards.  The windows are split into groups so the
per-group accumulators fit VMEM next to the 2^w-entry Niels multiples
table; point blocks run INNERMOST so each group's output block accumulates
over consecutive grid steps (the Pallas-safe revisit pattern), at the cost
of rebuilding the per-block table once per group.

Window width is configurable (``config.MSM_WBITS``): w=4 gives 63 windows
with a 16-entry table, w=5 gives 51 windows (19% fewer additions) with a
32-entry table at twice the select-tree and VMEM cost.

Cost per point: ~nwindows unified additions + one table-build share — the
same arithmetic as the reference-style per-chunk windowing with zero HBM
round-trips inside a block.  Results are the same group elements as
``parallel.msm.window_sums`` (identical formulas and tables; the reduction
order of the commutative partial sums differs, so compare group-equal).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..curve.points import ExtendedNielsPoint, ExtendedPoint
from ..curve.scalar_mul import (signed_digit_windows,
                                signed_window_digits_wide,
                                window_digits_wide)
from ..fields import Fq, Fr, mont
from ..fields.element import FQ_SPEC
from ..fields.spec import NLIMBS
from .pallas_mont import _interpret

LANE = 128
BLOCK_ROWS = 8   # points per block = BLOCK_ROWS * 128
_COORDS = ("v_plus_u", "v_minus_u", "z", "t2d")  # wgroup: config.MSM_WGROUP


def _n_windows(wbits: int) -> int:
    return -(-252 // wbits)


def _window_sums_kernel(pu, pv, pz, pt, digits, ou, ov, oz, ot1, ot2,
                        *scratch, nentries: int, groups_inner: bool,
                        signed: bool):
    tbl = scratch[:4]   # niels coords, each (nentries, NLIMBS, R, 128) VMEM
    bshape = pu.shape[1:]          # (R, 128)

    # The base point arrives as 4 planes (u, v, z, t=t1*t2) — the kernel
    # only ever needs the t1*t2 PRODUCT (for the Niels t2d), so the caller
    # pre-multiplies it and one whole input stream disappears.  Seeding
    # t1=t, t2=1 preserves the extended invariant t1*t2 = uv/z, and the
    # pre-multiplied t < 2p sits well inside to_niels' bound budget
    # (t1 < 6p, t2 < 4p).  This frees ~160 KB of scoped VMEM — not enough
    # to lift wgroup past 9 (13 still OOMs by 40 KB; see _pick_wgroup).
    base = ExtendedPoint(u=Fq(pu[:]), v=Fq(pv[:]), z=Fq(pz[:]),
                         t1=Fq(pt[:]), t2=Fq(mont.one(FQ_SPEC, bshape)))

    # Table build: nentries-2 additions per execution — at w=4 that is
    # ~47% of the per-block additions, so with groups innermost
    # (groups_inner) the build runs under @pl.when only on the first group
    # of each point block and the scratch table persists across the rest.
    # Unsigned: entry e = [e]P (entry 0 = identity).  Signed: entry
    # e = [e+1]P — magnitudes 1..nentries; digit 0 / negative digits are
    # handled in ``select`` by an identity override / Niels negation.
    def _build_table():
        base_n = base.to_niels()
        if signed:
            for c, ref in zip(_COORDS, tbl):
                ref[0] = getattr(base_n, c).limbs
            start, init = 1, base
        else:
            ident_n = ExtendedNielsPoint.identity(bshape)
            for c, ref in zip(_COORDS, tbl):
                ref[0] = getattr(ident_n, c).limbs
                ref[1] = getattr(base_n, c).limbs
            start, init = 2, base

        def build(i, carry):
            acc = ExtendedPoint(*[Fq(x) for x in carry])
            acc = acc.add_extended_niels(base_n)
            an = acc.to_niels()
            for c, ref in zip(_COORDS, tbl):
                ref[i] = getattr(an, c).limbs
            return (acc.u.limbs, acc.v.limbs, acc.z.limbs,
                    acc.t1.limbs, acc.t2.limbs)

        jax.lax.fori_loop(
            start, nentries, build,
            (init.u.limbs, init.v.limbs, init.z.limbs, init.t1.limbs,
             init.t2.limbs))

    if groups_inner:
        pl.when(pl.program_id(1) == 0)(_build_table)
    else:
        _build_table()

    def _tree(digit, ref):
        rows = [ref[e] for e in range(nentries)]
        bit = 0
        while len(rows) > 1:
            b = (digit >> bit) & 1
            rows = [jnp.where(b == 1, hi, lo)
                    for lo, hi in zip(rows[0::2], rows[1::2])]
            bit += 1
        return rows[0]

    def select(digit):
        """Binary select tree: digit (R, 128) -> Niels entry (NLIMBS, R, 128).

        Signed mode: digit in [-(nentries-1), nentries]; look up |digit|-1,
        negate the Niels entry (coordinate swap + t2d negation) for
        negative digits, and override digit 0 with the Niels identity
        (cf. curve/scalar_mul.py negate_niels)."""
        if not signed:
            coords = {c: Fq(_tree(digit, ref))
                      for c, ref in zip(_COORDS, tbl)}
            return ExtendedNielsPoint(**coords)
        mag = jnp.abs(digit)
        idx = mag - 1  # garbage (-1 -> 0b..1) when digit==0; overridden below
        raw = {c: _tree(idx, ref) for c, ref in zip(_COORDS, tbl)}
        neg = digit < 0
        zero = mag == 0
        one_m = mont.one(FQ_SPEC, bshape)
        zero_m = jnp.zeros_like(raw["t2d"])
        vpu = jnp.where(neg, raw["v_minus_u"], raw["v_plus_u"])
        vmu = jnp.where(neg, raw["v_plus_u"], raw["v_minus_u"])
        t2d = jnp.where(neg, mont.neg(FQ_SPEC, raw["t2d"], k=2), raw["t2d"])
        return ExtendedNielsPoint(
            v_plus_u=Fq(jnp.where(zero, one_m, vpu)),
            v_minus_u=Fq(jnp.where(zero, one_m, vmu)),
            z=Fq(jnp.where(zero, one_m, raw["z"])),
            t2d=Fq(jnp.where(zero, zero_m, t2d)))

    # index of the point block within this window group's accumulation
    first = pl.program_id(0 if groups_inner else 1) == 0
    ident_e = ExtendedPoint.identity(bshape)
    nwin = digits.shape[0]

    def window(w, _):
        sel = select(digits[w])
        prev = ExtendedPoint(u=Fq(ou[w]), v=Fq(ov[w]), z=Fq(oz[w]),
                             t1=Fq(ot1[w]), t2=Fq(ot2[w]))
        prev = jax.tree_util.tree_map(
            lambda p_, i_: jnp.where(first, i_, p_), prev, ident_e)
        acc = prev.add_extended_niels(sel)   # full (R, 128) width
        ou[w] = acc.u.limbs
        ov[w] = acc.v.limbs
        oz[w] = acc.z.limbs
        ot1[w] = acc.t1.limbs
        ot2[w] = acc.t2.limbs
        return 0

    jax.lax.fori_loop(0, nwin, window, 0)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7))
def _window_sums_flat(point_limbs, digits, block_rows, wgroup, nentries,
                      groups_inner=False, signed=False, interpret=False):
    """point_limbs: 4x(NLIMBS, N) as (u, v, z, t1*t2); digits: (nwin_pad, N)
    -> 5x(nwin_pad, NLIMBS, block_rows, 128) per-lane-row partial
    accumulators."""
    n = point_limbs[0].shape[1]
    nwin_pad = digits.shape[0]
    assert n % LANE == 0 and nwin_pad % wgroup == 0
    rows = n // LANE
    blk = block_rows
    while rows % blk:
        blk //= 2

    p3 = tuple(x.reshape(NLIMBS, rows, LANE) for x in point_limbs)
    d3 = digits.reshape(nwin_pad, rows, LANE)

    # Two grid orders:
    #  - groups_inner=False (default): window groups OUTER, point blocks
    #    INNER — each group's output block accumulates over CONSECUTIVE
    #    steps, but the per-block table is rebuilt for every group.
    #  - groups_inner=True: point blocks OUTER — the scratch table is built
    #    once per block (@pl.when) and each output block is revisited
    #    non-consecutively (fetched back from HBM between visits).
    if groups_inner:
        to_gb = lambda i, j: (j, i)   # grid dims are (b, g)
    else:
        to_gb = lambda i, j: (i, j)   # grid dims are (g, b)
    spec16 = pl.BlockSpec((NLIMBS, blk, LANE),
                          lambda i, j: (0, to_gb(i, j)[1], 0),
                          memory_space=pltpu.VMEM)
    specd = pl.BlockSpec((wgroup, blk, LANE),
                         lambda i, j: to_gb(i, j) + (0,),
                         memory_space=pltpu.VMEM)
    speco = pl.BlockSpec((wgroup, NLIMBS, blk, LANE),
                         lambda i, j: (to_gb(i, j)[0], 0, 0, 0),
                         memory_space=pltpu.VMEM)
    grid = (rows // blk, nwin_pad // wgroup) if groups_inner else \
        (nwin_pad // wgroup, rows // blk)
    out = pl.pallas_call(
        functools.partial(_window_sums_kernel, nentries=nentries,
                          groups_inner=groups_inner, signed=signed),
        grid=grid,
        in_specs=[spec16] * 4 + [specd],
        out_specs=[speco] * 5,
        out_shape=[jax.ShapeDtypeStruct((nwin_pad, NLIMBS, blk, LANE),
                                        jnp.int32)] * 5,
        interpret=interpret,
        scratch_shapes=[pltpu.VMEM((nentries, NLIMBS, blk, LANE), jnp.int32)
                        for _ in range(4)],
    )(*p3, d3)
    return out


def _pick_wgroup(nwin: int, cap: int) -> int:
    """Window-group size: padded windows cost real additions (each padded
    window is a full identity-add sweep), so prefer the largest divisor of
    nwin within the VMEM cap (zero padding); otherwise use the cap and pad.

    The cap is a HARD scoped-VMEM limit, not a preference: on v5e the
    Mosaic compiler rejects the kernel when the per-group accumulator
    blocks + the 16-entry Niels table + the unified-add stack temporaries
    exceed the 16 MB scoped-vmem budget.  Measured on hardware (signed w=5,
    16-entry table, Karatsuba product phase): wgroup 17 allocates 19.20 MB
    (OOM), 13 allocates 16.04 MB (OOM by 40 KB), 9 compiles — so the
    accumulators cost ~0.79 MB/window and the cap default (config
    MSM_WGROUP) must stay at 9 with the current table/stack shape."""
    divs = [d for d in range(1, min(cap, nwin) + 1) if nwin % d == 0]
    best = max(divs) if divs else 1
    pad_cap = (-nwin) % cap
    if best >= cap // 2 and (nwin // best) * best == nwin and \
            pad_cap > nwin // 50:
        return best
    return cap if nwin > cap else nwin


def window_sums_fused(points: ExtendedPoint, scalars: Fr,
                      block_rows: int | None = None,
                      wgroup: int | None = None,
                      wbits: int | None = None,
                      groups_inner: bool | None = None,
                      signed: bool | None = None,
                      interpret: bool | None = None) -> ExtendedPoint:
    """Per-window digit-weighted sums W_w = sum_i digit_w(k_i) * P_i.

    Drop-in replacement for ``parallel.msm.window_sums`` on TPU: returns an
    ExtendedPoint batch of shape (nwindows,).  ``len(points)`` is padded to
    a lane multiple with identity points (zero contribution).

    ``signed`` selects signed digit recoding: digits in
    [-(2^(w-1)-1), 2^(w-1)], so the per-point multiples table holds only
    the 2^(w-1) positive magnitudes — at w=5 that is 51 windows with a
    16-entry table (15 build adds), vs 63+14 for the unsigned w=4 default:
    ~14% fewer unified additions per point."""
    from .. import config
    from ..curve.points import reduce_sum
    # interpret: callers that know the execution platform (e.g. msm_sharded
    # with a CPU mesh on a TPU-default host) pass it explicitly; the
    # default-backend heuristic only covers the single-device case.
    interpret = _interpret() if interpret is None else interpret
    block_rows = config.MSM_BLOCK_ROWS if block_rows is None else block_rows
    wbits = config.MSM_WBITS if wbits is None else wbits
    signed = config.MSM_SIGNED if signed is None else signed
    if groups_inner is None:
        groups_inner = config.MSM_GROUPS_INNER
    nentries = (1 << (wbits - 1)) if signed else (1 << wbits)
    nwin = signed_digit_windows(wbits) if signed else _n_windows(wbits)
    if wgroup is None:
        # cap the group (accumulator VMEM) as the table doubles past
        # 16 entries, then prefer a divisor of nwin to avoid padded windows
        cap = max(config.MSM_WGROUP >> max(nentries.bit_length() - 5, 0), 1)
        wgroup = _pick_wgroup(nwin, cap)
    (n,) = points.shape
    pad = (-n) % LANE
    if pad:
        ident = ExtendedPoint.identity((pad,))
        points = jax.tree_util.tree_map(
            lambda a, i: jnp.concatenate([a, i], axis=1), points, ident)
        # NB: build the pad explicitly — slicing `limbs[:, :pad]` silently
        # truncates to n columns when pad > n (e.g. a 16-point shard padded
        # to a 128 lane), which broke the 8-device dryrun in round 4.
        scalars = Fr(jnp.concatenate(
            [scalars.limbs,
             jnp.zeros((NLIMBS, pad), scalars.limbs.dtype)], axis=1))
        n += pad
    flat = tuple(x.reshape(NLIMBS, n) for x in
                 (points.u.limbs, points.v.limbs, points.z.limbs,
                  (points.t1 * points.t2).limbs))
    dig_fn = signed_window_digits_wide if signed else window_digits_wide
    digits = dig_fn(scalars, wbits).reshape(nwin, n)
    wpad = (-nwin) % wgroup
    if wpad:
        # padded windows see all-zero digits -> identity accumulators
        digits = jnp.concatenate(
            [digits, jnp.zeros((wpad, n), digits.dtype)], axis=0)
    u, v, z, t1, t2 = _window_sums_flat(flat, digits, block_rows, wgroup,
                                        nentries, groups_inner, signed,
                                        interpret)
    mk = lambda a: Fq(a[:nwin].transpose(1, 0, 2, 3)
                      .reshape(NLIMBS, nwin, -1))
    lanes = ExtendedPoint(u=mk(u), v=mk(v), z=mk(z), t1=mk(t1), t2=mk(t2))
    # reduce the per-lane-row partials per window: (nwin, R*128) -> (nwin,)
    return reduce_sum(lanes, axis=1)


def msm_fused(points: ExtendedPoint, scalars: Fr,
              wbits: int | None = None,
              signed: bool | None = None) -> ExtendedPoint:
    """Single-device MSM via the fused window-sums kernel + Horner spine."""
    from .. import config
    from ..parallel.msm import horner_spine
    wbits = config.MSM_WBITS if wbits is None else wbits
    signed = config.MSM_SIGNED if signed is None else signed
    return horner_spine(
        window_sums_fused(points, scalars, wbits=wbits, signed=signed),
        wbits=wbits)
