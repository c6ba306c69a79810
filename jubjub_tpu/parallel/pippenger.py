"""Sorted-scan Pippenger MSM: bucket accumulation without scatter.

Classic Pippenger bucket accumulation is a scatter-add of points — the one
primitive TPUs do not have.  This module reformulates it as a SORT + PREFIX
SCAN + PREFIX-DIFFERENCE pipeline in which every step is either an XLA sort
/ gather / searchsorted on int32 keys or a dense batched group addition:

For each ``c``-bit window w (digits d_i in [0, 2^c)):

  1. sort point indices by digit (``lax.sort_key_val`` on int32 keys);
  2. gather the points' Niels records into sorted order, laid out so lane
     slot ``l`` owns the contiguous sorted run ``[l*run, (l+1)*run)``;
  3. one pass of the fused prefix-scan kernel (ops/pallas_scan.py):
     ``stream[s, l] = sum of lane l's first s+1 sorted points`` — n group
     adds, the bucket-accumulation cost, with VMEM-resident accumulators;
  4. the window sum follows from the SUFFIX-SUM identity

         W_w = sum_i d_i P_i = sum_{t=1}^{2^c-1} S_t,
         S_t = sum_{d_i >= t} P_i = total - prefix(pos_t),
         pos_t = #{i : d_i < t}  (a searchsorted on the sorted keys),

     where ``prefix(pos)`` is reconstructed from the scan stream as
     ``lane_prefix_excl[pos // run] + stream[pos % run - 1, pos // run]``
     — so bucket sums are never materialized and no scatter ever happens:
     (2^c - 1) gathered prefix points, one batched addition, one reduction
     tree, and ``(2^c-1)*total`` via c doublings.

Finally the per-window sums feed the same Horner spine as the windowed
MSM (``parallel.msm.horner_spine``).

Cost per point: ~nwin(c) unified additions (20 at c=13, 16 at c=16) vs
63 + 14 for the table-based fused kernel — the true Pippenger rate.  The
practical limit on this part's target hardware is the XLA row-gather rate
(~70M rows/s measured on v5e: benches/permutation_probe.py): step 2 costs
more wall-clock than the n adds of step 3, which is why the table-based
kernel remains the default (see docs/performance.md's measured comparison).

No reference counterpart (zkcrypto/jubjub has no MSM); per-addition
arithmetic is HWCD (/root/reference/src/lib.rs:883-920).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..curve.points import ExtendedPoint, reduce_sum
from ..curve.scalar_mul import window_digits_wide
from ..fields import Fr
from ..fields.spec import NLIMBS
from .msm import horner_spine

LANE = 128


def _comb(a: ExtendedPoint, b: ExtendedPoint) -> ExtendedPoint:
    return a.add_extended_niels(b.to_niels())


def _niels_records(points: ExtendedPoint) -> jnp.ndarray:
    """(n,) extended points -> (n, 4*NLIMBS) int32 gather-friendly rows.

    Row-major records make the per-window permutation a contiguous-row
    gather (the only XLA gather shape that runs at a usable rate on TPU)."""
    niels = points.to_niels()
    cols = [getattr(niels, c).limbs.T  # (n, NLIMBS)
            for c in ("v_plus_u", "v_minus_u", "z", "t2d")]
    return jnp.concatenate(cols, axis=1)


def window_sums_sorted(points: ExtendedPoint, scalars: Fr,
                       wbits: int | None = None,
                       rows: int | None = None,
                       steps_per_block: int | None = None,
                       interpret: bool | None = None) -> ExtendedPoint:
    """Per-window digit-weighted sums W_w = sum_i digit_w(k_i) * P_i via
    sorted-scan bucket accumulation; returns an ExtendedPoint batch
    (nwindows,).  Points are padded to a lane multiple with identities
    (digit 0 -> excluded by every threshold t >= 1)."""
    from .. import config
    from ..ops.pallas_scan import prefix_scan_stream
    wbits = config.PIPPENGER_WBITS if wbits is None else wbits
    rows = config.PIPPENGER_ROWS if rows is None else rows
    sblk = config.PIPPENGER_SBLK if steps_per_block is None else steps_per_block
    (n,) = points.shape
    L = rows * LANE
    pad = (-n) % L
    if pad:
        ident = ExtendedPoint.identity((pad,))
        points = jax.tree_util.tree_map(
            lambda a, i: jnp.concatenate([a, i], axis=1), points, ident)
        scalars = Fr(jnp.concatenate(
            [scalars.limbs,
             jnp.zeros((NLIMBS, pad), scalars.limbs.dtype)], axis=1))
        n += pad
    run = n // L
    nwin = -(-252 // wbits)
    T = (1 << wbits) - 1

    recs = _niels_records(points)                      # (n, 80)
    digits = window_digits_wide(scalars, wbits)        # (nwin, n)
    iota = jnp.arange(n, dtype=jnp.int32)
    thresholds = jnp.arange(1, 1 << wbits, dtype=jnp.int32)

    def one_window(_, d):
        sd, si = jax.lax.sort_key_val(d, iota, is_stable=False)
        # lane l owns sorted positions [l*run, (l+1)*run)
        g = si.reshape(L, run).T                       # (run, L)
        sorted_recs = recs[g.reshape(-1)]              # (run*L, 80)
        planes = (sorted_recs.reshape(run, L, 4 * NLIMBS)
                  .transpose(0, 2, 1)
                  .reshape(run, 4, NLIMBS, rows, LANE))
        stream = prefix_scan_stream(
            tuple(planes[:, i] for i in range(4)), rows, sblk, interpret)
        stream_flat = [s.reshape(run, NLIMBS, L) for s in stream]

        # lane totals -> inclusive/exclusive lane prefixes (log-depth scan)
        lane_tot = _as_point([s[run - 1] for s in stream_flat])
        incl = jax.lax.associative_scan(_comb, lane_tot, axis=1)
        ident_1 = ExtendedPoint.identity((1,))
        excl = jax.tree_util.tree_map(
            lambda inc, idl: jnp.concatenate([idl, inc[:, :-1]], axis=1),
            incl, ident_1)
        total = jax.tree_util.tree_map(lambda x: x[:, -1], incl)

        # suffix positions: pos_t = #{digits < t}
        pos = jnp.searchsorted(sd, thresholds, side="left").astype(jnp.int32)
        full = pos == n                  # S_t = identity (no digit >= t)
        posc = jnp.minimum(pos, n - 1)
        lq = posc // run
        s_in = posc % run
        use_id = s_in == 0
        ws = jnp.maximum(s_in - 1, 0)

        ident_T = ExtendedPoint.identity((T,))
        within = _as_point([st[ws, :, lq].T for st in stream_flat])
        within = jax.tree_util.tree_map(
            lambda w, i: jnp.where(use_id, i, w), within, ident_T)
        excl_at = jax.tree_util.tree_map(lambda x: x[:, lq], excl)
        prefix_t = excl_at.add_extended_niels(within.to_niels())
        total_T = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[:, None], (NLIMBS, T)), total)
        prefix_t = jax.tree_util.tree_map(
            lambda p, t: jnp.where(full, t, p), prefix_t, total_T)

        # W = (2^c - 1) * total - sum_t prefix_t ; (2^c)*total by c doublings
        sum_prefix = reduce_sum(prefix_t, axis=0)
        tot2c = total
        for _ in range(wbits):
            tot2c = tot2c.double()
        w = tot2c.sub_extended_niels(total.to_niels())
        w = w.sub_extended_niels(sum_prefix.to_niels())
        return None, w

    _, wsums = jax.lax.scan(one_window, None, digits)
    # scan stacks outputs on a NEW leading axis; move the limb axis back
    return jax.tree_util.tree_map(lambda a: jnp.moveaxis(a, 0, 1), wsums)


def _as_point(coords5) -> ExtendedPoint:
    from ..fields import Fq
    return ExtendedPoint(*[Fq(jnp.asarray(c)) for c in coords5])


def msm_pippenger(points: ExtendedPoint, scalars: Fr,
                  wbits: int | None = None) -> ExtendedPoint:
    """Single-device MSM via sorted-scan bucket accumulation + Horner."""
    from .. import config
    wbits = config.PIPPENGER_WBITS if wbits is None else wbits
    return horner_spine(window_sums_sorted(points, scalars, wbits=wbits),
                        wbits=wbits)
