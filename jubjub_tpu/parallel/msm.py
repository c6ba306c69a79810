"""Multi-scalar multiplication (MSM), single-chip and mesh-sharded.

No reference counterpart (zkcrypto/jubjub has no MSM); this is the TPU-native
scaling surface (BASELINE north star: 2^22-point MSM, >=90% weak scaling).

Algorithm (single chip): windowed Horner with per-chunk multiple tables —
"Pippenger without scatter".  For each chunk of C points build the 16-entry
multiples table [0..15]P_i (15 batched additions), then for each of the 63
4-bit windows gather table[digit] and tree-reduce.  Per-point doublings
vanish (only the final 252 Horner doublings on ONE accumulator remain):

    total cost ~ (15 + 63) * N + 2^C-free bucket math ~ 78N point-adds,
    vs ~315N for naive per-point ladders.

Multi-chip: points/scalars are sharded along N over a 1-D device mesh with
``shard_map``; each device computes its partial window sums, a tiny
``all_gather`` (63 window points per device) crosses ICI, and the Horner
spine runs replicated.  Cross-device traffic is O(63 * point), independent
of N — weak scaling is compute-bound by construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..curve.points import ExtendedNielsPoint, ExtendedPoint, reduce_sum
from ..curve.scalar_mul import NWINDOWS, window_digits
from ..fields import Fr


from ..curve.scalar_mul import _take_entry as _take_extended  # select tree


def _multiples_table(p: ExtendedPoint) -> ExtendedPoint:
    """[0]P..[15]P stacked as extended points (leading axis 16)."""
    pn = p.to_niels()

    def step(acc, _):
        return acc.add_extended_niels(pn), acc

    _, mults = jax.lax.scan(step, p, None, length=15)  # [1]P..[15]P
    ident = ExtendedPoint.identity(p.shape)
    return jax.tree_util.tree_map(
        lambda i, m: jnp.concatenate([i[None], m], axis=0), ident, mults)


def window_sums(points: ExtendedPoint, scalars: Fr,
                chunk: int | None = None,
                sequential: bool = False) -> ExtendedPoint:
    """Per-window digit-weighted sums: W_w = sum_i digit_w(k_i) * P_i.

    Returns an ExtendedPoint batch of shape (63,).  Points are processed in
    chunks of ``chunk`` so the 16-entry multiples tables stay within memory.

    All 63 windows are processed AT ONCE per chunk: the digit select and the
    chunk reduction tree are batched over a leading window axis, so the only
    sequential loop is the chunk scan.  (An earlier fori_loop-over-windows
    formulation with dynamic accumulator updates serialized 63 narrow ops
    per chunk and took several MINUTES of XLA CPU compile time.)
    """
    from .. import config
    chunk = config.MSM_CHUNK if chunk is None else chunk
    (n,) = points.shape
    chunk = min(chunk, n)
    pad = (-n) % chunk
    if pad:
        # pad with identity points and zero scalars (digit 0 selects the
        # identity table entry, so padded lanes contribute nothing)
        from ..fields.spec import NLIMBS as _NL
        ident = ExtendedPoint.identity((pad,))
        points = jax.tree_util.tree_map(
            lambda a, i: jnp.concatenate([a, i], axis=1), points, ident)
        # explicit pad shape: `limbs[:, :pad]` would truncate when pad > n
        scalars = Fr(jnp.concatenate(
            [scalars.limbs, jnp.zeros((_NL, pad), scalars.limbs.dtype)],
            axis=1))
        n += pad
    nchunks = n // chunk

    from ..fields.spec import NLIMBS
    digits = window_digits(scalars)  # (63, n)
    pts_c = jax.tree_util.tree_map(
        lambda a: a.reshape(NLIMBS, nchunks, chunk).swapaxes(0, 1), points)
    digs_c = digits.reshape(NWINDOWS, nchunks, chunk).swapaxes(0, 1)

    def chunk_body(acc: ExtendedPoint, xs):
        pts, digs = xs  # pts: (16limbs, chunk), digs: (63, chunk)
        table = _multiples_table(pts)  # (16, 16limbs, chunk)
        # Broadcast the table across a window axis and gather all 63 window
        # selections in one vectorized select tree: (16limbs, 63, chunk).
        table_b = jax.tree_util.tree_map(lambda a: a[:, :, None, :], table)
        sel = _take_extended(table_b, digs)            # (16limbs, 63, chunk)
        s = reduce_sum(sel, axis=1, sequential=sequential)  # (63,) points
        acc = acc.add_extended_niels(s.to_niels())     # batched over windows
        return acc, None

    # Derive the identity-initialized accumulator from the input so its
    # sharding "varying" status matches the loop body's output under
    # shard_map (a constant init would trip the scan carry VMA check).
    taint = points.u.limbs[:, :1] * 0  # (16, 1) zeros, data-derived
    acc0 = jax.tree_util.tree_map(
        lambda a: a + taint, ExtendedPoint.identity((NWINDOWS,)))
    acc, _ = jax.lax.scan(chunk_body, acc0, (pts_c, digs_c))
    return acc


def horner_spine(wsums: ExtendedPoint, wbits: int = 4) -> ExtendedPoint:
    """Fold the window sums: S = sum_w 2^(w*wbits) W_w (MSB-first Horner).

    Bit-serial form: wbits*nwin scan steps of (double, add), where all but
    every wbits-th added operand is the Niels identity (the unified HWCD
    formula absorbs them).  Versus a fori_loop of (wbits doublings +
    dynamic-index add) this trades the no-op additions at runtime
    (microseconds on one point) for a much smaller traced body — the
    XLA:CPU compile-time lever again."""
    (nwin,) = wsums.shape
    niels = wsums.to_niels()                       # batch (nwin,)
    ident = ExtendedNielsPoint.identity(())

    def pad(w, i):
        # w: (NLIMBS, nwin) limb plane; i: (NLIMBS,) identity plane ->
        # (wbits*nwin, NLIMBS) per-step operands, W_last..W_0 at every
        # wbits-th step.
        out = jnp.tile(i[:, None], (1, wbits * nwin))
        out = out.at[:, wbits - 1::wbits].set(w[:, ::-1])
        return jnp.moveaxis(out, 1, 0)

    xs = jax.tree_util.tree_map(pad, niels, ident)

    def body(acc, x):
        return acc.double().add_extended_niels(x), None

    taint = wsums.u.limbs[:, 0] * 0  # data-derived zeros (see window_sums)
    init = jax.tree_util.tree_map(
        lambda a: a + taint, ExtendedPoint.identity(()))
    acc, _ = jax.lax.scan(body, init, xs)
    return acc


def msm(points: ExtendedPoint, scalars: Fr, chunk: int | None = None,
        sequential: bool = False) -> ExtendedPoint:
    """Single-device MSM: sum_i scalars_i * points_i."""
    return horner_spine(window_sums(points, scalars, chunk=chunk,
                                    sequential=sequential))


# ---------------------------------------------------------------------------
# Mesh-sharded MSM
# ---------------------------------------------------------------------------

def msm_sharded(points: ExtendedPoint, scalars: Fr, mesh: Mesh,
                axis: str | None = None, chunk: int | None = None,
                sequential: bool = False,
                fused: bool | None = None,
                algorithm: str | None = None) -> ExtendedPoint:
    """MSM over a 1-D device mesh: points/scalars sharded along N.

    Each device computes its partial window sums; one tiny all_gather
    crosses ICI; the Horner spine runs replicated on every device.

    ``algorithm`` selects the per-device window-sums path:
      - "fused": the VMEM Pallas table kernel (ops/pallas_msm.py) — the
        TPU default and the measured optimum on v5e;
      - "sorted": sorted-scan bucket accumulation (parallel/pippenger.py);
      - "xla": the chunked XLA path (what the CPU dry run compiles
        quickly) — the non-TPU default.
    ``fused`` is the legacy boolean spelling of "fused"/"xla".
    """
    from .. import config
    if axis is None:
        axis = config.MESH_AXIS
    # key off the MESH devices, not the default backend: the multichip dry
    # run builds a CPU mesh while a TPU plugin owns the default platform —
    # both the algorithm default AND the Pallas interpret flag must follow
    # the mesh, or the kernels lower for a backend that can't run them.
    mesh_is_tpu = all(d.platform == "tpu"
                      for d in np.asarray(mesh.devices).flat)
    if algorithm is None:
        if fused is None:
            fused = mesh_is_tpu
        algorithm = "fused" if fused else "xla"
    assert algorithm in ("fused", "sorted", "xla"), algorithm
    interpret = not mesh_is_tpu

    # XLA path is 4-bit windowed; the others follow their config widths
    wbits = {"fused": config.MSM_WBITS, "xla": 4,
             "sorted": config.PIPPENGER_WBITS}[algorithm]

    def local(pts_leaves, fr_limbs):
        pts = jax.tree_util.tree_unflatten(_ext_treedef(), pts_leaves)
        if algorithm == "fused":
            from ..ops.pallas_msm import window_sums_fused
            ws = window_sums_fused(pts, Fr(fr_limbs), interpret=interpret)
        elif algorithm == "sorted":
            from .pippenger import window_sums_sorted
            ws = window_sums_sorted(pts, Fr(fr_limbs), interpret=interpret)
        else:
            ws = window_sums(pts, Fr(fr_limbs), chunk=chunk,
                             sequential=sequential)
        # (ndev, 63) partial sums on every device
        gathered = jax.tree_util.tree_map(
            lambda a: jax.lax.all_gather(a, axis, axis=1, tiled=False), ws)
        total = reduce_sum(gathered, axis=0, sequential=sequential)
        return tuple(jax.tree_util.tree_leaves(
            horner_spine(total, wbits=wbits)))

    pts_leaves = tuple(jax.tree_util.tree_leaves(points))
    # check_vma=False: the outputs ARE replicated (every device computes the
    # same all_gather'ed total), but the varying-axis type system cannot
    # prove replication through a point-addition tree.
    out = jax.shard_map(
        local, mesh=mesh,
        in_specs=(tuple(P(None, axis) for _ in pts_leaves), P(None, axis)),
        out_specs=tuple(P(None) for _ in range(5)),
        check_vma=False,
    )(pts_leaves, scalars.limbs)
    return jax.tree_util.tree_unflatten(_ext_treedef(), out)


def _ext_treedef():
    return jax.tree_util.tree_structure(ExtendedPoint.identity(()))
