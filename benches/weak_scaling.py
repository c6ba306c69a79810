"""MSM weak-scaling protocol: fixed points-per-device, 1 vs N devices.

The BASELINE north star is >=90% weak-scaling efficiency on a 2^22-point
variable-base MSM across a multi-host v5p slice.  This script IS that
measurement protocol, runnable anywhere:

  1. fix n_per_device points (uniform random subgroup points + scalars),
  2. time single-device ``msm`` at n = n_per_device,
  3. time ``msm_sharded`` over an N-device mesh at n = N * n_per_device
     (points/scalars sharded along N; the only cross-device traffic is the
     63-window all_gather, O(63 * point) independent of n),
  4. efficiency = t_single / t_sharded (same per-device work, so perfect
     weak scaling is 1.0),
  5. cross-check both results against each other and the device-computed
     inner-product reference (exactness, not membership).

On real multi-chip hardware the mesh axis rides ICI and the number is the
deliverable.  On this box only a VIRTUAL device mesh exists
(--xla_force_host_platform_device_count): N virtual devices timeshare the
host cores, so the efficiency figure measures protocol overhead only —
recorded with ``"virtual": true`` so nobody mistakes it for the v5p run.

Usage: python benches/weak_scaling.py [--devices 8] [--per-device 2048]
Writes one JSON line to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")))

# Make a virtual CPU mesh available BEFORE jax import so the protocol runs
# anywhere: on real multi-chip hardware jax.devices() returns the TPUs and
# the virtual flag is unused; on a single-chip/dev box the script falls
# back to jax.devices("cpu") below.
if "XLA_FLAGS" not in os.environ or \
        "host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--per-device", type=int, default=2048)
    ap.add_argument("--chunk", type=int, default=1024)
    args = ap.parse_args()

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from jubjub_tpu import oracle
    from jubjub_tpu.curve.scalar_mul import generator_table
    from jubjub_tpu.fields import Fr, mont
    from jubjub_tpu.fields.element import FR_SPEC
    from jubjub_tpu.parallel import msm, msm_sharded

    devs = jax.devices()
    if len(devs) < args.devices:
        # Falling back to the virtual CPU mesh: pin the DEFAULT platform to
        # cpu too, so the data generation and the single-device timing below
        # run on the same backend as the sharded run (an ambient TPU plugin
        # would otherwise own jax.jit and the efficiency ratio would compare
        # different hardware — round-4 advisor finding).
        jax.config.update("jax_platforms", "cpu")
        devs = jax.devices("cpu")
    assert len(devs) >= args.devices
    virtual = devs[0].platform == "cpu"
    mesh = Mesh(np.array(devs[:args.devices]), axis_names=("data",))

    npd = args.per_device
    n = args.devices * npd
    gt = generator_table()
    s = Fr.random(jax.random.PRNGKey(1), (n,))
    k = Fr.random(jax.random.PRNGKey(2), (n,))
    pts = jax.jit(lambda kk: gt.mul_fused(kk))(s)
    jax.block_until_ready(pts.u.limbs)

    def timed(fn, pts_arg, k0, reps=3):
        """Chained-feedback timing (same discipline as bench.py:43-55).

        ``fn(points, scalars) -> (next_scalars, out)`` where next_scalars
        is derived from ``out`` — a true data dependency between reps, so
        the runtime cannot elide/pipeline repeated identical dispatches
        (the round-3 artifact's t_single was ~1000x too fast for exactly
        that reason)."""
        state = fn(pts_arg, k0)
        first = state[1]  # output for the ORIGINAL scalars (exactness check)
        jax.block_until_ready(first.u.limbs)
        t0 = time.perf_counter()
        for _ in range(reps):
            state = fn(pts_arg, state[0])
        jax.block_until_ready(state[1].u.limbs)
        return (time.perf_counter() - t0) / reps, first

    def chain(kk, out):
        # next scalar batch depends on the previous MSM result
        return Fr(kk.limbs + (out.u.limbs[0] & 1))

    # single device, n_per_device points
    sub = jax.tree_util.tree_map(lambda a: a[:, :npd], pts)
    ksub = Fr(k.limbs[:, :npd])

    @jax.jit
    def single(p, kk):
        out = msm(p, kk, chunk=args.chunk)
        return chain(kk, out), out

    t1, out1 = timed(single, sub, ksub)

    # N devices, N * n_per_device points, sharded along the batch
    shard = NamedSharding(mesh, P(None, "data"))
    pts_sh = jax.tree_util.tree_map(lambda a: jax.device_put(a, shard), pts)
    k_sh = jax.device_put(k, shard)

    @jax.jit
    def sharded(p, kk):
        out = msm_sharded(p, kk, mesh, chunk=args.chunk)
        return chain(kk, out), out

    tN, outN = timed(sharded, pts_sh, k_sh)

    # exactness: sharded result == [sum k_i s_i]G8 (device muls + host sum)
    prods = jax.jit(lambda a, b: mont.to_canonical(
        FR_SPEC, mont.mul(FR_SPEC, a.limbs, b.limbs)))(k, s)
    limbsum = np.asarray(prods, np.int64).sum(axis=1)
    c = sum(int(v) << (13 * i) for i, v in enumerate(limbsum)) % oracle.R
    from jubjub_tpu.curve.points import batch_normalize
    aff = batch_normalize(outN)
    got = (aff.u.to_ints(), aff.v.to_ints())
    assert (got[0], got[1]) == oracle.mul(oracle.SUBGROUP_GENERATOR, c), \
        "sharded MSM mismatch vs inner-product reference"

    print(json.dumps({
        "metric": "msm_weak_scaling_efficiency",
        # on a virtual mesh the ratio is meaningless (devices timeshare the
        # host cores): emit null so nobody reads it as a hardware result
        "value": None if virtual else round(t1 / tN, 4),
        "unit": "ratio",
        "devices": args.devices,
        "points_per_device": npd,
        # cross-device traffic: each device all_gathers its 63 window sums
        # (5 coords x 20 limbs x int32) — independent of n by construction
        "ici_bytes_per_device": 63 * 5 * 20 * 4 * args.devices,
        "t_single_s": round(t1, 4),
        "t_sharded_s": round(tN, 4),
        # plausibility cross-check: implied single-device MSM rate; compare
        # against the independently measured XLA-path MSM points/s on the
        # same backend (docs/performance.md) — within ~2x or the timing
        # loop is broken (the round-3 failure mode)
        "single_points_per_sec": round(npd / t1, 1),
        "efficiency_formula": "t_single / t_sharded (fixed per-device work)",
        "virtual": bool(virtual),
        "backend": devs[0].platform,
        "note": ("virtual CPU mesh: devices timeshare host cores, so this "
                 "validates the protocol + exactness, not ICI scaling")
                if virtual else "hardware mesh",
    }))


if __name__ == "__main__":
    main()
