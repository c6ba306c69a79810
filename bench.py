"""Benchmark: Jubjub scalar-multiplication throughput on one chip.

Prints ONE JSON line, e.g.:
  {"metric": "scalar_muls_per_sec_per_chip", "value": N, "unit": "ops/s",
   "vs_baseline": N / 1e7, "mode": "fixed_base", "variable_base": M, ...}

Two measured modes:
  - variable_base: the fused 4-bit-window ladder on ExtendedPoint * Fr
    (the reference's hot path, /root/reference/src/lib.rs:873-881).
  - fixed_base: the fused 8-bit-window Pedersen-style path with
    precomputed tables (BASELINE config 4) — zero doublings, 32 additions
    per scalar, one-hot MXU table lookups.

The headline value is the fixed-base number (the dominant production
workload — Sapling Pedersen hashes / spend authority are fixed-base);
the variable-base number is reported alongside.

Measurement discipline: every timed iteration feeds the previous result
back in as the next input (a true data dependency), and the timed region
ends with a host readback of a slice of the result.  Without both, the
tunneled TPU runtime pipelines/elides identical dispatches and reports
numbers that are orders of magnitude too high.  A lane-0 oracle check
guards against miscompiles.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import numpy as np

_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache", "tpu")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _time_chain(step, state, sync, target_s=1.5):
    """Time `state = step(state)` in a feedback chain; returns sec/call."""
    t0 = time.perf_counter()
    state = step(state)
    sync(state)
    t_one = time.perf_counter() - t0
    iters = max(3, int(target_s / max(t_one, 1e-9)))
    t0 = time.perf_counter()
    for _ in range(iters):
        state = step(state)
    sync(state)
    dt = (time.perf_counter() - t0) / iters
    return dt, state


def _decode_lane0(limb_arrays):
    """Device limb planes -> lane-0 Python ints (Montgomery-decoded)."""
    from jubjub_tpu.fields.element import FQ_SPEC
    from jubjub_tpu.fields.spec import limbs_to_int
    q = FQ_SPEC.p
    rinv = pow(FQ_SPEC.R, -1, q)
    out = []
    for a in limb_arrays:
        host = np.asarray(a[:, :1]).reshape(-1)
        out.append(limbs_to_int(host) * rinv % q)
    return out


def _check_on_curve(u, v, z):
    """Projective on-curve check: -u^2 z^2 + v^2 z^2 = z^4 + d u^2 v^2."""
    from jubjub_tpu import oracle
    q = oracle.Q
    zi = pow(z, -1, q)
    ua, va = u * zi % q, v * zi % q
    lhs = (va * va - ua * ua) % q
    rhs = (1 + oracle.EDWARDS_D * ua * ua % q * va % q * va) % q
    assert lhs == rhs, "bench output not on curve: miscompile?"


def main() -> None:
    from jubjub_tpu.curve import full_generator, mul_extended
    from jubjub_tpu.curve.scalar_mul import generator_table
    from jubjub_tpu.fields import Fr
    from jubjub_tpu.ops.pallas_fixed_base import fixed_base_mul_fused
    from jubjub_tpu.ops.pallas_ladder import mul_extended_fused

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    backend = jax.default_backend()
    on_tpu = backend == "tpu"

    key = jax.random.PRNGKey(0)
    ks = Fr.random(key, (batch,))
    pts = full_generator((batch,)).to_extended()
    pts = mul_extended(pts, Fr.from_int([i % 97 + 1 for i in range(batch)]))
    jax.block_until_ready(pts.u.limbs)

    # -- variable-base fused ladder ---------------------------------------
    ladder = mul_extended_fused if on_tpu else mul_extended

    @jax.jit
    def vb_step(p):
        return ladder(p, ks)

    def sync(p):
        return np.asarray(p.u.limbs[:, :1])

    out = vb_step(pts)
    sync(out)  # compile + warmup
    u, v, z = _decode_lane0((out.u.limbs, out.v.limbs, out.z.limbs))
    _check_on_curve(u, v, z)
    dt_vb, out = _time_chain(vb_step, out, sync)
    vb_per_sec = batch / dt_vb

    # -- fixed-base fused wide-window path --------------------------------
    gt = generator_table()

    @jax.jit
    def fb_step(k):
        p = gt.mul_fused(k)
        # feed the result back as the next scalar batch: u-limbs reduce to
        # a valid Fr element via from_bytes_wide-free masking — simplest is
        # to reuse the output's t1 limbs as the next scalars mod 2^252.
        nxt = Fr(k.limbs).limbs * 0 + (p.u.limbs & 0xFFF)  # data-dependent
        return Fr(nxt), p

    out_k, out_p = fb_step(ks)
    sync(out_p)
    u, v, z = _decode_lane0((out_p.u.limbs, out_p.v.limbs, out_p.z.limbs))
    _check_on_curve(u, v, z)

    def fb_chain(state):
        k, _ = state
        return fb_step(k)

    def fb_sync(state):
        return sync(state[1])

    dt_fb, _ = _time_chain(fb_chain, (out_k, out_p), fb_sync)
    fb_per_sec = batch / dt_fb

    print(json.dumps({
        "metric": "scalar_muls_per_sec_per_chip",
        "value": round(fb_per_sec, 2),
        "unit": "ops/s",
        "vs_baseline": round(fb_per_sec / 1e7, 6),
        "mode": "fixed_base",
        "variable_base": round(vb_per_sec, 2),
        "batch": batch,
        "backend": backend,
    }))


if __name__ == "__main__":
    main()
