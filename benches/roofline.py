"""VPU roofline microbenchmark: int32 add/mul throughput and mont.mul cost.

Establishes the speed-of-light budget for the Montgomery kernel: measures
raw int32 vector op throughput on this chip (Pallas kernel, VMEM-resident)
and the achieved element-ops/s of ``fields.mont.mul``, so the per-kernel
audit in BASELINE.md can report % of peak.

Prints one JSON line per metric.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")))

_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _time(step, out, reps=5):
    np.asarray(jax.device_get(out[0][:1] if isinstance(out, tuple) else out[:1, :1]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = step(out)
    r = out[0] if isinstance(out, tuple) else out
    np.asarray(jax.device_get(r[:1, :1] if r.ndim > 1 else r[:1]))
    return (time.perf_counter() - t0) / reps


def intop_kernel(n_ops: int, rows: int, cols: int, op: str):
    """Chain of n_ops dependent int32 ops on a (rows, cols) block."""

    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]
        for i in range(n_ops // 2):
            if op == "mul":
                a = a * b
                b = b * a
            elif op == "add":
                a = a + b
                b = b + a
            else:  # mixed: the mont.mul blend (roughly 1 mul : 2 add : 2 bit)
                a = (a * b + a) & 0xFFFF
                b = (b + (a >> 7)) + a
        o_ref[:] = a + b

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)

    return run


def bench_intops(op: str, rows=256, cols=1024, n_ops=8192):
    a = jnp.asarray(np.random.randint(1, 1 << 15, (rows, cols), np.int32))
    b = jnp.asarray(np.random.randint(1, 1 << 15, (rows, cols), np.int32))
    run = intop_kernel(n_ops, rows, cols, op)

    def step(x):
        return run(x, b)

    per_call = {"mul": n_ops, "add": n_ops, "mixed": n_ops // 2 * 5}[op]
    dt = _time(step, step(a))
    ops = rows * cols * per_call / dt
    print(json.dumps({"metric": f"vpu_int32_{op}_ops_per_sec",
                      "value": round(ops / 1e9, 2), "unit": "Gop/s",
                      "shape": [rows, cols], "chain": n_ops}), flush=True)
    return ops


def bench_mont_mul(batch=65536):
    """Standalone-dispatch regime: one mont.mul per kernel launch, operands
    through HBM — measures latency + memory system, NOT the in-kernel rate
    (see bench_mont_mul_chained for that).  Kept for the dispatch-cost row."""
    from jubjub_tpu.fields.element import FQ_SPEC
    from jubjub_tpu.fields.spec import LIMB_BITS, NLIMBS
    from jubjub_tpu.ops.pallas_mont import mont_mul

    key = jax.random.PRNGKey(0)
    a = jax.random.randint(key, (NLIMBS, batch), 0, 1 << LIMB_BITS, jnp.int32)
    b = jax.random.randint(key, (NLIMBS, batch), 0, 1 << LIMB_BITS, jnp.int32)

    @jax.jit
    def step(x):
        return mont_mul(FQ_SPEC, x, b)

    dt = _time(step, step(a))
    print(json.dumps({"metric": "fq_mont_mul_dispatch_per_sec",
                      "value": round(batch / dt / 1e6, 2), "unit": "Mmul/s",
                      "ns_per_mul": round(dt / batch * 1e9, 2),
                      "batch": batch,
                      "regime": "single-op dispatch through HBM (latency), "
                                "NOT the in-kernel rate"}), flush=True)


def bench_mont_mul_chained(rows=8, blocks=64, chain=64):
    """In-kernel regime: a VMEM-resident chain of dependent mont.muls on
    (NLIMBS, 8, 128) tiles — the rate the fused scalar-mul/MSM kernels
    actually run their field math at (docs/performance.md's ~2.6G muls/s
    ledger row).  This is the per-kernel speed-of-light reference every
    achieved-vs-ceiling row below is divided by."""
    from jubjub_tpu.fields import mont
    from jubjub_tpu.fields.element import FQ_SPEC
    from jubjub_tpu.fields.spec import LIMB_BITS, NLIMBS

    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]
        for _ in range(chain):
            a = mont.mul(FQ_SPEC, a, b)
        o_ref[:] = a

    spec = pl.BlockSpec((NLIMBS, rows, 128), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel, grid=(blocks,),
            in_specs=[spec] * 2, out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((NLIMBS, rows * blocks, 128),
                                           jnp.int32),
        )(a, b)

    key = jax.random.PRNGKey(0)
    shape = (NLIMBS, rows * blocks, 128)
    a = jax.random.randint(key, shape, 0, 1 << LIMB_BITS, jnp.int32)
    b = jax.random.randint(key, shape, 0, 1 << LIMB_BITS, jnp.int32)

    def step(x):
        return run(x, b)

    dt = _time(step, step(a))
    nmul = rows * blocks * 128 * chain
    rate = nmul / dt
    print(json.dumps({"metric": "fq_mont_mul_chained_in_kernel_per_sec",
                      "value": round(rate / 1e9, 3), "unit": "Gmul/s",
                      "chain": chain, "lanes": rows * blocks * 128,
                      "regime": "VMEM-resident dependent chain "
                                "(the fused kernels' regime)"}), flush=True)
    return rate


# Mul-equivalents per operation for the hot kernels, from the formulas in
# curve/points.py (squares counted as muls; the VPU cost is the same):
#   fixed-base signed w=8 + window-0 seed: 31 affine-niels adds x 7 muls
#     + seed/epilogue ~= 220 muls/scalar
#   variable-base unsigned w=4 ladder: 252 doubles x 7 + 63 adds x 8
#     = 2268 muls/scalar
#   MSM fused signed w=5: (51 windows + 15 table-build) adds x 8 muls
#     = 528 muls/point
_KERNEL_MULS = {"fixed_base": 220.0, "variable_base": 2268.0, "msm": 528.0}


def achieved_rows(ceiling_muls_per_sec, fb=None, vb=None, msm=None):
    """Per-hot-kernel achieved-vs-ceiling rows from measured bench rates
    (ops/s for fb/vb, points/s for msm, e.g. from BENCH_r*.json)."""
    for name, rate in (("fixed_base", fb), ("variable_base", vb),
                       ("msm", msm)):
        if not rate:
            continue
        muls = rate * _KERNEL_MULS[name]
        print(json.dumps({
            "metric": f"{name}_achieved_muls_per_sec",
            "value": round(muls / 1e9, 3), "unit": "Gmul/s",
            "ops_per_sec": rate,
            "mul_equivalents_per_op": _KERNEL_MULS[name],
            "pct_of_in_kernel_ceiling":
                round(100 * muls / ceiling_muls_per_sec, 1),
        }), flush=True)


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--fb", type=float, default=None,
                    help="measured fixed-base ops/s (BENCH_r*)")
    ap.add_argument("--vb", type=float, default=None,
                    help="measured variable-base ops/s")
    ap.add_argument("--msm", type=float, default=None,
                    help="measured MSM points/s")
    args = ap.parse_args()
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    for op in ("add", "mul", "mixed"):
        bench_intops(op)
    ceiling = bench_mont_mul_chained()
    bench_mont_mul()
    achieved_rows(ceiling, fb=args.fb, vb=args.vb, msm=args.msm)
