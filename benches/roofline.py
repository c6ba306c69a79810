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
    print(json.dumps({"metric": "fq_mont_mul_per_sec",
                      "value": round(batch / dt / 1e6, 2), "unit": "Mmul/s",
                      "ns_per_mul": round(dt / batch * 1e9, 2),
                      "batch": batch}), flush=True)


if __name__ == "__main__":
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    for op in ("add", "mul", "mixed"):
        bench_intops(op)
    bench_mont_mul()
