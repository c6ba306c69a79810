"""Benchmark: batched variable-base Jubjub scalar multiplication throughput.

Prints ONE JSON line:
  {"metric": "scalar_muls_per_sec_per_chip", "value": N, "unit": "ops/s",
   "vs_baseline": N / 1e7}

The baseline denominator is the BASELINE.json north-star target of 1e7
variable-base scalar-muls/s/chip (the reference publishes no numbers of its
own — see BASELINE.md).

Measurement discipline: every timed iteration feeds the previous result back
in as the next base point (a true data dependency), and the timed region ends
with a host readback of a slice of the result.  Without both, the tunneled
TPU runtime pipelines/elides identical dispatches and reports numbers that
are orders of magnitude too high.
"""

from __future__ import annotations

import json
import sys
import time

import os

import jax
import numpy as np

# Persistent compilation cache: first compile through the tunneled runtime is
# slow (minutes); cached re-runs start in seconds.
_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main() -> None:
    from jubjub_tpu.curve import mul_extended, full_generator
    from jubjub_tpu.fields import Fr

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    backend = jax.default_backend()

    key = jax.random.PRNGKey(0)
    ks = Fr.random(key, (batch,))
    pts = full_generator((batch,)).to_extended()
    pts = mul_extended(pts, Fr.from_int([i % 97 + 1 for i in range(batch)]))
    jax.block_until_ready(pts.u.limbs)

    if backend == "tpu":
        from jubjub_tpu.ops.pallas_ladder import mul_extended_fused as ladder
    else:
        ladder = mul_extended

    @jax.jit
    def step(p, k):
        return ladder(p, k)  # output point feeds the next iteration

    def sync(p):
        return np.asarray(p.u.limbs[:, :1])

    out = step(pts, ks)
    sync(out)  # compile + warmup

    # calibrate iteration count for a >=1s window
    t0 = time.perf_counter()
    out = step(out, ks)
    sync(out)
    t_one = time.perf_counter() - t0
    iters = max(3, int(1.5 / max(t_one, 1e-9)))

    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(out, ks)
    sync(out)
    dt = time.perf_counter() - t0

    per_sec = batch * iters / dt
    print(json.dumps({
        "metric": "scalar_muls_per_sec_per_chip",
        "value": round(per_sec, 2),
        "unit": "ops/s",
        "vs_baseline": round(per_sec / 1e7, 6),
        "batch": batch,
        "iters": iters,
        "backend": backend,
    }))


if __name__ == "__main__":
    main()
