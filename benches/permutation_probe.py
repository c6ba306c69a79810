"""Measured rates of the data-movement primitives a bucket-Pippenger MSM
needs on this chip — the evidence behind the MSM algorithm choice.

Pippenger bucket accumulation requires, per c-bit window, a full
permutation of the point set into digit-sorted order (or an equivalent
scatter).  On TPU the candidate primitives are:

  - ``lax.sort_key_val`` over the int32 digit keys (cheap — keys only),
  - an XLA row gather of the 320-byte Niels records (the permutation
    proper) — measured ROW-RATE bound at ~70M rows/s regardless of row
    width, i.e. ~60ms per 2^22-point permutation,
  - or a slab-blocked one-hot bf16 matmul on the (otherwise idle) MXU —
    fast in TMAC/s but costing S*record MACs per point for slab size S,
    and only slab-LOCAL order (the cross-slab combine then costs
    nslabs * 2^c group adds per window).

With nwin(c) full permutations per MSM, the permutation wall is
nwin * ~60ms ~= 1s at 2^22 — more than the ~0.4s the sorted points take
to bucket-accumulate at the measured in-kernel addition rate, and more
than the table-based fused kernel's ONE streaming pass.  That is why
``parallel/pippenger.py`` exists and is exact, but the table-based
signed-window kernel (ops/pallas_msm.py) is the default.  Numbers land in
PERMPROBE artifacts so the conclusion is re-checkable on new hardware.

Timing discipline: device-side feedback chains + host readback
(block_until_ready alone does not synchronize under the tunneled
runtime; see bench.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")))

import jax
import jax.numpy as jnp
import numpy as np

_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _sync(x):
    return np.asarray(x.reshape(-1)[:1])


def _emit(metric, dt, n, unit="s"):
    print(json.dumps({
        "metric": metric, "value": round(dt, 5), "unit": unit, "n": n,
        "backend": jax.default_backend(),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log2n", type=int, default=22)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    n = 1 << args.log2n
    reps = args.reps
    key = jax.random.PRNGKey(0)

    d0 = jax.random.randint(key, (n,), 0, 8192, dtype=jnp.int32)
    iota = jnp.arange(n, dtype=jnp.int32)
    g0 = jax.random.permutation(key, iota)
    recs = jax.random.randint(key, (n, 80), 0, 8191, dtype=jnp.int32)

    # sort of the digit keys (carrying the index payload)
    @jax.jit
    def step_sort(d, i):
        sk, si = jax.lax.sort_key_val(d, i, is_stable=False)
        return (sk + (si & 1)) & 8191, si

    d, i = step_sort(d0, iota)
    _sync(d)
    t0 = time.perf_counter()
    for _ in range(reps):
        d, i = step_sort(d, i)
    _sync(d)
    _emit("sort_key_val_int32", (time.perf_counter() - t0) / reps, n)

    # the permutation itself: contiguous-row gather of Niels records
    @jax.jit
    def step_gather(g):
        out = recs[g]
        return out, (g + (out[:, 0] & 1)) & (n - 1)

    out, g = step_gather(g0)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out, g = step_gather(g)
    _sync(out)
    dt = (time.perf_counter() - t0) / reps
    _emit("row_gather_niels_records", dt, n)
    _emit("row_gather_rows_per_sec", n / dt, n, unit="rows/s")

    # suffix-position queries on the sorted keys
    sk0, _ = jax.lax.sort_key_val(d0, iota)
    ts = jnp.arange(1, 8192, dtype=jnp.int32)

    @jax.jit
    def step_ss(s):
        p = jnp.searchsorted(s, ts)
        return s + (p[0] & 1), p

    s, p = step_ss(sk0)
    _sync(s)
    t0 = time.perf_counter()
    for _ in range(reps):
        s, p = step_ss(s)
    _sync(s)
    _emit("searchsorted_8191", (time.perf_counter() - t0) / reps, n)

    # MXU alternative: slab-blocked one-hot permutation (bf16, exact for
    # 7-bit chunks); slab-local order only
    S = 2048
    nslab = n // S
    recsb = jax.random.randint(key, (nslab, S, 200), 0, 127,
                               jnp.int32).astype(jnp.bfloat16)
    idx = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (nslab, S))

    @jax.jit
    def step_perm(pi):
        onehot = (pi[:, :, None] == jnp.arange(S, dtype=jnp.int32)
                  ).astype(jnp.bfloat16)
        out = jax.lax.dot_general(onehot, recsb, (((2,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        return out, (pi + (out[:, :, 0].astype(jnp.int32) & 1)) % S

    out, pi = step_perm(idx)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out, pi = step_perm(pi)
    _sync(out)
    _emit(f"mxu_onehot_slab_perm_S{S}", (time.perf_counter() - t0) / reps, n)


if __name__ == "__main__":
    main()
