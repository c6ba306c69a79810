"""Criterion-parity micro-benchmark suite.

Replicates the reference's three criterion suites, one JSON line per metric
(names preserved):
  - Fq/Fr: add_assign, sub_assign, mul_assign, square, invert, sqrt
    (/root/reference/benches/fq_bench.rs, fr_bench.rs)
  - Point: doubling, addition, subtraction, cached (extended-niels) and
    cached affine (affine-niels) variants
    (/root/reference/benches/point_bench.rs)

The reference measures one scalar op; a TPU "op" is inherently batched, so
each metric reports per-element amortized time at the given batch size (the
honest TPU-native figure) plus ops/s.

Timing discipline: chained data dependencies + host readback, as in
bench.py (the tunneled runtime elides repeated identical dispatches).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")))
_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _sync(x):
    return np.asarray(x if isinstance(x, jnp.ndarray) else x[0])[..., :1]


# Every record carries this regime label: these criterion-parity numbers
# time a DEPENDENT op chain through HBM at XLA level (latency-per-op, like
# the reference's criterion loops) — NOT the in-kernel VMEM-resident
# throughput the fused scalar-mul/MSM headlines amortize (that regime is
# ~100x higher per op; see ROOFLINE_r*.json and docs/performance.md).
_REGIME = "xla-dependent-chain (latency/op incl. HBM; not in-kernel rate)"


def chain_bench(name, step, init, units_per_call, reps=3):
    out = step(init)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = step(out)
    _sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({
        "metric": name,
        "value": round(units_per_call / dt, 1),
        "unit": "ops/s",
        "ns_per_op": round(dt / units_per_call * 1e9, 3),
        "regime": _REGIME,
    }), flush=True)


def field_benches(E, name, batch, chain_len):
    import jax.random as jr
    from jubjub_tpu.fields import mont
    F = E.SPEC
    a = E.random(jr.PRNGKey(0), (batch,)).limbs
    b = E.random(jr.PRNGKey(1), (batch,)).limbs
    n_units = batch * chain_len

    def scan_chain(fn2):
        @jax.jit
        def step(carry):
            def body(cs, _):
                x, y = cs
                return (fn2(x, y), x), None
            cs, _ = jax.lax.scan(body, carry, None, length=chain_len)
            return cs
        return step

    chain_bench(f"{name} add_assign", scan_chain(lambda x, y: mont.add(F, x, y)),
                (a, b), n_units)
    chain_bench(f"{name} sub_assign", scan_chain(lambda x, y: mont.sub(F, x, y)),
                (a, b), n_units)
    chain_bench(f"{name} mul_assign", scan_chain(lambda x, y: mont.mul(F, x, y)),
                (a, b), n_units)
    chain_bench(f"{name} square", scan_chain(lambda x, y: mont.square(F, x)),
                (a, b), n_units)

    # invert / sqrt are ~300-1000x a mul: use a short chain
    @jax.jit
    def inv_step(carry):
        x, y = carry
        inv, _ = mont.invert(F, x)
        return (inv, x)
    chain_bench(f"{name} invert", inv_step, (a, b), batch)

    from jubjub_tpu.fields import sqrt as sqrt_mod

    @jax.jit
    def sqrt_step(carry):
        x, y = carry
        r, _ = sqrt_mod.sqrt(F, mont.square(F, x))
        return (r, x)
    chain_bench(f"{name} sqrt", sqrt_step, (a, b), batch)


def point_benches(batch, chain_len):
    from jubjub_tpu.curve import full_generator
    from jubjub_tpu.fields import Fr
    g = full_generator((batch,)).to_extended()
    gn = g.to_niels()
    ga = full_generator((batch,)).to_niels()
    n_units = batch * chain_len

    def scan_chain(fn):
        @jax.jit
        def step(p):
            def body(c, _):
                return fn(c), None
            c, _ = jax.lax.scan(body, p, None, length=chain_len)
            return c
        return step

    def syncp(p):
        return np.asarray(p.u.limbs)[..., :1]

    def chainp(name, fn, init, units):
        step = scan_chain(fn)
        out = step(init)
        syncp(out)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = step(out)
        syncp(out)
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({
            "metric": name,
            "value": round(units / dt, 1),
            "unit": "ops/s",
            "ns_per_op": round(dt / units * 1e9, 3),
            "regime": _REGIME,
        }), flush=True)

    chainp("Jubjub point doubling", lambda p: p.double(), g, n_units)
    chainp("Jubjub point addition", lambda p: p + g, g, n_units)
    chainp("Jubjub point subtraction", lambda p: p - g, g, n_units)
    chainp("Jubjub cached point addition", lambda p: p.add_extended_niels(gn),
           g, n_units)
    chainp("Jubjub cached point subtraction", lambda p: p.sub_extended_niels(gn),
           g, n_units)
    chainp("Jubjub cached affine point addition",
           lambda p: p.add_affine_niels(ga), g, n_units)
    chainp("Jubjub cached affine point subtraction",
           lambda p: p.sub_affine_niels(ga), g, n_units)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--chain", type=int, default=256)
    ap.add_argument("--only", choices=["fq", "fr", "point"], default=None)
    args = ap.parse_args()

    from jubjub_tpu.fields import Fq, Fr
    if args.only in (None, "fq"):
        field_benches(Fq, "Fq", args.batch, args.chain)
    if args.only in (None, "fr"):
        field_benches(Fr, "Fr", args.batch, args.chain)
    if args.only in (None, "point"):
        point_benches(args.batch, args.chain)


if __name__ == "__main__":
    main()
