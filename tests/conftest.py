"""Test configuration: CPU backend with 8 virtual devices.

Tests run on CPU (bit-exact integer ops, no TPU needed) with an 8-device
virtual mesh for the sharding tests, matching the driver's multi-chip
dry-run environment.  A persistent compilation cache keeps re-runs fast.
"""

import os

# Select the CPU platform BEFORE jax initializes any backend: this also
# keeps accelerator PJRT plugins (if the host has any) from starting up
# under the test runner.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Belt AND suspenders: when jax (and an accelerator PJRT plugin) is already
# preloaded at interpreter startup — e.g. a dev box whose sitecustomize sets
# an ambient platform — the env var above is too late and is ignored.  The
# config update works even then, so tests always run on the 8-device virtual
# CPU mesh rather than silently on whatever accelerator the host tunnels.
jax.config.update("jax_platforms", "cpu")

_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache", "tests")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
