"""MSM tests: single-device windowed-Horner and mesh-sharded variants."""

import numpy as np
import jax
import jax.numpy as jnp

from jubjub_tpu import oracle
from jubjub_tpu.curve import batch_normalize, full_generator, mul_extended
from jubjub_tpu.fields import Fr
from jubjub_tpu.parallel import msm, msm_sharded

from helpers import aff_ints


def _fixture(n):
    base_ks = [(i * 7 + 3) % oracle.R for i in range(1, n + 1)]
    scalars = [(i * 1234567 + 89) % oracle.R for i in range(n)]
    pts = mul_extended(full_generator((n,)).to_extended(), Fr.from_int(base_ks))
    expect = oracle.IDENTITY
    for bk, s in zip(base_ks, scalars):
        expect = oracle.add(expect,
                            oracle.mul(oracle.mul(oracle.GENERATOR, bk), s))
    return pts, Fr.from_int(scalars), expect


def test_msm_single_device():
    pts, ks, expect = _fixture(32)
    out = msm(pts, ks, chunk=8)
    assert aff_ints(batch_normalize(out))[0] == expect


def test_msm_one_chunk():
    pts, ks, expect = _fixture(16)
    out = msm(pts, ks, chunk=16)
    assert aff_ints(batch_normalize(out))[0] == expect


def test_msm_sharded_matches_oracle():
    from jax.sharding import Mesh
    ndev = len(jax.devices())
    assert ndev == 8, "conftest should provide 8 virtual devices"
    mesh = Mesh(np.array(jax.devices()), axis_names=("data",))
    pts, ks, expect = _fixture(48)  # 6 points per device

    out = jax.jit(lambda p, k: msm_sharded(p, k, mesh, chunk=6))(pts, ks)
    assert aff_ints(batch_normalize(out))[0] == expect


def test_msm_non_dividing_chunk_pads():
    """Regression (round-2 verdict): n not divisible by chunk must pad with
    identity points instead of dying on an assert."""
    pts, ks, expect = _fixture(13)
    out = msm(pts, ks, chunk=8)  # 13 = 8 + 5 -> one padded chunk
    assert aff_ints(batch_normalize(out))[0] == expect


def test_msm_fused_kernel_matches_oracle():
    """The Pallas window-sums kernel (ops/pallas_msm.py) vs the oracle,
    via the CPU interpreter."""
    from jubjub_tpu.ops.pallas_msm import msm_fused
    pts, ks, expect = _fixture(256)
    out = msm_fused(pts, ks)
    assert aff_ints(batch_normalize(out))[0] == expect


def test_msm_fused_small_n_pads_correctly():
    """Regression (round-4 dryrun RED): with n < LANE the scalar pad used
    to be built by slicing ``limbs[:, :pad]``, which truncates to n columns
    when pad > n and crashed the digit reshape.  n=16 is the exact
    8-device-dryrun leg-2 per-shard shape."""
    from jubjub_tpu.ops.pallas_msm import msm_fused
    pts, ks, expect = _fixture(16)  # pad = 112 > n = 16
    out = msm_fused(pts, ks)
    assert aff_ints(batch_normalize(out))[0] == expect


def test_msm_fused_non_multiple_n_pads_correctly():
    """n > LANE but not a multiple of it (200 -> pad 56 < n): the other
    branch of the padding arithmetic."""
    from jubjub_tpu.ops.pallas_msm import msm_fused
    pts, ks, expect = _fixture(200)
    out = msm_fused(pts, ks)
    assert aff_ints(batch_normalize(out))[0] == expect


def test_msm_zero_scalars():
    pts = mul_extended(full_generator((8,)).to_extended(),
                       Fr.from_int(list(range(1, 9))))
    out = msm(pts, Fr.from_int([0] * 8), chunk=8)
    assert bool(np.asarray(out.is_identity()))


def test_msm_fused_signed_matches_oracle():
    """Signed w=5 digit recoding in the fused kernel (51 windows, 16-entry
    magnitude table + masked Niels negation) vs the oracle."""
    from jubjub_tpu.ops.pallas_msm import msm_fused
    pts, ks, expect = _fixture(256)
    out = msm_fused(pts, ks, wbits=5, signed=True)
    assert aff_ints(batch_normalize(out))[0] == expect


def test_msm_fused_unsigned_matches_oracle():
    """Unsigned w=4 mode stays exact alongside the signed default."""
    from jubjub_tpu.ops.pallas_msm import msm_fused
    pts, ks, expect = _fixture(256)
    out = msm_fused(pts, ks, wbits=4, signed=False)
    assert aff_ints(batch_normalize(out))[0] == expect


def test_msm_pippenger_sorted_scan_matches_oracle():
    """Sorted-scan bucket accumulation (parallel/pippenger.py): sort +
    prefix-scan kernel + suffix-sum bucket reduction vs the oracle.
    Small widths/lanes keep the 2-core XLA:CPU compile tractable; the
    production widths run on TPU via benches/tpu_tests.py."""
    from jubjub_tpu.parallel.pippenger import window_sums_sorted
    from jubjub_tpu.parallel.msm import horner_spine
    pts, ks, expect = _fixture(256)
    ws = window_sums_sorted(pts, ks, wbits=4, rows=1, steps_per_block=2)
    out = horner_spine(ws, wbits=4)
    assert aff_ints(batch_normalize(out))[0] == expect


import pytest


@pytest.mark.parametrize("algorithm,n", [("xla", 48), ("fused", 48),
                                         ("sorted", 48)])
def test_msm_sharded_output_replicated_on_all_devices(algorithm, n,
                                                      monkeypatch):
    """check_vma=False in msm_sharded bypasses the varying-axis checker; this
    test supplies the proof it waives — for EVERY algorithm the selector can
    choose: every device's output shard holds the SAME bytes (the all_gather
    + replicated Horner spine really replicate).  The fused leg also covers
    the round-4 small-shard padding regression under shard_map (6 points per
    device -> pad 122 > n)."""
    from jax.sharding import Mesh
    from jubjub_tpu import config
    if algorithm == "sorted":
        # production widths (wbits=16 -> 65535 thresholds/window) are TPU
        # scale; shrink to keep the 2-core XLA:CPU compile tractable
        monkeypatch.setattr(config, "PIPPENGER_WBITS", 4)
        monkeypatch.setattr(config, "PIPPENGER_ROWS", 1)
        monkeypatch.setattr(config, "PIPPENGER_SBLK", 2)
    mesh = Mesh(np.array(jax.devices()), axis_names=("data",))
    pts, ks, expect = _fixture(n)
    out = jax.jit(lambda p, k: msm_sharded(p, k, mesh, chunk=6,
                                           algorithm=algorithm))(pts, ks)
    for leaf in jax.tree_util.tree_leaves(out):
        shards = leaf.addressable_shards
        assert len(shards) == len(jax.devices())
        ref = np.asarray(shards[0].data)
        for s in shards[1:]:
            assert (np.asarray(s.data) == ref).all(), \
                f"device {s.device} diverged"
    assert aff_ints(batch_normalize(out))[0] == expect
