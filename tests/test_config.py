"""Config surface: defaults, env overrides, and call-site plumbing."""

import importlib

from jubjub_tpu import config


def test_defaults():
    assert config.FIXED_BASE_WBITS == 8
    assert config.FIXED_BASE_SIGNED is True
    assert config.FIXED_BASE_BLOCK == 2048
    assert config.LADDER_BLOCK == 1024
    assert config.MSM_BLOCK_ROWS == 8
    assert config.MSM_WGROUP == 9  # hard v5e scoped-VMEM cap, see config.py
    assert config.MSM_CHUNK == 1024
    assert config.MESH_AXIS == "data"


def test_env_overrides(monkeypatch):
    monkeypatch.setenv("JUBJUB_TPU_FIXED_BASE_WBITS", "9")
    monkeypatch.setenv("JUBJUB_TPU_FIXED_BASE_SIGNED", "false")
    monkeypatch.setenv("JUBJUB_TPU_MESH_AXIS", "mp")
    importlib.reload(config)
    try:
        assert config.FIXED_BASE_WBITS == 9
        assert config.FIXED_BASE_SIGNED is False
        assert config.MESH_AXIS == "mp"
    finally:
        monkeypatch.undo()
        importlib.reload(config)
    assert config.FIXED_BASE_WBITS == 8


def test_radix_is_deliberately_not_configurable():
    """The limb radix is a load-time constant with safety proofs attached
    (fields/spec.py); the config module documents this choice."""
    from jubjub_tpu.fields.spec import LIMB_BITS, MASK, NLIMBS
    assert (LIMB_BITS, NLIMBS) == (13, 20)
    assert 2 * NLIMBS * MASK * MASK < (1 << 32)  # the split-free bound
    assert "NOT configurable" in config.__doc__
