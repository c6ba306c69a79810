"""Runtime configuration: every tunable knob in one place.

The reference's only configuration is Cargo features
(/root/reference/Cargo.toml:49-52: ``alloc``/``bits``) plus the
u64-vs-u32 limb selection by ``target_pointer_width``
(/root/reference/src/fr.rs:85-95).  The TPU build's configuration axes are
kernel shapes and window schedules instead; they are collected here with
environment overrides (``JUBJUB_TPU_<NAME>``) so deployments can retune
without code edits.

NOT configurable: the limb radix (13 bits x 20 limbs).  It is a load-time
constant (fields/spec.py) because the whole kernel stack — carry bounds,
the split-free uint32 column proof, the bf16 one-hot chunk packing, VMEM
scratch shapes — is derived from it at trace time; changing it is a
rebuild-the-proofs decision, not a flag (see fields/spec.py's bound
assertions, which would catch an unsound edit).

All values are read at *call* time by the kernels, so tests can also
monkeypatch this module.
"""

from __future__ import annotations

import os


def _env_int(name: str, default: int) -> int:
    v = os.environ.get(f"JUBJUB_TPU_{name}")
    return int(v) if v else default


def _env_bool(name: str, default: bool) -> bool:
    v = os.environ.get(f"JUBJUB_TPU_{name}")
    return v.lower() in ("1", "true", "yes") if v else default


# -- fixed-base scalar multiplication (ops/pallas_fixed_base.py) -----------
# window width in bits; 8 signed is the measured optimum on v5e
FIXED_BASE_WBITS: int = _env_int("FIXED_BASE_WBITS", 8)
# signed digits halve the one-hot/table width per window
FIXED_BASE_SIGNED: bool = _env_bool("FIXED_BASE_SIGNED", True)
# batch lanes per kernel instance (VMEM-bounded; 4096 measured 3x WORSE)
FIXED_BASE_BLOCK: int = _env_int("FIXED_BASE_BLOCK", 2048)

# -- variable-base ladder (ops/pallas_ladder.py) ---------------------------
LADDER_BLOCK: int = _env_int("LADDER_BLOCK", 1024)
# signed ladder: half-size Niels table, ~1.5% faster, group-equal output
LADDER_SIGNED: bool = _env_bool("LADDER_SIGNED", False)

# -- MSM (ops/pallas_msm.py, parallel/msm.py) ------------------------------
# window width for the fused kernel: 4 -> 63 windows/16-entry table,
# 5 -> 51 windows (19% fewer additions) at 2x table/select cost
MSM_WBITS: int = _env_int("MSM_WBITS", 5)
# signed digit recoding: magnitudes-only table (half the entries), one
# masked Niels negation per window.  signed w=5 = 51 windows + 15 build
# adds per point vs unsigned w=4's 63 + 14 — the measured optimum.
MSM_SIGNED: bool = _env_bool("MSM_SIGNED", True)
# points per kernel block = MSM_BLOCK_ROWS * 128
MSM_BLOCK_ROWS: int = _env_int("MSM_BLOCK_ROWS", 8)
# grid order: groups innermost builds each block's table once (removing
# ~47% of kernel additions; +40% measured) but revisits output blocks
# non-consecutively (extra DMA, overlapped).  Verified exact on v5e.
MSM_GROUPS_INNER: bool = _env_bool("MSM_GROUPS_INNER", True)
# windows per grid group — a HARD v5e scoped-VMEM budget, not a tuning
# preference: >9 with a 16-entry table + Karatsuba OOMs the Mosaic
# scoped-vmem limit (measured: 17 -> 19.20 MB, 13 -> 16.04 MB vs the
# 16 MB cap; see ops/pallas_msm._pick_wgroup)
MSM_WGROUP: int = _env_int("MSM_WGROUP", 9)
# chunk size for the XLA (non-Pallas) window-sums path
MSM_CHUNK: int = _env_int("MSM_CHUNK", 1024)

# -- sorted-scan Pippenger MSM (parallel/pippenger.py) ---------------------
# window width: nwin = ceil(252/c) group adds per point; larger c means
# fewer windows but 2^c prefix queries per window
PIPPENGER_WBITS: int = _env_int("PIPPENGER_WBITS", 16)
# sublane rows per scan-kernel tile: lanes = rows * 128 parallel runs
PIPPENGER_ROWS: int = _env_int("PIPPENGER_ROWS", 8)
# sorted points consumed per kernel grid step (VMEM block depth)
PIPPENGER_SBLK: int = _env_int("PIPPENGER_SBLK", 8)

# -- field core (fields/mont.py) -------------------------------------------
# Karatsuba product phase: 300/165 limb products (mul/square) instead of
# 400/210, bit-identical columns (proof in mont._product_cols_karatsuba).
# Read at trace time by mont.mul/mont.square everywhere, incl. inside
# Pallas kernels.  None = auto: on for TPU backends (measured +4% on the
# fixed-base headline, v5e), off elsewhere so the committed XLA:CPU
# compile-cache programs (tests, multi-chip dry run) stay byte-stable.
_kar = os.environ.get("JUBJUB_TPU_MUL_KARATSUBA")
MUL_KARATSUBA: bool | None = (None if not _kar else
                              _kar.lower() in ("1", "true", "yes"))

# -- mesh ------------------------------------------------------------------
MESH_AXIS: str = os.environ.get("JUBJUB_TPU_MESH_AXIS", "data")
