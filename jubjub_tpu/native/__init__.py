"""Native host codec: C++ fast paths with transparent NumPy fallback.

Compiled lazily with the system compiler on first use (no pip deps, bound
via ctypes).  ``HAVE_NATIVE`` reports which tier is active after the first
call.  Used by the fixed-base table builders
(curve/scalar_mul.py: affine_niels_table_host / affine_niels_chunk_table_host)
to pack oracle-computed integers into 13-bit limb planes, and available for
bulk byte<->limb conversion at the serialization boundary.  The ``_np_*``
fallbacks are the exact same transforms in NumPy; ``tests/test_native.py``
asserts C++/NumPy parity and round-trips.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_LIB = None
HAVE_NATIVE = False


def _build() -> str | None:
    src = os.path.join(os.path.dirname(__file__), "codec.cpp")
    out = os.path.join(tempfile.gettempdir(),
                       f"jj_codec_{os.getuid()}_{os.path.getmtime(src):.0f}.so")
    if not os.path.exists(out):
        cmd = ["c++", "-O3", "-shared", "-fPIC", "-o", out, src]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    return out


def _load():
    global _LIB, HAVE_NATIVE
    if _LIB is not None or HAVE_NATIVE:
        return _LIB
    path = _build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.jj_bytes_to_limbs.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        lib.jj_limbs_to_bytes.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        lib.jj_xorshift_fill.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        _LIB = lib
        HAVE_NATIVE = True
    except OSError:
        _LIB = None
    return _LIB


def _np_bytes_to_limbs(raw: np.ndarray) -> np.ndarray:
    """Pure-NumPy reference for ``bytes_to_limbs`` (raw: flat uint8, N*32)."""
    from ..fields.spec import LIMB_BITS, MASK, NLIMBS
    n = raw.size // 32
    out = np.empty((NLIMBS, n), np.int32)
    b = raw.reshape(n, 32).astype(np.int64)
    for l in range(NLIMBS):
        bitpos = LIMB_BITS * l
        j, off = bitpos // 8, bitpos % 8
        v = b[:, j] >> off
        if j + 1 < 32:
            v |= b[:, j + 1] << (8 - off)
        if j + 2 < 32:
            v |= b[:, j + 2] << (16 - off)
        out[l] = (v & MASK).astype(np.int32)
    return out


def _np_limbs_to_bytes(limbs: np.ndarray) -> np.ndarray:
    """Pure-NumPy reference for ``limbs_to_bytes``."""
    from ..fields.spec import LIMB_BITS, NLIMBS
    n = limbs.shape[1]
    acc = np.zeros((n, 34), np.uint16)  # 2 spare bytes for the top shift
    for l in range(NLIMBS):
        bitpos = LIMB_BITS * l
        j, off = bitpos // 8, bitpos % 8
        v = limbs[l].astype(np.uint32) << off
        acc[:, j] |= (v & 0xFF).astype(np.uint16)
        acc[:, j + 1] |= ((v >> 8) & 0xFF).astype(np.uint16)
        acc[:, j + 2] |= ((v >> 16) & 0xFF).astype(np.uint16)
    return acc[:, :32].astype(np.uint8)


def bytes_to_limbs(data: bytes | np.ndarray) -> np.ndarray:
    """N*32 little-endian bytes -> (NLIMBS, N) int32 limb plane (standard
    form, not Montgomery; radix 2^13, 20 limbs)."""
    from ..fields.spec import NLIMBS
    raw = np.frombuffer(data, np.uint8) if isinstance(data, bytes) \
        else np.ascontiguousarray(data, np.uint8).reshape(-1)
    assert raw.size % 32 == 0
    n = raw.size // 32
    lib = _load()
    if lib is None:
        return _np_bytes_to_limbs(raw)
    out = np.empty((NLIMBS, n), np.int32)
    lib.jj_bytes_to_limbs(raw.ctypes.data, out.ctypes.data, n)
    return out


def limbs_to_bytes(limbs: np.ndarray) -> np.ndarray:
    """(NLIMBS, N) int32 limb plane -> (N, 32) uint8 little-endian."""
    from ..fields.spec import NLIMBS
    limbs = np.ascontiguousarray(limbs, np.int32)
    assert limbs.shape[0] == NLIMBS
    n = limbs.shape[1]
    lib = _load()
    if lib is None:
        return _np_limbs_to_bytes(limbs)
    out = np.empty((n, 32), np.uint8)
    lib.jj_limbs_to_bytes(limbs.ctypes.data, out.ctypes.data, n)
    return out


def ints_to_limbs(vals: list[int]) -> np.ndarray:
    """Host ints (< 2^256) -> (NLIMBS, len) int32 limb plane.

    The bulk path behind the fixed-base table builders: one bytes blob, one
    codec call, instead of len(vals) Python-level ``int_to_limbs`` loops."""
    raw = b"".join(v.to_bytes(32, "little") for v in vals)
    return bytes_to_limbs(raw)


def xorshift_bytes(seed: bytes, nbytes: int) -> bytes:
    """Deterministic xorshift128 stream, bit-exact with the reference's
    rand_xorshift (tests/common.rs:7-9)."""
    assert len(seed) == 16
    state = np.frombuffer(seed, np.uint32).copy()
    lib = _load()
    if lib is not None:
        out = np.empty(nbytes, np.uint8)
        lib.jj_xorshift_fill(state.ctypes.data, out.ctypes.data, nbytes)
        return out.tobytes()
    from ..oracle import XorShiftRng
    return XorShiftRng(seed).fill_bytes(nbytes)
