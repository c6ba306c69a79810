"""Point encoding tests: golden vectors, ZIP-216 matrix, batched decode.

Mirrors test_serialization_consistency (/root/reference/src/lib.rs:1806-1890)
with the SAME 16 golden 32-byte vectors, and test_zip_216 (lib.rs:1892-1934)
with the same two non-canonical encodings.
"""

import numpy as np
import jax.numpy as jnp

from jubjub_tpu import oracle
from jubjub_tpu.fields import Fq, Fr
from jubjub_tpu.curve import (AffinePoint, SubgroupPoint, batch_normalize,
                              mul_extended, subgroup_generator)

from helpers import aff_ints, bytes_to_arr

# The 16 golden serializations of [i+1]G8, G8 = full generator * cofactor
# (test data from /root/reference/src/lib.rs:1811-1876).
GOLDEN = [bytes(v) for v in [
    [203, 85, 12, 213, 56, 234, 12, 193, 19, 132, 128, 64, 142, 110, 170, 185,
     179, 108, 97, 63, 13, 211, 247, 120, 79, 219, 110, 234, 131, 123, 19, 215],
    [113, 154, 240, 230, 224, 198, 208, 170, 104, 15, 59, 126, 151, 222, 233,
     195, 203, 195, 167, 129, 89, 121, 240, 142, 51, 166, 64, 250, 184, 202, 154, 177],
    [197, 41, 93, 209, 203, 55, 164, 174, 88, 0, 90, 199, 1, 156, 149, 141,
     240, 29, 14, 82, 86, 225, 126, 129, 186, 157, 148, 162, 219, 51, 156, 199],
    [182, 117, 250, 241, 81, 196, 199, 227, 151, 74, 243, 17, 221, 97, 200,
     139, 192, 83, 231, 35, 214, 14, 95, 69, 130, 201, 4, 116, 177, 19, 179, 0],
    [118, 41, 29, 200, 60, 189, 119, 252, 78, 40, 230, 18, 208, 221, 38, 214,
     176, 250, 4, 10, 77, 101, 26, 216, 193, 198, 226, 84, 25, 177, 230, 185],
    [226, 189, 227, 208, 112, 117, 136, 98, 72, 38, 211, 167, 254, 82, 174,
     113, 112, 166, 138, 171, 166, 113, 52, 251, 129, 197, 138, 45, 195, 7, 61, 140],
    [38, 198, 156, 196, 146, 225, 55, 163, 138, 178, 157, 128, 115, 135, 204,
     215, 0, 33, 171, 20, 60, 32, 142, 209, 33, 233, 125, 146, 207, 12, 16, 24],
    [17, 187, 231, 83, 165, 36, 232, 184, 140, 205, 195, 252, 166, 85, 59, 86,
     3, 226, 211, 67, 179, 29, 238, 181, 102, 142, 58, 63, 57, 89, 174, 138],
    [210, 159, 80, 16, 181, 39, 221, 204, 224, 144, 145, 79, 54, 231, 8, 140,
     142, 216, 93, 190, 183, 116, 174, 63, 33, 242, 177, 118, 148, 40, 241, 203],
    [0, 143, 107, 102, 149, 187, 27, 124, 18, 10, 98, 28, 113, 123, 121, 185,
     29, 152, 14, 130, 149, 28, 87, 35, 135, 135, 153, 54, 112, 53, 54, 68],
    [178, 131, 85, 160, 214, 51, 208, 157, 196, 152, 247, 93, 202, 56, 81,
     239, 155, 122, 59, 188, 237, 253, 11, 169, 208, 236, 12, 4, 163, 211, 88, 97],
    [246, 194, 231, 195, 159, 101, 180, 133, 80, 21, 185, 220, 195, 115, 144,
     12, 90, 150, 44, 117, 8, 156, 168, 248, 206, 41, 60, 82, 67, 75, 57, 67],
    [212, 205, 171, 153, 113, 16, 194, 241, 224, 43, 177, 110, 190, 248, 22,
     201, 208, 166, 2, 83, 134, 130, 85, 129, 166, 136, 185, 191, 163, 38, 54, 10],
    [8, 60, 190, 39, 153, 222, 119, 23, 142, 237, 12, 110, 146, 9, 19, 219,
     143, 64, 161, 99, 199, 77, 39, 148, 70, 213, 246, 227, 150, 178, 237, 178],
    [11, 114, 217, 160, 101, 37, 100, 220, 56, 114, 42, 31, 138, 33, 84, 157,
     214, 167, 73, 233, 115, 81, 124, 134, 15, 31, 181, 60, 184, 130, 175, 159],
    [141, 238, 235, 202, 241, 32, 210, 10, 127, 230, 54, 31, 146, 80, 247, 9,
     107, 124, 0, 26, 203, 16, 237, 34, 214, 147, 133, 15, 29, 236, 37, 88],
]]

# The two non-canonical encodings from test_zip_216 (lib.rs:1893-1907):
# (0, 1) and (0, -1) with the sign bit forced to 1.
NON_CANONICAL = [
    bytes([0x01] + [0] * 30 + [0x80]),
    bytes((oracle.Q - 1).to_bytes(32, "little")[:31] +
          bytes([(oracle.Q - 1).to_bytes(32, "little")[31] | 0x80])),
]


def test_serialization_consistency():
    """Golden vectors + batched round-trip
    (/root/reference/src/lib.rs:1806-1890)."""
    ks = list(range(1, 17))
    pts = mul_extended(subgroup_generator((16,)).to_extended(),
                       Fr.from_int(ks))
    aff = batch_normalize(pts)
    assert np.asarray(aff.is_on_curve()).all()
    ser = np.asarray(aff.to_bytes())
    got = [bytes(ser[:, i]) for i in range(16)]
    assert got == GOLDEN

    # batched decode of the golden vectors round-trips to the same points
    dec, ok = AffinePoint.batch_from_bytes(bytes_to_arr(GOLDEN))
    assert np.asarray(ok).all()
    assert np.asarray(dec == aff).all()


def test_zip_216():
    """(/root/reference/src/lib.rs:1892-1934)."""
    arr = bytes_to_arr(NON_CANONICAL)
    # normal API rejects
    _, ok = AffinePoint.from_bytes(arr)
    assert not np.asarray(ok).any()

    # clearing the sign bit makes them acceptable
    cleared = [bytes(b[:31]) + bytes([b[31] & 0x7F]) for b in NON_CANONICAL]
    _, ok2 = AffinePoint.from_bytes(bytes_to_arr(cleared))
    assert np.asarray(ok2).all()

    # the bug-preserving API accepts, and re-serializes canonically
    parsed, ok3 = AffinePoint.from_bytes_pre_zip216_compatibility(arr)
    assert np.asarray(ok3).all()
    reser = np.asarray(parsed.to_bytes())
    reenc = [bytes(reser[:, i]) for i in range(2)]
    assert all(r != b for r, b in zip(reenc, NON_CANONICAL))
    # setting the sign bit back reproduces the non-canonical encoding
    forced = [bytes(r[:31]) + bytes([r[31] | 0x80]) for r in reenc]
    assert forced == NON_CANONICAL


def test_roundtrip_random_points():
    from jubjub_tpu.curve import random_extended
    import jax
    pts = batch_normalize(random_extended(jax.random.PRNGKey(7), (32,)))
    enc = pts.to_bytes()
    dec, ok = AffinePoint.from_bytes(enc)
    assert np.asarray(ok).all()
    assert np.asarray(dec == pts).all()


def test_reject_non_canonical_v_and_non_square():
    # v >= q must be rejected
    bad_v = bytes_to_arr([oracle.Q.to_bytes(32, "little")])
    _, ok = AffinePoint.from_bytes(bad_v)
    assert not np.asarray(ok).any()
    # find a v whose u^2 is a non-residue: v = 2
    v = 2
    u2 = (v * v - 1) * pow(1 + oracle.EDWARDS_D * v * v, -1, oracle.Q) % oracle.Q
    assert oracle.sqrt_q(u2) is None  # precondition for this vector
    _, ok2 = AffinePoint.from_bytes(bytes_to_arr([v.to_bytes(32, "little")]))
    assert not np.asarray(ok2).any()


def test_group_encoding_subgroup():
    """GroupEncoding for SubgroupPoint: decode + subgroup check
    (/root/reference/src/lib.rs:1407-1454)."""
    sg = SubgroupPoint.generator((1,))
    enc = sg.to_bytes()
    dec, ok = SubgroupPoint.from_bytes(enc)
    assert np.asarray(ok).all()
    assert np.asarray(dec == sg).all()

    # a full-group (non-subgroup) point must fail the subgroup check
    from jubjub_tpu.curve import full_generator
    g = np.asarray(full_generator((1,)).to_bytes())
    _, okf = SubgroupPoint.from_bytes(jnp.asarray(g))
    assert not np.asarray(okf).any()
    # ...but pass from_bytes_unchecked (curve check only)
    _, oku = SubgroupPoint.from_bytes_unchecked(jnp.asarray(g))
    assert np.asarray(oku).all()
