// Host-side native codec: byte <-> limb-plane conversion and the
// deterministic XorShift stream used for test vectors and data loading.
//
// This is the framework's host/native tier (the TPU compute tier is
// Pallas/Mosaic).  The reference crate's equivalent host surface is its
// from_bytes/to_bytes serialization (/root/reference/src/fr.rs:268-343) and
// the rand_xorshift stream its blackbox tests draw from
// (/root/reference/tests/common.rs:7-29).  Converting millions of 32-byte
// encodings to (NLIMBS, N) int32 limb planes in Python is orders of
// magnitude slower than this translation unit.
//
// Layout contract (matches jubjub_tpu.fields.mont):
//   limbs: int32, limb-major, plane shape (20, N): limbs[l*N + i] is limb l
//   of element i; limb l holds bits [13l, 13l+13) of a little-endian
//   256-bit value (radix 2^13, 20 limbs; the top limb carries 9 bits).

#include <cstdint>
#include <cstring>

namespace {
constexpr int kLimbBits = 13;
constexpr int kNLimbs = 20;
constexpr int32_t kMask = (1 << kLimbBits) - 1;
}  // namespace

extern "C" {

// in: N little-endian 32-byte strings (element-major, 32*N bytes)
// out: (20, N) int32 limb plane
void jj_bytes_to_limbs(const uint8_t* in, int32_t* out, int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* e = in + 32 * i;
    for (int64_t l = 0; l < kNLimbs; ++l) {
      int bitpos = kLimbBits * static_cast<int>(l);
      int j = bitpos >> 3, off = bitpos & 7;
      uint32_t v = static_cast<uint32_t>(e[j]) >> off;
      if (j + 1 < 32) v |= static_cast<uint32_t>(e[j + 1]) << (8 - off);
      if (j + 2 < 32) v |= static_cast<uint32_t>(e[j + 2]) << (16 - off);
      out[l * n + i] = static_cast<int32_t>(v & kMask);
    }
  }
}

// inverse of jj_bytes_to_limbs
void jj_limbs_to_bytes(const int32_t* in, uint8_t* out, int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    uint8_t* e = out + 32 * i;
    std::memset(e, 0, 32);
    for (int64_t l = 0; l < kNLimbs; ++l) {
      int bitpos = kLimbBits * static_cast<int>(l);
      int j = bitpos >> 3, off = bitpos & 7;
      uint32_t v = static_cast<uint32_t>(in[l * n + i] & kMask) << off;
      e[j] |= static_cast<uint8_t>(v & 0xFF);
      if (j + 1 < 32) e[j + 1] |= static_cast<uint8_t>((v >> 8) & 0xFF);
      if (j + 2 < 32) e[j + 2] |= static_cast<uint8_t>((v >> 16) & 0xFF);
    }
  }
}

// rand_xorshift::XorShiftRng (xorshift128), bit-exact with
// /root/reference/tests/common.rs's stream. state: {x, y, z, w}.
void jj_xorshift_fill(uint32_t* state, uint8_t* out, int64_t nbytes) {
  uint32_t x = state[0], y = state[1], z = state[2], w = state[3];
  int64_t i = 0;
  while (i < nbytes) {
    uint32_t t = x ^ (x << 11);
    x = y; y = z; z = w;
    w = w ^ (w >> 19) ^ (t ^ (t >> 8));
    int64_t take = nbytes - i < 4 ? nbytes - i : 4;
    for (int64_t b = 0; b < take; ++b) {
      out[i + b] = static_cast<uint8_t>((w >> (8 * b)) & 0xFF);
    }
    i += take;
  }
  state[0] = x; state[1] = y; state[2] = z; state[3] = w;
}

}  // extern "C"
