#include "md5.h"

#include <cstring>

namespace folve {
namespace {

// Per-round shift amounts and sine-derived constants (RFC 1321).
constexpr int kShift[64] = {
    7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
    5, 9,  14, 20, 5, 9,  14, 20, 5, 9,  14, 20, 5, 9,  14, 20,
    4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
    6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21};

constexpr uint32_t kSine[64] = {
    0xd76aa478, 0xe8c7b756, 0x242070db, 0xc1bdceee, 0xf57c0faf, 0x4787c62a,
    0xa8304613, 0xfd469501, 0x698098d8, 0x8b44f7af, 0xffff5bb1, 0x895cd7be,
    0x6b901122, 0xfd987193, 0xa679438e, 0x49b40821, 0xf61e2562, 0xc040b340,
    0x265e5a51, 0xe9b6c7aa, 0xd62f105d, 0x02441453, 0xd8a1e681, 0xe7d3fbc8,
    0x21e1cde6, 0xc33707d6, 0xf4d50d87, 0x455a14ed, 0xa9e3e905, 0xfcefa3f8,
    0x676f02d9, 0x8d2a4c8a, 0xfffa3942, 0x8771f681, 0x6d9d6122, 0xfde5380c,
    0xa4beea44, 0x4bdecfa9, 0xf6bb4b60, 0xbebfbc70, 0x289b7ec6, 0xeaa127fa,
    0xd4ef3085, 0x04881d05, 0xd9d4d039, 0xe6db99e5, 0x1fa27cf8, 0xc4ac5665,
    0xf4292244, 0x432aff97, 0xab9423a7, 0xfc93a039, 0x655b59c3, 0x8f0ccc92,
    0xffeff47d, 0x85845dd1, 0x6fa87e4f, 0xfe2ce6e0, 0xa3014314, 0x4e0811a1,
    0xf7537e82, 0xbd3af235, 0x2ad7d2bb, 0xeb86d391};

inline uint32_t Rotl(uint32_t x, int s) { return (x << s) | (x >> (32 - s)); }

}  // namespace

void MD5::Block(const uint8_t* p) {
  uint32_t m[16];
#if defined(__BYTE_ORDER__) && __BYTE_ORDER__ == __ORDER_LITTLE_ENDIAN__
  memcpy(m, p, 64);  // MD5 message words are little-endian
#else
  for (int i = 0; i < 16; i++) {
    m[i] = (uint32_t)p[4 * i] | ((uint32_t)p[4 * i + 1] << 8) |
           ((uint32_t)p[4 * i + 2] << 16) | ((uint32_t)p[4 * i + 3] << 24);
  }
#endif
  uint32_t A = a, B = b, C = c, D = d;
  // Fully unrolled rounds: the rolled loop's per-iteration round
  // selection and register rotation cost ~2x on the encoder's MD5 pass.
  // F/G use the mux form (one op shorter than the (x&y)|(~x&z) form).
#define MD5_STEP(fexpr, A, B, C, D, i, g)             \
  A += (fexpr) + kSine[i] + m[g];                     \
  A = Rotl(A, kShift[i]) + B;
#define MD5_F(B, C, D) (D ^ (B & (C ^ D)))
#define MD5_G(B, C, D) (C ^ (D & (B ^ C)))
#define MD5_H(B, C, D) (B ^ C ^ D)
#define MD5_I(B, C, D) (C ^ (B | ~D))
  for (int i = 0; i < 16; i += 4) {
    MD5_STEP(MD5_F(B, C, D), A, B, C, D, i + 0, i + 0)
    MD5_STEP(MD5_F(A, B, C), D, A, B, C, i + 1, i + 1)
    MD5_STEP(MD5_F(D, A, B), C, D, A, B, i + 2, i + 2)
    MD5_STEP(MD5_F(C, D, A), B, C, D, A, i + 3, i + 3)
  }
  for (int i = 16; i < 32; i += 4) {
    MD5_STEP(MD5_G(B, C, D), A, B, C, D, i + 0, (5 * (i + 0) + 1) & 15)
    MD5_STEP(MD5_G(A, B, C), D, A, B, C, i + 1, (5 * (i + 1) + 1) & 15)
    MD5_STEP(MD5_G(D, A, B), C, D, A, B, i + 2, (5 * (i + 2) + 1) & 15)
    MD5_STEP(MD5_G(C, D, A), B, C, D, A, i + 3, (5 * (i + 3) + 1) & 15)
  }
  for (int i = 32; i < 48; i += 4) {
    MD5_STEP(MD5_H(B, C, D), A, B, C, D, i + 0, (3 * (i + 0) + 5) & 15)
    MD5_STEP(MD5_H(A, B, C), D, A, B, C, i + 1, (3 * (i + 1) + 5) & 15)
    MD5_STEP(MD5_H(D, A, B), C, D, A, B, i + 2, (3 * (i + 2) + 5) & 15)
    MD5_STEP(MD5_H(C, D, A), B, C, D, A, i + 3, (3 * (i + 3) + 5) & 15)
  }
  for (int i = 48; i < 64; i += 4) {
    MD5_STEP(MD5_I(B, C, D), A, B, C, D, i + 0, (7 * (i + 0)) & 15)
    MD5_STEP(MD5_I(A, B, C), D, A, B, C, i + 1, (7 * (i + 1)) & 15)
    MD5_STEP(MD5_I(D, A, B), C, D, A, B, i + 2, (7 * (i + 2)) & 15)
    MD5_STEP(MD5_I(C, D, A), B, C, D, A, i + 3, (7 * (i + 3)) & 15)
  }
#undef MD5_STEP
#undef MD5_F
#undef MD5_G
#undef MD5_H
#undef MD5_I
  a += A;
  b += B;
  c += C;
  d += D;
}

void MD5::Update(const uint8_t* data, size_t len) {
  total_len += len;
  if (buffered) {
    size_t need = 64 - buffered;
    size_t take = len < need ? len : need;
    memcpy(buffer + buffered, data, take);
    buffered += take;
    data += take;
    len -= take;
    if (buffered == 64) {
      Block(buffer);
      buffered = 0;
    }
  }
  while (len >= 64) {
    Block(data);
    data += 64;
    len -= 64;
  }
  if (len) {
    memcpy(buffer, data, len);
    buffered = len;
  }
}

void MD5::Final(uint8_t digest[16]) {
  uint64_t bit_len = total_len * 8;
  uint8_t pad[72] = {0x80};
  size_t pad_len = (buffered < 56) ? (56 - buffered) : (120 - buffered);
  Update(pad, pad_len);
  uint8_t len_le[8];
  for (int i = 0; i < 8; i++) len_le[i] = (uint8_t)(bit_len >> (8 * i));
  Update(len_le, 8);
  uint32_t out[4] = {a, b, c, d};
  for (int i = 0; i < 4; i++) {
    digest[4 * i] = (uint8_t)(out[i]);
    digest[4 * i + 1] = (uint8_t)(out[i] >> 8);
    digest[4 * i + 2] = (uint8_t)(out[i] >> 16);
    digest[4 * i + 3] = (uint8_t)(out[i] >> 24);
  }
}

}  // namespace folve
