// MD5 (RFC 1321) — fresh implementation for FLAC STREAMINFO signatures.
// The reference gets this from libFLAC; here it is self-contained.
#pragma once
#include <cstddef>
#include <cstdint>

namespace folve {

struct MD5 {
  uint32_t a = 0x67452301u, b = 0xefcdab89u, c = 0x98badcfeu, d = 0x10325476u;
  uint64_t total_len = 0;
  uint8_t buffer[64];
  size_t buffered = 0;

  void Update(const uint8_t* data, size_t len);
  void Final(uint8_t digest[16]);

 private:
  void Block(const uint8_t* p);
};

}  // namespace folve
