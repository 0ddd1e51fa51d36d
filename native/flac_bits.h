// Bit-level IO + CRCs for the FLAC codec.
#pragma once
#include <cstddef>
#include <cstdint>
#include <cstring>
#include <vector>

namespace folve {

// CRC-8, polynomial x^8+x^2+x+1 (0x07), init 0 — FLAC frame headers.
uint8_t Crc8(const uint8_t* data, size_t len);
// CRC-16, polynomial x^16+x^15+x^2+1 (0x8005), init 0 — FLAC frames.
uint16_t Crc16(const uint8_t* data, size_t len);

// MSB-first bit reader over a memory buffer.
class BitReader {
 public:
  BitReader(const uint8_t* data, size_t len) : data_(data), len_(len) {}

  bool ok() const { return !error_; }
  size_t byte_pos() const { return pos_; }
  int bit_offset() const { return bit_; }
  bool aligned() const { return bit_ == 0; }
  bool AtEnd() const { return pos_ >= len_ && bit_ == 0; }

  void SeekByte(size_t pos) {
    pos_ = pos;
    bit_ = 0;
    error_ = false;
  }

  // Read up to 32 bits MSB-first.
  uint32_t ReadBits(int n) {
    uint32_t v = 0;
    while (n > 0) {
      if (pos_ >= len_) {
        error_ = true;
        return 0;
      }
      int avail = 8 - bit_;
      int take = n < avail ? n : avail;
      uint32_t chunk = (data_[pos_] >> (avail - take)) & ((1u << take) - 1);
      v = (v << take) | chunk;
      bit_ += take;
      if (bit_ == 8) {
        bit_ = 0;
        pos_++;
      }
      n -= take;
    }
    return v;
  }

  uint64_t ReadBits64(int n) {
    uint64_t v = 0;
    if (n > 32) {
      v = ReadBits(n - 32);
      v <<= 32;
      v |= ReadBits(32);
    } else {
      v = ReadBits(n);
    }
    return v;
  }

  int32_t ReadSigned(int n) {
    uint32_t v = ReadBits(n);
    if (n == 0) return 0;
    uint32_t sign = 1u << (n - 1);
    return (int32_t)((v ^ sign) - sign);
  }

  // Count zero bits until (and consuming) the terminating 1 bit.
  uint32_t ReadUnary() {
    uint32_t q = 0;
    for (;;) {
      if (pos_ >= len_) {
        error_ = true;
        return 0;
      }
      uint8_t cur = data_[pos_] & (0xFFu >> bit_);
      if (cur == 0) {
        q += 8 - bit_;
        bit_ = 0;
        pos_++;
        continue;
      }
      // Highest set bit within the remaining bits of this byte.
      int hi = 31 - __builtin_clz((uint32_t)cur);  // bit index from LSB
      int bitpos = 7 - hi;                         // from MSB
      q += bitpos - bit_;
      bit_ = bitpos + 1;
      if (bit_ == 8) {
        bit_ = 0;
        pos_++;
      }
      return q;
    }
  }

  void AlignToByte() {
    if (bit_) {
      bit_ = 0;
      pos_++;
    }
  }

  void SeekBitPos(size_t bitpos) {
    pos_ = bitpos / 8;
    bit_ = (int)(bitpos % 8);
  }

  size_t bit_pos() const { return pos_ * 8 + bit_; }

  void set_error() { error_ = true; }

 private:
  const uint8_t* data_;
  size_t len_;
  size_t pos_ = 0;
  int bit_ = 0;
  bool error_ = false;
};

// 64-bit-cached MSB-first reader for hot loops (the FLAC residual
// decode).  Borrow() from a BitReader, read, then Restore() the
// position back — byte-at-a-time BitReader semantics are preserved at
// the boundaries.
class FastBits {
 public:
  FastBits(const uint8_t* data, size_t len) : data_(data), len_(len) {}

  void Borrow(const BitReader& br) {
    pos_ = br.byte_pos();
    acc_ = 0;
    nacc_ = 0;
    error_ = !br.ok();
    int skip = br.bit_offset();
    if (skip) {
      Fill();
      if (nacc_ >= skip) {
        nacc_ -= skip;
      } else {
        error_ = true;
        nacc_ = 0;
      }
    }
  }

  void Restore(BitReader& br) const {
    if (error_)
      br.set_error();
    else
      br.SeekBitPos(pos_ * 8 - (size_t)nacc_);
  }

  bool ok() const { return !error_; }

  inline void Fill() {
    while (nacc_ <= 56 && pos_ < len_) {
      acc_ = (acc_ << 8) | data_[pos_++];
      nacc_ += 8;
    }
  }

  // n in [0, 32]
  inline uint32_t ReadBits(int n) {
    if (n == 0) return 0;
    if (nacc_ < n) {
      Fill();
      if (nacc_ < n) {
        error_ = true;
        nacc_ = 0;
        return 0;
      }
    }
    nacc_ -= n;
    return (uint32_t)((acc_ >> nacc_) & ((n >= 64 ? 0 : (1ull << n)) - 1));
  }

  inline int32_t ReadSigned(int n) {
    uint32_t v = ReadBits(n);
    if (n == 0) return 0;
    uint32_t sign = 1u << (n - 1);
    return (int32_t)((v ^ sign) - sign);
  }

  inline uint32_t ReadUnary() {
    uint32_t q = 0;
    for (;;) {
      if (nacc_ == 0) {
        Fill();
        if (nacc_ == 0) {
          error_ = true;
          return 0;
        }
      }
      uint64_t window = acc_ << (64 - nacc_);
      if (window == 0) {
        q += nacc_;
        nacc_ = 0;
        continue;
      }
      int lz = __builtin_clzll(window);
      q += lz;
      nacc_ -= lz + 1;
      return q;
    }
  }

 private:
  const uint8_t* data_;
  size_t len_;
  size_t pos_ = 0;
  uint64_t acc_ = 0;
  int nacc_ = 0;
  bool error_ = false;
};

// MSB-first bit writer appending to a byte vector.  A 64-bit
// accumulator drains in aligned 32-bit big-endian stores into an
// oversized buffer (the encoder's hottest loop) — call Sync() before
// reading the vector mid-stream and Finish() when done; both trim the
// vector to exactly the bytes written so far.
class BitWriter {
 public:
  explicit BitWriter(std::vector<uint8_t>* out)
      : out_(out), pos_(out->size()) {}

  // n in [0, 32]; only the low n bits of v are used.
  inline void WriteBits(uint32_t v, int n) {
    if (n == 0) return;
    acc_ = (acc_ << n) | (uint64_t)(n >= 32 ? v : (v & ((1u << n) - 1)));
    nbits_ += n;
    if (nbits_ >= 32) Drain32();
  }

  void WriteBits64(uint64_t v, int n) {
    if (n > 32) {
      WriteBits((uint32_t)(v >> 32), n - 32);
      WriteBits((uint32_t)v, 32);
    } else {
      WriteBits((uint32_t)v, n);
    }
  }

  void WriteSigned(int32_t v, int n) { WriteBits(((uint32_t)v) & ((n == 32) ? 0xFFFFFFFFu : ((1u << n) - 1)), n); }

  void WriteUnary(uint32_t q) {
    while (q >= 31) {
      WriteBits(0, 31);
      q -= 31;
    }
    WriteBits(1, (int)q + 1);
  }

  // One Rice codeword: q = folded>>k zero bits, a 1, then the k low
  // bits — merged into a single accumulator push when it fits (the
  // overwhelmingly common case), instead of a unary + a bits call.
  inline void WriteRice(uint64_t folded, uint32_t k) {
    uint32_t q = (uint32_t)(folded >> k);
    uint32_t total = q + 1 + k;
    if (total <= 32) {
      WriteBits((uint32_t)((1ull << k) | (folded & ((1ull << k) - 1))),
                (int)total);
    } else {
      WriteUnary(q);
      if (k) WriteBits((uint32_t)(folded & ((1ull << k) - 1)), (int)k);
    }
  }

  void AlignToByte() {
    if (nbits_ & 7) WriteBits(0, 8 - (nbits_ & 7));
  }

  bool aligned() const { return (nbits_ & 7) == 0; }

  // Pre-size the buffer so the common case never regrows (each grow
  // zero-fills, which showed up hard in encoder profiles).
  void Reserve(size_t bytes) { Ensure(bytes); }

  // Drain whole accumulated bytes into the buffer WITHOUT trimming it
  // (trimming mid-stream would throw away the reserve); after this,
  // bytes [0, byte_pos()) are valid — e.g. for mid-stream CRCs.
  void FlushBytes() {
    while (nbits_ >= 8) {
      nbits_ -= 8;
      Ensure(1);
      (*out_)[pos_++] = (uint8_t)(acc_ >> nbits_);
    }
  }

  size_t byte_pos() const { return pos_; }

  // Flush and trim the vector to the exact byte count (partial
  // trailing bits stay in the accumulator).
  void Sync() {
    FlushBytes();
    out_->resize(pos_);
  }

  // Final trim; requires byte alignment (AlignToByte first).
  void Finish() { Sync(); }

 private:
  inline void Drain32() {
    nbits_ -= 32;
    uint32_t w = (uint32_t)(acc_ >> nbits_);
    Ensure(4);
    uint32_t be = __builtin_bswap32(w);
    memcpy(out_->data() + pos_, &be, 4);
    pos_ += 4;
  }

  inline void Ensure(size_t bytes) {
    if (pos_ + bytes > out_->size())
      out_->resize(out_->size() + (out_->size() >> 1) + bytes + 256);
  }

  std::vector<uint8_t>* out_;
  size_t pos_ = 0;
  uint64_t acc_ = 0;
  int nbits_ = 0;
};

}  // namespace folve
