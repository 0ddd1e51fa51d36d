// Shared Opus entropy decoder (RFC 6716 section 4.1) — used by the
// CELT (celt_codec.cc) and SILK (silk_codec.cc) decoders.
#ifndef FOLVE_OPUS_SHARED_H_
#define FOLVE_OPUS_SHARED_H_

#include <cstdint>

namespace folve_opus {

// ---------------------------------------------------------------------------
// Range decoder (RFC 6716 section 4.1).

struct EcDec {
  const uint8_t* buf;
  uint32_t storage;
  uint32_t end_offs;     // raw bits consumed from the back
  uint32_t end_window;
  int nend_bits;
  int nbits_total;
  uint32_t offs;
  uint32_t rng;
  uint32_t val;
  uint32_t ext;
  int rem;
  int error;

  static constexpr uint32_t kCodeTop = 1u << 31;
  static constexpr uint32_t kCodeBot = 1u << 23;

  int ReadByte() { return offs < storage ? buf[offs++] : 0; }
  int ReadByteFromEnd() {
    return end_offs < storage ? buf[storage - ++end_offs] : 0;
  }

  void Normalize() {
    while (rng <= kCodeBot) {
      nbits_total += 8;
      rng <<= 8;
      int sym = rem;
      rem = ReadByte();
      sym = ((sym << 8) | rem) >> 1;
      val = ((val << 8) + (0xFF & ~sym)) & (kCodeTop - 1);
    }
  }

  void Init(const uint8_t* data, uint32_t len) {
    buf = data;
    storage = len;
    end_offs = 0;
    end_window = 0;
    nend_bits = 0;
    nbits_total = 33 - 24;  // EC_CODE_BITS+1 - 3*EC_SYM_BITS
    offs = 0;
    rng = 1u << 7;
    rem = ReadByte();
    val = rng - 1 - (uint32_t)(rem >> 1);
    error = 0;
    Normalize();
  }

  uint32_t Decode(uint32_t ft) {
    ext = rng / ft;
    uint32_t s = val / ext;
    return ft - (s + 1 < ft ? s + 1 : ft);
  }

  void Update(uint32_t fl, uint32_t fh, uint32_t ft) {
    uint32_t s = ext * (ft - fh);
    val -= s;
    rng = fl > 0 ? ext * (fh - fl) : rng - s;
    Normalize();
  }

  int DecodeBitLogp(unsigned logp) {
    uint32_t r = rng;
    uint32_t d = val;
    uint32_t s = r >> logp;
    int ret = d < s;
    if (!ret) val = d - s;
    rng = ret ? s : r - s;
    Normalize();
    return ret;
  }

  int DecodeIcdf(const uint8_t* icdf, unsigned ftb) {
    uint32_t s = rng;
    uint32_t d = val;
    uint32_t r = s >> ftb;
    int ret = -1;
    uint32_t t;
    do {
      t = s;
      s = r * icdf[++ret];
    } while (d < s);
    val = d - s;
    rng = t - s;
    Normalize();
    return ret;
  }

  static int Ilog(uint32_t v) {
    int r = 0;
    while (v) {
      ++r;
      v >>= 1;
    }
    return r;
  }

  uint32_t DecodeBits(int bits) {
    uint32_t window = end_window;
    int available = nend_bits;
    if (available < bits) {
      do {
        window |= (uint32_t)ReadByteFromEnd() << available;
        available += 8;
      } while (available <= 32 - 8);
    }
    uint32_t ret = window & ((1u << bits) - 1);
    window >>= bits;
    available -= bits;
    end_window = window;
    nend_bits = available;
    nbits_total += bits;
    return ret;
  }

  uint32_t DecodeUint(uint32_t ft) {
    // ft > 1
    int ftb = Ilog(ft - 1);
    if (ftb > 8) {
      ftb -= 8;
      uint32_t ft1 = ((ft - 1) >> ftb) + 1;
      uint32_t s = Decode(ft1);
      Update(s, s + 1, ft1);
      uint32_t t = (s << ftb) | DecodeBits(ftb);
      if (t <= ft - 1) return t;
      error = 1;
      return ft - 1;
    }
    uint32_t s = Decode(ft);
    Update(s, s + 1, ft);
    return s;
  }

  int Tell() const { return nbits_total - Ilog(rng); }

  int TellFrac() const {
    // Q3 bit usage (RFC 6716 sec 4.1.6.1).
    static const unsigned correction[8] = {35733, 38967, 42495, 46340,
                                           50535, 55109, 60097, 65535};
    int nbits = nbits_total << 3;
    int l = Ilog(rng);
    unsigned r = rng >> (l - 16);
    unsigned b = (r >> 12) - 8;
    b += r > correction[b];
    l = (l << 3) + b;
    return nbits - l;
  }
};


}  // namespace folve_opus

#endif  // FOLVE_OPUS_SHARED_H_
