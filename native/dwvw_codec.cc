// DWVW (Delta Word Variable Width) codec — decoder and encoder.
//
// The reference convolves AIFC files carrying the TX16W/Typhoon DWVW
// compression at 12/16/24-bit depths via libsndfile's probe
// (convolve-file-handler.cc:62-76), and writes DWVW back out for AIFC
// inputs (output format = input format, convolve-file-handler.cc:249-251).
//
// This is an independent implementation of the bitstream, recovered
// behaviorally against the oracle decoder with crafted bit vectors and
// validated sample-exact on oracle-encoded streams (tests/test_dwvw.py).
// The scheme, per sample (MSB-first bit order):
//
//   1. Width delta: unary run of 0-bits terminated by a 1 (the run is
//      capped at bit_width/2 — at the cap no terminator follows), then
//      a sign bit if the run was non-zero.  The word width moves by
//      the signed run length, wrapping modulo bit_width.
//   2. If the width w is non-zero: magnitude = an implicit leading 1
//      bit followed by w-1 explicit bits, then a sign bit.
//      Special case: at w == bit_width-1 with an all-ones magnitude,
//      one extra bit follows; if set the delta is the most-negative
//      value -(1 << (bit_width-1)) (sign bit is moot mod 2^bit_width).
//   3. The sample is the previous sample plus the delta, wrapped to
//      bit_width-bit two's complement.  Width 0 encodes delta 0 with
//      no further bits.
//
// There is no framing: state (width + previous sample) spans the whole
// stream, so seeking requires decode-from-start (the Python side
// handles that, folve_tpu/audio/dwvw.py).  Mono only, as in the
// reference's libsndfile.

#include <cstdint>
#include <cstring>
#include <new>
#include <vector>

namespace folve_dwvw {

struct Decoder {
  int bw;           // bit width: 12, 16 or 24
  int w = 0;        // current word width
  int32_t last = 0; // previous sample (two's complement at bw bits)
  // Bit reservoir: bytes not yet fully consumed.
  std::vector<uint8_t> buf;
  uint64_t bitpos = 0;  // consumed bits within buf

  void Reset() {
    w = 0;
    last = 0;
    buf.clear();
    bitpos = 0;
  }

  // Reads n bits MSB-first at pos; true on success.
  bool Read(uint64_t* pos, int n, uint32_t* out) const {
    if (*pos + (uint64_t)n > buf.size() * 8) return false;
    uint32_t v = 0;
    for (int i = 0; i < n; ++i) {
      v = (v << 1) | ((buf[*pos >> 3] >> (7 - (*pos & 7))) & 1);
      ++*pos;
    }
    *out = v;
    return true;
  }

  // Decode as many samples as the reservoir allows, up to max_out.
  // Stops cleanly before a sample whose code is incomplete.
  int64_t Decode(int32_t* out, int64_t max_out) {
    const int half = bw / 2;
    const uint32_t mask = ((uint32_t)1 << bw) - 1;
    const int32_t sign_ext = (int32_t)1 << (bw - 1);
    int64_t n = 0;
    while (n < max_out) {
      // Nothing mutates decoder state until the sample's full code has
      // been read — a partial code at the reservoir boundary must be
      // re-decoded from scratch on the next call.
      uint64_t pos = bitpos;
      // 1. width delta
      int run = 0;
      uint32_t bit;
      while (run < half) {
        if (!Read(&pos, 1, &bit)) goto done;
        if (bit) break;
        ++run;
      }
      {
        int neww = w;
        if (run > 0) {
          if (!Read(&pos, 1, &bit)) goto done;
          int dwm = bit ? -run : run;
          neww = ((neww + dwm) % bw + bw) % bw;
        }
        // 2. delta
        int32_t delta = 0;
        if (neww > 0) {
          uint32_t extra = 0;
          if (neww > 1 && !Read(&pos, neww - 1, &extra)) goto done;
          uint32_t mag = ((uint32_t)1 << (neww - 1)) | extra;
          if (!Read(&pos, 1, &bit)) goto done;
          delta = bit ? -(int32_t)mag : (int32_t)mag;
          if (neww == bw - 1 && mag == ((uint32_t)1 << (bw - 1)) - 1) {
            if (!Read(&pos, 1, &bit)) goto done;
            if (bit) delta = -((int32_t)1 << (bw - 1));
          }
        }
        w = neww;
        uint32_t v = ((uint32_t)last + (uint32_t)delta) & mask;
        last = (int32_t)v - (int32_t)((v & (uint32_t)sign_ext) << 1);
      }
      bitpos = pos;
      out[n++] = last;
    }
  done:
    // Compact the reservoir: drop fully-consumed bytes.
    uint64_t drop = bitpos >> 3;
    if (drop > 0) {
      buf.erase(buf.begin(), buf.begin() + (size_t)drop);
      bitpos -= drop * 8;
    }
    return n;
  }
};

struct Encoder {
  int bw;
  int w = 0;
  int32_t last = 0;
  uint32_t acc = 0;  // bit accumulator (MSB-first), bits count below
  int nacc = 0;
  std::vector<uint8_t> out;

  void Put(uint32_t bits, int n) {
    for (int i = n - 1; i >= 0; --i) {
      acc = (acc << 1) | ((bits >> i) & 1);
      if (++nacc == 8) {
        out.push_back((uint8_t)acc);
        acc = 0;
        nacc = 0;
      }
    }
  }

  void Encode(const int32_t* in, int64_t n) {
    const int half = bw / 2;
    const uint32_t mask = ((uint32_t)1 << bw) - 1;
    const int32_t most_neg = -((int32_t)1 << (bw - 1));
    for (int64_t i = 0; i < n; ++i) {
      uint32_t dv = ((uint32_t)in[i] - (uint32_t)last) & mask;
      // delta in two's complement at bw bits
      int32_t delta = (int32_t)dv - (int32_t)((dv & ((uint32_t)1 << (bw - 1))) << 1);
      last = in[i];
      uint32_t mag;
      bool neg, extreme = false;
      if (delta == most_neg) {
        // expressible only via the max-width escape
        mag = ((uint32_t)1 << (bw - 1)) - 1;
        neg = false;
        extreme = true;
      } else {
        neg = delta < 0;
        mag = (uint32_t)(neg ? -delta : delta);
      }
      int width = 0;
      while (((uint32_t)1 << width) <= mag && width < bw) ++width;
      // width move, shortest direction mod bw
      int dwm = ((width - w) % bw + bw) % bw;  // 0..bw-1 forward
      if (dwm > bw / 2) dwm -= bw;             // prefer the short way
      int run = dwm < 0 ? -dwm : dwm;
      // unary zeros; terminator unless the run hits the cap
      for (int z = 0; z < run; ++z) Put(0, 1);
      if (run < half) Put(1, 1);
      if (run > 0) Put(dwm < 0 ? 1 : 0, 1);
      w = width;
      if (w > 0) {
        if (w > 1) Put(mag & (((uint32_t)1 << (w - 1)) - 1), w - 1);
        Put(neg ? 1 : 0, 1);
        if (w == bw - 1 && mag == ((uint32_t)1 << (bw - 1)) - 1)
          Put(extreme ? 1 : 0, 1);
      }
    }
  }

  void Flush() {
    // Pad the final byte with 1-bits (zero-delta codes at width 0;
    // readers cap output at the declared frame count regardless).
    while (nacc != 0) Put(1, 1);
  }
};

}  // namespace folve_dwvw

extern "C" {

void* folve_dwvw_create(int bit_width) {
  if (bit_width != 12 && bit_width != 16 && bit_width != 24) return nullptr;
  auto* d = new (std::nothrow) folve_dwvw::Decoder;
  if (d) d->bw = bit_width;
  return d;
}

void folve_dwvw_reset(void* h) {
  static_cast<folve_dwvw::Decoder*>(h)->Reset();
}

void folve_dwvw_close(void* h) {
  delete static_cast<folve_dwvw::Decoder*>(h);
}

// Append input bytes to the decoder's reservoir, then decode up to
// max_out samples into out.  Returns the number of samples decoded
// (the reservoir keeps any trailing partial code for the next call).
int64_t folve_dwvw_decode(void* h, const uint8_t* data, uint64_t nbytes,
                          int32_t* out, int64_t max_out) {
  auto* d = static_cast<folve_dwvw::Decoder*>(h);
  if (nbytes > 0) d->buf.insert(d->buf.end(), data, data + nbytes);
  return d->Decode(out, max_out);
}

void* folve_dwvw_enc_create(int bit_width) {
  if (bit_width != 12 && bit_width != 16 && bit_width != 24) return nullptr;
  auto* e = new (std::nothrow) folve_dwvw::Encoder;
  if (e) e->bw = bit_width;
  return e;
}

void folve_dwvw_enc_close(void* h) {
  delete static_cast<folve_dwvw::Encoder*>(h);
}

// Encode n samples; if flush != 0, pad to a byte boundary afterwards.
// Returns the number of whole bytes available, copied into out (the
// caller sizes out generously: <= n * (bw + 10) / 8 + 8 bytes).
int64_t folve_dwvw_encode(void* h, const int32_t* in, int64_t n,
                          int flush, uint8_t* out, int64_t out_cap) {
  auto* e = static_cast<folve_dwvw::Encoder*>(h);
  e->Encode(in, n);
  if (flush) e->Flush();
  int64_t avail = (int64_t)e->out.size();
  if (avail > out_cap) avail = out_cap;
  if (avail > 0) {
    std::memcpy(out, e->out.data(), (size_t)avail);
    e->out.erase(e->out.begin(), e->out.begin() + (size_t)avail);
  }
  return avail;
}

}  // extern "C"
