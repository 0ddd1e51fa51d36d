// Apple Lossless (ALAC) decoder, from scratch.
//
// The reference convolves anything libsndfile decodes
// (convolve-file-handler.cc:62-76); libsndfile 1.1 bundles Apple's
// ALAC codec for the CAF 'alac' format.  This is an independent
// implementation of the (publicly documented) bitstream: AAC-style
// channel elements, adaptive-Golomb residuals with a decaying history
// meter and zero-run mode, an adaptive sign-sign LMS FIR predictor,
// stereo mid/side-style mixing (mixBits/mixRes), and the shifted-byte
// side plane for high bit depths.  Semantics were validated
// behaviorally: every intact oracle-encoded stream (16/20/24/32-bit,
// mono+stereo, all frame boundaries) decodes bit-exactly back to the
// encoder's input (tools/alac_probe.py, tests/test_alac.py).
//
// Packets are stateless, so seeking is packet-aligned random access —
// the Python side (folve_tpu/audio/alac.py) drives packets through the
// CAF 'pakt' table.
//
// Note: the bundled libsndfile ENCODER corrupts escape (verbatim)
// frames at 20/24-bit depths (it stores fewer/degraded bits than the
// sample width — its own decoder cannot round-trip them either).  We
// decode the Apple semantics (bitDepth-wide raw samples) and
// short-stop on truncation instead of crashing.

#include <cstdint>
#include <cstring>
#include <new>

namespace folve_alac {

struct BitReader {
  const uint8_t* p;
  uint64_t nbits;
  uint64_t pos = 0;
  bool overrun = false;

  BitReader(const uint8_t* data, uint64_t nbytes)
      : p(data), nbits(nbytes * 8) {}

  uint32_t Read(int n) {
    uint32_t v = 0;
    if (pos + (uint64_t)n > nbits) {
      overrun = true;
      pos = nbits;
      return 0;
    }
    for (int i = 0; i < n; ++i) {
      v = (v << 1) | ((p[pos >> 3] >> (7 - (pos & 7))) & 1);
      ++pos;
    }
    return v;
  }

  int32_t ReadSigned(int n) {
    uint32_t v = Read(n);
    if (n < 32 && (v & (1u << (n - 1)))) return (int32_t)(v - (1u << n));
    return (int32_t)v;
  }

  // Count leading 1-bits (unary prefix), capped by the caller.
  int Unary(int cap) {
    int n = 0;
    while (n < cap) {
      if (pos >= nbits) {
        overrun = true;
        return n;
      }
      if (((p[pos >> 3] >> (7 - (pos & 7))) & 1) == 0) {
        ++pos;
        return n;
      }
      ++pos;
      ++n;
    }
    return n;
  }
};

static inline int log2i(uint32_t x) {  // floor(log2(x)), 0 for x == 0
  int n = 0;
  while (x > 1) {
    x >>= 1;
    ++n;
  }
  return n;
}

// ----------------------------------------------------------- adaptive Golomb

static const int kMaxPrefix = 9;

// Rice-style scalar with modulus m = 2^k - 1 and an escape to a raw
// maxbits read after a 9-long unary prefix.
static uint32_t DynGet(BitReader& br, uint32_t m, int k, int maxbits) {
  int pre = br.Unary(kMaxPrefix);
  if (pre >= kMaxPrefix) return br.Read(maxbits);
  if (k <= 1) return (uint32_t)pre;
  uint32_t v = br.Read(k - 1);
  if (v < 1) return (uint32_t)pre * m;
  uint32_t extra = br.Read(1);
  v = (v << 1) | extra;
  return (uint32_t)pre * m + v - 1;
}

// Entropy-decode npts residuals (history meter + zero-run mode).
static bool DynDecomp(BitReader& br, int32_t* out, int npts, int maxsize,
                      uint32_t mb0, uint32_t pb, int kb) {
  uint32_t mb = mb0;
  int zmode = 0;
  int c = 0;
  while (c < npts) {
    int k = log2i((mb >> 9) + 3);
    if (k > kb) k = kb;
    uint32_t m = (1u << k) - 1;
    uint32_t n = DynGet(br, m, k, maxsize);
    if (br.overrun) return false;
    uint32_t nd = n + (uint32_t)zmode;
    int32_t d = (int32_t)((nd + 1) >> 1);
    out[c++] = (nd & 1) ? -d : d;
    if (nd > 0xFFFF) {
      mb = 0xFFFF;
    } else {
      mb = pb * nd + mb - ((pb * mb) >> 9);
    }
    zmode = 0;
    if (mb < 128 && c < npts) {
      zmode = 1;
      int zk = 7 - log2i(mb) + (int)((mb + 16) >> 6);
      if (zk > kb) zk = kb;
      uint32_t mz = (1u << zk) - 1;
      uint32_t run = DynGet(br, mz, zk, 16);
      if (br.overrun) return false;
      if (c + (int64_t)run > npts) return false;
      std::memset(out + c, 0, run * sizeof(int32_t));
      c += run;
      if (run > 0xFFFF) zmode = 0;
      mb = 0;
    }
  }
  return true;
}

// ------------------------------------------------------- adaptive predictor

static inline int32_t SignExtend(int64_t v, int bits) {
  const int64_t m = 1ll << (bits - 1);
  v &= (1ll << bits) - 1;
  return (int32_t)((v ^ m) - m);
}

static void UnpcBlock(const int32_t* in, int32_t* out, int npts,
                      int16_t* coefs, int num, int denshift, int chanbits) {
  out[0] = in[0];
  if (num == 0) {
    std::memcpy(out, in, npts * sizeof(int32_t));
    return;
  }
  if (num == 31) {  // pure first-order delta
    for (int j = 1; j < npts; ++j)
      out[j] = SignExtend((int64_t)in[j] + out[j - 1], chanbits);
    return;
  }
  const int lim = num + 1;
  for (int j = 1; j < lim && j < npts; ++j)
    out[j] = SignExtend((int64_t)in[j] + out[j - 1], chanbits);
  const int32_t denhalf = denshift > 0 ? (1 << (denshift - 1)) : 0;
  for (int j = lim; j < npts; ++j) {
    const int32_t top = out[j - lim];
    int64_t sum1 = 0;
    for (int i = 0; i < num; ++i)
      sum1 += (int64_t)coefs[i] * (out[j - 1 - i] - top);
    int32_t del = in[j];
    int32_t del0 = del;
    const int32_t val =
        SignExtend((int64_t)del + top + ((sum1 + denhalf) >> denshift),
                   chanbits);
    out[j] = val;
    // sign-sign LMS coefficient adaptation
    if (del > 0) {
      for (int i = num - 1; i >= 0; --i) {
        const int32_t dd = top - out[j - 1 - i];
        const int32_t sgn = (dd > 0) - (dd < 0);
        coefs[i] -= (int16_t)sgn;
        del0 -= (num - i) * ((sgn * dd) >> denshift);
        if (del0 <= 0) break;
      }
    } else if (del < 0) {
      for (int i = num - 1; i >= 0; --i) {
        const int32_t dd = top - out[j - 1 - i];
        const int32_t sgn = (dd > 0) - (dd < 0);
        coefs[i] += (int16_t)sgn;
        del0 -= (num - i) * ((-sgn * dd) >> denshift);
        if (del0 >= 0) break;
      }
    }
  }
}

// --------------------------------------------------------------- decoder

struct Decoder {
  uint32_t frame_length;
  int bit_depth;
  uint32_t pb, mb, kb;
  int channels;
  int32_t* work = nullptr;   // residuals scratch
  int32_t* chan[2] = {nullptr, nullptr};

  ~Decoder() {
    delete[] work;
    delete[] chan[0];
    delete[] chan[1];
  }

  bool Init() {
    work = new (std::nothrow) int32_t[frame_length];
    chan[0] = new (std::nothrow) int32_t[frame_length];
    chan[1] = new (std::nothrow) int32_t[frame_length];
    return work && chan[0] && chan[1];
  }

  // Decode one packet -> interleaved int32 samples at bit_depth scale.
  // Returns frames decoded, or -1 on malformed data.
  int64_t DecodePacket(const uint8_t* pkt, uint64_t nbytes, int32_t* out) {
    BitReader br(pkt, nbytes);
    int out_channels = 0;
    uint32_t num_samples = frame_length;
    while (true) {
      const uint32_t tag = br.Read(3);
      if (br.overrun) return -1;
      if (tag == 7) break;                       // ID_END
      if (tag == 4) {                            // ID_DSE: skip
        br.Read(4);
        const uint32_t align = br.Read(1);
        uint32_t count = br.Read(8);
        if (count == 255) count += br.Read(8);
        if (align) br.pos = (br.pos + 7) & ~7ull;
        br.pos += (uint64_t)count * 8;
        continue;
      }
      if (tag == 6) {                            // ID_FIL: skip
        uint32_t count = br.Read(4);
        if (count == 15) count += br.Read(8) - 1;
        br.pos += (uint64_t)count * 8;
        continue;
      }
      const int nch = (tag == 1) ? 2 : (tag == 0 || tag == 3) ? 1 : -1;
      if (nch < 0) return -1;                    // CCE/PCE unsupported
      if (out_channels + nch > channels) return -1;
      br.Read(4);                                // element instance tag
      if (br.Read(12) != 0) return -1;           // unused header
      const uint32_t partial = br.Read(1);
      const uint32_t bytes_shifted = br.Read(2);
      if (bytes_shifted == 3) return -1;
      const int shift = (int)bytes_shifted * 8;
      const uint32_t escape = br.Read(1);
      if (partial) num_samples = br.Read(32);
      if (num_samples > frame_length) return -1;
      const int ns = (int)num_samples;
      int mix_bits = 0, mix_res = 0;
      if (!escape) {
        const int chanbits = bit_depth - shift + (nch - 1);
        if (chanbits > 32) return -1;
        mix_bits = (int)br.Read(8);
        mix_res = br.ReadSigned(8);
        int mode[2], denshift[2], pbf[2], num[2];
        int16_t coefs[2][32];
        for (int c = 0; c < nch; ++c) {
          uint32_t hb = br.Read(8);
          mode[c] = (int)(hb >> 4);
          denshift[c] = (int)(hb & 0xF);
          hb = br.Read(8);
          pbf[c] = (int)(hb >> 5);
          num[c] = (int)(hb & 0x1F);
          for (int i = 0; i < num[c]; ++i)
            coefs[c][i] = (int16_t)br.Read(16);
        }
        if (br.overrun) return -1;
        uint64_t shift_pos = 0;
        if (bytes_shifted) {
          shift_pos = br.pos;
          br.pos += (uint64_t)ns * shift * nch;
          if (br.pos > br.nbits) return -1;
        }
        for (int c = 0; c < nch; ++c) {
          const uint32_t pb_local = (pb * (uint32_t)pbf[c]) / 4;
          if (!DynDecomp(br, work, ns, chanbits, mb, pb_local, (int)kb))
            return -1;
          if (mode[c] == 0) {
            UnpcBlock(work, chan[c], ns, coefs[c], num[c], denshift[c],
                      chanbits);
          } else {
            int16_t none[32];
            std::memset(none, 0, sizeof none);
            UnpcBlock(work, work, ns, none, 31, 0, chanbits);
            UnpcBlock(work, chan[c], ns, coefs[c], num[c], denshift[c],
                      chanbits);
          }
        }
        // un-mix
        if (nch == 2 && mix_res != 0) {
          for (int j = 0; j < ns; ++j) {
            const int32_t u = chan[0][j], v = chan[1][j];
            const int32_t l =
                u + v - (int32_t)(((int64_t)mix_res * v) >> mix_bits);
            chan[0][j] = l;
            chan[1][j] = l - v;
          }
        }
        if (bytes_shifted) {
          BitReader sb(pkt, nbytes);
          sb.pos = shift_pos;
          for (int j = 0; j < ns; ++j)
            for (int c = 0; c < nch; ++c)
              chan[c][j] = (int32_t)(((uint32_t)chan[c][j] << shift) |
                                     sb.Read(shift));
        }
      } else {
        // verbatim: raw unmixed samples, interleaved
        const int chanbits = bit_depth - shift;
        for (int j = 0; j < ns; ++j) {
          for (int c = 0; c < nch; ++c) {
            chan[c][j] = br.ReadSigned(chanbits);
            if (shift)
              chan[c][j] = (int32_t)((uint32_t)chan[c][j] << shift);
          }
          if (br.overrun) return -1;
        }
      }
      // interleave into the caller's buffer
      for (int j = 0; j < ns; ++j)
        for (int c = 0; c < nch; ++c)
          out[(uint64_t)j * channels + out_channels + c] = chan[c][j];
      out_channels += nch;
      if (out_channels == channels) {
        // remaining elements (if any) must be END; keep parsing for it
        continue;
      }
    }
    if (out_channels != channels) return -1;
    return num_samples;
  }
};

}  // namespace folve_alac

extern "C" {

void* folve_alac_create(uint32_t frame_length, int bit_depth, uint32_t pb,
                        uint32_t mb, uint32_t kb, int channels) {
  if (frame_length == 0 || frame_length > (1u << 20) || channels < 1 ||
      channels > 16 || bit_depth < 1 || bit_depth > 32)
    return nullptr;
  auto* d = new (std::nothrow) folve_alac::Decoder;
  if (!d) return nullptr;
  d->frame_length = frame_length;
  d->bit_depth = bit_depth;
  d->pb = pb;
  d->mb = mb;
  d->kb = kb;
  d->channels = channels;
  if (!d->Init()) {
    delete d;
    return nullptr;
  }
  return d;
}

void folve_alac_close(void* h) { delete (folve_alac::Decoder*)h; }

// out must hold frame_length * channels int32s.  Returns frames
// decoded (<= frame_length) or -1 on malformed data.
int64_t folve_alac_decode_packet(void* h, const uint8_t* pkt,
                                 uint64_t nbytes, int32_t* out) {
  return ((folve_alac::Decoder*)h)->DecodePacket(pkt, nbytes, out);
}

}  // extern "C"
