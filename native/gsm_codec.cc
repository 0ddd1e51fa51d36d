// GSM 06.10 full-rate (RPE-LTP) decoder, from the ETSI EN 300 961
// specification's fixed-point reference description.
//
// The reference (hzeller/folve) convolves anything libsndfile decodes
// (convolve-file-handler.cc:62-76), and libsndfile links libgsm for
// the GSM 6.10 subtype in WAV (the "WAV49" 65-byte two-frame blocks of
// Microsoft's msgsm variant), AIFC ("GSM " compression, plain 33-byte
// frames) and W64.  This is an independent implementation of the
// spec's integer algorithm — all arithmetic is the spec's 16-bit
// saturating kind, so output is bit-exact with any conforming decoder
// (validated sample-exact against libsndfile in
// tests/test_gsm.py).
//
// Only the decoder is implemented: convolved OUTPUT never re-encodes
// to GSM (a lossy speech codec is no target for filtered music); the
// runtime writes FLAC instead, like the other lossy inputs.

#include <cstdint>
#include <cstring>
#include <new>

namespace folve_gsm {

typedef int16_t word;
typedef int32_t longword;

static inline longword sat16(longword x) {
  return x > 32767 ? 32767 : (x < -32768 ? -32768 : x);
}
static inline word ADD(word a, word b) { return (word)sat16((longword)a + b); }
static inline word SUB(word a, word b) { return (word)sat16((longword)a - b); }
// mult_r: rounded Q15 multiply.  (-32768 * -32768 would overflow the
// positive range; the spec saturates it to 32767.)
static inline word MULT_R(word a, word b) {
  if (a == -32768 && b == -32768) return 32767;
  return (word)(((longword)a * b + 16384) >> 15);
}
static inline word SASR(word x, int n) { return (word)(x >> n); }

// Quantized LTP gain levels (spec table 4.3b).
static const word QLB[4] = {3277, 11469, 21299, 32767};
// APCM inverse-quantization mantissa factors (spec table 4.5).
static const word FAC[8] = {18431, 20479, 22527, 24575,
                            26623, 28671, 30719, 32767};
// LAR decode tables (spec table 4.1): offset B, min MIC, inverse
// slope INVA.
static const word B_[8] = {0, 0, 2048, -2560, 94, -1792, -341, -1144};
static const word MIC[8] = {-32, -32, -16, -16, -8, -8, -4, -4};
static const word INVA[8] = {13107, 13107, 13107, 13107,
                             19223, 17476, 31454, 29708};

struct Params {
  word LARc[8];
  word Nc[4], bc[4], Mc[4], xmaxc[4];
  word xMc[4][13];
};

class Decoder {
 public:
  explicit Decoder(bool wav49) : wav49_(wav49) { Reset(); }

  void Reset() {
    std::memset(drp_, 0, sizeof drp_);
    std::memset(v_, 0, sizeof v_);
    std::memset(LARpp_prev_, 0, sizeof LARpp_prev_);
    msr_ = 0;
    nrp_ = 40;
  }

  bool wav49() const { return wav49_; }

  // Decode one already-unpacked parameter frame -> 160 samples.
  void DecodeFrame(const Params& p, int16_t* out) {
    word wt[160];
    for (int j = 0; j < 4; ++j) {
      word erp[40];
      DequantizeRpe(p.xmaxc[j], p.Mc[j], p.xMc[j], erp);
      // Long-term synthesis: add the scaled pitch-lagged history.
      word Nr = p.Nc[j];
      if (Nr < 40 || Nr > 120) Nr = nrp_;  // spec 4.3.2 error concealment
      nrp_ = Nr;
      const word brp = QLB[p.bc[j]];
      for (int k = 0; k < 40; ++k) {
        const word drpp = MULT_R(brp, drp_[120 + k - Nr]);
        drp_[120 + k] = ADD(erp[k], drpp);
      }
      std::memcpy(wt + j * 40, drp_ + 120, 40 * sizeof(word));
      // Slide the reconstructed-residual history left by a subframe.
      std::memmove(drp_, drp_ + 40, 120 * sizeof(word));
    }
    ShortTermSynthesis(p.LARc, wt, out);
  }

 private:
  // APCM inverse quantization + RPE grid positioning (spec 4.3.3).
  static void DequantizeRpe(word xmaxc, word Mc, const word* xMc, word* erp) {
    int exp = 0;
    if (xmaxc > 15) exp = SASR(xmaxc, 3) - 1;
    word mant = xmaxc - (word)(exp << 3);
    if (mant == 0) {
      exp = -4;
      mant = 15;
    } else {
      while (mant <= 7) {
        mant = (word)((mant << 1) | 1);
        --exp;
      }
    }
    mant -= 8;
    const word temp1 = FAC[mant];
    const int temp2 = 6 - exp;
    // Spec asl(1, temp2-1): a LEFT shift by a negative count is an
    // arithmetic right shift, so xmaxc >= 56 (exp == 6, loud signals)
    // yields 0 -- `1 << -1` is C++ UB and miscompiles under -O2.
    const word temp3 = temp2 > 0 ? (word)(1 << (temp2 - 1)) : 0;
    std::memset(erp, 0, 40 * sizeof(word));
    for (int i = 0; i < 13; ++i) {
      word temp = (word)((xMc[i] << 1) - 7);  // -7 .. +7
      temp = (word)(temp << 12);
      temp = MULT_R(temp1, temp);
      temp = ADD(temp, temp3);
      erp[Mc + 3 * i] = SASR(temp, temp2);
    }
  }

  // LARc -> LARpp (spec 4.3.1 via 4.2.8's inverse).
  static void DecodeLar(const word* LARc, word* LARpp) {
    for (int i = 0; i < 8; ++i) {
      word temp1 = (word)((ADD(LARc[i], MIC[i])) << 10);
      const word temp2 = (word)(B_[i] << 1);
      temp1 = SUB(temp1, temp2);
      temp1 = MULT_R(INVA[i], temp1);
      LARpp[i] = ADD(temp1, temp1);
    }
  }

  // LARp -> reflection coefficient (spec 4.2.9.2).
  static word Reflection(word LARp) {
    word temp = LARp == -32768 ? 32767 : (word)(LARp < 0 ? -LARp : LARp);
    if (temp < 11059) {
      temp = (word)(temp << 1);
    } else if (temp < 20070) {
      temp = ADD(temp, 11059);
    } else {
      temp = ADD((word)(temp >> 2), 26112);
    }
    return LARp < 0 ? SUB(0, temp) : temp;
  }

  void FilterRegion(const word* LARp, int k0, int k1, const word* wt,
                    int16_t* out) {
    word rrp[8];
    for (int i = 0; i < 8; ++i) rrp[i] = Reflection(LARp[i]);
    for (int k = k0; k < k1; ++k) {
      word sri = wt[k];
      for (int i = 7; i >= 0; --i) {
        sri = SUB(sri, MULT_R(rrp[i], v_[i]));
        v_[i + 1] = ADD(v_[i], MULT_R(rrp[i], sri));
      }
      v_[0] = sri;
      // De-emphasis + upscale + 13-bit truncation (spec 4.3.5).
      msr_ = ADD(sri, MULT_R(msr_, 28180));
      out[k] = (int16_t)(ADD(msr_, msr_) & ~7);
    }
  }

  // Interpolated lattice synthesis over the frame's four LAR regions
  // (spec 4.2.9.1 mixing weights, applied at the decoder).
  void ShortTermSynthesis(const word* LARc, const word* wt, int16_t* out) {
    word LARpp[8], LARp[8];
    DecodeLar(LARc, LARpp);
    for (int i = 0; i < 8; ++i) {  // k = 0..12: 3/4 old + 1/4 new
      LARp[i] = ADD(SASR(LARpp_prev_[i], 2), SASR(LARpp[i], 2));
      LARp[i] = ADD(LARp[i], SASR(LARpp_prev_[i], 1));
    }
    FilterRegion(LARp, 0, 13, wt, out);
    for (int i = 0; i < 8; ++i)  // k = 13..26: 1/2 old + 1/2 new
      LARp[i] = ADD(SASR(LARpp_prev_[i], 1), SASR(LARpp[i], 1));
    FilterRegion(LARp, 13, 27, wt, out);
    for (int i = 0; i < 8; ++i) {  // k = 27..39: 1/4 old + 3/4 new
      LARp[i] = ADD(SASR(LARpp_prev_[i], 2), SASR(LARpp[i], 2));
      LARp[i] = ADD(LARp[i], SASR(LARpp[i], 1));
    }
    FilterRegion(LARp, 27, 40, wt, out);
    FilterRegion(LARpp, 40, 160, wt, out);  // k = 40..159: new only
    std::memcpy(LARpp_prev_, LARpp, sizeof LARpp);
  }

  bool wav49_;
  word drp_[160];       // reconstructed short-term residual history
  word v_[9];           // synthesis-lattice delay line
  word LARpp_prev_[8];  // previous frame's decoded LARs
  word msr_;            // de-emphasis memory
  word nrp_;            // previous valid LTP lag
};

// ---------------------------------------------------------------------------
// Bit unpacking.  Two framings exist in the wild:
//  * "native" 33-byte frames (AIFC/raw): MSB-first fields preceded by
//    a 4-bit 0xD signature.
//  * WAV49 65-byte blocks (WAV/W64): two 260-bit frames in one
//    LSB-first continuous bitstream, no signature.
// ---------------------------------------------------------------------------

class MsbReader {
 public:
  explicit MsbReader(const uint8_t* p) : p_(p), bit_(0) {}
  word Get(int n) {
    uint32_t v = 0;
    for (int i = 0; i < n; ++i) {
      v = (v << 1) | ((p_[bit_ >> 3] >> (7 - (bit_ & 7))) & 1);
      ++bit_;
    }
    return (word)v;
  }

 private:
  const uint8_t* p_;
  int bit_;
};

class LsbReader {
 public:
  explicit LsbReader(const uint8_t* p) : p_(p), bit_(0) {}
  word Get(int n) {
    uint32_t v = 0;
    for (int i = 0; i < n; ++i) {
      v |= (uint32_t)((p_[bit_ >> 3] >> (bit_ & 7)) & 1) << i;
      ++bit_;
    }
    return (word)v;
  }

 private:
  const uint8_t* p_;
  int bit_;
};

template <class Reader>
static void UnpackParams(Reader& r, Params* p) {
  static const int larbits[8] = {6, 6, 5, 5, 4, 4, 3, 3};
  for (int i = 0; i < 8; ++i) p->LARc[i] = r.Get(larbits[i]);
  for (int j = 0; j < 4; ++j) {
    p->Nc[j] = r.Get(7);
    p->bc[j] = r.Get(2);
    p->Mc[j] = r.Get(2);
    p->xmaxc[j] = r.Get(6);
    for (int i = 0; i < 13; ++i) p->xMc[j][i] = r.Get(3);
  }
}

}  // namespace folve_gsm

extern "C" {

void* folve_gsm_create(int wav49) {
  return new (std::nothrow) folve_gsm::Decoder(wav49 != 0);
}

void folve_gsm_reset(void* h) { ((folve_gsm::Decoder*)h)->Reset(); }

void folve_gsm_close(void* h) { delete (folve_gsm::Decoder*)h; }

// Decode whole coded units from `in` (33-byte frames, or 65-byte
// blocks for wav49).  Returns samples written to `out` (160 per frame,
// 320 per wav49 block); trailing partial units are ignored.  A native
// frame lacking the 0xD signature nibble stops the decode — the count
// of samples produced BEFORE it is returned (short decode, matching
// the truncation policy of the other readers).
int64_t folve_gsm_decode(void* h, const uint8_t* in, uint64_t nbytes,
                         int16_t* out) {
  auto* d = (folve_gsm::Decoder*)h;
  int64_t produced = 0;
  if (d->wav49()) {
    for (uint64_t off = 0; off + 65 <= nbytes; off += 65) {
      folve_gsm::LsbReader r(in + off);
      folve_gsm::Params p;
      for (int half = 0; half < 2; ++half) {
        folve_gsm::UnpackParams(r, &p);
        d->DecodeFrame(p, out + produced);
        produced += 160;
      }
    }
  } else {
    for (uint64_t off = 0; off + 33 <= nbytes; off += 33) {
      if ((in[off] >> 4) != 0xD) break;
      folve_gsm::MsbReader r(in + off);
      folve_gsm::Params p;
      (void)r.Get(4);  // signature
      folve_gsm::UnpackParams(r, &p);
      d->DecodeFrame(p, out + produced);
      produced += 160;
    }
  }
  return produced;
}

}  // extern "C"
