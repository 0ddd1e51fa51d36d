// Opus SILK decoder (RFC 6716 section 4.2) — from scratch.
//
// Completes the from-scratch Opus decoder: where celt_codec.cc handles
// CELT-mode packets (music modes), this decodes SILK-mode packets
// (speech modes, TOC configs 0-11): the linear-prediction layer with
// entropy-coded gains, NLSF-codebook LPC coefficients, long-term
// (pitch) prediction, a shell-coded excitation and fixed-point
// synthesis, then polyphase resampling from the 8/12/16 kHz internal
// rate to 48 kHz.
//
// Every trained table was extracted from the libopus test-oracle
// binary by tools/gen_silk_tables.py (the decode functions and the
// table each ec_dec_icdf call site uses are readable in the oracle's
// disassembly — the build ships assertion strings naming every
// silk/*.c file).  Validation follows the same two-level bar as CELT
// (tests/test_opus.py): the final range-coder state must equal
// OPUS_GET_FINAL_RANGE for every packet — the standard's own
// conformance check — and PCM must match at high precision (SILK
// synthesis is fixed-point normative, so the internal-rate signal is
// bit-exact; only the float conversion differs).

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstdint>
#include <cstring>
#include <new>

#include "opus_shared.h"

namespace folve_silk {

using folve_opus::EcDec;

static bool Trace() {
  static int t = -1;
  if (t < 0) t = std::getenv("FOLVE_SILK_TRACE") ? 1 : 0;
  return t;
}
#define STRACE(...) \
  do { if (Trace()) std::fprintf(stderr, __VA_ARGS__); } while (0)

#include "silk_tables.inc"

constexpr int kMaxSubfr = 4;
constexpr int kSubfrLenMs = 5;
constexpr int kLtpOrder = 5;
constexpr int kMaxLpcOrder = 16;
constexpr int kMaxFrameLen = 16 * 20;   // 16 kHz * 20 ms
constexpr int kLtpMemMs = 20;

static inline int imin(int a, int b) { return a < b ? a : b; }
static inline int imax(int a, int b) { return a > b ? a : b; }
static inline int32_t smulwb(int32_t a, int32_t b16) {
  return (int32_t)(((int64_t)a * (int16_t)b16) >> 16);
}
static inline int32_t smlawb(int32_t a, int32_t b, int32_t c16) {
  return a + (int32_t)(((int64_t)b * (int16_t)c16) >> 16);
}
static inline int32_t smulww(int32_t a, int32_t b) {
  return (int32_t)(((int64_t)a * b) >> 16);
}
static inline int32_t smulbb(int32_t a, int32_t b) {
  return (int32_t)(int16_t)a * (int32_t)(int16_t)b;
}
static inline int16_t sat16(int32_t x) {
  return x > 32767 ? 32767 : (x < -32768 ? -32768 : (int16_t)x);
}
static inline int32_t rshift_round(int32_t x, int n) {
  return n == 1 ? (x >> 1) + (x & 1) : ((x >> (n - 1)) + 1) >> 1;
}
static inline int64_t rshift_round64(int64_t x, int n) {
  return ((x >> (n - 1)) + 1) >> 1;
}
static inline int32_t smlaww(int32_t a, int32_t b, int32_t c) {
  return a + (int32_t)(((int64_t)b * c) >> 16);
}
static inline int32_t smlabb(int32_t a, int32_t b, int32_t c) {
  return a + (int32_t)(int16_t)b * (int32_t)(int16_t)c;
}
static inline int clz32(int32_t x) {
  return x ? __builtin_clz((uint32_t)x) : 32;
}
static inline int32_t add_sat32(int32_t a, int32_t b) {
  int64_t s = (int64_t)a + b;
  return s > INT32_MAX ? INT32_MAX : (s < INT32_MIN ? INT32_MIN : (int32_t)s);
}
// Left shift with two's-complement wrap semantics (what every silk
// fixed-point macro assumes; plain << on negatives is UB in C++).
static inline int32_t lshift32(int32_t a, int n) {
  return (int32_t)((uint32_t)a << n);
}
static inline int32_t lshift_sat32(int32_t a, int n) {
  int32_t hi = INT32_MAX >> n, lo = INT32_MIN >> n;
  return (a > hi ? INT32_MAX : (a < lo ? INT32_MIN : lshift32(a, n)));
}
// silk_RAND: wrapping 32-bit LCG used for excitation sign dither.
static inline int32_t silk_rand(int32_t seed) {
  return (int32_t)(907633515u + (uint32_t)seed * 196314165u);
}
// silk/Inlines.h silk_INVERSE32_varQ / silk_DIV32_varQ.
static int32_t Inverse32VarQ(int32_t b32, int Qres) {
  int b_headrm = clz32(b32 > 0 ? b32 : -b32) - 1;
  int32_t b32_nrm = (int32_t)((uint32_t)b32 << b_headrm);
  int32_t b32_inv = (INT32_MAX >> 2) / (b32_nrm >> 16);
  int32_t result = (int32_t)((uint32_t)b32_inv << 16);
  int32_t err_Q32 =
      (int32_t)((uint32_t)((1 << 29) - smulwb(b32_nrm, b32_inv)) << 3);
  result = smlaww(result, err_Q32, b32_inv);
  int lshift = 61 - b_headrm - Qres;
  if (lshift <= 0) return lshift_sat32(result, -lshift);
  return lshift < 32 ? result >> lshift : 0;
}
static int32_t Div32VarQ(int32_t a32, int32_t b32, int Qres) {
  int a_headrm = clz32(a32 > 0 ? a32 : -a32) - 1;
  int32_t a32_nrm = (int32_t)((uint32_t)a32 << a_headrm);
  int b_headrm = clz32(b32 > 0 ? b32 : -b32) - 1;
  int32_t b32_nrm = (int32_t)((uint32_t)b32 << b_headrm);
  int32_t b32_inv = (INT32_MAX >> 2) / (b32_nrm >> 16);
  int32_t result = smulwb(a32_nrm, b32_inv);
  a32_nrm = (int32_t)((uint32_t)a32_nrm -
                      ((uint32_t)(((int64_t)b32_nrm * result) >> 32) << 3));
  result = smlawb(result, a32_nrm, b32_inv);
  int lshift = 29 + a_headrm - b_headrm - Qres;
  if (lshift < 0) return lshift_sat32(result, -lshift);
  return lshift < 32 ? result >> lshift : 0;
}

// 2^(x/128) for Q7 log values (silk/log2lin.c).
static int32_t Log2Lin(int32_t inLog_Q7) {
  if (inLog_Q7 < 0) return 0;
  if (inLog_Q7 >= 3967) return 0x7FFFFFFF;
  int32_t out = 1 << (inLog_Q7 >> 7);
  int32_t frac_Q7 = inLog_Q7 & 0x7F;
  if (inLog_Q7 < 2048)
    out += (out * smlawb(frac_Q7, frac_Q7 * (128 - frac_Q7), -174)) >> 7;
  else
    out += (out >> 7) * smlawb(frac_Q7, frac_Q7 * (128 - frac_Q7), -174);
  return out;
}

// ---------------------------------------------------------------------------
// Resampler (silk/resampler.c, resampler_private_up2_HQ.c,
// resampler_private_IIR_FIR.c).  The decoder only ever up-samples
// (internal 8/12/16 kHz -> API rate), so the down-FIR paths are not
// implemented.  All coefficients and the input-delay matrix were
// extracted from the oracle; the up2-HQ all-pass coefficients are
// immediates in its code: {1746, 14986, -26453} / {6854, 25769, -9994}.

// 2x upsampler, 3 cascaded all-pass sections per phase.
static void ResamplerUp2HQ(int32_t* S, int16_t* out, const int16_t* in,
                           int len) {
  for (int k = 0; k < len; ++k) {
    int32_t in32 = lshift32(in[k], 10);
    int32_t Y = in32 - S[0];
    int32_t X = smulwb(Y, 1746);
    int32_t out1 = S[0] + X;
    S[0] = in32 + X;
    Y = out1 - S[1];
    X = smulwb(Y, 14986);
    int32_t out2 = S[1] + X;
    S[1] = out1 + X;
    Y = out2 - S[2];
    X = smlawb(Y, Y, -26453);
    out1 = S[2] + X;
    S[2] = out2 + X;
    out[2 * k] = sat16(rshift_round(out1, 10));
    Y = in32 - S[3];
    X = smulwb(Y, 6854);
    out1 = S[3] + X;
    S[3] = in32 + X;
    Y = out1 - S[4];
    X = smulwb(Y, 25769);
    out2 = S[4] + X;
    S[4] = out1 + X;
    Y = out2 - S[5];
    X = smlawb(Y, Y, -9994);
    out1 = S[5] + X;
    S[5] = out2 + X;
    out[2 * k + 1] = sat16(rshift_round(out1, 10));
  }
}

struct Resampler {
  int32_t sIIR[6] = {0};
  int16_t sFIR[8] = {0};
  int16_t delayBuf[48] = {0};
  int fsInKhz = 0, fsOutKhz = 0, batchSize = 0, inputDelay = 0;
  int mode = 0;  // 0 copy, 1 up2-HQ (exact 2x), 2 IIR+FIR
  int32_t invRatio_Q16 = 0;

  static int RateId(int khz) {
    int hz = khz * 1000;
    return (((hz >> 12) - (hz > 16000)) >> (hz > 24000)) - 1;
  }

  void Init(int fs_in_khz, int fs_out_khz) {
    *this = Resampler();
    fsInKhz = fs_in_khz;
    fsOutKhz = fs_out_khz;
    batchSize = fs_in_khz * 10;  // RESAMPLER_MAX_BATCH_SIZE_MS
    inputDelay = kSilkResamplerDelayDec[RateId(fs_in_khz) * 5 +
                                        RateId(fs_out_khz)];
    int up2x = 0;
    if (fs_out_khz > fs_in_khz) {
      if (fs_out_khz == 2 * fs_in_khz) {
        mode = 1;
      } else {
        mode = 2;
        up2x = 1;
      }
    } else {
      mode = 0;  // equal rates (down-sampling unsupported/unused)
    }
    int32_t fs_in = fs_in_khz * 1000, fs_out = fs_out_khz * 1000;
    invRatio_Q16 =
        (int32_t)((uint32_t)((fs_in << (14 + up2x)) / fs_out) << 2);
    while (smulww(invRatio_Q16, fs_out) < (fs_in << up2x)) invRatio_Q16++;
  }

  void IirFir(int16_t*& out, const int16_t* in, int inLen) {
    int16_t buf[2 * 160 + 8];
    std::memcpy(buf, sFIR, 8 * sizeof(int16_t));
    for (;;) {
      int nIn = imin(inLen, batchSize);
      ResamplerUp2HQ(sIIR, &buf[8], in, nIn);
      int32_t maxIdx = nIn << 17;
      for (int32_t idx = 0; idx < maxIdx; idx += invRatio_Q16) {
        int ti = ((idx & 0xFFFF) * 3) >> 14;  // SMULWB(frac, 12)
        const int16_t* b = &buf[idx >> 16];
        const int16_t* f0 = &kSilkResamplerFracFIR12[4 * ti];
        const int16_t* f1 = &kSilkResamplerFracFIR12[4 * (11 - ti)];
        int32_t r = (int32_t)b[0] * f0[0] + (int32_t)b[1] * f0[1] +
                    (int32_t)b[2] * f0[2] + (int32_t)b[3] * f0[3] +
                    (int32_t)b[4] * f1[3] + (int32_t)b[5] * f1[2] +
                    (int32_t)b[6] * f1[1] + (int32_t)b[7] * f1[0];
        *out++ = sat16(rshift_round(r, 15));
      }
      in += nIn;
      inLen -= nIn;
      if (inLen > 0) {
        std::memcpy(buf, &buf[nIn << 1], 8 * sizeof(int16_t));
      } else {
        std::memcpy(sFIR, &buf[nIn << 1], 8 * sizeof(int16_t));
        break;
      }
    }
  }

  // One frame: inLen samples in, inLen * fsOut/fsIn out.  The first
  // millisecond is fed from the delay buffer (the resampler's fixed
  // input delay), the rest streams directly.
  int Process(int16_t* out, const int16_t* in, int inLen) {
    int nSamples = fsInKhz - inputDelay;
    std::memcpy(&delayBuf[inputDelay], in, nSamples * sizeof(int16_t));
    int16_t* o = out;
    switch (mode) {
      case 0:
        std::memcpy(o, delayBuf, fsInKhz * sizeof(int16_t));
        std::memcpy(&o[fsOutKhz], &in[nSamples],
                    (inLen - fsInKhz) * sizeof(int16_t));
        break;
      case 1:
        ResamplerUp2HQ(sIIR, o, delayBuf, fsInKhz);
        ResamplerUp2HQ(sIIR, &o[fsOutKhz], &in[nSamples],
                       inLen - fsInKhz);
        break;
      default:
        IirFir(o, delayBuf, fsInKhz);
        o = out + fsOutKhz;
        IirFir(o, &in[nSamples], inLen - fsInKhz);
        break;
    }
    std::memcpy(delayBuf, &in[inLen - inputDelay],
                inputDelay * sizeof(int16_t));
    return inLen * fsOutKhz / fsInKhz;
  }
};

// ---------------------------------------------------------------------------
// Per-channel decoder state.

struct Indices {
  int8_t GainsIndices[kMaxSubfr];
  int8_t LTPIndex[kMaxSubfr];
  int8_t NLSFIndices[kMaxLpcOrder + 1];
  int16_t lagIndex;
  int8_t contourIndex;
  int8_t signalType;
  int8_t quantOffsetType;
  int8_t NLSFInterpCoef_Q2;
  int8_t PERIndex;
  int8_t LTP_scaleIndex;
  int8_t Seed;
};

struct NLSFCodebook {
  int nVectors;
  int order;
  int32_t quantStepSize_Q16;
  int32_t invQuantStepSize_Q6;
  const uint8_t* CB1_NLSF_Q8;
  const int16_t* CB1_Wght_Q9;
  const uint8_t* CB1_iCDF;
  const uint8_t* pred_Q8;
  const uint8_t* ec_sel;
  const uint8_t* ec_iCDF;
  const int16_t* deltaMin_Q15;
};

static const NLSFCodebook kCbNBMB = {
    32, 10, 11796, 355,
    kSilkNLSFCB1NBMB, kSilkNLSFCB1WghtNBMB, kSilkNLSFCB1ICDFNBMB,
    kSilkNLSFPredNBMB, kSilkNLSFEcSelNBMB, kSilkNLSFEcICDFNBMB,
    kSilkNLSFDeltaMinNBMB};
static const NLSFCodebook kCbWB = {
    32, 16, 9830, 426,
    kSilkNLSFCB1WB, kSilkNLSFCB1WghtWB, kSilkNLSFCB1ICDFWB,
    kSilkNLSFPredWB, kSilkNLSFEcSelWB, kSilkNLSFEcICDFWB,
    kSilkNLSFDeltaMinWB};

struct Channel {
  int fs_kHz = 0;
  int nb_subfr = 0;
  int frame_length = 0;
  int subfr_length = 0;
  int ltp_mem_length = 0;
  int LPC_order = 0;
  const NLSFCodebook* cb = nullptr;
  const uint8_t* pitch_lag_low_icdf = nullptr;
  const uint8_t* pitch_contour_icdf = nullptr;

  int VAD_flags[3] = {0};
  int LBRR_flag = 0;
  int LBRR_flags[3] = {0};

  Indices ind = {};
  int ec_prevSignalType = 0;
  int16_t ec_prevLagIndex = 0;
  int8_t LastGainIndex = 10;
  int32_t prev_gain_Q16 = 65536;
  int16_t prevNLSF_Q15[kMaxLpcOrder] = {0};
  int first_frame_after_reset = 1;
  int lagPrev = 100;
  int prevSignalType = 0;

  // Synthesis state.
  int32_t sLPC_Q14[kMaxLpcOrder] = {0};
  int16_t outBuf[2 * kMaxFrameLen];  // ltp_mem + frame scratch
  int32_t exc_Q14[kMaxFrameLen];
  int16_t pulses[kMaxFrameLen + 16];
  int api_khz = 0;  // output rate; 0 = raw internal rate, no resampler
  Resampler resampler;

  void SetFs(int fs, int frame_ms) {
    int nb = frame_ms / kSubfrLenMs;
    if (fs != fs_kHz || nb != nb_subfr) {
      if (fs != fs_kHz) {
        resampler.Init(fs, api_khz ? api_khz : fs);
        std::memset(sLPC_Q14, 0, sizeof(sLPC_Q14));
        std::memset(outBuf, 0, sizeof(outBuf));
        std::memset(prevNLSF_Q15, 0, sizeof(prevNLSF_Q15));
        lagPrev = 100;
        LastGainIndex = 10;
        prevSignalType = 0;
        first_frame_after_reset = 1;
      }
      fs_kHz = fs;
      nb_subfr = nb;
      subfr_length = kSubfrLenMs * fs;
      frame_length = subfr_length * nb_subfr;
      ltp_mem_length = kLtpMemMs * fs;
      LPC_order = fs == 16 ? 16 : 10;
      cb = fs == 16 ? &kCbWB : &kCbNBMB;
      pitch_lag_low_icdf = fs == 8 ? kSilkUniform4
                           : fs == 12 ? kSilkUniform6 : kSilkUniform8;
      if (fs == 8)
        pitch_contour_icdf = nb == 4 ? kSilkContourNB20msICDF
                                     : kSilkContourNB10msICDF;
      else
        pitch_contour_icdf = nb == 4 ? kSilkContour20msICDF
                                     : kSilkContour10msICDF;
    }
  }
};

// ---------------------------------------------------------------------------
// Bitstream parsing (silk/decode_indices.c, decode_pulses.c).

static void NLSFUnpack(const NLSFCodebook* cb, int CB1_index, int* ec_ix,
                       uint8_t* pred_Q8) {
  const uint8_t* sel = cb->ec_sel + CB1_index * cb->order / 2;
  for (int i = 0; i < cb->order; i += 2) {
    int entry = *sel++;
    ec_ix[i] = ((entry >> 1) & 7) * 9;
    pred_Q8[i] = cb->pred_Q8[i + (entry & 1) * (cb->order - 1)];
    ec_ix[i + 1] = ((entry >> 5) & 7) * 9;
    pred_Q8[i + 1] =
        cb->pred_Q8[i + ((entry >> 4) & 1) * (cb->order - 1) + 1];
  }
}

enum CondCoding { kIndependent = 0, kIndependentNoLTPScale = 1,
                  kConditional = 2 };

static void DecodeIndices(Channel* c, EcDec* ec, int frame_index,
                          int decode_LBRR, int cond) {
  Indices* ind = &c->ind;
  int Ix;
  if (decode_LBRR || c->VAD_flags[frame_index])
    Ix = ec->DecodeIcdf(kSilkTypeOffsetVAD, 8) + 2;
  else
    Ix = ec->DecodeIcdf(kSilkTypeOffsetNoVAD, 8);
  ind->signalType = (int8_t)(Ix >> 1);
  ind->quantOffsetType = (int8_t)(Ix & 1);
  STRACE("  type=%d qoff=%d tell=%d\n", ind->signalType,
         ind->quantOffsetType, ec->Tell());

  if (cond == kConditional) {
    ind->GainsIndices[0] = (int8_t)ec->DecodeIcdf(kSilkDeltaGainICDF, 8);
  } else {
    ind->GainsIndices[0] =
        (int8_t)(ec->DecodeIcdf(kSilkGainICDF + 8 * ind->signalType, 8)
                 << 3);
    ind->GainsIndices[0] += (int8_t)ec->DecodeIcdf(kSilkUniform8, 8);
  }
  for (int i = 1; i < c->nb_subfr; ++i)
    ind->GainsIndices[i] = (int8_t)ec->DecodeIcdf(kSilkDeltaGainICDF, 8);
  STRACE("  gains=%d,%d,%d,%d tell=%d\n", ind->GainsIndices[0],
         ind->GainsIndices[1], ind->GainsIndices[2], ind->GainsIndices[3],
         ec->Tell());

  const NLSFCodebook* cb = c->cb;
  ind->NLSFIndices[0] = (int8_t)ec->DecodeIcdf(
      cb->CB1_iCDF + (ind->signalType >> 1) * cb->nVectors, 8);
  int ec_ix[kMaxLpcOrder];
  uint8_t pred_Q8[kMaxLpcOrder];
  NLSFUnpack(cb, ind->NLSFIndices[0], ec_ix, pred_Q8);
  for (int i = 0; i < cb->order; ++i) {
    int v = ec->DecodeIcdf(cb->ec_iCDF + ec_ix[i], 8);
    if (v == 0)
      v = -ec->DecodeIcdf(kSilkNLSFExtICDF, 8);
    else if (v == 8)
      v = 8 + ec->DecodeIcdf(kSilkNLSFExtICDF, 8);
    ind->NLSFIndices[i + 1] = (int8_t)(v - 4);
  }
  if (c->nb_subfr == kMaxSubfr)
    ind->NLSFInterpCoef_Q2 = (int8_t)ec->DecodeIcdf(kSilkNLSFInterpICDF, 8);
  else
    ind->NLSFInterpCoef_Q2 = 4;
  STRACE("  nlsf0=%d interp=%d tell=%d\n", ind->NLSFIndices[0],
         ind->NLSFInterpCoef_Q2, ec->Tell());

  if (ind->signalType == 2) {  // voiced
    int decoded_abs = 1;
    if (cond == kConditional && c->ec_prevSignalType == 2) {
      int delta = ec->DecodeIcdf(kSilkPitchDeltaICDF, 8);
      if (delta > 0) {
        ind->lagIndex = (int16_t)(c->ec_prevLagIndex + delta - 9);
        decoded_abs = 0;
      }
    }
    if (decoded_abs) {
      int high = ec->DecodeIcdf(kSilkPitchLagICDF, 8);
      ind->lagIndex = (int16_t)(high * (c->fs_kHz >> 1));
      ind->lagIndex += (int16_t)ec->DecodeIcdf(c->pitch_lag_low_icdf, 8);
    }
    c->ec_prevLagIndex = ind->lagIndex;
    ind->contourIndex = (int8_t)ec->DecodeIcdf(c->pitch_contour_icdf, 8);

    ind->PERIndex = (int8_t)ec->DecodeIcdf(kSilkPerIndexICDF, 8);
    static const uint8_t* const ltp_icdf[3] = {
        kSilkLTPGainICDF0, kSilkLTPGainICDF1, kSilkLTPGainICDF2};
    for (int k = 0; k < c->nb_subfr; ++k)
      ind->LTPIndex[k] = (int8_t)ec->DecodeIcdf(ltp_icdf[ind->PERIndex], 8);
    if (cond == kIndependent)
      ind->LTP_scaleIndex = (int8_t)ec->DecodeIcdf(kSilkLTPScaleICDF, 8);
    else
      ind->LTP_scaleIndex = 0;
  }
  c->ec_prevSignalType = ind->signalType;
  if (ind->signalType == 2)
    STRACE("  lag=%d contour=%d per=%d ltpscale=%d tell=%d\n",
           ind->lagIndex, ind->contourIndex, ind->PERIndex,
           ind->LTP_scaleIndex, ec->Tell());
  ind->Seed = (int8_t)ec->DecodeIcdf(kSilkUniform4, 8);
  STRACE("  seed=%d tell=%d\n", ind->Seed, ec->Tell());
}

static void ShellDecoder(int16_t* pulses0, EcDec* ec, int pulses4) {
  int16_t p3[2], p2[4], p1[8];
  auto dec = [&](const uint8_t* table, int p) -> int {
    if (p <= 0) return 0;
    return ec->DecodeIcdf(table + kSilkShellOffsets[p], 8);
  };
  // The split tree is traversed depth-first (pre-order), NOT level by
  // level: after splitting a node the decoder fully expands its left
  // subtree before touching the right one, so the symbol order in the
  // bitstream interleaves the table levels (t3 t2 t1 t0 t0 t1 t0 t0 t2
  // ...).  Confirmed against the oracle's own ec_dec_icdf call sequence.
  p3[0] = (int16_t)dec(kSilkShellTable3, pulses4);
  p3[1] = (int16_t)(pulses4 - p3[0]);
  for (int i = 0; i < 2; ++i) {
    p2[2 * i] = (int16_t)dec(kSilkShellTable2, p3[i]);
    p2[2 * i + 1] = (int16_t)(p3[i] - p2[2 * i]);
    for (int j = 0; j < 2; ++j) {
      int k = 2 * i + j;
      p1[2 * k] = (int16_t)dec(kSilkShellTable1, p2[k]);
      p1[2 * k + 1] = (int16_t)(p2[k] - p1[2 * k]);
      for (int l = 0; l < 2; ++l) {
        int m = 2 * k + l;
        pulses0[2 * m] = (int16_t)dec(kSilkShellTable0, p1[m]);
        pulses0[2 * m + 1] = (int16_t)(p1[m] - pulses0[2 * m]);
      }
    }
  }
}

static void DecodePulses(EcDec* ec, int16_t* pulses, int signalType,
                         int quantOffsetType, int frame_length) {
  int rateLevel =
      ec->DecodeIcdf(kSilkRateLevelsICDF + 9 * (signalType >> 1), 8);
  STRACE("  rateLevel=%d tell=%d\n", rateLevel, ec->Tell());
  int iter = frame_length >> 4;
  if (iter * 16 < frame_length) iter++;  // 10 ms @ 12 kHz (120 samples)

  int sum_pulses[24], nLshifts[24];
  for (int i = 0; i < iter; ++i) {
    nLshifts[i] = 0;
    int sum = ec->DecodeIcdf(kSilkPulsesPerBlockICDF + 18 * rateLevel, 8);
    while (sum == 17 && nLshifts[i] < 16) {  // MAX_PULSES+1: lshift escape
      nLshifts[i]++;
      sum = ec->DecodeIcdf(kSilkPulsesPerBlockICDF + 18 * 9 +
                               (nLshifts[i] == 10 ? 1 : 0),
                           8);
    }
    if (sum == 17) sum = 16;  // desynced garbage: stay bounded
    sum_pulses[i] = sum;
  }
  for (int i = 0; i < iter; ++i) {
    if (sum_pulses[i] > 0)
      ShellDecoder(pulses + 16 * i, ec, sum_pulses[i]);
    else
      std::memset(pulses + 16 * i, 0, 16 * sizeof(int16_t));
  }
  for (int i = 0; i < iter; ++i) {
    if (nLshifts[i] > 0) {
      int nLS = nLshifts[i];
      for (int j = 0; j < 16; ++j) {
        int v = pulses[16 * i + j];
        for (int k = 0; k < nLS; ++k)
          v = 2 * v + ec->DecodeIcdf(kSilkLSBICDF, 8);
        pulses[16 * i + j] = (int16_t)v;
      }
      sum_pulses[i] |= nLshifts[i] << 5;
    }
  }
  STRACE("  pulses done tell=%d\n", ec->Tell());
  // Signs.
  int i0 = 7 * (quantOffsetType + (signalType << 1));
  for (int i = 0; i < iter; ++i) {
    int p = sum_pulses[i];
    if (p <= 0) continue;
    uint8_t icdf[2];
    icdf[0] = kSilkSignICDF[i0 + imin(p & 0x1F, 6)];
    icdf[1] = 0;
    for (int j = 0; j < 16; ++j) {
      if (pulses[16 * i + j] > 0) {
        int sign = ec->DecodeIcdf(icdf, 8);
        pulses[16 * i + j] =
            (int16_t)(pulses[16 * i + j] * (2 * sign - 1));
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Stereo side information (silk/stereo_decode_pred.c).

static void StereoDecodePred(EcDec* ec, int32_t* pred_Q13) {
  int ix[2][3];
  int n = ec->DecodeIcdf(kSilkStereoPredJointICDF, 8);
  ix[0][2] = n / 5;
  ix[1][2] = n - 5 * ix[0][2];
  for (int k = 0; k < 2; ++k) {
    ix[k][0] = ec->DecodeIcdf(kSilkUniform3, 8);
    ix[k][1] = ec->DecodeIcdf(kSilkUniform5, 8);
  }
  for (int k = 0; k < 2; ++k) {
    ix[k][0] += 3 * ix[k][2];
    int32_t low_Q13 = kSilkStereoPredQuantQ13[ix[k][0]];
    int32_t step_Q13 =
        smulwb(kSilkStereoPredQuantQ13[ix[k][0] + 1] - low_Q13, 6554);
    pred_Q13[k] = low_Q13 + step_Q13 * (2 * ix[k][1] + 1);
  }
  pred_Q13[0] -= pred_Q13[1];
}

static int StereoDecodeMidOnly(EcDec* ec) {
  return ec->DecodeIcdf(kSilkStereoOnlyMidICDF, 8);
}

// ---------------------------------------------------------------------------
// Synthesis (silk/decode_parameters.c, decode_core.c, NLSF_decode.c,
// NLSF2A.c, gain_quant.c, decode_pitch.c, stereo_MS_to_LR.c).  All
// arithmetic is normative fixed point; output at the internal rate is
// bit-exact vs the reference decoder.

struct DecCtrl {
  int pitchL[kMaxSubfr];
  int32_t Gains_Q16[kMaxSubfr];
  int16_t PredCoef_Q12[2][kMaxLpcOrder];
  int16_t LTPCoef_Q14[kMaxSubfr * kLtpOrder];
  int LTP_scale_Q14;
};

// silk/gain_quant.c silk_gains_dequant.
static void GainsDequant(int32_t* gain_Q16, const int8_t* ind,
                         int8_t* prev_ind, int conditional, int nb_subfr) {
  constexpr int kOffset = (2 * 128) / 6 + 16 * 128;           // 2090
  constexpr int kInvScaleQ16 = (65536 * ((86 * 128) / 6)) / 63;
  for (int k = 0; k < nb_subfr; ++k) {
    if (k == 0 && !conditional) {
      *prev_ind = (int8_t)imax(ind[k], *prev_ind - 16);
    } else {
      int ind_tmp = ind[k] - 4;  // MIN_DELTA_GAIN_QUANT
      int double_step = 2 * 36 - 64 + *prev_ind;
      *prev_ind = (int8_t)(*prev_ind + (ind_tmp > double_step
                                            ? 2 * ind_tmp - double_step
                                            : ind_tmp));
    }
    *prev_ind = (int8_t)imin(imax(*prev_ind, 0), 63);
    gain_Q16[k] =
        Log2Lin(imin(smulwb(kInvScaleQ16, *prev_ind) + kOffset, 3967));
  }
}

// silk/NLSF_decode.c (with silk_NLSF_residual_dequant inlined).
static void NLSFDecode(int16_t* pNLSF_Q15, const int8_t* NLSFIndices,
                       const NLSFCodebook* cb) {
  int ec_ix[kMaxLpcOrder];
  uint8_t pred_Q8[kMaxLpcOrder];
  NLSFUnpack(cb, NLSFIndices[0], ec_ix, pred_Q8);
  int16_t res_Q10[kMaxLpcOrder];
  int32_t out_Q10 = 0;
  for (int i = cb->order - 1; i >= 0; --i) {
    int32_t pred_Q10 = smulbb(out_Q10, pred_Q8[i]) >> 8;
    out_Q10 = lshift32(NLSFIndices[i + 1], 10);
    if (out_Q10 > 0) out_Q10 -= 102;       // NLSF_QUANT_LEVEL_ADJ in Q10
    else if (out_Q10 < 0) out_Q10 += 102;
    out_Q10 = smlawb(pred_Q10, out_Q10, cb->quantStepSize_Q16);
    res_Q10[i] = (int16_t)out_Q10;
  }
  const uint8_t* cb1 = cb->CB1_NLSF_Q8 + NLSFIndices[0] * cb->order;
  const int16_t* w = cb->CB1_Wght_Q9 + NLSFIndices[0] * cb->order;
  for (int i = 0; i < cb->order; ++i) {
    int32_t v = ((int32_t)cb1[i] << 7) + lshift32(res_Q10[i], 14) / w[i];
    pNLSF_Q15[i] = (int16_t)imin(imax(v, 0), 32767);
  }
  // silk/NLSF_stabilize.c.
  const int16_t* dmin = cb->deltaMin_Q15;
  int L = cb->order;
  int loops;
  for (loops = 0; loops < 20; ++loops) {
    int32_t min_diff = pNLSF_Q15[0] - dmin[0];
    int I = 0;
    for (int i = 1; i <= L - 1; ++i) {
      int32_t diff = pNLSF_Q15[i] - (pNLSF_Q15[i - 1] + dmin[i]);
      if (diff < min_diff) { min_diff = diff; I = i; }
    }
    int32_t diff = (1 << 15) - (pNLSF_Q15[L - 1] + dmin[L]);
    if (diff < min_diff) { min_diff = diff; I = L; }
    if (min_diff >= 0) return;
    if (I == 0) {
      pNLSF_Q15[0] = dmin[0];
    } else if (I == L) {
      pNLSF_Q15[L - 1] = (int16_t)((1 << 15) - dmin[L]);
    } else {
      int32_t min_center = 0;
      for (int k = 0; k < I; ++k) min_center += dmin[k];
      min_center += dmin[I] >> 1;
      int32_t max_center = 1 << 15;
      for (int k = L; k > I; --k) max_center -= dmin[k];
      max_center -= dmin[I] >> 1;
      int32_t center = rshift_round(pNLSF_Q15[I - 1] + pNLSF_Q15[I], 1);
      center = imin(imax(center, min_center), max_center);
      pNLSF_Q15[I - 1] = (int16_t)(center - (dmin[I] >> 1));
      pNLSF_Q15[I] = (int16_t)(pNLSF_Q15[I - 1] + dmin[I]);
    }
  }
  // Fallback: sort + enforce spacing.
  for (int i = 1; i < L; ++i) {  // insertion sort
    int16_t v = pNLSF_Q15[i];
    int j = i - 1;
    while (j >= 0 && pNLSF_Q15[j] > v) { pNLSF_Q15[j + 1] = pNLSF_Q15[j]; --j; }
    pNLSF_Q15[j + 1] = v;
  }
  pNLSF_Q15[0] = (int16_t)imax(pNLSF_Q15[0], dmin[0]);
  for (int i = 1; i < L; ++i)
    pNLSF_Q15[i] = (int16_t)imax(
        pNLSF_Q15[i], sat16((int32_t)pNLSF_Q15[i - 1] + dmin[i]));
  pNLSF_Q15[L - 1] = (int16_t)imin(pNLSF_Q15[L - 1], (1 << 15) - dmin[L]);
  for (int i = L - 2; i >= 0; --i)
    pNLSF_Q15[i] = (int16_t)imin(pNLSF_Q15[i], pNLSF_Q15[i + 1] - dmin[i + 1]);
}

// silk/bwexpander_32.c.
static void BwExpander32(int32_t* ar, int d, int32_t chirp_Q16) {
  int32_t chirp_minus_one = chirp_Q16 - 65536;
  for (int i = 0; i < d - 1; ++i) {
    ar[i] = smulww(chirp_Q16, ar[i]);
    chirp_Q16 += rshift_round((int32_t)((int64_t)chirp_Q16 * chirp_minus_one),
                              16);
  }
  ar[d - 1] = smulww(chirp_Q16, ar[d - 1]);
}

// silk/LPC_fit.c.
static void LpcFit(int16_t* a_QOUT, int32_t* a_QIN, int QOUT, int QIN,
                   int d) {
  int i;
  for (i = 0; i < 10; ++i) {
    int32_t maxabs = 0;
    int idx = 0;
    for (int k = 0; k < d; ++k) {
      int32_t absval = a_QIN[k] > 0 ? a_QIN[k] : -a_QIN[k];
      if (absval > maxabs) { maxabs = absval; idx = k; }
    }
    maxabs = rshift_round(maxabs, QIN - QOUT);
    if (maxabs > 32767) {
      maxabs = imin(maxabs, 163838);
      int32_t chirp_Q16 =
          65470 - (int32_t)(((int64_t)(maxabs - 32767) << 14) /
                            (((int64_t)maxabs * (idx + 1)) >> 2));
      BwExpander32(a_QIN, d, chirp_Q16);
    } else {
      break;
    }
  }
  if (i == 10) {
    for (int k = 0; k < d; ++k) {
      a_QOUT[k] = sat16(rshift_round(a_QIN[k], QIN - QOUT));
      a_QIN[k] = lshift32(a_QOUT[k], QIN - QOUT);
    }
  } else {
    for (int k = 0; k < d; ++k)
      a_QOUT[k] = (int16_t)rshift_round(a_QIN[k], QIN - QOUT);
  }
}

// silk/NLSF2A.c (QA = 16).
static void Nlsf2aFindPoly(int32_t* out, const int32_t* cLSF, int dd) {
  out[0] = 1 << 16;
  out[1] = -cLSF[0];
  for (int k = 1; k < dd; ++k) {
    int32_t ftmp = cLSF[2 * k];
    out[k + 1] = (int32_t)((uint32_t)out[k - 1] << 1) -
                 (int32_t)rshift_round64((int64_t)ftmp * out[k], 16);
    for (int n = k; n > 1; --n)
      out[n] += out[n - 2] -
                (int32_t)rshift_round64((int64_t)ftmp * out[n - 1], 16);
    out[1] -= ftmp;
  }
}

static void Nlsf2a(int16_t* a_Q12, const int16_t* NLSF, int d) {
  static const uint8_t ord16[16] = {0, 15, 8, 7, 4, 11, 12, 3,
                                    2, 13, 10, 5, 6, 9, 14, 1};
  static const uint8_t ord10[10] = {0, 9, 6, 3, 4, 5, 8, 1, 2, 7};
  const uint8_t* ordering = d == 16 ? ord16 : ord10;
  int32_t cos_LSF_QA[kMaxLpcOrder];
  for (int k = 0; k < d; ++k) {
    int f_int = NLSF[k] >> 8;
    int f_frac = NLSF[k] - (f_int << 8);
    int32_t cos_val = kSilkLSFCosTabQ12[f_int];
    int32_t delta = kSilkLSFCosTabQ12[f_int + 1] - cos_val;
    cos_LSF_QA[ordering[k]] =
        rshift_round((int32_t)((uint32_t)cos_val << 8) + delta * f_frac, 4);
  }
  int dd = d / 2;
  int32_t P[kMaxLpcOrder / 2 + 1], Q[kMaxLpcOrder / 2 + 1];
  Nlsf2aFindPoly(P, &cos_LSF_QA[0], dd);
  Nlsf2aFindPoly(Q, &cos_LSF_QA[1], dd);
  int32_t a32_QA1[kMaxLpcOrder];
  for (int k = 0; k < dd; ++k) {
    int32_t Ptmp = P[k + 1] + P[k];
    int32_t Qtmp = Q[k + 1] - Q[k];
    a32_QA1[k] = -Qtmp - Ptmp;
    a32_QA1[d - k - 1] = Qtmp - Ptmp;
  }
  LpcFit(a_Q12, a32_QA1, 12, 17, d);
}

// silk/decode_pitch.c.
static void DecodePitch(int lagIndex, int contourIndex, int* pitch_lags,
                        int fs_kHz, int nb_subfr) {
  const int8_t* cb;
  int cbk_size;
  if (fs_kHz == 8) {
    if (nb_subfr == kMaxSubfr) { cb = kSilkCBLagsStage2; cbk_size = 11; }
    else { cb = kSilkCBLagsStage2_10ms; cbk_size = 3; }
  } else {
    if (nb_subfr == kMaxSubfr) { cb = kSilkCBLagsStage3; cbk_size = 34; }
    else { cb = kSilkCBLagsStage3_10ms; cbk_size = 12; }
  }
  int min_lag = 2 * fs_kHz, max_lag = 18 * fs_kHz;
  int lag = min_lag + lagIndex;
  for (int k = 0; k < nb_subfr; ++k) {
    int v = lag + cb[k * cbk_size + contourIndex];
    pitch_lags[k] = imin(imax(v, min_lag), max_lag);
  }
}

// silk/decode_parameters.c.
static void DecodeParameters(Channel* c, DecCtrl* ctrl, int condCoding) {
  GainsDequant(ctrl->Gains_Q16, c->ind.GainsIndices, &c->LastGainIndex,
               condCoding == kConditional, c->nb_subfr);
  int16_t pNLSF_Q15[kMaxLpcOrder];
  NLSFDecode(pNLSF_Q15, c->ind.NLSFIndices, c->cb);
  Nlsf2a(ctrl->PredCoef_Q12[1], pNLSF_Q15, c->LPC_order);
  if (c->first_frame_after_reset) c->ind.NLSFInterpCoef_Q2 = 4;
  if (c->ind.NLSFInterpCoef_Q2 < 4) {
    int16_t pNLSF0_Q15[kMaxLpcOrder];
    for (int i = 0; i < c->LPC_order; ++i)
      pNLSF0_Q15[i] = (int16_t)(c->prevNLSF_Q15[i] +
                                ((c->ind.NLSFInterpCoef_Q2 *
                                  (pNLSF_Q15[i] - c->prevNLSF_Q15[i])) >> 2));
    Nlsf2a(ctrl->PredCoef_Q12[0], pNLSF0_Q15, c->LPC_order);
  } else {
    std::memcpy(ctrl->PredCoef_Q12[0], ctrl->PredCoef_Q12[1],
                c->LPC_order * sizeof(int16_t));
  }
  std::memcpy(c->prevNLSF_Q15, pNLSF_Q15, c->LPC_order * sizeof(int16_t));
  if (c->ind.signalType == 2) {
    DecodePitch(c->ind.lagIndex, c->ind.contourIndex, ctrl->pitchL,
                c->fs_kHz, c->nb_subfr);
    static const int8_t* const vq[3] = {kSilkLTPVQ0, kSilkLTPVQ1,
                                        kSilkLTPVQ2};
    const int8_t* cbk = vq[c->ind.PERIndex];
    for (int k = 0; k < c->nb_subfr; ++k)
      for (int i = 0; i < kLtpOrder; ++i)
        // *128, not <<7: the codebook holds negative taps and a left
        // shift of a negative int is UB (caught by the UBSAN driver).
        ctrl->LTPCoef_Q14[k * kLtpOrder + i] =
            (int16_t)((int32_t)cbk[c->ind.LTPIndex[k] * kLtpOrder + i] * 128);
    ctrl->LTP_scale_Q14 = kSilkLTPScalesQ14[c->ind.LTP_scaleIndex];
  } else {
    std::memset(ctrl->pitchL, 0, sizeof(ctrl->pitchL));
    std::memset(ctrl->LTPCoef_Q14, 0, sizeof(ctrl->LTPCoef_Q14));
    ctrl->LTP_scale_Q14 = 0;
  }
  if (Trace()) {
    std::fprintf(stderr, "params: pitchL=[%d, %d, %d, %d] gains=[%d, %d, %d, %d] scale=%d\n",
                 ctrl->pitchL[0], ctrl->pitchL[1], ctrl->pitchL[2],
                 ctrl->pitchL[3], ctrl->Gains_Q16[0], ctrl->Gains_Q16[1],
                 ctrl->Gains_Q16[2], ctrl->Gains_Q16[3],
                 ctrl->LTP_scale_Q14);
    for (int h = 0; h < 2; ++h) {
      std::fprintf(stderr, "  A%d=[", h);
      for (int i = 0; i < c->LPC_order; ++i)
        std::fprintf(stderr, "%d%s", ctrl->PredCoef_Q12[h][i],
                     i + 1 < c->LPC_order ? ", " : "]\n");
    }
    std::fprintf(stderr, "  B=[");
    for (int i = 0; i < 20; ++i)
      std::fprintf(stderr, "%d%s", ctrl->LTPCoef_Q14[i],
                   i < 19 ? ", " : "]\n");
  }
}

// silk/LPC_analysis_filter.c.
static void LpcAnalysisFilter(int16_t* out, const int16_t* in,
                              const int16_t* B, int len, int d) {
  for (int ix = d; ix < len; ++ix) {
    const int16_t* in_ptr = &in[ix - 1];
    int32_t out32_Q12 = 0;
    for (int j = 0; j < d; ++j)
      out32_Q12 = smlabb(out32_Q12, in_ptr[-j], B[j]);
    out32_Q12 =
        (int32_t)(((uint32_t)in_ptr[1] << 12) - (uint32_t)out32_Q12);
    out[ix] = sat16(rshift_round(out32_Q12, 12));
  }
  std::memset(out, 0, d * sizeof(int16_t));
}

// silk/decode_core.c.
static void DecodeCore(Channel* c, const DecCtrl* ctrl, int16_t* xq,
                       const int16_t* pulses) {
  int16_t sLTP[kMaxFrameLen];
  int32_t sLTP_Q15[2 * kMaxFrameLen];
  int32_t res_Q14[kSubfrLenMs * 16];
  int32_t sLPC_Q14[kSubfrLenMs * 16 + kMaxLpcOrder];

  int offset_Q10 =
      kSilkQuantOffsetsQ10[(c->ind.signalType >> 1) * 2 +
                           c->ind.quantOffsetType];
  int NLSF_interp = c->ind.NLSFInterpCoef_Q2 < 4;

  int32_t rand_seed = c->ind.Seed;
  for (int i = 0; i < c->frame_length; ++i) {
    rand_seed = silk_rand(rand_seed);
    int32_t v = lshift32(pulses[i], 14);
    if (v > 0) v -= 80 << 4;        // QUANT_LEVEL_ADJUST_Q10 << 4
    else if (v < 0) v += 80 << 4;
    v += offset_Q10 << 4;
    if (rand_seed < 0) v = -v;
    c->exc_Q14[i] = v;
    rand_seed = (int32_t)((uint32_t)rand_seed + (uint32_t)pulses[i]);
  }

  std::memcpy(sLPC_Q14, c->sLPC_Q14, kMaxLpcOrder * sizeof(int32_t));
  const int32_t* pexc_Q14 = c->exc_Q14;
  int16_t* pxq = xq;
  int sLTP_buf_idx = c->ltp_mem_length;
  int lag = 0;
  for (int k = 0; k < c->nb_subfr; ++k) {
    const int32_t* pres_Q14 = res_Q14;
    const int16_t* A_Q12 = ctrl->PredCoef_Q12[k >> 1];
    const int16_t* B_Q14 = &ctrl->LTPCoef_Q14[k * kLtpOrder];
    int signalType = c->ind.signalType;

    int32_t Gain_Q10 = ctrl->Gains_Q16[k] >> 6;
    int32_t inv_gain_Q31 = Inverse32VarQ(ctrl->Gains_Q16[k], 47);
    int32_t gain_adj_Q16 = 1 << 16;
    if (ctrl->Gains_Q16[k] != c->prev_gain_Q16) {
      gain_adj_Q16 = Div32VarQ(c->prev_gain_Q16, ctrl->Gains_Q16[k], 16);
      for (int i = 0; i < kMaxLpcOrder; ++i)
        sLPC_Q14[i] = smulww(gain_adj_Q16, sLPC_Q14[i]);
    }
    c->prev_gain_Q16 = ctrl->Gains_Q16[k];

    if (signalType == 2) {
      lag = ctrl->pitchL[k];
      if (k == 0 || (k == 2 && NLSF_interp)) {
        int start_idx =
            c->ltp_mem_length - lag - c->LPC_order - kLtpOrder / 2;
        if (k == 2)
          std::memcpy(&c->outBuf[c->ltp_mem_length], xq,
                      2 * c->subfr_length * sizeof(int16_t));
        LpcAnalysisFilter(&sLTP[start_idx],
                          &c->outBuf[start_idx + k * c->subfr_length],
                          A_Q12, c->ltp_mem_length - start_idx,
                          c->LPC_order);
        if (k == 0)
          inv_gain_Q31 = (int32_t)(
              (uint32_t)smulwb(inv_gain_Q31, ctrl->LTP_scale_Q14) << 2);
        for (int i = 0; i < lag + kLtpOrder / 2; ++i)
          sLTP_Q15[sLTP_buf_idx - i - 1] =
              smulwb(inv_gain_Q31, sLTP[c->ltp_mem_length - i - 1]);
      } else if (gain_adj_Q16 != 1 << 16) {
        for (int i = 0; i < lag + kLtpOrder / 2; ++i)
          sLTP_Q15[sLTP_buf_idx - i - 1] =
              smulww(gain_adj_Q16, sLTP_Q15[sLTP_buf_idx - i - 1]);
      }
    }

    if (signalType == 2) {
      const int32_t* pred_lag_ptr =
          &sLTP_Q15[sLTP_buf_idx - lag + kLtpOrder / 2];
      for (int i = 0; i < c->subfr_length; ++i) {
        int32_t LTP_pred_Q13 = 2;
        LTP_pred_Q13 = smlawb(LTP_pred_Q13, pred_lag_ptr[0], B_Q14[0]);
        LTP_pred_Q13 = smlawb(LTP_pred_Q13, pred_lag_ptr[-1], B_Q14[1]);
        LTP_pred_Q13 = smlawb(LTP_pred_Q13, pred_lag_ptr[-2], B_Q14[2]);
        LTP_pred_Q13 = smlawb(LTP_pred_Q13, pred_lag_ptr[-3], B_Q14[3]);
        LTP_pred_Q13 = smlawb(LTP_pred_Q13, pred_lag_ptr[-4], B_Q14[4]);
        pred_lag_ptr++;
        res_Q14[i] = (int32_t)((uint32_t)pexc_Q14[i] +
                               ((uint32_t)LTP_pred_Q13 << 1));
        sLTP_Q15[sLTP_buf_idx] = (int32_t)((uint32_t)res_Q14[i] << 1);
        sLTP_buf_idx++;
      }
    } else {
      pres_Q14 = pexc_Q14;
    }

    for (int i = 0; i < c->subfr_length; ++i) {
      int32_t LPC_pred_Q10 = c->LPC_order >> 1;
      for (int j = 0; j < c->LPC_order; ++j)
        LPC_pred_Q10 = smlawb(LPC_pred_Q10,
                              sLPC_Q14[kMaxLpcOrder + i - 1 - j], A_Q12[j]);
      sLPC_Q14[kMaxLpcOrder + i] =
          add_sat32(pres_Q14[i], lshift_sat32(LPC_pred_Q10, 4));
      pxq[i] = sat16(
          rshift_round(smulww(sLPC_Q14[kMaxLpcOrder + i], Gain_Q10), 8));
    }
    std::memcpy(sLPC_Q14, &sLPC_Q14[c->subfr_length],
                kMaxLpcOrder * sizeof(int32_t));
    pexc_Q14 += c->subfr_length;
    pxq += c->subfr_length;
  }
  std::memcpy(c->sLPC_Q14, sLPC_Q14, kMaxLpcOrder * sizeof(int32_t));
}

// silk/stereo_MS_to_LR.c.  x1/x2 carry a 2-sample state prefix.
struct StereoState {
  int16_t pred_prev_Q13[2] = {0, 0};
  int16_t sMid[2] = {0, 0};
  int16_t sSide[2] = {0, 0};
};

static void StereoMsToLr(StereoState* s, int16_t* x1, int16_t* x2,
                         const int32_t* pred_Q13, int fs_kHz,
                         int frame_length) {
  std::memcpy(x1, s->sMid, 2 * sizeof(int16_t));
  std::memcpy(x2, s->sSide, 2 * sizeof(int16_t));
  std::memcpy(s->sMid, &x1[frame_length], 2 * sizeof(int16_t));
  std::memcpy(s->sSide, &x2[frame_length], 2 * sizeof(int16_t));

  int32_t pred0_Q13 = s->pred_prev_Q13[0];
  int32_t pred1_Q13 = s->pred_prev_Q13[1];
  int interp_len = 8 * fs_kHz;  // STEREO_INTERP_LEN_MS
  int32_t denom_Q16 = (1 << 16) / interp_len;
  int32_t delta0 = rshift_round(
      (int32_t)(pred_Q13[0] - s->pred_prev_Q13[0]) * denom_Q16, 16);
  int32_t delta1 = rshift_round(
      (int32_t)(pred_Q13[1] - s->pred_prev_Q13[1]) * denom_Q16, 16);
  for (int n = 0; n < frame_length; ++n) {
    if (n < interp_len) {
      pred0_Q13 += delta0;
      pred1_Q13 += delta1;
    } else {
      pred0_Q13 = pred_Q13[0];
      pred1_Q13 = pred_Q13[1];
    }
    int32_t sum = (int32_t)(
        (uint32_t)((x1[n] + x1[n + 2]) +
                   (int32_t)((uint32_t)x1[n + 1] << 1)) << 9);
    sum = smlawb((int32_t)((uint32_t)x2[n + 1] << 8), sum, pred0_Q13);
    sum = smlawb(sum, (int32_t)((uint32_t)x1[n + 1] << 11), pred1_Q13);
    x2[n + 1] = sat16(rshift_round(sum, 8));
  }
  s->pred_prev_Q13[0] = (int16_t)pred_Q13[0];
  s->pred_prev_Q13[1] = (int16_t)pred_Q13[1];
  for (int n = 0; n < frame_length; ++n) {
    int32_t sum = x1[n + 1] + (int32_t)x2[n + 1];
    int32_t diff = x1[n + 1] - (int32_t)x2[n + 1];
    x1[n + 1] = sat16(sum);
    x2[n + 1] = sat16(diff);
  }
}

// ---------------------------------------------------------------------------
// The decoder object.

struct Decoder {
  int channels;  // API channels (1 or 2)
  int out_khz = 0;  // output rate in kHz; 0 = raw internal rate
  int nChannelsInternal = 0;
  Channel ch[2];
  StereoState sStereo;
  int prev_decode_only_middle = 0;
  // Per-frame synthesis output at the internal rate, with the 2-sample
  // stereo-delay prefix (dec_API.c samplesOut1_tmp layout).
  int16_t frameOut[2][2 + kMaxFrameLen];
  uint32_t final_rng = 0;
  int error = 0;

  void Reset() {
    ch[0] = Channel();
    ch[1] = Channel();
    ch[0].api_khz = ch[1].api_khz = out_khz;
    sStereo = StereoState();
    prev_decode_only_middle = 0;
    nChannelsInternal = 0;
    error = 0;
  }
};

// silk/decode_frame.c for a normally-received frame (loss concealment
// never runs in file decoding: silk_PLC/silk_CNG only alter output on
// lost packets, so their state upkeep is omitted).
static void SynthesizeFrame(Decoder* d, int n, int condCoding) {
  Channel* c = &d->ch[n];
  DecCtrl ctrl;
  DecodeParameters(c, &ctrl, condCoding);
  int16_t* xq = &d->frameOut[n][2];
  DecodeCore(c, &ctrl, xq, c->pulses);
  // outBuf keeps the last ltp_mem samples ENDING at index ltp_mem (the
  // in-frame k==2 rewhiten appends the current frame at [ltp_mem..)).
  std::memmove(c->outBuf, &c->outBuf[c->frame_length],
               (c->ltp_mem_length - c->frame_length) * sizeof(int16_t));
  std::memcpy(&c->outBuf[c->ltp_mem_length - c->frame_length], xq,
              c->frame_length * sizeof(int16_t));
  c->lagPrev = ctrl.pitchL[c->nb_subfr - 1];
  c->prevSignalType = c->ind.signalType;
  c->first_frame_after_reset = 0;
}

// Parse one SILK-only Opus frame payload.  Returns 0 or -1 on error.
static int DecodeSilkPayload(Decoder* d, EcDec* ec, int bw, int duration_ms,
                             int nCh, int16_t* out) {
  int nFrames = duration_ms <= 20 ? 1 : duration_ms / 20;
  int frame_ms = duration_ms <= 10 ? 10 : 20;
  int fs = bw == 0 ? 8 : bw == 1 ? 12 : 16;
  for (int n = 0; n < nCh; ++n) d->ch[n].SetFs(fs, frame_ms);
  if (nCh == 2 && d->nChannelsInternal == 1) {
    // Mono -> stereo switch: side channel starts fresh.
    d->ch[1] = Channel();
    d->ch[1].SetFs(fs, frame_ms);
  }
  d->nChannelsInternal = nCh;

  STRACE("payload: nFrames=%d fs=%d nCh=%d\n", nFrames, fs, nCh);
  // Header: VAD flags + LBRR flag per channel.
  for (int n = 0; n < nCh; ++n) {
    for (int i = 0; i < nFrames; ++i)
      d->ch[n].VAD_flags[i] = ec->DecodeBitLogp(1);
    d->ch[n].LBRR_flag = ec->DecodeBitLogp(1);
    for (int i = 0; i < 3; ++i) d->ch[n].LBRR_flags[i] = 0;
  }
  // Per-frame LBRR flags.
  for (int n = 0; n < nCh; ++n) {
    if (d->ch[n].LBRR_flag) {
      if (nFrames == 1) {
        d->ch[n].LBRR_flags[0] = 1;
      } else {
        int sym = ec->DecodeIcdf(
            nFrames == 2 ? kSilkLBRRFlags2 : kSilkLBRRFlags3, 8) + 1;
        for (int i = 0; i < nFrames; ++i)
          d->ch[n].LBRR_flags[i] = (sym >> i) & 1;
      }
    }
  }
  STRACE("  VAD=%d LBRR=%d tell=%d\n", d->ch[0].VAD_flags[0],
         d->ch[0].LBRR_flag, ec->Tell());
  // LBRR frames: parse and discard (keeps the range coder in sync).
  int32_t pred_Q13[2] = {0, 0};
  for (int i = 0; i < nFrames; ++i) {
    for (int n = 0; n < nCh; ++n) {
      if (!d->ch[n].LBRR_flags[i]) continue;
      if (nCh == 2 && n == 0) {
        StereoDecodePred(ec, pred_Q13);
        if (d->ch[1].LBRR_flags[i] == 0) StereoDecodeMidOnly(ec);
      }
      int cond = (i > 0 && d->ch[n].LBRR_flags[i - 1]) ? kConditional
                                                       : kIndependent;
      Indices saved = d->ch[n].ind;
      int8_t savedGain = d->ch[n].LastGainIndex;
      int savedPrevType = d->ch[n].ec_prevSignalType;
      int16_t savedPrevLag = d->ch[n].ec_prevLagIndex;
      DecodeIndices(&d->ch[n], ec, i, 1, cond);
      DecodePulses(ec, d->ch[n].pulses, d->ch[n].ind.signalType,
                   d->ch[n].ind.quantOffsetType, d->ch[n].frame_length);
      d->ch[n].ind = saved;
      d->ch[n].LastGainIndex = savedGain;
      d->ch[n].ec_prevSignalType = savedPrevType;
      d->ch[n].ec_prevLagIndex = savedPrevLag;
    }
  }
  // Regular frames.  Output: interleaved int16 at the internal rate,
  // nFrames * frame_length samples per channel (dec_API.c frame loop;
  // one iteration here = one silk_Decode call upstream).
  int frame_length = d->ch[0].frame_length;
  int out_per_frame = frame_length;
  for (int i = 0; i < nFrames; ++i) {
    int decode_only_middle = 0;
    if (nCh == 2) {
      StereoDecodePred(ec, pred_Q13);
      if (d->ch[1].VAD_flags[i] == 0)
        decode_only_middle = StereoDecodeMidOnly(ec);
      // First frame with side coding after a mid-only run: the side
      // channel's prediction memory restarts from silence.
      if (!decode_only_middle && d->prev_decode_only_middle) {
        Channel* s = &d->ch[1];
        std::memset(s->outBuf, 0, sizeof(s->outBuf));
        std::memset(s->sLPC_Q14, 0, sizeof(s->sLPC_Q14));
        s->lagPrev = 100;
        s->LastGainIndex = 10;
        s->prevSignalType = 0;
        s->first_frame_after_reset = 1;
      }
    }
    for (int n = 0; n < nCh; ++n) {
      if (n == 1 && decode_only_middle) {
        std::memset(&d->frameOut[1][2], 0, frame_length * sizeof(int16_t));
        continue;
      }
      int cond;
      if (i == 0) cond = kIndependent;
      else if (n > 0 && d->prev_decode_only_middle)
        cond = kIndependentNoLTPScale;
      else cond = kConditional;
      DecodeIndices(&d->ch[n], ec, i, 0, cond);
      DecodePulses(ec, d->ch[n].pulses, d->ch[n].ind.signalType,
                   d->ch[n].ind.quantOffsetType, d->ch[n].frame_length);
      SynthesizeFrame(d, n, cond);
      STRACE("  frame %d ch %d done tell=%d rng=%08x\n", i, n, ec->Tell(),
             ec->rng);
    }
    int API = d->channels;
    if (nCh == 2 && API == 2) {
      StereoMsToLr(&d->sStereo, d->frameOut[0], d->frameOut[1], pred_Q13,
                   d->ch[0].fs_kHz, frame_length);
    } else {
      // Mono output path (internal mono, or stereo stream mixed down to
      // the API's single channel = mid): same 1-sample delay line
      // (dec_API.c buffering).
      std::memcpy(d->frameOut[0], d->sStereo.sMid, 2 * sizeof(int16_t));
      std::memcpy(d->sStereo.sMid, &d->frameOut[0][frame_length],
                  2 * sizeof(int16_t));
    }
    d->prev_decode_only_middle = decode_only_middle;
    if (out) {
      // The resampler input starts one sample into the prefix
      // (dec_API.c passes &samplesOut1_tmp[n][1]).  A mono stream in a
      // stereo-API decoder duplicates channel 0.
      int nOut = 0;
      int nResample = imin(API, nCh);
      for (int n = 0; n < nResample; ++n) {
        int16_t chbuf[20 * 48];
        nOut = d->ch[n].resampler.Process(chbuf, &d->frameOut[n][1],
                                          frame_length);
        for (int s = 0; s < nOut; ++s)
          out[(i * nOut + s) * API + n] = chbuf[s];
      }
      if (API == 2 && nCh == 1)
        for (int s = 0; s < nOut; ++s)
          out[(i * nOut + s) * 2 + 1] = out[(i * nOut + s) * 2];
      out_per_frame = nOut;
    }
  }
  return nFrames * out_per_frame;
}

}  // namespace folve_silk

extern "C" {

// out_hz: output sample rate (48000/24000/16000/12000/8000), or 0 to
// emit PCM at each packet's internal rate (resampler in 1:1 mode, which
// still applies the reference's fixed input delay).
void* folve_silk_create(int channels, int out_hz) {
  if (channels < 1 || channels > 2) return nullptr;
  if (out_hz % 1000 || out_hz < 0 || out_hz > 48000) return nullptr;
  auto* d = new (std::nothrow) folve_silk::Decoder;
  if (!d) return nullptr;
  d->channels = channels;
  d->out_khz = out_hz / 1000;
  d->Reset();
  return d;
}

void folve_silk_reset(void* h) { ((folve_silk::Decoder*)h)->Reset(); }
void folve_silk_close(void* h) { delete (folve_silk::Decoder*)h; }

// Parse one SILK-only Opus frame payload (range-sync validation).
// bw: 0=NB 1=MB 2=WB; duration_ms in {10,20,40,60}; nCh = TOC stereo+1.
// Returns 0, with the final range state readable afterwards.
int folve_silk_parse(void* h, const uint8_t* data, int len, int bw,
                     int duration_ms, int nCh) {
  auto* d = (folve_silk::Decoder*)h;
  folve_opus::EcDec ec;
  ec.Init(data, (uint32_t)len);
  int r = folve_silk::DecodeSilkPayload(d, &ec, bw, duration_ms, nCh,
                                        nullptr);
  d->final_rng = ec.rng;
  return r < 0 ? r : 0;
}

// Decode one SILK-only Opus frame payload to PCM at the INTERNAL rate
// (8/12/16 kHz per bw), interleaved int16.  Returns samples per channel
// or <0 on error.  `out` must hold nFrames*frame_length*nCh samples
// (max 3*320*2).
int folve_silk_decode(void* h, const uint8_t* data, int len, int bw,
                      int duration_ms, int nCh, int16_t* out) {
  auto* d = (folve_silk::Decoder*)h;
  folve_opus::EcDec ec;
  ec.Init(data, (uint32_t)len);
  int r = folve_silk::DecodeSilkPayload(d, &ec, bw, duration_ms, nCh, out);
  d->final_rng = ec.rng;
  return r;
}

uint32_t folve_silk_final_range(void* h) {
  return ((folve_silk::Decoder*)h)->final_rng;
}

// Payload decode continuing an EXTERNAL range decoder (hybrid frames
// share one coder between the SILK and CELT layers; the Opus packet
// layer in native/opus_api.cc owns it).  `ec` is a folve_opus::EcDec*.
// Returns samples per channel written (at the decoder's output rate),
// or <0 on error; `out` may be null for parse-only.
int folve_silk_decode_ec(void* h, void* ec, int bw, int duration_ms,
                         int nCh, int16_t* out) {
  auto* d = (folve_silk::Decoder*)h;
  if (bw < 0 || bw > 2 || nCh < 1 || nCh > 2) return -1;
  if (duration_ms != 10 && duration_ms != 20 && duration_ms != 40 &&
      duration_ms != 60)
    return -1;
  int r = folve_silk::DecodeSilkPayload(d, (folve_opus::EcDec*)ec, bw,
                                        duration_ms, nCh, out);
  d->final_rng = ((folve_opus::EcDec*)ec)->rng;
  return r;
}

}  // extern "C"

