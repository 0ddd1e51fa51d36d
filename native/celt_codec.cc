// Opus CELT decoder (RFC 6716 section 4.3) — from scratch.
//
// The reference convolves anything libsndfile decodes; modern
// libsndfile decodes Ogg Opus via libopus.  The RFC text (which holds
// the trained model tables) is unreachable offline, so the tables were
// extracted from the libopus test-oracle binary by
// tools/gen_celt_tables.py (same route that recovered the NMS ADPCM
// predictor) and the algorithm is reconstructed from the spec's
// structure: range decoder, coarse/fine band energy (2-D Laplace
// model), bit allocation (cached PVQ costs, trim, skip, intensity),
// per-band PVQ shape decoding (CWRS), transient handling with per-band
// time-frequency resolution, anti-collapse, low-overlap inverse MDCT,
// the comb post-filter and de-emphasis.
//
// Scope: CELT-only mode packets (TOC configs 16..31), mono or stereo,
// all frame sizes (2.5/5/10/20 ms).  SILK and hybrid configs are
// rejected at open (the caller falls back to pass-through, keeping the
// "never serve mis-decoded audio" policy).  Validated against the
// libopus oracle in tests/test_opus.py.

#include <atomic>
#include <cassert>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <mutex>
#include <new>

#include "opus_shared.h"
#include "smallfft.h"

namespace folve_celt {

#include "celt_tables.inc"

using folve_opus::EcDec;

// ec_laplace_decode (celt/laplace.c).
static int LaplaceDecode(EcDec* ec, unsigned fs, int decay) {
  const unsigned kMinP = 1;
  const int kNMin = 16;
  int val = 0;
  unsigned fl = 0;
  unsigned fm = ec->Decode(32768);
  if (fm >= fs) {
    val++;
    fl = fs;
    fs = ((32768 - kMinP * (2 * kNMin) - fs) * (uint32_t)(16384 - decay) >>
          15) + kMinP;
    while (fs > kMinP && fm >= fl + 2 * fs) {
      fs *= 2;
      fl += fs;
      fs = ((fs - 2 * kMinP) * (uint32_t)decay) >> 15;
      fs += kMinP;
      val++;
    }
    if (fs <= kMinP) {
      int di = (fm - fl) >> 1;
      val += di;
      fl += 2 * di * kMinP;
    }
    if (fm < fl + fs)
      val = -val;
    else
      fl += fs;
  }
  unsigned fh = fl + fs < 32768 ? fl + fs : 32768;
  ec->Update(fl, fh, 32768);
  return val;
}

// ---------------------------------------------------------------------------
// Mode constants (48 kHz, 960-sample mode).

constexpr int kNbEBands = 21;
constexpr int kShortMdct = 120;
constexpr int kOverlap = 120;
constexpr int kMaxLM = 3;
constexpr int kMaxPeriod = 1024;
constexpr int kMinPeriod = 15;
constexpr int BITRES = 3;

static const float kEMeans[21] = {
    6.437500f, 6.250000f, 5.750000f, 5.312500f, 5.062500f, 4.812500f,
    4.500000f, 4.375000f, 4.875000f, 4.687500f, 4.562500f, 4.437500f,
    4.875000f, 4.625000f, 4.312500f, 4.500000f, 4.375000f, 4.625000f,
    4.750000f, 4.437500f, 3.750000f};

static const float kPredCoef[4] = {29440.f / 32768, 26112.f / 32768,
                                   21248.f / 32768, 16384.f / 32768};
static const float kBetaCoef[4] = {30147.f / 32768, 22282.f / 32768,
                                   12124.f / 32768, 6554.f / 32768};
static const float kBetaIntra = 4915.f / 32768;

static const int8_t kTfSelect[4][8] = {
    {0, -1, 0, -1, 0, -1, 0, -1},
    {0, -1, 0, -2, 1, 0, 1, -1},
    {0, -2, 0, -3, 2, 0, 1, -1},
    {0, -2, 0, -3, 3, 0, 1, -1}};

static const uint8_t kSpreadIcdf[4] = {25, 23, 2, 0};
static const uint8_t kTapsetIcdf[3] = {2, 1, 0};
static const uint8_t kTrimIcdf[11] = {126, 124, 119, 109, 87, 41,
                                      19,  9,   4,   2,   0};
static const uint8_t kSmallEnergyIcdf[3] = {2, 1, 0};

// Post-filter tap gains per tapset.
static const float kPfGains[3][3] = {
    {0.3066406250f, 0.2170410156f, 0.1296386719f},
    {0.4638671875f, 0.2680664062f, 0.f},
    {0.7998046875f, 0.1000976562f, 0.f}};

static inline int imin(int a, int b) { return a < b ? a : b; }
static inline int imax(int a, int b) { return a > b ? a : b; }

// ---------------------------------------------------------------------------
// PVQ combinatorics: U(n,k) table (computed, not stored; V(N,K) < 2^32
// for every (N,K) the allocation can produce).

constexpr int kMaxN = 210;
constexpr int kMaxK = 180;
static uint64_t* g_u = nullptr;  // [kMaxN+1][kMaxK+2]

static void InitU() {
  if (g_u) return;
  uint64_t* u = new uint64_t[(size_t)(kMaxN + 1) * (kMaxK + 2)];
  auto at = [u](int n, int k) -> uint64_t& {
    return u[(size_t)n * (kMaxK + 2) + k];
  };
  const uint64_t kCap = ~(uint64_t)0 >> 1;
  for (int k = 0; k <= kMaxK + 1; ++k) at(0, k) = 0;
  at(0, 0) = 1;
  for (int n = 1; n <= kMaxN; ++n) {
    at(n, 0) = 0;  // U(n,0) = 0
    at(n, 1) = 1;
    for (int k = 2; k <= kMaxK + 1; ++k) {
      uint64_t v = at(n - 1, k) + at(n - 1, k - 1) + at(n, k - 1);
      at(n, k) = v > kCap ? kCap : v;
    }
  }
  // U(1,k) = 1 for k >= 1; U(n,1) = 1 — the recurrence above builds
  // from U(0,·) = delta and matches the RFC's U.
  g_u = u;
}

static inline uint64_t U(int n, int k) {
  if (k < 0) return 0;
  if (k == 0) return n == 0 ? 1 : 0;
  if (n > kMaxN || k > kMaxK + 1) return ~(uint64_t)0 >> 1;
  return g_u[(size_t)n * (kMaxK + 2) + k];
}

static inline uint32_t Vnk(int n, int k) {
  uint64_t v = U(n, k) + U(n, k + 1);
  return (uint32_t)v;
}

// RFC 6716 4.3.4.4 index -> pulse vector.
static void Cwrsi(int n, int k, uint32_t i, int* y) {
  while (n > 1) {
    if (n == 2) {
      uint32_t p = 2 * (uint32_t)k + 1;
      int s = -(int)(i >= p);
      i -= p & (uint32_t)s;
      int yj = (int)((i + 1) >> 1);
      if (yj) i -= 2 * (uint32_t)yj - 1;
      *y++ = ((k - yj) + s) ^ s;
      k = yj;
      n = 1;
      break;
    }
    uint32_t p = (uint32_t)U(n, k + 1);
    int s = -(int)(i >= p);
    i -= p & (uint32_t)s;
    int k0 = k;
    p = (uint32_t)U(n, k);
    while (p > i) p = (uint32_t)U(n, --k);
    i -= p;
    int val = (k0 - k + s) ^ s;
    *y++ = val;
    n--;
  }
  // n == 1: remaining pulses with sign from i (i is 0 or 1).
  int s = -(int)i;
  *y = (k + s) ^ s;
}

// ---------------------------------------------------------------------------
// Rate allocation (celt/rate.c).

static inline int GetPulses(int i) {
  return i < 8 ? i : (8 + (i & 7)) << ((i >> 3) - 1);
}

static const uint8_t* BandCache(int lm, int band) {
  int idx = kCacheIndex[(lm + 1) * kNbEBands + band];
  return idx < 0 ? nullptr : kCacheBits + idx;
}

static int Bits2Pulses(const uint8_t* cache, int bits) {
  bits--;
  int lo = 0, hi = cache[0];
  for (int i = 0; i < 6; ++i) {
    int mid = (lo + hi + 1) >> 1;
    if ((int)cache[mid] >= bits)
      hi = mid;
    else
      lo = mid;
  }
  if (bits - (lo == 0 ? -1 : (int)cache[lo]) <= (int)cache[hi] - bits)
    return lo;
  return hi;
}

static int Pulses2Bits(const uint8_t* cache, int pulses) {
  return pulses == 0 ? 0 : cache[pulses] + 1;
}

struct AllocOut {
  int pulses[kNbEBands];
  int fine_quant[kNbEBands];
  int fine_priority[kNbEBands];
  int coded_bands;
  int balance;
  int intensity;
  int dual_stereo;
};

// interp_bits2pulses (decode side).
static int InterpBits2Pulses(int start, int end, int skip_start,
                             const int* bits1, const int* bits2,
                             const int* thresh, const int* cap, int total,
                             int32_t* balance, int skip_rsv, int* intensity,
                             int intensity_rsv, int* dual_stereo,
                             int dual_stereo_rsv, int* bits, int* ebits,
                             int* fine_priority, int C, int LM, EcDec* ec,
                             int prev) {
  (void)prev;
  const int alloc_floor = C << BITRES;
  int stereo = C > 1 ? 1 : 0;
  int logM = LM << BITRES;
  int lo = 0, hi = 1 << 6;
  for (int i = 0; i < 6; ++i) {
    int mid = (lo + hi) >> 1;
    int psum = 0;
    int done = 0;
    for (int j = end; j-- > start;) {
      int tmp = bits1[j] + ((int32_t)mid * bits2[j] >> 6);
      if (tmp >= thresh[j] || done) {
        done = 1;
        psum += imin(tmp, cap[j]);
      } else if (tmp >= alloc_floor) {
        psum += alloc_floor;
      }
    }
    if (psum > total)
      hi = mid;
    else
      lo = mid;
  }
  int psum = 0;
  int done = 0;
  for (int j = end; j-- > start;) {
    int tmp = bits1[j] + ((int32_t)lo * bits2[j] >> 6);
    if (tmp < thresh[j] && !done) {
      if (tmp >= alloc_floor)
        tmp = alloc_floor;
      else
        tmp = 0;
    } else {
      done = 1;
    }
    tmp = imin(tmp, cap[j]);
    bits[j] = tmp;
    psum += tmp;
  }

  // Decide how many bands to skip.
  int codedBands;
  for (codedBands = end;; codedBands--) {
    int j = codedBands - 1;
    if (j <= skip_start) {
      total += skip_rsv;
      break;
    }
    int left = total - psum;
    int N = kEBands[codedBands] - kEBands[start];
    int perband = left / N;
    left -= N * perband;
    int rem = imax(left - (kEBands[j] - kEBands[start]), 0);
    int band_width = kEBands[codedBands] - kEBands[j];
    int band_bits = bits[j] + perband * band_width + rem;
    if (band_bits >= imax(thresh[j], alloc_floor + (1 << BITRES))) {
      if (ec->DecodeBitLogp(1)) break;
      psum += 1 << BITRES;
      band_bits -= 1 << BITRES;
    }
    psum -= bits[j] + intensity_rsv;
    if (intensity_rsv > 0)
      intensity_rsv = kLog2FracTable[j - start];
    psum += intensity_rsv;
    if (band_bits >= alloc_floor) {
      psum += alloc_floor;
      bits[j] = alloc_floor;
    } else {
      bits[j] = 0;
    }
  }

  if (intensity_rsv > 0)
    *intensity = start + (int)ec->DecodeUint(codedBands + 1 - start);
  else
    *intensity = 0;
  if (*intensity <= start) {
    total += dual_stereo_rsv;
    dual_stereo_rsv = 0;
  }
  if (dual_stereo_rsv > 0)
    *dual_stereo = ec->DecodeBitLogp(1);
  else
    *dual_stereo = 0;

  // Allocate what's left over.
  int left = total - psum;
  int N0 = kEBands[codedBands] - kEBands[start];
  int perband = left / N0;
  left -= N0 * perband;
  for (int j = start; j < codedBands; ++j)
    bits[j] += perband * (kEBands[j + 1] - kEBands[j]);
  for (int j = start; j < codedBands; ++j) {
    int tmp = imin(left, kEBands[j + 1] - kEBands[j]);
    bits[j] += tmp;
    left -= tmp;
  }

  int32_t bal = 0;
  for (int j = start; j < codedBands; ++j) {
    int N = (kEBands[j + 1] - kEBands[j]) << LM;
    int bit = bits[j] + bal;
    int excess = 0;
    if (N > 1) {
      excess = imax(bit - cap[j], 0);
      bits[j] = bit - excess;
      int den = C * N + (C == 2 && N > 2 && !*dual_stereo && j < *intensity
                             ? 1
                             : 0);
      int NClogN = den * (kLogN[j] + logM);
      int offset = (NClogN >> 1) - den * 21;  // FINE_OFFSET = 21
      if (N == 2) offset += den << BITRES >> 2;
      if (bits[j] + offset < (den << BITRES) * 2)
        offset += NClogN >> 2;
      else if (bits[j] + offset < (den << BITRES) * 3)
        offset += NClogN >> 3;
      ebits[j] = imax(0, bits[j] + offset + (den << (BITRES - 1)));
      ebits[j] = ebits[j] / den >> BITRES;
      if (C * ebits[j] > (bits[j] >> BITRES)) ebits[j] = bits[j] >> stereo >> BITRES;
      ebits[j] = imin(ebits[j], 8);  // MAX_FINE_BITS
      fine_priority[j] = ebits[j] * (den << BITRES) >= bits[j] + offset;
      bits[j] -= C * ebits[j] << BITRES;
    } else {
      excess = imax(0, bit - (C << BITRES));
      bits[j] = bit - excess;
      ebits[j] = 0;
      fine_priority[j] = 1;
    }
    if (excess > 0) {
      int extra_fine = imin(excess >> (stereo + BITRES), 8 - ebits[j]);
      ebits[j] += extra_fine;
      int extra_bits = extra_fine * C << BITRES;
      fine_priority[j] = extra_bits >= excess - bal;
      excess -= extra_bits;
    }
    bal = excess;
  }
  *balance = bal;

  for (int j = codedBands; j < end; ++j) {
    ebits[j] = bits[j] >> stereo >> BITRES;
    bits[j] = 0;
    fine_priority[j] = ebits[j] < 1;
  }
  return codedBands;
}

static int ComputeAllocation(int start, int end, const int* offsets,
                             const int* cap, int alloc_trim, int* intensity,
                             int* dual_stereo, int total, int32_t* balance,
                             int* pulses, int* ebits, int* fine_priority,
                             int C, int LM, EcDec* ec) {
  total = imax(total, 0);
  int len = kNbEBands;
  int skip_start = start;
  int skip_rsv = total >= (1 << BITRES) ? 1 << BITRES : 0;
  total -= skip_rsv;
  int intensity_rsv = 0, dual_stereo_rsv = 0;
  if (C == 2) {
    intensity_rsv = kLog2FracTable[end - start];
    if (intensity_rsv > total) {
      intensity_rsv = 0;
    } else {
      total -= intensity_rsv;
      dual_stereo_rsv = total >= (1 << BITRES) ? 1 << BITRES : 0;
      total -= dual_stereo_rsv;
    }
  }
  int bits1[kNbEBands], bits2[kNbEBands], thresh[kNbEBands],
      trim_offset[kNbEBands];
  for (int j = start; j < end; ++j) {
    int width = kEBands[j + 1] - kEBands[j];
    thresh[j] = imax(C << BITRES, ((3 * width << LM) << BITRES) >> 4);
    trim_offset[j] = C * width * (alloc_trim - 5 - LM) * (end - j - 1) *
                     (1 << (LM + BITRES)) >> 6;
    if ((width << LM) == 1) trim_offset[j] -= C << BITRES;
  }
  int lo = 1, hi = 11 - 1;  // kBandAlloc has 11 rows
  do {
    int done = 0;
    int psum = 0;
    int mid = (lo + hi) >> 1;
    for (int j = end; j-- > start;) {
      int width = kEBands[j + 1] - kEBands[j];
      int bitsj = (C * width * kBandAlloc[mid * len + j] << LM) >> 2;
      if (bitsj > 0) bitsj = imax(0, bitsj + trim_offset[j]);
      bitsj += offsets[j];
      if (bitsj >= thresh[j] || done) {
        done = 1;
        psum += imin(bitsj, cap[j]);
      } else if (bitsj >= C << BITRES) {
        psum += C << BITRES;
      }
    }
    if (psum > total)
      hi = mid - 1;
    else
      lo = mid + 1;
  } while (lo <= hi);
  int q_lo = lo - 1, q_hi = lo;
  for (int j = start; j < end; ++j) {
    int width = kEBands[j + 1] - kEBands[j];
    int bits1j = (C * width * kBandAlloc[q_lo * len + j] << LM) >> 2;
    int bits2j = q_hi >= 11
                     ? cap[j]
                     : (C * width * kBandAlloc[q_hi * len + j] << LM) >> 2;
    if (bits1j > 0) bits1j = imax(0, bits1j + trim_offset[j]);
    if (bits2j > 0) bits2j = imax(0, bits2j + trim_offset[j]);
    if (q_lo > 0) bits1j += offsets[j];
    bits2j += offsets[j];
    if (offsets[j] > 0) skip_start = j;
    bits2j = imax(0, bits2j - bits1j);
    bits1[j] = bits1j;
    bits2[j] = bits2j;
  }
  return InterpBits2Pulses(start, end, skip_start, bits1, bits2, thresh, cap,
                           total, balance, skip_rsv, intensity, intensity_rsv,
                           dual_stereo, dual_stereo_rsv, pulses, ebits,
                           fine_priority, C, LM, ec, 0);
}

// ---------------------------------------------------------------------------
// Band shapes (celt/bands.c, decode side).

static inline uint32_t LcgRand(uint32_t seed) {
  return 1664525u * seed + 1013904223u;
}

static int16_t BitexactCos(int16_t x) {
  int32_t tmp = (4096 + (int32_t)x * x) >> 13;
  int16_t x2 = (int16_t)tmp;
  x2 = (int16_t)((32767 - x2) +
                 ((16384 + x2 * (int32_t)(-7651 +
                    ((16384 + x2 * (int32_t)(8277 +
                       ((16384 + (int32_t)(-626) * x2) >> 15))) >> 15))) >>
                  15));
  return (int16_t)(1 + x2);
}

static int BitexactLog2Tan(int isin, int icos) {
  int lc = EcDec::Ilog((uint32_t)icos);
  int ls = EcDec::Ilog((uint32_t)isin);
  icos <<= 15 - lc;
  isin <<= 15 - ls;
  auto frac = [](int32_t a, int32_t b) { return (16384 + a * b) >> 15; };
  return (ls - lc) * (1 << 11) + frac(isin, frac(isin, -2597) + 7932) -
         frac(icos, frac(icos, -2597) + 7932);
}

static void ExpRotation1(float* X, int len, int stride, float c, float s) {
  float ms = -s;
  float* Xptr = X;
  for (int i = 0; i < len - stride; ++i) {
    float x1 = Xptr[0];
    float x2 = Xptr[stride];
    Xptr[stride] = c * x2 + s * x1;
    *Xptr++ = c * x1 + ms * x2;
  }
  Xptr = X + (len - 2 * stride - 1);
  for (int i = len - 2 * stride - 1; i >= 0; --i) {
    float x1 = Xptr[0];
    float x2 = Xptr[stride];
    Xptr[stride] = c * x2 + s * x1;
    *Xptr-- = c * x1 + ms * x2;
  }
}

static void ExpRotation(float* X, int len, int dir, int stride, int K,
                        int spread) {
  static const int kSpreadFactor[3] = {15, 10, 5};
  if (2 * K >= len || spread == 0) return;  // SPREAD_NONE
  int factor = kSpreadFactor[spread - 1];
  float gain = (float)len / (float)(len + factor * K);
  float theta = 0.5f * gain * gain;
  float c = std::cos(0.5f * (float)M_PI * theta);
  float s = std::cos(0.5f * (float)M_PI * (1.0f - theta));
  int stride2 = 0;
  if (len >= 8 * stride) {
    stride2 = 1;
    while ((stride2 * stride2 + stride2) * stride + (stride >> 2) < len)
      stride2++;
  }
  len /= stride;
  for (int i = 0; i < stride; ++i) {
    if (dir < 0) {
      if (stride2) ExpRotation1(X + i * len, len, stride2, s, c);
      ExpRotation1(X + i * len, len, 1, c, s);
    } else {
      ExpRotation1(X + i * len, len, 1, c, -s);
      if (stride2) ExpRotation1(X + i * len, len, stride2, s, -c);
    }
  }
}

static unsigned ExtractCollapseMask(const int* y, int N, int B) {
  if (B <= 1) return 1;
  unsigned mask = 0;
  int N0 = N / B;
  for (int i = 0; i < B; ++i) {
    unsigned tmp = 0;
    for (int j = 0; j < N0; ++j) tmp |= (unsigned)std::abs(y[i * N0 + j]);
    mask |= (tmp ? 1u : 0u) << i;
  }
  return mask;
}

static void RenormaliseVector(float* X, int N, float gain) {
  float E = 1e-15f;
  for (int i = 0; i < N; ++i) E += X[i] * X[i];
  float g = gain / std::sqrt(E);
  for (int i = 0; i < N; ++i) X[i] *= g;
}

static unsigned AlgUnquant(float* X, int N, int K, int spread, int B,
                           EcDec* ec, float gain) {
  int y[210];
  uint32_t idx = ec->DecodeUint(Vnk(N, K));
  Cwrsi(N, K, idx, y);
  float Ryy = 0;
  for (int i = 0; i < N; ++i) Ryy += (float)y[i] * y[i];
  float g = gain / std::sqrt(Ryy);
  for (int i = 0; i < N; ++i) X[i] = g * y[i];
  ExpRotation(X, N, -1, B, K, spread);
  return ExtractCollapseMask(y, N, B);
}

// Haar transform / Hadamard reordering used for TF resolution changes.
static void Haar1(float* X, int N0, int stride) {
  N0 >>= 1;
  for (int i = 0; i < stride; ++i)
    for (int j = 0; j < N0; ++j) {
      float tmp1 = 0.70710678f * X[stride * 2 * j + i];
      float tmp2 = 0.70710678f * X[stride * (2 * j + 1) + i];
      X[stride * 2 * j + i] = tmp1 + tmp2;
      X[stride * (2 * j + 1) + i] = tmp1 - tmp2;
    }
}

// ordery_table per B0 (celt/bands.c).
static const int* OrderY(int B0) {
  static const int t2[] = {1, 0};
  static const int t4[] = {3, 0, 2, 1};
  static const int t8[] = {7, 0, 4, 3, 6, 1, 5, 2};
  static const int t16[] = {15, 0, 8, 7, 12, 3, 11, 4,
                            14, 1, 9, 6, 13, 2, 10, 5};
  switch (B0) {
    case 2: return t2;
    case 4: return t4;
    case 8: return t8;
    default: return t16;
  }
}

static void DeinterleaveHadamard(float* X, int N0, int stride, int hadamard) {
  float tmp[960];
  int N = N0 * stride;
  if (hadamard) {
    const int* ordery = OrderY(stride);
    for (int i = 0; i < stride; ++i)
      for (int j = 0; j < N0; ++j)
        tmp[ordery[i] * N0 + j] = X[j * stride + i];
  } else {
    for (int i = 0; i < stride; ++i)
      for (int j = 0; j < N0; ++j) tmp[i * N0 + j] = X[j * stride + i];
  }
  std::memcpy(X, tmp, N * sizeof(float));
}

static void InterleaveHadamard(float* X, int N0, int stride, int hadamard) {
  float tmp[960];
  int N = N0 * stride;
  if (hadamard) {
    const int* ordery = OrderY(stride);
    for (int i = 0; i < stride; ++i)
      for (int j = 0; j < N0; ++j)
        tmp[j * stride + i] = X[ordery[i] * N0 + j];
  } else {
    for (int i = 0; i < stride; ++i)
      for (int j = 0; j < N0; ++j) tmp[j * stride + i] = X[i * N0 + j];
  }
  std::memcpy(X, tmp, N * sizeof(float));
}

struct BandCtx {
  int i;             // band index
  int intensity;
  int spread;
  int tf_change;
  EcDec* ec;
  int32_t remaining_bits;
  const float* bandE;  // [2*kNbEBands]
  uint32_t seed;
  int LM0_band_bits;   // unused
  int disable_inv;
  int avoid_split_noise;
};

struct SplitCtx {
  int inv;
  int imid;
  int iside;
  int delta;
  int itheta;
  int qalloc;
};

static int ComputeQn(int N, int b, int offset, int pulse_cap, int stereo) {
  static const int16_t exp2_table8[8] = {16384, 17866, 19483, 21247,
                                         23170, 25267, 27554, 30048};
  int N2 = 2 * N - 1;
  if (stereo && N == 2) N2--;
  int qb = (b + N2 * offset) / N2;
  qb = imin(b - pulse_cap - (4 << BITRES), qb);
  qb = imin(8 << BITRES, qb);
  int qn;
  if (qb < (1 << BITRES >> 1)) {
    qn = 1;
  } else {
    qn = exp2_table8[qb & 0x7] >> (14 - (qb >> 3));
    qn = ((qn + 1) >> 1) << 1;
  }
  return qn;
}

static uint32_t Isqrt32(uint32_t val) {
  uint32_t g = 0;
  int bshift = (EcDec::Ilog(val) - 1) >> 1;
  uint32_t b = 1u << bshift;
  do {
    uint32_t t = (uint32_t)((g << 1) + b) << bshift;
    if (t <= val) {
      g += b;
      val -= t;
    }
    b >>= 1;
    bshift--;
  } while (bshift >= 0);
  return g;
}

static void ComputeTheta(BandCtx* ctx, SplitCtx* sctx, float* X, float* Y,
                         int N, int* b, int B, int B0, int LM, int stereo,
                         int* fill) {
  (void)X; (void)Y;
  int qn, itheta = 0;
  int inv = 0;
  EcDec* ec = ctx->ec;
  int i = ctx->i;
  int intensity = ctx->intensity;

  int pulse_cap = kLogN[i] + LM * (1 << BITRES);
  int offset =
      (pulse_cap >> 1) - (stereo && N == 2 ? 16 : 4);  // QTHETA_OFFSET(S)
  qn = ComputeQn(N, *b, offset, pulse_cap, stereo);
  if (stereo && i >= intensity) qn = 1;
  int tell = ec->TellFrac();
  if (qn != 1) {
    // Entropy decode itheta.
    if (stereo && N > 2) {
      int p0 = 3;
      int x0 = qn / 2;
      uint32_t ft = (uint32_t)(p0 * (x0 + 1) + x0);
      uint32_t fs = ec->Decode(ft);
      int x;
      if (fs < (uint32_t)((x0 + 1) * p0))
        x = (int)(fs / (uint32_t)p0);
      else
        x = x0 + 1 + (int)(fs - (uint32_t)((x0 + 1) * p0));
      uint32_t fl = x <= x0 ? (uint32_t)(p0 * x)
                            : (uint32_t)((x - 1 - x0) + (x0 + 1) * p0);
      uint32_t fh = x <= x0 ? (uint32_t)(p0 * (x + 1))
                            : (uint32_t)((x - x0) + (x0 + 1) * p0);
      ec->Update(fl, fh, ft);
      itheta = x;
    } else if (B0 > 1 || stereo) {
      itheta = (int)ec->DecodeUint((uint32_t)qn + 1);
    } else {
      int fs = 1;
      uint32_t ft = (uint32_t)(((qn >> 1) + 1) * ((qn >> 1) + 1));
      uint32_t fm = ec->Decode(ft);
      uint32_t fl;
      if (fm < (uint32_t)(((qn >> 1) * ((qn >> 1) + 1)) >> 1)) {
        itheta = (int)((Isqrt32(8 * fm + 1) - 1) >> 1);
        fs = itheta + 1;
        fl = (uint32_t)(itheta * (itheta + 1)) >> 1;
      } else {
        itheta = (int)((2 * (qn + 1) - Isqrt32(8 * (ft - fm - 1) + 1)) >> 1);
        fs = qn + 1 - itheta;
        fl = ft - (uint32_t)((qn + 1 - itheta) * (qn + 2 - itheta) >> 1);
      }
      ec->Update(fl, fl + (uint32_t)fs, ft);
    }
    itheta = (int)((int64_t)itheta * 16384 / qn);
    if (stereo && N > 2) {
      // Intensity stereo headroom: nothing to do on decode.
    }
  } else if (stereo) {
    if (*b > 2 << BITRES && ctx->remaining_bits > 2 << BITRES &&
        !ctx->disable_inv)
      inv = ec->DecodeBitLogp(2);
    itheta = 0;
  }
  int qalloc = ec->TellFrac() - tell;
  *b -= qalloc;

  int imid, iside, delta;
  if (itheta == 0) {
    imid = 32767;
    iside = 0;
    *fill &= (1 << B) - 1;
    delta = -16384;
  } else if (itheta == 16384) {
    imid = 0;
    iside = 32767;
    *fill &= ((1 << B) - 1) << B;
    delta = 16384;
  } else {
    imid = BitexactCos((int16_t)itheta);
    iside = BitexactCos((int16_t)(16384 - itheta));
    delta = (int)((16384 + ((int32_t)(N - 1) << 7) *
                               BitexactLog2Tan(iside, imid)) >> 15);
  }
  sctx->inv = inv;
  sctx->imid = imid;
  sctx->iside = iside;
  sctx->delta = delta;
  sctx->itheta = itheta;
  sctx->qalloc = qalloc;
}

// Recursive mono partition (celt/bands.c quant_partition).
static unsigned QuantPartition(BandCtx* ctx, float* X, int N, int b, int B,
                               float* lowband, int LM, float gain, int fill) {
  EcDec* ec = ctx->ec;
  int i = ctx->i;
  unsigned cm = 0;
  const uint8_t* cache = BandCache(LM, i);
  if (LM != -1 && cache && b > (int)cache[cache[0]] + 12 && N > 2) {
    int B0 = B;
    N >>= 1;
    float* Y = X + N;
    LM -= 1;
    if (B == 1) fill = (fill & 1) | (fill << 1);
    B = (B + 1) >> 1;
    SplitCtx sctx;
    ComputeTheta(ctx, &sctx, X, Y, N, &b, B, B0, LM, 0, &fill);
    int delta = sctx.delta, itheta = sctx.itheta;
    float mid = (1.f / 32768) * sctx.imid;
    float side = (1.f / 32768) * sctx.iside;

    // Give more bits to low-energy MDCTs than they would otherwise
    // deserve (pre-echo / forward-masking heuristic, normative).
    if (B0 > 1 && (itheta & 0x3fff)) {
      if (itheta > 8192)
        delta -= delta >> (4 - LM);
      else
        delta = imin(0, delta + (N << BITRES >> (5 - LM)));
    }
    int mbits = imax(0, imin(b, (b - delta) / 2));
    int sbits = b - mbits;
    ctx->remaining_bits -= sctx.qalloc;
    float* next_lowband2 = lowband ? lowband + N : nullptr;
    int32_t rebalance = ctx->remaining_bits;
    if (mbits >= sbits) {
      cm = QuantPartition(ctx, X, N, mbits, B, lowband, LM, gain * mid,
                          fill);
      rebalance = mbits - (rebalance - ctx->remaining_bits);
      if (rebalance > 3 << BITRES && itheta != 0)
        sbits += rebalance - (3 << BITRES);
      cm |= QuantPartition(ctx, Y, N, sbits, B, next_lowband2, LM,
                           gain * side, fill >> B)
            << (B0 >> 1);
    } else {
      cm = QuantPartition(ctx, Y, N, sbits, B, next_lowband2, LM,
                          gain * side, fill >> B)
           << (B0 >> 1);
      rebalance = sbits - (rebalance - ctx->remaining_bits);
      if (rebalance > 3 << BITRES && itheta != 16384)
        mbits += rebalance - (3 << BITRES);
      cm |= QuantPartition(ctx, X, N, mbits, B, lowband, LM, gain * mid,
                           fill);
    }
  } else {
    // Leaf: PVQ shape.
    int q = 0;
    if (cache) {
      q = Bits2Pulses(cache, b);
      int curr_bits = Pulses2Bits(cache, q);
      ctx->remaining_bits -= curr_bits;
      while (ctx->remaining_bits < 0 && q > 0) {
        ctx->remaining_bits += curr_bits;
        q--;
        curr_bits = Pulses2Bits(cache, q);
        ctx->remaining_bits -= curr_bits;
      }
    }
    if (q != 0) {
      int K = GetPulses(q);
      cm = AlgUnquant(X, N, K, ctx->spread, B, ec, gain);
    } else {
      // No pulses: fold from the lower spectrum or noise-fill.
      unsigned cm_mask = (1u << B) - 1;
      fill &= (int)cm_mask;
      if (!fill) {
        std::memset(X, 0, N * sizeof(float));
      } else {
        if (lowband == nullptr) {
          for (int j = 0; j < N; ++j) {
            ctx->seed = LcgRand(ctx->seed);
            X[j] = (float)((int32_t)ctx->seed >> 20);
          }
          cm = cm_mask;
        } else {
          for (int j = 0; j < N; ++j) {
            ctx->seed = LcgRand(ctx->seed);
            float tmp = (ctx->seed & 0x8000) ? 1.0f / 256 : -1.0f / 256;
            X[j] = lowband[j] + tmp;
          }
          cm = (unsigned)fill;
        }
        RenormaliseVector(X, N, gain);
      }
    }
  }
  return cm;
}

static unsigned QuantBandN1(BandCtx* ctx, float* X, float* Y,
                            float* lowband_out) {
  float* x = X;
  int c = 0;
  do {
    int sign = 0;
    if (ctx->remaining_bits >= 1 << BITRES) {
      sign = (int)ctx->ec->DecodeBits(1);
      ctx->remaining_bits -= 1 << BITRES;
    }
    x[0] = sign ? -1.f : 1.f;
    x = Y;
  } while (++c < 1 + (Y != nullptr ? 1 : 0));
  if (lowband_out) lowband_out[0] = X[0];
  return 1;
}

static const uint8_t kBitInterleave[16] = {0, 1, 1, 1, 2, 3, 3, 3,
                                           2, 3, 3, 3, 2, 3, 3, 3};
static const uint8_t kBitDeinterleave[16] = {0x00, 0x03, 0x0C, 0x0F,
                                             0x30, 0x33, 0x3C, 0x3F,
                                             0xC0, 0xC3, 0xCC, 0xCF,
                                             0xF0, 0xF3, 0xFC, 0xFF};

// Mono band wrapper: handles TF recombination, Hadamard ordering and
// folding output (celt/bands.c quant_band, decode side).
static unsigned QuantBand(BandCtx* ctx, float* X, int N, int b, int B,
                          float* lowband, int LM, float* lowband_out,
                          float gain, float* lowband_scratch, int fill) {
  int N0 = N;
  int N_B = N / B;
  int N_B0;
  int B0 = B;
  int time_divide = 0;
  int recombine = 0;
  int longBlocks = B0 == 1;
  unsigned cm;
  int tf_change = ctx->tf_change;

  if (N == 1) return QuantBandN1(ctx, X, nullptr, lowband_out);

  if (tf_change > 0) recombine = tf_change;
  if (lowband_scratch && lowband &&
      (recombine || ((N_B & 1) == 0 && tf_change < 0) || B0 > 1)) {
    std::memcpy(lowband_scratch, lowband, N * sizeof(float));
    lowband = lowband_scratch;
  }
  for (int k = 0; k < recombine; ++k) {
    if (lowband) Haar1(lowband, N >> k, 1 << k);
    fill = kBitInterleave[fill & 0xF] | kBitInterleave[fill >> 4] << 2;
  }
  B >>= recombine;
  N_B <<= recombine;
  while ((N_B & 1) == 0 && tf_change < 0) {
    if (lowband) Haar1(lowband, N_B, B);
    fill |= fill << B;
    B <<= 1;
    N_B >>= 1;
    time_divide++;
    tf_change++;
  }
  B0 = B;
  N_B0 = N_B;
  if (B0 > 1 && lowband)
    DeinterleaveHadamard(lowband, N_B >> recombine, B0 << recombine,
                         longBlocks);

  cm = QuantPartition(ctx, X, N, b, B, lowband, LM, gain, fill);

  // Resynthesis: undo the reorderings on the decoded shape.
  if (B0 > 1)
    InterleaveHadamard(X, N_B >> recombine, B0 << recombine, longBlocks);
  N_B = N_B0;
  B = B0;
  for (int k = 0; k < time_divide; ++k) {
    B >>= 1;
    N_B <<= 1;
    cm |= cm >> B;
    Haar1(X, N_B, B);
  }
  for (int k = 0; k < recombine; ++k) {
    cm = kBitDeinterleave[cm & 0xF];
    Haar1(X, N0 >> k, 1 << k);
  }
  B <<= recombine;
  if (lowband_out) {
    float n = std::sqrt((float)N0);
    for (int j = 0; j < N0; ++j) lowband_out[j] = n * X[j];
  }
  cm &= (1u << B) - 1;
  return cm;
}

static void StereoMerge(float* X, float* Y, float mid, int N) {
  float xp = 0, side = 0;
  for (int j = 0; j < N; ++j) {
    xp += Y[j] * X[j];
    side += Y[j] * Y[j];
  }
  xp *= mid;
  float El = mid * mid + side - 2 * xp;
  float Er = mid * mid + side + 2 * xp;
  if (Er < 6e-4f || El < 6e-4f) {
    std::memcpy(Y, X, N * sizeof(float));
    return;
  }
  float lgain = 1.f / std::sqrt(El);
  float rgain = 1.f / std::sqrt(Er);
  for (int j = 0; j < N; ++j) {
    float l = mid * X[j];
    float s = Y[j];
    X[j] = lgain * (l - s);
    Y[j] = rgain * (l + s);
  }
}

// Stereo band (celt/bands.c quant_band_stereo, decode side).
static unsigned QuantBandStereo(BandCtx* ctx, float* X, float* Y, int N,
                                int b, int B, float* lowband, int LM,
                                float* lowband_out, float* lowband_scratch,
                                int fill) {
  unsigned cm;
  int orig_fill = fill;
  if (N == 1) return QuantBandN1(ctx, X, Y, lowband_out);

  SplitCtx sctx;
  ComputeTheta(ctx, &sctx, X, Y, N, &b, B, B, LM, 1, &fill);
  int inv = sctx.inv;
  int itheta = sctx.itheta;
  float mid = (1.f / 32768) * sctx.imid;
  float side = (1.f / 32768) * sctx.iside;

  if (N == 2) {
    int mbits = b;
    int sbits = 0;
    if (itheta != 0 && itheta != 16384) sbits = 1 << BITRES;
    mbits -= sbits;
    int c = itheta > 8192;
    ctx->remaining_bits -= sctx.qalloc + sbits;
    float* x2 = c ? Y : X;
    float* y2 = c ? X : Y;
    int sign = 0;
    if (sbits) sign = (int)ctx->ec->DecodeBits(1);
    sign = 1 - 2 * sign;
    cm = QuantBand(ctx, x2, N, mbits, B, lowband, LM, lowband_out, 1.f,
                   lowband_scratch, orig_fill);
    y2[0] = -sign * x2[1];
    y2[1] = sign * x2[0];
    float tmp;
    X[0] *= mid;
    X[1] *= mid;
    Y[0] *= side;
    Y[1] *= side;
    tmp = X[0];
    X[0] = tmp - Y[0];
    Y[0] = tmp + Y[0];
    tmp = X[1];
    X[1] = tmp - Y[1];
    Y[1] = tmp + Y[1];
  } else {
    int delta = sctx.delta;
    int mbits = imax(0, imin(b, (b - delta) / 2));
    int sbits = b - mbits;
    ctx->remaining_bits -= sctx.qalloc;
    int32_t rebalance = ctx->remaining_bits;
    if (mbits >= sbits) {
      cm = QuantBand(ctx, X, N, mbits, B, lowband, LM, lowband_out, 1.f,
                     lowband_scratch, fill);
      rebalance = mbits - (rebalance - ctx->remaining_bits);
      if (rebalance > 3 << BITRES && itheta != 0)
        sbits += rebalance - (3 << BITRES);
      cm |= QuantBand(ctx, Y, N, sbits, B, nullptr, LM, nullptr, side,
                      nullptr, fill >> B);
    } else {
      cm = QuantBand(ctx, Y, N, sbits, B, nullptr, LM, nullptr, side,
                     nullptr, fill >> B);
      rebalance = sbits - (rebalance - ctx->remaining_bits);
      if (rebalance > 3 << BITRES && itheta != 16384)
        mbits += rebalance - (3 << BITRES);
      cm |= QuantBand(ctx, X, N, mbits, B, lowband, LM, lowband_out, 1.f,
                      lowband_scratch, fill);
    }
  }
  if (N != 2) StereoMerge(X, Y, mid, N);
  if (inv)
    for (int j = 0; j < N; ++j) Y[j] = -Y[j];
  return cm;
}

// quant_all_bands, decode side.
static void QuantAllBands(int start, int end, float* X_, float* Y_,
                          uint8_t* collapse_masks, const int* pulses,
                          int shortBlocks, int spread, int dual_stereo,
                          int intensity, const int* tf_res,
                          int32_t total_bits, int32_t balance, EcDec* ec,
                          int LM, int codedBands, uint32_t* seed,
                          int disable_inv, const float* bandE) {
  int M = 1 << LM;
  int B = shortBlocks ? M : 1;
  int C = Y_ ? 2 : 1;
  int norm_offset = M * kEBands[start];
  static thread_local float norm_buf[2 * 8 * 100];
  static thread_local float scratch_buf[8 * 22];
  float* norm = norm_buf;
  float* norm2 = norm_buf + M * kEBands[kNbEBands - 1] - norm_offset;
  float* lowband_scratch = scratch_buf;
  int lowband_offset = 0;
  int update_lowband = 1;
  BandCtx ctx;
  ctx.intensity = intensity;
  ctx.spread = spread;
  ctx.ec = ec;
  ctx.bandE = bandE;
  ctx.seed = *seed;
  ctx.disable_inv = disable_inv;
  ctx.avoid_split_noise = B > 1;

  for (int i = start; i < end; ++i) {
    int last = i == end - 1;
    int N = M * (kEBands[i + 1] - kEBands[i]);
    float* X = X_ + M * kEBands[i];
    float* Y = Y_ ? Y_ + M * kEBands[i] : nullptr;
    ctx.i = i;
    ctx.tf_change = tf_res[i];

    int32_t tell = ec->TellFrac();
    if (i != start) balance -= tell;
    int32_t remaining_bits = total_bits - tell - 1;
    ctx.remaining_bits = remaining_bits;
    int b = 0;
    if (i <= codedBands - 1) {
      int32_t curr_balance = balance / imin(3, codedBands - i);
      b = imax(0, imin(16383, imin(remaining_bits + 1,
                                   pulses[i] + curr_balance)));
    }

    if ((M * kEBands[i] - N >= M * kEBands[start] || i == start + 1) &&
        (update_lowband || lowband_offset == 0))
      lowband_offset = i;

    // Without a fold source the LCG noise-fills, so every block is
    // (almost surely) non-zero.
    unsigned x_cm = (1u << B) - 1, y_cm = (1u << B) - 1;
    int effective_lowband = -1;
    if (lowband_offset != 0 &&
        (spread != 3 /* SPREAD_AGGRESSIVE */ || B > 1 ||
         ctx.tf_change < 0)) {
      x_cm = y_cm = 0;
      effective_lowband =
          imax(0, M * kEBands[lowband_offset] - norm_offset - N);
      int fold_start = lowband_offset;
      while (M * kEBands[--fold_start] > effective_lowband + norm_offset) {
      }
      int fold_end = lowband_offset - 1;
      while (++fold_end < i &&
             M * kEBands[fold_end] < effective_lowband + norm_offset + N) {
      }
      int fold_i = fold_start;
      do {
        x_cm |= collapse_masks[fold_i * C + 0];
        y_cm |= collapse_masks[fold_i * C + C - 1];
      } while (++fold_i < fold_end);
    }

    if (dual_stereo && i == intensity) {
      dual_stereo = 0;
      for (int j = 0; j < M * kEBands[i] - norm_offset; ++j)
        norm[j] = 0.5f * (norm[j] + norm2[j]);
    }
    if (dual_stereo) {
      x_cm = QuantBand(&ctx, X, N, b / 2, B,
                       effective_lowband != -1 ? norm + effective_lowband
                                               : nullptr,
                       LM,
                       last ? nullptr
                            : norm + M * kEBands[i] - norm_offset,
                       1.f, lowband_scratch, (int)x_cm);
      y_cm = QuantBand(&ctx, Y, N, b / 2, B,
                       effective_lowband != -1 ? norm2 + effective_lowband
                                               : nullptr,
                       LM,
                       last ? nullptr
                            : norm2 + M * kEBands[i] - norm_offset,
                       1.f, lowband_scratch, (int)y_cm);
    } else {
      if (Y) {
        x_cm = QuantBandStereo(&ctx, X, Y, N, b, B,
                               effective_lowband != -1
                                   ? norm + effective_lowband
                                   : nullptr,
                               LM,
                               last ? nullptr
                                    : norm + M * kEBands[i] - norm_offset,
                               lowband_scratch, (int)(x_cm | y_cm));
      } else {
        x_cm = QuantBand(&ctx, X, N, b, B,
                         effective_lowband != -1 ? norm + effective_lowband
                                                 : nullptr,
                         LM,
                         last ? nullptr
                              : norm + M * kEBands[i] - norm_offset,
                         1.f, lowband_scratch, (int)(x_cm | y_cm));
      }
      y_cm = x_cm;
    }
    collapse_masks[i * C + 0] = (uint8_t)x_cm;
    collapse_masks[i * C + C - 1] = (uint8_t)y_cm;
    balance += pulses[i] + tell;
    update_lowband = b > (N << BITRES);
    ctx.avoid_split_noise = 0;
  }
  *seed = ctx.seed;
}

// ---------------------------------------------------------------------------
// Energy envelope (celt/quant_bands.c, decode side).

static void UnquantCoarseEnergy(int start, int end, float* oldEBands,
                                int intra, EcDec* ec, int C, int LM) {
  const uint8_t* prob = kEProbModel + (LM * 2 + intra) * 42;
  float coef = intra ? 0.f : kPredCoef[LM];
  float beta = intra ? kBetaIntra : kBetaCoef[LM];
  int32_t budget = (int32_t)ec->storage * 8;
  float prev[2] = {0, 0};
  for (int i = start; i < end; ++i) {
    for (int c = 0; c < C; ++c) {
      int32_t tell = ec->Tell();
      int qi;
      if (budget - tell >= 15) {
        int pi = 2 * imin(i, 20);
        qi = LaplaceDecode(ec, (unsigned)prob[pi] << 7,
                           (int)prob[pi + 1] << 6);
      } else if (budget - tell >= 2) {
        qi = ec->DecodeIcdf(kSmallEnergyIcdf, 2);
        qi = (qi >> 1) ^ -(qi & 1);
      } else if (budget - tell >= 1) {
        qi = -ec->DecodeBitLogp(1);
      } else {
        qi = -1;  // out of bits: assume the band energy decays
      }
      float q = (float)qi;
      float oldE = oldEBands[i + c * kNbEBands];
      if (oldE < -9.f) oldE = -9.f;
      float tmp = coef * oldE + prev[c] + q;
      oldEBands[i + c * kNbEBands] = tmp;
      prev[c] = prev[c] + q - beta * q;
    }
  }
}

static void UnquantFineEnergy(int start, int end, float* oldEBands,
                              const int* fine_quant, EcDec* ec, int C) {
  for (int i = start; i < end; ++i) {
    if (fine_quant[i] <= 0) continue;
    for (int c = 0; c < C; ++c) {
      int q2 = (int)ec->DecodeBits(fine_quant[i]);
      float offset = (q2 + 0.5f) * (1 << (14 - fine_quant[i])) *
                         (1.f / 16384) - 0.5f;
      oldEBands[i + c * kNbEBands] += offset;
    }
  }
}

static void UnquantEnergyFinalise(int start, int end, float* oldEBands,
                                  const int* fine_quant,
                                  const int* fine_priority, int bits_left,
                                  EcDec* ec, int C) {
  for (int prio = 0; prio < 2; ++prio) {
    for (int i = start; i < end && bits_left >= C; ++i) {
      if (fine_quant[i] >= 8 /* MAX_FINE_BITS */ ||
          fine_priority[i] != prio)
        continue;
      for (int c = 0; c < C; ++c) {
        int q2 = (int)ec->DecodeBits(1);
        float offset = (q2 - 0.5f) * (1 << (14 - fine_quant[i] - 1)) *
                       (1.f / 16384);
        oldEBands[i + c * kNbEBands] += offset;
        bits_left--;
      }
    }
  }
}

// tf_decode (celt/celt_decoder.c).
static void TfDecode(int start, int end, int isTransient, int* tf_res,
                     int LM, EcDec* ec) {
  int32_t budget = (int32_t)ec->storage * 8;
  int32_t tell = ec->Tell();
  int logp = isTransient ? 2 : 4;
  int tf_select_rsv = LM > 0 && tell + logp + 1 <= budget;
  budget -= tf_select_rsv;
  int curr = 0, tf_changed = 0;
  for (int i = start; i < end; ++i) {
    if (tell + logp <= budget) {
      curr ^= ec->DecodeBitLogp(logp);
      tell = ec->Tell();
      tf_changed |= curr;
    }
    tf_res[i] = curr;
    logp = isTransient ? 4 : 5;
  }
  int tf_select = 0;
  if (tf_select_rsv &&
      kTfSelect[LM][4 * isTransient + 0 + tf_changed] !=
          kTfSelect[LM][4 * isTransient + 2 + tf_changed])
    tf_select = ec->DecodeBitLogp(1);
  for (int i = start; i < end; ++i)
    tf_res[i] = kTfSelect[LM][4 * isTransient + 2 * tf_select + tf_res[i]];
}

// anti_collapse (celt/bands.c), resynthesis only.
static void AntiCollapse(float* X_, const uint8_t* collapse_masks, int LM,
                         int C, int size, int start, int end,
                         const float* logE, const float* prev1logE,
                         const float* prev2logE, const int* pulses,
                         uint32_t seed) {
  for (int i = start; i < end; ++i) {
    int N0 = kEBands[i + 1] - kEBands[i];
    int depth = ((1 + pulses[i]) / N0) >> LM;
    float thresh = 0.5f * std::exp2(-0.125f * depth);
    float sqrt_1 = 1.f / std::sqrt((float)(N0 << LM));
    for (int c = 0; c < C; ++c) {
      float prev1 = prev1logE[c * kNbEBands + i];
      float prev2 = prev2logE[c * kNbEBands + i];
      if (C == 1) {
        prev1 = std::fmax(prev1, prev1logE[kNbEBands + i]);
        prev2 = std::fmax(prev2, prev2logE[kNbEBands + i]);
      }
      float Ediff = logE[c * kNbEBands + i] - std::fmin(prev1, prev2);
      Ediff = std::fmax(0.f, Ediff);
      float r = 2.f * std::exp2(-Ediff);
      if (LM == 3) r *= 1.41421356f;
      r = std::fmin(thresh, r);
      r = r * sqrt_1;
      float* X = X_ + c * size + (kEBands[i] << LM);
      int renormalize = 0;
      for (int k = 0; k < (1 << LM); ++k) {
        if (!(collapse_masks[i * C + c] & (1 << k))) {
          // Inject noise into this short block's bins.
          for (int j = 0; j < N0; ++j) {
            seed = LcgRand(seed);
            X[(j << LM) + k] = (seed & 0x8000) ? r : -r;
          }
          renormalize = 1;
        }
      }
      if (renormalize) RenormaliseVector(X, N0 << LM, 1.f);
    }
  }
}

static void DenormaliseBands(const float* X, float* freq,
                             const float* oldEBands, int start, int end,
                             int M) {
  int bound = M * kEBands[end];
  int N = M * kShortMdct;
  std::memset(freq, 0, sizeof(float) * N);
  for (int i = start; i < end; ++i) {
    int j = M * kEBands[i];
    int band_end = M * kEBands[i + 1];
    float lg = oldEBands[i] + kEMeans[i];
    float g = std::exp2(std::fmin(lg, 32.f));
    for (; j < band_end; ++j) freq[j] = X[j] * g;
  }
  (void)bound;
}

// ---------------------------------------------------------------------------
// Synthesis: low-overlap inverse MDCT + TDAC mirror, de-emphasis and
// the comb post-filter.  Mirrors clt_mdct_backward's contract: the
// "middle" half of the inverse transform is written at out[ov/2..],
// then the first `ov` samples are resolved in place against the
// previous block's tail (TDAC), so consecutive blocks/frames
// overlap-add through one linear buffer.

constexpr int kDecodeBufferSize = 2048;

struct Synth {
  float mem[2][kDecodeBufferSize + kOverlap];
  float preemph_mem[2];
  float window[kOverlap];

  void Init() {
    std::memset(mem, 0, sizeof(mem));
    preemph_mem[0] = preemph_mem[1] = 0;
    for (int i = 0; i < kOverlap; ++i) {
      double inner = std::sin(0.5 * M_PI * (i + 0.5) / kOverlap);
      window[i] = (float)std::sin(0.5 * M_PI * inner * inner);
    }
  }
};

// FFT-routed inverse MDCT, one plan per block size (120/240/480/960),
// built once per process.  The mid-section transform
//   mid[t] = sum_k X[k] cos(pi/NB (t + NB + 1/2)(k + 1/2))
// reduces (shift the t index by NB: cos picks up a (-1)^k sin term;
// DST-IV -> DCT-IV by input reversal and output sign alternation) to a
// DCT-IV of length NB, computed with one NB/2-point complex FFT:
//   z[n]   = (-X[(NB-1-2n)s] + i X[2ns]) * e^{-i pi (n+1/8)/NB}
//   y[m]   = FFT(z)[m] * -e^{-i pi (m+1/8)/NB}
//   mid[2m] = Re y[m],  mid[NB-1-2m] = Im y[m]
// (mapping validated to 4e-13 against the direct basis; the earlier
// O(NB^2) mat-vec was ~40% of total CELT decode time at LM=3).
struct MdctPlan {
  folve_smallfft::SmallFft fft;               // size NB/2
  std::vector<folve_smallfft::Cpx> pre;       // e^{-i pi (n+1/8)/NB}
  std::vector<folve_smallfft::Cpx> post;      // -e^{-i pi (m+1/8)/NB}
  explicit MdctPlan(int NB) : fft(NB / 2), pre(NB / 2), post(NB / 2) {
    for (int n = 0; n < NB / 2; ++n) {
      double a = -M_PI * (n + 0.125) / NB;
      pre[n] = {(float)std::cos(a), (float)std::sin(a)};
      post[n] = {-(float)std::cos(a), -(float)std::sin(a)};
    }
  }
};

static const MdctPlan* MdctPlanFor(int NB) {
  static std::mutex mu;
  static std::atomic<const MdctPlan*> plans[4];
  int lm = 0;
  while (lm < 4 && (kShortMdct << lm) != NB) ++lm;
  assert(lm < 4 && "MdctPlanFor: NB must be one of 120/240/480/960");
  if (lm >= 4) std::abort();
  // Acquire-load fast path; the mutex is only taken on first build per
  // LM, so the per-short-block hot path never serializes.
  const MdctPlan* cached = plans[lm].load(std::memory_order_acquire);
  if (cached) return cached;
  std::lock_guard<std::mutex> lock(mu);
  cached = plans[lm].load(std::memory_order_relaxed);
  if (!cached) {
    cached = new MdctPlan(NB);
    plans[lm].store(cached, std::memory_order_release);
  }
  return cached;
}

// Middle section of the 2*NB-point inverse MDCT:
//   mid[t] = sum_k X[k*stride] cos(pi/NB (t + NB + 1/2)(k + 1/2))
// written to out[ov/2..ov/2+NB), then the TDAC mirror on out[0..ov).
static void MdctBackward(const float* X, int stride, int NB,
                         const float* window, float* out) {
  using folve_smallfft::Cpx;
  using folve_smallfft::CMul;
  float* mid = out + kOverlap / 2;
  // MdctPlanFor() aborts on any NB outside {120,240,480,960}; resolving
  // it first guarantees NB<=960 before the fixed buffers are touched.
  const MdctPlan& plan = *MdctPlanFor(NB);
  const int H = NB / 2;
  static thread_local Cpx z[480], tmp[480];
  for (int n = 0; n < H; ++n) {
    Cpx v{-X[(size_t)(NB - 1 - 2 * n) * stride],
          X[(size_t)(2 * n) * stride]};
    z[n] = CMul(v, plan.pre[n]);
  }
  plan.fft.Run(z, tmp);
  for (int m = 0; m < H; ++m) {
    Cpx y = CMul(z[m], plan.post[m]);
    mid[2 * m] = y.re;
    mid[NB - 1 - 2 * m] = y.im;
  }
  // TDAC mirror on the first kOverlap samples.
  for (int i = 0; i < kOverlap / 2; ++i) {
    float x1 = out[kOverlap - 1 - i];
    float x2 = out[i];
    out[i] = window[kOverlap - 1 - i] * x2 - window[i] * x1;
    out[kOverlap - 1 - i] = window[i] * x2 + window[kOverlap - 1 - i] * x1;
  }
}

static void CombFilterConst(float* y, const float* x, int T, int N, float g10,
                            float g11, float g12) {
  for (int i = 0; i < N; ++i)
    y[i] = x[i] + g10 * x[i - T] + g11 * (x[i - T - 1] + x[i - T + 1]) +
           g12 * (x[i - T - 2] + x[i - T + 2]);
}

static void CombFilter(float* y, float* x, int T0, int T1, int N, float g0,
                       float g1, int tapset0, int tapset1,
                       const float* window, int overlap) {
  if (g0 == 0 && g1 == 0) {
    if (x != y) std::memmove(y, x, N * sizeof(float));
    return;
  }
  T0 = imax(T0, kMinPeriod);
  T1 = imax(T1, kMinPeriod);
  float g00 = g0 * kPfGains[tapset0][0];
  float g01 = g0 * kPfGains[tapset0][1];
  float g02 = g0 * kPfGains[tapset0][2];
  float g10 = g1 * kPfGains[tapset1][0];
  float g11 = g1 * kPfGains[tapset1][1];
  float g12 = g1 * kPfGains[tapset1][2];
  float x1 = x[-T1 + 1];
  float x2 = x[-T1];
  float x3 = x[-T1 - 1];
  float x4 = x[-T1 - 2];
  if (g0 == g1 && T0 == T1 && tapset0 == tapset1) overlap = 0;
  int i = 0;
  for (; i < overlap; ++i) {
    float x0 = x[i - T1 + 2];
    float f = window[i] * window[i];
    y[i] = x[i] + (1 - f) * g00 * x[i - T0] +
           (1 - f) * g01 * (x[i - T0 + 1] + x[i - T0 - 1]) +
           (1 - f) * g02 * (x[i - T0 + 2] + x[i - T0 - 2]) +
           f * g10 * x2 + f * g11 * (x1 + x3) + f * g12 * (x0 + x4);
    y[i] = y[i];
    x4 = x3;
    x3 = x2;
    x2 = x1;
    x1 = x0;
  }
  if (g1 == 0) {
    if (x != y && i < N)
      std::memmove(y + i, x + i, (N - i) * sizeof(float));
    return;
  }
  CombFilterConst(y + i, x + i, T1, N - i, g10, g11, g12);
}

// ---------------------------------------------------------------------------
// The decoder object.

struct Decoder {
  int channels;  // decoder output channels (from OpusHead), 1 or 2
  float oldEBands[2 * kNbEBands];
  float oldLogE[2 * kNbEBands];
  float oldLogE2[2 * kNbEBands];
  uint32_t rng;
  int pf_period;
  int pf_period_old;
  float pf_gain;
  float pf_gain_old;
  int pf_tapset;
  int pf_tapset_old;
  int error;
  Synth syn;

  void Reset() {
    for (int i = 0; i < 2 * kNbEBands; ++i) {
      oldEBands[i] = 0;
      oldLogE[i] = oldLogE2[i] = -28.f;
    }
    rng = 0;
    pf_period = pf_period_old = 0;
    pf_gain = pf_gain_old = 0;
    pf_tapset = pf_tapset_old = 0;
    error = 0;
    syn.Init();
  }

  int DecodeFrame(const uint8_t* data, int len, int LM, int end,
                  int stream_channels, float* pcm, int start = 0,
                  EcDec* ext = nullptr);
};

// `start` > 0 is the hybrid-mode path (celt_decode_with_ec with
// CELT_SET_START_BAND(17), opus_decoder.c): the postfilter and
// silence paths are gated on start == 0 below, everything else is
// already parameterized.  `ext`, when given, is a range decoder
// SHARED with the SILK layer of the same frame (hybrid packets code
// SILK then CELT through one coder); its raw-bits end must already
// account for any redundancy bytes (storage shrunk by the caller).
int Decoder::DecodeFrame(const uint8_t* data, int len, int LM, int end,
                         int stream_channels, float* pcm, int start,
                         EcDec* ext) {
  const int C = stream_channels;
  const int CC = channels;
  const int N = kShortMdct << LM;
  const int M = 1 << LM;
  EcDec own;
  EcDec& dec = ext ? *ext : own;
  if (!ext) dec.Init(data, (uint32_t)len);
  int32_t total_bits = len * 8;

  int silence = 0;
  int32_t tell = dec.Tell();
  if (tell >= total_bits)
    silence = 1;
  else if (tell == 1)
    silence = dec.DecodeBitLogp(15);
  if (silence) {
    // Consume the rest of the frame.
    dec.nbits_total += total_bits - dec.Tell();
    tell = total_bits;
  } else {
    tell = dec.Tell();
  }

  float postfilter_gain = 0;
  int postfilter_pitch = 0;
  int postfilter_tapset = 0;
  if (start == 0 && tell + 16 <= total_bits) {
    if (dec.DecodeBitLogp(1)) {
      int octave = (int)dec.DecodeUint(6);
      postfilter_pitch = (16 << octave) + (int)dec.DecodeBits(4 + octave) - 1;
      int qg = (int)dec.DecodeBits(3);
      if (dec.Tell() + 2 <= total_bits)
        postfilter_tapset = dec.DecodeIcdf(kTapsetIcdf, 2);
      postfilter_gain = 0.09375f * (qg + 1);
    }
    tell = dec.Tell();
  }

  int isTransient = 0;
  if (LM > 0 && tell + 3 <= total_bits) {
    isTransient = dec.DecodeBitLogp(3);
    tell = dec.Tell();
  }
  int shortBlocks = isTransient ? M : 0;

  int intra_ener = 0;
  if (tell + 3 <= total_bits) intra_ener = dec.DecodeBitLogp(3);

  UnquantCoarseEnergy(start, end, oldEBands, intra_ener, &dec, C, LM);

  int tf_res[kNbEBands];
  TfDecode(start, end, isTransient, tf_res, LM, &dec);

  tell = dec.Tell();
  int spread = 2;  // SPREAD_NORMAL
  if (tell + 4 <= total_bits) spread = dec.DecodeIcdf(kSpreadIcdf, 5);

  int cap[kNbEBands];
  for (int i = 0; i < kNbEBands; ++i) {
    int NN = (kEBands[i + 1] - kEBands[i]) << LM;
    cap[i] = (kCacheCaps[kNbEBands * (2 * LM + C - 1) + i] + 64) * C * NN >>
             2;
  }
  int offsets[kNbEBands] = {0};
  int dynalloc_logp = 6;
  int32_t total_bits_frac = total_bits << BITRES;
  int32_t total_boost = 0;
  int32_t tell_frac = dec.TellFrac();
  for (int i = start; i < end; ++i) {
    int width = C * (kEBands[i + 1] - kEBands[i]) << LM;
    int quanta = imin(width << BITRES, imax(6 << BITRES, width));
    int dynalloc_loop_logp = dynalloc_logp;
    int boost = 0;
    while (tell_frac + (dynalloc_loop_logp << BITRES) <
               total_bits_frac - total_boost &&
           boost < cap[i]) {
      int flag = dec.DecodeBitLogp(dynalloc_loop_logp);
      tell_frac = dec.TellFrac();
      if (!flag) break;
      boost += quanta;
      total_boost += quanta;
      dynalloc_loop_logp = 1;
    }
    offsets[i] = boost;
    if (boost > 0) dynalloc_logp = imax(2, dynalloc_logp - 1);
  }

  int alloc_trim = 5;
  if (tell_frac + (6 << BITRES) <= total_bits_frac - total_boost)
    alloc_trim = dec.DecodeIcdf(kTrimIcdf, 7);

  int32_t bits = ((int32_t)len * 8 << BITRES) - dec.TellFrac() - 1;
  int anti_collapse_rsv =
      isTransient && LM >= 2 && bits >= ((LM + 2) << BITRES) ? (1 << BITRES)
                                                             : 0;
  bits -= anti_collapse_rsv;

  int pulses[kNbEBands], fine_quant[kNbEBands], fine_priority[kNbEBands];
  int intensity = 0, dual_stereo = 0;
  int32_t balance = 0;
  int codedBands = ComputeAllocation(
      start, end, offsets, cap, alloc_trim, &intensity, &dual_stereo, bits,
      &balance, pulses, fine_quant, fine_priority, C, LM, &dec);

  UnquantFineEnergy(start, end, oldEBands, fine_quant, &dec, C);

  // Shape decoding.
  static thread_local float X_[2 * 8 * kShortMdct];
  float* X = X_;
  float* Y = C == 2 ? X_ + N : nullptr;
  uint8_t collapse_masks[2 * kNbEBands];
  std::memset(collapse_masks, 0, sizeof(collapse_masks));
  std::memset(X_, 0, sizeof(float) * 2 * 8 * kShortMdct);
  QuantAllBands(start, end, X, Y, collapse_masks, pulses, shortBlocks,
                spread, dual_stereo, intensity, tf_res,
                ((int32_t)len * 8 << BITRES) - anti_collapse_rsv, balance,
                &dec, LM, codedBands, &rng, 0, nullptr);

  int anti_collapse_on = 0;
  if (anti_collapse_rsv > 0) anti_collapse_on = (int)dec.DecodeBits(1);

  UnquantEnergyFinalise(start, end, oldEBands, fine_quant, fine_priority,
                        len * 8 - dec.Tell(), &dec, C);

  if (anti_collapse_on)
    AntiCollapse(X_, collapse_masks, LM, C, N, start, end, oldEBands,
                 oldLogE, oldLogE2, pulses, rng);

  if (silence)
    for (int i = 0; i < 2 * kNbEBands; ++i) oldEBands[i] = -28.f;

  // Denormalise into the frequency domain, per packet channel.
  static thread_local float freq_[2 * 8 * kShortMdct];
  for (int c = 0; c < C; ++c) {
    if (silence) {
      std::memset(freq_ + c * N, 0, N * sizeof(float));
    } else {
      DenormaliseBands(c == 0 ? X : Y, freq_ + c * N,
                       oldEBands + c * kNbEBands, start, end, M);
    }
  }

  // Synthesis per decoder channel.
  int B = shortBlocks ? M : 1;
  int NB = shortBlocks ? kShortMdct : N;
  for (int c = 0; c < CC; ++c) {
    const float* freq = freq_ + (C == 2 ? c : 0) * N;
    float* mem = syn.mem[c];
    std::memmove(mem, mem + N,
                 (kDecodeBufferSize - N + kOverlap / 2) * sizeof(float));
    float* out = mem + kDecodeBufferSize - N;
    for (int b = 0; b < B; ++b)
      MdctBackward(freq + b, B, NB, syn.window, out + b * NB);
    // Post-filter (crossfade old->current over the first short block,
    // then current->new over the rest).
    int pf_p = imax(pf_period, kMinPeriod);
    int pf_p_old = imax(pf_period_old, kMinPeriod);
    CombFilter(out, out, pf_p_old, pf_p, kShortMdct, pf_gain_old, pf_gain,
               pf_tapset_old, pf_tapset, syn.window, kOverlap);
    if (LM != 0)
      CombFilter(out + kShortMdct, out + kShortMdct, pf_p,
                 imax(postfilter_pitch, kMinPeriod), N - kShortMdct,
                 pf_gain, postfilter_gain, pf_tapset, postfilter_tapset,
                 syn.window, kOverlap);
    // De-emphasis into the output.
    float m = syn.preemph_mem[c];
    for (int j = 0; j < N; ++j) {
      float tmp = out[j] + m;
      m = 0.85f * tmp;
      pcm[j * CC + c] = tmp * (1.f / 32768);
    }
    syn.preemph_mem[c] = m;
  }
  pf_period_old = pf_period;
  pf_gain_old = pf_gain;
  pf_tapset_old = pf_tapset;
  pf_period = postfilter_pitch;
  pf_gain = postfilter_gain;
  pf_tapset = postfilter_tapset;
  if (LM != 0) {
    // The second comb already transitioned to the new parameters.
    pf_period_old = pf_period;
    pf_gain_old = pf_gain;
    pf_tapset_old = pf_tapset;
  }

  // Energy state roll-over.
  if (C == 1)
    std::memcpy(oldEBands + kNbEBands, oldEBands, kNbEBands * sizeof(float));
  if (!isTransient) {
    std::memcpy(oldLogE2, oldLogE, sizeof(oldLogE2));
    std::memcpy(oldLogE, oldEBands, sizeof(oldLogE));
  } else {
    for (int i = 0; i < 2 * kNbEBands; ++i)
      oldLogE[i] = std::fmin(oldLogE[i], oldEBands[i]);
  }
  for (int c = 0; c < 2; ++c)
    for (int i = 0; i < start; ++i) {
      oldEBands[c * kNbEBands + i] = 0;
      oldLogE[c * kNbEBands + i] = oldLogE2[c * kNbEBands + i] = -28.f;
    }
  for (int c = 0; c < 2; ++c)
    for (int i = end; i < kNbEBands; ++i) {
      oldEBands[c * kNbEBands + i] = 0;
      oldLogE[c * kNbEBands + i] = oldLogE2[c * kNbEBands + i] = -28.f;
    }
  rng = dec.rng;

  if (dec.error) error = 1;
  // Structural check: a correct parse never reads past the frame.
  if (dec.Tell() > total_bits + 64) error = 1;
  return 0;
}

}  // namespace folve_celt

// ---------------------------------------------------------------------------
// C API: Opus packet layer (TOC + frame packing, CELT configs only).

extern "C" {

void* folve_celt_create(int channels) {
  if (channels < 1 || channels > 2) return nullptr;
  folve_celt::InitU();
  auto* d = new (std::nothrow) folve_celt::Decoder;
  if (!d) return nullptr;
  d->channels = channels;
  d->Reset();
  return d;
}

void folve_celt_reset(void* h) {
  ((folve_celt::Decoder*)h)->Reset();
}

void folve_celt_close(void* h) {
  delete (folve_celt::Decoder*)h;
}

// Returns the frame count and per-frame size/offsets of an Opus packet
// (RFC 6716 section 3).  Returns -1 on malformed packets, -2 if the
// packet is not CELT-only mode.
static int ParsePacket(const uint8_t* data, int len, int* lm, int* channels,
                       int* end_band, const uint8_t** frames, int* sizes) {
  if (len < 1) return -1;
  int toc = data[0];
  int config = toc >> 3;
  if (config < 16) return -2;  // SILK or hybrid
  *channels = (toc >> 2) & 1 ? 2 : 1;
  *lm = config & 3;
  static const int kEndBand[4] = {13, 17, 19, 21};  // NB, WB, SWB, FB
  *end_band = kEndBand[(config - 16) >> 2];
  int code = toc & 3;
  const uint8_t* p = data + 1;
  int left = len - 1;
  auto get_size = [&](int* sz) -> int {
    if (left < 1) return -1;
    int v = *p++;
    left--;
    if (v < 252) {
      *sz = v;
      return 0;
    }
    if (left < 1) return -1;
    *sz = v + 4 * (*p++);
    left--;
    return 0;
  };
  int count;
  if (code == 0) {
    count = 1;
    sizes[0] = left;
  } else if (code == 1) {
    if (left & 1) return -1;
    count = 2;
    sizes[0] = sizes[1] = left / 2;
  } else if (code == 2) {
    count = 2;
    if (get_size(&sizes[0]) < 0 || sizes[0] > left) return -1;
    sizes[1] = left - sizes[0];
  } else {
    if (left < 1) return -1;
    int ch = *p++;
    left--;
    count = ch & 0x3F;
    if (count <= 0 || count > 48) return -1;
    int padding = 0;
    if (ch & 0x40) {
      int pv;
      do {
        if (left < 1) return -1;
        pv = *p++;
        left--;
        padding += pv == 255 ? 254 : pv;
      } while (pv == 255);
    }
    if (left < padding) return -1;
    left -= padding;
    if (ch & 0x80) {
      int total = 0;
      for (int i = 0; i < count - 1; ++i) {
        if (get_size(&sizes[i]) < 0) return -1;
        total += sizes[i];
      }
      if (total > left) return -1;
      sizes[count - 1] = left - total;
    } else {
      if (count == 0 || left % count) return -1;
      for (int i = 0; i < count; ++i) sizes[i] = left / count;
    }
  }
  for (int i = 0; i < count; ++i) {
    if (sizes[i] < 0 || sizes[i] > 1275) return -1;
    frames[i] = p;
    p += sizes[i];
  }
  return count;
}

// Probe: is this packet decodable by this CELT-only decoder?
// Returns frame samples per frame (at 48 kHz) > 0, or <= 0 if not.
int folve_celt_probe(const uint8_t* data, int len) {
  int lm, ch, eb, sizes[48];
  const uint8_t* frames[48];
  int n = ParsePacket(data, len, &lm, &ch, &eb, frames, sizes);
  if (n <= 0) return n == -2 ? -2 : -1;
  return (120 << lm) * n;
}

// Decode one packet; pcm must hold samples*channels floats.
// Returns total samples per channel, or < 0 on error.
int folve_celt_decode(void* h, const uint8_t* data, int len, float* pcm) {
  auto* d = (folve_celt::Decoder*)h;
  int lm, ch, eb, sizes[48];
  const uint8_t* frames[48];
  int n = ParsePacket(data, len, &lm, &ch, &eb, frames, sizes);
  if (n <= 0) return -1;
  d->error = 0;  // per-packet parse health, not sticky
  int N = 120 << lm;
  int done = 0;
  for (int f = 0; f < n; ++f) {
    if (sizes[f] == 0) {
      // DTX/empty frame: silence (state-preserving enough for files).
      std::memset(pcm + done * d->channels, 0,
                  (size_t)N * d->channels * sizeof(float));
    } else {
      d->DecodeFrame(frames[f], sizes[f], lm, eb, ch,
                     pcm + done * d->channels);
    }
    done += N;
  }
  return d->error ? -3 : done;
}

uint32_t folve_celt_final_range(void* h) {
  return ((folve_celt::Decoder*)h)->rng;
}

// Frame-level entry for the Opus packet layer (native/opus_api.cc),
// mirroring celt_decode_with_ec: decodes ONE CELT frame of `nsamples`
// (120/240/480/960 at 48 kHz) with explicit start/end bands.  `ec`,
// when non-null, is a folve_opus::EcDec* continuing from the SILK
// layer of a hybrid frame (its storage already shrunk by any
// redundancy bytes); null means a fresh coder over [data, len).
// Returns 0, or <0 on parameter error; parse health via the sticky
// d->error as elsewhere.
int folve_celt_frame_ec(void* h, const uint8_t* data, int len,
                        int nsamples, int start_band, int end_band,
                        int stream_channels, void* ec, float* pcm) {
  auto* d = (folve_celt::Decoder*)h;
  int LM;
  switch (nsamples) {
    case 120: LM = 0; break;
    case 240: LM = 1; break;
    case 480: LM = 2; break;
    case 960: LM = 3; break;
    default: return -1;
  }
  if (stream_channels < 1 || stream_channels > 2) return -1;
  if (start_band < 0 || end_band <= start_band || end_band > 21) return -1;
  if (len < 0 || (len > 0 && !data)) return -1;
  d->error = 0;
  return d->DecodeFrame(data, len, LM, end_band, stream_channels, pcm,
                        start_band, (folve_opus::EcDec*)ec);
}

int folve_celt_error(void* h) { return ((folve_celt::Decoder*)h)->error; }

// Debug/test export: PVQ index -> pulse vector.
void folve_celt_cwrsi(int n, int k, uint32_t i, int* y) {
  folve_celt::InitU();
  folve_celt::Cwrsi(n, k, i, y);
}

uint32_t folve_celt_pvq_v(int n, int k) {
  folve_celt::InitU();
  return folve_celt::Vnk(n, k);
}

}  // extern "C"

