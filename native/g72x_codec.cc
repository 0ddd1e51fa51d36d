// CCITT G.721 / G.723 ADPCM family (now ITU G.726) — decoder.
//
// The reference convolves AU files carrying G.721 (32 kbps, 4-bit),
// G.723_24 (24 kbps, 3-bit) and G.723_40 (40 kbps, 5-bit) ADPCM, plus
// WAV G.721 (format tag 0x0040), via libsndfile's probe
// (convolve-file-handler.cc:62-76).  This is an independent
// implementation of the CCITT algorithm: adaptive 2-pole/6-zero
// predictor over sign-magnitude "floating point" state, adaptive
// quantizer scale (locked/unlocked step sizes with speed control), and
// tone/transition detection.
//
// Semantics were recovered behaviorally against oracle-decoded probe
// streams (tools/g72x_probe.py) and validated sample-exact on every
// probe.  One deliberate quirk matched there: the oracle's float
// multiply TRUNCATES the mantissa product (wanmant = (anmant *
// (srn & 63)) >> 4, no rounding bias), unlike the classic +0x30
// rounding — tests pin this down.
//
// The bitstream is a continuous little-endian code stream (codes fill
// bytes LSB-first); decoder state persists across the whole stream, so
// seeking requires decode-from-start (the Python side handles that,
// folve_tpu/audio/g72x.py).

#include <cstdint>
#include <cstring>
#include <new>

namespace folve_g72x {

static const int16_t kPower2[15] = {1,    2,    4,    8,    16,
                                    32,   64,   128,  256,  512,
                                    1024, 2048, 4096, 8192, 16384};

static inline int Quan(int val, const int16_t* table, int size) {
  int i = 0;
  for (; i < size; ++i)
    if (val < table[i]) break;
  return i;
}

// Sign-magnitude floating multiply of a predictor coefficient (an)
// with a 4-bit-exponent/6-bit-mantissa float (srn).  Truncating —
// see header comment.
static inline int Fmult(int an, int srn) {
  int anmag = (an > 0) ? an : ((-an) & 0x1FFF);
  int anexp = Quan(anmag, kPower2, 15) - 6;
  int anmant =
      (anmag == 0) ? 32 : (anexp >= 0 ? anmag >> anexp : anmag << -anexp);
  int wanexp = anexp + ((srn >> 6) & 0xF) - 13;
  int wanmant = (anmant * (srn & 0x3F)) >> 4;
  int retval = (wanexp >= 0) ? ((wanmant << wanexp) & 0x7FFF)
                             : (wanmant >> -wanexp);
  return ((an ^ srn) < 0) ? -retval : retval;
}

// 4-bit exp + 6-bit mantissa encoding used for the dq/sr histories.
static inline int16_t FloatEncode(int mag, bool negative) {
  if (mag == 0) return negative ? (int16_t)0xFC20 : 0x20;
  int exp = Quan(mag, kPower2, 15);
  int v = (exp << 6) + ((mag << 6) >> exp);
  return (int16_t)(negative ? v - 0x400 : v);
}

struct State {
  int64_t yl;
  int16_t yu;
  int16_t dms, dml, ap;
  int16_t a[2];
  int16_t b[6];
  int16_t pk[2];
  int16_t dq[6];
  int16_t sr[2];
  int16_t td;

  void Reset() {
    yl = 34816;
    yu = 544;
    dms = dml = ap = 0;
    a[0] = a[1] = 0;
    for (int i = 0; i < 6; ++i) b[i] = 32;  // overwritten below
    for (int i = 0; i < 6; ++i) {
      b[i] = 0;
      dq[i] = 32;
    }
    pk[0] = pk[1] = 0;
    sr[0] = sr[1] = 32;
    td = 0;
  }

  int PredictorZero() {
    int sezi = 0;
    for (int i = 0; i < 6; ++i) sezi += Fmult((int16_t)(b[i] >> 2), dq[i]);
    return sezi;
  }

  int PredictorPole() {
    return Fmult((int16_t)(a[1] >> 2), sr[1]) +
           Fmult((int16_t)(a[0] >> 2), sr[0]);
  }

  int StepSize() {
    if (ap >= 256) return yu;
    int y = (int)(yl >> 6);
    int dif = yu - y;
    int al = ap >> 2;
    if (dif > 0)
      y += (dif * al) >> 6;
    else if (dif < 0)
      y += (dif * al + 0x3F) >> 6;
    return y;
  }

  void Update(int code_size, int y, int wi, int fi, int dqv, int srv,
              int dqsez) {
    int pk0 = (dqsez < 0) ? 1 : 0;
    int mag = dqv & 0x7FFF;

    // Transition detect (TRANS).
    int ylint = (int)(yl >> 15);
    int ylfrac = (int)((yl >> 10) & 0x1F);
    int thr2 = (ylint > 9) ? (31 << 10) : ((32 + ylfrac) << ylint);
    int dqthr = (thr2 + (thr2 >> 1)) >> 1;
    int tr = (td != 0 && mag > dqthr) ? 1 : 0;

    // Quantizer scale adaptation (FUNCTW/FILTD/LIMB/FILTE).
    int nyu = y + ((wi - y) >> 5);
    if (nyu < 544)
      nyu = 544;
    else if (nyu > 5120)
      nyu = 5120;
    yu = (int16_t)nyu;
    yl += yu + ((-yl) >> 6);

    int a2p;
    if (tr == 1) {
      a[0] = a[1] = 0;
      for (int i = 0; i < 6; ++i) b[i] = 0;
      a2p = 0;
    } else {
      int pks1 = pk0 ^ pk[0];
      a2p = a[1] - (a[1] >> 7);
      if (dqsez != 0) {
        int fa1 = pks1 ? a[0] : -a[0];
        if (fa1 < -8191)
          a2p -= 0x100;
        else if (fa1 > 8191)
          a2p += 0xFF;
        else
          a2p += fa1 >> 5;
        if (pk0 ^ pk[1]) {
          if (a2p <= -12160)
            a2p = -12288;
          else if (a2p >= 12416)
            a2p = 12288;
          else
            a2p -= 0x80;
        } else if (a2p <= -12416) {
          a2p = -12288;
        } else if (a2p >= 12160) {
          a2p = 12288;
        } else {
          a2p += 0x80;
        }
      }
      a[1] = (int16_t)a2p;
      a[0] -= a[0] >> 8;
      if (dqsez != 0) a[0] += (pks1 == 0) ? 192 : -192;
      int a1ul = 15360 - a2p;
      if (a[0] < -a1ul)
        a[0] = (int16_t)-a1ul;
      else if (a[0] > a1ul)
        a[0] = (int16_t)a1ul;
      for (int i = 0; i < 6; ++i) {
        b[i] -= (code_size == 5) ? b[i] >> 9 : b[i] >> 8;
        if (mag) b[i] += ((dqv ^ dq[i]) >= 0) ? 128 : -128;
      }
    }

    for (int i = 5; i > 0; --i) dq[i] = dq[i - 1];
    dq[0] = (mag == 0) ? (dqv >= 0 ? (int16_t)0x20 : (int16_t)0xFC20)
                       : FloatEncode(mag, dqv < 0);

    sr[1] = sr[0];
    if (srv == 0)
      sr[0] = 0x20;
    else if (srv > 0)
      sr[0] = FloatEncode(srv, false);
    else if (srv > -32768)
      sr[0] = FloatEncode(-srv, true);
    else
      sr[0] = (int16_t)0xFC20;

    pk[1] = pk[0];
    pk[0] = (int16_t)pk0;

    td = (tr == 1) ? 0 : (a2p < -11776 ? 1 : 0);

    dms += (fi - dms) >> 5;
    dml += ((fi << 2) - dml) >> 7;
    if (tr == 1)
      ap = 256;
    else if (y < 1536 || td || ((dms << 2) - dml >= 0
                                    ? (dms << 2) - dml
                                    : dml - (dms << 2)) >= (dml >> 3))
      ap += (0x200 - ap) >> 4;
    else
      ap += (-ap) >> 4;
  }
};

// Quantizer reconstruction tables.  dqln = log2-domain quantized
// difference; wi = scale adaptation weight; fi = speed-control weight.
static const int16_t kDqln4[16] = {-2048, 4,   135, 213, 273, 323,
                                   373,   425, 425, 373, 323, 273,
                                   213,   135, 4,   -2048};
static const int16_t kWi4[16] = {-12, 18,  41,  64,  112, 198, 355, 1122,
                                 1122, 355, 198, 112, 64,  41,  18,  -12};
static const int16_t kFi4[16] = {0,     0,     0,     0x200, 0x200, 0x200,
                                 0x600, 0xE00, 0xE00, 0x600, 0x200, 0x200,
                                 0x200, 0,     0,     0};

static const int16_t kDqln3[8] = {-2048, 135, 273, 373, 373, 273, 135, -2048};
static const int16_t kWi3[8] = {-128, 960, 4384, 18624, 18624, 4384, 960, -128};
static const int16_t kFi3[8] = {0, 0x200, 0x400, 0xE00, 0xE00, 0x400, 0x200, 0};

static const int16_t kDqln5[32] = {
    -2048, -66, 28,  104, 169, 224, 274, 318, 358, 395, 429,
    459,   488, 514, 539, 566, 566, 539, 514, 488, 459, 429,
    395,   358, 318, 274, 224, 169, 104, 28,  -66, -2048};
static const int16_t kWi5[32] = {
    448,   448,   768,   1248,  1280,  1312,  1856, 3200, 4512, 5728, 7008,
    8960,  11456, 14080, 16928, 22272, 22272, 16928, 14080, 11456, 8960, 7008,
    5728,  4512,  3200,  1856,  1312,  1280,  1248,  768,   448,   448};
static const int16_t kFi5[32] = {
    0,     0,     0,     0,     0,     0x200, 0x200, 0x200, 0x200, 0x200,
    0x400, 0x600, 0x800, 0xA00, 0xC00, 0xC00, 0xC00, 0xC00, 0xA00, 0x800,
    0x600, 0x400, 0x200, 0x200, 0x200, 0x200, 0x200, 0,     0,     0,
    0,     0};

static inline int Reconstruct(int sign, int dqln, int y) {
  int16_t dql = (int16_t)(dqln + (y >> 2));
  if (dql < 0) return sign ? -0x8000 : 0;
  int dex = (dql >> 7) & 15;
  int dqt = 128 + (dql & 127);
  int dq = (dqt << 7) >> (14 - dex);
  return sign ? dq - 0x8000 : dq;
}

struct Decoder {
  State st;
  int bits;        // 3, 4 or 5
  uint32_t acc = 0;
  int nacc = 0;

  int16_t DecodeCode(int code) {
    const int16_t *dqln, *wi, *fi;
    int sign_bit, wi_shift;
    switch (bits) {
      case 3:
        dqln = kDqln3; wi = kWi3; fi = kFi3; sign_bit = 4; wi_shift = 0;
        break;
      case 5:
        dqln = kDqln5; wi = kWi5; fi = kFi5; sign_bit = 0x10; wi_shift = 0;
        break;
      default:
        dqln = kDqln4; wi = kWi4; fi = kFi4; sign_bit = 8; wi_shift = 5;
        break;
    }
    int sezi = st.PredictorZero();
    int16_t sez = (int16_t)(sezi >> 1);
    int16_t se = (int16_t)((sezi + st.PredictorPole()) >> 1);
    int y = st.StepSize();
    int dq = Reconstruct(code & sign_bit, dqln[code], y);
    int16_t sr = (int16_t)((dq < 0) ? se - (dq & 0x3FFF) : se + dq);
    int16_t dqsez = (int16_t)(sr + sez - se);
    st.Update(bits, y, wi[code] << wi_shift, fi[code], dq, sr, dqsez);
    return (int16_t)(sr << 2);  // sr has 14-bit dynamic range
  }

  // Feed raw bytes; emit every complete code's sample.
  int64_t Decode(const uint8_t* in, uint64_t nbytes, int16_t* out) {
    int64_t n = 0;
    const uint32_t mask = (1u << bits) - 1;
    for (uint64_t i = 0; i < nbytes; ++i) {
      acc |= (uint32_t)in[i] << nacc;
      nacc += 8;
      while (nacc >= bits) {
        out[n++] = DecodeCode((int)(acc & mask));
        acc >>= bits;
        nacc -= bits;
      }
    }
    return n;
  }
};

}  // namespace folve_g72x

extern "C" {

// bits: 4 = G.721 (32 kbps), 3 = G.723_24, 5 = G.723_40.
void* folve_g72x_create(int bits) {
  if (bits != 3 && bits != 4 && bits != 5) return nullptr;
  auto* d = new (std::nothrow) folve_g72x::Decoder;
  if (!d) return nullptr;
  d->bits = bits;
  d->st.Reset();
  return d;
}

void folve_g72x_reset(void* h) {
  auto* d = (folve_g72x::Decoder*)h;
  d->st.Reset();
  d->acc = 0;
  d->nacc = 0;
}

void folve_g72x_close(void* h) { delete (folve_g72x::Decoder*)h; }

// out must hold nbytes*8/bits samples.  Returns samples decoded.
int64_t folve_g72x_decode(void* h, const uint8_t* in, uint64_t nbytes,
                          int16_t* out) {
  return ((folve_g72x::Decoder*)h)->Decode(in, nbytes, out);
}

}  // extern "C"
