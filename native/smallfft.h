// Small mixed-radix complex FFT (radices 2/3/4/5) for transform sizes of
// the form 2^a * 3^b * 5^c — the CELT inverse-MDCT routes through
// half-size FFTs of 60/120/240/480 points (native/celt_codec.cc), which
// a radix-2-only FFT (native/vorbis_codec.cc Imdct::Fft) cannot cover.
//
// From-scratch textbook recursive Cooley-Tukey DIT; no external FFT
// library is linked anywhere in this repo (the reference links
// libfftw3f via zita-convolver, Makefile:14 — our device path uses the
// Pallas matmul-FFT instead, and this header covers the small host-side
// codec transforms).
//
// Usage:
//   SmallFft plan(n);                  // twiddles built once
//   plan.Run(z);                       // in-place, z: n complex floats
//
// Convention: X[m] = sum_n x[n] e^{-2 pi i n m / N} (forward, unscaled).
#ifndef FOLVE_NATIVE_SMALLFFT_H_
#define FOLVE_NATIVE_SMALLFFT_H_

#include <cmath>
#include <cstring>
#include <vector>

namespace folve_smallfft {

struct Cpx {
  float re, im;
};

static inline Cpx CMul(Cpx a, Cpx b) {
  return Cpx{a.re * b.re - a.im * b.im, a.re * b.im + a.im * b.re};
}
static inline Cpx CAdd(Cpx a, Cpx b) { return Cpx{a.re + b.re, a.im + b.im}; }
static inline Cpx CSub(Cpx a, Cpx b) { return Cpx{a.re - b.re, a.im - b.im}; }

class SmallFft {
 public:
  explicit SmallFft(int n) : n_(n) {
    // Root twiddle table: w[k] = e^{-2 pi i k / n}.
    w_.resize(n);
    for (int k = 0; k < n; ++k) {
      double a = -2.0 * M_PI * k / n;
      w_[k] = Cpx{(float)std::cos(a), (float)std::sin(a)};
    }
    scratch_.resize(n);
    ok_ = FactorOk(n);
  }

  bool ok() const { return ok_; }
  int size() const { return n_; }

  // In-place forward FFT of n complex values.  The single-argument form
  // uses the plan's own scratch and is NOT thread-safe; pass per-thread
  // scratch (n complex values) when one plan is shared across threads.
  void Run(Cpx* z) { Rec(z, 1, scratch_.data(), n_); }
  void Run(Cpx* z, Cpx* tmp) const { Rec(z, 1, tmp, n_); }

 private:
  static bool FactorOk(int n) {
    for (int r : {2, 3, 5})
      while (n % r == 0) n /= r;
    return n == 1;
  }

  // DIT: x is the input at stride `stride` (n elements); result is
  // written contiguously back over x's slots... to keep the recursion
  // simple we gather into `out`, recurse, and combine in place.
  void Rec(Cpx* x, int stride, Cpx* tmp, int n) const {
    if (n == 1) return;
    int r = n % 4 == 0 ? 4 : (n % 2 == 0 ? 2 : (n % 3 == 0 ? 3 : 5));
    int m = n / r;
    // Decimate in time: sub-FFT j operates on x[j], x[j+r], ... which
    // live at stride*r. Recurse first, then combine into tmp, copy back.
    for (int j = 0; j < r; ++j) Rec(x + (size_t)j * stride, stride * r, tmp, m);
    // After recursion, sub-FFT j's q-th output sits at x[(j + q*r)*stride]
    // (each sub-transform wrote its outputs over its own input slots).
    const int tw = n_ / n;  // w_n^1 == w_N^{N/n}
    for (int q = 0; q < m; ++q) {
      Cpx t[5];
      for (int j = 0; j < r; ++j) {
        Cpx v = x[(size_t)(j + (size_t)q * r) * stride];
        int idx = (int)(((long long)j * q * tw) % n_);
        t[j] = CMul(v, w_[idx]);
      }
      Butterfly(r, t, tmp + q, m);
    }
    for (int i = 0; i < n; ++i) x[(size_t)i * stride] = tmp[i];
  }

  // X[q + s*m] = sum_j t[j] * w_r^{j s}; writes outputs at out[s*m].
  void Butterfly(int r, const Cpx* t, Cpx* out, int m) const {
    switch (r) {
      case 2: {
        out[0] = CAdd(t[0], t[1]);
        out[m] = CSub(t[0], t[1]);
        break;
      }
      case 4: {
        Cpx a = CAdd(t[0], t[2]), b = CSub(t[0], t[2]);
        Cpx c = CAdd(t[1], t[3]), d = CSub(t[1], t[3]);
        Cpx id{d.im, -d.re};  // -i * d (w_4^1 = -i)
        out[0] = CAdd(a, c);
        out[m] = CAdd(b, id);
        out[2 * m] = CSub(a, c);
        out[3 * m] = CSub(b, id);
        break;
      }
      case 3: {
        // w_3 = c3 + i s3, c3 = -1/2, s3 = -sqrt(3)/2.
        constexpr float c3 = -0.5f;
        constexpr float s3 = -0.86602540378443864676f;
        Cpx sum = CAdd(t[1], t[2]);
        Cpx dif = CSub(t[1], t[2]);
        out[0] = CAdd(t[0], sum);
        Cpx base{t[0].re + c3 * sum.re, t[0].im + c3 * sum.im};
        Cpx rot{-s3 * dif.im, s3 * dif.re};  // i*s3*dif
        out[m] = CAdd(base, rot);
        out[2 * m] = CSub(base, rot);
        break;
      }
      case 5: {
        // w_5^k = ck + i sk (forward convention, negative angles).
        constexpr float c1 = 0.30901699437494742410f;   // cos(2pi/5)
        constexpr float s1 = -0.95105651629515357212f;  // sin(-2pi/5)
        constexpr float c2 = -0.80901699437494742410f;  // cos(4pi/5)
        constexpr float s2 = -0.58778525229247312917f;  // sin(-4pi/5)
        Cpx s14 = CAdd(t[1], t[4]), d14 = CSub(t[1], t[4]);
        Cpx s23 = CAdd(t[2], t[3]), d23 = CSub(t[2], t[3]);
        out[0] = CAdd(t[0], CAdd(s14, s23));
        // X[s] = t0 + w^s t1 + w^{2s} t2 + w^{3s} t3 + w^{4s} t4, using
        // w^{4s} = conj(w^s), w^{3s} = conj(w^{2s}) on the unit circle.
        auto line = [&](float ca, float sa, float cb, float sb) {
          Cpx o;
          o.re = t[0].re + ca * s14.re - sa * d14.im + cb * s23.re -
                 sb * d23.im;
          o.im = t[0].im + ca * s14.im + sa * d14.re + cb * s23.im +
                 sb * d23.re;
          return o;
        };
        out[m] = line(c1, s1, c2, s2);
        out[2 * m] = line(c2, s2, c1, -s1);
        out[3 * m] = line(c2, -s2, c1, s1);
        out[4 * m] = line(c1, -s1, c2, -s2);
        break;
      }
    }
  }

  int n_;
  bool ok_;
  std::vector<Cpx> w_;
  std::vector<Cpx> scratch_;
};

}  // namespace folve_smallfft

#endif  // FOLVE_NATIVE_SMALLFFT_H_
