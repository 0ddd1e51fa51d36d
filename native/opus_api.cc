// Opus packet layer: TOC parsing and per-frame mode dispatch across
// the from-scratch SILK (silk_codec.cc) and CELT (celt_codec.cc)
// decoders — the equivalent of libopus's opus_decoder.c for the
// decode direction, built from RFC 6716 sections 3.1-3.2 (framing)
// and 4.5 (mode switching, redundancy) and validated packet-by-packet
// against the libopus oracle's OPUS_GET_FINAL_RANGE conformance
// check (tests/test_silk.py, tests/test_opus.py).
//
// Reference parity: the reference convolves anything libsndfile
// decodes (/root/reference/convolve-file-handler.cc:62-76), which
// includes Ogg Opus via libopus on libsndfile >= 1.1; this file
// closes the SILK/hybrid half of that (celt_codec.cc closed the
// music-mode half).
//
// Decode model (one frame = one opus_decode_frame equivalent):
//   * SILK-only configs 0-11: one range coder over the frame; the
//     SILK payload may be followed by a CELT redundancy frame (its
//     presence inferred from >= 17 unread bits after the SILK layer).
//   * Hybrid configs 12-15: SILK (wideband core) then CELT (bands
//     17..end) CONTINUE THE SAME range coder; an explicit redundancy
//     flag (logp 12) plus a byte count live between the two layers.
//   * CELT-only configs 16-31: one CELT frame per Opus frame.
//   * Mode transitions crossfade over 2.5 ms using the CELT window,
//     sourced from the redundancy frame when coded.  When the encoder
//     sent none, libopus synthesizes the fade source with a 5 ms PLC
//     frame of the previous mode; we use silence instead (PLC is a
//     loss-concealment feature, not a file-decode feature), so only
//     such unprotected switch frames may differ from the oracle.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <new>

#include "opus_shared.h"

namespace {
bool Trace() {
  static int t = -1;
  if (t < 0) t = std::getenv("FOLVE_OPUS_TRACE") ? 1 : 0;
  return t;
}
}  // namespace
#define OTRACE(...) \
  do { if (Trace()) std::fprintf(stderr, __VA_ARGS__); } while (0)

using folve_opus::EcDec;

// Frame-level entries implemented by the two codec translation units.
extern "C" {
void* folve_silk_create(int channels, int out_hz);
void folve_silk_reset(void* h);
void folve_silk_close(void* h);
int folve_silk_decode_ec(void* h, void* ec, int bw, int duration_ms,
                         int nCh, int16_t* out);
void* folve_celt_create(int channels);
void folve_celt_reset(void* h);
void folve_celt_close(void* h);
int folve_celt_frame_ec(void* h, const uint8_t* data, int len,
                        int nsamples, int start_band, int end_band,
                        int stream_channels, void* ec, float* pcm);
int folve_celt_error(void* h);
uint32_t folve_celt_final_range(void* h);
}

namespace {

constexpr int kF2_5 = 120, kF5 = 240, kF10 = 480, kF20 = 960;
constexpr int kMaxFrameSamples = 2880;   // 60 ms
constexpr int kMaxPacketSamples = 5760;  // 120 ms (RFC 6716 section 3.4)
constexpr int kMaxFrames = 48;

enum Mode { kModeNone = 0, kModeSilk = 1, kModeHybrid = 2, kModeCelt = 3 };
enum Bw { kBwNB = 0, kBwMB = 1, kBwWB = 2, kBwSWB = 3, kBwFB = 4 };

struct Toc {
  Mode mode;
  Bw bandwidth;
  int frame_samples;  // per frame, at 48 kHz
  int stream_channels;
};

Toc ParseToc(uint8_t toc) {
  Toc t;
  int config = toc >> 3;
  t.stream_channels = (toc >> 2) & 1 ? 2 : 1;
  if (config < 12) {
    t.mode = kModeSilk;
    t.bandwidth = (Bw)(config / 4);  // NB, MB, WB
    static const int kDur[4] = {480, 960, 1920, 2880};
    t.frame_samples = kDur[config & 3];
  } else if (config < 16) {
    t.mode = kModeHybrid;
    t.bandwidth = config < 14 ? kBwSWB : kBwFB;
    t.frame_samples = (config & 1) ? 960 : 480;
  } else {
    t.mode = kModeCelt;
    static const Bw kCeltBw[4] = {kBwNB, kBwWB, kBwSWB, kBwFB};
    t.bandwidth = kCeltBw[(config - 16) >> 2];
    t.frame_samples = 120 << (config & 3);
  }
  return t;
}

// RFC 6716 section 3.2 frame packing (codes 0-3, padding, CBR/VBR).
// Returns the frame count, or -1 on malformed packets.
int ParseFrames(const uint8_t* data, int len, const uint8_t** frames,
                int* sizes) {
  if (len < 1) return -1;
  int code = data[0] & 3;
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
    if (count <= 0 || count > kMaxFrames) return -1;
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
      if (left % count) return -1;
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

struct OpusDec {
  void* silk = nullptr;
  void* celt = nullptr;
  int channels = 0;
  Mode prev_mode = kModeNone;
  int prev_redundancy = 0;
  uint32_t range_final = 0;
  float window[kF2_5];  // CELT overlap window, for the 2.5 ms fades

  void Reset() {
    folve_silk_reset(silk);
    folve_celt_reset(celt);
    prev_mode = kModeNone;
    prev_redundancy = 0;
    range_final = 0;
  }
};

// w = window[i]^2 crossfade (opus_decoder.c smooth_fade, float build).
void SmoothFade(const float* in1, const float* in2, float* out,
                int overlap, int channels, const float* window) {
  for (int c = 0; c < channels; ++c)
    for (int i = 0; i < overlap; ++i) {
      float w = window[i] * window[i];
      out[i * channels + c] =
          w * in2[i * channels + c] + (1.f - w) * in1[i * channels + c];
    }
}

int EndBand(Bw bw) {
  static const int kEnd[5] = {13, 17, 17, 19, 21};
  return kEnd[bw];
}

// One Opus frame (opus_decode_frame).  `data`/`len` cover the frame
// payload (no TOC).  Writes toc.frame_samples * channels floats.
// Returns samples per channel, or < 0 on a corrupt frame.
int DecodeOneFrame(OpusDec* st, const Toc& toc, const uint8_t* data,
                   int len, float* pcm) {
  const int C = st->channels;
  const int frame_size = toc.frame_samples;
  uint32_t redundant_rng = 0;

  if (len <= 1) {
    // DTX / empty frame.  libopus runs PLC here; for file serving we
    // emit silence (the encoder only produces these where the signal
    // is silence-like).  Range state: libopus reports 0.
    std::memset(pcm, 0, sizeof(float) * frame_size * C);
    st->range_final = 0;
    if (toc.mode != kModeCelt && st->prev_mode == kModeCelt)
      folve_silk_reset(st->silk);
    st->prev_mode = toc.mode;
    st->prev_redundancy = 0;
    return frame_size;
  }

  EcDec dec;
  dec.Init(data, (uint32_t)len);

  // Mode-transition crossfade source (opus_decoder.c `transition`).
  // libopus renders 5 ms of the PREVIOUS mode via PLC; we fade from
  // silence instead — see the file comment.
  int transition = 0;
  if (st->prev_mode != kModeNone &&
      ((toc.mode == kModeCelt && st->prev_mode != kModeCelt &&
        !st->prev_redundancy) ||
       (toc.mode != kModeCelt && st->prev_mode == kModeCelt)))
    transition = 1;
  float pcm_transition[kF5 * 2] = {0};

  // --- SILK layer -------------------------------------------------
  int16_t pcm_silk[kMaxFrameSamples * 2];
  if (toc.mode != kModeCelt) {
    if (st->prev_mode == kModeCelt) folve_silk_reset(st->silk);
    int bw = toc.mode == kModeHybrid ? 2 : (int)toc.bandwidth;
    int duration_ms = frame_size / 48;
    int r = folve_silk_decode_ec(st->silk, &dec, bw, duration_ms,
                                 toc.stream_channels, pcm_silk);
    if (r < 0) return -1;
    if (r != frame_size) return -1;
  }

  // --- Redundancy signalling (RFC 6716 section 4.5) ----------------
  int redundancy = 0, celt_to_silk = 0, redundancy_bytes = 0;
  OTRACE("frame: mode=%d len=%d tell_after_silk=%d rng=%08x\n", toc.mode,
         len, dec.Tell(), dec.rng);
  if (toc.mode != kModeCelt &&
      dec.Tell() + 17 + 20 * (toc.mode == kModeHybrid) <= 8 * len) {
    if (toc.mode == kModeHybrid)
      redundancy = dec.DecodeBitLogp(12);
    else
      redundancy = 1;
    if (redundancy) {
      celt_to_silk = dec.DecodeBitLogp(1);
      redundancy_bytes = toc.mode == kModeHybrid
                             ? (int)dec.DecodeUint(256) + 2
                             : len - ((dec.Tell() + 7) >> 3);
      len -= redundancy_bytes;
      // Sanity check; not normative (corrupt packet).
      if (len * 8 < dec.Tell()) {
        len = 0;
        redundancy_bytes = 0;
        redundancy = 0;
      }
      // CELT reads raw bits from the end: shrink the coder.
      dec.storage -= (uint32_t)redundancy_bytes;
    }
    OTRACE("  redundancy=%d celt_to_silk=%d bytes=%d len=%d tell=%d\n",
           redundancy, celt_to_silk, redundancy_bytes, len, dec.Tell());
  }
  int start_band = toc.mode != kModeCelt ? 17 : 0;
  if (redundancy) transition = 0;

  // The end band follows the packet bandwidth for BOTH the main CELT
  // layer and any redundancy frames (opus_decoder.c sets
  // CELT_SET_END_BAND once, before either decode).
  int end_band = EndBand(toc.bandwidth);

  // --- 5 ms redundant frame for CELT->SILK ------------------------
  float redundant_audio[kF5 * 2];
  if (redundancy && celt_to_silk) {
    folve_celt_frame_ec(st->celt, data + len, redundancy_bytes, kF5, 0,
                        end_band, toc.stream_channels, nullptr,
                        redundant_audio);
    redundant_rng = folve_celt_final_range(st->celt);
  }

  // --- CELT layer --------------------------------------------------
  if (toc.mode != kModeSilk) {
    int celt_frame_size = frame_size < kF20 ? frame_size : kF20;
    // Discard any previous CELT state on an unprotected mode change.
    if (toc.mode != st->prev_mode && st->prev_mode != kModeNone &&
        !st->prev_redundancy)
      folve_celt_reset(st->celt);
    if (folve_celt_frame_ec(st->celt, data, len, celt_frame_size,
                            start_band, end_band, toc.stream_channels,
                            &dec, pcm) < 0)
      return -1;
  } else {
    std::memset(pcm, 0, sizeof(float) * frame_size * C);
    // Hybrid -> SILK: let the CELT MDCT fade out via a silence frame.
    if (st->prev_mode == kModeHybrid &&
        !(redundancy && celt_to_silk && st->prev_redundancy)) {
      static const uint8_t kSilence[2] = {0xFF, 0xFF};
      float tmp[kF2_5 * 2];
      folve_celt_frame_ec(st->celt, kSilence, 2, kF2_5, 0, 21,
                          toc.stream_channels, nullptr, tmp);
      std::memcpy(pcm, tmp, sizeof(float) * kF2_5 * C);
    }
  }

  // --- Mix the SILK layer in ---------------------------------------
  if (toc.mode != kModeCelt)
    for (int i = 0; i < frame_size * C; ++i)
      pcm[i] += (1.f / 32768.f) * pcm_silk[i];

  // --- 5 ms redundant frame for SILK->CELT ------------------------
  if (redundancy && !celt_to_silk) {
    folve_celt_reset(st->celt);
    folve_celt_frame_ec(st->celt, data + len, redundancy_bytes, kF5, 0,
                        end_band, toc.stream_channels, nullptr,
                        redundant_audio);
    redundant_rng = folve_celt_final_range(st->celt);
    SmoothFade(pcm + C * (frame_size - kF2_5), redundant_audio + C * kF2_5,
               pcm + C * (frame_size - kF2_5), kF2_5, C, st->window);
  }
  if (redundancy && celt_to_silk) {
    std::memcpy(pcm, redundant_audio, sizeof(float) * kF2_5 * C);
    SmoothFade(redundant_audio + C * kF2_5, pcm + C * kF2_5, pcm + C * kF2_5,
               kF2_5, C, st->window);
  }
  if (transition) {
    if (frame_size >= kF5) {
      std::memcpy(pcm, pcm_transition, sizeof(float) * kF2_5 * C);
      SmoothFade(pcm_transition + C * kF2_5, pcm + C * kF2_5, pcm + C * kF2_5,
                 kF2_5, C, st->window);
    } else {
      SmoothFade(pcm_transition, pcm, pcm, kF2_5, C, st->window);
    }
  }

  st->range_final = dec.rng ^ redundant_rng;
  st->prev_mode = toc.mode;
  st->prev_redundancy = redundancy && !celt_to_silk;
  if (dec.error || folve_celt_error(st->celt)) return -3;
  // Structural check: a correct parse never reads past the frame.
  if (toc.mode == kModeSilk && dec.Tell() > 8 * len + 32) return -3;
  return frame_size;
}

}  // namespace

extern "C" {

void* folve_opus_create(int channels) {
  if (channels < 1 || channels > 2) return nullptr;
  auto* st = new (std::nothrow) OpusDec;
  if (!st) return nullptr;
  st->channels = channels;
  st->silk = folve_silk_create(channels, 48000);
  st->celt = folve_celt_create(channels);
  if (!st->silk || !st->celt) {
    if (st->silk) folve_silk_close(st->silk);
    if (st->celt) folve_celt_close(st->celt);
    delete st;
    return nullptr;
  }
  for (int i = 0; i < kF2_5; ++i) {
    double inner = std::sin(0.5 * M_PI * (i + 0.5) / kF2_5);
    st->window[i] = (float)std::sin(0.5 * M_PI * inner * inner);
  }
  return st;
}

void folve_opus_reset(void* h) { ((OpusDec*)h)->Reset(); }

void folve_opus_close(void* h) {
  auto* st = (OpusDec*)h;
  if (!st) return;
  folve_silk_close(st->silk);
  folve_celt_close(st->celt);
  delete st;
}

// Packet probe: total samples per channel at 48 kHz for a valid Opus
// packet of ANY mode, or < 0 if malformed.
int folve_opus_probe(const uint8_t* data, int len) {
  if (len < 1) return -1;
  const uint8_t* frames[kMaxFrames];
  int sizes[kMaxFrames];
  int n = ParseFrames(data, len, frames, sizes);
  if (n <= 0) return -1;
  Toc toc = ParseToc(data[0]);
  int total = n * toc.frame_samples;
  if (total > kMaxPacketSamples) return -1;
  return total;
}

// Decode one packet; pcm must hold probe(data,len) * channels floats.
// Returns total samples per channel, or < 0 on error.
int folve_opus_decode(void* h, const uint8_t* data, int len, float* pcm) {
  auto* st = (OpusDec*)h;
  if (len < 1) return -1;
  const uint8_t* frames[kMaxFrames];
  int sizes[kMaxFrames];
  int n = ParseFrames(data, len, frames, sizes);
  if (n <= 0) return -1;
  Toc toc = ParseToc(data[0]);
  if (n * toc.frame_samples > kMaxPacketSamples) return -1;
  if (toc.stream_channels == 2 && st->channels == 1) {
    // A mono decoder asked to decode a stereo packet: mirror libopus
    // (downmix happens inside the codecs via the API-channel count).
  }
  int done = 0;
  for (int f = 0; f < n; ++f) {
    int r = DecodeOneFrame(st, toc, frames[f], sizes[f],
                           pcm + done * st->channels);
    if (r < 0) return r;
    done += r;
  }
  return done;
}

uint32_t folve_opus_final_range(void* h) {
  return ((OpusDec*)h)->range_final;
}

// Decode a run of packets back-to-back into one contiguous buffer —
// one FFI crossing per read instead of per packet (the per-packet
// numpy/ctypes overhead in the Python Ogg layer was ~45% of decode
// wall time).  `data` + per-packet (offs[i], lens[i]) describe the
// packets; `pcm` holds `capacity` samples per channel.  Stops before
// a packet that would overflow `capacity`.  Returns total samples per
// channel written; `*pkts_done` = packets consumed.  A packet that
// fails to decode ends the run (pkts_done stops there, no error code —
// the caller sees pkts_done < n and treats the stream as ended, the
// same policy as the one-packet API returning < 0).
int folve_opus_decode_batch(void* h, const uint8_t* data,
                            const int32_t* offs, const int32_t* lens,
                            int n, float* pcm, int capacity,
                            int* pkts_done) {
  auto* st = (OpusDec*)h;
  int done = 0, used = 0;
  for (int i = 0; i < n; ++i) {
    const uint8_t* pkt = data + offs[i];
    int len = lens[i];
    int ns = folve_opus_probe(pkt, len);
    if (ns < 0 || done + ns > capacity) break;
    int r = folve_opus_decode(st, pkt, len, pcm + (size_t)done * st->channels);
    if (r < 0) break;
    done += r;
    ++used;
  }
  if (pkts_done) *pkts_done = used;
  return done;
}

}  // extern "C"
