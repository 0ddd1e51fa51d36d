// FLAC codec — native decoder + encoder, no third-party libraries.
//
// Replaces the libsndfile/libFLAC dependency of the reference
// (convolve-file-handler.cc uses libsndfile for FLAC decode/encode and
// libFLAC metadata enums only).  Implements the FLAC format per the
// public specification: metadata blocks, frame headers with CRC-8,
// subframes (CONSTANT/VERBATIM/FIXED/LPC), partitioned Rice residuals,
// stereo decorrelation (left/side, right/side, mid/side), frame CRC-16,
// and a streaming encoder with fixed block size whose STREAMINFO can be
// re-emitted after the fact (the host patches headers the way the
// reference does with SFC_UPDATE_HEADER_NOW, convolve-file-handler.cc:281-317).

#include <algorithm>
#include <array>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include "flac_bits.h"
#include "frame_pool.h"
#include "md5.h"

namespace folve {


uint8_t Crc8(const uint8_t* data, size_t len) {
  // Magic-static init: FramePool workers call this concurrently, so the
  // table build needs the C++11 thread-safe local-static guarantee.
  static const std::array<uint8_t, 256>& table = *[] {
    static std::array<uint8_t, 256> t;
    for (int i = 0; i < 256; i++) {
      uint8_t c = (uint8_t)i;
      for (int k = 0; k < 8; k++) c = (c & 0x80) ? (uint8_t)((c << 1) ^ 0x07) : (uint8_t)(c << 1);
      t[i] = c;
    }
    return &t;
  }();
  uint8_t crc = 0;
  for (size_t i = 0; i < len; i++) crc = table[crc ^ data[i]];
  return crc;
}

uint16_t Crc16(const uint8_t* data, size_t len) {
  // Slice-by-8: t[0] is the classic byte table; t[j] advances a byte
  // through j additional zero bytes, so eight input bytes fold in one
  // table round per iteration.
  struct Tables {
    uint16_t t[8][256];
    Tables() {
      for (int i = 0; i < 256; i++) {
        uint16_t c = (uint16_t)(i << 8);
        for (int k = 0; k < 8; k++)
          c = (c & 0x8000) ? (uint16_t)((c << 1) ^ 0x8005) : (uint16_t)(c << 1);
        t[0][i] = c;
      }
      for (int j = 1; j < 8; j++)
        for (int i = 0; i < 256; i++)
          t[j][i] = (uint16_t)((t[j - 1][i] << 8) ^ t[0][t[j - 1][i] >> 8]);
    }
  };
  static const Tables& tb = *new Tables();  // magic-static: thread-safe
  uint16_t crc = 0;
  size_t i = 0;
  for (; i + 8 <= len; i += 8) {
    // crc covers the first two of the eight bytes.
    crc = (uint16_t)(crc ^ (uint16_t)((uint16_t)data[i] << 8 | data[i + 1]));
    crc = (uint16_t)(tb.t[7][crc >> 8] ^ tb.t[6][crc & 0xFF] ^
                     tb.t[5][data[i + 2]] ^ tb.t[4][data[i + 3]] ^
                     tb.t[3][data[i + 4]] ^ tb.t[2][data[i + 5]] ^
                     tb.t[1][data[i + 6]] ^ tb.t[0][data[i + 7]]);
  }
  for (; i < len; i++)
    crc = (uint16_t)((crc << 8) ^ tb.t[0][(crc >> 8) ^ data[i]]);
  return crc;
}

// ---------------------------------------------------------------------------
// Shared format tables
// ---------------------------------------------------------------------------

struct StreamInfo {
  uint32_t min_blocksize = 0, max_blocksize = 0;
  uint32_t min_framesize = 0, max_framesize = 0;
  uint32_t sample_rate = 0;
  uint32_t channels = 0;
  uint32_t bits_per_sample = 0;
  uint64_t total_samples = 0;
  uint8_t md5[16] = {0};
};

static const int kBlockSizeTable[16] = {0,   192,  576,  1152, 2304, 4608, -1, -2,
                                        256, 512,  1024, 2048, 4096, 8192, 16384, 32768};
static const int kSampleRateTable[12] = {0 /*from streaminfo*/, 88200, 176400, 192000,
                                         8000, 16000, 22050, 24000, 32000, 44100, 48000, 96000};
static const int kSampleSizeTable[8] = {0, 8, 12, -1, 16, 20, 24, 32};

// ---------------------------------------------------------------------------
// Decoder
// ---------------------------------------------------------------------------

class Decoder {
 public:
  // Takes ownership of a copy of the input bytes.
  Decoder(const uint8_t* data, size_t len) : buf_(data, data + len) {}

  bool Init() {
    BitReader br(buf_.data(), buf_.size());
    if (br.ReadBits(32) != 0x664C6143u /* "fLaC" */) return Fail("bad magic");
    bool last = false;
    while (!last && br.ok()) {
      last = br.ReadBits(1);
      uint32_t type = br.ReadBits(7);
      uint32_t blen = br.ReadBits(24);
      size_t start = br.byte_pos();
      if (type == 0) {  // STREAMINFO
        if (blen < 34) return Fail("short streaminfo");
        info_.min_blocksize = br.ReadBits(16);
        info_.max_blocksize = br.ReadBits(16);
        info_.min_framesize = br.ReadBits(24);
        info_.max_framesize = br.ReadBits(24);
        info_.sample_rate = br.ReadBits(20);
        info_.channels = br.ReadBits(3) + 1;
        info_.bits_per_sample = br.ReadBits(5) + 1;
        info_.total_samples = br.ReadBits64(36);
        for (int i = 0; i < 16; i++) info_.md5[i] = (uint8_t)br.ReadBits(8);
        have_streaminfo_ = true;
      }
      br.SeekByte(start + blen);
      if (start + blen > buf_.size()) return Fail("truncated metadata");
    }
    if (!br.ok() || !have_streaminfo_) return Fail("missing streaminfo");
    if (info_.sample_rate == 0 || info_.channels == 0) return Fail("bad streaminfo");
    first_frame_pos_ = br.byte_pos();
    pos_ = first_frame_pos_;
    return true;
  }

  const StreamInfo& info() const { return info_; }
  const std::string& error() const { return error_; }

  void Rewind() {
    pos_ = first_frame_pos_;
    pending_.clear();
    pending_off_ = 0;
    eof_ = false;
  }

  // Decode up to n interleaved frames into out; returns frames produced.
  int64_t Read(int32_t* out, int64_t n) {
    const uint32_t ch = info_.channels;
    int64_t produced = 0;
    while (produced < n) {
      if (pending_off_ < pending_.size()) {
        int64_t avail = (int64_t)(pending_.size() - pending_off_) / ch;
        int64_t take = std::min(avail, n - produced);
        memcpy(out + produced * ch, pending_.data() + pending_off_,
               (size_t)take * ch * sizeof(int32_t));
        pending_off_ += (size_t)take * ch;
        produced += take;
        continue;
      }
      if (eof_) break;
      // Multi-frame requests (the runtime's bulk pump asks for 8 engine
      // blocks at once) fan whole FLAC frames across the codec pool and
      // land straight in `out`; 0 means go frame-at-a-time.
      int64_t batched = ReadParallelBatch(out + produced * ch, n - produced);
      if (batched > 0) {
        produced += batched;
        continue;
      }
      if (!DecodeFrame()) {
        eof_ = true;
      }
    }
    return produced;
  }

 private:
  bool Fail(const char* msg) {
    error_ = msg;
    return false;
  }

  // Coded number: UTF-8-like, up to 36 bits over 7 bytes.
  static bool ReadCodedNumber(BitReader& br, uint64_t* out) {
    uint32_t b0 = br.ReadBits(8);
    if (!br.ok()) return false;
    int extra;
    uint64_t v;
    if (b0 < 0x80) {
      *out = b0;
      return true;
    } else if ((b0 & 0xE0) == 0xC0) {
      extra = 1;
      v = b0 & 0x1F;
    } else if ((b0 & 0xF0) == 0xE0) {
      extra = 2;
      v = b0 & 0x0F;
    } else if ((b0 & 0xF8) == 0xF0) {
      extra = 3;
      v = b0 & 0x07;
    } else if ((b0 & 0xFC) == 0xF8) {
      extra = 4;
      v = b0 & 0x03;
    } else if ((b0 & 0xFE) == 0xFC) {
      extra = 5;
      v = b0 & 0x01;
    } else if (b0 == 0xFE) {
      extra = 6;
      v = 0;
    } else {
      return false;
    }
    for (int i = 0; i < extra; i++) {
      uint32_t b = br.ReadBits(8);
      if (!br.ok() || (b & 0xC0) != 0x80) return false;
      v = (v << 6) | (b & 0x3F);
    }
    *out = v;
    return true;
  }

  bool DecodeSubframe(BitReader& br, uint32_t bps, uint32_t n, int32_t* dst) const {
    if (br.ReadBits(1) != 0) return false;  // mandatory zero pad bit
    uint32_t type = br.ReadBits(6);
    uint32_t wasted = 0;
    if (br.ReadBits(1)) wasted = br.ReadUnary() + 1;
    if (!br.ok() || wasted >= bps) return false;
    uint32_t ebps = bps - wasted;

    if (type == 0) {  // CONSTANT
      int32_t v = br.ReadSigned((int)ebps);
      for (uint32_t i = 0; i < n; i++) dst[i] = v;
    } else if (type == 1) {  // VERBATIM
      for (uint32_t i = 0; i < n; i++) dst[i] = br.ReadSigned((int)ebps);
    } else if (type >= 8 && type <= 12) {  // FIXED, order = type-8
      uint32_t order = type - 8;
      if (order > n) return false;
      for (uint32_t i = 0; i < order; i++) dst[i] = br.ReadSigned((int)ebps);
      if (!DecodeResidual(br, n, order, dst)) return false;
      RestoreFixed(dst, n, order);
    } else if (type >= 32) {  // LPC, order = type-31
      uint32_t order = type - 31;
      if (order > n) return false;
      for (uint32_t i = 0; i < order; i++) dst[i] = br.ReadSigned((int)ebps);
      uint32_t prec = br.ReadBits(4);
      if (prec == 15 || !br.ok()) return false;
      prec += 1;
      int shift = br.ReadSigned(5);
      if (shift < 0) return false;
      int32_t coefs[32];
      for (uint32_t i = 0; i < order; i++) coefs[i] = br.ReadSigned((int)prec);
      if (!DecodeResidual(br, n, order, dst)) return false;
      for (uint32_t i = order; i < n; i++) {
        int64_t acc = 0;
        for (uint32_t j = 0; j < order; j++) acc += (int64_t)coefs[j] * dst[i - 1 - j];
        dst[i] += (int32_t)(acc >> shift);
      }
    } else {
      return false;  // reserved
    }
    if (!br.ok()) return false;
    if (wasted) {
      for (uint32_t i = 0; i < n; i++) dst[i] = (int32_t)((uint32_t)dst[i] << wasted);
    }
    return true;
  }

  // Residual into dst[order..n).  The Rice loop is the decoder's
  // hottest path, so it runs on the 64-bit-cached FastBits reader
  // (borrowed from br and restored at the end — identical semantics).
  bool DecodeResidual(BitReader& br, uint32_t n, uint32_t order,
                      int32_t* dst) const {
    uint32_t method = br.ReadBits(2);
    if (method > 1) return false;
    uint32_t pbits = method == 0 ? 4 : 5;
    uint32_t escape = method == 0 ? 15 : 31;
    uint32_t porder = br.ReadBits(4);
    uint32_t parts = 1u << porder;
    if ((n >> porder) << porder != n) return false;
    if ((n >> porder) < order) return false;
    if (!br.ok()) return false;
    FastBits fb(buf_.data(), buf_.size());
    fb.Borrow(br);
    uint32_t idx = order;
    for (uint32_t p = 0; p < parts; p++) {
      uint32_t count = (n >> porder) - (p == 0 ? order : 0);
      if ((int32_t)count < 0) return false;
      uint32_t param = fb.ReadBits((int)pbits);
      if (param == escape) {
        uint32_t raw = fb.ReadBits(5);
        for (uint32_t i = 0; i < count; i++)
          dst[idx++] = raw ? fb.ReadSigned((int)raw) : 0;
      } else {
        for (uint32_t i = 0; i < count; i++) {
          uint32_t q = fb.ReadUnary();
          uint32_t r = param ? fb.ReadBits((int)param) : 0;
          uint32_t folded = (q << param) | r;
          dst[idx++] = (int32_t)((folded >> 1) ^ (~(folded & 1) + 1));
        }
      }
      if (!fb.ok()) return false;
    }
    fb.Restore(br);
    return br.ok() && idx == n;
  }

  static void RestoreFixed(int32_t* x, uint32_t n, uint32_t order) {
    switch (order) {
      case 0:
        break;
      case 1:
        for (uint32_t i = 1; i < n; i++) x[i] += x[i - 1];
        break;
      case 2:
        for (uint32_t i = 2; i < n; i++) x[i] += 2 * x[i - 1] - x[i - 2];
        break;
      case 3:
        for (uint32_t i = 3; i < n; i++) x[i] += 3 * x[i - 1] - 3 * x[i - 2] + x[i - 3];
        break;
      case 4:
        for (uint32_t i = 4; i < n; i++)
          x[i] += 4 * x[i - 1] - 6 * x[i - 2] + 4 * x[i - 3] - x[i - 4];
        break;
    }
  }

  // Parsed + validated frame header (sync, CRC-8, field sanity).
  struct FrameHeader {
    size_t start = 0;        // byte offset of the sync code
    size_t header_len = 0;   // bytes incl. the CRC-8
    uint32_t blocksize = 0;
    uint32_t bps = 0;        // effective bits/sample for this frame
    bool var_block = false;
    uint64_t coded_num = 0;  // frame number (fixed) or sample number (var)
    bool left_side = false, right_side = false, mid_side = false;
  };

  // Parse a frame header at EXACTLY position p.  True only if the sync
  // code, reserved bits, field codes and header CRC-8 all check out
  // against STREAMINFO.  Const: used from worker threads.
  bool ParseFrameHeader(size_t p, FrameHeader* h) const {
    if (p + 9 > buf_.size()) return false;
    if (!(buf_[p] == 0xFF && (buf_[p + 1] & 0xFC) == 0xF8)) return false;
    BitReader br(buf_.data(), buf_.size());
    br.SeekByte(p);
    br.ReadBits(14);  // sync
    br.ReadBits(1);   // reserved
    h->var_block = br.ReadBits(1) != 0;
    uint32_t bs_code = br.ReadBits(4);
    uint32_t sr_code = br.ReadBits(4);
    uint32_t ch_code = br.ReadBits(4);
    uint32_t ss_code = br.ReadBits(3);
    br.ReadBits(1);  // reserved
    if (!ReadCodedNumber(br, &h->coded_num)) return false;
    if (bs_code == 0) return false;
    int bst = kBlockSizeTable[bs_code];
    if (bst == -1)
      h->blocksize = br.ReadBits(8) + 1;
    else if (bst == -2)
      h->blocksize = br.ReadBits(16) + 1;
    else
      h->blocksize = (uint32_t)bst;
    if (sr_code == 12)
      br.ReadBits(8);
    else if (sr_code == 13 || sr_code == 14)
      br.ReadBits(16);
    else if (sr_code == 15)
      return false;
    size_t crc_pos = br.byte_pos();
    uint8_t hdr_crc = (uint8_t)br.ReadBits(8);
    if (!br.ok()) return false;
    if (Crc8(buf_.data() + p, crc_pos - p) != hdr_crc) return false;

    h->bps = info_.bits_per_sample;
    if (ss_code != 0) {
      int t = kSampleSizeTable[ss_code];
      if (t <= 0) return false;
      h->bps = (uint32_t)t;
    }
    uint32_t nch = info_.channels;
    h->left_side = h->right_side = h->mid_side = false;
    if (ch_code <= 7) {
      if (ch_code + 1 != nch) return false;
    } else if (ch_code == 8) {
      h->left_side = true;
      if (nch != 2) return false;
    } else if (ch_code == 9) {
      h->right_side = true;
      if (nch != 2) return false;
    } else if (ch_code == 10) {
      h->mid_side = true;
      if (nch != 2) return false;
    } else {
      return false;
    }
    h->start = p;
    h->header_len = crc_pos + 1 - p;
    return true;
  }

  // Scan forward from p for the next parseable frame header.  With
  // have_expect, additionally require the coded number to equal the
  // chained expectation — this is what lets the parallel batch scanner
  // find frame BOUNDARIES without decoding the bodies.  The expect-scan
  // is BOUNDED (max_framesize from STREAMINFO, else a generous cap):
  // on streams whose numbers do not chain it must give up after one
  // frame-length's worth of bytes, not rescan to EOF per batch attempt.
  bool FindFrameHeader(size_t p, bool have_expect, uint64_t expect,
                       FrameHeader* h) const {
    size_t limit = buf_.size();
    if (have_expect) {
      size_t span = info_.max_framesize
                        ? (size_t)info_.max_framesize * 2 + 4096
                        : (size_t)(1 << 22);
      if (p + span < limit) limit = p + span;
    }
    while (p + 2 <= limit) {
      if (buf_[p] == 0xFF && (buf_[p + 1] & 0xFC) == 0xF8 &&
          ParseFrameHeader(p, h) &&
          (!have_expect || h->coded_num == expect)) {
        return true;
      }
      p++;
    }
    return false;
  }

  // Decode the body of a parsed frame into dst (interleaved, blocksize *
  // channels int32) and report the byte just past the frame CRC-16.
  // Fails (without touching members) on any decode error or CRC-16
  // mismatch.  Const: runs on FramePool workers in the parallel path.
  bool DecodeFrameBody(const FrameHeader& h, int32_t* dst, size_t* end) const {
    const uint32_t nch = info_.channels;
    const uint32_t blocksize = h.blocksize;
    BitReader br(buf_.data(), buf_.size());
    br.SeekByte(h.start + h.header_len);
    // Thread-local scratch: this runs per frame, also on FramePool
    // workers; fresh per-frame vectors dominated the decode profile.
    static thread_local std::vector<std::vector<int32_t>> chan;
    if (chan.size() < nch) chan.resize(nch);
    for (uint32_t c = 0; c < nch; c++)
      if (chan[c].size() < blocksize) chan[c].resize(blocksize);
    for (uint32_t c = 0; c < nch; c++) {
      uint32_t sub_bps = h.bps;
      if ((h.left_side && c == 1) || (h.right_side && c == 0) ||
          (h.mid_side && c == 1))
        sub_bps += 1;  // side channel carries one extra bit
      if (!DecodeSubframe(br, sub_bps, blocksize, chan[c].data())) return false;
    }
    br.AlignToByte();
    size_t frame_end = br.byte_pos();
    uint16_t crc = (uint16_t)br.ReadBits(16);
    if (!br.ok()) return false;
    if (Crc16(buf_.data() + h.start, frame_end - h.start) != crc) return false;
    *end = br.byte_pos();

    // Undo stereo decorrelation.
    if (h.left_side) {
      for (uint32_t i = 0; i < blocksize; i++) chan[1][i] = chan[0][i] - chan[1][i];
    } else if (h.right_side) {
      for (uint32_t i = 0; i < blocksize; i++) chan[0][i] = chan[1][i] + chan[0][i];
    } else if (h.mid_side) {
      for (uint32_t i = 0; i < blocksize; i++) {
        int32_t mid = chan[0][i];
        int32_t side = chan[1][i];
        mid = (int32_t)(((uint32_t)mid << 1) | ((uint32_t)side & 1));
        chan[0][i] = (mid + side) >> 1;
        chan[1][i] = (mid - side) >> 1;
      }
    }
    for (uint32_t i = 0; i < blocksize; i++)
      for (uint32_t c = 0; c < nch; c++) dst[(size_t)i * nch + c] = chan[c][i];
    return true;
  }

  bool DecodeFrame() {
    size_t p = pos_;
    FrameHeader h;
    for (;;) {
      if (!FindFrameHeader(p, false, 0, &h)) return false;
      pending_.assign((size_t)h.blocksize * info_.channels, 0);
      pending_off_ = 0;
      size_t end = 0;
      if (DecodeFrameBody(h, pending_.data(), &end)) {
        pos_ = end;
        return true;
      }
      // Corrupt frame (or emulated sync); resync one byte later —
      // exactly the serial decoder's historical behavior.
      p = h.start + 1;
      pending_.clear();
    }
  }

  // Decode up to `want` frames' worth of samples starting at pos_ by
  // fanning independent FLAC frames across the process FramePool,
  // writing straight into the caller's buffer.  The frame list comes
  // from a cheap header scan (sync + CRC-8 + chained frame numbers);
  // every body decode then validates its CRC-16 and the chain is
  // checked to be gapless (each frame must END exactly where the next
  // header was found).  Any anomaly discards the whole batch and lets
  // the serial path redo it — output is always identical to serial
  // decode.  Returns samples produced (0 = caller should go serial).
  int64_t ReadParallelBatch(int32_t* out, int64_t want) {
    if (FramePool::Instance().EffectiveThreads() <= 1) return 0;
    const uint32_t ch = info_.channels;
    std::vector<FrameHeader> hs;
    std::vector<int64_t> offs;  // cumulative samples before frame i
    int64_t total = 0;
    uint64_t expect = 0;
    bool have_expect = false;
    size_t p = pos_;
    while ((int64_t)hs.size() < kMaxParallelFrames) {
      FrameHeader h;
      if (!FindFrameHeader(p, have_expect, expect, &h)) break;
      if (total + (int64_t)h.blocksize > want) break;
      if (!hs.empty() && h.start == hs.back().start) break;  // no progress
      hs.push_back(h);
      offs.push_back(total);
      total += h.blocksize;
      p = h.start + h.header_len;
      expect = h.var_block ? h.coded_num + h.blocksize : h.coded_num + 1;
      have_expect = true;
    }
    if (hs.size() < 2) return 0;

    const size_t k = hs.size();
    std::vector<size_t> ends(k, 0);
    std::vector<uint8_t> ok(k, 0);
    bool pooled = FramePool::Instance().Run(
        [&](size_t i) {
          ok[i] = DecodeFrameBody(hs[i], out + offs[i] * ch, &ends[i]) ? 1 : 0;
        },
        k);
    if (!pooled) return 0;  // pool shrank between the check and Run
    // Accept the longest valid PREFIX: each kept frame must decode
    // (its CRC-16 is authoritative) and must start exactly where its
    // predecessor ended (otherwise its header was an emulated sync
    // inside the predecessor's body and everything after is garbage).
    // Around a corruption this degrades to "decode up to the bad
    // frame" and the serial resync path handles the bad spot once —
    // not a discarded batch per Read call.
    size_t m = 0;
    while (m < k && ok[m] && (m == 0 || ends[m - 1] == hs[m].start)) m++;
    if (m == 0) return 0;  // serial path redoes the first frame
    pos_ = ends[m - 1];
    return offs[m - 1] + (int64_t)hs[m - 1].blocksize;
  }

  static constexpr int kMaxParallelFrames = 64;

  std::vector<uint8_t> buf_;
  StreamInfo info_;
  bool have_streaminfo_ = false;
  size_t first_frame_pos_ = 0;
  size_t pos_ = 0;
  std::vector<int32_t> pending_;
  size_t pending_off_ = 0;
  bool eof_ = false;
  std::string error_;
};

// ---------------------------------------------------------------------------
// Encoder
// ---------------------------------------------------------------------------

class Encoder {
 public:
  Encoder(uint32_t rate, uint32_t channels, uint32_t bps, uint32_t blocksize,
          uint64_t total_samples_hint)
      : rate_(rate), channels_(channels), bps_(bps), blocksize_(blocksize),
        total_hint_(total_samples_hint) {}

  uint32_t blocksize() const { return blocksize_; }
  uint64_t frames_written() const { return frames_written_; }

  // The serving path redacts the MD5 field from the header it emits
  // (convolve-file-handler.cc:449-457 zeroes it: the full-stream digest
  // cannot be known when the header streams out first), so computing it
  // per Write is pure waste there — ~25% of encode time on 24-bit
  // material.  Offline writers keep it on (default).
  void SetComputeMd5(bool on) { compute_md5_ = on; }

  // fLaC magic + STREAMINFO (+ padding block).  Emitted before any audio;
  // sample count uses the hint (0 = unknown), MD5 still zero.
  std::vector<uint8_t> Header() {
    std::vector<uint8_t> out;
    out.insert(out.end(), {'f', 'L', 'a', 'C'});
    AppendStreamInfoBlock(&out, /*last=*/false);
    // Small padding block, mirroring the final padding the reference
    // appends (convolve-file-handler.cc:476-481).
    out.push_back(0x81);  // last-block flag | PADDING type 1
    out.push_back(0);
    out.push_back(0);
    out.push_back(16);
    out.insert(out.end(), 16, 0);
    header_size_ = out.size();
    return out;
  }

  size_t header_size() const { return header_size_; }

  // Current STREAMINFO contents (34 bytes) reflecting everything written
  // so far — for header patching after streaming (the reference's
  // SFC_UPDATE_HEADER_NOW + WriteCharAt path).
  std::vector<uint8_t> StreamInfoBytes(bool with_md5) {
    StreamInfo si = CurrentInfo();
    if (with_md5 && compute_md5_) {
      MD5 md5_copy = md5_;
      md5_copy.Final(si.md5);
    }
    return SerializeStreamInfo(si);
  }

  // Encode n interleaved frames; returns encoded bytes (possibly empty —
  // data is buffered until a full block is available).  Full blocks are
  // encoded straight out of the caller's buffer; only a sub-block
  // remainder is ever copied.
  std::vector<uint8_t> Write(const int32_t* interleaved, uint64_t n) {
    std::vector<uint8_t> out;
    // MD5 runs over little-endian raw samples at bps width (per spec).
    UpdateMd5(interleaved, n);
    const size_t stride = (size_t)blocksize_ * channels_;
    size_t pos = 0;  // samples (not frames) consumed from the input
    // Gather every complete block available this call, then encode them
    // concurrently (frames are independent; see FramePool).  Counters
    // fold in frame order afterwards, so the byte stream and STREAMINFO
    // are bit-identical to the serial path.
    std::vector<const int32_t*> blocks;
    bool carry_completed = false;
    if (!carry_.empty()) {
      size_t need = stride - carry_.size();
      size_t take = std::min(need, (size_t)n * channels_);
      carry_.insert(carry_.end(), interleaved, interleaved + take);
      pos = take;
      if (carry_.size() == stride) {
        blocks.push_back(carry_.data());
        carry_completed = true;
      }
    }
    const size_t total = (size_t)n * channels_;
    while (total - pos >= stride) {
      blocks.push_back(interleaved + pos);
      pos += stride;
    }
    if (!blocks.empty()) {
      std::vector<std::vector<uint8_t>> frames(blocks.size());
      auto encode_one = [&](size_t i) {
        EncodeFrame(blocks[i], blocksize_, frame_index_ + i, &frames[i]);
      };
      if (!FramePool::Instance().Run(encode_one, blocks.size()))
        for (size_t i = 0; i < blocks.size(); i++) encode_one(i);
      for (auto& f : frames) {
        NoteFrame(f, blocksize_);
        out.insert(out.end(), f.begin(), f.end());
      }
      if (carry_completed) carry_.clear();
    }
    if (pos < total) carry_.insert(carry_.end(), interleaved + pos, interleaved + total);
    return out;
  }

  // Flush the final partial block.
  std::vector<uint8_t> Finish() {
    std::vector<uint8_t> out;
    uint32_t rem = (uint32_t)(carry_.size() / channels_);
    if (rem) EncodeBlock(carry_.data(), rem, &out);
    carry_.clear();
    return out;
  }

 private:
  StreamInfo CurrentInfo() {
    StreamInfo si;
    si.min_blocksize = blocksize_;
    si.max_blocksize = blocksize_;
    si.min_framesize = min_framesize_ == UINT32_MAX ? 0 : min_framesize_;
    si.max_framesize = max_framesize_;
    si.sample_rate = rate_;
    si.channels = channels_;
    si.bits_per_sample = bps_;
    si.total_samples = frames_written_ ? frames_written_ : total_hint_;
    return si;
  }

  static std::vector<uint8_t> SerializeStreamInfo(const StreamInfo& si) {
    std::vector<uint8_t> out;
    BitWriter bw(&out);
    bw.WriteBits(si.min_blocksize, 16);
    bw.WriteBits(si.max_blocksize, 16);
    bw.WriteBits(si.min_framesize, 24);
    bw.WriteBits(si.max_framesize, 24);
    bw.WriteBits(si.sample_rate, 20);
    bw.WriteBits(si.channels - 1, 3);
    bw.WriteBits(si.bits_per_sample - 1, 5);
    bw.WriteBits64(si.total_samples, 36);
    for (int i = 0; i < 16; i++) bw.WriteBits(si.md5[i], 8);
    bw.Finish();
    return out;
  }

  void AppendStreamInfoBlock(std::vector<uint8_t>* out, bool last) {
    std::vector<uint8_t> si = SerializeStreamInfo(CurrentInfo());
    out->push_back((last ? 0x80 : 0x00) | 0x00);
    out->push_back(0);
    out->push_back(0);
    out->push_back((uint8_t)si.size());
    out->insert(out->end(), si.begin(), si.end());
  }

  void UpdateMd5(const int32_t* x, uint64_t nframes) {
    if (!compute_md5_) return;
    size_t count = (size_t)nframes * channels_;
    uint32_t bytes = (bps_ + 7) / 8;
    md5_buf_.resize(count * bytes);
    uint8_t* p = md5_buf_.data();
    if (bytes == 2) {  // dominant case: int32 -> little-endian int16 pack
      int16_t* q = (int16_t*)p;
      for (size_t i = 0; i < count; i++) q[i] = (int16_t)x[i];
    } else if (bytes == 4) {
      memcpy(p, x, count * 4);  // already little-endian int32
    } else {
      for (size_t i = 0; i < count; i++) {
        uint32_t v = (uint32_t)x[i];
        for (uint32_t b = 0; b < bytes; b++) *p++ = (uint8_t)(v >> (8 * b));
      }
    }
    md5_.Update(md5_buf_.data(), md5_buf_.size());
  }

  // --- prediction helpers -------------------------------------------------

  static uint64_t SumAbs(const int64_t* e, uint32_t n) {
    uint64_t s = 0;
    for (uint32_t i = 0; i < n; i++) s += (uint64_t)(e[i] < 0 ? -e[i] : e[i]);
    return s;
  }

  // Compute fixed-predictor residuals of given order into res (n-order values).
  static void FixedResidual(const int32_t* x, uint32_t n, uint32_t order, int64_t* res) {
    switch (order) {
      case 0:
        for (uint32_t i = 0; i < n; i++) res[i] = x[i];
        break;
      case 1:
        for (uint32_t i = 1; i < n; i++) res[i - 1] = (int64_t)x[i] - x[i - 1];
        break;
      case 2:
        for (uint32_t i = 2; i < n; i++)
          res[i - 2] = (int64_t)x[i] - 2 * (int64_t)x[i - 1] + x[i - 2];
        break;
      case 3:
        for (uint32_t i = 3; i < n; i++)
          res[i - 3] = (int64_t)x[i] - 3 * (int64_t)x[i - 1] + 3 * (int64_t)x[i - 2] - x[i - 3];
        break;
      case 4:
        for (uint32_t i = 4; i < n; i++)
          res[i - 4] = (int64_t)x[i] - 4 * (int64_t)x[i - 1] + 6 * (int64_t)x[i - 2] -
                       4 * (int64_t)x[i - 3] + x[i - 4];
        break;
    }
  }

  // Estimated Rice cost in bits: n*(k+1) quotient-terminators+remainders
  // plus the unary quotient mass (folded sum ~ 2*sum).
  static inline uint64_t RiceCost(uint64_t sum, uint32_t n, uint32_t k) {
    return (uint64_t)n * (k + 1) + ((2 * sum) >> k);
  }

  // Pick k minimizing the estimated cost (the closed-form
  // k ~ log2(mean) lands 1-2 low for heavy-tailed partitions, costing
  // whole bits per sample on hot material).
  static uint32_t BestRiceParam(const uint64_t sum, uint32_t n,
                                uint32_t max_param, uint64_t* cost_out) {
    if (n == 0) {
      if (cost_out) *cost_out = 0;
      return 0;
    }
    uint64_t mean = sum / n;
    uint32_t k0 = 0;
    while ((1ull << (k0 + 1)) < mean + 1 && k0 < max_param) k0++;
    uint32_t best_k = k0;
    uint64_t best_cost = RiceCost(sum, n, k0);
    for (uint32_t k = k0 > 2 ? k0 - 2 : 0;
         k <= (k0 + 2 < max_param ? k0 + 2 : max_param); k++) {
      uint64_t c = RiceCost(sum, n, k);
      if (c < best_cost) {
        best_cost = c;
        best_k = k;
      }
    }
    if (cost_out) *cost_out = best_cost;
    return best_k;
  }

  // Estimated total bits of the partitioned coding WriteResidual would
  // emit (same partition order, per-partition k and raw escapes).
  uint64_t PlanResidualCost(const int64_t* res, uint32_t n, uint32_t order,
                            uint32_t blocksize) const {
    uint32_t porder = 0;
    while (porder < 6 && (blocksize % (1u << (porder + 1))) == 0 &&
           (blocksize >> (porder + 1)) > order && (n >> (porder + 1)) >= 64)
      porder++;
    uint32_t parts = 1u << porder;
    uint64_t total = 6;  // method + porder header
    uint32_t idx = 0;
    for (uint32_t p = 0; p < parts; p++) {
      uint32_t count = (blocksize >> porder) - (p == 0 ? order : 0);
      uint64_t sum = 0, max_abs = 0;
      for (uint32_t i = 0; i < count; i++) {
        int64_t e = res[idx + i];
        uint64_t a = (uint64_t)(e < 0 ? -e : e);
        sum += a;
        if (a > max_abs) max_abs = a;
      }
      uint64_t rice_cost;
      BestRiceParam(sum, count, 30, &rice_cost);
      uint32_t rawbits = Bits64(max_abs << 1) + 1;
      uint64_t raw_cost = 5 + (uint64_t)count * rawbits;
      total += 5 + (rawbits <= 31 && raw_cost < rice_cost ? raw_cost
                                                          : rice_cost);
      idx += count;
    }
    return total;
  }

  // Encode a rice-partitioned residual.  Parameters are chosen per
  // partition by estimated bit cost; partitions whose raw encoding is
  // cheaper than Rice escape to raw, and a stream needing any k > 14
  // switches the whole residual to coding method 1 (5-bit "Rice2"
  // params, k up to 30) — without it, hot 24-bit residuals capped at
  // k=14 degenerate into kilobit unary runs per sample.
  void WriteResidual(BitWriter& bw, const int64_t* res, uint32_t n, uint32_t order,
                     uint32_t blocksize) const {
    // Choose a partition order that divides the blocksize; cap 2^po <= 64.
    uint32_t porder = 0;
    while (porder < 6 && (blocksize % (1u << (porder + 1))) == 0 &&
           (blocksize >> (porder + 1)) > order && (n >> (porder + 1)) >= 64)
      porder++;
    uint32_t parts = 1u << porder;
    struct Part {
      uint32_t k;
      uint32_t rawbits;  // 0 = rice, else raw escape at this width
    };
    Part plan[64];
    bool need_rice2 = false;
    {
      uint32_t idx = 0;
      for (uint32_t p = 0; p < parts; p++) {
        uint32_t count = (blocksize >> porder) - (p == 0 ? order : 0);
        uint64_t sum = 0, max_abs = 0;
        for (uint32_t i = 0; i < count; i++) {
          int64_t e = res[idx + i];
          uint64_t a = (uint64_t)(e < 0 ? -e : e);
          sum += a;
          if (a > max_abs) max_abs = a;
        }
        uint64_t rice_cost;
        uint32_t k = BestRiceParam(sum, count, 30, &rice_cost);
        uint32_t rawbits = Bits64(max_abs << 1) + 1;  // |Fold(e)| width
        uint64_t raw_cost = 5 + (uint64_t)count * rawbits;
        // Raw escape only when every value truly fits the 31-bit
        // field; wider residuals stay Rice (whose unary quotient
        // handles any magnitude) rather than being silently truncated.
        if (rawbits <= 31 && raw_cost < rice_cost) {
          plan[p] = {0, rawbits};
        } else {
          plan[p] = {k, 0};
          if (k > 14) need_rice2 = true;
        }
        idx += count;
      }
    }
    const uint32_t pbits = need_rice2 ? 5 : 4;
    const uint32_t escape = need_rice2 ? 31 : 15;
    bw.WriteBits(need_rice2 ? 1 : 0, 2);
    bw.WriteBits(porder, 4);
    uint32_t idx = 0;
    // Per-sample WriteRice was ~50% of total encode time (rdtsc
    // sections): the fold branch mispredicts on noise-like residual
    // signs and every sample adds serial accumulator ops.  Instead,
    // precompute (codeword, length) per sample in one branch-free
    // vectorizable pass (zigzag fold, shared k per partition), then
    // run a minimal scalar pack loop.  Partitions with any codeword
    // longer than 32 bits (ultra-heavy tails that did not escape to
    // raw) fall back to the per-sample path.
    static thread_local std::vector<uint64_t> codes;
    static thread_local std::vector<uint32_t> lens;
    for (uint32_t p = 0; p < parts; p++) {
      uint32_t count = (blocksize >> porder) - (p == 0 ? order : 0);
      if (plan[p].rawbits) {
        bw.WriteBits(escape, (int)pbits);
        bw.WriteBits(plan[p].rawbits, 5);
        const uint32_t rb = plan[p].rawbits;
        const uint64_t mask = (rb >= 64) ? ~0ull : ((1ull << rb) - 1);
        const int64_t* __restrict__ rp = res + idx;
        for (uint32_t i = 0; i < count; i++)
          bw.WriteBits((uint32_t)((uint64_t)rp[i] & mask), (int)rb);
      } else {
        const uint32_t k = plan[p].k;
        bw.WriteBits(k, (int)pbits);
        codes.resize(count);
        lens.resize(count);
        const int64_t* __restrict__ rp = res + idx;
        uint64_t* __restrict__ cp = codes.data();
        uint32_t* __restrict__ lp = lens.data();
        const uint64_t kmask = (1ull << k) - 1;
        const uint64_t kbit = 1ull << k;
        uint32_t max_len = 0;
#pragma omp simd reduction(max : max_len)
        for (uint32_t i = 0; i < count; i++) {
          int64_t v = rp[i];
          uint64_t f = ((uint64_t)v << 1) ^ (uint64_t)(v >> 63);  // zigzag
          uint32_t len = (uint32_t)(f >> k) + 1 + k;
          cp[i] = kbit | (f & kmask);
          lp[i] = len;
          max_len = len > max_len ? len : max_len;
        }
        if (max_len <= 32) {
          for (uint32_t i = 0; i < count; i++)
            bw.WriteBits((uint32_t)cp[i], (int)lp[i]);
        } else {
          for (uint32_t i = 0; i < count; i++)
            bw.WriteRice(Fold(rp[i]), k);
        }
      }
      idx += count;
    }
  }

  static inline uint64_t Fold(int64_t v) {
    return v >= 0 ? ((uint64_t)v << 1) : (((uint64_t)(-v) << 1) - 1);
  }

  static inline uint32_t Bits64(uint64_t v) {
    return v ? (uint32_t)(64 - __builtin_clzll(v)) : 0;
  }

  // --- LPC analysis -------------------------------------------------------

  static constexpr uint32_t kMaxLpcOrder = 12;
  static constexpr uint32_t kLpcPrecision = 15;

  // Welch-windowed autocorrelation + Levinson-Durbin.  Returns the best
  // order (0 = LPC not worthwhile) with quantized coefficients.
  static uint32_t AnalyzeLpc(const int32_t* x, uint32_t n, int32_t* qcoef,
                             int* shift_out, double* expected_err) {
    if (n < 64) return 0;
    uint32_t max_order = kMaxLpcOrder;
    // Windowed copy (thread-local scratch: this runs once per subframe
    // on pool workers; a fresh 32 KB vector per call dominated the
    // analysis cost).
    static thread_local std::vector<double> w;
    w.resize(n);
    double half = (n - 1) / 2.0;
    {
      double* __restrict__ wp = w.data();
      const int32_t* __restrict__ xp = x;
#pragma omp simd
      for (uint32_t i = 0; i < n; i++) {
        double t = (i - half) / half;
        wp[i] = xp[i] * (1.0 - t * t);  // Welch window
      }
    }
    double autoc[kMaxLpcOrder + 1] = {0};
    // Per-lag dot products.  The omp-simd reduction pragma grants the
    // reassociation a strict-FP build refuses, so each loop vectorizes
    // to wide FMAs (built with -fopenmp-simd: pragma only, no runtime).
    {
      const double* wp = w.data();
      for (uint32_t lag = 0; lag <= max_order; lag++) {
        double acc = 0;
#pragma omp simd reduction(+ : acc)
        for (uint32_t i = lag; i < n; i++) acc += wp[i] * wp[i - lag];
        autoc[lag] = acc;
      }
    }
    if (autoc[0] <= 0) return 0;
    // Levinson-Durbin, tracking error per order.
    double lpc[kMaxLpcOrder][kMaxLpcOrder];
    double err = autoc[0];
    double order_err[kMaxLpcOrder + 1];
    order_err[0] = err;
    double cur[kMaxLpcOrder] = {0};
    for (uint32_t i = 0; i < max_order; i++) {
      double acc = autoc[i + 1];
      for (uint32_t j = 0; j < i; j++) acc -= cur[j] * autoc[i - j];
      double k = err > 0 ? acc / err : 0;
      double next[kMaxLpcOrder];
      for (uint32_t j = 0; j < i; j++) next[j] = cur[j] - k * cur[i - 1 - j];
      next[i] = k;
      for (uint32_t j = 0; j <= i; j++) cur[j] = next[j];
      err *= (1.0 - k * k);
      order_err[i + 1] = err;
      for (uint32_t j = 0; j <= i; j++) lpc[i][j] = cur[j];
    }
    // Pick the order minimizing expected bits: ~ n/2*log2(err) + header.
    uint32_t best_order = 1;
    double best_bits = 1e300;
    for (uint32_t o = 1; o <= max_order; o++) {
      double e = order_err[o] / n;
      double bits_per_sample = e > 1e-9 ? 0.5 * log2(e) : 0.0;
      double bits = n * bits_per_sample + o * (kLpcPrecision + 18.0);
      if (bits < best_bits) {
        best_bits = bits;
        best_order = o;
      }
    }
    // Quantize best_order coefficients.
    const double* coefs = lpc[best_order - 1];
    double cmax = 0;
    for (uint32_t j = 0; j < best_order; j++)
      cmax = std::max(cmax, std::abs(coefs[j]));
    if (cmax <= 0) return 0;
    int log2cmax;
    frexp(cmax, &log2cmax);
    int shift = (int)kLpcPrecision - 1 - log2cmax;
    if (shift > 15) shift = 15;
    if (shift < 0) return 0;  // coefficients too large; skip LPC
    double error_fb = 0;
    int32_t qmax = (1 << (kLpcPrecision - 1)) - 1;
    int32_t qmin = -(1 << (kLpcPrecision - 1));
    for (uint32_t j = 0; j < best_order; j++) {
      double v = coefs[j] * (double)(1 << shift) + error_fb;
      int32_t q = (int32_t)lround(v);
      if (q > qmax) q = qmax;
      if (q < qmin) q = qmin;
      error_fb = v - q;
      qcoef[j] = q;
    }
    *shift_out = shift;
    *expected_err = order_err[best_order];
    return best_order;
  }

  // Encode one channel's subframe (LPC, FIXED, CONSTANT or VERBATIM).
  void EncodeSubframe(BitWriter& bw, const int32_t* x, uint32_t n,
                      uint32_t bps) const {
    bw.WriteBits(0, 1);  // pad
    bool constant = true;
    for (uint32_t i = 1; i < n; i++)
      if (x[i] != x[0]) {
        constant = false;
        break;
      }
    if (constant) {
      bw.WriteBits(0, 6);  // CONSTANT
      bw.WriteBits(0, 1);  // no wasted bits
      bw.WriteSigned(x[0], (int)bps);
      return;
    }
    // Pick best fixed order by sum of |residual|.  Successive orders are
    // first differences of the previous order's residual, so selection
    // is one progressive diff chain instead of five fresh passes.
    uint32_t max_order = std::min<uint32_t>(4, n > 4 ? 4 : n - 1);
    uint32_t best_order = 0;
    uint64_t best_sum = UINT64_MAX;
    // Ping-pong forward diffs: order o's residual is the first
    // difference of order o-1's.  Forward src->dst loops with the sum
    // fused in vectorize; the old in-place backward walk did not.
    static thread_local std::vector<int64_t> res, nxt;
    res.resize(n);
    nxt.resize(n);
    {
      uint64_t s = 0;
      for (uint32_t i = 0; i < n; i++) {
        res[i] = x[i];
        s += (uint64_t)(x[i] < 0 ? -(int64_t)x[i] : (int64_t)x[i]);
      }
      best_sum = s;
    }
    for (uint32_t o = 1; o <= max_order; o++) {
      const int64_t* __restrict__ src = res.data();
      int64_t* __restrict__ dst = nxt.data();
      uint64_t s = 0;
      uint32_t cnt = n - o;
#pragma omp simd reduction(+ : s)
      for (uint32_t i = 0; i < cnt; i++) {
        int64_t v = src[i + 1] - src[i];
        dst[i] = v;
        s += (uint64_t)(v < 0 ? -v : v);
      }
      res.swap(nxt);
      if (s < best_sum) {
        best_sum = s;
        best_order = o;
      }
    }

    // Try LPC and take it when its residual actually beats FIXED's.
    int32_t qcoef[kMaxLpcOrder];
    int shift = 0;
    double exp_err = 0;
    uint32_t lpc_order = AnalyzeLpc(x, n, qcoef, &shift, &exp_err);
    if (lpc_order > 0) {
      static thread_local std::vector<int64_t> lres;
      lres.resize(n);
      // Per-coefficient passes: each j-loop is an elementwise
      // multiply-accumulate over i that the compiler vectorizes; the
      // i-outer form (dot product per sample with a variable-length
      // inner loop) stays scalar.
      const uint32_t cnt = n - lpc_order;
      int64_t* __restrict__ acc = lres.data();  // built in place, then folded
      {
        const int64_t c0 = qcoef[0];
        const int32_t* __restrict__ xs = x + lpc_order - 1;
#pragma omp simd
        for (uint32_t i = 0; i < cnt; i++) acc[i] = c0 * xs[i];
      }
      for (uint32_t j = 1; j < lpc_order; j++) {
        const int64_t cj = qcoef[j];
        const int32_t* __restrict__ xs = x + lpc_order - 1 - j;
#pragma omp simd
        for (uint32_t i = 0; i < cnt; i++) acc[i] += cj * xs[i];
      }
      {
        const int32_t* __restrict__ xs = x + lpc_order;
#pragma omp simd
        for (uint32_t i = 0; i < cnt; i++)
          acc[i] = (int64_t)xs[i] - (acc[i] >> shift);
      }
      uint64_t lpc_sum = SumAbs(lres.data(), n - lpc_order);
      // Rough bit accounting: residual cost scales with log2 of the
      // mean magnitude; include the coefficient header overhead.
      double fixed_bits =
          (n - best_order) * (log2((double)best_sum / (n - best_order) + 1) + 1.6);
      double lpc_bits =
          (n - lpc_order) * (log2((double)lpc_sum / (n - lpc_order) + 1) + 1.6) +
          lpc_order * (kLpcPrecision + (double)bps) + 9;
      if (lpc_bits < fixed_bits) {
        bw.WriteBits(32 + (lpc_order - 1), 6);  // LPC subframe type
        bw.WriteBits(0, 1);                     // no wasted bits
        for (uint32_t i = 0; i < lpc_order; i++) bw.WriteSigned(x[i], (int)bps);
        bw.WriteBits(kLpcPrecision - 1, 4);
        bw.WriteSigned(shift, 5);
        for (uint32_t i = 0; i < lpc_order; i++)
          bw.WriteSigned(qcoef[i], (int)kLpcPrecision);
        WriteResidual(bw, lres.data(), n - lpc_order, lpc_order, n);
        return;
      }
    }

    // Incompressible signal: a VERBATIM subframe beats any residual
    // coding once the best achievable Rice cost reaches raw size
    // (uniform full-scale noise codes at ~bps+1 bits/sample as Rice;
    // VERBATIM serves it at exactly bps).  The cheap single-k estimate
    // only SCREENS; partitioned coding with per-partition k can beat
    // it badly on mixed quiet/loud blocks (a fade into applause), so
    // the decision is confirmed against a partitioned estimate.
    uint64_t rice_est;
    BestRiceParam(best_sum, n - best_order, 30, &rice_est);
    if (rice_est >= (uint64_t)n * bps) {
      FixedResidual(x, n, best_order, res.data());
      rice_est = PlanResidualCost(res.data(), n - best_order, best_order, n);
    }
    if (rice_est >= (uint64_t)n * bps) {
      bw.WriteBits(1, 6);  // VERBATIM
      bw.WriteBits(0, 1);  // no wasted bits
      for (uint32_t i = 0; i < n; i++) bw.WriteSigned(x[i], (int)bps);
      return;
    }

    FixedResidual(x, n, best_order, res.data());
    bw.WriteBits(8 + best_order, 6);  // FIXED order
    bw.WriteBits(0, 1);               // no wasted bits
    for (uint32_t i = 0; i < best_order; i++) bw.WriteSigned(x[i], (int)bps);
    WriteResidual(bw, res.data(), n - best_order, best_order, n);
  }

  // One frame is a pure function of (samples, index, stream params) —
  // no encoder state is touched, so frames encode concurrently (the
  // reference's libsndfile/libFLAC encode is strictly serial,
  // convolve-file-handler.cc:86-96 write path).
  void EncodeFrame(const int32_t* interleaved, uint32_t n, uint64_t frame_index,
                   std::vector<uint8_t>* frame_out) const {
    std::vector<uint8_t>& frame = *frame_out;
    BitWriter bw(&frame);
    // Size for the typical compressed frame up front; worst case still
    // grows via Ensure.
    bw.Reserve((size_t)n * channels_ * ((bps_ + 7) / 8) / 2 + 1024);
    // --- frame header
    bw.WriteBits(0x3FFE, 14);  // sync
    bw.WriteBits(0, 1);
    bw.WriteBits(0, 1);  // fixed blocksize stream
    uint32_t bs_code;
    int bs_extra = -1;
    switch (n) {
      case 192: bs_code = 1; break;
      case 576: bs_code = 2; break;
      case 1152: bs_code = 3; break;
      case 2304: bs_code = 4; break;
      case 4608: bs_code = 5; break;
      case 256: bs_code = 8; break;
      case 512: bs_code = 9; break;
      case 1024: bs_code = 10; break;
      case 2048: bs_code = 11; break;
      case 4096: bs_code = 12; break;
      case 8192: bs_code = 13; break;
      case 16384: bs_code = 14; break;
      case 32768: bs_code = 15; break;
      default:
        if (n <= 256) {
          bs_code = 6;
          bs_extra = (int)n - 1;
        } else {
          bs_code = 7;
          bs_extra = (int)n - 1;
        }
    }
    bw.WriteBits(bs_code, 4);
    uint32_t sr_code = 0;
    switch (rate_) {
      case 88200: sr_code = 1; break;
      case 176400: sr_code = 2; break;
      case 192000: sr_code = 3; break;
      case 8000: sr_code = 4; break;
      case 16000: sr_code = 5; break;
      case 22050: sr_code = 6; break;
      case 24000: sr_code = 7; break;
      case 32000: sr_code = 8; break;
      case 44100: sr_code = 9; break;
      case 48000: sr_code = 10; break;
      case 96000: sr_code = 11; break;
      default: sr_code = 0; break;  // get from STREAMINFO
    }
    bw.WriteBits(sr_code, 4);

    // Stereo decorrelation decision (2 channels only).  Thread-local:
    // one frame per worker at a time, buffers reused across frames.
    static thread_local std::vector<std::vector<int32_t>> chans;
    uint32_t ch_code;
    DecorrelateAndChoose(interleaved, n, &chans, &ch_code);
    bw.WriteBits(ch_code, 4);
    uint32_t ss_code;
    switch (bps_) {
      case 8: ss_code = 1; break;
      case 12: ss_code = 2; break;
      case 16: ss_code = 4; break;
      case 20: ss_code = 5; break;
      case 24: ss_code = 6; break;
      case 32: ss_code = 7; break;
      default: ss_code = 0; break;
    }
    bw.WriteBits(ss_code, 3);
    bw.WriteBits(0, 1);
    // Coded frame number (fixed-blocksize stream => frame index).
    WriteCodedNumber(bw, frame_index);
    if (bs_extra >= 0) bw.WriteBits((uint32_t)bs_extra, bs_code == 6 ? 8 : 16);
    bw.FlushBytes();  // bytes [0, byte_pos) are the header
    bw.WriteBits(Crc8(frame.data(), bw.byte_pos()), 8);

    // --- subframes
    for (uint32_t c = 0; c < chans.size(); c++) {
      uint32_t sub_bps = bps_;
      if ((ch_code == 8 && c == 1) || (ch_code == 9 && c == 0) ||
          (ch_code == 10 && c == 1))
        sub_bps += 1;
      EncodeSubframe(bw, chans[c].data(), n, sub_bps);
    }
    bw.AlignToByte();
    bw.FlushBytes();
    uint16_t crc16 = Crc16(frame.data(), bw.byte_pos());
    bw.WriteBits(crc16, 16);
    bw.Finish();
  }

  // Fold one finished frame into the stream counters (kept in frame
  // order so STREAMINFO matches the serial encoder bit-for-bit).
  void NoteFrame(const std::vector<uint8_t>& frame, uint32_t n) {
    if (frame.size() < min_framesize_) min_framesize_ = (uint32_t)frame.size();
    if (frame.size() > max_framesize_) max_framesize_ = (uint32_t)frame.size();
    // Byte offset of this frame relative to the first audio byte —
    // feeds the output SEEKTABLE regeneration (the reference merely
    // drops the source's table, convolve-file-handler.cc:459-464).
    frame_offsets_.push_back(audio_bytes_);
    audio_bytes_ += frame.size();
    frame_index_++;
    frames_written_ += n;
  }

 public:
  uint64_t frame_count() const { return frame_offsets_.size(); }
  uint64_t frame_offset(uint64_t i) const {
    return i < frame_offsets_.size() ? frame_offsets_[i] : 0;
  }

 private:

  void EncodeBlock(const int32_t* interleaved, uint32_t n, std::vector<uint8_t>* out) {
    std::vector<uint8_t> frame;
    EncodeFrame(interleaved, n, frame_index_, &frame);
    NoteFrame(frame, n);
    out->insert(out->end(), frame.begin(), frame.end());
  }

  static void WriteCodedNumber(BitWriter& bw, uint64_t v) {
    if (v < 0x80) {
      bw.WriteBits((uint32_t)v, 8);
      return;
    }
    int bits = 64 - __builtin_clzll(v);
    // The leading byte stores (6-extra) bits when extra<6, 0 bits when
    // extra==6; each continuation byte stores 6 bits.
    int extra;
    for (extra = 1; extra <= 6; extra++) {
      int capacity = (extra < 6 ? 6 - extra : 0) + 6 * extra;
      if (bits <= capacity) break;
    }
    static const uint32_t lead_prefix[7] = {0, 0xC0, 0xE0, 0xF0, 0xF8, 0xFC, 0xFE};
    uint32_t lead_bits = extra < 6 ? (uint32_t)(v >> (6 * extra)) : 0;
    bw.WriteBits(lead_prefix[extra] | lead_bits, 8);
    for (int i = extra - 1; i >= 0; i--)
      bw.WriteBits(0x80u | ((uint32_t)(v >> (6 * i)) & 0x3F), 8);
  }

  void DecorrelateAndChoose(const int32_t* x, uint32_t n,
                            std::vector<std::vector<int32_t>>* chans,
                            uint32_t* ch_code) const {
    uint32_t nch = channels_;
    // Reuse inner buffers across frames (assign() would reallocate all
    // of them from a prototype every call).
    if (chans->size() != nch) chans->resize(nch);
    for (auto& v : *chans) v.resize(n);
    if (nch != 2) {
      for (uint32_t c = 0; c < nch; c++) {
        int32_t* __restrict__ dst = (*chans)[c].data();
        const int32_t* __restrict__ src = x + c;
        for (uint32_t i = 0; i < n; i++) dst[i] = src[(size_t)i * nch];
      }
      *ch_code = nch - 1;
      return;
    }
    // Stereo: one deinterleave pass (both channels per iteration keeps
    // the loads contiguous and lets the compiler shuffle-split them).
    int32_t* __restrict__ L = (*chans)[0].data();
    int32_t* __restrict__ R = (*chans)[1].data();
#pragma omp simd
    for (uint32_t i = 0; i < n; i++) {
      L[i] = x[2 * i];
      R[i] = x[2 * i + 1];
    }
    // Estimate cost of each stereo mode with order-2 residual sums over
    // the planar arrays (unit-stride, so the abs-sum reductions
    // vectorize; the interleaved form stayed scalar on gathers).
    const uint32_t o = std::min(2u, n - 1);
    uint64_t cl = 0, cr = 0, cs = 0, cm = 0;
    if (o == 2) {
#pragma omp simd reduction(+ : cl, cr, cs, cm)
      for (uint32_t i = 2; i < n; i++) {
        int64_t l2 = L[i], l1 = L[i - 1], l0 = L[i - 2];
        int64_t r2 = R[i], r1 = R[i - 1], r0 = R[i - 2];
        int64_t el = l2 - 2 * l1 + l0;
        int64_t er = r2 - 2 * r1 + r0;
        int64_t es = el - er;  // second diff of (l - r)
        int64_t em = ((l2 + r2) >> 1) - 2 * ((l1 + r1) >> 1) + ((l0 + r0) >> 1);
        cl += (uint64_t)(el < 0 ? -el : el);
        cr += (uint64_t)(er < 0 ? -er : er);
        cs += (uint64_t)(es < 0 ? -es : es);
        cm += (uint64_t)(em < 0 ? -em : em);
      }
    } else {  // n == 2: order-1 first differences
      for (uint32_t i = 1; i < n; i++) {
        int64_t el = (int64_t)L[i] - L[i - 1];
        int64_t er = (int64_t)R[i] - R[i - 1];
        int64_t es = el - er;
        int64_t em = (((int64_t)L[i] + R[i]) >> 1) -
                     (((int64_t)L[i - 1] + R[i - 1]) >> 1);
        cl += (uint64_t)(el < 0 ? -el : el);
        cr += (uint64_t)(er < 0 ? -er : er);
        cs += (uint64_t)(es < 0 ? -es : es);
        cm += (uint64_t)(em < 0 ? -em : em);
      }
    }
    uint64_t indep = cl + cr, ls = cl + cs, rs = cr + cs, ms = cm + cs;
    uint64_t best = std::min(std::min(indep, ls), std::min(rs, ms));
    if (best == indep) {
      *ch_code = 1;
      return;
    }
    if (best == ls) {
      *ch_code = 8;
#pragma omp simd
      for (uint32_t i = 0; i < n; i++) R[i] = L[i] - R[i];  // left, side
    } else if (best == rs) {
      *ch_code = 9;
#pragma omp simd
      for (uint32_t i = 0; i < n; i++) L[i] = L[i] - R[i];  // side, right
    } else {
      *ch_code = 10;
#pragma omp simd
      for (uint32_t i = 0; i < n; i++) {
        int32_t l = L[i], r = R[i];
        L[i] = (l + r) >> 1;  // mid
        R[i] = l - r;         // side
      }
    }
  }

  uint32_t rate_, channels_, bps_, blocksize_;
  bool compute_md5_ = true;
  uint64_t total_hint_;
  uint64_t frames_written_ = 0;
  uint64_t frame_index_ = 0;
  uint32_t min_framesize_ = UINT32_MAX;
  uint32_t max_framesize_ = 0;
  std::vector<uint64_t> frame_offsets_;
  uint64_t audio_bytes_ = 0;
  std::vector<int32_t> carry_;
  std::vector<uint8_t> md5_buf_;
  MD5 md5_;
  size_t header_size_ = 0;
};

}  // namespace folve

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

struct FolveFlacInfo {
  uint32_t rate;
  uint32_t channels;
  uint32_t bits;
  uint64_t frames;
  uint32_t min_blocksize;
  uint32_t max_blocksize;
  uint8_t md5[16];
};

void* folve_flac_open(const uint8_t* data, uint64_t len) {
  auto* d = new folve::Decoder(data, (size_t)len);
  if (!d->Init()) {
    delete d;
    return nullptr;
  }
  return d;
}

void folve_flac_info(void* handle, FolveFlacInfo* out) {
  auto* d = (folve::Decoder*)handle;
  const auto& si = d->info();
  out->rate = si.sample_rate;
  out->channels = si.channels;
  out->bits = si.bits_per_sample;
  out->frames = si.total_samples;
  out->min_blocksize = si.min_blocksize;
  out->max_blocksize = si.max_blocksize;
  memcpy(out->md5, si.md5, 16);
}

int64_t folve_flac_read(void* handle, int32_t* out, int64_t nframes) {
  return ((folve::Decoder*)handle)->Read(out, nframes);
}

void folve_flac_rewind(void* handle) { ((folve::Decoder*)handle)->Rewind(); }

void folve_flac_close(void* handle) { delete (folve::Decoder*)handle; }

void* folve_flac_enc_new(uint32_t rate, uint32_t channels, uint32_t bits,
                         uint32_t blocksize, uint64_t total_hint) {
  return new folve::Encoder(rate, channels, bits, blocksize, total_hint);
}

static thread_local std::vector<uint8_t> g_enc_out;

// Each of the following returns the number of bytes produced; fetch them
// with folve_flac_enc_copy.
uint64_t folve_flac_enc_header(void* h) {
  g_enc_out = ((folve::Encoder*)h)->Header();
  return g_enc_out.size();
}

uint64_t folve_flac_enc_write(void* h, const int32_t* x, uint64_t nframes) {
  g_enc_out = ((folve::Encoder*)h)->Write(x, nframes);
  return g_enc_out.size();
}

uint64_t folve_flac_enc_finish(void* h) {
  g_enc_out = ((folve::Encoder*)h)->Finish();
  return g_enc_out.size();
}

uint64_t folve_flac_enc_streaminfo(void* h, int with_md5) {
  g_enc_out = ((folve::Encoder*)h)->StreamInfoBytes(with_md5 != 0);
  return g_enc_out.size();
}

void folve_flac_enc_copy(uint8_t* dst) {
  // Zero-length fetches hand over a null/empty buffer; memcpy with a
  // null argument is UB even for size 0 (flagged by UBSAN).
  if (dst && !g_enc_out.empty()) memcpy(dst, g_enc_out.data(), g_enc_out.size());
}

void folve_flac_enc_free(void* h) { delete (folve::Encoder*)h; }

// 0 disables the per-Write MD5 pass (serving redacts the header MD5
// field anyway); default on.
void folve_flac_enc_set_md5(void* h, int on) {
  ((folve::Encoder*)h)->SetComputeMd5(on != 0);
}

// Per-frame byte offsets (relative to the first audio byte), for
// output SEEKTABLE regeneration.
uint64_t folve_flac_enc_frame_count(void* h) {
  return ((folve::Encoder*)h)->frame_count();
}

uint64_t folve_flac_enc_frame_offset(void* h, uint64_t i) {
  return ((folve::Encoder*)h)->frame_offset(i);
}

// Parallel frame-encode worker count for the whole process (0 = auto:
// hardware_concurrency capped at 8, 1 = serial).
void folve_flac_enc_set_threads(int n) {
  folve::FramePool::Instance().SetThreads(n);
}

int folve_flac_enc_get_threads(void) {
  return folve::FramePool::Instance().EffectiveThreads();
}

// Test probe: distinct threads that encoded during the last pooled
// batch (0 if the last Write ran serially).
int folve_flac_enc_last_width(void) {
  return folve::FramePool::Instance().LastWidth();
}

}  // extern "C"
