// Ogg Vorbis decoder — from scratch, no third-party libraries.
//
// Replaces the previous ctypes binding to the system libvorbisfile (the
// reference consumes Vorbis through libsndfile's libvorbis backend,
// reference Makefile:14-19 / convolve-file-handler.cc:237-243).
// Implements the Vorbis I specification: Ogg page framing with CRC-32,
// header packets (identification / comment / setup), codebook Huffman +
// VQ decode, floor types 0 and 1, residue types 0/1/2, channel
// coupling (square polar), IMDCT via FFT, and the long/short block
// window overlap-add, with granule-position end trimming.
//
// Everything is bounds-checked; malformed input throws and surfaces as
// a NULL handle / negative return through the C ABI (fuzz-safe).

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <map>
#include <memory>
#include <stdexcept>
#include <string>
#include <vector>

#include "frame_pool.h"

namespace folve_vorbis {

struct ParseError : std::runtime_error {
  explicit ParseError(const std::string& what) : std::runtime_error(what) {}
};

static inline uint32_t ilog(uint32_t v) {
  // Per spec: position of the highest set bit, ilog(0) = 0, ilog(1) = 1.
  uint32_t r = 0;
  while (v) {
    r++;
    v >>= 1;
  }
  return r;
}

static float float32_unpack(uint32_t x) {
  uint32_t mantissa = x & 0x1fffff;
  uint32_t sign = x & 0x80000000u;
  uint32_t exponent = (x & 0x7fe00000u) >> 21;
  double v = (double)mantissa * std::pow(2.0, (double)exponent - 788.0);
  return (float)(sign ? -v : v);
}

// ---------------------------------------------------------------------------
// Ogg layer
// ---------------------------------------------------------------------------

static uint32_t OggCrc(const uint8_t* data, size_t len) {
  // CRC-32, polynomial 0x04c11db7, no reflection, init/xorout 0.
  // Magic-static init: concurrent opens from FUSE handler threads may
  // race the first call, so rely on the C++11 local-static guarantee.
  static const std::array<uint32_t, 256>& table = *[] {
    static std::array<uint32_t, 256> t;
    for (uint32_t i = 0; i < 256; i++) {
      uint32_t r = i << 24;
      for (int j = 0; j < 8; j++)
        r = (r << 1) ^ ((r & 0x80000000u) ? 0x04c11db7u : 0);
      t[i] = r;
    }
    return &t;
  }();
  uint32_t crc = 0;
  for (size_t i = 0; i < len; i++)
    crc = (crc << 8) ^ table[((crc >> 24) ^ data[i]) & 0xff];
  return crc;
}

struct Packet {
  std::vector<uint8_t> data;
  int64_t granule = -1;  // granule of the page this packet ENDS on
  bool last_on_page = false;
  bool eos = false;  // ends on an end-of-stream page
};

// Walks Ogg pages of the first logical stream and reassembles packets
// (lacing continuation across pages included).
class OggReader {
 public:
  OggReader(const uint8_t* data, size_t len) : data_(data), len_(len) {}

  void Rewind() {
    pos_ = 0;
    serial_set_ = false;
    partial_.clear();
    seg_queue_.clear();
  }

  // Total PCM frames per the last granule position of our stream.
  int64_t LastGranule() const {
    // Scan backwards for "OggS" pages of our serial (cheap: pages are
    // >= 28 bytes, files are a few MB).
    int64_t best = -1;
    for (size_t i = 0; i + 27 <= len_; i++) {
      if (std::memcmp(data_ + i, "OggS", 4) != 0) continue;
      if (i + 27 > len_) break;
      const uint8_t* p = data_ + i;
      uint8_t nseg = p[26];
      if (i + 27 + nseg > len_) continue;
      uint32_t serial = ReadLe32(p + 14);
      if (serial_set_ && serial != serial_) continue;
      int64_t granule = (int64_t)ReadLe64(p + 6);
      if (granule >= 0 && granule > best) best = granule;
    }
    return best;
  }

  // Next packet of the selected stream; false at end of data.
  bool NextPacket(Packet* out) {
    out->data.clear();
    out->granule = -1;
    out->eos = false;
    for (;;) {
      if (seg_queue_.empty() && !ReadPage()) {
        // Truncated final packet: surface what we have (decoders are
        // expected to be robust to truncation).
        if (!partial_.empty()) {
          out->data.swap(partial_);
          return true;
        }
        return false;
      }
      while (!seg_queue_.empty()) {
        Segment seg = seg_queue_.front();
        seg_queue_.erase(seg_queue_.begin());
        partial_.insert(partial_.end(), data_ + seg.off, data_ + seg.off + seg.len);
        if (seg.len < 255) {  // packet boundary
          out->data.swap(partial_);
          partial_.clear();
          out->granule = seg.last_of_page ? page_granule_ : -1;
          out->last_on_page = seg.last_of_page;
          out->eos = seg.last_of_page && page_eos_;
          return true;
        }
      }
    }
  }

 private:
  struct Segment {
    size_t off;
    uint32_t len;
    bool last_of_page;
  };

  static uint32_t ReadLe32(const uint8_t* p) {
    return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
           ((uint32_t)p[3] << 24);
  }
  static uint64_t ReadLe64(const uint8_t* p) {
    return (uint64_t)ReadLe32(p) | ((uint64_t)ReadLe32(p + 4) << 32);
  }

  bool ReadPage() {
    for (;;) {
      // Resync: find capture pattern.
      while (pos_ + 27 <= len_ && std::memcmp(data_ + pos_, "OggS", 4) != 0)
        pos_++;
      if (pos_ + 27 > len_) return false;
      const uint8_t* p = data_ + pos_;
      if (p[4] != 0) {  // stream_structure_version
        pos_++;
        continue;
      }
      uint8_t flags = p[5];
      int64_t granule = (int64_t)ReadLe64(p + 6);
      uint32_t serial = ReadLe32(p + 14);
      uint8_t nseg = p[26];
      size_t header_len = 27 + nseg;
      if (pos_ + header_len > len_) return false;
      size_t body_len = 0;
      for (uint32_t i = 0; i < nseg; i++) body_len += p[27 + i];
      if (pos_ + header_len + body_len > len_) return false;
      // CRC check with the CRC field zeroed.
      std::vector<uint8_t> page(p, p + header_len + body_len);
      page[22] = page[23] = page[24] = page[25] = 0;
      if (OggCrc(page.data(), page.size()) != ReadLe32(p + 22)) {
        pos_++;  // corrupt: resync after this capture pattern
        continue;
      }
      size_t body_off = pos_ + header_len;
      pos_ += header_len + body_len;
      if (!serial_set_) {
        serial_ = serial;
        serial_set_ = true;
      } else if (serial != serial_) {
        continue;  // interleaved stream we don't follow
      }
      if (!(flags & 0x01)) partial_.clear();  // not a continuation: drop stragglers
      page_granule_ = granule;
      page_eos_ = (flags & 0x04) != 0;
      size_t off = body_off;
      for (uint32_t i = 0; i < nseg; i++) {
        uint32_t l = p[27 + i];
        seg_queue_.push_back({off, l, i + 1 == nseg});
        off += l;
      }
      return true;
    }
  }

  const uint8_t* data_;
  size_t len_;
  size_t pos_ = 0;
  uint32_t serial_ = 0;
  mutable bool serial_set_ = false;
  std::vector<uint8_t> partial_;
  std::vector<Segment> seg_queue_;
  int64_t page_granule_ = -1;
  bool page_eos_ = false;
};

// ---------------------------------------------------------------------------
// Packet bit reader (Vorbis packs LSb-first)
// ---------------------------------------------------------------------------

class BitReader {
 public:
  BitReader(const uint8_t* data, size_t len) : data_(data), len_(len) {}

  // Reads n bits (n <= 32), little-endian bit order.  Reading past the
  // end of the packet sets eof (per spec, "end of packet" is a normal
  // decode condition the caller checks).
  uint32_t Read(uint32_t n) {
    uint32_t v = 0;
    for (uint32_t i = 0; i < n; i++) v |= (uint32_t)ReadBit() << i;
    return v;
  }

  uint64_t Read64(uint32_t n) {
    uint64_t v = 0;
    for (uint32_t i = 0; i < n; i++) v |= (uint64_t)ReadBit() << i;
    return v;
  }

  int ReadBit() {
    if (pos_ >= len_ * 8) {
      eof_ = true;
      return 0;
    }
    int b = (data_[pos_ >> 3] >> (pos_ & 7)) & 1;
    pos_++;
    return b;
  }

  // The next `n` stream bits packed FIRST-BIT-AS-MSB (i.e. as a
  // huffman walk would accumulate them), zero-padded past the end, no
  // consumption.  Used by the codebook prefix table.
  uint32_t PeekCode(uint32_t n) const {
    uint32_t v = 0;
    size_t p = pos_;
    size_t end = len_ * 8;
    for (uint32_t i = 0; i < n; i++, p++) {
      uint32_t b = p < end ? (data_[p >> 3] >> (p & 7)) & 1 : 0;
      v = (v << 1) | b;
    }
    return v;
  }

  void Skip(uint32_t n) {
    pos_ += n;
    if (pos_ > len_ * 8) {
      pos_ = len_ * 8;
      eof_ = true;
    }
  }

  size_t bits_left() const { return len_ * 8 - pos_; }

  bool eof() const { return eof_; }

 private:
  const uint8_t* data_;
  size_t len_;
  size_t pos_ = 0;
  bool eof_ = false;
};

// ---------------------------------------------------------------------------
// Codebooks
// ---------------------------------------------------------------------------

class Codebook {
 public:
  void Parse(BitReader* br) {
    if (br->Read(24) != 0x564342) throw ParseError("codebook sync");
    dims_ = br->Read(16);
    entries_ = br->Read(24);
    if (dims_ == 0 || entries_ > (1u << 24)) throw ParseError("codebook size");
    lengths_.assign(entries_, 0);
    bool ordered = br->Read(1);
    if (!ordered) {
      bool sparse = br->Read(1);
      for (uint32_t i = 0; i < entries_; i++) {
        if (sparse) {
          if (br->Read(1))
            lengths_[i] = br->Read(5) + 1;
          else
            lengths_[i] = 0;  // unused entry
        } else {
          lengths_[i] = br->Read(5) + 1;
        }
      }
    } else {
      uint32_t cur_len = br->Read(5) + 1;
      uint32_t cur = 0;
      while (cur < entries_) {
        uint32_t num = br->Read(ilog(entries_ - cur));
        if (cur + num > entries_) throw ParseError("ordered codebook overflow");
        for (uint32_t i = 0; i < num; i++) lengths_[cur + i] = cur_len;
        cur += num;
        cur_len++;
        if (cur_len > 32) throw ParseError("codeword too long");
      }
    }
    if (br->eof()) throw ParseError("codebook truncated");
    AssignCodewords();
    BuildTree();
    BuildFastTable();

    // VQ lookup table.
    lookup_type_ = br->Read(4);
    if (lookup_type_ == 0) {
      // scalar-only book
    } else if (lookup_type_ == 1 || lookup_type_ == 2) {
      float min = float32_unpack(br->Read(32));
      float delta = float32_unpack(br->Read(32));
      uint32_t value_bits = br->Read(4) + 1;
      bool sequence_p = br->Read(1);
      // entries (24-bit) * dims (16-bit) can reach 2^40: size it in
      // 64-bit and bound the table before allocating anything, so a
      // crafted setup header can neither wrap the count nor force a
      // multi-GB allocation.
      uint64_t flat = (uint64_t)entries_ * dims_;
      if (flat > (1u << 26)) throw ParseError("codebook lookup too large");
      uint32_t lookup_values;
      if (lookup_type_ == 1) {
        // Largest integer with pow(lookup_values, dims) <= entries.
        lookup_values = 0;
        while (std::pow((double)(lookup_values + 1), (double)dims_) <=
               (double)entries_)
          lookup_values++;
      } else {
        lookup_values = (uint32_t)flat;
      }
      std::vector<uint32_t> mult(lookup_values);
      for (uint32_t i = 0; i < lookup_values; i++) mult[i] = br->Read(value_bits);
      if (br->eof()) throw ParseError("codebook lookup truncated");
      // Expand to a flat [entries x dims] table now (decode-time math
      // per spec, hoisted).
      vectors_.assign((size_t)entries_ * dims_, 0.0f);
      for (uint32_t e = 0; e < entries_; e++) {
        float last = 0.0f;
        if (lookup_type_ == 1) {
          uint32_t idx_div = 1;
          for (uint32_t d = 0; d < dims_; d++) {
            uint32_t off = (e / idx_div) % lookup_values;
            float v = (float)mult[off] * delta + min + last;
            vectors_[(size_t)e * dims_ + d] = v;
            if (sequence_p) last = v;
            idx_div *= lookup_values;
          }
        } else {
          for (uint32_t d = 0; d < dims_; d++) {
            float v = (float)mult[(size_t)e * dims_ + d] * delta + min + last;
            vectors_[(size_t)e * dims_ + d] = v;
            if (sequence_p) last = v;
          }
        }
      }
    } else {
      throw ParseError("bad lookup type");
    }
  }

  uint32_t dims() const { return dims_; }
  bool has_vectors() const { return !vectors_.empty(); }

  // Scalar context: one codeword -> entry number.  -1 on end-of-packet.
  int32_t DecodeScalar(BitReader* br) const {
    // Fast path: one table lookup resolves any codeword of <= kFastBits
    // bits (the overwhelming majority — residue classbooks and VQ books
    // are built short by encoders).
    if (br->bits_left() >= kFastBits) {
      uint32_t idx = br->PeekCode(kFastBits);
      int32_t e = fast_entry_[idx];
      if (e >= 0) {
        br->Skip(fast_len_[idx]);
        return e;
      }
    }
    int32_t node = 0;
    // Slow path: tree walk, first bit read is the root branch.
    for (int depth = 0; depth < 33; depth++) {
      if (tree_[node].entry >= 0) return tree_[node].entry;
      int bit = br->ReadBit();
      if (br->eof()) return -1;
      node = bit ? tree_[node].one : tree_[node].zero;
      if (node < 0) return -1;  // dead branch (underspecified tree)
    }
    return -1;
  }

  // VQ context: codeword -> row of dims floats.  NULL on end-of-packet.
  const float* DecodeVq(BitReader* br) const {
    int32_t e = DecodeScalar(br);
    if (e < 0 || vectors_.empty()) return nullptr;
    return &vectors_[(size_t)e * dims_];
  }

 private:
  struct Node {
    int32_t zero = -1, one = -1;
    int32_t entry = -1;
  };

  void AssignCodewords() {
    // Spec 3.2.1: in entry order, each used entry takes the lowest
    // available codeword of its length (first-fit in a binary tree).
    // Free subtrees tracked as (code, len), MSB-aligned.
    codewords_.assign(entries_, 0);
    struct Slot {
      uint32_t code;  // left-justified in 32 bits
      uint32_t len;
    };
    std::vector<Slot> free_slots{{0, 0}};  // whole tree
    auto lower = [](const Slot& a, const Slot& b) { return a.code < b.code; };
    for (uint32_t i = 0; i < entries_; i++) {
      uint32_t len = lengths_[i];
      if (!len) continue;
      // Smallest free slot shallow enough to contain a len-deep leaf.
      size_t pick = SIZE_MAX;
      for (size_t s = 0; s < free_slots.size(); s++) {
        if (free_slots[s].len <= len &&
            (pick == SIZE_MAX || free_slots[s].code < free_slots[pick].code))
          pick = s;
      }
      if (pick == SIZE_MAX) throw ParseError("over-subscribed huffman tree");
      Slot slot = free_slots[pick];
      free_slots.erase(free_slots.begin() + pick);
      // Take the leftmost leaf at depth len; the right siblings at each
      // level along the way become free subtrees.
      for (uint32_t d = slot.len; d < len; d++) {
        Slot sib{slot.code | (0x80000000u >> d), d + 1};
        free_slots.push_back(sib);
      }
      std::sort(free_slots.begin(), free_slots.end(), lower);
      codewords_[i] = len == 32 ? slot.code : (slot.code >> (32 - len));
    }
    // Single-entry books keep their declared length (codeword 0 of len
    // bits; decode consumes exactly len zero bits).  Under-specified
    // trees leave dead branches that DecodeScalar reports as -1.
  }

  void BuildTree() {
    tree_.clear();
    tree_.push_back(Node{});
    for (uint32_t i = 0; i < entries_; i++) {
      uint32_t len = lengths_[i];
      if (!len) continue;
      int32_t node = 0;
      for (int32_t d = (int32_t)len - 1; d >= 0; d--) {
        int bit = (codewords_[i] >> d) & 1;
        int32_t next = bit ? tree_[node].one : tree_[node].zero;
        if (next < 0) {
          next = (int32_t)tree_.size();
          tree_.push_back(Node{});  // may reallocate: re-index, no refs
          (bit ? tree_[node].one : tree_[node].zero) = next;
        }
        node = next;
        if (tree_[node].entry >= 0) throw ParseError("huffman prefix clash");
      }
      tree_[node].entry = (int32_t)i;
    }
  }

  static constexpr uint32_t kFastBits = 10;

  void BuildFastTable() {
    fast_entry_.assign(1u << kFastBits, -1);
    fast_len_.assign(1u << kFastBits, 0);
    for (uint32_t i = 0; i < entries_; i++) {
      uint32_t len = lengths_[i];
      if (!len || len > kFastBits) continue;
      uint32_t base = codewords_[i] << (kFastBits - len);
      uint32_t count = 1u << (kFastBits - len);
      for (uint32_t s = 0; s < count; s++) {
        fast_entry_[base + s] = (int32_t)i;
        fast_len_[base + s] = (uint8_t)len;
      }
    }
  }

  uint32_t dims_ = 0;
  uint32_t entries_ = 0;
  uint32_t lookup_type_ = 0;
  std::vector<uint8_t> lengths_;
  std::vector<uint32_t> codewords_;
  std::vector<Node> tree_;
  std::vector<int32_t> fast_entry_;
  std::vector<uint8_t> fast_len_;
  std::vector<float> vectors_;  // [entries x dims]
};

// ---------------------------------------------------------------------------
// Floors
// ---------------------------------------------------------------------------

struct Floor0 {
  uint32_t order, rate, bark_map_size, amplitude_bits, amplitude_offset;
  std::vector<uint32_t> books;

  void Parse(BitReader* br, uint32_t num_books) {
    order = br->Read(8);
    rate = br->Read(16);
    bark_map_size = br->Read(16);
    amplitude_bits = br->Read(6);
    amplitude_offset = br->Read(8);
    uint32_t n = br->Read(4) + 1;
    for (uint32_t i = 0; i < n; i++) {
      uint32_t b = br->Read(8);
      if (b >= num_books) throw ParseError("floor0 book out of range");
      books.push_back(b);
    }
    if (order == 0 || rate == 0 || bark_map_size == 0)
      throw ParseError("floor0 params");
  }
};

struct Floor1 {
  uint32_t multiplier;
  std::vector<uint32_t> partition_class;          // [partitions]
  std::vector<uint32_t> class_dims, class_subs;   // [classes]
  std::vector<int32_t> class_masterbooks;         // [classes]
  std::vector<std::vector<int32_t>> subclass_books;  // [classes][1<<subs]
  std::vector<uint32_t> x_list;                   // posts, incl. 0 and end
  std::vector<uint32_t> sort_order;               // x_list sorted index
  std::vector<uint32_t> low_nbr, high_nbr;        // spec low/high neighbors

  void Parse(BitReader* br, uint32_t num_books) {
    uint32_t partitions = br->Read(5);
    partition_class.resize(partitions);
    uint32_t max_class = 0;
    for (uint32_t i = 0; i < partitions; i++) {
      partition_class[i] = br->Read(4);
      max_class = std::max(max_class, partition_class[i]);
    }
    uint32_t nclasses = partitions ? max_class + 1 : 0;
    class_dims.resize(nclasses);
    class_subs.resize(nclasses);
    class_masterbooks.assign(nclasses, -1);
    subclass_books.resize(nclasses);
    for (uint32_t c = 0; c < nclasses; c++) {
      class_dims[c] = br->Read(3) + 1;
      class_subs[c] = br->Read(2);
      if (class_subs[c]) {
        uint32_t mb = br->Read(8);
        if (mb >= num_books) throw ParseError("floor1 masterbook");
        class_masterbooks[c] = (int32_t)mb;
      }
      uint32_t n = 1u << class_subs[c];
      subclass_books[c].resize(n);
      for (uint32_t s = 0; s < n; s++) {
        int32_t b = (int32_t)br->Read(8) - 1;
        if (b >= (int32_t)num_books) throw ParseError("floor1 subbook");
        subclass_books[c][s] = b;
      }
    }
    multiplier = br->Read(2) + 1;
    uint32_t rangebits = br->Read(4);
    x_list = {0, 1u << rangebits};
    for (uint32_t i = 0; i < partitions; i++) {
      uint32_t c = partition_class[i];
      for (uint32_t j = 0; j < class_dims[c]; j++) {
        x_list.push_back(br->Read(rangebits));
        if (x_list.size() > 65) throw ParseError("floor1 too many posts");
      }
    }
    if (br->eof()) throw ParseError("floor1 truncated");
    // All x values must be unique per spec.
    std::vector<uint32_t> sorted(x_list.size());
    for (uint32_t i = 0; i < x_list.size(); i++) sorted[i] = i;
    std::sort(sorted.begin(), sorted.end(),
              [&](uint32_t a, uint32_t b) { return x_list[a] < x_list[b]; });
    for (size_t i = 1; i < sorted.size(); i++)
      if (x_list[sorted[i]] == x_list[sorted[i - 1]])
        throw ParseError("floor1 duplicate posts");
    sort_order = sorted;
    // Spec low/high neighbors: nearest below/above among x_list[0..i).
    low_nbr.resize(x_list.size());
    high_nbr.resize(x_list.size());
    for (uint32_t i = 2; i < x_list.size(); i++) {
      uint32_t lo = 0, hi = 1;
      for (uint32_t j = 0; j < i; j++) {
        if (x_list[j] < x_list[i] && x_list[j] >= x_list[lo]) lo = j;
        if (x_list[j] > x_list[i] && x_list[j] <= x_list[hi]) hi = j;
      }
      low_nbr[i] = lo;
      high_nbr[i] = hi;
    }
  }
};

struct FloorConfig {
  uint32_t type = 1;
  Floor0 f0;
  Floor1 f1;
};

// ---------------------------------------------------------------------------
// Residue / mapping / mode
// ---------------------------------------------------------------------------

struct Residue {
  uint32_t type;
  uint32_t begin, end, partition_size, classifications, classbook;
  std::vector<std::vector<int32_t>> books;  // [class][pass], -1 if absent

  void Parse(BitReader* br, uint32_t t, uint32_t num_books) {
    type = t;
    begin = br->Read(24);
    end = br->Read(24);
    partition_size = br->Read(24) + 1;
    classifications = br->Read(6) + 1;
    classbook = br->Read(8);
    if (classbook >= num_books) throw ParseError("residue classbook");
    std::vector<uint32_t> cascade(classifications);
    for (uint32_t i = 0; i < classifications; i++) {
      uint32_t high = 0, low = br->Read(3);
      if (br->Read(1)) high = br->Read(5);
      cascade[i] = (high << 3) | low;
    }
    books.assign(classifications, std::vector<int32_t>(8, -1));
    for (uint32_t i = 0; i < classifications; i++)
      for (uint32_t p = 0; p < 8; p++)
        if (cascade[i] & (1u << p)) {
          uint32_t b = br->Read(8);
          if (b >= num_books) throw ParseError("residue book");
          books[i][p] = (int32_t)b;
        }
    if (br->eof()) throw ParseError("residue truncated");
  }
};

struct Mapping {
  std::vector<uint32_t> mux;                   // [channels] -> submap
  std::vector<uint32_t> submap_floor, submap_residue;
  std::vector<uint32_t> coupling_mag, coupling_ang;
};

struct Mode {
  bool blockflag;
  uint32_t mapping;
};

// ---------------------------------------------------------------------------
// IMDCT via DCT-IV via complex FFT
// ---------------------------------------------------------------------------

class Imdct {
 public:
  // y[n] = sum_{k<N/2} X[k] cos(2pi/N (n + 1/2 + N/4)(k + 1/2)), n<N.
  // Routed through a DCT-IV (length M=N/2) computed with a 2M-point
  // complex FFT; the three IMDCT output regions are DCT-IV symmetry
  // extensions (derivation in the repo's ARCHITECTURE notes).
  void Run(const float* X, float* y, uint32_t N) {
    uint32_t M = N / 2;
    EnsureSize(2 * M);
    const PrePost& pp = PrePostFor(M);
    // g[k] = X[k] * e^{-i pi k / (2M)}, zero-padded to 2M.
    for (uint32_t k = 0; k < M; k++) {
      re_[k] = X[k] * pp.pre_re[k];
      im_[k] = X[k] * pp.pre_im[k];
    }
    std::fill(re_.begin() + M, re_.begin() + 2 * M, 0.0f);
    std::fill(im_.begin() + M, im_.begin() + 2 * M, 0.0f);
    Fft(2 * M);
    // c[m] = Re{ e^{-i pi (m+1/2)/(2M)} * G[m] }, m < M.
    c_.resize(M);
    for (uint32_t m = 0; m < M; m++)
      c_[m] = re_[m] * pp.post_re[m] - im_[m] * pp.post_im[m];
    uint32_t M2 = M / 2;
    for (uint32_t n = 0; n < M2; n++) y[n] = c_[n + M2];
    for (uint32_t n = M2; n < M + M2; n++) y[n] = -c_[M + M2 - 1 - n];
    for (uint32_t n = M + M2; n < 2 * M; n++) y[n] = -c_[n - (M + M2)];
  }

 private:
  struct PrePost {
    std::vector<float> pre_re, pre_im, post_re, post_im;
  };

  const PrePost& PrePostFor(uint32_t M) {
    PrePost& pp = prepost_[M];
    if (pp.pre_re.empty()) {
      pp.pre_re.resize(M);
      pp.pre_im.resize(M);
      pp.post_re.resize(M);
      pp.post_im.resize(M);
      for (uint32_t k = 0; k < M; k++) {
        double a = -M_PI * k / (2.0 * M);
        pp.pre_re[k] = (float)std::cos(a);
        pp.pre_im[k] = (float)std::sin(a);
        double b = -M_PI * (k + 0.5) / (2.0 * M);
        pp.post_re[k] = (float)std::cos(b);
        pp.post_im[k] = (float)std::sin(b);
      }
    }
    return pp;
  }

  void EnsureSize(uint32_t n) {
    if (re_.size() < n) {
      re_.resize(n);
      im_.resize(n);
    }
    // Per-size twiddles: long/short block alternation would otherwise
    // rebuild the table (n/2 trig pairs) every single block.
    auto& tw = twiddles_[n];
    if (tw.first.empty()) {
      tw.first.resize(n / 2);
      tw.second.resize(n / 2);
      for (uint32_t i = 0; i < n / 2; i++) {
        double ang = -2.0 * M_PI * i / n;
        tw.first[i] = (float)std::cos(ang);
        tw.second[i] = (float)std::sin(ang);
      }
    }
    tw_re_ = tw.first.data();
    tw_im_ = tw.second.data();
  }

  void Fft(uint32_t n) {
    // Iterative radix-2 DIT, n a power of two.
    for (uint32_t i = 1, j = 0; i < n; i++) {  // bit reversal
      uint32_t bit = n >> 1;
      for (; j & bit; bit >>= 1) j ^= bit;
      j ^= bit;
      if (i < j) {
        std::swap(re_[i], re_[j]);
        std::swap(im_[i], im_[j]);
      }
    }
    for (uint32_t len = 2; len <= n; len <<= 1) {
      uint32_t step = n / len;
      for (uint32_t i = 0; i < n; i += len) {
        for (uint32_t k = 0; k < len / 2; k++) {
          float wr = tw_re_[k * step], wi = tw_im_[k * step];
          uint32_t a = i + k, b = i + k + len / 2;
          float xr = re_[b] * wr - im_[b] * wi;
          float xi = re_[b] * wi + im_[b] * wr;
          re_[b] = re_[a] - xr;
          im_[b] = im_[a] - xi;
          re_[a] += xr;
          im_[a] += xi;
        }
      }
    }
  }

  std::vector<float> re_, im_, c_;
  std::map<uint32_t, std::pair<std::vector<float>, std::vector<float>>>
      twiddles_;
  std::map<uint32_t, PrePost> prepost_;
  const float* tw_re_ = nullptr;
  const float* tw_im_ = nullptr;
};

// ---------------------------------------------------------------------------
// Decoder
// ---------------------------------------------------------------------------

class Decoder {
 public:
  Decoder(const uint8_t* data, size_t len)
      : bytes_(data, data + len), ogg_(bytes_.data(), bytes_.size()) {
    ParseHeaders();
    total_frames_ = std::max<int64_t>(0, ogg_.LastGranule());
  }

  uint32_t rate() const { return rate_; }
  uint32_t channels() const { return channels_; }
  int64_t total_frames() const { return total_frames_; }
  const std::vector<std::string>& comments() const { return comments_; }

  void Rewind() {
    ogg_.Rewind();
    // Skip the three header packets again.
    Packet pkt;
    for (int i = 0; i < 3; i++)
      if (!ogg_.NextPacket(&pkt)) throw ParseError("rewind: headers gone");
    out_.assign(channels_, {});
    out_base_ = 0;
    cur_start_ = 0;
    cur_start_pending_ = false;
    next_center_ = 0;
    pcm_origin_ = 0;
    ready_ = 0;
    consumed_ = 0;
    prev_block_ = -1;
    eos_seen_ = false;
  }

  // Decode up to nframes interleaved float frames into out.
  int64_t Read(float* out, int64_t nframes) {
    int64_t done = 0;
    while (done < nframes) {
      int64_t avail = (int64_t)ready_ - consumed_;
      if (avail > 0) {
        int64_t take = std::min(avail, nframes - done);
        // PCM frame j lives at absolute position pcm_origin_ + j.
        int64_t base = pcm_origin_ + consumed_ - out_base_;
        for (int64_t i = 0; i < take; i++)
          for (uint32_t c = 0; c < channels_; c++)
            out[(done + i) * channels_ + c] = out_[c][(size_t)(base + i)];
        consumed_ += take;
        done += take;
        continue;
      }
      if (!DecodeBatch(nframes - done)) break;
    }
    CompactOutput();
    return done;
  }

 private:
  // ---- header parsing ----------------------------------------------------

  void ParseHeaders() {
    Packet pkt;
    // Identification.
    if (!ogg_.NextPacket(&pkt)) throw ParseError("no ident packet");
    CheckHeader(pkt, 1);
    {
      BitReader br(pkt.data.data() + 7, pkt.data.size() - 7);
      if (br.Read(32) != 0) throw ParseError("vorbis version");
      channels_ = br.Read(8);
      rate_ = br.Read(32);
      br.Read(32);  // bitrate max
      br.Read(32);  // bitrate nominal
      br.Read(32);  // bitrate min
      blocksize_[0] = 1u << br.Read(4);
      blocksize_[1] = 1u << br.Read(4);
      if (channels_ == 0 || channels_ > 16 || rate_ == 0)
        throw ParseError("ident params");
      if (blocksize_[0] < 64 || blocksize_[1] > 8192 ||
          blocksize_[0] > blocksize_[1] || !br.Read(1))
        throw ParseError("blocksizes/framing");
    }
    // Comments.
    if (!ogg_.NextPacket(&pkt)) throw ParseError("no comment packet");
    CheckHeader(pkt, 3);
    ParseComments(pkt);
    // Setup.
    if (!ogg_.NextPacket(&pkt)) throw ParseError("no setup packet");
    CheckHeader(pkt, 5);
    ParseSetup(pkt);
    out_.assign(channels_, {});
  }

  static void CheckHeader(const Packet& pkt, uint8_t type) {
    if (pkt.data.size() < 7 || pkt.data[0] != type ||
        std::memcmp(pkt.data.data() + 1, "vorbis", 6) != 0)
      throw ParseError("bad header packet");
  }

  void ParseComments(const Packet& pkt) {
    const uint8_t* p = pkt.data.data() + 7;
    size_t len = pkt.data.size() - 7;
    size_t pos = 0;
    auto rd32 = [&]() -> uint32_t {
      if (pos + 4 > len) throw ParseError("comment truncated");
      uint32_t v = (uint32_t)p[pos] | ((uint32_t)p[pos + 1] << 8) |
                   ((uint32_t)p[pos + 2] << 16) | ((uint32_t)p[pos + 3] << 24);
      pos += 4;
      return v;
    };
    uint32_t vendor_len = rd32();
    if (pos + vendor_len > len) throw ParseError("vendor truncated");
    vendor_.assign((const char*)p + pos, vendor_len);
    pos += vendor_len;
    uint32_t count = rd32();
    for (uint32_t i = 0; i < count; i++) {
      uint32_t l = rd32();
      if (pos + l > len) throw ParseError("comment item truncated");
      comments_.emplace_back((const char*)p + pos, l);
      pos += l;
    }
  }

  void ParseSetup(const Packet& pkt) {
    BitReader br(pkt.data.data() + 7, pkt.data.size() - 7);
    uint32_t nbooks = br.Read(8) + 1;
    books_.resize(nbooks);
    for (auto& b : books_) b.Parse(&br);
    // Time domain transforms (placeholders, must be 0).
    uint32_t ntimes = br.Read(6) + 1;
    for (uint32_t i = 0; i < ntimes; i++)
      if (br.Read(16) != 0) throw ParseError("time transform");
    // Floors.
    uint32_t nfloors = br.Read(6) + 1;
    floors_.resize(nfloors);
    for (auto& f : floors_) {
      f.type = br.Read(16);
      if (f.type == 0)
        f.f0.Parse(&br, nbooks);
      else if (f.type == 1)
        f.f1.Parse(&br, nbooks);
      else
        throw ParseError("floor type");
    }
    // Residues.
    uint32_t nres = br.Read(6) + 1;
    residues_.resize(nres);
    for (auto& r : residues_) {
      uint32_t t = br.Read(16);
      if (t > 2) throw ParseError("residue type");
      r.Parse(&br, t, nbooks);
    }
    // Mappings.
    uint32_t nmaps = br.Read(6) + 1;
    mappings_.resize(nmaps);
    for (auto& m : mappings_) {
      if (br.Read(16) != 0) throw ParseError("mapping type");
      uint32_t submaps = br.Read(1) ? br.Read(4) + 1 : 1;
      if (br.Read(1)) {  // square polar coupling
        uint32_t steps = br.Read(8) + 1;
        for (uint32_t s = 0; s < steps; s++) {
          uint32_t bits = ilog(channels_ - 1);
          uint32_t mag = br.Read(bits);
          uint32_t ang = br.Read(bits);
          if (mag == ang || mag >= channels_ || ang >= channels_)
            throw ParseError("coupling channels");
          m.coupling_mag.push_back(mag);
          m.coupling_ang.push_back(ang);
        }
      }
      if (br.Read(2) != 0) throw ParseError("mapping reserved");
      m.mux.assign(channels_, 0);
      if (submaps > 1)
        for (uint32_t c = 0; c < channels_; c++) {
          m.mux[c] = br.Read(4);
          if (m.mux[c] >= submaps) throw ParseError("mux range");
        }
      m.submap_floor.resize(submaps);
      m.submap_residue.resize(submaps);
      for (uint32_t s = 0; s < submaps; s++) {
        br.Read(8);  // unused time config
        m.submap_floor[s] = br.Read(8);
        m.submap_residue[s] = br.Read(8);
        if (m.submap_floor[s] >= floors_.size() ||
            m.submap_residue[s] >= residues_.size())
          throw ParseError("submap range");
      }
    }
    // Modes.
    uint32_t nmodes = br.Read(6) + 1;
    modes_.resize(nmodes);
    for (auto& mo : modes_) {
      mo.blockflag = br.Read(1);
      if (br.Read(16) != 0 || br.Read(16) != 0)
        throw ParseError("mode transform");
      mo.mapping = br.Read(8);
      if (mo.mapping >= mappings_.size()) throw ParseError("mode mapping");
    }
    if (!br.Read(1) || br.eof()) throw ParseError("setup framing");
  }

  // ---- floor curves --------------------------------------------------------

  static const float* InverseDbTable() {
    // floor1_inverse_dB_table — literal data from the Vorbis I
    // specification (~0.547 dB per step, 1.0649863e-07 .. 1.0).
    static const float table[256] = {
      1.0649863e-07f, 1.1341951e-07f, 1.2079015e-07f, 1.2863978e-07f,
      1.3699950e-07f, 1.4590250e-07f, 1.5538409e-07f, 1.6548181e-07f,
      1.7623574e-07f, 1.8768856e-07f, 1.9988560e-07f, 2.1287531e-07f,
      2.2670913e-07f, 2.4144197e-07f, 2.5713223e-07f, 2.7384212e-07f,
      2.9163792e-07f, 3.1059022e-07f, 3.3077410e-07f, 3.5226967e-07f,
      3.7516213e-07f, 3.9954230e-07f, 4.2550681e-07f, 4.5315863e-07f,
      4.8260745e-07f, 5.1397001e-07f, 5.4737063e-07f, 5.8294188e-07f,
      6.2082472e-07f, 6.6116939e-07f, 7.0413591e-07f, 7.4989464e-07f,
      7.9862701e-07f, 8.5052631e-07f, 9.0579829e-07f, 9.6466215e-07f,
      1.0273513e-06f, 1.0941144e-06f, 1.1652161e-06f, 1.2409384e-06f,
      1.3215816e-06f, 1.4074654e-06f, 1.4989305e-06f, 1.5963394e-06f,
      1.7000785e-06f, 1.8105592e-06f, 1.9282195e-06f, 2.0535260e-06f,
      2.1869757e-06f, 2.3290977e-06f, 2.4804558e-06f, 2.6416496e-06f,
      2.8133190e-06f, 2.9961443e-06f, 3.1908505e-06f, 3.3982101e-06f,
      3.6190449e-06f, 3.8542307e-06f, 4.1047006e-06f, 4.3714472e-06f,
      4.6555283e-06f, 4.9580708e-06f, 5.2802739e-06f, 5.6234162e-06f,
      5.9888571e-06f, 6.3780467e-06f, 6.7925284e-06f, 7.2339453e-06f,
      7.7040477e-06f, 8.2047000e-06f, 8.7378876e-06f, 9.3057251e-06f,
      9.9104636e-06f, 1.0554501e-05f, 1.1240392e-05f, 1.1970856e-05f,
      1.2748789e-05f, 1.3577278e-05f, 1.4459606e-05f, 1.5399271e-05f,
      1.6400005e-05f, 1.7465769e-05f, 1.8600793e-05f, 1.9809577e-05f,
      2.1096914e-05f, 2.2467912e-05f, 2.3928002e-05f, 2.5482977e-05f,
      2.7139005e-05f, 2.8902650e-05f, 3.0780910e-05f, 3.2781227e-05f,
      3.4911533e-05f, 3.7180282e-05f, 3.9596467e-05f, 4.2169668e-05f,
      4.4910092e-05f, 4.7828602e-05f, 5.0936775e-05f, 5.4246932e-05f,
      5.7772202e-05f, 6.1526567e-05f, 6.5524910e-05f, 6.9783084e-05f,
      7.4317984e-05f, 7.9147583e-05f, 8.4291038e-05f, 8.9768750e-05f,
      9.5602423e-05f, 1.0181521e-04f, 1.0843174e-04f, 1.1547824e-04f,
      1.2298267e-04f, 1.3097477e-04f, 1.3948625e-04f, 1.4855085e-04f,
      1.5820454e-04f, 1.6848555e-04f, 1.7943469e-04f, 1.9109536e-04f,
      2.0351382e-04f, 2.1673930e-04f, 2.3082423e-04f, 2.4582449e-04f,
      2.6179955e-04f, 2.7881275e-04f, 2.9693157e-04f, 3.1622787e-04f,
      3.3677815e-04f, 3.5866388e-04f, 3.8197188e-04f, 4.0679457e-04f,
      4.3323037e-04f, 4.6138410e-04f, 4.9136748e-04f, 5.2329927e-04f,
      5.5730622e-04f, 5.9352309e-04f, 6.3209358e-04f, 6.7317061e-04f,
      7.1691698e-04f, 7.6350628e-04f, 8.1312325e-04f, 8.6596457e-04f,
      9.2223985e-04f, 9.8217221e-04f, 1.0459992e-03f, 1.1139743e-03f,
      1.1863665e-03f, 1.2634633e-03f, 1.3455702e-03f, 1.4330129e-03f,
      1.5261382e-03f, 1.6253153e-03f, 1.7309374e-03f, 1.8434235e-03f,
      1.9632196e-03f, 2.0908006e-03f, 2.2266726e-03f, 2.3713743e-03f,
      2.5254795e-03f, 2.6895993e-03f, 2.8643848e-03f, 3.0505287e-03f,
      3.2487691e-03f, 3.4598925e-03f, 3.6847359e-03f, 3.9241905e-03f,
      4.1792067e-03f, 4.4507948e-03f, 4.7400328e-03f, 5.0480668e-03f,
      5.3761187e-03f, 5.7254890e-03f, 6.0975635e-03f, 6.4938175e-03f,
      6.9158226e-03f, 7.3652514e-03f, 7.8438874e-03f, 8.3536273e-03f,
      8.8964924e-03f, 9.4746370e-03f, 1.0090352e-02f, 1.0746080e-02f,
      1.1444421e-02f, 1.2188144e-02f, 1.2980198e-02f, 1.3823725e-02f,
      1.4722068e-02f, 1.5678791e-02f, 1.6697686e-02f, 1.7782796e-02f,
      1.8938422e-02f, 2.0169148e-02f, 2.1479854e-02f, 2.2875736e-02f,
      2.4362329e-02f, 2.5945531e-02f, 2.7631618e-02f, 2.9427277e-02f,
      3.1339627e-02f, 3.3376250e-02f, 3.5545226e-02f, 3.7855156e-02f,
      4.0315200e-02f, 4.2935107e-02f, 4.5725275e-02f, 4.8696756e-02f,
      5.1861349e-02f, 5.5231590e-02f, 5.8820851e-02f, 6.2643364e-02f,
      6.6714279e-02f, 7.1049750e-02f, 7.5666964e-02f, 8.0584228e-02f,
      8.5821047e-02f, 9.1398180e-02f, 9.7337745e-02f, 1.0366330e-01f,
      1.1039993e-01f, 1.1757434e-01f, 1.2521498e-01f, 1.3335215e-01f,
      1.4201812e-01f, 1.5124726e-01f, 1.6107617e-01f, 1.7154381e-01f,
      1.8269168e-01f, 1.9456401e-01f, 2.0720787e-01f, 2.2067343e-01f,
      2.3501402e-01f, 2.5028655e-01f, 2.6655158e-01f, 2.8387362e-01f,
      3.0232131e-01f, 3.2196787e-01f, 3.4289113e-01f, 3.6517414e-01f,
      3.8890520e-01f, 4.1417846e-01f, 4.4109413e-01f, 4.6975890e-01f,
      5.0028646e-01f, 5.3279793e-01f, 5.6742209e-01f, 6.0429639e-01f,
      6.4356697e-01f, 6.8538958e-01f, 7.2993004e-01f, 7.7736503e-01f,
      8.2788259e-01f, 8.8168305e-01f, 9.3897980e-01f, 1.0000000e+00f,
    };
    return table;
  }

  // Decodes one channel's floor; returns false if the floor is unused
  // (channel silent this frame).  Fills curve[0..n2) with linear gains.
  bool DecodeFloor(const FloorConfig& fc, BitReader* br, uint32_t n2,
                   float* curve) const {
    if (fc.type == 1) return DecodeFloor1(fc.f1, br, n2, curve);
    return DecodeFloor0(fc.f0, br, n2, curve);
  }

  bool DecodeFloor1(const Floor1& f, BitReader* br, uint32_t n2, float* curve) const {
    if (!br->Read(1) || br->eof()) return false;
    static const uint32_t kRange[4] = {256, 128, 86, 64};
    uint32_t range = kRange[f.multiplier - 1];
    uint32_t posts = (uint32_t)f.x_list.size();
    std::vector<int32_t> y(posts);
    uint32_t hbits = ilog(range - 1);
    y[0] = (int32_t)br->Read(hbits);
    y[1] = (int32_t)br->Read(hbits);
    uint32_t offset = 2;
    for (uint32_t i = 0; i < f.partition_class.size(); i++) {
      uint32_t cls = f.partition_class[i];
      uint32_t cdim = f.class_dims[cls];
      uint32_t cbits = f.class_subs[cls];
      uint32_t csub = (1u << cbits) - 1;
      uint32_t cval = 0;
      if (cbits) {
        int32_t v = books_[f.class_masterbooks[cls]].DecodeScalar(br);
        if (v < 0) return false;
        cval = (uint32_t)v;
      }
      for (uint32_t j = 0; j < cdim; j++) {
        int32_t book = f.subclass_books[cls][cval & csub];
        cval >>= cbits;
        if (book >= 0) {
          int32_t v = books_[book].DecodeScalar(br);
          if (v < 0) return false;
          y[offset + j] = v;
        } else {
          y[offset + j] = 0;
        }
      }
      offset += cdim;
    }
    // Amplitude synthesis (spec 7.2.4): predict from decoded neighbors,
    // wrap the residue around the available room.
    std::vector<int32_t> final_y(posts);
    std::vector<bool> step2(posts, false);
    step2[0] = step2[1] = true;
    final_y[0] = y[0];
    final_y[1] = y[1];
    for (uint32_t i = 2; i < posts; i++) {
      uint32_t lo = f.low_nbr[i], hi = f.high_nbr[i];
      int32_t pred = RenderPoint((int32_t)f.x_list[lo], final_y[lo],
                                 (int32_t)f.x_list[hi], final_y[hi],
                                 (int32_t)f.x_list[i]);
      int32_t val = y[i];
      int32_t highroom = (int32_t)range - pred;
      int32_t lowroom = pred;
      int32_t room = 2 * std::min(highroom, lowroom);
      if (val) {
        step2[lo] = step2[hi] = true;
        step2[i] = true;
        if (val >= room) {
          final_y[i] = highroom > lowroom ? val - lowroom + pred
                                          : pred - (val - highroom) - 1;
        } else {
          final_y[i] = (val & 1) ? pred - ((val + 1) >> 1)
                                 : pred + (val >> 1);
        }
      } else {
        step2[i] = false;
        final_y[i] = pred;
      }
      final_y[i] = std::max(0, std::min((int32_t)range - 1, final_y[i]));
    }
    // Curve synthesis: render lines between step2 posts in sorted-x
    // order, through the inverse dB table.
    const float* tab = InverseDbTable();
    uint32_t hx = 0;
    int32_t hy = 0;
    uint32_t lx = 0;
    int32_t ly = final_y[f.sort_order[0]] * (int32_t)f.multiplier;
    for (uint32_t q = 1; q < posts; q++) {
      uint32_t i = f.sort_order[q];
      if (!step2[i]) continue;
      hx = f.x_list[i];
      hy = final_y[i] * (int32_t)f.multiplier;
      if (lx < n2)
        // Full segment endpoints (the slope must not change when the
        // plot is clipped at n2 — RenderLine bound-checks internally).
        RenderLine((int32_t)lx, ly, (int32_t)hx, hy, curve, n2, tab);
      lx = hx;
      ly = hy;
    }
    if (hx < n2) {  // horizontal extension to the end of the spectrum
      int32_t v = std::max(0, std::min(255, ly));
      for (uint32_t x = hx; x < n2; x++) curve[x] = tab[v];
    }
    return true;
  }

  static int32_t RenderPoint(int32_t x0, int32_t y0, int32_t x1, int32_t y1,
                             int32_t x) {
    int32_t dy = y1 - y0;
    int32_t adx = x1 - x0;
    int32_t ady = std::abs(dy);
    int32_t err = ady * (x - x0);
    int32_t off = adx ? err / adx : 0;
    return dy < 0 ? y0 - off : y0 + off;
  }

  static void RenderLine(int32_t x0, int32_t y0, int32_t x1, int32_t y1,
                         float* curve, uint32_t n2, const float* tab) {
    int32_t dy = y1 - y0;
    int32_t adx = x1 - x0;
    if (adx <= 0) return;
    int32_t ady = std::abs(dy);
    int32_t base = dy / adx;
    int32_t sy = dy < 0 ? base - 1 : base + 1;
    int32_t y = y0;
    int32_t err = 0;
    ady -= std::abs(base) * adx;
    if ((uint32_t)x0 < n2) curve[x0] = tab[std::max(0, std::min(255, y))];
    for (int32_t x = x0 + 1; x < x1; x++) {
      err += ady;
      if (err >= adx) {
        err -= adx;
        y += sy;
      } else {
        y += base;
      }
      if ((uint32_t)x < n2) curve[x] = tab[std::max(0, std::min(255, y))];
    }
  }

  bool DecodeFloor0(const Floor0& f, BitReader* br, uint32_t n2, float* curve) const {
    uint32_t amplitude = br->Read(f.amplitude_bits);
    if (br->eof() || amplitude == 0) return false;
    uint32_t booknum = br->Read(ilog((uint32_t)f.books.size()));
    if (booknum >= f.books.size()) return false;  // undecodable per spec
    const Codebook& book = books_[f.books[booknum]];
    if (!book.has_vectors()) return false;
    std::vector<float> coeff;
    float last = 0.0f;
    while (coeff.size() < f.order) {
      const float* v = book.DecodeVq(br);
      if (!v) return false;  // EOP mid-coefficients: unusable
      for (uint32_t d = 0; d < book.dims(); d++) coeff.push_back(v[d] + last);
      last = coeff.back();
    }
    coeff.resize(f.order);
    // Bark-mapped LSP curve (spec 6.2.2/6.2.3).
    auto bark = [](double x) {
      return 13.1 * std::atan(0.00074 * x) +
             2.24 * std::atan(1.85e-8 * x * x) + 1e-4 * x;
    };
    std::vector<int32_t> map(n2);
    double scale = f.bark_map_size / bark(0.5 * f.rate);
    for (uint32_t i = 0; i < n2; i++) {
      int32_t m = (int32_t)std::floor(bark(0.5 * f.rate * i / n2) * scale);
      map[i] = std::min<int32_t>((int32_t)f.bark_map_size - 1, m);
    }
    double amp_max = (double)((1u << f.amplitude_bits) - 1);
    uint32_t i = 0;
    while (i < n2) {
      double omega = M_PI * map[i] / (double)f.bark_map_size;
      double cosw = std::cos(omega);
      // Spec 6.2.3: LSP products with a factor 4 inside each squared
      // term; odd orders weight p by (1-cos²ω) and q by 1/4, even
      // orders by (1∓cosω)/2.
      double p, q;
      if (f.order & 1) {
        p = 1.0 - cosw * cosw;
        q = 0.25;
        for (uint32_t j = 0; j + 1 < f.order; j += 2) {
          double d = std::cos(coeff[j + 1]) - cosw;
          p *= 4.0 * d * d;
        }
        for (uint32_t j = 0; j < f.order; j += 2) {
          double d = std::cos(coeff[j]) - cosw;
          q *= 4.0 * d * d;
        }
      } else {
        p = (1.0 - cosw) * 0.5;
        q = (1.0 + cosw) * 0.5;
        for (uint32_t j = 1; j < f.order; j += 2) {
          double d = std::cos(coeff[j]) - cosw;
          p *= 4.0 * d * d;
        }
        for (uint32_t j = 0; j < f.order; j += 2) {
          double d = std::cos(coeff[j]) - cosw;
          q *= 4.0 * d * d;
        }
      }
      double linear = std::exp(
          (((double)amplitude * f.amplitude_offset) /
               (amp_max * std::sqrt(p + q)) -
           (double)f.amplitude_offset) *
          0.11512925);
      int32_t cur_map = map[i];
      while (i < n2 && map[i] == cur_map) curve[i++] = (float)linear;
    }
    return true;
  }

  // ---- residues ------------------------------------------------------------

  // vectors: [ch][n2] accumulators (zeroed by caller); decode_ch: which
  // of them participate.
  void DecodeResidue(const Residue& r, BitReader* br,
                     std::vector<float*>& vectors,
                     const std::vector<bool>& do_not_decode, uint32_t n2,
                     std::vector<float>& interleave) const {
    if (r.type == 2) {
      bool all_silent = true;
      for (bool d : do_not_decode) all_silent &= d;
      if (all_silent) return;
      uint32_t ch = (uint32_t)vectors.size();
      interleave.assign((size_t)n2 * ch, 0.0f);
      float* v = interleave.data();
      std::vector<float*> one{v};
      std::vector<bool> dnd{false};
      DecodeResidueInner(r, br, one, dnd, n2 * ch, /*format1=*/true);
      for (uint32_t c = 0; c < ch; c++)
        for (uint32_t i = 0; i < n2; i++) vectors[c][i] += v[(size_t)i * ch + c];
      return;
    }
    DecodeResidueInner(r, br, vectors, do_not_decode, n2, r.type == 1);
  }

  void DecodeResidueInner(const Residue& r, BitReader* br,
                          std::vector<float*>& vectors,
                          const std::vector<bool>& do_not_decode, uint32_t n,
                          bool format1) const {
    uint32_t limit_begin = std::min(r.begin, n);
    uint32_t limit_end = std::min(r.end, n);
    if (limit_end <= limit_begin) return;
    uint32_t to_read = limit_end - limit_begin;
    uint32_t parts = to_read / r.partition_size;
    if (!parts) return;
    const Codebook& classbook = books_[r.classbook];
    uint32_t classwords = classbook.dims();
    uint32_t nch = (uint32_t)vectors.size();
    std::vector<std::vector<uint32_t>> cls(
        nch, std::vector<uint32_t>(parts + classwords, 0));
    for (uint32_t pass = 0; pass < 8; pass++) {
      uint32_t part = 0;
      while (part < parts) {
        if (pass == 0) {
          for (uint32_t c = 0; c < nch; c++) {
            if (do_not_decode[c]) continue;
            int32_t temp = books_[r.classbook].DecodeScalar(br);
            if (temp < 0) return;  // EOP ends residue decode
            for (int32_t i = (int32_t)classwords - 1; i >= 0; i--) {
              cls[c][part + i] = (uint32_t)temp % r.classifications;
              temp /= (int32_t)r.classifications;
            }
          }
        }
        for (uint32_t w = 0; w < classwords && part < parts; w++, part++) {
          for (uint32_t c = 0; c < nch; c++) {
            if (do_not_decode[c]) continue;
            uint32_t vq = cls[c][part];
            int32_t book = r.books[vq][pass];
            if (book < 0) continue;
            uint32_t offset = limit_begin + part * r.partition_size;
            if (!DecodePartition(books_[book], br, vectors[c], offset,
                                 r.partition_size, format1))
              return;  // EOP
          }
        }
      }
    }
  }

  static bool DecodePartition(const Codebook& book, BitReader* br, float* v,
                              uint32_t offset, uint32_t psize, bool format1) {
    uint32_t dims = book.dims();
    if (!book.has_vectors() || dims == 0) return true;  // scalar book: no-op
    if (format1) {
      uint32_t i = 0;
      while (i < psize) {
        const float* e = book.DecodeVq(br);
        if (!e) return false;
        for (uint32_t d = 0; d < dims && i < psize; d++, i++)
          v[offset + i] += e[d];
      }
    } else {
      uint32_t step = psize / dims;
      for (uint32_t i = 0; i < step; i++) {
        const float* e = book.DecodeVq(br);
        if (!e) return false;
        for (uint32_t d = 0; d < dims; d++) v[offset + i + d * step] += e[d];
      }
    }
    return true;
  }

  // ---- audio packet ---------------------------------------------------------

  // One planned audio packet: the Ogg packet bytes plus everything the
  // serial placement chain determines up front (mode, window flags,
  // block length, absolute start position).  Body decodes need nothing
  // else, which is what makes whole batches of packets independent.
  struct PacketPlan {
    Packet pkt;
    uint32_t mode_idx = 0;
    bool prev_flag = true, next_flag = true;
    uint32_t n = 0;
    int64_t start = 0;
  };

  // Per-thread decode scratch (the IMDCT carries its twiddle caches).
  struct Scratch {
    Imdct imdct;
    std::vector<float> interleave;
    std::vector<std::vector<float>> floors, residues;
  };

  // Pull the next decodable audio packet and resolve its placement:
  // this block's left-slope center lands on the previous block's
  // right-slope center, which needs only the block LENGTH — so many
  // packets can be planned ahead of any body decode.  False = stream
  // exhausted.
  bool PlanNextPacket(PacketPlan* plan) {
    Packet pkt;
    for (;;) {
      if (!ogg_.NextPacket(&pkt)) return false;
      if (pkt.data.empty()) continue;
      if (pkt.data[0] & 1) continue;  // header packet type: skip strays
      BitReader br(pkt.data.data(), pkt.data.size());
      if (br.ReadBit() != 0) continue;  // not an audio packet
      uint32_t mode_idx = br.Read(ilog((uint32_t)modes_.size() - 1));
      if (mode_idx >= modes_.size()) continue;  // undecodable: skip
      const Mode& mode = modes_[mode_idx];
      plan->mode_idx = mode_idx;
      plan->n = blocksize_[mode.blockflag ? 1 : 0];
      plan->prev_flag = plan->next_flag = true;
      if (mode.blockflag) {
        plan->prev_flag = br.Read(1);
        plan->next_flag = br.Read(1);
      }
      if (br.eof()) continue;
      plan->pkt = std::move(pkt);
      break;
    }
    if (cur_start_pending_) {
      cur_start_ = next_center_ - (int64_t)plan->n / 4;
      cur_start_pending_ = false;
    }
    plan->start = cur_start_;
    next_center_ = cur_start_ + (int64_t)(3 * plan->n) / 4;
    cur_start_pending_ = true;
    return true;
  }

  // Floors, residues, coupling, IMDCT and windowing for one planned
  // packet -> per-channel windowed block in `win`.  Touches only const
  // setup state and the caller's scratch: safe on FramePool workers.
  void DecodePacketBody(const PacketPlan& plan, Scratch* scr,
                        std::vector<std::vector<float>>* win) const {
    const Mode& mode = modes_[plan.mode_idx];
    const Mapping& map = mappings_[mode.mapping];
    const uint32_t n = plan.n, n2 = n / 2;
    BitReader br(plan.pkt.data.data(), plan.pkt.data.size());
    br.ReadBit();  // packet type (re-reading what planning validated)
    br.Read(ilog((uint32_t)modes_.size() - 1));
    if (mode.blockflag) {
      br.Read(1);
      br.Read(1);
    }

    // Floors.
    scr->floors.assign(channels_, std::vector<float>(n2, 0.0f));
    std::vector<bool> nonzero(channels_, false);
    for (uint32_t c = 0; c < channels_; c++) {
      const FloorConfig& fc =
          floors_[map.submap_floor[map.mux[c]]];
      nonzero[c] = DecodeFloor(fc, &br, n2, scr->floors[c].data());
    }
    // Nonzero propagation across coupling.
    for (size_t sc = 0; sc < map.coupling_mag.size(); sc++)
      if (nonzero[map.coupling_mag[sc]] || nonzero[map.coupling_ang[sc]]) {
        nonzero[map.coupling_mag[sc]] = true;
        nonzero[map.coupling_ang[sc]] = true;
      }
    // Residues per submap.
    scr->residues.assign(channels_, std::vector<float>(n2, 0.0f));
    uint32_t submaps = (uint32_t)map.submap_floor.size();
    for (uint32_t sm = 0; sm < submaps; sm++) {
      std::vector<float*> vecs;
      std::vector<bool> dnd;
      for (uint32_t c = 0; c < channels_; c++)
        if (map.mux[c] == sm) {
          vecs.push_back(scr->residues[c].data());
          dnd.push_back(!nonzero[c]);
        }
      DecodeResidue(residues_[map.submap_residue[sm]], &br, vecs, dnd, n2,
                    scr->interleave);
    }
    // Inverse coupling (reverse order).
    for (size_t sc = map.coupling_mag.size(); sc-- > 0;) {
      float* m = scr->residues[map.coupling_mag[sc]].data();
      float* a = scr->residues[map.coupling_ang[sc]].data();
      for (uint32_t i = 0; i < n2; i++) {
        float M = m[i], A = a[i], nm, na;
        if (M > 0) {
          if (A > 0) {
            nm = M;
            na = M - A;
          } else {
            na = M;
            nm = M + A;
          }
        } else {
          if (A > 0) {
            nm = M;
            na = M + A;
          } else {
            na = M;
            nm = M - A;
          }
        }
        m[i] = nm;
        a[i] = na;
      }
    }
    // Floor * residue -> spectrum; IMDCT; window.
    win->assign(channels_, std::vector<float>(n));
    for (uint32_t c = 0; c < channels_; c++) {
      float* spec = scr->residues[c].data();
      if (nonzero[c]) {
        const float* fl = scr->floors[c].data();
        for (uint32_t i = 0; i < n2; i++) spec[i] *= fl[i];
      } else {
        std::fill(spec, spec + n2, 0.0f);
      }
      scr->imdct.Run(spec, (*win)[c].data(), n);
      WindowBlock((*win)[c].data(), n, mode.blockflag, plan.prev_flag,
                  plan.next_flag);
    }
  }

  // Serial phase: lap-add one decoded block into the accumulators and
  // advance the PCM bookkeeping (exactly the old AdvanceLap semantics;
  // the placement chain itself already advanced during planning).
  void PlaceBlock(const PacketPlan& plan,
                  const std::vector<std::vector<float>>& win) {
    const Mode& mode = modes_[plan.mode_idx];
    const uint32_t n = plan.n;
    WindowGeom g = Geometry(n, mode.blockflag, plan.prev_flag, plan.next_flag);
    EnsureRange(plan.start, n);
    for (uint32_t c = 0; c < channels_; c++) {
      auto& out = out_[c];
      const float* y = win[c].data();
      size_t base = (size_t)(plan.start - out_base_);
      for (uint32_t i = 0; i < n; i++) out[base + i] += y[i];
    }
    if (prev_block_ < 0) {
      // First block: primes the lap only; PCM sample 0 corresponds to
      // the start of its right slope (where the next block laps in).
      pcm_origin_ = plan.start + g.right_start;
    } else {
      ready_ = plan.start + g.right_start - pcm_origin_;
    }
    prev_block_ = mode.blockflag ? 1 : 0;
    // Stream end: the final page's granule position trims (or extends
    // into the laid-down tail) the total sample count.
    if (plan.pkt.eos) {
      eos_seen_ = true;
      int64_t laid = (int64_t)out_[0].size() + out_base_ - pcm_origin_;
      int64_t cap = plan.pkt.granule >= 0 ? plan.pkt.granule : laid;
      ready_ = std::min(cap, laid);
    }
  }

  // Plan up to kMaxBatchPackets packets covering ~want frames, decode
  // the bodies (FramePool-parallel when the codec pool is on — packet
  // synthesis is independent; only this lap-add phase is sequential),
  // then place them in stream order.  Output is identical to the
  // packet-at-a-time path by construction: same packets, same bits,
  // same placement, same adds in the same order.
  bool DecodeBatch(int64_t want) {
    if (eos_seen_) return false;
    PrewarmSlopes();
    int pool_w = folve::FramePool::Instance().EffectiveThreads();
    const size_t cap = pool_w > 1 ? (size_t)kMaxBatchPackets : 1;
    std::vector<PacketPlan> plans;
    int64_t est = 0;
    while (plans.size() < cap &&
           (plans.empty() || est < want + (int64_t)blocksize_[1])) {
      PacketPlan plan;
      if (!PlanNextPacket(&plan)) break;
      est += (int64_t)plan.n / 2;
      plans.push_back(std::move(plan));
      if (plans.back().pkt.eos) break;  // never read past end-of-stream
    }
    if (plans.empty()) {
      FlushTail();
      return ready_ > consumed_;
    }
    std::vector<std::vector<std::vector<float>>> wins(plans.size());
    bool pooled = false;
    if (plans.size() >= 2 && pool_w > 1) {
      pooled = folve::FramePool::Instance().Run(
          [&](size_t i) {
            static thread_local Scratch scr;
            DecodePacketBody(plans[i], &scr, &wins[i]);
          },
          plans.size());
    }
    if (!pooled) {
      for (size_t i = 0; i < plans.size(); i++)
        DecodePacketBody(plans[i], &scratch_, &wins[i]);
    }
    for (size_t i = 0; i < plans.size(); i++) PlaceBlock(plans[i], wins[i]);
    return true;
  }

  static constexpr int kMaxBatchPackets = 64;

  // Window slopes per spec 4.3.1.  Slope length is short/2 on a long
  // block lapped against a short one.
  struct WindowGeom {
    uint32_t left_start, left_n, right_start, right_n, n;
  };

  WindowGeom Geometry(uint32_t n, bool blockflag, bool prev_flag,
                      bool next_flag) const {
    WindowGeom g;
    g.n = n;
    uint32_t short_n = blocksize_[0];
    if (blockflag && !prev_flag) {
      g.left_start = n / 4 - short_n / 4;
      g.left_n = short_n / 2;
    } else {
      g.left_start = 0;
      g.left_n = n / 2;
    }
    if (blockflag && !next_flag) {
      g.right_start = n * 3 / 4 - short_n / 4;
      g.right_n = short_n / 2;
    } else {
      g.right_start = n / 2;
      g.right_n = n / 2;
    }
    return g;
  }

  const std::vector<float>& Slope(uint32_t len) {
    auto& s = slopes_[len];
    if (s.empty()) {
      s.resize(len);
      for (uint32_t i = 0; i < len; i++) {
        double x = std::sin((i + 0.5) / len * M_PI / 2.0);
        s[i] = (float)std::sin(M_PI / 2.0 * x * x);
      }
    }
    return s;
  }

  // Grow the per-channel accumulators to cover [start, start+n); block
  // placement may go BELOW out_base_ (a long block lapping a short one
  // extends further left), so the front can pad too.
  void EnsureRange(int64_t start, uint32_t n) {
    if (start < out_base_) {
      size_t pad = (size_t)(out_base_ - start);
      for (auto& v : out_) v.insert(v.begin(), pad, 0.0f);
      out_base_ = start;
    }
    int64_t need_end = start + n;
    for (auto& v : out_)
      if ((int64_t)v.size() + out_base_ < need_end)
        v.resize((size_t)(need_end - out_base_), 0.0f);
  }

  // Window a raw IMDCT block in place (spec 4.3.1 slopes; zeros outside
  // the slopes' span, 1 between).  Read-only on the decoder: the slope
  // tables are pre-warmed before any parallel batch.
  void WindowBlock(float* y, uint32_t n, bool blockflag, bool prev_flag,
                   bool next_flag) const {
    WindowGeom g = Geometry(n, blockflag, prev_flag, next_flag);
    const std::vector<float>& ls = slopes_.at(g.left_n);
    const std::vector<float>& rs = slopes_.at(g.right_n);
    for (uint32_t i = 0; i < g.left_start; i++) y[i] = 0.0f;
    for (uint32_t i = 0; i < g.left_n; i++) y[g.left_start + i] *= ls[i];
    for (uint32_t i = 0; i < g.right_n; i++)
      y[g.right_start + i] *= rs[g.right_n - 1 - i];
    for (uint32_t i = g.right_start + g.right_n; i < n; i++) y[i] = 0.0f;
  }

  // The only slope lengths Geometry can produce are short/2 and n/2 for
  // n in {short, long}; build both up front so workers only read.
  void PrewarmSlopes() {
    Slope(blocksize_[0] / 2);
    Slope(blocksize_[1] / 2);
  }

  void FlushTail() {
    // No further packets: everything laid down is as final as it gets.
    if (prev_block_ >= 0) {
      int64_t limit = (int64_t)out_[0].size() + out_base_ - pcm_origin_;
      if (total_frames_ > 0) limit = std::min(limit, total_frames_);
      if (limit > ready_) ready_ = limit;
    }
  }

  void CompactOutput() {
    // Drop emitted samples from the per-channel buffers.
    int64_t keep_from = pcm_origin_ + consumed_;
    if (keep_from <= out_base_) return;
    size_t drop = (size_t)(keep_from - out_base_);
    for (auto& v : out_) {
      if (drop >= v.size())
        v.clear();
      else
        v.erase(v.begin(), v.begin() + drop);
    }
    out_base_ = keep_from;
  }

  std::vector<uint8_t> bytes_;
  OggReader ogg_;
  uint32_t rate_ = 0, channels_ = 0;
  uint32_t blocksize_[2] = {0, 0};
  std::string vendor_;
  std::vector<std::string> comments_;
  std::vector<Codebook> books_;
  std::vector<FloorConfig> floors_;
  std::vector<Residue> residues_;
  std::vector<Mapping> mappings_;
  std::vector<Mode> modes_;

  Scratch scratch_;  // serial-path decode scratch
  std::map<uint32_t, std::vector<float>> slopes_;

  // Lap/output state (absolute sample positions).
  std::vector<std::vector<float>> out_;  // [ch] accumulation buffers
  int64_t out_base_ = 0;                 // abs position of out_[c][0]
  int64_t cur_start_ = 0;                // abs start of current block
  int64_t next_center_ = 0;
  bool cur_start_pending_ = false;
  int64_t pcm_origin_ = 0;  // abs position of PCM sample 0
  int64_t ready_ = 0;       // frames finalized (relative to pcm_origin_)
  int64_t consumed_ = 0;    // frames handed to the caller
  int32_t prev_block_ = -1;
  int64_t total_frames_ = 0;
  bool eos_seen_ = false;
};

}  // namespace folve_vorbis

// ---------------------------------------------------------------------------
// C ABI (mirrors the FLAC codec's: open/info/read/rewind/close + comments)
// ---------------------------------------------------------------------------

extern "C" {

struct FolveVorbisInfo {
  uint32_t rate;
  uint32_t channels;
  int64_t frames;  // per the stream's final granule position
};

void* folve_vorbis_open(const uint8_t* data, uint64_t len) {
  try {
    return new folve_vorbis::Decoder(data, (size_t)len);
  } catch (...) {
    return nullptr;
  }
}

void folve_vorbis_info(void* h, FolveVorbisInfo* out) {
  auto* d = (folve_vorbis::Decoder*)h;
  out->rate = d->rate();
  out->channels = d->channels();
  out->frames = d->total_frames();
}

// Interleaved float32 frames; returns frames read, 0 at EOF, -1 error.
int64_t folve_vorbis_read(void* h, float* out, int64_t nframes) {
  try {
    return ((folve_vorbis::Decoder*)h)->Read(out, nframes);
  } catch (...) {
    return -1;
  }
}

int folve_vorbis_rewind(void* h) {
  try {
    ((folve_vorbis::Decoder*)h)->Rewind();
    return 0;
  } catch (...) {
    return -1;
  }
}

void folve_vorbis_close(void* h) { delete (folve_vorbis::Decoder*)h; }

uint32_t folve_vorbis_comments(void* h) {
  return (uint32_t)((folve_vorbis::Decoder*)h)->comments().size();
}

uint64_t folve_vorbis_comment_len(void* h, uint32_t i) {
  const auto& c = ((folve_vorbis::Decoder*)h)->comments();
  return i < c.size() ? c[i].size() : 0;
}

void folve_vorbis_comment_copy(void* h, uint32_t i, uint8_t* dst) {
  const auto& c = ((folve_vorbis::Decoder*)h)->comments();
  if (i < c.size()) std::memcpy(dst, c[i].data(), c[i].size());
}

// Test hook: raw IMDCT (y[n] = sum X[k] cos(2pi/N (n+1/2+N/4)(k+1/2)))
// so the FFT-routed transform can be checked against a direct loop.
void folve_vorbis_imdct(const float* X, float* y, uint32_t n) {
  folve_vorbis::Imdct m;
  m.Run(X, y, n);
}

}  // extern "C"
