#include <cstdlib>
// Native entropy decoder for the .dwt bitstream.
//
// Decode-side bit parsing is inherently serial (every codeword's position
// depends on all previous ones), so the TPU framework runs it as a native
// host stage: this C++ parser emits linearized wavelet coefficients, and
// the inverse pipeline (bias, Hilbert scatter, inverse lifting, color)
// runs as jitted JAX ops on the TPU (dwt_tpu/codec/decoder.py).
//
// Behavioral contract mirrors the reference decoder exactly
// (decode.c:67-243, rle.h, vli.h, bits.h), including graceful EOF at any
// point (truncated streams), sticky error propagation, reduced-resolution
// bail (decode.c:213-214) and per-(channel, level) missing-plane counts.
// Unlike the reference's one-bit-at-a-time FILE* stack, this parser uses a
// 64-bit accumulator refilled straight from the mapped buffer; a run
// fast-path consumes pending zero-runs without per-bit work.
//
// Built as a shared library; called from Python via ctypes
// (dwt_tpu/runtime/native.py).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kSgnBit = 31;
constexpr int kSigBit = 30;
constexpr int kRefBit = 29;
constexpr uint32_t kSgnMask = 1u << kSgnBit;
constexpr uint32_t kSigMask = 1u << kSigBit;
constexpr uint32_t kRefMask = 1u << kRefBit;

struct BitReader {
  const uint8_t* data;
  int64_t nbytes;
  int64_t pos = 0;     // next byte to load
  uint64_t acc = 0;    // LSB-first bit accumulator
  int navail = 0;      // bits in acc
  bool fail = false;

  void refill() {
    while (navail <= 56 && pos < nbytes) {
      acc |= static_cast<uint64_t>(data[pos++]) << navail;
      navail += 8;
    }
  }

  // Returns 0/1, or -1 on EOF (sticky).
  inline int get_bit() {
    if (fail) return -1;
    if (navail == 0) {
      refill();
      if (navail == 0) {
        fail = true;
        return -1;
      }
    }
    int b = static_cast<int>(acc & 1);
    acc >>= 1;
    navail -= 1;
    return b;
  }

  // LSB-first n-bit read; -1 on EOF.
  inline int64_t read_bits(int n) {
    if (fail) return -1;
    if (navail < n) refill();
    if (navail >= n) {
      int64_t v = static_cast<int64_t>(acc & ((n == 64) ? ~0ull : ((1ull << n) - 1)));
      acc >>= n;
      navail -= n;
      return v;
    }
    // Slow path across the tail.
    int64_t v = 0;
    for (int i = 0; i < n; ++i) {
      int b = get_bit();
      if (b < 0) return -1;
      v |= static_cast<int64_t>(b) << i;
    }
    return v;
  }
};

struct VliReader {
  BitReader* bits;
  int order = 0;

  // Adaptive Rice/Elias get (vli.h:86-101): count prefix zeros with the
  // order escalating per zero, then `order` raw bits; order decays by 2.
  inline int64_t get() {
    int64_t sum = 0;
    for (;;) {
      int b = bits->get_bit();
      if (b < 0) return -1;
      if (b) break;
      sum += 1ll << order;
      order += 1;
    }
    int64_t v = bits->read_bits(order);
    if (v < 0) return -1;
    order -= 2;
    if (order < 0) order = 0;
    return v + sum;
  }
};

struct RleReader {
  VliReader* vli;
  int64_t cnt = 0;  // pending zeros; <0 = sticky error

  // Next significance bit (rle.h:66-77).
  inline int get_rle() {
    if (cnt < 0) return -1;
    if (!cnt) {
      cnt = vli->get();
      if (cnt < 0) return -1;
      return !cnt;
    }
    return cnt-- == 1;
  }

  // Raw bit; any pending run must end exactly here (rle.h:79-103).
  inline int get_bit() {
    if (cnt < 0) return -1;
    if (cnt > 0) {
      int r = get_rle();
      if (r < 0) return -1;
      if (r != 1) return -1;
    }
    return vli->bits->get_bit();
  }
};

// Per-(channel, chunk) significance bookkeeping.  The reference re-scans
// every coefficient on every plane, checking state flags per position
// (decode.c:73-99, O(num * planes) branchy work).  We instead keep the
// insignificant positions as an ordered list and *jump over zero runs in
// O(1)*: a run of R zeros advances the list cursor by R without touching
// memory, so each plane costs O(runs + newly-significant + |significant|)
// plus one memcpy-speed list rebuild — the dominant early planes (sparse,
// huge runs) become nearly free.
struct ChunkState {
  std::vector<int32_t> insig;  // not-yet-significant positions, ascending
  std::vector<int32_t> sig;    // significant (refined) positions, ascending
  std::vector<int32_t> newly;  // became significant this plane
  bool init = false;

  void ensure(int64_t num) {
    if (init) return;
    insig.resize(num);
    for (int64_t i = 0; i < num; ++i) insig[i] = static_cast<int32_t>(i);
    init = true;
  }
};

// One (chunk, plane) coding step.  Returns 0, or -1 on EOF (partial
// updates keep exactly the reference's sequence-point semantics: value
// bits are only written where the reference would have written them).
int decode_plane(RleReader* rle, int32_t* val, int64_t num, int plane,
                 ChunkState* cs) {
  uint32_t bit_mask = plane >= 0 ? (1u << plane) : 0u;
  cs->ensure(num);
  cs->newly.clear();

  // Significance pass over the insignificant list with run jumping.
  // get_rle/counter semantics (rle.h:66-77): reading run R makes the
  // current position zero #1 of R, and position (cursor + R) significant;
  // a pending counter c makes position (cursor + c - 1) significant.
  size_t i = 0;
  const size_t e = cs->insig.size();
  while (i < e) {
    size_t remaining = e - i;
    if (rle->cnt == 0) {
      int64_t r = rle->vli->get();
      if (r < 0) return -1;
      if (static_cast<uint64_t>(r) >= remaining) {
        rle->cnt = r - static_cast<int64_t>(remaining) + 1;
        i = e;
        break;
      }
      i += static_cast<size_t>(r);
    } else {
      if (static_cast<uint64_t>(rle->cnt) > remaining) {
        rle->cnt -= static_cast<int64_t>(remaining);
        i = e;
        break;
      }
      i += static_cast<size_t>(rle->cnt) - 1;
      rle->cnt = 0;
    }
    // Position insig[i] is newly significant.  The reference writes the
    // significance bit BEFORE reading the sign (decode.c:79-83) — on EOF
    // at the sign read the bit must survive (partial-truncation parity).
    int32_t pos = cs->insig[i];
    val[pos] = static_cast<int32_t>(static_cast<uint32_t>(val[pos]) | bit_mask);
    int s = rle->vli->bits->get_bit();
    if (s < 0) return -1;
    val[pos] = static_cast<int32_t>(
        static_cast<uint32_t>(val[pos]) |
        (static_cast<uint32_t>(s) << kSgnBit) | kSigMask);
    cs->newly.push_back(pos);
    ++i;
  }

  // Refinement pass over previously-significant positions (position order).
  // Bits are consecutive in the stream once any pending run is consumed, so
  // read them in up-to-57-bit chunks and visit only the set bits (ctz).
  if (getenv("DWT_SIMPLE_REF")) {
    for (int32_t pos : cs->sig) {
      int b = rle->get_bit();
      if (b < 0) return -1;
      if (b) val[pos] = static_cast<int32_t>(
          static_cast<uint32_t>(val[pos]) | bit_mask);
    }
  } else {
    const int32_t* sig = cs->sig.data();
    size_t m = cs->sig.size();
    size_t j = 0;
    if (m && rle->cnt > 0) {  // first bit must close the pending run exactly
      int b = rle->get_bit();
      if (b < 0) return -1;
      if (b) val[sig[0]] = static_cast<int32_t>(
          static_cast<uint32_t>(val[sig[0]]) | bit_mask);
      j = 1;
    }
    BitReader* br = rle->vli->bits;
    while (j < m) {
      br->refill();
      int take = br->navail < static_cast<int64_t>(m - j)
                     ? br->navail : static_cast<int>(m - j);
      if (take > 57) take = 57;  // never shift acc by >= 64 (UB)
      if (take <= 0) {
        int b = br->get_bit();  // sets sticky EOF
        if (b < 0) return -1;
        if (b) val[sig[j]] = static_cast<int32_t>(
            static_cast<uint32_t>(val[sig[j]]) | bit_mask);
        ++j;
        continue;
      }
      uint64_t chunk = (take >= 64) ? br->acc
                                    : (br->acc & ((1ull << take) - 1));
      br->acc >>= take;
      br->navail -= take;
      while (chunk) {
        int t = __builtin_ctzll(chunk);
        chunk &= chunk - 1;
        int32_t pos = sig[j + t];
        val[pos] = static_cast<int32_t>(
            static_cast<uint32_t>(val[pos]) | bit_mask);
      }
      j += take;
    }
  }

  // Promote: merge newly into sig (both ascending); rebuild insig by
  // copying the surviving runs (memcpy-speed).
  if (!cs->newly.empty()) {
    std::vector<int32_t> merged;
    merged.reserve(cs->sig.size() + cs->newly.size());
    size_t a = 0, b = 0;
    while (a < cs->sig.size() && b < cs->newly.size())
      merged.push_back(cs->sig[a] < cs->newly[b] ? cs->sig[a++]
                                                 : cs->newly[b++]);
    while (a < cs->sig.size()) merged.push_back(cs->sig[a++]);
    while (b < cs->newly.size()) merged.push_back(cs->newly[b++]);
    cs->sig.swap(merged);

    std::vector<int32_t> left;
    left.reserve(cs->insig.size() - cs->newly.size());
    size_t src = 0, k = 0;
    for (size_t j = 0; j < cs->insig.size(); ++j) {
      if (k < cs->newly.size() && cs->insig[j] == cs->newly[k]) {
        ++k;
        continue;
      }
      left.push_back(cs->insig[j]);
    }
    (void)src;
    cs->insig.swap(left);
  }
  return 0;
}

}  // namespace

extern "C" {

// Full entropy decode of the post-header bitstream.
//
//   stream/nbytes : bitstream bytes (starting right after the 6-byte header)
//   channels      : 1 or 3
//   levels        : pyramid levels; pixels[] has levels+1 entries
//   levels_max    : reduced-resolution cap (== levels for full decode)
//   pixels        : linear offsets per level (geometry.py Pyramid.pixels)
//   out           : (channels, total) planar int32, zero-initialized by caller
//   missing       : (channels, 16) int32, filled with remaining plane counts
//   out_level     : deepest detail level actually decoded (-1 if none)
//   out_planes    : (channels,) decoded plane counts
//
// Returns 0 on success (including graceful truncation), -1 on hard error
// (header/root/planes unreadable -> reference exits with no output).
int dwt_entropy_decode(const uint8_t* stream, int64_t nbytes, int channels,
                       int levels, int levels_max, const int64_t* pixels,
                       int32_t* out, int32_t* missing, int32_t* out_level,
                       int32_t* out_planes) {
  BitReader bits{stream, nbytes};
  VliReader vli{&bits};
  const int64_t total = pixels[levels];
  const int64_t pix0 = pixels[0];

  // Root band (decode.c:119-134): any EOF here is a hard error.  `cnt` is
  // attacker-controlled: values outside [0, 32] would make read_bits shift
  // by >= 64 (UB); no valid stream exceeds 29 bits of magnitude (the
  // format's 2^29 magnitude ceiling, encode.c:115-128), so hard-error like
  // the reference effectively does (it would hit EOF reading that many
  // bits per coefficient).
  for (int c = 0; c < channels; ++c) {
    int64_t cnt = vli.get();
    if (cnt < 0 || cnt > 32) return -1;
    if (cnt) {
      int32_t* row = out + static_cast<int64_t>(c) * total;
      for (int64_t i = 0; i < pix0; ++i) {
        int64_t v = bits.read_bits(static_cast<int>(cnt));
        if (v < 0) return -1;
        if (v) {
          int s = bits.get_bit();
          if (s < 0) return -1;
          if (s) v = -v;
        }
        row[i] = static_cast<int32_t>(v);
      }
    }
  }
  int planes[4] = {0, 0, 0, 0};
  int planes_max = 0;
  // Plane counts outside [0, 31] would drive decode_plane with
  // `1u << plane` UB; valid streams never exceed 29 (magnitude ceiling).
  for (int c = 0; c < channels; ++c) {
    int64_t p = vli.get();
    if (p < 0 || p > 31) return -1;
    planes[c] = static_cast<int>(p);
    out_planes[c] = planes[c];
    if (planes[c] > planes_max) planes_max = planes[c];
  }
  for (int c = 0; c < channels; ++c)
    for (int l = 0; l < 16; ++l)
      missing[c * 16 + l] = l < levels ? planes[c] : 0;

  int level = -1;
  RleReader rle{&vli};
  int maximum = levels > planes_max ? levels : planes_max;
  int layers_max = 2 * maximum - 1;
  std::vector<ChunkState> states(static_cast<size_t>(channels) * levels);

  // Layer schedule replay (decode.c:199-243).  A macro-free structured
  // version of the reference's goto-end control flow.
  bool stop = levels_max <= 0;
  if (!stop && planes_max == planes[0]) {
    // Pre-step: top luma plane of the coarsest chunk (decode.c:199-205).
    level = 0;
    if (decode_plane(&rle, out + pix0, pixels[1] - pix0, planes[0] - 1,
                     &states[0]) != 0)
      stop = true;
    else
      --missing[0];
  }
  for (int layers = 0; !stop && layers < layers_max; ++layers) {
    for (int l = 0; l < levels && l <= layers + 1; ++l) {
      if (l >= levels_max) { stop = true; break; }
      int plane = planes_max - 1 - (layers + 1 - l);
      if (plane < 0 || plane >= planes[0]) continue;
      if (level < l) level = l;
      if (decode_plane(&rle, out + pixels[l], pixels[l + 1] - pixels[l],
                       plane, &states[l]) != 0) { stop = true; break; }
      --missing[l];
    }
    for (int l = 0; !stop && l < levels && l <= layers; ++l) {
      if (l >= levels_max) { stop = true; break; }
      for (int c = 1; c < channels; ++c) {
        int plane = planes_max - 1 - (layers - l);
        if (plane < 0 || plane >= planes[c]) continue;
        if (level < l) level = l;
        if (decode_plane(&rle, out + static_cast<int64_t>(c) * total + pixels[l],
                         pixels[l + 1] - pixels[l], plane,
                         &states[static_cast<size_t>(c) * levels + l]) != 0) {
          stop = true;
          break;
        }
        --missing[c * 16 + l];
      }
    }
  }

  // Strip coding-state flags; sign-magnitude -> two's complement
  // (decode.c:102-117), over the decoded detail range only.
  int64_t ndet = (level + 1 <= levels ? pixels[level + 1] : total) - pix0;
  if (ndet < 0) ndet = 0;
  for (int c = 0; c < channels; ++c) {
    int32_t* row = out + static_cast<int64_t>(c) * total + pix0;
    for (int64_t i = 0; i < ndet; ++i) {
      uint32_t v = static_cast<uint32_t>(row[i]) & ~(kSigMask | kRefMask);
      int32_t w = static_cast<int32_t>(v & ~kSgnMask);
      row[i] = (v & kSgnMask) ? -w : w;
    }
  }
  *out_level = level;
  return 0;
}

// Batch decode of many independent streams (tiles of the .dwtt container
// or frames), fanned out over a host thread pool.  All tiles share one
// geometry (pixels/levels); per-tile stream offsets index into `streams`.
//
//   n            : number of tiles
//   streams      : concatenated tile payloads
//   offsets      : (n+1,) byte offsets into streams
//   out          : (n, channels, total) int32, zero-initialized
//   missing      : (n, channels, 16)
//   out_level    : (n,)
//   out_planes   : (n, channels)
//   rc           : (n,) per-tile return codes
//   nthreads     : 0 = hardware concurrency
int dwt_entropy_decode_batch(const uint8_t* streams, const int64_t* offsets,
                             int n, int channels, int levels, int levels_max,
                             const int64_t* pixels, int32_t* out,
                             int32_t* missing, int32_t* out_level,
                             int32_t* out_planes, int32_t* rc, int nthreads) {
  const int64_t total = pixels[levels];
  if (nthreads <= 0) {
    nthreads = static_cast<int>(std::thread::hardware_concurrency());
    if (nthreads <= 0) nthreads = 4;
  }
  std::atomic<int> next{0};
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      rc[i] = dwt_entropy_decode(
          streams + offsets[i], offsets[i + 1] - offsets[i], channels, levels,
          levels_max, pixels, out + static_cast<int64_t>(i) * channels * total,
          missing + static_cast<int64_t>(i) * channels * 16, out_level + i,
          out_planes + static_cast<int64_t>(i) * channels);
    }
  };
  std::vector<std::thread> pool;
  int nt = nthreads < n ? nthreads : n;
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return 0;
}

}  // extern "C"
