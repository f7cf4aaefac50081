// Native frif v9 container codec — the cross-implementation format
// oracle (round 5, VERDICT r4 #2).
//
// A complete, INDEPENDENT second implementation of the frif wire format
// for mode="grid" containers: byte-level container parse/emit
// (frave_tpu/codec/container.py is the first implementation), the
// (bits, off-list, scale) -> frequency-table regeneration rule — the
// riskiest part of the format contract (the analog of the reference's
// serialize.rs:230-236 regeneration) — the grid-mode symbol schedule
// derived from (h, w, nl) alone, the interleaved-lane rANS coder, and
// the exact IEEE-f32 context arithmetic. A frif blob encoded by the
// JAX/numpy pipelines decodes bit-exactly here, and blobs encoded here
// decode bit-exactly there (tests/test_cross_impl.py) — proving that
// everything a decoder needs really is on the wire.
//
// Semantics anchors (every rule here mirrors one of these, file:line):
//   container bytes        frave_tpu/codec/container.py:67-297
//   table regeneration     frave_tpu/entropy/tables.py:250-369
//   Laplace grid rows      frave_tpu/entropy/tables.py:175-203
//   grid schedule          frave_tpu/fractal/schedule.py:131-272
//   lattice bases          frave_tpu/fractal/lattice.py:52-111
//   lane/stream layout     frave_tpu/fractal/schedule.py:502-535,634-666
//   rANS lanes             frave_tpu/ops/rans.py
//   context math           frave_tpu/ops/prediction.py / jax_ops.py
//   lifting/quantization   frave_tpu/ops/lifting.py / jax_ops.py
//   channel transforms     frave_tpu/codec/channel_transform.py
//
// Float discipline: compiled with -ffp-contract=off (csrc/Makefile) so
// a*b+c never fuses — the context math must reproduce the Python
// pipelines' f32 results bit-for-bit.

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

#include "geometry_core.h"

extern "C" {
int64_t fg_num_tiles(int height, int width, int depth);
int fg_build(int height, int width, int depth, int64_t T_expect,
             int32_t* centers, int32_t* pixel_gather, uint8_t* coef_mask,
             int32_t* nbr_idx, int32_t* nbr_par, int32_t* tile_nbr,
             int32_t* level_slots);
}

namespace frif {

using frgeo::V2;

constexpr int kDepth = 9;  // BASE_FRAC_DEPTH
constexpr int kAlphabet = 1024;
constexpr int kContexts = 15;      // CONTEXT_AMOUNT
constexpr int kMinBits = 8;        // MIN_FREQ_BITS
constexpr int kMaxBits = 14;       // MAX_FREQ_BITS_CAP
constexpr int kEncBitsCap = 12;    // ENC_FREQ_BITS_CAP
constexpr int kNumBits = kMaxBits - kMinBits + 1;
constexpr int kNumScales = 48;     // NUM_SCALES (15 legacy + 33 extra)
constexpr int32_t kPredClamp = 255;
constexpr uint32_t kRansL = 1u << 16;
constexpr uint16_t kMarkerPRD = 0xFFBB, kMarkerEHD = 0xFFB2,
                   kMarkerSTT = 0xFFB5, kMarkerSDT = 0xFFB6,
                   kMarkerEOC = 0xFFB8, kMarkerEOI = 0xFFDF;

static const float kBucketEdges[kContexts - 1] = {
    0.25f, 0.6f, 1.4f, 2.2f, 3.0f, 5.0f, 6.0f, 8.0f,
    12.0f, 16.0f, 20.0f, 25.0f, 30.0f, 42.0f};

// (exp(-1/width), 1/(2*width)) hex-f64 constants — tables.py:67-142
// rows 0..14 legacy per-bucket widths, rows 15..47 the v9 extra scales.
static const char* kGridConstants[kNumScales][2] = {
    {"0x1.7cd79b5647c9bp-15", "0x1.4000000000000p+2"},
    {"0x1.50385c094f425p-4", "0x1.4000000000000p+0"},
    {"0x1.78b56362cef38p-2", "0x1.0000000000000p-1"},
    {"0x1.25c3022412203p-1", "0x1.1c71c71c71c72p-2"},
    {"0x1.57343067270eep-1", "0x1.999999999999ap-3"},
    {"0x1.99fa40bc6c5f7p-1", "0x1.c71c71c71c71cp-4"},
    {"0x1.b4da1cb5e42a6p-1", "0x1.4514514514514p-4"},
    {"0x1.c72c49b875881p-1", "0x1.e1e1e1e1e1e1ep-5"},
    {"0x1.d93b3c706d012p-1", "0x1.42850a142850ap-5"},
    {"0x1.e0fabfbc702a4p-1", "0x1.0000000000000p-5"},
    {"0x1.e7078b0a726a6p-1", "0x1.999999999999ap-6"},
    {"0x1.eb1ae169e74aep-1", "0x1.5555555555555p-6"},
    {"0x1.ee097670efc30p-1", "0x1.2492492492492p-6"},
    {"0x1.f1f936ca50d7dp-1", "0x1.c71c71c71c71cp-7"},
    {"0x1.f5dc99badec5bp-1", "0x1.47ae147ae147bp-7"},
    {"0x1.1b48655f37267p-29", "0x1.4000000000000p+3"},
    {"0x1.b993fe00d5376p-8", "0x1.4000000000000p+1"},
    {"0x1.243dc957d03eep-5", "0x1.aaaaaaaaaaaabp+0"},
    {"0x1.4c6ebfa3f1315p-3", "0x1.d1745d1745d17p-1"},
    {"0x1.eace299fc26b5p-3", "0x1.6db6db6db6db7p-1"},
    {"0x1.3bc4141d5d8f2p-2", "0x1.2d2d2d2d2d2d3p-1"},
    {"0x1.bd075011c09aap-2", "0x1.aaaaaaaaaaaabp-2"},
    {"0x1.f54a68a74e851p-2", "0x1.6db6db6db6db7p-2"},
    {"0x1.3e06bcf40de3fp-1", "0x1.e79e79e79e79ep-3"},
    {"0x1.6edd3122f2ea5p-1", "0x1.5555555555555p-3"},
    {"0x1.83d27824a69c6p-1", "0x1.1c71c71c71c72p-3"},
    {"0x1.a972545a72f16p-1", "0x1.7b425ed097b42p-4"},
    {"0x1.be7472766119fp-1", "0x1.188c46231188cp-4"},
    {"0x1.ce550ef321f26p-1", "0x1.a1f58d0fac687p-5"},
    {"0x1.d381efe4c5e23p-1", "0x1.745d1745d1746p-5"},
    {"0x1.dcb442bab408ep-1", "0x1.2492492492492p-5"},
    {"0x1.e454ccac9798ap-1", "0x1.c71c71c71c71cp-6"},
    {"0x1.e93f8eec13d61p-1", "0x1.745d1745d1746p-6"},
    {"0x1.ecae7c244eed7p-1", "0x1.3b13b13b13b14p-6"},
    {"0x1.efbf56d4eef6cp-1", "0x1.0842108421084p-6"},
    {"0x1.f3f418cf485e5p-1", "0x1.8618618618618p-7"},
    {"0x1.f73f820d7ff4dp-1", "0x1.1a7b9611a7b96p-7"},
    {"0x1.f886930a6b94bp-1", "0x1.e1e1e1e1e1e1ep-8"},
    {"0x1.f9a3cc26c0f05p-1", "0x1.999999999999ap-8"},
    {"0x1.faa387eb19635p-1", "0x1.58ed2308158edp-8"},
    {"0x1.fb5dd6105171fp-1", "0x1.29e4129e4129ep-8"},
    {"0x1.fc139f2dbf8c3p-1", "0x1.f81f81f81f820p-9"},
    {"0x1.fcb5189e10c9dp-1", "0x1.a6d01a6d01a6dp-9"},
    {"0x1.fd3d6a036c375p-1", "0x1.623fa77016240p-9"},
    {"0x1.fdad91f774fcep-1", "0x1.29e4129e4129ep-9"},
    {"0x1.fe08d85bac4d0p-1", "0x1.f81f81f81f820p-10"},
    {"0x1.fe59de4a3e7a5p-1", "0x1.a6d01a6d01a6dp-10"},
    {"0x1.fe9e3ac957f18p-1", "0x1.623fa77016240p-10"},
};

// ---- Laplace grid rows [kNumScales][kNumBits][1024] u32 --------------
// trunc(r^|x| * s * 2^bits); r^|x| by square-and-multiply with
// ascending-bit multiply order — bit-identical to tables.py
// _laplace_rows_all on any IEEE platform.
struct LaplaceGrid {
  std::vector<uint32_t> rows;  // [g][bi][j]
  LaplaceGrid() {
    rows.assign((size_t)kNumScales * kNumBits * kAlphabet, 0);
    for (int g = 0; g < kNumScales; ++g) {
      double r = std::strtod(kGridConstants[g][0], nullptr);
      double s = std::strtod(kGridConstants[g][1], nullptr);
      for (int j = 0; j < kAlphabet; ++j) {
        int64_t e = (j + 1) / 2;  // |unpack_signed(j)|
        double acc = 1.0, base = r;
        for (int it = 0; it < 10; ++it) {
          if (e & 1) acc = acc * base;
          base = base * base;
          e >>= 1;
        }
        for (int bi = 0; bi < kNumBits; ++bi) {
          double scale = (double)(int64_t(1) << (kMinBits + bi));
          rows[((size_t)g * kNumBits + bi) * kAlphabet + j] =
              (uint32_t)(acc * s * scale);  // trunc, value >= 0
        }
      }
    }
  }
  const uint32_t* row(int g, int bits) const {
    return &rows[((size_t)g * kNumBits + (bits - kMinBits)) * kAlphabet];
  }
};
static const LaplaceGrid& grid() {
  static LaplaceGrid g;
  return g;
}

// ---- table finalization (tables.py finalize_context) -----------------
struct Ctx {
  int bits = kMinBits;
  int scale = 0;
  uint32_t freqs[kAlphabet];
  uint32_t cdf[kAlphabet];
  std::vector<uint16_t> off;
};

// largest-remainder normalization, first-index argmax fixup
// (tables.py:266-293)
static bool normalize_freqs(const int64_t* filled, int64_t target, Ctx* out) {
  int64_t total = 0;
  for (int j = 0; j < kAlphabet; ++j) total += filled[j];
  if (total == 0) return false;
  int64_t s[kAlphabet];
  int64_t ssum = 0;
  for (int j = 0; j < kAlphabet; ++j) {
    int64_t sc = filled[j] * target / total;  // nonneg -> trunc == floor
    s[j] = filled[j] > 0 ? (sc > 1 ? sc : 1) : 0;
    ssum += s[j];
  }
  int64_t diff = target - ssum;
  if (diff > 0) {
    int jm = 0;
    for (int j = 1; j < kAlphabet; ++j)
      if (s[j] > s[jm]) jm = j;  // FIRST max (np.argmax)
    s[jm] += diff;
  } else {
    while (diff < 0) {
      int jm = 0;
      for (int j = 1; j < kAlphabet; ++j)
        if (s[j] > s[jm]) jm = j;
      int64_t take = -diff < s[jm] - 1 ? -diff : s[jm] - 1;
      if (take <= 0) return false;
      s[jm] -= take;
      diff += take;
    }
  }
  uint32_t c = 0;
  for (int j = 0; j < kAlphabet; ++j) {
    out->freqs[j] = (uint32_t)s[j];
    out->cdf[j] = c;
    c += (uint32_t)s[j];
  }
  return true;
}

// hist may be null (decode side: all zeros). off_mask [1024].
static bool finalize_context(const uint32_t* hist, int bucket, int bits_in,
                             const bool* off_mask_in, int scale_idx,
                             Ctx* out) {
  int bits = bits_in < kMinBits ? kMinBits
                                : (bits_in > kMaxBits ? kMaxBits : bits_in);
  int scale = scale_idx < 0 ? bucket : scale_idx;
  if (scale >= kNumScales) return false;
  bool offm[kAlphabet] = {false};
  if (off_mask_in) std::memcpy(offm, off_mask_in, kAlphabet);
  int64_t filled[kAlphabet];
  bool off_out[kAlphabet];
  for (;;) {
    const uint32_t* lap = grid().row(scale, bits);
    int nnz = 0;
    for (int j = 0; j < kAlphabet; ++j) {
      bool data = hist != nullptr && hist[j] > 0;
      bool forced = lap[j] == 0 && (data || offm[j]);
      filled[j] = forced ? 1 : (int64_t)lap[j];
      off_out[j] = offm[j] || (lap[j] == 0 && data);
      nnz += filled[j] > 0;
    }
    if ((int64_t(1) << bits) >= nnz || bits >= kMaxBits) break;
    ++bits;
  }
  out->bits = bits;
  out->scale = scale;
  if (!normalize_freqs(filled, int64_t(1) << bits, out)) return false;
  out->off.clear();
  for (int j = 0; j < kAlphabet; ++j)
    if (off_out[j]) out->off.push_back((uint16_t)j);
  return true;
}

// tables.py select_scale (encode-only — any index is a valid choice,
// but mirror the rule so C containers look like Python ones)
static int select_scale(const uint32_t* hist, int bits) {
  int b = bits < kMinBits ? kMinBits : (bits > kMaxBits ? kMaxBits : bits);
  double best = -1e300;
  int best_g = 0;
  for (int g = 0; g < kNumScales; ++g) {
    const uint32_t* row = grid().row(g, b);
    double gain = 0.0;
    for (int j = 0; j < kAlphabet; ++j) {
      if (hist[j] == 0) continue;
      double rv = row[j] > 0 ? (double)row[j] : 1.0;
      gain += (double)hist[j] * (std::log2(rv));
      if (row[j] == 0) gain -= 16.0;
    }
    if (gain > best) {
      best = gain;
      best_g = g;
    }
  }
  return best_g;
}

// ---- IEEE half conversions ------------------------------------------
static inline float f16_to_f32(uint16_t h) {
  uint32_t sign = (uint32_t)(h & 0x8000) << 16;
  uint32_t exp = (h >> 10) & 0x1f;
  uint32_t man = h & 0x3ff;
  uint32_t bits;
  if (exp == 0) {
    if (man == 0) {
      bits = sign;
    } else {
      // subnormal: normalize
      int shift = 0;
      while (!(man & 0x400)) {
        man <<= 1;
        ++shift;
      }
      man &= 0x3ff;
      bits = sign | ((127 - 15 - shift + 1) << 23) | (man << 13);
    }
  } else if (exp == 31) {
    bits = sign | 0x7f800000 | (man << 13);
  } else {
    bits = sign | ((exp + 127 - 15) << 23) | (man << 13);
  }
  float f;
  std::memcpy(&f, &bits, 4);
  return f;
}

static inline uint16_t f32_to_f16(float f) {
  uint32_t bits;
  std::memcpy(&bits, &f, 4);
  uint32_t sign = (bits >> 16) & 0x8000;
  uint32_t absb = bits & 0x7fffffff;
  if (absb >= 0x7f800000)  // inf / NaN
    return (uint16_t)(sign | 0x7c00 | ((bits & 0x7fffff) ? 0x200 : 0));
  if (absb >= 0x47800000) return (uint16_t)(sign | 0x7c00);  // overflow
  if (absb < 0x38800000) {
    // subnormal half: RNE onto the 2^-24 grid
    if (absb < 0x33000000) return (uint16_t)sign;  // < 2^-25 -> 0
    int e = absb >> 23;
    uint32_t man = (absb & 0x7fffff) | 0x800000;
    int shift = 126 - e;  // in [2, 24] here
    uint32_t half = 1u << (shift - 1);
    uint32_t q = (man + half - 1 + ((man >> shift) & 1)) >> shift;
    return (uint16_t)(sign | q);
  }
  uint32_t lsb = (absb >> 13) & 1;
  uint32_t rounded = absb + 0xfff + lsb;
  return (uint16_t)(sign | ((rounded - 0x38000000) >> 13));
}

static inline float f16_round(float f) {
  if (std::isnan(f)) return f;
  return f16_to_f32(f32_to_f16(f));
}

// ---- lattice machinery (lattice.py:52-111, exact port) ---------------
static inline int64_t floordiv(int64_t a, int64_t b) {
  int64_t q = a / b, r = a % b;
  return (r != 0 && ((r < 0) != (b < 0))) ? q - 1 : q;
}

struct B2 {
  int64_t v1[2], v2[2];
};

static void lagrange_reduce(int64_t v1[2], int64_t v2[2]) {
  auto dot = [](const int64_t a[2], const int64_t b[2]) {
    return a[0] * b[0] + a[1] * b[1];
  };
  if (dot(v1, v1) > dot(v2, v2)) {
    std::swap(v1[0], v2[0]);
    std::swap(v1[1], v2[1]);
  }
  for (;;) {
    int64_t m = floordiv(2 * dot(v2, v1) + dot(v1, v1), 2 * dot(v1, v1));
    v2[0] -= m * v1[0];
    v2[1] -= m * v1[1];
    if (dot(v1, v1) <= dot(v2, v2)) return;
    std::swap(v1[0], v2[0]);
    std::swap(v1[1], v2[1]);
  }
}

// lattice.py _lattice_basis: HNF Euclid down column 0, then Lagrange.
// rows evolve exactly like the numpy version (order-sensitive).
struct Row2 {
  int64_t a, b;
};

static bool lattice_basis(const std::vector<Row2>& vs_in, B2* out) {
  std::vector<Row2> rows;
  for (const Row2& r : vs_in)
    if (r.a != 0 || r.b != 0) rows.push_back(r);
  if (rows.empty()) return false;
  for (;;) {
    // nz = rows with col0 != 0
    int nnz = 0;
    for (const Row2& r : rows) nnz += r.a != 0;
    if (nnz <= 1) break;
    // pivot = nz row with min |col0| (first such)
    Row2 pivot{0, 0};
    int64_t best = INT64_MAX;
    for (const Row2& r : rows) {
      if (r.a != 0 && std::llabs(r.a) < best) {
        best = std::llabs(r.a);
        pivot = r;
      }
    }
    // rows[mask] -= q * pivot (q = floor division)
    for (Row2& r : rows) {
      if (r.a != 0) {
        int64_t q = floordiv(r.a, pivot.a);
        r.a -= q * pivot.a;
        r.b -= q * pivot.b;
      }
    }
    rows.push_back(pivot);
    // drop all-zero rows, order preserved
    std::vector<Row2> keep;
    keep.reserve(rows.size());
    for (const Row2& r : rows)
      if (r.a != 0 || r.b != 0) keep.push_back(r);
    rows.swap(keep);
  }
  Row2 u{0, 0};
  bool got_u = false;
  int64_t g = 0;
  for (const Row2& r : rows) {
    if (r.a != 0 && !got_u) {
      u = r;
      got_u = true;
    }
    if (r.a == 0 && r.b != 0) {
      int64_t ab = std::llabs(r.b);
      g = g == 0 ? ab : [](int64_t x, int64_t y) {
        while (y) {
          int64_t t = x % y;
          x = y;
          y = t;
        }
        return x;
      }(g, ab);
    }
  }
  if (!got_u || g == 0) return false;
  int64_t v1[2] = {u.a, u.b};
  int64_t v2[2] = {0, g};
  lagrange_reduce(v1, v2);
  out->v1[0] = v1[0];
  out->v1[1] = v1[1];
  out->v2[0] = v2[0];
  out->v2[1] = v2[1];
  return true;
}

// basis columns (v1, v2): pos = origin + a*v1 + b*v2
struct Lattice {
  B2 basis;
  int64_t det;
  V2 origin;
  int64_t A, B;  // grid shape
  bool solve(V2 p, int64_t* a, int64_t* b) const {
    // rel = p - origin; [a, b] = inv(basis) * rel * det / det
    int64_t rx = p.x - origin.x, ry = p.y - origin.y;
    int64_t an = rx * basis.v2[1] - ry * basis.v2[0];
    int64_t bn = -rx * basis.v1[1] + ry * basis.v1[0];
    if (an % det != 0 || bn % det != 0) return false;
    *a = an / det;
    *b = bn / det;
    return true;
  }
};

// Build the lattice for a node-position list (sample order = input
// order, exactly lattice.py build_lattice_grids' basis derivation).
static bool build_lattice(const std::vector<V2>& pos, int scale,
                          Lattice* out) {
  if (pos.empty()) return false;
  std::vector<V2> lit = frgeo::literals(30);
  V2 vecs[6];
  frgeo::nearby_vectors(scale, lit, vecs);
  std::vector<Row2> gen;
  size_t ns = pos.size() < 4096 ? pos.size() : 4096;
  gen.reserve(ns + 6);
  for (size_t i = 0; i < ns; ++i)
    gen.push_back({pos[i].x - pos[0].x, pos[i].y - pos[0].y});
  for (int k = 0; k < 6; ++k) gen.push_back({vecs[k].x, vecs[k].y});
  B2 basis;
  if (!lattice_basis(gen, &basis)) return false;
  // basis matrix columns v1 v2 (as in lattice.py: basis = stack([b1, b2],
  // axis=1), i.e. column 0 = b1 = (x, y) of v1). Here rows are (x, y):
  // pos - origin = a * v1 + b * v2 with v1 = (v1[0], v1[1]).
  out->basis = basis;
  out->det = basis.v1[0] * basis.v2[1] - basis.v1[1] * basis.v2[0];
  if (out->det == 0) return false;
  out->origin = pos[0];
  int64_t amin = INT64_MAX, amax = INT64_MIN, bmin = INT64_MAX,
          bmax = INT64_MIN;
  for (const V2& p : pos) {
    int64_t a, b;
    if (!out->solve(p, &a, &b)) return false;
    amin = std::min(amin, a);
    amax = std::max(amax, a);
    bmin = std::min(bmin, b);
    bmax = std::max(bmax, b);
  }
  // shift origin so coords start at (0, 0)
  out->origin.x += basis.v1[0] * amin + basis.v2[0] * bmin;
  out->origin.y += basis.v1[1] * amin + basis.v2[1] * bmin;
  out->A = amax - amin + 1;
  out->B = bmax - bmin + 1;
  return true;
}

// ---- geometry bundle (via the shared fg_* builders) ------------------
struct Geometry {
  int h = 0, w = 0;
  int64_t T = 0;
  int n = 1 << kDepth;
  std::vector<int32_t> centers, pixel_gather, nbr_par, tile_nbr, level_slots;
  std::vector<uint8_t> coef_mask;

  bool build(int height, int width) {
    h = height;
    w = width;
    T = fg_num_tiles(h, w, kDepth);
    if (T <= 0) return false;
    centers.resize(T * 2);
    pixel_gather.resize(T * (int64_t)n);
    coef_mask.resize(T * (int64_t)n);
    nbr_par.resize(T * (int64_t)n * 6);
    tile_nbr.resize(T * 6);
    level_slots.resize(T * (int64_t)n);
    std::vector<int32_t> nbr_idx(T * (int64_t)n * 6);
    return fg_build(h, w, kDepth, T, centers.data(), pixel_gather.data(),
                    coef_mask.data(), nbr_idx.data(), nbr_par.data(),
                    tile_nbr.data(), level_slots.data()) == 0;
  }
};

// ---- grid-mode schedule (schedule.py _build_schedule_grid) -----------
struct Schedule {
  int64_t K = 0;
  std::vector<int32_t> coef;   // [K]
  std::vector<int32_t> nbr;    // [K * 6]
  std::vector<int8_t> group;   // [K] fine group == wave index
  std::vector<int8_t> fbkt;    // [K] fixed bucket or -1
  std::vector<int64_t> wave_sizes;
  int num_fine = 0;
  std::vector<int8_t> legacy_of_fine;
};

// mode="parallel" schedule (schedule.py build_schedule, parallel
// branch): DC phase A = even canonical tile indices (context-free,
// widest bucket), phase B = odd tiles with A-parity neighbour taps,
// root-HF over all tiles, then HF levels 1..depth-1 in canonical
// (level_slots) order with nbr_par taps. No lattice machinery needed.
static bool build_parallel_schedule(const Geometry& g, Schedule* out) {
  const int n = g.n;
  out->coef.clear();
  out->nbr.clear();
  out->group.clear();
  out->fbkt.clear();
  out->wave_sizes.clear();
  out->legacy_of_fine.clear();

  auto push_wave = [&](const std::vector<int32_t>& slots,
                       const std::vector<int32_t>& taps, int8_t fb,
                       int8_t legacy) {
    int fid = (int)out->legacy_of_fine.size();
    out->legacy_of_fine.push_back(legacy);
    for (size_t i = 0; i < slots.size(); ++i) {
      out->coef.push_back(slots[i]);
      for (int k = 0; k < 6; ++k) out->nbr.push_back(taps[i * 6 + k]);
      out->group.push_back((int8_t)fid);
      out->fbkt.push_back(fb);
    }
    out->wave_sizes.push_back((int64_t)slots.size());
  };

  std::vector<int32_t> slots, taps;
  // wave 0: phase A (even tiles, context-free)
  for (int64_t t = 0; t < g.T; t += 2) {
    slots.push_back((int32_t)(t * n));
    for (int k = 0; k < 6; ++k) taps.push_back(-1);
  }
  push_wave(slots, taps, (int8_t)(kContexts - 1), 2);

  // wave 1: phase B (odd tiles, taps = even-neighbour DCs)
  slots.clear();
  taps.clear();
  for (int64_t t = 1; t < g.T; t += 2) {
    slots.push_back((int32_t)(t * n));
    for (int k = 0; k < 6; ++k) {
      int32_t u = g.tile_nbr[t * 6 + k];
      taps.push_back((u >= 0 && u % 2 == 0) ? (int32_t)((int64_t)u * n)
                                            : -1);
    }
  }
  push_wave(slots, taps, -1, 2);

  // wave 2: root-HF, all tiles
  slots.clear();
  taps.clear();
  for (int64_t t = 0; t < g.T; ++t) {
    slots.push_back((int32_t)(t * n + 1));
    for (int k = 0; k < 6; ++k) {
      int32_t u = g.tile_nbr[t * 6 + k];
      taps.push_back(u >= 0 ? (int32_t)((int64_t)u * n) : -1);
    }
  }
  push_wave(slots, taps, -1, 2);

  // HF levels in canonical order (level_slots layout: T entries for
  // level 0, then T * 2^L per level)
  int64_t off = g.T;
  for (int L = 1; L < kDepth; ++L) {
    int64_t cnt = g.T << L;
    slots.clear();
    taps.clear();
    for (int64_t i = 0; i < cnt; ++i) {
      int32_t slot = g.level_slots[off + i];
      if (!g.coef_mask[slot]) continue;
      slots.push_back(slot);
      for (int k = 0; k < 6; ++k)
        taps.push_back(g.nbr_par[(int64_t)slot * 6 + k]);
    }
    int8_t legacy = L == kDepth - 1 ? 0 : (L == kDepth - 2 ? 1 : 2);
    push_wave(slots, taps, -1, legacy);
    off += cnt;
  }
  out->num_fine = (int)out->legacy_of_fine.size();
  out->K = (int64_t)out->coef.size();
  return true;
}

static bool build_grid_schedule(const Geometry& g, Schedule* out) {
  const int n = g.n;
  std::vector<V2> lit = frgeo::literals(30);
  std::vector<V2> off = frgeo::tree_offsets_all(kDepth, lit);
  out->coef.clear();
  out->nbr.clear();
  out->group.clear();
  out->fbkt.clear();
  out->wave_sizes.clear();
  out->legacy_of_fine.clear();

  auto push_wave = [&](const std::vector<int32_t>& slots,
                       const std::vector<int32_t>& taps, int8_t fb,
                       int8_t legacy) {
    int fid = (int)out->legacy_of_fine.size();
    out->legacy_of_fine.push_back(legacy);
    for (size_t i = 0; i < slots.size(); ++i) {
      out->coef.push_back(slots[i]);
      for (int k = 0; k < 6; ++k) out->nbr.push_back(taps[i * 6 + k]);
      out->group.push_back((int8_t)fid);
      out->fbkt.push_back(fb);
    }
    out->wave_sizes.push_back((int64_t)slots.size());
  };

  // ---- tile lattice: raster order + parity
  std::vector<V2> tpos(g.T);
  for (int64_t t = 0; t < g.T; ++t)
    tpos[t] = {g.centers[2 * t], g.centers[2 * t + 1]};
  Lattice tl;
  if (!build_lattice(tpos, kDepth, &tl)) return false;
  // raster rank of every tile + parity
  std::vector<int64_t> cell(g.T);
  std::vector<uint8_t> par(g.T);
  std::vector<int64_t> order(g.T);
  for (int64_t t = 0; t < g.T; ++t) {
    int64_t a, b;
    if (!tl.solve(tpos[t], &a, &b)) return false;
    cell[t] = a * tl.B + b;
    par[t] = (uint8_t)(((a + b) % 2) == 0);
    order[t] = t;
  }
  std::sort(order.begin(), order.end(),
            [&](int64_t x, int64_t y) { return cell[x] < cell[y]; });

  // wave 0: phase A (context-free, widest bucket)
  std::vector<int32_t> slots, taps;
  for (int64_t i = 0; i < g.T; ++i) {
    int64_t t = order[i];
    if (!par[t]) continue;
    slots.push_back((int32_t)(t * n));
    for (int k = 0; k < 6; ++k) taps.push_back(-1);
  }
  push_wave(slots, taps, (int8_t)(kContexts - 1), 2);

  // wave 1: phase B — taps = A-parity neighbour DCs
  slots.clear();
  taps.clear();
  for (int64_t i = 0; i < g.T; ++i) {
    int64_t t = order[i];
    if (par[t]) continue;
    slots.push_back((int32_t)(t * n));
    for (int k = 0; k < 6; ++k) {
      int32_t u = g.tile_nbr[t * 6 + k];
      taps.push_back((u >= 0 && par[u]) ? (int32_t)((int64_t)u * n) : -1);
    }
  }
  push_wave(slots, taps, -1, 2);

  // wave 2: root-HF — all tiles, taps = neighbour DCs
  slots.clear();
  taps.clear();
  for (int64_t i = 0; i < g.T; ++i) {
    int64_t t = order[i];
    slots.push_back((int32_t)(t * n + 1));
    for (int k = 0; k < 6; ++k) {
      int32_t u = g.tile_nbr[t * 6 + k];
      taps.push_back(u >= 0 ? (int32_t)((int64_t)u * n) : -1);
    }
  }
  push_wave(slots, taps, -1, 2);

  // HF levels 1..depth-1: raster order of the level lattice
  for (int L = 1; L < kDepth; ++L) {
    int64_t lo = int64_t(1) << L, hi = int64_t(1) << (L + 1);
    std::vector<V2> pos;
    std::vector<int32_t> lslots;
    pos.reserve(g.T * (hi - lo));
    lslots.reserve(g.T * (hi - lo));
    for (int64_t t = 0; t < g.T; ++t) {
      V2 c{g.centers[2 * t], g.centers[2 * t + 1]};
      for (int64_t q = lo; q < hi; ++q) {
        pos.push_back(c + off[q]);
        lslots.push_back((int32_t)(t * n + q));
      }
    }
    Lattice ll;
    if (!build_lattice(pos, kDepth - L, &ll)) return false;
    std::vector<int64_t> lc(pos.size()), lorder(pos.size());
    for (size_t i = 0; i < pos.size(); ++i) {
      int64_t a, b;
      if (!ll.solve(pos[i], &a, &b)) return false;
      lc[i] = a * ll.B + b;
      lorder[i] = (int64_t)i;
    }
    std::sort(lorder.begin(), lorder.end(),
              [&](int64_t x, int64_t y) { return lc[x] < lc[y]; });
    // collision check (distinct cells)
    for (size_t i = 1; i < lorder.size(); ++i)
      if (lc[lorder[i]] == lc[lorder[i - 1]]) return false;
    slots.clear();
    taps.clear();
    for (size_t i = 0; i < lorder.size(); ++i) {
      int32_t slot = lslots[lorder[i]];
      if (!g.coef_mask[slot]) continue;  // present filter
      slots.push_back(slot);
      for (int k = 0; k < 6; ++k)
        taps.push_back(g.nbr_par[(int64_t)slot * 6 + k]);
    }
    int8_t legacy = L == kDepth - 1 ? 0 : (L == kDepth - 2 ? 1 : 2);
    push_wave(slots, taps, -1, legacy);
  }
  out->num_fine = (int)out->legacy_of_fine.size();
  out->K = (int64_t)out->coef.size();
  return true;
}

// ---- context math (exact f32, jax_ops.contexts_static twin) ----------
static inline int assign_bucket(float w) {
  if (std::isnan(w) || w < 0.0f) w = 0.0f;
  int b = 0;
  for (int e = 0; e < kContexts - 1; ++e) b += w >= kBucketEdges[e];
  return b;
}

static inline void context_of(const int32_t* nbr6, const int32_t* coef,
                              const float* vp, const float* wp, int8_t fb,
                              int* bucket, int32_t* pred) {
  float f[6];
  for (int k = 0; k < 6; ++k)
    f[k] = (float)(nbr6[k] >= 0 ? coef[nbr6[k]] : 0);
  float g1 = std::fabs(f[0] - f[3]);
  float g2 = std::fabs(f[1] - f[2]);
  float g3 = std::fabs(f[4] - f[5]);
  float g4 = std::fabs(f[1] - f[5]);
  float g5 = std::fabs(f[2] - f[4]);
  float width = wp[0] + wp[1] * g1 + wp[2] * g2 + wp[3] * g3 + wp[4] * g4 +
                wp[5] * g5;
  if (g1 + g2 + g3 + g4 + g5 == 0.0f) width = 0.0f;  // flat-context rule
  int bk = assign_bucket(width);
  float p = f[0] * vp[0] + f[1] * vp[1] + f[2] * vp[2] + f[3] * vp[3] +
            f[4] * vp[4] + f[5] * vp[5];
  if (std::isnan(p)) p = 0.0f;
  if (p > 1e9f) p = 1e9f;
  if (p < -1e9f) p = -1e9f;
  int32_t ip = (int32_t)p;  // trunc toward zero
  if (ip > kPredClamp) ip = kPredClamp;
  if (ip < -kPredClamp) ip = -kPredClamp;
  *bucket = fb >= 0 ? fb : bk;
  *pred = ip;
}

// ---- lifting + quantization (refbase semantics == frave_tpu) ---------
static inline int32_t trunc_div(int32_t a, int32_t q) {
  return a / q;  // C truncates toward zero
}

static void forward_lift_quant(const Geometry& g, const int32_t* pix,
                               const int32_t* qdiv, int32_t* coef) {
  const int n = g.n;
  std::vector<int32_t> vals(n), low(n / 2);
  std::vector<uint8_t> vm(n), lm(n / 2);
  for (int64_t t = 0; t < g.T; ++t) {
    const int32_t* P = &g.pixel_gather[t * (int64_t)n];
    int32_t* C = &coef[t * (int64_t)n];
    for (int j = 0; j < n; ++j) {
      vm[j] = P[j] >= 0;
      vals[j] = vm[j] ? pix[P[j]] : 0;
    }
    for (int level = kDepth - 1; level >= 0; --level) {
      int lo = 1 << level;
      for (int p = 0; p < lo; ++p) {
        int32_t L = vals[2 * p], R = vals[2 * p + 1];
        uint8_t Lm = vm[2 * p], Rm = vm[2 * p + 1];
        int32_t l0 = Lm ? L : 0, r0 = Rm ? R : 0;
        int32_t c = (Lm && Rm) ? l0 - r0 : 0;
        low[p] = (Lm && Rm) ? r0 + trunc_div(c, 2) : l0 + r0;
        lm[p] = Lm | Rm;
        C[lo + p] = c;
      }
      std::memcpy(vals.data(), low.data(), lo * sizeof(int32_t));
      std::memcpy(vm.data(), lm.data(), lo);
    }
    C[0] = vm[0] ? vals[0] : 0;
    for (int j = 0; j < n; ++j) C[j] = trunc_div(C[j], qdiv[j]);
  }
}

static void dequant_inverse_lift(const Geometry& g, const int32_t* qcoef,
                                 const int32_t* qdiv, int32_t* pix) {
  const int n = g.n;
  std::vector<int32_t> C(n), vals(n), nxt(n);
  for (int64_t t = 0; t < g.T; ++t) {
    const int32_t* Q = &qcoef[t * (int64_t)n];
    const uint8_t* M = &g.coef_mask[t * (int64_t)n];
    const int32_t* P = &g.pixel_gather[t * (int64_t)n];
    for (int j = 0; j < n; ++j) {
      int32_t q = qdiv[j], c = Q[j];
      int32_t sgn = c > 0 ? 1 : (c < 0 ? -1 : 0);
      C[j] = c * q + sgn * ((q - 1) / 2);  // midpoint-bias dequantize
    }
    vals[0] = C[0];
    for (int level = 0; level < kDepth; ++level) {
      int lo = 1 << level;
      bool leaf = level == kDepth - 1;
      for (int p = 0; p < lo; ++p) {
        uint8_t Lm, Rm;
        if (leaf) {
          Lm = P[2 * p] >= 0;
          Rm = P[2 * p + 1] >= 0;
        } else {
          Lm = M[2 * (lo + p)];
          Rm = M[2 * (lo + p) + 1];
        }
        int32_t c = C[lo + p], v = vals[p];
        if (Lm && Rm) {
          int32_t R = v - trunc_div(c, 2);
          nxt[2 * p] = c + R;
          nxt[2 * p + 1] = R;
        } else {
          nxt[2 * p] = v;
          nxt[2 * p + 1] = v;
        }
      }
      std::memcpy(vals.data(), nxt.data(), 2 * lo * sizeof(int32_t));
    }
    for (int j = 0; j < n; ++j)
      if (P[j] >= 0) {
        int32_t v = vals[j];
        pix[P[j]] = v < 0 ? 0 : (v > 255 ? 255 : v);
      }
  }
}

// ---- channel transforms (channel_transform.py, mod-256 integer) ------
static inline int32_t sgn8(int32_t x) { return ((x + 128) & 255) - 128; }

static void transform_fwd(int tid, int64_t hw, const uint8_t* px,
                          int32_t* planes /* [3][hw] */) {
  for (int64_t i = 0; i < hw; ++i) {
    int32_t r = px[i * 3], gg = px[i * 3 + 1], b = px[i * 3 + 2];
    int32_t o0 = r, o1 = gg, o2 = b;
    if (tid == 1) {
      o0 = (r - gg) & 255;
      o2 = (b - gg) & 255;
    } else if (tid == 2) {
      o0 = r - gg + 128;
      o0 = o0 < 0 ? 0 : (o0 > 255 ? 255 : o0);
      o2 = b - gg + 128;
      o2 = o2 < 0 ? 0 : (o2 > 255 ? 255 : o2);
    } else if (tid == 3) {
      int32_t co = (r - b) & 255;
      int32_t t = (b + (sgn8(co) >> 1)) & 255;
      int32_t cg = (gg - t) & 255;
      int32_t y = (t + (sgn8(cg) >> 1)) & 255;
      o0 = y;
      o1 = co;
      o2 = cg;
    }
    planes[i] = o0;
    planes[hw + i] = o1;
    planes[2 * hw + i] = o2;
  }
}

static void transform_inv(int tid, int64_t hw, const int32_t* planes,
                          uint8_t* px) {
  for (int64_t i = 0; i < hw; ++i) {
    int32_t a = planes[i], gg = planes[hw + i], c = planes[2 * hw + i];
    int32_t r = a, g2 = gg, b = c;
    if (tid == 1) {
      r = (a + gg) & 255;
      b = (c + gg) & 255;
    } else if (tid == 2) {
      r = a + gg - 128;
      r = r < 0 ? 0 : (r > 255 ? 255 : r);
      b = c + gg - 128;
      b = b < 0 ? 0 : (b > 255 ? 255 : b);
    } else if (tid == 3) {
      int32_t t = (a - (sgn8(c) >> 1)) & 255;  // y co cg = a gg c
      g2 = (c + t) & 255;
      b = (t - (sgn8(gg) >> 1)) & 255;
      r = (gg + b) & 255;
    }
    px[i * 3] = (uint8_t)r;
    px[i * 3 + 1] = (uint8_t)g2;
    px[i * 3 + 2] = (uint8_t)b;
  }
}

// ---- blob IO helpers -------------------------------------------------
struct Writer {
  std::vector<uint8_t> b;
  void u8(uint8_t v) { b.push_back(v); }
  void u16(uint16_t v) {
    b.push_back(v & 0xff);
    b.push_back(v >> 8);
  }
  void u32(uint32_t v) {
    u16((uint16_t)(v & 0xffff));
    u16((uint16_t)(v >> 16));
  }
};

struct Reader {
  const uint8_t* p;
  const uint8_t* end;
  bool ok = true;
  bool need(size_t n) {
    if ((size_t)(end - p) < n) {
      ok = false;
      return false;
    }
    return true;
  }
  uint8_t u8() {
    if (!need(1)) return 0;
    return *p++;
  }
  uint16_t u16() {
    if (!need(2)) return 0;
    uint16_t v = (uint16_t)(p[0] | (p[1] << 8));
    p += 2;
    return v;
  }
  uint32_t u32() {
    if (!need(4)) return 0;
    uint32_t v = p[0] | (p[1] << 8) | ((uint32_t)p[2] << 16) |
                 ((uint32_t)p[3] << 24);
    p += 4;
    return v;
  }
};

// ---- schedule cache (geometry + schedule per (h, w, mode)) -----------
struct Cached {
  int h = -1, w = -1, mode = -1;
  Geometry g;
  Schedule s;
};
static Cached g_cache;

static bool get_geo_sched(int h, int w, int mode, const Geometry** g,
                          const Schedule** s) {
  if (g_cache.h != h || g_cache.w != w || g_cache.mode != mode) {
    Cached c;
    if (!c.g.build(h, w)) return false;
    bool ok = mode == 2 ? build_grid_schedule(c.g, &c.s)
                        : build_parallel_schedule(c.g, &c.s);
    if (!ok) return false;
    c.h = h;
    c.w = w;
    c.mode = mode;
    g_cache = std::move(c);
  }
  *g = &g_cache.g;
  *s = &g_cache.s;
  return true;
}

// lane layout: per-symbol (row, lane) in the emission grid plus the
// step table (symbols per decode step, ordered by lane — the global
// stream's word order within a step is channel-major, lane-minor;
// schedule.build_lane_steps / build_stream_perm semantics).
//   mode=grid: rows are steps — row = wave row base + rank/nl,
//     lane = rank % nl (rank = position within the wave);
//   mode=parallel: waves chunk into <= nl symbols per step, k
//     contiguous within a step, lane = k % nl (steps may wrap), word
//     row of symbol k = k / nl.
struct LaneLayout {
  int nl;
  int64_t R;  // emission-grid rows
  std::vector<int32_t> lane_of;  // [K]
  std::vector<int64_t> row_of;   // [K]
  std::vector<std::vector<std::pair<int32_t, int64_t>>> steps;  // (lane, k)
};

static LaneLayout lane_layout(const Schedule& s, int nl, bool grid_mode) {
  LaneLayout L;
  L.nl = nl;
  L.lane_of.resize(s.K);
  L.row_of.resize(s.K);
  if (grid_mode) {
    int64_t k0 = 0, rbase = 0;
    for (int64_t ws : s.wave_sizes) {
      int64_t rows = (ws + nl - 1) / nl;
      for (int64_t r = 0; r < rows; ++r) {
        std::vector<std::pair<int32_t, int64_t>> v;
        for (int l = 0; l < nl; ++l) {
          int64_t rank = r * nl + l;
          if (rank >= ws) break;
          int64_t k = k0 + rank;
          L.lane_of[k] = l;
          L.row_of[k] = rbase + r;
          v.emplace_back(l, k);
        }
        L.steps.push_back(std::move(v));
      }
      k0 += ws;
      rbase += rows;
    }
    L.R = rbase;
  } else {
    for (int64_t k = 0; k < s.K; ++k) {
      L.lane_of[k] = (int32_t)(k % nl);
      L.row_of[k] = k / nl;
    }
    L.R = (s.K + nl - 1) / nl;
    int64_t k = 0;
    for (int64_t ws : s.wave_sizes) {
      int64_t rem = ws;
      while (rem > 0) {
        int64_t take = rem < nl ? rem : nl;
        std::vector<std::pair<int32_t, int64_t>> v;
        v.reserve(take);
        for (int64_t i = 0; i < take; ++i)
          v.emplace_back((int32_t)((k + i) % nl), k + i);
        std::sort(v.begin(), v.end());
        L.steps.push_back(std::move(v));
        k += take;
        rem -= take;
      }
    }
  }
  return L;
}

constexpr int kVersion = 9;

}  // namespace frif

using namespace frif;

extern "C" {

// Parse the container header only. Returns 0 ok; fills h/w/c.
int frif_probe(const uint8_t* blob, int64_t len, int* out_h, int* out_w,
               int* out_c) {
  Reader r{blob, blob + len};
  if (!r.need(4) || std::memcmp(r.p, "frif", 4) != 0) return 1;
  r.p += 4;
  int version = r.u8();
  if (version < 7 || version > kVersion) return 2;
  uint32_t h = r.u32(), w = r.u32();
  uint8_t mdat = r.u8();
  int cs = mdat >> 4;
  if (!r.ok || h == 0 || w == 0) return 3;
  *out_h = (int)h;
  *out_w = (int)w;
  *out_c = cs == 0b01 ? 1 : 3;
  return 0;
}

// Decode a frif v8/v9 mode="grid" container into caller-allocated
// pixels [h*w*C] u8 (interleaved). Returns 0 ok; nonzero = parse or
// semantic error (error codes are diagnostic, not wire contract).
int frif_decode(const uint8_t* blob, int64_t len, uint8_t* out_pixels) {
  Reader r{blob, blob + len};
  if (!r.need(4) || std::memcmp(r.p, "frif", 4) != 0) return 1;
  r.p += 4;
  int version = r.u8();
  if (version < 7 || version > kVersion) return 2;
  int h = (int)r.u32(), w = (int)r.u32();
  uint8_t mdat = r.u8();
  int cs = mdat >> 4;
  int C = cs == 0b01 ? 1 : 3;
  r.u8();  // quality (decode ignores; qm travels explicitly)
  int mode = r.u8();
  if (mode != 0 && mode != 2) return 3;  // parallel + grid (not parity)
  int nl = r.u16();
  if (nl < 1) return 4;
  int tid = r.u8();
  if (tid > 3) return 5;
  int32_t qm[32];
  for (int i = 0; i < 32; ++i) qm[i] = r.u16();
  if (!r.ok) return 6;

  const Geometry* g;
  const Schedule* s;
  if (!get_geo_sched(h, w, mode, &g, &s)) return 7;
  const int n = g->n;
  LaneLayout lay = lane_layout(*s, nl, mode == 2);

  // per-haar-index divisors: layer = floor(log2(j + 1))
  std::vector<int32_t> qdiv(n);
  for (int j = 0; j < n; ++j) {
    int layer = 0;
    while ((2 << layer) <= j + 1) ++layer;
    qdiv[j] = qm[layer] > 0 ? qm[layer] : 1;
  }

  int F = s->num_fine;
  std::vector<float> vp((size_t)C * F * 6), wp((size_t)C * F * 6);
  std::vector<Ctx> ctx((size_t)C * kContexts);
  std::vector<uint32_t> states((size_t)C * nl);

  for (int ch = 0; ch < C; ++ch) {
    if (r.u16() != kMarkerPRD) return 8;
    int nfit;
    std::vector<float> vrows, wrows;
    if (version >= 8) {
      nfit = r.u8();
      if (nfit < 1) return 9;
      vrows.resize((size_t)nfit * 6);
      wrows.resize((size_t)nfit * 6);
      for (int i = 0; i < nfit * 6; ++i) vrows[i] = f16_to_f32(r.u16());
      for (int i = 0; i < nfit * 6; ++i) wrows[i] = f16_to_f32(r.u16());
    } else {  // v7: fixed 3 coarse rows, f32 on the wire
      nfit = 3;
      vrows.resize(18);
      wrows.resize(18);
      for (int i = 0; i < 18; ++i) {
        uint32_t b = r.u32();
        std::memcpy(&vrows[i], &b, 4);
      }
      for (int i = 0; i < 18; ++i) {
        uint32_t b = r.u32();
        std::memcpy(&wrows[i], &b, 4);
      }
    }
    if (!r.ok) return 10;
    for (int i = 0; i < nfit * 6; ++i)
      if (std::isnan(vrows[i]) || std::isinf(vrows[i]) ||
          std::isnan(wrows[i]) || std::isinf(wrows[i]))
        return 11;
    // expand to fine rows (v8 legacy 3-row sets via legacy_of_fine)
    for (int fidx = 0; fidx < F; ++fidx) {
      int src = nfit == F ? fidx
                          : (nfit == 3 ? s->legacy_of_fine[fidx] : -1);
      if (src < 0) return 12;
      for (int k = 0; k < 6; ++k) {
        vp[((size_t)ch * F + fidx) * 6 + k] = vrows[(size_t)src * 6 + k];
        wp[((size_t)ch * F + fidx) * 6 + k] = wrows[(size_t)src * 6 + k];
      }
    }

    for (int b = 0; b < kContexts; ++b) {
      if (r.u16() != kMarkerEHD) return 13;
      int bits = r.u8();
      int scale = version >= 9 ? r.u8() : b;
      if (scale >= kNumScales) return 14;
      uint32_t off_len = r.u32();
      if (!r.need(2 * (size_t)off_len)) return 15;
      bool offm[kAlphabet] = {false};
      for (uint32_t i = 0; i < off_len; ++i) {
        uint16_t o = r.u16();
        if (o >= kAlphabet) return 16;
        offm[o] = true;
      }
      if (!finalize_context(nullptr, b, bits, offm, scale,
                            &ctx[(size_t)ch * kContexts + b]))
        return 17;
    }

    if (r.u16() != kMarkerSTT) return 18;
    int sw = r.u8();
    for (int l = 0; l < nl; ++l) {
      uint32_t x;
      if (sw == 2)
        x = (uint32_t)r.u16() + (1u << 16);
      else if (sw == 4)
        x = r.u32();
      else
        return 19;
      states[(size_t)ch * nl + l] = x;
    }
    if (r.u16() != kMarkerEOC) return 20;
  }

  if (r.u16() != kMarkerSDT) return 21;
  uint32_t total = r.u32();
  if (!r.need(2 * (size_t)total)) return 22;
  const uint8_t* stream_bytes = r.p;
  r.p += 2 * (size_t)total;
  if (r.u16() != kMarkerEOI) return 23;
  if (!r.ok) return 24;
  auto stream_word = [&](int64_t i) -> uint32_t {
    if (i < 0 || i >= (int64_t)total) return 0;  // robustness clamp
    return (uint32_t)(stream_bytes[2 * i] | (stream_bytes[2 * i + 1] << 8));
  };

  // ---- serial decode: steps ascending; within a step channels
  // ascending, lanes ascending (= the global stream word order,
  // schedule.build_stream_perm). Symbols within a wave depend only on
  // earlier waves (parallel/grid property), so step order within a
  // wave is free — only the word-pull order matters.
  std::vector<int32_t> coef((size_t)C * g->T * n, 0);
  int64_t gptr = 0;
  for (const auto& step : lay.steps) {
    for (int ch = 0; ch < C; ++ch) {
      int32_t* cf = &coef[(size_t)ch * g->T * n];
      const float* vpc = &vp[(size_t)ch * F * 6];
      const float* wpc = &wp[(size_t)ch * F * 6];
      for (const auto& lk : step) {
        int l = lk.first;
        int64_t k = lk.second;
        int bucket;
        int32_t pred;
        context_of(&s->nbr[(size_t)k * 6], cf,
                   &vpc[(size_t)s->group[k] * 6],
                   &wpc[(size_t)s->group[k] * 6], s->fbkt[k], &bucket,
                   &pred);
        const Ctx& cx = ctx[(size_t)ch * kContexts + bucket];
        uint32_t& x = states[(size_t)ch * nl + l];
        uint32_t mask = (1u << cx.bits) - 1;
        uint32_t slot = x & mask;
        // last symbol with cdf <= slot (duplicate-cdf "last wins",
        // ops/rans.py StreamDecoder)
        int lo2 = 0, hi2 = kAlphabet - 1;
        while (lo2 < hi2) {
          int mid = (lo2 + hi2 + 1) >> 1;
          if (cx.cdf[mid] <= slot)
            lo2 = mid;
          else
            hi2 = mid - 1;
        }
        int sym = lo2;
        x = cx.freqs[sym] * (x >> cx.bits) + slot - cx.cdf[sym];
        if (x < kRansL) {
          x = (x << 16) | stream_word(gptr);
          ++gptr;
        }
        int32_t rs = (sym % 2 == 0) ? sym / 2 : -((sym + 1) / 2);
        cf[s->coef[k]] = rs + pred;
      }
    }
  }

  // ---- dequantize + inverse lift + inverse transform
  std::vector<int32_t> planes((size_t)C * h * (int64_t)w, 0);
  for (int ch = 0; ch < C; ++ch)
    dequant_inverse_lift(*g, &coef[(size_t)ch * g->T * n], qdiv.data(),
                         &planes[(size_t)ch * h * (int64_t)w]);
  int64_t hw = (int64_t)h * w;
  if (C == 3) {
    transform_inv(tid, hw, planes.data(), out_pixels);
  } else {
    for (int64_t i = 0; i < hw; ++i) out_pixels[i] = (uint8_t)planes[i];
  }
  return 0;
}

// Encode pixels [h*w*C] u8 (interleaved) into a frif v9 container.
// quality: 0..3 wire value (3 = LOSSLESS); transform: 0..3
// channel-transform id (ignored for C == 1); nl_req: lane count (<= 0
// -> default heuristic); mode: 0 = parallel, 2 = grid (wire
// encodings). Caller frees *out_blob with frif_free.
int frif_encode(int h, int w, int C, const uint8_t* pixels, int quality,
                int transform, int nl_req, int mode, uint8_t** out_blob,
                int64_t* out_len) {
  if (C != 1 && C != 3) return 1;
  if (transform < 0 || transform > 3) return 1;
  if (mode != 0 && mode != 2) return 1;
  const Geometry* g;
  const Schedule* s;
  if (!get_geo_sched(h, w, mode, &g, &s)) return 2;
  const int n = g->n;
  const int64_t K = s->K;
  int F = s->num_fine;

  // quantization presets (codec/options.py _QUANT_TABLES; wire carries
  // the matrix explicitly so these only need to match for bit-parity
  // with Python-encoded files at the same quality)
  static const int32_t kQ[4][11] = {
      {1, 1, 2, 2, 3, 4, 6, 8, 12, 16, 24},      // LOW = 0
      {1, 1, 1, 1, 1, 2, 2, 3, 4, 6, 8},         // MEDIUM = 1
      {1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 3},         // HIGH = 2
      {1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1},         // LOSSLESS = 3
  };
  if (quality < 0 || quality > 3) return 1;
  int32_t qm[32];
  for (int i = 0; i < 32; ++i) qm[i] = kQ[quality][i < 11 ? i : 10];
  std::vector<int32_t> qdiv(n);
  for (int j = 0; j < n; ++j) {
    int layer = 0;
    while ((2 << layer) <= j + 1) ++layer;
    qdiv[j] = qm[layer];
  }

  int nl = nl_req;
  if (nl <= 0) {
    // schedule.default_num_lanes
    int64_t target = K / 128;
    if (target < 16) target = 16;
    if (target > 16384) target = 16384;
    nl = 1;
    while ((int64_t)nl * 2 <= target) nl *= 2;
  }
  LaneLayout lay = lane_layout(*s, nl, mode == 2);
  int64_t R = lay.R;

  int64_t hw = (int64_t)h * w;
  std::vector<int32_t> planes((size_t)C * hw);
  int tid = C == 3 ? transform : 0;
  if (C == 3) {
    transform_fwd(tid, hw, pixels, planes.data());
  } else {
    for (int64_t i = 0; i < hw; ++i) planes[i] = pixels[i];
  }

  Writer wtr;
  wtr.b.reserve((size_t)hw * C / 2 + 4096);
  const char magic[4] = {'f', 'r', 'i', 'f'};
  wtr.b.insert(wtr.b.end(), magic, magic + 4);
  wtr.u8(kVersion);
  wtr.u32((uint32_t)h);
  wtr.u32((uint32_t)w);
  wtr.u8((uint8_t)(((C == 1 ? 0b01 : 0b10) << 4) | 0b01));  // cs | variant
  wtr.u8((uint8_t)quality);
  wtr.u8((uint8_t)mode);
  wtr.u16((uint16_t)nl);
  wtr.u8((uint8_t)tid);
  for (int i = 0; i < 32; ++i) wtr.u16((uint16_t)qm[i]);

  std::vector<int32_t> coef((size_t)g->T * n);
  std::vector<int32_t> sym(K);
  std::vector<uint8_t> bkt(K);
  // one global emission grid per channel pass is enough if we stream
  // channels... the wire interleaves channels within each row, so all
  // channels' words must be known before the stream writes. Keep
  // [R][C][nl] words + flags.
  std::vector<uint16_t> words((size_t)R * C * nl, 0);
  std::vector<uint8_t> flags((size_t)R * C * nl, 0);
  std::vector<uint32_t> fin_states((size_t)C * nl);
  std::vector<Ctx> ctx((size_t)C * kContexts);
  std::vector<float> vps((size_t)C * F * 6), wps((size_t)C * F * 6);

  for (int ch = 0; ch < C; ++ch) {
    forward_lift_quant(*g, &planes[(size_t)ch * hw], qdiv.data(),
                       coef.data());

    // --- per-group Gram fits (f64 accumulate; wire carries the rounded
    // f16 params, so fit arithmetic is free to differ from Python)
    std::vector<double> G((size_t)F * 36, 0.0), bv((size_t)F * 6, 0.0);
    for (int64_t k = 0; k < K; ++k) {
      int grp = s->group[k];
      double v[6];
      for (int t = 0; t < 6; ++t) {
        int32_t nb = s->nbr[(size_t)k * 6 + t];
        v[t] = nb >= 0 ? (double)coef[nb] : 0.0;
      }
      double y = (double)coef[s->coef[k]];
      for (int a = 0; a < 6; ++a) {
        bv[(size_t)grp * 6 + a] += v[a] * y;
        for (int b2 = 0; b2 < 6; ++b2)
          G[((size_t)grp * 6 + a) * 6 + b2] += v[a] * v[b2];
      }
    }
    auto solve6 = [](const double* Gm, const double* bm, float out[6]) {
      double A[6][7];
      double tr = 0;
      for (int i = 0; i < 6; ++i) tr += Gm[i * 6 + i];
      double eps = tr * 1e-9 / 6.0 + 1e-12;
      for (int i = 0; i < 6; ++i) {
        for (int j = 0; j < 6; ++j)
          A[i][j] = Gm[i * 6 + j] + (i == j ? eps : 0.0);
        A[i][6] = bm[i];
      }
      for (int c = 0; c < 6; ++c) {
        int piv = c;
        for (int rr = c + 1; rr < 6; ++rr)
          if (std::fabs(A[rr][c]) > std::fabs(A[piv][c])) piv = rr;
        if (piv != c)
          for (int j = c; j < 7; ++j) std::swap(A[c][j], A[piv][j]);
        if (A[c][c] == 0.0) continue;
        for (int rr = c + 1; rr < 6; ++rr) {
          double m = A[rr][c] / A[c][c];
          for (int j = c; j < 7; ++j) A[rr][j] -= m * A[c][j];
        }
      }
      for (int c = 5; c >= 0; --c) {
        double sum = A[c][6];
        for (int j = c + 1; j < 6; ++j) sum -= A[c][j] * (double)out[j];
        out[c] = A[c][c] != 0.0 ? (float)(sum / A[c][c]) : 0.0f;
      }
    };
    float* vpc = &vps[(size_t)ch * F * 6];
    float* wpc = &wps[(size_t)ch * F * 6];
    for (int grp = 0; grp < F; ++grp) {
      float row[6];
      solve6(&G[(size_t)grp * 36], &bv[(size_t)grp * 6], row);
      for (int t = 0; t < 6; ++t)
        vpc[(size_t)grp * 6 + t] = f16_round(row[t]);  // wire precision
    }
    // width fit on |residual| of the f16-rounded value predictor
    std::fill(G.begin(), G.end(), 0.0);
    std::fill(bv.begin(), bv.end(), 0.0);
    for (int64_t k = 0; k < K; ++k) {
      int grp = s->group[k];
      float f[6];
      for (int t = 0; t < 6; ++t) {
        int32_t nb = s->nbr[(size_t)k * 6 + t];
        f[t] = nb >= 0 ? (float)coef[nb] : 0.0f;
      }
      float p = 0;
      for (int t = 0; t < 6; ++t) p += f[t] * vpc[(size_t)grp * 6 + t];
      double rres = std::fabs((double)coef[s->coef[k]] - (double)(int32_t)p);
      double feat[6] = {1.0,
                       std::fabs((double)f[0] - f[3]),
                       std::fabs((double)f[1] - f[2]),
                       std::fabs((double)f[4] - f[5]),
                       std::fabs((double)f[1] - f[5]),
                       std::fabs((double)f[2] - f[4])};
      for (int a = 0; a < 6; ++a) {
        bv[(size_t)grp * 6 + a] += feat[a] * rres;
        for (int b2 = 0; b2 < 6; ++b2)
          G[((size_t)grp * 6 + a) * 6 + b2] += feat[a] * feat[b2];
      }
    }
    for (int grp = 0; grp < F; ++grp) {
      float row[6];
      solve6(&G[(size_t)grp * 36], &bv[(size_t)grp * 6], row);
      for (int t = 0; t < 6; ++t)
        wpc[(size_t)grp * 6 + t] = f16_round(row[t]);
    }

    // --- contexts + symbols + histograms (schedule order)
    std::vector<uint32_t> hist((size_t)kContexts * kAlphabet, 0);
    for (int64_t k = 0; k < K; ++k) {
      int bucket;
      int32_t pred;
      context_of(&s->nbr[(size_t)k * 6], coef.data(),
                 &vpc[(size_t)s->group[k] * 6],
                 &wpc[(size_t)s->group[k] * 6], s->fbkt[k], &bucket,
                 &pred);
      int32_t rr = coef[s->coef[k]] - pred;
      int32_t z = rr >= 0 ? 2 * rr : -2 * rr - 1;
      if (z >= kAlphabet) return 3;  // residual outside the alphabet
      sym[k] = z;
      bkt[k] = (uint8_t)bucket;
      hist[(size_t)bucket * kAlphabet + z] += 1;
    }

    // --- tables: bits from totals, v9 adaptive scale, finalize
    Ctx* cxc = &ctx[(size_t)ch * kContexts];
    for (int b = 0; b < kContexts; ++b) {
      const uint32_t* hb = &hist[(size_t)b * kAlphabet];
      int64_t total = 0;
      for (int j = 0; j < kAlphabet; ++j) total += hb[j];
      int bits = kMinBits;
      if (total > 0) {
        bits = 0;
        while ((int64_t(1) << (bits + 1)) <= total) ++bits;
      }
      if (bits > kEncBitsCap) bits = kEncBitsCap;
      int scale = total > 0 ? select_scale(hb, bits) : b;
      if (!finalize_context(hb, b, bits, nullptr, scale, &cxc[b]))
        return 4;
    }

    // --- interleaved-lane rANS: global reverse-k scan (processes each
    // lane's symbols in reverse per-lane order — LIFO, ops/rans.py)
    std::vector<uint32_t> x((size_t)nl, kRansL);
    for (int64_t k = K - 1; k >= 0; --k) {
      int l = lay.lane_of[k];
      int64_t row_g = lay.row_of[k];
      const Ctx& cx = cxc[bkt[k]];
      uint32_t fr = cx.freqs[sym[k]];
      uint32_t cd = cx.cdf[sym[k]];
      if (fr == 0) return 5;
      uint32_t& xs = x[l];
      // renorm: emit iff (x >> (32 - bits)) >= freq
      if ((xs >> (32 - cx.bits)) >= fr) {
        words[((size_t)row_g * C + ch) * nl + l] = (uint16_t)(xs & 0xffff);
        flags[((size_t)row_g * C + ch) * nl + l] = 1;
        xs >>= 16;
      }
      xs = ((xs / fr) << cx.bits) + (xs % fr) + cd;
    }
    for (int l = 0; l < nl; ++l) fin_states[(size_t)ch * nl + l] = x[l];
  }

  // ---- serialize channels
  for (int ch = 0; ch < C; ++ch) {
    wtr.u16(kMarkerPRD);
    wtr.u8((uint8_t)F);
    for (int i = 0; i < F * 6; ++i)
      wtr.u16(f32_to_f16(vps[(size_t)ch * F * 6 + i]));
    for (int i = 0; i < F * 6; ++i)
      wtr.u16(f32_to_f16(wps[(size_t)ch * F * 6 + i]));
    for (int b = 0; b < kContexts; ++b) {
      const Ctx& cx = ctx[(size_t)ch * kContexts + b];
      wtr.u16(kMarkerEHD);
      wtr.u8((uint8_t)cx.bits);
      wtr.u8((uint8_t)cx.scale);
      wtr.u32((uint32_t)cx.off.size());
      for (uint16_t o : cx.off) wtr.u16(o);
    }
    wtr.u16(kMarkerSTT);
    uint32_t mx = 0, mn = 0xffffffff;
    for (int l = 0; l < nl; ++l) {
      uint32_t v = fin_states[(size_t)ch * nl + l];
      mx = v > mx ? v : mx;
      mn = v < mn ? v : mn;
    }
    if (nl > 0 && mx < (1u << 17) && mn >= (1u << 16)) {
      wtr.u8(2);
      for (int l = 0; l < nl; ++l)
        wtr.u16((uint16_t)(fin_states[(size_t)ch * nl + l] - (1u << 16)));
    } else {
      wtr.u8(4);
      for (int l = 0; l < nl; ++l)
        wtr.u32(fin_states[(size_t)ch * nl + l]);
    }
    wtr.u16(kMarkerEOC);
  }

  // ---- global stream: steps ascending, channel-major, lane-minor
  // (equals flat [R, C, NL] order in grid mode where rows are steps)
  std::vector<uint16_t> stream;
  stream.reserve((size_t)K * C / 3);
  for (const auto& step : lay.steps)
    for (int ch = 0; ch < C; ++ch)
      for (const auto& lk : step) {
        size_t idx =
            ((size_t)lay.row_of[lk.second] * C + ch) * nl + lk.first;
        if (flags[idx]) stream.push_back(words[idx]);
      }
  wtr.u16(kMarkerSDT);
  wtr.u32((uint32_t)stream.size());
  for (uint16_t wv : stream) wtr.u16(wv);
  wtr.u16(kMarkerEOI);

  *out_len = (int64_t)wtr.b.size();
  *out_blob = (uint8_t*)std::malloc(wtr.b.size());
  if (!*out_blob) return 6;
  std::memcpy(*out_blob, wtr.b.data(), wtr.b.size());
  return 0;
}

void frif_free(uint8_t* ptr) { std::free(ptr); }

}  // extern "C"
