// Native fractal-geometry builder for frave_tpu.
//
// Produces exactly the same index tensors as the Python builders
// (frave_tpu/fractal/geometry.py loop definition and
// frave_tpu/fractal/geometry_fast.py vectorized twin) — differentially
// tested from tests/test_native_geometry.py. This is the host-side
// init() hot path (SURVEY.md section 3.5): everything downstream of the
// codec is a pure function of these tensors, and building them for a
// 2048x2048 image involves ~4M lattice positions x 6 directional
// neighbour lookups.
//
// Reference semantics mirrored here (with file:line):
//   * tame-twindragon literals generator   fractal.rs:3-23 (comment)
//   * tree unfold off[2p]=off[p], off[2p+1]=off[p]+lit  wavelet_transform.rs:44-54
//   * 6-neighbour scale vectors + scale 1..3 special cases  wavelet_transform.rs:71-90
//   * directional getters incl. the scale-2 fixups whose membership test
//     goes against the map indexed by *scale* (level 2)  wavelet_transform.rs:97-177
//   * BFS tile lattice (expanded bounds; see geometry.py fractal_divide
//     docstring for the documented divergence)  wavelet_transform.rs:450-484
//   * retention of tiles with any in-bounds leaf  wavelet_transform.rs:415-416
//
// API (ctypes): two-phase — fg_num_tiles() so the caller can allocate
// numpy buffers (paying this sandbox's expensive first-touch page faults
// exactly once, on the final arrays), then fg_build() to fill them.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <deque>
#include <unordered_set>
#include <vector>

namespace {

struct V2 {
  int64_t x, y;
};

static inline V2 operator+(V2 a, V2 b) { return {a.x + b.x, a.y + b.y}; }
static inline V2 operator-(V2 a, V2 b) { return {a.x - b.x, a.y - b.y}; }

// literals generator — must match frave_tpu/fractal/literals.py
// generate_literals(n, d=1) bit-for-bit (IEEE double, same op order).
static std::vector<V2> literals(int n) {
  double base_re = 0.5;
  double base_im = std::sqrt(2.0 - 0.25);
  std::vector<V2> out(n, {0, 0});
  double pow_re = 1.0, pow_im = 0.0;
  for (int k = 1; k < n; ++k) {
    int64_t sign = (k % 2 == 1) ? -1 : 1;
    out[k] = {sign * (int64_t)std::llround(-pow_re / base_re),
              sign * (int64_t)std::llround(pow_im / base_im)};
    double nre = pow_re * base_re - pow_im * base_im;
    double nim = pow_re * base_im + pow_im * base_re;
    pow_re = nre;
    pow_im = nim;
  }
  out[0] = {0, 1};
  if (n > 2) std::swap(out[1], out[2]);
  return out;
}

// nearby_vectors(scale) — geometry.py:50-74
static void nearby_vectors(int scale, const std::vector<V2>& lit, V2 out[6]) {
  V2 zl, zmd;
  if (scale == 1) {
    zl = {-1, 1};
    zmd = {0, 2};
  } else if (scale == 2) {
    zl = {-2, 0};
    zmd = {0, -2};
  } else if (scale == 3) {
    zl = {-3, -1};
    zmd = {-1, -3};
  } else {
    zl = lit[scale];
    zmd = {lit[scale + 1].x + zl.x, lit[scale + 1].y + zl.y};
  }
  out[0] = zl;
  out[1] = zl - zmd;
  out[2] = {-zmd.x, -zmd.y};
  out[3] = {-zl.x, -zl.y};
  out[4] = zmd - zl;
  out[5] = zmd;
}

static inline int64_t key_of(V2 p) {
  // matches geometry_fast._keys: (py + 2^20) * 2^21 + (px + 2^20)
  return (p.y + (int64_t(1) << 20)) * (int64_t(1) << 21) + (p.x + (int64_t(1) << 20));
}

struct LevelMap {
  // sorted (key, tile, haar)
  std::vector<int64_t> keys;
  std::vector<int32_t> tiles;
  std::vector<int32_t> haars;

  void build(std::vector<std::pair<int64_t, int64_t>>&& kv) {
    // kv: (key, packed tile<<32 | haar)
    std::sort(kv.begin(), kv.end());
    size_t n = kv.size();
    keys.resize(n);
    tiles.resize(n);
    haars.resize(n);
    for (size_t i = 0; i < n; ++i) {
      keys[i] = kv[i].first;
      tiles[i] = (int32_t)(kv[i].second >> 32);
      haars[i] = (int32_t)(kv[i].second & 0xffffffff);
    }
  }

  bool lookup(V2 p, int32_t* t, int32_t* q) const {
    int64_t k = key_of(p);
    auto it = std::lower_bound(keys.begin(), keys.end(), k);
    if (it == keys.end() || *it != k) return false;
    size_t i = (size_t)(it - keys.begin());
    *t = tiles[i];
    *q = haars[i];
    return true;
  }

  bool contains(V2 p) const {
    int64_t k = key_of(p);
    return std::binary_search(keys.begin(), keys.end(), k);
  }
};

// one directional neighbour position; k in getter order
// (left, up_left, up_right, right, down_left, down_right)
static V2 neighbour_pos(V2 pos, int scale, const std::vector<V2>& lit,
                        const LevelMap& fixup, int k) {
  V2 v[6];
  nearby_vectors(scale, lit, v);
  switch (k) {
    case 0:
      return pos + v[4];  // left
    case 3:
      return pos + v[1];  // right
  }
  if (scale != 2) {
    switch (k) {
      case 1:
        return pos + v[5];  // up_left
      case 2:
        return pos + v[0];  // up_right
      case 4:
        return pos + v[3];  // down_left
      default:
        return pos + v[2];  // down_right
    }
  }
  V2 one{1, 1};
  if (k == 4 || k == 5) {
    bool cond = !fixup.contains(pos + v[3]) && fixup.contains(pos + one);
    if (k == 4) return cond ? pos + one : pos + v[3];
    return cond ? pos + one + v[1] : pos + v[2];
  }
  bool cond = !fixup.contains(pos + v[0]) && fixup.contains(pos - one);
  if (k == 2) return cond ? pos - one : pos + v[0];
  return cond ? pos - one + v[4] : pos + v[5];
}

struct Plan {
  int64_t T = 0;
  std::vector<V2> centers;           // kept tiles, canonical (y, x) order
  std::vector<uint8_t> leaf_inb;     // [T * n]
  std::vector<int64_t> leaf_pixflat; // [T * n] (-1 oob)
};

// tree offsets for leaves only: off[n + j] for j in [0, n)
static std::vector<V2> tree_offsets_all(int depth, const std::vector<V2>& lit) {
  int64_t n = int64_t(1) << (depth + 1);
  std::vector<V2> off(n, {0, 0});
  for (int level = 0; level < depth; ++level) {
    int64_t lo = int64_t(1) << level, hi = int64_t(1) << (level + 1);
    V2 l = lit[depth - level - 1];
    for (int64_t p = hi - 1; p >= lo; --p) {
      off[2 * p] = off[p];
      off[2 * p + 1] = off[p] + l;
    }
  }
  return off;
}

static bool make_plan(int height, int width, int depth, Plan* plan) {
  if (height <= 0 || width <= 0 || depth < 1 || depth > 20) return false;
  std::vector<V2> lit = literals(30);
  int64_t n = int64_t(1) << depth;
  std::vector<V2> off = tree_offsets_all(depth, lit);

  // BFS over tile lattice (geometry.py fractal_divide)
  V2 vecs[6];
  nearby_vectors(depth, lit, vecs);
  int64_t radius = 0;
  for (int64_t j = n; j < 2 * n; ++j)
    radius = std::max(
        {radius, (int64_t)std::llabs(off[j].x), (int64_t)std::llabs(off[j].y)});
  int64_t vmax = 0;
  for (auto& v : vecs)
    vmax = std::max({vmax, (int64_t)std::llabs(v.x), (int64_t)std::llabs(v.y)});
  radius += vmax;
  int64_t lo_x = -radius, hi_x = width + radius;
  int64_t lo_y = -radius, hi_y = height + radius;

  std::deque<V2> todo;
  std::unordered_set<int64_t> queued;
  V2 start{width / 2, height / 2};
  todo.push_back(start);
  queued.insert(key_of(start));
  std::vector<V2> cand;
  while (!todo.empty()) {
    V2 pos = todo.front();
    todo.pop_front();
    cand.push_back(pos);
    for (auto& v : vecs) {
      V2 nb = pos + v;
      if (nb.x < lo_x || nb.x > hi_x || nb.y < lo_y || nb.y > hi_y) continue;
      int64_t k = key_of(nb);
      if (queued.insert(k).second) todo.push_back(nb);
    }
  }

  // retention + canonical sort by (y, x)
  std::vector<V2> kept;
  kept.reserve(cand.size());
  for (auto& c : cand) {
    bool any = false;
    for (int64_t j = n; j < 2 * n && !any; ++j) {
      V2 p = c + off[j];
      any = p.x >= 0 && p.x < width && p.y >= 0 && p.y < height;
    }
    if (any) kept.push_back(c);
  }
  std::sort(kept.begin(), kept.end(),
            [](V2 a, V2 b) { return a.y != b.y ? a.y < b.y : a.x < b.x; });

  int64_t T = (int64_t)kept.size();
  plan->T = T;
  plan->centers = std::move(kept);
  plan->leaf_inb.assign(T * n, 0);
  plan->leaf_pixflat.assign(T * n, -1);
  int64_t covered = 0;
  for (int64_t t = 0; t < T; ++t) {
    V2 c = plan->centers[t];
    for (int64_t j = 0; j < n; ++j) {
      V2 p = c + off[n + j];
      if (p.x >= 0 && p.x < width && p.y >= 0 && p.y < height) {
        plan->leaf_inb[t * n + j] = 1;
        plan->leaf_pixflat[t * n + j] = p.y * width + p.x;
        ++covered;
      }
    }
  }
  if (covered != (int64_t)height * width) return false;
  return true;
}

}  // namespace

extern "C" {

// Phase 1: tile count (so the caller can allocate output buffers).
int64_t fg_num_tiles(int height, int width, int depth) {
  Plan plan;
  if (!make_plan(height, width, depth, &plan)) return -1;
  return plan.T;
}

// Phase 2: fill caller-allocated buffers. Returns 0 on success.
//   centers      [T, 2]     int32 (x, y)
//   pixel_gather [T, n]     int32 (-1 oob)
//   coef_mask    [T, n]     uint8
//   nbr_idx      [T * n, 6] int32 (-1 absent)
//   nbr_par      [T * n, 6] int32 (-1 absent)
//   tile_nbr     [T, 6]     int32 (-1 absent)
//   level_slots  [T * n]    int32 (level 0: T entries, then level L:
//                           T * 2^L entries, canonical order)
int fg_build(int height, int width, int depth, int64_t T_expect,
             int32_t* centers, int32_t* pixel_gather, uint8_t* coef_mask,
             int32_t* nbr_idx, int32_t* nbr_par, int32_t* tile_nbr,
             int32_t* level_slots) {
  Plan plan;
  if (!make_plan(height, width, depth, &plan)) return 1;
  int64_t T = plan.T;
  if (T != T_expect) return 2;
  int64_t n = int64_t(1) << depth;
  std::vector<V2> lit = literals(30);
  std::vector<V2> off = tree_offsets_all(depth, lit);

  for (int64_t t = 0; t < T; ++t) {
    centers[2 * t] = (int32_t)plan.centers[t].x;
    centers[2 * t + 1] = (int32_t)plan.centers[t].y;
  }
  for (int64_t i = 0; i < T * n; ++i)
    pixel_gather[i] = (int32_t)plan.leaf_pixflat[i];

  // coef_mask bottom-up
  std::vector<uint8_t> mask(T * n, 0);
  for (int64_t t = 0; t < T; ++t) {
    uint8_t* m = &mask[t * n];
    const uint8_t* inb = &plan.leaf_inb[t * n];
    for (int64_t p = n / 2; p < n; ++p)
      m[p] = inb[2 * p - n] | inb[2 * p + 1 - n];
    for (int64_t p = n / 2 - 1; p >= 1; --p) m[p] = m[2 * p] | m[2 * p + 1];
    m[0] = m[1];
  }
  std::memcpy(coef_mask, mask.data(), T * n);

  // per-level maps
  std::vector<LevelMap> maps(depth);
  for (int L = 0; L < depth; ++L) {
    int64_t lo = int64_t(1) << L, hi = int64_t(1) << (L + 1);
    std::vector<std::pair<int64_t, int64_t>> kv;
    kv.reserve(T * (hi - lo));
    for (int64_t t = 0; t < T; ++t) {
      V2 c = plan.centers[t];
      for (int64_t q = lo; q < hi; ++q) {
        V2 p = c + off[q];
        kv.emplace_back(key_of(p), (t << 32) | q);
      }
    }
    maps[L].build(std::move(kv));
    // collision check
    for (size_t i = 1; i < maps[L].keys.size(); ++i)
      if (maps[L].keys[i] == maps[L].keys[i - 1]) return 3;
  }
  const LevelMap& fixup = depth > 2 ? maps[2] : maps[depth - 1];

  // tile map + tile_nbr (scale = depth)
  LevelMap tile_map;
  {
    std::vector<std::pair<int64_t, int64_t>> kv;
    kv.reserve(T);
    for (int64_t t = 0; t < T; ++t)
      kv.emplace_back(key_of(plan.centers[t]), (t << 32));
    tile_map.build(std::move(kv));
  }
  for (int64_t t = 0; t < T; ++t) {
    for (int k = 0; k < 6; ++k) {
      V2 p = neighbour_pos(plan.centers[t], depth, lit, fixup, k);
      int32_t u, q;
      tile_nbr[t * 6 + k] = tile_map.lookup(p, &u, &q) ? u : -1;
    }
  }

  std::fill(nbr_idx, nbr_idx + T * n * 6, -1);
  std::fill(nbr_par, nbr_par + T * n * 6, -1);

  // level_slots: level 0 = canonical tile order
  int64_t ls_off = 0;
  for (int64_t t = 0; t < T; ++t) level_slots[ls_off++] = (int32_t)(t * n);

  // levels 1..depth-1: canonical (y, x) order + neighbour tensors
  for (int L = 1; L < depth; ++L) {
    int64_t lo = int64_t(1) << L, hi = int64_t(1) << (L + 1);
    int64_t nL = hi - lo;
    int scale = depth - L;
    const LevelMap& m = maps[L];
    // canonical order: the map itself is key-sorted == (y, x) sorted
    for (size_t i = 0; i < m.keys.size(); ++i) {
      int64_t t = m.tiles[i], q = m.haars[i];
      int64_t slot = t * n + q;
      level_slots[ls_off + (int64_t)i] = (int32_t)slot;
      V2 pos = plan.centers[t] + off[q];
      for (int k = 0; k < 6; ++k) {
        V2 p2 = neighbour_pos(pos, scale, lit, fixup, k);
        int32_t u, q2;
        if (m.lookup(p2, &u, &q2)) {
          int32_t par = (int32_t)((int64_t)u * n + q2 / 2);
          if (k < 3) nbr_idx[slot * 6 + k] = (int32_t)((int64_t)u * n + q2);
          else nbr_idx[slot * 6 + k] = par;
          nbr_par[slot * 6 + k] = par;
        }
      }
    }
    ls_off += T * nL;
  }
  return 0;
}

}  // extern "C"

extern "C" {

// Source identity for the loader: csrc/Makefile injects the SHA-256 of
// geometry.cpp at compile time; frave_tpu/native.py refuses to load a
// build whose hash differs from the on-disk source (prevents silent drift
// of a stale binary).
#ifndef FG_SRC_SHA
#define FG_SRC_SHA "unknown"
#endif
const char* fg_source_sha(void) { return FG_SRC_SHA; }

// Longest-path (Kahn) layering over a dependency DAG with <= 3 deps/node.
// deps: [n * 3] int32 node ids or -1. out_wave: [n] int32.
// Returns 0 on success, 1 on cycle, 2 on out-of-range dependency id.
int fg_layer_waves(int64_t n, const int32_t* deps, int32_t* out_wave) {
  std::vector<int32_t> indeg(n, 0);
  std::vector<int64_t> head(n, -1);
  std::vector<int64_t> nxt;   // linked adjacency (successor lists)
  std::vector<int64_t> succ_node;
  nxt.reserve(n * 3);
  succ_node.reserve(n * 3);
  for (int64_t i = 0; i < n; ++i) {
    out_wave[i] = 0;
    for (int d = 0; d < 3; ++d) {
      int32_t u = deps[i * 3 + d];
      if (u >= n) return 2;  // malformed caller data must not read OOB
      if (u >= 0) {
        succ_node.push_back(i);
        nxt.push_back(head[u]);
        head[u] = (int64_t)succ_node.size() - 1;
        ++indeg[i];
      }
    }
  }
  std::vector<int64_t> q;
  q.reserve(n);
  for (int64_t i = 0; i < n; ++i)
    if (indeg[i] == 0) q.push_back(i);
  int64_t seen = 0;
  for (int64_t qi = 0; qi < (int64_t)q.size(); ++qi) {
    int64_t u = q[qi];
    ++seen;
    for (int64_t e = head[u]; e >= 0; e = nxt[e]) {
      int64_t v = succ_node[e];
      if (out_wave[u] + 1 > out_wave[v]) out_wave[v] = out_wave[u] + 1;
      if (--indeg[v] == 0) q.push_back(v);
    }
  }
  return seen == n ? 0 : 1;
}

}  // extern "C"
