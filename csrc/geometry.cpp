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

#include "geometry_core.h"

using namespace frgeo;

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
