// Shared fractal-geometry core for the native host components.
//
// Extracted from csrc/geometry.cpp (round 5) so the frif container
// codec (csrc/frif.cpp) can reuse the exact same plan/lattice machinery
// the geometry builder exports to Python — one definition, two users.
// Semantics notes and reference file:line anchors live in geometry.cpp.
#pragma once

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <deque>
#include <unordered_set>
#include <vector>

namespace frgeo {

struct V2 {
  int64_t x, y;
};

inline V2 operator+(V2 a, V2 b) { return {a.x + b.x, a.y + b.y}; }
inline V2 operator-(V2 a, V2 b) { return {a.x - b.x, a.y - b.y}; }

// literals generator — must match frave_tpu/fractal/literals.py
// generate_literals(n, d=1) bit-for-bit (IEEE double, same op order).
inline std::vector<V2> literals(int n) {
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
inline void nearby_vectors(int scale, const std::vector<V2>& lit, V2 out[6]) {
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

inline int64_t key_of(V2 p) {
  // matches geometry_fast._keys: (py + 2^20) * 2^21 + (px + 2^20)
  return (p.y + (int64_t(1) << 20)) * (int64_t(1) << 21) +
         (p.x + (int64_t(1) << 20));
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
inline V2 neighbour_pos(V2 pos, int scale, const std::vector<V2>& lit,
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
  std::vector<V2> centers;            // kept tiles, canonical (y, x) order
  std::vector<uint8_t> leaf_inb;      // [T * n]
  std::vector<int64_t> leaf_pixflat;  // [T * n] (-1 oob)
};

// full tree offsets: off[q] for q in [0, 2^(depth+1)) — every internal
// node and (at [n, 2n)) every leaf
inline std::vector<V2> tree_offsets_all(int depth, const std::vector<V2>& lit) {
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

inline bool make_plan(int height, int width, int depth, Plan* plan) {
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

}  // namespace frgeo
