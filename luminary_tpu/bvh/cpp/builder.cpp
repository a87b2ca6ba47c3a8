// Native binned-SAH BVH builder.
//
// The C++ twin of luminary_tpu/bvh/builder.py (same algorithm, same output
// contract) — fills the role of the reference's native SBVH builder
// (reference: src/luminary/device/bvh.c, dormant; src/luminary/device/
// device_light.c SAH machinery). The Python numpy builder stays as the
// always-available fallback; this one wins on large scenes (no per-node
// Python overhead) and is loaded through ctypes (no pybind11 in the image).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libbvh.so builder.cpp
//
// Exported ABI:
//   int lum_build_bvh(const float* corners /* [T,3,3] */, int num_tris,
//                     int leaf_size, int num_bins,
//                     float* child_min /* [cap,2,3] */,
//                     float* child_max /* [cap,2,3] */,
//                     int*   child     /* [cap,2]   */,
//                     int*   tri_order /* [T_blocks_cap*leaf]  */,
//                     int    node_cap, int order_cap,
//                     int* out_num_nodes, int* out_num_blocks);
// Returns 0 on success, <0 on error (-1 capacity, -2 args).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr int32_t kInvalid = 0x7FFFFFFF;

struct V3 {
  float x, y, z;
};

static inline V3 vmin(const V3& a, const V3& b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
static inline V3 vmax(const V3& a, const V3& b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

struct AABB {
  V3 lo{std::numeric_limits<float>::infinity(),
        std::numeric_limits<float>::infinity(),
        std::numeric_limits<float>::infinity()};
  V3 hi{-std::numeric_limits<float>::infinity(),
        -std::numeric_limits<float>::infinity(),
        -std::numeric_limits<float>::infinity()};
  void grow(const AABB& o) {
    lo = vmin(lo, o.lo);
    hi = vmax(hi, o.hi);
  }
  void grow(const V3& p) {
    lo = vmin(lo, p);
    hi = vmax(hi, p);
  }
  float area() const {
    float dx = std::max(hi.x - lo.x, 0.f);
    float dy = std::max(hi.y - lo.y, 0.f);
    float dz = std::max(hi.z - lo.z, 0.f);
    return 2.f * (dx * dy + dy * dz + dz * dx);
  }
};

struct Builder {
  const float* corners;
  int num_tris, leaf_size, num_bins;
  float* child_min;
  float* child_max;
  int32_t* child;
  int32_t* tri_order;
  int node_cap, order_cap;
  int num_nodes = 1;  // root reserved at 0
  int num_blocks = 0;
  bool overflow = false;

  std::vector<AABB> tri_box;
  std::vector<V3> centroid;
  std::vector<int32_t> index;  // permuted triangle ids

  void init() {
    tri_box.resize(num_tris);
    centroid.resize(num_tris);
    index.resize(num_tris);
    for (int i = 0; i < num_tris; ++i) {
      const float* c = corners + size_t(i) * 9;
      AABB b;
      for (int k = 0; k < 3; ++k) b.grow(V3{c[3 * k], c[3 * k + 1], c[3 * k + 2]});
      tri_box[i] = b;
      centroid[i] = {0.5f * (b.lo.x + b.hi.x), 0.5f * (b.lo.y + b.hi.y),
                     0.5f * (b.lo.z + b.hi.z)};
      index[i] = i;
    }
  }

  int alloc_node() {
    if (num_nodes >= node_cap) {
      overflow = true;
      return 0;
    }
    int n = num_nodes++;
    child[2 * n] = kInvalid;
    child[2 * n + 1] = kInvalid;
    return n;
  }

  int32_t make_leaf(int begin, int count, AABB& bounds) {
    bounds = AABB{};
    for (int i = begin; i < begin + count; ++i) bounds.grow(tri_box[index[i]]);
    if ((num_blocks + 1) * leaf_size > order_cap) {
      overflow = true;
      return ~0;
    }
    int block = num_blocks++;
    for (int k = 0; k < leaf_size; ++k)
      tri_order[block * leaf_size + k] = (k < count) ? index[begin + k] : -1;
    return ~block;
  }

  // Build subtree over index[begin, begin+count); returns child code and the
  // subtree bounds.
  int32_t build(int begin, int count, AABB& bounds) {
    if (overflow) return kInvalid;
    if (count <= leaf_size) return make_leaf(begin, count, bounds);

    // centroid bounds
    AABB cb;
    for (int i = begin; i < begin + count; ++i) cb.grow(centroid[index[i]]);
    float ext[3] = {cb.hi.x - cb.lo.x, cb.hi.y - cb.lo.y, cb.hi.z - cb.lo.z};
    int axis = 0;
    if (ext[1] > ext[0]) axis = 1;
    if (ext[2] > ext[axis]) axis = 2;

    int mid;
    if (ext[axis] <= 1e-12f) {
      mid = begin + count / 2;  // degenerate: median split
    } else {
      // binned SAH
      const int B = num_bins;
      std::vector<int> cnt(B, 0);
      std::vector<AABB> bb(B);
      float lo = axis == 0 ? cb.lo.x : (axis == 1 ? cb.lo.y : cb.lo.z);
      float scale = B * (1.f - 1e-6f) / ext[axis];
      auto bin_of = [&](int tri) {
        const V3& c = centroid[tri];
        float v = axis == 0 ? c.x : (axis == 1 ? c.y : c.z);
        int b = int((v - lo) * scale);
        return std::min(std::max(b, 0), B - 1);
      };
      for (int i = begin; i < begin + count; ++i) {
        int b = bin_of(index[i]);
        cnt[b]++;
        bb[b].grow(tri_box[index[i]]);
      }
      // sweep
      std::vector<float> right_sa(B, 0.f);
      std::vector<int> right_cnt(B, 0);
      AABB acc;
      int rc = 0;
      for (int b = B - 1; b >= 1; --b) {
        acc.grow(bb[b]);
        rc += cnt[b];
        right_sa[b] = acc.area();
        right_cnt[b] = rc;
      }
      acc = AABB{};
      int lc = 0;
      float best = std::numeric_limits<float>::infinity();
      int best_bin = -1;
      for (int b = 0; b < B - 1; ++b) {
        acc.grow(bb[b]);
        lc += cnt[b];
        if (lc == 0 || right_cnt[b + 1] == 0) continue;
        float cost = acc.area() * lc + right_sa[b + 1] * right_cnt[b + 1];
        if (cost < best) {
          best = cost;
          best_bin = b;
        }
      }
      if (best_bin < 0) {
        mid = begin + count / 2;
        std::nth_element(
            index.begin() + begin, index.begin() + mid,
            index.begin() + begin + count, [&](int a, int b) {
              const V3 &ca = centroid[a], &cb2 = centroid[b];
              float va = axis == 0 ? ca.x : (axis == 1 ? ca.y : ca.z);
              float vb = axis == 0 ? cb2.x : (axis == 1 ? cb2.y : cb2.z);
              return va < vb;
            });
      } else {
        auto it = std::partition(
            index.begin() + begin, index.begin() + begin + count,
            [&](int t) { return bin_of(t) <= best_bin; });
        mid = int(it - index.begin());
        if (mid == begin || mid == begin + count) mid = begin + count / 2;
      }
    }
    if (mid == begin || mid == begin + count) mid = begin + count / 2;

    int node = alloc_node();
    AABB lb, rb;
    int32_t lcode = build(begin, mid - begin, lb);
    int32_t rcode = build(mid, begin + count - mid, rb);
    if (overflow) return kInvalid;
    child[2 * node] = lcode;
    child[2 * node + 1] = rcode;
    float* cm = child_min + size_t(node) * 6;
    float* cx = child_max + size_t(node) * 6;
    cm[0] = lb.lo.x; cm[1] = lb.lo.y; cm[2] = lb.lo.z;
    cm[3] = rb.lo.x; cm[4] = rb.lo.y; cm[5] = rb.lo.z;
    cx[0] = lb.hi.x; cx[1] = lb.hi.y; cx[2] = lb.hi.z;
    cx[3] = rb.hi.x; cx[4] = rb.hi.y; cx[5] = rb.hi.z;
    bounds = lb;
    bounds.grow(rb);
    return node;
  }
};

}  // namespace

extern "C" int lum_build_bvh(
    const float* corners, int num_tris, int leaf_size, int num_bins,
    float* child_min, float* child_max, int32_t* child, int32_t* tri_order,
    int node_cap, int order_cap, int* out_num_nodes, int* out_num_blocks) {
  if (!corners || !child_min || !child_max || !child || !tri_order ||
      num_tris < 0 || leaf_size < 1 || num_bins < 2 || node_cap < 1)
    return -2;

  // zero the root
  std::memset(child_min, 0, sizeof(float) * 6);
  std::memset(child_max, 0, sizeof(float) * 6);
  child[0] = kInvalid;
  child[1] = kInvalid;

  Builder b{corners, num_tris, leaf_size, num_bins,
            child_min, child_max, child, tri_order, node_cap, order_cap};
  if (num_tris == 0) {
    for (int k = 0; k < leaf_size && k < order_cap; ++k) tri_order[k] = -1;
    *out_num_nodes = 1;
    *out_num_blocks = 1;
    return 0;
  }
  b.init();

  AABB root_bounds;
  int32_t code = b.build(0, num_tris, root_bounds);
  if (b.overflow) return -1;

  if (code < 0) {
    // whole scene in one leaf: hang it off the root
    child[0] = code;
    child[1] = kInvalid;
    float* cm = child_min;
    float* cx = child_max;
    cm[0] = root_bounds.lo.x; cm[1] = root_bounds.lo.y; cm[2] = root_bounds.lo.z;
    cx[0] = root_bounds.hi.x; cx[1] = root_bounds.hi.y; cx[2] = root_bounds.hi.z;
    cm[3] = root_bounds.lo.x; cm[4] = root_bounds.lo.y; cm[5] = root_bounds.lo.z;
    cx[3] = root_bounds.lo.x; cx[4] = root_bounds.lo.y; cx[5] = root_bounds.lo.z;
  } else if (code != 0) {
    // move the real root into slot 0, kill the duplicate
    std::memcpy(child_min, child_min + size_t(code) * 6, sizeof(float) * 6);
    std::memcpy(child_max, child_max + size_t(code) * 6, sizeof(float) * 6);
    child[0] = child[2 * code];
    child[1] = child[2 * code + 1];
    child[2 * code] = kInvalid;
    child[2 * code + 1] = kInvalid;
  }
  *out_num_nodes = b.num_nodes;
  *out_num_blocks = std::max(b.num_blocks, 1);
  return 0;
}
