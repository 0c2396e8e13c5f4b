// Native SAH BVH builder for clive2-tpu.
//
// Host-side replacement for the numpy full-sweep SAH build
// (clive2_tpu/bvh/build.py) — same algorithm, same flat output layout
// (DFS-preorder threaded tree with miss links), ~50x faster on the
// single-core hosts this deployment runs on.  The reference kept its
// builder in numpy+numba (reference bvh.py); here the builder is the
// framework's native runtime component.
//
// Exposed via a C ABI consumed with ctypes (clive2_tpu/bvh/native.py).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

struct V3 {
  float x, y, z;
};

static inline V3 vmin(const V3 &a, const V3 &b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
static inline V3 vmax(const V3 &a, const V3 &b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}
static inline double surface_area(const V3 &mn, const V3 &mx) {
  double sx = mx.x - mn.x, sy = mx.y - mn.y, sz = mx.z - mn.z;
  return 2.0 * (sx * sy + sy * sz + sz * sx);
}

struct BuildNode {
  V3 mn, mx;
  int64_t left = -1, right = -1;   // children (build ids)
  int64_t tri_begin = 0, tri_end = 0;  // into the shared index array (leaves)
};

}  // namespace

extern "C" int64_t clive2_build_bvh(
    int64_t n_tris, const float *mins, const float *maxes,
    int64_t max_members,
    float *out_node_mins, float *out_node_maxes, int32_t *out_miss,
    int32_t *out_right, int32_t *out_tri_start, int32_t *out_tri_count,
    int32_t *out_leaf_id, int32_t *out_permutation) {
  if (n_tris <= 0) return -1;

  std::vector<V3> tmin(n_tris), tmax(n_tris), center(n_tris);
  for (int64_t i = 0; i < n_tris; ++i) {
    tmin[i] = {mins[3 * i], mins[3 * i + 1], mins[3 * i + 2]};
    tmax[i] = {maxes[3 * i], maxes[3 * i + 1], maxes[3 * i + 2]};
    center[i] = {(tmin[i].x + tmax[i].x) * 0.5f,
                 (tmin[i].y + tmax[i].y) * 0.5f,
                 (tmin[i].z + tmax[i].z) * 0.5f};
  }

  // one shared index array; each node owns a contiguous [begin, end) slice
  std::vector<int64_t> idx(n_tris);
  for (int64_t i = 0; i < n_tris; ++i) idx[i] = i;

  std::vector<BuildNode> nodes;
  nodes.reserve(2 * n_tris);

  auto make_node = [&](int64_t begin, int64_t end) -> int64_t {
    BuildNode nd;
    nd.tri_begin = begin;
    nd.tri_end = end;
    V3 mn = {std::numeric_limits<float>::infinity(),
             std::numeric_limits<float>::infinity(),
             std::numeric_limits<float>::infinity()};
    V3 mx = {-mn.x, -mn.y, -mn.z};
    for (int64_t i = begin; i < end; ++i) {
      mn = vmin(mn, tmin[idx[i]]);
      mx = vmax(mx, tmax[idx[i]]);
    }
    nd.mn = mn;
    nd.mx = mx;
    nodes.push_back(nd);
    return static_cast<int64_t>(nodes.size()) - 1;
  };

  // scratch for the SAH sweep
  std::vector<int64_t> order;
  std::vector<double> left_sa, right_sa;

  int64_t root = make_node(0, n_tris);
  std::vector<int64_t> stack = {root};
  while (!stack.empty()) {
    int64_t ni = stack.back();
    stack.pop_back();
    int64_t begin = nodes[ni].tri_begin, end = nodes[ni].tri_end;
    int64_t m = end - begin;
    if (m <= max_members) continue;

    double best_sah = std::numeric_limits<double>::infinity();
    int64_t best_i = 1;
    int best_axis = 0;
    order.resize(m);
    left_sa.resize(m);
    right_sa.resize(m);

    auto sort_axis = [&](int axis) {
      std::copy(idx.begin() + begin, idx.begin() + end, order.begin());
      auto key = [&](int64_t a) {
        return axis == 0 ? center[a].x : axis == 1 ? center[a].y : center[a].z;
      };
      std::stable_sort(order.begin(), order.end(),
                       [&](int64_t a, int64_t b) { return key(a) < key(b); });
    };

    for (int axis = 0; axis < 3; ++axis) {
      sort_axis(axis);

      V3 mn = tmin[order[0]], mx = tmax[order[0]];
      left_sa[0] = surface_area(mn, mx);
      for (int64_t i = 1; i < m; ++i) {
        mn = vmin(mn, tmin[order[i]]);
        mx = vmax(mx, tmax[order[i]]);
        left_sa[i] = surface_area(mn, mx);
      }
      mn = tmin[order[m - 1]];
      mx = tmax[order[m - 1]];
      right_sa[m - 1] = surface_area(mn, mx);
      for (int64_t i = m - 2; i >= 0; --i) {
        mn = vmin(mn, tmin[order[i]]);
        mx = vmax(mx, tmax[order[i]]);
        right_sa[i] = surface_area(mn, mx);
      }
      // split after position i: left count i+1, right count m-i-1
      for (int64_t i = 0; i < m - 1; ++i) {
        double sah = left_sa[i] * double(i + 1) + right_sa[i + 1] * double(m - i - 1);
        if (sah < best_sah) {
          best_sah = sah;
          best_i = i + 1;
          best_axis = axis;
        }
      }
    }

    if (best_axis != 2) sort_axis(best_axis);  // axis 2's order is current
    std::copy(order.begin(), order.end(), idx.begin() + begin);
    int64_t mid = begin + best_i;
    int64_t li = make_node(begin, mid);
    int64_t ri = make_node(mid, end);
    nodes[ni].left = li;
    nodes[ni].right = ri;
    stack.push_back(ri);
    stack.push_back(li);
  }

  int64_t n_nodes = static_cast<int64_t>(nodes.size());

  // subtree sizes (children always have larger build ids -> reverse scan)
  std::vector<int64_t> size(n_nodes, 1);
  for (int64_t i = n_nodes - 1; i >= 0; --i) {
    if (nodes[i].left >= 0) size[i] = 1 + size[nodes[i].left] + size[nodes[i].right];
  }

  // preorder emission with miss links
  struct Item {
    int64_t node, slot, miss;
  };
  std::vector<Item> estack = {{root, 0, n_nodes}};
  int64_t tri_cursor = 0;
  int32_t leaf_cursor = 0;
  while (!estack.empty()) {
    Item it = estack.back();
    estack.pop_back();
    const BuildNode &nd = nodes[it.node];
    out_node_mins[3 * it.slot] = nd.mn.x;
    out_node_mins[3 * it.slot + 1] = nd.mn.y;
    out_node_mins[3 * it.slot + 2] = nd.mn.z;
    out_node_maxes[3 * it.slot] = nd.mx.x;
    out_node_maxes[3 * it.slot + 1] = nd.mx.y;
    out_node_maxes[3 * it.slot + 2] = nd.mx.z;
    out_miss[it.slot] = static_cast<int32_t>(it.miss);
    if (nd.left >= 0) {
      int64_t left_slot = it.slot + 1;
      int64_t right_slot = it.slot + 1 + size[nd.left];
      out_right[it.slot] = static_cast<int32_t>(right_slot);
      out_tri_start[it.slot] = 0;
      out_tri_count[it.slot] = 0;
      out_leaf_id[it.slot] = -1;
      estack.push_back({nd.right, right_slot, it.miss});
      estack.push_back({nd.left, left_slot, right_slot});
    } else {
      int64_t c = nd.tri_end - nd.tri_begin;
      out_right[it.slot] = 0;
      out_tri_start[it.slot] = static_cast<int32_t>(tri_cursor);
      out_tri_count[it.slot] = static_cast<int32_t>(c);
      out_leaf_id[it.slot] = leaf_cursor++;
      for (int64_t i = 0; i < c; ++i) {
        out_permutation[tri_cursor + i] =
            static_cast<int32_t>(idx[nd.tri_begin + i]);
      }
      tri_cursor += c;
    }
  }

  if (tri_cursor != n_tris) return -2;  // invariant violated
  return n_nodes;
}
