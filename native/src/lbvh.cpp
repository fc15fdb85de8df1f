// Native LBVH builder: Morton codes -> radix sort -> Karras binary radix
// tree -> threaded preorder layout with escape links.
//
// The C++ counterpart of parallelraytracing_tpu/accel/lbvh.py: identical
// output arrays (bit-identical topology for identical inputs), built for
// large meshes where the Python DFS/threading loops are interpreter-bound
// (an 870k-triangle dragon builds here in tens of milliseconds).  Exposed
// as a C ABI consumed via ctypes (native.py); the Python builder remains
// the reference implementation and fallback.
//
// Mirrors the roles of the reference's acceleration-structure build
// (OptiX GAS/IAS, /root/reference/src/backend/optix/renderer.cpp:703-871)
// without any of its code: this builds the tree itself instead of calling
// optixAccelBuild.

#include <algorithm>
#include <array>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline uint64_t expand_bits(uint64_t v) {
  v = (v * 0x00010001ULL) & 0xFF0000FFULL;
  v = (v * 0x00000101ULL) & 0x0F00F00FULL;
  v = (v * 0x00000011ULL) & 0xC30C30C3ULL;
  v = (v * 0x00000005ULL) & 0x49249249ULL;
  return v;
}

inline uint64_t morton3d(double x, double y, double z) {
  auto q = [](double f) {
    double s = f * 1024.0;
    if (s < 0.0) s = 0.0;
    if (s > 1023.0) s = 1023.0;
    return static_cast<uint64_t>(s);
  };
  return (expand_bits(q(x)) << 2) | (expand_bits(q(y)) << 1) | expand_bits(q(z));
}

inline int clz64(uint64_t x) {
  return x == 0 ? 64 : __builtin_clzll(x);
}

struct Builder {
  int64_t n;
  const uint64_t* keys;  // sorted unique

  int delta(int64_t a, int64_t b) const {
    if (b < 0 || b >= n) return -1;
    return clz64(keys[a] ^ keys[b]);
  }
};

}  // namespace

extern "C" {

// Build the threaded LBVH.
//
// Inputs:  prim_min/prim_max: (n,3) f64 world AABBs (row-major).
// Outputs (caller-allocated, m = 2n-1):
//   node_min/node_max: (m,3) f64
//   node_leaf: (m,) i32  (1 = leaf)
//   node_payload: (m,) i32  (leaf: index into the morton-sorted order;
//                            internal: internal-node id)
//   node_miss: (m,) i32  escape links (-1 terminates)
//   order_out: (n,) i32  the morton sort order (payload -> original prim)
// Returns 0 on success.
int prt_build_lbvh(const double* prim_min, const double* prim_max,
                   int64_t n, double* node_min, double* node_max,
                   int32_t* node_leaf, int32_t* node_payload,
                   int32_t* node_miss, int32_t* order_out) {
  if (n <= 0) return 1;
  if (n == 1) {
    std::memcpy(node_min, prim_min, 3 * sizeof(double));
    std::memcpy(node_max, prim_max, 3 * sizeof(double));
    node_leaf[0] = 1;
    node_payload[0] = 0;
    node_miss[0] = -1;
    order_out[0] = 0;
    return 0;
  }

  // Morton codes over centroid extent.
  std::vector<double> cx(n), cy(n), cz(n);
  double lo[3] = {1e300, 1e300, 1e300}, hi[3] = {-1e300, -1e300, -1e300};
  for (int64_t i = 0; i < n; ++i) {
    double c[3];
    for (int k = 0; k < 3; ++k) {
      c[k] = 0.5 * (prim_min[3 * i + k] + prim_max[3 * i + k]);
      lo[k] = std::min(lo[k], c[k]);
      hi[k] = std::max(hi[k], c[k]);
    }
    cx[i] = c[0]; cy[i] = c[1]; cz[i] = c[2];
  }
  double ext[3];
  for (int k = 0; k < 3; ++k) ext[k] = std::max(hi[k] - lo[k], 1e-12);

  std::vector<uint64_t> code(n);
  std::vector<int64_t> order(n);
  for (int64_t i = 0; i < n; ++i) {
    code[i] = morton3d((cx[i] - lo[0]) / ext[0], (cy[i] - lo[1]) / ext[1],
                       (cz[i] - lo[2]) / ext[2]);
    order[i] = i;
  }
  std::stable_sort(order.begin(), order.end(),
                   [&](int64_t a, int64_t b) { return code[a] < code[b]; });

  std::vector<uint64_t> keys(n);
  for (int64_t i = 0; i < n; ++i) {
    keys[i] = (code[order[i]] << 31) | static_cast<uint64_t>(i);
    order_out[i] = static_cast<int32_t>(order[i]);
  }

  Builder B{n, keys.data()};

  // Karras 2012: children of the n-1 internal nodes (leaf encoded as ~x).
  std::vector<int64_t> left(n - 1), right(n - 1);
  for (int64_t i = 0; i < n - 1; ++i) {
    int d = (B.delta(i, i + 1) - B.delta(i, i - 1)) >= 0 ? 1 : -1;
    int delta_min = B.delta(i, i - d);
    int64_t lmax = 2;
    while (B.delta(i, i + lmax * d) > delta_min) lmax *= 2;
    int64_t l = 0;
    for (int64_t t = lmax / 2; t >= 1; t /= 2)
      if (B.delta(i, i + (l + t) * d) > delta_min) l += t;
    int64_t j = i + l * d;
    int delta_node = B.delta(i, j);
    int64_t s = 0;
    for (int64_t div = 2;; div *= 2) {
      int64_t t = (l + div - 1) / div;
      if (B.delta(i, i + (s + t) * d) > delta_node) s += t;
      if (t <= 1) break;
    }
    int64_t gamma = i + s * d + std::min<int64_t>(d, 0);
    int64_t a = std::min(i, j), b = std::max(i, j);
    left[i] = (a == gamma) ? ~gamma : gamma;
    right[i] = (b == gamma + 1) ? ~(gamma + 1) : gamma + 1;
  }

  // Subtree sizes (iterative postorder).
  std::vector<int64_t> size(n - 1, -1);
  {
    std::vector<std::pair<int64_t, bool>> st;
    st.emplace_back(0, false);
    while (!st.empty()) {
      auto [node, processed] = st.back();
      st.pop_back();
      int64_t lc = left[node], rc = right[node];
      int64_t ls = lc < 0 ? 1 : size[lc];
      int64_t rs = rc < 0 ? 1 : size[rc];
      if (processed || (ls > 0 && rs > 0)) {
        size[node] = 1 + ls + rs;
      } else {
        st.emplace_back(node, true);
        if (lc >= 0 && size[lc] < 0) st.emplace_back(lc, false);
        if (rc >= 0 && size[rc] < 0) st.emplace_back(rc, false);
      }
    }
  }

  // Preorder threading with escape links.
  int64_t m = 2 * n - 1;
  {
    struct Ent { int64_t code; bool leaf; int64_t escape; };
    std::vector<Ent> st;
    st.push_back({0, false, -1});
    int64_t out = 0;
    while (!st.empty()) {
      Ent e = st.back();
      st.pop_back();
      int64_t idx = out++;
      node_leaf[idx] = e.leaf ? 1 : 0;
      node_payload[idx] = static_cast<int32_t>(e.code);
      node_miss[idx] = static_cast<int32_t>(e.escape);
      if (!e.leaf) {
        int64_t lc = left[e.code], rc = right[e.code];
        bool ll = lc < 0, rl = rc < 0;
        int64_t lcode = ll ? ~lc : lc, rcode = rl ? ~rc : rc;
        int64_t lsize = ll ? 1 : size[lcode];
        int64_t right_slot = idx + 1 + lsize;
        st.push_back({rcode, rl, e.escape});
        st.push_back({lcode, ll, right_slot});
      }
    }
    if (out != m) return 2;
  }

  // AABBs: leaves from prims; internal by reverse-preorder stack union.
  {
    std::vector<std::array<double, 6>> tmp(m);
    std::vector<int64_t> st;
    for (int64_t s = m - 1; s >= 0; --s) {
      if (node_leaf[s]) {
        int64_t prim = order[node_payload[s]];
        for (int k = 0; k < 3; ++k) {
          tmp[s][k] = prim_min[3 * prim + k];
          tmp[s][3 + k] = prim_max[3 * prim + k];
        }
        st.push_back(s);
      } else {
        int64_t c1 = st.back(); st.pop_back();
        int64_t c2 = st.back(); st.pop_back();
        for (int k = 0; k < 3; ++k) {
          tmp[s][k] = std::min(tmp[c1][k], tmp[c2][k]);
          tmp[s][3 + k] = std::max(tmp[c1][3 + k], tmp[c2][3 + k]);
        }
        st.push_back(s);
      }
    }
    for (int64_t s = 0; s < m; ++s) {
      for (int k = 0; k < 3; ++k) {
        node_min[3 * s + k] = tmp[s][k];
        node_max[3 * s + k] = tmp[s][3 + k];
      }
    }
  }
  return 0;
}

}  // extern "C"
