// Native BVH builder.
//
// The host-side counterpart of mrt/geometry/bvh.py::build — identical
// semantics (float64 math, deterministic widest-axis median split,
// stable sort, depth-first layout with escape indices) so the two
// builders produce bit-identical node arrays; the Python one remains
// as the fallback and as the executable specification.
//
// The reference builds its BVH with recursive Vec sorting in Rust
// (reference: src/geom.rs:109-162); at Menger scale (3.2M instances,
// scenes/menger.rs) the Python builder takes minutes while this one
// takes ~1s.
//
// Build: g++ -O3 -shared -fPIC -o libmrt_native.so bvh_builder.cpp

#include <algorithm>
#include <cstdint>
#include <vector>

namespace {

struct Builder {
  const double* cent;   // (n,3) centroids
  const double* bmin;   // (n,3)
  const double* bmax;   // (n,3)
  int leaf_size;
  int64_t* order;       // (n) permutation, in/out
  // Output node arrays (capacity 2n), SoA:
  double* node_bmin;
  double* node_bmax;
  int32_t* node_first;
  int32_t* node_count;
  int32_t* node_escape;
  int32_t n_nodes = 0;

  std::vector<int64_t> scratch;

  int32_t build_range(int64_t start, int64_t end) {
    const int32_t idx = n_nodes++;
    double bb_min[3] = {1e300, 1e300, 1e300};
    double bb_max[3] = {-1e300, -1e300, -1e300};
    for (int64_t i = start; i < end; ++i) {
      const int64_t p = order[i];
      for (int k = 0; k < 3; ++k) {
        bb_min[k] = std::min(bb_min[k], bmin[p * 3 + k]);
        bb_max[k] = std::max(bb_max[k], bmax[p * 3 + k]);
      }
    }
    for (int k = 0; k < 3; ++k) {
      node_bmin[idx * 3 + k] = bb_min[k];
      node_bmax[idx * 3 + k] = bb_max[k];
    }
    const int64_t n = end - start;
    if (n <= leaf_size) {
      node_first[idx] = static_cast<int32_t>(start);
      node_count[idx] = static_cast<int32_t>(n);
      node_escape[idx] = idx + 1;
      return idx;
    }
    // Widest axis; ties resolve to the lowest index like np.argmax.
    int axis = 0;
    double widest = bb_max[0] - bb_min[0];
    for (int k = 1; k < 3; ++k) {
      const double w = bb_max[k] - bb_min[k];
      if (w > widest) {
        widest = w;
        axis = k;
      }
    }
    // Stable sort on the centroid component == np.argsort(kind=stable).
    scratch.assign(order + start, order + end);
    std::stable_sort(scratch.begin(), scratch.end(),
                     [&](int64_t a, int64_t b) {
                       return cent[a * 3 + axis] < cent[b * 3 + axis];
                     });
    std::copy(scratch.begin(), scratch.end(), order + start);

    node_first[idx] = 0;
    node_count[idx] = 0;
    const int64_t mid = start + n / 2;
    build_range(start, mid);
    build_range(mid, end);
    node_escape[idx] = n_nodes;  // index after my subtree
    return idx;
  }
};

}  // namespace

extern "C" {

// Returns the node count (<= 2n); arrays must have capacity 2n.
int32_t mrt_bvh_build(const double* cent, const double* bmin,
                      const double* bmax, int64_t n, int32_t leaf_size,
                      double* node_bmin, double* node_bmax,
                      int32_t* node_first, int32_t* node_count,
                      int32_t* node_escape, int64_t* order) {
  for (int64_t i = 0; i < n; ++i) order[i] = i;
  Builder b{cent, bmin, bmax, leaf_size, order,
            node_bmin, node_bmax, node_first, node_count, node_escape};
  b.build_range(0, n);
  return b.n_nodes;
}

}  // extern "C"
