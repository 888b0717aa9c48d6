// Native host-side runtime for fast_gicp_tpu: point-cloud I/O, voxel-grid
// downsampling, and a multithreaded kd-tree k-NN search.
//
// This is the TPU framework's equivalent of the reference's host-side native
// layer: PCL's I/O + ApproximateVoxelGrid (align.cpp:22-36) and the
// CPU_PARALLEL_KDTREE neighbor path that feeds device covariance estimation
// (fast_vgicp_cuda_impl.hpp:152-167).  Written from scratch; exposed as a C
// ABI for ctypes (no pybind11 in this environment).
//
// Build: cmake -S native -B native/build && cmake --build native/build
// Produces libfast_gicp_native.so.

#include <algorithm>
#include <array>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <numeric>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

// ---------------------------------------------------------------- kd-tree
// Static balanced kd-tree over 3D points: nodes are a permutation of point
// indices arranged as an implicit binary tree (nth_element median splits).
struct KdTree {
  std::vector<float> pts;       // (n, 3) row-major copy
  std::vector<int> perm;        // implicit-tree ordering of point indices
  std::vector<uint8_t> axis_;   // split axis per tree slot
  int n = 0;

  void build(const float* points, int n_points) {
    n = n_points;
    pts.assign(points, points + 3 * size_t(n));
    perm.resize(n);
    std::iota(perm.begin(), perm.end(), 0);
    axis_.assign(n, 0);
    build_range(0, n, 0);
  }

  // Implicit layout: subtree occupying [lo, hi); the median element sits at
  // position lo + left_size, where left subtree fills [lo, lo+left_size).
  // We store instead: root of subtree at `lo`, partitioned so that
  // [lo+1, mid] is left, (mid, hi) is right -- simpler: recursive with the
  // median stored at position `mid`.
  void build_range(int lo, int hi, int depth) {
    if (hi - lo <= 1) return;
    int mid = (lo + hi) / 2;
    // Pick the split axis with the largest spread (cheap variance proxy).
    float mn[3] = {1e30f, 1e30f, 1e30f}, mx[3] = {-1e30f, -1e30f, -1e30f};
    for (int i = lo; i < hi; i++) {
      const float* p = &pts[3 * size_t(perm[i])];
      for (int a = 0; a < 3; a++) {
        mn[a] = std::min(mn[a], p[a]);
        mx[a] = std::max(mx[a], p[a]);
      }
    }
    int ax = 0;
    float best = mx[0] - mn[0];
    for (int a = 1; a < 3; a++)
      if (mx[a] - mn[a] > best) best = mx[a] - mn[a], ax = a;
    axis_[mid] = uint8_t(ax);
    std::nth_element(
        perm.begin() + lo, perm.begin() + mid, perm.begin() + hi,
        [&](int a, int b) { return pts[3 * size_t(a) + ax] < pts[3 * size_t(b) + ax]; });
    build_range(lo, mid, depth + 1);
    build_range(mid + 1, hi, depth + 1);
  }

  void knn(const float* q, int k, int* out_idx, float* out_dist) const {
    // simple pair-based bounded heap
    std::vector<std::pair<float, int>> heap;
    heap.reserve(size_t(k) + 1);
    search(0, n, q, k, heap);
    std::sort_heap(heap.begin(), heap.end());
    int m = int(heap.size());
    for (int i = 0; i < m; i++) {
      out_dist[i] = heap[size_t(i)].first;
      out_idx[i] = heap[size_t(i)].second;
    }
    for (int i = m; i < k; i++) {  // degenerate: fewer points than k
      out_dist[i] = m ? out_dist[m - 1] : 1e30f;
      out_idx[i] = m ? out_idx[m - 1] : 0;
    }
  }

  void search(int lo, int hi, const float* q, int k,
              std::vector<std::pair<float, int>>& heap) const {
    if (hi <= lo) return;
    int mid = (lo + hi) / 2;
    const int pi = perm[mid];
    const float* p = &pts[3 * size_t(pi)];
    float dx = q[0] - p[0], dy = q[1] - p[1], dz = q[2] - p[2];
    float dist = dx * dx + dy * dy + dz * dz;
    if (int(heap.size()) < k) {
      heap.emplace_back(dist, pi);
      std::push_heap(heap.begin(), heap.end());
    } else if (dist < heap.front().first) {
      std::pop_heap(heap.begin(), heap.end());
      heap.back() = {dist, pi};
      std::push_heap(heap.begin(), heap.end());
    }
    if (hi - lo == 1) return;
    int ax = axis_[mid];
    float delta = q[ax] - p[ax];
    float worst = int(heap.size()) < k ? 1e30f : heap.front().first;
    if (delta <= 0.f) {
      search(lo, mid, q, k, heap);
      worst = int(heap.size()) < k ? 1e30f : heap.front().first;
      if (delta * delta < worst) search(mid + 1, hi, q, k, heap);
    } else {
      search(mid + 1, hi, q, k, heap);
      worst = int(heap.size()) < k ? 1e30f : heap.front().first;
      if (delta * delta < worst) search(lo, mid, q, k, heap);
    }
  }
};

void parallel_for(int n, int n_threads, const std::function<void(int, int)>& fn) {
  if (n_threads <= 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> threads;
  int chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; t++) {
    int lo = t * chunk, hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back([=, &fn] { fn(lo, hi); });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// -------------------------------------------------------------- kd-tree API
void* kdtree_build(const float* points, int n) {
  auto* tree = new KdTree();
  tree->build(points, n);
  return tree;
}

void kdtree_free(void* handle) { delete static_cast<KdTree*>(handle); }

// Flat (n_queries * k) outputs, matching the reference's flat neighbor
// array layout (fast_vgicp_cuda_impl.hpp:152-167).
void kdtree_knn(void* handle, const float* queries, int n_queries, int k,
                int n_threads, int* out_idx, float* out_dist) {
  auto* tree = static_cast<KdTree*>(handle);
  if (n_threads <= 0) n_threads = int(std::thread::hardware_concurrency());
  parallel_for(n_queries, n_threads, [&](int lo, int hi) {
    for (int i = lo; i < hi; i++) {
      tree->knn(&queries[3 * size_t(i)], k, &out_idx[size_t(i) * k],
                &out_dist[size_t(i) * k]);
    }
  });
}

// One-shot build + query + free.
void knn_search(const float* points, int n, const float* queries,
                int n_queries, int k, int n_threads, int* out_idx,
                float* out_dist) {
  KdTree tree;
  tree.build(points, n);
  if (n_threads <= 0) n_threads = int(std::thread::hardware_concurrency());
  parallel_for(n_queries, n_threads, [&](int lo, int hi) {
    for (int i = lo; i < hi; i++) {
      tree.knn(&queries[3 * size_t(i)], k, &out_idx[size_t(i) * k],
               &out_dist[size_t(i) * k]);
    }
  });
}

// ------------------------------------------------------- voxel downsample
// Centroid-per-voxel grid filter (pcl::VoxelGrid equivalent). Returns the
// number of output points; out_points must hold >= n floats * 3.
//
// Multithreaded two-phase build: phase 1 computes every point's voxel key
// and ownership hash in parallel slices; phase 2 gives each thread the
// cells whose hash % n_threads it owns — each thread scans the precomputed
// key array (16 B/point, memory-bound and cheap) and accumulates only its
// own cells, so no locks and a deterministic result.
int voxel_downsample_mt(const float* points, int n, float resolution,
                        int n_threads, float* out_points) {
  struct Key {
    int32_t x, y, z;
    bool operator==(const Key& o) const {
      return x == o.x && y == o.y && z == o.z;
    }
  };
  struct KeyHash {
    size_t operator()(const Key& k) const {
      // exact key comparison above makes any mixing collision-safe
      uint64_t h = uint64_t(uint32_t(k.x)) * 73856093u;
      h ^= uint64_t(uint32_t(k.y)) * 19349669u;
      h ^= uint64_t(uint32_t(k.z)) * 83492791u;
      return size_t(h);
    }
  };
  using CellMap =
      std::unordered_map<Key, std::pair<std::array<double, 3>, int>, KeyHash>;

  if (n_threads <= 0) n_threads = int(std::thread::hardware_concurrency());
  n_threads = std::max(1, std::min(n_threads, 64));

  const double inv = 1.0 / double(resolution);
  std::vector<Key> keys(static_cast<size_t>(n));
  parallel_for(n, n_threads, [&](int lo, int hi) {
    for (int i = lo; i < hi; i++) {
      const float* p = &points[3 * size_t(i)];
      keys[size_t(i)] = Key{int32_t(std::floor(double(p[0]) * inv)),
                            int32_t(std::floor(double(p[1]) * inv)),
                            int32_t(std::floor(double(p[2]) * inv))};
    }
  });

  std::vector<CellMap> shards(static_cast<size_t>(n_threads));
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; t++) {
    threads.emplace_back([&, t] {
      CellMap& cells = shards[size_t(t)];
      cells.reserve(size_t(n) / size_t(n_threads) + 16);
      KeyHash hasher;
      for (int i = 0; i < n; i++) {
        const Key& key = keys[size_t(i)];
        if (int(hasher(key) % size_t(n_threads)) != t) continue;
        const float* p = &points[3 * size_t(i)];
        auto& cell = cells[key];
        cell.first[0] += p[0];
        cell.first[1] += p[1];
        cell.first[2] += p[2];
        cell.second += 1;
      }
    });
  }
  for (auto& th : threads) th.join();

  // Emit centroids in voxel-key lexicographic order: deterministic across
  // thread counts and matching the numpy path's np.unique(key) ordering
  // (key-sorted clouds measurably speed up the TPU gather paths — see
  // "Sort PCL-compatible downsample output by voxel key" in the repo log).
  std::vector<std::pair<Key, const std::pair<std::array<double, 3>, int>*>>
      cells_sorted;
  size_t total = 0;
  for (const auto& cells : shards) total += cells.size();
  cells_sorted.reserve(total);
  for (const auto& cells : shards)
    for (const auto& kv : cells) cells_sorted.push_back({kv.first, &kv.second});
  std::sort(cells_sorted.begin(), cells_sorted.end(),
            [](const auto& a, const auto& b) {
              if (a.first.x != b.first.x) return a.first.x < b.first.x;
              if (a.first.y != b.first.y) return a.first.y < b.first.y;
              return a.first.z < b.first.z;
            });
  int m = 0;
  for (const auto& kc : cells_sorted) {
    const auto& cell = *kc.second;
    out_points[3 * size_t(m) + 0] = float(cell.first[0] / cell.second);
    out_points[3 * size_t(m) + 1] = float(cell.first[1] / cell.second);
    out_points[3 * size_t(m) + 2] = float(cell.first[2] / cell.second);
    m++;
  }
  return m;
}

int voxel_downsample(const float* points, int n, float resolution,
                     float* out_points) {
  return voxel_downsample_mt(points, n, resolution, 0, out_points);
}

// ------------------------------------------------------------------- I/O
// KITTI velodyne .bin: float32 x,y,z,intensity records. Returns point
// count, fills out (capacity in points) if non-null.
int load_kitti_bin(const char* path, float* out, int capacity) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long bytes = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  int n = int(bytes / (4 * sizeof(float)));
  if (out) {
    int m = std::min(n, capacity);
    std::vector<float> buf(size_t(m) * 4);
    size_t got = std::fread(buf.data(), sizeof(float), size_t(m) * 4, f);
    (void)got;
    for (int i = 0; i < m; i++) {
      out[3 * size_t(i) + 0] = buf[4 * size_t(i) + 0];
      out[3 * size_t(i) + 1] = buf[4 * size_t(i) + 1];
      out[3 * size_t(i) + 2] = buf[4 * size_t(i) + 2];
    }
  }
  std::fclose(f);
  return n;
}

// ------------------------------------------------ int16 upload quantizer
// Host side of the odometry drivers' quantized upload (utils/kitti.py
// run_odometry_scan): the sequence-global abs-max sets the scale, then
// each cloud is rint-quantized straight into its slot of the shared int16
// staging buffer.  Replaces numpy's three full passes over the ~100 MB
// f32 concatenation (multiply temp + rint temp + astype) with one read +
// one narrow write per element, and removes the f32 concatenation itself.
float absmax_f32(const float* in, long long n) {
  float m = 0.0f;
  for (long long i = 0; i < n; i++) {
    // fmaxf-style NaN propagation so native and numpy-fallback paths
    // agree on NaN-contaminated clouds (numpy's max propagates NaN; a
    // silent `a > m` comparison would drop it and feed lrintf(NaN),
    // which is unspecified, into quantize_i16 downstream).
    float a = std::fabs(in[i]);
    m = (a > m || a != a) ? a : m;
  }
  return m;
}

void quantize_i16(const float* in, long long n, float inv_scale,
                  int16_t* out) {
  for (long long i = 0; i < n; i++) {
    out[i] = int16_t(std::lrintf(in[i] * inv_scale));
  }
}

}  // extern "C"
