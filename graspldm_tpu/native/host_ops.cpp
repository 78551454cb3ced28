// Native host-side data-path kernels for graspldm_tpu.
//
// TPU-native counterpart of the reference's C++/CUDA data-path helpers: where
// the reference leans on trimesh (mesh surface sampling,
// `acronym_pointclouds.py:174-177`), numpy FPS
// (`utils/pointcloud_helpers.py:162-217`) and per-pixel torch loops for depth
// back-projection (`utils/camera.py:135-215`), the hot host loops here are
// C++ (-O3) exposed through ctypes. The device-side compute path is
// Pallas/XLA; these keep the HOST input pipeline from starving the chip.
//
// Build: g++ -O3 -march=native -shared -fPIC host_ops.cpp -o libhost_ops.so

#include <cstdint>
#include <cstring>
#include <cmath>
#include <random>

extern "C" {

// Area-weighted uniform surface sampling.
// vertices: [V,3] float64, faces: [F,3] int64 -> out: [count,3] float32
int sample_surface(const double* vertices, int64_t num_vertices,
                   const int64_t* faces, int64_t num_faces,
                   int64_t count, uint64_t seed, float* out) {
  if (num_faces <= 0 || count <= 0) return -1;

  // cumulative areas
  double* cum = new double[num_faces];
  double total = 0.0;
  for (int64_t f = 0; f < num_faces; ++f) {
    const double* a = vertices + 3 * faces[3 * f + 0];
    const double* b = vertices + 3 * faces[3 * f + 1];
    const double* c = vertices + 3 * faces[3 * f + 2];
    double ab[3] = {b[0] - a[0], b[1] - a[1], b[2] - a[2]};
    double ac[3] = {c[0] - a[0], c[1] - a[1], c[2] - a[2]};
    double cx = ab[1] * ac[2] - ab[2] * ac[1];
    double cy = ab[2] * ac[0] - ab[0] * ac[2];
    double cz = ab[0] * ac[1] - ab[1] * ac[0];
    total += 0.5 * std::sqrt(cx * cx + cy * cy + cz * cz);
    cum[f] = total;
  }
  if (total <= 0.0) { delete[] cum; return -2; }

  std::mt19937_64 rng(seed);
  std::uniform_real_distribution<double> uni(0.0, 1.0);

  for (int64_t i = 0; i < count; ++i) {
    double target = uni(rng) * total;
    // binary search over cumulative areas
    int64_t lo = 0, hi = num_faces - 1;
    while (lo < hi) {
      int64_t mid = (lo + hi) / 2;
      if (cum[mid] < target) lo = mid + 1; else hi = mid;
    }
    const double* a = vertices + 3 * faces[3 * lo + 0];
    const double* b = vertices + 3 * faces[3 * lo + 1];
    const double* c = vertices + 3 * faces[3 * lo + 2];
    double r1 = std::sqrt(uni(rng));
    double r2 = uni(rng);
    double w0 = 1.0 - r1, w1 = r1 * (1.0 - r2), w2 = r1 * r2;
    for (int d = 0; d < 3; ++d) {
      out[3 * i + d] =
          static_cast<float>(w0 * a[d] + w1 * b[d] + w2 * c[d]);
    }
  }
  delete[] cum;
  return 0;
}

// Farthest point sampling on the host (regularize_pc_point_count path).
// points: [N,3] float32 -> out_indices: [M] int64. First index = 0.
int farthest_point_sample(const float* points, int64_t n, int64_t m,
                          int64_t* out_indices) {
  if (n <= 0 || m <= 0) return -1;
  float* dist = new float[n];
  for (int64_t i = 0; i < n; ++i) dist[i] = 1e30f;
  int64_t last = 0;
  out_indices[0] = 0;
  for (int64_t j = 1; j < m; ++j) {
    const float* p = points + 3 * last;
    float best = -1.0f;
    int64_t best_i = 0;
    for (int64_t i = 0; i < n; ++i) {
      float dx = points[3 * i] - p[0];
      float dy = points[3 * i + 1] - p[1];
      float dz = points[3 * i + 2] - p[2];
      float d = dx * dx + dy * dy + dz * dz;
      if (d < dist[i]) dist[i] = d;
      if (dist[i] > best) { best = dist[i]; best_i = i; }
    }
    last = best_i;
    out_indices[j] = last;
  }
  delete[] dist;
  return 0;
}

// Depth image back-projection (pinhole).
// depth: [h*w] float32 (already scaled to meters).
// Writes up to max_points valid points; returns the count.
int64_t depth_to_pointcloud(const float* depth, int64_t h, int64_t w,
                            float fx, float fy, float cx, float cy,
                            float max_depth, int64_t max_points, float* out) {
  int64_t count = 0;
  for (int64_t v = 0; v < h && count < max_points; ++v) {
    for (int64_t u = 0; u < w && count < max_points; ++u) {
      float z = depth[v * w + u];
      if (z <= 0.0f || (max_depth > 0.0f && z >= max_depth)) continue;
      out[3 * count + 0] = (static_cast<float>(u) - cx) * z / fx;
      out[3 * count + 1] = (static_cast<float>(v) - cy) * z / fy;
      out[3 * count + 2] = z;
      ++count;
    }
  }
  return count;
}

}  // extern "C"
