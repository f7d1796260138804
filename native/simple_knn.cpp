// Native 3-nearest-neighbor mean squared distance, for Gaussian scale init.
//
// The TPU-framework equivalent of the reference's simple-knn CUDA submodule
// (reference: scene/gaussian_model.py:20,134 — distCUDA2(points) -> [N]),
// rebuilt for the host CPU with the same algorithm family: Morton-code
// spatial sort, fixed-size boxes with AABBs, and box-pruned exact 3-NN.
// Runs once at scene init (off the TPU hot path); OpenMP-parallel.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <numeric>
#include <vector>

namespace {

inline uint64_t expand_bits_21(uint64_t v) {
  // Spread the low 21 bits of v so there are two zero bits between each.
  v &= 0x1fffff;
  v = (v | (v << 32)) & 0x1f00000000ffffULL;
  v = (v | (v << 16)) & 0x1f0000ff0000ffULL;
  v = (v | (v << 8)) & 0x100f00f00f00f00fULL;
  v = (v | (v << 4)) & 0x10c30c30c30c30c3ULL;
  v = (v | (v << 2)) & 0x1249249249249249ULL;
  return v;
}

inline uint64_t morton3d(float x, float y, float z) {
  const float s = 2097151.0f;  // 2^21 - 1
  uint64_t xi = (uint64_t)std::min(std::max(x * s, 0.0f), s);
  uint64_t yi = (uint64_t)std::min(std::max(y * s, 0.0f), s);
  uint64_t zi = (uint64_t)std::min(std::max(z * s, 0.0f), s);
  return (expand_bits_21(xi) << 2) | (expand_bits_21(yi) << 1) |
         expand_bits_21(zi);
}

struct Best3 {
  float d[3];  // squared distances, ascending
  void init() { d[0] = d[1] = d[2] = std::numeric_limits<float>::infinity(); }
  inline void update(float v) {
    if (v < d[2]) {
      if (v < d[1]) {
        d[2] = d[1];
        if (v < d[0]) {
          d[1] = d[0];
          d[0] = v;
        } else {
          d[1] = v;
        }
      } else {
        d[2] = v;
      }
    }
  }
  inline float worst() const { return d[2]; }
  inline float mean() const { return (d[0] + d[1] + d[2]) / 3.0f; }
};

struct Box {
  float lo[3], hi[3];
};

inline float box_dist2(const Box& b, const float* p) {
  float acc = 0.0f;
  for (int k = 0; k < 3; ++k) {
    float d = 0.0f;
    if (p[k] < b.lo[k]) d = b.lo[k] - p[k];
    else if (p[k] > b.hi[k]) d = p[k] - b.hi[k];
    acc += d * d;
  }
  return acc;
}

}  // namespace

extern "C" int gsjax_knn_mean_dist2(const float* pts, int64_t n, float* out) {
  if (n <= 0) return 0;
  if (n <= 4) {
    // Tiny input: brute force.
    for (int64_t i = 0; i < n; ++i) {
      Best3 best;
      best.init();
      for (int64_t j = 0; j < n; ++j) {
        if (i == j) continue;
        float dx = pts[3 * i] - pts[3 * j];
        float dy = pts[3 * i + 1] - pts[3 * j + 1];
        float dz = pts[3 * i + 2] - pts[3 * j + 2];
        best.update(dx * dx + dy * dy + dz * dz);
      }
      float s = 0.0f;
      int c = 0;
      for (int k = 0; k < 3; ++k)
        if (std::isfinite(best.d[k])) { s += best.d[k]; ++c; }
      out[i] = c ? s / c : 0.0f;
    }
    return 0;
  }

  // Bounding box for Morton quantization.
  float lo[3] = {pts[0], pts[1], pts[2]};
  float hi[3] = {pts[0], pts[1], pts[2]};
  for (int64_t i = 1; i < n; ++i) {
    for (int k = 0; k < 3; ++k) {
      lo[k] = std::min(lo[k], pts[3 * i + k]);
      hi[k] = std::max(hi[k], pts[3 * i + k]);
    }
  }
  float inv[3];
  for (int k = 0; k < 3; ++k) {
    float ext = hi[k] - lo[k];
    inv[k] = ext > 0 ? 1.0f / ext : 0.0f;
  }

  std::vector<uint64_t> codes(n);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    codes[i] = morton3d((pts[3 * i] - lo[0]) * inv[0],
                        (pts[3 * i + 1] - lo[1]) * inv[1],
                        (pts[3 * i + 2] - lo[2]) * inv[2]);
  }
  std::vector<int64_t> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::sort(order.begin(), order.end(),
            [&](int64_t a, int64_t b) { return codes[a] < codes[b]; });

  // Sorted coordinate array (cache-friendly scans).
  std::vector<float> sp(3 * n);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    sp[3 * i] = pts[3 * order[i]];
    sp[3 * i + 1] = pts[3 * order[i] + 1];
    sp[3 * i + 2] = pts[3 * order[i] + 2];
  }

  const int64_t BOX = 256;
  const int64_t n_boxes = (n + BOX - 1) / BOX;
  std::vector<Box> boxes(n_boxes);
#pragma omp parallel for schedule(static)
  for (int64_t b = 0; b < n_boxes; ++b) {
    int64_t s = b * BOX, e = std::min(n, s + BOX);
    Box bx;
    for (int k = 0; k < 3; ++k) {
      bx.lo[k] = std::numeric_limits<float>::infinity();
      bx.hi[k] = -std::numeric_limits<float>::infinity();
    }
    for (int64_t i = s; i < e; ++i) {
      for (int k = 0; k < 3; ++k) {
        bx.lo[k] = std::min(bx.lo[k], sp[3 * i + k]);
        bx.hi[k] = std::max(bx.hi[k], sp[3 * i + k]);
      }
    }
    boxes[b] = bx;
  }

#pragma omp parallel for schedule(dynamic, 1024)
  for (int64_t i = 0; i < n; ++i) {
    const float p[3] = {sp[3 * i], sp[3 * i + 1], sp[3 * i + 2]};
    Best3 best;
    best.init();
    // Seed from the own (Morton-local) box — a tight initial bound that
    // makes the pruning pass below skip nearly every other box. Each point
    // is visited exactly once (duplicates would double-fill the top-3).
    const int64_t own = i / BOX;
    {
      int64_t s = own * BOX, e = std::min(n, s + BOX);
      for (int64_t j = s; j < e; ++j) {
        if (j == i) continue;
        float dx = p[0] - sp[3 * j], dy = p[1] - sp[3 * j + 1],
              dz = p[2] - sp[3 * j + 2];
        best.update(dx * dx + dy * dy + dz * dz);
      }
    }
    for (int64_t b = 0; b < n_boxes; ++b) {
      if (b == own) continue;
      if (box_dist2(boxes[b], p) > best.worst()) continue;
      int64_t s = b * BOX, e = std::min(n, s + BOX);
      for (int64_t j = s; j < e; ++j) {
        float dx = p[0] - sp[3 * j], dy = p[1] - sp[3 * j + 1],
              dz = p[2] - sp[3 * j + 2];
        best.update(dx * dx + dy * dy + dz * dz);
      }
    }
    out[order[i]] = best.mean();
  }
  return 0;
}
