// Native host-side data-pipeline kernels.
//
// The reference keeps its native code on the compute path (CUDA NMS,
// deformable-conv extension); on TPU those became XLA programs, so the
// native layer moves to where it still pays: the host input pipeline that
// feeds the chip.  This module provides the per-batch hot loops --
// uint8->normalised-float image collation and Gaussian heatmap stamping --
// as OpenMP-parallel C++ with a plain C ABI consumed via ctypes
// (no pybind11 in this image).
//
// Semantics mirror hrnet_hand_pose_estimation_tpu/ops/targets.py (which in
// turn bit-matches the reference generator, lib/dataset/target_generators/
// target_generators.py:15-53): truncated-int centres, |dx|<=3*sigma+1
// stamp window, visibility gating.
//
// Build: native/build.sh (g++ -O3 -march=native -fopenmp -shared -fPIC)

#include <cmath>
#include <cstdint>
#include <cstring>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// uint8 HWC images -> float32 normalised NHWC batch buffer.
// images: B pointers worth of contiguous H*W*3 uint8 (flattened as one blob)
// out:    B*H*W*3 float32
// mean/std: 3 floats each (RGB)
void normalize_collate_u8(const uint8_t* images, float* out,
                          int64_t batch, int64_t hw3,
                          const float* mean, const float* stddev) {
  const float inv255 = 1.0f / 255.0f;
  float scale[3], shift[3];
  for (int c = 0; c < 3; ++c) {
    scale[c] = inv255 / stddev[c];
    shift[c] = -mean[c] / stddev[c];
  }
#pragma omp parallel for schedule(static)
  for (int64_t b = 0; b < batch; ++b) {
    const uint8_t* src = images + b * hw3;
    float* dst = out + b * hw3;
    for (int64_t i = 0; i < hw3; i += 3) {
      dst[i + 0] = src[i + 0] * scale[0] + shift[0];
      dst[i + 1] = src[i + 1] * scale[1] + shift[1];
      dst[i + 2] = src[i + 2] * scale[2] + shift[2];
    }
  }
}

// Gaussian heatmap stamping, batch-parallel.
// joints: (B, K, 2) float32 [u, v]; vis: (B, K) float32
// out:    (B, res, res, K) float32, zero-initialised by this function
void gaussian_targets(const float* joints, const float* vis, float* out,
                      int64_t batch, int64_t njoints, int64_t res,
                      float sigma) {
  const float win = std::floor(3.0f * sigma + 1.0f);
  const float inv2s2 = 1.0f / (2.0f * sigma * sigma);
  const int64_t plane = res * res * njoints;
#pragma omp parallel for schedule(static)
  for (int64_t b = 0; b < batch; ++b) {
    float* dst = out + b * plane;
    std::memset(dst, 0, sizeof(float) * plane);
    for (int64_t k = 0; k < njoints; ++k) {
      if (vis[b * njoints + k] <= 0.0f) continue;
      const float u = joints[(b * njoints + k) * 2 + 0];
      const float v = joints[(b * njoints + k) * 2 + 1];
      const float x = std::trunc(u);
      const float y = std::trunc(v);
      if (x < 0 || y < 0 || x >= res || y >= res) continue;
      const int64_t x0 = static_cast<int64_t>(std::fmax(0.0f, x - win));
      const int64_t x1 = static_cast<int64_t>(std::fmin((float)res - 1, x + win));
      const int64_t y0 = static_cast<int64_t>(std::fmax(0.0f, y - win));
      const int64_t y1 = static_cast<int64_t>(std::fmin((float)res - 1, y + win));
      for (int64_t py = y0; py <= y1; ++py) {
        const float dy = (float)py - y;
        float* row = dst + (py * res) * njoints;
        for (int64_t px = x0; px <= x1; ++px) {
          const float dx = (float)px - x;
          row[px * njoints + k] = std::exp(-(dx * dx + dy * dy) * inv2s2);
        }
      }
    }
  }
}

int fastops_num_threads() {
#if defined(_OPENMP)
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
