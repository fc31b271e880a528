// frame_ops — native data-pipeline kernels for stif_tpu.
//
// The reference's data pipeline leans on a native layer (CUDA DCNv2 for
// compute, cv2/lmdb C++ readers for IO). The TPU rebuild keeps compute on
// the chip (XLA/Pallas); this library covers the host-side hot path that
// feeds it: MATLAB-convention bicubic degradation (the exact resampler of
// codes/data/util.py:240-371, which defines the LR degradation model),
// uint8 BGR -> float32 RGB normalization, and crop+pack — all multithreaded.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this environment).
//
// Build: tools/build_native.sh  (g++ -O3 -march=native -fopenmp -shared)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// Keys cubic kernel, a = -0.5 (MATLAB 'cubic').
inline double cubic(double x) {
  double ax = std::fabs(x);
  double ax2 = ax * ax;
  double ax3 = ax2 * ax;
  if (ax <= 1.0) return 1.5 * ax3 - 2.5 * ax2 + 1.0;
  if (ax <= 2.0) return -0.5 * ax3 + 2.5 * ax2 - 4.0 * ax + 2.0;
  return 0.0;
}

// MATLAB imresize weight/index plan for one axis (antialiasing on).
// Mirrors calculate_weights_indices (data/util.py:248-300) with the
// symmetric boundary fold applied directly to source indices.
struct ResamplePlan {
  int out_length;
  int taps;
  std::vector<float> weights;  // out_length * taps
  std::vector<int> indices;    // out_length * taps (folded into [0, in))
};

ResamplePlan make_plan(int in_length, int out_length, double scale,
                       bool antialiasing) {
  double kernel_width = 4.0;
  if (scale < 1.0 && antialiasing) kernel_width /= scale;
  int P = static_cast<int>(std::ceil(kernel_width)) + 2;

  std::vector<double> w(static_cast<size_t>(out_length) * P);
  std::vector<long> idx(static_cast<size_t>(out_length) * P);
  std::vector<char> col_zero(P, 1);
  for (int i = 0; i < out_length; ++i) {
    double x = i + 1.0;
    double u = x / scale + 0.5 * (1.0 - 1.0 / scale);
    double left = std::floor(u - kernel_width / 2.0);
    double rowsum = 0.0;
    for (int k = 0; k < P; ++k) {
      double pos = left + k;
      double d = u - pos;
      double wk = (scale < 1.0 && antialiasing) ? scale * cubic(d * scale)
                                                : cubic(d);
      w[i * P + k] = wk;
      idx[i * P + k] = static_cast<long>(pos);
      rowsum += wk;
    }
    for (int k = 0; k < P; ++k) {
      w[i * P + k] /= rowsum;
      if (w[i * P + k] != 0.0) col_zero[k] = 0;
    }
  }
  int lo = 0, taps = P;
  if (col_zero[0]) { lo = 1; taps = P - 2; }
  else if (col_zero[P - 1]) { taps = P - 2; }

  ResamplePlan plan;
  plan.out_length = out_length;
  plan.taps = taps;
  plan.weights.resize(static_cast<size_t>(out_length) * taps);
  plan.indices.resize(static_cast<size_t>(out_length) * taps);
  for (int i = 0; i < out_length; ++i) {
    for (int k = 0; k < taps; ++k) {
      long p = idx[i * P + lo + k] - 1;  // 0-based source index
      // symmetric fold into [0, in_length)
      while (p < 0 || p >= in_length) {
        if (p < 0) p = -p - 1;
        if (p >= in_length) p = 2L * in_length - 1 - p;
      }
      plan.indices[i * static_cast<size_t>(taps) + k] = static_cast<int>(p);
      plan.weights[i * static_cast<size_t>(taps) + k] =
          static_cast<float>(w[i * P + lo + k]);
    }
  }
  return plan;
}

}  // namespace

extern "C" {

// Output dims for a MATLAB resize.
void stif_resize_dims(int in_h, int in_w, double scale, int* out_h,
                      int* out_w) {
  *out_h = static_cast<int>(std::ceil(in_h * scale));
  *out_w = static_cast<int>(std::ceil(in_w * scale));
}

// MATLAB-convention bicubic resize, float32 HWC.
// src: (h, w, c); dst: (ceil(h*scale), ceil(w*scale), c).
void stif_imresize_f32(const float* src, int h, int w, int c, double scale,
                       float* dst) {
  int oh, ow;
  stif_resize_dims(h, w, scale, &oh, &ow);
  ResamplePlan ph = make_plan(h, oh, scale, true);
  ResamplePlan pw = make_plan(w, ow, scale, true);

  // pass 1: rows (h -> oh), width unchanged
  std::vector<float> tmp(static_cast<size_t>(oh) * w * c);
#pragma omp parallel for schedule(static)
  for (int i = 0; i < oh; ++i) {
    const float* wr = &ph.weights[i * static_cast<size_t>(ph.taps)];
    const int* ir = &ph.indices[i * static_cast<size_t>(ph.taps)];
    float* out_row = &tmp[static_cast<size_t>(i) * w * c];
    std::memset(out_row, 0, sizeof(float) * w * c);
    for (int k = 0; k < ph.taps; ++k) {
      const float* in_row = src + static_cast<size_t>(ir[k]) * w * c;
      float wk = wr[k];
      for (int j = 0; j < w * c; ++j) out_row[j] += wk * in_row[j];
    }
  }
  // pass 2: cols (w -> ow)
#pragma omp parallel for schedule(static)
  for (int i = 0; i < oh; ++i) {
    const float* in_row = &tmp[static_cast<size_t>(i) * w * c];
    float* out_row = dst + static_cast<size_t>(i) * ow * c;
    for (int j = 0; j < ow; ++j) {
      const float* wr = &pw.weights[j * static_cast<size_t>(pw.taps)];
      const int* ir = &pw.indices[j * static_cast<size_t>(pw.taps)];
      for (int ch = 0; ch < c; ++ch) {
        float acc = 0.f;
        for (int k = 0; k < pw.taps; ++k)
          acc += wr[k] * in_row[ir[k] * c + ch];
        out_row[j * c + ch] = acc;
      }
    }
  }
}

// uint8 BGR HWC -> float32 RGB HWC in [0, 1].
void stif_bgr_u8_to_rgb_f32(const uint8_t* src, int n_pixels, float* dst) {
  const float inv = 1.0f / 255.0f;
#pragma omp parallel for schedule(static)
  for (int i = 0; i < n_pixels; ++i) {
    dst[i * 3 + 0] = src[i * 3 + 2] * inv;
    dst[i * 3 + 1] = src[i * 3 + 1] * inv;
    dst[i * 3 + 2] = src[i * 3 + 0] * inv;
  }
}

// Crop (y0, x0, ch, cw) from (h, w, c) float32 HWC.
void stif_crop_f32(const float* src, int h, int w, int c, int y0, int x0,
                   int ch_, int cw, float* dst) {
  (void)h;
#pragma omp parallel for schedule(static)
  for (int i = 0; i < ch_; ++i) {
    std::memcpy(dst + static_cast<size_t>(i) * cw * c,
                src + (static_cast<size_t>(y0 + i) * w + x0) * c,
                sizeof(float) * cw * c);
  }
}

// Fused degradation: uint8 BGR frame -> crop -> RGB float -> bicubic down.
// The collate hot path (codes/data/__init__.py:124-154) in one call.
void stif_degrade_u8(const uint8_t* src, int h, int w, int y0, int x0,
                     int crop, double scale, float* dst) {
  std::vector<float> rgb(static_cast<size_t>(crop) * crop * 3);
#pragma omp parallel for schedule(static)
  for (int i = 0; i < crop; ++i) {
    for (int j = 0; j < crop; ++j) {
      const uint8_t* p = src + ((static_cast<size_t>(y0 + i)) * w + x0 + j) * 3;
      float* q = &rgb[(static_cast<size_t>(i) * crop + j) * 3];
      q[0] = p[2] / 255.0f;
      q[1] = p[1] / 255.0f;
      q[2] = p[0] / 255.0f;
    }
  }
  stif_imresize_f32(rgb.data(), crop, crop, 3, scale, dst);
}

int stif_num_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
