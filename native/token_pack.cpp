// Token packing: masked-voxel gather + 3D sin/cos positional encoding.
//
// Native fast path for the trainer's per-item host loop
// (vit_deep_radiomics_tpu/data/datasets.py::PETCTDataset._get_features;
// the reference recomputes this per step in Python at
// /root/reference/src/train_models.py:143-182).  Semantics match the
// Python implementation exactly:
//
//   1. nearest-resize each stored image-res mask to the feature grid
//      (half-pixel centers, round-half-even like numpy),
//   2. voxel physical coords: x = (col/W)*Wm*res0, y = (row/H)*Hm*res1,
//      z = slice*res2, centred by the closed-form full-grid mean,
//      plus jitter noise,
//   3. token = feature + PE(x,y,z,D)/4 with D/6 frequency bands.
//
// Built as a plain C-ABI shared library (no pybind11 in this image);
// loaded via ctypes by vit_deep_radiomics_tpu/utils/native.py.

#include <cmath>
#include <cstdint>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// numpy round-half-even
inline long rint_half_even(double v) { return std::lrint(v); }

inline long nearest_index(long i, long out_size, long in_size) {
  double coord = (static_cast<double>(i) + 0.5) * in_size / out_size - 0.5;
  long r = rint_half_even(coord);
  if (r < 0) r = 0;
  if (r >= in_size) r = in_size - 1;
  return r;
}

}  // namespace

extern "C" {

// Count selected voxels (mask > 0 after nearest resize).
// masks: (S, Hm, Wm) float; feature grid (H, W).
long count_tokens(const float* masks, long S, long Hm, long Wm, long H,
                  long W) {
  long count = 0;
#pragma omp parallel for reduction(+ : count) collapse(2)
  for (long s = 0; s < S; ++s) {
    for (long r = 0; r < H; ++r) {
      long rm = nearest_index(r, H, Hm);
      const float* row = masks + (s * Hm + rm) * Wm;
      for (long c = 0; c < W; ++c) {
        long cm = nearest_index(c, W, Wm);
        if (row[cm] > 0.0f) ++count;
      }
    }
  }
  return count;
}

// Pack tokens: features (S, H, W, D), masks (S, Hm, Wm) ->
// out_tokens (n_tokens, D), iteration order (row, col, slice) to match
// the Python (h, w, s) flatten order.  Returns tokens written, or -1 if
// the out buffer (capacity max_tokens) is too small.
long pack_tokens(const float* features, const float* masks, long S, long H,
                 long W, long D, long Hm, long Wm, const double* spatial_res,
                 const double* noise, double pe_scale, double pe_div,
                 float* out_tokens, long max_tokens) {
  // closed-form full-grid coordinate means (exact: mean of arange(n) is
  // (n-1)/2)
  const double x_mean = (W - 1) / 2.0 / W * Wm * spatial_res[0];
  const double y_mean = (H - 1) / 2.0 / H * Hm * spatial_res[1];
  const double z_mean = (S - 1) / 2.0 * spatial_res[2];

  const long n_bands = D / 6;
  const long third = D / 3;
  std::vector<double> inv_freq(n_bands);
  for (long i = 0; i < n_bands; ++i)
    inv_freq[i] = std::pow(pe_scale, -6.0 * i / D);

  // first pass: record selected voxel (r, c, s) triples in (h, w, s) order
  std::vector<long> sel;
  sel.reserve(1024);
  for (long r = 0; r < H; ++r) {
    long rm = nearest_index(r, H, Hm);
    for (long c = 0; c < W; ++c) {
      long cm = nearest_index(c, W, Wm);
      for (long s = 0; s < S; ++s) {
        if (masks[(s * Hm + rm) * Wm + cm] > 0.0f)
          sel.push_back((r * W + c) * S + s);
      }
    }
  }
  const long n = static_cast<long>(sel.size());
  if (n > max_tokens) return -1;

#pragma omp parallel for
  for (long t = 0; t < n; ++t) {
    long idx = sel[t];
    long s = idx % S;
    long rc = idx / S;
    long c = rc % W;
    long r = rc / W;
    const double x =
        static_cast<double>(c) / W * Wm * spatial_res[0] - x_mean + noise[0];
    const double y =
        static_cast<double>(r) / H * Hm * spatial_res[1] - y_mean + noise[1];
    const double z = s * spatial_res[2] - z_mean + noise[2];

    const float* feat = features + ((s * H + r) * W + c) * D;
    float* out = out_tokens + t * D;
    for (long d = 0; d < D; ++d) out[d] = feat[d];
    for (long i = 0; i < n_bands; ++i) {
      const double fx = x * inv_freq[i];
      const double fy = y * inv_freq[i];
      const double fz = z * inv_freq[i];
      out[2 * i] += static_cast<float>(std::sin(fx) / pe_div);
      out[2 * i + 1] += static_cast<float>(std::cos(fx) / pe_div);
      out[2 * i + third] += static_cast<float>(std::sin(fy) / pe_div);
      out[2 * i + 1 + third] += static_cast<float>(std::cos(fy) / pe_div);
      out[2 * i + 2 * third] += static_cast<float>(std::sin(fz) / pe_div);
      out[2 * i + 1 + 2 * third] += static_cast<float>(std::cos(fz) / pe_div);
    }
  }
  return n;
}

// Masked conv-volume build: features (S,H,W,D) * resized mask -> out
// (S,H,W,D); the conv-arch path of _get_features.
void mask_features(const float* features, const float* masks, long S, long H,
                   long W, long D, long Hm, long Wm, float* out) {
#pragma omp parallel for collapse(2)
  for (long s = 0; s < S; ++s) {
    for (long r = 0; r < H; ++r) {
      long rm = nearest_index(r, H, Hm);
      for (long c = 0; c < W; ++c) {
        long cm = nearest_index(c, W, Wm);
        const float m = masks[(s * Hm + rm) * Wm + cm] > 0.0f ? 1.0f : 0.0f;
        const float* src = features + ((s * H + r) * W + c) * D;
        float* dst = out + ((s * H + r) * W + c) * D;
        for (long d = 0; d < D; ++d) dst[d] = src[d] * m;
      }
    }
  }
}

}  // extern "C"
