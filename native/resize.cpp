// Host-side batched image resize for the data pipeline.
//
// The reference's loader does per-sample torch F.interpolate on CPU for the
// 1024x1024 seg frames (llava/train/vicas_dataset.py:340-378,
// llava/inference/utils.py:11-68).  This is the native (C++) equivalent used
// by the TPU build's host input pipeline: bilinear (half-pixel centers,
// align_corners=False — torch's default, which the JAX op
// video_llava_seg_tpu/ops/resize.py reproduces) and nearest (torch "nearest":
// floor(dst * src/dst) source indexing), multi-threaded over planes.
//
// Layout: float32 [N, C, H, W] -> [N, C, OH, OW].  C ABI, bound via ctypes.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <thread>
#include <vector>

namespace {

void bilinear_plane(const float* src, int h, int w, float* dst, int oh,
                    int ow) {
  const float sy = (float)h / oh;
  const float sx = (float)w / ow;
  // Precompute x-axis gather indices/weights once per plane.
  std::vector<int> x0(ow), x1(ow);
  std::vector<float> wx(ow);
  for (int ox = 0; ox < ow; ++ox) {
    float fx = (ox + 0.5f) * sx - 0.5f;
    fx = std::max(0.0f, std::min(fx, (float)(w - 1)));
    x0[ox] = (int)fx;
    x1[ox] = std::min(x0[ox] + 1, w - 1);
    wx[ox] = fx - x0[ox];
  }
  for (int oy = 0; oy < oh; ++oy) {
    float fy = (oy + 0.5f) * sy - 0.5f;
    fy = std::max(0.0f, std::min(fy, (float)(h - 1)));
    const int y0 = (int)fy;
    const int y1 = std::min(y0 + 1, h - 1);
    const float wy = fy - y0;
    const float* r0 = src + (size_t)y0 * w;
    const float* r1 = src + (size_t)y1 * w;
    float* out = dst + (size_t)oy * ow;
    for (int ox = 0; ox < ow; ++ox) {
      const float top = r0[x0[ox]] + (r0[x1[ox]] - r0[x0[ox]]) * wx[ox];
      const float bot = r1[x0[ox]] + (r1[x1[ox]] - r1[x0[ox]]) * wx[ox];
      out[ox] = top + (bot - top) * wy;
    }
  }
}

void nearest_plane(const float* src, int h, int w, float* dst, int oh,
                   int ow) {
  const float sy = (float)h / oh;
  const float sx = (float)w / ow;
  std::vector<int> xs(ow);
  for (int ox = 0; ox < ow; ++ox)
    xs[ox] = std::min((int)(ox * sx), w - 1);
  for (int oy = 0; oy < oh; ++oy) {
    const float* row = src + (size_t)std::min((int)(oy * sy), h - 1) * w;
    float* out = dst + (size_t)oy * ow;
    for (int ox = 0; ox < ow; ++ox) out[ox] = row[xs[ox]];
  }
}

template <typename Fn>
void for_planes(int planes, int num_threads, Fn fn) {
  if (num_threads <= 1 || planes == 1) {
    for (int i = 0; i < planes; ++i) fn(i);
    return;
  }
  const int nt = std::min(num_threads, planes);
  std::vector<std::thread> pool;
  pool.reserve(nt);
  for (int t = 0; t < nt; ++t)
    pool.emplace_back([=]() {
      for (int i = t; i < planes; i += nt) fn(i);
    });
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// mode: 0 = bilinear (half-pixel), 1 = nearest (torch "nearest").
// Returns 0 on success.
int vls_resize_f32(const float* src, int32_t n, int32_t c, int32_t h,
                   int32_t w, float* dst, int32_t oh, int32_t ow,
                   int32_t mode, int32_t num_threads) {
  if (!src || !dst || n <= 0 || c <= 0 || h <= 0 || w <= 0 || oh <= 0 ||
      ow <= 0)
    return 1;
  const size_t in_stride = (size_t)h * w;
  const size_t out_stride = (size_t)oh * ow;
  const int planes = n * c;
  for_planes(planes, num_threads, [=](int i) {
    const float* s = src + i * in_stride;
    float* d = dst + i * out_stride;
    if (mode == 0)
      bilinear_plane(s, h, w, d, oh, ow);
    else
      nearest_plane(s, h, w, d, oh, ow);
  });
  return 0;
}

// uint8 HWC -> float32 CHW resize+rescale(1/255)+optional normalize, fused —
// the exact per-frame op the video loader runs (decode -> resize -> to
// tensor -> normalize).  mean/std may be null (skip normalize).
int vls_resize_u8_to_f32(const uint8_t* src, int32_t n, int32_t h, int32_t w,
                         int32_t c, float* dst, int32_t oh, int32_t ow,
                         const float* mean, const float* std_,
                         int32_t num_threads) {
  if (!src || !dst || n <= 0 || c <= 0 || h <= 0 || w <= 0 || oh <= 0 ||
      ow <= 0)
    return 1;
  const size_t img_in = (size_t)h * w * c;
  const size_t img_out = (size_t)oh * ow * c;
  const int planes = n * c;
  for_planes(planes, num_threads, [=](int i) {
    const int img = i / c, ch = i % c;
    const uint8_t* s = src + img * img_in;
    float* d = dst + img * img_out + (size_t)ch * oh * ow;
    // deinterleave channel ch to a contiguous plane, then resize
    std::vector<float> plane((size_t)h * w);
    for (size_t px = 0; px < (size_t)h * w; ++px)
      plane[px] = s[px * c + ch] * (1.0f / 255.0f);
    bilinear_plane(plane.data(), h, w, d, oh, ow);
    if (mean && std_) {
      const float m = mean[ch], inv = 1.0f / std_[ch];
      for (size_t px = 0; px < (size_t)oh * ow; ++px)
        d[px] = (d[px] - m) * inv;
    }
  });
  return 0;
}

}  // extern "C"
