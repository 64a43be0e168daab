// Host-side connected components: 8-connectivity union-find labeling of
// binary masks with per-pixel component areas.
//
// Native equivalent of the reference's single CUDA kernel
// (sam2/csrc/connected_components.cu:213-289, block-union-find with
// atomicMin + path compression).  On TPU hosts there is no CUDA; the
// on-device path is the Pallas/JAX label-propagation op
// (video_llava_seg_tpu/ops/connected_components.py) and THIS file is the
// fast host path used by the data pipeline and CPU post-processing —
// a classic two-pass union-find with path halving, O(N α(N)) per image,
// batch-parallel via std::thread.
//
// Contract (mirrors get_connected_componnets, connected_components.cu:213):
//   masks  : uint8 [N, H, W], nonzero = foreground
//   labels : int32 [N, H, W], 0 on background, >=1 component ids, where the
//            id is the flat index of the component's minimum pixel + 1
//            (deterministic, identical to the JAX op's convention)
//   areas  : int32 [N, H, W], per-pixel area of the containing component
//
// C ABI only — bound from Python with ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Find with path halving on a flat parent array.
inline int32_t find_root(int32_t* parent, int32_t x) {
  while (parent[x] != x) {
    parent[x] = parent[parent[x]];
    x = parent[x];
  }
  return x;
}

// Union by min root so the final representative is the minimum flat index
// of the component (gives deterministic ids matching the JAX op).
inline void unite(int32_t* parent, int32_t a, int32_t b) {
  a = find_root(parent, a);
  b = find_root(parent, b);
  if (a == b) return;
  if (a < b)
    parent[b] = a;
  else
    parent[a] = b;
}

void label_one(const uint8_t* mask, int h, int w, int32_t* labels,
               int32_t* areas) {
  const int n = h * w;
  std::vector<int32_t> parent(n);
  for (int i = 0; i < n; ++i) parent[i] = i;

  // Pass 1: union each foreground pixel with its already-visited
  // 8-neighbors (W, NW, N, NE).
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = mask + (size_t)y * w;
    const uint8_t* up = row - w;
    for (int x = 0; x < w; ++x) {
      if (!row[x]) continue;
      const int32_t i = y * w + x;
      if (x > 0 && row[x - 1]) unite(parent.data(), i, i - 1);
      if (y > 0) {
        if (up[x]) unite(parent.data(), i, i - w);
        if (x > 0 && up[x - 1]) unite(parent.data(), i, i - w - 1);
        if (x < w - 1 && up[x + 1]) unite(parent.data(), i, i - w + 1);
      }
    }
  }

  // Pass 2: resolve roots, accumulate areas keyed by root.
  std::vector<int32_t> count(n, 0);
  for (int i = 0; i < n; ++i) {
    if (mask[i]) {
      const int32_t r = find_root(parent.data(), i);
      labels[i] = r + 1;
      ++count[r];
    } else {
      labels[i] = 0;
    }
  }
  for (int i = 0; i < n; ++i)
    areas[i] = mask[i] ? count[labels[i] - 1] : 0;
}

}  // namespace

extern "C" {

// Returns 0 on success, nonzero on invalid arguments.
int vls_connected_components(const uint8_t* masks, int32_t n, int32_t h,
                             int32_t w, int32_t* labels, int32_t* areas,
                             int32_t num_threads) {
  if (!masks || !labels || !areas || n <= 0 || h <= 0 || w <= 0) return 1;
  const size_t stride = (size_t)h * w;
  if (num_threads <= 1 || n == 1) {
    for (int32_t i = 0; i < n; ++i)
      label_one(masks + i * stride, h, w, labels + i * stride,
                areas + i * stride);
    return 0;
  }
  const int32_t nt = num_threads < n ? num_threads : n;
  std::vector<std::thread> pool;
  pool.reserve(nt);
  for (int32_t t = 0; t < nt; ++t) {
    pool.emplace_back([=]() {
      for (int32_t i = t; i < n; i += nt)
        label_one(masks + i * stride, h, w, labels + i * stride,
                  areas + i * stride);
    });
  }
  for (auto& th : pool) th.join();
  return 0;
}

}  // extern "C"
