// framepack: native frame preprocessing for the EVE data pipeline.
//
// The reference's per-frame preprocessing (transpose + scale + eye split,
// src/datasources/eve_sequences.py:196-211,283-285) is a pure memory-bound
// uint8 -> float32 transform executed per clip in DataLoader workers. This
// library does it in one multithreaded C pass over the decoded buffer:
//   - camera frames: v * 2/255 - 1, split the WxH strip into left (right
//     half) and right (left half) 128x128 patches, NHWC output
//   - screen frames: v / 255, NHWC output
// Exposed via a plain C ABI for ctypes (no pybind11 in this environment).

#include <cstdint>
#include <cstddef>
#include <thread>
#include <vector>

namespace {

inline int num_threads_for(int items) {
  unsigned hw = std::thread::hardware_concurrency();
  if (hw == 0) hw = 1;
  int n = static_cast<int>(hw);
  return items < n ? items : n;
}

template <typename Fn>
void parallel_over(int n, Fn fn) {
  int threads = num_threads_for(n);
  if (threads <= 1) {
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(threads);
  for (int t = 0; t < threads; ++t) {
    pool.emplace_back([=]() {
      for (int i = t; i < n; i += threads) fn(i);
    });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// frames: (n, h, w, 3) uint8 RGB, w even. Outputs (n, h, w/2, 3) float32
// NHWC: left <- right half of the strip, right <- left half
// (reference eve_sequences.py:283-285 with NCHW->NHWC layout change).
void framepack_eyes(const uint8_t* frames, int n, int h, int w,
                    float* left, float* right) {
  const int half = w / 2;
  const size_t in_row = static_cast<size_t>(w) * 3;
  const size_t out_row = static_cast<size_t>(half) * 3;
  const float scale = 2.0f / 255.0f;
  parallel_over(n, [=](int i) {
    const uint8_t* src = frames + static_cast<size_t>(i) * h * in_row;
    float* l_dst = left + static_cast<size_t>(i) * h * out_row;
    float* r_dst = right + static_cast<size_t>(i) * h * out_row;
    for (int y = 0; y < h; ++y) {
      const uint8_t* row = src + static_cast<size_t>(y) * in_row;
      float* lr = l_dst + static_cast<size_t>(y) * out_row;
      float* rr = r_dst + static_cast<size_t>(y) * out_row;
      for (size_t c = 0; c < out_row; ++c) {
        rr[c] = static_cast<float>(row[c]) * scale - 1.0f;
        lr[c] = static_cast<float>(row[out_row + c]) * scale - 1.0f;
      }
    }
  });
}

// frames: (n, h, w, 3) uint8 RGB -> (n, h, w, 3) float32 in [0, 1].
void framepack_screen(const uint8_t* frames, int n, int h, int w,
                      float* out) {
  const size_t per = static_cast<size_t>(h) * w * 3;
  const float scale = 1.0f / 255.0f;
  parallel_over(n, [=](int i) {
    const uint8_t* src = frames + static_cast<size_t>(i) * per;
    float* dst = out + static_cast<size_t>(i) * per;
    for (size_t c = 0; c < per; ++c) {
      dst[c] = static_cast<float>(src[c]) * scale;
    }
  });
}

}  // extern "C"
