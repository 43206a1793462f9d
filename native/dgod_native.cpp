// dgod_native — native host-side data-path kernels.
//
// TPU-native replacement for the C++ the reference leans on in its input
// pipeline: OpenCV resize/cvtColor (DrivingDataset.py:35-36) and the
// albumentations transform chain (train_driving_dg.py:125-142). One fused
// pass per image: bilinear resize -> optional horizontal flip -> placement
// on the static canvas, on uint8 throughout (normalisation happens fused
// on-device). A pthread pool parallelises across the batch, standing in for
// the reference's 4 DataLoader worker processes (DGcommon.py:151).
//
// C ABI only; bound from Python via ctypes (dgod_tpu/data/native.py).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Bilinear resize, uint8 HWC (OpenCV INTER_LINEAR semantics: half-pixel
// centres, edge clamp).
// ---------------------------------------------------------------------------
void resize_bilinear_u8(const uint8_t* src, int sh, int sw,
                        uint8_t* dst, int dh, int dw, int channels) {
  const float scale_y = static_cast<float>(sh) / dh;
  const float scale_x = static_cast<float>(sw) / dw;
  std::vector<int> x0s(dw), x1s(dw);
  std::vector<float> wxs(dw);
  for (int x = 0; x < dw; ++x) {
    float fx = (x + 0.5f) * scale_x - 0.5f;
    int x0 = static_cast<int>(std::floor(fx));
    float wx = fx - x0;
    if (x0 < 0) { x0 = 0; wx = 0.f; }
    int x1 = std::min(x0 + 1, sw - 1);
    x0 = std::min(x0, sw - 1);
    x0s[x] = x0; x1s[x] = x1; wxs[x] = wx;
  }
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * scale_y - 0.5f;
    int y0 = static_cast<int>(std::floor(fy));
    float wy = fy - y0;
    if (y0 < 0) { y0 = 0; wy = 0.f; }
    int y1 = std::min(y0 + 1, sh - 1);
    y0 = std::min(y0, sh - 1);
    const uint8_t* row0 = src + static_cast<size_t>(y0) * sw * channels;
    const uint8_t* row1 = src + static_cast<size_t>(y1) * sw * channels;
    uint8_t* out = dst + static_cast<size_t>(y) * dw * channels;
    for (int x = 0; x < dw; ++x) {
      const uint8_t* p00 = row0 + x0s[x] * channels;
      const uint8_t* p01 = row0 + x1s[x] * channels;
      const uint8_t* p10 = row1 + x0s[x] * channels;
      const uint8_t* p11 = row1 + x1s[x] * channels;
      float wx = wxs[x];
      for (int c = 0; c < channels; ++c) {
        float top = p00[c] + (p01[c] - p00[c]) * wx;
        float bot = p10[c] + (p11[c] - p10[c]) * wx;
        float v = top + (bot - top) * wy;
        out[x * channels + c] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Minimal thread pool.
// ---------------------------------------------------------------------------
class ThreadPool {
 public:
  explicit ThreadPool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
            if (stop_ && jobs_.empty()) return;
            job = std::move(jobs_.front());
            jobs_.pop();
          }
          job();
        }
      });
    }
  }
  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }
  void submit(std::function<void()> job) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      jobs_.push(std::move(job));
    }
    cv_.notify_one();
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

ThreadPool* pool() {
  static ThreadPool p(std::max(2u, std::thread::hardware_concurrency() / 2));
  return &p;
}

}  // namespace

extern "C" {

// Fused: resize (sh,sw) -> (rh,rw), optional hflip, write into a zeroed
// canvas (ch,cw) at the top-left. All uint8 HWC RGB.
void dgod_prepare_image(const uint8_t* src, int sh, int sw,
                        uint8_t* canvas, int ch, int cw,
                        int rh, int rw, int flip) {
  std::vector<uint8_t> resized(static_cast<size_t>(rh) * rw * 3);
  resize_bilinear_u8(src, sh, sw, resized.data(), rh, rw, 3);
  std::memset(canvas, 0, static_cast<size_t>(ch) * cw * 3);
  for (int y = 0; y < rh; ++y) {
    const uint8_t* in = resized.data() + static_cast<size_t>(y) * rw * 3;
    uint8_t* out = canvas + static_cast<size_t>(y) * cw * 3;
    if (flip) {
      for (int x = 0; x < rw; ++x) {
        const uint8_t* px = in + (rw - 1 - x) * 3;
        out[x * 3 + 0] = px[0];
        out[x * 3 + 1] = px[1];
        out[x * 3 + 2] = px[2];
      }
    } else {
      std::memcpy(out, in, static_cast<size_t>(rw) * 3);
    }
  }
}

// Batch variant across the thread pool. srcs: B pointers; shapes: [B,2]
// (h,w) per image; canvases: contiguous [B, ch, cw, 3]; resized: [B,2];
// flips: [B].
void dgod_prepare_batch(const uint8_t** srcs, const int* shapes,
                        uint8_t* canvases, int ch, int cw,
                        const int* resized, const int* flips, int batch) {
  std::atomic<int> remaining(batch);
  std::mutex mu;
  std::condition_variable cv;
  for (int i = 0; i < batch; ++i) {
    pool()->submit([&, i] {
      dgod_prepare_image(srcs[i], shapes[i * 2], shapes[i * 2 + 1],
                         canvases + static_cast<size_t>(i) * ch * cw * 3,
                         ch, cw, resized[i * 2], resized[i * 2 + 1], flips[i]);
      if (remaining.fetch_sub(1) == 1) {
        std::lock_guard<std::mutex> lk(mu);
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return remaining.load() == 0; });
}

// Fast 'x1 y1 x2 y2;...' parser (DrivingDataset.py:90-105 contract:
// ints, clip at 0). Returns the number of boxes written (<= max_boxes);
// -1 on malformed input (caller falls back to the empty annotation).
int dgod_parse_boxes(const char* s, float* out, int max_boxes) {
  if (std::strcmp(s, "no_box") == 0) return 0;
  int n = 0;
  const char* p = s;
  while (*p && n < max_boxes) {
    for (int k = 0; k < 4; ++k) {
      char* end = nullptr;
      float v = std::strtof(p, &end);
      if (end == p) return -1;
      // reference decode: int cast then clip at 0 (DrivingDataset.py:101)
      v = static_cast<float>(static_cast<int>(v));
      out[n * 4 + k] = v < 0.f ? 0.f : v;
      p = end;
      while (*p == ' ') ++p;
    }
    if (*p == ';') ++p;
    else if (*p) return -1;
    ++n;
  }
  return n;
}

int dgod_parse_labels(const char* s, int* out, int max_labels) {
  if (std::strcmp(s, "no_label") == 0) return 0;
  int n = 0;
  const char* p = s;
  while (*p && n < max_labels) {
    char* end = nullptr;
    long v = std::strtol(p, &end, 10);
    if (end == p) return -1;
    out[n++] = static_cast<int>(v);
    p = end;
    if (*p == ';') ++p;
    else if (*p) return -1;
  }
  return n;
}

}  // extern "C"
