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
// Separable fixed-point bilinear resize, uint8 RGB (OpenCV INTER_LINEAR
// semantics: half-pixel centres, edge clamp; 11-bit weights per pass like
// cv2's INTER_RESIZE_COEF_BITS, so results match cv2 to +/-1 LSB).
//
// Layout per output row: horizontal pass gathers into an int32 row buffer
// (<= 255*2048 per entry), cached and reused across consecutive output rows
// that share a source row; the vertical pass is a branch-free contiguous
// blend the compiler auto-vectorises. Optional horizontal flip is folded
// into the x coefficient table (no extra pass), and the result lands
// directly in the (ch,cw) canvas with zeroed padding.
// ---------------------------------------------------------------------------
constexpr int kCoefBits = 11;
constexpr int kCoefOne = 1 << kCoefBits;  // 2048

struct HCoef {
  int x0, x1;
  int32_t w0, w1;
};

void hresize_row(const uint8_t* src_row, const HCoef* cx, int dw,
                 int32_t* out) {
  for (int x = 0; x < dw; ++x) {
    const uint8_t* p0 = src_row + cx[x].x0 * 3;
    const uint8_t* p1 = src_row + cx[x].x1 * 3;
    const int32_t w0 = cx[x].w0, w1 = cx[x].w1;
    out[x * 3 + 0] = p0[0] * w0 + p1[0] * w1;
    out[x * 3 + 1] = p0[1] * w0 + p1[1] * w1;
    out[x * 3 + 2] = p0[2] * w0 + p1[2] * w1;
  }
}

// Resize (sh,sw)->(rh,rw) with optional flip, writing rows into `canvas`
// with stride cw*3 and zeroing the right padding strip.
void resize_into_canvas(const uint8_t* src, int sh, int sw,
                        uint8_t* canvas, int cw,
                        int rh, int rw, bool flip) {
  const double scale_y = static_cast<double>(sh) / rh;
  const double scale_x = static_cast<double>(sw) / rw;

  std::vector<HCoef> cx(rw);
  for (int x = 0; x < rw; ++x) {
    const int xx = flip ? rw - 1 - x : x;
    double fx = (xx + 0.5) * scale_x - 0.5;
    int x0 = static_cast<int>(std::floor(fx));
    double wx = fx - x0;
    if (x0 < 0) { x0 = 0; wx = 0.0; }
    int x1 = std::min(x0 + 1, sw - 1);
    x0 = std::min(x0, sw - 1);
    int32_t w1 = static_cast<int32_t>(wx * kCoefOne + 0.5);
    cx[x] = {x0, x1, kCoefOne - w1, w1};
  }

  const size_t row_elems = static_cast<size_t>(rw) * 3;
  std::vector<int32_t> buf0(row_elems), buf1(row_elems);
  int32_t* bufs[2] = {buf0.data(), buf1.data()};
  int cached[2] = {-1, -1};

  auto hrow = [&](int sy) -> const int32_t* {
    if (cached[0] == sy) return bufs[0];
    if (cached[1] == sy) return bufs[1];
    // evict the row that is older (smaller index): rows arrive monotonically
    const int slot = (cached[0] <= cached[1]) ? 0 : 1;
    hresize_row(src + static_cast<size_t>(sy) * sw * 3, cx.data(), rw,
                bufs[slot]);
    cached[slot] = sy;
    return bufs[slot];
  };

  const int pad_bytes = (cw - rw) * 3;
  for (int y = 0; y < rh; ++y) {
    double fy = (y + 0.5) * scale_y - 0.5;
    int y0 = static_cast<int>(std::floor(fy));
    double wy = fy - y0;
    if (y0 < 0) { y0 = 0; wy = 0.0; }
    int y1 = std::min(y0 + 1, sh - 1);
    y0 = std::min(y0, sh - 1);
    const int32_t wy1 = static_cast<int32_t>(wy * kCoefOne + 0.5);
    const int32_t wy0 = kCoefOne - wy1;

    const int32_t* r0 = hrow(y0);
    const int32_t* r1 = (y1 == y0) ? r0 : hrow(y1);
    uint8_t* out = canvas + static_cast<size_t>(y) * cw * 3;
    constexpr int32_t kRound = 1 << (2 * kCoefBits - 1);
    for (size_t i = 0; i < row_elems; ++i) {
      // max: 255*2048*2048 < 2^31
      int32_t v = (r0[i] * wy0 + r1[i] * wy1 + kRound) >> (2 * kCoefBits);
      out[i] = static_cast<uint8_t>(v > 255 ? 255 : v);
    }
    if (pad_bytes > 0) std::memset(out + row_elems, 0, pad_bytes);
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
  resize_into_canvas(src, sh, sw, canvas, cw, rh, rw, flip != 0);
  // bottom padding rows
  if (rh < ch) {
    std::memset(canvas + static_cast<size_t>(rh) * cw * 3, 0,
                static_cast<size_t>(ch - rh) * cw * 3);
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
