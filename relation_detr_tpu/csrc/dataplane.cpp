// Native data plane: JPEG decode -> bilinear resize -> normalize -> canvas.
//
// TPU-native analogue of the runtime the reference gets from torch's C++
// DataLoader workers + CUDA-stream prefetcher (util/collate_fn.py:17-49):
// a pthread pool turns raw JPEG bytes into ready float32 canvas batches so
// the Python loop never touches pixels. Exposed via a C ABI for ctypes.
//
// Build: g++ -O3 -march=native -shared -fPIC dataplane.cpp -ljpeg -lpthread
//        -o libdataplane.so

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG to RGB8. Returns true on success.
bool decode_jpeg(const uint8_t* data, int64_t size, std::vector<uint8_t>* rgb,
                 int* height, int* width) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, size);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *height = cinfo.output_height;
  *width = cinfo.output_width;
  rgb->resize(static_cast<size_t>(*height) * *width * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb->data() + static_cast<size_t>(cinfo.output_scanline) * *width * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// Bilinear RGB8 resize (half-pixel centers, matching cv2.INTER_LINEAR).
void resize_bilinear(const uint8_t* src, int sh, int sw, uint8_t* dst, int dh,
                     int dw) {
  const float sy = static_cast<float>(sh) / dh;
  const float sx = static_cast<float>(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(std::floor(fy));
    float wy = fy - y0;
    int y0c = std::clamp(y0, 0, sh - 1);
    int y1c = std::clamp(y0 + 1, 0, sh - 1);
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = static_cast<int>(std::floor(fx));
      float wx = fx - x0;
      int x0c = std::clamp(x0, 0, sw - 1);
      int x1c = std::clamp(x0 + 1, 0, sw - 1);
      const uint8_t* p00 = src + (static_cast<size_t>(y0c) * sw + x0c) * 3;
      const uint8_t* p01 = src + (static_cast<size_t>(y0c) * sw + x1c) * 3;
      const uint8_t* p10 = src + (static_cast<size_t>(y1c) * sw + x0c) * 3;
      const uint8_t* p11 = src + (static_cast<size_t>(y1c) * sw + x1c) * 3;
      uint8_t* out = dst + (static_cast<size_t>(y) * dw + x) * 3;
      for (int c = 0; c < 3; ++c) {
        float v = (1 - wy) * ((1 - wx) * p00[c] + wx * p01[c]) +
                  wy * ((1 - wx) * p10[c] + wx * p11[c]);
        out[c] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

struct ThreadPool {
  explicit ThreadPool(int n) {
    for (int i = 0; i < n; ++i) {
      workers.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lock(mu);
            cv.wait(lock, [this] { return stop || !jobs.empty(); });
            if (stop && jobs.empty()) return;
            job = std::move(jobs.front());
            jobs.pop();
          }
          job();
        }
      });
    }
  }
  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lock(mu);
      stop = true;
    }
    cv.notify_all();
    for (auto& w : workers) w.join();
  }
  void submit(std::function<void()> job) {
    {
      std::lock_guard<std::mutex> lock(mu);
      jobs.push(std::move(job));
    }
    cv.notify_one();
  }
  std::vector<std::thread> workers;
  std::queue<std::function<void()>> jobs;
  std::mutex mu;
  std::condition_variable cv;
  bool stop = false;
};

ThreadPool* pool = nullptr;
std::mutex pool_mu;

ThreadPool* get_pool(int threads) {
  std::lock_guard<std::mutex> lock(pool_mu);
  if (!pool) pool = new ThreadPool(threads > 0 ? threads : 4);
  return pool;
}

// One image: decode, shortest-side resize, normalize, paste top-left into a
// zeroed float32 canvas (canvas_h, canvas_w, 3).
int process_one(const uint8_t* bytes, int64_t n_bytes, float* canvas,
                int canvas_h, int canvas_w, int min_size, int max_size,
                const float* mean, const float* stddev, int32_t* out_hw) {
  std::vector<uint8_t> rgb;
  int h = 0, w = 0;
  if (!decode_jpeg(bytes, n_bytes, &rgb, &h, &w)) return -1;

  float r = static_cast<float>(min_size) / std::min(h, w);
  if (max_size > 0) r = std::min(r, static_cast<float>(max_size) / std::max(h, w));
  int nh = std::min(static_cast<int>(std::lround(h * r)), canvas_h);
  int nw = std::min(static_cast<int>(std::lround(w * r)), canvas_w);
  nh = std::max(nh, 1);
  nw = std::max(nw, 1);

  std::vector<uint8_t> resized(static_cast<size_t>(nh) * nw * 3);
  resize_bilinear(rgb.data(), h, w, resized.data(), nh, nw);

  const float inv255 = 1.0f / 255.0f;
  for (int y = 0; y < nh; ++y) {
    float* dst = canvas + (static_cast<size_t>(y) * canvas_w) * 3;
    const uint8_t* src = resized.data() + static_cast<size_t>(y) * nw * 3;
    for (int x = 0; x < nw; ++x) {
      for (int c = 0; c < 3; ++c) {
        dst[x * 3 + c] = (src[x * 3 + c] * inv255 - mean[c]) / stddev[c];
      }
    }
  }
  out_hw[0] = nh;
  out_hw[1] = nw;
  return 0;
}

}  // namespace

extern "C" {

// Batched: bytes_ptrs[i]/byte_lens[i] -> canvases + out_hws (B, 2).
// canvases must be zero-initialized (B, canvas_h, canvas_w, 3) float32.
// Returns number of failed decodes.
int rdetr_decode_batch(const uint8_t** bytes_ptrs, const int64_t* byte_lens,
                       int batch, float* canvases, int canvas_h, int canvas_w,
                       int min_size, int max_size, const float* mean,
                       const float* stddev, int32_t* out_hws, int threads) {
  ThreadPool* tp = get_pool(threads);
  std::atomic<int> failures{0};
  std::atomic<int> done{0};
  std::mutex done_mu;
  std::condition_variable done_cv;
  for (int i = 0; i < batch; ++i) {
    tp->submit([&, i] {
      float* canvas = canvases + static_cast<size_t>(i) * canvas_h * canvas_w * 3;
      if (process_one(bytes_ptrs[i], byte_lens[i], canvas, canvas_h, canvas_w,
                      min_size, max_size, mean, stddev, out_hws + i * 2) != 0) {
        failures.fetch_add(1);
      }
      if (done.fetch_add(1) + 1 == batch) {
        std::lock_guard<std::mutex> lock(done_mu);
        done_cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lock(done_mu);
  done_cv.wait(lock, [&] { return done.load() == batch; });
  return failures.load();
}

int rdetr_decode_one(const uint8_t* bytes, int64_t n_bytes, float* canvas,
                     int canvas_h, int canvas_w, int min_size, int max_size,
                     const float* mean, const float* stddev, int32_t* out_hw) {
  return process_one(bytes, n_bytes, canvas, canvas_h, canvas_w, min_size,
                     max_size, mean, stddev, out_hw);
}

}  // extern "C"
