// taedata — native host-side image pipeline for tae_tpu.
//
// The reference's input path burns CPU in PIL/libjpeg via torch DataLoader
// workers (reference train.py:84-85; SURVEY.md §2.1 N9/N10). This library
// is the tae_tpu equivalent: JPEG decode (libjpeg, with DCT-domain
// downscaling) fused with crop + separable PIL-style resampling + hflip +
// normalize + CHW layout in one pass over the pixels, callable per-image or
// batched over an internal thread pool. Exposed as a C ABI for ctypes
// (tae_tpu/data/native.py); the Python layer falls back to PIL when the
// library is absent.
//
// Resampling matches PIL semantics: convolution resampling with triangle
// (bilinear) or Keys cubic a=-0.5 (bicubic) kernels whose support widens by
// the downscale factor (PIL's antialias behavior), computed in float32.

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

// ----------------------------------------------------------------------
// JPEG decode
// ----------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

// Decode to RGB8. scale_denom in {1,2,4,8} uses libjpeg's DCT-domain
// downscaling (decode at 1/scale_denom resolution nearly for free).
bool decode_jpeg(const uint8_t* data, size_t len, int scale_denom,
                 std::vector<uint8_t>* out, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JpegErr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jpeg_err_exit;
  if (setjmp(err.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  cinfo.scale_num = 1;
  cinfo.scale_denom = scale_denom;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  out->resize(size_t(*w) * *h * 3);
  JSAMPROW row;
  while (cinfo.output_scanline < cinfo.output_height) {
    row = out->data() + size_t(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ----------------------------------------------------------------------
// PIL-style separable resampling from an arbitrary source box
// ----------------------------------------------------------------------

inline float cubic_filter(float x) {  // Keys a = -0.5 (PIL BICUBIC)
  constexpr float a = -0.5f;
  x = std::fabs(x);
  if (x < 1.0f) return ((a + 2.0f) * x - (a + 3.0f)) * x * x + 1.0f;
  if (x < 2.0f) return (((x - 5.0f) * x + 8.0f) * x - 4.0f) * a;
  return 0.0f;
}

inline float triangle_filter(float x) {  // bilinear
  x = std::fabs(x);
  return x < 1.0f ? 1.0f - x : 0.0f;
}

struct Weights {
  int taps;                 // kernel taps per output pixel
  std::vector<int> first;   // first source index per output pixel
  std::vector<float> w;     // (out, taps) weights
};

// PIL precompute_coeffs: half-pixel centers over [box0, box1) -> out_size.
Weights compute_weights(float box0, float box1, int in_size, int out_size,
                        int filter) {
  const float support_base = filter == 1 ? 2.0f : 1.0f;
  const float scale = (box1 - box0) / out_size;
  const float fscale = std::max(scale, 1.0f);
  const float support = support_base * fscale;
  const int taps = int(std::ceil(support)) * 2 + 1;
  Weights ww;
  ww.taps = taps;
  ww.first.resize(out_size);
  ww.w.assign(size_t(out_size) * taps, 0.0f);
  for (int i = 0; i < out_size; ++i) {
    const float center = box0 + (i + 0.5f) * scale;
    int xmin = std::max(int(center - support + 0.5f), 0);
    int xmax = std::min(int(center + support + 0.5f), in_size);
    ww.first[i] = xmin;
    float sum = 0.0f;
    for (int x = xmin; x < xmax; ++x) {
      float v = (filter == 1 ? cubic_filter((x - center + 0.5f) / fscale)
                             : triangle_filter((x - center + 0.5f) / fscale));
      ww.w[size_t(i) * taps + (x - xmin)] = v;
      sum += v;
    }
    if (sum != 0.0f)
      for (int t = 0; t < taps; ++t) ww.w[size_t(i) * taps + t] /= sum;
  }
  return ww;
}

// Resize RGB8 (h, w) from box -> float32 CHW (3, out, out), normalized,
// with optional horizontal flip fused into the output indexing.
// out != nullptr: normalized float32. out_u8 != nullptr: rounded uint8
// (PIL semantics — PIL/torchvision round the resample back to uint8
// before ToTensor/Normalize; the u8 path feeds device-side normalization
// and quarters host->device transfer bytes).
// patch == 0: CHW layout. patch > 0: patchified (N, C*patch*patch) layout,
// channel-major per patch (tae_tpu.ops.patchify.extract_patches order) —
// the device-side patch embedding becomes a pure matmul with no relayout.
void resize_box_normalize(const uint8_t* rgb, int w, int h, float bx0,
                          float by0, float bx1, float by1, int out_size,
                          int filter, const float* mean, const float* stdv,
                          int hflip, float* out, uint8_t* out_u8 = nullptr,
                          int patch = 0) {
  Weights wx = compute_weights(bx0, bx1, w, out_size, filter);
  Weights wy = compute_weights(by0, by1, h, out_size, filter);
  // horizontal pass into (h', out) float, rows limited to the y-support
  int ymin = h, ymax = 0;
  for (int i = 0; i < out_size; ++i) {
    ymin = std::min(ymin, wy.first[i]);
    int last = wy.first[i];
    for (int t = 0; t < wy.taps; ++t)
      if (wy.w[size_t(i) * wy.taps + t] != 0.0f) last = wy.first[i] + t;
    ymax = std::max(ymax, last + 1);
  }
  ymin = std::max(ymin, 0);
  ymax = std::min(ymax, h);
  const int hh = std::max(ymax - ymin, 1);
  std::vector<float> tmp(size_t(hh) * out_size * 3);
  for (int y = 0; y < hh; ++y) {
    const uint8_t* row = rgb + size_t(y + ymin) * w * 3;
    for (int i = 0; i < out_size; ++i) {
      float acc[3] = {0, 0, 0};
      const float* wrow = &wx.w[size_t(i) * wx.taps];
      const int x0 = wx.first[i];
      const int tmax = std::min(wx.taps, w - x0);
      for (int t = 0; t < tmax; ++t) {
        const float f = wrow[t];
        if (f == 0.0f) continue;
        const uint8_t* px = row + size_t(x0 + t) * 3;
        acc[0] += f * px[0];
        acc[1] += f * px[1];
        acc[2] += f * px[2];
      }
      float* o = &tmp[(size_t(y) * out_size + i) * 3];
      o[0] = acc[0];
      o[1] = acc[1];
      o[2] = acc[2];
    }
  }
  // vertical pass + normalize + CHW (+ hflip)
  const float inv255 = 1.0f / 255.0f;
  for (int j = 0; j < out_size; ++j) {
    const float* wrow = &wy.w[size_t(j) * wy.taps];
    const int y0 = wy.first[j] - ymin;
    const int tmax = std::min(wy.taps, hh - y0);
    for (int i = 0; i < out_size; ++i) {
      float acc[3] = {0, 0, 0};
      for (int t = 0; t < tmax; ++t) {
        const float f = wrow[t];
        if (f == 0.0f) continue;
        const float* px = &tmp[(size_t(y0 + t) * out_size + i) * 3];
        acc[0] += f * px[0];
        acc[1] += f * px[1];
        acc[2] += f * px[2];
      }
      const int oi = hflip ? (out_size - 1 - i) : i;
      size_t base, cstride;
      if (patch > 0) {
        const int gw = out_size / patch;
        const size_t n = size_t(j / patch) * gw + oi / patch;
        base = n * size_t(3) * patch * patch + size_t(j % patch) * patch +
               oi % patch;
        cstride = size_t(patch) * patch;
      } else {
        base = size_t(j) * out_size + oi;
        cstride = size_t(out_size) * out_size;
      }
      for (int c = 0; c < 3; ++c) {
        float v = std::clamp(acc[c], 0.0f, 255.0f);
        if (out_u8)
          out_u8[c * cstride + base] = uint8_t(v + 0.5f);
        else
          out[c * cstride + base] = (v * inv255 - mean[c]) / stdv[c];
      }
    }
  }
}

// ----------------------------------------------------------------------
// thread pool for batch calls
// ----------------------------------------------------------------------

class Pool {
 public:
  explicit Pool(int n) {
    for (int i = 0; i < n; ++i)
      workers_.emplace_back([this] { loop(); });
  }
  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }
  void submit(std::function<void()> fn) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      q_.push(std::move(fn));
    }
    cv_.notify_one();
  }

 private:
  void loop() {
    for (;;) {
      std::function<void()> fn;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !q_.empty(); });
        if (stop_ && q_.empty()) return;
        fn = std::move(q_.front());
        q_.pop();
      }
      fn();
    }
  }
  std::mutex mu_;
  std::condition_variable cv_;
  std::queue<std::function<void()>> q_;
  std::vector<std::thread> workers_;
  bool stop_ = false;
};

Pool* pool = nullptr;
std::mutex pool_mu;

Pool* get_pool(int threads) {
  std::lock_guard<std::mutex> lk(pool_mu);
  if (!pool) pool = new Pool(threads > 0 ? threads : 1);
  return pool;
}

int pick_scale_denom(int w, int h, float bw, float bh, int out_size) {
  // decode at reduced DCT scale while the crop box still covers >=2x the
  // output resolution (keeps the resample strictly downscaling)
  int denom = 1;
  while (denom < 8 && bw / (denom * 2) >= out_size * 2 &&
         bh / (denom * 2) >= out_size * 2)
    denom *= 2;
  (void)w;
  (void)h;
  return denom;
}

}  // namespace

extern "C" {

int tae_jpeg_info(const uint8_t* data, size_t len, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JpegErr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jpeg_err_exit;
  if (setjmp(err.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  *w = cinfo.image_width;
  *h = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Decode full-resolution RGB8 into out (caller sizes it via tae_jpeg_info).
int tae_jpeg_decode(const uint8_t* data, size_t len, uint8_t* out_rgb,
                    int expect_w, int expect_h) {
  std::vector<uint8_t> buf;
  int w, h;
  if (!decode_jpeg(data, len, 1, &buf, &w, &h)) return -1;
  if (w != expect_w || h != expect_h) return -2;
  std::memcpy(out_rgb, buf.data(), buf.size());
  return 0;
}

// Fused decode -> crop box -> resample -> (hflip) -> normalize -> CHW f32.
// box coords are in original-image pixels; filter: 0 bilinear, 1 bicubic.
int tae_decode_to_tensor(const uint8_t* data, size_t len, float bx0, float by0,
                         float bx1, float by1, int out_size, int filter,
                         const float* mean, const float* stdv, int hflip,
                         float* out_chw, int patch = 0) {
  int denom = pick_scale_denom(0, 0, bx1 - bx0, by1 - by0, out_size);
  std::vector<uint8_t> rgb;
  int w, h;
  if (!decode_jpeg(data, len, denom, &rgb, &w, &h)) return -1;
  const float s = 1.0f / denom;
  resize_box_normalize(rgb.data(), w, h, bx0 * s, by0 * s, bx1 * s, by1 * s,
                       out_size, filter, mean, stdv, hflip, out_chw, nullptr,
                       patch);
  return 0;
}

// Fused decode -> crop -> resample -> (hflip) -> uint8 CHW (no normalize;
// pairs with on-device normalization for 4x smaller host->device copies).
int tae_decode_to_u8(const uint8_t* data, size_t len, float bx0, float by0,
                     float bx1, float by1, int out_size, int filter,
                     int hflip, uint8_t* out_chw, int patch = 0) {
  int denom = pick_scale_denom(0, 0, bx1 - bx0, by1 - by0, out_size);
  std::vector<uint8_t> rgb;
  int w, h;
  if (!decode_jpeg(data, len, denom, &rgb, &w, &h)) return -1;
  const float s = 1.0f / denom;
  resize_box_normalize(rgb.data(), w, h, bx0 * s, by0 * s, bx1 * s, by1 * s,
                       out_size, filter, nullptr, nullptr, hflip, nullptr,
                       out_chw, patch);
  return 0;
}

struct BatchItem {
  const uint8_t* data;
  size_t len;
  float box[4];
  int hflip;
};

// Batched fused decode over the thread pool. items laid out as parallel
// arrays; outputs written to out_chw[(i) * 3 * out * out]. status (may be
// null) receives per-item 0=ok / 1=failed so callers can drop individual
// undecodable images instead of aborting the batch; returns failed count.
int tae_decode_batch(const uint8_t** datas, const size_t* lens,
                     const float* boxes, const int* hflips, int n,
                     int out_size, int filter, const float* mean,
                     const float* stdv, int threads, float* out_chw,
                     int patch, int* status) {
  Pool* p = get_pool(threads);
  std::atomic<int> done{0};
  std::atomic<int> failed{0};
  std::mutex mu;
  std::condition_variable cv;
  const size_t stride = size_t(3) * out_size * out_size;
  for (int i = 0; i < n; ++i) {
    p->submit([&, i] {
      int rc = tae_decode_to_tensor(datas[i], lens[i], boxes[i * 4 + 0],
                                    boxes[i * 4 + 1], boxes[i * 4 + 2],
                                    boxes[i * 4 + 3], out_size, filter, mean,
                                    stdv, hflips[i], out_chw + i * stride,
                                    patch);
      if (status) status[i] = rc != 0;
      if (rc != 0) failed.fetch_add(1);
      if (done.fetch_add(1) + 1 == n) {
        std::lock_guard<std::mutex> lk(mu);
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done.load() == n; });
  return failed.load();
}

// Batched uint8 variant of tae_decode_batch (device-side normalization).
int tae_decode_batch_u8(const uint8_t** datas, const size_t* lens,
                        const float* boxes, const int* hflips, int n,
                        int out_size, int filter, int threads,
                        uint8_t* out_chw, int patch, int* status) {
  Pool* p = get_pool(threads);
  std::atomic<int> done{0};
  std::atomic<int> failed{0};
  std::mutex mu;
  std::condition_variable cv;
  const size_t stride = size_t(3) * out_size * out_size;
  for (int i = 0; i < n; ++i) {
    p->submit([&, i] {
      int rc = tae_decode_to_u8(datas[i], lens[i], boxes[i * 4 + 0],
                                boxes[i * 4 + 1], boxes[i * 4 + 2],
                                boxes[i * 4 + 3], out_size, filter,
                                hflips[i], out_chw + i * stride, patch);
      if (status) status[i] = rc != 0;
      if (rc != 0) failed.fetch_add(1);
      if (done.fetch_add(1) + 1 == n) {
        std::lock_guard<std::mutex> lk(mu);
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done.load() == n; });
  return failed.load();
}

}  // extern "C"
