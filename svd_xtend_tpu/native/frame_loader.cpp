// Native frame loader: threaded JPEG decode + bilinear resize + [-1,1]
// normalize, for the video-frame training pipeline.
//
// The reference feeds training from torch DataLoader workers doing
// PIL decode + resize per frame (DummyDataset, reference train_svd.py:70-136);
// its native speed lives in the C of libjpeg under PIL. This is the
// TPU-framework equivalent as an explicit native component: one call decodes
// a whole clip (N frames) on a thread pool straight into the caller's
// pinned numpy buffer — no Python-object churn, no worker processes.
//
// C API (ctypes-friendly, see native/__init__.py):
//   fl_decode_resize(path, out_w, out_h, out)         -> 0 on success
//   fl_load_clip(paths, n, out_w, out_h, threads, out)-> #frames decoded OK
//   fl_version()                                      -> build tag

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <csetjmp>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void err_exit(j_common_ptr cinfo) {
  ErrMgr* e = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(e->jb, 1);
}

bool decode_jpeg(const char* path, std::vector<unsigned char>& rgb, int& w,
                 int& h) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  w = static_cast<int>(cinfo.output_width);
  h = static_cast<int>(cinfo.output_height);
  rgb.resize(static_cast<size_t>(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row =
        rgb.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// PIL-style triangular (BILINEAR) resampling: separable two-pass with
// adaptive filter support (anti-aliased on downscale — matches
// Image.resize(..., BILINEAR), which the PIL fallback path uses), fused with
// the [0,255] -> [-1,1] normalize the reference applies (train_svd.py:125).
// Output: HWC float32.

struct Taps {
  std::vector<int> xmin, xlen;
  std::vector<float> weights;   // per output index: xlen[i] weights at
  int ksize = 0;                // stride ksize (max support)
};

Taps make_taps(int in_size, int out_size) {
  Taps t;
  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = scale < 1.0 ? 1.0 : scale;
  const double support = 1.0 * filterscale;  // triangle filter support = 1
  t.ksize = static_cast<int>(support * 2.0) + 2;
  t.xmin.resize(out_size);
  t.xlen.resize(out_size);
  t.weights.assign(static_cast<size_t>(out_size) * t.ksize, 0.0);
  for (int i = 0; i < out_size; ++i) {
    const double center = (i + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    float* w = &t.weights[static_cast<size_t>(i) * t.ksize];
    double total = 0.0;
    for (int k = xmin; k < xmax; ++k) {
      double x = (k - center + 0.5) / filterscale;
      if (x < 0.0) x = -x;
      const double v = x < 1.0 ? 1.0 - x : 0.0;
      w[k - xmin] = static_cast<float>(v);
      total += v;
    }
    if (total > 0.0)
      for (int k = 0; k < xmax - xmin; ++k)
        w[k] = static_cast<float>(w[k] / total);
    t.xmin[i] = xmin;
    t.xlen[i] = xmax - xmin;
  }
  return t;
}

void resize_normalize(const std::vector<unsigned char>& src, int sw, int sh,
                      int dw, int dh, float* out) {
  const Taps tx = make_taps(sw, dw);
  const Taps ty = make_taps(sh, dh);
  // horizontal pass: (sh, sw, 3) u8 -> (sh, dw, 3) float
  std::vector<float> tmp(static_cast<size_t>(sh) * dw * 3);
  for (int y = 0; y < sh; ++y) {
    const unsigned char* row = &src[static_cast<size_t>(y) * sw * 3];
    float* trow = &tmp[static_cast<size_t>(y) * dw * 3];
    for (int x = 0; x < dw; ++x) {
      const float* w = &tx.weights[static_cast<size_t>(x) * tx.ksize];
      const int x0 = tx.xmin[x], n = tx.xlen[x];
      float acc0 = 0.f, acc1 = 0.f, acc2 = 0.f;
      for (int k = 0; k < n; ++k) {
        const unsigned char* p = row + (static_cast<size_t>(x0) + k) * 3;
        acc0 += w[k] * p[0];
        acc1 += w[k] * p[1];
        acc2 += w[k] * p[2];
      }
      trow[x * 3 + 0] = acc0;
      trow[x * 3 + 1] = acc1;
      trow[x * 3 + 2] = acc2;
    }
  }
  // vertical pass + normalize: (sh, dw, 3) -> (dh, dw, 3) in [-1, 1]
  for (int y = 0; y < dh; ++y) {
    const float* w = &ty.weights[static_cast<size_t>(y) * ty.ksize];
    const int y0 = ty.xmin[y], n = ty.xlen[y];
    float* orow = out + static_cast<size_t>(y) * dw * 3;
    const int row_elems = dw * 3;
    // k-outer / x-inner: unit-stride FMA over the row, auto-vectorizes
    for (int x = 0; x < row_elems; ++x) orow[x] = 0.f;
    for (int k = 0; k < n; ++k) {
      const float wk = w[k];
      const float* trow = &tmp[(static_cast<size_t>(y0) + k) * row_elems];
      for (int x = 0; x < row_elems; ++x) orow[x] += wk * trow[x];
    }
    for (int x = 0; x < row_elems; ++x)
      orow[x] = orow[x] * (2.0f / 255.0f) - 1.0f;
  }
}

}  // namespace

extern "C" {

int fl_decode_resize(const char* path, int out_w, int out_h, float* out) {
  std::vector<unsigned char> rgb;
  int w = 0, h = 0;
  if (!decode_jpeg(path, rgb, w, h)) return 1;
  resize_normalize(rgb, w, h, out_w, out_h, out);
  return 0;
}

// Decode n frames concurrently; out is (n, out_h, out_w, 3) float32.
// Returns the number of successfully decoded frames (== n when all OK).
int fl_load_clip(const char** paths, int n, int out_w, int out_h,
                 int num_threads, float* out) {
  if (num_threads < 1) num_threads = 1;
  std::atomic<int> next(0), ok(0);
  const size_t frame_elems = static_cast<size_t>(out_w) * out_h * 3;
  auto worker = [&]() {
    std::vector<unsigned char> rgb;
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      int w = 0, h = 0;
      if (decode_jpeg(paths[i], rgb, w, h)) {
        resize_normalize(rgb, w, h, out_w, out_h, out + i * frame_elems);
        ok.fetch_add(1);
      } else {
        memset(out + i * frame_elems, 0, frame_elems * sizeof(float));
      }
    }
  };
  const int t = num_threads < n ? num_threads : n;
  std::vector<std::thread> pool;
  pool.reserve(t);
  for (int i = 0; i < t; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return ok.load();
}

const char* fl_version() { return "frame_loader 1.0 (libjpeg, bilinear)"; }

}  // extern "C"
