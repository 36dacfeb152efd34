// adamml_tpu native host loader: multi-threaded JPEG decode into fixed
// uint8 canvases.
//
// Replaces the PIL decode path of the reference loader (reference
// utils/video_dataset.py:41-91) on the hot host path: each frame file is
// decoded with libjpeg and written directly into its slot of a
// caller-provided (T, canvas_h, canvas_w, C) buffer -- no intermediate
// Python objects, no per-frame allocations, and the GIL is released for the
// whole batch (ctypes foreign calls drop it), so a small thread pool
// saturates host decode while the TPU computes.
//
// Exported C ABI (see adamml_tpu/data/native_decode.py):
//   int adamml_decode_batch(const char** paths, int n,
//                           unsigned char* canvas, int canvas_h,
//                           int canvas_w, int channels,
//                           int* out_hw /* n*2 */, int n_threads);
// Returns the number of successfully decoded images. Failed slots are left
// zeroed with out_hw = {0, 0} (caller retries via the PIL fallback).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Antialiased separable triangle resample -- the algorithm Pillow >= 2.7
// applies for Image.resize(..., BILINEAR): the filter support scales with
// the reduction factor, so downscales average over the full source
// footprint instead of point-sampling two taps. The PIL fallback path
// (adamml_tpu/data/loaders.py place_in_canvas) fits oversized frames
// through exactly that resize; the native decoder must produce the same
// pixels or the two paths silently disagree on wide/tall sources.
struct ResampleWeights {
  std::vector<int> xmin, xmax;   // per output pixel: [xmin, xmax) in source
  std::vector<float> w;          // ksize weights per output pixel
  int ksize = 0;
};

ResampleWeights triangle_weights(int in_size, int out_size) {
  ResampleWeights rw;
  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = scale < 1.0 ? 1.0 : scale;
  const double support = 1.0 * filterscale;  // bilinear filter support = 1
  rw.ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  rw.xmin.resize(out_size);
  rw.xmax.resize(out_size);
  rw.w.assign(static_cast<size_t>(out_size) * rw.ksize, 0.0f);
  for (int xx = 0; xx < out_size; ++xx) {
    const double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    double total = 0.0;
    float* wrow = rw.w.data() + static_cast<size_t>(xx) * rw.ksize;
    for (int x = xmin; x < xmax; ++x) {
      const double d = std::abs((x + 0.5 - center) / filterscale);
      const double t = d < 1.0 ? 1.0 - d : 0.0;
      wrow[x - xmin] = static_cast<float>(t);
      total += t;
    }
    if (total > 0.0) {
      for (int k = 0; k < xmax - xmin; ++k)
        wrow[k] = static_cast<float>(wrow[k] / total);
    }
    rw.xmin[xx] = xmin;
    rw.xmax[xx] = xmax;
  }
  return rw;
}

// src (h x w x comps) uint8 -> dst (th x tw x comps) uint8, separable
// horizontal-then-vertical triangle resample with float accumulation.
void resize_aa(const unsigned char* src, int h, int w, int comps,
               unsigned char* dst, int th, int tw, size_t dst_row_stride) {
  const ResampleWeights wx = triangle_weights(w, tw);
  const ResampleWeights wy = triangle_weights(h, th);
  // horizontal pass: (h x tw x comps) float
  std::vector<float> mid(static_cast<size_t>(h) * tw * comps);
  for (int y = 0; y < h; ++y) {
    const unsigned char* srow = src + static_cast<size_t>(y) * w * comps;
    float* mrow = mid.data() + static_cast<size_t>(y) * tw * comps;
    for (int xx = 0; xx < tw; ++xx) {
      const float* wrow = wx.w.data() + static_cast<size_t>(xx) * wx.ksize;
      for (int c = 0; c < comps; ++c) {
        float acc = 0.0f;
        for (int x = wx.xmin[xx]; x < wx.xmax[xx]; ++x)
          acc += wrow[x - wx.xmin[xx]] * srow[x * comps + c];
        mrow[xx * comps + c] = acc;
      }
    }
  }
  // vertical pass into dst rows
  for (int yy = 0; yy < th; ++yy) {
    unsigned char* drow = dst + static_cast<size_t>(yy) * dst_row_stride;
    const float* wrow = wy.w.data() + static_cast<size_t>(yy) * wy.ksize;
    for (int xx = 0; xx < tw * comps; ++xx) {
      float acc = 0.0f;
      for (int y = wy.xmin[yy]; y < wy.xmax[yy]; ++y)
        acc += wrow[y - wy.xmin[yy]] *
               mid[static_cast<size_t>(y) * tw * comps + xx];
      const int v = static_cast<int>(acc + 0.5f);
      drow[xx] = static_cast<unsigned char>(v < 0 ? 0 : (v > 255 ? 255 : v));
    }
  }
}

// Decode one JPEG file into canvas (canvas_h x canvas_w x channels),
// top-left anchored. Oversized frames are downscaled TO FIT with the same
// geometry as the PIL fallback (loaders.py place_in_canvas): when either
// dim exceeds the canvas, scale = min(ch/h, cw/w) applied to BOTH dims
// (aspect preserved, truncating like Python int()), antialiased resample.
// Returns true on success and fills the true placed h/w.
bool decode_one(const char* path, unsigned char* canvas, int canvas_h,
                int canvas_w, int channels, int* out_h, int* out_w) {
  *out_h = 0;
  *out_w = 0;
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = channels == 1 ? JCS_GRAYSCALE : JCS_RGB;

  const int orig_h = static_cast<int>(cinfo.image_height);
  const int orig_w = static_cast<int>(cinfo.image_width);
  int target_h = orig_h, target_w = orig_w;
  bool need_fit = false;
  if (orig_h > canvas_h || orig_w > canvas_w) {
    const double scale =
        std::min(static_cast<double>(canvas_h) / orig_h,
                 static_cast<double>(canvas_w) / orig_w);
    target_h = std::max(1, static_cast<int>(orig_h * scale));
    target_w = std::max(1, static_cast<int>(orig_w * scale));
    need_fit = true;
  }
  // libjpeg can downscale by 1/2, 1/4, 1/8 during decode (cheap DCT-domain
  // anti-alias + bandwidth saving); engage the largest factor that keeps
  // BOTH dims at or above the fit target so the resample below only ever
  // shrinks further.
  cinfo.scale_num = 1;
  cinfo.scale_denom = 1;
  for (int denom = 2; denom <= 8; denom *= 2) {
    if ((orig_h + denom - 1) / denom >= target_h &&
        (orig_w + denom - 1) / denom >= target_w) {
      cinfo.scale_denom = denom;
    }
  }
  jpeg_start_decompress(&cinfo);

  const int w = static_cast<int>(cinfo.output_width);
  const int h = static_cast<int>(cinfo.output_height);
  const int comps = cinfo.output_components;

  bool ok = true;
  if (!need_fit) {
    // fits: stream rows straight into the canvas slot (no temp image)
    const int copy_w = w < canvas_w ? w : canvas_w;
    const int copy_h = h < canvas_h ? h : canvas_h;
    std::vector<unsigned char> row(static_cast<size_t>(w) * comps);
    JSAMPROW rowptr = row.data();
    int y = 0;
    while (cinfo.output_scanline < cinfo.output_height) {
      jpeg_read_scanlines(&cinfo, &rowptr, 1);
      if (y < copy_h) {
        unsigned char* dst =
            canvas + (static_cast<size_t>(y) * canvas_w) * channels;
        if (comps == channels) {
          std::memcpy(dst, row.data(),
                      static_cast<size_t>(copy_w) * channels);
        } else if (comps == 1 && channels == 3) {
          for (int x = 0; x < copy_w; ++x) {
            dst[3 * x] = dst[3 * x + 1] = dst[3 * x + 2] = row[x];
          }
        } else if (comps == 3 && channels == 1) {
          for (int x = 0; x < copy_w; ++x) dst[x] = row[3 * x];
        }
      }
      ++y;
    }
    *out_h = copy_h;
    *out_w = copy_w;
  } else {
    // oversized: decode fully (possibly libjpeg-prescaled), then
    // antialias-resample to the fit target in the canvas slot
    std::vector<unsigned char> img(static_cast<size_t>(h) * w * comps);
    while (cinfo.output_scanline < cinfo.output_height) {
      JSAMPROW rowptr =
          img.data() + static_cast<size_t>(cinfo.output_scanline) * w * comps;
      jpeg_read_scanlines(&cinfo, &rowptr, 1);
    }
    if (comps == channels) {
      resize_aa(img.data(), h, w, comps, canvas, target_h, target_w,
                static_cast<size_t>(canvas_w) * channels);
    } else {
      std::vector<unsigned char> fitted(
          static_cast<size_t>(target_h) * target_w * comps);
      resize_aa(img.data(), h, w, comps, fitted.data(), target_h, target_w,
                static_cast<size_t>(target_w) * comps);
      for (int y = 0; y < target_h; ++y) {
        unsigned char* dst =
            canvas + (static_cast<size_t>(y) * canvas_w) * channels;
        const unsigned char* srow =
            fitted.data() + static_cast<size_t>(y) * target_w * comps;
        if (comps == 1 && channels == 3) {
          for (int x = 0; x < target_w; ++x) {
            dst[3 * x] = dst[3 * x + 1] = dst[3 * x + 2] = srow[x];
          }
        } else if (comps == 3 && channels == 1) {
          for (int x = 0; x < target_w; ++x) dst[x] = srow[3 * x];
        }
      }
    }
    *out_h = target_h;
    *out_w = target_w;
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return ok;
}

}  // namespace

extern "C" int adamml_decode_batch(const char** paths, int n,
                                   unsigned char* canvas, int canvas_h,
                                   int canvas_w, int channels, int* out_hw,
                                   int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0);
  std::atomic<int> ok(0);
  const size_t frame_sz =
      static_cast<size_t>(canvas_h) * canvas_w * channels;

  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      int h = 0, w = 0;
      if (decode_one(paths[i], canvas + frame_sz * i, canvas_h, canvas_w,
                     channels, &h, &w)) {
        ok.fetch_add(1);
      }
      out_hw[2 * i] = h;
      out_hw[2 * i + 1] = w;
    }
  };

  if (n_threads == 1 || n == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    const int k = n_threads < n ? n_threads : n;
    pool.reserve(k);
    for (int t = 0; t < k; ++t) pool.emplace_back(worker);
    for (auto& t : pool) t.join();
  }
  return ok.load();
}
