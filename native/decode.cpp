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

#include <atomic>
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

// Decode one JPEG file into canvas (canvas_h x canvas_w x channels),
// top-left anchored. Returns true on success and fills h/w.
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
  // libjpeg can downscale by 1/2, 1/4, 1/8 during decode; use it when the
  // source is larger than the canvas (cheap anti-alias + bandwidth saving).
  cinfo.scale_num = 1;
  cinfo.scale_denom = 1;
  for (int denom = 2; denom <= 8; denom *= 2) {
    if (static_cast<int>(cinfo.image_height) / denom >= canvas_h &&
        static_cast<int>(cinfo.image_width) / denom >= canvas_w) {
      cinfo.scale_denom = denom;
    }
  }
  jpeg_start_decompress(&cinfo);

  const int w = static_cast<int>(cinfo.output_width);
  const int h = static_cast<int>(cinfo.output_height);
  const int comps = cinfo.output_components;
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
        std::memcpy(dst, row.data(), static_cast<size_t>(copy_w) * channels);
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
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  *out_h = copy_h;
  *out_w = copy_w;
  return true;
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
