// Native batch JPEG decoder for the host data-loader.
//
// The reference delegates decoding to cv2.imread inside torch DataLoader
// worker processes (tools/load.py:118-132). Here a C++ library decodes a
// whole batch with a thread pool directly into a preallocated contiguous
// (N, H, W, 3) arena — no per-image Python allocations, GIL released for
// the entire batch. Output is BGR uint8, matching cv2.imread.
//
// Build: g++ -O3 -shared -fPIC -o libf3djpeg.so jpeg_decoder.cpp -ljpeg -pthread
// (see fast3dhpe_tpu/data/native_jpeg.py, which builds on first use).

#include <atomic>
#include <csetjmp>
#include <cstdio>
#include <cstring>
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

// Decode one baseline/progressive JPEG into out (expected h*w*3, BGR).
// Returns 0 on success.
int decode_one(const char* path, unsigned char* out, int expect_h,
               int expect_w) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 2;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  if (static_cast<int>(cinfo.output_height) != expect_h ||
      static_cast<int>(cinfo.output_width) != expect_w ||
      cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 3;
  }

  std::vector<unsigned char> row(expect_w * 3);
  unsigned char* rowp = row.data();
  for (int y = 0; y < expect_h; ++y) {
    jpeg_read_scanlines(&cinfo, &rowp, 1);
    unsigned char* dst = out + static_cast<size_t>(y) * expect_w * 3;
    // RGB -> BGR to match cv2.imread
    for (int x = 0; x < expect_w; ++x) {
      dst[x * 3 + 0] = rowp[x * 3 + 2];
      dst[x * 3 + 1] = rowp[x * 3 + 1];
      dst[x * 3 + 2] = rowp[x * 3 + 0];
    }
  }

  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return 0;
}

}  // namespace

extern "C" {

// Probe image dimensions; returns 0 on success.
int f3d_probe_jpeg(const char* path, int* h, int* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  *h = cinfo.image_height;
  *w = cinfo.image_width;
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return 0;
}

// Decode n JPEGs (all expect_h x expect_w x 3) into the contiguous arena
// `out`. Returns 0 on success, or (1 + index) of the first failed file.
int f3d_decode_jpeg_batch(const char** paths, int n, unsigned char* out,
                          int expect_h, int expect_w, int n_threads) {
  const size_t stride = static_cast<size_t>(expect_h) * expect_w * 3;
  std::atomic<int> next(0);
  std::atomic<int> failed(0);

  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n || failed.load() != 0) break;
      int rc = decode_one(paths[i], out + stride * i, expect_h, expect_w);
      if (rc != 0) failed.store(i + 1);
    }
  };

  if (n_threads <= 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
  }
  return failed.load();
}

}  // extern "C"
