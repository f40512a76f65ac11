// Native image loader for the EMIP-TPU host data pipeline.
//
// Decodes JPEG (libjpeg) / PNG (libpng) files, resamples with a
// PIL-compatible antialiased triangle (bilinear) filter, and writes
// float32 NHWC pixels — ImageNet-normalized for RGB frames, [0,1] for
// grayscale GT masks. A batch entry point fans work across a thread pool
// so the accelerator-side inference loop stays fed.
//
// The reference framework's host pipeline was pure-Python/PIL
// (dataset/dataset.py); this is the native-runtime equivalent, exposed to
// Python via ctypes (see ../native.py). Opt-in: the PIL path stays the
// default so decoded pixels remain bit-identical to the reference.
//
// Build: g++ -O3 -fPIC -shared loader.cc -o libemiploader.so -ljpeg -lpng
//        (driven by emip_tpu/data/native.py on first use)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

constexpr float kMean[3] = {0.485f, 0.456f, 0.406f};
constexpr float kStd[3] = {0.229f, 0.224f, 0.225f};

struct Image {
  int width = 0;
  int height = 0;
  int channels = 0;  // decoded as 3 (RGB) or 1 (gray)
  std::vector<uint8_t> data;
};

// ------------------------------------------------------------------ JPEG

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

bool decode_jpeg(FILE* f, bool gray, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = gray ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_start_decompress(&cinfo);

  out->width = cinfo.output_width;
  out->height = cinfo.output_height;
  out->channels = cinfo.output_components;
  out->data.resize(size_t(out->width) * out->height * out->channels);

  const int stride = out->width * out->channels;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + size_t(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ------------------------------------------------------------------- PNG

bool decode_png(FILE* f, bool gray, Image* out) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);

  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_packing(png);
  png_set_expand(png);
  if (gray) {
    png_set_rgb_to_gray_fixed(png, 1, -1, -1);  // ITU-R 709-ish; PIL uses 601
  } else {
    png_set_gray_to_rgb(png);
  }
  png_read_update_info(png, info);

  out->width = png_get_image_width(png, info);
  out->height = png_get_image_height(png, info);
  out->channels = gray ? 1 : 3;
  out->data.resize(size_t(out->width) * out->height * out->channels);

  std::vector<png_bytep> rows(out->height);
  const size_t stride = size_t(out->width) * out->channels;
  for (int y = 0; y < out->height; ++y)
    rows[y] = out->data.data() + y * stride;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, bool gray, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  rewind(f);
  bool ok = false;
  if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, gray, out);
  } else if (got >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    ok = decode_png(f, gray, out);
  }
  fclose(f);
  return ok;
}

// ---------------------------------------------------- PIL-style resample

// Triangle (bilinear) filter with antialiasing support scaled by the
// downscale factor — the resampling PIL's Image.resize(BILINEAR) performs.
struct ResampleCoeffs {
  std::vector<int> bounds_min;
  std::vector<int> bounds_size;
  std::vector<float> weights;  // [out, kmax]
  int kmax = 0;
};

ResampleCoeffs build_coeffs(int in_size, int out_size) {
  ResampleCoeffs rc;
  const double scale = double(in_size) / out_size;
  const double filterscale = std::max(scale, 1.0);
  const double support = 1.0 * filterscale;  // triangle support = 1
  rc.kmax = int(std::ceil(support)) * 2 + 1;
  rc.bounds_min.resize(out_size);
  rc.bounds_size.resize(out_size);
  rc.weights.assign(size_t(out_size) * rc.kmax, 0.f);

  for (int i = 0; i < out_size; ++i) {
    const double center = (i + 0.5) * scale;
    int xmin = int(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = int(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    double total = 0.0;
    std::vector<double> w(xmax - xmin);
    for (int j = xmin; j < xmax; ++j) {
      const double t = std::abs((j - center + 0.5) / filterscale);
      w[j - xmin] = t < 1.0 ? 1.0 - t : 0.0;
      total += w[j - xmin];
    }
    rc.bounds_min[i] = xmin;
    rc.bounds_size[i] = xmax - xmin;
    if (total > 0) {
      for (int j = 0; j < xmax - xmin; ++j)
        rc.weights[size_t(i) * rc.kmax + j] = float(w[j] / total);
    }
  }
  return rc;
}

// Resample uint8 HWC to float32 HWC at (out_h, out_w).
void resample(const Image& img, int out_h, int out_w, float* out) {
  const int c = img.channels;
  const ResampleCoeffs rx = build_coeffs(img.width, out_w);
  const ResampleCoeffs ry = build_coeffs(img.height, out_h);

  // horizontal pass: [in_h, out_w, c] — contiguous src taps, per-channel
  // scalar accumulator chains (independent, good ILP); RGB unrolled
  std::vector<float> tmp(size_t(img.height) * out_w * c);
  for (int y = 0; y < img.height; ++y) {
    const uint8_t* src = img.data.data() + size_t(y) * img.width * c;
    float* dst = tmp.data() + size_t(y) * out_w * c;
    if (c == 3) {
      for (int x = 0; x < out_w; ++x) {
        const float* w = rx.weights.data() + size_t(x) * rx.kmax;
        const int n = rx.bounds_size[x];
        const uint8_t* s = src + size_t(rx.bounds_min[x]) * 3;
        float a0 = 0.f, a1 = 0.f, a2 = 0.f;
        for (int j = 0; j < n; ++j, s += 3) {
          const float wj = w[j];
          a0 += wj * s[0];
          a1 += wj * s[1];
          a2 += wj * s[2];
        }
        dst[x * 3 + 0] = a0;
        dst[x * 3 + 1] = a1;
        dst[x * 3 + 2] = a2;
      }
    } else {
      for (int x = 0; x < out_w; ++x) {
        const float* w = rx.weights.data() + size_t(x) * rx.kmax;
        const int n = rx.bounds_size[x];
        const uint8_t* s = src + rx.bounds_min[x];
        float acc = 0.f;
        for (int j = 0; j < n; ++j) acc += w[j] * s[j];
        dst[x] = acc;
      }
    }
  }
  // vertical pass: [out_h, out_w, c] — tap-outer so each tap is one
  // contiguous row axpy over out_w*c elements (vectorizes cleanly)
  const int row = out_w * c;
  for (int y = 0; y < out_h; ++y) {
    const float* w = ry.weights.data() + size_t(y) * ry.kmax;
    const int y0 = ry.bounds_min[y];
    const int n = ry.bounds_size[y];
    float* dst = out + size_t(y) * row;
    const float* r0 = tmp.data() + size_t(y0) * row;
    const float w0 = w[0];
    for (int x = 0; x < row; ++x) dst[x] = w0 * r0[x];
    for (int j = 1; j < n; ++j) {
      const float wj = w[j];
      const float* rj = tmp.data() + size_t(y0 + j) * row;
      for (int x = 0; x < row; ++x) dst[x] += wj * rj[x];
    }
  }
}

void normalize_rgb(float* data, size_t pixels) {
  // (v/255 - mean) / std as one fused multiply-add per element: float
  // division is ~20x the cost of a multiply and this pass was ~40% of
  // the per-image time before the rewrite.
  const float s0 = 1.f / (255.f * kStd[0]), b0 = kMean[0] / kStd[0];
  const float s1 = 1.f / (255.f * kStd[1]), b1 = kMean[1] / kStd[1];
  const float s2 = 1.f / (255.f * kStd[2]), b2 = kMean[2] / kStd[2];
  for (size_t i = 0; i < pixels; ++i) {
    data[i * 3 + 0] = data[i * 3 + 0] * s0 - b0;
    data[i * 3 + 1] = data[i * 3 + 1] * s1 - b1;
    data[i * 3 + 2] = data[i * 3 + 2] * s2 - b2;
  }
}

void scale_gray(float* data, size_t pixels) {
  const float s = 1.f / 255.f;
  for (size_t i = 0; i < pixels; ++i) data[i] *= s;
}

}  // namespace

extern "C" {

// Decode + resize + normalize one image into out [size, size, C] float32.
// gray: 1 => single channel, scaled to [0,1]; 0 => RGB, ImageNet-normalized.
// Returns 0 on success.
int emip_load_image(const char* path, int size, int gray, float* out) {
  Image img;
  if (!decode_file(path, gray != 0, &img)) return 1;
  resample(img, size, size, out);
  const size_t pixels = size_t(size) * size;
  if (gray)
    scale_gray(out, pixels);
  else
    normalize_rgb(out, pixels);
  return 0;
}

// Returns the (height << 16 | width) of an image, or 0 on failure.
// (probe used for native-resolution bookkeeping without a full decode
// pipeline round-trip through Python)
int emip_image_size(const char* path, int* height, int* width) {
  Image img;
  if (!decode_file(path, true, &img)) return 1;
  *height = img.height;
  *width = img.width;
  return 0;
}

// Threaded batch load: n images into out [n, size, size, C].
// Returns the number of failures.
int emip_load_batch(const char** paths, int n, int size, int gray,
                    float* out, int num_threads) {
  if (num_threads < 1) num_threads = 1;
  const size_t stride = size_t(size) * size * (gray ? 1 : 3);
  std::atomic<int> next(0), failures(0);
  auto worker = [&]() {
    while (true) {
      const int i = next.fetch_add(1);
      if (i >= n) break;
      if (emip_load_image(paths[i], size, gray, out + size_t(i) * stride))
        failures.fetch_add(1);
    }
  };
  std::vector<std::thread> threads;
  const int nt = std::min(num_threads, n);
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures.load();
}

}  // extern "C"
