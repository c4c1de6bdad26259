// Native training data loader — the TPU-framework counterpart of the
// reference's torch DataLoader worker processes (main_train_psnr.py:116-145).
//
// What it does (entirely off the Python GIL, std::thread pool):
//   * decodes PNG/JPEG images into a shared RAM cache (libpng / libjpeg)
//   * samples random patches, applies the 8-mode flip/rot augmentation
//     (same table as utils_image.augment_img, utils_image.py:387-404)
//   * converts uint8 -> float32 [0,1] and synthesises AWGN with a
//     per-thread xorshift128+ / Box-Muller generator (the DnCNN training
//     degradation, dataset_dncnn.py:70-75)
//
// C ABI (ctypes-friendly); see kair_tpu/data/native_loader.py.

#include <atomic>
#include <cmath>
#include <csetjmp>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <png.h>
#include <jpeglib.h>

namespace {

struct Image {
  int h = 0, w = 0, c = 0;
  std::vector<uint8_t> data;  // HWC
};

// ----------------------------------------------------------------- decode

bool decode_png(const char* path, int want_c, Image* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) {
    fclose(fp);
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    fclose(fp);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  if (want_c == 3 &&
      (color_type == PNG_COLOR_TYPE_GRAY ||
       color_type == PNG_COLOR_TYPE_GRAY_ALPHA))
    png_set_gray_to_rgb(png);
  if (want_c == 1 &&
      (color_type == PNG_COLOR_TYPE_RGB ||
       color_type == PNG_COLOR_TYPE_RGB_ALPHA ||
       color_type == PNG_COLOR_TYPE_PALETTE))
    png_set_rgb_to_gray_fixed(png, 1, -1, -1);  // BT.709 luma
  png_read_update_info(png, info);

  int c = png_get_channels(png, info);
  out->h = static_cast<int>(h);
  out->w = static_cast<int>(w);
  out->c = c;
  out->data.resize(static_cast<size_t>(h) * w * c);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = out->data.data() + static_cast<size_t>(y) * w * c;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return true;
}

// libjpeg's default error_exit calls exit() — a single corrupt JPEG in the
// training set would kill the whole process. longjmp back and fail the
// decode instead (mirrors the libpng setjmp pattern above).
struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void jpeg_error_longjmp(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jump, 1);
}

bool decode_jpeg(const char* path, int want_c, Image* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_longjmp;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = (want_c == 1) ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->h = cinfo.output_height;
  out->w = cinfo.output_width;
  out->c = cinfo.output_components;
  out->data.resize(static_cast<size_t>(out->h) * out->w * out->c);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out->data.data() +
                   static_cast<size_t>(cinfo.output_scanline) * out->w * out->c;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  return true;
}

bool decode_image(const std::string& path, int want_c, Image* out) {
  auto dot = path.rfind('.');
  std::string ext = dot == std::string::npos ? "" : path.substr(dot + 1);
  for (auto& ch : ext) ch = static_cast<char>(tolower(ch));
  if (ext == "jpg" || ext == "jpeg") return decode_jpeg(path.c_str(), want_c, out);
  return decode_png(path.c_str(), want_c, out);
}

// --------------------------------------------------------------- rng

struct Rng {
  uint64_t s0, s1;
  explicit Rng(uint64_t seed) {
    s0 = seed * 0x9E3779B97F4A7C15ULL + 1;
    s1 = (seed ^ 0xBF58476D1CE4E5B9ULL) | 1;
    for (int i = 0; i < 8; ++i) next();
  }
  uint64_t next() {  // xorshift128+
    uint64_t x = s0, y = s1;
    s0 = y;
    x ^= x << 23;
    s1 = x ^ y ^ (x >> 17) ^ (y >> 26);
    return s1 + y;
  }
  uint32_t below(uint32_t n) { return n ? static_cast<uint32_t>(next() % n) : 0; }
  float uniform() { return (next() >> 11) * (1.0f / 9007199254740992.0f); }
  float gauss() {  // Box-Muller
    float u1 = uniform(), u2 = uniform();
    if (u1 < 1e-12f) u1 = 1e-12f;
    return std::sqrt(-2.0f * std::log(u1)) * std::cos(6.2831853f * u2);
  }
};

// ------------------------------------------------- augmentation (8 modes)

// identical geometry table to utils_image.augment_img (utils_image.py:387)
void augment_patch(const uint8_t* src, int ps, int c, int mode, uint8_t* dst) {
  for (int y = 0; y < ps; ++y) {
    for (int x = 0; x < ps; ++x) {
      int sy = y, sx = x;
      switch (mode) {
        case 0: break;
        case 1: sy = x; sx = y; break;                    // flipud(rot90) = transpose
        case 2: sy = ps - 1 - y; sx = x; break;           // flipud
        case 3: sy = ps - 1 - x; sx = y; break;           // rot90 k=3
        case 4: sy = y; sx = ps - 1 - x; break;           // flipud(rot180)
        case 5: sy = x; sx = ps - 1 - y; break;           // rot90
        case 6: sy = ps - 1 - y; sx = ps - 1 - x; break;  // rot180
        case 7: sy = ps - 1 - x; sx = ps - 1 - y; break;  // flipud(rot270) = anti-transpose
      }
      std::memcpy(dst + (static_cast<size_t>(y) * ps + x) * c,
                  src + (static_cast<size_t>(sy) * ps + sx) * c, c);
    }
  }
}

// ------------------------------------------------------------- loader

struct Loader {
  std::vector<Image> images;
  int n_channels = 1;
  int n_threads = 4;
};

void parallel_for(int n_threads, int n_items,
                  const std::function<void(int, int)>& fn) {
  std::vector<std::thread> threads;
  std::atomic<int> next(0);
  int t_count = std::min(n_threads, n_items);
  for (int t = 0; t < t_count; ++t) {
    threads.emplace_back([&, t]() {
      int i;
      while ((i = next.fetch_add(1)) < n_items) fn(i, t);
    });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Load and decode `n` image files into a RAM cache. Returns handle or null.
void* loader_create(const char** paths, int n, int n_channels, int n_threads) {
  auto* L = new Loader;
  L->n_channels = n_channels;
  L->n_threads = n_threads;
  L->images.resize(n);
  std::atomic<bool> ok(true);
  parallel_for(n_threads, n, [&](int i, int) {
    if (!decode_image(paths[i], n_channels, &L->images[i])) ok = false;
  });
  if (!ok) {
    delete L;
    return nullptr;
  }
  return L;
}

int loader_num_images(void* handle) {
  return static_cast<int>(static_cast<Loader*>(handle)->images.size());
}

int loader_image_shape(void* handle, int idx, int* h, int* w, int* c) {
  auto* L = static_cast<Loader*>(handle);
  if (idx < 0 || idx >= static_cast<int>(L->images.size())) return -1;
  *h = L->images[idx].h;
  *w = L->images[idx].w;
  *c = L->images[idx].c;
  return 0;
}

// Sample a batch of AWGN training pairs:
//   out_H, out_L: float32 [batch, ps, ps, C] buffers (caller-allocated)
// Per item: random image, random crop, random 8-mode augmentation,
// L = H + sigma/255 * N(0,1) (the dataset_dncnn.py:60-75 pipeline).
int loader_sample_awgn_batch(void* handle, int batch, int ps, float sigma,
                             uint64_t seed, float* out_L, float* out_H) {
  auto* L = static_cast<Loader*>(handle);
  const int c = L->n_channels;
  const float nl = sigma / 255.0f;
  std::atomic<bool> ok(true);
  parallel_for(L->n_threads, batch, [&](int i, int) {
    Rng rng(seed + 0x5851F42D4C957F2DULL * (i + 1));
    const Image& img = L->images[rng.below(L->images.size())];
    if (img.h < ps || img.w < ps) {
      ok = false;
      return;
    }
    int ry = rng.below(img.h - ps + 1);
    int rx = rng.below(img.w - ps + 1);
    // crop into a contiguous patch
    std::vector<uint8_t> crop(static_cast<size_t>(ps) * ps * c);
    for (int y = 0; y < ps; ++y)
      std::memcpy(crop.data() + static_cast<size_t>(y) * ps * c,
                  img.data.data() +
                      ((static_cast<size_t>(ry) + y) * img.w + rx) * c,
                  static_cast<size_t>(ps) * c);
    std::vector<uint8_t> aug(crop.size());
    augment_patch(crop.data(), ps, c, rng.below(8), aug.data());

    float* h_dst = out_H + static_cast<size_t>(i) * ps * ps * c;
    float* l_dst = out_L + static_cast<size_t>(i) * ps * ps * c;
    const float inv255 = 1.0f / 255.0f;
    for (size_t k = 0; k < aug.size(); ++k) {
      float v = aug[k] * inv255;
      h_dst[k] = v;
      l_dst[k] = v + nl * rng.gauss();
    }
  });
  return ok ? 0 : -1;
}

// Like loader_sample_awgn_batch but with a per-item noise level drawn
// uniformly from [sigma_min, sigma_max] (the dataset_fdncnn.py /
// dataset_ffdnet.py train protocol); the drawn level (already /255) is
// written to out_level[i] so the python side can build the conditioning
// channel (H x W map for FDnCNN, scalar C for FFDNet).
int loader_sample_awgn_range_batch(void* handle, int batch, int ps,
                                   float sigma_min, float sigma_max,
                                   uint64_t seed, float* out_L, float* out_H,
                                   float* out_level) {
  auto* L = static_cast<Loader*>(handle);
  const int c = L->n_channels;
  std::atomic<bool> ok(true);
  parallel_for(L->n_threads, batch, [&](int i, int) {
    Rng rng(seed + 0x5851F42D4C957F2DULL * (i + 1));
    const Image& img = L->images[rng.below(L->images.size())];
    if (img.h < ps || img.w < ps) {
      ok = false;
      return;
    }
    int ry = rng.below(img.h - ps + 1);
    int rx = rng.below(img.w - ps + 1);
    std::vector<uint8_t> crop(static_cast<size_t>(ps) * ps * c);
    for (int y = 0; y < ps; ++y)
      std::memcpy(crop.data() + static_cast<size_t>(y) * ps * c,
                  img.data.data() +
                      ((static_cast<size_t>(ry) + y) * img.w + rx) * c,
                  static_cast<size_t>(ps) * c);
    std::vector<uint8_t> aug(crop.size());
    augment_patch(crop.data(), ps, c, rng.below(8), aug.data());

    const float nl =
        (sigma_min + rng.uniform() * (sigma_max - sigma_min)) / 255.0f;
    out_level[i] = nl;
    float* h_dst = out_H + static_cast<size_t>(i) * ps * ps * c;
    float* l_dst = out_L + static_cast<size_t>(i) * ps * ps * c;
    const float inv255 = 1.0f / 255.0f;
    for (size_t k = 0; k < aug.size(); ++k) {
      float v = aug[k] * inv255;
      h_dst[k] = v;
      l_dst[k] = v + nl * rng.gauss();
    }
  });
  return ok ? 0 : -1;
}

// Expose the augmentation table for mode-indexed parity tests against
// utils_image.augment_img (the geometry must match exactly for seeded
// python-batch reproduction and x8-ensemble parity).
void loader_augment(const uint8_t* src, int ps, int c, int mode,
                    uint8_t* dst) {
  augment_patch(src, ps, c, mode, dst);
}

void loader_destroy(void* handle) { delete static_cast<Loader*>(handle); }

// ------------------------------------------------ paired SR loader
// The dataset_sr train protocol (kair_tpu/data/datasets.py DatasetSR,
// reference data/dataset_sr.py): random L crop of l_ps, the aligned H crop
// at (ry*sf, rx*sf) of l_ps*sf, the SAME 8-mode augmentation on both.
// Requires pre-generated LR files (dataroot_L); the on-the-fly bicubic
// fallback stays on the python path.

struct PairLoader {
  std::vector<Image> l, h;
  int n_channels = 3;
  int n_threads = 4;
};

void* pair_loader_create(const char** paths_l, const char** paths_h, int n,
                         int n_channels, int n_threads) {
  auto* P = new PairLoader;
  P->n_channels = n_channels;
  P->n_threads = n_threads;
  P->l.resize(n);
  P->h.resize(n);
  std::atomic<bool> ok(true);
  parallel_for(n_threads, 2 * n, [&](int i, int) {
    Image* dst = i < n ? &P->l[i] : &P->h[i - n];
    const char* path = i < n ? paths_l[i] : paths_h[i - n];
    if (!decode_image(path, n_channels, dst)) ok = false;
  });
  if (!ok) {
    delete P;
    return nullptr;
  }
  return P;
}

int pair_loader_num(void* handle) {
  return static_cast<int>(static_cast<PairLoader*>(handle)->l.size());
}

// out_L: float32 [batch, l_ps, l_ps, C];  out_H: [batch, l_ps*sf, .., C]
int pair_loader_sample_sr_batch(void* handle, int batch, int l_ps, int sf,
                                uint64_t seed, float* out_L, float* out_H) {
  auto* P = static_cast<PairLoader*>(handle);
  const int c = P->n_channels;
  const int h_ps = l_ps * sf;
  std::atomic<bool> ok(true);
  parallel_for(P->n_threads, batch, [&](int i, int) {
    Rng rng(seed + 0x5851F42D4C957F2DULL * (i + 1));
    uint32_t idx = rng.below(P->l.size());
    const Image& il = P->l[idx];
    const Image& ih = P->h[idx];
    if (il.h < l_ps || il.w < l_ps) {
      ok = false;
      return;
    }
    int ry = rng.below(il.h - l_ps + 1);
    int rx = rng.below(il.w - l_ps + 1);
    if (ih.h < (ry + l_ps) * sf || ih.w < (rx + l_ps) * sf) {
      ok = false;  // H smaller than sf x L (pairs must be size-consistent)
      return;
    }
    int mode = rng.below(8);

    auto crop_aug = [&](const Image& img, int y0, int x0, int ps,
                        float* dst) {
      std::vector<uint8_t> crop(static_cast<size_t>(ps) * ps * c);
      for (int y = 0; y < ps; ++y)
        std::memcpy(crop.data() + static_cast<size_t>(y) * ps * c,
                    img.data.data() +
                        ((static_cast<size_t>(y0) + y) * img.w + x0) * c,
                    static_cast<size_t>(ps) * c);
      std::vector<uint8_t> aug(crop.size());
      augment_patch(crop.data(), ps, c, mode, aug.data());
      const float inv255 = 1.0f / 255.0f;
      for (size_t k = 0; k < aug.size(); ++k) dst[k] = aug[k] * inv255;
    };
    crop_aug(il, ry, rx, l_ps,
             out_L + static_cast<size_t>(i) * l_ps * l_ps * c);
    crop_aug(ih, ry * sf, rx * sf, h_ps,
             out_H + static_cast<size_t>(i) * h_ps * h_ps * c);
  });
  return ok ? 0 : -1;
}

void pair_loader_destroy(void* handle) {
  delete static_cast<PairLoader*>(handle);
}

}  // extern "C"
