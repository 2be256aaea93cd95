// Native batched PNG decoder + grayscale converter for the rpe_tpu IO layer.
//
// TPU-native analogue of the reference's image ingestion, which delegates to
// OpenCV's C++ imread/cvtColor (reference: src/utils/image_loader.py:23-28 ->
// cv2 C++). A framework-owned decoder removes the per-image Python overhead
// and decodes a whole frame batch with a thread pool, feeding the device
// pipeline one contiguous (N, H, W) buffer.
//
// Scope: 8-bit PNGs, color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+
// alpha), 6 (RGBA); no interlacing (Adam7 rejected). Grayscale conversion
// uses PIL/BT.601 integer rounding ((19595 R + 38470 G + 7471 B + 32768) >>
// 16) so outputs are bit-identical to the PIL fallback path.
//
// Build: g++ -O2 -shared -fPIC loader.cpp -lz -o librpe_loader.so
// Exposed via ctypes (see __init__.py); no pybind11 dependency.

#include <zlib.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Reader {
  const uint8_t* p;
  size_t n;
  size_t off = 0;
  bool ok = true;

  uint32_t u32() {
    if (off + 4 > n) { ok = false; return 0; }
    uint32_t v = (uint32_t(p[off]) << 24) | (uint32_t(p[off + 1]) << 16) |
                 (uint32_t(p[off + 2]) << 8) | uint32_t(p[off + 3]);
    off += 4;
    return v;
  }
};

struct PngImage {
  uint32_t w = 0, h = 0;
  int channels = 0;  // after palette expansion: 1, 2, 3 or 4
  std::vector<uint8_t> pixels;  // h * w * channels
};

int paeth(int a, int b, int c) {
  int pp = a + b - c;
  int pa = pp > a ? pp - a : a - pp;
  int pb = pp > b ? pp - b : b - pp;
  int pc = pp > c ? pp - c : c - pp;
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Decode one PNG from memory. Returns 0 on success. When expected_w/h are
// nonzero, the IHDR dimensions are validated against them BEFORE any
// pixel-buffer allocation, so a corrupt file declaring huge dimensions
// cannot drive a multi-GB allocation (std::bad_alloc escaping a worker
// thread would std::terminate the process).
int decode_png(const uint8_t* buf, size_t len, PngImage* out,
               uint32_t expected_w = 0, uint32_t expected_h = 0) {
  static const uint8_t kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (len < 8 || memcmp(buf, kSig, 8) != 0) return 1;
  Reader r{buf, len, 8};

  uint32_t w = 0, h = 0;
  int bit_depth = 0, color_type = -1, interlace = 0;
  std::vector<uint8_t> idat;
  std::vector<uint8_t> palette;  // 3 * entries

  while (r.ok && r.off + 8 <= r.n) {
    uint32_t clen = r.u32();
    if (r.off + 4 > r.n) return 2;
    char ctype[5] = {0};
    memcpy(ctype, r.p + r.off, 4);
    r.off += 4;
    if (r.off + clen + 4 > r.n) return 2;
    const uint8_t* data = r.p + r.off;

    if (!strcmp(ctype, "IHDR")) {
      if (clen < 13) return 3;
      w = (uint32_t(data[0]) << 24) | (data[1] << 16) | (data[2] << 8) | data[3];
      h = (uint32_t(data[4]) << 24) | (data[5] << 16) | (data[6] << 8) | data[7];
      bit_depth = data[8];
      color_type = data[9];
      interlace = data[12];
      if (bit_depth != 8 || interlace != 0) return 4;  // out of scope
      if (expected_w && w != expected_w) return 10;
      if (expected_h && h != expected_h) return 10;
      // Absolute sanity bound even without expectations (probe path):
      // 2^26 pixels ≈ 67 MP caps the allocation at ~256 MB RGBA.
      if (uint64_t(w) * h > (1ull << 26)) return 10;
    } else if (!strcmp(ctype, "PLTE")) {
      palette.assign(data, data + clen);
    } else if (!strcmp(ctype, "IDAT")) {
      idat.insert(idat.end(), data, data + clen);
    } else if (!strcmp(ctype, "IEND")) {
      break;
    }
    r.off += clen + 4;  // skip data + CRC
  }
  if (w == 0 || h == 0 || idat.empty()) return 5;

  int src_ch;
  switch (color_type) {
    case 0: src_ch = 1; break;
    case 2: src_ch = 3; break;
    case 3: src_ch = 1; break;  // palette indices
    case 4: src_ch = 2; break;
    case 6: src_ch = 4; break;
    default: return 6;
  }

  const size_t stride = size_t(w) * src_ch;
  std::vector<uint8_t> raw((stride + 1) * h);
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK ||
      raw_len != raw.size()) {
    return 7;
  }

  // Unfilter scanlines in place into `img`.
  std::vector<uint8_t> img(stride * h);
  const int bpp = src_ch;
  for (uint32_t y = 0; y < h; ++y) {
    const uint8_t* line = raw.data() + y * (stride + 1);
    uint8_t filter = line[0];
    const uint8_t* src = line + 1;
    uint8_t* dst = img.data() + y * stride;
    const uint8_t* up = y ? img.data() + (y - 1) * stride : nullptr;
    switch (filter) {
      case 0:
        memcpy(dst, src, stride);
        break;
      case 1:
        for (size_t x = 0; x < stride; ++x)
          dst[x] = src[x] + (x >= size_t(bpp) ? dst[x - bpp] : 0);
        break;
      case 2:
        for (size_t x = 0; x < stride; ++x)
          dst[x] = src[x] + (up ? up[x] : 0);
        break;
      case 3:
        for (size_t x = 0; x < stride; ++x) {
          int a = x >= size_t(bpp) ? dst[x - bpp] : 0;
          int b = up ? up[x] : 0;
          dst[x] = src[x] + uint8_t((a + b) >> 1);
        }
        break;
      case 4:
        for (size_t x = 0; x < stride; ++x) {
          int a = x >= size_t(bpp) ? dst[x - bpp] : 0;
          int b = up ? up[x] : 0;
          int c = (up && x >= size_t(bpp)) ? up[x - bpp] : 0;
          dst[x] = src[x] + uint8_t(paeth(a, b, c));
        }
        break;
      default:
        return 8;
    }
  }

  // Palette expansion.
  if (color_type == 3) {
    if (palette.empty()) return 9;
    out->channels = 3;
    out->pixels.resize(size_t(w) * h * 3);
    for (size_t i = 0; i < size_t(w) * h; ++i) {
      int idx = img[i];
      if (size_t(idx) * 3 + 2 >= palette.size()) return 9;
      out->pixels[i * 3 + 0] = palette[idx * 3 + 0];
      out->pixels[i * 3 + 1] = palette[idx * 3 + 1];
      out->pixels[i * 3 + 2] = palette[idx * 3 + 2];
    }
  } else {
    out->channels = src_ch;
    out->pixels = std::move(img);
  }
  out->w = w;
  out->h = h;
  return 0;
}

uint8_t to_gray(const uint8_t* px, int ch) {
  switch (ch) {
    case 1:
    case 2:  // gray (+alpha): alpha ignored
      return px[0];
    default:  // RGB / RGBA — PIL/BT.601 integer rounding
      return uint8_t((19595u * px[0] + 38470u * px[1] + 7471u * px[2] +
                      32768u) >> 16);
  }
}

std::vector<uint8_t> read_file(const char* path) {
  std::vector<uint8_t> buf;
  FILE* f = fopen(path, "rb");
  if (!f) return buf;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (sz > 0) {
    buf.resize(size_t(sz));
    if (fread(buf.data(), 1, size_t(sz), f) != size_t(sz)) buf.clear();
  }
  fclose(f);
  return buf;
}

}  // namespace

extern "C" {

// Read the dimensions of one PNG. Returns 0 on success.
int rpe_png_dims(const char* path, int* w, int* h) {
  auto buf = read_file(path);
  PngImage img;
  // cheap header-only parse: decode fully is fine for one probe image, but
  // parse just IHDR here.
  if (buf.size() < 33) return 1;
  static const uint8_t kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (memcmp(buf.data(), kSig, 8) != 0) return 1;
  const uint8_t* d = buf.data() + 16;
  *w = (int(d[0]) << 24) | (d[1] << 16) | (d[2] << 8) | d[3];
  *h = (int(d[4]) << 24) | (d[5] << 16) | (d[6] << 8) | d[7];
  return 0;
}

// Decode a batch of same-size PNGs into `out` (n * h * w bytes, grayscale)
// or (n * h * w * 3, BGR) when to_gray == 0. Returns 0 on success, else the
// 1-based index of the first failing file.
int rpe_decode_batch(const char** paths, int n, int w, int h,
                     unsigned char* out, int to_gray_flag, int nthreads) {
  std::atomic<int> next(0);
  std::atomic<int> failed(0);
  const size_t px_per_img = size_t(w) * h;
  const int out_ch = to_gray_flag ? 1 : 3;

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n || failed.load()) return;
      auto buf = read_file(paths[i]);
      PngImage img;
      bool ok = false;
      try {
        ok = !buf.empty() &&
             decode_png(buf.data(), buf.size(), &img, uint32_t(w),
                        uint32_t(h)) == 0 &&
             int(img.w) == w && int(img.h) == h;
      } catch (...) {
        ok = false;  // bad_alloc etc. -> per-file failure, not terminate
      }
      if (!ok) {
        int expected = 0;
        failed.compare_exchange_strong(expected, i + 1);
        return;
      }
      unsigned char* dst = out + size_t(i) * px_per_img * out_ch;
      if (to_gray_flag) {
        for (size_t p = 0; p < px_per_img; ++p)
          dst[p] = to_gray(&img.pixels[p * img.channels], img.channels);
      } else {
        for (size_t p = 0; p < px_per_img; ++p) {
          const uint8_t* s = &img.pixels[p * img.channels];
          uint8_t rr = s[0], gg = img.channels >= 3 ? s[1] : s[0],
                  bb = img.channels >= 3 ? s[2] : s[0];
          dst[p * 3 + 0] = bb;  // BGR, reference channel order
          dst[p * 3 + 1] = gg;
          dst[p * 3 + 2] = rr;
        }
      }
    }
  };

  int nt = nthreads > 0 ? nthreads : int(std::thread::hardware_concurrency());
  if (nt < 1) nt = 1;
  if (nt > n) nt = n;
  std::vector<std::thread> pool;
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failed.load();
}

}  // extern "C"
