// modeio — native data-loading runtime for mode_tpu.
//
// The reference feeds its models through torch DataLoader worker processes
// doing PIL/cv2 decodes (/root/reference/dataloader/deep360_loader.py). This
// library is the TPU-framework equivalent of that native layer: zero-copy
// batched PNG / NPZ decoding on a std::thread pool with the ImageNet
// normalization fused into the decode, so Python hands the loader a list of
// paths and receives a ready (N, H, W, C) float32 batch buffer.
//
// Self-contained: PNG is parsed chunk-by-chunk and inflated with zlib
// (filters 0-4 per the PNG spec); NPZ is parsed as a ZIP container (stored
// or deflate entries) with a minimal NPY header reader. No image library
// dependencies.
//
// Build: g++ -O3 -shared -fPIC -o libmodeio.so modeio.cpp -lz -lpthread

#include <zlib.h>

#include <algorithm>
#include <atomic>
#include <functional>
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <fstream>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Buf {
  std::vector<uint8_t> data;
};

bool read_file(const char* path, Buf* out) {
  std::ifstream f(path, std::ios::binary | std::ios::ate);
  if (!f) return false;
  std::streamsize size = f.tellg();
  f.seekg(0);
  out->data.resize(static_cast<size_t>(size));
  return static_cast<bool>(
      f.read(reinterpret_cast<char*>(out->data.data()), size));
}

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}
uint32_t le32(const uint8_t* p) {
  return uint32_t(p[0]) | (uint32_t(p[1]) << 8) | (uint32_t(p[2]) << 16) |
         (uint32_t(p[3]) << 24);
}
uint16_t le16(const uint8_t* p) {
  return uint16_t(p[0]) | (uint16_t(p[1]) << 8);
}

bool zlib_decomp(const uint8_t* src, size_t src_len, std::vector<uint8_t>* dst,
                 bool raw) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, raw ? -15 : 15) != Z_OK) return false;
  zs.next_in = const_cast<uint8_t*>(src);
  zs.avail_in = static_cast<uInt>(src_len);
  zs.next_out = dst->data();
  zs.avail_out = static_cast<uInt>(dst->size());
  int ret = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  return ret == Z_STREAM_END || (ret == Z_OK && zs.avail_out == 0);
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Decode an 8-bit PNG (gray / RGB / RGBA) into tightly packed rows.
// Returns channels, or -1 on failure.
int decode_png(const Buf& file, std::vector<uint8_t>* out, uint32_t* width,
               uint32_t* height) {
  const uint8_t* p = file.data.data();
  size_t n = file.data.size();
  static const uint8_t kMagic[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1A,
                                    '\n'};
  if (n < 8 || std::memcmp(p, kMagic, 8) != 0) return -1;
  size_t off = 8;
  uint32_t w = 0, h = 0;
  int bit_depth = 0, color_type = -1, channels = 0;
  std::vector<uint8_t> idat;
  while (off + 8 <= n) {
    uint32_t len = be32(p + off);
    const uint8_t* type = p + off + 4;
    const uint8_t* data = p + off + 8;
    if (off + 12 + len > n) return -1;
    if (!std::memcmp(type, "IHDR", 4)) {
      w = be32(data);
      h = be32(data + 4);
      bit_depth = data[8];
      color_type = data[9];
      if (data[10] != 0 || data[11] != 0 || data[12] != 0) return -1;
      if (bit_depth != 8) return -1;  // 8-bit only
      channels = color_type == 0 ? 1 : color_type == 2 ? 3
                 : color_type == 4 ? 2 : color_type == 6 ? 4 : -1;
      if (channels < 0) return -1;
    } else if (!std::memcmp(type, "IDAT", 4)) {
      idat.insert(idat.end(), data, data + len);
    } else if (!std::memcmp(type, "IEND", 4)) {
      break;
    }
    off += 12 + len;
  }
  if (!w || !h || channels <= 0 || idat.empty()) return -1;

  size_t stride = size_t(w) * channels;
  std::vector<uint8_t> raw((stride + 1) * h);
  if (!zlib_decomp(idat.data(), idat.size(), &raw, /*raw=*/false)) return -1;

  out->resize(stride * h);
  const int bpp = channels;
  for (uint32_t y = 0; y < h; ++y) {
    uint8_t filter = raw[y * (stride + 1)];
    const uint8_t* src = raw.data() + y * (stride + 1) + 1;
    uint8_t* cur = out->data() + y * stride;
    const uint8_t* up = y ? out->data() + (y - 1) * stride : nullptr;
    for (size_t x = 0; x < stride; ++x) {
      int a = x >= size_t(bpp) ? cur[x - bpp] : 0;
      int b = up ? up[x] : 0;
      int c = (up && x >= size_t(bpp)) ? up[x - bpp] : 0;
      int v = src[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: return -1;
      }
      cur[x] = uint8_t(v);
    }
  }
  *width = w;
  *height = h;
  return channels;
}

// Minimal NPY payload parser: expects little-endian f4/f8, C order.
// Returns number of elements written as f32, or -1.
int64_t parse_npy(const uint8_t* p, size_t n, float* out, int64_t capacity) {
  if (n < 10 || std::memcmp(p, "\x93NUMPY", 6) != 0) return -1;
  int major = p[6];
  size_t hlen, hoff;
  if (major == 1) {
    hlen = le16(p + 8);
    hoff = 10;
  } else {
    hlen = le32(p + 8);
    hoff = 12;
  }
  if (hoff + hlen > n) return -1;
  std::string header(reinterpret_cast<const char*>(p + hoff), hlen);
  bool f8 = header.find("'<f8'") != std::string::npos ||
            header.find("\"<f8\"") != std::string::npos;
  bool f4 = header.find("'<f4'") != std::string::npos ||
            header.find("\"<f4\"") != std::string::npos;
  if (!f4 && !f8) return -1;
  if (header.find("'fortran_order': True") != std::string::npos) return -1;
  const uint8_t* body = p + hoff + hlen;
  size_t body_len = n - hoff - hlen;
  size_t elt = f8 ? 8 : 4;
  int64_t count = static_cast<int64_t>(body_len / elt);
  if (count > capacity) return -1;
  if (f4) {
    std::memcpy(out, body, count * 4);
  } else {
    const double* d = reinterpret_cast<const double*>(body);
    for (int64_t i = 0; i < count; ++i) out[i] = static_cast<float>(d[i]);
  }
  return count;
}

// First entry of a ZIP (npz) container, inflated if needed.
bool read_zip_first_entry(const Buf& file, std::vector<uint8_t>* out) {
  const uint8_t* p = file.data.data();
  size_t n = file.data.size();
  if (n < 30 || le32(p) != 0x04034b50) return false;
  uint16_t method = le16(p + 8);
  uint32_t comp_size = le32(p + 18);
  uint32_t uncomp_size = le32(p + 22);
  uint16_t name_len = le16(p + 26);
  uint16_t extra_len = le16(p + 28);
  size_t data_off = 30 + name_len + extra_len;
  if (comp_size == 0 || comp_size == 0xFFFFFFFF) {
    // sizes in data descriptor (streamed write): fall back to scanning the
    // central directory
    // locate end-of-central-directory
    for (size_t i = n - 22; i > 0; --i) {
      if (le32(p + i) == 0x06054b50) {
        size_t cd_off = le32(p + i + 16);
        if (cd_off + 46 > n || le32(p + cd_off) != 0x02014b50) return false;
        method = le16(p + cd_off + 10);
        comp_size = le32(p + cd_off + 20);
        uncomp_size = le32(p + cd_off + 24);
        break;
      }
    }
    if (comp_size == 0) return false;
  }
  if (data_off + comp_size > n) return false;
  if (method == 0) {
    out->assign(p + data_off, p + data_off + comp_size);
    return true;
  }
  if (method == 8) {
    out->resize(uncomp_size);
    return zlib_decomp(p + data_off, comp_size, out, /*raw=*/true);
  }
  return false;
}

void parallel_for(int64_t count, int threads,
                  const std::function<void(int64_t)>& fn) {
  if (threads <= 1 || count <= 1) {
    for (int64_t i = 0; i < count; ++i) fn(i);
    return;
  }
  std::atomic<int64_t> next(0);
  std::vector<std::thread> pool;
  int n_threads = std::min<int64_t>(threads, count);
  for (int t = 0; t < n_threads; ++t) {
    pool.emplace_back([&]() {
      while (true) {
        int64_t i = next.fetch_add(1);
        if (i >= count) return;
        fn(i);
      }
    });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// Decode one PNG into uint8 HWC. Returns channels or -1.
int modeio_decode_png(const char* path, uint8_t* out, int64_t capacity,
                      int* width, int* height) {
  Buf file;
  if (!read_file(path, &file)) return -1;
  std::vector<uint8_t> pixels;
  uint32_t w, h;
  int ch = decode_png(file, &pixels, &w, &h);
  if (ch < 0 || int64_t(pixels.size()) > capacity) return -1;
  std::memcpy(out, pixels.data(), pixels.size());
  *width = int(w);
  *height = int(h);
  return ch;
}

// Decode a batch of RGB PNGs straight into a normalized float32
// (N, H, W, 3) buffer: out = (u8/255 - mean) / std. All images must be
// (height, width). Returns 0 on success, else the 1-based index of the
// first failed path.
int64_t modeio_decode_rgb_batch_normalized(const char** paths, int64_t n,
                                           int height, int width,
                                           const float* mean,
                                           const float* stdev, float* out,
                                           int threads) {
  std::atomic<int64_t> failed(0);
  const int64_t img_elems = int64_t(height) * width * 3;
  parallel_for(n, threads, [&](int64_t i) {
    Buf file;
    std::vector<uint8_t> pixels;
    uint32_t w, h;
    int ch = -1;
    if (read_file(paths[i], &file)) ch = decode_png(file, &pixels, &w, &h);
    if (ch < 0 || int(h) != height || int(w) != width) {
      int64_t expect = 0;
      failed.compare_exchange_strong(expect, i + 1);
      return;
    }
    float* dst = out + i * img_elems;
    const float inv255 = 1.0f / 255.0f;
    float sc[3] = {inv255 / stdev[0], inv255 / stdev[1], inv255 / stdev[2]};
    float bias[3] = {mean[0] / stdev[0], mean[1] / stdev[1],
                     mean[2] / stdev[2]};
    const int64_t px = int64_t(height) * width;
    if (ch == 3) {
      for (int64_t k = 0; k < px; ++k)
        for (int c = 0; c < 3; ++c)
          dst[k * 3 + c] = pixels[k * 3 + c] * sc[c] - bias[c];
    } else if (ch == 1) {
      for (int64_t k = 0; k < px; ++k)
        for (int c = 0; c < 3; ++c)
          dst[k * 3 + c] = pixels[k] * sc[c] - bias[c];
    } else if (ch == 4) {
      for (int64_t k = 0; k < px; ++k)
        for (int c = 0; c < 3; ++c)
          dst[k * 3 + c] = pixels[k * 4 + c] * sc[c] - bias[c];
    } else {
      int64_t expect = 0;
      failed.compare_exchange_strong(expect, i + 1);
    }
  });
  return failed.load();
}

// Decode a batch of RGB PNGs into a raw uint8 (N, H, W, 3) buffer (no
// normalization — for host->device transfer at 1/4 the float32 bytes, with
// the ImageNet normalize fused into the device-side train step). Returns 0
// on success, else the 1-based index of the first failed path.
int64_t modeio_decode_rgb_batch_u8(const char** paths, int64_t n, int height,
                                   int width, uint8_t* out, int threads) {
  std::atomic<int64_t> failed(0);
  const int64_t img_elems = int64_t(height) * width * 3;
  parallel_for(n, threads, [&](int64_t i) {
    Buf file;
    std::vector<uint8_t> pixels;
    uint32_t w, h;
    int ch = -1;
    if (read_file(paths[i], &file)) ch = decode_png(file, &pixels, &w, &h);
    if (ch < 0 || int(h) != height || int(w) != width) {
      int64_t expect = 0;
      failed.compare_exchange_strong(expect, i + 1);
      return;
    }
    uint8_t* dst = out + i * img_elems;
    const int64_t px = int64_t(height) * width;
    if (ch == 3) {
      std::memcpy(dst, pixels.data(), px * 3);
    } else if (ch == 1) {
      for (int64_t k = 0; k < px; ++k)
        for (int c = 0; c < 3; ++c) dst[k * 3 + c] = pixels[k];
    } else if (ch == 4) {
      for (int64_t k = 0; k < px; ++k)
        for (int c = 0; c < 3; ++c) dst[k * 3 + c] = pixels[k * 4 + c];
    } else {
      int64_t expect = 0;
      failed.compare_exchange_strong(expect, i + 1);
    }
  });
  return failed.load();
}

// Read the first array of an .npz (or a raw .npy) as float32.
// Returns element count or -1.
int64_t modeio_read_npz(const char* path, float* out, int64_t capacity) {
  Buf file;
  if (!read_file(path, &file)) return -1;
  if (file.data.size() > 6 &&
      std::memcmp(file.data.data(), "\x93NUMPY", 6) == 0) {
    return parse_npy(file.data.data(), file.data.size(), out, capacity);
  }
  std::vector<uint8_t> npy;
  if (!read_zip_first_entry(file, &npy)) return -1;
  return parse_npy(npy.data(), npy.size(), out, capacity);
}

// Batched npz -> float32 (each array must have exactly `elems` elements).
int64_t modeio_read_npz_batch(const char** paths, int64_t n, int64_t elems,
                              float* out, int threads) {
  std::atomic<int64_t> failed(0);
  parallel_for(n, threads, [&](int64_t i) {
    if (modeio_read_npz(paths[i], out + i * elems, elems) != elems) {
      int64_t expect = 0;
      failed.compare_exchange_strong(expect, i + 1);
    }
  });
  return failed.load();
}

}  // extern "C"
