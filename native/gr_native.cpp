// Native host runtime for the TPU GR renderer: image encoding and jitter.
//
// The reference's entire runtime is a native (Rust) binary; here the TPU
// compute path is XLA/Pallas and this library covers the host-side IO hot
// spots — PNG/RGBE encoding of multi-megapixel frames and the stratified
// splitmix64 jitter batches of the adaptive supersampler — exposed through
// a plain C ABI for ctypes (no Python headers needed).
//
// Behavior parity targets:
//   * splitmix64 / hash_pixel_samples: bit-exact vs raytracer.rs:131-159.
//   * RGBE: the Radiance encoding used for .hdr output (raytracer.rs:468).
//   * PNG: RGB8, one IDAT, zlib-compressed, filter 0.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <vector>
#include <zlib.h>

extern "C" {

// ---------------------------------------------------------------------------
// splitmix64 jitter (raytracer.rs:131-159)
// ---------------------------------------------------------------------------

static inline uint64_t mix64(uint64_t z) {
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
  return z ^ (z >> 31);
}

static inline double hash_pixel_samples(uint64_t row, uint64_t col, uint64_t k) {
  uint64_t z = mix64(row + mix64(col + mix64(k)));
  return (double)(z >> 11) * (1.0 / 9007199254740992.0); // 2^53
}

// rows/cols: [p] pixel coordinates. dx/dy out: [p * n * n], stratified
// offsets in scan order (stratum_row major), matching
// stratified_sample_offset.
void stratified_offsets(const int64_t* rows, const int64_t* cols, int64_t p,
                        int64_t n, double* dx, double* dy) {
  for (int64_t i = 0; i < p; ++i) {
    const uint64_t r = (uint64_t)rows[i];
    const uint64_t c = (uint64_t)cols[i];
    for (int64_t sr = 0; sr < n; ++sr) {
      for (int64_t sc = 0; sc < n; ++sc) {
        const int64_t idx = sr * n + sc;
        dx[i * n * n + idx] = ((double)sc + hash_pixel_samples(r, c, 2 * idx)) / (double)n;
        dy[i * n * n + idx] = ((double)sr + hash_pixel_samples(r, c, 2 * idx + 1)) / (double)n;
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Radiance RGBE (.hdr)
// ---------------------------------------------------------------------------

// rgb: [h*w*3] float32; out: [h*w*4] bytes.
void rgbe_encode(const float* rgb, int64_t count, uint8_t* out) {
  for (int64_t i = 0; i < count; ++i) {
    const float r = rgb[3 * i], g = rgb[3 * i + 1], b = rgb[3 * i + 2];
    float v = r > g ? r : g;
    if (b > v) v = b;
    if (!(v >= 1e-32f)) {
      out[4 * i] = out[4 * i + 1] = out[4 * i + 2] = out[4 * i + 3] = 0;
      continue;
    }
    int e;
    const float m = std::frexp(v, &e);
    const float scale = m * 256.0f / v;
    auto enc = [&](float x) -> uint8_t {
      float s = x * scale;
      if (s < 0.0f) s = 0.0f;
      if (s > 255.0f) s = 255.0f;
      return (uint8_t)s;
    };
    out[4 * i] = enc(r);
    out[4 * i + 1] = enc(g);
    out[4 * i + 2] = enc(b);
    out[4 * i + 3] = (uint8_t)(e + 128);
  }
}

// ---------------------------------------------------------------------------
// PNG (RGB8, zlib, filter 0)
// ---------------------------------------------------------------------------

static void put_be32(std::vector<uint8_t>& v, uint32_t x) {
  v.push_back((x >> 24) & 0xff);
  v.push_back((x >> 16) & 0xff);
  v.push_back((x >> 8) & 0xff);
  v.push_back(x & 0xff);
}

static void put_chunk(std::vector<uint8_t>& v, const char type[4],
                      const uint8_t* data, uint32_t len) {
  put_be32(v, len);
  const size_t start = v.size();
  v.insert(v.end(), type, type + 4);
  if (len) v.insert(v.end(), data, data + len);
  const uint32_t crc =
      crc32(0, v.data() + start, (uInt)(v.size() - start));
  put_be32(v, crc);
}

// rgb: [h*w*3] uint8. Returns the encoded size, or -1 on failure; call with
// out == nullptr to query an upper bound first.
int64_t png_encode(const uint8_t* rgb, int64_t w, int64_t h, uint8_t* out,
                   int64_t out_cap) {
  // Raw stream with filter byte 0 per row.
  std::vector<uint8_t> raw((size_t)h * (w * 3 + 1));
  for (int64_t y = 0; y < h; ++y) {
    raw[(size_t)y * (w * 3 + 1)] = 0;
    std::memcpy(&raw[(size_t)y * (w * 3 + 1) + 1], rgb + (size_t)y * w * 3,
                (size_t)w * 3);
  }
  uLongf comp_cap = compressBound((uLong)raw.size());
  std::vector<uint8_t> comp(comp_cap);
  if (compress2(comp.data(), &comp_cap, raw.data(), (uLong)raw.size(), 6) != Z_OK)
    return -1;

  std::vector<uint8_t> png;
  png.reserve(comp_cap + 1024);
  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  png.insert(png.end(), sig, sig + 8);
  uint8_t ihdr[13];
  ihdr[0] = (w >> 24) & 0xff; ihdr[1] = (w >> 16) & 0xff;
  ihdr[2] = (w >> 8) & 0xff;  ihdr[3] = w & 0xff;
  ihdr[4] = (h >> 24) & 0xff; ihdr[5] = (h >> 16) & 0xff;
  ihdr[6] = (h >> 8) & 0xff;  ihdr[7] = h & 0xff;
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 2;   // color type RGB
  ihdr[10] = 0; ihdr[11] = 0; ihdr[12] = 0;
  put_chunk(png, "IHDR", ihdr, 13);
  put_chunk(png, "IDAT", comp.data(), (uint32_t)comp_cap);
  put_chunk(png, "IEND", nullptr, 0);

  if (out == nullptr) return (int64_t)png.size();
  if ((int64_t)png.size() > out_cap) return -1;
  std::memcpy(out, png.data(), png.size());
  return (int64_t)png.size();
}

// ---------------------------------------------------------------------------
// PNG decode (texture data-loader)
// ---------------------------------------------------------------------------
//
// Non-interlaced, bit depth 8, color types 0 (gray), 2 (RGB), 3 (palette),
// 4 (gray+alpha), 6 (RGBA) — covers every texture the reference ships
// (resources/*.png: RGB/RGBA 8-bit, interlace 0). Output is always RGBA8.
// Returns -1 for anything else; the Python caller falls back to PIL.

static uint32_t get_be32(const uint8_t* p) {
  return ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16) |
         ((uint32_t)p[2] << 8) | (uint32_t)p[3];
}

static inline uint8_t paeth(int a, int b, int c) {
  const int p = a + b - c;
  const int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return (uint8_t)a;
  if (pb <= pc) return (uint8_t)b;
  return (uint8_t)c;
}

struct PngInfo {
  int64_t w = 0, h = 0;
  int color_type = -1;
  int channels = 0;
  const uint8_t* plte = nullptr;
  uint32_t plte_len = 0;     // entries
  const uint8_t* trns = nullptr;
  uint32_t trns_len = 0;
  std::vector<uint8_t> idat;  // concatenated zlib stream
};

static bool png_parse(const uint8_t* data, int64_t n, PngInfo& info) {
  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (n < 8 + 25 || std::memcmp(data, sig, 8) != 0) return false;
  int64_t pos = 8;
  bool seen_ihdr = false;
  while (pos + 12 <= n) {
    const uint32_t len = get_be32(data + pos);
    const uint8_t* type = data + pos + 4;
    const uint8_t* body = data + pos + 8;
    if (pos + 12 + (int64_t)len > n) return false;
    if (!std::memcmp(type, "IHDR", 4)) {
      if (len != 13) return false;
      info.w = get_be32(body);
      info.h = get_be32(body + 4);
      const int bit_depth = body[8];
      info.color_type = body[9];
      const int interlace = body[12];
      if (bit_depth != 8 || interlace != 0) return false;
      switch (info.color_type) {
        case 0: info.channels = 1; break;
        case 2: info.channels = 3; break;
        case 3: info.channels = 1; break;
        case 4: info.channels = 2; break;
        case 6: info.channels = 4; break;
        default: return false;
      }
      seen_ihdr = true;
    } else if (!std::memcmp(type, "PLTE", 4)) {
      info.plte = body;
      info.plte_len = len / 3;
    } else if (!std::memcmp(type, "tRNS", 4)) {
      info.trns = body;
      info.trns_len = len;
    } else if (!std::memcmp(type, "IDAT", 4)) {
      info.idat.insert(info.idat.end(), body, body + len);
    } else if (!std::memcmp(type, "IEND", 4)) {
      break;
    }
    pos += 12 + (int64_t)len;
  }
  if (!seen_ihdr || info.idat.empty() || info.w <= 0 || info.h <= 0) return false;
  if (info.color_type == 3 && info.plte == nullptr) return false;
  return true;
}

// Query dimensions: fills w/h, returns 0 on a decodable image, -1 otherwise.
int64_t png_decode_info(const uint8_t* data, int64_t n, int64_t* w, int64_t* h) {
  PngInfo info;
  if (!png_parse(data, n, info)) return -1;
  *w = info.w;
  *h = info.h;
  return 0;
}

// Decode into out_rgba [h*w*4]. Returns 0 on success, -1 on failure.
int64_t png_decode(const uint8_t* data, int64_t n, uint8_t* out_rgba) {
  PngInfo info;
  if (!png_parse(data, n, info)) return -1;
  const int64_t w = info.w, h = info.h;
  const int ch = info.channels;
  const int64_t stride = w * ch;
  std::vector<uint8_t> raw((size_t)h * (stride + 1));
  uLongf raw_len = (uLongf)raw.size();
  if (uncompress(raw.data(), &raw_len, info.idat.data(), (uLong)info.idat.size()) != Z_OK ||
      raw_len != raw.size())
    return -1;

  // Unfilter in place (scanline layout: filter byte + stride bytes).
  std::vector<uint8_t> prev((size_t)stride, 0);
  for (int64_t y = 0; y < h; ++y) {
    uint8_t* line = &raw[(size_t)y * (stride + 1)];
    const uint8_t filter = line[0];
    uint8_t* cur = line + 1;
    switch (filter) {
      case 0: break;
      case 1:
        for (int64_t i = ch; i < stride; ++i) cur[i] = (uint8_t)(cur[i] + cur[i - ch]);
        break;
      case 2:
        for (int64_t i = 0; i < stride; ++i) cur[i] = (uint8_t)(cur[i] + prev[i]);
        break;
      case 3:
        for (int64_t i = 0; i < stride; ++i) {
          const int left = i >= ch ? cur[i - ch] : 0;
          cur[i] = (uint8_t)(cur[i] + ((left + prev[i]) >> 1));
        }
        break;
      case 4:
        for (int64_t i = 0; i < stride; ++i) {
          const int left = i >= ch ? cur[i - ch] : 0;
          const int up_left = i >= ch ? prev[i - ch] : 0;
          cur[i] = (uint8_t)(cur[i] + paeth(left, prev[i], up_left));
        }
        break;
      default:
        return -1;
    }
    std::memcpy(prev.data(), cur, (size_t)stride);

    // Expand this scanline to RGBA8.
    uint8_t* out = out_rgba + (size_t)y * w * 4;
    switch (info.color_type) {
      case 0:
        for (int64_t x = 0; x < w; ++x) {
          out[4 * x] = out[4 * x + 1] = out[4 * x + 2] = cur[x];
          out[4 * x + 3] = 255;
        }
        break;
      case 2:
        for (int64_t x = 0; x < w; ++x) {
          out[4 * x] = cur[3 * x];
          out[4 * x + 1] = cur[3 * x + 1];
          out[4 * x + 2] = cur[3 * x + 2];
          out[4 * x + 3] = 255;
        }
        break;
      case 3:
        for (int64_t x = 0; x < w; ++x) {
          const uint32_t idx = cur[x];
          if (idx >= info.plte_len) return -1;
          out[4 * x] = info.plte[3 * idx];
          out[4 * x + 1] = info.plte[3 * idx + 1];
          out[4 * x + 2] = info.plte[3 * idx + 2];
          out[4 * x + 3] = (idx < info.trns_len) ? info.trns[idx] : 255;
        }
        break;
      case 4:
        for (int64_t x = 0; x < w; ++x) {
          out[4 * x] = out[4 * x + 1] = out[4 * x + 2] = cur[2 * x];
          out[4 * x + 3] = cur[2 * x + 1];
        }
        break;
      case 6:
        std::memcpy(out, cur, (size_t)w * 4);
        break;
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Trajectory CSV (ray.rs:35-54 schema)
// ---------------------------------------------------------------------------

// steps: [n] indices; affine: [n]; cart: [n*4]. Returns bytes written or -1.
int64_t trajectory_csv(const int64_t* steps, const double* affine,
                       const double* cart, int64_t n, char* out,
                       int64_t out_cap) {
  int64_t pos = 0;
  const char* header = "i,t,tau,x,y,z\n";
  const int64_t hlen = (int64_t)std::strlen(header);
  if (out == nullptr) return (hlen + n * 160);  // generous bound
  if (out_cap < hlen) return -1;
  std::memcpy(out, header, hlen);
  pos = hlen;
  for (int64_t i = 0; i < n; ++i) {
    int written = std::snprintf(
        out + pos, (size_t)(out_cap - pos), "%lld,%.17g,%.17g,%.17g,%.17g,%.17g\n",
        (long long)steps[i], affine[i], cart[4 * i], cart[4 * i + 1],
        cart[4 * i + 2], cart[4 * i + 3]);
    if (written < 0 || pos + written > out_cap) return -1;
    pos += written;
  }
  return pos;
}

}  // extern "C"
