// dpn_native: C++ host-pipeline kernels for the data loader.
//
// The reference's host hot path (dataset/physics_dataset.py:323-499) does
// per-point raster gathers and xarray trilinear interpolation in Python
// worker processes.  The framework's device-sampling mode moves that work
// onto the TPU; for the host-sampling mode and the ETL tools, these C++
// kernels accelerate the remaining CPU work:
//
//   dpn_trilinear   - trilinear interpolation of a [V, H, W, T] cube at N
//                     scattered (lon, lat, t) points, OpenMP across points
//   dpn_gather      - integer-index gather img[y, x] for N points
//   dpn_normalize   - fused (x - mean) / std over a [C, M] block
//   dpn_pack_tokens - transpose+normalize a [H, W, C] raster into [C, H*W]
//                     token rows (the get_item_input inner loop)
//   dpn_lzw_decode  - TIFF LZW segment decode (the GDAL-replacement codec's
//                     one hot pure-Python path; DEFLATE already rides zlib's
//                     C implementation)
//
// Exposed with a plain C ABI for ctypes (deepphysinet_tpu/native).

#include <cmath>
#include <cstdint>
#include <algorithm>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// cube: [V, H, W, T] float32; lon/lat/t: [N]; out: [N, V]
void dpn_trilinear(const float* cube, int64_t V, int64_t H, int64_t W, int64_t T,
                   double lon0, double dlon, double lat0, double dlat,
                   double t0, double dt,
                   const double* lon, const double* lat, const double* t,
                   int64_t N, float* out) {
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int64_t n = 0; n < N; ++n) {
    double fy = (lat[n] - lat0) / dlat;
    double fx = (lon[n] - lon0) / dlon;
    double ft = (t[n] - t0) / dt;
    fy = std::min(std::max(fy, 0.0), double(H - 1));
    fx = std::min(std::max(fx, 0.0), double(W - 1));
    ft = std::min(std::max(ft, 0.0), double(T - 1));
    int64_t y0v = std::min(int64_t(fy), H - 2 >= 0 ? H - 2 : 0);
    int64_t x0v = std::min(int64_t(fx), W - 2 >= 0 ? W - 2 : 0);
    int64_t t0v = std::min(int64_t(ft), T - 2 >= 0 ? T - 2 : 0);
    int64_t y1v = std::min(y0v + 1, H - 1);
    int64_t x1v = std::min(x0v + 1, W - 1);
    int64_t t1v = std::min(t0v + 1, T - 1);
    double wy = fy - double(y0v), wx = fx - double(x0v), wt = ft - double(t0v);
    for (int64_t v = 0; v < V; ++v) {
      const float* c = cube + v * H * W * T;
      auto at = [&](int64_t y, int64_t x, int64_t tt) {
        return double(c[(y * W + x) * T + tt]);
      };
      double c00 = at(y0v, x0v, t0v) * (1 - wt) + at(y0v, x0v, t1v) * wt;
      double c01 = at(y0v, x1v, t0v) * (1 - wt) + at(y0v, x1v, t1v) * wt;
      double c10 = at(y1v, x0v, t0v) * (1 - wt) + at(y1v, x0v, t1v) * wt;
      double c11 = at(y1v, x1v, t0v) * (1 - wt) + at(y1v, x1v, t1v) * wt;
      double c0 = c00 * (1 - wx) + c01 * wx;
      double c1 = c10 * (1 - wx) + c11 * wx;
      out[n * V + v] = float(c0 * (1 - wy) + c1 * wy);
    }
  }
}

// img: [H, W] float32; xs/ys: [N] int64; out: [N]
void dpn_gather(const float* img, int64_t H, int64_t W,
                const int64_t* xs, const int64_t* ys, int64_t N, float* out) {
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int64_t n = 0; n < N; ++n) {
    int64_t y = std::min(std::max(ys[n], int64_t(0)), H - 1);
    int64_t x = std::min(std::max(xs[n], int64_t(0)), W - 1);
    out[n] = img[y * W + x];
  }
}

// data: [C, M] in-place (x - mean[c]) / std[c]
void dpn_normalize(float* data, int64_t C, int64_t M,
                   const float* mean, const float* stdv) {
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int64_t c = 0; c < C; ++c) {
    const float mu = mean[c];
    const float inv = 1.0f / stdv[c];
    float* row = data + c * M;
    for (int64_t m = 0; m < M; ++m) row[m] = (row[m] - mu) * inv;
  }
}

// raster: [H, W, C] float32 -> out rows [C, H*W], normalized per channel
void dpn_pack_tokens(const float* raster, int64_t H, int64_t W, int64_t C,
                     const float* mean, const float* stdv, float* out) {
  const int64_t M = H * W;
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int64_t c = 0; c < C; ++c) {
    const float mu = mean[c];
    const float inv = 1.0f / stdv[c];
    float* row = out + c * M;
    for (int64_t p = 0; p < M; ++p) row[p] = (raster[p * C + c] - mu) * inv;
  }
}

int dpn_num_threads(void) {
#if defined(_OPENMP)
  return omp_get_max_threads();
#else
  return 1;
#endif
}

// TIFF-flavoured LZW decode (MSB-first bit order, early code-size change),
// matching data/geotiff.py::_lzw_decode (which stays as the pure-Python
// fallback).  Returns bytes written, or -1 if `out` is too small / stream is
// corrupt.  Table entries are (prefix link, suffix byte) pairs; strings are
// emitted by walking the chain backwards.
int64_t dpn_lzw_decode(const uint8_t* data, int64_t n_in,
                       uint8_t* out, int64_t n_out) {
  const int CLEAR = 256, EOI = 257;
  static thread_local int32_t prefix[4096];
  static thread_local uint8_t suffix[4096];
  static thread_local uint8_t first[4096];
  static thread_local uint8_t stack[4096];

  int next_code = 258, code_size = 9;
  int64_t bitpos = 0, nbits = n_in * 8, written = 0;
  int prev = -1;

  auto read_code = [&]() -> int {
    if (bitpos + code_size > nbits) return EOI;
    int64_t byte_pos = bitpos >> 3;
    uint32_t chunk = 0;
    for (int i = 0; i < 4; ++i) {
      chunk <<= 8;
      if (byte_pos + i < n_in) chunk |= data[byte_pos + i];
    }
    int code = (chunk >> (32 - (bitpos & 7) - code_size)) &
               ((1u << code_size) - 1);
    bitpos += code_size;
    return code;
  };

  for (int i = 0; i < 256; ++i) { prefix[i] = -1; suffix[i] = (uint8_t)i; first[i] = (uint8_t)i; }

  auto emit = [&](int code) -> int {  // returns first byte of the string
    int sp = 0;
    int c = code;
    while (c >= 0) {
      if (sp >= 4096) return -1;
      stack[sp++] = suffix[c];
      c = prefix[c];
    }
    if (written + sp > n_out) return -1;
    for (int i = sp - 1; i >= 0; --i) out[written++] = stack[i];
    return stack[sp - 1];
  };

  while (true) {
    int code = read_code();
    if (code == EOI) break;
    if (code == CLEAR) {
      next_code = 258; code_size = 9; prev = -1;
      continue;
    }
    if (prev < 0) {
      if (code >= 256) return -1;
      if (emit(code) < 0) return -1;
      prev = code;
      continue;
    }
    int fb;
    if (code < next_code) {
      fb = emit(code);
      if (fb < 0) return -1;
      if (next_code < 4096) {
        prefix[next_code] = prev; suffix[next_code] = (uint8_t)fb;
        first[next_code] = first[prev];
        ++next_code;
      }
    } else if (code == next_code) {
      // KwKwK case: new string = string(prev) + first(prev)
      if (next_code >= 4096) return -1;
      prefix[next_code] = prev; suffix[next_code] = first[prev];
      first[next_code] = first[prev];
      ++next_code;
      if (emit(code) < 0) return -1;
    } else {
      return -1;  // corrupt stream
    }
    if (next_code == (1 << code_size) - 1 && code_size < 12) ++code_size;
    prev = code;
  }
  return written;
}

}  // extern "C"
