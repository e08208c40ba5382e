// Native data-pipeline kernels for the PIE-Bench sweep host path.
//
// The reference decodes RLE masks with a Python double loop
// (/root/reference/run_editing_p2p.py:11-27) and does image prep through
// PIL; at sweep scale (700 images x many methods) the host becomes the
// bottleneck once the TPU pipeline is fast. These kernels keep the host fed:
//   - rle_decode: run-length mask decode
//   - resize_bilinear_u8 / resize_nearest_u8: HWC uint8 resize
//   - center_crop_square_u8: crop-to-square (load_512 semantics)
//   - hstack_u8: 4-panel strip assembly
// Exposed via ctypes (see pnpinversion_tpu/data/_native.py).
#include <algorithm>
#include <cstdint>
#include <cstring>

extern "C" {

// enc: pairs [start, len] * n_pairs; out: length doubles (0/1)
void rle_decode(const int64_t* enc, int64_t n_pairs, double* out, int64_t length) {
  std::memset(out, 0, sizeof(double) * length);
  for (int64_t i = 0; i < n_pairs; ++i) {
    int64_t start = enc[2 * i];
    int64_t run = enc[2 * i + 1];
    if (start < 0 || start >= length) continue;
    int64_t end = std::min(start + run, length);
    std::fill(out + start, out + end, 1.0);
  }
}

void resize_nearest_u8(const uint8_t* src, int64_t sh, int64_t sw, int64_t c,
                       uint8_t* dst, int64_t dh, int64_t dw) {
  for (int64_t y = 0; y < dh; ++y) {
    int64_t sy = std::min<int64_t>(sh - 1, y * sh / dh);
    for (int64_t x = 0; x < dw; ++x) {
      int64_t sx = std::min<int64_t>(sw - 1, x * sw / dw);
      std::memcpy(dst + (y * dw + x) * c, src + (sy * sw + sx) * c, c);
    }
  }
}

void resize_bilinear_u8(const uint8_t* src, int64_t sh, int64_t sw, int64_t c,
                        uint8_t* dst, int64_t dh, int64_t dw) {
  const double ry = (double)sh / dh;
  const double rx = (double)sw / dw;
  for (int64_t y = 0; y < dh; ++y) {
    double fy = (y + 0.5) * ry - 0.5;
    int64_t y0 = std::max<int64_t>(0, (int64_t)fy);
    int64_t y1 = std::min<int64_t>(sh - 1, y0 + 1);
    double wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int64_t x = 0; x < dw; ++x) {
      double fx = (x + 0.5) * rx - 0.5;
      int64_t x0 = std::max<int64_t>(0, (int64_t)fx);
      int64_t x1 = std::min<int64_t>(sw - 1, x0 + 1);
      double wx = fx - x0;
      if (wx < 0) wx = 0;
      for (int64_t k = 0; k < c; ++k) {
        double v00 = src[(y0 * sw + x0) * c + k];
        double v01 = src[(y0 * sw + x1) * c + k];
        double v10 = src[(y1 * sw + x0) * c + k];
        double v11 = src[(y1 * sw + x1) * c + k];
        double v = (1 - wy) * ((1 - wx) * v00 + wx * v01) +
                   wy * ((1 - wx) * v10 + wx * v11);
        dst[(y * dw + x) * c + k] = (uint8_t)(v + 0.5);
      }
    }
  }
}

void center_crop_square_u8(const uint8_t* src, int64_t h, int64_t w, int64_t c,
                           uint8_t* dst, int64_t* side_out) {
  int64_t side = std::min(h, w);
  int64_t top = (h - side) / 2 * (w < h);
  int64_t left = (w - side) / 2 * (h < w);
  // load_512 semantics: crop along the longer axis only (utils/utils.py:38-44)
  if (h < w) { top = 0; left = (w - side) / 2; }
  else if (w < h) { left = 0; top = (h - side) / 2; }
  else { top = 0; left = 0; }
  for (int64_t y = 0; y < side; ++y)
    std::memcpy(dst + y * side * c, src + ((y + top) * w + left) * c, side * c);
  *side_out = side;
}

void hstack_u8(const uint8_t** panels, int64_t n, int64_t h, int64_t w, int64_t c,
               uint8_t* dst) {
  for (int64_t y = 0; y < h; ++y)
    for (int64_t i = 0; i < n; ++i)
      std::memcpy(dst + (y * n * w + i * w) * c, panels[i] + y * w * c, w * c);
}

}  // extern "C"
