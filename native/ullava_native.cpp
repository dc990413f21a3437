// Native host-side data-path kernels for u-LLaVA-TPU.
//
// The reference leans on third-party C extensions for its host pipeline
// (pycocotools' RLE codec, decord, PIL/cv2 resizes — SURVEY.md §2.9).
// This library provides first-party native equivalents for the ops that
// dominate host time in the segmentation pipeline:
//   - COCO RLE decode/encode (column-major runs, LEB128-style counts)
//   - nearest-neighbour binary-mask resize (gt-mask frame resampling)
//   - SAM image normalize+pad (uint8 HWC -> normalized f32 frame)
// Exposed with a plain C ABI for ctypes (no pybind11 dependency).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Decode COCO-compressed counts (chars) into a [h, w] row-major mask.
// Returns 0 on success, -1 if runs overflow the canvas.
int rle_decode(const char* counts, int counts_len, int h, int w,
               uint8_t* out /* h*w, row-major */) {
  std::vector<int64_t> runs;
  runs.reserve(counts_len);
  int i = 0;
  while (i < counts_len) {
    int64_t x = 0;
    int k = 0;
    bool more = true;
    while (more) {
      if (i >= counts_len) return -1;
      int64_t c = counts[i] - 48;
      x |= (c & 0x1f) << (5 * k);
      more = (c & 0x20) != 0;
      i++;
      if (!more && (c & 0x10)) x |= (int64_t)(-1) << (5 * (k + 1));
      k++;
    }
    if (runs.size() > 2) x += runs[runs.size() - 2];
    runs.push_back(x);
  }
  const int64_t total = (int64_t)h * w;
  // column-major fill
  std::vector<uint8_t> flat((size_t)total, 0);
  int64_t pos = 0;
  uint8_t val = 0;
  for (int64_t run : runs) {
    if (run < 0 || pos + run > total) return -1;
    if (val) memset(flat.data() + pos, 1, (size_t)run);
    pos += run;
    val ^= 1;
  }
  // transpose column-major [w, h] -> row-major [h, w]
  for (int y = 0; y < h; ++y)
    for (int x2 = 0; x2 < w; ++x2)
      out[(size_t)y * w + x2] = flat[(size_t)x2 * h + y];
  return 0;
}

// Encode a row-major [h, w] binary mask into COCO-compressed counts.
// Writes at most max_len chars; returns the encoded length or -1.
int rle_encode(const uint8_t* mask, int h, int w, char* out, int max_len) {
  const int64_t total = (int64_t)h * w;
  std::vector<int64_t> runs;
  runs.reserve(256);
  // column-major scan
  uint8_t prev = 0;
  int64_t run = 0;
  for (int x = 0; x < w; ++x) {
    for (int y = 0; y < h; ++y) {
      uint8_t v = mask[(size_t)y * w + x] ? 1 : 0;
      if (v == prev) {
        run++;
      } else {
        runs.push_back(run);
        run = 1;
        prev = v;
      }
    }
  }
  runs.push_back(run);
  if (total == 0) runs.assign(1, 0);
  int n = 0;
  for (size_t idx = 0; idx < runs.size(); ++idx) {
    int64_t x = runs[idx];
    if (idx > 2) x -= runs[idx - 2];
    bool more = true;
    while (more) {
      int64_t c = x & 0x1f;
      x >>= 5;
      if (c & 0x10)
        more = (x != -1);
      else
        more = (x != 0);
      if (more) c |= 0x20;
      if (n >= max_len) return -1;
      out[n++] = (char)(c + 48);
    }
  }
  return n;
}

// Nearest-neighbour resize of a uint8 mask [ih, iw] -> [oh, ow]
// (PIL-compatible sampling: src = floor((dst + 0.5) * scale)).
void resize_nearest_u8(const uint8_t* in, int ih, int iw, uint8_t* out,
                       int oh, int ow) {
  const double sy = (double)ih / oh;
  const double sx = (double)iw / ow;
  for (int y = 0; y < oh; ++y) {
    int yy = (int)((y + 0.5) * sy);
    if (yy >= ih) yy = ih - 1;
    const uint8_t* row = in + (size_t)yy * iw;
    for (int x = 0; x < ow; ++x) {
      int xx = (int)((x + 0.5) * sx);
      if (xx >= iw) xx = iw - 1;
      out[(size_t)y * ow + x] = row[xx];
    }
  }
}

// SAM preprocess: uint8 HWC RGB [h, w] -> normalized f32 [size, size, 3],
// zero-padded bottom/right ((x - mean) / std per channel).
void sam_normalize_pad(const uint8_t* in, int h, int w, int size,
                       const float* mean, const float* std_, float* out) {
  memset(out, 0, sizeof(float) * (size_t)size * size * 3);
  const float inv0 = 1.0f / std_[0], inv1 = 1.0f / std_[1], inv2 = 1.0f / std_[2];
  for (int y = 0; y < h; ++y) {
    const uint8_t* src = in + (size_t)y * w * 3;
    float* dst = out + (size_t)y * size * 3;
    for (int x = 0; x < w; ++x) {
      dst[x * 3 + 0] = (src[x * 3 + 0] - mean[0]) * inv0;
      dst[x * 3 + 1] = (src[x * 3 + 1] - mean[1]) * inv1;
      dst[x * 3 + 2] = (src[x * 3 + 2] - mean[2]) * inv2;
    }
  }
}

// Polygon -> RLE counts, the exact pycocotools integer rasterizer
// (maskApi.c rleFrPoly): 5x upsample, dense boundary walk, keep points on
// pixel-column boundaries, even-odd toggle encode (column-major).
// xy = [x0,y0,x1,y1,...] (n_pts vertices). Writes alternating run lengths
// to `out`; returns the number of runs, or -1 if out overflows max_out.
int poly_counts(const double* xy, int n_pts, int h, int w, int64_t* out,
                int max_out) {
  const double scale = 5.0;
  std::vector<int64_t> x(n_pts + 1), y(n_pts + 1);
  for (int j = 0; j < n_pts; ++j) {
    x[j] = (int64_t)(scale * xy[2 * j + 0] + 0.5);
    y[j] = (int64_t)(scale * xy[2 * j + 1] + 0.5);
  }
  x[n_pts] = x[0];
  y[n_pts] = y[0];

  std::vector<int64_t> u, v;
  for (int j = 0; j < n_pts; ++j) {
    int64_t xs = x[j], xe = x[j + 1], ys = y[j], ye = y[j + 1];
    int64_t dx = xs > xe ? xs - xe : xe - xs;
    int64_t dy = ys > ye ? ys - ye : ye - ys;
    bool flip = (dx >= dy && xs > xe) || (dx < dy && ys > ye);
    if (flip) {
      int64_t t = xs; xs = xe; xe = t;
      t = ys; ys = ye; ye = t;
    }
    if (dx >= dy) {
      double s = dx ? (double)(ye - ys) / dx : 0.0;
      for (int64_t d = 0; d <= dx; ++d) {
        int64_t t = flip ? dx - d : d;
        u.push_back(t + xs);
        v.push_back((int64_t)(ys + s * t + 0.5));
      }
    } else {
      double s = dy ? (double)(xe - xs) / dy : 0.0;
      for (int64_t d = 0; d <= dy; ++d) {
        int64_t t = flip ? dy - d : d;
        v.push_back(t + ys);
        u.push_back((int64_t)(xs + s * t + 0.5));
      }
    }
  }

  std::vector<int64_t> a;
  for (size_t j = 1; j < u.size(); ++j) {
    if (u[j] == u[j - 1]) continue;
    double xd = (double)(u[j] < u[j - 1] ? u[j] : u[j] - 1);
    xd = (xd + 0.5) / scale - 0.5;
    if (std::floor(xd) != xd || xd < 0 || xd > w - 1) continue;
    double yd = (double)(v[j] < v[j - 1] ? v[j] : v[j - 1]);
    yd = (yd + 0.5) / scale - 0.5;
    if (yd < 0) yd = 0; else if (yd > h) yd = h;
    yd = std::ceil(yd);
    a.push_back((int64_t)xd * h + (int64_t)yd);
  }
  a.push_back((int64_t)h * w);
  std::sort(a.begin(), a.end());

  int64_t prev = 0;
  for (size_t j = 0; j < a.size(); ++j) {
    int64_t t = a[j];
    a[j] -= prev;
    prev = t;
  }
  int m = 0;
  if (max_out < 1) return -1;
  out[m++] = a[0];
  size_t j = 1;
  while (j < a.size()) {
    if (a[j] > 0) {
      if (m >= max_out) return -1;
      out[m++] = a[j++];
    } else {
      j++;
      if (j < a.size()) out[m - 1] += a[j++];
    }
  }
  return m;
}

}  // extern "C"
