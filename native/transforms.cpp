// Native SynMirror sample transforms.
//
// The reference's input pipeline is torch DataLoader worker *processes*
// (train_brushnet_mirror.py:1242-1248) running PIL/torchvision transforms
// (dataset/dataset.py:71-166); per-worker the hot path is interpreter-bound.
// The TPU rebuild keeps one process per host (pjit SPMD), so the loader
// parallelism is a thread pool — these kernels do the per-sample pixel work
// in one pass each and are called through ctypes (GIL released for the
// duration), letting loader threads scale on many-core TPU hosts.
//
// Bicubic resize reproduces PIL's convolution resampler exactly for 32-bit
// float channels: double-precision normalized coefficients, horizontal then
// vertical pass, double accumulation, float store (PIL Resample.c
// semantics; a = -0.5 bicubic, support 2.0). Parity is pinned by
// tests/test_native_transforms.py against the PIL-backed numpy path.
//
// Build: make native  (g++ -O3 -shared -fPIC).  Loaded by
// reflecting_reality_tpu/data/native.py; every entry point has a numpy
// fallback, so the .so is an accelerator, never a requirement.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

// PIL bicubic filter (ImagingResampleHorizontal; a = -0.5).
inline double bicubic_filter(double x) {
  constexpr double a = -0.5;
  if (x < 0.0) x = -x;
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

constexpr double kSupport = 2.0;

// PIL precompute_coeffs: normalized double coefficients per output index.
struct Coeffs {
  std::vector<int> xmin;    // first source index per output index
  std::vector<int> xsize;   // number of taps per output index
  std::vector<double> k;    // ksize taps per output index (padded)
  int ksize = 0;
};

Coeffs precompute_coeffs(int in_size, int out_size) {
  Coeffs c;
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = scale < 1.0 ? 1.0 : scale;
  double support = kSupport * filterscale;
  c.ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  c.xmin.resize(out_size);
  c.xsize.resize(out_size);
  c.k.assign(static_cast<size_t>(out_size) * c.ksize, 0.0);
  double ss = 1.0 / filterscale;
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    double ww = 0.0;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    double* k = &c.k[static_cast<size_t>(xx) * c.ksize];
    for (int x = 0; x < xmax; ++x) {
      double w = bicubic_filter((x + xmin - center + 0.5) * ss);
      k[x] = w;
      ww += w;
    }
    if (ww != 0.0) {
      for (int x = 0; x < xmax; ++x) k[x] /= ww;
    }
    c.xmin[xx] = xmin;
    c.xsize[xx] = xmax;
  }
  return c;
}

// Horizontal pass: (h, in_w, ch) -> (h, out_w, ch), f32 in/out, f64 accum.
void resample_horizontal(const float* src, int h, int in_w, int ch,
                         const Coeffs& c, int out_w, float* dst) {
  for (int y = 0; y < h; ++y) {
    const float* row = src + static_cast<size_t>(y) * in_w * ch;
    float* out_row = dst + static_cast<size_t>(y) * out_w * ch;
    for (int xx = 0; xx < out_w; ++xx) {
      const double* k = &c.k[static_cast<size_t>(xx) * c.ksize];
      int xmin = c.xmin[xx], xsz = c.xsize[xx];
      for (int cc = 0; cc < ch; ++cc) {
        double ss = 0.0;
        for (int x = 0; x < xsz; ++x)
          ss += row[static_cast<size_t>(xmin + x) * ch + cc] * k[x];
        out_row[static_cast<size_t>(xx) * ch + cc] = static_cast<float>(ss);
      }
    }
  }
}

// Vertical pass: (in_h, w, ch) -> (out_h, w, ch).
void resample_vertical(const float* src, int in_h, int w, int ch,
                       const Coeffs& c, int out_h, float* dst) {
  for (int yy = 0; yy < out_h; ++yy) {
    const double* k = &c.k[static_cast<size_t>(yy) * c.ksize];
    int ymin = c.xmin[yy], ysz = c.xsize[yy];
    float* out_row = dst + static_cast<size_t>(yy) * w * ch;
    for (int x = 0; x < w * ch; ++x) {
      double ss = 0.0;
      for (int y = 0; y < ysz; ++y)
        ss += src[static_cast<size_t>(ymin + y) * w * ch + x] * k[y];
      out_row[x] = static_cast<float>(ss);
    }
  }
}

// PIL-order full resize: horizontal first, then vertical.
// Returns buffer of (out_h, out_w, ch).
std::vector<float> resize_bicubic(const float* src, int h, int w, int ch,
                                  int out_h, int out_w) {
  std::vector<float> tmp;
  const float* cur = src;
  int cur_h = h;
  std::vector<float> horiz;
  if (out_w != w) {
    Coeffs cx = precompute_coeffs(w, out_w);
    horiz.resize(static_cast<size_t>(h) * out_w * ch);
    resample_horizontal(src, h, w, ch, cx, out_w, horiz.data());
    cur = horiz.data();
  }
  int cur_w = (out_w != w) ? out_w : w;
  if (out_h != h) {
    Coeffs cy = precompute_coeffs(h, out_h);
    tmp.resize(static_cast<size_t>(out_h) * cur_w * ch);
    resample_vertical(cur, cur_h, cur_w, ch, cy, out_h, tmp.data());
    return tmp;
  }
  tmp.assign(cur, cur + static_cast<size_t>(cur_h) * cur_w * ch);
  return tmp;
}

// Python round() = banker's rounding (half to even); std::lround rounds
// half away from zero, which would disagree on half-integer targets
// (e.g. 512.5) and break native/numpy parity.
inline int round_half_even(double x) {
  return static_cast<int>(std::nearbyint(x));  // FE_TONEAREST = ties-to-even
}

// Shorter-side target size (torchvision Resize semantics, synmirror.py).
void shorter_side(int h, int w, int resolution, int* nh, int* nw) {
  if (h <= w) {
    *nh = resolution;
    *nw = std::max(1, round_half_even(
                          static_cast<double>(w) * resolution / h));
  } else {
    *nh = std::max(1, round_half_even(
                          static_cast<double>(h) * resolution / w));
    *nw = resolution;
  }
}

// Center crop offsets.
inline void crop_origin(int h, int w, int resolution, int* top, int* left) {
  *top = std::max(0, (h - resolution) / 2);
  *left = std::max(0, (w - resolution) / 2);
}

// resize (if needed) + center crop + affine out = (x - sub) * mul, storing
// (res, res, ch) f32.  `src` is f32 (already /255'd by the caller for u8
// sources — the division is fused into the u8 entry points below).
void resize_crop_affine(const float* src, int h, int w, int ch,
                        int resolution, float sub, float mul, float* dst) {
  int nh, nw;
  shorter_side(h, w, resolution, &nh, &nw);
  std::vector<float> resized;
  const float* cur = src;
  int cur_h = h, cur_w = w;
  if (nh != h || nw != w) {
    resized = resize_bicubic(src, h, w, ch, nh, nw);
    cur = resized.data();
    cur_h = nh;
    cur_w = nw;
  }
  int top, left;
  crop_origin(cur_h, cur_w, resolution, &top, &left);
  for (int y = 0; y < resolution; ++y) {
    const float* row = cur + (static_cast<size_t>(top + y) * cur_w + left) * ch;
    float* out = dst + static_cast<size_t>(y) * resolution * ch;
    for (int i = 0; i < resolution * ch; ++i) out[i] = (row[i] - sub) * mul;
  }
}

}  // namespace

extern "C" {

// uint8 HWC -> f32 (res,res,ch) in [-1,1]: x/255 -> resize -> crop ->
// (x-0.5)/0.5  (synmirror.apply_transforms_rgb).
void rr_rgb_transform(const uint8_t* src, int h, int w, int ch,
                      int resolution, float* dst) {
  std::vector<float> f(static_cast<size_t>(h) * w * ch);
  for (size_t i = 0; i < f.size(); ++i) f[i] = src[i] / 255.0f;
  resize_crop_affine(f.data(), h, w, ch, resolution, 0.5f, 2.0f, dst);
}

// uint8 HW mask -> f32 (res,res,1) in [0,1] (apply_transforms_mask).
void rr_mask_transform(const uint8_t* src, int h, int w, int resolution,
                       float* dst) {
  std::vector<float> f(static_cast<size_t>(h) * w);
  for (size_t i = 0; i < f.size(); ++i) f[i] = src[i] / 255.0f;
  resize_crop_affine(f.data(), h, w, 1, resolution, 0.0f, 1.0f, dst);
}

// f32 HWC in [0,1] -> f32 (res,res,ch) in [-1,1]  (normals image mode:
// resize -> crop -> (x-0.5)/0.5, NO /255).
void rr_f32_img_transform(const float* src, int h, int w, int ch,
                          int resolution, float* dst) {
  resize_crop_affine(src, h, w, ch, resolution, 0.5f, 2.0f, dst);
}

// Depth max_scene_depth mode (apply_transforms_depth): max over mask>0
// (+delta), clip to [0,max], /max, optional *2-1, resize, crop.
// mask may be null (use max_scene_depth as given). to_pm1: 1 -> [-1,1].
// Returns 0 on success, 1 for an empty mask (caller falls back to the
// numpy path, which raises loudly like the reference).  A NaN inside the
// masked region poisons mx so the output is all-NaN, matching numpy's
// max/clip NaN propagation.
int rr_depth_transform(const float* depth, const uint8_t* mask, int h, int w,
                       float max_scene_depth, float delta, int to_pm1,
                       int resolution, float* dst) {
  float mx = max_scene_depth;
  if (mask != nullptr) {
    float m = -1e30f;
    bool found = false, has_nan = false;
    size_t n = static_cast<size_t>(h) * w;
    for (size_t i = 0; i < n; ++i) {
      if (mask[i] > 0) {
        found = true;
        if (std::isnan(depth[i])) has_nan = true;
        else if (depth[i] > m) m = depth[i];
      }
    }
    if (!found) return 1;
    if (has_nan) m = std::numeric_limits<float>::quiet_NaN();
    // numpy computes float(max) + delta in f64 then casts at the clip/divide
    mx = static_cast<float>(static_cast<double>(m) + static_cast<double>(delta));
  }
  std::vector<float> unit(static_cast<size_t>(h) * w);
  const bool mx_nan = std::isnan(mx);
  for (size_t i = 0; i < unit.size(); ++i) {
    float v = depth[i];
    if (v < 0.0f) v = 0.0f;
    if (mx_nan) { unit[i] = std::numeric_limits<float>::quiet_NaN(); continue; }
    if (v > mx) v = mx;
    unit[i] = v / mx;  // division, matching numpy's rounding exactly
  }
  if (to_pm1) {
    // match numpy's 2*unit - 1 applied BEFORE resize
    for (size_t i = 0; i < unit.size(); ++i) unit[i] = 2.0f * unit[i] - 1.0f;
  }
  resize_crop_affine(unit.data(), h, w, 1, resolution, 0.0f, 1.0f, dst);
  return 0;
}

// masked_image: out = image where mask != sentinel else 0 (u8, HWC + HW).
void rr_masked_image(const uint8_t* image, const uint8_t* mask, int h, int w,
                     int ch, uint8_t sentinel, uint8_t* dst) {
  size_t n = static_cast<size_t>(h) * w;
  for (size_t i = 0; i < n; ++i) {
    const uint8_t keep = (mask[i] != sentinel) ? 1 : 0;
    for (int c = 0; c < ch; ++c) dst[i * ch + c] = image[i * ch + c] * keep;
  }
}

int rr_abi_version() { return 2; }

}  // extern "C"
