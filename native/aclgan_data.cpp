// aclgan_data: native host-side image decode + augmentation core.
//
// The TPU-native replacement for the reference's torch DataLoader worker
// processes (utils.py:86,99 — num_workers Python processes doing PIL decode +
// torchvision transforms). Training at >2k img/s makes the host pipeline the
// bottleneck (SURVEY §7 risks); this core does JPEG decode (libjpeg),
// shortest-side bilinear resize, random crop and horizontal flip in one pass
// over C buffers with no Python object churn. Called from Python worker
// threads through ctypes (the GIL is released during the call).
//
// Exported C ABI:
//   aclgan_decode_jpeg_augment(jpeg_bytes, jpeg_len, new_size, crop_h, crop_w,
//                              flip, crop_top_frac, crop_left_frac, out_buf,
//                              out_cap) -> 0 on success
//   aclgan_augment_rgb(rgb, h, w, ...) same transform on a pre-decoded image
//   aclgan_normalize_batch(u8_in, n, f32_out): uint8 -> [-1, 1] float32
//
// Randomness (flip decision, crop position) is passed IN as fractions so the
// Python side keeps full deterministic control of augmentation RNG streams.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <vector>

#include <jpeglib.h>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Separable *antialiased* bilinear resize (HWC uint8), matching PIL's
// convolution resampler: a triangle filter whose support scales with the
// downscale ratio (support = max(src/dst, 1)), so downscales area-average
// instead of point-sampling — the PIL fallback path (transforms.py
// resize_shortest -> Image.BILINEAR) does exactly this, and the two
// augmentation paths must produce the same training distribution. For
// upscale the table degenerates to the classic 2-tap bilinear. Horizontal
// pass into a float scratch row-block, then vertical pass, with per-axis
// precomputed multi-tap weight tables.
struct ResizeTable {
  int ksize = 0;             // max taps per output sample (table stride)
  std::vector<int> start;    // first source index per output sample
  std::vector<int> count;    // live taps per output sample (<= ksize)
  std::vector<float> w;      // dst_n * ksize normalized triangle weights
  void build(int src_n, int dst_n) {
    const double scale = static_cast<double>(src_n) / dst_n;
    const double fscale = std::max(scale, 1.0);  // filter stretch (downscale)
    const double support = fscale;               // triangle filter support=1
    ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
    start.resize(dst_n);
    count.resize(dst_n);
    w.assign(static_cast<size_t>(dst_n) * ksize, 0.f);
    for (int d = 0; d < dst_n; ++d) {
      const double center = (d + 0.5) * scale;
      int xmin = static_cast<int>(center - support + 0.5);
      int xmax = static_cast<int>(center + support + 0.5);
      xmin = std::max(xmin, 0);
      xmax = std::min(xmax, src_n);
      start[d] = xmin;
      double total = 0.0;
      float* wd = &w[static_cast<size_t>(d) * ksize];
      for (int x = xmin; x < xmax; ++x) {
        const double t = std::abs((x + 0.5 - center) / fscale);
        const double ww = t < 1.0 ? 1.0 - t : 0.0;
        wd[x - xmin] = static_cast<float>(ww);
        total += ww;
      }
      // trim leading/trailing zero taps so the hot loops run exact counts
      int cnt = xmax - xmin;
      while (cnt > 0 && wd[cnt - 1] == 0.f) --cnt;
      int lead = 0;
      while (lead < cnt && wd[lead] == 0.f) ++lead;
      if (lead) {
        std::memmove(wd, wd + lead, sizeof(float) * (cnt - lead));
        start[d] += lead;
        cnt -= lead;
      }
      if (total > 0.0 && cnt > 0) {
        const float inv = static_cast<float>(1.0 / total);
        for (int k = 0; k < cnt; ++k) wd[k] *= inv;
        count[d] = cnt;
      } else {  // degenerate: nearest sample
        const int nearest = std::min(std::max(static_cast<int>(center), 0),
                                     src_n - 1);
        start[d] = nearest;
        wd[0] = 1.f;
        count[d] = 1;
      }
    }
  }
};

void resize_bilinear(const uint8_t* src, int sh, int sw, uint8_t* dst, int dh,
                     int dw) {
  ResizeTable tx, ty;
  tx.build(sw, dw);
  ty.build(sh, dh);
  const int row_elems = dw * 3;
  // vertical-first: (sh, sw, 3) -> one (sw, 3) float row per output row,
  // then the horizontal taps read that contiguous row. Only the dh * count
  // source rows each output row needs are ever touched, and both inner
  // loops are branch-free axpy/dot forms the compiler vectorizes.
  std::vector<float> vrow(static_cast<size_t>(sw) * 3);
  const int src_row = sw * 3;
  for (int y = 0; y < dh; ++y) {
    const int cnt = ty.count[y];
    const float* wy = &ty.w[static_cast<size_t>(y) * ty.ksize];
    const uint8_t* p0 = src + static_cast<size_t>(ty.start[y]) * src_row;
    if (cnt == 1) {
      const float w0 = wy[0];
      for (int x = 0; x < src_row; ++x) vrow[x] = w0 * p0[x];
    } else {
      const float w0 = wy[0], w1 = wy[1];
      const uint8_t* p1 = p0 + src_row;
      for (int x = 0; x < src_row; ++x)
        vrow[x] = w0 * p0[x] + w1 * p1[x];
      for (int k = 2; k < cnt; ++k) {
        const float wk = wy[k];
        const uint8_t* pk = p0 + static_cast<size_t>(k) * src_row;
        for (int x = 0; x < src_row; ++x) vrow[x] += wk * pk[x];
      }
    }
    uint8_t* drow = dst + static_cast<size_t>(y) * row_elems;
    for (int x = 0; x < dw; ++x) {
      const float* wx = &tx.w[static_cast<size_t>(x) * tx.ksize];
      const float* p = vrow.data() + tx.start[x] * 3;
      const int cx = tx.count[x];
      float r, g, b;
      if (cx == 2) {  // the upscale/bilinear common case: straight-line 2-tap
        const float w0 = wx[0], w1 = wx[1];
        r = w0 * p[0] + w1 * p[3];
        g = w0 * p[1] + w1 * p[4];
        b = w0 * p[2] + w1 * p[5];
      } else if (cx == 1) {
        r = p[0];
        g = p[1];
        b = p[2];
      } else {
        r = g = b = 0.f;
        for (int k = 0; k < cx; ++k, p += 3) {
          const float wk = wx[k];
          r += wk * p[0];
          g += wk * p[1];
          b += wk * p[2];
        }
      }
      drow[x * 3 + 0] = static_cast<uint8_t>(
          r < 0.f ? 0.f : (r > 255.f ? 255.f : r + 0.5f));
      drow[x * 3 + 1] = static_cast<uint8_t>(
          g < 0.f ? 0.f : (g > 255.f ? 255.f : g + 0.5f));
      drow[x * 3 + 2] = static_cast<uint8_t>(
          b < 0.f ? 0.f : (b > 255.f ? 255.f : b + 0.5f));
    }
  }
}

// resize(shortest side) -> crop -> flip; flip is folded into the crop copy
// (mirrored crop position + reversed pixel order), equivalent to the
// reference's flip-first order for a symmetric filter.
int augment(const uint8_t* rgb, int h, int w, int new_size, int crop_h,
            int crop_w, int flip, float crop_top_frac, float crop_left_frac,
            uint8_t* out, int64_t out_cap) {
  if (static_cast<int64_t>(crop_h) * crop_w * 3 > out_cap) return -2;

  std::vector<uint8_t> resized;
  const uint8_t* cur = rgb;
  int rh = h, rw = w;
  if (new_size > 0 && std::min(h, w) != new_size) {
    // long side TRUNCATES, matching torchvision F.resize's int() (and
    // data/transforms.py resize_shortest) — lround deviated by 1px on
    // ~half of aspect ratios
    if (w <= h) {
      rw = new_size;
      rh = std::max(1, static_cast<int>(
                           static_cast<double>(new_size) * h / w));
    } else {
      rh = new_size;
      rw = std::max(1, static_cast<int>(
                           static_cast<double>(new_size) * w / h));
    }
    resized.resize(static_cast<size_t>(rh) * rw * 3);
    resize_bilinear(cur, h, w, resized.data(), rh, rw);
    cur = resized.data();
  }

  if (crop_h <= 0) {  // no crop: caller must size out for rh*rw
    if (static_cast<int64_t>(rh) * rw * 3 > out_cap) return -2;
    if (!flip) {
      std::memcpy(out, cur, static_cast<size_t>(rh) * rw * 3);
    } else {
      for (int y = 0; y < rh; ++y)
        for (int x = 0; x < rw; ++x)
          std::memcpy(&out[(static_cast<size_t>(y) * rw + x) * 3],
                      &cur[(static_cast<size_t>(y) * rw + (rw - 1 - x)) * 3], 3);
    }
    return (rh << 16) | rw;
  }
  if (rh < crop_h || rw < crop_w) return -3;  // caller falls back to PIL+pad
  int top = static_cast<int>(crop_top_frac * (rh - crop_h + 1));
  int left = static_cast<int>(crop_left_frac * (rw - crop_w + 1));
  top = std::min(std::max(top, 0), rh - crop_h);
  left = std::min(std::max(left, 0), rw - crop_w);
  if (flip) left = (rw - crop_w) - left;  // mirror of the flipped-image crop
  for (int y = 0; y < crop_h; ++y) {
    const uint8_t* srow = &cur[(static_cast<size_t>(top + y) * rw + left) * 3];
    uint8_t* drow = &out[static_cast<size_t>(y) * crop_w * 3];
    if (!flip) {
      std::memcpy(drow, srow, static_cast<size_t>(crop_w) * 3);
    } else {
      for (int x = 0; x < crop_w; ++x)
        std::memcpy(&drow[x * 3], &srow[(crop_w - 1 - x) * 3], 3);
    }
  }
  return 0;
}

}  // namespace

extern "C" {

int aclgan_decode_jpeg(const uint8_t* data, int64_t len, uint8_t* out,
                       int64_t out_cap, int* out_h, int* out_w) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width, h = cinfo.output_height;
  if (static_cast<int64_t>(w) * h * 3 > out_cap) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *out_h = h;
  *out_w = w;
  return 0;
}

int aclgan_augment_rgb(const uint8_t* rgb, int h, int w, int new_size,
                       int crop_h, int crop_w, int flip, float crop_top_frac,
                       float crop_left_frac, uint8_t* out, int64_t out_cap) {
  return augment(rgb, h, w, new_size, crop_h, crop_w, flip, crop_top_frac,
                 crop_left_frac, out, out_cap);
}

int aclgan_decode_jpeg_augment(const uint8_t* data, int64_t len, int new_size,
                               int crop_h, int crop_w, int flip,
                               float crop_top_frac, float crop_left_frac,
                               uint8_t* out, int64_t out_cap, int* scratch_h,
                               int* scratch_w, uint8_t* scratch,
                               int64_t scratch_cap) {
  int rc = aclgan_decode_jpeg(data, len, scratch, scratch_cap, scratch_h,
                              scratch_w);
  if (rc != 0) return rc;
  return augment(scratch, *scratch_h, *scratch_w, new_size, crop_h, crop_w,
                 flip, crop_top_frac, crop_left_frac, out, out_cap);
}

// uint8 -> float32 in [-1, 1] (ToTensor + Normalize(.5,.5) fused)
void aclgan_normalize_batch(const uint8_t* in, int64_t n, float* out) {
  constexpr float kScale = 2.0f / 255.0f;
  for (int64_t i = 0; i < n; ++i) out[i] = in[i] * kScale - 1.0f;
}

}  // extern "C"
