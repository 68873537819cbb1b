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

// Separable bilinear resize (HWC uint8): horizontal pass into a float
// scratch row-block, then vertical pass, with per-axis precomputed
// (index, weight) tables. ~5x the throughput of the naive per-pixel form —
// the host pipeline must keep up with >2k img/s on the device side.
struct ResizeTable {
  std::vector<int> i0, i1;
  std::vector<float> w1;  // weight of i1; weight of i0 = 1 - w1
  void build(int src_n, int dst_n) {
    i0.resize(dst_n);
    i1.resize(dst_n);
    w1.resize(dst_n);
    const float scale = static_cast<float>(src_n) / dst_n;
    for (int d = 0; d < dst_n; ++d) {
      float f = (d + 0.5f) * scale - 0.5f;
      int a = static_cast<int>(std::floor(f));
      float w = f - a;
      i0[d] = std::max(a, 0);
      i1[d] = std::min(a + 1, src_n - 1);
      w1[d] = w;
    }
  }
};

void resize_bilinear(const uint8_t* src, int sh, int sw, uint8_t* dst, int dh,
                     int dw) {
  ResizeTable tx, ty;
  tx.build(sw, dw);
  ty.build(sh, dh);
  // horizontal pass: (sh, sw, 3) -> (sh, dw, 3) float
  std::vector<float> tmp(static_cast<size_t>(sh) * dw * 3);
  for (int y = 0; y < sh; ++y) {
    const uint8_t* srow = src + static_cast<size_t>(y) * sw * 3;
    float* trow = tmp.data() + static_cast<size_t>(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      const uint8_t* p0 = srow + tx.i0[x] * 3;
      const uint8_t* p1 = srow + tx.i1[x] * 3;
      const float w = tx.w1[x];
      trow[x * 3 + 0] = p0[0] + w * (p1[0] - p0[0]);
      trow[x * 3 + 1] = p0[1] + w * (p1[1] - p0[1]);
      trow[x * 3 + 2] = p0[2] + w * (p1[2] - p0[2]);
    }
  }
  // vertical pass: (sh, dw, 3) -> (dh, dw, 3) uint8
  const int row_elems = dw * 3;
  for (int y = 0; y < dh; ++y) {
    const float* r0 = tmp.data() + static_cast<size_t>(ty.i0[y]) * row_elems;
    const float* r1 = tmp.data() + static_cast<size_t>(ty.i1[y]) * row_elems;
    const float w = ty.w1[y];
    uint8_t* drow = dst + static_cast<size_t>(y) * row_elems;
    for (int x = 0; x < row_elems; ++x) {
      float v = r0[x] + w * (r1[x] - r0[x]);
      drow[x] = static_cast<uint8_t>(v < 0.f ? 0.f : (v > 255.f ? 255.f : v + 0.5f));
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
    if (w <= h) {
      rw = new_size;
      rh = std::max(1, static_cast<int>(std::lround(
                           static_cast<double>(new_size) * h / w)));
    } else {
      rh = new_size;
      rw = std::max(1, static_cast<int>(std::lround(
                           static_cast<double>(new_size) * w / h)));
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
