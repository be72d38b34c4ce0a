// imagepipe: fused host-side image preprocessing for the data loader.
//
// The framework's TPU compute path is XLA/Pallas; the host input pipeline is
// the native component (the reference's native component was its CPU graph
// builder, replaced on TPU by dense XLA ops — see ops/graph.py). This library
// fuses crop -> flip -> separable antialiased resize -> normalize into one
// pass per sample, writing float32 NHWC directly into the batch buffer, with
// zero intermediate allocations per call after warmup.
//
// Exposed via a plain C ABI consumed by ctypes (schemanet_tpu/data/native.py).
// Build: native/build.sh -> native/libimagepipe.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct FilterTap {
    int start;        // first source index
    int count;        // number of taps
    int coeff_offset; // offset into the coefficient table
};

// Triangle (bilinear) filter with antialiasing on downscale — the same
// filtering model PIL uses for Image.BILINEAR.
static void build_triangle_taps(int in_size, int out_size, int crop_start,
                                int crop_size, std::vector<FilterTap>& taps,
                                std::vector<float>& coeffs) {
    taps.resize(out_size);
    coeffs.clear();
    const double scale = (double)crop_size / out_size;
    const double support_scale = scale < 1.0 ? 1.0 : scale;
    const double support = 1.0 * support_scale;
    for (int i = 0; i < out_size; ++i) {
        const double center = crop_start + (i + 0.5) * scale;
        int lo = (int)std::floor(center - support + 0.5);
        int hi = (int)std::floor(center + support + 0.5);
        lo = std::max(lo, crop_start - 16);  // allow a little padding overhang
        hi = std::min(hi, crop_start + crop_size + 16);
        FilterTap t;
        t.start = lo;
        t.count = hi - lo;
        t.coeff_offset = (int)coeffs.size();
        double total = 0.0;
        for (int j = lo; j < hi; ++j) {
            double x = (j + 0.5 - center) / support_scale;
            double w = x < 0 ? 1.0 + x : 1.0 - x;  // triangle
            if (w < 0) w = 0;
            coeffs.push_back((float)w);
            total += w;
        }
        if (total > 0) {
            for (int j = 0; j < t.count; ++j)
                coeffs[t.coeff_offset + j] = (float)(coeffs[t.coeff_offset + j] / total);
        }
        taps[i] = t;
    }
}

// fetch a source pixel with virtual zero padding (supports CIFAR pad-4 crops
// whose window extends outside the image)
static inline float fetch(const uint8_t* src, int h, int w, int c, int y, int x,
                          int ch) {
    if (y < 0 || y >= h || x < 0 || x >= w) return 0.0f;
    return (float)src[(y * w + x) * c + ch];
}

}  // namespace

extern "C" {

// Crop (top/left may be negative = zero padding), optional horizontal flip,
// antialiased bilinear resize to (oh, ow), normalize ((v/255 - mean)/std),
// write float32 HWC into dst.
void ip_process_sample(const uint8_t* src, int h, int w, int c,
                       int top, int left, int crop_h, int crop_w, int flip,
                       float* dst, int oh, int ow,
                       const float* mean, const float* stddev) {
    thread_local std::vector<FilterTap> xtaps, ytaps;
    thread_local std::vector<float> xcoef, ycoef;
    thread_local std::vector<float> tmp;  // [crop_h, ow, c] horizontal pass

    build_triangle_taps(w, ow, left, crop_w, xtaps, xcoef);
    build_triangle_taps(h, oh, top, crop_h, ytaps, ycoef);
    tmp.assign((size_t)crop_h * ow * c, 0.0f);

    // horizontal pass over the crop rows (with zero padding outside)
    for (int y = 0; y < crop_h; ++y) {
        const int sy = top + y;
        float* row = tmp.data() + (size_t)y * ow * c;
        for (int x = 0; x < ow; ++x) {
            // flip == write output column x from the taps of mirrored column
            // (resize and mirror commute for a symmetric filter)
            const FilterTap& t = xtaps[flip ? (ow - 1 - x) : x];
            for (int ch = 0; ch < c; ++ch) {
                float acc = 0.0f;
                for (int j = 0; j < t.count; ++j) {
                    acc += xcoef[t.coeff_offset + j] * fetch(src, h, w, c, sy, t.start + j, ch);
                }
                row[x * c + ch] = acc;
            }
        }
    }
    // vertical pass + fused normalize
    const float inv255 = 1.0f / 255.0f;
    for (int y = 0; y < oh; ++y) {
        const FilterTap& t = ytaps[y];
        float* out_row = dst + (size_t)y * ow * c;
        std::memset(out_row, 0, sizeof(float) * ow * c);
        for (int j = 0; j < t.count; ++j) {
            const int sy = t.start + j - top;
            if (sy < 0 || sy >= crop_h) continue;  // zero padding contributes 0
            const float coef = ycoef[t.coeff_offset + j];
            const float* row = tmp.data() + (size_t)sy * ow * c;
            for (int i = 0; i < ow * c; ++i) out_row[i] += coef * row[i];
        }
        for (int x = 0; x < ow; ++x) {
            for (int ch = 0; ch < c; ++ch) {
                float v = out_row[x * c + ch] * inv255;
                out_row[x * c + ch] = (v - mean[ch]) / stddev[ch];
            }
        }
    }
}

// Batched variant over same-sized sources (the common CIFAR/array-dataset
// case): src [n, h, w, c] uint8 contiguous; params arrays length n.
void ip_process_batch(const uint8_t* src, int n, int h, int w, int c,
                      const int* tops, const int* lefts, int crop_h, int crop_w,
                      const int* flips, float* dst, int oh, int ow,
                      const float* mean, const float* stddev) {
    const size_t in_stride = (size_t)h * w * c;
    const size_t out_stride = (size_t)oh * ow * c;
    for (int i = 0; i < n; ++i) {
        ip_process_sample(src + i * in_stride, h, w, c, tops[i], lefts[i],
                          crop_h, crop_w, flips[i], dst + i * out_stride, oh,
                          ow, mean, stddev);
    }
}

// uint8-output variants: same crop/flip/antialiased-resize, but the result is
// rounded back to uint8 and NOT normalised — normalisation happens on the
// accelerator, so only a quarter of the bytes cross the host->device link.
void ip_process_sample_u8(const uint8_t* src, int h, int w, int c,
                          int top, int left, int crop_h, int crop_w, int flip,
                          uint8_t* dst, int oh, int ow) {
    thread_local std::vector<float> fbuf;
    fbuf.resize((size_t)oh * ow * c);
    const float zero3[4] = {0, 0, 0, 0};
    const float one3[4] = {1, 1, 1, 1};
    // reuse the float pipeline with identity normalisation (x/255), then
    // rescale back to [0, 255] and round
    ip_process_sample(src, h, w, c, top, left, crop_h, crop_w, flip,
                      fbuf.data(), oh, ow, zero3, one3);
    for (size_t i = 0; i < fbuf.size(); ++i) {
        float v = fbuf[i] * 255.0f + 0.5f;
        dst[i] = (uint8_t)(v < 0 ? 0 : (v > 255 ? 255 : v));
    }
}

void ip_process_batch_u8(const uint8_t* src, int n, int h, int w, int c,
                         const int* tops, const int* lefts, int crop_h, int crop_w,
                         const int* flips, uint8_t* dst, int oh, int ow) {
    const size_t in_stride = (size_t)h * w * c;
    const size_t out_stride = (size_t)oh * ow * c;
    for (int i = 0; i < n; ++i) {
        ip_process_sample_u8(src + i * in_stride, h, w, c, tops[i], lefts[i],
                             crop_h, crop_w, flips[i], dst + i * out_stride, oh, ow);
    }
}

int ip_version() { return 3; }

}  // extern "C"

// ---------------------------------------------------------------------------
// JPEG decode (libjpeg): the ImageNet-style folder datasets are decode-bound
// on a 1-core host; decoding in C (optionally fused with the crop/resize/
// normalize pass above) removes the PIL round trip.
// ---------------------------------------------------------------------------

#include <csetjmp>
#include <cstdio>

#include <jpeglib.h>

namespace {

struct JpegErrorMgr {
    jpeg_error_mgr pub;
    std::jmp_buf jump;
};

static void jpeg_error_exit(j_common_ptr cinfo) {
    JpegErrorMgr* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
    std::longjmp(err->jump, 1);
}

}  // namespace

extern "C" {

// Read JPEG header only; returns 0 on success and fills (w, h, c=3).
int ip_jpeg_dims(const uint8_t* buf, int len, int* w, int* h, int* c) {
    jpeg_decompress_struct cinfo;
    JpegErrorMgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jpeg_error_exit;
    if (setjmp(jerr.jump)) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), (unsigned long)len);
    jpeg_read_header(&cinfo, TRUE);
    *w = (int)cinfo.image_width;
    *h = (int)cinfo.image_height;
    *c = 3;  // decoded as RGB below regardless of source colorspace
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

// Decode to RGB uint8 HWC into caller-allocated `out` (h*w*3 bytes).
// Returns 0 on success.
int ip_decode_jpeg(const uint8_t* buf, int len, uint8_t* out) {
    jpeg_decompress_struct cinfo;
    JpegErrorMgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jpeg_error_exit;
    if (setjmp(jerr.jump)) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), (unsigned long)len);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    const int w = cinfo.output_width;
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* row = out + (size_t)cinfo.output_scanline * w * 3;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

// Fused decode -> crop/flip/resize/normalize (one call per sample; the decoded
// pixels never cross back into Python).
int ip_decode_process(const uint8_t* buf, int len,
                      int top, int left, int crop_h, int crop_w, int flip,
                      float* dst, int oh, int ow,
                      const float* mean, const float* stddev) {
    thread_local std::vector<uint8_t> pixels;
    int w = 0, h = 0, c = 0;
    if (ip_jpeg_dims(buf, len, &w, &h, &c) != 0) return -1;
    pixels.resize((size_t)w * h * 3);
    if (ip_decode_jpeg(buf, len, pixels.data()) != 0) return -1;
    ip_process_sample(pixels.data(), h, w, 3, top, left, crop_h, crop_w, flip,
                      dst, oh, ow, mean, stddev);
    return 0;
}

// uint8-output fused decode (see ip_process_sample_u8)
int ip_decode_process_u8(const uint8_t* buf, int len,
                         int top, int left, int crop_h, int crop_w, int flip,
                         uint8_t* dst, int oh, int ow) {
    thread_local std::vector<uint8_t> pixels;
    int w = 0, h = 0, c = 0;
    if (ip_jpeg_dims(buf, len, &w, &h, &c) != 0) return -1;
    pixels.resize((size_t)w * h * 3);
    if (ip_decode_jpeg(buf, len, pixels.data()) != 0) return -1;
    ip_process_sample_u8(pixels.data(), h, w, 3, top, left, crop_h, crop_w, flip,
                         dst, oh, ow);
    return 0;
}

}  // extern "C"
