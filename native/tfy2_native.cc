// tfy2_native — host-side native runtime kernels.
//
// TPU-native framework analog of the native layer the reference delegates
// to: the reference (wenxichen/tensorflow_yolo2) is 100% Python but leans
// on TensorFlow 1.x's C++ kernels for every hot host op (image resize in
// tf.image / cv2's C++ core, queue runners, post-processing). Here the
// device compute path is XLA:TPU + Pallas; this library is the native
// runtime *around* it: the per-image host preprocessing that feeds the
// chip and the serving-side post-processing that consumes it.
//
// Exposed via a plain C ABI and loaded from Python with ctypes
// (tensorflow_yolo2_tpu/utils/native.py); every entry point has a pure
// numpy fallback so the framework runs without a toolchain.
//
// Kernels:
//   tfy2_resize_normalize  — fused bilinear resize (exact replica of
//       OpenCV INTER_LINEAR's 8U scalar fixed-point arithmetic; cv2 builds
//       that dispatch resize to Intel IPP differ from their own scalar
//       path — and from this kernel — by one 8-bit level on ~0.3% of
//       pixels) + BGR/RGB swap + horizontal flip + uint8 → float32 [-1,1]
//       normalize in ONE pass: the hot op of pascal_voc.image_read
//       (reference pascal_voc.py:60-67) without cv2's intermediates.
//   tfy2_normalize         — vectorized uint8 → [-1,1] float32.
//   tfy2_label_grid        — VOC boxes → S×S×(5+C) YOLO label grid
//       (reference pascal_voc.py:125-165 math, first object wins).
//   tfy2_nms               — greedy class-aware NMS on host for serving
//       post-process (north-star addition; reference has none,
//       net_utils.py:398 is a bare threshold).
//   tfy2_jpeg_resize_normalize — (built when libjpeg is present,
//       TFY2_WITH_JPEG) fused JPEG decode → resize → normalize with
//       optional DCT-domain scaled decode: the decoder emits the image at
//       the smallest M/8 scale still >= the target, so a 2000px source
//       headed for 448² does ~1/16 the IDCT + colorconvert work before
//       the exact bilinear pass. The reference decodes every image at
//       full resolution through cv2 and resizes after
//       (pascal_voc.py:60-67, ilsvrc2017_cls_multithread.py:320-340).
//   tfy2_resize_u8 / tfy2_jpeg_resize_u8 — same pipelines with raw uint8
//       output: the device-normalize serving path ships uint8 to the chip
//       (4x fewer host↔device bytes) and the chip fuses (x/255)*2-1 into
//       the first conv — bit-identical to the float path.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef TFY2_WITH_JPEG
#include <csetjmp>
#include <cstdio>
#include <jpeglib.h>
#endif

// ---------------------------------------------------------------------------
// Fused resize + normalize
// ---------------------------------------------------------------------------

// OpenCV INTER_LINEAR on 8U uses 11-bit fixed-point coefficients, int
// horizontal accumulation, and a (b*(row>>4))>>16 vertical reduction with
// +2 >>2 rounding (imgproc resize: HResizeLinear / VResizeLinear<uchar>).
// This replicates that arithmetic exactly (parity-tested against a numpy
// port of the same fixed-point math in tests/test_native.py).
static const int kCoefBits = 11;
static const int kCoefScale = 1 << kCoefBits;  // 2048

// uint8 → [-1, 1] float32 with numpy's exact op order
// ((float32)v / 255.0f) * 2.0f - 1.0f, via a lookup table.
struct NormLUT {
    float t[256];
    NormLUT() {
        for (int v = 0; v < 256; ++v)
            t[v] = ((float)v / 255.0f) * 2.0f - 1.0f;
    }
};
static const NormLUT kNorm;

static inline short sat_short(float v) {
    int iv = (int)lrintf(v);
    iv = std::min(std::max(iv, (int)-32768), (int)32767);
    return (short)iv;
}

struct LinCoef {
    int s0;        // left/top source index
    short a0, a1;  // fixed-point weights, a0 + a1 == 2048 (post-saturate)
};

static void build_coefs(int src_len, int dst_len, std::vector<LinCoef>& out) {
    out.resize((size_t)dst_len);
    double scale = (double)src_len / dst_len;
    for (int x = 0; x < dst_len; ++x) {
        // cv2: fx computed in float, half-pixel centers, edge clamp.
        float fx = (float)((x + 0.5) * scale - 0.5);
        int sx = (int)std::floor(fx);
        fx -= sx;
        if (sx < 0) { sx = 0; fx = 0.f; }
        if (sx >= src_len - 1) { sx = src_len - 2; fx = 1.f; }
        if (src_len == 1) { sx = 0; fx = 0.f; }
        LinCoef c;
        c.s0 = std::max(sx, 0);
        c.a0 = sat_short((1.f - fx) * kCoefScale);
        c.a1 = sat_short(fx * kCoefScale);
        out[(size_t)x] = c;
    }
}

// Horizontal pass: one source row → dw*3 int accumulators. Channel swap
// is folded in here (once per cached row, not per output pixel).
template <bool kSwap>
static void hresize_row(const uint8_t* srow, int sw, int dw,
                        const LinCoef* xc, int* out) {
    for (int x = 0; x < dw; ++x) {
        const LinCoef& cx = xc[x];
        const uint8_t* p0 = srow + (size_t)cx.s0 * 3;
        const uint8_t* p1 = srow + (size_t)std::min(cx.s0 + 1, sw - 1) * 3;
        int* r = out + (size_t)x * 3;
        if (kSwap) {
            r[0] = p0[2] * cx.a0 + p1[2] * cx.a1;
            r[1] = p0[1] * cx.a0 + p1[1] * cx.a1;
            r[2] = p0[0] * cx.a0 + p1[0] * cx.a1;
        } else {
            r[0] = p0[0] * cx.a0 + p1[0] * cx.a1;
            r[1] = p0[1] * cx.a0 + p1[1] * cx.a1;
            r[2] = p0[2] * cx.a0 + p1[2] * cx.a1;
        }
    }
}

// Output sinks: float32 [-1,1] normalize (the classic fused path) or raw
// uint8 (the device-normalize serving path — 4x fewer bytes over
// host↔device links; the chip does (x/255)*2-1 as its first fused op, so
// the result is bit-identical to the float path).
static inline void emit_px(float* d, int v) {
    // (float)v/255*2-1 in that order is bit-identical to numpy's
    // (x/255.0)*2.0-1.0 (every step a correctly-rounded f32 op).
    *d = (float)v / 255.0f * 2.0f - 1.0f;
}
static inline void emit_px(uint8_t* d, int v) { *d = (uint8_t)v; }

// Vertical pass over one output row: branch-free, auto-vectorizable.
template <bool kFlip, typename T>
static void vresize_row(const int* row0, const int* row1, int b0, int b1,
                        int n3, T* d) {
    if (!kFlip) {
        for (int i = 0; i < n3; ++i) {
            // cv2 VResizeLinear<uchar> fixed-point rounding, exactly.
            int v = (((b0 * (row0[i] >> 4)) >> 16) +
                     ((b1 * (row1[i] >> 4)) >> 16) + 2) >> 2;
            v = std::min(std::max(v, 0), 255);
            emit_px(d + i, v);
        }
    } else {
        int dw = n3 / 3;
        for (int x = 0; x < dw; ++x) {
            const int* r0 = row0 + (size_t)(dw - 1 - x) * 3;
            const int* r1 = row1 + (size_t)(dw - 1 - x) * 3;
            for (int c = 0; c < 3; ++c) {
                int v = (((b0 * (r0[c] >> 4)) >> 16) +
                         ((b1 * (r1[c] >> 4)) >> 16) + 2) >> 2;
                v = std::min(std::max(v, 0), 255);
                emit_px(d + (size_t)x * 3 + c, v);
            }
        }
    }
}

template <bool kSwap, bool kFlip, typename T>
static void resize_normalize_impl(const uint8_t* src, int sh, int sw,
                                  T* dst, int dh, int dw) {
    std::vector<LinCoef> xc, yc;
    build_coefs(sw, dw, xc);
    build_coefs(sh, dh, yc);

    // Horizontal pass rows cache: two int rows (top/bottom), recomputed
    // per output row only when the source row pair changes.
    std::vector<int> row0((size_t)dw * 3), row1((size_t)dw * 3);
    int cached_y0 = -2;

    for (int y = 0; y < dh; ++y) {
        const LinCoef& cy = yc[(size_t)y];
        int y0 = cy.s0, y1 = std::min(cy.s0 + 1, sh - 1);
        if (y0 != cached_y0) {
            if (y0 == cached_y0 + 1) {
                // reuse previous bottom row as the new top row
                row0.swap(row1);
            } else {
                hresize_row<kSwap>(src + (size_t)y0 * sw * 3, sw, dw,
                                   xc.data(), row0.data());
            }
            hresize_row<kSwap>(src + (size_t)y1 * sw * 3, sw, dw,
                               xc.data(), row1.data());
            cached_y0 = y0;
        }
        vresize_row<kFlip>(row0.data(), row1.data(), cy.a0, cy.a1, dw * 3,
                           dst + (size_t)y * dw * 3);
    }
}

template <typename T>
static void resize_dispatch(const uint8_t* src, int sh, int sw, T* dst,
                            int dh, int dw, int swap_rb, int hflip) {
    if (swap_rb) {
        if (hflip)
            resize_normalize_impl<true, true>(src, sh, sw, dst, dh, dw);
        else
            resize_normalize_impl<true, false>(src, sh, sw, dst, dh, dw);
    } else {
        if (hflip)
            resize_normalize_impl<false, true>(src, sh, sw, dst, dh, dw);
        else
            resize_normalize_impl<false, false>(src, sh, sw, dst, dh, dw);
    }
}

// src: uint8 HWC (sh, sw, 3); dst: float32 (dh, dw, 3) in [-1, 1].
// swap_rb: exchange channels 0/2 (BGR→RGB). hflip: mirror horizontally
// (applied to the resized image, matching image_read's flip-after-resize).
extern "C" void tfy2_resize_normalize(const uint8_t* src, int sh, int sw,
                                      float* dst, int dh, int dw,
                                      int swap_rb, int hflip) {
    resize_dispatch(src, sh, sw, dst, dh, dw, swap_rb, hflip);
}

// Same bilinear arithmetic, raw uint8 output (no normalize): the
// device-normalize serving path ships this and the chip applies
// (x/255)*2-1 as its first fused op — bit-identical result, 4x fewer
// bytes over the host↔device link.
extern "C" void tfy2_resize_u8(const uint8_t* src, int sh, int sw,
                               uint8_t* dst, int dh, int dw, int swap_rb,
                               int hflip) {
    resize_dispatch(src, sh, sw, dst, dh, dw, swap_rb, hflip);
}

// uint8 (n) → float32 (n) in [-1, 1]: (x/255)*2 - 1, bit-identical to the
// numpy expression via the LUT.
extern "C" void tfy2_normalize(const uint8_t* src, float* dst, int64_t n) {
    for (int64_t i = 0; i < n; ++i) dst[i] = kNorm.t[src[i]];
}

// ---------------------------------------------------------------------------
// Fused JPEG decode + resize + normalize (libjpeg-turbo host fast path)
// ---------------------------------------------------------------------------

#ifdef TFY2_WITH_JPEG

namespace {
struct JpegErrorJmp {
    jpeg_error_mgr mgr;
    jmp_buf env;
};

void jpeg_error_longjmp(j_common_ptr cinfo) {
    JpegErrorJmp* err = reinterpret_cast<JpegErrorJmp*>(cinfo->err);
    longjmp(err->env, 1);
}

void jpeg_emit_nothing(j_common_ptr, int) {}
}  // namespace

extern "C" int tfy2_has_jpeg() { return 1; }

// Decode a JPEG byte buffer straight to float32 (dh, dw, 3) in [-1, 1].
//
// swap_rb == 0 emits BGR (the cv2.imread convention the pipeline is built
// on), 1 emits RGB — the decoder is asked for the layout directly
// (JCS_EXT_BGR / JCS_RGB), so no post-swap pass exists. With
// fast_scale != 0 the decode runs at the smallest M/8 DCT scale whose
// output still covers (dh, dw); the exact cv2-arithmetic bilinear pass
// then lands the final size. fast_scale == 0 decodes at full resolution —
// byte-identical input to the cv2 path for baseline JPEGs.
//
// Returns 0 on success, 1 on any decode error (caller falls back to cv2).
template <typename T>
static int jpeg_resize_impl(const uint8_t* data, int64_t n, T* dst, int dh,
                            int dw, int swap_rb, int hflip, int fast_scale) {
    jpeg_decompress_struct cinfo;
    JpegErrorJmp jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_error_longjmp;
    jerr.mgr.emit_message = jpeg_emit_nothing;
    std::vector<uint8_t> pixels;  // outlives setjmp scope
    if (setjmp(jerr.env)) {
        jpeg_destroy_decompress(&cinfo);
        return 1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), (unsigned long)n);
    if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
        jpeg_destroy_decompress(&cinfo);
        return 1;
    }
    // Decode directly in the requested channel order.
    cinfo.out_color_space = swap_rb ? JCS_RGB : JCS_EXT_BGR;
    if (fast_scale) {
        // smallest M/8 scale (M = 1..8) whose output covers the target in
        // BOTH dims; never upscale-decode (M capped at 8 = full size)
        unsigned m = 8;
        for (unsigned cand = 1; cand < 8; ++cand) {
            unsigned sw = (cinfo.image_width * cand + 7) / 8;
            unsigned sh = (cinfo.image_height * cand + 7) / 8;
            if (sw >= (unsigned)dw && sh >= (unsigned)dh) { m = cand; break; }
        }
        cinfo.scale_num = m;
        cinfo.scale_denom = 8;
    }
    jpeg_start_decompress(&cinfo);
    if (cinfo.output_components != 3) {  // CMYK etc.: let cv2 handle it
        jpeg_abort_decompress(&cinfo);
        jpeg_destroy_decompress(&cinfo);
        return 1;
    }
    const int sw = (int)cinfo.output_width, sh = (int)cinfo.output_height;
    pixels.resize((size_t)sh * sw * 3);
    while (cinfo.output_scanline < cinfo.output_height) {
        JSAMPROW row = pixels.data() + (size_t)cinfo.output_scanline * sw * 3;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    // channel order is already final — resize never swaps here
    resize_dispatch(pixels.data(), sh, sw, dst, dh, dw, /*swap_rb=*/0,
                    hflip);
    return 0;
}

extern "C" int tfy2_jpeg_resize_normalize(const uint8_t* data, int64_t n,
                                          float* dst, int dh, int dw,
                                          int swap_rb, int hflip,
                                          int fast_scale) {
    return jpeg_resize_impl(data, n, dst, dh, dw, swap_rb, hflip,
                            fast_scale);
}

// uint8-output variant for the device-normalize serving path.
extern "C" int tfy2_jpeg_resize_u8(const uint8_t* data, int64_t n,
                                   uint8_t* dst, int dh, int dw, int swap_rb,
                                   int hflip, int fast_scale) {
    return jpeg_resize_impl(data, n, dst, dh, dw, swap_rb, hflip,
                            fast_scale);
}

#else  // !TFY2_WITH_JPEG

extern "C" int tfy2_has_jpeg() { return 0; }

extern "C" int tfy2_jpeg_resize_normalize(const uint8_t*, int64_t, float*,
                                          int, int, int, int, int) {
    return 1;
}

extern "C" int tfy2_jpeg_resize_u8(const uint8_t*, int64_t, uint8_t*, int,
                                   int, int, int, int) {
    return 1;
}

#endif  // TFY2_WITH_JPEG

// ---------------------------------------------------------------------------
// VOC label grid (reference pascal_voc.py:125-165)
// ---------------------------------------------------------------------------

// boxes: (n, 4) float32 x1,y1,x2,y2 ALREADY in resized-image pixel space
// (0-based, clamped) — the XML parse + ratio scaling stays in Python.
// classes: (n,) int32. grid out: (S, S, 5+C) float32, zero-initialized by
// the caller. First object to claim a cell wins, like the reference.
extern "C" void tfy2_label_grid(const float* boxes, const int32_t* classes,
                                int n, int S, int C, float image_size,
                                float* grid) {
    const int ch = 5 + C;
    for (int i = 0; i < n; ++i) {
        float x1 = boxes[(size_t)i * 4 + 0], y1 = boxes[(size_t)i * 4 + 1];
        float x2 = boxes[(size_t)i * 4 + 2], y2 = boxes[(size_t)i * 4 + 3];
        float cx = (x2 + x1) / 2.0f, cy = (y2 + y1) / 2.0f;
        float w = x2 - x1, h = y2 - y1;
        // cell index in double, matching Python's float64 arithmetic
        int x_ind = (int)((double)cx * S / image_size);
        int y_ind = (int)((double)cy * S / image_size);
        if (x_ind < 0 || x_ind >= S || y_ind < 0 || y_ind >= S) continue;
        float* cell = grid + ((size_t)y_ind * S + x_ind) * ch;
        if (cell[0] == 1.0f) continue;  // first object wins
        cell[0] = 1.0f;
        cell[1] = cx; cell[2] = cy; cell[3] = w; cell[4] = h;
        int c = classes[i];
        if (c >= 0 && c < C) cell[5 + c] = 1.0f;
    }
}

// ---------------------------------------------------------------------------
// Greedy NMS (host serving post-process)
// ---------------------------------------------------------------------------

static inline float iou_corners(const float* a, const float* b) {
    float ix1 = std::max(a[0], b[0]), iy1 = std::max(a[1], b[1]);
    float ix2 = std::min(a[2], b[2]), iy2 = std::min(a[3], b[3]);
    float iw = std::max(ix2 - ix1, 0.0f), ih = std::max(iy2 - iy1, 0.0f);
    float inter = iw * ih;
    float ua = std::max((a[2] - a[0]) * (a[3] - a[1]), 0.0f) +
               std::max((b[2] - b[0]) * (b[3] - b[1]), 0.0f) - inter;
    return ua > 0.0f ? inter / ua : 0.0f;
}

// boxes: (n,4) x1y1x2y2; scores: (n,); classes: (n,) int32.
// keep_idx: out, caller-allocated, capacity max_keep. Returns kept count.
// Ties in score break by lower index (matches stable argsort of -scores).
extern "C" int tfy2_nms(const float* boxes, const float* scores,
                        const int32_t* classes, int n, float iou_thresh,
                        int class_aware, float score_thresh,
                        int max_keep, int32_t* keep_idx) {
    std::vector<int> order((size_t)n);
    for (int i = 0; i < n; ++i) order[(size_t)i] = i;
    std::stable_sort(order.begin(), order.end(), [&](int a, int b) {
        return scores[a] > scores[b];
    });
    std::vector<char> alive((size_t)n, 1);
    int kept = 0;
    for (int oi = 0; oi < n && kept < max_keep; ++oi) {
        int i = order[(size_t)oi];
        if (!alive[(size_t)oi] || scores[i] <= score_thresh) continue;
        keep_idx[kept++] = i;
        for (int oj = oi + 1; oj < n; ++oj) {
            if (!alive[(size_t)oj]) continue;
            int j = order[(size_t)oj];
            if (class_aware && classes[i] != classes[j]) continue;
            if (iou_corners(boxes + (size_t)i * 4,
                            boxes + (size_t)j * 4) > iou_thresh)
                alive[(size_t)oj] = 0;
        }
    }
    return kept;
}
