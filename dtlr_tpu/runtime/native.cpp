// DTLR-TPU native runtime kernels (host side).
//
// The TPU does the model math; the single-core host must keep up with
// data preparation and corpus metrics. These are the host hot paths,
// replacing the reference's dependency on editdistance (C extension)
// and PIL resize round-trips:
//   - levenshtein / edit-op backtrace over uint32 token sequences
//     (reference evaluation.py:242-334 uses python editdistance + DP)
//   - bilinear resize for float32 HWC images (datasets/transforms.py
//     RandomResize equivalent)
//   - ImageNet normalize + pad-into-batch in one pass (collate)
//
// Built as a shared library via `make` (see Makefile); loaded with
// ctypes from native.py which falls back to numpy implementations.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Levenshtein distance between two uint32 sequences.
int64_t levenshtein_u32(const uint32_t* a, int64_t n, const uint32_t* b, int64_t m) {
    if (n == 0) return m;
    if (m == 0) return n;
    std::vector<int64_t> prev(m + 1), cur(m + 1);
    for (int64_t j = 0; j <= m; ++j) prev[j] = j;
    for (int64_t i = 1; i <= n; ++i) {
        cur[0] = i;
        const uint32_t ca = a[i - 1];
        for (int64_t j = 1; j <= m; ++j) {
            const int64_t sub = prev[j - 1] + (ca != b[j - 1]);
            cur[j] = std::min(std::min(prev[j] + 1, cur[j - 1] + 1), sub);
        }
        std::swap(prev, cur);
    }
    return prev[m];
}

// Edit-operation counts (substitutions, deletions-from-gt, insertions)
// via full DP + backtrace. pred=a (len n), gt=b (len m). Writes 3 int64s.
void edit_ops_u32(const uint32_t* a, int64_t n, const uint32_t* b, int64_t m,
                  int64_t* out) {
    std::vector<int32_t> dp((n + 1) * (m + 1));
    auto at = [&](int64_t i, int64_t j) -> int32_t& { return dp[i * (m + 1) + j]; };
    for (int64_t i = 0; i <= n; ++i) at(i, 0) = (int32_t)i;
    for (int64_t j = 0; j <= m; ++j) at(0, j) = (int32_t)j;
    for (int64_t i = 1; i <= n; ++i)
        for (int64_t j = 1; j <= m; ++j) {
            const int32_t c = a[i - 1] != b[j - 1];
            at(i, j) = std::min(std::min(at(i - 1, j) + 1, at(i, j - 1) + 1),
                                at(i - 1, j - 1) + c);
        }
    int64_t i = n, j = m, subs = 0, dels = 0, ins = 0;
    while (i > 0 || j > 0) {
        if (i > 0 && j > 0 && at(i, j) == at(i - 1, j - 1) + (a[i - 1] != b[j - 1])) {
            subs += (a[i - 1] != b[j - 1]);
            --i; --j;
        } else if (j > 0 && at(i, j) == at(i, j - 1) + 1) {
            ++dels; --j;
        } else {
            ++ins; --i;
        }
    }
    out[0] = subs; out[1] = dels; out[2] = ins;
}

// Bilinear resize float32 HWC -> HWC (torchvision/PIL convention:
// align_corners=false, edge-clamped).
void resize_bilinear_f32(const float* src, int64_t sh, int64_t sw, int64_t c,
                         float* dst, int64_t dh, int64_t dw) {
    const double fy = (double)sh / dh;
    const double fx = (double)sw / dw;
    for (int64_t y = 0; y < dh; ++y) {
        double syf = (y + 0.5) * fy - 0.5;
        if (syf < 0) syf = 0;
        int64_t y0 = (int64_t)syf;
        int64_t y1 = std::min(y0 + 1, sh - 1);
        const float wy = (float)(syf - y0);
        for (int64_t x = 0; x < dw; ++x) {
            double sxf = (x + 0.5) * fx - 0.5;
            if (sxf < 0) sxf = 0;
            int64_t x0 = (int64_t)sxf;
            int64_t x1 = std::min(x0 + 1, sw - 1);
            const float wx = (float)(sxf - x0);
            const float* p00 = src + (y0 * sw + x0) * c;
            const float* p01 = src + (y0 * sw + x1) * c;
            const float* p10 = src + (y1 * sw + x0) * c;
            const float* p11 = src + (y1 * sw + x1) * c;
            float* out = dst + (y * dw + x) * c;
            for (int64_t k = 0; k < c; ++k) {
                const float top = p00[k] + (p01[k] - p00[k]) * wx;
                const float bot = p10[k] + (p11[k] - p10[k]) * wx;
                out[k] = top + (bot - top) * wy;
            }
        }
    }
}

// ImageNet-normalize src (h, w, 3) and write into dst (H, W, 3) at (0,0).
void normalize_into_f32(const float* src, int64_t h, int64_t w,
                        float* dst, int64_t H, int64_t W,
                        const float* mean, const float* stdv) {
    for (int64_t y = 0; y < h; ++y) {
        const float* srow = src + y * w * 3;
        float* drow = dst + y * W * 3;
        for (int64_t x = 0; x < w; ++x) {
            for (int64_t k = 0; k < 3; ++k) {
                drow[x * 3 + k] = (srow[x * 3 + k] - mean[k]) / stdv[k];
            }
        }
    }
}

}  // extern "C"
