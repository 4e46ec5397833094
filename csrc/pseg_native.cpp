// Native host-side data-loader kernels for pytorch_segmentation_tpu.
//
// TPU-native replacement for the C++ that entered the reference through
// OpenCV (cv2.fillPoly polygon rasterization, utils/datasets.py:301;
// color->class-id mapping, utils/datasets.py:253-255; image resizing,
// utils/datasets.py:166-184). The TPU does the math-heavy augmentation;
// these cover the host decode/rasterize path feeding it, OpenMP-parallel
// over rows for multi-core hosts.
//
// Build: g++ -O3 -march=native -shared -fPIC -fopenmp pseg_native.cpp
// ABI: plain C functions, bound via ctypes (pytorch_segmentation_tpu/_native.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Even-odd scanline polygon fill with boundary, matching cv2.fillPoly's
// pixel-center convention. pts: [n][2] float (x, y).
void fill_polygon(uint8_t* mask, int h, int w, const float* pts, int n,
                  uint8_t value) {
    if (n < 3) return;
    float ymin = pts[1], ymax = pts[1];
    for (int i = 1; i < n; ++i) {
        ymin = std::min(ymin, pts[2 * i + 1]);
        ymax = std::max(ymax, pts[2 * i + 1]);
    }
    int y0 = std::max(0, (int)std::floor(ymin));
    int y1 = std::min(h - 1, (int)std::ceil(ymax));

#pragma omp parallel for schedule(static) if (y1 - y0 > 64)
    for (int row = y0; row <= y1; ++row) {
        float xs[64];
        std::vector<float> xs_dyn;
        float* xbuf = xs;
        int nx = 0;
        bool use_dyn = n > 64;
        if (use_dyn) {
            xs_dyn.resize(n);
            xbuf = xs_dyn.data();
        }
        for (int i = 0; i < n; ++i) {
            float ax = pts[2 * i], ay = pts[2 * i + 1];
            int j = (i + 1) % n;
            float bx = pts[2 * j], by = pts[2 * j + 1];
            if ((ay <= row && by > row) || (by <= row && ay > row)) {
                xbuf[nx++] = ax + (row - ay) * (bx - ax) / (by - ay);
            }
        }
        std::sort(xbuf, xbuf + nx);
        for (int i = 0; i + 1 < nx; i += 2) {
            int a = std::max(0, (int)std::ceil(xbuf[i]));
            int b = std::min(w - 1, (int)std::floor(xbuf[i + 1]));
            if (a <= b) memset(mask + (size_t)row * w + a, value, b - a + 1);
        }
    }

    // boundary (cv2.fillPoly draws the outline)
    for (int i = 0; i < n; ++i) {
        float ax = pts[2 * i], ay = pts[2 * i + 1];
        int j = (i + 1) % n;
        float bx = pts[2 * j], by = pts[2 * j + 1];
        int steps = (int)std::max(std::fabs(bx - ax), std::fabs(by - ay)) + 1;
        for (int s = 0; s <= steps; ++s) {
            float t = (float)s / steps;
            int x = (int)std::lround(ax + t * (bx - ax));
            int y = (int)std::lround(ay + t * (by - ay));
            if (x >= 0 && x < w && y >= 0 && y < h)
                mask[(size_t)y * w + x] = value;
        }
    }
}

// BGR color image -> class-id mask via colormap table (first match wins in
// reverse order like the reference's sequential overwrite loop:
// later colormap entries overwrite earlier ones, so scan from the end).
void map_colors(const uint8_t* img, int h, int w, const uint8_t* colormap,
                int n_colors, uint8_t* out) {
#pragma omp parallel for schedule(static)
    for (int y = 0; y < h; ++y) {
        const uint8_t* row = img + (size_t)y * w * 3;
        uint8_t* orow = out + (size_t)y * w;
        for (int x = 0; x < w; ++x) {
            const uint8_t* p = row + 3 * x;
            uint8_t id = 0;
            for (int c = n_colors - 1; c >= 0; --c) {
                const uint8_t* cc = colormap + 3 * c;
                if (p[0] == cc[0] && p[1] == cc[1] && p[2] == cc[2]) {
                    id = (uint8_t)c;
                    break;
                }
            }
            orow[x] = id;
        }
    }
}

// Nearest resize, uint8, C channels (masks: c=1).
void resize_nearest_u8(const uint8_t* src, int sh, int sw, int c,
                       uint8_t* dst, int dh, int dw) {
#pragma omp parallel for schedule(static)
    for (int y = 0; y < dh; ++y) {
        int sy = std::min((int)((int64_t)y * sh / dh), sh - 1);
        for (int x = 0; x < dw; ++x) {
            int sx = std::min((int)((int64_t)x * sw / dw), sw - 1);
            memcpy(dst + ((size_t)y * dw + x) * c,
                   src + ((size_t)sy * sw + sx) * c, c);
        }
    }
}

// Bilinear resize, uint8, C channels (half-pixel centers like cv2/torch
// align_corners=False).
void resize_bilinear_u8(const uint8_t* src, int sh, int sw, int c,
                        uint8_t* dst, int dh, int dw) {
#pragma omp parallel for schedule(static)
    for (int y = 0; y < dh; ++y) {
        float fy = ((float)y + 0.5f) * sh / dh - 0.5f;
        fy = std::max(0.0f, std::min(fy, (float)sh - 1));
        int y0 = (int)fy;
        int y1 = std::min(y0 + 1, sh - 1);
        float wy = fy - y0;
        for (int x = 0; x < dw; ++x) {
            float fx = ((float)x + 0.5f) * sw / dw - 0.5f;
            fx = std::max(0.0f, std::min(fx, (float)sw - 1));
            int x0 = (int)fx;
            int x1 = std::min(x0 + 1, sw - 1);
            float wx = fx - x0;
            for (int ch = 0; ch < c; ++ch) {
                float v00 = src[((size_t)y0 * sw + x0) * c + ch];
                float v01 = src[((size_t)y0 * sw + x1) * c + ch];
                float v10 = src[((size_t)y1 * sw + x0) * c + ch];
                float v11 = src[((size_t)y1 * sw + x1) * c + ch];
                float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                          v10 * wy * (1 - wx) + v11 * wy * wx;
                dst[((size_t)y * dw + x) * c + ch] =
                    (uint8_t)std::lround(std::max(0.0f, std::min(v, 255.0f)));
            }
        }
    }
}

}  // extern "C"
