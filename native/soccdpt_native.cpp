// soccdpt_native: C++ host-side data-pipeline kernels.
//
// The reference's host pipeline is Python/numpy/cv2 (SURVEY.md §2.4):
// per-color mask comparisons (bengaluru_driving_dataset.py:67-76),
// np.add.at voxelization (bdd_helper.py:319-337), and cv2 resize +
// normalize per frame. These are the CPU-side hot loops that feed the
// TPU; here they are C-ABI kernels (OpenMP-parallel where profitable)
// exposed to Python via ctypes (soccdpt_tpu/native/__init__.py), with
// numpy fallbacks when the shared library is unavailable.
//
// Build: make -C native   (g++ -O3 -march=native -fopenmp -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// RGB color table -> class-id map.
// seg:    (H*W, 3) uint8 interleaved
// colors: (num_classes, 3) uint8
// out:    (H*W,) int32 (0 where no color matches)
void rgb_to_class(const uint8_t* seg, int64_t n_px, const uint8_t* colors,
                  int32_t num_classes, int32_t* out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n_px; ++i) {
    const uint8_t r = seg[3 * i], g = seg[3 * i + 1], b = seg[3 * i + 2];
    int32_t cls = 0;
    for (int32_t c = 0; c < num_classes; ++c) {
      if (colors[3 * c] == r && colors[3 * c + 1] == g &&
          colors[3 * c + 2] == b) {
        cls = c;
        break;
      }
    }
    out[i] = cls;
  }
}

// RGB color table -> boolean per-class masks (H*W, C), row-major.
void rgb_to_bool_masks(const uint8_t* seg, int64_t n_px,
                       const uint8_t* colors, int32_t num_classes,
                       uint8_t* out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n_px; ++i) {
    const uint8_t r = seg[3 * i], g = seg[3 * i + 1], b = seg[3 * i + 2];
    for (int32_t c = 0; c < num_classes; ++c) {
      out[i * num_classes + c] =
          (colors[3 * c] == r && colors[3 * c + 1] == g &&
           colors[3 * c + 2] == b)
              ? 1
              : 0;
    }
  }
}

// Semantic point voxelization: the GT pipeline's np.add.at
// (reference bdd_helper.py:319-337) with the same strict in-bounds
// test (0 < ijk < grid).
// points:    (N, 3) float32 meters
// semantics: (N,) int32 class ids in [0, num_classes)
// grid:      (gx, gy, gz, num_classes) float32, caller-zeroed
void voxelize_points(const float* points, const int32_t* semantics,
                     int64_t n_points, const float* occupancy_shape,
                     int32_t gx, int32_t gy, int32_t gz,
                     int32_t num_classes, float* grid) {
  const float sx = (float)gx / occupancy_shape[0];
  const float sy = (float)gy / occupancy_shape[1];
  const float sz = (float)gz / occupancy_shape[2];
  for (int64_t i = 0; i < n_points; ++i) {
    const float x = points[3 * i], y = points[3 * i + 1], z = points[3 * i + 2];
    if (!std::isfinite(x) || !std::isfinite(y) || !std::isfinite(z)) continue;
    const int32_t ix = (int32_t)(x * sx);
    const int32_t iy = (int32_t)(y * sy);
    const int32_t iz = (int32_t)(z * sz);
    if (ix <= 0 || ix >= gx || iy <= 0 || iy >= gy || iz <= 0 || iz >= gz)
      continue;
    const int32_t c = semantics[i];
    if (c < 0 || c >= num_classes) continue;
    grid[(((int64_t)ix * gy + iy) * gz + iz) * num_classes + c] += 1.0f;
  }
}

// Fused uint8 HWC -> normalized float32 CHW with bilinear resize:
// the per-frame preprocessing hot path (resize + (x/255 - mean)/std +
// transpose in one pass; reference does three numpy/cv2 passes,
// transforms.py:179-251).
void resize_normalize_chw(const uint8_t* img, int32_t in_h, int32_t in_w,
                          int32_t out_h, int32_t out_w, const float* mean,
                          const float* std_, float* out) {
  const float scale_h = (float)in_h / out_h;
  const float scale_w = (float)in_w / out_w;
  const float inv255 = 1.0f / 255.0f;
  const int64_t plane = (int64_t)out_h * out_w;
#pragma omp parallel for schedule(static)
  for (int32_t oy = 0; oy < out_h; ++oy) {
    const float sy = std::min(std::max((oy + 0.5f) * scale_h - 0.5f, 0.0f),
                              (float)(in_h - 1));
    const int32_t y0 = (int32_t)sy;
    const int32_t y1 = std::min(y0 + 1, in_h - 1);
    const float wy = sy - y0;
    for (int32_t ox = 0; ox < out_w; ++ox) {
      const float sx = std::min(std::max((ox + 0.5f) * scale_w - 0.5f, 0.0f),
                                (float)(in_w - 1));
      const int32_t x0 = (int32_t)sx;
      const int32_t x1 = std::min(x0 + 1, in_w - 1);
      const float wx = sx - x0;
      for (int32_t c = 0; c < 3; ++c) {
        const float v00 = img[((int64_t)y0 * in_w + x0) * 3 + c];
        const float v01 = img[((int64_t)y0 * in_w + x1) * 3 + c];
        const float v10 = img[((int64_t)y1 * in_w + x0) * 3 + c];
        const float v11 = img[((int64_t)y1 * in_w + x1) * 3 + c];
        const float v = (1 - wy) * ((1 - wx) * v00 + wx * v01) +
                        wy * ((1 - wx) * v10 + wx * v11);
        out[(int64_t)c * plane + (int64_t)oy * out_w + ox] =
            (v * inv255 - mean[c]) / std_[c];
      }
    }
  }
}

// Pinhole unprojection (reference bdd_helper.py:457-469): depth (H, W)
// -> points (H*W, 3); X=(v-cx)Z/fx, Y=(u-cy)Z/fy.
void unproject_depth(const float* depth, int32_t h, int32_t w, float fx,
                     float fy, float cx, float cy, float* points) {
#pragma omp parallel for schedule(static)
  for (int32_t u = 0; u < h; ++u) {
    for (int32_t v = 0; v < w; ++v) {
      const float z = depth[(int64_t)u * w + v];
      const int64_t i = (int64_t)u * w + v;
      points[3 * i] = (v - cx) * z / fx;
      points[3 * i + 1] = (u - cy) * z / fy;
      points[3 * i + 2] = z;
    }
  }
}

int32_t soccdpt_native_version() { return 1; }

}  // extern "C"
