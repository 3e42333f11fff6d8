// Native host-side data-path kernels (C ABI, loaded via ctypes).
//
// The reference implements its data-path hot ops natively
// (roiaware_pool3d points_in_boxes CUDA/C++ for GT-database creation,
// the CUDA feature_decorator, and torch C++ dataloader workers). On the
// TPU host the analogous hot loops are the per-sample pipeline steps
// below; each has a numpy fallback in bevfusion_tpu/native/__init__.py.
//
// Build: g++ -O3 -march=native -shared -fPIC host_ops.cpp -o libhost_ops.so

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Transform sweep points into the keyframe frame and set the time-lag
// channel: out[:, :3] = pts[:, :3] @ R^T + t ; out[:, 3] copied;
// out[:, 4] = time_lag.  pts: [n, dim] float32 row-major.
void transform_sweep_points(const float* pts, int64_t n, int64_t dim,
                            const float* rot /*3x3 row-major*/,
                            const float* trans /*3*/, float time_lag,
                            float* out) {
  for (int64_t i = 0; i < n; ++i) {
    const float* p = pts + i * dim;
    float* o = out + i * dim;
    const float x = p[0], y = p[1], z = p[2];
    o[0] = rot[0] * x + rot[1] * y + rot[2] * z + trans[0];
    o[1] = rot[3] * x + rot[4] * y + rot[5] * z + trans[1];
    o[2] = rot[6] * x + rot[7] * y + rot[8] * z + trans[2];
    for (int64_t c = 3; c < dim; ++c) o[c] = p[c];
    if (dim >= 5) o[4] = time_lag;
  }
}

// Point-in-rotated-box test (bottom-center boxes [x y z dx dy dz yaw]).
// points [P, pdim] (first 3 used), boxes [N, 7] -> mask [P, N] uint8.
void points_in_rbbox(const float* points, int64_t P, int64_t pdim,
                     const float* boxes, int64_t N, uint8_t* mask) {
  for (int64_t b = 0; b < N; ++b) {
    const float* bx = boxes + b * 7;
    const float c = std::cos(-bx[6]), s = std::sin(-bx[6]);
    const float hx = bx[3] * 0.5f, hy = bx[4] * 0.5f, dz = bx[5];
    for (int64_t i = 0; i < P; ++i) {
      const float* p = points + i * pdim;
      const float dxp = p[0] - bx[0], dyp = p[1] - bx[1], dzp = p[2] - bx[2];
      const float lx = dxp * c - dyp * s;
      const float ly = dxp * s + dyp * c;
      mask[i * N + b] =
          (std::fabs(lx) <= hx) && (std::fabs(ly) <= hy) &&
          (dzp >= 0.f) && (dzp <= dz);
    }
  }
}

// Filter points to a 3D range in-place-compactly; returns kept count.
int64_t filter_points_range(const float* pts, int64_t n, int64_t dim,
                            const float* pcr /*6*/, float* out) {
  int64_t k = 0;
  for (int64_t i = 0; i < n; ++i) {
    const float* p = pts + i * dim;
    if (p[0] > pcr[0] && p[1] > pcr[1] && p[2] > pcr[2] &&
        p[0] < pcr[3] && p[1] < pcr[4] && p[2] < pcr[5]) {
      std::memcpy(out + k * dim, p, sizeof(float) * dim);
      ++k;
    }
  }
  return k;
}

// Rasterize lidar points into per-camera sparse depth images (the
// GTDepth step): one image per camera, keep min distance per pixel.
// uv [N, P, 2] (col, row) float32; dist [N, P]; valid computed here.
void raster_depth_min(const float* uv, const float* dist, int64_t N,
                      int64_t P, int64_t H, int64_t W, float* depth) {
  for (int64_t i = 0; i < N * H * W; ++i) depth[i] = 0.f;
  for (int64_t n = 0; n < N; ++n) {
    float* img = depth + n * H * W;
    const float* puv = uv + n * P * 2;
    const float* pd = dist + n * P;
    for (int64_t i = 0; i < P; ++i) {
      const float u = puv[i * 2], v = puv[i * 2 + 1], d = pd[i];
      if (d <= 0.f || u < 0.f || v < 0.f || u >= (float)W || v >= (float)H)
        continue;
      float* cell = img + (int64_t)v * W + (int64_t)u;
      if (*cell == 0.f || d < *cell) *cell = d;
    }
  }
}

}  // extern "C"
