// Native host-side preprocessing kernels for mofa_tpu.
//
// The reference's only native code is CUDA (softsplat — rebuilt as Pallas);
// its host preprocessing is pure Python/numpy. For production serving the
// per-request host path (trajectory rasterization, watershed NMS, neighbor
// elimination, PCHIP resampling) runs here as a small C++ library bound via
// ctypes (mofa_tpu/native.py), with the numpy implementations as fallback
// and as the correctness oracle (tests/test_native.py).
//
// Build: g++ -O3 -march=native -shared -fPIC mofa_host.cpp -o libmofa_host.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

extern "C" {

// Trajectory rasterization (ops/rasterize.py rasterize_trajectories):
// tracks [K, n_steps+1, 2] (x, y); accumulate integer displacement of each
// track at its integer start pixel, per step; overlaps SUM.
void rasterize_tracks(const double* tracks, int64_t K, int64_t n_steps,
                      int64_t H, int64_t W, int backward,
                      double* flow /* [n_steps, H, W, 2] */,
                      double* mask /* [n_steps, H, W] */) {
  const double sign = backward ? -1.0 : 1.0;
  std::memset(flow, 0, sizeof(double) * n_steps * H * W * 2);
  std::memset(mask, 0, sizeof(double) * n_steps * H * W);
  for (int64_t k = 0; k < K; ++k) {
    const double sx = tracks[k * (n_steps + 1) * 2 + 0];
    const double sy = tracks[k * (n_steps + 1) * 2 + 1];
    const int64_t col = (int64_t)sx;
    const int64_t row = (int64_t)sy;
    if (row < 0 || row >= H || col < 0 || col >= W) continue;
    for (int64_t i = 0; i < n_steps; ++i) {
      const double ex = tracks[(k * (n_steps + 1) + 1 + i) * 2 + 0];
      const double ey = tracks[(k * (n_steps + 1) + 1 + i) * 2 + 1];
      // reference casts the displacement to int64 before accumulating
      const int64_t fx = (int64_t)(ex - sx);
      const int64_t fy = (int64_t)(ey - sy);
      double* cell = flow + ((i * H + row) * W + col) * 2;
      cell[0] += sign * (double)fx;
      cell[1] += sign * (double)fy;
      mask[(i * H + row) * W + col] += 1.0;
    }
  }
}

// Square-footprint non-maximum suppression (flow_sampler square_nms):
// zero out entries below the ks x ks local max.
void square_nms(const float* score, int64_t h, int64_t w, int64_t ks,
                float* out) {
  const int64_t r = ks / 2;
  for (int64_t i = 0; i < h; ++i) {
    const int64_t i0 = std::max<int64_t>(0, i - r);
    const int64_t i1 = std::min<int64_t>(h - 1, i + r);
    for (int64_t j = 0; j < w; ++j) {
      const int64_t j0 = std::max<int64_t>(0, j - r);
      const int64_t j1 = std::min<int64_t>(w - 1, j + r);
      float m = -1e30f;
      for (int64_t a = i0; a <= i1; ++a)
        for (int64_t b = j0; b <= j1; ++b)
          m = std::max(m, score[a * w + b]);
      const float v = score[i * w + j];
      out[i * w + j] = (v < m) ? 0.0f : v;
    }
  }
}

// Randomized neighbor elimination (flow_sampler eliminate_neighbors):
// for each close pair, drop one side chosen by the caller-provided
// coin-flip sequence (keeps Python/C++ behavior bit-identical).
void neighbor_elim(const int64_t* rows, const int64_t* cols, int64_t n,
                   double d, const float* coins /* >= n*n flips */,
                   uint8_t* keep /* [n] out */) {
  std::fill(keep, keep + n, (uint8_t)1);
  int64_t flip = 0;
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t j = 0; j < n; ++j) {
      if (std::fabs((double)(rows[i] - rows[j])) < d &&
          std::fabs((double)(cols[i] - cols[j])) < d) {
        if (keep[i] && keep[j] && i != j) {
          if (coins[flip] > 0.5f) keep[i] = 0; else keep[j] = 0;
        }
        ++flip;
      }
    }
  }
}

// PCHIP slope computation (ops/trajectory.py _pchip_derivatives):
// monotone cubic Hermite derivatives for strictly increasing x.
void pchip_derivatives(const double* x, const double* y, int64_t n,
                       double* d /* [n] out */) {
  if (n == 1) { d[0] = 0.0; return; }
  std::vector<double> h(n - 1), del(n - 1);
  for (int64_t i = 0; i < n - 1; ++i) {
    h[i] = x[i + 1] - x[i];
    del[i] = (y[i + 1] - y[i]) / h[i];
  }
  if (n == 2) { d[0] = d[1] = del[0]; return; }
  for (int64_t i = 1; i < n - 1; ++i) {
    if (del[i - 1] * del[i] <= 0.0) {
      d[i] = 0.0;
    } else {
      const double w1 = 2.0 * h[i] + h[i - 1];
      const double w2 = h[i] + 2.0 * h[i - 1];
      d[i] = (w1 + w2) / (w1 / del[i - 1] + w2 / del[i]);
    }
  }
  // one-sided three-point edge derivatives with monotonicity clamps
  auto edge = [](double h0, double h1, double d0, double d1) {
    double dd = ((2.0 * h0 + h1) * d0 - h0 * d1) / (h0 + h1);
    if (dd * d0 <= 0.0) dd = 0.0;
    else if (d0 * d1 <= 0.0 && std::fabs(dd) > std::fabs(3.0 * d0))
      dd = 3.0 * d0;
    return dd;
  };
  d[0] = edge(h[0], h[1], del[0], del[1]);
  d[n - 1] = edge(h[n - 2], h[n - 3], del[n - 2], del[n - 3]);
}

}  // extern "C"
