// Native terrain-generation kernels (host-side, construction time).
//
// TPU-native counterpart of the construction-time work the reference
// delegates to Isaac Gym's native runtime (terrain trimesh assembly,
// ref barrier_track.py:395-410 -> gym.add_triangle_mesh): our terrain stays
// a heightfield, and its hot loop is fractal Perlin interpolation over
// O(rows*cols*track_cells) grid cells per octave. Randomness stays in
// numpy (the gradient-angle grid is an input), so the C++ path is
// bit-deterministic and numerically identical to the numpy fallback.
//
// Build: python -m mqe_tpu.native.build   (g++ -O3 -march=native -fopenmp)
// Binding: ctypes (no pybind11 in this image).

#include <cmath>
#include <cstdint>

extern "C" {

// Single-octave gradient (Perlin) noise.
//   angles: (rx+1) x (ry+1) row-major gradient angles [rad]
//   out:    H x W row-major, H % rx == 0, W % ry == 0
// Matches mqe_tpu/terrain/perlin.py::perlin_noise_2d exactly (float64).
void perlin_octave(const double* angles, int64_t rx, int64_t ry,
                   int64_t H, int64_t W, double* out) {
  const int64_t d0 = H / rx;
  const int64_t d1 = W / ry;
  const double inv_d0 = 1.0 / static_cast<double>(d0);
  const double inv_d1 = 1.0 / static_cast<double>(d1);
  const double root2_half = 0.5 * std::sqrt(2.0);

#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < H; ++i) {
    const int64_t ci = i / d0;                       // gradient cell row
    const double u = static_cast<double>(i % d0) * inv_d0;   // frac coord
    const double fu = u * u * u * (u * (u * 6.0 - 15.0) + 10.0);
    const double a_row0 = 0.0;                        // silence unused warn
    (void)a_row0;
    const double* ang0 = angles + ci * (ry + 1);
    const double* ang1 = angles + (ci + 1) * (ry + 1);
    double* row = out + i * W;
    for (int64_t j = 0; j < W; ++j) {
      const int64_t cj = j / d1;
      const double v = static_cast<double>(j % d1) * inv_d1;
      const double fv = v * v * v * (v * (v * 6.0 - 15.0) + 10.0);
      const double a00 = ang0[cj], a10 = ang1[cj];
      const double a01 = ang0[cj + 1], a11 = ang1[cj + 1];
      // dot products with corner gradients
      const double n00 = u * std::cos(a00) + v * std::sin(a00);
      const double n10 = (u - 1.0) * std::cos(a10) + v * std::sin(a10);
      const double n01 = u * std::cos(a01) + (v - 1.0) * std::sin(a01);
      const double n11 = (u - 1.0) * std::cos(a11) + (v - 1.0) * std::sin(a11);
      const double n0 = n00 * (1.0 - fu) + fu * n10;
      const double n1 = n01 * (1.0 - fu) + fu * n11;
      row[j] = root2_half * ((1.0 - fv) * n0 + fv * n1) + 0.5;
    }
  }
}

// Fused fractal accumulation: out += amplitude * zScale * octave(...), with
// the octave computed on a padded grid and cropped to (H, W).
//   padH/padW: padded sizes divisible by rx/ry (padH >= H).
//   scratch: padH x padW workspace.
void perlin_octave_accumulate(const double* angles, int64_t rx, int64_t ry,
                              int64_t padH, int64_t padW, int64_t H, int64_t W,
                              double amp_z, double* scratch, double* out) {
  perlin_octave(angles, rx, ry, padH, padW, scratch);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < H; ++i) {
    const double* srow = scratch + i * padW;
    double* orow = out + i * W;
    for (int64_t j = 0; j < W; ++j) orow[j] += amp_z * srow[j];
  }
}

}  // extern "C"
