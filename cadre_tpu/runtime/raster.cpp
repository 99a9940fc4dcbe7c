// Native route-ribbon rasterizer — the host env's hot 10 Hz op.
//
// Drop-in for the numpy disk-stamping path in
// cadre_tpu/envs/route_fig.py::rasterize_polyline (same ribbon semantics:
// every pixel within line_width/2 of the polyline is set to 255). Walks
// each segment at sub-pixel steps stamping a precomputed disk span table —
// O(polyline length x width) with no per-segment allocation.
//
// Build: g++ -O2 -std=c++17 -shared -fPIC raster.cpp -o libraster.so
// (driven by cadre_tpu/runtime/native_raster.py).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// points: [n][2] float64 (x, y) pixel coords; out: [height*width] uint8.
void raster_polyline(const double* points, int64_t n_points, int64_t height,
                     int64_t width, double line_width, uint8_t* out) {
  std::memset(out, 0, static_cast<size_t>(height * width));
  if (n_points < 2) return;
  const double half = line_width / 2.0;
  const int r = static_cast<int>(std::ceil(half));

  // span table: for each dy in [-r, r], the half-extent in x
  std::vector<int> span(2 * r + 1);
  for (int dy = -r; dy <= r; ++dy) {
    const double rem = half * half - static_cast<double>(dy) * dy;
    span[dy + r] = rem >= 0 ? static_cast<int>(std::floor(std::sqrt(rem)))
                            : -1;
  }

  auto stamp = [&](double cx, double cy) {
    const int iy = static_cast<int>(std::lround(cy));
    const int ix = static_cast<int>(std::lround(cx));
    for (int dy = -r; dy <= r; ++dy) {
      const int s = span[dy + r];
      if (s < 0) continue;
      const int y = iy + dy;
      if (y < 0 || y >= height) continue;
      int x0 = ix - s, x1 = ix + s;
      if (x0 < 0) x0 = 0;
      if (x1 >= width) x1 = static_cast<int>(width) - 1;
      if (x0 > x1) continue;
      std::memset(out + static_cast<int64_t>(y) * width + x0, 255,
                  static_cast<size_t>(x1 - x0 + 1));
    }
  };

  const double step = 1.5;  // stamp spacing (matches the numpy path)
  stamp(points[0], points[1]);
  for (int64_t i = 0; i + 1 < n_points; ++i) {
    const double ax = points[2 * i], ay = points[2 * i + 1];
    const double bx = points[2 * i + 2], by = points[2 * i + 3];
    const double dx = bx - ax, dy = by - ay;
    const double len = std::sqrt(dx * dx + dy * dy);
    const int n = len > step ? static_cast<int>(len / step) : 1;
    for (int k = 1; k <= n; ++k) {
      const double t = static_cast<double>(k) / n;
      stamp(ax + t * dx, ay + t * dy);
    }
  }
}

}  // extern "C"
