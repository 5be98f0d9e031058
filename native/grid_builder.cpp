// Reference-exact nested quadrature-grid builder (host-side native).
//
// C++ re-implementation of the semantics of the reference's recursive
// numba grid builder (`utils/calc_integral/create_grids.py:5-239`) for the
// bivariate case the reference actually supports:
//   * outer dimension: every x in [box_min, box_max] (inclusive both ends,
//     `create_grids.py:127`);
//   * inner dimension: x > dyn_lower and x <= dyn_upper, where
//     dyn_upper = (upper - x_outer * w[1]) / w[0] (unclamped) and
//     dyn_lower = max((lower - x_outer * w[1]) / w[0], box_min)
//     (`create_grids.py:102-110`, `integration_algo.py:5-20`);
//   * per-state-combination delta products with the ROTATED density-row
//     indexing: grid dim d weights with densities[(d-1) mod 2]
//     (`create_grids.py:121,143`).
//
// Exposed with a plain C ABI for ctypes. Used as (a) the native host path
// for CPU-only deployments and (b) an independent oracle in tests.

#include <algorithm>
#include <cstdint>

extern "C" {

// Count rows the ragged grid will have (for exact-size allocation).
int64_t nested_grid_rows_2d(const double* x, int64_t n, double lower,
                            double upper, const double* weights,
                            double box_min, double box_max) {
    int64_t rows = 0;
    for (int64_t i = 0; i < n; ++i) {
        const double xo = x[i];
        if (xo < box_min || xo > box_max) continue;
        const double dyn_up = (upper - xo * weights[1]) / weights[0];
        double dyn_lo = (lower - xo * weights[1]) / weights[0];
        dyn_lo = std::max(dyn_lo, box_min);
        for (int64_t j = 0; j < n; ++j) {
            if (x[j] > dyn_lo && x[j] <= dyn_up) ++rows;
        }
    }
    return rows;
}

// Build the ragged grid and delta products.
//   x, dx:       (n,) shared 1-D grid and step sizes
//   densities:   (2, q, n) row-major
//   params:      (L, 2) row-major state-index combinations
//   grids_out:   (rows, 2) row-major
//   delta_out:   (rows, L) row-major
// Returns the number of rows written (== nested_grid_rows_2d).
int64_t build_nested_grid_2d(const double* x, const double* dx, int64_t n,
                             const double* densities, int64_t q,
                             const int64_t* params, int64_t L, double lower,
                             double upper, const double* weights,
                             double box_min, double box_max,
                             double* grids_out, double* delta_out) {
    int64_t r = 0;
    for (int64_t i = 0; i < n; ++i) {
        const double xo = x[i];
        if (xo < box_min || xo > box_max) continue;
        const double dyn_up = (upper - xo * weights[1]) / weights[0];
        double dyn_lo = (lower - xo * weights[1]) / weights[0];
        dyn_lo = std::max(dyn_lo, box_min);
        for (int64_t j = 0; j < n; ++j) {
            if (!(x[j] > dyn_lo && x[j] <= dyn_up)) continue;
            grids_out[2 * r] = xo;
            grids_out[2 * r + 1] = x[j];
            for (int64_t l = 0; l < L; ++l) {
                // grid dim 0 -> densities[(0-1) mod 2] = row 1;
                // grid dim 1 -> densities[0]
                const int64_t k0 = params[2 * l];
                const int64_t k1 = params[2 * l + 1];
                const double w_outer = densities[(1 * q + k0) * n + i] * dx[i];
                const double w_inner = densities[(0 * q + k1) * n + j] * dx[j];
                delta_out[r * L + l] = w_outer * w_inner;
            }
            ++r;
        }
    }
    return r;
}

// Masked integral directly from a precomputed day tensor V (n, n):
// sum over the half-space cut of V[i, j] * dx[i] * dx[j] — the native CPU
// analog of `garch_integrals_cached`. Batched over T days.
void masked_integrals_2d(const double* V, const double* x, const double* dx,
                         int64_t n, const double* bounds /* (T,2) */,
                         int64_t T, const double* weights, double box_min,
                         double box_max, double* out /* (T,) */) {
    for (int64_t t = 0; t < T; ++t) {
        const double lower = bounds[2 * t];
        const double upper = bounds[2 * t + 1];
        const double* Vt = V + t * n * n;
        double acc = 0.0;
        for (int64_t i = 0; i < n; ++i) {
            const double xo = x[i];
            if (xo < box_min || xo > box_max) continue;
            const double dyn_up = (upper - xo * weights[1]) / weights[0];
            double dyn_lo = (lower - xo * weights[1]) / weights[0];
            dyn_lo = std::max(dyn_lo, box_min);
            double row = 0.0;
            for (int64_t j = 0; j < n; ++j) {
                if (x[j] > dyn_lo && x[j] <= dyn_up) {
                    row += Vt[i * n + j] * dx[j];
                }
            }
            acc += row * dx[i];
        }
        out[t] = acc;
    }
}

}  // extern "C"
