"""Day-block sweep for the fused Pallas solver.

Measures the fused bisection solve wall time and the per-level device
marginal (slope between an L=1 and an L=4 launch — launch/tunnel overhead
cancels) as a function of `day_block` B, the number of days solved per
kernel program. B=1 is the round-1 kernel shape (one tiny program per
day, scalar-loop-overhead-bound); larger B amortizes the per-program
control flow and batches the MXU sandwich.

Usage: python benchmarks/day_block_sweep.py [--days 500] [--points 100]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--days", type=int, default=500)
    ap.add_argument("--points", type=int, default=100)
    ap.add_argument("--blocks", type=int, nargs="+",
                    default=[8, 16, 32, 64])
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax.numpy as jnp

    from copula_var_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    from copula_var_tpu.ops.grids import msm_grid
    from copula_var_tpu.ops.pallas_solver import msm_solve_pallas_levels
    from copula_var_tpu.ops.quadrature import (
        CopulaSpec,
        _msm_day_tensors,
        msm_integrals_cached,
    )

    rng = np.random.default_rng(0)
    dim, q, n, T = 2, 5, args.points, args.days
    uvols = np.sort(rng.uniform(0.4, 1.8, size=(dim, q)), axis=1)
    x, dx = msm_grid(n)
    dens = np.exp(-0.5 * (x[None, None, :] / uvols[:, :, None]) ** 2) / (
        np.sqrt(2 * np.pi) * uvols[:, :, None]
    )
    fbs = rng.uniform(0.1, 1.0, size=(T, dim, q))
    fbs /= fbs.sum(axis=2, keepdims=True)
    fcombos = np.einsum("ti,tj->tij", fbs[:, 0], fbs[:, 1]).reshape(T, -1)
    bounds = np.column_stack([np.full(T, -100.0),
                              rng.uniform(-4.0, -1.0, size=T)])
    corr = np.array([[1.0, 0.45], [0.45, 1.0]])
    spec = CopulaSpec("student", (6.0, corr))
    w = np.array([0.5, 0.5])

    C = _msm_day_tensors(jnp.asarray(fbs), jnp.asarray(x), jnp.asarray(uvols),
                         spec.kind, spec.params)
    C32 = jnp.asarray(C, jnp.float32)
    prev = np.asarray(
        msm_integrals_cached(jnp.asarray(bounds), C, jnp.asarray(fcombos),
                             jnp.asarray(x), jnp.asarray(dx),
                             jnp.asarray(dens), jnp.asarray(w))
    )
    sweeps = 24
    tol = 7.5 / 2.0 ** sweeps

    def solve(L, B):
        return msm_solve_pallas_levels(
            C32, fcombos, x, dx, dens, w,
            np.tile(np.full(T, -7.5), (L, 1)),
            np.tile(np.full(T, 0.0), (L, 1)),
            np.tile(prev, (L, 1)), np.tile(bounds[:, 1], (L, 1)),
            np.ones((L, T), dtype=bool), np.linspace(0.01, 0.05, L), tol,
            day_block=B,
        )

    ref = None
    for B in args.blocks:
        r1 = solve(1, B)
        r4 = solve(4, B)  # warm-up/compile both
        if ref is None:
            ref = r4
        else:
            dmax = float(np.max(np.abs(r4 - ref)))
            assert dmax < 2e-2, f"B={B} root drift {dmax}"
        t1 = min(
            _t(lambda: solve(1, B)) for _ in range(args.reps)
        )
        t4 = min(
            _t(lambda: solve(4, B)) for _ in range(args.reps)
        )
        marg = (t4 - t1) / 3.0
        print(
            f"B={B:3d}  wall L=1 {t1*1e3:7.1f} ms   wall L=4 {t4*1e3:7.1f} ms"
            f"   marginal/level {marg*1e3:7.2f} ms"
            f"   device rate ~{T * sweeps / max(marg, 1e-9) / 1e6:7.2f}M"
            " integrals/s"
        )


def _t(f):
    t0 = time.time()
    f()
    return time.time() - t0


if __name__ == "__main__":
    main()
