"""Benchmark: joint-density grid integrations/sec on the BASELINE problem.

Problem size (BASELINE.md §3, from the reference's `main.py:25-69`):
2 assets, T = 500 out-of-sample days, num_points = 100 (10^4 grid points
per day), MSM k = 4 (q = 5 unique vol levels, 25 state combinations),
Student-t copula — the north-star "sharded quadrature kernel"
(SURVEY.md §3.2). Each "integral" is one day's joint-density quadrature
over the masked tensor-product grid, and the measured program is one full
production VaR solve: the bounds-invariant tensor precompute plus the
~23 bisection sweeps (`calc_var_class.py:111-169,278-309`).

Headline path: the fused Pallas solver (`ops/pallas_solver.py`) — each
day's ENTIRE bisection runs in one kernel program with its day tensor
resident in VMEM (f32; root agrees with the f64 host bisection to ~1e-6,
measured on TPU v5e, while the quadrature's own grid-truncation bias is
~1e-3). Falls back to the XLA f64 cached-sweep scan when Pallas is
unavailable (non-TPU backends).

vs_baseline: the reference's `calculate_result_for_i`
(`utils/calc_integral/calc_integral.py:122-171`) measured on this machine
at 5.42 integrals/s single-core (pure-Python mode; numba is not in this
image — its `@njit` kernels are not the bottleneck here, the elementwise
scipy `t.ppf` loop is, and that is pure scipy either way). Scaled x32 for
a full joblib node (`n_jobs=-1`, `calc_integral.py:211`) -> 173 int/s,
a deliberately generous CPU baseline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


REF_NODE_INTEGRALS_PER_SEC = 5.42 * 32  # measured 2026-08-17, see docstring


def pallas_canary():
    """Hardware-lowering canary: run every shipped Pallas kernel at tiny
    shapes BEFORE the timed section, so a Mosaic lowering regression is
    recorded as an explicit `pallas_error` field in the bench JSON instead
    of a silent path downgrade (the r02 failure mode: the fused solver
    stopped compiling on TPU and the headline quietly fell back to XLA,
    visible only in the stderr tail). Returns {kernel_name: error_str}."""
    import numpy as np

    errors = {}
    rng = np.random.default_rng(0)
    T, n, q, dim = 8, 40, 5, 2
    from copula_var_tpu.ops.grids import msm_grid

    x, dx = msm_grid(n)
    uvols = np.sort(rng.uniform(0.4, 1.8, size=(dim, q)), axis=1)
    dens = np.exp(-0.5 * (x[None, None, :] / uvols[:, :, None]) ** 2) / (
        np.sqrt(2 * np.pi) * uvols[:, :, None]
    )
    fbs = rng.uniform(0.1, 1.0, size=(T, dim, q))
    fbs /= fbs.sum(axis=2, keepdims=True)
    fcombos = np.einsum("ti,tj->tij", fbs[:, 0], fbs[:, 1]).reshape(T, -1)
    C = rng.uniform(0.0, 1.0, size=(T, n, n)).astype(np.float32)
    w = np.array([0.5, 0.5])
    lo1, up1 = np.full(T, -7.5), np.full(T, 0.0)
    pr, pu = np.full(T, 0.2), np.full(T, -3.0)
    us = np.ones(T, dtype=bool)

    def check(name, fn):
        try:
            r = np.asarray(fn())
            if not np.all(np.isfinite(r)):
                errors[name] = "non-finite output"
        except Exception as e:
            errors[name] = f"{type(e).__name__}: {e}"[:300]

    from copula_var_tpu.ops.pallas_solver import (
        garch_solve_pallas,
        msm_full_solve_pallas_levels,
        msm_solve_pallas,
        msm_solve_pallas_levels,
    )

    check("pallas_solver.msm", lambda: msm_solve_pallas(
        C, fcombos, x, dx, dens, w, lo1, up1, pr, pu, us, 0.05, 1e-6))
    check("pallas_solver.msm_levels", lambda: msm_solve_pallas_levels(
        C, fcombos, x, dx, dens, w, np.tile(lo1, (2, 1)),
        np.tile(up1, (2, 1)), np.tile(pr, (2, 1)), np.tile(pu, (2, 1)),
        np.tile(us, (2, 1)), [0.01, 0.05], 1e-6))
    check("pallas_solver.garch_q1", lambda: garch_solve_pallas(
        C, x, dx, w, lo1, up1, pr, pu, us, 0.05, 1e-6))
    check("pallas_solver.msm_full", lambda: msm_full_solve_pallas_levels(
        C, fcombos, x, dx, dens, w, [0.05])[0])

    from copula_var_tpu.ops.pallas_quadrature import msm_integrals_pallas

    bounds = np.column_stack([np.full(T, -100.0), np.full(T, -3.0)])
    check("pallas_quadrature.msm", lambda: msm_integrals_pallas(
        bounds, C, fcombos, x, dx, dens, w))

    try:
        from copula_var_tpu.ops.pallas_quadrature3 import (
            build_msm_dim3_cache,
            dim3_integrals_pallas,
        )
        from copula_var_tpu.ops.quadrature import CopulaSpec

        uv3 = np.sort(rng.uniform(0.4, 1.8, size=(3, q)), axis=1)
        dens3 = np.exp(-0.5 * (x[None, None, :] / uv3[:, :, None]) ** 2) / (
            np.sqrt(2 * np.pi) * uv3[:, :, None]
        )
        fbs3 = rng.uniform(0.1, 1.0, size=(T, 3, q))
        fbs3 /= fbs3.sum(axis=2, keepdims=True)
        fc3 = np.einsum("ti,tj,tk->tijk", fbs3[:, 0], fbs3[:, 1],
                        fbs3[:, 2]).reshape(T, -1)
        corr3 = np.eye(3) + 0.3 * (np.ones((3, 3)) - np.eye(3))
        spec3 = CopulaSpec("student", (6.0, corr3))
        w3 = np.array([0.4, 0.3, 0.3])
        cache3 = build_msm_dim3_cache(fbs3, fc3, x, dx, dens3, uv3, w3,
                                      spec3)
        check("pallas_quadrature3.dim3", lambda: dim3_integrals_pallas(
            bounds, cache3, family="msm", kind=spec3.kind))
    except Exception as e:  # pragma: no cover - import/shape scaffolding
        errors["pallas_quadrature3.setup"] = f"{type(e).__name__}: {e}"[:300]

    return errors


def main():
    import jax

    # Persistent compilation cache: the bench is dominated by remote TPU
    # compiles (canary kernels + the fused-solver programs), identical
    # run-to-run. First run populates the repo-local cache; the driver's
    # end-of-round run then reuses it.
    from copula_var_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax.numpy as jnp

    from copula_var_tpu.ops.grids import msm_grid
    from copula_var_tpu.ops.quadrature import CopulaSpec, msm_integrals

    rng = np.random.default_rng(0)
    dim, q, n, T = 2, 5, 100, 500

    uvols = np.sort(rng.uniform(0.4, 1.8, size=(dim, q)), axis=1)
    x, dx = msm_grid(n)
    dens = np.exp(-0.5 * (x[None, None, :] / uvols[:, :, None]) ** 2) / (
        np.sqrt(2 * np.pi) * uvols[:, :, None]
    )
    fbs = rng.uniform(0.1, 1.0, size=(T, dim, q))
    fbs /= fbs.sum(axis=2, keepdims=True)
    fcombos = np.einsum("ti,tj->tij", fbs[:, 0], fbs[:, 1]).reshape(T, -1)
    bounds = np.column_stack(
        [np.full(T, -100.0), rng.uniform(-4.0, -1.0, size=T)]
    )
    corr = np.array([[1.0, 0.45], [0.45, 1.0]])
    spec = CopulaSpec("student", (6.0, corr))
    w = np.array([0.5, 0.5])

    args = [
        jnp.asarray(a)
        for a in (bounds, fbs, fcombos, x, dx, dens, uvols, w)
    ]

    from copula_var_tpu.ops.quadrature import (
        _msm_day_tensors,
        msm_integrals_cached,
    )

    # Production configuration: one VaR solve = tensor precompute (the
    # ppf/copula grids, bounds-invariant) + ~24 masked-sandwich sweeps
    # (3 bracketing + ~21 bisection iterations, `calc_var_class.py`) —
    # exactly what the on-device bisection executes. The whole solve is
    # ONE jitted program (one transport round-trip per rep).
    sweeps = 24
    sweep_bounds = jnp.asarray(
        np.stack(
            [
                np.column_stack(
                    [np.full(T, -100.0), rng.uniform(-4.0, -1.0, size=T)]
                )
                for _ in range(sweeps)
            ]
        )
    )  # (sweeps, T, 2)

    @jax.jit
    def full_solve(bounds_stack, fbs_, fcombos_, x_, dx_, dens_, uvols_, w_):
        C = _msm_day_tensors(fbs_, x_, uvols_, spec.kind, spec.params)

        def body(acc, b):
            r = msm_integrals_cached(b, C, fcombos_, x_, dx_, dens_, w_)
            return acc + jnp.sum(r), None

        acc, _ = jax.lax.scan(body, 0.0, bounds_stack)
        return acc

    solve_args = (sweep_bounds, args[1], args[2], args[3], args[4], args[5],
                  args[6], args[7])

    def time_xla():
        float(full_solve(*solve_args))  # warm-up (compile)
        times = []
        for _ in range(3):
            t0 = time.time()
            acc = float(full_solve(*solve_args))
            times.append(time.time() - t0)
        assert np.isfinite(acc)
        # min over reps: the best estimate of true device cost under a
        # noisy host<->device transport (outliers are transport stalls)
        return min(times) / sweeps

    def time_pallas_fused(levels=1):
        # the production pallas-engine solve, r04: day tensors precomputed
        # once (bounds-invariant), then the ENTIRE calc_var — the stage-1
        # CDF sweep, each level's stage-2 refinement + bracket-state
        # masks, and every bisection iteration — in ONE device dispatch
        # (`ops/pallas_solver.py::_full_solve`; previously the two
        # bracketing sweeps were separate host-driven launches, ~30-45 ms
        # of tunnel overhead each). levels > 1 = the multi-confidence-
        # ladder launch: each day tensor streams HBM -> VMEM once and
        # every level's full bisection runs against the resident copy.
        # Sweep accounting: n_iters bisection iterations per level
        # (tolerance-derived, worst-case bracket span 7.5) + the 2
        # bracketing sweeps, each a T-day masked quadrature — the same
        # counting as the reference's ~24 `compute_integral` calls.
        from copula_var_tpu.ops.pallas_solver import (
            msm_full_solve_pallas_levels,
        )

        C = _msm_day_tensors(args[1], args[3], args[6], spec.kind,
                             spec.params)
        C32 = jnp.asarray(C, jnp.float32)
        L = levels
        obj_vars = np.linspace(0.01, 0.05, L)
        tol = 7.5 / 2.0 ** (sweeps - 2)  # n_iters + 2 stage sweeps

        def solve():
            return msm_full_solve_pallas_levels(
                C32, args[2], args[3], args[4], args[5], args[7],
                obj_vars, tolerance=tol,
            )[0]

        r = solve()  # warm-up (compile)
        assert np.all(np.isfinite(r))
        times = []
        for _ in range(5):
            t0 = time.time()
            solve()
            times.append(time.time() - t0)
        return min(times) / (sweeps * L)

    extra = {}
    t_start = time.time()
    # Hardware-lowering canary FIRST: every shipped Pallas kernel compiles
    # and runs at tiny shapes, failures recorded as an explicit JSON field
    # (never a silent path switch — the r02 regression mode).
    canary_errors = pallas_canary()
    if canary_errors:
        extra["pallas_error"] = canary_errors
        print(f"pallas canary failures: {canary_errors}", file=sys.stderr)
    else:
        extra["pallas_canary"] = "ok"
    try:
        if any(k.startswith("pallas_solver") for k in canary_errors):
            raise RuntimeError(
                "fused-solver canary failed; see pallas_error field"
            )
        # headline: the SINGLE-LEVEL fused solve — directly comparable to
        # the reference's one-confidence-level workload and to prior-round
        # BENCH numbers. The 4-level confidence-ladder launch (99/97.67/
        # 96.33/95%, the production risk-desk configuration, HBM streaming
        # amortized across levels) is reported alongside, not as the
        # headline — and only when the compile budget allows (each L is a
        # separate program; remote compiles cost minutes).
        dt = time_pallas_fused(levels=1)
        path = "pallas_fused_solver"
        if time.time() - t_start < 900.0:
            dt4 = time_pallas_fused(levels=4)
            extra["value_4level_amortized"] = round(T / dt4, 1)
        if time.time() - t_start < 900.0:
            # SUSTAINED-throughput protocol (VERDICT r04 next #2): 128
            # independent solves (a 32-portfolio x 4-level serving sweep
            # equivalent) pipelined in ONE dispatch — every solve
            # bisects against the same VMEM-resident day tensors, so the
            # fixed ~25-45 ms tunnel dispatch+fetch latency that bounds
            # the single-solve headline amortizes 128x. This is an
            # ACHIEVED steady-state rate (one real launch), not a slope
            # extrapolation like value_device_marginal. Measured sweep
            # (solo, v5e): L=64 6.83M, L=128 8.37M, L=256 8.57M int/s —
            # the per-solve device floor is ~1.4 ms, so L=128 captures
            # ~98% of the plateau at half the L=256 latency exposure.
            dt128 = time_pallas_fused(levels=128)
            extra["value_sustained"] = round(T / dt128, 1)
            extra["sustained_protocol"] = (
                "128 solves/dispatch (32 portfolios x 4 levels), "
                "per-solve-sweep rate"
            )
        if time.time() - t_start < 900.0:
            # DEVICE-MARGINAL rate by K-sweep slope (differential timing
            # removes the fixed ~25-45 ms tunnel dispatch+fetch latency
            # that bounds the single-launch headline): time the same
            # fused solve at n_iters = 22 and 222 and divide the extra
            # integrals by the extra wall time.
            from copula_var_tpu.ops.pallas_solver import (
                msm_full_solve_pallas_levels,
            )

            C = _msm_day_tensors(args[1], args[3], args[6], spec.kind,
                                 spec.params)
            C32 = jnp.asarray(C, jnp.float32)

            def timed(n_it):
                tol = 7.5 / 2.0 ** n_it

                def solve():
                    return msm_full_solve_pallas_levels(
                        C32, args[2], args[3], args[4], args[5], args[7],
                        [0.05], tolerance=tol,
                    )[0]

                solve()
                ts = []
                for _ in range(5):
                    t0 = time.time()
                    solve()
                    ts.append(time.time() - t0)
                return min(ts)

            t_lo, t_hi = timed(22), timed(222)
            if t_hi > t_lo:
                marginal = (222 - 22) * T / (t_hi - t_lo)
                extra["value_device_marginal"] = round(marginal, 1)
    except Exception as e:  # non-TPU backend or lowering regression
        print(f"pallas path unavailable ({type(e).__name__}: {e}); "
              "falling back to XLA", file=sys.stderr)
        extra.setdefault("pallas_error", {})[
            "headline"
        ] = f"{type(e).__name__}: {e}"[:300]
        dt = time_xla()
        path = "xla_cached_scan"

    rate = T / dt
    print(
        json.dumps(
            {
                "metric": "msm_student_grid_integrals_per_sec",
                "value": round(rate, 1),
                "unit": "integrals/s/chip",
                "vs_baseline": round(rate / REF_NODE_INTEGRALS_PER_SEC, 2),
                "path": path,
                **extra,
            }
        )
    )


if __name__ == "__main__":
    main()
