"""Pallas TPU kernel: the ENTIRE per-day VaR bisection fused in one launch.

The reference's bisection (`utils/calc_var_class.py:250-309`) — and our
on-device `lax.while_loop` analog — evaluates one quadrature sweep per
iteration, so the (T, n, n) cached day tensors stream HBM -> VMEM ~21
times per solve. But each day's bisection is INDEPENDENT of every other
day's: this kernel runs one program per day that loads the day tensor
into VMEM once and executes the full bisection (mask + MXU sandwich +
incremental-CDF bookkeeping per iteration) entirely in VMEM. HBM traffic
per solve drops from ~iters x T n^2 to T n^2 — the bandwidth-optimal
shape for this workload.

Semantics vs the reference bisection (both deviations bounded by the
solver tolerance, documented here and asserted in tests):
  * fixed per-level iteration count `ceil(log2(bracket / tol))` instead of
    `while any(upper - lower > tol)` — every day still converges to
    `upper - lower <= tol`, already-converged days just keep halving;
  * no global all-zeros early break (`calc_var_class.py:292-294`): that
    break couples days (it freezes ALL days when every integral hits
    exactly 0 in the same iteration) and only fires in degenerate no-mass
    configurations. The parity engines keep it; this kernel does not.

f32 accuracy note (measured on TPU v5e): the masked-grid CDF is a STEP
function of the VaR bound — every v inside one grid cell's half-space
band yields the same integral, so any root on that plateau is equally
consistent with the discretized CDF. The f64 XLA engine and this f32
kernel can therefore resolve a root to DIFFERENT edges of the same (or an
adjacent) plateau when |F - obj_var| at the step is below f32 resolution:
root disagreement is bounded by ~one grid cell width times weights[0]
(e.g. ~1e-2 at num_points=40, ~1e-6..1e-3 at num_points=100), while the
tracked CDF values agree to f32 precision (~1e-7 relative). The same
bound applies BETWEEN fused launch configurations (e.g. an L=1 vs an L=3
multi-level kernel): Mosaic may make different FMA/scheduling decisions
per compilation, and a 1-ulp difference in a dynamic bound exactly at a
grid point flips one mask row. Cross-engine and cross-configuration
tests must use the plateau bound, not the bisection tolerance. (In
interpret mode — CPU tests — numerics are schedule-independent and L=1
vs L=k match exactly.)

Same q = 1 reduction trick as `pallas_quadrature`: the GARCH family is the
single-state case with W = dx rows and unit combination weight.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _solve_kernel(n_iters_per_level, n_levels, scal_ref, x_ref, w0_ref,
                  w1_ref, fc_ref, v_ref, out_ref):
    # per-day operands blocked (1, L, k): Mosaic checks only the LAST TWO
    # block dims against the array dims, so the day axis is a leading
    # singleton
    x = x_ref[0, :]  # (n,)
    xo = x[:, None]  # outer coordinates as a column
    v = v_ref[0, :, :]
    w0 = w0_ref[:, :]
    w1t = w1_ref[:, :].T
    fc = fc_ref[0, :, :]  # (q, q); Mosaic cannot shape-cast to (1, q*q)

    # Static unrolled loop over confidence levels: the day tensor `v` is
    # loaded into VMEM ONCE and every level's full bisection runs against
    # it — solving L levels costs one HBM stream, not L.
    accs = []
    for lev in range(n_levels):
        lower = scal_ref[0, lev, 0]
        upper = scal_ref[0, lev, 1]
        prev_res = scal_ref[0, lev, 2]
        prev_up = scal_ref[0, lev, 3]
        ustack = scal_ref[0, lev, 4] != 0.0
        w_inner = scal_ref[0, lev, 5]
        w_outer = scal_ref[0, lev, 6]
        box_min = scal_ref[0, lev, 7]
        obj_var = scal_ref[0, lev, 8]

        def body(_, carry, w_inner=w_inner, w_outer=w_outer,
                 box_min=box_min, obj_var=obj_var):
            lo, up, pr, pu, us = carry
            mid = 0.5 * (lo + up)
            # slab for this iteration (`calc_var_class.py:278-287`)
            b_lo = jnp.where(us, lo, mid)
            b_up = jnp.where(us, mid, up)
            dyn_up = (b_up - xo * w_outer) / w_inner
            dyn_lo = jnp.maximum((b_lo - xo * w_outer) / w_inner, box_min)
            mask = (x[None, :] > dyn_lo) & (x[None, :] <= dyn_up)
            vm = jnp.where(mask, v, 0.0)
            left = jnp.dot(w0, vm, preferred_element_type=jnp.float32)
            r = jnp.dot(left, w1t, preferred_element_type=jnp.float32)
            integ = jnp.sum(r * fc)
            # incremental CDF bookkeeping (`calc_var_class.py:237-246`)
            add = b_lo == pu
            res = jnp.where(add, pr + integ, pr - integ)
            us_n = res < obj_var
            lo_n = jnp.where(us_n, mid, lo)
            up_n = jnp.where(us_n, up, mid)
            return lo_n, up_n, res, mid, us_n

        lo, up, _, _, _ = jax.lax.fori_loop(
            0, n_iters_per_level[lev], body,
            (lower, upper, prev_res, prev_up, ustack),
        )
        accs.append(0.5 * (lo + up))
    # Mosaic: no scalar VMEM stores — write the level vector in one shot
    out_ref[0, :, :] = jnp.stack(accs).reshape(1, n_levels)


@functools.partial(
    jax.jit, static_argnames=("n_iters", "n_levels", "interpret", "box_min")
)
def _solve(scal, x, w0, w1, fcombos, day_tensors, n_iters, n_levels, box_min,
           interpret):
    f32 = jnp.float32
    T, n, _ = day_tensors.shape
    q = w0.shape[0]
    L = n_levels
    kernel = functools.partial(_solve_kernel, n_iters, n_levels)
    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, L, 9), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q, n), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q, n), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q, q), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, n), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, L), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, 1, L), f32),
        interpret=interpret,
    )(
        jnp.asarray(scal, f32).reshape(T, L, 9),
        jnp.asarray(x, f32).reshape(1, n),
        jnp.asarray(w0, f32),
        jnp.asarray(w1, f32),
        jnp.asarray(fcombos, f32).reshape(T, q, q),
        jnp.asarray(day_tensors, f32),
    )[:, 0, :]


def bisection_solve_pallas_levels(day_tensors, w0, w1, fcombos, x, weights,
                                  lower, upper, prev_result, prev_upper,
                                  upper_stack, obj_vars, tolerance,
                                  box_min=-5.0, *, interpret=False):
    """(L, T) bisection roots for L confidence levels, ONE kernel launch.

    day_tensors (T, n, n); w0/w1 (q, n) state-weight rows (dx folded in);
    fcombos (T, q*q); lower/upper/prev_result/prev_upper (L, T) bisection
    state entering the loop (per-level stage-1/2 bracketing output,
    `calc_var_class.py:111-155`); upper_stack (L, T) bool; obj_vars (L,).

    Each day's tensor streams HBM -> VMEM once and ALL levels' bisections
    run against the resident copy — solving L levels costs ~the HBM
    traffic of one.
    """
    lower = np.atleast_2d(np.asarray(lower, dtype=np.float64))
    upper = np.atleast_2d(np.asarray(upper, dtype=np.float64))
    obj_vars = np.atleast_1d(np.asarray(obj_vars, dtype=np.float64))
    L, T = lower.shape
    if obj_vars.shape[0] != L:
        raise ValueError(
            f"obj_vars has {obj_vars.shape[0]} levels but the bisection "
            f"state carries L={L} (lower/upper shape {lower.shape})"
        )
    if float(np.max(upper - lower)) <= tolerance:
        return np.asarray((lower + upper) / 2.0, dtype=np.float32)
    # PER-LEVEL iteration counts (static; the level loop is unrolled), so
    # each level runs exactly the iterations its own bracket span needs —
    # identical to a single-level launch of that level. Already-converged
    # days within a level keep halving, which only tightens their bracket.
    n_iters = tuple(
        max(
            1,
            int(
                math.ceil(
                    math.log2(max(float(np.max(upper[l] - lower[l])), tolerance)
                              / tolerance)
                )
            ),
        )
        for l in range(L)
    )
    scal = np.stack(
        [
            lower,
            upper,
            np.broadcast_to(np.asarray(prev_result, dtype=np.float64), (L, T)),
            np.broadcast_to(np.asarray(prev_upper, dtype=np.float64), (L, T)),
            np.broadcast_to(
                np.asarray(upper_stack, dtype=np.float64), (L, T)
            ),
            np.full((L, T), float(weights[0])),
            np.full((L, T), float(weights[1])),
            np.full((L, T), float(box_min)),
            np.broadcast_to(obj_vars[:, None], (L, T)),
        ],
        axis=-1,
    )  # (L, T, 9)
    out = _solve(
        np.swapaxes(scal, 0, 1), x, w0, w1, fcombos, day_tensors, n_iters,
        L, box_min, interpret,
    )  # (T, L)
    return np.asarray(out).T


def bisection_solve_pallas(day_tensors, w0, w1, fcombos, x, weights,
                           lower, upper, prev_result, prev_upper,
                           upper_stack, obj_var, tolerance,
                           box_min=-5.0, *, interpret=False):
    """(T,) bisection roots, one fused kernel launch (single level)."""
    return bisection_solve_pallas_levels(
        day_tensors, w0, w1, fcombos, x, weights,
        np.asarray(lower)[None, :], np.asarray(upper)[None, :],
        np.asarray(prev_result)[None, :], np.asarray(prev_upper)[None, :],
        np.asarray(upper_stack)[None, :], [obj_var], tolerance, box_min,
        interpret=interpret,
    )[0]


def _msm_w01(densities, dx):
    densities = jnp.asarray(densities)
    dx = jnp.asarray(dx)
    # rotated density rows as in `create_grids.py:121,143`
    return densities[1] * dx[None, :], densities[0] * dx[None, :]


def msm_solve_pallas(day_tensors, forecast_combos, x, dx, densities, weights,
                     lower, upper, prev_result, prev_upper, upper_stack,
                     obj_var, tolerance, box_min=-5.0, *, interpret=False):
    """Fused solve, MSM family (single confidence level)."""
    w0, w1 = _msm_w01(densities, dx)
    return bisection_solve_pallas(
        day_tensors, w0, w1, forecast_combos, x, weights, lower, upper,
        prev_result, prev_upper, upper_stack, obj_var, tolerance, box_min,
        interpret=interpret,
    )


def msm_solve_pallas_levels(day_tensors, forecast_combos, x, dx, densities,
                            weights, lower, upper, prev_result, prev_upper,
                            upper_stack, obj_vars, tolerance, box_min=-5.0,
                            *, interpret=False):
    """Fused multi-level solve, MSM family: (L, T) roots in one launch."""
    w0, w1 = _msm_w01(densities, dx)
    return bisection_solve_pallas_levels(
        day_tensors, w0, w1, forecast_combos, x, weights, lower, upper,
        prev_result, prev_upper, upper_stack, obj_vars, tolerance, box_min,
        interpret=interpret,
    )


def garch_solve_pallas(day_tensors, x, dx, weights, lower, upper,
                       prev_result, prev_upper, upper_stack, obj_var,
                       tolerance, box_min=-5.0, *, interpret=False):
    """Fused solve, GARCH/mean-reverting family (q = 1)."""
    T = day_tensors.shape[0]
    dx_row = jnp.asarray(dx)[None, :]
    ones = np.ones((T, 1))
    return bisection_solve_pallas(
        day_tensors, dx_row, dx_row, ones, x, weights, lower, upper,
        prev_result, prev_upper, upper_stack, obj_var, tolerance, box_min,
        interpret=interpret,
    )


def garch_solve_pallas_levels(day_tensors, x, dx, weights, lower, upper,
                              prev_result, prev_upper, upper_stack,
                              obj_vars, tolerance, box_min=-5.0, *,
                              interpret=False):
    """Fused multi-level solve, GARCH/mean-reverting family (q = 1)."""
    T = day_tensors.shape[0]
    dx_row = jnp.asarray(dx)[None, :]
    ones = np.ones((T, 1))
    return bisection_solve_pallas_levels(
        day_tensors, dx_row, dx_row, ones, x, weights, lower, upper,
        prev_result, prev_upper, upper_stack, obj_vars, tolerance, box_min,
        interpret=interpret,
    )
