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
  * fixed iteration count `n_iters = ceil(log2(bracket / tol))` instead of
    `while any(upper - lower > tol)` — every day still converges to
    `upper - lower <= tol`, already-converged days just keep halving;
  * no global all-zeros early break (`calc_var_class.py:292-294`): that
    break couples days (it freezes ALL days when every integral hits
    exactly 0 in the same iteration) and only fires in degenerate no-mass
    configurations. The parity engines keep it; this kernel does not.

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


def _solve_kernel(n_iters, scal_ref, x_ref, w0_ref, w1_ref, fc_ref, v_ref,
                  out_ref):
    # per-day operands blocked (1, 1, k): Mosaic checks only the LAST TWO
    # block dims against the array dims, so the day axis is a leading
    # singleton
    lower = scal_ref[0, 0, 0]
    upper = scal_ref[0, 0, 1]
    prev_res = scal_ref[0, 0, 2]
    prev_up = scal_ref[0, 0, 3]
    ustack = scal_ref[0, 0, 4] != 0.0
    w_inner = scal_ref[0, 0, 5]
    w_outer = scal_ref[0, 0, 6]
    box_min = scal_ref[0, 0, 7]
    obj_var = scal_ref[0, 0, 8]

    x = x_ref[0, :]  # (n,)
    xo = x[:, None]  # outer coordinates as a column
    v = v_ref[0, :, :]
    w0 = w0_ref[:, :]
    w1t = w1_ref[:, :].T
    fc = fc_ref[0, :, :]  # (q, q); Mosaic cannot shape-cast to (1, q*q)

    def body(_, carry):
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
        0, n_iters, body, (lower, upper, prev_res, prev_up, ustack)
    )
    acc = 0.5 * (lo + up)
    out_ref[0, :, :] = acc.reshape(1, 1)  # Mosaic: no scalar VMEM stores


@functools.partial(
    jax.jit, static_argnames=("n_iters", "interpret", "box_min")
)
def _solve(scal, x, w0, w1, fcombos, day_tensors, n_iters, box_min,
           interpret):
    f32 = jnp.float32
    T, n, _ = day_tensors.shape
    q = w0.shape[0]
    kernel = functools.partial(_solve_kernel, n_iters)
    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, 9), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q, n), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q, n), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q, q), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, n), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, 1, 1), f32),
        interpret=interpret,
    )(
        jnp.asarray(scal, f32).reshape(T, 1, 9),
        jnp.asarray(x, f32).reshape(1, n),
        jnp.asarray(w0, f32),
        jnp.asarray(w1, f32),
        jnp.asarray(fcombos, f32).reshape(T, q, q),
        jnp.asarray(day_tensors, f32),
    )[:, 0, 0]


def bisection_solve_pallas(day_tensors, w0, w1, fcombos, x, weights,
                           lower, upper, prev_result, prev_upper,
                           upper_stack, obj_var, tolerance,
                           box_min=-5.0, *, interpret=False):
    """(T,) bisection roots, one fused kernel launch.

    day_tensors (T, n, n); w0/w1 (q, n) state-weight rows (dx folded in);
    fcombos (T, q*q); lower/upper/prev_result/prev_upper (T,) bisection
    state entering the loop (stage-1/2 bracketing output,
    `calc_var_class.py:111-155`); upper_stack (T,) bool.
    """
    lower = np.asarray(lower, dtype=np.float64)
    upper = np.asarray(upper, dtype=np.float64)
    span = float(np.max(upper - lower))
    if span <= tolerance:
        return np.asarray((lower + upper) / 2.0, dtype=np.float32)
    n_iters = int(math.ceil(math.log2(span / tolerance)))
    T = day_tensors.shape[0]
    scal = np.column_stack(
        [
            lower,
            upper,
            np.asarray(prev_result, dtype=np.float64),
            np.asarray(prev_upper, dtype=np.float64),
            np.asarray(upper_stack, dtype=np.float64),
            np.full(T, float(weights[0])),
            np.full(T, float(weights[1])),
            np.full(T, float(box_min)),
            np.full(T, float(obj_var)),
        ]
    )
    return np.asarray(
        _solve(scal, x, w0, w1, fcombos, day_tensors, n_iters, box_min,
               interpret)
    )


def msm_solve_pallas(day_tensors, forecast_combos, x, dx, densities, weights,
                     lower, upper, prev_result, prev_upper, upper_stack,
                     obj_var, tolerance, box_min=-5.0, *, interpret=False):
    """Fused solve, MSM family (rotated density rows as in
    `create_grids.py:121,143`)."""
    densities = jnp.asarray(densities)
    dx = jnp.asarray(dx)
    w0 = densities[1] * dx[None, :]
    w1 = densities[0] * dx[None, :]
    return bisection_solve_pallas(
        day_tensors, w0, w1, forecast_combos, x, weights, lower, upper,
        prev_result, prev_upper, upper_stack, obj_var, tolerance, box_min,
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
