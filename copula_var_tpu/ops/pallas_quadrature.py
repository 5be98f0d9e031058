"""Pallas TPU kernel: fused masked-sandwich quadrature (cached fast path).

One program per out-of-sample day. The (n, n) cached day tensor streams
HBM -> VMEM once; the half-space mask, the W0 (V .* M) W1^T state sandwich
(MXU), and the forecast-combination dot all happen in VMEM with no
intermediate HBM round trips — the hand-fused version of
`ops.quadrature.msm_integrals_cached` / `garch_integrals_cached`.

The same kernel serves both integrand families: GARCH/mean-reverting is
the q = 1 case with W = dx row vectors and unit combination weights.

f32 kernel (TPU Pallas has no f64); accuracy is bounded by the f32 day
tensors, ~1e-6 relative — ample for a quadrature whose grid bias is ~1e-3.
Caveat: when a dynamic bound lands EXACTLY on a grid point, the inclusive
`x <= dyn_upper` comparison can flip between f32 and f64, including or
excluding one boundary row of quadrature weight; bisection midpoints are
generic reals so this does not occur in practice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BOX_MIN = -5.0


def _day_kernel(bounds_ref, x_ref, w0_ref, w1_ref, fc_ref, v_ref, out_ref):
    # per-day operands are blocked (1, 1, k): Mosaic checks only the LAST
    # TWO block dims against the array dims, so the day axis must be a
    # leading singleton, not a row of a 2-D block
    lower = bounds_ref[0, 0, 0]
    upper = bounds_ref[0, 0, 1]
    w_inner = bounds_ref[0, 0, 2]  # weights[0] (inner dim)
    w_outer = bounds_ref[0, 0, 3]  # weights[1] (outer dim)
    box_min = bounds_ref[0, 0, 4]

    x = x_ref[0, :]  # (n,)
    xo = x[:, None]  # outer coordinates as column
    dyn_up = (upper - xo * w_outer) / w_inner
    dyn_lo = jnp.maximum((lower - xo * w_outer) / w_inner, box_min)
    mask = (x[None, :] > dyn_lo) & (x[None, :] <= dyn_up)

    v = jnp.where(mask, v_ref[0, :, :], 0.0)
    left = jnp.dot(w0_ref[:, :], v, preferred_element_type=jnp.float32)
    r = jnp.dot(left, w1_ref[:, :].T, preferred_element_type=jnp.float32)
    # fc stays (q, q): Mosaic cannot shape-cast (q, q) -> (1, q*q)
    acc = jnp.sum(r * fc_ref[0, :, :])
    out_ref[0, :, :] = acc.reshape(1, 1)  # Mosaic: no scalar VMEM stores


@functools.partial(jax.jit, static_argnames=("interpret", "box_min"))
def masked_sandwich_integrals(bounds, day_tensors, w0, w1, fcombos, x,
                              weights, *, interpret=False, box_min=BOX_MIN):
    """(T,) integrals from cached day tensors, fused in one Pallas kernel.

    bounds (T, 2); day_tensors (T, n, n); w0/w1 (q, n) state-weight rows
    (already including dx); fcombos (T, q*q); x (n,); weights (2,).
    """
    f32 = jnp.float32
    T, n, _ = day_tensors.shape
    q = w0.shape[0]
    # pack scalars per day: [lower, upper, w_inner, w_outer, box_min]
    packed = jnp.concatenate(
        [
            jnp.asarray(bounds, f32),
            jnp.broadcast_to(jnp.asarray(weights, f32)[None, :], (T, 2)),
            jnp.full((T, 1), box_min, dtype=f32),
        ],
        axis=1,
    )
    return pl.pallas_call(
        _day_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, 5), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
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
        packed.reshape(T, 1, 5),
        jnp.asarray(x, f32).reshape(1, n),
        jnp.asarray(w0, f32),
        jnp.asarray(w1, f32),
        jnp.asarray(fcombos, f32).reshape(T, q, q),
        jnp.asarray(day_tensors, f32),
    )[:, 0, 0]


def _sweep_block_kernel(q, ns, scal_ref, x_ref, xow_ref, w1t_ref, wfc_ref,
                        v_ref, repl_ref, replt_ref, out_ref):
    # One program = a BLOCK of B days (the solver kernel's layout,
    # `pallas_solver._solve_kernel`, for a single sweep): the per-day
    # (n, n) tensors stream HBM -> VMEM exactly once and the mask +
    # sandwich run in VMEM — no materialized masked operand, which is
    # what caps the XLA path at ~1/3 of HBM peak (the select forces an
    # extra vm write + matmul re-read).
    x2 = x_ref[:, :]  # (1, n)
    xow = xow_ref[:, :]  # (B*n, n)
    v = v_ref[:, :]  # (B*n, n) day tensors, b-major rows
    w1t = w1t_ref[:, :]  # (n, q)
    wfc = wfc_ref[:, :]  # (B*n, q)
    repl = repl_ref[:, :]  # (B*n, B)
    replt = replt_ref[:, :]  # (B, B*n)

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    col = lambda k: scal_ref[:, k * ns:k * ns + x2.shape[1]]
    lower, upper = col(0), col(1)
    win_f = dot(repl, col(2))
    xwo = xow * dot(repl, col(3))
    boxm_f = dot(repl, col(4))
    dyn_up = (dot(repl, upper) - xwo) / win_f
    dyn_lo = jnp.maximum((dot(repl, lower) - xwo) / win_f, boxm_f)
    mask = (x2 > dyn_lo) & (x2 <= dyn_up)
    vm = jnp.where(mask, v, 0.0)
    a = dot(vm, w1t)  # (B*n, q)
    out_ref[:, :] = dot(replt, a * wfc)  # (B, q) per-day per-state sums


@functools.partial(
    jax.jit, static_argnames=("interpret", "box_min", "day_block")
)
def masked_sandwich_integrals_blocked(bounds, day_tensors, w0, w1, fcombos,
                                      x, weights, *, interpret=False,
                                      box_min=BOX_MIN, day_block=32):
    """(T,) integrals, B days per kernel program (streaming-optimal).

    Same contract as `masked_sandwich_integrals`; this variant amortizes
    the per-program overhead that dominates the one-day-per-program
    kernel (500 programs of ~40 KB each) and avoids the XLA engine's
    materialized masked operand. Used by the sweep-bandwidth benchmark
    and any caller doing single sweeps at full T.
    """
    from copula_var_tpu.ops.pallas_solver import _clamp_day_block, _lane_round

    f32 = jnp.float32
    T, n, _ = day_tensors.shape
    q = w0.shape[0]
    # Mosaic: the day-block dim must be sublane-divisible -> B multiple
    # of 8 (days are padded to a B multiple, so B > T is fine); the
    # solver's VMEM-footprint clamp applies here too (its L=1 footprint
    # upper-bounds this kernel's: same v2/xow/wfc/repl blocks, and the
    # sweep's 5-group scal is smaller than the solver's 9-group one)
    B = _clamp_day_block(day_block, max(T, 8), n, q, 1)
    pad = (-T) % B
    padT = (
        (lambda a: jnp.concatenate([a, jnp.repeat(a[-1:], pad, axis=0)]))
        if pad else (lambda a: a)
    )
    Tp = T + pad
    w0 = jnp.asarray(w0, f32)
    w1 = jnp.asarray(w1, f32)
    if q == 1:
        # 1-lane matmuls hang the remote Mosaic backend: pad state axis
        w0 = jnp.concatenate([w0, jnp.zeros_like(w0)], axis=0)
        w1 = jnp.concatenate([w1, jnp.zeros_like(w1)], axis=0)
        fcombos = jnp.pad(jnp.asarray(fcombos, f32).reshape(T, 1, 1),
                          ((0, 0), (0, 1), (0, 1))).reshape(T, 4)
        q = 2
    fc3 = padT(jnp.asarray(fcombos, f32).reshape(T, q, q))
    wfc = jnp.einsum("si,tsk->tik", w0, fc3).reshape(Tp * n, q)
    # NaN isolation (same mechanism as pallas_solver._solve): a NaN day
    # tensor would contaminate every day in its BLOCK through the replt
    # group-sum matmul (0 * NaN = NaN). Sanitize the operands, then
    # re-inject NaN for the affected days only — matching the cached
    # engine's per-day NaN-in -> NaN-out semantics.
    v_pad = padT(jnp.asarray(day_tensors, f32))
    day_nan = jnp.any(~jnp.isfinite(v_pad), axis=(1, 2)) | jnp.any(
        ~jnp.isfinite(wfc.reshape(Tp, n, q)), axis=(1, 2)
    )
    wfc = jnp.nan_to_num(wfc, nan=0.0, posinf=0.0, neginf=0.0)
    v2 = jnp.nan_to_num(
        v_pad, nan=0.0, posinf=0.0, neginf=0.0
    ).reshape(Tp * n, n)
    xv = jnp.asarray(x, f32)
    xow = jnp.broadcast_to(jnp.tile(xv, B).reshape(B * n, 1), (B * n, n))
    repl = jnp.repeat(jnp.eye(B, dtype=f32), n, axis=0)
    ns = _lane_round(n)
    w_in = jnp.asarray(weights, f32)
    scal = jnp.stack(
        [
            jnp.asarray(bounds, f32)[:, 0],
            jnp.asarray(bounds, f32)[:, 1],
            jnp.full((T,), w_in[0]),
            jnp.full((T,), w_in[1]),
            jnp.full((T,), box_min, dtype=f32),
        ],
        axis=1,
    )  # (T, 5)
    scal_wide = jnp.pad(
        jnp.broadcast_to(padT(scal)[:, :, None], (Tp, 5, n)),
        ((0, 0), (0, 0), (0, ns - n)),
    ).reshape(Tp, 5 * ns)
    kernel = functools.partial(_sweep_block_kernel, q, ns)
    gp = pl.pallas_call(
        kernel,
        grid=(Tp // B,),
        in_specs=[
            pl.BlockSpec((B, 5 * ns), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B * n, n), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, q), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B * n, q), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B * n, n), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B * n, B), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, B * n), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, q), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, q), f32),
        interpret=interpret,
    )(
        scal_wide,
        xv.reshape(1, n),
        xow,
        w1.T,
        wfc,
        v2,
        repl,
        repl.T,
    )
    return jnp.where(day_nan, jnp.nan, jnp.sum(gp, axis=1))[:T]


def msm_integrals_pallas(bounds, day_tensors, forecast_combos, x, dx,
                         densities, weights, *, interpret=False,
                         box_min=BOX_MIN):
    """Pallas analog of `msm_integrals_cached` (dim == 2)."""
    densities = jnp.asarray(densities)
    dx = jnp.asarray(dx)
    # rotated density rows (`create_grids.py:121,143`): dim 0 -> densities[1]
    w0 = densities[1] * dx[None, :]
    w1 = densities[0] * dx[None, :]
    return masked_sandwich_integrals(
        bounds, day_tensors, w0, w1, forecast_combos, x, weights,
        interpret=interpret, box_min=box_min,
    )


def garch_integrals_pallas(bounds, day_tensors, x, dx, weights, *,
                           interpret=False, box_min=BOX_MIN):
    """Pallas analog of `garch_integrals_cached`: q = 1 sandwich."""
    T = day_tensors.shape[0]
    dx_row = jnp.asarray(dx)[None, :]
    ones = jnp.ones((T, 1), dtype=day_tensors.dtype)
    return masked_sandwich_integrals(
        bounds, day_tensors, dx_row, dx_row, ones, x, weights,
        interpret=interpret, box_min=box_min,
    )
