"""Pallas TPU kernel: the ENTIRE per-day VaR bisection fused in one launch.

The reference's bisection (`utils/calc_var_class.py:250-309`) — and our
on-device `lax.while_loop` analog — evaluates one quadrature sweep per
iteration, so the (T, n, n) cached day tensors stream HBM -> VMEM ~21
times per solve. But each day's bisection is INDEPENDENT of every other
day's: this kernel runs one program per BLOCK of `day_block` days that
loads the day tensors into VMEM once and executes the full bisection
(mask + MXU sandwich + incremental-CDF bookkeeping per iteration)
entirely in VMEM. HBM traffic per solve drops from ~iters x T n^2 to
T n^2 — the bandwidth-optimal shape for this workload. The TPU grid is
SEQUENTIAL on the single TensorCore, so `day_block` > 1 is what
vectorizes the per-iteration scalar bookkeeping across days (at B=1 the
serialized fori_loop control flow dominates the ~0.5us/day of VPU+MXU
work; B=8..32 amortizes it and batches the sandwich contraction).

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


def root_plateau_bound(dx, weights, n_cells=1):
    """Derived cross-engine accuracy contract of the f32 fused engines.

    The masked-grid CDF is a STEP function of the VaR bound v: the mask's
    inner-coordinate cut moves by one grid cell when v moves by
    cell_width x weights[0], so when |F - obj_var| at a step is below f32
    resolution the f32 kernel may resolve the root to a different edge of
    the same (or an adjacent) plateau than the f64 engine. The worst-case
    disagreement is therefore `n_cells x max(dx) x |weights[0]|` (the
    docstring bound at the top of this module, now computable per config
    instead of hard-coded in tests). Typical disagreement is set by the
    cell widths NEAR the root (the fine interior region of the
    non-uniform grid) — use `np.median(dx)` for a sensitivity check.
    """
    return float(
        n_cells * np.max(np.asarray(dx)) * abs(float(np.asarray(weights)[0]))
    )


def _lane_round(n):
    """Round up to the 128-lane tile width.

    Per-state column groups inside the packed scalar-state array must
    start at multiples of 128: a slice at a non-tile-aligned lane offset
    (e.g. 4*n = 400 -> offset 16) gives every derived vector an offset
    layout, and a fori_loop carry whose layout differs from the loop
    entry's makes Mosaic insert `tpu.rotate` fixups on the back-edge —
    which failed with an internal error on i1 carries (the r02
    regression, BENCH_r02.json tail).
    """
    return ((n + 127) // 128) * 128


def _solve_kernel(n_iters_per_level, n_levels, q, ns, scal_ref, x_ref,
                  xow_ref, w1t_ref, wfc_ref, v_ref, repl_ref, replt_ref,
                  out_ref):
    # One kernel program solves a BLOCK of B days at once. B > 1 amortizes
    # the per-program scalar-loop overhead (the TPU grid is sequential, so
    # at B=1 the serialized fori_loop control flow dominates the
    # ~0.5us/day of actual VPU+MXU work) and batches the sandwich matmul.
    #
    # Mosaic layout constraints driving the data layout (this toolchain):
    #   * rank-3 vectors trip a layout-inference check failure -> the
    #     (B, n, n) day block is flattened b-major to (B*n, n) rows;
    #   * 1-lane vectors/matmul outputs HANG the remote Mosaic backend ->
    #     per-day scalar state is carried at full n-lane width (same
    #     hardware cost: a (B, 1) vector pads to an (8, 128) tile anyway),
    #     and the (b <-> b*n+i) moves are full-width indicator matmuls:
    #     repl (B*n, B) @ (B, n) replicates day state onto rows, and
    #     replt (B, B*n) @ (B*n, q) group-sums rows per day, with the
    #     q-lane collapse + n-lane re-broadcast fused into one
    #     (B, q) @ (q, n) ones-matmul.
    x2 = x_ref[:, :]  # (1, n) inner-coordinate lane
    xow = xow_ref[:, :]  # (B*n, n) outer coordinate per flattened row
    v = v_ref[:, :]  # (B*n, n) day tensors, b-major rows
    w1t = w1t_ref[:, :]  # (n, q)
    wfc = wfc_ref[:, :]  # (B*n, q): wfc[b*n+i, k] = sum_s w0[s,i] fc[b,s,k]
    repl = repl_ref[:, :]  # (B*n, B)
    replt = replt_ref[:, :]  # (B, B*n)
    n = x2.shape[1]
    ones_qn = jnp.ones((q, n), dtype=jnp.float32)

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # Static unrolled loop over confidence levels: the day tensors are
    # loaded into VMEM ONCE and every level's full bisection runs against
    # the resident copies — solving L levels costs one HBM stream, not L.
    accs = []
    for lev in range(n_levels):
        # (B, n) per-day state, constant across lanes; each column group
        # starts at a multiple of ns (lane-tile aligned, see _lane_round)
        col = lambda k: scal_ref[:, (lev * 9 + k) * ns:(lev * 9 + k) * ns + n]
        lower, upper = col(0), col(1)
        prev_res, prev_up = col(2), col(3)
        # carried as f32 0/1, NOT i1: boolean loop carries tripped a
        # Mosaic internal error on the back-edge layout fixup (r02)
        ustack = col(4)
        # per-day constants, replicated onto flattened rows once per level
        win_f = dot(repl, col(5))  # (B*n, n) portfolio inner weight
        xwo = xow * dot(repl, col(6))  # (B*n, n): x_outer * w_outer
        boxm_f = dot(repl, col(7))
        obj_var = col(8)

        def body(_, carry, win_f=win_f, xwo=xwo, boxm_f=boxm_f,
                 obj_var=obj_var):
            lo, up, pr, pu, us = carry  # each (B, n) f32, lane-constant
            mid = 0.5 * (lo + up)
            # slab for this iteration (`calc_var_class.py:278-287`)
            usb = us != 0.0
            b_lo = jnp.where(usb, lo, mid)
            b_up = jnp.where(usb, mid, up)
            dyn_up = (dot(repl, b_up) - xwo) / win_f  # (B*n, n)
            dyn_lo = jnp.maximum((dot(repl, b_lo) - xwo) / win_f, boxm_f)
            mask = (x2 > dyn_lo) & (x2 <= dyn_up)  # (B*n, n)
            vm = jnp.where(mask, v, 0.0)  # (B*n, n)
            a = dot(vm, w1t)  # (B*n, q): a[r, k] = sum_j vm[r, j] w1[k, j]
            gp = dot(replt, a * wfc)  # (B, q) per-day partial sums
            integ = dot(gp, ones_qn)  # (B, n): sum over q + lane broadcast
            # incremental CDF bookkeeping (`calc_var_class.py:237-246`)
            add = b_lo == pu
            res = jnp.where(add, pr + integ, pr - integ)
            us_n = res < obj_var
            lo_n = jnp.where(us_n, mid, lo)
            up_n = jnp.where(us_n, up, mid)
            return lo_n, up_n, res, mid, us_n.astype(lo.dtype)

        lo, up, _, _, _ = jax.lax.fori_loop(
            0, n_iters_per_level[lev], body,
            (lower, upper, prev_res, prev_up, ustack),
        )
        accs.append(0.5 * (lo + up))  # (B, n)
    out_ref[:, :] = jnp.concatenate(accs, axis=1) if len(accs) > 1 else accs[0]


def _clamp_day_block(day_block, T, n, q, L, vmem_budget=48 * 2 ** 20):
    """Largest valid B <= day_block whose resident VMEM footprint fits.

    B must be a MULTIPLE OF 8 (Mosaic requires the second-to-last block
    dim be sublane-divisible unless it equals the array dim; the day
    axis is padded to a B multiple anyway, so B=8 serves any T — the
    B=1 per-day shape is not lowerable on this toolchain). Resident f32
    blocks per program (x2 on the grid-indexed ones for double
    buffering): scal (B, L*9*ns), xow/v2 (B*n, n), wfc (B*n, q),
    repl/replt (B*n, B) x2, out (B, L*n). Without this clamp a large
    (num_points, day_block) pair fails Mosaic allocation with an obscure
    error instead of degrading gracefully (ADVICE r02).
    """
    ns = _lane_round(n)
    qp = max(q, 2)
    for B in range(max(8, (day_block // 8) * 8), 8 - 1, -8):
        byt = 4 * (
            2 * (B * L * 9 * ns)        # scal (double-buffered)
            + B * n * n                 # xow
            + 2 * (B * n * n)           # v2 (double-buffered)
            + 2 * (B * n * qp)          # wfc (double-buffered)
            + n * qp + n                # w1t, x
            + 2 * (B * n * B)           # repl, replt
            + 2 * (B * L * n)           # out (double-buffered)
        )
        if byt <= vmem_budget:
            return B
    return 8


def _solve_impl(scal, x, w0, w1, fcombos, day_tensors, n_iters, n_levels,
                box_min, interpret, day_block=32):
    """Traceable core of the fused solve (callable from a larger jit —
    `_full_solve` inlines it after the in-program bracketing stages).
    NaN-day semantics (ADVICE r03): a day whose tensor contains NaN gets
    NaN roots out, matching `masked_sandwich_integrals_blocked` — the
    tensor itself is zeroed before the kernel so it cannot contaminate
    its block-mates through the group-sum matmul."""
    f32 = jnp.float32
    T, n, _ = day_tensors.shape
    q = w0.shape[0]
    L = n_levels
    B = _clamp_day_block(day_block, T, n, q, L)
    pad = (-T) % B
    if pad:
        # replicate the last day; padded outputs are sliced off below
        def padT(a):
            return jnp.concatenate([a, jnp.repeat(a[-1:], pad, axis=0)])
    else:
        padT = lambda a: a
    Tp = T + pad
    w0 = jnp.asarray(w0, f32)
    w1 = jnp.asarray(w1, f32)
    if q == 1:
        # GARCH/mean-reverting family: pad the state axis to 2 lanes with
        # a zero-weight row — 1-lane matmul operands/outputs are exactly
        # the shape documented below as hanging the remote Mosaic backend
        # (ADVICE r02). The zero row contributes nothing to any sum.
        w0 = jnp.concatenate([w0, jnp.zeros_like(w0)], axis=0)
        w1 = jnp.concatenate([w1, jnp.zeros_like(w1)], axis=0)
        fcombos = jnp.pad(jnp.asarray(fcombos, f32).reshape(T, 1, 1),
                          ((0, 0), (0, 1), (0, 1))).reshape(T, 4)
        q = 2
    fc3 = padT(jnp.asarray(fcombos, f32).reshape(T, q, q))  # (Tp, q, q)
    # hoisted first contraction: wfc[t, i, k] = sum_s w0[s, i] fc[t, s, k]
    # (bounds-invariant, so it moves out of the per-iteration loop; the
    # kernel then needs ONE sandwich matmul per iteration instead of two)
    wfc = jnp.einsum("si,tsk->tik", w0, fc3).reshape(Tp * n, q)
    # NaN isolation: a NaN day tensor (reference-parity 0/0 densities)
    # would otherwise contaminate every day in its block through the
    # group-sum matmul (0 * NaN = NaN). Zero it here; those days'
    # roots are overwritten with NaN below (per-day NaN-in -> NaN-out
    # for every caller, not just the orchestrator's nan_days mask).
    raw = padT(jnp.asarray(day_tensors, f32))
    day_nan = jnp.any(~jnp.isfinite(raw), axis=(1, 2))  # (Tp,)
    v2 = jnp.nan_to_num(raw, nan=0.0, posinf=0.0, neginf=0.0).reshape(
        Tp * n, n
    )
    wfc = jnp.nan_to_num(wfc, nan=0.0, posinf=0.0, neginf=0.0)
    xv = jnp.asarray(x, f32)
    # outer coordinate per flattened row, at full lane width
    xow = jnp.broadcast_to(
        jnp.tile(xv, B).reshape(B * n, 1), (B * n, n)
    )
    repl = jnp.repeat(jnp.eye(B, dtype=f32), n, axis=0)  # (B*n, B)
    # per-day scalar state at full lane width, each of the L*9 column
    # groups padded to the 128-lane tile (ns) so every in-kernel slice
    # is tile-aligned (see _lane_round): (Tp, L*9*ns)
    ns = _lane_round(n)
    scal_wide = jnp.broadcast_to(
        padT(jnp.asarray(scal, f32).reshape(T, L, 9))[:, :, :, None],
        (Tp, L, 9, n),
    )
    scal_wide = jnp.pad(
        scal_wide, ((0, 0), (0, 0), (0, 0), (0, ns - n))
    ).reshape(Tp, L * 9 * ns)
    kernel = functools.partial(_solve_kernel, n_iters, n_levels, q, ns)
    out = pl.pallas_call(
        kernel,
        grid=(Tp // B,),
        in_specs=[
            pl.BlockSpec((B, L * 9 * ns), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B * n, n), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, q), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B * n, q), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B * n, n), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B * n, B), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, B * n), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, L * n), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, L * n), f32),
        interpret=interpret,
        # Mosaic's default scoped-vmem limit is 16 MB — production shapes
        # (n=100, B=32, double-buffered) sit exactly at that edge and the
        # fused full-solve program tipped over it. v5e has 128 MB VMEM;
        # raise the limit and let _clamp_day_block (budget 48 MB) keep
        # the resident footprint honest.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20
        ),
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
    # every lane of a level's n-wide group carries the same root
    roots = out.reshape(Tp, L, n)[:T, :, 0]
    return jnp.where(day_nan[:T, None], jnp.float32(jnp.nan), roots)


_solve = functools.partial(
    jax.jit,
    static_argnames=("n_iters", "n_levels", "interpret", "box_min",
                     "day_block"),
)(_solve_impl)


def bisection_solve_pallas_levels(day_tensors, w0, w1, fcombos, x, weights,
                                  lower, upper, prev_result, prev_upper,
                                  upper_stack, obj_vars, tolerance,
                                  box_min=-5.0, *, interpret=False,
                                  day_block=32):
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
        L, box_min, interpret, day_block,
    )  # (T, L)
    return np.asarray(out).T


def bisection_solve_pallas(day_tensors, w0, w1, fcombos, x, weights,
                           lower, upper, prev_result, prev_upper,
                           upper_stack, obj_var, tolerance,
                           box_min=-5.0, *, interpret=False, day_block=32):
    """(T,) bisection roots, one fused kernel launch (single level)."""
    return bisection_solve_pallas_levels(
        day_tensors, w0, w1, fcombos, x, weights,
        np.asarray(lower)[None, :], np.asarray(upper)[None, :],
        np.asarray(prev_result)[None, :], np.asarray(prev_upper)[None, :],
        np.asarray(upper_stack)[None, :], [obj_var], tolerance, box_min,
        interpret=interpret, day_block=day_block,
    )[0]


# ---------------------------------------------------------------------------
# Fully fused solve: stage-1 + stage-2 bracketing + bisection, ONE dispatch
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("n_iters", "n_levels", "box_min", "interpret",
                     "day_block", "quirks"),
)
def _full_solve(cfg, obj_vars, weights, x, w0, w1, fcombos, day_tensors,
                n_iters, n_levels, box_min, interpret, day_block, quirks):
    """ONE device program = the ENTIRE `calc_var` after prep: the stage-1
    CDF sweep over [-100, first_guess], each level's stage-2 refinement
    slab + bracket-state masks (`calc_var_class.py:111-155`, branch-free),
    and the fused VMEM-resident Pallas bisection. Replaces the 3 separate
    dispatches (2 host-driven sweeps + 1 kernel launch) the staged path
    pays — over a remote-TPU tunnel each launch costs ~25-45 ms, most of
    the previous headline's gap to device time (VERDICT r03 weak #1).

    cfg = [first_guess, sg0, sg1, min_var, max_var] (traced — changing the
    bracket values does not recompile); obj_vars (L,); weights (2,).
    Returns (roots (T, L) f32, nan_days (T,) bool).

    The stage sweeps run as XLA einsums over the same zeroed f32 day
    tensors the kernel consumes (identical mask semantics:
    `x_j > max(dyn_lo, box_min)`, `x_j <= dyn_up`), so the assembled
    bisection state matches the staged path to f32 rounding. The
    per-level iteration count is static at the worst-case span
    `max_var - min_var` (the bracket is data-dependent in-program);
    narrower brackets just keep halving — a no-op within tolerance.
    """
    f32 = jnp.float32
    T, n, _ = day_tensors.shape
    raw = jnp.asarray(day_tensors, f32)
    nan_days = jnp.any(~jnp.isfinite(raw), axis=(1, 2))
    v = jnp.nan_to_num(raw, nan=0.0, posinf=0.0, neginf=0.0)
    q = w0.shape[0]
    w0f = jnp.asarray(w0, f32)
    w1f = jnp.asarray(w1, f32)
    fc3 = jnp.nan_to_num(jnp.asarray(fcombos, f32)).reshape(T, q, q)
    # hoisted first contraction (bounds-invariant), shared by both stage
    # sweeps — same wfc the kernel uses per iteration
    wfc3 = jnp.einsum("si,tsk->tik", w0f, fc3)  # (T, n, q)
    xf = jnp.asarray(x, f32)
    # per-LEVEL portfolio weights: (L, 2). A plain (2,) broadcasts —
    # confidence-ladder semantics; distinct rows turn the level axis
    # into a PORTFOLIO batch (the day tensors are weight-independent,
    # so L portfolios share one HBM stream; the kernel already reads
    # w_in/w_out per level from the scalar state).
    wf = jnp.asarray(weights, f32)
    wf = jnp.broadcast_to(jnp.atleast_2d(wf), (n_levels, 2))
    cfgf = jnp.asarray(cfg, f32)
    fg, sg0, sg1 = cfgf[0], cfgf[1], cfgf[2]
    min_v, max_v = cfgf[3], cfgf[4]
    bmf = jnp.asarray(box_min, f32)
    objf = jnp.asarray(obj_vars, f32)

    def sweep(lo, up, w_in, w_out):
        # masked-sandwich slab integral, (T,) — the XLA mirror of one
        # kernel iteration: mask rows by the per-outer-coordinate
        # half-space band, contract against w1 then the hoisted wfc
        dyn_up = (up[:, None] - xf[None, :] * w_out) / w_in  # (T, n)
        dyn_lo = jnp.maximum(
            (lo[:, None] - xf[None, :] * w_out) / w_in, bmf
        )
        mask = (xf[None, None, :] > dyn_lo[:, :, None]) & (
            xf[None, None, :] <= dyn_up[:, :, None]
        )
        vm = jnp.where(mask, v, 0.0)
        a = jnp.einsum("tij,kj->tik", vm, w1f)
        return jnp.sum(a * wfc3, axis=(1, 2))

    # stage 1: slab [-100, first_guess] (`calc_var_class.py:116-121`) —
    # per level only when levels carry distinct portfolio weights
    # (XLA CSEs the identical sweeps in the shared-weights case)
    F1s = [
        sweep(jnp.full((T,), -100.0, f32), jnp.broadcast_to(fg, (T,)),
              wf[lev, 0], wf[lev, 1])
        for lev in range(n_levels)
    ]
    levels = []
    for lev in range(n_levels):
        obj = objf[lev]
        F1 = F1s[lev]
        w_in, w_out = wf[lev, 0], wf[lev, 1]
        # stage 2: refinement slab + incremental bookkeeping
        # (`calc_var_class.py:125-143`)
        new_lower = jnp.where(F1 >= obj, sg0, fg)
        new_upper = jnp.where(F1 < obj, sg1, fg)
        I2 = sweep(new_lower, new_upper, w_in, w_out)
        res = jnp.where(new_lower == fg, F1 + I2, F1 - I2)
        # DEFECT-FIXED anchor unless quirks (see VaRBacktest._bracket)
        anchor = fg if quirks else sg1
        prev_upper = jnp.where(new_lower == sg0, sg0, anchor)
        # bracket-state masks, applied in the reference's order
        # (`calc_var_class.py:144-155`); default = full bracket so ties
        # and NaN days keep a defined state
        lo_b = jnp.broadcast_to(min_v, (T,))
        hi_b = jnp.broadcast_to(max_v, (T,))
        m = res > obj
        lo_b = jnp.where(m, min_v, lo_b)
        hi_b = jnp.where(m, sg0, hi_b)
        m = (res < obj) & (new_upper == fg)
        lo_b = jnp.where(m, sg0, lo_b)
        hi_b = jnp.where(m, fg, hi_b)
        m = (res < obj) & (new_upper == sg1)
        lo_b = jnp.where(m, sg1, lo_b)
        hi_b = jnp.where(m, max_v, hi_b)
        m = (res > obj) & (new_upper == sg1)
        lo_b = jnp.where(m, fg, lo_b)
        hi_b = jnp.where(m, sg1, hi_b)
        ustack = ~((hi_b == sg0) | (hi_b == sg1))
        levels.append(jnp.stack(
            [
                lo_b, hi_b, res, prev_upper, ustack.astype(f32),
                jnp.broadcast_to(w_in, (T,)),
                jnp.broadcast_to(w_out, (T,)),
                jnp.broadcast_to(bmf, (T,)),
                jnp.broadcast_to(obj, (T,)),
            ],
            axis=-1,
        ))  # (T, 9)
    scal = jnp.stack(levels, axis=1)  # (T, L, 9)
    roots = _solve_impl(
        scal, xf, w0, w1, fcombos, v, n_iters, n_levels, box_min,
        interpret, day_block,
    )  # (T, L)
    return roots, nan_days


def _full_iters(n_levels, tolerance, min_var_value, max_var_value):
    span = max(float(max_var_value) - float(min_var_value), float(tolerance))
    it = max(1, int(math.ceil(math.log2(span / float(tolerance)))))
    return (it,) * n_levels


def full_solve_pallas_levels(day_tensors, w0, w1, fcombos, x, weights,
                             obj_vars, first_guess=-3.0,
                             second_guess=(-3.5, -2.0), tolerance=1e-6,
                             min_var_value=-7.5, max_var_value=0.0,
                             box_min=-5.0, *, interpret=False, day_block=32,
                             reference_quirks=False):
    """The ENTIRE multi-level VaR solve in ONE device dispatch.

    Unlike `bisection_solve_pallas_levels` (which takes pre-bracketed
    state), this takes the user-facing solver config and performs the
    stage-1/stage-2 bracketing in-program. Returns
    (roots (L, T) f32, nan_days (T,) bool).
    """
    obj_vars = np.atleast_1d(np.asarray(obj_vars, dtype=np.float64))
    L = obj_vars.shape[0]
    cfg = np.array(
        [first_guess, second_guess[0], second_guess[1], min_var_value,
         max_var_value],
        dtype=np.float64,
    )
    roots, nan_days = _full_solve(
        cfg, obj_vars, np.asarray(weights, np.float64), x, w0, w1, fcombos,
        day_tensors,
        n_iters=_full_iters(L, tolerance, min_var_value, max_var_value),
        n_levels=L, box_min=float(box_min), interpret=bool(interpret),
        day_block=int(day_block), quirks=bool(reference_quirks),
    )
    # ONE batched host fetch: two eager np.asarray calls would cost two
    # device->host round trips over a remote-TPU tunnel
    roots, nan_days = jax.device_get((roots, nan_days))
    return np.asarray(roots).T, np.asarray(nan_days)


def msm_full_solve_pallas_levels(day_tensors, forecast_combos, x, dx,
                                 densities, weights, obj_vars, **kw):
    """Fully fused multi-level solve, MSM family: ONE dispatch."""
    w0, w1 = _msm_w01(densities, dx)
    return full_solve_pallas_levels(
        day_tensors, w0, w1, forecast_combos, x, weights, obj_vars, **kw
    )


def garch_full_solve_pallas_levels(day_tensors, x, dx, weights, obj_vars,
                                   **kw):
    """Fully fused multi-level solve, GARCH/mean-reverting family (q=1)."""
    T = day_tensors.shape[0]
    dx_row = jnp.asarray(dx)[None, :]
    ones = np.ones((T, 1))
    return full_solve_pallas_levels(
        day_tensors, dx_row, dx_row, ones, x, weights, obj_vars, **kw
    )


def _msm_w01(densities, dx):
    densities = jnp.asarray(densities)
    dx = jnp.asarray(dx)
    # rotated density rows as in `create_grids.py:121,143`
    return densities[1] * dx[None, :], densities[0] * dx[None, :]


def msm_solve_pallas(day_tensors, forecast_combos, x, dx, densities, weights,
                     lower, upper, prev_result, prev_upper, upper_stack,
                     obj_var, tolerance, box_min=-5.0, *, interpret=False,
                     day_block=32):
    """Fused solve, MSM family (single confidence level)."""
    w0, w1 = _msm_w01(densities, dx)
    return bisection_solve_pallas(
        day_tensors, w0, w1, forecast_combos, x, weights, lower, upper,
        prev_result, prev_upper, upper_stack, obj_var, tolerance, box_min,
        interpret=interpret, day_block=day_block,
    )


def msm_solve_pallas_levels(day_tensors, forecast_combos, x, dx, densities,
                            weights, lower, upper, prev_result, prev_upper,
                            upper_stack, obj_vars, tolerance, box_min=-5.0,
                            *, interpret=False, day_block=32):
    """Fused multi-level solve, MSM family: (L, T) roots in one launch."""
    w0, w1 = _msm_w01(densities, dx)
    return bisection_solve_pallas_levels(
        day_tensors, w0, w1, forecast_combos, x, weights, lower, upper,
        prev_result, prev_upper, upper_stack, obj_vars, tolerance, box_min,
        interpret=interpret, day_block=day_block,
    )


def garch_solve_pallas(day_tensors, x, dx, weights, lower, upper,
                       prev_result, prev_upper, upper_stack, obj_var,
                       tolerance, box_min=-5.0, *, interpret=False,
                       day_block=32):
    """Fused solve, GARCH/mean-reverting family (q = 1)."""
    T = day_tensors.shape[0]
    dx_row = jnp.asarray(dx)[None, :]
    ones = np.ones((T, 1))
    return bisection_solve_pallas(
        day_tensors, dx_row, dx_row, ones, x, weights, lower, upper,
        prev_result, prev_upper, upper_stack, obj_var, tolerance, box_min,
        interpret=interpret, day_block=day_block,
    )


def garch_solve_pallas_levels(day_tensors, x, dx, weights, lower, upper,
                              prev_result, prev_upper, upper_stack,
                              obj_vars, tolerance, box_min=-5.0, *,
                              interpret=False, day_block=32):
    """Fused multi-level solve, GARCH/mean-reverting family (q = 1)."""
    T = day_tensors.shape[0]
    dx_row = jnp.asarray(dx)[None, :]
    ones = np.ones((T, 1))
    return bisection_solve_pallas_levels(
        day_tensors, dx_row, dx_row, ones, x, weights, lower, upper,
        prev_result, prev_upper, upper_stack, obj_vars, tolerance, box_min,
        interpret=interpret, day_block=day_block,
    )


# ---------------------------------------------------------------------------
# Day-sharded fused solve: shard_map of the fused kernel over a mesh
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _sharded_solve_program(mesh, n_iters, n_levels, box_min, interpret,
                           day_block):
    """Stable-identity jitted shard_map of the fused solve: cached per
    (mesh, iteration schedule, config), so repeat solves dispatch the
    compiled program instead of re-tracing a fresh closure every call
    (measured 2.4 s/solve of pure retrace overhead without this).
    Bounded (ADVICE r03): the n_iters key is span-derived, so a
    long-lived session with many distinct spans would otherwise retain
    unbounded compiled programs + their Mesh objects."""
    from jax.sharding import PartitionSpec as P

    def local_solve(scal_l, fc_l, v_l, x_a, w0_a, w1_a):
        return _solve(
            scal_l, x_a, w0_a, w1_a, fc_l, v_l, n_iters=n_iters,
            n_levels=n_levels, box_min=box_min, interpret=interpret,
            day_block=day_block,
        )

    return jax.jit(jax.shard_map(
        local_solve, mesh=mesh,
        in_specs=(P("days"), P("days"), P("days"), P(), P(), P()),
        out_specs=P("days"),
        check_vma=False,
    ))


def bisection_solve_pallas_levels_sharded(
    mesh, day_tensors, w0, w1, fcombos, x, weights, lower, upper,
    prev_result, prev_upper, upper_stack, obj_vars, tolerance,
    box_min=-5.0, *, interpret=False, day_block=32,
):
    """(L, T) roots with the day axis SHARDED over `mesh` ('days' axis):
    every device runs the fused VMEM-resident bisection
    (`_solve_kernel`) on its own day shard via `jax.shard_map`. Each
    day's bisection is independent, so the program needs ZERO
    cross-device collectives — weak scaling is exact by construction,
    and per-device HBM only ever holds its own (T/D, n, n) shard (the
    pod-scale answer to the reference's ~24 host-driven sweeps,
    `calc_var_class.py:250-309`, when T outgrows one chip's HBM).

    `day_tensors` may be the raw (T, n, n) array or the orchestrator's
    already-padded day-sharded global array ((Tp, n, n), Tp a multiple
    of the mesh size). Returns host-replicated (L, T) roots.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from copula_var_tpu.parallel.multiprocess import fetch, put_global

    lower = np.atleast_2d(np.asarray(lower, dtype=np.float64))
    upper = np.atleast_2d(np.asarray(upper, dtype=np.float64))
    obj_vars = np.atleast_1d(np.asarray(obj_vars, dtype=np.float64))
    L, T = lower.shape
    if obj_vars.shape[0] != L:
        raise ValueError(
            f"obj_vars has {obj_vars.shape[0]} levels but the bisection "
            f"state carries L={L} (lower/upper shape {lower.shape})"
        )
    n_dev = mesh.shape["days"]
    Tp = T + ((-T) % n_dev)
    if float(np.max(upper - lower)) <= tolerance:
        return np.asarray((lower + upper) / 2.0, dtype=np.float32)
    n_iters = tuple(
        max(1, int(math.ceil(
            math.log2(max(float(np.max(upper[l] - lower[l])), tolerance)
                      / tolerance))))
        for l in range(L)
    )
    scal = np.stack(
        [
            lower,
            upper,
            np.broadcast_to(np.asarray(prev_result, dtype=np.float64), (L, T)),
            np.broadcast_to(np.asarray(prev_upper, dtype=np.float64), (L, T)),
            np.broadcast_to(np.asarray(upper_stack, dtype=np.float64), (L, T)),
            np.full((L, T), float(weights[0])),
            np.full((L, T), float(weights[1])),
            np.full((L, T), float(box_min)),
            np.broadcast_to(obj_vars[:, None], (L, T)),
        ],
        axis=-1,
    )  # (L, T, 9)

    def pad_np(a):  # repeat the final day; outputs sliced off below
        if Tp == a.shape[0]:
            return a
        return np.concatenate([a, np.repeat(a[-1:], Tp - a.shape[0], axis=0)])

    d = NamedSharding(mesh, P("days"))
    # Single-process: hand HOST arrays straight to the jitted shard_map —
    # its dispatch batches all placements in one transport round trip.
    # Eager per-array device_puts here cost one blocking RPC each over a
    # remote-TPU tunnel (measured ~0.5 s of pure transfer latency per
    # solve). Multi-process: put_global builds proper global arrays.
    place = (
        (lambda a: put_global(a, d)) if jax.process_count() > 1
        else (lambda a: a)
    )
    scal_s = place(pad_np(np.swapaxes(scal, 0, 1)))  # (Tp, L, 9)
    q = np.asarray(w0).shape[0]
    fc_s = place(
        pad_np(np.asarray(fcombos, dtype=np.float32).reshape(T, q * q))
    )
    if isinstance(day_tensors, jax.Array) and day_tensors.shape[0] == Tp:
        v_s = put_global(day_tensors, d)  # pre-placed cache: passthrough
    elif day_tensors.shape[0] == T:
        v_s = place(pad_np(np.asarray(day_tensors, np.float32)))
    elif day_tensors.shape[0] == Tp:
        v_s = place(np.asarray(day_tensors, np.float32))
    else:
        raise ValueError(
            f"day_tensors has {day_tensors.shape[0]} days; expected T={T} "
            f"or padded Tp={Tp} for the {n_dev}-device mesh"
        )

    f = _sharded_solve_program(
        mesh, n_iters, L, float(box_min), bool(interpret), int(day_block)
    )
    out = f(
        scal_s, fc_s, v_s, jnp.asarray(x, jnp.float32),
        jnp.asarray(w0, jnp.float32), jnp.asarray(w1, jnp.float32),
    )  # (Tp, L)
    return fetch(out)[:T].T


def msm_solve_pallas_levels_sharded(mesh, day_tensors, forecast_combos, x,
                                    dx, densities, weights, lower, upper,
                                    prev_result, prev_upper, upper_stack,
                                    obj_vars, tolerance, box_min=-5.0, *,
                                    interpret=False, day_block=32):
    """Day-sharded fused multi-level solve, MSM family."""
    w0, w1 = _msm_w01(densities, dx)
    return bisection_solve_pallas_levels_sharded(
        mesh, day_tensors, w0, w1, forecast_combos, x, weights, lower,
        upper, prev_result, prev_upper, upper_stack, obj_vars, tolerance,
        box_min, interpret=interpret, day_block=day_block,
    )


def garch_solve_pallas_levels_sharded(mesh, day_tensors, x, dx, weights,
                                      lower, upper, prev_result, prev_upper,
                                      upper_stack, obj_vars, tolerance,
                                      box_min=-5.0, *, interpret=False,
                                      day_block=32):
    """Day-sharded fused multi-level solve, GARCH/mean-reverting (q=1)."""
    # combo weights sized to the UNPADDED day count (day_tensors may be
    # the orchestrator's padded cache)
    T = np.atleast_2d(np.asarray(lower)).shape[-1]
    dx_row = jnp.asarray(dx)[None, :]
    ones = np.ones((T, 1))
    return bisection_solve_pallas_levels_sharded(
        mesh, day_tensors, dx_row, dx_row, ones, x, weights, lower, upper,
        prev_result, prev_upper, upper_stack, obj_vars, tolerance, box_min,
        interpret=interpret, day_block=day_block,
    )


# ---------------------------------------------------------------------------
# Day-sharded FULLY fused solve: bracketing + bisection per shard, 1 dispatch
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _sharded_full_program(mesh, n_iters, n_levels, box_min, interpret,
                          day_block, quirks):
    """Stable-identity jitted shard_map of `_full_solve`: every device
    runs the stage-1/stage-2 bracketing AND the fused bisection on its
    own day shard — both are purely per-day, so the whole multi-level
    solve stays ZERO-collective. Keyed on config only (the iteration
    schedule is span-of-config-derived, not data-derived), so the cache
    is naturally tiny."""
    from jax.sharding import PartitionSpec as P

    def local(cfg, obj, wts, x_a, w0_a, w1_a, fc_l, v_l):
        return _full_solve(
            cfg, obj, wts, x_a, w0_a, w1_a, fc_l, v_l,
            n_iters=n_iters, n_levels=n_levels, box_min=box_min,
            interpret=interpret, day_block=day_block, quirks=quirks,
        )

    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P("days"), P("days")),
        out_specs=(P("days"), P("days")),
        check_vma=False,
    ))


def full_solve_pallas_levels_sharded(
    mesh, day_tensors, w0, w1, fcombos, x, weights, obj_vars,
    first_guess=-3.0, second_guess=(-3.5, -2.0), tolerance=1e-6,
    min_var_value=-7.5, max_var_value=0.0, box_min=-5.0, *,
    interpret=False, day_block=32, reference_quirks=False,
):
    """The ENTIRE multi-level VaR solve, day-sharded over `mesh`, in ONE
    dispatch: `jax.shard_map` of the fully fused program
    (`_full_solve`) — stage sweeps, bracket-state masks, and the
    VMEM-resident bisection all run on each device's own day shard with
    zero cross-device collectives. Returns (roots (L, T), nan_days (T,)).

    `day_tensors` may be raw (T, n, n) or the orchestrator's pre-placed
    padded global ((Tp, n, n), Tp a mesh-size multiple)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from copula_var_tpu.parallel.multiprocess import fetch, put_global

    obj_vars = np.atleast_1d(np.asarray(obj_vars, dtype=np.float64))
    L = obj_vars.shape[0]
    n_dev = mesh.shape["days"]
    q = np.asarray(w0).shape[0]
    T = np.asarray(fcombos).shape[0]
    Tp = T + ((-T) % n_dev)

    def pad_np(a):
        if Tp == a.shape[0]:
            return a
        return np.concatenate([a, np.repeat(a[-1:], Tp - a.shape[0], axis=0)])

    d = NamedSharding(mesh, P("days"))
    place = (
        (lambda a: put_global(a, d)) if jax.process_count() > 1
        else (lambda a: a)
    )
    fc_s = place(
        pad_np(np.asarray(fcombos, dtype=np.float32).reshape(T, q * q))
    )
    if isinstance(day_tensors, jax.Array) and day_tensors.shape[0] == Tp:
        v_s = put_global(day_tensors, d)  # pre-placed cache: passthrough
    elif day_tensors.shape[0] == T:
        v_s = place(pad_np(np.asarray(day_tensors, np.float32)))
    elif day_tensors.shape[0] == Tp:
        v_s = place(np.asarray(day_tensors, np.float32))
    else:
        raise ValueError(
            f"day_tensors has {day_tensors.shape[0]} days; expected T={T} "
            f"or padded Tp={Tp} for the {n_dev}-device mesh"
        )
    cfg = np.array(
        [first_guess, second_guess[0], second_guess[1], min_var_value,
         max_var_value],
        dtype=np.float64,
    )
    f = _sharded_full_program(
        mesh, _full_iters(L, tolerance, min_var_value, max_var_value), L,
        float(box_min), bool(interpret), int(day_block),
        bool(reference_quirks),
    )
    roots, nan_days = f(
        cfg, obj_vars, np.asarray(weights, np.float64),
        jnp.asarray(x, jnp.float32), jnp.asarray(w0, jnp.float32),
        jnp.asarray(w1, jnp.float32), fc_s, v_s,
    )  # (Tp, L), (Tp,)
    return fetch(roots)[:T].T, fetch(nan_days)[:T]


def msm_full_solve_pallas_levels_sharded(mesh, day_tensors, forecast_combos,
                                         x, dx, densities, weights, obj_vars,
                                         **kw):
    """Day-sharded fully fused multi-level solve, MSM family."""
    w0, w1 = _msm_w01(densities, dx)
    return full_solve_pallas_levels_sharded(
        mesh, day_tensors, w0, w1, forecast_combos, x, weights, obj_vars,
        **kw
    )


def garch_full_solve_pallas_levels_sharded(mesh, day_tensors, x, dx, weights,
                                           obj_vars, T=None, **kw):
    """Day-sharded fully fused multi-level solve, GARCH/MR family (q=1).
    `T` = unpadded day count (required when day_tensors is the padded
    cache; defaults to day_tensors.shape[0])."""
    if T is None:
        T = day_tensors.shape[0]
    dx_row = jnp.asarray(dx)[None, :]
    ones = np.ones((T, 1))
    return full_solve_pallas_levels_sharded(
        mesh, day_tensors, dx_row, dx_row, ones, x, weights, obj_vars, **kw
    )
