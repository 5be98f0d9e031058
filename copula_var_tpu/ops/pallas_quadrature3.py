"""Pallas TPU kernel: fused dim-3 masked quadrature (transform-cached).

Extends the flagship fused engine to three assets. The dim-2 engine caches
full (T, n, n) copula-density day tensors; at dim 3 those would be
(T, n^3) — 2 GB at T=500, n=100 — so this kernel instead keeps each day's
per-coordinate transform columns (the ppf work, a few KB) VMEM-resident
and rebuilds the density grid slab by slab:

  For outer coordinate x0 = x[i0], the (n, n) slab over (x1, x2) is
    C(x1, x2 | x0)  — copula density from per-dim columns (VPU),
    masked by the half-space cut lower < w.x <= upper resolved on x2
    (`create_grids.py:102-110` semantics),
  then contracted on the MXU:  S = W1 (C .* M) W2^T  (q, q).

The (q0, q1, q2) state reduction never materializes: the outer-dim weight
rows W0 and the per-day joint combo probabilities (`msm_estimation.py:
368-418`) fold into a bounds-INVARIANT per-day tensor
  G[t, i0, b, c] = sum_a W0[a, i0] * FC[t, a, b, c]
precomputed once per backtest, so each slab finishes with one (q, q)
elementwise dot — no 3-D reshapes inside the kernel (Mosaic-friendly).

Per-day cost: n MXU sandwiches (q, n) x (n, n) x (n, q). Everything per
day lives in VMEM (~n^2 f32 slab + columns, << 16 MB); the only HBM
traffic per day is the transform columns and G — the n^3 grid is never
written anywhere.

f32 kernel (TPU Pallas has no f64); same accuracy caveats as the dim-2
kernel (`ops/pallas_quadrature.py:12-17`).

Parity notes: rotated density rows (`create_grids.py:121,143`) give
W0 = densities[2] dx, W1 = densities[0] dx, W2 = densities[1] dx; the
GARCH/mean-reverting family applies nan_to_num to (copula * pdf-product)
BEFORE the mask (`garch_integration_function.py:43-51`), the MSM family
applies no nan handling (`msm_integration_function.py:38-47`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.scipy.special import gammaln

from copula_var_tpu.ops.quadrature import (
    CopulaSpec,
    state_weight_matrices,
    transform_u_columns,
)

BOX_MIN = -5.0


def _chol_inv_logdet_np(corr):
    corr = np.asarray(corr, dtype=np.float64)
    L = np.linalg.cholesky(corr)
    inv_L = np.linalg.solve(L, np.eye(corr.shape[0]))
    return inv_L.T @ inv_L, 2.0 * float(np.sum(np.log(np.diag(L))))


def _copula_consts(spec: CopulaSpec) -> np.ndarray:
    """(8,) f32 copula constants: [s00, s11, s22, s01, s02, s12, cterm, nu].

    cterm: gaussian -> -0.5 logdet; student -> the log-MVT normalizer
    incl. -0.5 logdet (`student.py:106-143` at d=3)."""
    if spec.kind == "gaussian":
        (corr,) = spec.params
        sigma_inv, logdet = _chol_inv_logdet_np(corr)
        cterm, nu = -0.5 * logdet, 0.0
    elif spec.kind == "student":
        nu, corr = spec.params
        nu = float(nu)
        sigma_inv, logdet = _chol_inv_logdet_np(corr)
        cterm = float(
            gammaln((nu + 3.0) / 2.0)
            - gammaln(nu / 2.0)
            - 1.5 * np.log(nu * np.pi)
            - 0.5 * logdet
        )
    else:
        raise ValueError(f"dim-3 pallas engine: unsupported copula {spec.kind}")
    s = sigma_inv
    return np.array(
        [s[0, 0], s[1, 1], s[2, 2], s[0, 1], s[0, 2], s[1, 2], cterm, nu],
        dtype=np.float32,
    )


def _kernel3(kind: str, nan2num: bool, n: int, q: int):
    """Build the per-day kernel body (kind/nan2num/q/n are static)."""

    def kernel(b_ref, x_ref, z_ref, f_ref, lu_ref, p_ref, w1_ref, w2_ref,
               g_ref, c_ref, out_ref):
        lower = b_ref[0, 0, 0]
        upper = b_ref[0, 0, 1]
        w_in = b_ref[0, 0, 2]   # weights[0] -> innermost grid dim (x2)
        w_o1 = b_ref[0, 0, 3]   # weights[1] -> outer dim 0 (x0)
        w_o2 = b_ref[0, 0, 4]   # weights[2] -> outer dim 1 (x1)
        box_min = b_ref[0, 0, 5]

        s00 = c_ref[0, 0]
        s11 = c_ref[0, 1]
        s22 = c_ref[0, 2]
        s01 = c_ref[0, 3]
        s02 = c_ref[0, 4]
        s12 = c_ref[0, 5]
        cterm = c_ref[0, 6]
        nu = c_ref[0, 7]

        x = x_ref[0, :]            # (n,)
        z0r = z_ref[0, 0, :]
        z1 = z_ref[0, 1, :][:, None]   # (n, 1) -> x1 rows
        z2 = z_ref[0, 2, :][None, :]   # (1, n) -> x2 cols
        p0r = p_ref[0, 0, :]
        p1 = p_ref[0, 1, :][:, None]
        p2 = p_ref[0, 2, :][None, :]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)[0, :]

        if kind == "student":
            f0r = f_ref[0, 0, :]
            lu0r = lu_ref[0, 0, :]
            fin12 = (f_ref[0, 1, :][:, None] > 0.5) & (
                f_ref[0, 2, :][None, :] > 0.5
            )
            lu12 = lu_ref[0, 1, :][:, None] + lu_ref[0, 2, :][None, :]

        # bounds-independent pieces of the quadratic form
        quad12 = (
            s11 * z1 * z1 + s22 * z2 * z2 + 2.0 * s12 * z1 * z2
        )  # (n, n)
        cross1 = 2.0 * (s01 * z1 + s02 * z2)  # coefficient of z0 (n, n)
        xs_row = x[None, :]  # (1, n) inner coordinates

        def slab(i0, acc):
            sel = (lane == i0).astype(jnp.float32)  # one-hot (n,)
            z0 = jnp.sum(z0r * sel)
            x0 = jnp.sum(x * sel)
            p0 = jnp.sum(p0r * sel)
            quad = quad12 + z0 * cross1 + s00 * z0 * z0
            if kind == "student":
                lu0 = jnp.sum(lu0r * sel)
                logc = (
                    cterm
                    - 0.5 * (nu + 3.0) * jnp.log1p(quad / nu)
                    - lu0
                    - lu12
                )
                C = jnp.exp(logc)
                f0 = jnp.sum(f0r * sel) > 0.5
                fin = fin12 & f0
                C = jnp.where(fin, C, jnp.nan)
            else:  # gaussian
                sum_z2 = z0 * z0 + z1 * z1 + z2 * z2
                C = jnp.exp(cterm - 0.5 * quad + 0.5 * sum_z2)
            V = C * (p0 * p1 * p2)
            if nan2num:
                V = jnp.nan_to_num(V)
            prev = x0 * w_o1 + x[:, None] * w_o2  # (n, 1)
            dyn_up = (upper - prev) / w_in
            dyn_lo = jnp.maximum((lower - prev) / w_in, box_min)
            M = (xs_row > dyn_lo) & (xs_row <= dyn_up)
            V = jnp.where(M, V, 0.0)
            left = jnp.dot(w1_ref[:, :], V, preferred_element_type=jnp.float32)
            S = jnp.dot(left, w2_ref[:, :].T,
                        preferred_element_type=jnp.float32)  # (q, q)
            g = g_ref[0, pl.ds(i0 * q, q), :]  # (q, q)
            return acc + jnp.sum(S * g)

        acc = jax.lax.fori_loop(0, n, slab, jnp.float32(0.0))
        out_ref[0, :, :] = acc.reshape(1, 1)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("kind", "nan2num", "interpret", "box_min")
)
def masked_contract3_integrals(bounds, x, z_cols, f_cols, lu_cols, p_cols,
                               w1, w2, g, consts, weights, *, kind,
                               nan2num, interpret=False, box_min=BOX_MIN):
    """(T,) dim-3 integrals, one fused Pallas program per day.

    bounds (T, 2); x (n,); z/f/lu/p cols (T, 3, n) per-day per-dim
    columns; w1/w2 (q, n) inner-dim state-weight rows; g (T, n*q, q) the
    precomputed outer-weight x combo contraction; consts (8,); weights (3,).
    """
    f32 = jnp.float32
    T = bounds.shape[0]
    n = x.shape[0]
    q = w1.shape[0]
    packed = jnp.concatenate(
        [
            jnp.asarray(bounds, f32),
            jnp.broadcast_to(jnp.asarray(weights, f32)[None, :], (T, 3)),
            jnp.full((T, 1), box_min, dtype=f32),
        ],
        axis=1,
    ).reshape(T, 1, 6)
    return pl.pallas_call(
        _kernel3(kind, nan2num, n, q),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, 6), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q, n), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q, n), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n * q, q), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, 1, 1), f32),
        interpret=interpret,
    )(
        packed,
        jnp.asarray(x, f32).reshape(1, n),
        jnp.asarray(z_cols, f32),
        jnp.asarray(f_cols, f32),
        jnp.asarray(lu_cols, f32),
        jnp.asarray(p_cols, f32),
        jnp.asarray(w1, f32),
        jnp.asarray(w2, f32),
        jnp.asarray(g, f32),
        jnp.asarray(consts, f32).reshape(1, 8),
    )[:, 0, 0]


def _split_transform(cols, spec: CopulaSpec, T: int, n: int):
    """(z, fin, lu) each (T, 3, n) f32 from a per-day transform pytree
    (gaussian has no fin/lu -> ones/zeros)."""
    if spec.kind == "student":
        z, fin, lu = cols
        return (
            jnp.asarray(z, jnp.float32),
            jnp.asarray(fin).astype(jnp.float32),
            jnp.asarray(lu, jnp.float32),
        )
    (z,) = cols
    shape = (T, 3, n)
    return (
        jnp.asarray(z, jnp.float32),
        jnp.ones(shape, jnp.float32),
        jnp.zeros(shape, jnp.float32),
    )


def _desaturate_f32(u):
    """Shared f32 CDF desaturation (`ops/quadrature.desaturate_f32`)."""
    from copula_var_tpu.ops.quadrature import desaturate_f32

    return desaturate_f32(u)


class Dim3Cache:
    """Bounds-invariant per-backtest device buffers for the dim-3 engine."""

    def __init__(self, x, z, f, lu, p, w1, w2, g, consts, weights):
        self.x, self.z, self.f, self.lu, self.p = x, z, f, lu, p
        self.w1, self.w2, self.g = w1, w2, g
        self.consts, self.weights = consts, weights


def build_msm_dim3_cache(forecasts_by_states, forecast_combos, x, dx,
                         densities, unique_vols, weights,
                         spec: CopulaSpec) -> Dim3Cache:
    """MSM-family cache from raw integration inputs: per-day mixture-CDF
    columns (f32-desaturated) -> copula transforms, unit pdf columns,
    rotated-density weight rows, and the G contraction
    G[t, i0, b, c] = sum_a W0[a, i0] FC[t, a, b, c]."""
    from copula_var_tpu.ops.special import norm_cdf

    x = jnp.asarray(x)
    fbs = jnp.asarray(forecasts_by_states)
    unique_vols = jnp.asarray(unique_vols)
    T = fbs.shape[0]
    n = x.shape[0]

    def one_day(f):
        u = jnp.sum(
            f[:, :, None] * norm_cdf(x[None, None, :] / unique_vols[:, :, None]),
            axis=1,
        )
        return transform_u_columns(_desaturate_f32(u), spec)

    cols = jax.vmap(one_day)(fbs)
    z, f, lu = _split_transform(cols, spec, T, n)
    p = jnp.ones((T, 3, n), jnp.float32)
    w_cols = state_weight_matrices(densities, jnp.asarray(dx))
    q = w_cols[0].shape[0]
    fc = jnp.asarray(forecast_combos).reshape(T, q, q, q)
    g = jnp.einsum("ai,tabc->tibc", jnp.asarray(w_cols[0]), fc)
    g = jnp.asarray(g, jnp.float32).reshape(T, n * q, q)
    return Dim3Cache(
        x, z, f, lu, p, w_cols[1], w_cols[2], g, _copula_consts(spec),
        jnp.asarray(weights),
    )


def build_garch_dim3_cache(forecast_vols, x, dx, weights,
                           spec: CopulaSpec) -> Dim3Cache:
    """GARCH/mean-reverting cache (q = 1) from raw per-day forecast vols:
    f32-desaturated CDF columns -> transforms, pdf columns, dx weight
    rows, G = dx broadcast over days."""
    from copula_var_tpu.ops.special import norm_cdf, norm_pdf

    x = jnp.asarray(x)
    dx = jnp.asarray(dx)
    fv = jnp.asarray(forecast_vols)
    T = fv.shape[0]
    n = x.shape[0]

    def one_day(v):
        u = norm_cdf(x[None, :] / v[:, None])
        p_col = norm_pdf(x[None, :] / v[:, None]) / v[:, None]
        return transform_u_columns(_desaturate_f32(u), spec), p_col

    cols, p_cols = jax.vmap(one_day)(fv)
    p = jnp.asarray(p_cols, jnp.float32)
    z, f, lu = _split_transform(cols, spec, T, n)
    w_row = dx[None, :]
    g = jnp.broadcast_to(
        jnp.asarray(dx, jnp.float32)[None, :, None], (T, n, 1)
    )
    return Dim3Cache(
        x, z, f, lu, p, w_row, w_row, g, _copula_consts(spec),
        jnp.asarray(weights),
    )


def dim3_integrals_pallas(bounds, cache: Dim3Cache, *, family: str,
                          kind: str, interpret=False, box_min=BOX_MIN):
    """(T,) integrals from a Dim3Cache. family 'msm' (no nan handling) or
    'garch' (nan_to_num before mask)."""
    return masked_contract3_integrals(
        jnp.asarray(bounds), cache.x, cache.z, cache.f, cache.lu, cache.p,
        cache.w1, cache.w2, cache.g, cache.consts, cache.weights,
        kind=kind, nan2num=(family == "garch"), interpret=interpret,
        box_min=box_min,
    )


def msm_day_transform_columns(forecasts_by_states, x, unique_vols,
                              spec: CopulaSpec):
    """Per-day transform columns for the MSM family (same math as
    `ops.quadrature.msm_day_columns`; re-exported for symmetry)."""
    from copula_var_tpu.ops.quadrature import msm_day_columns

    return msm_day_columns(forecasts_by_states, x, unique_vols, spec)


__all__ = [
    "Dim3Cache",
    "build_garch_dim3_cache",
    "build_msm_dim3_cache",
    "dim3_integrals_pallas",
    "masked_contract3_integrals",
    "transform_u_columns",
]
