"""Fused dim-3 Pallas quadrature engine vs the XLA transform-cached path.

The dim-2 flagship engine caches (T, n, n) day tensors; dim 3 rebuilds
density slabs in VMEM from per-coordinate transform columns
(`ops/pallas_quadrature3.py`). Interpret mode runs the same kernel on the
CPU test mesh; parity target is f32 accuracy (~1e-5 relative) against the
f64 XLA engine, which itself is golden-tested against the reference
(`tests/test_quadrature.py`, `tests/test_stats_dim3.py`).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from copula_var_tpu.ops.grids import garch_grid, msm_grid
from copula_var_tpu.ops.pallas_quadrature3 import (
    build_garch_dim3_cache,
    build_msm_dim3_cache,
    dim3_integrals_pallas,
)
from copula_var_tpu.ops.quadrature import (
    CopulaSpec,
    garch_day_columns,
    garch_integrals_tcached,
    msm_day_columns,
    msm_integrals_tcached,
)

CORR3 = np.array(
    [[1.0, 0.45, 0.25], [0.45, 1.0, 0.35], [0.25, 0.35, 1.0]]
)
W3 = np.array([0.5, 0.3, 0.2])


def _msm3_problem(rng, T=6, n=24, q=3):
    uvols = np.sort(rng.uniform(0.6, 1.4, size=(3, q)), axis=1)
    x, dx = msm_grid(n)
    dens = np.exp(-0.5 * (x[None, None, :] / uvols[:, :, None]) ** 2) / (
        np.sqrt(2 * np.pi) * uvols[:, :, None]
    )
    fbs = rng.uniform(0.1, 1.0, size=(T, 3, q))
    fbs /= fbs.sum(axis=2, keepdims=True)
    fcombos = np.einsum("ti,tj,tk->tijk", fbs[:, 0], fbs[:, 1],
                        fbs[:, 2]).reshape(T, -1)
    bounds = np.column_stack([np.full(T, -100.0), rng.uniform(-3, -0.5, T)])
    return bounds, fbs, fcombos, x, dx, dens, uvols


@pytest.mark.parametrize(
    "copula",
    [pytest.param("student", marks=pytest.mark.slow), "gaussian"],
)
def test_dim3_pallas_msm_matches_tcached(rng, copula):
    bounds, fbs, fcombos, x, dx, dens, uvols = _msm3_problem(rng)
    params = (
        (6.0, jnp.asarray(CORR3)) if copula == "student"
        else (jnp.asarray(CORR3),)
    )
    spec = CopulaSpec(copula, params)
    cols = msm_day_columns(fbs, x, uvols, spec)
    want = np.asarray(
        msm_integrals_tcached(bounds, cols, fcombos, x, dx, dens, W3, spec)
    )
    cache = build_msm_dim3_cache(fbs, fcombos, x, dx, dens, uvols, W3, spec)
    got = np.asarray(
        dim3_integrals_pallas(bounds, cache, family="msm", kind=copula,
                              interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=1e-8)


@pytest.mark.parametrize(
    "copula",
    [pytest.param("student", marks=pytest.mark.slow), "gaussian"],
)
def test_dim3_pallas_garch_matches_tcached(rng, copula):
    T, n = 5, 24
    x, dx = garch_grid(n)
    fv = rng.uniform(0.7, 1.4, size=(T, 3))
    bounds = np.column_stack([np.full(T, -100.0), rng.uniform(-3, -0.5, T)])
    params = (
        (6.0, jnp.asarray(CORR3)) if copula == "student"
        else (jnp.asarray(CORR3),)
    )
    spec = CopulaSpec(copula, params)
    cols = garch_day_columns(fv, x, spec)
    tcols, p_cols = cols
    want = np.asarray(
        garch_integrals_tcached(bounds, tcols, p_cols, x, dx, W3, spec)
    )
    cache = build_garch_dim3_cache(fv, x, dx, W3, spec)
    got = np.asarray(
        dim3_integrals_pallas(bounds, cache, family="garch", kind=copula,
                              interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=1e-8)


@pytest.mark.slow
def test_dim3_pallas_engine_solve_matches_xla(rng):
    """engine='pallas' at dim 3 end-to-end: the fused kernel drives
    compute_integral AND the on-device bisection (msm + student, the
    flagship combination); VaR must match the f64 XLA engine to the
    bisection tolerance + f32 CDF error."""
    from copula_var_tpu.backtest import MsmAdapter, VaRBacktest
    from copula_var_tpu.copulas.fit import StudentFit
    from copula_var_tpu.data.returns import from_returns
    from copula_var_tpu.models.fit import MsmFit

    N, T = 60, 10
    rets = rng.multivariate_normal(np.zeros(3), CORR3, size=N + T)
    data = from_returns(rets, ["A", "B", "C"], N, W3)
    fits = [
        MsmFit(m_0=0.45, b=3.0, gamma=0.5, sigma=1.0, log_likelihood=0.0),
        MsmFit(m_0=0.55, b=5.0, gamma=0.3, sigma=1.1, log_likelihood=0.0),
        MsmFit(m_0=0.5, b=4.0, gamma=0.4, sigma=0.9, log_likelihood=0.0),
    ]
    kwargs = dict(
        num_points=24,
        model_fits_override=fits,
        copula_fit_override=StudentFit(6.0, CORR3, 0.0,
                                       np.array([6.0, 0.45, 0.25, 0.35])),
    )
    want = VaRBacktest(data, MsmAdapter(k=2), "student", engine="xla",
                       **kwargs).calc_var(0.05)
    got = VaRBacktest(data, MsmAdapter(k=2), "student", engine="pallas",
                      **kwargs).calc_var(0.05)
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_dim3_pallas_rejects_plackett(rng):
    bounds, fbs, fcombos, x, dx, dens, uvols = _msm3_problem(rng, T=2)
    spec = CopulaSpec("plackett", (2.0,))
    with pytest.raises(ValueError):
        build_msm_dim3_cache(fbs, fcombos, x, dx, dens, uvols, W3, spec)
