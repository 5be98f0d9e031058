"""Pallas fused quadrature kernel vs the XLA cached path (interpret mode
on CPU; the same kernel compiles natively on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from copula_var_tpu.ops.grids import garch_grid, msm_grid
from copula_var_tpu.ops.pallas_quadrature import (
    garch_integrals_pallas,
    msm_integrals_pallas,
)
from copula_var_tpu.ops.quadrature import (
    CopulaSpec,
    garch_day_tensors,
    garch_integrals_cached,
    msm_day_tensors,
    msm_integrals_cached,
)

CORR = np.array([[1.0, 0.45], [0.45, 1.0]])
WEIGHTS = np.array([0.5, 0.5])
# bounds chosen off the grid lattice: when a dynamic bound lands exactly
# on a grid point the strict/inclusive mask comparisons legitimately
# differ between the f32 kernel and the f64 reference path (documented in
# ops/pallas_quadrature.py)
BOUNDS = np.array(
    [(-100.0, -3.0041), (-3.5137, -2.0093), (-7.5, 0.0127), (-2.0061, 1.5029),
     (-100.0, 1.0171), (-1.0087, -0.5113), (-6.0031, -4.0057), (-100.0, 100.0)]
)


def test_msm_pallas_matches_cached(rng):
    n, q, T = 32, 3, len(BOUNDS)
    x, dx = msm_grid(n)
    uvols = np.sort(rng.uniform(0.5, 1.5, size=(2, q)), axis=1)
    dens = np.exp(-0.5 * (x[None, None, :] / uvols[:, :, None]) ** 2) / (
        np.sqrt(2 * np.pi) * uvols[:, :, None]
    )
    fbs = rng.uniform(0.1, 1.0, size=(T, 2, q))
    fbs /= fbs.sum(axis=2, keepdims=True)
    fcombos = np.einsum("ti,tj->tij", fbs[:, 0], fbs[:, 1]).reshape(T, -1)
    spec = CopulaSpec("student", (6.0, CORR))
    C = msm_day_tensors(fbs, x, uvols, spec)
    want = np.asarray(
        msm_integrals_cached(BOUNDS, C, fcombos, x, dx, dens, WEIGHTS)
    )
    got = np.asarray(
        msm_integrals_pallas(
            BOUNDS, C, fcombos, x, dx, dens, WEIGHTS, interpret=True
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-7)


def test_garch_pallas_matches_cached(rng):
    n, T = 32, len(BOUNDS)
    x, dx = garch_grid(n)
    fv = rng.uniform(0.7, 1.5, size=(T, 2))
    spec = CopulaSpec("gaussian", (CORR,))
    V = garch_day_tensors(fv, x, spec)
    want = np.asarray(garch_integrals_cached(BOUNDS, V, x, dx, WEIGHTS))
    got = np.asarray(
        garch_integrals_pallas(BOUNDS, V, x, dx, WEIGHTS, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-7)
