"""Shared copula utilities: correlation-matrix packing and PD checks.

The reference packs/unpacks the strict lower triangle of the correlation
matrix as a flat vector (`copulas/gaussian/opti.py:58-78`,
`copulas/student/opti.py:66-85`; the adapter layer uses the upper triangle
with identical ordering for symmetric matrices,
`utils/model_estimation/copula/student_estimation.py:22-56`) and guards
positive-definiteness by attempting a Cholesky factorization with a 1e10
penalty on failure (`student/opti.py:44-52`). Here the PD check is a jittable
`jnp.linalg.cholesky` NaN probe so penalty masking stays on-device.
"""

from __future__ import annotations

import jax.numpy as jnp

PENALTY = 1e10  # reference infeasible-parameter penalty


def corr_matrix_from_params(params, dim: int):
    """Build a (dim, dim) correlation matrix from the strict-lower-triangle
    vector, row-major over (i, j<i) — the reference's fill order
    (`gaussian/opti.py:58-78`)."""
    params = jnp.asarray(params)
    mat = jnp.eye(dim, dtype=params.dtype)
    idx = jnp.tril_indices(dim, k=-1)
    mat = mat.at[idx].set(params)
    return mat.at[(idx[1], idx[0])].set(params)


def params_from_corr_matrix(corr):
    """Inverse of `corr_matrix_from_params` (same row-major lower-triangle
    order; equals the reference wrappers' upper-triangle column order for a
    symmetric matrix)."""
    corr = jnp.asarray(corr)
    dim = corr.shape[-1]
    idx = jnp.tril_indices(dim, k=-1)
    return corr[..., idx[0], idx[1]]


def dim_from_n_params(n_params: int) -> int:
    """Recover matrix size from a packed strict-triangle length:
    n = (1 + sqrt(1 + 8 len)) / 2 (`student_estimation.py:47-50`)."""
    dim = int((1 + (1 + 8 * n_params) ** 0.5) / 2)
    if dim * (dim - 1) // 2 != n_params:
        raise ValueError(f"{n_params} is not a triangular number")
    return dim


def is_positive_definite(corr):
    """Jittable PD probe: cholesky yields NaN iff the matrix is not PD."""
    chol = jnp.linalg.cholesky(corr)
    return ~jnp.any(jnp.isnan(chol))
