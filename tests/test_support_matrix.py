"""Engine x dim support matrix (VERDICT r04 next #4).

The README's support table is a CONTRACT: every supported cell works,
and every unsupported cell raises the documented loud error — never a
silent wrong answer. This test pins the unsupported cells.
"""

import numpy as np
import pytest

from copula_var_tpu.backtest import (
    GarchAdapter,
    VaRBacktest,
    create_var_backtest,
)
from copula_var_tpu.copulas.fit import GaussianFit
from copula_var_tpu.data import returns as returns_mod
from copula_var_tpu.models.fit import GarchFit


def _bt(dim, engine, n_points=16, refine=False, copula="gaussian"):
    rng = np.random.default_rng(3)
    n_in, T = 120, 20
    rets = rng.standard_normal((n_in + T, dim))
    data = returns_mod.from_returns(rets, n_insample=n_in)
    fits = [
        GarchFit(1, 1, 0.2, np.array([0.1]), np.array([0.7]), 0.0, 0.0,
                 np.array([0.2, 0.1, 0.7]))
        for _ in range(dim)
    ]
    return VaRBacktest(
        data, GarchAdapter(p_max=1, q_max=1), copula,
        num_points=n_points, engine=engine, model_fits_override=fits,
        copula_fit_override=GaussianFit(np.eye(dim), 0.0, np.zeros(1)),
        refine_root=refine,
    )


@pytest.mark.parametrize(
    "dim,engine,match",
    [
        # fused Mosaic kernels exist for dim 2 (day tensors) and dim 3
        # (column kernel) only
        (4, "pallas", "dim"),
        # the sharded fused kernel is dim 2 (GSPMD day tensors) / dim 3
        (4, "sharded_pallas", "dim"),
    ],
)
def test_unsupported_engine_dim_raises(dim, engine, match):
    bt = _bt(dim, engine)
    with pytest.raises(ValueError, match=match):
        bt.calc_var()


@pytest.mark.parametrize("engine", ["sharded_pallas", "grid_sharded"])
def test_refine_root_unsupported_engines_raise(engine):
    bt = _bt(2, engine, refine=True)
    with pytest.raises(ValueError, match="refine_root"):
        bt.calc_var()


def test_refine_root_sharded_matches_xla():
    """engine='sharded' + refine_root: the trap re-solve rides the
    day-sharded tensors (GSPMD) — f64-exact vs the refined xla root."""
    want = _bt(2, "xla", refine=True).calc_var()
    got = _bt(2, "sharded", refine=True).calc_var()
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_refine_root_sharded_dim3_matches_xla():
    """dim >= 3: the shard_map tcached trap twin refines per-shard."""
    want = _bt(3, "xla", refine=True).calc_var()
    got = _bt(3, "sharded", refine=True).calc_var()
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_plackett_dim3_raises():
    from copula_var_tpu.copulas.fit import PlackettFit

    rng = np.random.default_rng(3)
    rets = rng.standard_normal((140, 3))
    data = returns_mod.from_returns(rets, n_insample=120)
    fits = [
        GarchFit(1, 1, 0.2, np.array([0.1]), np.array([0.7]), 0.0, 0.0,
                 np.array([0.2, 0.1, 0.7]))
        for _ in range(3)
    ]
    bt = VaRBacktest(
        data, GarchAdapter(p_max=1, q_max=1), "plackett", num_points=16,
        engine="xla", model_fits_override=fits,
        copula_fit_override=PlackettFit(4.0, 0.0, np.array([4.0])),
    )
    with pytest.raises(ValueError, match="[Pp]lackett"):
        bt.calc_var()


def test_grid_sharded_indivisible_points_raises():
    bt = _bt(2, "grid_sharded", n_points=17)
    with pytest.raises(ValueError, match="not divisible"):
        bt.calc_var()


def test_dim4_xla_and_sharded_supported():
    """The f64 tcached paths carry dim >= 4 (the README table's
    supported column): smoke at tiny n."""
    v = _bt(4, "xla").calc_var()
    assert np.all(np.isfinite(v)) and np.all(v < 0)
