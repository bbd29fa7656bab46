"""Scenario revaluation grids — amcx.scenarios."""

import numpy as np
import jax
import pytest

from amcx import MarketParams, ProductSpec, RegressionSpec, SimConfig, simulate_gbm
from amcx.engine import lsmc_option_pricing
from amcx.oracle import bs_greeks
from amcx.scenarios import scenario_ladder

M = MarketParams(100.0, 0.05, 0.2)
PUT = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")
SPEC = RegressionSpec(degree=4)
SIM = SimConfig(n_paths=32_768, n_steps=20, antithetic=True)


def test_zero_shift_cell_equals_single_pricing():
    grid = scenario_ladder(jax.random.key(0), M, PUT, SPEC, SIM,
                           spot_shifts=(-0.05, 0.0, 0.05),
                           vol_shifts=(0.0,), mode="refit")
    paths = simulate_gbm(jax.random.key(0), M, 1.0, SIM)
    # return_surface=False: match the ladder's resolution of the auto spec
    # (a surface request would resolve to the all-paths estimator instead)
    base = lsmc_option_pricing(paths, PUT, M.r, SPEC, return_surface=False,
                               antithetic=True)
    np.testing.assert_allclose(float(grid.prices[1, 0]), float(base.price),
                               rtol=1e-6)


def test_grid_monotonicity_put():
    grid = scenario_ladder(jax.random.key(1), M, PUT, SPEC, SIM,
                           spot_shifts=(-0.10, 0.0, 0.10),
                           vol_shifts=(-0.05, 0.0, 0.05), mode="refit")
    p = np.asarray(grid.prices)
    # put value decreasing in spot (columns), increasing in vol (rows)
    assert np.all(np.diff(p, axis=0) < 0)
    assert np.all(np.diff(p, axis=1) > 0)


def test_ladder_delta_matches_bs_for_european():
    eu = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="european")
    grid = scenario_ladder(jax.random.key(2), M, eu, SPEC, SIM,
                           spot_shifts=(-0.04, -0.02, 0.0, 0.02, 0.04),
                           vol_shifts=(0.0,), mode="refit")
    delta, gamma = grid.ladder_delta_gamma(M.S0)
    ref = bs_greeks(100.0, 100.0, 1.0, 0.05, 0.2, 0.0, "put")
    # CRN ladder delta is low-noise; gamma is noisier
    assert abs(float(delta[1]) - float(ref["delta"])) < 0.02, (
        float(delta[1]), float(ref["delta"]))
    assert 0.0 < float(gamma[1]) < 0.06


def test_replay_mode_matches_refit_at_base_and_lower_bounds():
    kw = dict(spot_shifts=(-0.05, 0.0, 0.05), vol_shifts=(0.0,))
    refit = scenario_ladder(jax.random.key(3), M, PUT, SPEC, SIM,
                            mode="refit", **kw)
    replay = scenario_ladder(jax.random.key(3), M, PUT, SPEC, SIM,
                             mode="replay", **kw)
    p_f = np.asarray(refit.prices[:, 0])
    p_r = np.asarray(replay.prices[:, 0])
    se = np.asarray(refit.stderrs[:, 0])
    # frozen-policy replay: near refit everywhere on small shifts (the
    # envelope theorem — policy error is second order in the shift)
    assert np.all(np.abs(p_r - p_f) < 4.0 * se + 0.05), (p_r, p_f)


def test_scenario_validation():
    with pytest.raises(ValueError, match="mode"):
        scenario_ladder(jax.random.key(0), M, PUT, SPEC, SIM, mode="bump")
    with pytest.raises(ValueError, match="non-positive"):
        scenario_ladder(jax.random.key(0), M, PUT, SPEC, SIM,
                        vol_shifts=(-0.25,))
    with pytest.raises(ValueError, match="uniform"):
        grid = scenario_ladder(jax.random.key(0), M, PUT, SPEC, SIM,
                               spot_shifts=(-0.1, 0.0, 0.25),
                               vol_shifts=(0.0,))
        grid.ladder_delta_gamma(M.S0)


def test_replay_mega_mode_matches_replay_walk():
    # in-kernel frozen-policy replay per scenario == the XLA forward walk
    kw = dict(spot_shifts=(-0.05, 0.0, 0.05), vol_shifts=(0.0,))
    sim = SimConfig(n_paths=8192, n_steps=10, antithetic=True)
    walk = scenario_ladder(jax.random.key(5), M, PUT, SPEC, sim,
                           mode="replay", **kw)
    mega = scenario_ladder(jax.random.key(5), M, PUT, SPEC, sim,
                           mode="replay-mega", **kw)
    np.testing.assert_allclose(np.asarray(mega.prices),
                               np.asarray(walk.prices), atol=2e-3)


def test_replay_mega_rejects_barriers():
    bar = ProductSpec(K=100.0, T=1.0, option_type="put",
                      exercise="american", barrier=80.0,
                      barrier_type="down-in")
    with pytest.raises(ValueError, match="barrier"):
        scenario_ladder(jax.random.key(0), M, bar, SPEC, SIM,
                        mode="replay-mega")
