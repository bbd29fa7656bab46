"""Duality upper bound (one-step Andersen-Broadie variant)."""

import jax
import numpy as np
import pytest

from amcx import (
    MarketParams,
    ProductSpec,
    RegressionSpec,
    SimConfig,
    lsmc_option_pricing,
    simulate_gbm,
)
from amcx.dual import dual_upper_bound
from amcx.engine_pallas import precompute_standardization
from amcx.oracle import crr_price

M = MarketParams(100.0, 0.05, 0.2)
PROD = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")


@pytest.fixture(scope="module")
def fit():
    spec = RegressionSpec(degree=6)
    paths = simulate_gbm(jax.random.key(0), M, 1.0, SimConfig(n_paths=50_000, n_steps=25))
    res = lsmc_option_pricing(paths, PROD, M.r, spec, return_surface=False, return_coeffs=True)
    mean_t, inv_std_t = precompute_standardization(paths, None, spec)
    return spec, res, mean_t, inv_std_t


@pytest.fixture(scope="module")
def dual(fit):
    spec, res, mean_t, inv_std_t = fit
    paths_dual = simulate_gbm(jax.random.key(99), M, 1.0, SimConfig(n_paths=8_192, n_steps=25))
    return dual_upper_bound(jax.random.key(7), paths_dual, res, M, PROD, spec,
                            mean_t, inv_std_t, n_inner=64)


def test_brackets_true_price(fit, dual):
    _, res, _, _ = fit
    true = float(crr_price(100.0, 100.0, 1.0, 0.05, 0.2, 2000, option_type="put", american=True))
    lower = float(res.price) - 4 * float(res.stderr)
    upper = float(dual.upper) + 4 * float(dual.stderr)
    assert lower <= true <= upper, (lower, true, upper)


def test_upper_above_lower(fit, dual):
    _, res, _, _ = fit
    assert float(dual.upper) >= float(res.price) - 1e-6
    assert float(dual.gap) >= -1e-6
    # the one-step surrogate bound is loose but bounded
    assert float(dual.gap) < 0.5


def test_requires_coeffs(fit):
    spec, res, mean_t, inv_std_t = fit
    paths = simulate_gbm(jax.random.key(1), M, 1.0, SimConfig(n_paths=1024, n_steps=25))
    no_coeffs = res._replace(coeffs=None)
    with pytest.raises(ValueError, match="return_coeffs"):
        dual_upper_bound(jax.random.key(0), paths, no_coeffs, M, PROD, spec,
                         mean_t, inv_std_t)


def test_nested_bound_tighter_than_onestep(fit):
    spec, res, mean_t, inv_std_t = fit
    paths_dual = simulate_gbm(jax.random.key(5), M, 1.0, SimConfig(n_paths=4_096, n_steps=25))
    one = dual_upper_bound(jax.random.key(7), paths_dual, res, M, PROD, spec,
                           mean_t, inv_std_t, n_inner=64, nested=False)
    nested = dual_upper_bound(jax.random.key(7), paths_dual, res, M, PROD, spec,
                              mean_t, inv_std_t, n_inner=64, nested=True)
    true = float(crr_price(100.0, 100.0, 1.0, 0.05, 0.2, 2000, option_type="put", american=True))
    # nested is valid and tighter
    assert float(nested.upper) + 4 * float(nested.stderr) >= true
    assert float(nested.upper) <= float(one.upper) + 1e-6
    assert float(nested.upper) - true < 0.15
