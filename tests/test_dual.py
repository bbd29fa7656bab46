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
from amcx.engine import policy_frame
from amcx.oracle import crr_price

M = MarketParams(100.0, 0.05, 0.2)
PROD = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")


@pytest.fixture(scope="module")
def fit():
    # all-paths fit: the one-step surrogate tests below need a GLOBAL
    # continuation estimate (the ITM-resolved default is certified
    # separately by test_nested_brackets_auto_policy)
    spec = RegressionSpec(degree=6, regress_on="all")
    paths = simulate_gbm(jax.random.key(0), M, 1.0, SimConfig(n_paths=50_000, n_steps=25))
    res = lsmc_option_pricing(paths, PROD, M.r, spec, return_surface=False, return_coeffs=True)
    mean_t, inv_std_t = policy_frame(paths, PROD, spec)
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


def test_dual_from_mega_coeffs():
    """The Andersen-Broadie bound runs off the MEGA kernel's exported
    per-step coefficients (VERDICT r2 #1: dual bounds at flagship speed) —
    and agrees with the bound built from the XLA engine's coeffs on the
    same paths."""
    import jax
    import jax.numpy as jnp

    from amcx import (MarketParams, ProductSpec, RegressionSpec, SimConfig,
                      dual_upper_bound, lsmc_option_pricing, simulate_gbm)
    from amcx.engine_pallas import precompute_standardization
    from amcx.ops.lsmc_megakernel import lsmc_price_megakernel

    m = MarketParams(100.0, 0.05, 0.2)
    prod = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")
    # all-paths on both routes: the mega call below fits all-paths
    # (itm_weights=False), so the XLA twin must too
    spec = RegressionSpec(degree=4, regress_on="all")
    n_steps = 10
    paths = simulate_gbm(jax.random.key(3), m, 1.0,
                         SimConfig(n_paths=16384, n_steps=n_steps))
    mean_t, inv_std_t = precompute_standardization(paths, None, spec)
    mega = lsmc_price_megakernel(paths, 100.0, m.r, 1.0 / n_steps, -1.0,
                                 degree=4, mean_t=mean_t, inv_std_t=inv_std_t,
                                 return_cf_tau=True, return_coeffs=True)
    xla = lsmc_option_pricing(paths, prod, m.r, spec, return_surface=False,
                              return_coeffs=True)

    class _R:
        price = mega.price
        coeffs = mega.coeffs  # (n_steps+1, k): dual slices the maturity row

    d_mega = dual_upper_bound(jax.random.key(9), paths, _R, m, prod, spec,
                              mean_t, inv_std_t, n_inner=16)
    d_xla = dual_upper_bound(jax.random.key(9), paths, xla, m, prod, spec,
                             mean_t, inv_std_t, n_inner=16)
    assert float(d_mega.upper) >= float(mega.price) - 1e-3  # valid upper bound
    assert abs(float(d_mega.upper) - float(d_xla.upper)) < 5e-3


def test_nested_brackets_auto_policy():
    """Certify the SHIPPED estimator: nested AB dual on the auto-resolved
    ITM policy must bracket the CRR truth with a tight gap (the one-step
    surrogate is invalid for ITM fits — see dual_upper_bound docstring)."""
    import warnings

    from amcx.engine import policy_frame

    spec = RegressionSpec(degree=6)  # regress_on="auto" -> itm
    paths = simulate_gbm(jax.random.key(0), M, 1.0,
                         SimConfig(n_paths=50_000, n_steps=25))
    res = lsmc_option_pricing(paths, PROD, M.r, spec, return_surface=False,
                              return_coeffs=True)
    mean_t, inv_std_t = policy_frame(paths, PROD, spec)
    paths_dual = simulate_gbm(jax.random.key(99), M, 1.0,
                              SimConfig(n_paths=4_096, n_steps=25))
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # nested must NOT warn
        d = dual_upper_bound(jax.random.key(7), paths_dual, res, M, PROD,
                             spec, mean_t, inv_std_t, n_inner=64, nested=True)
    true = float(crr_price(100.0, 100.0, 1.0, 0.05, 0.2, 2000,
                           option_type="put", american=True))
    lower = float(res.price) - 4 * float(res.stderr)
    upper = float(d.upper) + 4 * float(d.stderr)
    assert lower <= true <= upper, (lower, true, upper)
    # J=64 inner-noise inflates the pathwise max; 0.15 matches the
    # one-step-vs-nested test's bar (the TPU RESULTS bracket runs J=512)
    assert float(d.upper) - true < 0.15
