"""Implied vol solver + exercise boundary extraction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amcx import (
    MarketParams,
    ProductSpec,
    RegressionSpec,
    SimConfig,
    bs_price,
    lsmc_option_pricing,
    simulate_gbm,
)
from amcx.boundary import exercise_boundary
from amcx.oracle import implied_vol


def test_implied_vol_roundtrip():
    sig = np.array([0.1, 0.2, 0.45])
    prices = np.array([float(bs_price(100.0, 105.0, 0.7, 0.03, s, option_type="call"))
                       for s in sig])
    iv = np.asarray(implied_vol(jnp.asarray(prices), 100.0, 105.0, 0.7, 0.03,
                                option_type="call"))
    np.testing.assert_allclose(iv, sig, rtol=2e-4)


def test_implied_vol_put_and_broadcast_grid():
    Ks = jnp.asarray([80.0, 100.0, 120.0])
    prices = bs_price(100.0, Ks, 1.0, 0.01, 0.25, option_type="put")
    iv = np.asarray(implied_vol(prices, 100.0, Ks, 1.0, 0.01, option_type="put"))
    np.testing.assert_allclose(iv, 0.25, rtol=3e-4)


def test_implied_vol_out_of_band_is_nan():
    # price below intrinsic-forward bound
    iv = implied_vol(0.0, 100.0, 100.0, 1.0, 0.05, option_type="call")
    assert np.isnan(float(iv))
    # price above spot
    iv2 = implied_vol(101.0, 100.0, 100.0, 1.0, 0.05, option_type="call")
    assert np.isnan(float(iv2))


def test_american_put_exercise_boundary_shape_and_monotonicity():
    """The American put boundary increases toward the strike as t → T, and
    stays below K (standard qualitative properties)."""
    from amcx.engine_pallas import precompute_standardization

    m = MarketParams(100.0, 0.05, 0.2)
    spec = RegressionSpec(degree=4)
    paths = simulate_gbm(jax.random.key(0), m, 1.0, SimConfig(n_paths=100_000, n_steps=50))
    prod = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")
    res = lsmc_option_pricing(paths, prod, m.r, spec, return_surface=False, return_coeffs=True)
    mean_t, inv_std_t = precompute_standardization(paths, None, spec)
    b = np.asarray(
        exercise_boundary(res.coeffs, mean_t[:50], inv_std_t[:50], 100.0, "put",
                          spec, s_lo=40.0, s_hi=99.9)
    )
    mid = b[10:50]  # skip earliest steps (coarse fit far from boundary)
    assert np.isfinite(mid).all()
    assert (mid < 100.0).all() and (mid > 60.0).all()
    # increasing toward maturity (allow small regression noise)
    diffs = np.diff(mid)
    assert np.quantile(diffs, 0.2) > -1.0
    assert mid[-1] > mid[0]
