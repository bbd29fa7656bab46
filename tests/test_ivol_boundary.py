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
    from amcx.engine import policy_frame

    m = MarketParams(100.0, 0.05, 0.2)
    spec = RegressionSpec(degree=4)
    paths = simulate_gbm(jax.random.key(0), m, 1.0, SimConfig(n_paths=100_000, n_steps=50))
    prod = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")
    res = lsmc_option_pricing(paths, prod, m.r, spec, return_surface=False, return_coeffs=True)
    # frame must match the auto-resolved (ITM-weighted) fit
    mean_t, inv_std_t = policy_frame(paths, prod, spec)
    b = np.asarray(
        exercise_boundary(res.coeffs, mean_t[:50], inv_std_t[:50], 100.0, "put",
                          spec, s_lo=40.0, s_hi=99.9)
    )
    mid = b[10:50]  # skip earliest steps (coarse fit far from boundary)
    # the ITM-resolved fit can leave an isolated early step where the
    # bisection bracket finds no sign change (multiple crossings in the
    # extrapolated region) - require 95% well-defined, assert on those
    finite = np.isfinite(mid)
    assert finite.mean() >= 0.95, b
    mid = mid[finite]
    assert (mid < 100.0).all() and (mid > 60.0).all()
    # increasing toward maturity (allow small regression noise)
    diffs = np.diff(mid)
    assert np.quantile(diffs, 0.2) > -1.0
    assert mid[-1] > mid[0]


def test_american_implied_vol_roundtrip():
    from amcx.oracle import american_implied_vol, crr_price

    sig = np.array([0.15, 0.25, 0.4])
    px = np.array([float(crr_price(100.0, 100.0, 1.0, 0.05, s, 500,
                                   option_type="put", american=True))
                   for s in sig])
    iv = np.asarray(american_implied_vol(px, 100.0, 100.0, 1.0, 0.05,
                                         option_type="put"))
    np.testing.assert_allclose(iv, sig, atol=3e-4)


def test_american_implied_vol_broadcasts_and_bands():
    from amcx.oracle import american_implied_vol, crr_price

    # 2x2 grid of strikes x maturities at one vol
    K = np.array([[90.0, 110.0]])
    T = np.array([[0.5], [1.0]])
    px = np.array([[float(crr_price(100.0, k, t, 0.05, 0.3, 400,
                                    option_type="put", american=True))
                    for k in K[0]] for t in T[:, 0]])
    iv = np.asarray(american_implied_vol(px, 100.0, K, T, 0.05,
                                         option_type="put", n_steps=400))
    np.testing.assert_allclose(iv, 0.3, atol=5e-4)
    # at-intrinsic deep ITM quote → NaN (outside the no-arbitrage band)
    bad = american_implied_vol(50.0, 100.0, 150.0, 1.0, 0.05,
                               option_type="put")
    assert np.isnan(float(bad))


def test_american_iv_exceeds_european_iv_for_puts():
    from amcx.oracle import american_implied_vol, crr_price, implied_vol

    # one American price, read through both inverters: the European
    # inverter must overstate vol (it attributes the EEP to volatility)
    px = float(crr_price(100.0, 100.0, 1.0, 0.08, 0.2, 500,
                         option_type="put", american=True))
    iv_am = float(american_implied_vol(px, 100.0, 100.0, 1.0, 0.08,
                                       option_type="put"))
    iv_eu = float(implied_vol(px, 100.0, 100.0, 1.0, 0.08,
                              option_type="put"))
    assert iv_eu > iv_am + 0.005
    assert abs(iv_am - 0.2) < 5e-4
