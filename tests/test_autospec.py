"""The regress_on="auto" estimator resolution (round-4 VERDICT #1/#2).

The reference fits the continuation regression on all paths (SURVEY Q1),
which carries a measured policy bias on early-exercisable configs (−0.064
to −0.22 at 1M×100 on TPU). The default spec now resolves to the
ITM-localized Longstaff-Schwartz estimator at the public entry points;
``regress_on="all"`` remains the explicit reference-parity opt-out.
"""

import warnings

import jax
import numpy as np
import pytest

from amcx import (
    MarketParams,
    ProductSpec,
    RegressionSpec,
    SimConfig,
    lsmc_option_pricing,
    price_option,
    simulate_gbm,
)
from amcx.engine import policy_frame, resolve_regression_spec
from amcx.oracle import crr_price

M = MarketParams(100.0, 0.01, 0.2)
PUT_A = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")
PUT_E = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="european")
CALL_A = ProductSpec(K=100.0, T=1.0, option_type="call", exercise="american")


def test_resolution_rules():
    s = RegressionSpec(degree=4)
    assert s.regress_on == "auto"  # the shipped default
    r = resolve_regression_spec(s, PUT_A)
    assert r.regress_on == "itm" and r.degree == 4
    # European: the regression only feeds the surface -> global fit
    assert resolve_regression_spec(s, PUT_E).regress_on == "all"
    # surface requests keep the global fit even for American (CCR semantics)
    assert resolve_regression_spec(s, PUT_A, for_surface=True).regress_on == "all"
    # q=0 American call: itm + degree bumped to >= 6 (docs/PARITY.md item 5)
    r = resolve_regression_spec(s, CALL_A, q=0.0)
    assert r.regress_on == "itm" and r.degree == 6
    # dividend-paying call: itm, degree untouched
    r = resolve_regression_spec(s, CALL_A, q=0.03)
    assert r.regress_on == "itm" and r.degree == 4
    # explicit choices pass through (the parity opt-out)
    for ro in ("all", "itm"):
        assert resolve_regression_spec(
            RegressionSpec(degree=4, regress_on=ro), PUT_A).regress_on == ro
    # idempotent
    assert resolve_regression_spec(r, CALL_A, q=0.0) == r


def test_auto_beats_parity_on_itm_put():
    """The resolved default must dominate the reference estimator on the
    documented bias config (S0=95-style ITM American put, scaled down for
    CPU): |err_auto| clearly below |err_all|."""
    m = MarketParams(95.0, 0.01, 0.2)
    sim = SimConfig(n_paths=131_072, n_steps=50, antithetic=True)
    crr = float(crr_price(95.0, 100.0, 1.0, 0.01, 0.2, 2000,
                          option_type="put", american=True))
    auto = price_option(jax.random.key(3), m, PUT_A, RegressionSpec(degree=4), sim)
    par = price_option(jax.random.key(3), m, PUT_A,
                       RegressionSpec(degree=4, regress_on="all"), sim)
    err_auto = abs(float(auto.price) - crr)
    err_all = abs(float(par.price) - crr)
    # the parity estimator's policy bias is ~0.06; the ITM fit removes it
    assert err_all > 0.03, (err_all, err_auto)
    assert err_auto < 0.02, (err_all, err_auto)
    assert err_auto < err_all


def test_q0_call_auto_spec_no_advisory():
    """q=0 American call: the auto default resolves to itm/degree-6, prices
    inside the reference's own 0.2 gate with margin, and does NOT warn;
    the explicit parity opt-out still warns."""
    sim = SimConfig(n_paths=65_536, n_steps=50)
    crr = float(crr_price(100.0, 100.0, 1.0, 0.01, 0.2, 2000,
                          option_type="call", american=True))
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        res = price_option(jax.random.key(5), M, CALL_A,
                           RegressionSpec(degree=4), sim)
    assert abs(float(res.price) - crr) < 0.05 + 2 * float(res.stderr)
    with pytest.warns(UserWarning, match="regress_on='all'"):
        price_option(jax.random.key(5), M, CALL_A,
                     RegressionSpec(degree=4, regress_on="all"), sim)


def test_surface_request_keeps_global_fit():
    """return_surface=True resolves to the all-paths fit: the surface must
    equal the explicit regress_on='all' surface bit-for-bit."""
    paths = simulate_gbm(jax.random.key(0), M, 1.0,
                         SimConfig(n_paths=8192, n_steps=10))
    a = lsmc_option_pricing(paths, PUT_A, M.r, RegressionSpec(degree=4),
                            return_surface=True)
    b = lsmc_option_pricing(paths, PUT_A, M.r,
                            RegressionSpec(degree=4, regress_on="all"),
                            return_surface=True)
    np.testing.assert_array_equal(np.asarray(a.continuation),
                                  np.asarray(b.continuation))
    np.testing.assert_array_equal(float(a.price), float(b.price))


def test_auto_resolves_identically_across_engines():
    """All four engines see the same resolved spec from price_option."""
    sim = SimConfig(n_paths=32_768, n_steps=10)
    key = jax.random.key(1)
    px = float(price_option(key, M, PUT_A, RegressionSpec(degree=3), sim).price)
    pi = float(price_option(key, M, PUT_A,
                            RegressionSpec(degree=3, regress_on="itm"),
                            sim).price)
    # auto == explicit itm on the same key/paths (identical resolution;
    # tolerance: XLA CPU threadpool reductions are not bitwise-stable
    # run to run, see test_utils)
    np.testing.assert_allclose(px, pi, rtol=1e-5)
    pf = float(price_option(key, M, PUT_A, RegressionSpec(degree=3), sim,
                            engine="fused").price)
    pm = float(price_option(key, M, PUT_A, RegressionSpec(degree=3), sim,
                            engine="mega").price)
    assert abs(pf - px) < 2.5e-3
    # the mega kernel fits in the closed-form GBM frame; with the ITM fit a
    # few boundary flips move the price ~3e-4 relative at this size
    assert abs(pm - px) < 4e-3


def test_policy_frame_matches_fit_weights():
    """policy_frame reproduces the engine's ITM-weighted standardization
    (replaying exported coefficients in that frame reprices exactly)."""
    from amcx.policy import reprice_with_coeffs

    paths = simulate_gbm(jax.random.key(7), M, 1.0,
                         SimConfig(n_paths=16384, n_steps=10))
    spec = RegressionSpec(degree=4)
    res = lsmc_option_pricing(paths, PUT_A, M.r, spec, return_surface=False,
                              return_coeffs=True)
    mean_t, inv_std_t = policy_frame(paths, PUT_A, spec)
    rep = reprice_with_coeffs(paths, res.coeffs, PUT_A, M.r, mean_t,
                              inv_std_t,
                              resolve_regression_spec(spec, PUT_A))
    np.testing.assert_allclose(float(rep.price), float(res.price), atol=2e-4)


def test_invalid_regress_on_rejected():
    with pytest.raises(ValueError, match="regress_on"):
        RegressionSpec(regress_on="some")
