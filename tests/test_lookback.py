"""Lookback option gates ((S, running-extremum) Markov state).

Product family beyond the reference (vanilla/barrier only,
`/root/reference/american_monte_carlo.py:85-86`). Two independent
anchors: an exact-discrete-semantics float64 NumPy MC twin (different
code path and RNG), and the reflection-principle quadrature oracle with
the first-order BGK discrete shift (loose, ~0.5% residual).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amcx import MarketParams, RegressionSpec, SimConfig
from amcx.models.lookback import (
    lookback_fixed_call_cont,
    lookback_floating_put_cont,
    price_lookback_option,
    running_max,
    running_min,
)

M = MarketParams(100.0, 0.05, 0.25)
SIM = SimConfig(n_paths=65_536, n_steps=50, antithetic=True)
SPEC = RegressionSpec(basis="chebyshev", degree=2)


def _mc_twin(payoff, n=100_000, steps=50, seed=11):
    """Independent f64 NumPy MC with the exact discrete semantics."""
    rng = np.random.default_rng(seed)
    dt = 1.0 / steps
    logS = np.zeros(n)
    mx = np.full(n, 100.0)
    mn = np.full(n, 100.0)
    for _ in range(steps):
        logS += (0.05 - 0.5 * 0.25**2) * dt \
            + 0.25 * np.sqrt(dt) * rng.standard_normal(n)
        S = 100.0 * np.exp(logS)
        np.maximum(mx, S, out=mx)
        np.minimum(mn, S, out=mn)
    x = payoff(100.0 * np.exp(logS), mx, mn) * np.exp(-0.05)
    return x.mean(), x.std() / np.sqrt(n)


def test_running_extrema_units():
    p = jnp.asarray([[100.0, 100.0], [90.0, 110.0], [95.0, 105.0]])
    np.testing.assert_allclose(np.asarray(running_max(p)),
                               [[100, 100], [100, 110], [100, 110]])
    np.testing.assert_allclose(np.asarray(running_min(p)),
                               [[100, 100], [90, 100], [90, 100]])


def test_fixed_call_european_matches_f64_twin():
    res = price_lookback_option(jax.random.key(0), M, 100.0, 1.0,
                                option_type="call", strike_type="fixed",
                                spec=SPEC, sim=SIM)
    ref, ref_se = _mc_twin(lambda S, mx, mn: np.maximum(mx - 100.0, 0.0))
    tol = 4.0 * np.hypot(float(res.stderr), ref_se)
    assert abs(float(res.price) - ref) < tol, (float(res.price), ref)


def test_floating_put_european_matches_f64_twin():
    res = price_lookback_option(jax.random.key(1), M, 0.0, 1.0,
                                option_type="put", strike_type="floating",
                                spec=SPEC, sim=SIM)
    ref, ref_se = _mc_twin(lambda S, mx, mn: mx - S)
    tol = 4.0 * np.hypot(float(res.stderr), ref_se)
    assert abs(float(res.price) - ref) < tol, (float(res.price), ref)


def test_bgk_anchor_within_a_percent():
    res = price_lookback_option(jax.random.key(2), M, 100.0, 1.0,
                                option_type="call", strike_type="fixed",
                                spec=SPEC, sim=SIM)
    anchor = lookback_fixed_call_cont(100.0, 100.0, 1.0, 0.05, 0.25,
                                      n_steps=50)
    # the beta-shift is first-order in sqrt(dt): ~0.5-1% residual
    assert abs(float(res.price) - anchor) < 0.02 * anchor


def test_american_floating_put_exceeds_european():
    re_ = price_lookback_option(jax.random.key(3), M, 0.0, 1.0,
                                option_type="put", strike_type="floating",
                                exercise="european", spec=SPEC, sim=SIM)
    ra = price_lookback_option(jax.random.key(3), M, 0.0, 1.0,
                               option_type="put", strike_type="floating",
                               exercise="american", spec=SPEC, sim=SIM)
    # r > 0, q = 0: early exercise of the floating lookback put has value
    assert float(ra.price) > float(re_.price) + 2.0 * float(ra.stderr)


def test_engines_agree_on_shared_paths():
    sim = SimConfig(n_paths=16_384, n_steps=25, antithetic=True)
    kw = dict(option_type="put", strike_type="floating",
              exercise="american", spec=SPEC, sim=sim)
    r_x = price_lookback_option(jax.random.key(4), M, 0.0, 1.0, **kw)
    r_f = price_lookback_option(jax.random.key(4), M, 0.0, 1.0,
                                engine="fused", **kw)
    r_m = price_lookback_option(jax.random.key(4), M, 0.0, 1.0,
                                engine="mega", **kw)
    assert abs(float(r_f.price) - float(r_m.price)) < 5e-3
    assert abs(float(r_x.price) - float(r_m.price)) < 0.05


def test_validation_errors():
    with pytest.raises(ValueError):
        price_lookback_option(jax.random.key(0), M, 100.0, 1.0,
                              option_type="straddle")
    with pytest.raises(ValueError):
        price_lookback_option(jax.random.key(0), M, 100.0, 1.0,
                              strike_type="asian")


def test_mc_anchor_consistent_with_local_twin():
    """The library's exact-discrete f64 anchor (`lookback_mc_anchor`, the
    PRIMARY RESULTS anchor since round 4) and this module's independent
    local twin price the same discrete payoff — agreement within combined
    MC error is a twin-vs-twin implementation gate."""
    from amcx.models.lookback import lookback_mc_anchor

    a, a_se = lookback_mc_anchor(100.0, 100.0, 1.0, 0.05, 0.25,
                                 n_steps=50, n_paths=200_000, seed=3)
    b, b_se = _mc_twin(lambda S, mx, mn: np.maximum(mx - 100.0, 0.0))
    assert abs(a - b) < 4.0 * np.hypot(a_se, b_se), (a, b)


def test_mc_anchor_floating_put_units():
    """Floating-strike put M−S ≥ 0 pathwise and exceeds the fixed ATM call
    lower bound sanity: anchor returns positive price below S0."""
    from amcx.models.lookback import lookback_mc_anchor

    p, se = lookback_mc_anchor(100.0, 0.0, 1.0, 0.05, 0.25, n_steps=50,
                               n_paths=100_000, strike_type="floating",
                               option_type="put")
    assert 0.0 < p < 100.0 and se < 0.2
