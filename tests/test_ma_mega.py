"""Multi-asset mega-kernel (one kernel for the whole multi-state LSMC).

Parity ladder: ma-mega vs the fused two-kernel-per-step path (same math,
same frame — near-bitwise in interpret mode), then vs the XLA engines and
oracles per payoff kind.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from amcx import MarketParams, ProductSpec, RegressionSpec, SimConfig
from amcx.models.maxcall import (backward_induction_fused_maxcall,
                                 price_max_call)
from amcx.ops.lsmc_ma_mega import lsmc_price_ma_mega
from amcx.paths import simulate_gbm_multi

SPEC = RegressionSpec(basis="chebyshev", degree=2)
SIM = SimConfig(n_paths=8_192, n_steps=9)


@pytest.fixture(scope="module")
def paths2():
    return simulate_gbm_multi(jax.random.key(0), jnp.array([100.0, 100.0]),
                              0.05, 0.2, 3.0, SIM, q=0.1, corr=jnp.eye(2))


def test_ma_mega_matches_fused_pair_maxcall(paths2):
    res = backward_induction_fused_maxcall(
        paths2, 100.0, 0.05, 3.0 / 9, SPEC, basis_mode="sorted",
        exercise_from_step=1)
    p, se = lsmc_price_ma_mega(
        paths2, 100.0, 0.05, 3.0 / 9, phi=1.0, payoff_kind="maxcall",
        degree=2, sorted_basis=True, exercise_from_step=1)
    assert abs(float(p) - float(res.price)) < 1e-3, (float(p),
                                                     float(res.price))
    assert float(se) > 0


def test_ma_mega_route_price_max_call(paths2):
    r_f = price_max_call(jax.random.key(0), [100.0, 100.0], 100.0, 3.0,
                         0.05, 0.2, q=0.1, n_paths=8_192, engine="fused")
    r_m = price_max_call(jax.random.key(0), [100.0, 100.0], 100.0, 3.0,
                         0.05, 0.2, q=0.1, n_paths=8_192, engine="mega")
    assert abs(float(r_f.price) - float(r_m.price)) < 2e-3
    # Andersen-Broadie 2-asset anchor ~13.90 (loose MC gate)
    assert abs(float(r_m.price) - 13.90) < 0.5


def test_ma_mega_heston_route():
    from amcx.dynamics import HestonParams, price_option_heston

    hp = HestonParams(S0=100.0, r=0.03, v0=0.04, kappa=1.5, theta=0.04,
                      xi=0.5, rho=-0.7)
    prod = ProductSpec(K=100.0, T=1.0, option_type="put",
                       exercise="american")
    sim = SimConfig(n_paths=8_192, n_steps=16)
    r_x = price_option_heston(jax.random.key(1), hp, prod,
                              RegressionSpec(degree=2), sim, engine="xla")
    r_m = price_option_heston(jax.random.key(1), hp, prod,
                              RegressionSpec(degree=2), sim, engine="mega")
    assert abs(float(r_x.price) - float(r_m.price)) < 0.06, (
        float(r_x.price), float(r_m.price))


def test_ma_mega_asian_route():
    from amcx.models.asian import price_asian_option

    m = MarketParams(100.0, 0.05, 0.25)
    sim = SimConfig(n_paths=8_192, n_steps=16)
    kw = dict(spec=RegressionSpec(degree=3), sim=sim)
    r_f = price_asian_option(jax.random.key(0), m, 100.0, 1.0, "call",
                             "american", "arithmetic", "fixed",
                             engine="fused", **kw)
    r_m = price_asian_option(jax.random.key(0), m, 100.0, 1.0, "call",
                             "american", "arithmetic", "fixed",
                             engine="mega", **kw)
    assert abs(float(r_f.price) - float(r_m.price)) < 1e-3
    # floating strike through the spread payoff kind
    r_ms = price_asian_option(jax.random.key(0), m, 100.0, 1.0, "call",
                              "american", "arithmetic", "floating",
                              engine="mega", **kw)
    assert float(r_ms.price) > 0


def test_ma_mega_basket_route_and_weights():
    from amcx.models.basket import price_basket_option

    corr = np.array([[1.0, 0.3, 0.3], [0.3, 1.0, 0.3], [0.3, 0.3, 1.0]])
    sim = SimConfig(n_paths=8_192, n_steps=10, antithetic=True)
    kw = dict(corr=corr, option_type="put", exercise="american",
              averaging="arith", spec=SPEC, sim=sim)
    r_f = price_basket_option(jax.random.key(2), [100.0, 95.0, 105.0],
                              [0.5, 0.3, 0.2], 105.0, 1.0, 0.05, 0.25,
                              engine="fused", **kw)
    r_m = price_basket_option(jax.random.key(2), [100.0, 95.0, 105.0],
                              [0.5, 0.3, 0.2], 105.0, 1.0, 0.05, 0.25,
                              engine="mega", **kw)
    assert abs(float(r_f.price) - float(r_m.price)) < 5e-3


def test_ma_mega_cf_tau_price_identity(paths2):
    # the emitted (cf, tau) planes must reproduce the kernel's own price
    p, se, cf, tau = lsmc_price_ma_mega(
        paths2, 100.0, 0.05, 3.0 / 9, phi=1.0, payoff_kind="maxcall",
        degree=2, sorted_basis=True, exercise_from_step=1,
        return_cf_tau=True)
    y = cf * jnp.exp(-0.05 * (3.0 / 9) * tau)
    np.testing.assert_allclose(float(jnp.mean(y)), float(p), rtol=1e-5)


def test_ma_mega_curve_rate_matches_flat():
    # an (n_steps,) constant-rate vector must reproduce the scalar rate
    m_paths = simulate_gbm_multi(jax.random.key(3),
                                 jnp.array([100.0, 100.0]), 0.05, 0.2, 1.0,
                                 SimConfig(n_paths=16_384, n_steps=8),
                                 q=0.0, corr=jnp.eye(2))
    p_s, _ = lsmc_price_ma_mega(m_paths, 100.0, 0.05, 1.0 / 8, phi=-1.0,
                                payoff_kind="basket", degree=2)
    p_v, _ = lsmc_price_ma_mega(m_paths, 100.0, np.full(8, 0.05), 1.0 / 8,
                                phi=-1.0, payoff_kind="basket", degree=2)
    np.testing.assert_allclose(float(p_s), float(p_v), rtol=1e-6)


def test_ma_mega_validation():
    with pytest.raises(ValueError, match="divisible"):
        lsmc_price_ma_mega(jnp.ones((5, 1000, 2)), 100.0, 0.05, 0.25)
    with pytest.raises(ValueError, match="blocked"):
        lsmc_price_ma_mega(jnp.ones((5, 4096)), 100.0, 0.05, 0.25)


def test_ma_mega_hybrid_direct_y_matches_fused():
    # stochastic short rate: pathwise discount planes through the one-
    # kernel engine vs the fused (S, r) pair — identical estimator
    from amcx.hybrid import HullWhiteParams, price_option_hw

    hw = HullWhiteParams(100.0, 0.04, 0.2, kappa=0.8, sigma_r=0.02,
                         rho=-0.4)
    prod = ProductSpec(K=105.0, T=1.0, option_type="put",
                       exercise="american")
    sim = SimConfig(n_paths=8_192, n_steps=20, antithetic=True)
    spec = RegressionSpec(degree=3)
    r_f = price_option_hw(jax.random.key(0), hw, prod, spec, sim,
                          engine="fused")
    r_m = price_option_hw(jax.random.key(0), hw, prod, spec, sim,
                          engine="mega")
    assert abs(float(r_f.price) - float(r_m.price)) < 2e-3, (
        float(r_f.price), float(r_m.price))
    # both must sit near the XLA reference too
    r_x = price_option_hw(jax.random.key(0), hw, prod, spec, sim,
                          engine="xla")
    assert abs(float(r_m.price) - float(r_x.price)) < 0.04


def test_ma_mega_honors_separable_basis_mode():
    # review regression: engine='mega' must price the SAME basis as
    # 'fused'/'xla' for every basis_mode, not silently fall back to total
    r_f = price_max_call(jax.random.key(0), [100.0, 100.0], 100.0, 3.0,
                         0.05, 0.2, q=0.1, n_paths=8_192,
                         basis_mode="separable", engine="fused")
    r_m = price_max_call(jax.random.key(0), [100.0, 100.0], 100.0, 3.0,
                         0.05, 0.2, q=0.1, n_paths=8_192,
                         basis_mode="separable", engine="mega")
    assert abs(float(r_f.price) - float(r_m.price)) < 2e-3, (
        float(r_f.price), float(r_m.price))
