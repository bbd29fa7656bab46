"""Barrier products under non-GBM dynamics (Heston/Bates/local-vol/Lévy).

The engines gate the SAME induction on `barrier_gate` of the spot plane
(discrete monitoring on the simulation grid, reference Q4 semantics), so
two exact identities certify the wiring:

- European in-out parity is PATHWISE exact on shared paths:
  knock-in + knock-out = vanilla (the gates partition every path).
- ξ→0 (v0=θ) collapses Heston to GBM: the barrier price must match the
  flagship GBM barrier engine statistically.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amcx.dynamics import (HestonParams, MertonJumps, price_option_bates,
                           price_option_heston, price_option_local_vol,
                           price_option_merton)
from amcx.engine import price_option
from amcx.types import MarketParams, ProductSpec, RegressionSpec, SimConfig

HP = HestonParams(S0=100.0, r=0.03, q=0.0, v0=0.04, kappa=1.5, theta=0.04,
                  xi=0.5, rho=-0.7)
SIM = SimConfig(n_paths=65_536, n_steps=50, antithetic=True)
SPEC = RegressionSpec(degree=3, regress_on="all")


def _prod(exercise="european", barrier=None, barrier_type="down-in"):
    return ProductSpec(K=100.0, T=1.0, option_type="put", exercise=exercise,
                       barrier=barrier, barrier_type=barrier_type)


def test_heston_european_in_out_parity_is_pathwise_exact():
    key = jax.random.key(0)
    van = price_option_heston(key, HP, _prod(), SPEC, SIM)
    din = price_option_heston(key, HP, _prod(barrier=85.0,
                                              barrier_type="down-in"),
                              SPEC, SIM)
    dout = price_option_heston(key, HP, _prod(barrier=85.0,
                                              barrier_type="down-out"),
                               SPEC, SIM)
    np.testing.assert_allclose(float(din.price) + float(dout.price),
                               float(van.price), atol=2e-3)
    assert 0.0 < float(din.price) < float(van.price)


def test_heston_xi_to_zero_matches_gbm_barrier_engine():
    hp0 = HestonParams(S0=100.0, r=0.03, q=0.0, v0=0.04, kappa=1.5,
                       theta=0.04, xi=1e-3, rho=-0.7)
    prod = _prod(exercise="american", barrier=85.0)
    h = price_option_heston(jax.random.key(1), hp0, prod, SPEC, SIM)
    g = price_option(jax.random.key(2), MarketParams(100.0, 0.03, 0.2),
                     prod, SPEC, SIM)
    tol = 4.0 * np.hypot(float(h.stderr), float(g.stderr)) + 5e-3
    assert abs(float(h.price) - float(g.price)) < tol, (
        float(h.price), float(g.price), tol)


def test_heston_american_barrier_bounds_and_fused_raises():
    prod_in = _prod(exercise="american", barrier=85.0)
    van = price_option_heston(jax.random.key(3), HP,
                              _prod(exercise="american"), SPEC, SIM)
    din = price_option_heston(jax.random.key(3), HP, prod_in, SPEC, SIM)
    assert 0.0 < float(din.price) < float(van.price)
    with pytest.raises(ValueError, match="fused"):
        price_option_heston(jax.random.key(0), HP, prod_in, SPEC, SIM,
                            engine="fused")


@pytest.mark.parametrize("barrier,barrier_type",
                         [(85.0, "down-in"), (85.0, "down-out"),
                          (120.0, "up-out")])
def test_heston_barrier_mega_matches_xla(barrier, barrier_type):
    """The ma-mega kernel's sign-bit knock gate reproduces the XLA (S, v)
    induction on shared paths for every knock variant (the univariate
    mega's encoding, `lsmc_ma_mega.read_planes`)."""
    prod = _prod(exercise="american", barrier=barrier,
                 barrier_type=barrier_type)
    sim = SimConfig(n_paths=8_192, n_steps=20, antithetic=True)
    rx = price_option_heston(jax.random.key(9), HP, prod, SPEC, sim)
    rm = price_option_heston(jax.random.key(9), HP, prod, SPEC, sim,
                             engine="mega")
    # same paths, two carry formulations: f32 boundary-flip noise only
    assert abs(float(rx.price) - float(rm.price)) < 1e-3, (
        barrier_type, float(rx.price), float(rm.price))


def test_sabr_barrier_mega_matches_xla():
    """Barrier through the shared two-state kernel tail under SABR —
    the non-Heston dynamics exercise the same tail dispatch."""
    from amcx.sabr import SABRParams, price_option_sabr

    sp = SABRParams(S0=100.0, r=0.03, alpha=0.2, beta=1.0, rho=-0.5, nu=0.4)
    prod = _prod(exercise="american", barrier=85.0)
    sim = SimConfig(n_paths=8_192, n_steps=20, antithetic=True)
    rx = price_option_sabr(jax.random.key(11), sp, prod, SPEC, sim)
    rm = price_option_sabr(jax.random.key(11), sp, prod, SPEC, sim,
                           engine="mega")
    assert abs(float(rx.price) - float(rm.price)) < 1e-3, (
        float(rx.price), float(rm.price))


def test_bates_barrier_parity():
    jp = MertonJumps(lam=0.4, mu_j=-0.1, sigma_j=0.15)
    key = jax.random.key(4)
    van = price_option_bates(key, HP, jp, _prod(), SPEC, SIM)
    din = price_option_bates(key, HP, jp, _prod(barrier=85.0), SPEC, SIM)
    dout = price_option_bates(key, HP, jp,
                              _prod(barrier=85.0, barrier_type="down-out"),
                              SPEC, SIM)
    np.testing.assert_allclose(float(din.price) + float(dout.price),
                               float(van.price), atol=2e-3)
    # jumps make deep crossings likelier than the pure diffusion
    din_h = price_option_heston(key, HP, _prod(barrier=85.0), SPEC, SIM)
    assert float(din.price) > float(din_h.price) - 3.0 * float(din.stderr)


def test_local_vol_constant_sigma_barrier_matches_gbm_both_engines():
    sigma_fn = lambda t, S: 0.2
    prod = _prod(exercise="american", barrier=85.0)
    sim = SimConfig(n_paths=65_536, n_steps=50, antithetic=True)
    lx = price_option_local_vol(jax.random.key(5), 100.0, 0.03, 0.0,
                                sigma_fn, prod, SPEC, sim)
    lm = price_option_local_vol(jax.random.key(5), 100.0, 0.03, 0.0,
                                sigma_fn, prod, SPEC, sim, engine="mega")
    # shared paths, two engines (XLA gate vs in-kernel sign-bit knock)
    assert abs(float(lx.price) - float(lm.price)) < max(
        2e-2, 0.5 * float(lx.stderr)), (float(lx.price), float(lm.price))
    g = price_option(jax.random.key(6), MarketParams(100.0, 0.03, 0.2),
                     prod, SPEC, sim)
    tol = 4.0 * np.hypot(float(lx.stderr), float(g.stderr)) + 5e-3
    assert abs(float(lx.price) - float(g.price)) < tol


def test_merton_zero_intensity_barrier_collapses_to_gbm():
    jp0 = MertonJumps(lam=0.0, mu_j=-0.1, sigma_j=0.15)
    prod = _prod(exercise="american", barrier=85.0)
    m = price_option_merton(jax.random.key(7),
                            MarketParams(100.0, 0.03, 0.2), jp0, prod,
                            SPEC, SIM)
    g = price_option(jax.random.key(8), MarketParams(100.0, 0.03, 0.2),
                     prod, SPEC, SIM)
    tol = 4.0 * np.hypot(float(m.stderr), float(g.stderr)) + 5e-3
    assert abs(float(m.price) - float(g.price)) < tol


def test_two_state_and_levy_barrier_parity_smoke():
    """In-out parity on shared paths for every remaining dynamics the
    shared tails claim to cover: SABR, rough Bergomi, VG, NIG."""
    from amcx.dynamics import (NIGParams, VGParams, price_option_nig,
                               price_option_vg)
    from amcx.roughvol import RBergomiParams, price_option_rbergomi
    from amcx.sabr import SABRParams, price_option_sabr

    sim = SimConfig(n_paths=16_384, n_steps=25, antithetic=True)
    cases = [
        (lambda p, k: price_option_sabr(
            k, SABRParams(S0=100.0, r=0.03, alpha=0.2, beta=1.0, rho=-0.5,
                          nu=0.4), p, SPEC, sim)),
        (lambda p, k: price_option_rbergomi(
            k, RBergomiParams(S0=100.0, r=0.03, xi0=0.04, eta=1.0,
                              rho=-0.7, H=0.1), p, SPEC, sim)),
        (lambda p, k: price_option_vg(
            k, MarketParams(100.0, 0.03, 0.2), VGParams(), p, SPEC, sim)),
        (lambda p, k: price_option_nig(
            k, MarketParams(100.0, 0.03, 0.2), NIGParams(), p, SPEC, sim)),
    ]
    for i, price in enumerate(cases):
        key = jax.random.key(100 + i)
        van = price(_prod(), key)
        din = price(_prod(barrier=85.0), key)
        dout = price(_prod(barrier=85.0, barrier_type="down-out"), key)
        np.testing.assert_allclose(
            float(din.price) + float(dout.price), float(van.price),
            atol=3e-3, err_msg=f"case {i}")
        assert 0.0 <= float(din.price) <= float(van.price) + 1e-6
