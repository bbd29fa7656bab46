"""On-chip gates for the round-3 fourth-session additions: jump models
(Merton, Bates) and the PDE engine.

Real-TPU-only risks these pin down: (1) `jax.random.poisson` lowering and
hardware-PRNG jump statistics at scale; (2) the ma-mega (S, v) route under
Bates paths; (3) the PCR tridiagonal solve's f32 behaviour on real Mosaic
lowering of the log/exp grid setup (the CPU suite validates the math; the
chip validates the lowering and the transcendental accuracy).
"""

import jax
import numpy as np
import pytest

from amcx import MarketParams, ProductSpec, RegressionSpec, SimConfig
from amcx.dynamics import (HestonParams, MertonJumps, bates_price_cf,
                           merton_price, price_option_bates,
                           price_option_merton)
from amcx.oracle import bs_price, crr_price
from amcx.pde import PDEGrid, pde_greeks, pde_price, pde_price_ladder

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu", reason="real-TPU suite")

JUMPS = MertonJumps(lam=0.8, mu_j=-0.10, sigma_j=0.2)
MKT = MarketParams(100.0, 0.05, 0.2)


def test_merton_european_vs_series_onchip():
    """Hardware-PRNG Poisson counts + conditional normals reproduce the
    Merton series price at 512k paths."""
    prod = ProductSpec(K=100.0, T=1.0, option_type="put",
                       exercise="european")
    res = price_option_merton(
        jax.random.key(11), MKT, JUMPS, prod, RegressionSpec(degree=4),
        SimConfig(n_paths=524_288, n_steps=50, antithetic=True))
    ref = merton_price(100.0, 100.0, 1.0, 0.05, 0.2, JUMPS.lam, JUMPS.mu_j,
                       JUMPS.sigma_j, option_type="put")
    assert abs(float(res.price) - ref) < 3.5 * float(res.stderr) + 2e-3, (
        float(res.price), ref, float(res.stderr))


def test_merton_american_xla_vs_mega_onchip():
    """The univariate mega route (empirical standardization) matches the
    XLA engine on shared Merton paths at scale."""
    prod = ProductSpec(K=100.0, T=1.0, option_type="put",
                       exercise="american")
    sim = SimConfig(n_paths=262_144, n_steps=50, antithetic=True)
    spec = RegressionSpec(degree=4)
    r_x = price_option_merton(jax.random.key(12), MKT, JUMPS, prod, spec,
                              sim, engine="xla")
    r_m = price_option_merton(jax.random.key(12), MKT, JUMPS, prod, spec,
                              sim, engine="mega")
    assert abs(float(r_x.price) - float(r_m.price)) < 5e-3, (
        float(r_x.price), float(r_m.price))
    # American ≥ European series anchor minus MC noise
    eu = merton_price(100.0, 100.0, 1.0, 0.05, 0.2, JUMPS.lam, JUMPS.mu_j,
                      JUMPS.sigma_j, option_type="put")
    assert float(r_x.price) > eu - 3.5 * float(r_x.stderr)


def test_bates_european_vs_cf_onchip():
    hp = HestonParams(S0=100.0, r=0.03, v0=0.04, kappa=1.5, theta=0.04,
                      xi=0.5, rho=-0.7)
    prod = ProductSpec(K=100.0, T=1.0, option_type="put",
                       exercise="european")
    res = price_option_bates(
        jax.random.key(13), hp, JUMPS, prod, RegressionSpec(degree=2),
        SimConfig(n_paths=524_288, n_steps=100, antithetic=True))
    ref = bates_price_cf(hp, JUMPS, 100.0, 1.0, "put")
    # full-truncation discretization bias at 100 steps ~ O(1e-2)
    assert abs(float(res.price) - ref) < 3.5 * float(res.stderr) + 0.03, (
        float(res.price), ref, float(res.stderr))


def test_bates_american_fused_vs_mega_onchip():
    """(S, v) Bates American through both kernel tiers on shared paths."""
    hp = HestonParams(S0=100.0, r=0.03, v0=0.04, kappa=1.5, theta=0.04,
                      xi=0.5, rho=-0.7)
    prod = ProductSpec(K=100.0, T=1.0, option_type="put",
                       exercise="american")
    sim = SimConfig(n_paths=262_144, n_steps=50, antithetic=True)
    spec = RegressionSpec(basis="chebyshev", degree=2)
    r_f = price_option_bates(jax.random.key(14), hp, JUMPS, prod, spec,
                             sim, engine="fused")
    r_m = price_option_bates(jax.random.key(14), hp, JUMPS, prod, spec,
                             sim, engine="mega")
    assert abs(float(r_f.price) - float(r_m.price)) < 5e-3, (
        float(r_f.price), float(r_m.price))


def test_pde_american_put_onchip():
    """CN + PCR on the real chip: American put within 2.5e-3 of CRR-2000
    (the f32 PCR roundoff and on-chip transcendentals are the risk)."""
    res = pde_price(
        MarketParams(100.0, 0.05, 0.2),
        ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american"),
        PDEGrid(n_space=1024, n_steps=256))
    ref = float(crr_price(100.0, 100.0, 1.0, 0.05, 0.2, 2000,
                          option_type="put", american=True))
    assert abs(float(res.price) - ref) < 2.5e-3, (float(res.price), ref)


def test_pde_european_ladder_onchip():
    ks = np.array([80.0, 90.0, 100.0, 110.0, 120.0])
    ps = pde_price_ladder(
        MarketParams(100.0, 0.05, 0.2),
        ProductSpec(K=100.0, T=1.0, option_type="put", exercise="european"),
        ks, PDEGrid(n_space=1024, n_steps=256))
    refs = [float(bs_price(100.0, k, 1.0, 0.05, 0.2, option_type="put"))
            for k in ks]
    for p, ref in zip(np.asarray(ps), refs):
        assert abs(float(p) - ref) < 2.5e-3, (float(p), ref)


def test_pde_greeks_onchip():
    """Autodiff vega/rho through the on-chip time scan vs closed forms."""
    from amcx.oracle import bs_greeks

    market = MarketParams(100.0, 0.05, 0.2)
    prod = ProductSpec(K=100.0, T=1.0, option_type="put",
                       exercise="european")
    g = pde_greeks(market, prod, grid=PDEGrid(n_space=1024, n_steps=256))
    ref = bs_greeks(100.0, 100.0, 1.0, 0.05, 0.2, option_type="put")
    assert abs(float(g["delta"]) - float(ref["delta"])) < 5e-3
    assert abs(float(g["vega"]) - float(ref["vega"])) < 0.01 * abs(
        float(ref["vega"])) + 5e-3
    assert abs(float(g["rho"]) - float(ref["rho"])) < 0.01 * abs(
        float(ref["rho"])) + 5e-3


def test_nig_mega_onchip():
    """NIG on hardware: the MSH inverse-Gaussian sampler's statistics with
    the real PRNG (martingale + CF agreement) and the one-kernel route."""
    from amcx import NIGParams, nig_price_cf, price_option_nig

    nig = NIGParams(alpha=8.0, beta=-3.0, delta=0.3)
    m = MarketParams(100.0, 0.05, 0.2)
    sim = SimConfig(n_paths=262_144, n_steps=50, antithetic=True)
    prod_e = ProductSpec(K=100.0, T=1.0, option_type="put",
                         exercise="european")
    r_e = price_option_nig(jax.random.key(11), m, nig, prod_e,
                           RegressionSpec(degree=4), sim)
    cf = nig_price_cf(100.0, 100.0, 1.0, 0.05, nig, option_type="put")
    assert abs(float(r_e.price) - cf) < 4.0 * float(r_e.stderr), (
        float(r_e.price), cf)
    prod_a = ProductSpec(K=100.0, T=1.0, option_type="put",
                         exercise="american")
    r_x = price_option_nig(jax.random.key(12), m, nig, prod_a,
                           RegressionSpec(degree=4), sim)
    r_m = price_option_nig(jax.random.key(12), m, nig, prod_a,
                           RegressionSpec(degree=4), sim, engine="mega")
    assert abs(float(r_x.price) - float(r_m.price)) < 2.5e-3
