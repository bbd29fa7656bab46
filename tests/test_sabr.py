"""SABR: Hagan oracle, exact-lognormal-vol simulator, LSMC engines, fit.

Oracle chain (module docstring of amcx/sabr.py): MC ↔ mixing is exact in
the shared discrete law (sharp 4σ gate); mixing ↔ Hagan isolates the
documented O(ν²T) approximation error; ν=0 collapses to Black–Scholes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amcx.oracle import bs_price, crr_price
from amcx.sabr import (
    SABRParams,
    calibrate_sabr,
    hagan_implied_vol,
    price_option_sabr,
    sabr_european_price,
    sabr_mixing_price,
    simulate_sabr,
)
from amcx.types import ProductSpec, RegressionSpec, SimConfig

SP = SABRParams(S0=100.0, r=0.03, q=0.0, alpha=0.2, beta=1.0, rho=0.0,
                nu=0.6)


def _mc_european(key, sp, K, T, sim, option_type="call"):
    S = simulate_sabr(key, sp, T, sim)
    phi = 1.0 if option_type == "call" else -1.0
    pay = jnp.maximum(phi * (S[-1] - K), 0.0) * np.exp(-sp.r * T)
    half = sim.n_paths // 2
    pair = 0.5 * (pay[:half] + pay[half:]) if sim.antithetic else pay
    n = pair.shape[0]
    return float(jnp.mean(pair)), float(jnp.std(pair)) / np.sqrt(n)


def test_hagan_limits():
    # β=1, ν=0: flat lognormal smile at α for every strike
    for K in (80.0, 100.0, 125.0):
        np.testing.assert_allclose(
            hagan_implied_vol(100.0, K, 1.0, 0.2, 1.0, -0.5, 0.0), 0.2,
            rtol=1e-14)
    # β=1 ATM: iv = α(1 + (ρνα/4 + (2−3ρ²)/24 ν²) T) exactly (z→0 branch)
    iv = hagan_implied_vol(100.0, 100.0, 1.0, 0.2, 1.0, -0.3, 0.5)
    want = 0.2 * (1.0 + (0.25 * (-0.3) * 0.5 * 0.2
                         + (2.0 - 3.0 * 0.09) / 24.0 * 0.25))
    np.testing.assert_allclose(iv, want, rtol=1e-10)
    # negative ρ skews the smile downward in K
    lo = hagan_implied_vol(100.0, 80.0, 1.0, 0.2, 1.0, -0.6, 0.5)
    hi = hagan_implied_vol(100.0, 125.0, 1.0, 0.2, 1.0, -0.6, 0.5)
    assert lo > hi


def test_mc_matches_mixing_exact_discrete_law():
    """β=1, ρ=0: the 2-factor MC and the conditional-mixing estimator
    sample the SAME discrete law — agreement is pure MC noise."""
    sim = SimConfig(n_paths=131_072, n_steps=50, antithetic=True)
    mc, se_mc = _mc_european(jax.random.key(0), SP, 100.0, 1.0, sim)
    mix, se_mix = sabr_mixing_price(jax.random.key(1), SP, 100.0, 1.0, sim)
    gap = abs(mc - float(mix))
    tol = 4.0 * np.hypot(se_mc, float(se_mix))
    assert gap < tol, (mc, float(mix), tol)


def test_hagan_vs_mixing_approximation_quality():
    """Mixing (exact, low variance) vs Hagan-through-BS: the O(ν²T)
    expansion error at α=0.2, ν=0.6, T=1 measures ~20 bp of vol — gate at
    50 bp via vega so a formula typo (percent-scale error) trips."""
    sim = SimConfig(n_paths=262_144, n_steps=100, antithetic=True)
    mix, se_mix = sabr_mixing_price(jax.random.key(2), SP, 100.0, 1.0, sim)
    hag = float(sabr_european_price(SP, 100.0, 1.0, "call"))
    vega = 100.0 * 0.4  # ≈ BS ATM vega at S=100, T=1
    assert abs(float(mix) - hag) < 0.005 * vega + 4.0 * float(se_mix), (
        float(mix), hag)


def test_nu_zero_is_black_scholes():
    sp = SABRParams(S0=95.0, r=0.05, alpha=0.2, beta=1.0, rho=0.0, nu=0.0)
    sim = SimConfig(n_paths=131_072, n_steps=50, antithetic=True)
    mc, se = _mc_european(jax.random.key(3), sp, 100.0, 1.0, sim, "put")
    bs = float(bs_price(95.0, 100.0, 1.0, 0.05, 0.2, option_type="put"))
    assert abs(mc - bs) < 4.0 * se
    # Hagan degenerates to BS too
    np.testing.assert_allclose(
        float(sabr_european_price(sp, 100.0, 1.0, "put")), bs, rtol=1e-10)
    # American put vs CRR within policy-bias tolerance
    ra = price_option_sabr(
        jax.random.key(4), sp,
        ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american"),
        RegressionSpec(degree=3, regress_on="itm"), sim)
    crr = crr_price(95.0, 100.0, 1.0, 0.05, 0.2, 2000, option_type="put",
                    american=True)
    assert abs(float(ra.price) - float(crr)) < max(
        4.0 * float(ra.stderr), 0.06)


def test_beta_cev_path_sanity():
    """β<1 runs the scan route: forwards stay nonnegative (absorption) and
    the European MC lands within the Hagan approximation + Euler bias."""
    sp = SABRParams(S0=100.0, r=0.02, alpha=2.0, beta=0.7, rho=-0.3, nu=0.5)
    sim = SimConfig(n_paths=131_072, n_steps=100, antithetic=True)
    S = simulate_sabr(jax.random.key(5), sp, 1.0, sim)
    assert float(jnp.min(S)) >= 0.0
    mc, se = _mc_european(jax.random.key(5), sp, 100.0, 1.0, sim)
    hag = float(sabr_european_price(sp, 100.0, 1.0, "call"))
    # α F^{β−1} ≈ 0.5 effective ATM vol; gate at ~1% of price
    assert abs(mc - hag) < 4.0 * se + 0.01 * hag, (mc, hag)


def test_engines_match_xla():
    """Raw-kernel identity on the (S, σ) state: pin regress_on='all' on
    the XLA twin (kernels run the all-paths estimator)."""
    sp = SABRParams(S0=100.0, r=0.03, alpha=0.25, beta=1.0, rho=-0.5,
                    nu=0.8)
    sim = SimConfig(n_paths=8_192, n_steps=9)
    prod = ProductSpec(K=100.0, T=0.75, option_type="put",
                       exercise="american")
    spec = RegressionSpec(degree=2, regress_on="all")
    x = price_option_sabr(jax.random.key(6), sp, prod, spec, sim)
    for eng in ("mega", "fused"):
        k = price_option_sabr(jax.random.key(6), sp, prod, spec, sim,
                              engine=eng)
        assert abs(float(k.price) - float(x.price)) < max(
            2e-2, 0.5 * float(x.stderr)), eng
    with pytest.raises(ValueError, match="American only"):
        price_option_sabr(
            jax.random.key(0), sp,
            ProductSpec(K=100.0, T=1.0, option_type="put",
                        exercise="european"),
            spec, sim, engine="mega")


def test_american_geq_european():
    sim = SimConfig(n_paths=65_536, n_steps=25, antithetic=True)
    sp = SABRParams(S0=100.0, r=0.04, alpha=0.2, beta=1.0, rho=-0.5, nu=0.6)
    prod_a = ProductSpec(K=105.0, T=1.0, option_type="put",
                         exercise="american")
    prod_e = ProductSpec(K=105.0, T=1.0, option_type="put",
                         exercise="european")
    spec = RegressionSpec(degree=3)
    ra = price_option_sabr(jax.random.key(7), sp, prod_a, spec, sim)
    re = price_option_sabr(jax.random.key(7), sp, prod_e, spec, sim)
    assert float(ra.price) >= float(re.price) - 2.0 * float(re.stderr)


def test_calibrate_roundtrip():
    """Fitting a Hagan-generated smile recovers (α, ρ, ν) to solver
    precision — the same oracle-on-oracle style as calibrate_heston."""
    F, T = 100.0, 1.0
    true = dict(alpha=0.22, beta=1.0, rho=-0.45, nu=0.75)
    strikes = np.linspace(70.0, 140.0, 15)
    ivs = hagan_implied_vol(F, strikes, T, true["alpha"], true["beta"],
                            true["rho"], true["nu"])
    fit = calibrate_sabr(F, T, strikes, ivs, beta=1.0)
    np.testing.assert_allclose(fit.alpha, true["alpha"], rtol=1e-6)
    np.testing.assert_allclose(fit.rho, true["rho"], rtol=1e-5)
    np.testing.assert_allclose(fit.nu, true["nu"], rtol=1e-5)


def test_param_validation():
    with pytest.raises(ValueError, match="beta"):
        SABRParams(beta=1.5)
    with pytest.raises(ValueError, match="rho"):
        SABRParams(rho=2.0)
    with pytest.raises(ValueError, match="alpha"):
        SABRParams(alpha=-0.1)
    with pytest.raises(ValueError, match="mixing"):
        sabr_mixing_price(jax.random.key(0),
                          SABRParams(rho=-0.5), 100.0, 1.0, SimConfig())
