"""Heston / local-vol dynamics: simulator, CF oracle, American pricer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amcx.dynamics import (
    HestonParams,
    heston_price_cf,
    price_option_heston,
    simulate_heston,
    simulate_local_vol,
)
from amcx.oracle import bs_price
from amcx.types import ProductSpec, RegressionSpec, SimConfig

HP = HestonParams(S0=100.0, r=0.03, q=0.0, v0=0.04, kappa=1.5, theta=0.04,
                  xi=0.5, rho=-0.7)


def test_cf_oracle_bs_limit():
    """ξ→0 with v0=θ collapses Heston to BS(σ=√v0); the CF formulation is
    cancellation-limited below ξ≈0.01, so check the quadratic approach."""
    bs = float(bs_price(100.0, 100.0, 1.0, 0.03, 0.2, option_type="call", q=0.01))
    diffs = []
    for xi in (0.1, 0.05):
        hp = HestonParams(S0=100.0, r=0.03, q=0.01, v0=0.04, kappa=2.0,
                          theta=0.04, xi=xi, rho=0.0)
        diffs.append(abs(heston_price_cf(hp, 100.0, 1.0, "call") - bs))
    assert diffs[1] < 0.01
    # quadratic in ξ: halving ξ shrinks the gap ~4×
    assert diffs[0] / diffs[1] > 2.5


def test_cf_put_call_parity():
    c = heston_price_cf(HP, 105.0, 1.0, "call")
    p = heston_price_cf(HP, 105.0, 1.0, "put")
    want = HP.S0 * np.exp(-HP.q) - 105.0 * np.exp(-HP.r)
    np.testing.assert_allclose(c - p, want, atol=1e-8)


@pytest.fixture(scope="module")
def heston_paths():
    sim = SimConfig(n_paths=131_072, n_steps=200, antithetic=True)
    return simulate_heston(jax.random.key(0), HP, 1.0, sim, return_variance=True)


def test_mc_european_matches_cf(heston_paths):
    """Full-truncation Euler at 200 steps vs the semi-analytic price."""
    S, _ = heston_paths
    pay = jnp.maximum(S[-1] - 100.0, 0.0)
    mc = float(jnp.mean(pay)) * np.exp(-HP.r)
    se = float(jnp.std(pay)) / np.sqrt(S.shape[1]) * np.exp(-HP.r)
    cf = heston_price_cf(HP, 100.0, 1.0, "call")
    # 4·stderr plus a small discretization-bias allowance
    assert abs(mc - cf) < 4 * se + 0.02, (mc, cf, se)


def test_martingale(heston_paths):
    S, v = heston_paths
    disc = float(jnp.mean(S[-1])) * np.exp(-(HP.r - HP.q))
    np.testing.assert_allclose(disc, HP.S0, rtol=2e-3)
    # floored variance output is nonnegative and mean-reverts toward θ
    assert float(jnp.min(v)) >= 0.0
    np.testing.assert_allclose(float(jnp.mean(v[-1])), HP.theta, rtol=0.1)


def test_american_geq_european_and_cf():
    sim = SimConfig(n_paths=65_536, n_steps=50)
    spec = RegressionSpec(degree=3)
    am = price_option_heston(
        jax.random.key(1), HP,
        ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american"),
        spec, sim)
    eu = price_option_heston(
        jax.random.key(1), HP,
        ProductSpec(K=100.0, T=1.0, option_type="put", exercise="european"),
        spec, sim)
    cf_put = heston_price_cf(HP, 100.0, 1.0, "put")
    se = float(eu.stderr)
    assert float(am.price) >= float(eu.price) - 1e-3
    assert abs(float(eu.price) - cf_put) < 4 * se + 0.02
    # early-exercise premium on an ATM put with r>0 is strictly positive
    assert float(am.price) - float(eu.price) > 0.05


def test_heston_antithetic_and_shapes():
    sim = SimConfig(n_paths=4096, n_steps=10, antithetic=True)
    S = simulate_heston(jax.random.key(3), HP, 1.0, sim)
    assert S.shape == (11, 4096)
    np.testing.assert_allclose(np.asarray(S[0]), 100.0)
    assert np.isfinite(np.asarray(S)).all()


def test_heston_params_validation():
    with pytest.raises(ValueError, match="rho"):
        HestonParams(rho=1.5)
    with pytest.raises(ValueError, match="nonnegative"):
        HestonParams(v0=-0.1)


def test_local_vol_constant_is_bs():
    sim = SimConfig(n_paths=131_072, n_steps=50, antithetic=True)
    S = simulate_local_vol(jax.random.key(2), 100.0, 0.03, 0.0,
                           lambda t, s: 0.2, 1.0, sim)
    pay = jnp.maximum(S[-1] - 100.0, 0.0)
    mc = float(jnp.mean(pay)) * np.exp(-0.03)
    se = float(jnp.std(pay)) / np.sqrt(S.shape[1]) * np.exp(-0.03)
    bs = float(bs_price(100.0, 100.0, 1.0, 0.03, 0.2, option_type="call"))
    assert abs(mc - bs) < 4 * se + 0.01, (mc, bs, se)


def test_heston_delta_via_fused_ad():
    """Composition: the custom-VJP fused pricer differentiates through the
    Heston simulator — stochastic-vol pathwise delta with Pallas pricing."""
    from amcx.greeks import fused_price_diff

    sim = SimConfig(n_paths=16_384, n_steps=20)
    key = jax.random.key(5)
    n_steps = sim.n_steps
    dt = 1.0 / n_steps

    def price(S0):
        hp = HestonParams(S0=1.0, r=HP.r, q=HP.q, v0=HP.v0, kappa=HP.kappa,
                          theta=HP.theta, xi=HP.xi, rho=HP.rho)
        paths = S0 * simulate_heston(key, hp, 1.0, sim)
        return fused_price_diff(paths, HP.r, 100.0, dt, None, n_steps, -1.0,
                                RegressionSpec(degree=4), True, "down-in")

    delta = float(jax.grad(price)(jnp.float32(100.0)))
    assert -1.0 < delta < -0.2, delta


def test_heston_ccr_exposures():
    """The (S,v) engine's continuation surface feeds the CCR analytics."""
    from amcx.exposures import compute_ccr_exposures

    sim = SimConfig(n_paths=8192, n_steps=20)
    res = price_option_heston(
        jax.random.key(2), HP,
        ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american"),
        RegressionSpec(degree=2), sim, return_surface=True)
    assert res.continuation.shape == (21, 8192)
    ccr = compute_ccr_exposures(res.continuation)
    epe = np.asarray(ccr.epe)
    assert np.isfinite(epe[:-1]).all()
    # f32: at t=0 all continuation values coincide, so pfe95 == epe only up
    # to interpolation rounding at magnitude ~6
    assert (np.asarray(ccr.pfe95)[:-1] >= epe[:-1] - 1e-4).all()


def test_heston_fused_matches_xla():
    """The fused multi-asset kernels price Heston American (payoff on the S
    plane, regression on (S, v)) consistently with the XLA engine."""
    sim = SimConfig(n_paths=16_384, n_steps=20)
    prod = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")
    spec = RegressionSpec(degree=2)
    x = price_option_heston(jax.random.key(4), HP, prod, spec, sim)
    f = price_option_heston(jax.random.key(4), HP, prod, spec, sim,
                            engine="fused")
    # same paths, different solve path (pinv vs pinv on kernel moments):
    # boundary-flip noise bound
    assert abs(float(f.price) - float(x.price)) < max(2e-2, 0.5 * float(x.stderr))
    with pytest.raises(ValueError, match="American only"):
        price_option_heston(
            jax.random.key(0), HP,
            ProductSpec(K=100.0, T=1.0, option_type="put", exercise="european"),
            spec, sim, engine="fused")


# ---------------------------------------------------------------------------
# Andersen QE scheme
# ---------------------------------------------------------------------------

# Feller-violating config (2κθ = 0.08 < ξ² = 1.0) where the coarse-step
# Euler truncation bias is unmistakable: measured (524k paths) Euler
# n_steps=8 bias +1.46, QE bias −0.015
HP_QE = HestonParams(S0=100.0, r=0.03, q=0.0, v0=0.04, kappa=1.0,
                     theta=0.04, xi=1.0, rho=-0.9)


def test_qe_variance_transition_moments():
    """One QE step reproduces the EXACT CIR conditional mean/variance —
    in both the quadratic (ψ ≤ 1.5) and exponential (ψ > 1.5) regimes."""
    for hp, label in ((HestonParams(v0=0.04, kappa=1.5, theta=0.04, xi=0.3),
                       "quadratic"),
                      (HP_QE, "exponential")):
        T = 1.0
        sim = SimConfig(n_paths=262_144, n_steps=1, antithetic=False)
        _, v = simulate_heston(jax.random.key(11), hp, T, sim,
                               return_variance=True, scheme="qe")
        e = np.exp(-hp.kappa * T)
        m = hp.theta + (hp.v0 - hp.theta) * e
        s2 = (hp.v0 * hp.xi**2 * e * (1 - e) / hp.kappa
              + hp.theta * hp.xi**2 * (1 - e) ** 2 / (2 * hp.kappa))
        psi = s2 / m**2
        if label == "quadratic":
            assert psi <= 1.5, psi
        else:
            assert psi > 1.5, psi
        v1 = np.asarray(v[-1], dtype=np.float64)
        n = v1.size
        np.testing.assert_allclose(v1.mean(), m,
                                   atol=5 * np.sqrt(s2 / n), rtol=0)
        np.testing.assert_allclose(v1.var(), s2, rtol=0.03)
        assert v1.min() >= 0.0


def test_qe_coarse_steps_kill_euler_bias():
    """At 8 steps on the Feller-violating config the QE European lands on
    the CF oracle while full-truncation Euler is off by O(1)."""
    sim = SimConfig(n_paths=131_072, n_steps=8, antithetic=True)
    cf = heston_price_cf(HP_QE, 100.0, 1.0, "call")
    out = {}
    for scheme in ("euler", "qe"):
        S = simulate_heston(jax.random.key(5), HP_QE, 1.0, sim,
                            scheme=scheme)
        pay = jnp.maximum(S[-1] - 100.0, 0.0) * np.exp(-HP_QE.r)
        h = sim.n_paths // 2
        pair = 0.5 * (pay[:h] + pay[h:])
        out[scheme] = (float(jnp.mean(pair)),
                       float(jnp.std(pair)) / np.sqrt(h))
    mc, se = out["qe"]
    assert abs(mc - cf) < 4 * se + 0.02, (mc, cf, se)
    assert out["euler"][0] - cf > 0.5  # the bias QE removes


def test_qe_martingale_exact_per_step():
    """The K₀* correction makes the discounted spot drift exact (not just
    O(Δ)): E[e^{-(r-q)T} S_T] = S0 to MC noise even at 4 steps."""
    sim = SimConfig(n_paths=262_144, n_steps=4, antithetic=True)
    S = simulate_heston(jax.random.key(6), HP_QE, 1.0, sim, scheme="qe")
    h = sim.n_paths // 2
    pair = 0.5 * (S[-1][:h] + S[-1][h:]) * np.exp(-(HP_QE.r - HP_QE.q))
    m = float(jnp.mean(pair))
    se = float(jnp.std(pair)) / np.sqrt(h)
    assert abs(m - HP_QE.S0) < 4 * se, (m, se)


def test_qe_american_engines_agree():
    """scheme='qe' flows through the XLA scan and the one-kernel ma-mega
    identically (shared paths; kernel-vs-scan f32 boundary noise only)."""
    sim = SimConfig(n_paths=16_384, n_steps=20)
    prod = ProductSpec(K=100.0, T=1.0, option_type="put",
                       exercise="american")
    spec = RegressionSpec(degree=2, regress_on="all")
    x = price_option_heston(jax.random.key(7), HP, prod, spec, sim,
                            scheme="qe")
    m = price_option_heston(jax.random.key(7), HP, prod, spec, sim,
                            engine="mega", scheme="qe")
    assert abs(float(m.price) - float(x.price)) < max(
        2e-2, 0.5 * float(x.stderr))
    eu = price_option_heston(
        jax.random.key(7), HP,
        ProductSpec(K=100.0, T=1.0, option_type="put", exercise="european"),
        spec, sim, scheme="qe")
    assert float(x.price) >= float(eu.price) - 1e-3
    with pytest.raises(ValueError, match="scheme"):
        simulate_heston(jax.random.key(0), HP, 1.0, sim, scheme="bogus")
