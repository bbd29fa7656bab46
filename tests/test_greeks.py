"""Pathwise Greeks vs Black-Scholes closed form and finite differences
(SURVEY §4: "autodiff Greeks tests vs finite differences and closed-form
delta/vega/rho for the European case")."""

import jax
import numpy as np
import pytest

from amcx import MarketParams, ProductSpec, RegressionSpec, SimConfig
from amcx.greeks import gamma_fd, price_and_greeks
from amcx.oracle import bs_greeks

M = MarketParams(100.0, 0.05, 0.2)
SIM = SimConfig(n_paths=100_000, n_steps=50)
SPEC = RegressionSpec(degree=4)


@pytest.fixture(scope="module")
def euro_greeks():
    prod = ProductSpec(K=100.0, T=1.0, option_type="call", exercise="european")
    return price_and_greeks(jax.random.key(42), M, prod, SPEC, SIM)


def test_european_delta_vega_rho_match_closed_form(euro_greeks):
    # Vega gate pinned by a 10-seed study (round 5): the pathwise estimator
    # is UNBIASED (mean rel-deviation +0.05%, pathwise-vs-CRN-FD gap 5e-4 at
    # 1M paths); per-seed MC sd is 0.58% at 100k paths, and this fixture's
    # deterministic seed-42 value sits −0.22% from closed form — rtol 1%
    # leaves 4.5× margin while a 2× regression of the real gap trips CI.
    _, g = euro_greeks
    want = bs_greeks(100.0, 100.0, 1.0, 0.05, 0.2, option_type="call")
    np.testing.assert_allclose(float(g["delta"]), float(want["delta"]), atol=0.01)
    np.testing.assert_allclose(float(g["vega"]), float(want["vega"]), rtol=0.01)
    np.testing.assert_allclose(float(g["rho"]), float(want["rho"]), rtol=0.02)


def test_european_vega_matches_fd_through_refit():
    """Estimator-unbiasedness gate: pathwise vega vs central FD of the FULL
    pipeline (incl. the regression refit) under common random numbers. The
    two estimators share every path, so the gap isolates autodiff-vs-refit
    bias from MC noise — measured ≤ 6e-3 across seeds at 100k paths (round-5
    study; 5e-4 at 1M). A stop-grad-style coefficient bias would show here
    first, long before the closed-form gate moves."""
    import dataclasses

    from amcx import price_option

    prod = ProductSpec(K=100.0, T=1.0, option_type="call", exercise="european")
    key = jax.random.key(42)
    _, g = price_and_greeks(key, M, prod, SPEC, SIM)
    h = 0.005
    up = price_option(key, dataclasses.replace(M, sigma=0.2 + h), prod, SPEC, SIM)
    dn = price_option(key, dataclasses.replace(M, sigma=0.2 - h), prod, SPEC, SIM)
    fd = (float(up.price) - float(dn.price)) / (2 * h)
    assert abs(float(g["vega"]) - fd) < 0.02


def test_european_theta_sign(euro_greeks):
    _, g = euro_greeks
    assert float(g["theta"]) < 0  # long option loses value with time


def test_greeks_match_finite_differences():
    """Pathwise delta vs central FD bump of the full pipeline (common random
    numbers). European case: exercise is fixed, so the two estimators agree
    up to O(h²) bias. (For American, FD additionally picks up discrete
    exercise-decision flips under the bump — covered by the bounds test.)"""
    from amcx import price_option
    import dataclasses

    prod = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="european")
    key = jax.random.key(7)
    _, g = price_and_greeks(key, M, prod, SPEC, SIM)
    h = 0.5
    up = price_option(key, dataclasses.replace(M, S0=100.0 + h), prod, SPEC, SIM)
    dn = price_option(key, dataclasses.replace(M, S0=100.0 - h), prod, SPEC, SIM)
    fd = (float(up.price) - float(dn.price)) / (2 * h)
    np.testing.assert_allclose(float(g["delta"]), fd, atol=0.01)


def test_american_put_delta_bounds():
    prod = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")
    _, g = price_and_greeks(jax.random.key(0), M, prod, SPEC, SIM)
    assert -1.0 <= float(g["delta"]) <= 0.0


def test_gamma_positive_for_vanilla():
    prod = ProductSpec(K=100.0, T=1.0, option_type="call", exercise="european")
    gam = gamma_fd(jax.random.key(0), M, prod, SPEC, SIM)
    assert float(gam) > 0


def test_pallas_backend_swapped_for_greeks():
    """Greeks must work even if the caller asked for the (non-differentiable)
    pallas backend."""
    prod = ProductSpec(K=100.0, T=1.0, option_type="call", exercise="european")
    sim = SimConfig(n_paths=4096, n_steps=10, backend="pallas")
    p, g = price_and_greeks(jax.random.key(0), M, prod, SPEC, sim)
    assert np.isfinite(float(p)) and np.isfinite(float(g["delta"]))


def test_fast_greeks_match_autodiff():
    """Closed-form pathwise Greeks from engine outputs equal the autodiff
    estimator (same fixed-boundary quantity, no pipeline re-run)."""
    from amcx import lsmc_option_pricing, simulate_gbm
    from amcx.greeks import fast_greeks

    prod = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")
    key = jax.random.key(7)
    _, g = price_and_greeks(key, M, prod, SPEC, SIM)
    paths = simulate_gbm(key, M, 1.0, SIM)
    res = lsmc_option_pricing(paths, prod, M.r, SPEC, return_surface=False)
    fg = fast_greeks(res, M, prod, SIM.n_steps)
    np.testing.assert_allclose(float(fg["delta"]), float(g["delta"]), atol=3e-3)
    np.testing.assert_allclose(float(fg["vega"]), float(g["vega"]), rtol=5e-3)
    np.testing.assert_allclose(float(fg["rho"]), float(g["rho"]), rtol=5e-3)


def test_fast_greeks_from_fused_engine():
    from amcx import simulate_gbm
    from amcx.engine_pallas import lsmc_option_pricing_fused
    from amcx.greeks import fast_greeks

    prod = ProductSpec(K=100.0, T=1.0, option_type="call", exercise="american")
    paths = simulate_gbm(jax.random.key(1), M, 1.0, SimConfig(n_paths=65536, n_steps=20))
    res = lsmc_option_pricing_fused(paths, prod, M.r, SPEC)
    fg = fast_greeks(res, M, prod, 20)
    assert 0.0 <= float(fg["delta"]) <= 1.0
    assert float(fg["vega"]) > 0


def test_fast_greeks_rejects_barrier():
    from amcx.greeks import fast_greeks
    from amcx.engine import LSMCResult
    import jax.numpy as jnp

    dummy = LSMCResult(jnp.zeros(()), jnp.zeros(()), jnp.zeros(4), jnp.zeros(4), None)
    barrier_prod = ProductSpec(K=100.0, T=1.0, barrier=80.0, option_type="put", exercise="american")
    with pytest.raises(ValueError, match="vanilla"):
        fast_greeks(dummy, M, barrier_prod, 4)


def test_fast_greeks_theta_divrho_match_autodiff():
    """The closed-form theta / dividend-rho added to fast_greeks equal the
    autodiff estimator on the same paths (same fixed-boundary quantity)."""
    from amcx import lsmc_option_pricing, simulate_gbm
    from amcx.greeks import fast_greeks

    m = MarketParams(100.0, 0.03, 0.25, 0.02)
    prod = ProductSpec(K=105.0, T=1.5, option_type="put", exercise="american")
    key = jax.random.key(13)
    _, g = price_and_greeks(key, m, prod, SPEC, SIM)
    paths = simulate_gbm(key, m, 1.5, SIM)
    res = lsmc_option_pricing(paths, prod, m.r, SPEC, return_surface=False)
    fg = fast_greeks(res, m, prod, SIM.n_steps)
    np.testing.assert_allclose(float(fg["theta"]), float(g["theta"]), rtol=1e-2, atol=2e-3)
    np.testing.assert_allclose(float(fg["dividend_rho"]), float(g["dividend_rho"]),
                               rtol=1e-2, atol=2e-3)


def test_fused_engine_greeks_match_closed_form():
    """price_and_greeks(engine='fused'): Greeks at fused-engine speed must
    match Black-Scholes closed form for the European case (VERDICT r1 #7)."""
    prod = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="european")
    sim = SimConfig(n_paths=262_144, n_steps=20)
    p, g = price_and_greeks(jax.random.key(4), M, prod, SPEC, sim, engine="fused")
    from amcx.oracle import bs_greeks, bs_price

    ref = bs_greeks(100.0, 100.0, 1.0, M.r, M.sigma, option_type="put")
    bs = float(bs_price(100.0, 100.0, 1.0, M.r, M.sigma, option_type="put"))
    assert abs(float(p) - bs) < 0.08
    np.testing.assert_allclose(float(g["delta"]), float(ref["delta"]), atol=5e-3)
    np.testing.assert_allclose(float(g["vega"]), float(ref["vega"]), rtol=2e-2)
    np.testing.assert_allclose(float(g["rho"]), float(ref["rho"]), rtol=2e-2)
    assert float(g["theta"]) < 0


def test_fused_engine_greeks_rejects_barrier():
    prod = ProductSpec(K=100.0, T=1.0, barrier=80.0, option_type="put",
                       exercise="american")
    with pytest.raises(ValueError, match="vanilla"):
        price_and_greeks(jax.random.key(0), M, prod, SPEC, SIM, engine="fused")


def test_fused_ad_matches_xla_autodiff():
    """The custom-VJP fused pricer computes the identical fixed-boundary
    pathwise estimator as jax.grad through the XLA engine — same key, same
    greeks to f32 noise (both engines run the same decisions on the
    virtual-CPU interpret path)."""
    sim = SimConfig(n_paths=16_384, n_steps=20)
    prod = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")
    key = jax.random.key(11)
    p_x, g_x = price_and_greeks(key, M, prod, RegressionSpec(degree=4), sim,
                                engine="xla")
    p_f, g_f = price_and_greeks(key, M, prod, RegressionSpec(degree=4), sim,
                                engine="fused-ad")
    # 4e-4: the auto-resolved ITM fit's weighted Gram is worse-conditioned
    # than the all-paths one, so kernel-vs-XLA f32 route noise flips a few
    # more boundary decisions (~2.5e-4 relative on this config)
    np.testing.assert_allclose(float(p_f), float(p_x), rtol=4e-4)
    for name in ("delta", "vega", "rho", "dividend_rho", "theta"):
        np.testing.assert_allclose(float(g_f[name]), float(g_x[name]),
                                   rtol=5e-3, atol=5e-3, err_msg=name)


def test_fused_ad_barrier_greeks_supported():
    """fused-ad covers barriers (same knock-sensitivity caveat as xla)."""
    sim = SimConfig(n_paths=16_384, n_steps=20)
    prod = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american",
                       barrier=85.0)
    key = jax.random.key(4)
    p_x, g_x = price_and_greeks(key, M, prod, RegressionSpec(degree=4), sim,
                                engine="xla")
    p_f, g_f = price_and_greeks(key, M, prod, RegressionSpec(degree=4), sim,
                                engine="fused-ad")
    np.testing.assert_allclose(float(p_f), float(p_x), atol=5e-3)
    np.testing.assert_allclose(float(g_f["delta"]), float(g_x["delta"]),
                               atol=1e-2)


def test_fused_ad_general_dynamics():
    """The VJP composes with a NON-GBM differentiable simulator: a CEV-like
    local-vol Euler scheme. Delta must match central finite differences of
    the same (fixed-key) pipeline."""
    import jax.numpy as jnp

    from amcx.greeks import fused_price_diff

    n_paths, n_steps = 16_384, 20
    dt = 1.0 / n_steps
    key = jax.random.key(7)
    Z = jax.random.normal(key, (n_steps, n_paths), jnp.float32)

    def simulate_cev(S0, sigma, beta):
        def step(S, z):
            vol = sigma * (S / 100.0) ** (beta - 1.0)
            S2 = S * jnp.exp((0.05 - 0.5 * vol**2) * dt
                             + vol * jnp.sqrt(dt) * z)
            return S2, S2
        _, path = jax.lax.scan(step, jnp.full((n_paths,), S0, jnp.float32), Z)
        return jnp.concatenate([jnp.full((1, n_paths), S0, jnp.float32), path])

    def price(S0):
        paths = simulate_cev(S0, 0.25, 0.7)
        return fused_price_diff(paths, 0.05, 100.0, dt, None, n_steps, -1.0,
                                RegressionSpec(degree=4), True, "down-in")

    delta = float(jax.grad(price)(jnp.float32(100.0)))
    h = 0.5
    fd = (float(price(jnp.float32(100.0 + h))) - float(price(jnp.float32(100.0 - h)))) / (2 * h)
    # pathwise vs FD differ by boundary terms at this path count; loose gate
    assert abs(delta - fd) < 0.05, (delta, fd)
    assert -1.0 < delta < 0.0


def test_mega_engine_greeks_match_xla():
    """price_and_greeks(engine='mega'): closed-form Greeks from the mega
    kernel's exported (cf, τ) planes match the autodiff estimator."""
    import jax

    from amcx import MarketParams, ProductSpec, RegressionSpec, SimConfig
    from amcx.greeks import price_and_greeks

    m = MarketParams(100.0, 0.05, 0.2)
    prod = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")
    sim = SimConfig(n_paths=16384, n_steps=10)
    key = jax.random.key(3)
    p_m, g_m = price_and_greeks(key, m, prod, RegressionSpec(degree=4), sim,
                                engine="mega")
    p_x, g_x = price_and_greeks(key, m, prod, RegressionSpec(degree=4), sim,
                                engine="xla")
    assert abs(float(p_m) - float(p_x)) < 2.5e-3
    for k in ("delta", "vega", "rho"):
        assert abs(float(g_m[k]) - float(g_x[k])) < 2e-2, k
