"""Deterministic term structures (r(t), sigma(t), q(t)) — amcx.term.

Validation strategy: (1) flat curves must reproduce the flat-market
engines (the curve simulator computes the identical arithmetic, so the
paths are bitwise equal); (2) Europeans have an EXACT closed form under
deterministic curves (effective-parameter Black-Scholes); (3) Americans
with per-step rates and flat sigma have an exact float64 lattice oracle
(per-step risk-neutral probability/discount on a recombining CRR grid);
(4) the mega kernel and the curve XLA engine must agree with each other.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amcx import (
    MarketParams,
    ProductSpec,
    RegressionSpec,
    SimConfig,
    TermCurves,
    bs_price,
    crr_price,
    crr_price_curves,
    european_price_curves,
    price_option,
    price_option_curves,
    simulate_gbm,
    simulate_gbm_curves,
)

N_STEPS = 20
SIM = SimConfig(n_paths=65_536, n_steps=N_STEPS)
PUT = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")


def test_flat_curves_paths_bitwise():
    m = MarketParams(100.0, 0.04, 0.22, 0.01)
    c = TermCurves.make(m.S0, m.r, m.sigma, m.q, n_steps=N_STEPS)
    a = simulate_gbm(jax.random.key(3), m, 1.0, SIM)
    b = simulate_gbm_curves(jax.random.key(3), c, 1.0, SIM)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_flat_curves_match_flat_engines():
    m = MarketParams(100.0, 0.05, 0.25)
    c = TermCurves.make(m.S0, m.r, m.sigma, m.q, n_steps=N_STEPS)
    flat = price_option(jax.random.key(1), m, PUT, RegressionSpec(degree=4),
                        SIM, engine="xla")
    for eng in ("xla", "mega"):
        res = price_option_curves(jax.random.key(1), c, PUT,
                                  RegressionSpec(degree=4), SIM, engine=eng)
        assert abs(float(res.price) - float(flat.price)) < 2.5e-3, eng


def test_european_curves_exact_closed_form():
    """Time-varying sigma AND r: the LSMC European price must match the
    effective-parameter Black-Scholes closed form to MC tolerance."""
    r_t = jnp.linspace(0.01, 0.09, N_STEPS)
    sig_t = jnp.linspace(0.15, 0.35, N_STEPS)
    c = TermCurves.make(100.0, r_t, sig_t, 0.0, n_steps=N_STEPS)
    prod = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="european")
    exact = float(european_price_curves(c, 100.0, 1.0, "put"))
    for eng in ("xla", "mega"):
        res = price_option_curves(jax.random.key(2), c, prod,
                                  RegressionSpec(degree=4), SIM, engine=eng)
        # engines return (price, stderr) even for europeans; xla fills stderr
        err = abs(float(res.price) - exact)
        assert err < 4.0 * max(float(res.stderr), 1e-3), (eng, err, exact)


def test_european_effective_params_identity():
    """Sanity on the oracle itself: flat curves collapse to plain BS."""
    c = TermCurves.make(100.0, 0.03, 0.2, 0.01, n_steps=N_STEPS)
    a = float(european_price_curves(c, 105.0, 1.0, "call"))
    b = float(bs_price(100.0, 105.0, 1.0, 0.03, 0.2, q=0.01,
                       option_type="call"))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_crr_curves_flat_matches_crr():
    flat = float(crr_price(100.0, 100.0, 1.0, 0.05, 0.25, 2000,
                           option_type="put", american=True))
    curve = crr_price_curves(100.0, 100.0, 1.0, np.full(20, 0.05), 0.25,
                             n_sub=100, option_type="put", american=True)
    assert abs(curve - flat) < 2e-3


def test_american_rate_curve_vs_lattice():
    """Two-regime short rate (3% then 8%), flat sigma: both curve engines
    vs the exact per-step-rate lattice."""
    r_t = jnp.concatenate([jnp.full((N_STEPS // 2,), 0.03),
                           jnp.full((N_STEPS // 2,), 0.08)])
    c = TermCurves.make(100.0, r_t, 0.25, 0.0, n_steps=N_STEPS)
    truth = crr_price_curves(100.0, 100.0, 1.0, np.asarray(r_t), 0.25,
                             n_sub=100, option_type="put", american=True)
    sim = SimConfig(n_paths=131_072, n_steps=N_STEPS)
    prices = {}
    # ITM fit: the recommended estimator (the all-paths parity mode carries
    # the documented ~0.05 degree-4 policy bias, PARITY item 5)
    spec = RegressionSpec(degree=4, regress_on="itm")
    for eng in ("xla", "mega"):
        res = price_option_curves(jax.random.key(5), c, PUT, spec, sim,
                                  engine=eng)
        prices[eng] = float(res.price)
        assert abs(prices[eng] - truth) < 3e-2, (eng, prices[eng], truth)
    # cross-engine gate (same paths, different regression implementations)
    assert abs(prices["xla"] - prices["mega"]) < 2.5e-3
    # the curve genuinely moves the price: flat-3% and flat-8% bracket it
    lo = crr_price_curves(100.0, 100.0, 1.0, np.full(20, 0.08), 0.25,
                          n_sub=100)
    hi = crr_price_curves(100.0, 100.0, 1.0, np.full(20, 0.03), 0.25,
                          n_sub=100)
    assert lo < truth < hi


def test_curve_engine_barrier_and_schedule():
    """Composition: down-and-in barrier + Bermudan schedule under a rate
    curve — xla and mega agree."""
    r_t = jnp.linspace(0.02, 0.06, N_STEPS)
    c = TermCurves.make(100.0, r_t, 0.25, 0.0, n_steps=N_STEPS)
    prod = ProductSpec(K=105.0, T=1.0, barrier=85.0, option_type="put",
                       exercise="american", barrier_type="down-in")
    sched = (4, 8, 12, 16)
    res_x = price_option_curves(jax.random.key(6), c, prod,
                                RegressionSpec(degree=4), SIM, engine="xla",
                                exercise_steps=sched)
    res_m = price_option_curves(jax.random.key(6), c, prod,
                                RegressionSpec(degree=4), SIM, engine="mega",
                                exercise_steps=sched)
    assert abs(float(res_x.price) - float(res_m.price)) < 2.5e-3
    assert 0.0 < float(res_m.price)


def test_bucketed_rho_via_autodiff():
    """Curve leaves are dynamic: one jax.grad w.r.t. r_t gives BUCKETED rho.
    For a European the buckets must sum to the total rho (chain rule through
    the effective rate) and each bucket of a flat curve contributes
    equally-ish (dt-weighted)."""
    prod = ProductSpec(K=100.0, T=1.0, option_type="put",
                       exercise="european")
    sim = SimConfig(n_paths=32_768, n_steps=N_STEPS)

    def price_of_r(r_t):
        c = TermCurves(100.0, r_t, jnp.full((N_STEPS,), 0.2),
                       jnp.zeros((N_STEPS,)))
        return price_option_curves(jax.random.key(7), c, prod,
                                   RegressionSpec(degree=4), sim,
                                   engine="xla").price

    r_flat = jnp.full((N_STEPS,), 0.03)
    buckets = jax.grad(price_of_r)(r_flat)
    assert buckets.shape == (N_STEPS,)
    # FD total-rho check on the same estimator (same paths → tiny variance)
    eps = 1e-3
    fd = (float(price_of_r(r_flat + eps)) - float(price_of_r(r_flat - eps))) / (2 * eps)
    np.testing.assert_allclose(float(jnp.sum(buckets)), fd, rtol=1e-2)


def test_replay_composes_with_curves():
    """The OOS machinery composes: fit coefficients under a rate curve with
    the mega engine, replay them frozen on fresh curve paths via the
    curve-aware XLA walk (frame = curve_standardization)."""
    from amcx import reprice_with_coeffs
    from amcx.term import curve_standardization

    r_t = jnp.linspace(0.02, 0.08, N_STEPS)
    c = TermCurves.make(100.0, r_t, 0.25, 0.0, n_steps=N_STEPS)
    fit = price_option_curves(jax.random.key(8), c, PUT,
                              RegressionSpec(degree=4), SIM, engine="mega",
                              return_coeffs=True)
    mean_t, inv_std_t = curve_standardization(c, 1.0 / N_STEPS)
    fresh = simulate_gbm_curves(jax.random.key(9), c, 1.0, SIM)
    # NOTE: reprice_with_coeffs discounts with flat r; under a curve the
    # effective rate reproduces the discount only on the diagonal τ grid —
    # so replay through the mega kernel instead (exact curve rows).
    from amcx.ops.lsmc_megakernel import lsmc_price_megakernel

    p, se = lsmc_price_megakernel(
        fresh, PUT.K, c.r_t, 1.0 / N_STEPS, -1.0, degree=4,
        mean_t=mean_t, inv_std_t=inv_std_t, return_stats=True,
        replay_coeffs=fit.coeffs)
    assert abs(float(p) - float(fit.price)) < 4.0 * (float(se) + float(fit.stderr))


def test_fusedpath_curves_flat_matches_scalar_stub():
    """CPU stub PRNG (zero bits): both the scalar and the curve code paths
    collapse to the deterministic zero-noise fan, so a flat curve must
    reproduce the scalar-path price to fp-accumulation tolerance (D_t is a
    cumsum where the scalar path multiplies drift·t)."""
    from amcx.ops.lsmc_fusedpath import lsmc_price_fusedpath

    kw = dict(S0=100.0, K=105.0, dt=1.0 / N_STEPS, n_steps=N_STEPS,
              n_paths=8_192, phi=-1.0, degree=4)
    p_flat = lsmc_price_fusedpath(5, r=0.05, sigma=0.25, **kw)
    p_vec = lsmc_price_fusedpath(5, r=jnp.full((N_STEPS,), 0.05),
                                 sigma=jnp.full((N_STEPS,), 0.25), **kw)
    assert abs(float(p_flat) - float(p_vec)) < 1e-4


def test_fusedpath_curves_replay_and_schedule_offsets():
    """Curve mode shifts the stats-stream layout by three rows; the allow
    row and the replay coefficient base must follow. Same-seed replay of a
    curve+schedule fit must reproduce the fit price exactly (deterministic
    stub paths, identical pass 2)."""
    from amcx.ops.lsmc_fusedpath import lsmc_price_fusedpath

    r_t = jnp.linspace(0.02, 0.08, N_STEPS)
    sig_t = jnp.linspace(0.15, 0.35, N_STEPS)
    kw = dict(S0=100.0, K=105.0, r=r_t, sigma=sig_t, dt=1.0 / N_STEPS,
              n_steps=N_STEPS, n_paths=8_192, phi=-1.0, degree=4,
              exercise_steps=(5, 10, 15))
    fit = lsmc_price_fusedpath(seed=3, return_coeffs=True, **kw)
    p, _ = lsmc_price_fusedpath(seed=3, return_stats=True,
                                replay_coeffs=fit.coeffs, **kw)
    assert float(p) == float(fit.price)


def test_price_option_curves_fusedpath_smoke():
    """engine='fusedpath' route: validates shapes/flags and returns a
    finite price on the stub-PRNG backend; statistical parity is asserted
    on-chip (tests_tpu)."""
    r_t = jnp.linspace(0.02, 0.08, N_STEPS)
    c = TermCurves.make(100.0, r_t, 0.25, 0.0, n_steps=N_STEPS)
    res = price_option_curves(jax.random.key(4), c, PUT,
                              RegressionSpec(degree=4), SIM,
                              engine="fusedpath")
    assert np.isfinite(float(res.price))
    prod_b = ProductSpec(K=105.0, T=1.0, barrier=85.0, option_type="put",
                         exercise="american", barrier_type="down-in")
    with pytest.raises(ValueError, match="backward"):
        price_option_curves(jax.random.key(4), c, prod_b,
                            RegressionSpec(degree=4), SIM,
                            engine="fusedpath")
