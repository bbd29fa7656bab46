"""G2++ two-factor Gaussian rates (`amcx.rates_g2`).

Certification strategy (no single trusted derivation):
- exact-law gates on the simulation: E[e^{-int r}] = P(0,T) = e^{-r0 T}
  and the bond-reconstitution martingale at an interior date;
- the Gauss-Hermite T-forward European oracle vs the step-scan MC
  (independent routes), exact payer-receiver parity, and the eta -> 0
  collapse onto `amcx.rates.jamshidian_swaption_price`;
- Bermudan: single-date == European, Bermudan >= best European,
  eta -> 0 collapse onto the f64 CN-PDE HW1F Bermudan oracle, and the
  xla <-> ma-mega shared-path identity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amcx.rates import (HW1FParams, jamshidian_swaption_price,
                        pde_bermudan_swaption, swap_schedule)
from amcx.rates_g2 import (G2Params, bond_price_g2, g2_swaption_price,
                           price_bermudan_swaption_g2, simulate_g2_rates)
from amcx.types import RegressionSpec, SimConfig

G2 = G2Params(r0=0.03, a=0.8, b=0.1, sigma=0.012, eta=0.008, rho=-0.7)
PAY = swap_schedule(1.0, 4.0)          # 1y into 4y annual
SPEC = RegressionSpec(degree=2, regress_on="all")
SIM = SimConfig(n_paths=65_536, n_steps=64, antithetic=True)


def test_discount_factor_hits_the_curve():
    """E[e^{-int_0^T r}] = P(0,T) = e^{-r0 T} — the sharp joint-law gate
    on the exact (eta_x, eta_y, iota) scheme (hybrid's 3e-4 standard)."""
    sim = SimConfig(n_paths=262_144, n_steps=32, antithetic=True)
    _, _, df = simulate_g2_rates(jax.random.key(0), G2, 5.0, sim)
    D = jnp.prod(df, axis=0)
    mc = float(jnp.mean(D))
    target = float(np.exp(-G2.r0 * 5.0))
    assert abs(mc - target) < 3e-4, (mc, target)


def test_bond_reconstitution_martingale():
    """E[D(t) P(t, T; x_t, y_t)] = P(0, T) at an interior t — gates the
    bond formula AND the simulated factor/discount joint law."""
    sim = SimConfig(n_paths=262_144, n_steps=32, antithetic=True)
    x, y, df = simulate_g2_rates(jax.random.key(1), G2, 2.0, sim)
    D = jnp.prod(df, axis=0)  # to t = 2
    P = bond_price_g2(G2, 2.0, 5.0, np.asarray(x[-1], np.float64),
                      np.asarray(y[-1], np.float64))
    mc = float(np.mean(np.asarray(D, np.float64) * P))
    target = float(np.exp(-G2.r0 * 5.0))
    assert abs(mc - target) < 5e-4, (mc, target)


def test_gh_oracle_payer_receiver_parity():
    """payer - receiver = forward swap value (exact, by reconstitution)."""
    from amcx.rates_g2 import _ln_bond_const_g2, _swap_coeffs

    K = 0.032
    pay = g2_swaption_price(G2, K, 1.0, PAY, payer=True)
    rec = g2_swaption_price(G2, K, 1.0, PAY, payer=False)
    times, coeffs = _swap_coeffs(None, K, 1.0, PAY, 1.0)
    fwd = float(np.sum(coeffs * np.exp(_ln_bond_const_g2(G2, 0.0, times))))
    np.testing.assert_allclose(pay - rec, fwd, atol=1e-10)


def test_gh_oracle_eta_zero_matches_jamshidian():
    """eta -> 0 collapses G2++ to HW1F(a, sigma): the 2-D quadrature must
    land on the Jamshidian decomposition to quadrature accuracy."""
    g0 = G2Params(r0=0.03, a=0.5, b=0.3, sigma=0.01, eta=1e-9, rho=0.0)
    hw = HW1FParams(r0=0.03, kappa=0.5, sigma_r=0.01)
    for K in (0.025, 0.03, 0.035):
        gh = g2_swaption_price(g0, K, 1.0, PAY, payer=True)
        jam = jamshidian_swaption_price(hw, K, 1.0, PAY, payer=True)
        np.testing.assert_allclose(gh, jam, atol=2e-8, err_msg=str(K))


def test_mc_european_lands_on_gh_oracle():
    """Step-scan MC (single exercise date == European) vs the terminal-law
    quadrature: two independent code paths, full two-factor params."""
    res = price_bermudan_swaption_g2(
        jax.random.key(2), G2, 0.03, PAY, exercise_times=[1.0],
        spec=SPEC, sim=SIM)
    gh = g2_swaption_price(G2, 0.03, 1.0, PAY, payer=True)
    assert abs(float(res.price) - gh) < 4.0 * float(res.stderr) + 2e-4, (
        float(res.price), gh, float(res.stderr))


def test_receiver_mc_european():
    res = price_bermudan_swaption_g2(
        jax.random.key(3), G2, 0.03, PAY, exercise_times=[1.0],
        payer=False, spec=SPEC, sim=SIM)
    gh = g2_swaption_price(G2, 0.03, 1.0, PAY, payer=False)
    assert abs(float(res.price) - gh) < 4.0 * float(res.stderr) + 2e-4


def test_bermudan_dominates_europeans_and_single_date():
    berm = price_bermudan_swaption_g2(jax.random.key(4), G2, 0.03, PAY,
                                      spec=SPEC, sim=SIM)
    best_euro = max(
        g2_swaption_price(G2, 0.03, e, PAY, payer=True, first_reset=1.0)
        for e in [1.0, 2.0, 3.0, 4.0])
    assert float(berm.price) > best_euro - 2.0 * float(berm.stderr), (
        float(berm.price), best_euro)


def test_bermudan_eta_zero_matches_hw_pde():
    """The Bermudan engine at eta -> 0 must reproduce the f64 CN-PDE
    HW1F Bermudan anchor (the full G2 machinery, one live factor)."""
    g0 = G2Params(r0=0.03, a=0.5, b=0.3, sigma=0.01, eta=1e-9, rho=0.0)
    hw = HW1FParams(r0=0.03, kappa=0.5, sigma_r=0.01)
    berm = price_bermudan_swaption_g2(jax.random.key(5), g0, 0.03, PAY,
                                      spec=SPEC, sim=SIM)
    pde = pde_bermudan_swaption(hw, 0.03, PAY)
    assert abs(float(berm.price) - float(pde)) < (
        4.0 * float(berm.stderr) + 3e-4), (float(berm.price), float(pde))


def test_engine_identity_xla_vs_mega():
    sim = SimConfig(n_paths=8_192, n_steps=32, antithetic=True)
    rx = price_bermudan_swaption_g2(jax.random.key(6), G2, 0.03, PAY,
                                    spec=SPEC, sim=sim)
    rm = price_bermudan_swaption_g2(jax.random.key(6), G2, 0.03, PAY,
                                    spec=SPEC, sim=sim, engine="mega")
    # shared paths; bp-scale product, bp-scale tolerance
    assert abs(float(rx.price) - float(rm.price)) < 5e-5, (
        float(rx.price), float(rm.price))


def test_second_factor_changes_the_bermudan():
    """The second factor is not decorative: switching eta off moves the
    Bermudan by more than MC noise at fixed total terminal variance...
    (direction depends on rho; assert a measurable move, not a sign)."""
    g_flat = G2Params(r0=0.03, a=0.8, b=0.1, sigma=0.012, eta=1e-9,
                      rho=0.0)
    b2 = price_bermudan_swaption_g2(jax.random.key(7), G2, 0.03, PAY,
                                    spec=SPEC, sim=SIM)
    b1 = price_bermudan_swaption_g2(jax.random.key(7), g_flat, 0.03, PAY,
                                    spec=SPEC, sim=SIM)
    assert abs(float(b2.price) - float(b1.price)) > 3.0 * float(b2.stderr)


def test_schedule_validation():
    with pytest.raises(ValueError, match="reset date"):
        price_bermudan_swaption_g2(jax.random.key(8), G2, 0.03, PAY,
                                   exercise_times=[1.37], sim=SIM)


def test_g2_ccr_surface_feeds_exposure_profile():
    """return_surface emits the counterparty-value planes in the HW
    engine's contract — `swaption_ccr_profile` consumes them directly."""
    from amcx.rates import swaption_ccr_profile

    sim = SimConfig(n_paths=8_192, n_steps=32, antithetic=True)
    res = price_bermudan_swaption_g2(jax.random.key(9), G2, 0.03, PAY,
                                     spec=SPEC, sim=sim,
                                     return_surface=True)
    assert res.continuation.shape == (33, 8_192)
    ccr, ene = swaption_ccr_profile(res.continuation)
    assert ccr.epe.shape == (33,) and ene.shape == (33,)
    # positive exposure somewhere mid-life; EPE bounded by PFE95
    assert float(jnp.max(ccr.epe)) > 0.0
    assert float(jnp.max(ccr.epe)) <= float(jnp.max(ccr.pfe95)) + 1e-9


def test_bond_option_mc_gates_both_models():
    """E[D(T) (P(T,S) - X)^+] from the exact simulators lands on the
    closed-form bond options (HW1F and G2++) — the caplet building block."""
    from amcx.rates import bond_option_price_hw, simulate_hw_rates
    from amcx.rates_g2 import bond_option_price_g2

    sim = SimConfig(n_paths=262_144, n_steps=16, antithetic=True)
    Te, S, X = 2.0, 5.0, 0.92

    hw = HW1FParams(r0=0.03, kappa=0.5, sigma_r=0.012)
    from amcx.rates import bond_price_hw

    x, dfh = simulate_hw_rates(jax.random.key(20), hw, Te, sim)
    D = np.asarray(jnp.prod(dfh, axis=0), np.float64)
    P = bond_price_hw(hw, Te, S, np.asarray(x[-1], np.float64))
    pay = D * np.maximum(P - X, 0.0)
    mc, se = float(np.mean(pay)), float(np.std(pay)) / np.sqrt(sim.n_paths)
    cf = bond_option_price_hw(hw, Te, S, X)
    assert abs(mc - cf) < 4.0 * se + 1e-4, (mc, cf, se)

    xg, yg, dfg = simulate_g2_rates(jax.random.key(21), G2, Te, sim)
    Dg = np.asarray(jnp.prod(dfg, axis=0), np.float64)
    Pg = bond_price_g2(G2, Te, S, np.asarray(xg[-1], np.float64),
                       np.asarray(yg[-1], np.float64))
    payg = Dg * np.maximum(Pg - X, 0.0)
    mcg = float(np.mean(payg))
    seg = float(np.std(payg)) / np.sqrt(sim.n_paths)
    cfg = bond_option_price_g2(G2, Te, S, X)
    assert abs(mcg - cfg) < 4.0 * seg + 1e-4, (mcg, cfg, seg)


def test_cap_floor_parity_and_hw_collapse():
    """cap − floor = payer forward-swap value (exact), and η→0 G2 caps
    collapse onto the HW1F closed form."""
    from amcx.rates import cap_floor_price_hw
    from amcx.rates_g2 import cap_floor_price_g2

    K = 0.032
    cap = cap_floor_price_g2(G2, K, PAY, first_reset=1.0)
    flr = cap_floor_price_g2(G2, K, PAY, first_reset=1.0, cap=False)
    resets = [1.0] + PAY[:-1]
    fwd = sum(float(np.exp(-G2.r0 * t0)) - (1.0 + (t1 - t0) * K)
              * float(np.exp(-G2.r0 * t1))
              for t0, t1 in zip(resets, PAY))
    np.testing.assert_allclose(cap - flr, fwd, atol=1e-12)
    assert cap > 0.0 and flr > 0.0

    g0 = G2Params(r0=0.03, a=0.5, b=0.3, sigma=0.012, eta=1e-12, rho=0.0)
    hw = HW1FParams(r0=0.03, kappa=0.5, sigma_r=0.012)
    np.testing.assert_allclose(
        cap_floor_price_g2(g0, K, PAY, first_reset=1.0),
        cap_floor_price_hw(hw, K, PAY, first_reset=1.0), atol=1e-12)


def test_oos_replay_identity_and_lower_bound():
    """Sharp gate: replaying the frozen rule on the FIT paths reproduces
    the backward induction's price exactly (last-write-wins == forward
    first-hit); on fresh paths the OOS price is a true lower bound within
    noise of the (foresight-biased-up) fit."""
    from amcx.payoff import exercise_allow_row
    from amcx.rates_g2 import (_g2_replay_impl, _g2_swaption_setup,
                               g2_swaption_oos_bound)

    sim = SimConfig(n_paths=16_384, n_steps=32, antithetic=True)
    fit = price_bermudan_swaption_g2(jax.random.key(30), G2, 0.03, PAY,
                                     spec=SPEC, sim=sim,
                                     return_coeffs=True)
    T, dt, sched, w, Ba, Bb = _g2_swaption_setup(G2, 0.03, PAY, None, None,
                                                 True, sim.n_steps)
    x, y, df = simulate_g2_rates(jax.random.key(30), G2, T, sim)
    alw = exercise_allow_row(sched, sim.n_steps, jnp.float32)
    coefs, mu_t, sd_t = fit.coeffs
    p_same, _ = _g2_replay_impl(
        x, y, df, coefs, mu_t, sd_t, alw, jnp.asarray(w, jnp.float32),
        jnp.asarray(Ba, jnp.float32), jnp.asarray(Bb, jnp.float32), SPEC,
        sim.antithetic)
    assert abs(float(p_same) - float(fit.price)) < 2e-6, (
        float(p_same), float(fit.price))

    fit2, oos = g2_swaption_oos_bound(jax.random.key(31), G2, 0.03, PAY,
                                      spec=SPEC, sim=sim)
    gap = float(fit2.price) - float(oos.price)
    tol = 4.0 * np.hypot(float(fit2.stderr), float(oos.stderr))
    assert gap > -tol, (float(fit2.price), float(oos.price))
    # and the OOS bound still dominates the best European (within noise)
    best_euro = max(
        g2_swaption_price(G2, 0.03, e, PAY, payer=True, first_reset=1.0)
        for e in [1.0, 2.0, 3.0, 4.0])
    assert float(oos.price) > best_euro - 3.0 * float(oos.stderr)
